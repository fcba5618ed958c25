#!/usr/bin/env python
"""End-of-round benchmark: full CN-RMA test-mode inference throughput.

Runs the flagship CNRMA pipeline (2D tower -> volume -> 3D U-Net -> TSDF ->
NeuS ray marching -> sparse FCAF3D detection -> per-scale top-k boxes) on a
synthetic ScanNet-shaped scene on the available accelerator and reports
scenes/sec/chip.

The reference publishes NO throughput numbers (SURVEY.md §6).  For
``vs_baseline`` we use an estimated reference rate of 0.125 scenes/sec per
GPU (0.5 scenes/sec aggregate on the 4-GPU rig — a charitable estimate for
a pipeline that runs 50 R50 views, a 6.3M-voxel 3D U-Net, 5.76M ray samples
x 50 views and a MinkowskiEngine ResNet34 per scene); the value is the
ratio of our per-chip rate to that per-GPU rate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persist compiled executables across processes: full-scale compiles through
# the remote-TPU tunnel take tens of minutes, the cached reload seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

EST_REFERENCE_SCENES_PER_SEC_PER_GPU = 0.125


def build_bench(scale: str, batch: int = 1):
    import jax.numpy as jnp
    from cnrma_tpu.models.cn_rma import CNRMA
    from cnrma_tpu.models.fcaf3d import DetectionCapacities

    yaw = scale == "arkit"
    if scale == "tiny":
        # safety-net rung: smallest structurally-real pipeline; exists so
        # a cold-cache driver run always lands SOME nonzero number
        # (round-1/2 failure mode: the first rung's compile outlived its
        # subprocess timeout and the whole ladder reported 0.0)
        dims = dict(voxel_dim=(64, 64, 32), views=4, h=96, w=128,
                    rays_cap=2048, max_points=8192, ray_samples=64,
                    caps=DetectionCapacities(
                        voxelize=8192, stride2=6144, stride4=4096,
                        levels=(2048, 1024, 512, 256),
                        neck=(6144, 4096, 2048)))
    elif scale == "full_ship":
        # the SHIPPING config's capacities (configs/ray_marching_scannet
        # .py): rays 32768, max_points 500k->524288 (pow2 pad), voxelize
        # 409600 — the honest "reference ScanNet test setting" rung
        dims = dict(voxel_dim=(256, 256, 96), views=50, h=480, w=640,
                    rays_cap=32768, max_points=500000, ray_samples=300,
                    caps=DetectionCapacities(
                        voxelize=409600, stride2=262144, stride4=131072,
                        levels=(32768, 12288, 4096, 2048),
                        neck=(262144, 65536, 16384)))
    elif scale.startswith("full"):
        # the reference's ScanNet test setting (256x256x96 @ 4cm, 50 views)
        dims = dict(voxel_dim=(256, 256, 96), views=50, h=480, w=640,
                    rays_cap=16384, max_points=262144, ray_samples=300,
                    caps=DetectionCapacities(
                        voxelize=262144, stride2=196608, stride4=131072,
                        levels=(32768, 12288, 4096, 2048),
                        neck=(196608, 65536, 16384)))
    elif scale == "arkit":
        # the reference's ARKitScenes test setting: 192x192x80 @ 4 cm,
        # 40 views, 17 classes, 7-DoF yaw boxes (ray_marching_arkit.py)
        dims = dict(voxel_dim=(192, 192, 80), views=40, h=480, w=640,
                    rays_cap=8192, max_points=131072, ray_samples=300,
                    caps=DetectionCapacities(
                        voxelize=131072, stride2=98304, stride4=65536,
                        levels=(16384, 8192, 4096, 2048),
                        neck=(98304, 32768, 16384)))
    elif scale == "medium":
        dims = dict(voxel_dim=(192, 192, 80), views=40, h=480, w=640,
                    rays_cap=8192, max_points=131072, ray_samples=300,
                    caps=DetectionCapacities(
                        voxelize=131072, stride2=98304, stride4=65536,
                        levels=(16384, 8192, 4096, 2048),
                        neck=(98304, 32768, 16384)))
    else:
        dims = dict(voxel_dim=(96, 96, 48), views=10, h=224, w=320,
                    rays_cap=4096, max_points=32768, ray_samples=150,
                    caps=DetectionCapacities(
                        voxelize=32768, stride2=24576, stride4=16384,
                        levels=(8192, 4096, 2048, 1024),
                        neck=(24576, 16384, 8192)))

    model = CNRMA(
        voxel_dim=dims["voxel_dim"], voxel_size=0.04,
        n_classes=17 if yaw else 18,
        n_reg_outs=8 if yaw else 6, with_yaw=yaw,
        ray_samples=dims["ray_samples"],
        rays_per_view_cap=dims["rays_cap"],
        max_points=dims["max_points"], capacities=dims["caps"],
        compute_dtype=jnp.bfloat16)

    v, h, w = dims["views"], dims["h"], dims["w"]
    rng = np.random.RandomState(0)
    # synthetic scene: cameras in a ring looking at the volume center
    X, Y, Z = dims["voxel_dim"]
    center = np.array([X, Y, Z]) * 0.04 / 2
    intr = np.array([[580.0 * w / 640, 0, w / 2],
                     [0, 580.0 * h / 480, h / 2], [0, 0, 1]], np.float32)
    projs = []
    for i in range(v):
        a = 2 * np.pi * i / v
        eye = center + np.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.5])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        E = np.eye(4, dtype=np.float32)       # camera-to-world
        E[:3, 0], E[:3, 1], E[:3, 2], E[:3, 3] = right, -up, fwd, eye
        projs.append(intr @ np.linalg.inv(E)[:3])
    b = batch
    batch_d = {
        "imgs": np.broadcast_to(
            rng.rand(1, v, h, w, 3).astype(np.float32) * 255,
            (b, v, h, w, 3)).copy(),
        "projection": np.broadcast_to(
            np.stack(projs)[None].astype(np.float32), (b, v, 3, 4)).copy(),
        "view_valid": np.ones((b, v), bool),
        "offset": np.zeros((b, 3), np.float32),
    }
    return model, batch_d


def run(scale: str):
    import jax
    import jax.numpy as jnp

    # 'full2' = full shapes with a 2-scene batch: amortizes fixed per-step
    # overheads; throughput metric stays scenes/sec/chip (= B / step time)
    n_batch = 2 if scale == "full2" else 1
    model, batch = build_bench(scale, batch=n_batch)
    # first device op — on the remote relay this can block behind OTHER
    # clients' in-flight compiles (the relay serializes all RPCs), so
    # log around it: a rung stuck here is queued, not compiling
    print(f"bench[{scale}]: device_put batch (first device op)",
          file=sys.stderr, flush=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for leaf in batch.values():
        jax.device_get(leaf.reshape(-1)[:1])
    print(f"bench[{scale}]: device ready", file=sys.stderr, flush=True)
    rng = jax.random.PRNGKey(0)
    # Synthesize parameters on the HOST from the init's shape tree
    # instead of compiling model.init: throughput is data-independent
    # (static shapes, no data-driven control flow), and the init compile
    # was the cold ladder's longest pole — a cold tiny-rung init blew
    # its whole 420 s subprocess cap through the remote tunnel, while
    # eval_shape is a pure host-side trace (~1 min) and device_put of
    # the ~few-hundred-MB param tree takes seconds.
    print(f"bench[{scale}]: eval_shape init + host param synthesis",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(lambda: model.init(
        {"params": rng, "sample": rng}, batch, train=False))
    host_rng = np.random.RandomState(1)

    def synth(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.asarray(host_rng.normal(0.0, 0.02, s.shape)
                               .astype(jnp.dtype(s.dtype)))
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map(synth, shapes)
    print(f"bench[{scale}]: init done {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False,
                          rngs={"sample": jax.random.PRNGKey(0)})
        return out["bboxes"], out["scores"], out["tsdf"]["scene_tsdf_004"]

    def force(res):
        # block_until_ready is unreliable through the remote (axon) relay;
        # fetching a dependent element forces real completion
        for leaf in jax.tree_util.tree_leaves(res):
            jax.device_get(leaf.reshape(-1)[:1])

    # warmup / compile
    t0 = time.perf_counter()
    r = forward(variables, batch)
    force(r)
    warm = time.perf_counter() - t0
    print(f"bench[{scale}]: compile+first-run {warm:.1f}s", file=sys.stderr)
    # adaptive iteration count: one timed probe decides how many repeats
    # fit a sane measurement window
    t0 = time.perf_counter()
    r = forward(variables, batch)
    force(r)
    probe = time.perf_counter() - t0
    n_iter = 1 if probe > 30 else (3 if probe > 5 else 5)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = forward(variables, batch)
    force(r)
    dt = (time.perf_counter() - t0) / n_iter
    return n_batch / dt


# Smallest first so SOME number always lands inside the driver's budget;
# each later scale only upgrades the result.  Caps are per-subprocess;
# the outer loop additionally respects BENCH_TOTAL_BUDGET_SEC.  The
# headline rung is ``full_ship`` — the shipping ScanNet config's exact
# capacities (rays 32768 / max_points 500k / voxelize 409600); ``full``
# (trimmed caps, round-2's headline) stays as a stepping stone.
SCALE_ORDER = ("tiny", "small", "full", "full_ship")
if os.environ.get("BENCH_SCALES"):            # override, e.g. "medium,full"
    SCALE_ORDER = tuple(os.environ["BENCH_SCALES"].split(","))
SCALE_TIMEOUTS = {"tiny": 600, "small": 900, "medium": 1200,
                  "full": 2400, "full_ship": 2400, "full2": 1800}
TOTAL_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET_SEC", "3300"))
ALL_SCALES = ("tiny", "small", "medium", "full", "full_ship", "full2",
              "arkit")


def _result_line(value, used_scale):
    if value is None:
        return json.dumps({
            "metric": "scannet_test_scenes_per_sec_per_chip",
            "value": 0.0, "unit": "scenes/sec", "vs_baseline": 0.0})
    return json.dumps({
        "metric": f"scannet_test_scenes_per_sec_per_chip({used_scale})",
        "value": round(value, 4),
        "unit": "scenes/sec",
        # denominator is an ESTIMATE: the reference publishes no
        # throughput (SURVEY.md §6); 0.125 scenes/sec/GPU assumed
        "vs_baseline": round(
            value / EST_REFERENCE_SCENES_PER_SEC_PER_GPU, 2),
    })


def _tunnel_recover(max_wait: float) -> bool:
    """Wait for the accelerator relay to become responsive again.

    The remote (axon) relay serializes ALL client RPCs — even
    ``jax.devices()`` blocks while a compile is in flight — and killing
    a timed-out bench child does NOT cancel its server-side compile, so
    the next rung would silently burn its own cap queued behind the
    abandoned work (measured: a trivial ``ones(3)+1`` probe hung >120 s
    while a killed rung's compile drained).  Probe with a tiny device op
    in short subprocess attempts until one answers or ``max_wait`` runs
    out; on a local backend the first probe returns in ~a second.
    """
    import subprocess
    code = ("import jax, jax.numpy as jnp; "
            "jax.device_get(jnp.ones(2) + 1)")
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < max_wait:
        budget = max_wait - (time.perf_counter() - t0)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=min(90, budget),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                print(f"bench: relay responsive again after "
                      f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
    print(f"bench: relay still busy after {max_wait:.0f}s",
          file=sys.stderr)
    return False


def _run_scale(scale: str, timeout: float):
    """One scale in a subprocess; returns (value|None, note).  Child
    stdout/stderr go to temp files so a timed-out child still leaves
    diagnosable output (round-2 failure: TimeoutExpired discarded
    stderr and BENCH_r02 carried zero diagnostics)."""
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out_p = os.path.join(td, "out")
        err_p = os.path.join(td, "err")
        with open(out_p, "w") as fo, open(err_p, "w") as fe:
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), scale],
                    stdout=fo, stderr=fe, timeout=timeout)
            except subprocess.TimeoutExpired:
                pass
        with open(out_p) as f:
            stdout = f.read()
        with open(err_p) as f:
            stderr = f.read()
    for line in stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return float(line.split()[1]), ""
    return None, stderr[-2000:]


def main():
    """Run scales smallest-first, each in a subprocess with a timeout, and
    report the largest scale that finished.  A valid JSON line is printed
    IMMEDIATELY and re-printed after every scale, so the LAST stdout line
    is a parsable result no matter when the driver kills the process.  A
    warmed .jax_cache (refreshed at end of round) makes reruns compile in
    seconds; the 'tiny' rung lands a nonzero number even fully cold."""
    t_start = time.perf_counter()
    value, used_scale = None, None
    print(_result_line(value, used_scale), flush=True)
    for scale in SCALE_ORDER:
        remaining = TOTAL_BUDGET - (time.perf_counter() - t_start)
        timeout = min(SCALE_TIMEOUTS.get(scale, 1200), remaining)
        if timeout < 60:
            print(f"bench: skipping {scale} (only {remaining:.0f}s left)",
                  file=sys.stderr)
            break
        t0 = time.perf_counter()
        got, err = _run_scale(scale, timeout)
        dt = time.perf_counter() - t0
        if got is None:
            if dt >= timeout - 1:
                print(f"bench scale={scale} timed out after "
                      f"{timeout:.0f}s; stderr tail:\n{err}",
                      file=sys.stderr)
                # the killed child's server-side compile keeps the relay
                # busy; wait it out so the next rung starts with a clean
                # queue instead of burning its cap behind abandoned work
                remaining = TOTAL_BUDGET - (time.perf_counter() - t_start)
                if remaining > 120:
                    _tunnel_recover(min(900, remaining - 60))
            else:
                print(f"bench scale={scale} failed after {dt:.0f}s:\n"
                      f"{err}", file=sys.stderr)
            # do NOT break: compile time is not monotone in scale — a
            # later rung may hit a warm cache while this one compiled
            # cold (round-3 lesson: tiny timed out cold and the break
            # left verified larger-scale numbers unmeasured); the outer
            # TOTAL_BUDGET still bounds the whole ladder
            continue
        # a larger scale can legitimately measure slower than a smaller
        # one (bigger static capacities); prefer the larger scale as the
        # headline, except full2 which only upgrades on real improvement
        if scale == "full2" and value is not None and got <= value:
            print(f"bench: {scale} -> {got:.4f} (not better)",
                  file=sys.stderr)
        else:
            value, used_scale = got, scale
            print(f"bench: {scale} -> {got:.4f} scenes/sec "
                  f"({dt:.0f}s incl. compile)", file=sys.stderr)
        print(_result_line(value, used_scale), flush=True)
    print(_result_line(value, used_scale), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ALL_SCALES:
        print("BENCH_RESULT", run(sys.argv[1]))
    else:
        main()
