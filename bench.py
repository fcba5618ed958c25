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

# Last announced phase, for the heartbeat thread: when a rung hangs (the
# remote relay serializes RPCs and a dead/queued relay blocks the first
# device op indefinitely), the heartbeat makes the failure mode readable
# from stderr — "1800s in phase 'device_put'" means the relay never
# answered, not that a compile is slow.
_PHASE = {"msg": "start", "t": time.time()}


def _phase(msg):
    _PHASE["msg"] = msg
    _PHASE["t"] = time.time()
    print(f"bench: {msg}", file=sys.stderr, flush=True)


def _start_heartbeat(interval: float = 120.0):
    import threading

    def beat():
        while True:
            time.sleep(interval)
            dt = time.time() - _PHASE["t"]
            print(f"bench: heartbeat — {dt:.0f}s in phase "
                  f"'{_PHASE['msg']}'", file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()


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
        # .py): rays 98304 (tools/raycap_probe.py: 32768 clipped up to
        # 36% of per-view weight mass; 98304 keeps 100%), max_points
        # 500k->524288 (pow2 pad), voxelize 409600 — the honest
        # "reference ScanNet test setting" rung
        dims = dict(voxel_dim=(256, 256, 96), views=50, h=480, w=640,
                    rays_cap=98304, max_points=500000, ray_samples=300,
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
    if os.environ.get("BENCH_RAYS_CAP"):
        # A/B knob for the per-view ray-march capacity (the
        # tools/raycap_probe.py clipping study)
        dims["rays_cap"] = int(os.environ["BENCH_RAYS_CAP"])

    model = CNRMA(
        voxel_dim=dims["voxel_dim"], voxel_size=0.04,
        n_classes=17 if yaw else 18,
        n_reg_outs=8 if yaw else 6, with_yaw=yaw,
        ray_samples=dims["ray_samples"],
        rays_per_view_cap=dims["rays_cap"],
        max_points=dims["max_points"], capacities=dims["caps"],
        # Volume-accumulator dtype: bf16 by default since the round-4
        # TPU A/B (volume stage 983 -> 835 ms; view counts stay fp32,
        # error bounded by test — doc/performance.md).  The shipping
        # configs set the same; BENCH_ACCUM_DTYPE=float32 restores the
        # reference's exact `self.volume += volume` semantics.
        bp_accum_dtype=os.environ.get("BENCH_ACCUM_DTYPE", "bfloat16"),
        # A/B knob for the Pallas rect-footprint volume gather, e.g.
        # BENCH_RECT=16x32 or BENCH_RECT=0x0 to disable; default = the
        # model default (32x32, ON since the round-5 TPU sweep)
        **(dict(bp_rect_h=int(os.environ["BENCH_RECT"].split("x")[0]),
                bp_rect_w=int(os.environ["BENCH_RECT"].split("x")[1]))
           if os.environ.get("BENCH_RECT") else {}),
        # A/B knob for the rect path's overflow row-gather capacity
        # (fraction of tiles whose footprint exceeds the rect)
        **(dict(bp_overflow_frac=float(os.environ["BENCH_OVERFLOW_FRAC"]))
           if os.environ.get("BENCH_OVERFLOW_FRAC") else {}),
        # A/B knob for the coarse-march stride of empty-space skipping
        # (ops/ray_marching.py build_occupancy: the dilated band is >= 3
        # coarse cells = 24 fine voxels thick, so steps <= 8+round-error
        # cannot skip it); default 4
        **(dict(ray_skip_coarse_step=int(os.environ["BENCH_RAY_COARSE"]))
           if os.environ.get("BENCH_RAY_COARSE") else {}),
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
    # sitecustomize pins jax_platforms to the remote accelerator via
    # jax.config (which wins over the env var) — re-apply the env so the
    # ladder is runnable on CPU boxes (JAX_PLATFORMS=cpu python bench.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    n_batch = 2 if scale == "full2" else 1
    model, batch = build_bench(scale, batch=n_batch)
    # first device op — on the remote relay this can block behind OTHER
    # clients' in-flight compiles (the relay serializes all RPCs), so
    # log around it: a rung stuck here is queued/relay-dead, not compiling
    _phase(f"[{scale}] device_put batch (first device op)")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for leaf in batch.values():
        jax.device_get(leaf.reshape(-1)[:1])
    _phase(f"[{scale}] device ready")
    rng = jax.random.PRNGKey(0)
    # Synthesize parameters on the HOST from the init's shape tree
    # instead of compiling model.init: throughput is data-independent
    # (static shapes, no data-driven control flow), and the init compile
    # was the cold ladder's longest pole — a cold tiny-rung init blew
    # its whole 420 s subprocess cap through the remote tunnel, while
    # eval_shape is a pure host-side trace (~1 min) and device_put of
    # the ~few-hundred-MB param tree takes seconds.
    _phase(f"[{scale}] eval_shape init + host param synthesis")
    t0 = time.perf_counter()
    shapes = jax.eval_shape(lambda: model.init(
        {"params": rng, "sample": rng}, batch, train=False))
    host_rng = np.random.RandomState(1)

    def synth(path, s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            draw = host_rng.normal(0.0, 0.02, s.shape)
            # variance-like leaves (BN running vars) must be positive:
            # N(0, 0.02) makes ~half negative and rsqrt(var+eps) NaNs the
            # whole forward — throughput is unaffected on TPU but the
            # measured program would be numerically degenerate
            name = str(getattr(path[-1], "key", path[-1])) if path else ""
            if "var" in name:
                draw = np.abs(draw) + 1.0
            return jnp.asarray(draw.astype(jnp.dtype(s.dtype)))
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(synth, shapes)
    _phase(f"[{scale}] init done {time.perf_counter() - t0:.1f}s; "
           "compiling forward")

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
    # one-element finiteness probe: catches a numerically degenerate
    # benchmark program (e.g. bad synthesized BN stats) at zero cost
    finite = all(
        bool(np.all(np.isfinite(np.asarray(
            jax.device_get(leaf.reshape(-1)[:4]).astype(np.float32)))))
        for leaf in jax.tree_util.tree_leaves(r))
    _phase(f"[{scale}] compile+first-run {warm:.1f}s; "
           f"outputs_finite={finite}; measuring")
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
# each later scale only upgrades the result; the outer loop respects
# BENCH_TOTAL_BUDGET_SEC between rungs.  The headline rung is
# ``full_ship`` — the shipping ScanNet config's exact capacities (rays
# 32768 / max_points 500k / voxelize 409600); ``full`` (trimmed caps,
# round-2's headline) stays as a stepping stone.  ``small``/``medium``
# are deliberately NOT in the default ladder: on a cold cache the budget
# is better spent compiling the headline scales than mid-scale programs
# whose numbers the full rungs would supersede anyway (BENCH_SCALES
# overrides for manual runs).
SCALE_ORDER = ("tiny", "full", "full_ship")
if os.environ.get("BENCH_SCALES"):            # override, e.g. "medium,full"
    SCALE_ORDER = tuple(os.environ["BENCH_SCALES"].split(","))
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
        "vs_baseline": round(
            value / EST_REFERENCE_SCENES_PER_SEC_PER_GPU, 2),
        # the reference publishes no throughput (SURVEY.md §6) — flag
        # the denominator as an estimate IN the record
        "baseline_note": "denominator 0.125 scenes/sec/GPU is an "
                         "estimate; reference publishes no throughput",
    })


def main():
    """Run scales smallest-first IN-PROCESS and report the largest scale
    that finished.  A valid JSON line is printed IMMEDIATELY and
    re-printed after every scale, so the LAST stdout line is a parsable
    result no matter when (or whether) the driver kills the process.

    There are deliberately NO per-rung kill timers.  The remote relay
    serializes every client's RPCs (even ``jax.devices()`` blocks while
    any compile is in flight) and killing a client does NOT cancel its
    server-side compile — so a killed rung both discards work that was
    about to finish AND leaves the device busy, silently starving the
    next rung (this was rounds 1-3's bench-capture failure).  A rung
    that crashes is caught and the ladder moves on; a rung that hangs
    holds the ladder until the driver's own timeout, at which point the
    last printed line (the best completed rung) stands.  A warmed
    .jax_cache (refreshed at end of round) makes reruns compile in
    seconds even so."""
    t_start = time.perf_counter()
    _start_heartbeat()
    value, used_scale = None, None
    print(_result_line(value, used_scale), flush=True)
    for scale in SCALE_ORDER:
        remaining = TOTAL_BUDGET - (time.perf_counter() - t_start)
        if remaining < 60:
            print(f"bench: skipping {scale} (only {remaining:.0f}s left)",
                  file=sys.stderr)
            break
        t0 = time.perf_counter()
        try:
            got = run(scale)
        except Exception as e:
            # keep going: a rung-specific failure (OOM at a big scale, a
            # backend hiccup) must not cost the rungs that still work
            print(f"bench scale={scale} failed after "
                  f"{time.perf_counter() - t0:.0f}s: {e!r}",
                  file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
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
        _start_heartbeat()
        print("BENCH_RESULT", run(sys.argv[1]))
    else:
        main()
