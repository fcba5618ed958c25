"""End-to-end CNRMA pipeline tests at tiny scale (CPU, 8 virtual devices).

These are the integration analogs of the reference's manual end-to-end
checks (SURVEY.md §4): forward_train produces finite joint losses and
gradients; forward_test emits reference-format outputs; the training step
runs sharded over a multi-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cnrma_tpu.models.cn_rma import Atlas, CNRMA, feature_transform_aug
from cnrma_tpu.models.fcaf3d import DetectionCapacities


def tiny_model(detection=True, batch=1):
    cls = CNRMA if detection else Atlas
    model = cls(
        voxel_dim=(16, 16, 16), voxel_size=0.1, n_classes=3,
        ray_samples=24, rays_per_view_cap=512, max_points=1024,
        pts_threshold=500, assigner_limit=2, assigner_topk=4,
        nms_pre=16, voxel_size_fcaf3d=0.05,
        capacities=DetectionCapacities.tiny())
    b, v, h, w = batch, 2, 32, 32
    rng = np.random.RandomState(0)
    intr = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]],
                    np.float32)
    # camera slightly outside the volume looking in
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [0.8, 0.8, -0.4]
    proj = (intr @ np.linalg.inv(E)[:3]).astype(np.float32)
    batch_d = {
        "imgs": jnp.asarray(
            rng.rand(b, v, h, w, 3).astype(np.float32) * 255),
        "projection": jnp.asarray(np.broadcast_to(proj, (b, v, 3, 4))),
        "view_valid": jnp.ones((b, v), bool),
        "offset": jnp.zeros((b, 3), jnp.float32),
        "gt_boxes": jnp.asarray(np.broadcast_to(
            np.array([[0.8, 0.8, 0.8, 0.6, 0.6, 0.6, 0.0]], np.float32),
            (b, 2, 7))),
        "gt_labels": jnp.ones((b, 2), jnp.int32),
        "gt_valid": jnp.ones((b, 2), bool),
        "tsdf_list": {
            "tsdf_gt_010": jnp.asarray(
                rng.rand(b, 16, 16, 16).astype(np.float32) * 2 - 1),
            "tsdf_gt_020": jnp.asarray(
                rng.rand(b, 8, 8, 8).astype(np.float32) * 2 - 1),
            "tsdf_gt_040": jnp.asarray(
                rng.rand(b, 4, 4, 4).astype(np.float32) * 2 - 1),
        },
    }
    return model, batch_d


@pytest.fixture(scope="module")
def cnrma_setup():
    """One shared init of the tiny CNRMA (the trace is the slow part)."""
    model, batch = tiny_model()
    rng = jax.random.PRNGKey(0)
    vars_ = jax.jit(lambda: model.init(
        {"params": rng, "sample": rng, "aug": rng}, batch, train=False))()
    return model, batch, vars_


class TestCNRMAForward:
    def test_forward_test_outputs(self, cnrma_setup):
        model, batch, vars_ = cnrma_setup
        rng = jax.random.PRNGKey(0)
        out = jax.jit(lambda v, b: model.apply(
            v, b, train=False, rngs={"sample": rng}))(vars_, batch)
        assert set(out["tsdf"]) == {"scene_tsdf_010", "scene_tsdf_020",
                                    "scene_tsdf_040"}
        assert out["tsdf"]["scene_tsdf_010"].shape == (1, 16, 16, 16)
        assert out["bboxes"].shape[-1] == 6
        assert out["scores"].shape[-1] == 3
        for k, v in out["losses"].items():
            assert np.isfinite(float(v)), k

    def test_forward_train_losses_and_grads(self, cnrma_setup):
        model, batch, vars_ = cnrma_setup
        rng = jax.random.PRNGKey(1)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                batch, train=True,
                rngs={"sample": rng, "aug": rng},
                mutable=["batch_stats"])
            return sum(out["losses"].values())

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            vars_["params"])
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # the 2D tower gets gradient through BOTH volume and ray-march paths
        g2d = jax.tree_util.tree_leaves(grads["tower2d"])
        assert any(np.abs(np.asarray(g)).sum() > 0 for g in g2d)

    def test_atlas_recon_only(self, cnrma_setup):
        model, batch = tiny_model(detection=False)
        rng = jax.random.PRNGKey(0)
        vars_ = jax.jit(lambda: model.init(
            {"params": rng}, batch, train=False))()
        out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            vars_, batch)
        assert "bboxes" not in out
        assert set(out["losses"]) == {"tsdf_loss_010", "tsdf_loss_020",
                                      "tsdf_loss_040"}
        # Atlas params are a subset of CNRMA params (stage transfer) —
        # compare against the shared full-model init
        _, _, fv = cnrma_setup
        for key in vars_["params"]:
            assert key in fv["params"]


_MULTI_DEVICE_STEP = """
import sys
sys.path[:0] = [__REPO__, __TESTS__]
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_enable_async_dispatch', False)
from cnrma_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache(min_compile_secs=5.0)
import numpy as np, optax
from test_pipeline import tiny_model
from cnrma_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cnrma_tpu.train.loop import make_train_step
from cnrma_tpu.train.state import TrainState

n = min(4, len(jax.devices()))
mesh = make_mesh(n)
model, batch = tiny_model(batch=n)
rng = jax.random.PRNGKey(0)
vars_ = jax.jit(lambda: model.init(
    dict(params=rng, sample=rng, aug=rng), batch, train=False))()
tx = optax.adamw(1e-3)
db = shard_batch(batch, mesh)
# Both PRODUCTION distribution modes in one process (imports + cache-load
# amortized): the split-collective step first (collective-free grads
# program + single-bucket all-reduce — what dryrun_multichip exercises),
# then the fused shard_map DDP step (what run_training uses on real
# hardware).  The mesh=None GSPMD program is the single-device path and
# is covered by the single-device train tests — running it here on a
# sharded batch tested a mode nothing ships and cost a third heavy
# compile.
results = {}
for mode, kwargs in (('split', dict(mesh=mesh, split=True)),
                     ('shard_map', dict(mesh=mesh))):
    state = TrainState.create(
        jax.tree_util.tree_map(jax.numpy.copy, vars_['params']),
        jax.tree_util.tree_map(jax.numpy.copy, vars_['batch_stats']), tx)
    state = replicate(state, mesh)
    step = make_train_step(model, tx, **kwargs)
    new_state, logs = step(state, db, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(logs['total_loss'])), logs
    assert np.isfinite(float(logs['grad_norm'])), logs
    results[mode] = {k: float(v) for k, v in logs.items()}
    print('STEP_OK', mode, float(logs['total_loss']), flush=True)
# split == fused shard_map semantics where they are defined to agree:
# identical rng streams and per-device recon math, means over the device
# axis — so the TSDF losses must match tightly.  The DETECTION losses
# legitimately differ (the fused step pmean-syncs the positive-count
# normalization across ranks, ray_marching.py:573-587 semantics; the
# split step keeps it per-device like single-GPU training), so the total
# loss only gets a loose band.
tsdf_keys = [k for k in results['split'] if 'tsdf' in k]
assert tsdf_keys, list(results['split'])
for k in tsdf_keys:
    a, b = results['split'][k], results['shard_map'][k]
    assert abs(a - b) <= 1e-3 * max(1.0, abs(b)), (k, a, b)
assert abs(results['split']['total_loss']
           - results['shard_map']['total_loss']) \
    <= 0.5 * abs(results['shard_map']['total_loss']), results
"""


class TestMultiDevice:
    """The multi-device train steps run in a SUBPROCESS with retries:
    XLA:CPU's in-process collective rendezvous intermittently hard-aborts
    (SIGABRT, not a catchable error) on a 1-2 core host, which would
    otherwise kill the entire pytest process."""

    @pytest.mark.slow
    def test_train_steps_both_modes(self):
        """The split-collective step (dryrun_multichip's mode) AND the
        fused shard_map step (per-device scene + explicit pmean — the DDP
        path run_training uses) on a 4-device mesh, with a semantics
        cross-check between the two."""
        import os
        import subprocess
        import sys

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (_MULTI_DEVICE_STEP
                .replace("__REPO__", repr(repo))
                .replace("__TESTS__", repr(os.path.join(repo, "tests"))))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            flags += " --xla_force_host_platform_device_count=8"
        if "collective_timeout" not in flags:
            flags += " --xla_cpu_collective_timeout_seconds=900"
        env["XLA_FLAGS"] = flags.strip()
        last = None
        for _ in range(3):
            try:
                r = subprocess.run([sys.executable, "-c", code], env=env,
                                   capture_output=True, text=True,
                                   timeout=1500)
            except subprocess.TimeoutExpired as e:
                last = e      # a hung attempt counts as a failed attempt
                continue
            if r.returncode == 0:
                assert r.stdout.count("STEP_OK") == 2
                return
            last = r
            if r.stdout.count("STEP_OK") == 2:
                # both steps executed — the failure is a deterministic
                # assert, not a collective flake; retrying can't help
                break
        rc = getattr(last, "returncode", "timeout")
        err = last.stderr or b""
        if isinstance(err, bytes):
            err = err.decode("utf-8", "replace")
        pytest.fail(f"multi-device steps failed 3 times: rc={rc}\n"
                    f"{err[-2000:]}")


_SCENE_SHARDED_EVAL = """
import sys
sys.path[:0] = [__REPO__, __TESTS__]
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_cpu_enable_async_dispatch', False)
from cnrma_tpu.utils.comp_cache import enable_persistent_cache
enable_persistent_cache(min_compile_secs=5.0)
import jax.numpy as jnp
import numpy as np
from test_pipeline import tiny_model
from cnrma_tpu.parallel.mesh import make_mesh, shard_batch
from cnrma_tpu.utils.batching import vmap_batch_mode

n = min(4, len(jax.devices()))
model, batch = tiny_model(batch=n)
# pure inference surface: no GT/targets -> no cross-scene reductions
for k in ('tsdf_list', 'gt_boxes', 'gt_labels', 'gt_valid'):
    batch.pop(k, None)
batch['scene_seed'] = jnp.arange(n, dtype=jnp.int32)
rng = jax.random.PRNGKey(0)
b1 = jax.tree_util.tree_map(lambda a: a[:1], batch)
vars_ = jax.jit(lambda: model.init(
    dict(params=rng, sample=rng), b1, train=False))()
key0 = jax.random.PRNGKey(0)

fwd1 = jax.jit(lambda b: model.apply(vars_, b, train=False,
                                     rngs={'sample': key0}))
seq = [jax.device_get(fwd1(jax.tree_util.tree_map(
    lambda a: a[i:i + 1], batch))) for i in range(n)]

mesh = make_mesh(n)
def fwd_n(b):
    with vmap_batch_mode(True):
        return model.apply(vars_, b, train=False, rngs={'sample': key0})
out = jax.device_get(jax.jit(fwd_n)(shard_batch(batch, mesh)))

def pick(o):
    return {'tsdf': o['tsdf'][f'scene_tsdf_010'],
            'bboxes': o['bboxes'], 'scores': o['scores'],
            'bbox_valid': o['bbox_valid'],
            'pts_xyz': np.asarray(o['points'].xyz),
            'pts_feats': np.asarray(o['points'].feats),
            'pts_valid': np.asarray(o['points'].valid)}

for i in range(n):
    a, b = pick(seq[i]), {k: v[i:i + 1] for k, v in pick(out).items()}
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        assert av.shape == bv.shape, (k, av.shape, bv.shape)
        # per-scene equivalence between the sharded N-scene program and
        # N sequential single-scene runs: same subsample draws (scene
        # seeds), same box set/validity; values agree to fp32 ULP level
        # (GSPMD partitions fuse differently than the single-device
        # program — measured max rel diff 4e-7 on pixel features)
        np.testing.assert_allclose(av, bv, rtol=1e-5, atol=1e-5,
                                   err_msg=f'scene {i} key {k}')
print('SHARD_EVAL_OK', flush=True)
"""


class TestSceneShardedEval:
    """tools/test.py --n-devices semantics: an N-scene device-sharded
    eval batch reproduces N sequential single-scene runs per scene
    (reference multi_gpu_test scene sharding, test.py:205-214).
    Subprocess + retries for the XLA:CPU collective flake, like
    TestMultiDevice."""

    @pytest.mark.slow
    def test_sharded_matches_sequential(self):
        import os
        import subprocess
        import sys

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (_SCENE_SHARDED_EVAL
                .replace("__REPO__", repr(repo))
                .replace("__TESTS__", repr(os.path.join(repo, "tests"))))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            flags += " --xla_force_host_platform_device_count=8"
        if "collective_timeout" not in flags:
            flags += " --xla_cpu_collective_timeout_seconds=900"
        env["XLA_FLAGS"] = flags.strip()
        last = None
        for _ in range(3):
            try:
                r = subprocess.run([sys.executable, "-c", code], env=env,
                                   capture_output=True, text=True,
                                   timeout=1500)
            except subprocess.TimeoutExpired as e:
                last = e
                continue
            if r.returncode == 0:
                assert "SHARD_EVAL_OK" in r.stdout
                return
            last = r
            if "assert" in (r.stderr or ""):
                break        # deterministic mismatch, retries can't help
        rc = getattr(last, "returncode", "timeout")
        err = last.stderr or b""
        if isinstance(err, bytes):
            err = err.decode("utf-8", "replace")
        pytest.fail(f"scene-sharded eval failed 3 times: rc={rc}\n"
                    f"{err[-2000:]}")


class TestRunTraining:
    """The epoch driver end to end on one device: step loop, max_steps,
    logger, periodic checkpointing, and the mid-training val-eval +
    best-checkpoint hook (the reference's ``evaluation = dict(
    interval=...)`` + ``save_best``, ``configs/ray_marching_scannet.py:47``)."""

    @pytest.mark.slow
    def test_val_eval_and_best_checkpoint(self, cnrma_setup, tmp_path):
        import optax

        from cnrma_tpu.parallel.mesh import make_mesh
        from cnrma_tpu.train.loop import run_training
        from cnrma_tpu.train.state import TrainState

        model, batch, vars_ = cnrma_setup
        tx = optax.adamw(1e-3)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, vars_["params"]),
            jax.tree_util.tree_map(jnp.copy, vars_["batch_stats"]), tx)
        out = run_training(
            model, tx, [batch, batch], epochs=1, state=state,
            work_dir=str(tmp_path), mesh=make_mesh(1), max_steps=2,
            log_interval=1, checkpoint_interval=1,
            val_loader=[batch], eval_interval=1, eval_metric="mAP")
        assert int(out.step) == 2
        # periodic checkpoint + best checkpoint both saved
        assert (tmp_path / "epoch_1" / "cnrma_meta.json").exists()
        best_meta = tmp_path / "best" / "cnrma_meta.json"
        assert best_meta.exists()
        import json
        meta = json.loads(best_meta.read_text())
        assert np.isfinite(float(meta["val_total_loss"]))
        # mAP-based selection (reference's metric-driven workflow):
        # the score is recorded and in range
        assert meta["eval_metric"] == "mAP"
        assert 0.0 <= float(meta["val_mAP_0.25"]) <= 1.0
        # the val scores went through the logger
        log_text = (tmp_path / "train.log").read_text()
        assert "val/total_loss" in log_text
        assert "val/mAP_0.25" in log_text


class TestFeatureTransformAug:
    def test_points_and_boxes_transform_together(self):
        rng = jax.random.PRNGKey(0)
        pts = jnp.asarray(
            np.random.RandomState(0).rand(100, 3).astype(np.float32))
        boxes = jnp.array([[0.5, 0.5, 0.5, 0.2, 0.3, 0.4, 0.0]])
        new_pts, new_boxes = feature_transform_aug(rng, pts, boxes, False)
        assert new_pts.shape == pts.shape
        assert new_boxes.shape == boxes.shape
        # the relative position of a point w.r.t. the box center is
        # preserved up to scale for the translation+flip+rot composition:
        # verify with a point at the box center
        center_in = boxes[0, :3][None]
        c_out, b_out = feature_transform_aug(rng, center_in, boxes, False)
        np.testing.assert_allclose(np.asarray(c_out[0]),
                                   np.asarray(b_out[0, :3]), atol=1e-5)

    def test_yaw_flip_consistency(self):
        rng = jax.random.PRNGKey(3)
        boxes = jnp.array([[1.0, 0.5, 0.0, 0.4, 0.2, 0.3, 0.7]])
        pts = jnp.array([[1.0, 0.5, 0.0]])
        _, nb = feature_transform_aug(
            rng, pts, boxes, True, flip_ratio_horizontal=1.0,
            flip_ratio_vertical=0.0, rot_range=(0.0, 0.0),
            scale_ratio_range=(1.0, 1.0), translation_std=(0, 0, 0))
        np.testing.assert_allclose(float(nb[0, 0]), -1.0, atol=1e-6)
        np.testing.assert_allclose(float(nb[0, 6]), np.pi - 0.7,
                                   atol=1e-5)


class TestGoldenEndToEnd:
    """Golden end-to-end numerical regression (the 'golden e2e' gap from
    the round-2 review): one fixed-seed tiny scene through the FULL
    test-mode pipeline, digests of every stage-facing output pinned to
    stored values.  An unintended numerical change in ANY stage — 2D
    tower, volume accumulation, 3D U-Net, TSDF head, NeuS ray marching,
    voxelization, sparse detection, box decode, loss plumbing — moves at
    least one digest (reference behavior: ray_marching.py:456-521).

    The pins are CPU values under conftest's deterministic settings
    (fp32 compute, highest matmul precision, fixed PRNG seeds).  After an
    INTENDED numerics change, regenerate with

        CNRMA_GOLDEN_PRINT=1 python -m pytest tests/test_pipeline.py \
            -k golden -q -s
    """

    def _digest(self, out):
        d = {}
        t = np.asarray(out["tsdf"]["scene_tsdf_010"], np.float64)
        d["tsdf_mean"] = float(t.mean())
        d["tsdf_std"] = float(t.std())
        pts = out["points"]
        pv = np.asarray(pts.valid, bool)
        d["pts_n_valid"] = float(pv.sum())
        if pv.any():
            d["pts_xyz_mean"] = float(
                np.asarray(pts.xyz, np.float64)[pv].mean())
            d["pts_feat_absmean"] = float(
                np.abs(np.asarray(pts.feats, np.float64)[pv]).mean())
        bv = np.asarray(out["bbox_valid"], bool)
        d["box_n_valid"] = float(bv.sum())
        if bv.any():
            d["box_param_mean"] = float(
                np.asarray(out["bboxes"], np.float64)[bv].mean())
            d["score_max"] = float(
                np.asarray(out["scores"], np.float64)[bv].max())
        for k, v in sorted(out["losses"].items()):
            d[f"loss_{k}"] = float(v)
        return d

    # Captured on this box (CPU, fp32, highest precision, jax as pinned
    # in the sandbox image).  loss_bbox/loss_centerness are exactly 0 at
    # this seed (the tiny scene yields no assigner positives) — kept as
    # pins anyway: a nonzero value would mean assignment semantics moved.
    GOLDEN = {
        "box_n_valid": 51.0,
        "box_param_mean": 1.210949012,
        "loss_loss_bbox": 0.0,
        "loss_loss_centerness": 0.0,
        "loss_loss_cls": 0.0017360412,
        "loss_tsdf_loss_010": 0.5728494525,
        "loss_tsdf_loss_020": 0.6917614937,
        "loss_tsdf_loss_040": 0.5761498809,
        "pts_feat_absmean": 87.8024076681,
        "pts_n_valid": 168.0,
        "pts_xyz_mean": 0.8163622864,
        "score_max": 0.0184572563,
        "tsdf_mean": -0.047164839,
        "tsdf_std": 0.9692798469,
    }

    def test_digests_match_golden(self, cnrma_setup):
        import os
        model, batch, vars_ = cnrma_setup
        rng = jax.random.PRNGKey(0)
        out = jax.jit(lambda v, b: model.apply(
            v, b, train=False, rngs={"sample": rng}))(vars_, batch)
        got = self._digest(out)
        if os.environ.get("CNRMA_GOLDEN_PRINT"):
            import pprint
            print("\nGOLDEN = ", end="")
            pprint.pprint({k: round(v, 10) for k, v in got.items()})
            return
        assert set(got) == set(self.GOLDEN), (
            f"digest keys changed: {sorted(set(got) ^ set(self.GOLDEN))}")
        for k, want in self.GOLDEN.items():
            np.testing.assert_allclose(
                got[k], want, rtol=2e-3, atol=2e-5,
                err_msg=f"golden digest '{k}' moved — unintended "
                        "numerics change somewhere in the pipeline "
                        "(regenerate only if the change is intended)")
