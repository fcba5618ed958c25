"""CNRMA_CAPACITY_DEBUG surfaces fixed-capacity saturation (VERDICT r4:
the derived-kmap path and mis-sized ``DetectionCapacities`` clipped
silently before)."""

import os
import subprocess
import sys

_PROG = """
import os
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
from cnrma_tpu.ops.sparse import voxelize_points, downsample_coords

pts = jnp.asarray(np.random.RandomState(0).rand(64, 3).astype(np.float32))
feats = jnp.ones((64, 2), jnp.float32)
valid = jnp.ones((64,), bool)

@jax.jit
def f(pts, feats, valid):
    st = voxelize_points(pts, feats, valid, 0.05, capacity=16)
    ks, cs, run = downsample_coords(st, 2, capacity=8)
    return st.num_valid(), ks

nv, ks = f(pts, feats, valid)
jax.block_until_ready(ks)
print('NV', int(nv))
"""


def test_saturation_is_reported():
    env = dict(os.environ, JAX_PLATFORMS="cpu", CNRMA_CAPACITY_DEBUG="1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {repo!r})"
         + _PROG],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    # 64 random points at 5 cm voxels >> 16 slots: must be flagged
    assert "[capacity] voxelize(stride 1):" in out, out
    assert "saturated=1" in out, out
    assert "[capacity] dedup(stride 2):" in out, out


def test_flag_off_is_silent():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("CNRMA_CAPACITY_DEBUG", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", f"import sys; sys.path.insert(0, {repo!r})"
         + _PROG],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[capacity]" not in r.stdout
