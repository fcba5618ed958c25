"""Pallas one-hot small-table lookup (ops/pallas_ray.py) — interpret-mode
parity with the plain XLA gather, and end-to-end identity of the skipped
ray march when the coarse pass routes through the kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnrma_tpu.ops import pallas_ray
from cnrma_tpu.ops import ray_marching as rm


def test_onehot_lookup_matches_gather():
    rng = np.random.RandomState(0)
    R = 50
    table = jnp.asarray(
        (rng.rand(R, 128) > 0.5).astype(np.float32))
    codes = rng.randint(-5, R * 128 + 40, size=1300).astype(np.int32)
    got = pallas_ray.onehot_lookup(table, jnp.asarray(codes),
                                   interpret=True)
    flat = np.asarray(table).reshape(-1)
    want = np.where((codes >= 0) & (codes < R * 128),
                    flat[np.clip(codes, 0, R * 128 - 1)], 0.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_onehot_lookup_handles_padding():
    table = jnp.ones((1, 128), jnp.float32)
    codes = jnp.arange(700, dtype=jnp.int32)   # pads to 1024, > 128 -> 0
    got = np.asarray(pallas_ray.onehot_lookup(table, codes,
                                              interpret=True))
    assert got.shape == (700,)
    np.testing.assert_array_equal(got[:128], 1.0)
    np.testing.assert_array_equal(got[128:], 0.0)


def _march(monkeypatch, mode):
    monkeypatch.setenv("CNRMA_RAY_PALLAS", mode)
    rng = np.random.RandomState(3)
    dim = (16, 16, 8)
    tsdf = jnp.asarray(np.clip(
        rng.rand(*dim).astype(np.float32) * 2 - 1, -1, 1))
    occ = rm.build_occupancy(tsdf, 8)
    K = np.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [0.8, 0.8, -0.5]
    proj = jnp.asarray((K @ np.linalg.inv(E)[:3]).astype(np.float32))
    pts = rm.ray_march_neus(
        proj, tsdf, dim, 0.1, jnp.zeros(3, jnp.float32), 8, 8,
        view_index=0, n_samples=64, capacity=256, occupancy=occ,
        skip_factor=8, skip_window=48, coarse_step=4)
    return jax.device_get(pts)


def test_ray_march_pallas_coarse_identical(monkeypatch):
    ref = _march(monkeypatch, "0")
    got = _march(monkeypatch, "interpret")
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
