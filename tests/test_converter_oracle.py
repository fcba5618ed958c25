"""Numeric end-to-end oracle for the checkpoint converter's detection half.

The 2D/3D dense towers have activation parity against the reference's own
torch modules (``tools/activation_parity.py``); the ME-based detection
half could previously only be checked structurally (names/shapes), so a
silently wrong per-offset kernel permutation in ``convert_checkpoint``
(or a divergence between ``ops.sparse``'s enumeration and ME's) would
pass every test while destroying mAP on a real converted checkpoint.

This test closes that gap numerically: random "torch" kernels are routed
through the REAL ``convert_state_dict`` path (both ``--me-offset-order``
modes), applied with our sparse ops, and diffed per-coordinate against
``tools.me_offset_oracle``'s independent dict-based numpy engine — a
transcription of ME's conv semantics (``fcaf3d_backbone.py:25-48``,
``fcaf3d_head.py:62-139`` usage) sharing no code with ``ops.sparse``.
Weights/features are small integers so every sum is exact in fp32: any
row-order or stride-semantics error shows as a hard mismatch, not noise.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cnrma_tpu.ops import sparse as sp  # noqa: E402
from tools.convert_checkpoint import convert_state_dict  # noqa: E402
from tools.me_offset_oracle import (  # noqa: E402
    me_generative_transpose_np, me_sparse_conv_np)

GRID = sp.VoxelGrid(bounds=(64, 64, 64), shifts=(16, 16, 16))


def _rand_coords(rng, n, stride, lo=0, hi=24):
    """n unique [3] int coords, multiples of ``stride``."""
    pts = set()
    while len(pts) < n:
        c = rng.integers(lo // stride, hi // stride, size=3) * stride
        pts.add(tuple(int(v) for v in c))
    return np.array(sorted(pts), np.int32)


def _make_st(coords, feats, stride, capacity):
    """Sorted fixed-capacity SparseTensor from concrete rows."""
    n = len(coords)
    keys = np.asarray(GRID.pack(jnp.asarray(coords)))
    order = np.argsort(keys)
    pad = capacity - n
    keys = np.concatenate([keys[order],
                           np.full((pad,), sp.SENTINEL_KEY, np.int32)])
    cpad = np.concatenate([coords[order],
                           np.asarray(GRID.unpack(jnp.full(
                               (pad,), sp.SENTINEL_KEY, jnp.int32)))])
    fpad = np.concatenate([feats[order],
                           np.zeros((pad, feats.shape[1]), feats.dtype)])
    return sp.SparseTensor(keys=jnp.asarray(keys),
                           coords=jnp.asarray(cpad),
                           feats=jnp.asarray(fpad), stride=stride,
                           grid=GRID)


def _diff(st_out, oracle, cout):
    """Assert our tensor's valid rows == the oracle dict, exactly."""
    keys = np.asarray(st_out.keys)
    coords = np.asarray(st_out.coords)
    feats = np.asarray(st_out.feats, np.float64)
    got = {tuple(int(v) for v in coords[i]): feats[i]
           for i in range(len(keys)) if keys[i] != sp.SENTINEL_KEY}
    assert set(got) == set(oracle), (
        f"coordinate sets differ: ours-only={set(got) - set(oracle)} "
        f"oracle-only={set(oracle) - set(got)}")
    for c in oracle:
        np.testing.assert_array_equal(
            got[c], oracle[c][:cout],
            err_msg=f"feature mismatch at {c}")


def _int_weights(rng, shape):
    return rng.integers(-3, 4, size=shape).astype(np.float32)


@pytest.mark.parametrize("order", ["xyz", "zyx"])
@pytest.mark.parametrize("derived", [True, False])
def test_converted_detection_kernels_match_me_oracle(order, derived,
                                                     monkeypatch):
    monkeypatch.setattr(sp, "DERIVED_KMAPS", 1 if derived else 0)
    rng = np.random.default_rng(0 if order == "xyz" else 1)
    cin, cmid, cout = 6, 5, 4

    # raw "torch" kernels in the layout a published .pth carries, row k =
    # ME's k-th offset under ``order``
    sd = {
        "detection_backbone.conv1.0.kernel":
            _int_weights(rng, (27, cin, cmid)),              # stem k3 s2
        "detection_backbone.layer1.0.conv1.kernel":
            _int_weights(rng, (27, cmid, cmid)),             # subm k3
        "detection_backbone.layer1.0.downsample.0.kernel":
            _int_weights(rng, (cmid, cmid)),                 # k1 s2 (2D!)
        "detection_head.up_block_1.0.kernel":
            _int_weights(rng, (8, cmid, cout)),              # gen-T k2 s2
        "detection_head.cls_conv.kernel":
            _int_weights(rng, (cmid, cout)),                 # k1 s1
    }
    params, _ = convert_state_dict(dict(sd), me_offset_order=order)
    bb = params["detector"]["backbone"]
    head = params["detector"]["head"]

    coords1 = _rand_coords(rng, 40, 1)
    feats1 = _int_weights(rng, (40, cin))
    st1 = _make_st(coords1, feats1, stride=1, capacity=48)

    # --- stem: k3 s2 strided conv (fcaf3d_backbone stem) ----------------
    w = jnp.asarray(bb["stem"]["kernel"])
    ours = sp.strided_conv(st1, w, factor=2, capacity=48)
    oracle = me_sparse_conv_np(coords1, feats1,
                               sd["detection_backbone.conv1.0.kernel"],
                               tensor_stride=1, conv_stride=2,
                               order=order)
    _diff(ours, oracle, cmid)

    # --- submanifold k3 at stride 2 (ResNet block conv) ------------------
    coords2 = _rand_coords(rng, 30, 2)
    feats2 = _int_weights(rng, (30, cmid))
    st2 = _make_st(coords2, feats2, stride=2, capacity=40)
    w = jnp.asarray(bb["layer1_block0"]["conv1"]["kernel"])
    ours = sp.subm_conv(st2, w)
    oracle = me_sparse_conv_np(
        coords2, feats2,
        sd["detection_backbone.layer1.0.conv1.kernel"],
        tensor_stride=2, conv_stride=1, order=order)
    _diff(ours, oracle, cmid)

    # --- k1 s2 downsample (residual path) --------------------------------
    w = jnp.asarray(bb["layer1_block0"]["downsample"]["kernel"])
    assert w.shape[0] == 1          # converter reshaped [Cin,Cout]
    ours = sp.strided_conv(st2, w, factor=2, capacity=40,
                           offsets=np.zeros((1, 3), np.int32))
    oracle = me_sparse_conv_np(
        coords2, feats2,
        sd["detection_backbone.layer1.0.downsample.0.kernel"][None],
        tensor_stride=2, conv_stride=2, order=order)
    _diff(ours, oracle, cmid)

    # --- generative transpose k2 s2 (head up block) ----------------------
    w = jnp.asarray(head["up_block_1"]["up_kernel"])
    ours = sp.generative_transpose_conv(st2, w)
    oracle = me_generative_transpose_np(
        coords2, feats2, sd["detection_head.up_block_1.0.kernel"],
        tensor_stride=2, order=order)
    _diff(ours, oracle, cout)

    # --- k1 s1 head conv (cls/reg/centerness) ----------------------------
    w = np.asarray(head["cls_conv"])
    assert w.shape[0] == 1
    got = feats2.astype(np.float64) @ w[0].astype(np.float64)
    oracle = me_sparse_conv_np(coords2, feats2,
                               sd["detection_head.cls_conv.kernel"][None],
                               tensor_stride=2, conv_stride=1,
                               order=order)
    for i, c in enumerate(coords2):
        np.testing.assert_array_equal(got[i], oracle[tuple(int(v)
                                                           for v in c)])


def test_wrong_permutation_is_detected():
    """The oracle has teeth: feeding the zyx-layout kernel through the
    default (identity) conversion must MISMATCH — i.e. the test above
    would fail on a silently mis-ordered converter."""
    rng = np.random.default_rng(7)
    cin, cout = 6, 5
    raw = _int_weights(rng, (27, cin, cout))
    sd = {"detection_backbone.conv1.0.kernel": raw}
    params, _ = convert_state_dict(dict(sd), me_offset_order="xyz")
    w = jnp.asarray(params["detector"]["backbone"]["stem"]["kernel"])
    coords = _rand_coords(rng, 40, 1)
    feats = _int_weights(rng, (40, cin))
    st = _make_st(coords, feats, stride=1, capacity=48)
    ours = sp.strided_conv(st, w, factor=2, capacity=48)
    oracle = me_sparse_conv_np(coords, feats, raw, tensor_stride=1,
                               conv_stride=2, order="zyx")
    with pytest.raises(AssertionError):
        _diff(ours, oracle, cout)
