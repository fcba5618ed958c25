#!/usr/bin/env python
"""Numpy oracle of MinkowskiEngine's kernel-offset enumeration.

The reference's detection half stores sparse-conv kernels as ``[K, Cin,
Cout]`` where row ``k`` is ME's k-th kernel offset (ME 0.5.4 ``src/
kernel_region.hpp`` RegionIterator over a HYPER_CUBE region).  Converting
a published ``.pth`` therefore requires knowing ME's exact enumeration —
a silently wrong row order would destroy detection mAP while every shape
still matches (``tools/convert_checkpoint.py:14-17``).

ME cannot be installed in this sandbox (no egress, CUDA-only wheels), so
this module transcribes the documented RegionIterator semantics and pins
our ``ops.sparse.kernel_offsets`` to them by test
(``tests/test_tools_contract.py``):

* bounds per spatial axis: odd kernels are centered,
  ``[-(k//2)·d, +(k//2)·d]``; even kernels are forward,
  ``[0, (k-1)·d]`` — ME's region has no half-offset concept;
* iteration order: the region iterator's ``operator++`` increments the
  FIRST spatial coordinate and carries rightward on wrap, i.e. the first
  coordinate varies fastest (public spconv<->ME weight converters
  transpose the kernel grid because spconv enumerates the LAST axis
  fastest — that permutation is exactly ``--me-offset-order zyx``);
* generative transposed conv (k2 s2, ``MinkowskiGenerativeConvolution
  Transpose``): every input voxel at coordinate ``c`` (tensor stride
  ``2s``) emits the 8 children ``c + o·s`` for region offsets ``o`` of
  the TRANSPOSED region — even bounds again ``{0, 1}`` per axis, first
  coordinate fastest; an output child gathers input rows via kernel row
  ``k`` iff ``child == input + offs[k]·s``.

``self_check()`` (also run by the test suite) verifies our
``kernel_offsets`` and the search-free decoder's child enumeration both
match this oracle on toy coordinate sets.  If a real checkpoint ever
disagrees (detectable via ``tools/activation_parity.py`` once a torch+ME
environment exists), ``convert_checkpoint.py --me-offset-order zyx``
applies the transpose per 3D kernel.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def me_region_offsets(kernel_size: int, dilation: int = 1,
                      ndim: int = 3) -> np.ndarray:
    """[k^ndim, ndim] offsets in ME RegionIterator order (oracle)."""
    if kernel_size % 2 == 1:
        lo = -(kernel_size // 2) * dilation
    else:
        lo = 0
    axis_vals = [lo + i * dilation for i in range(kernel_size)]
    cur = [0] * ndim                      # per-axis value indices
    out = [tuple(axis_vals[i] for i in cur)]
    for _ in range(kernel_size ** ndim - 1):
        for ax in range(ndim):            # first axis increments first
            cur[ax] += 1
            if cur[ax] < kernel_size:
                break                     # no carry -> done
            cur[ax] = 0                   # wrap, carry to next axis
        out.append(tuple(axis_vals[i] for i in cur))
    return np.asarray(out, np.int32)


def me_generative_transpose_children(coords: np.ndarray,
                                     stride: int) -> np.ndarray:
    """Output coordinates of a k2-s2 generative transpose (oracle).

    coords: [N, 3] input coordinates at tensor stride ``stride`` (even).
    Returns [N, 8, 3]: row i holds input i's children in kernel-row
    order — child j corresponds to kernel offset row j.
    """
    half = stride // 2
    offs = me_region_offsets(2, ndim=3) * half            # [8,3] in {0,h}
    return coords[:, None, :] + offs[None, :, :]


def region_offsets_order(kernel_size: int, order: str,
                         dilation: int = 1, ndim: int = 3) -> np.ndarray:
    """Offsets under either published enumeration.

    'xyz' = first coordinate fastest (ME RegionIterator, the oracle
    above); 'zyx' = last coordinate fastest (the spconv-style layout
    some converters emit — exactly the grid transpose
    ``--me-offset-order zyx`` undoes).
    """
    if order == "xyz":
        return me_region_offsets(kernel_size, dilation, ndim)
    k = kernel_size
    xyz = me_region_offsets(k, dilation, ndim)
    return xyz.reshape((k,) * ndim + (ndim,)).transpose(
        tuple(range(ndim - 1, -1, -1)) + (ndim,)).reshape(-1, ndim)


def me_sparse_conv_np(coords: np.ndarray, feats: np.ndarray,
                      kernel: np.ndarray, tensor_stride: int = 1,
                      conv_stride: int = 1, order: str = "xyz") -> dict:
    """Numpy oracle of ME ``MinkowskiConvolution`` forward.

    The ground truth the converter test diffs against: a dict-based
    re-statement of ME's conv semantics (``fcaf3d_backbone.py:25-48``
    usage) with NO shared code with ``ops.sparse`` —

    * output coordinates: the input set itself when ``conv_stride == 1``
      (submanifold), else ``unique(c // s' * s')`` at the new tensor
      stride ``s' = tensor_stride * conv_stride``;
    * out[o] = sum_k feats[row at o + offs[k]] @ kernel[k], offsets in
      INPUT tensor-stride units, row k enumerated per ``order``.

    coords: [N, 3] int, multiples of ``tensor_stride``; kernel:
    [K, Cin, Cout] raw torch/ME layout.  Returns {coord tuple: [Cout]}.
    """
    K = kernel.shape[0]
    ks = round(K ** (1 / 3)) if K > 1 else 1
    assert ks ** 3 == K
    offs = region_offsets_order(ks, order) * tensor_stride
    table = {tuple(c): i for i, c in enumerate(coords.tolist())}
    s_out = tensor_stride * conv_stride
    if conv_stride == 1:
        out_coords = [tuple(c) for c in coords.tolist()]
    else:
        out_coords = sorted({
            tuple((np.asarray(c) // s_out * s_out).tolist())
            for c in coords.tolist()})
    out = {}
    for oc in out_coords:
        acc = np.zeros((kernel.shape[2],), np.float64)
        for k in range(K):
            i = table.get(tuple(np.asarray(oc) + offs[k]))
            if i is not None:
                acc = acc + feats[i].astype(np.float64) @ \
                    kernel[k].astype(np.float64)
        out[oc] = acc
    return out


def me_generative_transpose_np(coords: np.ndarray, feats: np.ndarray,
                               kernel: np.ndarray, tensor_stride: int,
                               order: str = "xyz") -> dict:
    """Numpy oracle of ``MinkowskiGenerativeConvolutionTranspose`` k2 s2
    (``fcaf3d_head.py:72-78``): every input emits its 8 stride/2
    children; child j of parent c sits at ``c + offs[j] * stride//2``
    and carries ``feats @ kernel[j]`` (children of distinct parents are
    distinct, so no accumulation).  kernel: [8, Cin, Cout] raw layout,
    row order per ``order``.  Returns {coord tuple: [Cout]}."""
    offs = region_offsets_order(2, order) * (tensor_stride // 2)
    out = {}
    for i, c in enumerate(coords.tolist()):
        for j in range(8):
            oc = tuple(np.asarray(c) + offs[j])
            assert oc not in out, "children must be unique"
            out[oc] = feats[i].astype(np.float64) @ \
                kernel[j].astype(np.float64)
    return out


def self_check() -> None:
    """Pin the framework's enumerations to the oracle."""
    from cnrma_tpu.ops.sparse import kernel_offsets

    for k, d in ((3, 1), (2, 1), (3, 2), (2, 2), (5, 1)):
        ours = kernel_offsets(k, d)
        oracle = me_region_offsets(k, d)
        np.testing.assert_array_equal(
            np.asarray(ours), oracle,
            err_msg=f"kernel_offsets({k},{d}) diverges from the ME "
                    f"RegionIterator oracle")

    # the search-free decoder enumerates children p-major with the child
    # sub-index in {0,1}^3 first-coordinate-fastest — the same order the
    # oracle's generative transpose emits them per parent
    parents = np.array([[0, 0, 0], [4, 2, 0], [2, 4, 6]], np.int32)
    children = me_generative_transpose_children(parents, stride=2)
    offs = me_region_offsets(2) * 1                        # stride//2 = 1
    for j in range(8):
        np.testing.assert_array_equal(children[:, j, :],
                                      parents + offs[j][None, :])

    # --me-offset-order zyx is exactly the grid transpose: applying it
    # twice is the identity, and it maps the oracle's x-fastest rows onto
    # a z-fastest (row-major meshgrid) enumeration
    k = 3
    xyz = me_region_offsets(k)
    zyx = xyz.reshape(k, k, k, 3).transpose(2, 1, 0, 3).reshape(-1, 3)
    row_major = np.array([(x, y, z)
                          for x in (-1, 0, 1)
                          for y in (-1, 0, 1)
                          for z in (-1, 0, 1)], np.int32)
    np.testing.assert_array_equal(zyx, row_major)
    print("me_offset_oracle: all enumerations match")


if __name__ == "__main__":
    self_check()
