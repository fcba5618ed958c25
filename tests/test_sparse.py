import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnrma_tpu.ops.voxelize import (
    SENTINEL_KEY, VoxelGrid, lookup, sort_by_key, unique_sorted)
from cnrma_tpu.ops.sparse import (
    SparseTensor, add_into, apply_sparse_conv, downsample_coords,
    generative_transpose_conv, interpolate_at, kernel_map, kernel_offsets,
    max_pool, prune_topk, strided_conv, subm_conv, voxelize_points)

GRID = VoxelGrid()


def dense_from_sparse(st, dim):
    """Scatter a SparseTensor into a dense [X,Y,Z,C] array (numpy)."""
    out = np.zeros(tuple(dim) + (st.feats.shape[-1],), np.float32)
    coords = np.asarray(st.coords)
    feats = np.asarray(st.feats)
    valid = np.asarray(st.valid)
    for i in range(len(coords)):
        if valid[i]:
            x, y, z = coords[i]
            out[x, y, z] = feats[i]
    return out


def make_sparse(coords, feats, capacity=None, stride=1):
    coords = np.asarray(coords, np.int32)
    feats = np.asarray(feats, np.float32)
    n = len(coords)
    capacity = capacity or n
    keys = GRID.pack(jnp.asarray(coords))
    pad = capacity - n
    keys = jnp.concatenate(
        [keys, jnp.full((pad,), SENTINEL_KEY, jnp.int32)])
    coords_p = np.concatenate(
        [coords, np.zeros((pad, 3), np.int32)])
    feats_p = np.concatenate(
        [feats, np.zeros((pad, feats.shape[1]), np.float32)])
    ks, cs, fs = sort_by_key(keys, jnp.asarray(coords_p),
                             jnp.asarray(feats_p))
    return SparseTensor(keys=ks, coords=cs, feats=fs, stride=stride,
                        grid=GRID)


class TestVoxelGrid:
    def test_pack_unpack_roundtrip(self):
        coords = jnp.array([[0, 0, 0], [5, -3, 2], [-100, 200, 50]],
                           jnp.int32)
        keys = GRID.pack(coords)
        assert (keys != SENTINEL_KEY).all()
        np.testing.assert_array_equal(np.asarray(GRID.unpack(keys)),
                                      np.asarray(coords))

    def test_oob_is_sentinel(self):
        coords = jnp.array([[5000, 0, 0], [0, 0, 500]], jnp.int32)
        keys = GRID.pack(coords)
        np.testing.assert_array_equal(np.asarray(keys),
                                      [SENTINEL_KEY, SENTINEL_KEY])

    def test_key_order_matches_lexicographic(self):
        rng = np.random.RandomState(0)
        coords = rng.randint(-50, 50, (100, 3)).astype(np.int32)
        keys = np.asarray(GRID.pack(jnp.asarray(coords)))
        order_keys = np.argsort(keys, kind="stable")
        order_lex = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
        np.testing.assert_array_equal(coords[order_keys],
                                      coords[order_lex])


class TestUnique:
    def test_unique_and_runs(self):
        keys = jnp.array([3, 3, 5, 7, 7, 7, SENTINEL_KEY], jnp.int32)
        out, run_id, n = unique_sorted(keys, capacity=5)
        np.testing.assert_array_equal(
            np.asarray(out), [3, 5, 7, SENTINEL_KEY, SENTINEL_KEY])
        np.testing.assert_array_equal(np.asarray(run_id),
                                      [0, 0, 1, 2, 2, 2, 5])
        assert int(n) == 3

    def test_capacity_overflow_drops(self):
        keys = jnp.array([1, 2, 3, 4], jnp.int32)
        out, run_id, n = unique_sorted(keys, capacity=2)
        np.testing.assert_array_equal(np.asarray(out), [1, 2])
        assert int(n) == 4


class TestVoxelize:
    def test_mean_dedup(self):
        pts = jnp.array([[0.005, 0.005, 0.005],
                         [0.009, 0.001, 0.002],   # same 1cm voxel
                         [0.025, 0.005, 0.005]])  # different voxel
        feats = jnp.array([[1.0], [3.0], [10.0]])
        st = voxelize_points(pts, feats, jnp.array([True] * 3), 0.01,
                             capacity=8)
        valid = np.asarray(st.valid)
        assert valid.sum() == 2
        f = np.asarray(st.feats)[valid].ravel()
        np.testing.assert_allclose(sorted(f), [2.0, 10.0])

    def test_invalid_points_dropped(self):
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        feats = jnp.ones((2, 4))
        st = voxelize_points(pts, feats, jnp.array([True, False]), 0.01,
                             capacity=4)
        assert int(st.num_valid()) == 1

    def test_negative_coords(self):
        pts = jnp.array([[-0.015, -0.025, 0.005]])
        st = voxelize_points(pts, jnp.ones((1, 1)), jnp.array([True]),
                             0.01, capacity=2)
        coords = np.asarray(st.coords)[np.asarray(st.valid)]
        np.testing.assert_array_equal(coords[0], [-2, -3, 0])  # floor


class TestSubmConv:
    @pytest.mark.parametrize("n_ch", [(3, 5)])
    def test_matches_dense_conv_full_grid(self, n_ch):
        """Sparse submanifold conv on a fully-active grid == dense conv."""
        cin, cout = n_ch
        dim = (5, 6, 4)
        rng = np.random.RandomState(1)
        coords = np.argwhere(np.ones(dim))
        feats = rng.randn(len(coords), cin).astype(np.float32)
        st = make_sparse(coords, feats)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
        out = subm_conv(st, jnp.asarray(w))
        dense_out = dense_from_sparse(out, dim)

        dense_in = dense_from_sparse(st, dim)
        # dense conv: weight [K,Cin,Cout] with x-fastest offsets -> HWIO
        offs = kernel_offsets(3)
        wk = np.zeros((3, 3, 3, cin, cout), np.float32)
        for k, (ox, oy, oz) in enumerate(offs):
            # out[p] += W[k] @ in[p + off]; XLA conv is cross-correlation
            # (out[p] = sum_t wk[t] in[p + t - 1]) => tap index = off + 1
            wk[1 + ox, 1 + oy, 1 + oz] += w[k]
        ref = jax.lax.conv_general_dilated(
            dense_in[None], jnp.asarray(wk), (1, 1, 1), "SAME",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))[0]
        np.testing.assert_allclose(dense_out, np.asarray(ref), atol=1e-4)

    def test_partial_grid_neighbors_only(self):
        # two isolated voxels: center tap only
        coords = [[0, 0, 0], [10, 10, 10]]
        feats = np.array([[1.0], [2.0]], np.float32)
        st = make_sparse(coords, feats)
        w = np.zeros((27, 1, 1), np.float32)
        offs = kernel_offsets(3)
        center = int(np.argwhere((offs == 0).all(1))[0, 0])
        w[center, 0, 0] = 5.0
        w[0, 0, 0] = 100.0  # corner tap — no neighbor there
        out = subm_conv(st, jnp.asarray(w))
        vals = np.sort(np.asarray(out.feats)[np.asarray(out.valid)].ravel())
        np.testing.assert_allclose(vals, [5.0, 10.0])

    def test_kernel_map_reuse(self):
        coords = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        st = make_sparse(coords, np.ones((3, 2), np.float32))
        offs = kernel_offsets(3)
        kmap = kernel_map(st, offs)
        w = np.random.RandomState(0).randn(27, 2, 2).astype(np.float32)
        out1 = subm_conv(st, jnp.asarray(w), kmap=kmap)
        out2 = subm_conv(st, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out1.feats),
                                   np.asarray(out2.feats), atol=1e-6)


class TestLutKernelMap:
    """The dense-LUT kernel-map path (CNRMA_SPARSE_LUT_BUDGET) must be
    bit-identical to the sort-based searchsorted path."""

    def _random_st(self, rng, stride, n=64, cap=96):
        lo = np.array([-32, -32, 0]) // stride * stride
        coords = np.unique(
            rng.randint(0, 16, (n, 3)) * stride + lo, axis=0)
        feats = rng.randn(len(coords), 4).astype(np.float32)
        return make_sparse(coords, feats, capacity=cap, stride=stride)

    @pytest.mark.parametrize("stride", [4, 8, 32])
    def test_matches_sort_path(self, monkeypatch, stride):
        import cnrma_tpu.ops.sparse as sparse_mod
        rng = np.random.RandomState(stride)
        st = self._random_st(rng, stride)
        offs = kernel_offsets(3)
        idx0, fnd0 = kernel_map(st, offs)
        monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 28)
        idx1, fnd1 = kernel_map(st, offs)
        np.testing.assert_array_equal(np.asarray(fnd0), np.asarray(fnd1))
        # idx only matters where found
        f = np.asarray(fnd0)
        np.testing.assert_array_equal(np.asarray(idx0)[f],
                                      np.asarray(idx1)[f])

    def test_lut_kernel_map_under_remat(self, monkeypatch):
        """Regression: the LUT-eligibility check must be pure numpy.  Under
        a ``jax.checkpoint`` trace even jnp ops on concrete constants yield
        tracers, and an ``np.asarray`` on the scaled offsets raised
        TracerArrayConversionError when tracing the rematted detector."""
        import cnrma_tpu.ops.sparse as sparse_mod
        rng = np.random.RandomState(3)
        st = self._random_st(rng, 8)
        offs = kernel_offsets(3)
        idx0, fnd0 = kernel_map(st, offs)
        monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 28)

        @jax.jit
        @jax.checkpoint
        def km(feats):
            idx, fnd = kernel_map(st.with_feats(feats), offs)
            return idx, fnd

        idx1, fnd1 = km(st.feats)
        np.testing.assert_array_equal(np.asarray(fnd0), np.asarray(fnd1))
        f = np.asarray(fnd0)
        np.testing.assert_array_equal(np.asarray(idx0)[f],
                                      np.asarray(idx1)[f])

    def test_strided_and_pool_queries(self, monkeypatch):
        import cnrma_tpu.ops.sparse as sparse_mod
        rng = np.random.RandomState(7)
        st = self._random_st(rng, 4)
        w = rng.randn(27, 4, 3).astype(np.float32) * 0.1
        ref_conv = strided_conv(st, jnp.asarray(w), 2, 48)
        ref_pool = max_pool(st, 2, 48)
        monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 28)
        lut_conv = strided_conv(st, jnp.asarray(w), 2, 48)
        lut_pool = max_pool(st, 2, 48)
        np.testing.assert_array_equal(np.asarray(ref_conv.keys),
                                      np.asarray(lut_conv.keys))
        np.testing.assert_allclose(np.asarray(ref_conv.feats),
                                   np.asarray(lut_conv.feats), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_pool.feats),
                                   np.asarray(lut_pool.feats), atol=1e-6)

    @pytest.mark.parametrize("factor", [2, 4])
    def test_downsample_lut_identical(self, monkeypatch, factor):
        # sort-free dedup must emit byte-identical (keys, coords) incl.
        # the capacity-overflow rule (lowest keys win)
        import cnrma_tpu.ops.sparse as sparse_mod
        rng = np.random.RandomState(11)
        st = self._random_st(rng, 4, n=80, cap=120)
        for cap in (96, 5):
            k0, c0, _ = downsample_coords(st, factor, cap)
            monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 28)
            k1, c1, _ = downsample_coords(st, factor, cap)
            monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 0)
            np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    @pytest.mark.parametrize("stride,lut", [(1, 0), (4, 0),
                                            (4, 1 << 28)])
    def test_derived_strided_kmaps_identical(self, monkeypatch, stride,
                                             lut):
        """CNRMA_DERIVED_KMAPS strided-conv and max-pool outputs must be
        bit-identical to the searchsorted construction, with and without
        the LUT path underneath."""
        import cnrma_tpu.ops.sparse as sparse_mod
        rng = np.random.RandomState(17 + stride)
        st = self._random_st(rng, stride, n=96, cap=128)
        w = rng.randn(27, 4, 3).astype(np.float32) * 0.1
        # conv: exact at ample capacity (under overflow the derived path
        # documents extra loss of dropped-parent cross-cell inputs);
        # pool: exact at ANY capacity (inputs only serve their own parent)
        for cap, check_conv in ((128, True), (7, False)):
            ref_conv = strided_conv(st, jnp.asarray(w), 2, cap)
            ref_pool = max_pool(st, 2, cap)
            monkeypatch.setattr(sparse_mod, "DERIVED_KMAPS", 1)
            monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", lut)
            got_conv = strided_conv(st, jnp.asarray(w), 2, cap)
            got_pool = max_pool(st, 2, cap)
            monkeypatch.setattr(sparse_mod, "DERIVED_KMAPS", 0)
            monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 0)
            w1 = rng.randn(1, 4, 3).astype(np.float32) * 0.1
            ref_c1 = strided_conv(st, jnp.asarray(w1), 2, cap)
            monkeypatch.setattr(sparse_mod, "DERIVED_KMAPS", 1)
            got_c1 = strided_conv(st, jnp.asarray(w1), 2, cap)
            monkeypatch.setattr(sparse_mod, "DERIVED_KMAPS", 0)
            pairs = [(ref_pool, got_pool), (ref_c1, got_c1)]
            if check_conv:
                pairs.append((ref_conv, got_conv))
            else:   # coordinate sets still agree under overflow
                np.testing.assert_array_equal(np.asarray(ref_conv.keys),
                                              np.asarray(got_conv.keys))
            for ref, got in pairs:
                np.testing.assert_array_equal(np.asarray(ref.keys),
                                              np.asarray(got.keys))
                np.testing.assert_allclose(np.asarray(ref.feats),
                                           np.asarray(got.feats),
                                           atol=1e-5, err_msg=str(
                                               (stride, lut, cap)))

    def test_partial_lattice_cells(self):
        # bounds NOT divisible by the stride: valid stride-multiple
        # coords in the partial last cell (shifted x=96 < bx=100) must
        # still be found by the LUT path (regression: floor division
        # dropped the partial cell and silently missed real rows)
        from cnrma_tpu.ops.voxelize import (lattice_cells, lookup_lut)
        grid = VoxelGrid(bounds=(100, 100, 60), shifts=(48, 48, 8))
        stride = 8
        assert lattice_cells(grid, stride) == 13 * 13 * 8
        rng = np.random.RandomState(23)
        # every lattice position incl. the partial cells (shifted 96 /
        # z-shifted 56), minus the shifts -> unshifted coords
        xs = np.arange(0, 100, stride) - 48
        zs = np.arange(0, 60, stride) - 8
        coords = np.stack(np.meshgrid(xs, xs, zs, indexing="ij"),
                          axis=-1).reshape(-1, 3).astype(np.int32)
        pick = rng.permutation(len(coords))[:64]
        coords = coords[np.sort(pick)]
        keys = np.asarray(grid.pack(jnp.asarray(coords)))
        order = np.argsort(keys)
        keys_s = jnp.asarray(keys[order])
        coords_s = jnp.asarray(coords[order])
        valid = jnp.ones((len(coords),), bool)
        # query every lattice position; the LUT answer must match lookup
        q = jnp.asarray(np.stack(np.meshgrid(xs, xs, zs, indexing="ij"),
                                 axis=-1).reshape(-1, 3).astype(np.int32))
        qv = jnp.ones((q.shape[0],), bool)
        idx_lut, fnd_lut = lookup_lut(keys_s, coords_s, grid, stride, q, qv)
        idx_ref, fnd_ref = lookup(keys_s, grid.pack(q))
        np.testing.assert_array_equal(np.asarray(fnd_lut),
                                      np.asarray(fnd_ref))
        f = np.asarray(fnd_ref)
        np.testing.assert_array_equal(np.asarray(idx_lut)[f],
                                      np.asarray(idx_ref)[f])
        assert f.sum() == 64 and f.size == 13 * 13 * 8

    def test_budget_respects_lattice_size(self, monkeypatch):
        # stride-1 lattice (2.1G cells) must NOT take the LUT path even
        # with a large-but-smaller budget
        import cnrma_tpu.ops.sparse as sparse_mod
        from cnrma_tpu.ops.voxelize import lattice_cells
        assert lattice_cells(GRID, 1) > (1 << 28)
        rng = np.random.RandomState(3)
        st = self._random_st(rng, 1)
        monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 28)
        idx, fnd = kernel_map(st, kernel_offsets(3))   # sort path, no OOM
        assert idx.shape == fnd.shape == (27, st.capacity)


class TestStridedOps:
    def test_downsample_coords(self):
        coords = [[0, 0, 0], [1, 1, 1], [2, 0, 0], [5, 5, 5]]
        st = make_sparse(coords, np.ones((4, 1), np.float32))
        keys, dcoords, _ = downsample_coords(st, 2, capacity=4)
        got = np.asarray(dcoords)[np.asarray(keys) != SENTINEL_KEY]
        expect = {(0, 0, 0), (2, 0, 0), (4, 4, 4)}
        assert {tuple(c) for c in got} == expect

    def test_strided_conv_stride_semantics(self):
        # single input voxel at (1,1,1): output coord (0,0,0) with offset
        # (+1,+1,+1) reaching it
        st = make_sparse([[1, 1, 1]], np.array([[2.0]], np.float32))
        w = np.zeros((27, 1, 1), np.float32)
        offs = kernel_offsets(3)
        k = int(np.argwhere((offs == [1, 1, 1]).all(1))[0, 0])
        w[k, 0, 0] = 3.0
        out = strided_conv(st, jnp.asarray(w), 2, capacity=2)
        assert out.stride == 2
        valid = np.asarray(out.valid)
        assert valid.sum() == 1
        np.testing.assert_array_equal(
            np.asarray(out.coords)[valid][0], [0, 0, 0])
        np.testing.assert_allclose(
            np.asarray(out.feats)[valid][0], [6.0])

    def test_max_pool(self):
        coords = [[0, 0, 0], [1, 1, 1], [2, 2, 2]]
        feats = np.array([[1.0], [7.0], [3.0]], np.float32)
        st = make_sparse(coords, feats)
        out = max_pool(st, 2, capacity=4)
        valid = np.asarray(out.valid)
        got = {(tuple(c), float(f)) for c, f in
               zip(np.asarray(out.coords)[valid],
                   np.asarray(out.feats)[valid].ravel())}
        assert ((0, 0, 0), 7.0) in got
        assert ((2, 2, 2), 3.0) in got

    def test_generative_transpose(self):
        st = make_sparse([[0, 0, 0], [2, 2, 2]],
                         np.array([[1.0], [2.0]], np.float32), stride=2)
        w = np.arange(8, dtype=np.float32).reshape(8, 1, 1) + 1
        out = generative_transpose_conv(st, jnp.asarray(w))
        assert out.stride == 1
        valid = np.asarray(out.valid)
        assert valid.sum() == 16
        coords = np.asarray(out.coords)[valid]
        # children of (0,0,0) are {0,1}^3; of (2,2,2) are {2,3}^3
        assert {tuple(c) for c in coords} == \
            {(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)} | \
            {(x, y, z) for x in (2, 3) for y in (2, 3) for z in (2, 3)}

    def test_add_into(self):
        children = make_sparse(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
            np.ones((4, 1), np.float32))
        skip = make_sparse([[1, 0, 0]], np.array([[10.0]], np.float32))
        out = add_into(children, skip)
        m = {tuple(c): float(f) for c, f in
             zip(np.asarray(out.coords), np.asarray(out.feats).ravel())}
        assert m[(1, 0, 0)] == 11.0
        assert m[(0, 0, 0)] == 1.0


class TestPruneInterp:
    def test_prune_topk(self):
        coords = [[i, 0, 0] for i in range(6)]
        st = make_sparse(coords, np.ones((6, 2), np.float32))
        scores = jnp.array([0.1, 0.9, 0.3, 0.8, 0.2, 0.7])
        out = prune_topk(st, scores, keep=3)
        valid = np.asarray(out.valid)
        assert valid.sum() == 3
        kept_x = sorted(np.asarray(out.coords)[valid][:, 0].tolist())
        assert kept_x == [1, 3, 5]

    def test_interpolate_at_exact_and_mid(self):
        st = make_sparse([[0, 0, 0], [2, 0, 0]],
                         np.array([[1.0], [3.0]], np.float32), stride=2)
        pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                         [2.0, 0.0, 0.0]])
        out = np.asarray(interpolate_at(st, pos, jnp.array([True] * 3)))
        np.testing.assert_allclose(out.ravel(), [1.0, 2.0, 3.0], atol=1e-5)

    def test_interpolate_missing_is_zero_weighted(self):
        st = make_sparse([[0, 0, 0]], np.array([[4.0]], np.float32),
                         stride=2)
        out = np.asarray(interpolate_at(
            st, jnp.array([[1.0, 0.0, 0.0]]), jnp.array([True])))
        # halfway to a missing neighbor: only 0.5 weight on the present one
        np.testing.assert_allclose(out.ravel(), [2.0], atol=1e-5)


class TestChildDerivation:
    """The search-free decoder path (child kernel maps / skip-add /
    trilinear prune scores derived arithmetically from the parent 27-map)
    must match the searchsorted reference path bit-for-bit in structure."""

    def _setup(self):
        from cnrma_tpu.ops.sparse import (
            add_skip_into_children, derive_child_kmap,
            interpolate_children_scores)
        rng = np.random.RandomState(5)
        # parent tensor at stride 2 (coords even), some capacity padding
        all_coords = np.array([(x, y, z) for x in range(0, 12, 2)
                               for y in range(0, 12, 2)
                               for z in range(0, 8, 2)])
        pick = rng.choice(len(all_coords), 40, replace=False)
        pcoords = all_coords[pick]
        c_in, c_out = 6, 5
        st = make_sparse(pcoords, rng.rand(40, c_in), capacity=48,
                         stride=2)
        w_up = rng.rand(8, c_in, c_out).astype(np.float32) * 0.3
        w_conv = rng.rand(27, c_out, c_out).astype(np.float32) * 0.2
        # skip tensor: children of some parents + strays whose parent
        # is NOT in the set (must be dropped by both paths)
        sk_coords = []
        for p in pcoords[:15]:
            sk_coords.append(p + rng.randint(0, 2, 3))
        sk_coords.append(np.array([101, 3, 3]))   # stray (odd parent)
        sk_coords = np.unique(np.asarray(sk_coords), axis=0)
        skip = make_sparse(sk_coords, rng.rand(len(sk_coords), c_out),
                           capacity=24, stride=1)
        scores = rng.rand(48).astype(np.float32) * 10
        return (st, skip, w_up, w_conv, scores, derive_child_kmap,
                add_skip_into_children, interpolate_children_scores)

    def test_fast_path_matches_search_path(self):
        (st, skip, w_up, w_conv, scores, derive_child_kmap,
         add_skip_into_children, interpolate_children_scores) = \
            self._setup()
        keep = 100

        # --- reference path: sorted children + searchsorted everywhere
        y = generative_transpose_conv(st, jnp.asarray(w_up))
        y = y.with_feats(apply_sparse_conv(
            y.feats, jnp.asarray(w_conv),
            *kernel_map(y, kernel_offsets(3))))
        y = add_into(y, skip)
        score_st = st.with_feats(jnp.asarray(scores)[:, None])
        sc = interpolate_at(score_st, y.coords.astype(jnp.float32),
                            y.valid)[:, 0]
        old = prune_topk(y, sc, keep)

        # --- fast path: unsorted p-major children, derived maps
        kmap27 = kernel_map(st, kernel_offsets(3))
        y2 = generative_transpose_conv(st, jnp.asarray(w_up), sort=False)
        y2 = y2.with_feats(apply_sparse_conv(
            y2.feats, jnp.asarray(w_conv), *derive_child_kmap(kmap27)))
        y2 = add_skip_into_children(y2, skip, st.keys)
        sc2 = interpolate_children_scores(jnp.asarray(scores), kmap27,
                                          st.valid)
        new = prune_topk(y2, sc2, keep)

        np.testing.assert_array_equal(np.asarray(old.keys),
                                      np.asarray(new.keys))
        np.testing.assert_array_equal(np.asarray(old.coords),
                                      np.asarray(new.coords))
        np.testing.assert_allclose(np.asarray(old.feats),
                                   np.asarray(new.feats), atol=1e-5)

    def test_full_lut_no_sort_matches_sorted(self, monkeypatch):
        """Full-LUT decoder mode: LUT lookups + prune_topk(sort=False)
        must yield the same row MULTISET as the sorted searchsorted
        path (rows come back in score order instead of key order)."""
        import cnrma_tpu.ops.sparse as sparse_mod
        from cnrma_tpu.ops.sparse import (
            add_skip_into_children, derive_child_kmap,
            interpolate_children_scores)
        # a small grid so every stride's lattice fits a CPU-sized LUT
        grid = VoxelGrid(bounds=(32, 32, 16), shifts=(0, 0, 0))

        def mk(coords, feats, capacity, stride):
            coords = np.asarray(coords, np.int32)
            feats = np.asarray(feats, np.float32)
            keys = grid.pack(jnp.asarray(coords))
            pad = capacity - len(coords)
            keys = jnp.concatenate(
                [keys, jnp.full((pad,), SENTINEL_KEY, jnp.int32)])
            cs = jnp.asarray(np.concatenate(
                [coords, np.zeros((pad, 3), np.int32)]))
            fs = jnp.asarray(np.concatenate(
                [feats, np.zeros((pad, feats.shape[1]), np.float32)]))
            ks, cs, fs = sort_by_key(keys, cs, fs)
            return SparseTensor(keys=ks, coords=cs, feats=fs,
                                stride=stride, grid=grid)

        rng = np.random.RandomState(9)
        all_coords = np.array([(x, y, z) for x in range(0, 12, 2)
                               for y in range(0, 12, 2)
                               for z in range(0, 8, 2)])
        pick = rng.choice(len(all_coords), 40, replace=False)
        pcoords = all_coords[pick]
        c_in, c_out = 6, 5
        st = mk(pcoords, rng.rand(40, c_in), 48, 2)
        w_up = jnp.asarray(rng.rand(8, c_in, c_out).astype(np.float32))
        w_conv = jnp.asarray(
            rng.rand(27, c_out, c_out).astype(np.float32) * 0.2)
        sk_coords = np.unique(np.asarray(
            [p + rng.randint(0, 2, 3) for p in pcoords[:15]]), axis=0)
        skip = mk(sk_coords, rng.rand(len(sk_coords), c_out), 24, 1)
        scores = jnp.asarray(rng.rand(48).astype(np.float32) * 10)
        keep = 64

        def run():
            kmap27 = kernel_map(st, kernel_offsets(3))
            y = generative_transpose_conv(st, w_up, sort=False)
            y = y.with_feats(apply_sparse_conv(
                y.feats, w_conv, *derive_child_kmap(kmap27)))
            y = add_skip_into_children(y, skip, st.keys, parent=st)
            sc = interpolate_children_scores(scores, kmap27, st.valid)
            resort = not sparse_mod.lut_eligible(grid, y.stride)
            return prune_topk(y, sc, keep, sort=resort), resort

        ref, resort0 = run()
        assert resort0          # budget off -> sorted path
        monkeypatch.setattr(sparse_mod, "LUT_CELL_BUDGET", 1 << 20)
        got, resort1 = run()
        assert not resort1      # budget on -> sort skipped
        # same multiset of (key, feats) rows
        rk, gk = np.asarray(ref.keys), np.asarray(got.keys)
        order = np.argsort(gk)
        np.testing.assert_array_equal(rk, gk[order])
        np.testing.assert_allclose(np.asarray(ref.feats),
                                   np.asarray(got.feats)[order],
                                   atol=1e-5)
        # and a follow-up kernel map over the UNSORTED tensor is usable:
        # conv results match the sorted reference row-for-row
        out_ref = apply_sparse_conv(
            ref.feats, w_conv, *kernel_map(ref, kernel_offsets(3)))
        out_got = apply_sparse_conv(
            got.feats, w_conv, *kernel_map(got, kernel_offsets(3)))
        np.testing.assert_allclose(np.asarray(out_ref),
                                   np.asarray(out_got)[order], atol=1e-5)

    def test_fast_path_over_capacity_ranking(self):
        (st, skip, w_up, w_conv, scores, derive_child_kmap,
         add_skip_into_children, interpolate_children_scores) = \
            self._setup()
        kmap27 = kernel_map(st, kernel_offsets(3))
        y2 = generative_transpose_conv(st, jnp.asarray(w_up), sort=False)
        sc2 = interpolate_children_scores(jnp.asarray(scores), kmap27,
                                          st.valid)

        y = generative_transpose_conv(st, jnp.asarray(w_up))
        score_st = st.with_feats(jnp.asarray(scores)[:, None])
        sc = interpolate_at(score_st, y.coords.astype(jnp.float32),
                            y.valid)[:, 0]
        # interpolated scores agree exactly per coordinate
        m_old = dict(zip(np.asarray(y.keys).tolist(),
                         np.asarray(sc).tolist()))
        m_new = dict(zip(np.asarray(y2.keys).tolist(),
                         np.asarray(sc2).tolist()))
        assert set(m_old) == set(m_new)
        for k in m_old:
            assert abs(m_old[k] - m_new[k]) < 1e-5

        # cut fewer than the valid children at a tie-free boundary
        # (exact score ties — symmetric children — break by position
        # order, which legitimately differs between the two layouts)
        srt = np.sort(np.asarray(sc))[::-1]
        keep = next(k for k in range(60, 120)
                    if srt[k - 1] - srt[k] > 1e-4)
        new = prune_topk(y2, sc2, keep)
        old = prune_topk(y, sc, keep)
        np.testing.assert_array_equal(np.asarray(old.keys),
                                      np.asarray(new.keys))


class TestVmap:
    def test_vmap_over_scenes(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(2, 64, 4).astype(np.float32))
        valid = jnp.ones((2, 64), bool)

        def per_scene(p, f, v):
            st = voxelize_points(p, f, v, 0.1, capacity=128)
            w = jnp.asarray(
                rng.randn(27, 4, 8).astype(np.float32) * 0.1)
            out = subm_conv(st, w)
            return out.feats.sum()

        vals = jax.vmap(per_scene)(pts, feats, valid)
        assert vals.shape == (2,)
        assert np.isfinite(np.asarray(vals)).all()
