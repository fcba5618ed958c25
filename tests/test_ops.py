import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnrma_tpu.ops.backproject import accumulate_views, backproject_view
from cnrma_tpu.ops.ray_marching import (
    get_ray_parameters, neus_weights, ray_march_depth, ray_march_neus)
from cnrma_tpu.ops.iou3d import (
    aligned_iou_3d, iou_3d_matrix, rotated_iou_3d,
    rotated_rect_intersection_area, rect_corners_bev)
from cnrma_tpu.ops.nms import multiclass_nms_np, nms_bev
from cnrma_tpu.ops.losses import bce_loss, sigmoid_focal_loss, log_transform


def simple_projection(fx=10.0, fy=10.0, cx=8.0, cy=6.0):
    """Camera at origin looking down +z with world +z = camera +z."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)  # camera-to-world
    return (K @ np.linalg.inv(E)[:3, :]).astype(np.float32)


class TestBackproject:
    def test_center_pixel_hits_axis_voxels(self):
        H, W, C = 12, 16, 4
        proj = simple_projection()
        feat = np.zeros((H, W, C), np.float32)
        feat[6, 8] = np.arange(1, C + 1)  # principal-point pixel
        vol, valid = backproject_view(
            jnp.asarray(proj), jnp.asarray(feat), (8, 8, 8), 0.25,
            jnp.array([-1.0, -1.0, 0.1]))
        vol = np.asarray(vol).reshape(8, 8, 8, C)   # unfold [X,Y,Z*C]
        valid = np.asarray(valid)
        # voxels on the optical axis (x=y=0 world, i.e. index 4,4) should get
        # the principal pixel's feature
        np.testing.assert_allclose(vol[4, 4, 2], np.arange(1, C + 1))
        assert valid[4, 4, 2]
        # voxels behind the camera are invalid
        assert valid.sum() > 0

    def test_accumulate_mean_two_views(self):
        H, W, C = 12, 16, 2
        proj = simple_projection()
        f1 = np.full((H, W, C), 2.0, np.float32)
        f2 = np.full((H, W, C), 4.0, np.float32)
        projections = jnp.asarray(np.stack([proj, proj]))
        feats = jnp.asarray(np.stack([f1, f2]))
        vol, valid = accumulate_views(
            projections, feats, jnp.array([True, True]), (8, 8, 8), 0.25,
            jnp.array([-1.0, -1.0, 0.1]))
        vol = np.asarray(vol)
        valid = np.asarray(valid)
        assert valid.any()
        np.testing.assert_allclose(vol[np.asarray(valid)], 3.0, atol=1e-5)

    def test_view_sharded_matches_scan(self):
        """accumulate_views_view_sharded over an 8-device ('view',) mesh
        must equal the single-device scan path (the accumulator is a
        commutative sum combined by one psum — SURVEY.md §5)."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from cnrma_tpu.ops.backproject import (
            accumulate_views, accumulate_views_view_sharded)
        from cnrma_tpu.parallel.mesh import make_mesh

        rng = np.random.RandomState(0)
        V, H, W, C = 8, 6, 8, 4
        dim = (5, 6, 7)
        feats = jnp.asarray(rng.rand(V, H, W, C).astype(np.float32))
        projs = []
        for i in range(V):
            K = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]])
            E = np.eye(4)
            E[:3, 3] = [0.1 * i - 0.25, -0.1, -1.0]
            projs.append((K @ np.linalg.inv(E)[:3]).astype(np.float32))
        projs = jnp.asarray(np.stack(projs))
        valid = jnp.asarray(np.array([True] * 6 + [False] * 2))
        origin = jnp.zeros(3, jnp.float32)

        ref_vol, ref_ok = accumulate_views(projs, feats, valid, dim, 0.2,
                                           origin)
        mesh = make_mesh(8, axis_names=("view",))
        got_vol, got_ok = accumulate_views_view_sharded(
            mesh, projs, feats, valid, dim, 0.2, origin)
        np.testing.assert_allclose(np.asarray(got_vol),
                                   np.asarray(ref_vol), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_ok),
                                      np.asarray(ref_ok))

    def test_tiled_matches_dense(self):
        """Frustum-tile culling must reproduce the dense path exactly
        (forward AND feature gradients) when the in-frustum tile count
        fits the capacity."""
        rng = np.random.RandomState(1)
        V, H, W, C = 3, 12, 16, 4
        dim = (16, 16, 8)          # 2x2x1 = 4 tiles of 8^3
        feats = jnp.asarray(rng.rand(V, H, W, C).astype(np.float32))
        proj = simple_projection()
        projs = jnp.asarray(np.stack([proj] * V))
        valid = jnp.array([True, True, False])
        origin = jnp.array([-1.9, -0.1, 0.1])  # frustum covers ~1 tile col
        args = (projs, feats, valid, dim, 0.25, origin)

        dense = accumulate_views(*args)
        tiled = accumulate_views(*args, tile=8, tile_capacity=2)
        np.testing.assert_allclose(np.asarray(tiled[0]),
                                   np.asarray(dense[0]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(tiled[1]),
                                      np.asarray(dense[1]))

        def loss(fn):
            def f(feats_):
                vol, _ = fn(projs, feats_, valid, dim, 0.25, origin)
                return jnp.sum(vol * vol) + jnp.sum(vol)
            return jax.grad(f)(feats)
        g_dense = loss(lambda *a: accumulate_views(*a))
        g_tiled = loss(lambda *a: accumulate_views(*a, tile=8,
                                                   tile_capacity=2))
        np.testing.assert_allclose(np.asarray(g_tiled),
                                   np.asarray(g_dense), atol=1e-5)

    def test_bf16_accumulator_close_to_fp32(self):
        """`bp_accum_dtype='bfloat16'` halves the accumulator's HBM
        traffic; the normalized mean volume must stay within ~1% of the
        fp32 reference and the view counts must be EXACT (counts are
        pinned to fp32 regardless of accum_dtype)."""
        rng = np.random.RandomState(7)
        V, H, W, C = 8, 12, 16, 4
        dim = (16, 16, 8)
        feats = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
        proj = simple_projection()
        projs = jnp.asarray(np.stack([proj] * V))
        valid = jnp.ones((V,), bool)
        origin = jnp.array([-1.0, -1.0, 0.1])
        for kw in ({}, dict(tile=8, tile_capacity=4)):   # dense + tiled
            ref_vol, ref_ok = accumulate_views(
                projs, feats, valid, dim, 0.25, origin, **kw)
            b_vol, b_ok = accumulate_views(
                projs, feats, valid, dim, 0.25, origin,
                accum_dtype=jnp.bfloat16, **kw)
            np.testing.assert_array_equal(np.asarray(b_ok),
                                          np.asarray(ref_ok))
            r = np.asarray(ref_vol)[np.asarray(ref_ok)]
            b = np.asarray(b_vol)[np.asarray(ref_ok)]
            rel = np.abs(b - r) / (np.abs(r) + 1e-3)
            assert np.median(rel) < 0.01, (kw, np.median(rel))
            # near-zero means cancel, so the tail is bounded in ABSOLUTE
            # terms (what the bf16 U-Net consuming the volume resolves)
            assert np.abs(b - r).max() < 0.05, (kw, np.abs(b - r).max())

    def test_rect_matches_dense(self):
        """The rect-footprint path (span gather + one-hot matmul for
        small-footprint tiles, row gather for oversized ones) must
        reproduce the dense path exactly — forward AND gradients — when
        both capacities fit."""
        rng = np.random.RandomState(5)
        V, H, W, C = 3, 24, 32, 4
        dim = (16, 16, 8)              # 4 tiles of 8^3
        feats = jnp.asarray(rng.rand(V, H, W, C).astype(np.float32))
        proj = simple_projection()
        # vary projections so footprints differ across views
        projs = np.stack([proj] * V).astype(np.float32)
        projs[1, :2, 3] += 1.0
        projs = jnp.asarray(projs)
        valid = jnp.array([True, True, False])
        origin = jnp.array([-1.9, -0.1, 0.1])
        args = (projs, feats, valid, dim, 0.25, origin)

        dense = accumulate_views(*args)
        for rect in ((64, 64),      # everything fits the rect path
                     (2, 2)):       # everything overflows to row gather
            got = accumulate_views(*args, tile=8, tile_capacity=4,
                                   rect=rect, rect_capacity=4)
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(dense[0]), atol=1e-6,
                                       err_msg=str(rect))
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(dense[1]))

        def loss(fn):
            def f(feats_):
                vol, _ = fn(projs, feats_, valid, dim, 0.25, origin)
                return jnp.sum(vol * vol) + jnp.sum(vol)
            return jax.grad(f)(feats)
        g_dense = loss(lambda *a: accumulate_views(*a))
        g_rect = loss(lambda *a: accumulate_views(
            *a, tile=8, tile_capacity=4, rect=(64, 64), rect_capacity=4))
        np.testing.assert_allclose(np.asarray(g_rect),
                                   np.asarray(g_dense), atol=1e-5)

    def test_rect_pallas_matches_dense(self, monkeypatch):
        """The Pallas rect gather (interpret mode on CPU) must reproduce
        the dense path exactly — forward AND gradients — including the
        aligned-start reclassification (snap-down can flip a borderline
        tile to the overflow row-gather path; both paths are exact)."""
        monkeypatch.setenv("CNRMA_BP_PALLAS", "interpret")
        rng = np.random.RandomState(5)
        V, H, W, C = 2, 16, 32, 32        # eligible: C=32, H%4, W%16
        dim = (16, 16, 8)                 # 4 tiles of 8^3 -> t3=512
        feats = jnp.asarray(rng.rand(V, H, W, C).astype(np.float32))
        proj = simple_projection()
        projs = np.stack([proj] * V).astype(np.float32)
        projs[1, :2, 3] += 1.0
        projs = jnp.asarray(projs)
        valid = jnp.array([True, True])
        origin = jnp.array([-1.9, -0.1, 0.1])
        args = (projs, feats, valid, dim, 0.25, origin)

        dense = accumulate_views(*args)
        for rect in ((16, 32),    # most tiles fit the aligned rect
                     (4, 16)):    # most overflow to the row gather
            got = accumulate_views(*args, tile=8, tile_capacity=4,
                                   rect=rect, rect_capacity=4)
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(dense[0]), atol=1e-6,
                                       err_msg=str(rect))
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(dense[1]))

        def loss(fn):
            def f(feats_):
                vol, _ = fn(projs, feats_, valid, dim, 0.25, origin)
                return jnp.sum(vol * vol) + jnp.sum(vol)
            return jax.grad(f)(feats)
        g_dense = loss(lambda *a: accumulate_views(*a))
        g_pl = loss(lambda *a: accumulate_views(
            *a, tile=8, tile_capacity=4, rect=(16, 32), rect_capacity=4))
        np.testing.assert_allclose(np.asarray(g_pl),
                                   np.asarray(g_dense), atol=1e-5)

    def test_rect_pallas_ineligible_shapes_fall_back(self, monkeypatch):
        """Shapes the kernel can't take (C != 32 here) silently use the
        XLA rect path even when the knob forces Pallas on."""
        monkeypatch.setenv("CNRMA_BP_PALLAS", "interpret")
        rng = np.random.RandomState(3)
        feats = jnp.asarray(rng.rand(1, 16, 32, 4).astype(np.float32))
        projs = jnp.asarray(simple_projection()[None])
        valid = jnp.array([True])
        origin = jnp.array([-1.9, -0.1, 0.1])
        args = (projs, feats, valid, (16, 16, 8), 0.25, origin)
        dense = accumulate_views(*args)
        got = accumulate_views(*args, tile=8, tile_capacity=4,
                               rect=(16, 32), rect_capacity=4)
        np.testing.assert_allclose(np.asarray(got[0]),
                                   np.asarray(dense[0]), atol=1e-6)

    def test_tiled_overflow_keeps_fullest_tiles(self):
        """Over capacity, the fullest tiles win and dropped tiles lose
        only that view's contribution (count stays consistent with the
        kept tiles — no garbage values)."""
        rng = np.random.RandomState(2)
        H, W, C = 12, 16, 2
        dim = (16, 16, 8)
        feats = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32))
        proj = simple_projection()
        projs = jnp.asarray(proj[None])
        valid = jnp.array([True])
        origin = jnp.array([-2.0, -2.0, 0.1])   # frustum spans all tiles
        dense_vol, dense_ok = accumulate_views(
            projs, feats, valid, dim, 0.25, origin)
        tiled_vol, tiled_ok = accumulate_views(
            projs, feats, valid, dim, 0.25, origin, tile=8,
            tile_capacity=1)
        dv, tv = np.asarray(dense_vol), np.asarray(tiled_vol)
        dok, tok = np.asarray(dense_ok), np.asarray(tiled_ok)
        assert tok.sum() < dok.sum() and tok.sum() > 0
        # kept voxels match the dense result exactly
        np.testing.assert_allclose(tv[tok], dv[tok], atol=1e-6)
        assert not tv[~tok].any()

    def test_padded_view_ignored(self):
        H, W, C = 12, 16, 2
        proj = simple_projection()
        f1 = np.full((H, W, C), 2.0, np.float32)
        f2 = np.full((H, W, C), 100.0, np.float32)
        vol, _ = accumulate_views(
            jnp.asarray(np.stack([proj, proj])),
            jnp.asarray(np.stack([f1, f2])),
            jnp.array([True, False]), (8, 8, 8), 0.25,
            jnp.array([-1.0, -1.0, 0.1]))
        assert np.asarray(vol).max() <= 2.0 + 1e-5


class TestRayMarching:
    def test_ray_parameters(self):
        proj = jnp.asarray(simple_projection())
        o, d = get_ray_parameters(proj, 12, 16)
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-5)
        # center pixel ray points along +z
        center = np.asarray(d).reshape(12, 16, 3)[6, 8]
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)

    def test_neus_weights_peak_at_surface(self):
        # along a ray: observed empty (negative) -> behind surface (positive)
        # (Atlas sign convention, dist = pz - depth); sharp crossing at
        # samples 9..11 like a real 3-voxel truncation band
        t = np.ones((1, 20), np.float32)
        t[0, :9] = -1.0
        t[0, 9:12] = [-0.6, 0.0, 0.6]
        w = np.asarray(neus_weights(jnp.asarray(t)))[0]
        assert w.argmax() in (8, 9, 10, 11)
        assert w.max() > 0.05
        assert w[:5].max() < 1e-6

    def test_neus_weights_match_reference_cumprod(self):
        # cumsum-of-logs formulation == direct cumprod formulation
        rng = np.random.RandomState(0)
        t = np.cumsum(rng.rand(4, 30).astype(np.float32) * 0.3,
                      axis=1) - 2.0
        w = np.asarray(neus_weights(jnp.asarray(t)))
        sig = 1 / (1 + np.exp(t))
        sig_next = np.concatenate([sig[:, 1:], sig[:, -1:]], axis=1)
        alpha = np.clip((sig - sig_next) / sig, 0, None)
        T = np.cumprod(1 - alpha, axis=1)
        T = np.concatenate([np.ones((4, 1), np.float32), T[:, :-1]], axis=1)
        np.testing.assert_allclose(w, T * alpha, atol=1e-5)

    def test_ray_march_neus_wall(self):
        # wall at z=1.0 in a 16^3 volume of 0.125m voxels; camera looks down
        # +z, so tsdf goes negative (empty) -> positive (behind wall)
        n, vs = 16, 0.125
        z = (np.arange(n) * vs)
        tsdf = np.broadcast_to(
            np.clip((z - 1.0) / (3 * vs), -1, 1)[None, None, :],
            (n, n, n)).copy()
        origin = jnp.array([-1.0, -0.75, 0.0])
        proj = jnp.asarray(simple_projection())
        pts = ray_march_neus(proj, jnp.asarray(tsdf, jnp.float32),
                             (n, n, n), vs, origin, 12, 16,
                             view_index=3, n_samples=64,
                             weight_threshold=0.05, capacity=2048)
        w = np.asarray(pts.weight)
        xyz = np.asarray(pts.xyz)
        assert (w > 0).sum() > 50
        # kept samples concentrate near the wall depth z=1.0
        kept_z = xyz[w > 0][:, 2]
        assert np.abs(np.median(kept_z) - 1.0) < 0.3
        assert (np.asarray(pts.view)[w > 0] == 3).all()

    def test_ray_march_neus_topk_exact(self):
        """The per-ray top-K pre-selection must keep EXACTLY the samples a
        brute-force threshold scan keeps (weights along a ray sum to <= 1,
        bounding the above-threshold count by 1/threshold)."""
        n, vs = 16, 0.125
        rng = np.random.RandomState(3)
        # random smooth-ish TSDF with several sign changes
        tsdf = rng.rand(n, n, n).astype(np.float32) * 2 - 1
        origin = jnp.array([-1.0, -0.75, 0.0])
        proj = jnp.asarray(simple_projection())
        h, w, ns, thr = 12, 16, 64, 0.05
        pts = ray_march_neus(proj, jnp.asarray(tsdf), (n, n, n), vs,
                             origin, h, w, view_index=0, n_samples=ns,
                             weight_threshold=thr, capacity=8192)
        # brute force: same math, no top-k
        from cnrma_tpu.ops.ray_marching import (
            _sample_tsdf, get_ray_parameters)
        import math as _m
        o, d = get_ray_parameters(proj, h, w)
        t_max = _m.sqrt(3 * n * n) * vs
        ts = np.arange(ns, dtype=np.float32) * (t_max / ns)
        places = (np.asarray(o)[None, None, :]
                  + np.asarray(d)[:, None, :] * ts[None, :, None])
        vals, valid = _sample_tsdf(jnp.asarray(tsdf),
                                   jnp.asarray(places.reshape(-1, 3)),
                                   origin, vs)
        wref = np.asarray(neus_weights(
            np.asarray(vals).reshape(h * w, ns)))
        keep_ref = (np.asarray(valid).reshape(h * w, ns)
                    & (wref >= thr))
        got = sorted(map(tuple, np.round(
            np.asarray(pts.xyz)[np.asarray(pts.weight) > 0], 4)))
        ray_ids, s_ids = np.nonzero(keep_ref)
        exp_xyz = (np.asarray(o)[None, :]
                   + np.asarray(d)[ray_ids] * ts[s_ids][:, None])
        exp = sorted(map(tuple, np.round(exp_xyz, 4)))
        assert got == exp
        # weights match too
        got_w = np.sort(np.asarray(pts.weight)[np.asarray(pts.weight) > 0])
        exp_w = np.sort(wref[keep_ref])
        np.testing.assert_allclose(got_w, exp_w, rtol=1e-5)

    def test_ray_march_over_capacity_weight_ranked(self):
        """When the above-threshold samples exceed capacity, the kept set
        must be the top-``capacity`` BY WEIGHT — not a raster-order prefix
        that drops everything below a horizontal image line (round-1 bias
        bug; reference behavior is an unbiased random subsample,
        fcaf3d_transforms.py:283-296)."""
        n, vs = 16, 0.125
        # random TSDF -> distinct per-sample weights (a uniform wall would
        # tie every ray and make rank selection degenerate)
        rng = np.random.RandomState(7)
        tsdf = rng.rand(n, n, n).astype(np.float32) * 2 - 1
        origin = jnp.array([-1.0, -0.75, 0.0])
        proj = jnp.asarray(simple_projection())
        h, w, cap = 12, 16, 64
        # uncapped run to get the full above-threshold set
        full = ray_march_neus(proj, jnp.asarray(tsdf, jnp.float32),
                              (n, n, n), vs, origin, h, w, view_index=0,
                              n_samples=64, weight_threshold=0.05,
                              capacity=8192)
        fw = np.asarray(full.weight)
        n_above = int((fw > 0).sum())
        assert n_above > cap, "test needs an over-capacity scene"
        capped = ray_march_neus(proj, jnp.asarray(tsdf, jnp.float32),
                                (n, n, n), vs, origin, h, w, view_index=0,
                                n_samples=64, weight_threshold=0.05,
                                capacity=cap)
        cw = np.asarray(capped.weight)
        assert int((cw > 0).sum()) == cap
        # kept weights == the `cap` largest weights of the full set
        np.testing.assert_allclose(
            np.sort(cw[cw > 0]), np.sort(fw[fw > 0])[-cap:], rtol=1e-6)
        # spatially unbiased: kept pixels span (nearly) the full image
        # height — a raster prefix would stop at an early row
        rows = np.asarray(capped.uv)[cw > 0][:, 1]
        full_rows = np.asarray(full.uv)[fw > 0][:, 1]
        assert rows.max() >= full_rows.max() - 1

    def test_occupancy_marks_bands_and_hard_jumps(self):
        from cnrma_tpu.ops.ray_marching import build_occupancy
        n, f = 32, 4
        # smooth wall band at voxels 14..18 (z=2.0, vs 0.125): coarse
        # cells 3-4 vary, the neighborhood range marks 2..5; far cells
        # 0-1 and 6-7 must stay empty (that's the skipped space)
        z = np.arange(n) * 0.125
        tsdf = np.broadcast_to(
            np.clip((z - 2.0) / 0.375, -1, 1)[None, None, :],
            (n, n, n)).copy().astype(np.float32)
        occ = np.asarray(build_occupancy(jnp.asarray(tsdf), f))
        assert occ.shape == (8, 8, 8)
        assert occ[:, :, 2:6].all()
        assert not occ[:, :, :2].any() and not occ[:, :, 6:].any()
        # hard clamped jump exactly at a coarse-cell boundary (-1 | +1
        # observed/unobserved transition, no |t|<1 band at all) must
        # still be detected — it produces NeuS weight in a dense march
        hard = np.where(z[None, None, :] < 2.0, -1.0,
                        1.0).astype(np.float32)
        hard = np.broadcast_to(hard, (n, n, n)).copy()
        occ2 = np.asarray(build_occupancy(jnp.asarray(hard), f))
        assert occ2[:, :, 3].all() and occ2[:, :, 4].all()
        assert not occ2[:, :, :2].any() and not occ2[:, :, 6:].any()

    def test_onehot_compaction_matches_topk(self, monkeypatch):
        """CNRMA_RAY_COMPACT='onehot' must keep the identical point
        multiset as the top_k path (both hold the complete kept set —
        NeuS weights bound it to floor(1/threshold) per ray)."""
        import cnrma_tpu.ops.ray_marching as rm
        n, vs = 32, 0.0625
        z = np.arange(n) * vs
        tsdf = np.broadcast_to(
            np.clip((z - 1.0) / (3 * vs), -1, 1)[None, None, :],
            (n, n, n)).copy().astype(np.float32)
        kw = dict(voxel_dim=(n, n, n), voxel_size=vs,
                  origin=jnp.array([-1.0, -0.75, 0.0]),
                  height=12, width=16, view_index=0, n_samples=96,
                  weight_threshold=0.05, capacity=4096)
        proj = jnp.asarray(simple_projection())
        a = ray_march_neus(proj, jnp.asarray(tsdf), **kw)
        monkeypatch.setattr(rm, "RAY_COMPACT", "onehot")
        b = ray_march_neus(proj, jnp.asarray(tsdf), **kw)

        def key(pts):
            w = np.asarray(pts.weight)
            rows = np.concatenate(
                [np.round(np.asarray(pts.xyz)[w > 0], 4),
                 np.round(w[w > 0, None], 6)], axis=1)
            return np.array(sorted(map(tuple, rows)))
        ka, kb = key(a), key(b)
        assert len(ka) > 50
        np.testing.assert_allclose(ka, kb, atol=1e-4)

    @pytest.mark.parametrize("coarse_step", [4, 8])
    def test_ray_march_neus_skip_matches_dense(self, coarse_step):
        """Empty-space skipping must keep the dense march's point set on a
        single-surface scene (transmittance is exactly 1 ahead of the
        band, so windowed weights equal dense weights).  Parametrized
        over the coarse-march stride: the dilated occupancy band is >= 3
        coarse cells (24 fine voxels) thick along any ray, so steps up to
        8 (+ half-cell round error) provably cannot skip it
        (BENCH_RAY_COARSE A/B knob)."""
        from cnrma_tpu.ops.ray_marching import build_occupancy
        n, vs = 32, 0.0625
        z = np.arange(n) * vs
        tsdf = np.broadcast_to(
            np.clip((z - 1.0) / (3 * vs), -1, 1)[None, None, :],
            (n, n, n)).copy().astype(np.float32)
        origin = jnp.array([-1.0, -0.75, 0.0])
        proj = jnp.asarray(simple_projection())
        kw = dict(voxel_dim=(n, n, n), voxel_size=vs, origin=origin,
                  height=12, width=16, view_index=0, n_samples=96,
                  weight_threshold=0.05, capacity=4096)
        dense = ray_march_neus(proj, jnp.asarray(tsdf), **kw)
        occ = build_occupancy(jnp.asarray(tsdf), 8)
        skip = ray_march_neus(proj, jnp.asarray(tsdf), occupancy=occ,
                              skip_factor=8, skip_window=48,
                              coarse_step=coarse_step, **kw)
        dw, sw = np.asarray(dense.weight), np.asarray(skip.weight)
        assert (dw > 0).sum() > 50
        assert (sw > 0).sum() == (dw > 0).sum()

        def key(pts, w):
            xyz = np.asarray(pts.xyz)[w > 0]
            return np.array(sorted(map(tuple, np.round(xyz, 4))))
        np.testing.assert_allclose(key(dense, dw), key(skip, sw),
                                   atol=1e-4)
        np.testing.assert_allclose(np.sort(sw[sw > 0]),
                                   np.sort(dw[dw > 0]), rtol=1e-5)

    def test_ray_march_depth_wall(self):
        n, vs = 16, 0.125
        z = (np.arange(n) * vs)
        tsdf = np.broadcast_to(
            np.clip((z - 1.0) / (3 * vs), -1, 1)[None, None, :],
            (n, n, n)).copy()
        origin = jnp.array([-1.0, -0.75, 0.0])
        proj = jnp.asarray(simple_projection())
        pts = ray_march_depth(proj, jnp.asarray(tsdf, jnp.float32),
                              (n, n, n), vs, origin, 12, 16,
                              view_index=0, n_samples=64, depth_points=2,
                              capacity=4096)
        w = np.asarray(pts.weight)
        assert (w > 0).sum() > 50
        kept_z = np.asarray(pts.xyz)[w > 0][:, 2]
        assert np.abs(np.median(kept_z) - 1.0) < 0.3
        # linear weight ramp: max weight 1, min 0.5
        assert w.max() <= 1.0 + 1e-6
        assert np.isclose(w[w > 0].min(), 0.5, atol=1e-6)


class TestRayCapProbe:
    """Pins tools/raycap_probe.py (the rays_per_view_cap clipping study,
    VERDICT r3 item 5).  The full-scale probe (default args, seed 0)
    found interior viewpoints exceed 32768 above-threshold samples on
    21/32 views (max 78527, min mass kept 63.9%) — which drove the
    shipping cap to 98304 (100% mass kept on every probed view); these
    reduced-scale checks keep the probe's machinery honest."""

    @pytest.mark.slow
    def test_probe_mass_accounting(self):
        import sys
        sys.path.insert(0, "tools")
        import raycap_probe as rp

        rng = np.random.default_rng(0)
        dim, vs = (64, 64, 32), 0.08
        tsdf = rp.make_room_tsdf(rng, voxel_dim=dim, voxel_size=vs,
                                 n_boxes=4)
        assert tsdf.shape == dim
        assert tsdf.min() >= -1 and tsdf.max() <= 1
        assert (tsdf < 0).any() and (tsdf > 0.99).any()
        proj = rp.make_view(rng, voxel_dim=dim, voxel_size=vs,
                            height=30, width=40)
        s_all = rp.view_cap_stats(tsdf, proj, cap=10**9, voxel_dim=dim,
                                  voxel_size=vs, height=30, width=40,
                                  n_samples=100)
        assert s_all["frac_kept"] == 1.0
        assert s_all["n_above"] > 0
        # a cap below the above-threshold count must clip mass, and the
        # kept mass must be the TOP of the weight distribution
        cap = max(1, s_all["n_above"] // 2)
        s_cap = rp.view_cap_stats(tsdf, proj, cap=cap, voxel_dim=dim,
                                  voxel_size=vs, height=30, width=40,
                                  n_samples=100)
        assert s_cap["mass_total"] == s_all["mass_total"]
        assert 0 < s_cap["mass_kept"] < s_cap["mass_total"]
        # top-half by weight holds more than half the mass
        assert s_cap["frac_kept"] > 0.5


class TestIoU3D:
    def test_identical(self):
        b = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]])
        np.testing.assert_allclose(np.asarray(aligned_iou_3d(b, b)), 1.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rotated_iou_3d(b, b)), 1.0,
                                   atol=1e-5)

    def test_half_overlap(self):
        b1 = jnp.array([[0, 0, 0, 2, 2, 2, 0.0]])
        b2 = jnp.array([[1, 0, 0, 2, 2, 2, 0.0]])
        expect = 4.0 / 12.0
        np.testing.assert_allclose(np.asarray(aligned_iou_3d(b1, b2)),
                                   expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rotated_iou_3d(b1, b2)),
                                   expect, atol=1e-5)

    def test_rotated_square_45deg(self):
        # unit square vs itself rotated 45deg: intersection is a regular
        # octagon with area 2*(sqrt(2)-1)
        b1 = jnp.array([[0, 0, 0, 1, 1, 1, 0.0]])
        b2 = jnp.array([[0, 0, 0, 1, 1, 1, np.pi / 4]])
        inter = 2 * (np.sqrt(2) - 1)
        iou = inter / (2 - inter)
        np.testing.assert_allclose(np.asarray(rotated_iou_3d(b1, b2)), iou,
                                   atol=1e-4)

    def test_matrix_matches_elementwise(self):
        rng = np.random.RandomState(0)
        b = rng.rand(5, 7).astype(np.float32)
        b[:, 3:6] += 0.5
        m = np.asarray(iou_3d_matrix(jnp.asarray(b), jnp.asarray(b),
                                     rotated=True))
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)

    def test_disjoint(self):
        b1 = jnp.array([[0, 0, 0, 1, 1, 1, 0.3]])
        b2 = jnp.array([[5, 5, 5, 1, 1, 1, 0.9]])
        np.testing.assert_allclose(np.asarray(rotated_iou_3d(b1, b2)), 0.0,
                                   atol=1e-6)

    def test_iou_loss_grad(self):
        def loss(p):
            return rotated_iou_3d(p, jnp.array([[0, 0, 0, 1, 1, 1, 0.0]])).sum()
        g = jax.grad(loss)(jnp.array([[0.2, 0.1, 0., 1., 1., 1., 0.1]]))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestNMS:
    def test_suppression(self):
        boxes = jnp.array([
            [0, 0, 0, 2, 2, 2, 0.0],
            [0.1, 0, 0, 2, 2, 2, 0.0],   # heavy overlap with box 0
            [5, 5, 0, 2, 2, 2, 0.0],     # far away
        ])
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms_bev(boxes, scores, 0.5, rotated=False))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_rotated_not_suppressed_when_thin(self):
        boxes = jnp.array([
            [0, 0, 0, 4, 0.5, 1, 0.0],
            [0, 0, 0, 4, 0.5, 1, np.pi / 2],  # crossed thin boxes, low IoU
        ])
        scores = jnp.array([0.9, 0.8])
        keep = np.asarray(nms_bev(boxes, scores, 0.5, rotated=True))
        np.testing.assert_array_equal(keep, [True, True])

    def test_multiclass_np(self):
        boxes = np.array([[0, 0, 0, 2, 2, 2],
                          [0.05, 0, 0, 2, 2, 2],
                          [5, 5, 0, 2, 2, 2]], np.float32)
        scores = np.zeros((3, 4), np.float32)
        scores[:, 1] = [0.9, 0.85, 0.5]
        b, s, l = multiclass_nms_np(boxes, scores)
        assert len(b) == 2
        assert (l == 1).all()
        # gravity-center z convention on output (reference
        # _atlas_bbox.npz contract)
        np.testing.assert_allclose(b[:, 2], 0.0)


class TestLosses:
    def test_focal_loss_basics(self):
        logits = jnp.array([[10.0, -10.0], [-10.0, 10.0]])
        labels = jnp.array([0, 1])
        valid = jnp.array([True, True])
        l = sigmoid_focal_loss(logits, labels, valid, jnp.float32(2.0))
        assert float(l) < 1e-3

    def test_focal_loss_background(self):
        logits = jnp.array([[-10.0, -10.0]])
        labels = jnp.array([-1])
        l = sigmoid_focal_loss(logits, labels, jnp.array([True]),
                               jnp.float32(1.0))
        assert float(l) < 1e-3

    def test_focal_invalid_masked(self):
        logits = jnp.array([[100.0, 100.0]])
        labels = jnp.array([-1])
        l = sigmoid_focal_loss(logits, labels, jnp.array([False]),
                               jnp.float32(1.0))
        assert float(l) == 0.0

    def test_bce(self):
        l = bce_loss(jnp.array([100.0]), jnp.array([1.0]),
                     jnp.array([True]), jnp.float32(1.0))
        assert float(l) < 1e-3

    def test_log_transform(self):
        x = jnp.array([-2.0, 0.0, 2.0])
        out = np.asarray(log_transform(x))
        np.testing.assert_allclose(out, [-np.log(3), 0, np.log(3)],
                                   atol=1e-4)  # XLA CPU log1p tolerance


class TestViewMeshModelPath:
    def test_build_volume_view_mesh_pads_and_matches(self):
        """The production caller (CNRMA.build_volume with ``view_mesh``,
        wired via ``tools/test.py --view-shard``) must equal the dense
        path, including the pad-to-shard-count branch (V=6 on 8
        devices)."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from cnrma_tpu.models.cn_rma import CNRMA
        from cnrma_tpu.parallel.mesh import make_mesh

        rng = np.random.RandomState(3)
        B, V, H, W, C = 1, 6, 6, 8, 4
        dim = (8, 8, 8)
        feats = jnp.asarray(rng.rand(B, V, H, W, C).astype(np.float32))
        projs = []
        for i in range(V):
            K = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]])
            E = np.eye(4)
            E[:3, 3] = [0.1 * i - 0.25, -0.1, -1.0]
            projs.append((K @ np.linalg.inv(E)[:3]).astype(np.float32))
        projs = jnp.asarray(np.stack(projs))[None]
        valid = jnp.ones((B, V), bool)

        kw = dict(voxel_dim=dim, voxel_size=0.2, backbone2d_stride=1,
                  detection=False)
        dense = CNRMA(**kw).bind({}).build_volume(feats, projs, valid)
        mesh = make_mesh(8, axis_names=("view",))
        sharded = CNRMA(**kw, view_mesh=mesh).bind({}).build_volume(
            feats, projs, valid)
        np.testing.assert_allclose(np.asarray(sharded[0]),
                                   np.asarray(dense[0]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sharded[1]),
                                      np.asarray(dense[1]))

    def _ray_march_setup(self, V, skip):
        rng = np.random.RandomState(5)
        H, W, C = 8, 8, 4
        dim = (16, 16, 16)
        feats = jnp.asarray(rng.rand(1, V, H, W, C).astype(np.float32))
        projs = []
        for i in range(V):
            K = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]])
            E = np.eye(4)
            E[:3, 3] = [0.8 + 0.05 * i, 0.8, -0.4]
            projs.append((K @ np.linalg.inv(E)[:3]).astype(np.float32))
        projs = jnp.asarray(np.stack(projs))[None]
        valid = jnp.ones((1, V), bool)
        # a slab surface through the volume -> real NeuS weights
        zs = (np.arange(16, dtype=np.float32) + 0.5) * 0.1
        tsdf = np.clip((zs[None, None, :] - 0.8) / 0.12, -1, 1)
        tsdf = jnp.asarray(np.broadcast_to(tsdf, dim)[None].copy())
        # skip window 32: on this tiny 16³ grid the factor-8 occupancy is
        # 2³ cells, so the dilated band covers the whole volume and the
        # fine window anchors at volume ENTRY — it must still reach the
        # slab surface at fine index ~21 (a 16-window ends blind at 15)
        kw = dict(voxel_dim=dim, voxel_size=0.1, backbone2d_stride=1,
                  ray_samples=48, rays_per_view_cap=128, max_points=2048,
                  ray_skip_factor=8 if skip else 0, ray_skip_window=32)
        return kw, feats, projs, valid, tsdf

    @pytest.mark.parametrize("V,skip", [(8, False), (8, True), (6, False)])
    def test_ray_march_view_mesh_matches(self, V, skip):
        """CNRMA.ray_march with ``view_mesh`` (shard_map over views —
        tools/test.py --view-shard) reproduces the dense lax.map path.
        V=8 divides the mesh (bit-identical buffers incl. the subsample
        draw); V=6 pads with dead views (same valid point SET)."""
        import jax
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from cnrma_tpu.models.cn_rma import CNRMA
        from cnrma_tpu.parallel.mesh import make_mesh

        kw, feats, projs, valid, tsdf = self._ray_march_setup(V, skip)
        offset = jnp.zeros((1, 3), jnp.float32)
        key = jax.random.PRNGKey(0)
        dense = CNRMA(**kw).bind({}).ray_march(
            feats, projs, valid, tsdf, offset, key)
        mesh = make_mesh(8, axis_names=("view",))
        sharded = CNRMA(**kw, view_mesh=mesh).bind({}).ray_march(
            feats, projs, valid, tsdf, offset, key)
        dv = np.asarray(dense.valid[0])
        sv = np.asarray(sharded.valid[0])
        assert dv.sum() > 10          # the case must produce real points
        assert dv.sum() == sv.sum()
        if V % 8 == 0:
            np.testing.assert_allclose(np.asarray(sharded.xyz),
                                       np.asarray(dense.xyz), atol=1e-6)
            np.testing.assert_allclose(np.asarray(sharded.feats),
                                       np.asarray(dense.feats), atol=1e-5)
        else:
            # padded buffers permute the subsample; compare the SETS
            def rows(pts, m):
                r = np.concatenate([np.asarray(pts.xyz[0])[m],
                                    np.asarray(pts.feats[0])[m]], axis=1)
                return r[np.lexsort(r.T[::-1])]
            np.testing.assert_allclose(rows(sharded, sv), rows(dense, dv),
                                       atol=1e-5)


class TestYawLossNaNSafety:
    """Rotated-IoU training path must produce FINITE gradients with
    static-shape padding rows (exactly-zero predictions / zero-size
    boxes) — sqrt/atan2 have infinite backward at (0, 0) and the
    polygon clip NaNs on degenerate geometry; decode_bbox and
    iou3d_loss substitute safe values on exactly those rows (values of
    valid rows are bit-identical).  Regression for the round-5 yaw
    overfit NaN (ARKit regime, ray_marching_arkit.py:193-201)."""

    def test_yaw_loss_grads_finite_with_padding(self):
        from cnrma_tpu.models.fcaf3d import decode_bbox
        from cnrma_tpu.ops.losses import iou3d_loss

        rng = np.random.RandomState(0)
        n = 64
        points = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        bp = jnp.asarray(rng.rand(n, 8).astype(np.float32))
        bp = bp.at[32:].set(0.0)          # padding: zero predictions
        targets = jnp.asarray(rng.rand(n, 7).astype(np.float32))
        targets = targets.at[32:].set(0.0)  # padding: zero-size boxes
        valid = jnp.asarray(np.arange(n) < 20)
        w = jnp.ones((n,), jnp.float32)

        def f(bp):
            preds = decode_bbox(points, bp, "fcaf3d")
            return iou3d_loss(preds, targets, w, valid,
                              jnp.float32(10.0), True)

        v, g = jax.value_and_grad(f)(bp)
        assert np.isfinite(float(v))
        assert np.isfinite(np.asarray(g)).all()
        # masked rows contribute exactly nothing
        assert np.abs(np.asarray(g)[32:]).sum() == 0.0

    def test_decode_bbox_valid_rows_unchanged(self):
        """The degenerate-row substitution must not perturb non-zero
        rows: decode with and without a zero row mixed in matches."""
        from cnrma_tpu.models.fcaf3d import decode_bbox

        rng = np.random.RandomState(1)
        points = jnp.asarray(rng.rand(8, 3).astype(np.float32))
        bp = jnp.asarray((rng.rand(8, 8) + 0.1).astype(np.float32))
        for param in ("fcaf3d", "sin-cos", "naive"):
            full = decode_bbox(points, bp, param)
            mixed = decode_bbox(points, bp.at[3].set(0.0), param)
            keep = np.asarray([0, 1, 2, 4, 5, 6, 7])
            np.testing.assert_array_equal(np.asarray(full)[keep],
                                          np.asarray(mixed)[keep])
