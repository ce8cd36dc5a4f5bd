"""Non-rigid fusion op tests: identity-warp equivalence with rigid
integrate, warped-geometry correctness, prolongation exactness."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import dualquat, se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.ops import fusion, preprocess, tsdf as tsdf_ops

CFG = dataclasses.replace(
    DynamicFusionConfig.small(dims=64, rows=120, cols=160),
    max_nodes=64,
    node_sample_step=1,
    node_radius=0.5,
    knn_field_stride=2,
)


def _identity_field():
    # nodes spread over the volume with identity transforms
    g = np.linspace(-0.4, 0.4, 4)
    pts = np.stack(np.meshgrid(g, g, g + 1.0, indexing="ij"), -1).reshape(-1, 3)
    return warpfield.init_from_cloud(
        CFG, jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool)
    )


def _w2c():
    return se3.identity()


def test_prolong_matrix_exact_at_corners():
    w = np.asarray(fusion._prolong_matrix(8, 2))
    assert w.shape == (8, 5)
    # each fine index i = 2c lands exactly on corner c
    for c in range(4):
        row = w[2 * c]
        assert row[c] == 1.0 and row.sum() == 1.0
    # midpoints average adjacent corners
    assert w[1][0] == 0.5 and w[1][1] == 0.5


def test_identity_warp_matches_rigid_integrate():
    # unit observation weights isolate the property under test (the warp
    # path); the paper's quality weighting is covered by TestQualityWeight
    cfg = dataclasses.replace(CFG, fusion_quality_weight=False)
    depth = synthetic.sphere_depth(cfg.intr, cfg.rows, cfg.cols, (0, 0, 1.0), 0.25)
    dists = preprocess.compute_dists(cfg.intr, jnp.asarray(depth))
    field = _identity_field()

    vol_pose = se3.identity().at[:3, 3].set(jnp.asarray(cfg.volume_origin))
    vol_r = tsdf_ops.integrate(
        cfg, volume_model.create(cfg), dists, se3.compose(se3.inverse(_w2c()), vol_pose), cfg.intr
    )
    vol_n = fusion.integrate_nonrigid(
        cfg, volume_model.create(cfg), field, dists, se3.inverse(_w2c()), cfg.intr
    )
    # identity warp => identical update (up to float assoc.)
    np.testing.assert_allclose(
        np.asarray(vol_n.tsdf), np.asarray(vol_r.tsdf), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(vol_n.weight), np.asarray(vol_r.weight))


def test_translated_warp_shifts_surface():
    # field translates everything +3cm in x; fusing a sphere at x=+0.03
    # through it must build the surface at the CANONICAL location (x=0).
    shift = jnp.array([0.03, 0.0, 0.0])
    field = _identity_field()
    dq = dualquat.from_twist(jnp.zeros(3), shift)
    field = field._replace(dq=jnp.where(field.active[:, None], dq, field.dq))

    depth = synthetic.sphere_depth(CFG.intr, CFG.rows, CFG.cols, (0.03, 0.0, 1.0), 0.25)
    dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
    vol = fusion.integrate_nonrigid(
        CFG, volume_model.create(CFG), field, dists, se3.inverse(_w2c()), CFG.intr
    )
    cloud = tsdf_ops.extract_cloud(CFG, vol, max_points=8192)
    pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    assert len(pts) > 100
    # extracted canonical surface must center at x ~ 0, not 0.03
    r = np.linalg.norm(pts - np.array([0.0, 0.0, 1.0]), axis=-1)
    front = pts[np.abs(pts[:, 2] - (1.0 - 0.25)) < 0.05]
    assert len(front) > 10
    r_err = np.abs(np.linalg.norm(front - np.array([0, 0, 1.0]), axis=-1) - 0.25)
    assert np.median(r_err) < 2.5 * CFG.voxel_size


def test_fusion_accumulates_weight():
    cfg = dataclasses.replace(CFG, fusion_quality_weight=False)
    depth = synthetic.sphere_depth(cfg.intr, cfg.rows, cfg.cols, (0, 0, 1.0), 0.25)
    dists = preprocess.compute_dists(cfg.intr, jnp.asarray(depth))
    field = _identity_field()
    vol = volume_model.create(cfg)
    for _ in range(2):
        vol = fusion.integrate_nonrigid(cfg, vol, field, dists, se3.inverse(_w2c()), cfg.intr)
    assert float(volume_model.decode_weight(vol.weight).max()) == 2.0


class TestQualityWeight:
    def test_weight_increment_is_blend_quality(self):
        """With the paper's observation weight, accumulated voxel weights
        increase by the (bounded [0,1]) blend quality, not by 1."""
        depth = synthetic.sphere_depth(CFG.intr, CFG.rows, CFG.cols, (0, 0, 1.0), 0.25)
        dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
        field = _identity_field()
        vol = fusion.integrate_nonrigid(
            CFG, volume_model.create(CFG), field, dists, se3.inverse(_w2c()), CFG.intr
        )
        wmax = float(volume_model.decode_weight(vol.weight).max())
        assert 0.0 < wmax <= 1.0

    def test_unsupported_voxels_not_fused(self):
        """Voxels far from every node (blend quality < fusion_quality_min)
        must receive NO update — fusing through a garbage normalized blend
        smears the canonical model."""
        depth = synthetic.sphere_depth(CFG.intr, CFG.rows, CFG.cols, (0, 0, 1.0), 0.25)
        dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
        # one lone node in a corner: almost the whole volume is unsupported
        pts = np.array([[0.45, 0.45, 1.4]], np.float32)
        field = warpfield.init_from_cloud(
            dataclasses.replace(CFG, node_radius=0.03),
            jnp.asarray(pts), jnp.ones(1, bool),
        )
        vol = fusion.integrate_nonrigid(
            CFG, volume_model.create(CFG), field, dists, se3.inverse(_w2c()), CFG.intr
        )
        # the sphere region (center of the volume) is far from the node
        w = np.asarray(vol.weight)
        d = CFG.volume_dims
        assert w[d // 2 - 4 : d // 2 + 4, d // 2 - 4 : d // 2 + 4, :].max() == 0.0


def _displaced_field(shift=(0.02, -0.01, 0.015)):
    g = np.linspace(-0.4, 0.4, 4)
    pts = np.stack(np.meshgrid(g, g, g + 1.0, indexing="ij"), -1).reshape(-1, 3)
    field = warpfield.init_from_cloud(
        CFG, jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool)
    )
    n = field.positions.shape[0]
    dq = dualquat.from_rot_trans(
        jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)),
        jnp.broadcast_to(jnp.asarray(shift, jnp.float32), (n, 3)),
    )
    return field._replace(dq=jnp.where(field.active[:, None], dq, field.dq))


class TestSharedDqGrid:
    def test_warp_coarse_grid_matches_with_and_without(self):
        """warp_coarse_grid from a precomputed coarse_dq_grid must equal the
        direct KNN+DQB path (identical math, shared evaluation)."""
        field = _displaced_field()
        grid = fusion.coarse_dq_grid(CFG, field)
        w_direct = fusion.warp_coarse_grid(CFG, field)
        w_shared = fusion.warp_coarse_grid(CFG, field, grid)
        np.testing.assert_allclose(
            np.asarray(w_shared), np.asarray(w_direct), atol=1e-5
        )

    def test_trilinear_warp_matches_exact_on_smooth_field(self):
        """warp_points_trilinear must match the exact per-point KNN+DQB warp
        to within the coarse-cell interpolation tolerance on a smooth
        (uniform-shift) field — where it is exact up to normalization."""
        field = _displaced_field()
        grid = fusion.coarse_dq_grid(CFG, field)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.3, 0.3, (500, 3)).astype(np.float32)
        pts[:, 2] += 1.0
        nrm = rng.normal(size=(500, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

        w_tri, n_tri = fusion.warp_points_trilinear(
            CFG, grid, jnp.asarray(pts), jnp.asarray(nrm)
        )
        w_ex, n_ex = warpfield.warp_points(
            field, jnp.asarray(pts), jnp.asarray(nrm), k=CFG.knn_k, method="exact"
        )
        np.testing.assert_allclose(np.asarray(w_tri), np.asarray(w_ex), atol=1e-4)
        np.testing.assert_allclose(np.asarray(n_tri), np.asarray(n_ex), atol=1e-4)

    def test_trilinear_warp_nan_passthrough(self):
        field = _displaced_field()
        grid = fusion.coarse_dq_grid(CFG, field)
        pts = jnp.asarray([[np.nan, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
        w = fusion.warp_points_trilinear(CFG, grid, pts)
        assert np.isnan(np.asarray(w)[0]).all()
        assert np.isfinite(np.asarray(w)[1]).all()


class TestIncidenceWeight:
    def test_pack_unpack_roundtrip(self):
        from dynamicfusion_tpu.ops import bricks

        rng = np.random.default_rng(0)
        d = rng.uniform(0.3, 3.0, (64,)).astype(np.float32)
        c = rng.uniform(0.0, 1.0, (64,)).astype(np.float32)
        v = bricks.pack_depth_conf(jnp.asarray(d), jnp.asarray(c))
        dp, cu = bricks.unpack_depth_conf(v)
        np.testing.assert_allclose(np.asarray(dp), d, atol=1.3e-4)  # 0.125 mm
        np.testing.assert_allclose(np.asarray(cu), c, atol=0.5 / 15.0)
        # invalid depth packs to exactly 0 (the dp != 0 validity gate)
        v0 = bricks.pack_depth_conf(jnp.zeros(3), jnp.ones(3))
        assert float(jnp.abs(v0).max()) == 0.0

    def test_grazing_observations_downweighted(self):
        """With the incidence weight on, fused voxel weights at the
        sphere's silhouette (grazing incidence) are much smaller than at
        the frontal pole; with conf == 1 everywhere the result matches the
        unweighted path up to depth quantization."""
        import dataclasses

        from dynamicfusion_tpu.core import se3
        from dynamicfusion_tpu.models import volume as volume_model
        from dynamicfusion_tpu.io import synthetic

        cfg = dataclasses.replace(CFG, fusion_incidence_weight=True)
        center, radius = (0.0, 0.0, 0.9), 0.25
        depth = synthetic.sphere_depth(cfg.intr, cfg.rows, cfg.cols, center, radius)
        dists = preprocess.compute_dists(cfg.intr, jnp.asarray(depth))
        pts, nrm = preprocess.compute_points_normals(cfg.intr, jnp.asarray(depth))
        pn = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
        conf = jnp.nan_to_num(jnp.abs(jnp.sum(nrm * pn, axis=-1)))

        field = _identity_field()
        vol = volume_model.create(cfg)
        v_w = fusion.integrate_nonrigid(
            cfg, vol, field, dists, se3.identity(), cfg.intr, conf=conf
        )
        w = np.asarray(volume_model.decode_weight(v_w.weight))

        d, vs = cfg.volume_dims, cfg.voxel_size
        org = np.asarray(cfg.volume_origin)

        def wt(p):
            i = np.clip(np.round((np.asarray(p) - org) / vs).astype(int), 0, d - 1)
            return w[i[0], i[1], i[2]]

        frontal = wt((0.0, 0.0, center[2] - radius))       # facing the camera
        grazing = wt((radius, 0.0, center[2]))             # silhouette ring
        assert frontal > 0.85
        assert grazing < 0.55 * frontal, (frontal, grazing)

        # conf == 1 reproduces the unweighted path up to quantization
        v_ref = fusion.integrate_nonrigid(
            CFG, volume_model.create(CFG), field, dists, se3.identity(), CFG.intr
        )
        v_one = fusion.integrate_nonrigid(
            cfg, volume_model.create(cfg), field, dists, se3.identity(),
            cfg.intr, conf=jnp.ones_like(dists),
        )
        np.testing.assert_allclose(
            np.asarray(volume_model.decode_tsdf(v_one.tsdf)),
            np.asarray(volume_model.decode_tsdf(v_ref.tsdf)), atol=0.005
        )
        np.testing.assert_allclose(
            np.asarray(volume_model.decode_weight(v_one.weight)),
            np.asarray(volume_model.decode_weight(v_ref.weight)), atol=2.5e-3
        )


def test_phase_split_composes_to_full():
    """fusion_phase_split: integrating the S phases of ONE frame in
    sequence must reproduce the unsplit integrate bitwise — phases touch
    disjoint brick x-planes, so composition is union."""
    cfg = dataclasses.replace(CFG, fusion_interval=4, fusion_phase_split=2)
    depth = synthetic.sphere_depth(cfg.intr, cfg.rows, cfg.cols, (0, 0, 1.0), 0.25)
    dists = preprocess.compute_dists(cfg.intr, jnp.asarray(depth))
    field = _identity_field()
    w2c = _w2c()

    full = fusion.integrate_nonrigid(
        cfg, volume_model.create(cfg), field, dists, w2c, cfg.intr
    )
    v = volume_model.create(cfg)
    for ph in range(2):
        v = fusion.integrate_nonrigid(
            cfg, v, field, dists, w2c, cfg.intr, phase=ph, split=2
        )
    np.testing.assert_array_equal(np.asarray(v.tsdf), np.asarray(full.tsdf))
    np.testing.assert_array_equal(np.asarray(v.weight), np.asarray(full.weight))

    # cap-stressed shape: with band_cap sized just over the scene's actual
    # per-phase band count, the divided per-phase caps must NOT drop bricks
    # (dropped is the exact truncation count — ops/bricks.py cap note).
    # The scene has <= band_total band bricks spread over x-plane phases;
    # a cap of band_total guarantees each phase's share fits cap // split
    # only if the distribution is no worse than even*2 — assert the count
    # says zero, i.e. the accounting (not the assumption) is load-bearing.
    band_total = int(
        np.asarray(
            fusion.integrate_nonrigid(
                cfg, volume_model.create(cfg), field, dists, w2c, cfg.intr,
                with_counts=True,
            )[1]
        )[0]
    )
    cfg_s = dataclasses.replace(cfg, integrate_band_cap=2 * band_total)
    vs = volume_model.create(cfg_s)
    for ph in range(2):
        vs, counts = fusion.integrate_nonrigid(
            cfg_s, vs, field, dists, w2c, cfg_s.intr, phase=ph, split=2,
            with_counts=True,
        )
        assert int(np.asarray(counts)[2]) == 0, (
            "phase-split dropped bricks at a cap-stressed shape"
        )
    np.testing.assert_array_equal(np.asarray(vs.tsdf), np.asarray(v.tsdf))

    # dense path obeys the same phase semantics
    cfg_d = dataclasses.replace(cfg, integrate_mode="dense")
    full_d = fusion.integrate_nonrigid(
        cfg_d, volume_model.create(cfg_d), field, dists, w2c, cfg_d.intr
    )
    vd = volume_model.create(cfg_d)
    for ph in range(2):
        vd = fusion.integrate_nonrigid(
            cfg_d, vd, field, dists, w2c, cfg_d.intr, phase=ph, split=2
        )
    np.testing.assert_array_equal(np.asarray(vd.tsdf), np.asarray(full_d.tsdf))
