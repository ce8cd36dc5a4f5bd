"""Warp-solver correctness oracle.

Ports the behavioral scenarios of the reference's solver tests
(tests/ceres_warp_test.cpp: EnergyDataSingleVertexTest, EnergyDataRigidTest,
WarpAndReverseTest; tests/warp_test.cpp: MultipleNodesTest, NonRigidTest):
a cube of 8 deformation nodes (radius dg_w = 3), known displacement fields,
warped output must match targets within 1e-3.

The reference runs these with its translation-only point-to-point term and
no regularizer, so the oracle config uses point_to_plane=False and a tiny
ARAP weight; dedicated tests cover the point-to-plane term and the ARAP
propagation behavior the reference never implemented.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import dualquat
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.solvers import warp_solver

CUBE = np.array(
    [
        [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
        [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1],
    ],
    np.float32,
)

ORACLE_CFG = DynamicFusionConfig(
    volume_dims=64,
    max_nodes=16,
    node_sample_step=1,
    node_radius=3.0,          # the reference's FIXME-hardcoded dg_w
    knn_k=8,
    solver_nonlinear_iters=8,
    solver_linear_iters=60,
    solver_tukey_c=10.0,       # quadratic regime for the oracle (the
                               # reference never applies Tukey either)
    solver_huber_delta=10.0,
    solver_arap_weight=1e-4,
    point_to_plane=False,
    knn_method="exact",
    # direct solve: the PCG path has dedicated coverage (TestLinearSolvers,
    # test_distributed_gn); its while_loop compiles slowly on the CPU test
    # backend, so the oracle scenarios use the equivalent direct solve
    solver_linear="direct",
    # the oracle asserts exact-path f32 equivalences (rtol 1e-4); the int8
    # JtJ path has its own parity test with a quantization-scale tolerance
    solver_jtj_int8=False,
    # oracle scenarios are COLD starts with large displacements, where the
    # exact-Hessian LM is the right contract; the lagged-JtJ default has
    # its own convergence test (test_lagged_jtj_converges)
    solver_lagged_jtj=False,
)


def _cube_field(cfg=ORACLE_CFG):
    return warpfield.init_from_cloud(cfg, jnp.asarray(CUBE), jnp.ones(8, bool))


def _solve(field, can, live, normals=None, cfg=ORACLE_CFG, p2pl=False):
    can = jnp.asarray(can, jnp.float32)
    live = jnp.asarray(live, jnp.float32)
    if normals is None:
        normals = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), can.shape)
    inputs = warp_solver.WarpSolveInputs(
        p_can=can, n_can=normals, p_live=live, n_live=normals
    )
    return warp_solver.solve(cfg, field, inputs, point_to_plane=p2pl)


def test_single_vertex():
    # EnergyDataSingleVertexTest (ceres_warp_test.cpp:6-52): one vertex at
    # the origin, target shifted +0.05 in all axes; tol 1e-3.
    field = _cube_field()
    can = [[0.0, 0.0, 0.0]]
    live = [[0.05, 0.05, 0.05]]
    new_field, stats = _solve(field, can, live)
    warped = warpfield.warp_points(new_field, jnp.asarray(can, jnp.float32))
    np.testing.assert_allclose(np.asarray(warped), live, atol=1e-3)
    assert float(stats.final_cost) < float(stats.initial_cost)


def test_rigid_shift():
    # EnergyDataRigidTest (ceres_warp_test.cpp:56-120)
    field = _cube_field()
    can = [[2.0, 2.0, 2.0], [3.0, 3.0, 3.0]]
    live = [[2.05, 2.05, 2.05], [3.05, 3.05, 3.05]]
    new_field, _ = _solve(field, can, live)
    warped = warpfield.warp_points(new_field, jnp.asarray(can, jnp.float32))
    np.testing.assert_allclose(np.asarray(warped), live, atol=1e-3)


def test_warp_and_reverse():
    # WarpAndReverseTest (ceres_warp_test.cpp:124-206): solve forward then
    # backward; original geometry must be recovered and the summed node
    # translations must cancel.
    field = _cube_field()
    can = np.array(
        [[-3, -3, -3], [-2, -2, -2], [0, 0, 0], [2, 2, 2], [3, 3, 3]], np.float32
    )
    live = can + 0.05

    f1, _ = _solve(field, can, live)
    warped = np.asarray(warpfield.warp_points(f1, jnp.asarray(can)))
    np.testing.assert_allclose(warped, live, atol=1e-3)
    t_fwd = np.asarray(dualquat.translation(f1.dq[:8]))

    f2, _ = _solve(f1, live, can)
    back = np.asarray(warpfield.warp_points(f2, jnp.asarray(live)))
    np.testing.assert_allclose(back, can, atol=1e-3)

    # cancellation: the reverse field's node translations are the negation
    # of the forward field's (+0.05 forward, -0.05 reverse per node). (The
    # reference test's literal sum-to-zero assertion doesn't follow from its
    # own math and its test targets never built — SURVEY §2.9 item 9; the
    # meaningful spec is the geometric roundtrip above plus this negation.)
    t_rev = np.asarray(dualquat.translation(f2.dq[:8]))
    np.testing.assert_allclose(t_rev, -t_fwd, atol=2e-3)


def test_multiple_nodes_nonrigid():
    # NonRigidTest flavor (warp_test.cpp): per-vertex different
    # displacements; solver must fit a spatially varying field. ARAP off to
    # match the reference solvers (no reg term), which is also what makes an
    # exact fit the right expectation (with ARAP on, the prior correctly
    # biases the 4-point field toward rigidity; covered by the ARAP test).
    cfg = dataclasses.replace(ORACLE_CFG, solver_arap_weight=0.0)
    field = _cube_field(cfg)
    can = np.array(
        [[-1, -1, -1], [1, 1, 1], [1, -1, 1], [-1, 1, -1]], np.float32
    ) * 0.8
    disp = np.array(
        [[0.03, 0, 0], [0, 0.04, 0], [-0.02, 0.01, 0.02], [0.01, -0.03, 0.01]],
        np.float32,
    )
    live = can + disp
    new_field, stats = _solve(field, can, live, cfg=cfg)
    warped = np.asarray(warpfield.warp_points(new_field, jnp.asarray(can)))
    np.testing.assert_allclose(warped, live, atol=2e-3)


def test_point_to_plane_term():
    # With the paper's point-to-plane term, only the normal component of the
    # displacement is constrained: a target shifted along its normal must be
    # matched in the normal direction.
    field = _cube_field()
    can = np.array([[0, 0, 0], [0.5, 0.5, 0.5], [-0.5, 0.2, -0.1]], np.float32)
    n = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32), can.shape)
    live = can + np.array([0, 0, 0.04], np.float32)
    new_field, stats = _solve(field, can, live, normals=n, p2pl=True)
    warped = np.asarray(warpfield.warp_points(new_field, jnp.asarray(can)))
    np.testing.assert_allclose(warped[:, 2], live[:, 2], atol=1e-3)
    assert float(stats.final_cost) < 1e-6


def test_tangential_p2p_restores_aperture_observability():
    """The aperture problem and its fix (round 5): a displacement purely
    TANGENTIAL to the (constant) normals is invisible to the
    point-to-plane term (cost exactly 0, nothing solved) but observable
    and solvable with the tangential p2p term; a per-point zero gate
    reproduces the pure-p2pl behavior bitwise."""
    field = _cube_field()
    can = np.array([[0, 0, 0], [0.5, 0.5, 0.5], [-0.5, 0.2, -0.1]], np.float32)
    n = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32), can.shape)
    live = can + np.array([0.03, 0.0, 0.0], np.float32)  # tangential shift

    # pure p2pl: blind to it
    f_pl, s_pl = _solve(field, can, live, normals=n, p2pl=True)
    assert float(s_pl.initial_cost) < 1e-12

    # tangential p2p term on: sees and solves it
    cfg = dataclasses.replace(ORACLE_CFG, solver_p2p_weight=1.0)
    f_t, s_t = _solve(field, can, live, normals=n, cfg=cfg, p2pl=True)
    assert float(s_t.initial_cost) > 1e-5
    warped = np.asarray(warpfield.warp_points(f_t, jnp.asarray(can)))
    np.testing.assert_allclose(warped, live, atol=1e-3)

    # per-point gate 0 == pure p2pl
    inputs0 = warp_solver.WarpSolveInputs(
        p_can=jnp.asarray(can), n_can=jnp.asarray(n),
        p_live=jnp.asarray(live), n_live=jnp.asarray(n),
        p2p_gate=jnp.zeros((3, 1)),
    )
    f_g, s_g = warp_solver.solve(cfg, field, inputs0, point_to_plane=True)
    assert float(s_g.initial_cost) < 1e-12
    # same fixed point as pure p2pl (row shapes differ, so not bitwise)
    np.testing.assert_allclose(
        np.asarray(f_g.dq), np.asarray(f_pl.dq), atol=1e-6
    )


def test_arap_propagates_to_unconstrained_nodes():
    # The capability the reference never wired in (§2.9 item 8): with the
    # ARAP term active, nodes with no data constraints must follow their
    # neighbors instead of staying at identity.
    cfg = dataclasses.replace(
        ORACLE_CFG, solver_arap_weight=10.0, solver_nonlinear_iters=12
    )
    field = _cube_field(cfg)
    # constrain only vertices near the +x face of the cube
    can = np.array([[1.0, 0.0, 0.0], [1.0, 0.5, 0.5], [1.0, -0.5, -0.5]], np.float32)
    live = can + np.array([0.05, 0.0, 0.0], np.float32)
    new_field, _ = _solve(field, can, live, cfg=cfg)
    t = np.asarray(dualquat.translation(new_field.dq[:8]))
    # -x face nodes (indices 4..7) must have been dragged along by ARAP
    assert np.all(t[4:, 0] > 0.01), t


def test_tukey_rejects_outliers():
    # A gross outlier correspondence must not corrupt the solution when the
    # Tukey weight window is tight.
    cfg = dataclasses.replace(ORACLE_CFG, solver_tukey_c=0.1)
    field = _cube_field(cfg)
    can = np.array(
        [[0, 0, 0], [0.5, 0.5, 0.5], [-0.5, -0.5, -0.5], [0.3, -0.3, 0.1]], np.float32
    )
    live = can + 0.02
    live_outlier = live.copy()
    live_outlier[3] = can[3] + np.array([5.0, -5.0, 5.0], np.float32)  # garbage
    new_field, _ = _solve(field, can, live_outlier, cfg=cfg)
    warped = np.asarray(warpfield.warp_points(new_field, jnp.asarray(can)))
    np.testing.assert_allclose(warped[:3], live[:3], atol=2e-3)


def test_nan_points_ignored():
    field = _cube_field()
    can = np.array([[0, 0, 0], [np.nan, 0, 0]], np.float32)
    live = np.array([[0.05, 0.05, 0.05], [np.nan, 0, 0]], np.float32)
    new_field, _ = _solve(field, can, live)
    warped = np.asarray(
        warpfield.warp_points(new_field, jnp.asarray([[0.0, 0.0, 0.0]]))
    )
    np.testing.assert_allclose(warped, [[0.05, 0.05, 0.05]], atol=1e-3)


def test_edge_system_blockwise_matches_dense_rows():
    """The blockwise ARAP assembly must equal the expanded-row normal
    equations (oh_i (x) je_i + oh_j (x) je_j rows, A^T A in f32)."""
    field = _cube_field()
    can = CUBE * 0.5
    live = can + np.asarray([0.02, -0.01, 0.03], np.float32)
    inputs = warp_solver.WarpSolveInputs(
        p_can=jnp.asarray(can), n_can=jnp.zeros_like(can),
        p_live=jnp.asarray(live), n_live=jnp.zeros_like(can),
    )
    s = warp_solver.prepare(ORACLE_CFG, field, inputs, False)
    n_nodes = field.positions.shape[0]
    dqs = field.dq

    jtj, jtr, _ = warp_solver.edge_system(ORACLE_CFG, s, dqs, n_nodes)

    re, je_i, je_j, _ = warp_solver.edge_residual_and_jac(ORACLE_CFG, s, dqs)
    oh_i = np.eye(n_nodes, dtype=np.float32)[np.asarray(s.e_src)]
    oh_j = np.eye(n_nodes, dtype=np.float32)[np.asarray(s.e_dst)]
    ae = (
        np.einsum("en,erd->ernd", oh_i, np.asarray(je_i))
        + np.einsum("en,erd->ernd", oh_j, np.asarray(je_j))
    ).reshape(-1, 6 * n_nodes)
    jtj_ref = ae.T @ ae
    jtr_ref = ae.T @ np.asarray(re).reshape(-1)

    np.testing.assert_allclose(np.asarray(jtj), jtj_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jtr), jtr_ref, rtol=1e-4, atol=1e-6)


def test_int8_jtj_close_to_f32():
    """The shipping int8-quantized JtJ assembly (data + edge terms) must
    match the f32 assembly within the quantization bound: per-entry error
    <= ~(0.5/127)*(c_i*c_j) row-count-accumulated, i.e. ~1e-2 relative of
    the column-max products. Jtr is exact (f32) on both paths."""
    cfg8 = dataclasses.replace(ORACLE_CFG, solver_jtj_int8=True)
    field = _cube_field()
    rng = np.random.default_rng(12)
    can = rng.uniform(-0.9, 0.9, (200, 3)).astype(np.float32)
    live = can + rng.normal(scale=0.02, size=can.shape).astype(np.float32)
    inputs = warp_solver.WarpSolveInputs(
        p_can=jnp.asarray(can), n_can=jnp.zeros_like(can),
        p_live=jnp.asarray(live), n_live=jnp.zeros_like(can),
    )
    s = warp_solver.prepare(ORACLE_CFG, field, inputs, False)
    n_nodes = field.positions.shape[0]

    jtj8, jtr8, _ = warp_solver.gn_system_dense(cfg8, s, field.dq, n_nodes, False)
    jtjf, jtrf, _ = warp_solver.gn_system_dense(ORACLE_CFG, s, field.dq, n_nodes, False)

    # quantization-appropriate bound: relative to the column-scale products
    scale = np.sqrt(np.maximum(np.diag(np.asarray(jtjf)), 1e-12))
    bound = 2e-2 * np.outer(scale, scale) + 1e-6
    assert np.all(np.abs(np.asarray(jtj8) - np.asarray(jtjf)) <= bound)
    # Jtr identical on both paths (never quantized)
    np.testing.assert_allclose(np.asarray(jtr8), np.asarray(jtrf), rtol=1e-5, atol=1e-8)


class TestLinearSolvers:
    def test_pcg_matches_cholesky_on_spd(self):
        """Block-Jacobi PCG must solve the damped normal equations to the
        same solution as the direct path."""
        rng = np.random.default_rng(3)
        n_nodes = 6
        dof = 6 * n_nodes
        m = rng.normal(size=(dof, dof)).astype(np.float32) * 0.1
        a = jnp.asarray(m @ m.T + 2.0 * np.eye(dof, dtype=np.float32))
        b = jnp.asarray(rng.normal(size=(dof,)).astype(np.float32))
        x_pcg = warp_solver._pcg_solve(a, b, n_nodes, iters=200, rtol=1e-6)
        import jax.scipy.linalg as jsl

        x_direct = jsl.cho_solve(jsl.cho_factor(a, lower=True), b)
        np.testing.assert_allclose(
            np.asarray(x_pcg), np.asarray(x_direct), rtol=1e-3, atol=1e-4
        )

    def test_pcg_iteration_cap_respected(self):
        """With a 1-iteration cap PCG must still return something finite
        (an inexact LM step, not a crash)."""
        rng = np.random.default_rng(4)
        dof = 12
        m = rng.normal(size=(dof, dof)).astype(np.float32)
        a = jnp.asarray(m @ m.T + 5.0 * np.eye(dof, dtype=np.float32))
        b = jnp.asarray(rng.normal(size=(dof,)).astype(np.float32))
        x = warp_solver._pcg_solve(a, b, 2, iters=1, rtol=0.0)
        assert np.isfinite(np.asarray(x)).all()

    def test_solve_direct_matches_pcg_field(self):
        """End-to-end: the LM solve with direct vs PCG linear solver lands
        on the same warp field (rigid-shift scenario)."""
        import dataclasses

        field = _cube_field()
        can = CUBE * 0.5
        live = can + 0.05
        cfg_d = dataclasses.replace(ORACLE_CFG, solver_linear="direct")
        cfg_p = dataclasses.replace(ORACLE_CFG, solver_linear="pcg")
        fd, _ = _solve(_cube_field(), can, live, cfg=cfg_d)
        fp, _ = _solve(_cube_field(), can, live, cfg=cfg_p)
        np.testing.assert_allclose(
            np.asarray(fd.dq), np.asarray(fp.dq), atol=1e-3
        )


class TestRigidPrealign:
    def test_recovers_known_rigid_offset(self):
        """With an identity field, a rigidly shifted live set must be
        explained entirely by the returned pose correction."""
        from dynamicfusion_tpu.core import se3

        rng = np.random.default_rng(7)
        can = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
        nrm = rng.normal(size=(400, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        t_true = np.asarray(se3.exp_twist(jnp.asarray([0.01, -0.02, 0.015, 0.02, 0.01, -0.03])))
        # live = T_true^-1 applied to canonical: prealign must return ~T_true
        live = (can - t_true[:3, 3]) @ t_true[:3, :3]
        field = _cube_field()
        cfg = dataclasses.replace(ORACLE_CFG, solver_tukey_c=1.0)
        inputs = warp_solver.WarpSolveInputs(
            p_can=jnp.asarray(can), n_can=jnp.asarray(nrm),
            p_live=jnp.asarray(live.astype(np.float32)), n_live=jnp.asarray(nrm),
        )
        t_est = np.asarray(warp_solver.rigid_prealign(cfg, field, inputs, stride=1))
        live_fixed = live @ t_est[:3, :3].T + t_est[:3, 3]
        np.testing.assert_allclose(live_fixed, can, atol=2e-3)

    def test_identity_when_aligned(self):
        rng = np.random.default_rng(8)
        can = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        nrm = rng.normal(size=(300, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        field = _cube_field()
        inputs = warp_solver.WarpSolveInputs(
            p_can=jnp.asarray(can), n_can=jnp.asarray(nrm),
            p_live=jnp.asarray(can), n_live=jnp.asarray(nrm),
        )
        t_est = np.asarray(warp_solver.rigid_prealign(ORACLE_CFG, field, inputs, stride=1))
        np.testing.assert_allclose(t_est, np.eye(4), atol=1e-4)


def test_lagged_jtj_converges():
    """The default lagged-JtJ (Shamanskii) loop reaches the same fixed
    point as exact-Hessian LM on a warm-start-sized displacement (the
    pipeline's regime: the field carries most of the motion, each frame
    adds a small increment). The gradient is exact at every accepted point,
    so the solutions agree; the lagged metric may cost extra iterations on
    cold large displacements (covered by the exact-LM oracles)."""
    cfg_lag = dataclasses.replace(
        ORACLE_CFG, solver_lagged_jtj=True, solver_nonlinear_iters=10
    )
    field = _cube_field()
    rng = np.random.default_rng(5)
    can = rng.uniform(-0.9, 0.9, (60, 3)).astype(np.float32)
    live = can + np.asarray([0.01, -0.008, 0.012], np.float32)
    new_field, stats = _solve(field, can, live, cfg=cfg_lag)
    warped = np.asarray(warpfield.warp_points(new_field, jnp.asarray(can)))
    np.testing.assert_allclose(warped, live, atol=1e-3)
    assert float(stats.final_cost) < float(stats.initial_cost)
