"""Explicit distributed GN (shard_map + psum) vs the single-device solver.

The oracle is equivalence: the Schur-reduced assembly over point shards
must reproduce the single-device normal equations, and the distributed
solve must converge to the same warp field on the reference's cube-node
scenarios (SURVEY §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.parallel import distributed_gn, sharded
from dynamicfusion_tpu.solvers import warp_solver

CUBE = np.array(
    [
        [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
        [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1],
    ],
    np.float32,
)

CFG = DynamicFusionConfig(
    volume_dims=64,
    max_nodes=16,
    node_sample_step=1,
    node_radius=3.0,
    knn_k=8,
    solver_nonlinear_iters=6,
    solver_linear_iters=60,
    solver_tukey_c=10.0,
    solver_huber_delta=10.0,
    solver_arap_weight=1e-4,
    point_to_plane=False,
    knn_method="exact",
    # what's under test is the sharded ASSEMBLY (psum'd normal equations);
    # the replicated linear solve is orthogonal and direct compiles much
    # faster on the CPU test backend. PCG x distributed is covered by
    # TestDistributedSolve::test_rigid_shift_converges below.
    solver_linear="direct",
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest forces 8 CPU devices"
    return sharded.make_mesh(8)


def _field():
    return warpfield.init_from_cloud(CFG, jnp.asarray(CUBE), jnp.ones(8, bool))


def _inputs(n=40, shift=(0.05, 0.05, 0.05)):
    rng = np.random.default_rng(0)
    can = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    live = can + np.asarray(shift, np.float32)
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    return warp_solver.WarpSolveInputs(
        p_can=jnp.asarray(can), n_can=jnp.asarray(nrm),
        p_live=jnp.asarray(live), n_live=jnp.asarray(nrm),
    )


class TestShardedSystem:
    def test_matches_single_device_assembly(self, mesh):
        field = _field()
        inputs = _inputs(n=40)
        s = warp_solver.prepare(CFG, field, inputs, False)
        n_nodes = field.positions.shape[0]

        jtj_ref, jtr_ref, cost_ref = jax.jit(
            lambda s, d: warp_solver.gn_system_dense(CFG, s, d, n_nodes, False)
        )(s, field.dq)

        sys_fn = distributed_gn.make_sharded_system(CFG, mesh, n_nodes, False)
        s_pad = distributed_gn._pad_points(s, 8)
        jtj_d, jtr_d, cost_d = jax.jit(sys_fn)(s_pad, field.dq)
        np.testing.assert_allclose(
            float(cost_d), float(cost_ref), rtol=1e-5, atol=1e-8
        )

        np.testing.assert_allclose(
            np.asarray(jtj_d), np.asarray(jtj_ref), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jtr_d), np.asarray(jtr_ref), rtol=1e-3, atol=1e-5
        )

    def test_padding_contributes_nothing(self, mesh):
        field = _field()
        inputs = _inputs(n=37)  # does not divide 8
        s = warp_solver.prepare(CFG, field, inputs, False)
        s_pad = distributed_gn._pad_points(s, 8)
        assert s_pad.p_can.shape[0] == 40
        n_nodes = field.positions.shape[0]
        jtj_ref, jtr_ref, _ = warp_solver.gn_system_dense(CFG, s, field.dq, n_nodes, False)
        sys_fn = distributed_gn.make_sharded_system(CFG, mesh, n_nodes, False)
        jtj_d, jtr_d, _ = jax.jit(sys_fn)(s_pad, field.dq)
        np.testing.assert_allclose(
            np.asarray(jtj_d), np.asarray(jtj_ref), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jtr_d), np.asarray(jtr_ref), rtol=1e-3, atol=1e-5
        )


class TestDistributedSolve:
    def test_rigid_shift_converges(self, mesh):
        """The reference's EnergyDataRigidTest through the distributed
        assembly: all vertices shifted +0.05 — warped output must match."""
        field = _field()
        inputs = _inputs(n=40)
        cfg = dataclasses.replace(CFG, solver_linear="pcg")
        f2, stats = jax.jit(
            lambda f, i: distributed_gn.solve_distributed(cfg, mesh, f, i)
        )(field, inputs)
        warped, _ = warpfield.warp_points(
            f2, inputs.p_can, inputs.n_can, k=CFG.knn_k, method="exact"
        )
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(inputs.p_live), atol=2e-3
        )
        assert float(stats.final_cost) < float(stats.initial_cost)

    def test_matches_single_device_solve(self, mesh):
        field = _field()
        inputs = _inputs(n=48, shift=(0.03, -0.02, 0.04))
        f_ref, _ = jax.jit(lambda f, i: warp_solver.solve(CFG, f, i))(field, inputs)
        f_dist, _ = jax.jit(
            lambda f, i: distributed_gn.solve_distributed(CFG, mesh, f, i)
        )(field, inputs)
        np.testing.assert_allclose(
            np.asarray(f_dist.dq), np.asarray(f_ref.dq), atol=5e-4
        )

    def test_sharded_pcg_matches_single_device(self, mesh):
        """The UNSUMMED-Gram distributed-PCG solve (make_sharded_solve):
        identical damped operator as the single-device dense-PCG path —
        matvec = psum(per-shard Gram @ p) + damp*p — so the solved field
        must match to f32 reduction-order noise."""
        cfg = dataclasses.replace(CFG, solver_linear="pcg")
        field = _field()
        inputs = _inputs(n=48, shift=(0.03, -0.02, 0.04))
        f_ref, st_ref = jax.jit(lambda f, i: warp_solver.solve(cfg, f, i))(field, inputs)
        solve_fn = distributed_gn.make_sharded_solve(cfg, mesh, False)
        f_dist, st = jax.jit(solve_fn)(field, inputs)
        np.testing.assert_allclose(
            np.asarray(f_dist.dq), np.asarray(f_ref.dq), atol=5e-4
        )
        np.testing.assert_allclose(
            float(st.final_cost), float(st_ref.final_cost), rtol=1e-3, atol=1e-7
        )


class TestCompiledCollectives:
    def test_one_allreduce_round_per_relinearization(self, mesh):
        """The Schur reduction's communication contract, checked on the
        LOWERED program (StableHLO — backend-stable; the CPU test backend
        rewrites collectives to custom-calls in its final HLO): one
        relinearization through the explicit assembly communicates one
        all-reduce ROUND — the psum of (JtJ, Jtr, cost), which lowers to
        one all_reduce per tensor — plus, with int8 quantization, the (6N,)
        pmax of the column scales. Nothing else: no all-gather of the row
        matrix, no all-to-all resharding, and the (6N,6N) Gram crosses the
        wire exactly once."""
        import re

        field = _field()
        inputs = _inputs(n=40)
        n_nodes = field.positions.shape[0]
        dof = 6 * n_nodes

        for int8, max_ar in ((False, 3), (True, 4)):
            cfg = dataclasses.replace(CFG, solver_jtj_int8=int8)
            s = warp_solver.prepare(cfg, field, inputs, False)
            s_pad = distributed_gn._pad_points(s, 8)
            sys_fn = distributed_gn.make_sharded_system(cfg, mesh, n_nodes, False)
            txt = jax.jit(sys_fn).lower(s_pad, field.dq).as_text()

            # upper bound, not exact count: newer JAX versions may lower a
            # tuple psum to a single variadic all_reduce — the real contract
            # is the single-Gram-transfer + no-gather assertions below
            n_ar = txt.count("stablehlo.all_reduce")
            assert 1 <= n_ar <= max_ar, (int8, n_ar)
            # the big (6N,6N) Gram is all-reduced exactly once (the op is a
            # region op; its type signature closes the block)
            big = re.findall(
                r'"stablehlo\.all_reduce".*?\}\) : \(tensor<%dx%dxf32>' % (dof, dof),
                txt,
                re.S,
            )
            assert len(big) == 1, len(big)
            # ...and never all-gathered / resharded
            assert "stablehlo.all_gather" not in txt
            assert "stablehlo.all_to_all" not in txt

    def test_sharded_pcg_no_gram_sized_collective(self, mesh):
        """The distributed-PCG solve's contract (SCALING.md §4): the
        (6N,6N) Gram NEVER crosses the wire — every collective in the
        lowered whole-solve program is at most (N,6,6)-sized (the
        preconditioner-block psum)."""
        import re

        cfg = dataclasses.replace(CFG, solver_linear="pcg")
        field = _field()
        inputs = _inputs(n=48)
        solve_fn = distributed_gn.make_sharded_solve(cfg, mesh, False)
        txt = jax.jit(solve_fn).lower(field, inputs).as_text()
        n_nodes = field.positions.shape[0]
        biggest_ok = n_nodes * 36  # the (N,6,6) preconditioner blocks
        for m in re.finditer(r"stablehlo\.all_reduce.*?tensor<([0-9x]*)x?f32>", txt, re.S):
            dims = [int(d) for d in m.group(1).split("x") if d]
            n = 1
            for d in dims:
                n *= d
            assert n <= biggest_ok, (dims, n)
        assert "stablehlo.all_to_all" not in txt
