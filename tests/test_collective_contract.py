"""Communication contract of the compiled sharded step (post-GSPMD HLO).

The explicit collectives (shard_map psums) are covered op-by-op in
test_distributed_gn; this asserts the WHOLE compiled step's budget at a
bench-representative shape, catching GSPMD partitioning regressions —
e.g. the round-3 finding that global-brick-id gathers in the fusion path
made the partitioner all-reduce entire volumes (~205 MB/frame) until
parallel.sharded_fusion made fusion communication-free.

Shape: 128^3 / 320x240 / 512 nodes over 8 devices — 16-voxel slabs are
whole brick planes, so the per-shard-brick fusion path is ACTIVE (the
same structure the full 256^3 dryrun/census runs; scripts/
collective_bytes.py measures the 256^3 numbers recorded in SCALING.md).
The XLA-CPU compile here is heavy and paid on EVERY suite run:
tests/conftest.py deliberately disables the persistent compile cache for
the suite (cache-SERVED XLA-CPU SPMD executables can abort at execution
on this jax). This test never executes the program, so it could in
principle opt into its own cache directory — kept cache-free for now so
no SPMD entry of the suite's shapes ever lands in a cache an executing
context might read.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig, Intrinsics
from dynamicfusion_tpu.parallel import sharded
from dynamicfusion_tpu.pipeline import kinfu
from dynamicfusion_tpu.utils import hlo_census


def _census(hlo):
    """[(kind, payload_bytes, per_trip)] — per_trip marks collectives
    living inside a while-loop body AFTER XLA's loop-invariant hoisting,
    i.e. ops truly paid once per loop trip (utils/hlo_census.py)."""
    counts, _ = hlo_census.census(hlo)
    out = []
    for (kind, nbytes, per_trip), count in counts.items():
        out.extend([(kind, nbytes, per_trip)] * count)
    return out


def _contract_cfg(**over):
    scale = 320 / 640.0
    return dataclasses.replace(
        DynamicFusionConfig.default_dynamicfusion(),
        rows=240, cols=320, volume_dims=128, max_nodes=512,
        intr=Intrinsics(570.342 * scale, 570.342 * scale, 160.0, 120.0),
        **over,
    )


def _step_census(cfg):
    mesh = sharded.make_mesh(8)
    step = sharded.make_sharded_step(cfg, mesh)
    state = sharded.shard_state(cfg, mesh, kinfu.init_state(cfg))
    depth = jnp.zeros((cfg.rows, cfg.cols), jnp.uint16)
    return _census(step.lower(state, depth).compile().as_text())


def test_step_collective_budget():
    # the SUMMED-Schur mode (one (6N,6N) all-reduce per relinearization):
    # pinned explicitly — the flagship preset defaults to pcg since round 4
    cfg = _contract_cfg(solver_linear="direct")
    ops = _step_census(cfg)

    dof = 6 * cfg.max_nodes
    schur = dof * dof * 4
    vol_bytes = cfg.volume_dims ** 3 * 4

    # exactly ONE Schur-round-sized all-reduce (the lagged-JtJ solver's
    # one relinearization per solve)
    big_ar = [b for k, b, _ in ops if k == "all-reduce" and b >= schur]
    assert len(big_ar) == 1, big_ar

    # nothing volume-sized crosses the wire (apart from the Schur round
    # itself, which at 512 nodes exceeds the 128^3 volume size): the
    # fusion path fuses each shard's bricks locally (sharded_fusion),
    # raycast/integrate halos are plane-sized collective-permutes
    for kind, nbytes, _ in ops:
        if nbytes >= schur:
            assert kind == "all-reduce" and nbytes == big_ar[0], (kind, nbytes)
        else:
            assert nbytes < vol_bytes, (kind, nbytes, "volume-sized collective")

    # static per-execution total stays within ~1.3x the Schur round — the
    # communication budget is the solver reduction, everything else is
    # small (halos, depth broadcast, eval-gradient psums)
    total = sum(b for _, b, _ in ops)
    assert total < 1.3 * schur + 8e6, total / 1e6

    _assert_march_contract(ops)


def _assert_march_contract(ops):
    """The MARCH contract (VERDICT r4 #3): no image/volume-sized
    collective executes per loop trip. Round 4's census measured the
    GSPMD-partitioned raycast march paying ~20-45 MB/frame of image-sized
    per-trip masked-gather all-reduces from the x-sharded volume;
    parallel/sharded_raycast.py (slab-local march, one halo exchange +
    one ownership round per raycast) must keep every PER-TRIP collective
    solver-vector-sized: the distributed-PCG matvec/eval psums are
    (6N,)-class (<= 64 KB at contract shape), everything bigger must be
    loop-invariant (once per step)."""
    per_trip = [(k, b) for k, b, pt in ops if pt]
    for kind, nbytes in per_trip:
        assert nbytes <= 65536, (kind, nbytes, "image-sized per-trip collective")
    assert sum(b for _, b in per_trip) < 0.5e6, per_trip


def test_step_collective_budget_pcg():
    """The distributed-PCG mode (solver_linear='pcg' routes the warp solve
    through parallel.distributed_gn.make_sharded_solve): the (6N,6N) Schur
    all-reduce is GONE — the solver's wire traffic is (6N,)-sized psums
    (gradient/cost/diag/matvec) plus one (N,6,6) preconditioner-block
    round, <1 MB per solve at this shape. The static whole-step census
    must contain NO Gram-sized collective and stay small overall."""
    cfg = _contract_cfg(solver_linear="pcg")
    ops = _step_census(cfg)

    dof = 6 * cfg.max_nodes
    schur = dof * dof * 4
    vol_bytes = cfg.volume_dims ** 3 * 4

    solver_biggest = cfg.max_nodes * 36 * 4  # the (N,6,6) block psum
    for kind, nbytes, _ in ops:
        assert nbytes < schur, (kind, nbytes, "Gram-sized collective in PCG mode")
        assert nbytes < vol_bytes, (kind, nbytes, "volume-sized collective")

    # static total: solver rounds are all (6N,)/(N,6,6)-sized; what remains
    # is the slab-raycast halo permutes + ownership psums + small reshapes
    total = sum(b for _, b, _ in ops)
    solver_total = sum(
        b for _, b, _ in ops if b <= solver_biggest
    )
    assert solver_total < 1e6, solver_total / 1e6
    assert total < 12e6, total / 1e6

    _assert_march_contract(ops)
