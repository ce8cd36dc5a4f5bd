#!/usr/bin/env python3
"""Worker process for the 2-process multi-host smoke test.

Launched by tests/test_multihost.py (and runnable by hand):

  python scripts/multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process brings 4 virtual CPU devices; the two processes form one
8-device global mesh and run the SHARDED full pipeline step (volume-x
GSPMD + explicit shard_map+psum GN) on a tiny shape. Collectives cross the
process boundary through gloo — the structural stand-in for DCN. Prints
one "MULTIHOST_OK ..." line on success."""

import os
import sys

# must be set before jax initializes the backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from dynamicfusion_tpu.parallel import multihost

    # pass local_device_count explicitly to exercise the
    # local_device_ids mapping in multihost.initialize (jax 0.9 API)
    multihost.initialize(coordinator, num_procs, proc_id, local_device_count=4)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 4 * num_procs, jax.device_count()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from dynamicfusion_tpu.config import DynamicFusionConfig
    from dynamicfusion_tpu.io import synthetic
    from dynamicfusion_tpu.parallel import sharded
    from dynamicfusion_tpu.pipeline import kinfu

    cfg = dataclasses.replace(
        DynamicFusionConfig.small(dims=64, rows=96, cols=128),
        max_nodes=128,
        node_sample_step=5,
        solver_nonlinear_iters=1,
        icp_iters=(2, 1, 1, 0),
        # the PRODUCTION multi-chip solver path (round 4): the whole LM
        # loop in one shard_map, per-shard row matrices, psum'd PCG
        # matvecs — its psums cross the process boundary through gloo
        # here, the structural DCN stand-in
        solver_linear="pcg",
    )
    mesh = multihost.make_global_mesh()

    depth_np = synthetic.scene_depth(
        cfg.intr, cfg.rows, cfg.cols,
        spheres=[dict(center=(0.0, 0.0, 0.8), radius=0.2)], plane_z=1.1,
    )
    depth = jnp.asarray(depth_np)

    # frame 0 replicated (same rationale as __graft_entry__.dryrun_multichip),
    # then the state is laid out over the process-spanning mesh
    state0 = jax.jit(lambda s, d: kinfu.first_frame(cfg, s, d))(
        kinfu.init_state(cfg), depth
    )
    # multi-process-safe layout (device_put's cross-process equality check
    # trips on the NaN init maps — see multihost.shard_state)
    state = multihost.shard_state(cfg, mesh, jax.block_until_ready(state0))
    step = sharded.make_sharded_step(cfg, mesh)
    state, out = step(state, depth)
    jax.block_until_ready(out)

    pose = np.asarray(out.pose)
    assert np.isfinite(pose).all()
    assert np.isfinite(float(out.solver_cost1))
    if proc_id == 0:
        print(
            f"MULTIHOST_OK procs={num_procs} devices={jax.device_count()} "
            f"cost={float(out.solver_cost1):.6f} nodes={int(out.node_count)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
