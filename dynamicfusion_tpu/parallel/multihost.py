"""Multi-host (multi-process) mesh setup for the sharded pipeline.

The reference is strictly single-process/single-GPU (SURVEY §2.a); this
module is the new capability BASELINE's ≥2-host scaling target needs: a
process-spanning ``jax.sharding.Mesh`` built after
``jax.distributed.initialize``, with the same shardings as the
single-process path (parallel/sharded.py) laid out over ALL processes'
devices.

What changes across the host boundary (DCN instead of ICI), in order of
per-frame bytes at the bench shape (640x480 / 256^3 / 1024 nodes, f32):

- the warp solve's Schur reduction: ONE (6N,6N)+(6N,) all-reduce per
  relinearization = 151 MB with N=1024 — the dominant DCN transfer. The
  lagged-JtJ LM (cfg.solver_lagged_jtj, default) already bounds this to
  one per SOLVE (per-candidate evals all-reduce only (6N,)+scalar
  ≈ 25 KB); on a 2D (host, chip) mesh the right layout is
  psum over the in-host axis first, then the cross-host axis — XLA emits
  exactly that for a psum over both axes of a 2D mesh.
- volume-x halo exchange for trilinear reads at shard borders: GSPMD
  inserts collective-permutes of one voxel plane ≈ D^2 * 2 fields * 4 B =
  0.5 MB per neighbor pair per raycast/integrate.
- the replicated depth frame broadcast: 0.6 MB uint16 (scatter from the
  ingest host).
- ICP's 6x6 normal equations: psum of 27 floats per GN iteration —
  negligible (the reference paid a device->host readback here,
  projective_icp.cpp:43-62).

See SCALING.md for the measured collective-byte accounting extracted from
the compiled HLO and the resulting efficiency model.

Smoke-tested with 2 simulated processes on the CPU backend
(tests/test_multihost.py drives scripts/multihost_worker.py through
``jax.distributed.initialize`` + gloo CPU collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """``jax.distributed.initialize`` wrapper for the pipeline's processes.

    On TPU pods this is usually argument-free (the TPU runtime provides
    the topology); the explicit signature exists for the CPU smoke test
    and for DCN-connected CPU/GPU hosts. Call BEFORE any other jax API
    touches the backend."""
    try:
        # CPU backend: cross-process collectives go through gloo
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except (AttributeError, ValueError):  # non-CPU backends / older knob
        pass
    kwargs = {}
    if local_device_count is not None:
        # jax 0.9's knob is local_device_ids (num_local_devices no longer
        # exists); covered by tests/test_multihost.py.
        kwargs["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_global_mesh(axis: str = "d") -> Mesh:
    """One mesh axis spanning every device of every process, ordered by
    (process, local device) so contiguous shards stay host-local — the
    volume's x-axis sharding then cuts at most (num_processes - 1) halo
    pairs across DCN, the rest stay on-host."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def shard_state(cfg, mesh: Mesh, state, axis: str = "d"):
    """Multi-process-safe layout of a replicated PipelineState over the
    global mesh.

    ``jax.device_put`` cannot be used here: its cross-process equality
    check compares values with ``!=``, so the NaN-filled model maps of a
    fresh state fail it even though every process holds bit-identical
    data. ``make_array_from_callback`` builds each global array from the
    process-local value directly (every process serves its addressable
    shards), with no value comparison."""
    from dynamicfusion_tpu.parallel import sharded as sharded_mod

    ss = sharded_mod.state_shardings(cfg, mesh, axis)

    def put(x, sh):
        xn = np.asarray(x)
        return jax.make_array_from_callback(xn.shape, sh, lambda idx: xn[idx])

    return jax.tree.map(put, state, ss)


def make_host_chip_mesh(axis_host: str = "h", axis_chip: str = "c") -> Mesh:
    """2D (host, chip) mesh: psums over both axes reduce in-host first,
    cross-host second (the DCN-aware reduction order for the warp solve's
    Schur round)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per)
    return Mesh(grid, (axis_host, axis_chip))
