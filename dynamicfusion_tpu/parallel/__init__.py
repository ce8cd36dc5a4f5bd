"""Multi-device sharding of the DynamicFusion pipeline.

The reference is strictly single-GPU (no MPI/NCCL anywhere — SURVEY §2.a);
this layer is new capability. Scaling axes (the domain's analogue of
tensor/data parallelism):

- volume sharding: the TSDF grid splits along its leading (x) axis across
  the mesh — integrate/fusion are voxel-local so they partition cleanly;
  trilinear reads at shard borders become XLA-inserted halo exchanges.
- pixel sharding: depth-map rows split across the mesh for preprocessing,
  ICP residual rows, and solver data terms; the 6x6 ICP system and the
  (6N, 6N) warp-solver normal equations reduce with psum (all-reduce over
  ICI) — the Schur-style distributed Gauss-Newton from BASELINE.json.
- nodes are replicated (they are small: <= max_nodes * 24 floats).

Implemented with `jax.jit` + NamedSharding constraints: XLA's SPMD
partitioner inserts the halo exchanges and all-reduces.
"""
