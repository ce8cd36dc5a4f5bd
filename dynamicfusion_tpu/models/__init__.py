"""Stateful model containers: the canonical TSDF volume and the warp field.

Both are immutable pytrees (NamedTuples of jnp arrays) threaded through the
jitted frame step — the TPU-native replacement for the reference's
``cuda::TsdfVolume`` / ``kfusion::WarpField`` classes.
"""
