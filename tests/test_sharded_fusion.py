"""Per-shard-brick sharded fusion == single-device non-rigid fusion.

parallel.sharded_fusion fuses each volume x-shard's bricks locally with
zero collectives (the GSPMD alternative all-reduces whole volumes — see
SCALING.md); the oracle is exact equivalence with ops.fusion's
integrate_nonrigid, plus the enabled=False mask leaving the volume
bit-identical."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.core import dualquat, se3
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.models import volume as volume_model
from dynamicfusion_tpu.models import warpfield
from dynamicfusion_tpu.ops import fusion, preprocess
from dynamicfusion_tpu.parallel import sharded, sharded_fusion

# 64^3 over 4 devices = 16-voxel slabs = whole brick planes
CFG = dataclasses.replace(
    DynamicFusionConfig.small(dims=64, rows=120, cols=160),
    max_nodes=64,
    node_radius=0.3,
    knn_field_stride=2,
)
N_DEV = 4


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(N_DEV)


def _setup():
    rng = np.random.default_rng(0)
    g = np.linspace(-0.35, 0.35, 4)
    pts = np.stack(np.meshgrid(g, g, g + 0.95, indexing="ij"), -1).reshape(-1, 3)
    field = warpfield.init_from_cloud(
        CFG, jnp.asarray(pts, np.float32), jnp.ones(len(pts), bool)
    )
    # small random node translations: a genuinely non-rigid warp
    trans = jnp.asarray(rng.uniform(-0.01, 0.01, (CFG.max_nodes, 3)), jnp.float32)
    dq = jax.vmap(dualquat.from_rot_trans, in_axes=(None, 0))(
        jnp.asarray([1.0, 0, 0, 0]), trans
    )
    field = field._replace(dq=jnp.where(field.active[:, None], dq, field.dq))

    depth = synthetic.scene_depth(
        CFG.intr, CFG.rows, CFG.cols,
        spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.25)], plane_z=1.2,
    )
    dists = preprocess.compute_dists(CFG.intr, jnp.asarray(depth))
    vol = volume_model.create(CFG)
    # pre-populate so the update touches non-trivial state
    vol = fusion.integrate_nonrigid(
        CFG, vol, field, dists, se3.identity(), CFG.intr
    )
    return field, dists, vol


def test_matches_single_device(mesh):
    field, dists, vol = _setup()
    w2c = se3.identity()

    ref, counts_ref = jax.jit(
        lambda v: fusion.integrate_nonrigid(
            CFG, v, field, dists, w2c, CFG.intr, with_counts=True
        )
    )(vol)

    integrate_fn = sharded_fusion.make_sharded_integrate(CFG, mesh)
    vol_s = jax.device_put(
        vol, jax.tree.map(
            lambda _: jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("d", None, None)
            ),
            vol,
        ),
    )
    out, counts = jax.jit(
        lambda v: integrate_fn(CFG, v, field, dists, w2c, CFG.intr, with_counts=True)
    )(vol_s)

    np.testing.assert_allclose(
        np.asarray(out.tsdf), np.asarray(ref.tsdf), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.weight), np.asarray(ref.weight), atol=1e-6
    )
    # same bricks classified into the band/wide classes overall
    assert int(counts[0]) == int(counts_ref[0])
    assert int(counts[1]) == int(counts_ref[1])


def test_enabled_false_is_identity(mesh):
    field, dists, vol = _setup()
    integrate_fn = sharded_fusion.make_sharded_integrate(CFG, mesh)
    vol_s = jax.device_put(
        vol, jax.tree.map(
            lambda _: jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("d", None, None)
            ),
            vol,
        ),
    )
    out, counts = jax.jit(
        lambda v: integrate_fn(
            CFG, v, field, dists, se3.identity(), CFG.intr,
            with_counts=True, enabled=jnp.array(False),
        )
    )(vol_s)
    np.testing.assert_array_equal(np.asarray(out.tsdf), np.asarray(vol.tsdf))
    np.testing.assert_array_equal(np.asarray(out.weight), np.asarray(vol.weight))
    assert int(counts[0]) == 0 and int(counts[1]) == 0
