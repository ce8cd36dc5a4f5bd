"""Rigid-only KinectFusion mode (identity warp, reference kinfu preset)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu

CFG = dataclasses.replace(
    DynamicFusionConfig.small(dims=64, rows=120, cols=160),
    max_nodes=64,
    node_sample_step=17,
    rigid_only=True,
)


def _depth(pose=np.eye(4)):
    return jnp.asarray(
        synthetic.scene_depth(
            CFG.intr, CFG.rows, CFG.cols, pose,
            spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.22)], plane_z=1.2,
        )
    )


def test_rigid_tracking_and_fusion():
    df = kinfu.DynamicFusion(CFG)
    poses = [synthetic.orbit_pose(a, target=(0.0, 0.0, 0.9)) for a in (0.0, 0.02, 0.04)]
    df(_depth(poses[0]))
    for p in poses[1:]:
        assert df(_depth(p))
    est = np.asarray(df.get_pose())
    assert np.linalg.norm(est[:3, 3] - poses[-1][:3, 3]) < 0.01
    # multiple integrations accumulated
    from dynamicfusion_tpu.models import volume as volume_model
    assert float(volume_model.decode_weight(df.state.vol.weight).max()) >= 3.0
    # solver untouched
    assert float(df.last_outputs.solver_cost1) == 0.0
