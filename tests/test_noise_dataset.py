"""Sensor-noise validation: Kinect noise model + on-disk dataset path.

The reference validates end-to-end only on real Kinect data (the
VolumeDeform umbrella sequence, /root/reference/apps/demo.cpp:71-129,
/root/reference/download_data.sh:3-13), which can't be downloaded here.
These tests generate a VolumeDeform-layout 16-bit PNG dataset with a
Kinect-v1 noise model (mm/disparity quantization, z^2 axial noise, lateral
edge jitter, grazing-incidence + edge dropout) and run the FULL dataset
path: disk -> native PNG loader -> DatasetSource -> pipeline -> mesh.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.io import capture, synthetic
from dynamicfusion_tpu.pipeline import kinfu

# EXACTLY test_pipeline's config (it differed only in solver_arap_weight
# 10 -> 1): the jitted step is memoized per config (kinfu._jitted_step),
# so sharing it saves this file a full pipeline compile in suite runs
from tests.test_pipeline import CFG  # noqa: E402

CENTER, RADIUS = (0.0, 0.0, 0.9), 0.25


def _clean_frame(t: float) -> np.ndarray:
    sphere = synthetic.deforming_sphere_depth(
        CFG.intr, CFG.rows, CFG.cols, t=0.35 * t, center=CENTER, radius=RADIUS,
        amp=0.03,
    )
    bg = synthetic.scene_depth(
        CFG.intr, CFG.rows, CFG.cols,
        spheres=[dict(center=(0.32, -0.18, 1.0), radius=0.1)], plane_z=1.3,
    )
    return np.where((sphere > 0) & ((bg == 0) | (sphere < bg)), sphere, bg)


def test_kinect_noise_statistics():
    """The noise model produces the advertised error structure."""
    clean = _clean_frame(0.0)
    noisy = synthetic.kinect_noise(clean, CFG.intr, seed=3)
    assert noisy.dtype == np.uint16
    both = (clean > 0) & (noisy > 0)
    # some dropout happened, but most of the frame survives
    frac_valid = (noisy > 0).sum() / (clean > 0).sum()
    assert 0.75 < frac_valid < 1.0
    # interior error scale: mm-to-cm at ~1 m (axial + quantization), not
    # meters; ~half of all pixels snap back to the same disparity grid
    # point, so the MEDIAN is ~0 — the tail carries the noise
    err_mm = np.abs(noisy[both].astype(np.float64) - clean[both].astype(np.float64))
    assert 1.0 < np.percentile(err_mm, 90) < 20.0
    assert 0.2 < np.mean(err_mm) < 8.0
    # grazing-incidence dropout: the sphere silhouette ring loses pixels
    # deterministic per seed
    np.testing.assert_array_equal(noisy, synthetic.kinect_noise(clean, CFG.intr, seed=3))


def test_noisy_dataset_roundtrip_and_pipeline(tmp_path):
    """disk PNGs -> DatasetSource -> full non-rigid pipeline: tracking holds
    and the canonical surface stays within a few voxels of ground truth
    under sensor noise."""
    n = 6
    frames = [
        synthetic.kinect_noise(_clean_frame(t), CFG.intr, seed=t) for t in range(n)
    ]
    root = str(tmp_path / "seq")
    synthetic.write_dataset(root, frames)
    assert sorted(os.listdir(os.path.join(root, "depth")))[0] == "frame_00000.png"

    src = capture.open_source(root, cfg=CFG)
    assert len(src) == n

    df = kinfu.DynamicFusion(CFG)
    for depth, _color in src:
        ok = df(jnp.asarray(depth, jnp.uint16))
    src.close()
    assert ok  # tracking survived the noise
    assert int(df.state.frame_idx) == n

    # canonical-surface quality under noise: median within 2 voxels
    from dynamicfusion_tpu.ops import tsdf as tsdf_ops

    cloud = tsdf_ops.extract_cloud(CFG, df.state.vol, max_points=1 << 17)
    pts = np.asarray(cloud.points)[np.asarray(cloud.valid)]
    near = np.linalg.norm(pts - np.asarray(CENTER), axis=-1) < RADIUS + 0.1
    bg = np.linalg.norm(pts - np.array([0.32, -0.18, 1.0]), axis=-1) < 0.16
    pts = pts[near & ~bg]
    assert len(pts) > 500
    err = np.abs(np.linalg.norm(pts - np.asarray(CENTER), axis=-1) - RADIUS)
    med_mm = np.median(err) * 1000.0
    voxel_mm = CFG.voxel_size * 1000.0
    assert med_mm < 2.0 * voxel_mm, f"median {med_mm:.1f} mm vs voxel {voxel_mm:.1f} mm"
