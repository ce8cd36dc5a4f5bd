import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import synthetic
from dynamicfusion_tpu.pipeline import kinfu
from dynamicfusion_tpu.utils import checkpoint

# small shapes: checkpointing is state mechanics, not reconstruction —
# 32^3/96x128 trims the suite cost of these roundtrips (48x64 is too few
# pixels for the resume frame's ICP to stay healthy)
CFG = dataclasses.replace(
    DynamicFusionConfig.small(dims=32, rows=96, cols=128),
    max_nodes=64,
    node_sample_step=5,
    solver_nonlinear_iters=1,
)


def _depth():
    return jnp.asarray(
        synthetic.scene_depth(
            CFG.intr, CFG.rows, CFG.cols,
            spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.25)], plane_z=1.2,
        )
    )


def test_save_load_roundtrip(tmp_path):
    df = kinfu.DynamicFusion(CFG)
    d = _depth()
    df(d)
    df(d)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, df.state)

    restored = checkpoint.load(p, CFG)
    np.testing.assert_array_equal(np.asarray(restored.vol.tsdf), np.asarray(df.state.vol.tsdf))
    np.testing.assert_array_equal(np.asarray(restored.pose), np.asarray(df.state.pose))
    assert int(restored.frame_idx) == 2

    # resume: a third frame from the restored state runs fine (restore()
    # adopts the state AND the started flag — __call__ no longer reads
    # the device frame_idx per frame, see DynamicFusion.__call__)
    df2 = kinfu.DynamicFusion(CFG)
    df2.restore(restored)
    assert df2(d)

    # DIRECT assignment must resync the started flag too (the state
    # property's setter) — a mid-sequence state routed through first_frame
    # would re-integrate the frame as frame 0 into a populated volume
    df3 = kinfu.DynamicFusion(CFG)
    df3.state = checkpoint.load(p, CFG)
    assert df3._started
    assert df3(d)
    assert int(df3.state.frame_idx) == 3


def test_load_rejects_wrong_config(tmp_path):
    df = kinfu.DynamicFusion(CFG)
    df(_depth())
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, df.state)
    bad = dataclasses.replace(CFG, volume_dims=64)
    with pytest.raises(ValueError):
        checkpoint.load(p, bad)


def test_ply_export(tmp_path):
    # checkpoint's old ascii writer was consolidated into io/export.save_ply
    from dynamicfusion_tpu.io import export as export_mod

    pts = np.array([[0, 0, 1], [0.1, 0.2, 0.9], [np.nan, 0, 0]], np.float32)
    nrm = np.array([[0, 0, -1], [0, 1, 0], [0, 0, 1]], np.float32)
    p = str(tmp_path / "mesh.ply")
    export_mod.save_ply(p, pts, nrm, binary=False)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 2" in "\n".join(lines)  # NaN row dropped
    data = [
        l for l in lines
        if not l.startswith(("ply", "format", "comment", "element", "property", "end_"))
    ]
    assert len(data) == 2


def test_sharded_load_roundtrip(tmp_path):
    """A checkpoint restores directly onto a device mesh with the sharded
    pipeline's layout and the sharded step resumes from it."""
    from dynamicfusion_tpu.parallel import sharded

    df = kinfu.DynamicFusion(CFG)
    d = _depth()
    df(d)
    df(d)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, df.state)

    mesh = sharded.make_mesh(8)
    restored = checkpoint.load(p, CFG, mesh=mesh)
    # layout matches the sharded pipeline's spec
    want = sharded.state_shardings(CFG, mesh)
    assert restored.vol.tsdf.sharding == want.vol.tsdf
    np.testing.assert_array_equal(
        np.asarray(restored.vol.tsdf), np.asarray(df.state.vol.tsdf)
    )
    step = sharded.make_sharded_step(CFG, mesh)
    st2, out = step(restored, d)
    assert int(st2.frame_idx) == 3
    assert np.isfinite(np.asarray(out.pose)).all()
