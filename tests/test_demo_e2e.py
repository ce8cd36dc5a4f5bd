"""Demo app end-to-end through the NATIVE dataset loader (round artifact).

The closest local stand-in for the reference's umbrella-sequence run
(/root/reference/apps/demo.cpp:80-88 globs <dir>/depth PNGs): synthetic
deforming-scene frames are written as 16-bit PNGs, apps/demo.py consumes
them through DatasetSource -> io.dataset.DepthSequence -> libdfio's
prefetching decoder, and the run must produce finite render/cloud/mesh/
checkpoint artifacts.

Runs as a SUBPROCESS (the demo script is the product surface under test,
argument parsing included). The subprocess gets a throwaway compile-cache
dir: a fresh cache is write-only, so the cache-SERVED-XLA-CPU-executable
abort (conftest note) cannot trigger.
"""

import dataclasses
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import native_loader, synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_ply_vertex_count_and_sample(path):
    """Minimal binary-PLY reader: vertex count + the first vertex floats."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = 0
        props = 0
        for line in header.decode().splitlines():
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float") and n and props >= 0:
                props += 1
            elif line.startswith("element") and n:
                props = -props if props else 0  # stop counting after vertex
        props = abs(props) or 3
        first = struct.unpack("<" + "f" * props, f.read(4 * props)) if n else ()
    return n, first


def test_demo_dataset_e2e(tmp_path):
    assert native_loader.native_available(), "libdfio.so not built (make -C native)"

    cfg = DynamicFusionConfig.small(dims=64, rows=120, cols=160)
    frames = []
    for t in range(5):
        sp = [
            dict(center=(0.0, 0.0, 0.95), radius=0.22),
            dict(center=(0.2 + 0.01 * np.sin(0.4 * t), 0.1, 0.8), radius=0.1),
        ]
        frames.append(
            synthetic.scene_depth(cfg.intr, cfg.rows, cfg.cols, spheres=sp, plane_z=1.25)
        )
    data_dir = tmp_path / "seq"
    synthetic.write_dataset(str(data_dir), frames)
    assert len(os.listdir(data_dir / "depth")) == 5

    out_dir = tmp_path / "out"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=str(tmp_path / "cache"),  # fresh: write-only
    )
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "apps", "demo.py"),
         str(data_dir), "--small", "--out", str(out_dir)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]

    # rendered frames for every dataset frame
    renders = sorted(p for p in os.listdir(out_dir) if p.startswith("frame_"))
    assert len(renders) == 5

    # cloud + meshes exist, are non-trivial, and their vertices are finite
    for name, min_verts in (
        ("canonical_cloud.ply", 200),
        ("canonical_mesh.ply", 100),
        ("live_mesh.ply", 100),
    ):
        n, first = _read_ply_vertex_count_and_sample(str(out_dir / name))
        assert n >= min_verts, (name, n)
        assert np.isfinite(first).all(), (name, first)

    # final checkpoint loads back into a state pytree with the right volume
    from dynamicfusion_tpu.utils import checkpoint

    # the demo's --small config (apps/demo.py build_cfg) as load template
    demo_cfg = dataclasses.replace(cfg, max_nodes=256, node_sample_step=7)
    state = checkpoint.load(str(out_dir / "final_state.npz"), demo_cfg)
    assert state.vol.tsdf.shape == (64, 64, 64)
    assert float(state.vol.weight.max()) > 0
