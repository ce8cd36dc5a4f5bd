"""Mesh extraction + PLY/OBJ export tests.

The reference has no mesh path (fetchCloud only, tsdf_volume.cpp:181-199;
Report.md:57 lists .ply/.obj export as future work); the oracle here is
analytic: a sphere SDF must produce a closed mesh of the right radius with
outward normals.
"""

import numpy as np
import pytest

from dynamicfusion_tpu.io import export


def sphere_volume(d=48, radius=0.5, trunc=0.12):
    """Analytic truncated sphere SDF on a d^3 grid spanning [0, 1]^3."""
    vs = 1.0 / (d - 1)
    g = np.arange(d) * vs
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dist = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - radius
    tsdf = np.clip(dist / trunc, -1.0, 1.0).astype(np.float32)
    weight = np.ones((d, d, d), np.float32)
    return tsdf, weight, vs


class TestMarchingTetrahedra:
    def test_sphere_radius_and_normals(self):
        tsdf, weight, vs = sphere_volume()
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        assert len(mesh.vertices) > 500
        assert len(mesh.faces) > 500
        r = np.linalg.norm(mesh.vertices - 0.5, axis=-1)
        # vertices lie on the sphere to within a voxel
        assert np.abs(r - 0.5).max() < vs
        # gradient normals point outward (tsdf grows outward)
        outward = (mesh.vertices - 0.5) / r[:, None]
        assert (np.sum(mesh.normals * outward, axis=-1) > 0.9).mean() > 0.99

    def test_faces_oriented_outward(self):
        tsdf, weight, vs = sphere_volume()
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        fv = mesh.vertices[mesh.faces]
        fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        c = fv.mean(axis=1) - 0.5
        assert ((fn * c).sum(-1) > 0).mean() > 0.99

    def test_closed_surface_area(self):
        tsdf, weight, vs = sphere_volume()
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        fv = mesh.vertices[mesh.faces]
        area = 0.5 * np.linalg.norm(
            np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0]), axis=-1
        ).sum()
        expect = 4.0 * np.pi * 0.5**2
        assert abs(area - expect) / expect < 0.05

    def test_unobserved_voxels_excluded(self):
        tsdf, weight, vs = sphere_volume()
        weight[:, :, : weight.shape[2] // 2] = 0.0  # half the volume unseen
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        assert len(mesh.vertices) > 0
        # no vertex strictly inside the unobserved half (1-voxel fringe ok)
        assert mesh.vertices[:, 2].min() > (weight.shape[2] // 2 - 2) * vs

    def test_empty_volume(self):
        d = 16
        mesh = export.marching_tetrahedra(
            np.ones((d, d, d), np.float32), np.zeros((d, d, d), np.float32), 0.01
        )
        assert len(mesh.vertices) == 0 and len(mesh.faces) == 0

    def test_welding_indexes_shared_vertices(self):
        tsdf, weight, vs = sphere_volume(d=24)
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        # an indexed mesh reuses vertices: far fewer verts than 3*faces
        assert len(mesh.vertices) < 1.5 * len(mesh.faces)


def _read_ply_header(path):
    with open(path, "rb") as f:
        lines = []
        while True:
            line = f.readline().decode().strip()
            lines.append(line)
            if line == "end_header":
                return lines, f.read()


class TestWriters:
    def test_ply_binary_roundtrip_sizes(self, tmp_path):
        tsdf, weight, vs = sphere_volume(d=24)
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        p = str(tmp_path / "m.ply")
        export.save_mesh(p, mesh)
        header, blob = _read_ply_header(p)
        assert f"element vertex {len(mesh.vertices)}" in header
        assert f"element face {len(mesh.faces)}" in header
        expect = len(mesh.vertices) * 24 + len(mesh.faces) * 13
        assert len(blob) == expect

    def test_ply_ascii_points_with_colors(self, tmp_path):
        pts = np.array([[0.0, 0.0, 1.0], [1.0, 2.0, 3.0]])
        col = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        p = str(tmp_path / "c.ply")
        export.save_ply(p, pts, colors=col, binary=False)
        header, blob = _read_ply_header(p)
        assert "property uchar red" in header
        rows = blob.decode().strip().splitlines()
        assert len(rows) == 2
        assert rows[0].split()[-3:] == ["255", "0", "0"]

    def test_ply_drops_nan_points(self, tmp_path):
        pts = np.array([[0.0, 0.0, 1.0], [np.nan, 0.0, 0.0], [1.0, 1.0, 1.0]])
        p = str(tmp_path / "n.ply")
        export.save_ply(p, pts, binary=False)
        header, blob = _read_ply_header(p)
        assert "element vertex 2" in header

    def test_obj_mesh(self, tmp_path):
        tsdf, weight, vs = sphere_volume(d=20)
        mesh = export.marching_tetrahedra(tsdf, weight, vs)
        p = str(tmp_path / "m.obj")
        export.save_obj(p, mesh.vertices, mesh.faces, mesh.normals)
        txt = open(p).read().splitlines()
        nv = sum(1 for l in txt if l.startswith("v "))
        nf = sum(1 for l in txt if l.startswith("f "))
        assert nv == len(mesh.vertices) and nf == len(mesh.faces)
        # face indices are 1-based and in range
        first = [int(tok.split("//")[0]) for tok in txt[-1].split()[1:]]
        assert all(1 <= i <= nv for i in first)


class TestPipelineMeshExport:
    def test_rigid_pipeline_mesh(self, tmp_path):
        """End-to-end: fuse a synthetic sphere scene, export its mesh."""
        import dataclasses

        import jax.numpy as jnp

        from dynamicfusion_tpu.config import DynamicFusionConfig
        from dynamicfusion_tpu.io import synthetic
        from dynamicfusion_tpu.pipeline import kinfu

        cfg = dataclasses.replace(
            DynamicFusionConfig.small(dims=64, rows=96, cols=128),
            rigid_only=True,
        )
        df = kinfu.DynamicFusion(cfg)
        d = synthetic.scene_depth(
            cfg.intr, cfg.rows, cfg.cols,
            spheres=[dict(center=(0.0, 0.0, 0.9), radius=0.2)], plane_z=1.2,
        )
        for _ in range(2):
            df(jnp.asarray(d))
        mesh = df.extract_mesh()
        assert len(mesh.vertices) > 100
        # sphere front should be present: some vertices ~0.2 from center
        r = np.linalg.norm(mesh.vertices - np.array([0.0, 0.0, 0.9]), axis=-1)
        assert (np.abs(r - 0.2) < 0.03).sum() > 50
        df.save_mesh(str(tmp_path / "scene.ply"))
        df.save_cloud(str(tmp_path / "cloud.ply"))
        assert (tmp_path / "scene.ply").stat().st_size > 1000
        assert (tmp_path / "cloud.ply").stat().st_size > 1000
