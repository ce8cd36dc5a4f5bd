"""Frame-source (io.capture) tests — the L6 capture layer
(reference: include/io/capture.hpp + apps/demo.cpp dataset path)."""

import numpy as np
import pytest

from dynamicfusion_tpu.config import DynamicFusionConfig
from dynamicfusion_tpu.io import capture


@pytest.fixture
def cfg():
    return DynamicFusionConfig.small(dims=32, rows=48, cols=64)


class TestSyntheticSource:
    def test_yields_n_uint16_frames(self, cfg):
        src = capture.SyntheticSource(cfg, 4)
        frames = list(src)
        assert len(frames) == 4
        for d, c in frames:
            assert d.dtype == np.uint16 and d.shape == (cfg.rows, cfg.cols)
            assert c is None
        assert src.grab() is None

    def test_intrinsics(self, cfg):
        assert capture.SyntheticSource(cfg, 1).intrinsics() is cfg.intr

    def test_frames_deform_over_time(self, cfg):
        src = capture.SyntheticSource(cfg, 3, amplitude=0.05)
        d0, _ = src.grab()
        src.grab()
        d2, _ = src.grab()
        assert (d0 != d2).any()


class TestDatasetSource:
    def test_reads_depth_and_color(self, cfg, tmp_path):
        from PIL import Image

        (tmp_path / "depth").mkdir()
        (tmp_path / "color").mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            d = rng.integers(500, 2000, (cfg.rows, cfg.cols)).astype(np.uint16)
            Image.fromarray(d, mode="I;16").save(tmp_path / "depth" / f"f_{i:03d}.png")
            c = rng.integers(0, 255, (cfg.rows, cfg.cols, 3)).astype(np.uint8)
            Image.fromarray(c).save(tmp_path / "color" / f"f_{i:03d}.png")
        with capture.DatasetSource(str(tmp_path)) as src:
            assert len(src) == 3
            frames = list(src)
        assert len(frames) == 3
        d, c = frames[0]
        assert d.dtype == np.uint16 and d.shape == (cfg.rows, cfg.cols)
        assert c is not None and c.shape[-1] == 3


class TestOpenNISource:
    def test_gated_without_bindings(self):
        with pytest.raises(ImportError, match="DatasetSource"):
            capture.OpenNISource(0)


class TestOpenSource:
    def test_synthetic_spec(self, cfg):
        src = capture.open_source("synthetic:5", cfg=cfg)
        assert isinstance(src, capture.SyntheticSource) and len(src) == 5

    def test_synthetic_needs_cfg(self):
        with pytest.raises(ValueError):
            capture.open_source("synthetic:5")

    def test_dataset_spec(self, cfg, tmp_path):
        from PIL import Image

        (tmp_path / "depth").mkdir()
        Image.fromarray(np.zeros((8, 8), np.uint16), mode="I;16").save(
            tmp_path / "depth" / "a.png"
        )
        src = capture.open_source(str(tmp_path))
        assert isinstance(src, capture.DatasetSource)

    def test_openni_spec_gated(self):
        with pytest.raises(ImportError):
            capture.open_source("openni:0")
