"""Native IO tests: PNG16 roundtrip through libdfio + prefetching loader."""

import os

import numpy as np
import pytest
from PIL import Image

from dynamicfusion_tpu.io import dataset, native_loader


@pytest.fixture()
def png_dir(tmp_path):
    d = tmp_path / "seq" / "depth"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    arrays = []
    for i in range(6):
        a = rng.randint(0, 5000, (48, 64)).astype(np.uint16)
        Image.fromarray(a, mode="I;16").save(d / f"frame_{i:04d}.png")
        arrays.append(a)
    return tmp_path / "seq", arrays


def test_native_available():
    assert native_loader.native_available(), "libdfio.so not built (make -C native)"


def test_read_png16_exact(png_dir):
    root, arrays = png_dir
    p = sorted(os.listdir(root / "depth"))[0]
    out = native_loader.read_png(str(root / "depth" / p))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, arrays[0])


def test_prefetching_sequence_order(png_dir):
    root, arrays = png_dir
    paths = [str(root / "depth" / f) for f in sorted(os.listdir(root / "depth"))]
    seq = native_loader.PrefetchingSequence(paths, threads=3, depth=4)
    for i, frame in enumerate(seq):
        np.testing.assert_array_equal(frame, arrays[i])
    seq.close()


def test_depth_sequence(png_dir):
    root, arrays = png_dir
    ds = dataset.DepthSequence(str(root))
    assert len(ds) == 6
    np.testing.assert_array_equal(ds.depth(3), arrays[3])
    ds.close()


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        dataset.DepthSequence(str(tmp_path / "nope"))
