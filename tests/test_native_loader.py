"""Native C++ PNG loader/prefetcher (native/loader.cpp via ctypes)."""
import numpy as np
import pytest

from PIL import Image

from lldslam_tpu import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    imgs = []
    for i in range(6):
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        Image.fromarray(img).save(d / f"{i:06d}.png")
        imgs.append(img)
    return d, imgs


def test_native_loader_decodes_correctly(png_dir):
    if native.get_lib() is None:
        pytest.skip("no g++/libpng toolchain")
    d, imgs = png_dir
    paths = [d / f"{i:06d}.png" for i in range(6)]
    ld = native.NativeImageLoader(paths, window=3, n_threads=2)
    assert len(ld) == 6
    # out-of-order access + exact pixel equality vs PIL ground truth
    for i in [0, 2, 1, 5, 3, 4]:
        out = ld.frame(i)
        np.testing.assert_array_equal(out, imgs[i])
    ld.close()


def test_prefetched_sequence(png_dir, tmp_path):
    if native.get_lib() is None:
        pytest.skip("no g++/libpng toolchain")
    d, imgs = png_dir
    from lldslam_tpu.io import datasets
    seq = datasets.StereoSequence(
        left=[d / f"{i:06d}.png" for i in range(3)],
        right=[d / f"{i:06d}.png" for i in range(3, 6)],
        timestamps=np.array([0.0, 0.1, 0.2]))
    pre = datasets.prefetch(seq)
    l, r, ts = pre.frame(1)
    np.testing.assert_array_equal(l, imgs[1])
    np.testing.assert_array_equal(r, imgs[4])
    assert ts == 0.1
