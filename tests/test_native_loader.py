"""Native image decoder (data/native/loader.cpp) vs the PIL path.

The native path must be BIT-IDENTICAL to PIL for every dataset item — it is
a drop-in decode backend, not an approximation (both sit on libjpeg-turbo's
islow IDCT / libpng, so exact equality is the contract, not a tolerance).
"""
import os

import numpy as np
import pytest

from driving_dirty_tpu.data import dataset as ds
from driving_dirty_tpu.data.synthetic import generate

native = pytest.importorskip("driving_dirty_tpu.data._native")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_data")
    generate(str(d), scenes=1, samples=2, labeled_scenes=1, seed=3)
    return str(d)


def _pil_image(path, raw_uint8=False):
    from PIL import Image

    with Image.open(path) as im:
        a = np.asarray(im.convert("RGB"), np.uint8)
    return a if raw_uint8 else a.astype(np.float32) / 255.0


def test_jpeg_bit_identical_to_pil(data_root):
    p = os.path.join(data_root, "scene_0", "sample_0", "CAM_FRONT.jpeg")
    for u8 in (True, False):
        a = native.decode_image(p, ds.IMAGE_H, ds.IMAGE_W, raw_uint8=u8)
        np.testing.assert_array_equal(a, _pil_image(p, u8))


def test_png_bit_identical_to_pil(data_root):
    p = os.path.join(data_root, "scene_106", "sample_0", "ego.png")
    for u8 in (True, False):
        a = native.decode_image(p, 800, 800, raw_uint8=u8)
        np.testing.assert_array_equal(a, _pil_image(p, u8))


def test_batch_decode_into_preallocated(data_root):
    paths = [
        os.path.join(data_root, "scene_0", "sample_0", n) for n in ds.IMAGE_NAMES
    ]
    out = np.empty((6, ds.IMAGE_H, ds.IMAGE_W, 3), np.uint8)
    got = native.decode_batch(paths, ds.IMAGE_H, ds.IMAGE_W, raw_uint8=True, out=out)
    assert got is out
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i], _pil_image(p, True))


def test_shape_mismatch_is_an_error_not_a_crash(data_root):
    p = os.path.join(data_root, "scene_0", "sample_0", "CAM_FRONT.jpeg")
    with pytest.raises(OSError, match="shape"):
        native.decode_image(p, 128, 128)


def test_missing_and_corrupt_files_raise(tmp_path, data_root):
    with pytest.raises(OSError, match="open"):
        native.decode_image(str(tmp_path / "nope.jpeg"), 4, 4)
    bad = tmp_path / "bad.jpeg"
    bad.write_bytes(b"\xff\xd8not a real jpeg stream")
    with pytest.raises(OSError):
        native.decode_image(str(bad), 4, 4)


@pytest.mark.parametrize("raw_uint8", [False, True])
def test_dataset_items_identical_across_backends(data_root, monkeypatch, raw_uint8):
    """UnlabeledDataset/LabeledDataset items must not depend on the decode
    backend: run the same item with DD_NATIVE_DECODE on and off."""

    def items(env):
        monkeypatch.setenv("DD_NATIVE_DECODE", env)
        monkeypatch.setattr(ds, "_native", False)  # re-probe under the new env
        u = ds.UnlabeledDataset(data_root, np.arange(1), samples_per_scene=2,
                                raw_uint8=raw_uint8)
        ui = ds.UnlabeledDataset(data_root, np.arange(1), first_dim="image",
                                 samples_per_scene=2, raw_uint8=raw_uint8)
        l = ds.LabeledDataset(data_root, os.path.join(data_root, "annotation.csv"),
                              np.arange(106, 107), samples_per_scene=2,
                              raw_uint8=raw_uint8)
        return u[1], ui[3], l[0]

    nat_u, nat_ui, nat_l = items("1")
    pil_u, pil_ui, pil_l = items("0")
    np.testing.assert_array_equal(nat_u, pil_u)
    np.testing.assert_array_equal(nat_ui[0], pil_ui[0])
    assert nat_ui[1] == pil_ui[1]
    for k in nat_l:
        np.testing.assert_array_equal(nat_l[k], pil_l[k], err_msg=k)
    assert nat_u.dtype == (np.uint8 if raw_uint8 else np.float32)
