"""Scene dataset readers for the 6-camera driving dataset.

Directory layout (identical to the reference's expectations,
/root/reference/src/utils/data_helper.py):

    <root>/scene_<i>/sample_<j>/CAM_{FRONT_LEFT,FRONT,FRONT_RIGHT,
                                     BACK_LEFT,BACK,BACK_RIGHT}.jpeg
    <root>/scene_<i>/sample_<j>/ego.png          (labeled scenes)
    <root>/annotation.csv                        (labeled scenes)

Differences from the reference, by design (TPU-first):
  * Items come back as numpy NHWC float32 (the torch reference returns CHW
    tensors); the device pipeline keeps NHWC end to end.
  * Labeled targets are FIXED-SHAPE: boxes padded to `max_boxes` with a
    validity mask, instead of the reference's variable-length tuple collate
    (/root/reference/src/utils/helper.py:22-23). This also fixes the
    reference's partial-final-batch bug (bb_MLP.py:69, SURVEY.md §2.5).
  * Decoding is host-side PIL/libjpeg (native), feeding the prefetch pipeline
    in driving_dirty_tpu/data/pipeline.py.

Constants NUM_SAMPLE_PER_SCENE/NUM_IMAGE_PER_SAMPLE and the camera filename
order match data_helper.py:14-23.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

NUM_SAMPLE_PER_SCENE = 126
NUM_IMAGE_PER_SAMPLE = 6
IMAGE_NAMES = [
    "CAM_FRONT_LEFT.jpeg",
    "CAM_FRONT.jpeg",
    "CAM_FRONT_RIGHT.jpeg",
    "CAM_BACK_LEFT.jpeg",
    "CAM_BACK.jpeg",
    "CAM_BACK_RIGHT.jpeg",
]
IMAGE_H, IMAGE_W = 256, 306
MAX_BOXES_DEFAULT = 100

UNLABELED_SCENES = np.arange(106)
LABELED_SCENES = np.arange(106, 134)


_native = False  # tri-state: False = not probed, None = unavailable, module


def _native_decoder():
    """Lazy-build the C++ decoder (data/native/loader.cpp); None if it can't
    build. DD_NATIVE_DECODE=0 forces the PIL path (e.g. for parity tests)."""
    global _native
    if _native is False:
        if os.environ.get("DD_NATIVE_DECODE", "1") == "0":
            _native = None
        else:
            try:
                from . import _native as mod

                _native = mod
            except Exception:
                _native = None
    return _native


def _load_image(path, raw_uint8: bool = False, shape=None):
    """Decode one JPEG/PNG to RGB HWC (uint8, or f32 in [0,1]).

    With `shape=(h, w)` the decode goes through the native libjpeg/libpng
    path (bit-identical to PIL, ~1.6x faster per image and no intermediate
    copies — data/native/loader.cpp); without a shape hint, or when the
    native build is unavailable, PIL decodes.

    raw_uint8: keep raw bytes; /255 runs on device
    (ops.stitch.normalize_images). 4x fewer bytes to stack, copy and DMA
    than the reference's host-side to_tensor float path (data_helper.py:66).
    """
    if shape is not None:
        nat = _native_decoder()
        if nat is not None:
            try:
                return nat.decode_image(path, shape[0], shape[1], raw_uint8=raw_uint8)
            except OSError:
                pass  # odd file (size mismatch / corrupt header): let PIL try
    from PIL import Image

    with Image.open(path) as im:
        if raw_uint8:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr  # HWC


def _load_sample_images(path, raw_uint8: bool):
    """All 6 camera views of one sample as a [6, H, W, 3] array.

    Native path decodes every view straight into one contiguous buffer
    (no per-image arrays, no np.stack copy); PIL fallback stacks.
    """
    paths = [os.path.join(path, n) for n in IMAGE_NAMES]
    nat = _native_decoder()
    if nat is not None:
        try:
            return nat.decode_batch(paths, IMAGE_H, IMAGE_W, raw_uint8=raw_uint8, nthreads=1)
        except OSError:
            pass
    return np.stack([_load_image(p, raw_uint8) for p in paths])


def scene_split(scene_index, train_frac=0.8, seed=None, shuffle=True):
    """Scene-level train/val split (sample-level splits leak:
    /root/reference/src/autoencoder/autoencoder.py:127-131)."""
    idx = np.array(scene_index).copy()
    if shuffle:
        rng = np.random.RandomState(seed) if seed is not None else np.random
        rng.shuffle(idx)
    n_train = round(train_frac * len(idx))
    return idx[:n_train], idx[n_train:]


@dataclass
class UnlabeledDataset:
    """Map-style dataset over unlabeled scenes.

    first_dim='sample' -> item [6, H, W, 3]; first_dim='image' -> ([H, W, 3],
    camera_index). Index arithmetic matches data_helper.py:57-81.
    """

    image_folder: str
    scene_index: np.ndarray
    first_dim: str = "sample"
    samples_per_scene: int = NUM_SAMPLE_PER_SCENE  # 126 in the real dataset
    raw_uint8: bool = False  # camera images as uint8 (normalize on device)

    def __post_init__(self):
        assert self.first_dim in ("sample", "image")
        self.scene_index = np.asarray(self.scene_index)

    def __len__(self):
        n = self.scene_index.size * self.samples_per_scene
        return n * NUM_IMAGE_PER_SAMPLE if self.first_dim == "image" else n

    def _sample_path(self, scene_id, sample_id):
        return os.path.join(self.image_folder, f"scene_{scene_id}", f"sample_{sample_id}")

    def __getitem__(self, index):
        sps = self.samples_per_scene
        if self.first_dim == "sample":
            scene_id = self.scene_index[index // sps]
            sample_id = index % sps
            path = self._sample_path(scene_id, sample_id)
            return _load_sample_images(path, self.raw_uint8)
        scene_id = self.scene_index[index // (sps * NUM_IMAGE_PER_SAMPLE)]
        sample_id = (index % (sps * NUM_IMAGE_PER_SAMPLE)) // NUM_IMAGE_PER_SAMPLE
        cam = index % NUM_IMAGE_PER_SAMPLE
        path = self._sample_path(scene_id, sample_id)
        img = _load_image(
            os.path.join(path, IMAGE_NAMES[cam]), self.raw_uint8, shape=(IMAGE_H, IMAGE_W)
        )
        return img, cam


@dataclass
class LabeledDataset:
    """Labeled scenes: images + padded boxes/categories + road map.

    Item dict:
      images     [6, H, W, 3] float32
      boxes      [max_boxes, 2, 4] float32 (meters; rows x/y, corners fl,fr,bl,br)
      categories [max_boxes] int32 (padded with -1)
      box_valid  [max_boxes] bool
      road       [800, 800] float32 {0,1}
      action     [max_boxes] int32   (extra_info only)
      ego        [800, 800, 3]       (extra_info only)
      lane       [800, 800] float32  (extra_info only)
    """

    image_folder: str
    annotation_file: str
    scene_index: np.ndarray
    max_boxes: int = MAX_BOXES_DEFAULT
    extra_info: bool = False
    samples_per_scene: int = NUM_SAMPLE_PER_SCENE
    raw_uint8: bool = False  # camera images as uint8 (normalize on device)

    def __post_init__(self):
        import pandas as pd

        self.scene_index = np.asarray(self.scene_index)
        df = pd.read_csv(self.annotation_file)
        # Pre-group on (scene, sample) once; the reference re-filters the full
        # dataframe per item (data_helper.py:116), O(rows) per sample.
        self._groups = {k: v for k, v in df.groupby(["scene", "sample"])}

    def __len__(self):
        return self.scene_index.size * self.samples_per_scene

    def __getitem__(self, index):
        scene_id = int(self.scene_index[index // self.samples_per_scene])
        sample_id = index % self.samples_per_scene
        path = os.path.join(self.image_folder, f"scene_{scene_id}", f"sample_{sample_id}")
        images = _load_sample_images(path, self.raw_uint8)

        entries = self._groups.get((scene_id, sample_id))
        boxes = np.zeros((self.max_boxes, 2, 4), np.float32)
        cats = np.full((self.max_boxes,), -1, np.int32)
        valid = np.zeros((self.max_boxes,), bool)
        actions = np.full((self.max_boxes,), -1, np.int32)
        if entries is not None and len(entries):
            corners = entries[
                ["fl_x", "fr_x", "bl_x", "br_x", "fl_y", "fr_y", "bl_y", "br_y"]
            ].to_numpy(np.float32)
            n = min(len(corners), self.max_boxes)
            boxes[:n] = corners[:n].reshape(-1, 2, 4)
            cats[:n] = entries["category_id"].to_numpy(np.int32)[:n]
            valid[:n] = True
            if self.extra_info and "action_id" in entries:
                actions[:n] = entries["action_id"].to_numpy(np.int32)[:n]

        # Host-side numpy twins of ops.maps.convert_map_to_{road,lane}_map:
        # same elementwise semantics (helper.py:10-20), but they must NOT run
        # through jnp here — on a TPU-default platform that would round-trip
        # each 800x800 ego map host->device->host inside every loader thread,
        # contending with the training step for the chip.
        ego_chw = np.transpose(
            _load_image(os.path.join(path, "ego.png"), shape=(800, 800)), (2, 0, 1)
        )
        road = (~((ego_chw[0] == 1) & (ego_chw[1] == 1) & (ego_chw[2] == 1))).astype(np.float32)

        item = {
            "images": images,
            "boxes": boxes,
            "categories": cats,
            "box_valid": valid,
            "road": road,
        }
        if self.extra_info:
            lane_mask = (
                (ego_chw[0] == ego_chw[1]) & (ego_chw[1] == ego_chw[2])
            ) | (ego_chw[0] == 250 / 255)
            lane = (~lane_mask).astype(np.float32)
            item.update(action=actions, ego=np.transpose(ego_chw, (1, 2, 0)), lane=lane)
        return item
