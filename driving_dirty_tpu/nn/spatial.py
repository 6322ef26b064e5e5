"""Spatial BEV components for the bounding-box models.

TPU-native re-design of
/root/reference/src/bounding_box_model/spatial_bb/components.py: the
hand-crafted camera->BEV projection (per-view anisotropic convs + rotations
into a 3x2 grid) and the two merge/upsample heads. NHWC throughout; the six
per-view convs run as six small convs whose results concatenate into the BEV
grid — XLA fuses the relu+concat chain; the rotations/flips are layout changes
folded into the conv input indexing.

Shapes (camera views 256x306):
  SpatialMappingCNN:      [b, 6, 256, 306, 3] -> [b, 256, 256, 32]
  BoxesMergingCNN:        ssr [b, 128, 918, 32] + spatial -> [b, 800, 800, 1]
  RoadMapBoxesMergingCNN: + roadmap [b, 800, 800, 1]      -> [b, 800, 800, 1]
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core import layers as L


def _split(key, n):
    return jax.random.split(key, n)


@dataclasses.dataclass(frozen=True)
class SpatialMappingCNN:
    """Per-view conv + orient + tile into the BEV grid

        BL FL
        B  F
        BR FR

    (/root/reference/src/bounding_box_model/spatial_bb/components.py:6-77).
    View index order on input is the dataset order FL,F,FR,BL,B,BR.
    """

    def _convs(self):
        side = dict(kernel_size=(1, 50), stride=(3, 2), padding=0)
        axial = dict(kernel_size=(52, 1), stride=(3, 2), padding=1)
        return {
            "fl_conv": L.Conv2d(3, 32, **side),
            "fr_conv": L.Conv2d(3, 32, **side),
            "bl_conv": L.Conv2d(3, 32, **side),
            "br_conv": L.Conv2d(3, 32, **side),
            "f_conv": L.Conv2d(3, 32, **axial),
            "b_conv": L.Conv2d(3, 32, **axial),
            "out_conv": L.Conv2d(32, 32, 3, 1, 0),
        }

    def init(self, key):
        convs = self._convs()
        keys = _split(key, len(convs))
        return {name: conv.init(k) for (name, conv), k in zip(convs.items(), keys)}, {}

    def apply(self, params, state, x, *, train: bool = False, rng=None):
        convs = self._convs()
        relu = jax.nn.relu

        fl = relu(convs["fl_conv"].apply(params["fl_conv"], x[:, 0]))
        bl = relu(convs["bl_conv"].apply(params["bl_conv"], x[:, 3]))
        # rot90(v, 1, [2,3]) / [3,2] on NCHW == (H,W)-plane rotations: NHWC axes (1,2)
        b_ = relu(convs["b_conv"].apply(params["b_conv"], jnp.rot90(x[:, 4], k=1, axes=(1, 2))))
        f_ = relu(convs["f_conv"].apply(params["f_conv"], jnp.rot90(x[:, 1], k=1, axes=(2, 1))))
        br = relu(convs["br_conv"].apply(params["br_conv"], jnp.flip(x[:, 5], axis=(1, 2))))
        fr = relu(convs["fr_conv"].apply(params["fr_conv"], jnp.flip(x[:, 2], axis=(1, 2))))

        top = jnp.concatenate([bl, fl], axis=2)
        mid = jnp.concatenate([b_, f_], axis=2)
        bottom = jnp.concatenate([br, fr], axis=2)
        grid = jnp.concatenate([top, mid, bottom], axis=1)  # [b, 258, 258, 32]
        out = relu(convs["out_conv"].apply(params["out_conv"], grid))  # [b, 256, 256, 32]
        return out, state


@dataclasses.dataclass(frozen=True)
class BoxesMergingCNN:
    """Resample SSL conv features to the BEV grid, concat, upsample to 800x800
    sigmoid (/root/reference/src/bounding_box_model/spatial_bb/components.py:80-119)."""

    def _layers(self):
        return {
            "ss_conv": L.Conv2d(32, 32, (1, 24), (1, 7), 0),
            "ss_deconv": L.ConvTranspose2d(32, 32, 2, 2, 0),
            "up_conv_1": L.ConvTranspose2d(64, 32, 8, 1, 0, 0, 8),
            "up_conv_2": L.ConvTranspose2d(32, 16, 8, 1, 0, 0, 8),
            "up_conv_3": L.ConvTranspose2d(16, 8, 6, 1, 0, 2, 6),
            "up_conv_4": L.ConvTranspose2d(8, 1, 2, 2, 0),
        }

    def init(self, key):
        ls = self._layers()
        keys = _split(key, len(ls))
        return {n: l.init(k) for (n, l), k in zip(ls.items(), keys)}, {}

    def apply(self, params, state, ssr, spatial_map, *, train: bool = False, rng=None):
        ls = self._layers()
        relu = jax.nn.relu
        x = relu(ls["ss_conv"].apply(params["ss_conv"], ssr))
        x = relu(ls["ss_deconv"].apply(params["ss_deconv"], x))
        x = jnp.concatenate([x, spatial_map], axis=-1)
        x = relu(ls["up_conv_1"].apply(params["up_conv_1"], x))
        x = relu(ls["up_conv_2"].apply(params["up_conv_2"], x))
        x = relu(ls["up_conv_3"].apply(params["up_conv_3"], x))
        x = jax.nn.sigmoid(ls["up_conv_4"].apply(params["up_conv_4"], x))
        return x, state


@dataclasses.dataclass(frozen=True)
class RoadMapBoxesMergingCNN:
    """As BoxesMergingCNN plus a road-map branch; 96-channel merge, five
    upsample stages (/root/reference/src/bounding_box_model/spatial_bb/components.py:122-170)."""

    def _layers(self):
        return {
            "ss_conv": L.Conv2d(32, 32, (1, 24), (1, 7), 0),
            "ss_deconv": L.ConvTranspose2d(32, 32, 2, 2, 0),
            "rm_conv_1": L.Conv2d(1, 32, 7, 3, 1, 3),
            "rm_conv_2": L.Conv2d(32, 32, 3, 1, 0, 3),
            "up_conv_1": L.ConvTranspose2d(96, 64, 7, 1, 0, 0, 7),
            "up_conv_2": L.ConvTranspose2d(64, 32, 7, 1, 0, 0, 7),
            "up_conv_3": L.ConvTranspose2d(32, 16, 7, 1, 0, 0, 7),
            "up_conv_4": L.ConvTranspose2d(16, 8, 7, 1, 0, 0, 3),
            "up_conv_5": L.ConvTranspose2d(8, 1, 2, 2, 0),
        }

    def init(self, key):
        ls = self._layers()
        keys = _split(key, len(ls))
        return {n: l.init(k) for (n, l), k in zip(ls.items(), keys)}, {}

    def apply(self, params, state, ssr, spatial_map, rm, *, train: bool = False, rng=None):
        ls = self._layers()
        relu = jax.nn.relu
        x = relu(ls["ss_conv"].apply(params["ss_conv"], ssr))
        x = relu(ls["ss_deconv"].apply(params["ss_deconv"], x))
        r = relu(ls["rm_conv_1"].apply(params["rm_conv_1"], rm))
        r = relu(ls["rm_conv_2"].apply(params["rm_conv_2"], r))
        x = jnp.concatenate([x, spatial_map, r], axis=-1)
        for i in (1, 2, 3, 4):
            x = relu(ls[f"up_conv_{i}"].apply(params[f"up_conv_{i}"], x))
        x = jax.nn.sigmoid(ls["up_conv_5"].apply(params["up_conv_5"], x))
        return x, state
