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


# Resolution presets for the spatial pipeline. "reference" is the exact
# architecture of /root/reference/src/bounding_box_model/spatial_bb/
# components.py (256x306 camera views -> 256x256 BEV grid -> 800x800 raster)
# — the parity contract. "small" is the same NETWORK (identical layer names,
# channel counts, orientation/tiling topology, and therefore identical
# parameter-pytree structure and tensor-parallel sharding behavior) with
# kernel geometry re-solved for 64x78 views -> 64x64 grid -> 148/152-px
# rasters: ~25x less conv work, used by multi-chip dry runs and fast tests
# where the partitioning, not the resolution, is under test. Each entry is
# checked by tests/test_spatial_geometry.py against the concat constraints.
GEOMETRIES = {
    "reference": dict(
        view_hw=(256, 306),
        grid_hw=(256, 256),
        side=dict(kernel_size=(1, 50), stride=(3, 2), padding=0),
        axial=dict(kernel_size=(52, 1), stride=(3, 2), padding=1),
        ss=dict(kernel_size=(1, 24), stride=(1, 7), padding=0),
        # ConvTranspose stages as (in, out, k, s, p, out_pad, dilation)
        boxes_up=[(64, 32, 8, 1, 0, 0, 8), (32, 16, 8, 1, 0, 0, 8),
                  (16, 8, 6, 1, 0, 2, 6), (8, 1, 2, 2, 0, 0, 1)],
        boxes_raster=800,
        rm_conv_1=dict(kernel_size=7, stride=3, padding=1, dilation=3),
        rm_up=[(96, 64, 7, 1, 0, 0, 7), (64, 32, 7, 1, 0, 0, 7),
               (32, 16, 7, 1, 0, 0, 7), (16, 8, 7, 1, 0, 0, 3),
               (8, 1, 2, 2, 0, 0, 1)],
        rm_raster=800,
    ),
    "small": dict(
        view_hw=(64, 78),
        grid_hw=(64, 64),
        side=dict(kernel_size=(1, 14), stride=(3, 2), padding=0),
        axial=dict(kernel_size=(13, 1), stride=(3, 2), padding=(0, 1)),
        ss=dict(kernel_size=(1, 17), stride=(1, 7), padding=0),
        boxes_up=[(64, 32, 3, 1, 0, 0, 2), (32, 16, 3, 1, 0, 0, 2),
                  (16, 8, 3, 1, 0, 0, 1), (8, 1, 2, 2, 0, 0, 1)],
        boxes_raster=148,
        rm_conv_1=dict(kernel_size=8, stride=2, padding=1, dilation=2),
        rm_up=[(96, 64, 3, 1, 0, 0, 2), (64, 32, 3, 1, 0, 0, 2),
               (32, 16, 3, 1, 0, 0, 1), (16, 8, 3, 1, 0, 0, 1),
               (8, 1, 2, 2, 0, 0, 1)],
        rm_raster=152,
    ),
}


@dataclasses.dataclass(frozen=True)
class SpatialMappingCNN:
    """Per-view conv + orient + tile into the BEV grid

        BL FL
        B  F
        BR FR

    (/root/reference/src/bounding_box_model/spatial_bb/components.py:6-77).
    View index order on input is the dataset order FL,F,FR,BL,B,BR.
    """

    geometry: str = "reference"

    def _convs(self):
        g = GEOMETRIES[self.geometry]
        side = g["side"]
        axial = g["axial"]
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

    geometry: str = "reference"

    @property
    def raster_size(self) -> int:
        return GEOMETRIES[self.geometry]["boxes_raster"]

    def _layers(self):
        g = GEOMETRIES[self.geometry]
        layers = {
            "ss_conv": L.Conv2d(32, 32, **g["ss"]),
            "ss_deconv": L.ConvTranspose2d(32, 32, 2, 2, 0),
        }
        for i, (cin, cout, k, s, p, op, d) in enumerate(g["boxes_up"], start=1):
            layers[f"up_conv_{i}"] = L.ConvTranspose2d(cin, cout, k, s, p, op, d)
        return layers

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
        n_up = sum(1 for n in ls if n.startswith("up_conv_"))
        for i in range(1, n_up):
            x = relu(ls[f"up_conv_{i}"].apply(params[f"up_conv_{i}"], x))
        x = jax.nn.sigmoid(ls[f"up_conv_{n_up}"].apply(params[f"up_conv_{n_up}"], x))
        return x, state


@dataclasses.dataclass(frozen=True)
class RoadMapBoxesMergingCNN:
    """As BoxesMergingCNN plus a road-map branch; 96-channel merge, five
    upsample stages (/root/reference/src/bounding_box_model/spatial_bb/components.py:122-170)."""

    geometry: str = "reference"

    @property
    def raster_size(self) -> int:
        return GEOMETRIES[self.geometry]["rm_raster"]

    def _layers(self):
        g = GEOMETRIES[self.geometry]
        layers = {
            "ss_conv": L.Conv2d(32, 32, **g["ss"]),
            "ss_deconv": L.ConvTranspose2d(32, 32, 2, 2, 0),
            "rm_conv_1": L.Conv2d(1, 32, **g["rm_conv_1"]),
            "rm_conv_2": L.Conv2d(32, 32, 3, 1, 0, 3),
        }
        for i, (cin, cout, k, s, p, op, d) in enumerate(g["rm_up"], start=1):
            layers[f"up_conv_{i}"] = L.ConvTranspose2d(cin, cout, k, s, p, op, d)
        return layers

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
        n_up = sum(1 for n in ls if n.startswith("up_conv_"))
        for i in range(1, n_up):
            x = relu(ls[f"up_conv_{i}"].apply(params[f"up_conv_{i}"], x))
        x = jax.nn.sigmoid(ls[f"up_conv_{n_up}"].apply(params[f"up_conv_{n_up}"], x))
        return x, state
