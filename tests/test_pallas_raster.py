"""Pallas rasterizer parity (runs in interpreter mode on CPU; the compiled
kernel is exercised on TPU by the spatial-model training path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_raster_interpret_matches_jnp():
    from jax.experimental.pallas import tpu as pltpu

    from driving_dirty_tpu.ops.maps import boxes_to_binary_map
    from driving_dirty_tpu.pallas import raster

    rng = np.random.RandomState(0)
    boxes = np.zeros((8, 2, 4), np.float32)
    valid = np.zeros(8, bool)
    for i in range(5):
        cx, cy = rng.uniform(-30, 30, 2)
        w, h = rng.uniform(1, 4), rng.uniform(2, 6)
        a = rng.uniform(0, np.pi)
        R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        boxes[i] = R @ np.array([[w, w, -w, -w], [h, -h, h, -h]]) + np.array([[cx], [cy]])
        valid[i] = True
    bj, vj = jnp.asarray(boxes), jnp.asarray(valid)
    ref = np.asarray(boxes_to_binary_map(bj, vj))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(raster.boxes_to_binary_map_pallas(bj, vj))
    np.testing.assert_array_equal(got, ref)
