"""Unit tests for ops: stitching, mask task, coords, map converters, rasterizer."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from driving_dirty_tpu.ops import coords, maps, stitch


def test_wide_stitch_matches_reference_permutation():
    # Emulate the reference's NCHW permute+reshape (autoencoder.py:55-57) in numpy.
    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, 6, 3, 8, 10).astype(np.float32)  # [b, 6, C, H, W]
    ref = x_nchw[:, [0, 1, 2, 5, 4, 3]]
    b, v, c, h, w = ref.shape
    ref = np.transpose(ref, (0, 2, 3, 1, 4)).reshape(b, c, h, v * w)  # NCHW pano

    x_nhwc = np.transpose(x_nchw, (0, 1, 3, 4, 2))
    got = np.asarray(stitch.wide_stitch(jnp.asarray(x_nhwc)))  # [b, H, 6W, C]
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref)


def test_unstitch_inverts_wide_stitch():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 8, 306, 3).astype(np.float32))
    pano = stitch.wide_stitch(x)
    back = stitch.unstitch(pano)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_six_to_one_task_masks_one_column():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 6, 8, 306, 3).astype(np.float32) + 0.5)
    key = jax.random.PRNGKey(0)
    xm, y = stitch.six_to_one_task(x, key)
    assert xm.shape == (2, 8, 6 * 306, 3)
    assert y.shape == (2, 8, 306, 3)
    pano = stitch.wide_stitch(x)
    zero_cols = np.where(np.asarray(jnp.all(xm == 0, axis=(0, 1, 3))))[0]
    assert len(zero_cols) == 306
    start = zero_cols[0]
    assert start % 306 == 0
    assert start // 306 < 5  # reference quirk: position 5 never masked
    np.testing.assert_allclose(np.asarray(y), np.asarray(pano[:, :, start : start + 306]))
    # unmasked region untouched
    keep = np.ones(6 * 306, bool)
    keep[start : start + 306] = False
    np.testing.assert_allclose(np.asarray(xm)[:, :, keep], np.asarray(pano)[:, :, keep])


def test_six_to_one_never_masks_position_5():
    x = jnp.ones((1, 6, 4, 306, 3))
    for s in range(40):
        xm, _ = stitch.six_to_one_task(x, jax.random.PRNGKey(s))
        last = np.asarray(xm[:, :, 5 * 306 :])
        assert last.min() > 0  # position 5 never blacked out


def test_corner_aabb_roundtrip_matches_reference_layout():
    # An axis-aligned box in meters: corners fl, fr, bl, br.
    xs = np.array([3.0, 3.0, 1.0, 1.0])
    ys = np.array([2.0, -1.0, 2.0, -1.0])
    box = jnp.asarray(np.stack([xs, ys])[None])  # [1, 2, 4]
    aabb = np.asarray(coords.corners_to_aabb(box))[0]
    # x range 1..3 -> 410..430 px; y 2 -> -20+400=380 (flip), y -1 -> 410
    np.testing.assert_allclose(aabb, [410.0, 380.0, 430.0, 410.0])
    back = np.asarray(coords.aabb_to_corners(jnp.asarray(aabb[None])))[0]
    np.testing.assert_allclose(back[0], [3, 3, 1, 1], atol=1e-6)
    # Reference convention (_new_to_old_coord, bb_fast_rcnn_w_map.py:197-208):
    # fl_y takes pixel y1 which is the *smaller* meter y after the flip.
    np.testing.assert_allclose(back[1], [-1, 2, -1, 2], atol=1e-6)
    # Roundtrip preserves the AABB itself.
    np.testing.assert_allclose(
        np.asarray(coords.corners_to_aabb(jnp.asarray(back[None])))[0], aabb, atol=1e-5
    )


def test_convert_map_to_road_map():
    ego = np.ones((3, 4, 4), np.float32)
    ego[:, 1, 1] = 0.3  # non-white -> road
    out = np.asarray(maps.convert_map_to_road_map(jnp.asarray(ego)))
    assert out[1, 1] and not out[0, 0]


def test_convert_map_to_lane_map():
    ego = np.zeros((3, 2, 2), np.float32)
    ego[:, 0, 0] = [0.1, 0.2, 0.3]  # non-gray -> lane
    ego[:, 0, 1] = 0.5  # gray -> not lane
    ego[0, 1, 0] = 250 / 255  # the 250/255 special case -> not lane
    ego[1, 1, 0] = 0.9
    ego[2, 1, 0] = 0.1
    out = np.asarray(maps.convert_map_to_lane_map(jnp.asarray(ego)))
    assert out[0, 0] and not out[0, 1] and not out[1, 0]


def test_rasterizer_close_to_pil_oracle():
    from driving_dirty_tpu.utils.raster_pil import boxes_to_binary_map_pil

    rng = np.random.RandomState(3)
    boxes = []
    for _ in range(5):
        cx, cy = rng.uniform(-30, 30, 2)
        w, h = rng.uniform(1, 4), rng.uniform(2, 6)
        ang = rng.uniform(0, np.pi)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        local = np.array([[+w, +w, -w, -w], [+h, -h, +h, -h]])  # fl fr bl br
        pts = R @ local + np.array([[cx], [cy]])
        boxes.append(pts)
    boxes = np.stack(boxes).astype(np.float32)

    ref = boxes_to_binary_map_pil(boxes)
    got = np.asarray(maps.boxes_to_binary_map(jnp.asarray(boxes)))
    assert got.shape == (800, 800)
    # Scan-conversion conventions differ only on box edges; interiors agree.
    mismatch = np.mean(ref != got)
    assert mismatch < 0.003, mismatch
    inter = np.sum((ref > 0) & (got > 0))
    union = np.sum((ref > 0) | (got > 0))
    assert inter / union > 0.9


def test_rasterizer_valid_mask():
    box = np.zeros((2, 2, 4), np.float32)
    box[0, 0] = [5, 5, -5, -5]
    box[0, 1] = [5, -5, 5, -5]
    box[1] = box[0] + 20
    full = np.asarray(maps.boxes_to_binary_map(jnp.asarray(box)))
    masked = np.asarray(
        maps.boxes_to_binary_map(jnp.asarray(box), valid=jnp.asarray([True, False]))
    )
    assert full.sum() > masked.sum() > 0


def test_layout_images_as_map_shape_and_content():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 6, 64, 76, 3).astype(np.float32))
    out = maps.layout_images_as_map(x)
    assert out.shape == (2, 800, 800, 3)
    o = np.asarray(out)
    assert o.min() >= 0 and o.max() <= 1.0 + 1e-5
    assert o.std() > 0.01  # content actually placed


def test_rasterizer_degenerate_padding_boxes_contribute_nothing():
    # All-zero rows are how fixed-shape padded batches represent absent boxes;
    # they must not fill the map even without an explicit valid mask.
    box = np.zeros((3, 2, 4), np.float32)
    box[0, 0] = [5, 5, -5, -5]
    box[0, 1] = [5, -5, 5, -5]
    out = np.asarray(maps.boxes_to_binary_map(jnp.asarray(box)))
    assert 0 < out.sum() < 12000  # only the one real 10m x 10m box (~10100 px)


def test_loader_propagates_producer_errors():
    # A dataset raising inside the decode pool must surface the exception to
    # the consumer instead of deadlocking the train loop (regression).
    from driving_dirty_tpu.data.pipeline import Loader

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise FileNotFoundError(f"missing item {i}")

    with pytest.raises(FileNotFoundError):
        for _ in Loader(Bad(), batch_size=2, num_workers=2):
            pass
