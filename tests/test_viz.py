"""Visualization helper tests (the reference's missing plot/log functions)."""
import numpy as np

from driving_dirty_tpu.train.logging import MetricsLogger
from driving_dirty_tpu.utils import viz


def _boxes(n=3):
    rng = np.random.RandomState(0)
    out = []
    for _ in range(n):
        cx, cy = rng.uniform(-20, 20, 2)
        out.append(np.array([[cx + 2, cx + 2, cx - 2, cx - 2],
                             [cy + 1, cy - 1, cy + 1, cy - 1]]))
    return np.stack(out)


def test_plot_all_boxes_new_returns_rgb():
    img = viz.plot_all_boxes_new(_boxes())
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8


def test_plot_image_gray_and_color():
    assert viz.plot_image(np.random.rand(32, 32)).shape[2] == 3
    assert viz.plot_image(np.random.rand(32, 32, 3)).shape[2] == 3


def test_log_fast_rcnn_images(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    arr = viz.log_fast_rcnn_images(
        logger, 0, np.random.rand(64, 64, 3), _boxes(2), [1, 2], _boxes(2), [1, 2],
        np.random.rand(64, 64) > 0.5, "valid",
    )
    assert arr.ndim == 3
    logger.close()


def test_log_bb_images(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    viz.log_bb_images(logger, 0, np.random.rand(32, 64, 3),
                      viz.plot_all_boxes_new(_boxes()), viz.plot_all_boxes_new(_boxes()), "train")
    logger.close()
