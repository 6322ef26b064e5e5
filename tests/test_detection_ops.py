"""Detection primitive tests.

torchvision is not available in this environment, so the oracles are
independent slow implementations written here: a pure-python greedy NMS, a
numpy bilinear RoIAlign, and the framework's own convex-polygon IoU (separate
code path) for box IoU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driving_dirty_tpu.metrics.polygon import box_iou as poly_iou
from driving_dirty_tpu.ops import boxes as B
from driving_dirty_tpu.ops import detection as D


def _rand_boxes(rng, n, size=400.0):
    xy = rng.uniform(10, size - 60, (n, 2))
    wh = rng.uniform(5, 50, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def _xyxy_to_corners(b):
    # [4] xyxy -> [2, 4] corner box (x row, y row)
    x0, y0, x1, y1 = b
    return np.array([[x0, x1, x0, x1], [y0, y0, y1, y1]])


def test_pairwise_iou_matches_polygon_oracle():
    rng = np.random.RandomState(0)
    a, b = _rand_boxes(rng, 8), _rand_boxes(rng, 5)
    got = np.asarray(B.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            ref = poly_iou(_xyxy_to_corners(a[i]), _xyxy_to_corners(b[j]))
            assert np.isclose(got[i, j], ref, atol=1e-5), (i, j)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    anchors = jnp.asarray(_rand_boxes(rng, 20))
    gt = jnp.asarray(_rand_boxes(rng, 20))
    deltas = B.encode(gt, anchors, weights=(10, 10, 5, 5))
    back = B.decode(deltas, anchors, weights=(10, 10, 5, 5))
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_encode_known_values():
    # anchor [0,0,10,10] (cx 5, cy 5, w 10, h 10); gt [5,5,15,15] -> dx=dy=0.5, dw=dh=0
    a = jnp.asarray([[0.0, 0, 10, 10]])
    g = jnp.asarray([[5.0, 5, 15, 15]])
    d = np.asarray(B.encode(g, a))[0]
    np.testing.assert_allclose(d, [0.5, 0.5, 0.0, 0.0], atol=1e-6)


def _nms_oracle(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        for j in order:
            if alive[j] and j != i:
                # IoU
                lt = np.maximum(boxes[i, :2], boxes[j, :2])
                rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[0] * wh[1]
                ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (ai + aj - inter) > thresh:
                    alive[j] = False
    return np.array(keep)


def test_nms_matches_greedy_oracle():
    rng = np.random.RandomState(3)
    boxes = _rand_boxes(rng, 60)
    boxes = np.concatenate([boxes, boxes + rng.uniform(-3, 3, boxes.shape).astype(np.float32)])
    scores = rng.rand(len(boxes)).astype(np.float32)
    ref = _nms_oracle(boxes, scores, 0.5)
    keep_idx, keep_valid = D.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, len(boxes))
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, ref)


def test_nms_respects_max_out_and_invalid_scores():
    boxes = jnp.asarray(_rand_boxes(np.random.RandomState(4), 10))
    scores = jnp.asarray(np.linspace(1, 0.1, 10, dtype=np.float32)).at[5:].set(D.NEG_INF)
    keep_idx, keep_valid = D.nms_fixed(boxes, scores, 0.9, 3)
    assert keep_idx.shape == (3,)
    assert np.asarray(keep_valid).sum() <= 3
    assert all(i < 5 for i in np.asarray(keep_idx)[np.asarray(keep_valid)])


def _roi_align_oracle(feat_hwc, rois, out=7, s=2, aligned=False):
    H, W, C = feat_hwc.shape
    res = np.zeros((len(rois), out, out, C), np.float32)

    def sample(y, x):
        y = np.clip(y, 0, H - 1)
        x = np.clip(x, 0, W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        wy, wx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - wy) * (1 - wx)
            + feat_hwc[y0, x1] * (1 - wy) * wx
            + feat_hwc[y1, x0] * wy * (1 - wx)
            + feat_hwc[y1, x1] * wy * wx
        )

    off = 0.5 if aligned else 0.0
    for r, (x0, y0, x1, y1) in enumerate(rois):
        bw, bh = (x1 - x0) / out, (y1 - y0) / out
        for i in range(out):
            for j in range(out):
                acc = 0
                for ky in range(s):
                    for kx in range(s):
                        y = y0 + (i + (ky + 0.5) / s) * bh - off
                        x = x0 + (j + (kx + 0.5) / s) * bw - off
                        acc = acc + sample(y, x)
                res[r, i, j] = acc / (s * s)
    return res


@pytest.mark.parametrize("aligned", [False, True])
def test_roi_align_matches_oracle(aligned):
    rng = np.random.RandomState(5)
    feat = rng.randn(40, 44, 3).astype(np.float32)
    rois = _rand_boxes(rng, 5, size=38.0)
    ref = _roi_align_oracle(feat, rois, aligned=aligned)
    got = np.asarray(
        D.roi_align(jnp.asarray(feat), jnp.asarray(rois), output_size=7,
                    sampling_ratio=2, aligned=aligned)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_batched_roi_align_shape():
    feat = jnp.zeros((2, 32, 32, 8))
    rois = jnp.tile(jnp.asarray([[2.0, 2, 20, 20]]), (2, 10, 1))
    out = D.batched_roi_align(feat, rois)
    assert out.shape == (2, 10, 7, 7, 8)


def test_grid_anchors_count_and_layout():
    a = D.grid_anchors(4, 5, stride=2)
    assert a.shape == (4 * 5 * 15, 4)
    first = np.asarray(a[:15])
    centers = (first[:, :2] + first[:, 2:]) / 2
    np.testing.assert_allclose(centers, 0, atol=1e-4)
    sizes = np.sqrt((first[:, 2] - first[:, 0]) * (first[:, 3] - first[:, 1]))
    np.testing.assert_allclose(sizes[:3], 32, rtol=1e-5)
    np.testing.assert_allclose(sizes[-3:], 512, rtol=1e-5)


def test_match_anchors_labels():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 11], [50, 50, 52, 52]],
        jnp.float32,
    )
    gt = jnp.zeros((3, 4), jnp.float32)
    gt = gt.at[0].set(jnp.asarray([0, 0, 10, 10]))
    valid = jnp.asarray([True, False, False])
    labels, idx, best = D.match_anchors(anchors, gt, valid)
    l = np.asarray(labels)
    assert l[0] == 1
    assert l[1] == 0
    assert np.asarray(idx)[0] == 0
    labels2, _, _ = D.match_anchors(anchors, jnp.zeros((3, 4)), jnp.zeros(3, bool))
    assert (np.asarray(labels2) == 0).all()


def test_match_anchors_force_match_low_quality():
    anchors = jnp.asarray([[0, 0, 20, 20], [40, 40, 60, 60]], jnp.float32)
    gt = jnp.asarray([[15, 15, 30, 30]], jnp.float32)
    labels, idx, _ = D.match_anchors(anchors, gt, jnp.asarray([True]))
    assert np.asarray(labels)[0] == 1
    assert np.asarray(idx)[0] == 0


def test_match_anchors_blocked_equals_sequential():
    """The blocked (lax.map over anchor blocks) matcher must reproduce the
    per-gt sequential matcher exactly — including argmax tie order, forced
    low-quality matches, and zero-overlap anchors."""
    rng = np.random.RandomState(7)
    anchors = jnp.asarray(_rand_boxes(rng, 500))
    gt = jnp.asarray(_rand_boxes(rng, 12))
    valid = jnp.asarray(rng.rand(12) > 0.3)

    def sequential(anchors, gt_boxes, gt_valid, high=0.7, low=0.3):
        iou = np.asarray(B.pairwise_iou(anchors, gt_boxes))
        iou = np.where(np.asarray(gt_valid)[None, :], iou, 0.0)
        best = iou.max(1)
        bidx = iou.argmax(1)
        labels = np.where(best >= high, 1, np.where(best < low, 0, -1))
        gbest = iou.max(0)
        is_best = (iou >= gbest[None, :] - 1e-7) & (gbest[None, :] > 0) & np.asarray(gt_valid)[None, :]
        forced = is_best.any(1)
        forced_gt = is_best.argmax(1)
        labels = np.where(forced, 1, labels)
        bidx = np.where(forced & (best <= 0), forced_gt, bidx)
        return labels, bidx, best

    for block in (64, 100, 500, 4096):  # padded / exact / single-block cases
        labels, idx, best = D.match_anchors(anchors, gt, valid, block_size=block)
        el, ei, eb = sequential(anchors, gt, valid)
        np.testing.assert_array_equal(np.asarray(labels), el)
        np.testing.assert_array_equal(np.asarray(idx), ei)
        np.testing.assert_allclose(np.asarray(best), eb, atol=1e-6)


def test_match_labels_grid_and_subset_equal_match_anchors():
    """The grid-factored label path (division-free cross-multiplied
    thresholds, separable per-gt max) + sampled-subset re-match must
    reproduce match_anchors on the same grid: labels over all anchors,
    best_idx over any subset, incl. forced low-quality matches."""
    rng = np.random.RandomState(11)
    feat_h, feat_w, stride = 12, 10, 8
    cells = D.base_anchors(sizes=(16, 32, 64), ratios=(0.5, 1.0, 2.0))
    anchors = jnp.asarray(D.grid_anchors(feat_h, feat_w, stride, cells))
    gt = jnp.asarray(_rand_boxes(rng, 9, size=80.0))
    valid = jnp.asarray(rng.rand(9) > 0.3)

    ref_labels, ref_idx, ref_best = D.match_anchors(anchors, gt, valid, block_size=256)
    labels, gt_best = D.match_labels_grid(cells, feat_h, feat_w, stride, gt, valid,
                                          row_block=5)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))

    # gt_best must equal the per-gt max of the full IoU matrix
    iou = np.asarray(B.pairwise_iou(anchors, gt))
    iou = np.where(np.asarray(valid)[None, :], iou, 0.0)
    np.testing.assert_allclose(np.asarray(gt_best), iou.max(0), atol=1e-6)

    sub = jnp.asarray(rng.choice(anchors.shape[0], 64, replace=False))
    got = D.match_subset(anchors[sub], gt, valid, jnp.asarray(iou.max(0)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_idx)[np.asarray(sub)])

    # no valid gt -> all labels 0
    l0, _ = D.match_labels_grid(cells, feat_h, feat_w, stride, gt, jnp.zeros(9, bool))
    assert (np.asarray(l0) == 0).all()

    # forced low-quality tie: a gt overlapping nothing above threshold still
    # forces its best anchor(s) positive through the grid path
    gt1 = jnp.asarray([[3.0, 3.0, 11.0, 11.0]])
    l1, gb1 = D.match_labels_grid(cells, feat_h, feat_w, stride, gt1, jnp.asarray([True]))
    rl1, _, _ = D.match_anchors(anchors, gt1, jnp.asarray([True]))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(rl1))
    assert (np.asarray(l1) == 1).sum() >= 1


def test_blocked_top_k_exact():
    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.rand(10000).astype(np.float32))
    for block in (128, 1000, 4096, 100000):
        v, i = D.blocked_top_k(vals, 50, block_size=block)
        ev, ei = jax.lax.top_k(vals, 50)
        np.testing.assert_allclose(np.asarray(v), np.asarray(ev))
        # values at returned indices must be the values themselves
        np.testing.assert_allclose(np.asarray(vals)[np.asarray(i)], np.asarray(v))


def test_sample_balanced_counts():
    key = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 50)
    idx, is_pos, take = D.sample_balanced(key, labels, 32, 0.5)
    l = np.asarray(labels)
    sel = np.asarray(idx)[np.asarray(take)]
    pos_sel = np.asarray(idx)[np.asarray(is_pos)]
    assert np.asarray(take).sum() == 32
    assert (l[pos_sel] == 1).all()
    assert len(pos_sel) == 10
    assert (l[sel] != -1).all()


def test_sample_balanced_no_positives():
    key = jax.random.PRNGKey(1)
    labels = jnp.asarray([0] * 64)
    idx, is_pos, take = D.sample_balanced(key, labels, 16, 0.25)
    assert np.asarray(is_pos).sum() == 0
    assert np.asarray(take).sum() == 16


def test_sample_balanced_exact_size_and_scarce():
    # Contract (matches torchvision BalancedPositiveNegativeSampler):
    # output is EXACTLY num_samples slots; sum(take) = n_pos + n_neg with
    # n_pos = min(#pos, num*pf), n_neg = min(#neg, num - n_pos).
    key = jax.random.PRNGKey(2)
    labels = jnp.asarray([1] * 3 + [0] * 100)
    idx, is_pos, take = D.sample_balanced(key, labels, 16, 0.5)
    assert idx.shape == (16,) and is_pos.shape == (16,) and take.shape == (16,)
    assert np.asarray(is_pos).sum() == 3          # all scarce positives taken
    assert np.asarray(take).sum() == 16           # negatives fill the rest

    # scarce negatives too: total taken < num_samples, rest masked filler
    labels2 = jnp.asarray([1] * 3 + [0] * 2 + [-1] * 50)
    idx2, is_pos2, take2 = D.sample_balanced(key, labels2, 16, 0.5)
    assert idx2.shape == (16,)
    assert np.asarray(is_pos2).sum() == 3
    assert np.asarray(take2).sum() == 5
    l2 = np.asarray(labels2)
    assert (l2[np.asarray(idx2)[np.asarray(take2)]] != -1).all()


def test_smooth_l1():
    x = jnp.asarray([0.0, 0.05, 0.5, -2.0])
    got = np.asarray(B.smooth_l1(x, beta=1.0 / 9.0))
    beta = 1.0 / 9.0
    ref = [0.0, 0.5 * 0.05**2 / beta, 0.5 - 0.5 * beta, 2.0 - 0.5 * beta]
    np.testing.assert_allclose(got, ref, rtol=1e-5)
