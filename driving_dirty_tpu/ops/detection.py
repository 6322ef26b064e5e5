"""Fixed-shape detection primitives: anchors, matching, sampling, NMS, RoIAlign.

These replace the native C++/CUDA torchvision ops behind the reference's
Faster-RCNN models (SURVEY.md §2.9: NMS, MultiScaleRoIAlign, anchor machinery
at /root/reference/src/bounding_box_model/fast_rcnn/bb_fast_rcnn.py:61-72)
with TPU-idiomatic equivalents: every op is fixed-shape (padded + masked),
data-dependent control flow is lax.scan/fori_loop, gathers are batched
advanced indexing that XLA lowers to dynamic-gather HLOs.

Conventions: boxes are pixel-space xyxy; "validity" is a bool mask aligned
with the padded leading axis; scores of invalid entries are -inf.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from driving_dirty_tpu.ops.boxes import pairwise_iou

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------
def base_anchors(sizes=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0)):
    """[A, 4] zero-centered xyxy anchors, A = len(sizes) * len(ratios).

    Same parameterization as torchvision's AnchorGenerator (h = s*sqrt(r),
    w = s/sqrt(r)), the config used at bb_fast_rcnn.py:61-62. Computed in
    numpy so results are concrete constants even when called under a trace
    (they are cached across jit calls by FasterRCNNHead)."""
    import numpy as np

    out = []
    for s in sizes:
        for r in ratios:
            h = s * (r ** 0.5)
            w = s / (r ** 0.5)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int, cell_anchors=None):
    """[feat_h * feat_w * A, 4] anchors for one feature level (concrete numpy)."""
    import numpy as np

    if cell_anchors is None:
        cell_anchors = base_anchors()
    cell_anchors = np.asarray(cell_anchors, np.float32)
    ys = (np.arange(feat_h, dtype=np.float32) * stride)[:, None]
    xs = (np.arange(feat_w, dtype=np.float32) * stride)[None, :]
    zz = np.zeros((feat_h, feat_w), np.float32)
    shifts = np.stack([xs + zz, ys + zz, xs + zz, ys + zz], axis=-1)  # [H, W, 4]
    anchors = shifts[:, :, None, :] + cell_anchors[None, None, :, :]
    return anchors.reshape(-1, 4)


# ---------------------------------------------------------------------------
# Anchor <-> GT matching
# ---------------------------------------------------------------------------
def match_anchors(
    anchors,
    gt_boxes,
    gt_valid,
    high_thresh: float = 0.7,
    low_thresh: float = 0.3,
    force_match_gt: bool = True,
    block_size: int = 32768,
):
    """Assign each anchor a label {-1 ignore, 0 negative, 1 positive} and a
    matched GT index.

    Memory-lean for huge anchor sets: never materializes the full
    [N_anchors, N_gt] IoU matrix (~1 GB at 2.4M anchors x 100 gts). Anchors
    are processed in `block_size` blocks (lax.map); each block computes its
    [block, G] IoU against ALL gts at once and reduces it in-fusion to
    per-anchor best/argmax plus a per-block per-gt max. This replaced a
    per-gt lax.scan carrying 2.4M-wide state: 200 sequential sweeps over the
    full anchor set were HBM-bound at ~436 ms per 16-image train step; the
    blocked form measures ~14x faster for identical outputs
    (scripts/probe_det_train.py).
    Semantics follow torchvision's Matcher with allow_low_quality_matches:
    anchors with IoU >= high are positive, < low negative, else ignored; each
    valid GT's best-overlapping anchor (including its argmax ties) is forced
    positive. Ties on the per-anchor argmax pick the lowest gt index, as the
    sequential matcher did.
    """
    n = anchors.shape[0]
    blk = min(block_size, n)
    nb = -(-n // blk)
    pad = nb * blk - n
    apad = jnp.concatenate([anchors, jnp.zeros((pad, 4), anchors.dtype)]) if pad else anchors
    ablocks = apad.reshape(nb, blk, 4)

    def pass1(blk_anchors):
        iou = jnp.where(gt_valid[None, :], pairwise_iou(blk_anchors, gt_boxes), 0.0)
        best = jnp.max(iou, axis=1)
        bidx = jnp.argmax(iou, axis=1).astype(jnp.int32)  # first max on ties
        return best, bidx, jnp.max(iou, axis=0)

    best, bidx, gt_best_blocks = lax.map(pass1, ablocks)
    best_iou = best.reshape(-1)[:n]
    best_idx = bidx.reshape(-1)[:n]
    gt_best_iou = jnp.max(gt_best_blocks, axis=0)  # [G] best IoU over ALL anchors

    labels = jnp.where(best_iou >= high_thresh, 1, jnp.where(best_iou < low_thresh, 0, -1))
    if force_match_gt:
        def pass2(blk_anchors):
            iou = jnp.where(gt_valid[None, :], pairwise_iou(blk_anchors, gt_boxes), 0.0)
            is_best = (
                (iou >= gt_best_iou[None, :] - 1e-7)
                & (gt_best_iou[None, :] > 0)
                & gt_valid[None, :]
            )
            # argmax over bools -> first gt whose tie set contains this anchor
            return jnp.any(is_best, axis=1), jnp.argmax(is_best, axis=1).astype(jnp.int32)

        forced, forced_gt = lax.map(pass2, ablocks)
        forced = forced.reshape(-1)[:n]
        forced_gt = forced_gt.reshape(-1)[:n]
        labels = jnp.where(forced, 1, labels)
        best_idx = jnp.where(forced & (best_iou <= 0), forced_gt, best_idx)
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, 0, labels)
    return labels, best_idx, best_iou


def match_labels_grid(
    cell_anchors,
    feat_h: int,
    feat_w: int,
    stride: int,
    gt_boxes,
    gt_valid,
    high_thresh: float = 0.7,
    low_thresh: float = 0.3,
    row_block: int = 16,
):
    """Labels-only anchor matching for a REGULAR anchor grid:
    -> (labels [feat_h*feat_w*A], gt_best_iou [G]).

    Exploits the grid structure that `match_anchors` (generic boxes) cannot:
    anchors factor into per-axis intervals, so

      * the per-axis overlaps are small tables ox [W, A, G], oy [H, A, G]
        (the only O(N*G) quantity, inter = oy*ox, is never summed — it only
        feeds max/threshold reductions);
      * the per-gt best intersection is SEPARABLE: for a fixed anchor type,
        IoU = inter / (sa + sg - inter) is monotone in inter, so
        max_cells inter = (max_y oy) * (max_x ox) — gt_best_iou costs
        O(H*A*G), with divisions only on the tiny [A, G] table;
      * every per-anchor test is a DIVISION-FREE cross-multiplication:
        iou >= t  <=>  inter * (1 + t) >= t * (sa + sg), with the RHS
        precomputed per (A, G).

    One cheap full pass (1 mul + 3 fused compare-reduces per pair) replaces
    the two division-heavy IoU passes of the generic matcher: 221 ms ->
    ~23 ms per 16-image RPN step at 2.4M anchors (scripts/probe_det_train.py).

    Label semantics match `match_anchors` / torchvision's Matcher with
    allow_low_quality_matches, with two documented micro-divergences:
    anchor areas are computed per TYPE (exact cell-anchor extents) rather
    than from the shifted per-cell f32 coordinates, and threshold tests are
    cross-multiplied rather than divided — either can flip an anchor whose
    IoU sits within ~1 ulp (~1e-5 relative) of a threshold or tie boundary.
    Matched-gt indices for a sampled subset come from `match_subset`.
    """
    ca = jnp.asarray(cell_anchors, jnp.float32)  # [A, 4]
    a_n = ca.shape[0]
    xs = jnp.arange(feat_w, dtype=jnp.float32) * stride
    ys = jnp.arange(feat_h, dtype=jnp.float32) * stride
    gx0, gy0, gx1, gy1 = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2], gt_boxes[:, 3]
    # per-axis interval overlaps of every (cell-position, anchor-type, gt)
    ax0 = xs[:, None] + ca[None, :, 0]
    ax1 = xs[:, None] + ca[None, :, 2]
    ay0 = ys[:, None] + ca[None, :, 1]
    ay1 = ys[:, None] + ca[None, :, 3]
    ox = jnp.clip(jnp.minimum(ax1[:, :, None], gx1) - jnp.maximum(ax0[:, :, None], gx0), 0)  # [W, A, G]
    oy = jnp.clip(jnp.minimum(ay1[:, :, None], gy1) - jnp.maximum(ay0[:, :, None], gy0), 0)  # [H, A, G]

    sa = jnp.clip(ca[:, 2] - ca[:, 0], 0) * jnp.clip(ca[:, 3] - ca[:, 1], 0)  # [A]
    sg = jnp.clip(gx1 - gx0, 0) * jnp.clip(gy1 - gy0, 0)                      # [G]
    s_ag = sa[:, None] + sg[None, :]                                          # [A, G]

    # per-gt best IoU via the separable max (divisions only on [A, G])
    mi = jnp.max(oy, axis=0) * jnp.max(ox, axis=0)                            # [A, G]
    union = s_ag - mi
    iou_best = jnp.where(union > 0, mi / union, 0.0)
    iou_best = jnp.where(gt_valid[None, :], iou_best, 0.0)
    gt_best_iou = jnp.max(iou_best, axis=0)                                   # [G]

    # Cross-multiplied threshold tables, normalized so the big tensor is
    # compared DIRECTLY against a per-(A, G) constant:
    #   iou >= t  <=>  inter * (1 + t) >= t * s_ag  <=>  inter >= t*s_ag/(1+t)
    # (1 + t > 0 always; divisions happen on the tiny [A, G] tables only).
    # The hi and forced tests both produce label 1, so they collapse into
    # one reduction against the elementwise-min threshold: the virtual
    # [rb, W, A, G] inter feeds 1 multiply + 2 compare-reduces instead of
    # 4 multiplies + 3 compare-reduces (~2x less VPU work on the only
    # O(N*G) object; +inf disables invalid/degenerate gts).
    ok = gt_valid[None, :] & (s_ag > 0)
    inf = jnp.asarray(jnp.inf, jnp.float32)
    q_hi = jnp.where(ok, high_thresh / (1.0 + high_thresh) * s_ag, inf)
    q_lo = jnp.where(ok, low_thresh / (1.0 + low_thresh) * s_ag, inf)
    t = gt_best_iou - 1e-7
    q_f = jnp.where(
        ok & (gt_best_iou > 0)[None, :], (t / (1.0 + t))[None, :] * s_ag, inf
    )
    q_pos = jnp.minimum(q_hi, q_f)                                            # [A, G]

    nb = -(-feat_h // row_block)
    pad = nb * row_block - feat_h
    oy_p = jnp.concatenate([oy, jnp.zeros((pad,) + oy.shape[1:], oy.dtype)]) if pad else oy
    oy_blocks = oy_p.reshape(nb, row_block, a_n, -1)

    def rows(oy_blk):
        # inter [rb, W, A, G]: virtual — feeds two same-axis reductions
        inter = oy_blk[:, None, :, :] * ox[None, :, :, :]
        pos = jnp.any(inter >= q_pos, axis=-1)
        nn = jnp.any(inter >= q_lo, axis=-1)
        return jnp.where(pos, 1, jnp.where(nn, -1, 0))

    labels = lax.map(rows, oy_blocks).reshape(-1)[: feat_h * feat_w * a_n]
    labels = jnp.where(~jnp.any(gt_valid), 0, labels)
    return labels, gt_best_iou


def match_subset(sub_anchors, gt_boxes, gt_valid, gt_best_iou):
    """Matched-gt index for a small anchor subset ([S, 4], S ~ 256).

    Reproduces `match_anchors`' best_idx exactly (first-max argmax ties;
    forced_gt override for forced anchors with zero best IoU) at [S, G]
    cost instead of [N, G]. `gt_best_iou` comes from `match_labels_grid`
    (or `match_anchors`' third output's per-gt max)."""
    iou = jnp.where(gt_valid[None, :], pairwise_iou(sub_anchors, gt_boxes), 0.0)
    best = jnp.max(iou, axis=1)
    idx = jnp.argmax(iou, axis=1).astype(jnp.int32)
    is_best = (iou >= gt_best_iou[None, :] - 1e-7) & (gt_best_iou[None, :] > 0) & gt_valid[None, :]
    forced = jnp.any(is_best, axis=1)
    forced_gt = jnp.argmax(is_best, axis=1).astype(jnp.int32)
    return jnp.where(forced & (best <= 0), forced_gt, idx)


def blocked_top_k(vals, k: int, block_size: int = 65536):
    """Exact top-k over a long 1-D array as two short top-ks.

    lax.top_k over the flat 2.4M-anchor axis is a full sort on TPU (~60 ms
    per 16-image step inside sample_balanced); splitting into per-block
    top-ks and a final top-k over the nb*k survivors is exact (every global
    top-k element is in its own block's top-k) and an order of magnitude
    cheaper. Tie ORDER between equal values can differ from the flat top_k's
    (survivors are concatenated block-major); values and counts are
    identical, which is all the samplers depend on.
    """
    n = vals.shape[0]
    if n <= block_size or n <= k:
        return lax.top_k(vals, k)
    blk = max(block_size, k)
    nb = -(-n // blk)
    pad = nb * blk - n
    v = jnp.concatenate([vals, jnp.full((pad,), NEG_INF, vals.dtype)]) if pad else vals
    bv, bi = lax.top_k(v.reshape(nb, blk), k)           # [nb, k] each
    cand_i = (bi + (jnp.arange(nb) * blk)[:, None]).reshape(-1)
    fv, fi = lax.top_k(bv.reshape(-1), k)
    return fv, cand_i[fi]


def sample_balanced(key, labels, num_samples: int, positive_fraction: float,
                    approx: bool = False):
    """Sample a fixed-size minibatch of anchor/proposal indices.

    -> (idx [num_samples], is_pos [num_samples], take [num_samples]): exactly
    `num_samples` slots, of which sum(take) = n_pos + n_neg are real samples
    (the rest are masked filler). Counts match torchvision's
    BalancedPositiveNegativeSampler exactly:
        n_pos = min(#positives, num_samples * positive_fraction)
        n_neg = min(#negatives, num_samples - n_pos)
    so callers' `sum(take)` normalizer equals torchvision's
    `sampled_inds.numel()`. Random priority via uniform noise + top-k
    (the fixed-shape replacement for torch.randperm subsampling); one
    uniform draw serves both classes — their supports are disjoint.

    `approx=True` selects `lax.approx_max_k` for the priority top-ks on
    large inputs (the 2.4M-anchor RPN path) — the TPU-native partial
    reduction, ~2x the exact blocked top-k. Because priorities are iid
    uniform the result is still a uniform random sample; the one semantic
    wrinkle is ~5% per-element recall, so when positives are scarce n_pos
    can fall slightly below min(#pos, num*pf) (negatives fill the gap —
    the total count is unaffected). Same trade-off and escape hatch as
    proposal selection: DetectionConfig.exact_topk=True restores exact.
    """
    n = labels.shape[0]
    # a candidate pool smaller than the requested sample (tiny test configs;
    # impossible on the 2.4M-anchor / 1000+G-proposal production paths) just
    # clamps the top-k widths — the output keeps its fixed [num_samples] shape
    n_pos_want = min(int(num_samples * positive_fraction), n)
    n_neg_want = min(num_samples, n)
    pos_mask = labels == 1
    neg_mask = labels == 0

    u = jax.random.uniform(key, (n,))
    top_k = lax.approx_max_k if (approx and n > 65536) else blocked_top_k
    pos_val, pos_idx = top_k(jnp.where(pos_mask, u, NEG_INF), n_pos_want)
    pos_take = pos_val > NEG_INF / 2
    n_pos = jnp.sum(pos_take)
    neg_val, neg_idx = top_k(jnp.where(neg_mask, u, NEG_INF), n_neg_want)  # over-sample negatives
    # negatives fill whatever the positives left open
    neg_needed = num_samples - n_pos
    neg_rank = jnp.arange(n_neg_want)
    neg_take = (neg_val > NEG_INF / 2) & (neg_rank < neg_needed)
    # Pack taken entries (<= num_samples by construction) into exactly
    # num_samples slots, positives first.
    cand_idx = jnp.concatenate([pos_idx, neg_idx])
    cand_pos = jnp.concatenate(
        [jnp.ones(n_pos_want, bool), jnp.zeros(n_neg_want, bool)]
    )
    cand_take = jnp.concatenate([pos_take, neg_take])
    order = jnp.arange(cand_idx.shape[0], dtype=jnp.float32)
    prio = jnp.where(cand_take, -order, NEG_INF)
    k_pack = min(num_samples, cand_idx.shape[0])
    val, sel = lax.top_k(prio, k_pack)
    take = val > NEG_INF / 2
    idx_out, pos_out = cand_idx[sel], cand_pos[sel] & take
    if k_pack < num_samples:  # pad filler slots back to the fixed shape
        pad = num_samples - k_pack
        idx_out = jnp.concatenate([idx_out, jnp.zeros(pad, idx_out.dtype)])
        pos_out = jnp.concatenate([pos_out, jnp.zeros(pad, bool)])
        take = jnp.concatenate([take, jnp.zeros(pad, bool)])
    return idx_out, pos_out, take


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------
NMS_MAX_ITERS = 128


def nms_fixed(boxes, scores, iou_threshold: float, max_out: int,
              max_iters: int = NMS_MAX_ITERS, fixed_depth: int = 0):
    """Greedy NMS over a fixed-size candidate set.

    boxes [K, 4], scores [K] (invalid = -inf) -> (keep_idx [max_out],
    keep_valid [max_out]). Identical output to torchvision's sequential nms
    for distinct scores whenever the suppression-dependency depth is below
    `max_iters` (every non-adversarial input; see cap note below).

    TPU formulation: instead of a K-step sequential scan (measured ~40ms per
    image at K=2000 — scan-step overhead, not compute), iterate the
    suppression relation to its fixpoint with whole-matrix ops:

        alive[i] <- no j < i with alive[j] and iou[j, i] > thr

    Starting from all-alive, after t iterations every box whose
    suppression-dependency chain is shorter than t has its final (greedy)
    status, so the loop converges in (longest chain) iterations — a handful
    in practice — each a cheap [K, K] masked any-reduce on the VPU.

    Iteration cap (VERDICT r3 item 6): an adversarial score-descending
    overlap chain (or a degenerate early-training model emitting one) has
    dependency depth ~K, turning the uncapped loop into O(K^3) work
    lock-stepped across the vmap batch. The loop therefore stops after
    `max_iters` applications (default 128 — >10x the observed worst real
    convergence; tests/test_nms_adversarial.py measures the chain), and a
    final one-step suppression intersect makes the capped output
    well-defined: the kept set is always an ANTICHAIN (no two kept boxes
    overlap > thr), exactly greedy for every box with dependency depth <=
    max_iters, and conservatively drops deeper boxes greedy might keep.
    For converged states the intersect is the identity (fixpoint), so
    non-adversarial results are bit-identical to the uncapped algorithm.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = pairwise_iou(b, b)
    # j suppresses i if j < i (strictly higher score rank) and IoU > thr
    tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    suppress = (iou > iou_threshold) & tri  # [K, K], row j -> col i
    valid = s > NEG_INF / 2

    # Each while iteration applies the suppression step UNROLL times: the
    # [K, K] masked reduce is cheap VPU work, while every while-loop
    # iteration pays fixed TPU control overhead (condition readback) — the
    # loop is control-bound, not compute-bound (profiled: the NMS whiles are
    # ~1/3 of detection eval). Exactness is preserved: the map is
    # deterministic and the greedy prefix-finality argument above rules out
    # persistent cycles, so a state equal to the state UNROLL steps earlier
    # can only be the fixpoint.
    UNROLL = 4
    it_cap = min(k, max_iters)

    def one(alive):
        return ~jnp.any(suppress & alive[:, None], axis=0) & valid

    def cond(carry):
        alive, prev, it = carry
        return (it < it_cap) & jnp.any(alive != prev)

    def body(carry):
        alive, _, it = carry
        new = alive
        for _ in range(UNROLL):
            new = one(new)
        return new, alive, it + UNROLL

    alive0 = valid
    if fixed_depth:
        # Straight-line alternative (VERDICT r4 item 7): `fixed_depth`
        # applications with NO while loop — removes the loop's per-iteration
        # control overhead entirely (the while is control-bound: its body is
        # a cheap [K, K] VPU reduce). Semantics = the capped loop with
        # max_iters=fixed_depth: exact greedy for every box whose
        # suppression-dependency depth < fixed_depth (real inputs converge
        # in a handful; tests/test_nms_adversarial.py measures chains), and
        # the antichain intersect below keeps deeper (adversarial) cases
        # well-defined. Measured on the real TPU (scripts/probe_nms_depth.py)
        # before being wired as a DetectionConfig knob.
        keep = alive0
        for _ in range(min(k, fixed_depth)):
            keep = one(keep)
    else:
        keep, _, _ = lax.while_loop(
            cond, body, (alive0, jnp.zeros(k, bool), jnp.asarray(0))
        )
    # antichain guarantee under the cap; identity once converged (see above)
    keep = keep & one(keep)
    # gather up to max_out survivors in score order
    keep_priority = jnp.where(keep, s, NEG_INF)
    vals, kept_sorted = lax.top_k(keep_priority, max_out)
    keep_idx = order[kept_sorted]
    return keep_idx, vals > NEG_INF / 2


# ---------------------------------------------------------------------------
# RoIAlign
# ---------------------------------------------------------------------------
def _roi_sample_grid(features_shape, rois, output_size, spatial_scale,
                     sampling_ratio, aligned):
    """Shared forward/backward geometry: corner indices + bilinear weights.

    -> (idx00, idx01, idx10, idx11 [R, P, Q] flattened y*W+x int32,
        w00, w01, w10, w11 [R, P, Q] float32), P = Q = output_size * s.
    """
    H, W, _ = features_shape
    r = rois * spatial_scale
    x0, y0, x1, y1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bin_w = (x1 - x0) / output_size
    bin_h = (y1 - y0) / output_size
    s = sampling_ratio
    off = (jnp.arange(s) + 0.5) / s
    iy = jnp.arange(output_size)
    ys = y0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    ys = ys.reshape(ys.shape[0], -1)
    xs = xs.reshape(xs.shape[0], -1)
    if aligned:
        ys = ys - 0.5
        xs = xs - 0.5
    yy = jnp.clip(ys, 0.0, H - 1.0)
    xx = jnp.clip(xs, 0.0, W - 1.0)
    y0i = jnp.floor(yy).astype(jnp.int32)
    x0i = jnp.floor(xx).astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)
    x1i = jnp.minimum(x0i + 1, W - 1)
    wy = (yy - y0i)[:, :, None]  # [R, P, 1]
    wx = (xx - x0i)[:, None, :]  # [R, 1, Q]
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    Yp0 = y0i[:, :, None]
    Yp1 = y1i[:, :, None]
    Xq0 = x0i[:, None, :]
    Xq1 = x1i[:, None, :]
    idx00 = Yp0 * W + Xq0
    idx01 = Yp0 * W + Xq1
    idx10 = Yp1 * W + Xq0
    idx11 = Yp1 * W + Xq1
    return (idx00, idx01, idx10, idx11), (w00, w01, w10, w11)


def roi_align(features, rois, output_size: int = 7, spatial_scale: float = 1.0,
              sampling_ratio: int = 2, aligned: bool = False):
    """RoIAlign on a single NHWC feature map.

    features [H, W, C]; rois [R, 4] xyxy in image coords -> [R, out, out, C].
    Matches torchvision's MultiScaleRoIAlign semantics for one level
    (bb_fast_rcnn.py:65-68): each output bin averages sampling_ratio^2
    bilinear samples; `aligned` selects the half-pixel-offset variant
    (torchvision default False in the 0.5/0.6 era the reference targets).

    Forward is one batched gather + lerp over all R * out * out * s^2 sample
    points. Backward is a custom VJP: a 1-D segment-sum of the per-corner
    contributions (the autodiff-generated 2-D scatter kernel crashes the
    tunneled TPU worker for some inputs — verified empirically; the segment
    formulation also schedules better). No gradient flows to `rois` (matching
    torchvision's roi_align, which is non-differentiable w.r.t. boxes).
    """
    return _roi_align_vjp(features, rois, output_size, spatial_scale,
                          sampling_ratio, aligned)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _roi_align_vjp(features, rois, output_size, spatial_scale, sampling_ratio, aligned):
    return _roi_align_fwd_impl(features, rois, output_size, spatial_scale,
                               sampling_ratio, aligned)


def _interp_matrix(coords, size: int, output_size: int, s: int):
    """Clipped sample coordinates [R, out*s] -> bin interpolation matrix
    [R, out, size]: row i holds the bilinear weights of every feature
    row/col for output bin i, with the 1/s sample average folded in."""
    c0 = jnp.floor(coords).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, size - 1)
    frac = coords - c0
    grid = jnp.arange(size)[None, None, :]
    m = (grid == c0[..., None]) * (1.0 - frac[..., None]) + (
        grid == c1[..., None]
    ) * frac[..., None]  # [R, out*s, size]
    r = coords.shape[0]
    return m.reshape(r, output_size, s, size).mean(axis=2)


_ROI_MATMUL_CHUNK = 512  # rois per chunk: bounds the [chunk, out, W, C] temp


def _roi_align_fwd_impl(features, rois, output_size, spatial_scale,
                        sampling_ratio, aligned):
    """Separable-matmul RoIAlign (same trick as the backward's segment-sum
    VJP): bilinear sampling factorizes as out[r,i,j] = By[r,i,:] @ F @
    Bx[r,j,:]^T, so the whole op is two MXU contractions per roi chunk
    (~73 GFLOP/scene at reference dims) instead of R*out^2*s^2*4 scattered
    gathers — measured 31 ms/scene gather-bound vs <2 ms as matmuls."""
    H, W, C = features.shape
    s = sampling_ratio
    ys, xs = _roi_sample_coords(features.shape, rois, output_size,
                                spatial_scale, s, aligned)
    by = _interp_matrix(ys, H, output_size, s).astype(features.dtype)
    bx = _interp_matrix(xs, W, output_size, s).astype(features.dtype)
    flat = features.reshape(H, W * C)
    r = rois.shape[0]
    # ceil-div chunking with a zero-padded tail: the [chunk, out, W, C] f32
    # temp stays bounded for EVERY roi count (the old exact-divisibility
    # fallback silently ran unchunked at e.g. the default R=1000 eval path —
    # ~358 MB/image at reference dims)
    chunk = min(r, _ROI_MATMUL_CHUNK)
    nc = (r + chunk - 1) // chunk
    pad = nc * chunk - r
    if pad:
        by = jnp.concatenate([by, jnp.zeros((pad,) + by.shape[1:], by.dtype)])
        bx = jnp.concatenate([bx, jnp.zeros((pad,) + bx.shape[1:], bx.dtype)])

    def run(args):
        by_c, bx_c = args  # [chunk, out, H], [chunk, out, W]
        # t in features.dtype (bf16 on the TPU path): each row of by has two
        # nonzeros, so the contraction is a 2-term lerp of already-bf16 rows —
        # f32 accumulation buys nothing and the [chunk, out, W, C] temp is the
        # op's dominant HBM traffic
        t = lax.dot_general(
            by_c, flat, (((2,), (0,)), ((), ())),
            preferred_element_type=features.dtype,
        ).reshape(chunk, output_size, W, C)
        # contract W with per-roi batch: [r, J, W] x [r, I, W, C] -> [r, J, I, C]
        out = lax.dot_general(
            bx_c, t, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return jnp.transpose(out, (0, 2, 1, 3))  # [r, I, J, C]

    if nc == 1:
        out = run((by, bx))
    else:
        out = lax.map(run, (by.reshape(nc, chunk, output_size, H),
                            bx.reshape(nc, chunk, output_size, W)))
        out = out.reshape(nc * chunk, output_size, output_size, C)
    return out[:r].astype(jnp.float32)


def _roi_align_fwd(features, rois, output_size, spatial_scale, sampling_ratio, aligned):
    out = _roi_align_fwd_impl(features, rois, output_size, spatial_scale,
                              sampling_ratio, aligned)
    # shape/dtype residual as a zero-size token (static python values are not
    # valid custom_vjp residuals)
    return out, (jnp.zeros((0,) + features.shape, features.dtype), rois)


def _roi_sample_coords(feat_shape, rois, output_size, spatial_scale,
                       sampling_ratio, aligned):
    """Continuous (clipped) sample-point coordinates ys/xs: [R, out*s] each."""
    H, W = feat_shape[0], feat_shape[1]
    r = rois * spatial_scale
    x0, y0, x1, y1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bin_w = (x1 - x0) / output_size
    bin_h = (y1 - y0) / output_size
    s = sampling_ratio
    off = (jnp.arange(s) + 0.5) / s
    iy = jnp.arange(output_size)
    ys = y0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    ys = ys.reshape(ys.shape[0], -1)
    xs = xs.reshape(xs.shape[0], -1)
    if aligned:
        ys = ys - 0.5
        xs = xs - 0.5
    return jnp.clip(ys, 0.0, H - 1.0), jnp.clip(xs, 0.0, W - 1.0)


def _roi_align_bwd(output_size, spatial_scale, sampling_ratio, aligned, res, g):
    """Scatter-free RoIAlign backward as dense separable matmuls.

    The forward is out_r = By_r @ F @ Bx_r^T with the BIN-level interpolation
    matrices from `_interp_matrix` (sample-average folded in), so
    dF = sum_r By_r^T @ g_r @ Bx_r — pure MXU matmuls. This replaces the
    autodiff scatter-add, which (a) crashes the tunneled TPU worker for some
    inputs and (b) serializes badly on TPU.

    Using the same `_interp_matrix` as the forward (rather than re-deriving
    sample-level tent weights) halves the FLOPs (P = out, not out*s) and
    keeps fwd/bwd exactly adjoint at clipped image-edge coordinates, where
    the tent at the last row sums to 1-frac instead of 1. The small dot
    contracts the q axis per roi; the big dot then contracts (roi, p)
    jointly — one [H, chunk*out] x [chunk*out, W*C] matmul per chunk, no
    per-chunk accumulator traffic inside a scan.
    """
    token, rois = res
    feat_shape = token.shape[1:]
    feat_dtype = token.dtype
    H, W, C = feat_shape
    s = sampling_ratio
    R = rois.shape[0]
    P = output_size
    ys, xs = _roi_sample_coords(feat_shape, rois, output_size, spatial_scale, s, aligned)
    by = _interp_matrix(ys, H, output_size, s).astype(feat_dtype)  # [R, P, H]
    bx = _interp_matrix(xs, W, output_size, s).astype(feat_dtype)  # [R, P, W]
    gc = g.astype(feat_dtype)                                      # [R, P, P, C]

    # the backward's temps are P/s-smaller than the forward's, so one chunk
    # (no lax.map round trip) is fine at training/eval roi counts
    chunk = min(R, 4 * _ROI_MATMUL_CHUNK)
    n_chunks = (R + chunk - 1) // chunk
    pad = n_chunks * chunk - R
    if pad:
        by = jnp.concatenate([by, jnp.zeros((pad, P, H), by.dtype)])
        bx = jnp.concatenate([bx, jnp.zeros((pad, P, W), bx.dtype)])
        gc = jnp.concatenate([gc, jnp.zeros((pad, P, P, C), gc.dtype)])

    def run(args):
        by_c, bx_c, g_c = args
        # u[r,p,c,w] = sum_q g[r,p,q,c] * bx[r,q,w]   (tiny: q = out bins);
        # consumed below in this natural output layout — transposing u would
        # relayout the op's biggest temp
        u = lax.dot_general(
            g_c, bx_c, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=feat_dtype,
        )  # [r, P, C, W]
        # dF[h, (c,w)] = sum_{r,p} by[r,p,h] * u[r,p,c,w]
        return lax.dot_general(
            by_c.reshape(chunk * P, H), u.reshape(chunk * P, C * W),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, C*W]

    if n_chunks == 1:
        dF = run((by, bx, gc))
    else:
        parts = lax.map(run, (by.reshape(n_chunks, chunk, P, H),
                              bx.reshape(n_chunks, chunk, P, W),
                              gc.reshape(n_chunks, chunk, P, P, C)))
        dF = jnp.sum(parts, axis=0)
    # transpose the small f32 output [H, C, W] -> [H, W, C]
    dF = jnp.transpose(dF.reshape(H, C, W), (0, 2, 1))
    return dF.astype(feat_dtype), jnp.zeros_like(rois)


_roi_align_vjp.defvjp(_roi_align_fwd, _roi_align_bwd)


def _roi_align_old_gather(features, rois, output_size: int = 7, spatial_scale: float = 1.0,
                          sampling_ratio: int = 2, aligned: bool = False):
    """Reference gather implementation kept for tests (same forward values)."""
    H, W, C = features.shape
    r = rois * spatial_scale
    x0, y0, x1, y1 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bin_w = (x1 - x0) / output_size
    bin_h = (y1 - y0) / output_size
    s = sampling_ratio
    # sample grid: for bin (i, j), samples at offsets (k + 0.5)/s of the bin
    off = (jnp.arange(s) + 0.5) / s
    # ys: [R, out, s] = y0 + (i + off) * bin_h
    iy = jnp.arange(output_size)
    ys = y0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_h[:, None, None]
    xs = x0[:, None, None] + (iy[None, :, None] + off[None, None, :]) * bin_w[:, None, None]
    ys = ys.reshape(ys.shape[0], -1)  # [R, out*s]
    xs = xs.reshape(xs.shape[0], -1)
    if aligned:
        ys = ys - 0.5
        xs = xs - 0.5

    def bilinear(yy, xx):
        # yy [R, P], xx [R, Q] -> samples [R, P, Q, C]
        yy = jnp.clip(yy, 0.0, H - 1.0)
        xx = jnp.clip(xx, 0.0, W - 1.0)
        y0i = jnp.floor(yy).astype(jnp.int32)
        x0i = jnp.floor(xx).astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, H - 1)
        x1i = jnp.minimum(x0i + 1, W - 1)
        wy = (yy - y0i)[..., None]  # [R, P, 1]
        wx = (xx - x0i)[..., None]  # [R, Q, 1]
        f = features
        # gather rows then columns: [R, P, W, C] would be huge; instead gather
        # full point grid via advanced indexing on (y, x) pairs.
        Yp0 = y0i[:, :, None]
        Yp1 = y1i[:, :, None]
        Xq0 = x0i[:, None, :]
        Xq1 = x1i[:, None, :]
        v00 = f[Yp0, Xq0]
        v01 = f[Yp0, Xq1]
        v10 = f[Yp1, Xq0]
        v11 = f[Yp1, Xq1]
        wyP = wy[:, :, None, :]
        wxQ = wx[:, None, :, :]
        return (
            v00 * (1 - wyP) * (1 - wxQ)
            + v01 * (1 - wyP) * wxQ
            + v10 * wyP * (1 - wxQ)
            + v11 * wyP * wxQ
        )

    samples = bilinear(ys, xs)  # [R, out*s, out*s, C]
    R = rois.shape[0]
    samples = samples.reshape(R, output_size, s, output_size, s, C)
    return jnp.mean(samples, axis=(2, 4))


def batched_roi_align(features, rois, **kw):
    """features [B, H, W, C], rois [B, R, 4] -> [B, R, out, out, C]."""
    return jax.vmap(lambda f, r: roi_align(f, r, **kw))(features, rois)


def batched_roi_align_fused(features, rois, output_size: int = 7,
                            spatial_scale: float = 1.0, sampling_ratio: int = 2,
                            aligned: bool = False):
    """Inference-only fused RoIAlign (pallas/roialign.py): same semantics as
    `batched_roi_align` but the row-pass intermediate stays in VMEM — the
    XLA separable-matmul path round-trips ~400 MB/image of HBM for it at
    detection-eval scale (profiled: ~60%% of eval device time). TPU only;
    no backward (eval never differentiates through pooling)."""
    from driving_dirty_tpu.pallas.roialign import LANE, ROI_BLOCK, roi_align_fused

    b, h, w, c = features.shape
    r = rois.shape[1]
    s = sampling_ratio
    wp = ((w + LANE - 1) // LANE) * LANE  # lane-aligned per-channel stride

    def mk(rois_img):
        ys, xs = _roi_sample_coords((h, w, c), rois_img, output_size,
                                    spatial_scale, s, aligned)
        by = _interp_matrix(ys, h, output_size, s)
        bx = _interp_matrix(xs, w, output_size, s)
        return by.astype(features.dtype), bx.astype(features.dtype)

    by, bx = jax.vmap(mk)(rois)
    pad = (-r) % ROI_BLOCK
    if pad:
        by = jnp.concatenate(
            [by, jnp.zeros((b, pad) + by.shape[2:], by.dtype)], axis=1)
        bx = jnp.concatenate(
            [bx, jnp.zeros((b, pad) + bx.shape[2:], bx.dtype)], axis=1)
    rp = r + pad
    # features -> [B, H, C*Wp]: channel-major lanes, W zero-padded to the
    # 128 lane boundary so the kernel's per-channel slices are aligned
    f = jnp.transpose(features, (0, 1, 3, 2))         # [B, H, C, W]
    if wp != w:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
        bx = jnp.pad(bx, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    out = roi_align_fused(
        f.reshape(b, h, c * wp), by.reshape(b, rp * output_size, h), bx,
        out_size=output_size, c_n=c)
    return out[:, :r]
