"""nms_fixed under the adversarial descending-score overlap chain
(VERDICT r3 item 6).

The chain: boxes laid along a line, each overlapping its successor with
IoU > thr but not its successor's successor, scores strictly descending.
Greedy NMS keeps exactly the even-indexed boxes; the fixpoint iteration's
suppression-dependency depth is ~K, the worst case that motivates the
iteration cap. These tests pin:

  * exact greedy equality on deep chains while uncapped (correctness),
  * the capped path's contract: bounded wall time at K=2000, antichain
    output, and exact greedy agreement up to the cap depth,
  * cap default sanity: converged (real-shaped) inputs are bit-identical
    capped vs uncapped.
"""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driving_dirty_tpu.ops.detection import NMS_MAX_ITERS, nms_fixed

THR = 0.5


def _chain(k, w=10.0, d=2.0):
    """[K] unit-height boxes: IoU(i, i+1) = (w-d)/(w+d) = 2/3 > thr,
    IoU(i, i+2) = (w-2d)/(w+2d) = 3/7 < thr. Scores strictly descending."""
    x0 = np.arange(k, dtype=np.float32) * d
    boxes = np.stack([x0, np.zeros(k, np.float32), x0 + w, np.ones(k, np.float32)], 1)
    scores = np.linspace(1.0, 0.5, k).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


def _kept(idx, valid):
    return sorted(np.asarray(idx)[np.asarray(valid)].tolist())


def test_uncapped_chain_matches_greedy_exactly():
    k = 256
    boxes, scores = _chain(k)
    idx, valid = jax.jit(
        lambda b, s: nms_fixed(b, s, THR, k, max_iters=k)
    )(boxes, scores)
    assert _kept(idx, valid) == list(range(0, k, 2))


def test_capped_chain_is_antichain_and_greedy_up_to_cap():
    k = 2000
    boxes, scores = _chain(k)
    f = jax.jit(lambda b, s: nms_fixed(b, s, THR, k))  # default cap
    idx, valid = jax.tree.map(np.asarray, f(boxes, scores))
    kept = _kept(idx, valid)
    # greedy-exact prefix: every box with dependency depth <= cap
    depth_ok = NMS_MAX_ITERS - 8  # margin below the cap
    assert [i for i in kept if i < depth_ok] == [i for i in range(0, depth_ok, 2)]
    # antichain: no two kept boxes overlap above the threshold
    b = np.asarray(boxes)[kept]
    x0 = np.maximum(b[:, None, 0], b[None, :, 0])
    x1 = np.minimum(b[:, None, 2], b[None, :, 2])
    inter = np.clip(x1 - x0, 0, None)  # unit height
    area = b[:, 2] - b[:, 0]
    iou = inter / (area[:, None] + area[None, :] - inter)
    np.fill_diagonal(iou, 0.0)
    assert iou.max() <= THR + 1e-6, "capped NMS emitted overlapping boxes"


def test_capped_chain_wall_time_bounded():
    """K=2000 adversarial chain completes in bounded time (the uncapped
    fixpoint would run ~500 [2000 x 2000] while-iterations; the cap holds it
    to 32). Generous wall bound — this is a regression tripwire for the cap
    being dropped, not a precise benchmark."""
    k = 2000
    boxes, scores = _chain(k)
    f = jax.jit(lambda b, s: nms_fixed(b, s, THR, 100))
    jax.block_until_ready(f(boxes, scores))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(f(boxes, scores))
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"capped adversarial NMS took {dt:.1f}s"


@pytest.mark.parametrize("seed", [0, 1])
def test_cap_is_identity_on_converged_inputs(seed):
    """Random (real-shaped) inputs converge far below the cap; the capped
    result must be bit-identical to a high-cap run (the final intersect is
    the identity at the fixpoint)."""
    rng = np.random.RandomState(seed)
    k = 300
    ctr = rng.rand(k, 2).astype(np.float32) * 100
    wh = rng.rand(k, 2).astype(np.float32) * 20 + 2
    boxes = jnp.asarray(np.concatenate([ctr - wh / 2, ctr + wh / 2], 1))
    scores = jnp.asarray(rng.rand(k).astype(np.float32))
    a = jax.jit(lambda b, s: nms_fixed(b, s, THR, k))(boxes, scores)
    b = jax.jit(lambda b_, s: nms_fixed(b_, s, THR, k, max_iters=k))(boxes, scores)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_fixed_depth_matches_while_on_random_inputs():
    """fixed_depth (straight-line) NMS == the convergence while-loop on
    random score distributions (chain depth << 16 there); the eval-speed
    knob must not change results in the non-adversarial regime."""
    import numpy as np

    rng = np.random.RandomState(0)
    k = 256
    ctr = rng.rand(k, 2) * 700 + 50
    wh = rng.rand(k, 2) * 80 + 10
    boxes = jnp.asarray(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1), jnp.float32
    )
    scores = jnp.asarray(rng.rand(k), jnp.float32)
    a_idx, a_val = jax.jit(lambda b, s: nms_fixed(b, s, THR, 100))(boxes, scores)
    b_idx, b_val = jax.jit(
        lambda b, s: nms_fixed(b, s, THR, 100, fixed_depth=16)
    )(boxes, scores)
    assert np.array_equal(np.asarray(a_idx), np.asarray(b_idx))
    assert np.array_equal(np.asarray(a_val), np.asarray(b_val))


def test_fixed_depth_adversarial_is_antichain():
    """Under the adversarial chain, fixed_depth output is still a valid
    antichain (no two kept boxes overlap > thr)."""
    import numpy as np

    k = 64
    boxes, scores = _chain(k)
    idx, val = jax.jit(lambda b, s: nms_fixed(b, s, THR, k, fixed_depth=8))(
        boxes, scores
    )
    kept = np.asarray(idx)[np.asarray(val)]
    bx = np.asarray(boxes)[kept]
    for i in range(len(bx)):
        for j in range(i + 1, len(bx)):
            x0 = max(bx[i, 0], bx[j, 0]); y0 = max(bx[i, 1], bx[j, 1])
            x1 = min(bx[i, 2], bx[j, 2]); y1 = min(bx[i, 3], bx[j, 3])
            inter = max(0, x1 - x0) * max(0, y1 - y0)
            ai = (bx[i, 2] - bx[i, 0]) * (bx[i, 3] - bx[i, 1])
            aj = (bx[j, 2] - bx[j, 0]) * (bx[j, 3] - bx[j, 1])
            assert inter / (ai + aj - inter) <= THR
