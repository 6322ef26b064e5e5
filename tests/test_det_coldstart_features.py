"""Round-5 detection features: exact-top-k warmup (VERDICT r4 item 4) and
the --label_offset background-collision opt-out (item 5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driving_dirty_tpu.models.faster_rcnn import BBFasterRCNN

TINY = dict(
    batch_size=1, learning_rate=1e-3, pretrained_path=None,
    ae_hidden_dim=8, ae_latent_dim=8, max_bb=8,
    image_size=128, rpn_pre_nms_top_n=200, rpn_post_nms_top_n=64,
    box_batch_per_image=32,
)


def _batch(b=1, max_bb=8, img=128):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, max_bb, 2, 4), np.float32)
    valid = np.zeros((b, max_bb), bool)
    cats = np.zeros((b, max_bb), np.int32)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid[:, 0] = True
    cats[:, 0] = 0  # category 0: undetectable under raw labels, detectable
    # under label_offset=1
    return {
        "images": jnp.asarray(rng.rand(b, 6, 64, 76, 3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.asarray(cats),
    }


def test_step_variant_switches_head():
    task = BBFasterRCNN(dict(TINY, exact_topk_warmup_steps=10))
    assert task.step_variant(0) == "exact_topk_warmup"
    assert task._active_head is task._warmup_head
    assert task._warmup_head.cfg.exact_topk is True
    assert task.step_variant(10) is None
    assert task._active_head is task.head
    # warmup head shares the param pytree structure
    p1 = jax.eval_shape(task.head.init, jax.random.PRNGKey(0))
    p2 = jax.eval_shape(task._warmup_head.init, jax.random.PRNGKey(0))
    assert jax.tree.structure(p1) == jax.tree.structure(p2)


def test_step_variant_disabled_when_exact_or_zero():
    assert BBFasterRCNN(dict(TINY, exact_topk=1))._warmup_head is None
    assert BBFasterRCNN(dict(TINY, exact_topk_warmup_steps=0))._warmup_head is None


def test_warmup_variant_loss_runs():
    task = BBFasterRCNN(dict(TINY, exact_topk_warmup_steps=10))
    task.step_variant(0)  # activate the exact-topk warmup head
    params, state = task.init(jax.random.PRNGKey(0))
    loss, _ = jax.jit(
        lambda p: task.loss(p, state, _batch(), jax.random.PRNGKey(1), train=True)
    )(params)
    assert np.isfinite(float(loss))


def test_label_offset_grows_classifier_and_shifts_labels():
    raw = BBFasterRCNN(dict(TINY))
    off = BBFasterRCNN(dict(TINY, label_offset=1))
    assert raw.cfg.num_classes == 9 and off.cfg.num_classes == 10
    _, _, cats_raw = raw._targets(_batch())
    _, _, cats_off = off._targets(_batch())
    assert int(cats_raw[0, 0]) == 0 and int(cats_off[0, 0]) == 1

    # with the offset, a category-0 GT is a REAL foreground class: train a
    # step and check the loss is finite; predict() reports raw ids back
    params, state = off.init(jax.random.PRNGKey(0))
    loss, _ = jax.jit(
        lambda p: off.loss(p, state, _batch(), jax.random.PRNGKey(1), train=True)
    )(params)
    assert np.isfinite(float(loss))
    dets = off.predict(params, state, _batch()["images"])
    labels = np.asarray(dets["labels"])
    valid = np.asarray(dets["valid"])
    # reported labels are raw dataset ids: 0..8 (shifted back from 1..9)
    assert labels[valid].min() >= 0 if valid.any() else True
    assert labels[valid].max() <= 8 if valid.any() else True


def test_trainer_switches_variant_mid_run(tmp_path):
    """Integration: a 2-step fit with exact_topk_warmup_steps=1 compiles the
    warmup program for step 0 and the steady-state program for step 1."""
    from driving_dirty_tpu.data.synthetic import generate
    from driving_dirty_tpu.train.trainer import Trainer

    data = str(tmp_path / "data")
    generate(data, scenes=1, samples=2, labeled_scenes=3, seed=0)
    task = BBFasterRCNN(dict(
        TINY, exact_topk_warmup_steps=1, link=data, num_labeled_scenes=3,
        samples_per_scene=2, output_img_freq=0, val_ats=0, remat=False,
    ))
    seen = []
    orig = task.step_variant

    def spy(step):
        v = orig(step)
        seen.append((step, v))
        return v

    task.step_variant = spy
    Trainer(max_epochs=1, default_root_dir=str(tmp_path / "logs"),
            limit_train_batches=2, limit_val_batches=1,
            enable_progress_bar=False).fit(task)
    variants = dict(seen)
    assert variants.get(0) == "exact_topk_warmup"
    assert variants.get(1) is None
