"""Convergence gate (VERDICT r1 item 7): training actually LEARNS.

No environment here has the real dataset, so this is the closest available
proxy to the reference's 0.8529 val-TS target (BASELINE.md): short synthetic
runs must (a) reduce train loss by a fixed margin through the full compiled
train step, and (b) for the roadmap task, beat the trivial
all-road-predictor's threat score on a learnable (deterministic-road) target.
The metrics JSONL of each gate run is copied to artifacts/convergence_gate/
as evidence.
"""
import json
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # real (tiny) training runs

from driving_dirty_tpu.data.synthetic import generate
from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.models.roadmap import RoadMapBCEv2
from driving_dirty_tpu.train.trainer import Trainer

ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "artifacts", "convergence_gate")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_gate")
    # deterministic road target: learnable end-to-end (see synthetic.py)
    generate(str(d), scenes=3, samples=8, labeled_scenes=3, seed=0, fixed_road=True)
    return str(d)


def _metrics_path(root, task_name):
    """Newest versioned run's metrics file (runs write under
    <root>/<task>/version_N since the experiment-versioning change)."""
    import glob

    paths = sorted(
        glob.glob(os.path.join(root, task_name, "version_*", "tb", "metrics.jsonl")),
        key=lambda p: int(p.split("version_")[1].split(os.sep)[0]),
    )
    assert paths, f"no versioned metrics.jsonl under {root}/{task_name}"
    return paths[-1]


def _losses(root, task_name):
    out = []
    with open(_metrics_path(root, task_name)) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                out.append((rec["step"], rec["train_loss"]))
    return [l for _, l in sorted(out)]


def _store_artifact(root, task_name):
    # Opt-in: ordinary suite runs must not churn the committed evidence files
    # (set DD_STORE_GATE_ARTIFACTS=1 to refresh them deliberately).
    if os.environ.get("DD_STORE_GATE_ARTIFACTS") != "1":
        return
    os.makedirs(ARTIFACTS, exist_ok=True)
    shutil.copy(_metrics_path(root, task_name),
                os.path.join(ARTIFACTS, f"{task_name}.jsonl"))


def test_detection_losses_decrease():
    """The full fixed-shape detection train step (RPN match/sample/NMS + ROI
    heads) must OPTIMIZE, not just produce finite grads: 24 adam steps on a
    fixed synthetic scene at tiny image_size cut the summed torchvision-style
    losses. Complements the AE/roadmap gates with the third model family."""
    import jax
    import jax.numpy as jnp
    import optax

    from driving_dirty_tpu.models.basic_ae import BasicAE as AEModel
    from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap

    h, w, det = 16, 24, 128
    task = FasterRCNNRoadMap(dict(
        pretrained_path=None, ae_hidden_dim=8, ae_latent_dim=8, batch_size=2,
        image_size=det, rpn_pre_nms_top_n=128, rpn_post_nms_top_n=64,
        box_batch_per_image=32, max_bb=8, remat=False, unfreeze_epoch_no=0,
    ))
    task.ae = AEModel(dict(hidden_dim=8, latent_dim=8, input_height=h,
                           input_width=6 * w, output_height=h, output_width=w))
    task.latent_dim = 8
    rng = np.random.RandomState(0)
    boxes = np.zeros((2, 8, 2, 4), np.float32)
    boxes[:, 0, 0] = [8, 8, -8, -8]   # one 16x16m box at the origin
    boxes[:, 0, 1] = [8, -8, 8, -8]
    boxes[:, 1, 0] = [30, 30, 20, 20]
    boxes[:, 1, 1] = [-20, -30, -20, -30]
    box_valid = np.zeros((2, 8), bool)
    box_valid[:, :2] = True
    batch = {
        "images": jnp.asarray(rng.rand(2, 6, h, w, 3).astype(np.float32)),
        "road": jnp.asarray((rng.rand(2, det, det) > 0.5).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(box_valid),
        "categories": jnp.asarray(np.full((2, 8), 3, np.int32)),
    }
    params, state = task.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, state, key):
        def loss_fn(p):
            loss, (ns, _) = task.loss(p, state, batch, key, train=True)
            return loss, ns

        (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, ns, loss

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(24):
        key, k = jax.random.split(key)
        params, opt, state, loss = step(params, opt, state, k)
        losses.append(float(loss))
    head = float(np.mean(losses[:4]))
    tail = float(np.mean(losses[-4:]))
    assert np.isfinite(losses).all(), losses
    assert tail < 0.8 * head, (head, tail, losses)


def test_basic_ae_loss_decreases(data_dir, tmp_path):
    task = BasicAE(dict(
        link=data_dir, hidden_dim=16, latent_dim=16, batch_size=4,
        learning_rate=1e-3, samples_per_scene=8, num_unlabeled_scenes=3,
        output_img_freq=0,
    ))
    root = str(tmp_path / "logs")
    Trainer(max_epochs=8, default_root_dir=root, limit_val_batches=1,
            log_every_n_steps=1, enable_progress_bar=False,
            enable_checkpointing=False).fit(task)
    losses = _losses(root, "basic_ae")
    assert len(losses) >= 8
    head = float(np.mean(losses[:2]))
    tail = float(np.mean(losses[-2:]))
    _store_artifact(root, "basic_ae")
    # >=30% loss reduction over the short run (learns the image mean)
    assert tail < 0.7 * head, (head, tail)


def test_roadmap_beats_trivial_predictor_ts(data_dir, tmp_path):
    # lr 0.1: the deterministic target means the 640k-head biases alone can
    # drive BCE toward 0, and Adam's per-step movement ~= lr — at 1e-3 the
    # 16-step budget barely moves the logits (measured 0.70 -> 0.63), at 0.1
    # they cross the decision threshold well inside it. A gate for "the
    # compiled train step optimizes", not a model-quality claim.
    task = RoadMapBCEv2(dict(
        link=data_dir, pretrained_path=None, ae_hidden_dim=16, ae_latent_dim=16,
        batch_size=4, learning_rate=0.1, samples_per_scene=8,
        num_labeled_scenes=3, unfreeze_epoch_no=0, output_img_freq=0,
    ))
    # 3 labeled scenes -> 2 train / 1 val (with exactly 2, round(0.8*2)=2
    # leaves the val split EMPTY and no val metrics are ever logged)
    root = str(tmp_path / "logs")
    Trainer(max_epochs=4, default_root_dir=root, limit_val_batches=1,
            log_every_n_steps=1, enable_progress_bar=False,
            enable_checkpointing=False).fit(task)
    losses = _losses(root, "roadmap_bce")
    head = float(np.mean(losses[:2]))
    tail = float(np.mean(losses[-2:]))
    assert tail < 0.5 * head, (head, tail)

    # final val TS must beat the trivial all-road predictor: the fixed road
    # blob is 200x200 of 800x800, so all-ones scores TS = 0.0625
    path = _metrics_path(root, "roadmap_bce")
    ts = [json.loads(l).get("val_ts_rounded") for l in open(path)]
    ts = [t for t in ts if t is not None]
    _store_artifact(root, "roadmap_bce")
    trivial = 200 * 200 / (800 * 800)
    assert ts and ts[-1] > trivial, (ts, trivial)
