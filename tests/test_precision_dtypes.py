"""Pin interior compute dtype under --precision 16 for the whole zoo.

The uniform precision mixin (models/precision.py) promises bf16 activations
for every task when --precision 16 is set (the reference's Lightning flag,
SURVEY.md §5.6). A single stray `.astype(jnp.float32)` mid-forward silently
runs a model's dominant FLOPs in f32 (this happened to multitask's merge
head in round 2) — so this test lowers each task's training loss to StableHLO
and asserts that NO convolution and NO large matmul executes in f32. Losses
themselves are f32 by design (elementwise, cheap); only conv/dot ops are
checked because that is where the MXU time goes.
"""
import re

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # traces 800x800 models (lower only, no compile)

import jax
import jax.numpy as jnp

from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.models.bb_mlp import Boxes
from driving_dirty_tpu.models.faster_rcnn import FasterRCNNRoadMap
from driving_dirty_tpu.models.multitask import MultiTask
from driving_dirty_tpu.models.roadmap import RoadMapBCEv2
from driving_dirty_tpu.models.spatial_bb import BBSpatialModel, BBSpatialRoadMap

TINY = dict(
    batch_size=2, learning_rate=1e-3, pretrained_path=None,
    ae_hidden_dim=8, ae_latent_dim=8, max_bb=8, precision=16,
)
DET_TINY = dict(
    TINY, image_size=128, rpn_pre_nms_top_n=200, rpn_post_nms_top_n=64,
    box_batch_per_image=32,
)


def _batch(b=2, max_bb=8, img=800, hw=(256, 306)):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, max_bb, 2, 4), np.float32)
    valid = np.zeros((b, max_bb), bool)
    boxes[:, 0, 0] = [5, 5, -5, -5]
    boxes[:, 0, 1] = [5, -5, 5, -5]
    valid[:, 0] = True
    return {
        "images": jnp.asarray(rng.rand(b, 6, hw[0], hw[1], 3).astype(np.float32)),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "categories": jnp.zeros((b, max_bb), jnp.int32),
        "road": jnp.asarray((rng.rand(b, img, img) > 0.5).astype(np.float32)),
    }


def _lowered_loss_text(task, batch):
    params, state = task.init(jax.random.PRNGKey(0))

    def f(p, s, b):
        loss, _ = task.loss(p, s, b, jax.random.PRNGKey(1), train=True)
        return loss

    return jax.jit(f).lower(params, state, batch).as_text()


def _mxu_ops(text):
    """All convolution/dot_general op lines in the StableHLO module."""
    return [
        line.strip()
        for line in text.splitlines()
        if "stablehlo.convolution" in line or "stablehlo.dot_general" in line
    ]


def _f32_ops(lines):
    """Ops whose OPERANDS are f32 (compute happens in f32).

    A bf16xbf16 -> f32 dot is fine — that is f32 accumulation, the
    recommended MXU pattern; what we forbid is f32 inputs, which double
    operand bandwidth and leave the bf16 MXU path. 'f32' is not a substring
    of 'bf16', so a plain substring match finds f32 tensors."""
    bad = []
    for l in lines:
        m = re.search(r":\s*\((.*?)\)\s*->", l)
        operands = m.group(1) if m else l
        if "f32" in operands.replace("bf16", ""):
            bad.append(l)
    return bad


CASES = [
    ("basic_ae", lambda: BasicAE(dict(TINY, hidden_dim=8, latent_dim=8)), dict()),
    ("roadmap_bce_v2", lambda: RoadMapBCEv2(TINY), dict()),
    ("bb_mlp", lambda: Boxes(TINY), dict()),
    ("spatial_bb", lambda: BBSpatialModel(TINY), dict()),
    ("spatial_rm", lambda: BBSpatialRoadMap(TINY), dict()),
    ("multitask", lambda: MultiTask(TINY), dict()),
    ("faster_rcnn_rm", lambda: FasterRCNNRoadMap(DET_TINY), dict(img=128, hw=(64, 76))),
]


@pytest.mark.parametrize("name,mk,bkw", CASES, ids=[c[0] for c in CASES])
def test_no_f32_mxu_ops_under_precision16(name, mk, bkw):
    task = mk()
    text = _lowered_loss_text(task, _batch(**bkw))
    ops = _mxu_ops(text)
    assert ops, f"{name}: expected conv/dot ops in the lowered module"
    bad = _f32_ops(ops)
    assert not bad, (
        f"{name}: {len(bad)}/{len(ops)} MXU ops run in f32 under --precision 16; "
        f"first offender:\n{bad[0][:400]}"
    )
