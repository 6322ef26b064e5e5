"""Roadmap prediction tasks: frozen pretrained encoder + Linear head -> 800x800.

Three variants matching /root/reference/src/roadmap_model/ (SURVEY.md §2.4):

  RoadMap      ("roadmap_mse", roadmap_pretrain_ae.py): sigmoid + MSE loss,
               encoder unfreezes at the hard-coded epoch 30.
  RoadMapBCE   (roadmap_bce_loss.py): BCE-with-logits; the reference computes
               val TS on *raw logits* and logits.round() (quirk, :141-142) —
               preserved behind `ts_on_logits`.
  RoadMapBCEv2 ("roadmap_bce", roadmap_bce_v2.py, the registry default):
               BCE-with-logits, TS on sigmoid output, ReduceLROnPlateau
               (patience 10), tunable --unfreeze_epoch_no.

TPU-first notes: the latent->640000 head is the dominant weight (41-82M
params); under a ('data','model') mesh its output dim is sharded over 'model'
(param_sharding_rules below), so the big matmul runs column-parallel with an
all-gather only at the 800x800 reshape. Freezing is optimizer masking, not
module mutation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from driving_dirty_tpu.metrics.threat import ts_road_map
from driving_dirty_tpu.models.labeled_data import LabeledDataMixin, add_labeled_data_args
from driving_dirty_tpu.models.pretrained import Int8TrunkMixin, init_backbone, load_pretrained_ae
from driving_dirty_tpu.core import layers as L
from driving_dirty_tpu.ops.stitch import normalize_images, wide_stitch
from driving_dirty_tpu.train.task import Task, hp, hp_opt

MAP_PIXELS = 800 * 800


class RoadMapBase(Int8TrunkMixin, LabeledDataMixin, Task):
    name = "roadmap_base"
    unfreeze_default = 30  # hard-coded in mse/bce-v1 (roadmap_pretrain_ae.py:131)

    def __init__(self, hparams=None):
        super().__init__(hparams)
        h = self.hparams
        self.batch_size = hp(h, "batch_size", 16)
        self.output_dim = MAP_PIXELS
        self.ae, self._ae_params, self._ae_state = load_pretrained_ae(h)
        self.latent_dim = self.ae.latent_dim
        self.fc1 = L.Linear(self.latent_dim, self.output_dim)
        # compute dtype (precision {32,16,8} -> f32/bf16/bf16+int8 trunk)
        # comes from Int8TrunkMixin — one code path for the whole zoo
        ue = hp(h, "unfreeze_epoch_no", None)
        self.unfreeze_epoch_no = self.unfreeze_default if ue is None else ue

    # --- model -----------------------------------------------------------
    def init(self, rng):
        k_bb, k_fc = jax.random.split(rng)
        bb_p, bb_s = init_backbone(self.ae, self._ae_params, self._ae_state, k_bb)
        return {"encoder": bb_p["encoder"], "fc1": self.fc1.init(k_fc)}, {
            "encoder": bb_s["encoder"]
        }

    def forward(self, params, state, images, *, train: bool, rng):
        """[b, 6, H, W, C] -> (logits [b, 800, 800], probs, new_state).

        Training remats the encoder (see BasicAE.forward: the padded wide-conv
        activations dominate HBM otherwise)."""
        x = wide_stitch(normalize_images(images, self.compute_dtype))
        fast = (not train) and hp(self.hparams, "fast_conv", False)
        fused = hp(self.hparams, "fused_trunk", None)  # None = off (the Pallas kernel measured slower; see pallas/trunk.py)
        enc_apply = lambda p, s, v: self.ae.encoder.apply(
            p, s, v, train=train, rng=rng, fast=fast,
            fast_head=hp(self.hparams, "fast_head", False),
            fused=None if fused is None else bool(fused),
            **self.enc_int8_kwargs(train),
        )
        if train and hp_opt(self.hparams, "remat", True):
            enc_apply = jax.checkpoint(enc_apply)
        z, se = enc_apply(params["encoder"], state["encoder"], x)
        logits = self.fc1.apply(params["fc1"], z).reshape(z.shape[0], 800, 800)
        logits = logits.astype(jnp.float32)  # losses/metrics in f32
        return logits, jax.nn.sigmoid(logits), {"encoder": se}

    def calibrate_int8(self, params, state, images):
        """One-time int8 activation-scale calibration (precision 8 only).

        Must run EAGERLY before the inference fn is traced so the scales bake
        in as constants — a dynamic absmax in the compiled program serializes
        every conv behind a full scalar reduction (measured 1590 vs 2859
        scenes/s). predict() calls this automatically; callers jitting
        forward() themselves (bench.py) call it explicitly first."""
        if not self.int8_trunk or self._int8_scales is not None:
            return
        x = wide_stitch(normalize_images(jnp.asarray(images), self.compute_dtype))
        self.calibrate_int8_on(params["encoder"], x)

    def predict(self, params, state, images, rng=None):
        """Inference entry: -> binary [b, 800, 800] mask (threshold 0.5).

        Thresholds raw logits at 0 (== sigmoid > 0.5, sigmoid being monotonic)
        so inference skips the 640k-wide transcendental per scene."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.calibrate_int8(params, state, images)
        logits, _, _ = self.forward(params, state, images, train=False, rng=rng)
        return (logits > 0.0).astype(jnp.float32)

    # --- optimization ----------------------------------------------------
    def freeze_mask(self, params, epoch: int):
        if epoch >= self.unfreeze_epoch_no:
            return None  # everything trainable
        enc_frozen = jax.tree.map(lambda _: False, params["encoder"])
        rest = {k: jax.tree.map(lambda _: True, v) for k, v in params.items() if k != "encoder"}
        return {"encoder": enc_frozen, **rest}

    def param_sharding_rules(self, path, leaf):
        # Shard the giant head's output dim and the encoder fc1 input dim over
        # 'model'; everything else replicates.
        if path[:2] == ("fc1", "w"):
            return P(None, "model")
        if path[:2] == ("fc1", "b"):
            return P("model")
        if path[:4] == ("encoder", "fc1", "fc", "w"):
            return P("model", None)
        return None

    # --- logging -----------------------------------------------------------
    def log_images(self, params, state, batch, rng, step_name):
        """Input pano + target/pred roadmaps (the reference's _log_rm_images
        triptych, roadmap_bce_v2.py:110-123)."""
        import jax.numpy as jnp
        from driving_dirty_tpu.ops.stitch import normalize_images, wide_stitch

        x = batch["images"][:1]
        _, probs, _ = self.forward(params, state, x, train=False, rng=rng)
        return {
            f"{step_name}_input_images": jnp.clip(wide_stitch(normalize_images(x))[0], 0, 1),
            f"{step_name}_target_roadmaps": batch["road"][0][..., None],
            f"{step_name}_pred_roadmaps": jnp.round(probs[0])[..., None],
        }

    # --- CLI -------------------------------------------------------------
    @staticmethod
    def add_model_specific_args(parser):
        parser.add_argument("--learning_rate", type=float, default=1e-3)
        parser.add_argument("--batch_size", type=int, default=16)
        parser.add_argument("--unfreeze_epoch_no", type=int, default=None)
        add_labeled_data_args(parser)
        return parser


class RoadMap(RoadMapBase):
    """MSE on sigmoid probabilities (/root/reference/src/roadmap_model/roadmap_pretrain_ae.py:76,100)."""

    name = "roadmap_mse"

    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import tune

        RoadMapBase.add_model_specific_args(parser)
        tune(parser, "learning_rate", [1e-3, 1e-4, 1e-5])
        return parser

    def loss(self, params, state, batch, rng, *, train: bool):
        logits, probs, new_state = self.forward(
            params, state, batch["images"], train=train, rng=rng
        )
        target = batch["road"]
        loss = jnp.mean((target - probs) ** 2)
        return loss, (new_state, {})

    def val_metrics(self, params, state, batch, rng):
        logits, probs, _ = self.forward(params, state, batch["images"], train=False, rng=rng)
        target = batch["road"]
        loss = jnp.mean((target - probs) ** 2)
        return {
            "val_loss": loss,
            "val_ts": ts_road_map(target, probs),
            "val_ts_rounded": ts_road_map(target, jnp.round(probs)),
        }


class RoadMapBCE(RoadMapBase):
    """BCE-with-logits; v1 quirk: TS computed on raw logits
    (/root/reference/src/roadmap_model/roadmap_bce_loss.py:141-142)."""

    name = "roadmap_bce_v1"
    ts_on_logits = True

    def _bce(self, logits, target):
        # F.binary_cross_entropy_with_logits, mean reduction
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    def loss(self, params, state, batch, rng, *, train: bool):
        logits, probs, new_state = self.forward(
            params, state, batch["images"], train=train, rng=rng
        )
        loss = self._bce(logits, batch["road"])
        return loss, (new_state, {})

    def val_metrics(self, params, state, batch, rng):
        logits, probs, _ = self.forward(params, state, batch["images"], train=False, rng=rng)
        target = batch["road"]
        loss = self._bce(logits, target)
        scored = logits if self.ts_on_logits else probs
        return {
            "val_loss": loss,
            "val_ts": ts_road_map(target, scored),
            "val_ts_rounded": ts_road_map(target, jnp.round(scored)),
        }


class RoadMapBCEv2(RoadMapBCE):
    """Registry default 'roadmap_bce' (/root/reference/src/submit.py:22):
    TS on sigmoid output, plateau LR schedule, tunable unfreeze epoch
    (roadmap_bce_v2.py:139-140,154-157,211)."""

    name = "roadmap_bce"
    ts_on_logits = False
    unfreeze_default = 0  # CLI default (roadmap_bce_v2.py:211)

    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import tune

        RoadMapBase.add_model_specific_args(parser)
        # the v2 grid dimension (roadmap_bce_v2.py:211, opt_list tunable)
        tune(parser, "unfreeze_epoch_no", [0, 20])
        return parser

    def lr_schedule(self):
        return {"plateau_patience": 10, "factor": 0.1}
