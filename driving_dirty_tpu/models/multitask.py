"""Joint multi-task model: shared SSL encoder -> roadmap + box-occupancy heads.

BASELINE.json config 5 ("Joint multi-task (roadmap + boxes) with batched
6-view prefetch across a v5e-8 slice"). The reference trains its roadmap and
box models separately over the same frozen encoder (SURVEY.md §2.4/§2.6);
this task trains both heads in ONE compiled step over one shared backbone —
the encoder's full latent path feeds the roadmap head, its c3 feature tap
feeds the spatial box pipeline — so the expensive stitched-panorama encoding
is paid once per batch.

Scaling: data-parallel over the mesh's 'data' axis with the roadmap head's
latent->640000 matmul sharded over 'model' (param_sharding_rules), i.e. the
intended v5e-8 layout is Mesh(4, 2).

    python -m driving_dirty_tpu.cli.multitask --link <data> \
        --pretrained_path <ae.ckpt> --gpus 8 --model_parallel 2
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from driving_dirty_tpu.core import layers as L
from driving_dirty_tpu.metrics.threat import ts_road_map
from driving_dirty_tpu.models.labeled_data import LabeledDataMixin, add_labeled_data_args
from driving_dirty_tpu.models.pretrained import Int8TrunkMixin, init_backbone, load_pretrained_ae
from driving_dirty_tpu.models.spatial_bb import _bce_probs
from driving_dirty_tpu.nn.spatial import BoxesMergingCNN, SpatialMappingCNN
from driving_dirty_tpu.ops.maps import boxes_to_binary_map
from driving_dirty_tpu.ops.stitch import normalize_images, wide_stitch
from driving_dirty_tpu.train.task import Task, hp, hp_opt


class MultiTask(Int8TrunkMixin, LabeledDataMixin, Task):
    name = "multitask"

    def __init__(self, hparams=None):
        super().__init__(hparams)
        h = self.hparams
        self.batch_size = hp(h, "batch_size", 16)
        self.box_loss_weight = hp(h, "box_loss_weight", 1.0)
        self.unfreeze_epoch_no = hp(h, "unfreeze_epoch_no", 20) or 20
        self.ae, self._ae_params, self._ae_state = load_pretrained_ae(h)
        self.latent_dim = self.ae.latent_dim
        self.rm_head = L.Linear(self.latent_dim, 800 * 800)
        # see models/spatial_bb.py: "small" = same network, reduced geometry
        # (dryrun/sharding tests); the roadmap head stays 800x800 regardless.
        self.geometry = hp(h, "spatial_geometry", "reference")
        self.space_map_cnn = SpatialMappingCNN(geometry=self.geometry)
        self.box_merge = BoxesMergingCNN(geometry=self.geometry)
        self.raster_size = self.box_merge.raster_size

    # --- model -----------------------------------------------------------
    def init(self, rng):
        k_bb, k_rm, k_sp, k_mg = jax.random.split(rng, 4)
        bb_p, bb_s = init_backbone(self.ae, self._ae_params, self._ae_state, k_bb)
        sp_p, _ = self.space_map_cnn.init(k_sp)
        mg_p, _ = self.box_merge.init(k_mg)
        return (
            {
                "encoder": bb_p["encoder"],
                "rm_head": self.rm_head.init(k_rm),
                "space_map_cnn": sp_p,
                "box_merge": mg_p,
            },
            {"encoder": bb_s["encoder"]},
        )

    def forward(self, params, state, images, *, train: bool, rng):
        """-> (rm_logits [b,800,800], box_probs [b,800,800], new_state).

        One encoder pass: conv trunk once, then both the c3 tap (boxes) and
        the latent path (roadmap) reuse it.
        """
        images = normalize_images(images, self.compute_dtype)
        pano = wide_stitch(images)
        fast = (not train) and hp(self.hparams, "fast_conv", False)
        enc_apply = lambda p, s, v: self.ae.encoder.apply(
            p, s, v, train=train, rng=rng, with_c3=True, fast=fast,
            **self.enc_int8_kwargs(train),
        )
        if train and hp_opt(self.hparams, "remat", True):
            enc_apply = jax.checkpoint(enc_apply)
        (z, ssr), new_enc_state = enc_apply(params["encoder"], state["encoder"], pano)
        rm_logits = self.rm_head.apply(params["rm_head"], z).reshape(z.shape[0], 800, 800)
        rm_logits = rm_logits.astype(jnp.float32)

        # merge head runs in compute_dtype (bf16 under --precision 16) like
        # spatial_bb's; only the probabilities are promoted for the f32 loss
        spatial, _ = self.space_map_cnn.apply(params["space_map_cnn"], {}, images)
        box_probs, _ = self.box_merge.apply(params["box_merge"], {}, ssr, spatial)
        return rm_logits, box_probs[..., 0].astype(jnp.float32), {"encoder": new_enc_state}

    def calibrate_int8(self, params, state, images):
        """One-time int8 activation-scale calibration (precision 8 only);
        trunk input is the stitched panorama (models/roadmap.py:82-93)."""
        if not self.int8_trunk or self._int8_scales is not None:
            return
        x = wide_stitch(normalize_images(jnp.asarray(images), self.compute_dtype))
        self.calibrate_int8_on(params["encoder"], x)

    def predict(self, params, state, images, rng=None):
        """Inference entry: -> {road_mask [b,800,800] binary,
        box_occupancy [b,800,800] probabilities} from one shared encoder
        pass. Road mask thresholds logits at 0 (== sigmoid > 0.5, the
        roadmap predict convention); box occupancy stays probabilities
        (in-graph sigmoid, caller picks the operating point)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.calibrate_int8(params, state, images)
        rm_logits, box_probs, _ = self.forward(
            params, state, images, train=False, rng=rng
        )
        return {
            "road_mask": (rm_logits > 0.0).astype(jnp.float32),
            "box_occupancy": box_probs,
        }

    def _box_targets(self, batch):
        if self.raster_size == 800 and jax.default_backend() in ("tpu", "axon"):
            from driving_dirty_tpu.pallas.raster import batched_boxes_to_binary_map

            return batched_boxes_to_binary_map(batch["boxes"], batch["box_valid"])
        return jax.vmap(
            lambda b, v: boxes_to_binary_map(b, v, size=self.raster_size)
        )(batch["boxes"], batch["box_valid"])

    def loss(self, params, state, batch, rng, *, train: bool):
        rm_logits, box_probs, new_state = self.forward(
            params, state, batch["images"], train=train, rng=rng
        )
        rm_t = batch["road"]
        rm_loss = jnp.mean(
            jnp.maximum(rm_logits, 0) - rm_logits * rm_t + jnp.log1p(jnp.exp(-jnp.abs(rm_logits)))
        )
        box_loss = _bce_probs(box_probs, self._box_targets(batch))
        total = rm_loss + self.box_loss_weight * box_loss
        return total, (new_state, {"rm_loss": rm_loss, "box_loss": box_loss})

    def val_metrics(self, params, state, batch, rng):
        rm_logits, box_probs, _ = self.forward(params, state, batch["images"], train=False, rng=rng)
        rm_t = batch["road"]
        rm_loss = jnp.mean(
            jnp.maximum(rm_logits, 0) - rm_logits * rm_t + jnp.log1p(jnp.exp(-jnp.abs(rm_logits)))
        )
        box_t = self._box_targets(batch)
        box_loss = _bce_probs(box_probs, box_t)
        return {
            "val_loss": rm_loss + self.box_loss_weight * box_loss,
            "val_rm_ts_rounded": ts_road_map(rm_t, (rm_logits > 0).astype(jnp.float32)),
            "val_box_loss": box_loss,
            "val_ts_boxes": ts_road_map(box_t, jnp.round(box_probs)),
        }

    # --- optimization ----------------------------------------------------
    def freeze_mask(self, params, epoch: int):
        if epoch >= self.unfreeze_epoch_no:
            return None
        enc_frozen = jax.tree.map(lambda _: False, params["encoder"])
        rest = {k: jax.tree.map(lambda _: True, v) for k, v in params.items() if k != "encoder"}
        return {"encoder": enc_frozen, **rest}

    def param_sharding_rules(self, path, leaf):
        if path[:2] == ("rm_head", "w"):
            return P(None, "model")
        if path[:2] == ("rm_head", "b"):
            return P("model")
        if path[:4] == ("encoder", "fc1", "fc", "w"):
            return P("model", None)
        return None

    # --- CLI -------------------------------------------------------------
    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import opt_list

        opt_list(parser, "--learning_rate", type=float, default=1e-3,
                 options=[1e-3, 1e-4], tunable=True)
        parser.add_argument("--batch_size", type=int, default=16)
        parser.add_argument("--unfreeze_epoch_no", type=int, default=20)
        opt_list(parser, "--box_loss_weight", type=float, default=1.0,
                 options=[0.5, 1.0, 2.0], tunable=True)
        parser.add_argument("--max_bb", type=int, default=100)
        add_labeled_data_args(parser)
        return parser
