"""Coordinate-regression MLP box task ("Boxes").

Re-design of /root/reference/src/bounding_box_model/bb_coord_reg/bb_MLP.py
(SURVEY.md §2.5): frozen AE encoder latent -> Linear(latent, max_bb*8/2) +
ReLU -> Linear(-> max_bb*8) reshaped [b, max_bb, 2, 4]; target = zero-padded
box coordinates; elementwise MSE over the padded tensor (reference behavior —
padding rows are regressed toward zero; that *is* the training signal the
reference model sees, bb_MLP.py:135).

Fixed relative to the reference: padding uses the actual batch size, not
hparams.batch_size (the reference breaks on the final partial batch,
bb_MLP.py:69); our loaders deliver fixed-shape padded boxes already.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core import layers as L
from driving_dirty_tpu.models.labeled_data import LabeledDataMixin, add_labeled_data_args
from driving_dirty_tpu.models.pretrained import Int8TrunkMixin, init_backbone, load_pretrained_ae
from driving_dirty_tpu.ops.stitch import normalize_images, wide_stitch
from driving_dirty_tpu.train.task import Task, hp


class Boxes(Int8TrunkMixin, LabeledDataMixin, Task):
    name = "bb_mlp"

    def __init__(self, hparams=None):
        super().__init__(hparams)
        h = self.hparams
        self.batch_size = hp(h, "batch_size", 16)
        self.max_bb = hp(h, "max_bb", 100)
        self.unfreeze_epoch_no = hp(h, "unfreeze_epoch_no", 20) or 20
        self.ae, self._ae_params, self._ae_state = load_pretrained_ae(h)
        self.output_dim = self.max_bb * 8
        self.fc1 = L.Linear(self.ae.latent_dim, self.output_dim // 2)
        self.fc2 = L.Linear(self.output_dim // 2, self.output_dim)

    def init(self, rng):
        k_bb, k1, k2 = jax.random.split(rng, 3)
        bb_p, bb_s = init_backbone(self.ae, self._ae_params, self._ae_state, k_bb)
        return (
            {"encoder": bb_p["encoder"], "fc1": self.fc1.init(k1), "fc2": self.fc2.init(k2)},
            {"encoder": bb_s["encoder"]},
        )

    def forward(self, params, state, images, *, train: bool, rng):
        pano = wide_stitch(normalize_images(images, self.compute_dtype))
        z, se = self.ae.encoder.apply(
            params["encoder"], state["encoder"], pano, train=train, rng=rng,
            fast=(not train) and hp(self.hparams, "fast_conv", False),
            **self.enc_int8_kwargs(train),
        )
        y = jax.nn.relu(self.fc1.apply(params["fc1"], z))
        y = self.fc2.apply(params["fc2"], y).astype(jnp.float32)  # loss in f32
        return y.reshape(y.shape[0], self.max_bb, 2, 4), {"encoder": se}

    def loss(self, params, state, batch, rng, *, train: bool):
        pred, new_state = self.forward(params, state, batch["images"], train=train, rng=rng)
        target = batch["boxes"]  # already zero-padded [b, max_bb, 2, 4]
        loss = jnp.mean((target - pred) ** 2)
        return loss, (new_state, {})

    def freeze_mask(self, params, epoch: int):
        if epoch >= self.unfreeze_epoch_no:
            return None
        enc_frozen = jax.tree.map(lambda _: False, params["encoder"])
        rest = {k: jax.tree.map(lambda _: True, v) for k, v in params.items() if k != "encoder"}
        return {"encoder": enc_frozen, **rest}

    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import opt_list

        opt_list(parser, "--learning_rate", type=float, default=1e-3,
                 options=[1e-3, 1e-4, 1e-5], tunable=True)
        parser.add_argument("--batch_size", type=int, default=16)
        parser.add_argument("--max_bb", type=int, default=100)
        parser.add_argument("--unfreeze_epoch_no", type=int, default=20)
        add_labeled_data_args(parser)
        return parser
