"""BasicAE: self-supervised six-to-one infill pretraining task.

Task-module re-design of /root/reference/src/autoencoder/autoencoder.py
(class BasicAE): stitch the six camera views into a 3x256x1836 panorama,
black out one 306-wide view column, and reconstruct it through
Encoder -> latent -> Decoder with MSE loss.

Differences by design (TPU-first):
  * the mask index is drawn on-device from the step RNG so the whole train
    step is one compiled XLA program (reference draws host-side numpy per
    step, autoencoder.py:60);
  * hparams keep the reference's dual defaults: constructor fallbacks
    hidden=128/latent=128 (autoencoder.py:32-43) vs CLI defaults hidden=256
    (autoencoder.py:164);
  * the never-mask-position-5 quirk is preserved (SURVEY.md §2.3) and
    controllable via `mask_all_six`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from driving_dirty_tpu.data.dataset import (
    NUM_SAMPLE_PER_SCENE,
    UNLABELED_SCENES,
    UnlabeledDataset,
    scene_split,
)
from driving_dirty_tpu.data.pipeline import Loader
from driving_dirty_tpu.nn.autoencoder import Decoder, Encoder
from driving_dirty_tpu.ops.stitch import normalize_images, six_to_one_task
from driving_dirty_tpu.models.precision import Int8TrunkMixin
from driving_dirty_tpu.train.task import Task, hp, hp_opt


class BasicAE(Int8TrunkMixin, Task):
    name = "basic_ae"

    def __init__(self, hparams=None):
        super().__init__(hparams)
        h = self.hparams
        self.hidden_dim = hp(h, "hidden_dim", 128)
        self.latent_dim = hp(h, "latent_dim", 128)
        self.input_width = hp(h, "input_width", 306 * 6)
        self.input_height = hp(h, "input_height", 256)
        self.output_width = hp(h, "output_width", 306)
        self.output_height = hp(h, "output_height", 256)
        self.batch_size = hp(h, "batch_size", 16)
        self.in_channels = hp(h, "in_channels", 3)
        self.mask_all_six = hp(h, "mask_all_six", False)
        # compute dtype comes from Int8TrunkMixin (precision {32,16,8})
        self.encoder = Encoder(
            self.hidden_dim, self.latent_dim, self.in_channels, self.input_height, self.input_width
        )
        self.decoder = Decoder(
            self.hidden_dim, self.latent_dim, self.in_channels, self.output_height, self.output_width
        )

    # --- model -----------------------------------------------------------
    def init(self, rng):
        ke, kd = jax.random.split(rng)
        pe, se = self.encoder.init(ke)
        pd, sd = self.decoder.init(kd)
        return {"encoder": pe, "decoder": pd}, {"encoder": se, "decoder": sd}

    def forward(self, params, state, x, *, train: bool, rng):
        """Full pretext forward: [b, 6, H, W, C] -> (y_hat, y, new_state).

        Training remats the encoder (jax.checkpoint): XLA stores the wide
        panorama conv activations in a heavily lane-padded layout (C=32 <
        128), so keeping c1/c2 outputs for backward costs ~4x their logical
        7GB at batch 32 — recomputing them is far cheaper than the HBM.
        """
        k_mask, k_enc, k_dec = jax.random.split(rng, 3)
        x = normalize_images(x, self.compute_dtype)
        x_masked, y = six_to_one_task(
            x, k_mask, num_maskable=6 if self.mask_all_six else 5
        )
        fast = (not train) and hp(self.hparams, "fast_conv", False)
        enc_apply = lambda p, s, v: self.encoder.apply(
            p, s, v, train=train, rng=k_enc, fast=fast,
            **self.enc_int8_kwargs(train),
        )
        if train and hp_opt(self.hparams, "remat", True):
            enc_apply = jax.checkpoint(enc_apply)
        z, se = enc_apply(params["encoder"], state["encoder"], x_masked)
        y_hat, sd = self.decoder.apply(
            params["decoder"], state["decoder"], z, train=train, rng=k_dec
        )
        return y_hat, y, {"encoder": se, "decoder": sd}

    def loss(self, params, state, batch, rng, *, train: bool):
        x = batch if not isinstance(batch, dict) else batch["images"]
        y_hat, y, new_state = self.forward(params, state, x, train=train, rng=rng)
        loss = jnp.mean((y.astype(jnp.float32) - y_hat.astype(jnp.float32)) ** 2)  # F.mse_loss (autoencoder.py:91)
        return loss, (new_state, {})

    # --- data ------------------------------------------------------------
    def _datasets(self):
        link = hp(self.hparams, "link", None)
        sps = hp(self.hparams, "samples_per_scene", NUM_SAMPLE_PER_SCENE)
        n_scenes = hp(self.hparams, "num_unlabeled_scenes", len(UNLABELED_SCENES))
        train_idx, val_idx = scene_split(
            UNLABELED_SCENES[:n_scenes], seed=hp(self.hparams, "seed", 20200505)
        )
        cache_dir = hp(self.hparams, "cache_dir", None)

        def mk(idx):
            ds = UnlabeledDataset(
                link, idx, "sample", samples_per_scene=sps,
                raw_uint8=bool(hp(self.hparams, "uint8_pipeline", True)),
            )
            if cache_dir:
                from driving_dirty_tpu.data.cache import SampleCache

                ds = SampleCache(ds, cache_dir)
            return ds

        return mk(train_idx), mk(val_idx)

    def _num_workers(self):
        import os

        # adaptive decode pool (see LabeledDataMixin._num_workers)
        return (hp(self.hparams, "num_workers", None)
                or min(48, 4 * (os.cpu_count() or 4)))

    def train_loader(self):
        tr, _ = self._datasets()
        return Loader(tr, self.batch_size, shuffle=True,
                      num_workers=self._num_workers(), drop_last=True)

    def val_loader(self):
        _, va = self._datasets()
        return Loader(va, self.batch_size, shuffle=False,
                      num_workers=self._num_workers())

    # --- logging ---------------------------------------------------------
    def log_images(self, params, state, batch, rng, step_name):
        x = batch if not isinstance(batch, dict) else batch["images"]
        y_hat, y, _ = self.forward(params, state, x[:1], train=False, rng=rng)
        return {
            f"{step_name}_predicted_images": jnp.clip(y_hat[0], 0, 1),
            f"{step_name}_target_images": y[0],
        }

    # --- CLI -------------------------------------------------------------
    @staticmethod
    def add_model_specific_args(parser):
        from driving_dirty_tpu.cli.hyperopt import opt_list

        # Flags and defaults per autoencoder.py:161-182 (CLI defaults differ
        # from constructor fallbacks on hidden_dim: 256 vs 128). Tunable
        # grid dimensions declared inline, test-tube opt_list style
        # (autoencoder.py:163-170); plain parsers just get the argument.
        parser.add_argument("--hidden_dim", type=int, default=256)
        opt_list(parser, "--latent_dim", type=int, default=128,
                 options=[64, 128], tunable=True)
        opt_list(parser, "--learning_rate", type=float, default=1e-3,
                 options=[1e-3, 1e-4, 1e-5], tunable=True)
        parser.add_argument("--batch_size", type=int, default=16)
        parser.add_argument("--input_width", type=int, default=306 * 6)
        parser.add_argument("--input_height", type=int, default=256)
        parser.add_argument("--output_width", type=int, default=306)
        parser.add_argument("--output_height", type=int, default=256)
        parser.add_argument("--in_channels", type=int, default=3)
        parser.add_argument("--link", type=str, default="/scratch/ab8690/DLSP20Dataset/data")
        parser.add_argument("--output_img_freq", type=int, default=500)
        parser.add_argument("--samples_per_scene", type=int, default=NUM_SAMPLE_PER_SCENE)
        parser.add_argument("--num_unlabeled_scenes", type=int, default=len(UNLABELED_SCENES))
        parser.add_argument("--cache_dir", type=str, default=None,
                            help="decode-once sample cache directory (data/cache.py)")
        return parser
