"""Loading a pretrained BasicAE backbone from a checkpoint.

Mirrors `BasicAE.load_from_checkpoint(pretrained_path)` as used by every
downstream model (/root/reference/src/roadmap_model/roadmap_bce_v2.py:43,
bb_fast_rcnn.py:51, spatial_model.py:43, ...): the checkpoint's embedded
hparams rebuild the encoder/decoder descriptors, the weights come along, and
the caller decides what to freeze (via Task.freeze_mask) and whether to keep
the decoder.

When `pretrained_path` is None (tests / from-scratch runs), a randomly
initialized AE with the caller-supplied dims is used instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from driving_dirty_tpu.checkpoints import io as ckpt_io
from driving_dirty_tpu.models.precision import Int8TrunkMixin  # noqa: F401  (re-export; tasks import it from here)
from driving_dirty_tpu.models.basic_ae import BasicAE
from driving_dirty_tpu.train.task import hp


def load_pretrained_ae(hparams, *, need_decoder: bool = False):
    """-> (BasicAE task object, params dict or None, state dict or None).

    params/state are None when no checkpoint is given; the caller should then
    init the returned descriptors fresh.
    """
    path = hp(hparams, "pretrained_path", None)
    if path:
        blob = ckpt_io.load(path)
        ae = BasicAE(blob["hparams"])
        params = jax.tree.map(jnp.asarray, blob["params"])
        state = jax.tree.map(jnp.asarray, blob["state"]) if blob.get("state") is not None else None
        if not need_decoder:
            params = {"encoder": params["encoder"]}
            state = {"encoder": state["encoder"]} if state else None
        return ae, params, state
    ae = BasicAE(
        dict(
            hidden_dim=hp(hparams, "ae_hidden_dim", 128),
            latent_dim=hp(hparams, "ae_latent_dim", 64),
            input_height=hp(hparams, "ae_input_height", 256),
            input_width=hp(hparams, "ae_input_width", 306 * 6),
            batch_size=hp(hparams, "batch_size", 16),
        )
    )
    return ae, None, None


_C3_KEYS = ("c1", "c2", "c3")


def init_backbone(ae, params, state, rng, *, need_decoder: bool = False,
                  c3_only: bool = False):
    """Materialize encoder (and optionally decoder) params/state, from the
    checkpoint when available, otherwise fresh.

    c3_only=True keeps ONLY the conv-trunk params (c1/c2/c3) and drops the
    encoder's dense latent path: the detection/spatial backbones tap the c3
    feature map and never evaluate fc1/fc2/fc_z_out, yet carrying them
    costs 120M dead parameters — 1.4 GB of HBM across param + Adam moments
    and ~2.9 GB of optimizer-update traffic PER STEP once the encoder
    unfreezes (profiled 2026-08-20: the fc1 Adam fusion alone was 4.4
    ms/step of the batch-8 detection train step)."""
    if params is not None:
        out_p, out_s = params, state if state is not None else {}
        if c3_only:
            out_p = dict(out_p)
            out_p["encoder"] = {k: v for k, v in out_p["encoder"].items()
                                if k in _C3_KEYS}
            out_s = dict(out_s)
            out_s["encoder"] = {}
        return out_p, out_s
    ke, kd = jax.random.split(rng)
    pe, se = ae.encoder.init(ke)
    if c3_only:
        pe = {k: v for k, v in pe.items() if k in _C3_KEYS}
        se = {}
    out_p, out_s = {"encoder": pe}, {"encoder": se}
    if need_decoder:
        pd, sd = ae.decoder.init(kd)
        out_p["decoder"], out_s["decoder"] = pd, sd
    return out_p, out_s


