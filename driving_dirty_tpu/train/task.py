"""The task-module protocol (the framework's answer to LightningModule).

The reference duplicates ~60% of every task file across 9 modules
(SURVEY.md §1); here the shared machinery lives in train.Trainer and each task
implements this small protocol. A Task owns its architecture + data; the
Trainer owns the compiled step functions, optimization, checkpointing,
logging, and the device mesh.

All tensor-returning methods must be pure and jit-traceable; the Trainer jits
them once per (freeze-mask, train/eval) combination.
"""
from __future__ import annotations

from types import SimpleNamespace
from typing import Any


def hp(hparams, name, default):
    """Hparam with attribute-default fallback, reproducing the reference's
    `__check_hparams` pattern (/root/reference/src/autoencoder/autoencoder.py:32-43)."""
    if hparams is None:
        return default
    if isinstance(hparams, dict):
        return hparams.get(name, default)
    return getattr(hparams, name, default)


def hp_opt(hparams, name, default):
    """Like `hp` but treats a stored None as absent — for flags whose
    argparse default is None so each task can pick its own default."""
    v = hp(hparams, name, None)
    return default if v is None else v


def as_namespace(hparams) -> SimpleNamespace:
    if hparams is None:
        return SimpleNamespace()
    if isinstance(hparams, SimpleNamespace):
        return hparams
    if isinstance(hparams, dict):
        return SimpleNamespace(**hparams)
    return SimpleNamespace(**vars(hparams))


class Task:
    """Protocol; subclass and override. See models/ for implementations."""

    #: name used for checkpoints/logs and the submit.py registry
    name: str = "task"

    def __init__(self, hparams=None):
        self.hparams = as_namespace(hparams)

    # --- model -----------------------------------------------------------
    def init(self, rng) -> tuple[Any, Any]:
        """-> (params, state) pytrees."""
        raise NotImplementedError

    def loss(self, params, state, batch, rng, *, train: bool):
        """-> (loss_scalar, (new_state, metrics_dict)). Pure/traceable."""
        raise NotImplementedError

    def val_metrics(self, params, state, batch, rng):
        """-> metrics dict including 'val_loss'. Default: eval-mode loss."""
        loss, (_, metrics) = self.loss(params, state, batch, rng, train=False)
        out = {"val_loss": loss}
        out.update({f"val_{k}": v for k, v in metrics.items() if k != "loss"})
        return out

    # --- optimization ----------------------------------------------------
    def learning_rate(self) -> float:
        return hp(self.hparams, "learning_rate", 1e-3)

    def optimizer_name(self) -> str:
        return "adam"

    def lr_schedule(self):
        """None, or dict(plateau_patience=int, factor=float) for
        ReduceLROnPlateau-style host-side scheduling
        (/root/reference/src/roadmap_model/roadmap_bce_v2.py:156)."""
        return None

    def freeze_mask(self, params, epoch: int):
        """Pytree of bools (True = trainable) for staged fine-tuning, or None.
        Replaces the reference's ae.freeze()/unfreeze() mutation
        (/root/reference/src/roadmap_model/roadmap_bce_v2.py:127-129) with
        optimizer masking."""
        return None

    # --- data ------------------------------------------------------------
    def train_loader(self):
        raise NotImplementedError

    def val_loader(self):
        raise NotImplementedError

    # --- logging ---------------------------------------------------------
    def log_images(self, params, state, batch, rng, step_name: str):
        """Optional: return dict name -> [H, W, C] float images for the image
        logger (reference: _log_images / _log_rm_images)."""
        return {}
