"""Uniform --precision handling for every task in the zoo.

One mixin decides compute dtype (and the int8 trunk path) for all models —
the reference exposes Lightning's --precision flag on every entry point
(SURVEY.md §5.6); here 32 -> f32, 16 -> bf16 activations, 8 -> bf16 + the
conv trunk in static-scale int8 at inference (ops/quant.py).
"""
from __future__ import annotations

import jax

from driving_dirty_tpu.train.task import hp


class Int8TrunkMixin:
    """Shared precision plumbing for every task (--precision {32,16,8}).

    ONE code path decides compute dtype for the whole zoo (the reference's
    Lightning `--precision` flag, SURVEY.md §5.6): 32 -> float32; 16 -> bf16
    activations (params stay f32); 8 -> bf16 activations + the conv trunk
    quantized to int8 at inference WHEN static scales have been calibrated.

    Subclasses pass `**self.enc_int8_kwargs(train)` to encoder.apply and call
    `calibrate_int8_on(encoder_params, sample_input)` eagerly (before any
    jit trace) — static scales are what make int8 a win (+35% trunk). If
    precision 8 runs without calibration, the trunk falls back to bf16 (with
    a one-time warning) rather than to dynamic-absmax int8, which measures
    SLOWER than bf16 end-to-end (1590 vs 2859 scenes/s; quant.py header) —
    the flag must never silently regress a model."""

    _int8_scales = None
    _warned_uncalibrated = False

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if hp(self.hparams, "precision", 32) in (16, 8) else jnp.float32

    @property
    def int8_trunk(self) -> bool:
        return hp(self.hparams, "precision", 32) == 8

    def calibrate_int8_on(self, encoder_params, x) -> None:
        if not self.int8_trunk or self._int8_scales is not None:
            return
        if isinstance(x, jax.core.Tracer) or any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(encoder_params)[:1]
        ):
            # Called under a jit trace (e.g. a jitted predict): calibration
            # needs concrete values, so leave scales unset — the quant path
            # falls back to dynamic absmax (correct, slower). Call
            # calibrate_int8 eagerly before tracing to get static scales.
            return
        from driving_dirty_tpu.ops import quant

        self._int8_scales = quant.calibrate_trunk(encoder_params, x)

    def enc_int8_kwargs(self, train: bool) -> dict:
        use = self.int8_trunk and not train
        if use and self._int8_scales is None:
            # Uncalibrated: run the trunk in bf16 instead of dynamic-absmax
            # int8 (measured slower than bf16 — the scalar reductions
            # serialize the convs). Calibrate eagerly (predict()/run_test do)
            # to get the real int8 path.
            if not type(self)._warned_uncalibrated:
                type(self)._warned_uncalibrated = True
                print(
                    f"[{getattr(self, 'name', 'task')}] --precision 8 without "
                    "calibrated scales: trunk runs bf16 (call calibrate_int8 "
                    "eagerly for static-scale int8)"
                )
            use = False
        return {
            "int8": use,
            "int8_scales": self._int8_scales,
        }
