"""Parity for the experimental fused RoIAlign Pallas kernel (interpret mode).

The kernel measured ~XLA parity on the TPU (see pallas/roialign.py header
for the negative-result analysis) and is NOT on a production path, but it
stays parity-tested so the experiment and its Mosaic-constraint notes remain
trustworthy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driving_dirty_tpu.ops import detection as det
import driving_dirty_tpu.pallas.roialign as pr


@pytest.fixture()
def interpret_kernel(monkeypatch):
    orig = pr.roi_align_fused
    monkeypatch.setattr(
        pr, "roi_align_fused",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


@pytest.mark.parametrize("r", [16, 33])  # multiple and non-multiple of ROI_BLOCK
def test_fused_matches_reference(interpret_kernel, r):
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 40, 40, 32
    feats = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    rois = np.stack([
        np.stack([rng.rand(r) * 30, rng.rand(r) * 30,
                  rng.rand(r) * 30 + 35, rng.rand(r) * 30 + 35], -1)
        for _ in range(b)
    ]).astype(np.float32)
    rois = jnp.asarray(rois)
    ref = det.batched_roi_align(feats, rois, output_size=7,
                                spatial_scale=0.5, sampling_ratio=2)
    out = det.batched_roi_align_fused(feats, rois, output_size=7,
                                      spatial_scale=0.5, sampling_ratio=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
