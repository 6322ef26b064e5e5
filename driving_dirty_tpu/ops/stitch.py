"""View stitching and the six-to-one self-supervised mask task.

TPU-native reimplementation of the reference's panorama stitching
(/root/reference/src/autoencoder/autoencoder.py:53-73 and the
`wide_stitch_six_images` copies in every task module, e.g.
/root/reference/src/roadmap_model/roadmap_bce_v2.py:53-64).

All functions are pure, fixed-shape, and jit/vmap-safe. Camera order on input
matches the dataset order FL, F, FR, BL, B, BR
(/root/reference/src/utils/data_helper.py:16-23); the panorama order is
FL, F, FR, BR, B, BL (index permutation [0,1,2,5,4,3]).

Layout: images are NHWC ([..., H, W, C]); views axis precedes H.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PANORAMA_ORDER = (0, 1, 2, 5, 4, 3)
VIEW_W = 306
NUM_VIEWS = 6


def normalize_images(x, dtype=None):
    """Device-side image normalization for the uint8 input pipeline.

    The loaders ship camera images as raw uint8 (4x fewer host->HBM bytes
    and no host-side float conversion than the torchvision `to_tensor`
    float path, data_helper.py:66); the /255 happens here, on device, fused
    into the first conv's input. Float inputs pass through (legacy float
    pipeline / tests)."""
    import jax.numpy as jnp

    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(dtype or jnp.float32) * (1.0 / 255.0)
    elif dtype is not None:
        x = x.astype(dtype)
    return x


def wide_stitch(x):
    """[b, 6, H, W, C] -> [b, H, 6*W, C] panorama in FL,F,FR,BR,B,BL order.

    The reference does permute+reshape on NCHW
    (/root/reference/src/autoencoder/autoencoder.py:55-57); here the same
    result is a transpose putting the view axis adjacent to W, which XLA fuses
    into the consumer conv's input indexing (no materialized copy on TPU).
    """
    x = x[:, jnp.array(PANORAMA_ORDER)]
    b, v, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b, h, v * w, c)


def six_to_one_task(x, key, view_width: int = VIEW_W, num_maskable: int = 5):
    """SSL pretext task: stitch six views wide, black out one view-column,
    return (masked panorama, ground-truth column).

    Matches /root/reference/src/autoencoder/autoencoder.py:53-73 including the
    reference quirk that `np.random.randint(0, 5)` has an *exclusive* upper
    bound, so panorama position 5 (original CAM_BACK_LEFT) is never the masked
    target. Pass num_maskable=6 to fix that; default preserves parity.

    Unlike the reference (host-side numpy randint per step), the mask index is
    drawn from the traced JAX key so the whole step stays inside one XLA
    program: the mask is applied with a width-indexed `jnp.where`, and the
    target column is extracted with a dynamic slice. Both are fixed-shape.
    """
    pano = wide_stitch(x)
    b, h, w, c = pano.shape
    idx = jax.random.randint(key, (), 0, num_maskable)
    start = idx * view_width
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    keep = (col < start) | (col >= start + view_width)
    x_masked = jnp.where(keep, pano, jnp.zeros_like(pano))
    y = jax.lax.dynamic_slice_in_dim(pano, start, view_width, axis=2)
    return x_masked, y


def unstitch(pano, view_width: int = VIEW_W):
    """Inverse of wide_stitch (panorama order -> [b, 6, H, W, C] dataset order)."""
    b, h, w, c = pano.shape
    v = w // view_width
    x = pano.reshape(b, h, v, view_width, c).transpose(0, 2, 1, 3, 4)
    inv = [0] * NUM_VIEWS
    for i, p in enumerate(PANORAMA_ORDER):
        inv[p] = i
    return x[:, jnp.array(inv)]
