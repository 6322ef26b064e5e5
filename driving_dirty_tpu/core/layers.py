"""TPU-native functional NN layers.

Design notes
------------
This is the bottom layer (L0/L3 in SURVEY.md terms) of the framework: a small,
explicit, pytree-functional layer library. Unlike the reference (which leans on
`torch.nn.Module` mutation; see /root/reference/src/autoencoder/components.py),
every layer here is a *stateless descriptor*: `init(key)` returns a parameter
pytree, `apply(params, x, ...)` is a pure function. This makes every model
jit/pjit-compatible by construction and lets freeze/unfreeze be expressed as
optimizer masking rather than module mutation.

Layout: activations are NHWC (TPU-native; XLA tiles the trailing C dim onto
the 128-wide lane axis), weights are HWIO. The PyTorch reference is NCHW/OIHW;
the checkpoint importer (driving_dirty_tpu/checkpoints) does the transposes.

Numerical semantics deliberately match torch defaults so that imported
reference checkpoints reproduce outputs:
  * Conv2d / ConvTranspose2d shape arithmetic and cross-correlation convention
    (torch convs are cross-correlations; so is lax.conv_general_dilated).
  * BatchNorm: biased variance for normalization, unbiased for running stats,
    momentum 0.1, eps 1e-5.
  * Init: Kaiming-uniform(a=sqrt(5)) for weights, U(+-1/sqrt(fan_in)) bias.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch.nn.init.kaiming_uniform_(w, a=sqrt(5)) == U(-b, b),
    # b = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1 / fan_in).
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@dataclasses.dataclass(frozen=True)
class Linear:
    """y = x @ w + b, w: [in, out] (stored input-major so the matmul hits the
    MXU without a transpose)."""

    in_dim: int
    out_dim: int

    def init(self, key):
        kw, kb = jax.random.split(key)
        return {
            "w": _kaiming_uniform(kw, (self.in_dim, self.out_dim), self.in_dim),
            "b": _bias_uniform(kb, (self.out_dim,), self.in_dim),
        }

    def apply(self, p, x):
        # cast weights to the activation dtype so bf16 compute stays bf16 on
        # the MXU (params are stored f32; XLA hoists the cast out of the loop)
        return jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype) + p["b"].astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class Conv2d:
    """NHWC conv, weights HWIO. Matches torch.nn.Conv2d(in,out,k,stride,padding,
    dilation) shape semantics (/root/reference/src/autoencoder/components.py:19-21)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    use_bias: bool = True

    def init(self, key):
        kh, kw_ = _pair(self.kernel_size)
        fan_in = self.in_channels * kh * kw_
        kw, kb = jax.random.split(key)
        p = {"w": _kaiming_uniform(kw, (kh, kw_, self.in_channels, self.out_channels), fan_in)}
        if self.use_bias:
            p["b"] = _bias_uniform(kb, (self.out_channels,), fan_in)
        return p

    def apply(self, p, x):
        ph, pw = _pair(self.padding)
        y = lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["b"].astype(x.dtype)
        return y


@dataclasses.dataclass(frozen=True)
class ConvTranspose2d:
    """NHWC transposed conv matching torch.nn.ConvTranspose2d semantics:

        out = (in - 1) * stride - 2 * padding + dilation * (k - 1) + output_padding + 1

    Implemented as an input-dilated convolution with a flipped kernel
    (the gradient-of-conv construction), which XLA lowers to efficient MXU
    convolutions. Weight stored HWIO with I=in_channels, O=out_channels.
    Used by the decoder stack (/root/reference/src/autoencoder/components.py:70-73)
    and the merging CNNs (/root/reference/src/bounding_box_model/spatial_bb/components.py:87-93,129-139).
    """

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    output_padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    use_bias: bool = True

    def init(self, key):
        kh, kw_ = _pair(self.kernel_size)
        # torch ConvTranspose2d fan_in uses out_channels * k (weight shape [in, out, kh, kw]).
        fan_in = self.out_channels * kh * kw_
        kw, kb = jax.random.split(key)
        p = {"w": _kaiming_uniform(kw, (kh, kw_, self.in_channels, self.out_channels), fan_in)}
        if self.use_bias:
            p["b"] = _bias_uniform(kb, (self.out_channels,), fan_in)
        return p

    def apply(self, p, x):
        kh, kw_ = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        dh, dw = _pair(self.dilation)
        # Gradient-of-conv construction: spatially flip the taps; the stored
        # HWIO layout already contracts I=in_channels against x's channels.
        w = jnp.flip(p["w"], axis=(0, 1)).astype(x.dtype)
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=(
                (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph),
                (dw * (kw_ - 1) - pw, dw * (kw_ - 1) - pw + opw),
            ),
            lhs_dilation=(sh, sw),
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["b"].astype(x.dtype)
        return y


@dataclasses.dataclass(frozen=True)
class BatchNorm:
    """BatchNorm over the trailing feature axis (works for [N,C] and [N,H,W,C]).

    Matches torch.nn.BatchNorm1d defaults (eps=1e-5, momentum=0.1): training
    normalizes with biased batch variance and updates running stats with the
    unbiased estimate. State is threaded explicitly (TPU-idiomatic; no
    mutation), returned as the second output of `apply`.
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    def init(self, key):
        del key
        return {
            "scale": jnp.ones((self.num_features,), jnp.float32),
            "bias": jnp.zeros((self.num_features,), jnp.float32),
        }

    def init_state(self):
        return {
            "mean": jnp.zeros((self.num_features,), jnp.float32),
            "var": jnp.ones((self.num_features,), jnp.float32),
        }

    def apply(self, p, state, x, train: bool):
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.var(xf, axis=reduce_axes)
            n = x.size // x.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        inv = lax.rsqrt(var + self.eps) * p["scale"]
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + p["bias"].astype(x.dtype)
        return y, new_state


def dropout(key, x, rate: float, train: bool):
    """Inverted dropout. NOTE: the reference calls torch's functional
    `F.dropout(x, p)` whose `training` flag defaults to True, so the reference
    applies dropout even at eval time (/root/reference/src/autoencoder/components.py:108).
    That is a latent bug; here dropout is correctly gated on `train`."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def max_pool_flat(x, pool: int):
    """torch `F.max_pool1d(flat_vector, kernel_size=k)` over a flattened map
    (/root/reference/src/autoencoder/components.py:46-47): non-overlapping max
    over groups of `pool` consecutive elements of the *NCHW-order* flattening.
    Input here is the already-flattened [b, n] vector."""
    b, n = x.shape
    m = (n // pool) * pool
    return jnp.max(x[:, :m].reshape(b, n // pool, pool), axis=-1)
