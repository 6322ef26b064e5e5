"""Autoencoder components: DenseBlock, Encoder, Decoder.

TPU-native re-design of /root/reference/src/autoencoder/components.py.
Architecture (layer configs, derived dims, the flatten+max_pool1d(4) trick,
c3-only backbone tap) is preserved exactly so reference checkpoints import and
reproduce outputs; the *implementation* is NHWC pytree-functional:

  * init-time shape inference uses `jax.eval_shape` (zero FLOPs) instead of
    the reference's `torch.rand` dummy forwards (components.py:33-38, 75-83);
  * the flatten before pooling follows torch's NCHW contiguity (transpose to
    [b, C, H, W] first) so imported fc1 weights line up
    (SURVEY.md hard-part 2);
  * BatchNorm state and dropout RNG are threaded explicitly; freeze/unfreeze
    is the optimizer's job (masking), not the module's.

All `apply` functions have signature (variables, x, *, train, rng) ->
(out, new_state) where variables = {"params": ..., "state": ...}.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from driving_dirty_tpu.core import layers as L


def _split(key, n):
    return jax.random.split(key, n)


@dataclasses.dataclass(frozen=True)
class DenseBlock:
    """Linear -> BatchNorm -> ReLU -> Dropout(p=0.2)
    (/root/reference/src/autoencoder/components.py:96-109)."""

    in_dim: int
    out_dim: int
    drop_p: float = 0.2

    def init(self, key):
        k1, k2 = _split(key, 2)
        lin = L.Linear(self.in_dim, self.out_dim)
        bn = L.BatchNorm(self.out_dim)
        return (
            {"fc": lin.init(k1), "bn": bn.init(k2)},
            {"bn": bn.init_state()},
        )

    def apply(self, params, state, x, *, train: bool, rng):
        lin = L.Linear(self.in_dim, self.out_dim)
        bn = L.BatchNorm(self.out_dim)
        x = lin.apply(params["fc"], x)
        x, bn_state = bn.apply(params["bn"], state["bn"], x, train=train)
        x = jax.nn.relu(x)
        x = L.dropout(rng, x, self.drop_p, train=train)
        return x, {"bn": bn_state}


@dataclasses.dataclass(frozen=True)
class Encoder:
    """Conv(3->32,k3,p1) x2 + Conv(32->32,k3,s2,p1), then flatten (NCHW order)
    -> max-pool(4) over the flat vector -> DenseBlock x2 -> Linear(latent).

    Parity target: /root/reference/src/autoencoder/components.py:6-52.
    `c3_only=True` at call time returns the conv feature map (the backbone tap
    used by the detection/spatial models, e.g. bb_fast_rcnn.py:51-56).
    """

    hidden_dim: int
    latent_dim: int
    in_channels: int = 3
    input_height: int = 256
    input_width: int = 306 * 6
    pooling_size: int = 4
    # dropout probability of the two DenseBlocks (reference fixes 0.2,
    # components.py:103; configurable so deterministic A/B runs — e.g. the
    # torch training-dynamics parity test — can zero it on both sides)
    drop_p: float = 0.2

    def _convs(self):
        return (
            L.Conv2d(self.in_channels, 32, 3, 1, 1),
            L.Conv2d(32, 32, 3, 1, 1),
            L.Conv2d(32, 32, 3, 2, 1),
        )

    def conv_out_dim(self) -> int:
        """Flattened-and-pooled conv output size, via jax.eval_shape (replaces
        the reference's dummy forward, components.py:33-38)."""
        c1, c2, c3 = self._convs()

        def stack(x):
            p = {
                "w": jnp.zeros((3, 3, self.in_channels, 32)),
                "b": jnp.zeros((32,)),
            }
            p2 = {"w": jnp.zeros((3, 3, 32, 32)), "b": jnp.zeros((32,))}
            return c3.apply(p2, c2.apply(p2, c1.apply(p, x)))

        shape = jax.eval_shape(
            stack, jax.ShapeDtypeStruct((1, self.input_height, self.input_width, self.in_channels), jnp.float32)
        ).shape
        flat = shape[1] * shape[2] * shape[3]
        return flat // self.pooling_size

    def c3_shape(self):
        """(H', W') of the c3 feature map (stride-2 halving with p1)."""
        return ((self.input_height + 1) // 2, (self.input_width + 1) // 2)

    def init(self, key):
        c1, c2, c3 = self._convs()
        cod = self.conv_out_dim()
        fc1 = DenseBlock(cod, self.hidden_dim, self.drop_p)
        fc2 = DenseBlock(self.hidden_dim, self.hidden_dim, self.drop_p)
        fcz = L.Linear(self.hidden_dim, self.latent_dim)
        k = _split(key, 6)
        p_fc1, s_fc1 = fc1.init(k[3])
        p_fc2, s_fc2 = fc2.init(k[4])
        params = {
            "c1": c1.init(k[0]),
            "c2": c2.init(k[1]),
            "c3": c3.init(k[2]),
            "fc1": p_fc1,
            "fc2": p_fc2,
            "fc_z_out": fcz.init(k[5]),
        }
        state = {"fc1": s_fc1, "fc2": s_fc2}
        return params, state

    def _latent_head_fast(self, params, state, x, *, train: bool, rng):
        """Latent path without the NCHW transpose: pooling groups of the
        reference's flatten+max_pool1d(4) (components.py:46-47) are 4
        consecutive raster positions WITHIN one channel (the 128x918=117504
        element channel planes are divisible by 4), so the pool can run on
        the NHWC map; the NCHW row order of the fc1 weight is folded into a
        multi-axis dot_general contraction instead of shuffling the ~4GB
        activation through HBM. Same terms, reassociated sum."""
        b, hh, ww, cc = x.shape
        g = hh * ww // self.pooling_size
        p = jnp.max(x.reshape(b, g, self.pooling_size, cc), axis=2)  # [b, G, C]
        fc1 = params["fc1"]
        w = fc1["fc"]["w"].reshape(cc, g, self.hidden_dim).astype(p.dtype)
        z = jax.lax.dot_general(
            p, w, (((1, 2), (1, 0)), ((), ())), preferred_element_type=p.dtype
        ) + fc1["fc"]["b"].astype(p.dtype)
        r1, r2 = _split(rng, 2)
        bn = L.BatchNorm(self.hidden_dim)
        z, s1bn = bn.apply(fc1["bn"], state["fc1"]["bn"], z, train=train)
        z = L.dropout(r1, jax.nn.relu(z), self.drop_p, train=train)
        fc2 = DenseBlock(self.hidden_dim, self.hidden_dim, self.drop_p)
        z, s2 = fc2.apply(params["fc2"], state["fc2"], z, train=train, rng=r2)
        z = L.Linear(self.hidden_dim, self.latent_dim).apply(params["fc_z_out"], z)
        return z, {"fc1": {"bn": s1bn}, "fc2": s2}

    def apply(self, params, state, x, *, train: bool, rng, c3_only: bool = False,
              with_c3: bool = False, fast: bool = False, fast_head: bool = False,
              fused: bool | None = None, int8: bool = False,
              int8_scales=None):
        """-> (z, new_state); with c3_only -> (c3_map, state); with with_c3 ->
        ((z, c3_map), new_state) — one conv-trunk pass feeding both the latent
        path and the backbone tap (used by the joint multi-task model).

        fused routes the conv trunk through the fused Pallas TPU kernel
        (pallas/trunk.py: blocked 128-lane convs, VMEM-resident
        intermediates) — measured 10x SLOWER than the XLA convs on v5e (see
        that module's header for the bisection), so the default is OFF; it is
        kept as a parity-tested experiment. fast=True is the older XLA-level
        blocked space-to-depth rewrite (ops/fastconv.py; also measured
        slower).

        int8 quantizes the trunk convs (ops/quant.py): int8 MXU MACs run at
        2x the bf16 rate on v5e — measured +35% trunk-only; inference paths
        enable it via --precision 8."""
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if fused is None:
            fused = False
        if int8:
            from driving_dirty_tpu.ops.quant import encoder_convs_int8

            x = encoder_convs_int8(params, x, scales=int8_scales)
        elif fused and even:
            from driving_dirty_tpu.pallas.trunk import encoder_convs_fused

            x = encoder_convs_fused(params, x)
        elif fast and even:
            from driving_dirty_tpu.ops import fastconv

            x = fastconv.encoder_convs_blocked(params, x)
        else:
            c1, c2, c3 = self._convs()
            x = jax.nn.relu(c1.apply(params["c1"], x))
            x = jax.nn.relu(c2.apply(params["c2"], x))
            x = jax.nn.relu(c3.apply(params["c3"], x))
        if c3_only:
            return x, state
        c3_map = x
        if fast_head and (x.shape[1] * x.shape[2]) % self.pooling_size == 0:
            z, new_state = self._latent_head_fast(params, state, x, train=train, rng=rng)
            return ((z, c3_map), new_state) if with_c3 else (z, new_state)
        # torch flattens NCHW-contiguously (components.py:46); match it so the
        # imported fc1 weight ordering is identical.
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = L.max_pool_flat(x, self.pooling_size)
        r1, r2 = _split(rng, 2)
        cod = self.conv_out_dim()
        fc1 = DenseBlock(cod, self.hidden_dim, self.drop_p)
        fc2 = DenseBlock(self.hidden_dim, self.hidden_dim, self.drop_p)
        x, s1 = fc1.apply(params["fc1"], state["fc1"], x, train=train, rng=r1)
        x, s2 = fc2.apply(params["fc2"], state["fc2"], x, train=train, rng=r2)
        z = L.Linear(self.hidden_dim, self.latent_dim).apply(params["fc_z_out"], x)
        new_state = {"fc1": s1, "fc2": s2}
        if with_c3:
            return (z, c3_map), new_state
        return z, new_state


@dataclasses.dataclass(frozen=True)
class Decoder:
    """DenseBlock(latent->hidden) -> DenseBlock(hidden->64*h'*w') -> reshape ->
    ConvT(64->32,k3,p1) -> ConvT(32->32,k3,p1) -> ConvT(32->32,k2,s2) ->
    ConvT(32->C,k1); no final sigmoid.

    Parity target: /root/reference/src/autoencoder/components.py:55-93.
    (h', w') mirrors the reference's probe conv stack: k1s1 (same) -> k2s2
    (floor halve) -> k3p1 (same) -> k3p1 (same), i.e. (H//2, W//2).
    """

    hidden_dim: int
    latent_dim: int
    in_channels: int = 3
    output_height: int = 256
    output_width: int = 306
    drop_p: float = 0.2  # see Encoder.drop_p

    @property
    def deconv_dims(self):
        return ((self.output_height - 2) // 2 + 1, (self.output_width - 2) // 2 + 1)

    def _deconvs(self):
        return (
            L.ConvTranspose2d(64, 32, 3, 1, 1),
            L.ConvTranspose2d(32, 32, 3, 1, 1),
            L.ConvTranspose2d(32, 32, 2, 2, 0),
            L.ConvTranspose2d(32, self.in_channels, 1, 1, 0),
        )

    def init(self, key):
        h, w = self.deconv_dims
        fc1 = DenseBlock(self.latent_dim, self.hidden_dim, self.drop_p)
        fc2 = DenseBlock(self.hidden_dim, h * w * 64, self.drop_p)
        dcs = self._deconvs()
        k = _split(key, 6)
        p_fc1, s_fc1 = fc1.init(k[0])
        p_fc2, s_fc2 = fc2.init(k[1])
        params = {"fc1": p_fc1, "fc2": p_fc2}
        for i, dc in enumerate(dcs, 1):
            params[f"dc{i}"] = dc.init(k[1 + i])
        return params, {"fc1": s_fc1, "fc2": s_fc2}

    def apply(self, params, state, z, *, train: bool, rng):
        h, w = self.deconv_dims
        fc1 = DenseBlock(self.latent_dim, self.hidden_dim, self.drop_p)
        fc2 = DenseBlock(self.hidden_dim, h * w * 64, self.drop_p)
        r1, r2 = _split(rng, 2)
        x, s1 = fc1.apply(params["fc1"], state["fc1"], z, train=train, rng=r1)
        x, s2 = fc2.apply(params["fc2"], state["fc2"], x, train=train, rng=r2)
        # torch reshapes to [b, 64, h, w] (components.py:88); keep that element
        # order, then go NHWC for the TPU deconvs.
        b = x.shape[0]
        x = x.reshape(b, 64, h, w).transpose(0, 2, 3, 1)
        dc1, dc2, dc3, dc4 = self._deconvs()
        x = jax.nn.relu(dc1.apply(params["dc1"], x))
        x = jax.nn.relu(dc2.apply(params["dc2"], x))
        x = jax.nn.relu(dc3.apply(params["dc3"], x))
        x = dc4.apply(params["dc4"], x)  # no sigmoid (components.py:92)
        return x, {"fc1": s1, "fc2": s2}
