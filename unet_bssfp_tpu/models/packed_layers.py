"""Packed (spatial-lane) variants of the full-resolution U-Net blocks.

These run the 64³-stage convs (conv_0, upcat_1 — the GAN step's hot spot,
reference BasicUNet ``/root/reference/src/model.py:22-28``) through the
Pallas spatial-lane conv kernel (``ops.pallas.conv3d``): activations live as
``(B, D, C, H·W)`` for the whole stage, the input is read from HBM once per
conv instead of ~27×, and the MXU GEMMs run with N = H·W full lanes.
Measured on v5e: 1.9–2.9× over the XLA conv on forward+backward at the
stage shapes.

Param paths and shapes match the plain modules exactly (``conv/kernel``
(3,3,3,Ci,Co), ``conv/bias``, ``norm/scale``, ``norm/bias``), so checkpoints
are interchangeable between packed and unpacked models. Numerics match
within bf16 rounding (f32 accumulation inside the kernel; instance-norm
statistics are computed in f32 over all spatial positions, identical to the
plain path).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_bssfp_tpu.models.folded_layers import _Conv3Params, _NormParams
from unet_bssfp_tpu.ops.pallas.conv3d import (
    conv3x3_packed_auto,
    pack_hw_auto,
)

Dtype = Any


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def guard_cols(h: int, w: int) -> int:
    """Zero guard columns appended to each w-row of the packed layout.

    With ``g ≥ 2`` trailing zero lanes per row the conv kernel's w-rolls
    need no SAME-padding masks (ops.pallas.conv3d ``wguard``) — six VPU
    passes saved per nine-tap combine. ``g`` must keep the row width even
    (pool pairing) and the lane count ``h·(w+g)`` tile-aligned (128).

    MEASURED NEUTRAL-TO-SLOWER on v5e (scripts/guard_probe.py, r3: 24→32
    fwd+bwd 4.10 → 5.07 ms, 96→32 9.49 → 9.48 ms at the 64³ parity
    shapes): the mask savings are offset by rolls/elementwise over an odd
    lane-tile count (33·128 = 4224 vs 32·128) and the +3% wider GEMM. Kept
    as an opt-in layout for study (``UNET_BSSFP_WGUARD=1``); correctness
    is locked by ``tests/test_pallas_conv3d.py::test_wguard_*``."""
    import os

    if os.environ.get("UNET_BSSFP_WGUARD") != "1":
        return 0
    for g in (2, 4, 6, 8):
        if (w + g) % 2 == 0 and (h * (w + g)) % 128 == 0:
            return g
    return 0


def _guard_zero(y: jax.Array, wdim: int, wguard: int) -> jax.Array:
    """Re-zero the guard columns (norm bias / activation made them
    non-zero). XLA fuses this select into the surrounding elementwise
    chain. Its backward also zeroes guard cotangents — the invariant the
    conv kernels' VJPs rely on."""
    if not wguard:
        return y
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, y.shape[-1]), 3)
    return jnp.where(lane % wdim < wdim - wguard, y, jnp.zeros((), y.dtype))


class PackedConvNormAct(nn.Module):
    """ConvNormAct (conv3³ → InstanceNorm → Dropout → LeakyReLU/PReLU) on a
    packed (B, D, C, H·W) tensor. ``wdim`` is the W extent of the lane dim
    (including ``wguard`` trailing zero guard columns per row, if any).
    ``prelu`` uses a learnable per-channel slope (param ``prelu_slope``,
    matching ``models.layers.ConvNormAct``) instead of the fixed LeakyReLU
    slope — the thesis MultiInputUNet activation."""

    features: int
    wdim: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    prelu: bool = False
    wguard: int = 0

    @nn.compact
    def __call__(self, xk: jax.Array, train: bool = True) -> jax.Array:
        cin = xk.shape[2]
        kernel, cbias = _Conv3Params(self.features, name="conv")(cin)
        scale, nbias = _NormParams(name="norm")(self.features)
        dtype = self.dtype or xk.dtype

        yk = conv3x3_packed_auto(
            xk.astype(dtype), kernel, cbias.astype(jnp.float32),
            self.wdim, _interpret(), self.wguard,
        )
        # InstanceNorm: per-(sample, channel) moments over all spatial
        # positions = (d, lanes); f32 stats like models.layers.InstanceNorm.
        # Guard columns are zero (kernel invariant): use the true element
        # count and subtract the pads' mean² from the centred second moment
        # (same correction as ops.folded.folded_instance_norm_stats).
        yf = yk.astype(jnp.float32)
        b, d, c, hw = yf.shape
        if self.wguard:
            h = hw // self.wdim
            count = d * h * (self.wdim - self.wguard)
            n_pad = d * h * self.wguard
            s1 = jnp.sum(yf, axis=(1, 3), keepdims=True)
            mean = s1 / count
            cent = jnp.sum(jnp.square(yf - mean), axis=(1, 3), keepdims=True)
            var = jnp.maximum(cent - n_pad * mean * mean, 0.0) / count
        else:
            mean = jnp.mean(yf, axis=(1, 3), keepdims=True)
            var = jnp.var(yf, axis=(1, 3), keepdims=True)
        y = (yf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.reshape(1, 1, -1, 1) + nbias.reshape(1, 1, -1, 1)
        if self.dropout > 0.0 and train:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        if self.prelu:
            slope = self.param(
                "prelu_slope",
                nn.initializers.constant(self.negative_slope),
                (self.features,),
            ).astype(y.dtype)
            y = jnp.where(y >= 0, y, slope.reshape(1, 1, -1, 1) * y)
        else:
            y = nn.leaky_relu(y, self.negative_slope)
        return _guard_zero(y, self.wdim, self.wguard).astype(dtype)


class PackedTwoConv(nn.Module):
    """TwoConv on the packed layout: NDHWC input → packed output
    (B, D, features, H·(W+g)) with ``g = guard_cols(H, W)`` zero guard
    columns per w-row. Param paths match ``TwoConv``."""

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    prelu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        h, w = x.shape[2], x.shape[3]
        g = guard_cols(h, w)
        x = x.astype(self.dtype or x.dtype)
        if g:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, g), (0, 0)))
        xk = pack_hw_auto(x)
        xk = PackedConvNormAct(
            self.features, w + g, self.dropout, self.negative_slope,
            dtype=self.dtype, prelu=self.prelu, wguard=g, name="conv_0",
        )(xk, train)
        return PackedConvNormAct(
            self.features, w + g, self.dropout, self.negative_slope,
            dtype=self.dtype, prelu=self.prelu, wguard=g, name="conv_1",
        )(xk, train)


def _pool2_impl(xk: jax.Array, wdim: int) -> jax.Array:
    """Full-width pool (guard column pairs, if any, pool to zero): returns
    (b, d/2, h/2, wdim/2, c) NDHWC — callers slice off the pooled guards."""
    b, d, c, hw = xk.shape
    h = hw // wdim
    x = xk.reshape(b, d // 2, 2, c, h // 2, 2, wdim // 2, 2)
    x = jnp.max(x, axis=(2, 5, 7))          # (b, d/2, c, h/2, wdim/2)
    return jnp.transpose(x, (0, 1, 3, 4, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_max_pool2(xk: jax.Array, wdim: int, wguard: int = 0) -> jax.Array:
    """2×2×2 max-pool consuming the packed layout → plain NDHWC
    (B, D/2, H/2, W/2, C), dropping the ``wguard`` zero guard columns.

    Custom backward: XLA's select-and-scatter for this pool costs ~9 ms
    fwd+bwd at the 64³×32 parity shape on v5e; a first-match equality mask
    over the 8 window positions (the same tie-break select_and_scatter
    uses — first window position in (d, h, w) row-major order wins) is
    ~equivalent math at a fraction of the cost (scripts/dropout_probe.py)."""
    y = _pool2_impl(xk, wdim)
    return y[:, :, :, :(wdim - wguard) // 2] if wguard else y


def _pool2_fwd(xk, wdim, wguard):
    y = _pool2_impl(xk, wdim)
    out = y[:, :, :, :(wdim - wguard) // 2] if wguard else y
    return out, (xk, y)


def _pool2_bwd(wdim, wguard, res, dy):
    xk, y = res
    b, d, c, hw = xk.shape
    h = hw // wdim
    if wguard:
        dy = jnp.pad(dy, ((0, 0),) * 3 + ((0, wguard // 2), (0, 0)))
    xr = xk.reshape(b, d // 2, 2, c, h // 2, 2, wdim // 2, 2)
    yb = jnp.transpose(y, (0, 1, 4, 2, 3))      # (b, d/2, c, h/2, wdim/2)
    dyb = jnp.transpose(dy, (0, 1, 4, 2, 3)).astype(jnp.float32)
    zero = jnp.zeros_like(dyb)
    taken = jnp.zeros(yb.shape, dtype=bool)
    parts = []
    for dd in range(2):
        for hh in range(2):
            for ww in range(2):
                m = (xr[:, :, dd, :, :, hh, :, ww] == yb) & ~taken
                parts.append(jnp.where(m, dyb, zero))
                taken = taken | m
    dx = jnp.stack(parts, axis=0).reshape(
        2, 2, 2, b, d // 2, c, h // 2, wdim // 2)
    dx = jnp.transpose(dx, (3, 4, 0, 5, 6, 1, 7, 2))
    return (dx.reshape(b, d, c, hw).astype(xk.dtype),)


packed_max_pool2.defvjp(_pool2_fwd, _pool2_bwd)


class PackedUpCat(nn.Module):
    """UpCat whose TwoConv runs packed: transpose-conv upsample (XLA,
    channels-last) → pack → channel-concat with the packed skip →
    PackedConvNormAct ×2. ``wdim`` is the DATA width W; ``skip_k`` must be
    packed with the same W (and therefore the same ``guard_cols``).
    Returns the packed (guarded) output. Param paths match ``UpCat``."""

    features: int
    up_features: int
    wdim: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    prelu: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, skip_k: jax.Array, train: bool = True
    ) -> jax.Array:
        up = nn.ConvTranspose(
            self.up_features, kernel_size=(2, 2, 2), strides=(2, 2, 2),
            dtype=self.dtype, name="upsample",
        )(x)
        g = guard_cols(up.shape[2], self.wdim)
        if g:
            up = jnp.pad(up, ((0, 0), (0, 0), (0, 0), (0, g), (0, 0)))
        upk = pack_hw_auto(up)
        xk = jnp.concatenate([skip_k, upk], axis=2)
        return _PackedPair(
            self.features, self.wdim + g, self.dropout, self.negative_slope,
            dtype=self.dtype, prelu=self.prelu, wguard=g, name="convs",
        )(xk, train)


class _PackedPair(nn.Module):
    """Two PackedConvNormActs named conv_0/conv_1 (param path matches the
    ``convs`` child of ``UpCat``'s TwoConv). ``wdim`` includes any guard
    columns (``wguard``)."""

    features: int
    wdim: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    prelu: bool = False
    wguard: int = 0

    @nn.compact
    def __call__(self, xk: jax.Array, train: bool = True) -> jax.Array:
        xk = PackedConvNormAct(
            self.features, self.wdim, self.dropout, self.negative_slope,
            dtype=self.dtype, prelu=self.prelu, wguard=self.wguard,
            name="conv_0",
        )(xk, train)
        return PackedConvNormAct(
            self.features, self.wdim, self.dropout, self.negative_slope,
            dtype=self.dtype, prelu=self.prelu, wguard=self.wguard,
            name="conv_1",
        )(xk, train)


class PackedFinalConv(nn.Module):
    """1³ conv on the packed layout — a channel GEMM. Param names/shapes
    match ``nn.Conv(features, (1,1,1))`` for checkpoint compatibility."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xk: jax.Array) -> jax.Array:
        cin = xk.shape[2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, 1, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or xk.dtype
        k = kernel.reshape(cin, self.features).astype(dtype)
        y = jnp.einsum("bdcl,cf->bdfl", xk.astype(dtype), k)
        return y + bias.astype(dtype).reshape(1, 1, -1, 1)
