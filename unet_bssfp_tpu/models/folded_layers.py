"""Folded (shifted space-to-depth) variants of the 64³-stage U-Net blocks.

Measured motivation (scripts/conv_probe.py on v5e): the stage-0 convs
(Cout 32 @ 64³) run at ~7% of bf16 peak under plain XLA — N=32 of 128 MXU
lanes — while the same conv folded to 96→128 channels runs at 87%. These
modules run the stage entirely in the folded layout (one fold at entry, one
unfold/pool at exit, offset decrementing per conv so no relayouts between
layers). See ``ops/folded.py`` for the math.

Numerics: identical to ``TwoConv``/``UpCat`` up to float summation order —
the widened kernels are the same weights with structural zeros, and the
instance-norm statistics use true-element counts so boundary pad slots do not
bias them. (Dropout masks are drawn in the folded layout, so the random
stream differs from the unfolded modules — distributionally identical.)
Parameter paths and shapes match the unfolded modules exactly
(``conv/kernel`` (3,3,3,Ci,Co), ``conv/bias``, ``norm/scale``, ``norm/bias``),
so checkpoints are interchangeable between folded and unfolded models.

Reference provenance: these compute the MONAI BasicUNet blocks the reference
generator wraps (``/root/reference/src/model.py:22-28``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_bssfp_tpu.models.layers import TwoConv
from unet_bssfp_tpu.ops.folded import (
    fold_hw,
    folded_concat,
    folded_conv3x3,
    folded_instance_norm_stats,
    mask_pad_slots,
    unfold_hw,
)

Dtype = Any


class PooledConvs(nn.Module):
    """``Down`` applied to an already-pooled input — the 2³ max-pool was
    consumed in the folded layout by ``ops.folded.folded_max_pool2``.
    Param path matches ``Down`` exactly (single child ``convs``), so
    checkpoints are interchangeable."""

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    use_fused: bool = True
    prelu: bool = False
    wpack: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        return TwoConv(
            self.features, self.dropout, self.negative_slope, self.dtype,
            self.use_fused, self.prelu, wpack=self.wpack, name="convs",
        )(x, train)


class _Conv3Params(nn.Module):
    """Parameter container matching ``nn.Conv``'s names/shapes."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _NormParams(nn.Module):
    """Parameter container matching ``InstanceNorm``'s names/shapes."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return scale, bias


class FoldedConvNormAct(nn.Module):
    """ConvNormAct (conv3³ → InstanceNorm → Dropout → LeakyReLU) evaluated on
    an (h,w)-folded tensor at offset ``off``; returns offset ``off - 1`` with
    pad slots zeroed."""

    features: int
    h: int
    w: int
    off: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = True) -> jax.Array:
        cin = xf.shape[-1] // 4
        kernel, cbias = _Conv3Params(self.features, name="conv")(cin)
        scale, nbias = _NormParams(name="norm")(self.features)
        dtype = self.dtype or xf.dtype

        yf = folded_conv3x3(
            xf.astype(dtype), kernel.astype(dtype), self.h, self.w, self.off
        )
        oo = self.off - 1
        yf = yf + jnp.tile(cbias, 4).astype(yf.dtype)
        yf = mask_pad_slots(yf, self.h, self.w, oo, oo)

        d = yf.shape[1]
        count = d * self.h * self.w
        mean, var = folded_instance_norm_stats(yf, count)
        y = (yf.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        y = y * jnp.tile(scale, 4) + jnp.tile(nbias, 4)
        if self.dropout > 0.0 and train:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = nn.leaky_relu(y, self.negative_slope)
        # affine/norm make pads non-zero — re-zero before the next conv.
        y = mask_pad_slots(y, self.h, self.w, oo, oo)
        return y.astype(dtype)


class FoldedPair(nn.Module):
    """Two FoldedConvNormActs on an already-folded input at ``off``; output
    folded at ``off - 2``. Children named conv_0/conv_1 like ``TwoConv``."""

    features: int
    h: int
    w: int
    off: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xf: jax.Array, train: bool = True) -> jax.Array:
        xf = FoldedConvNormAct(
            self.features, self.h, self.w, self.off, self.dropout,
            self.negative_slope, dtype=self.dtype, name="conv_0",
        )(xf, train)
        return FoldedConvNormAct(
            self.features, self.h, self.w, self.off - 1, self.dropout,
            self.negative_slope, dtype=self.dtype, name="conv_1",
        )(xf, train)


class FoldedTwoConv(nn.Module):
    """TwoConv on the folded layout: plain (B,D,H,W,C) input → folded output
    at offset ``start_off - 2`` (pads zeroed). Use
    ``ops.folded.folded_max_pool2``/``unfold_hw`` at the stage exit.
    Param paths match ``TwoConv`` (children ``conv_0``/``conv_1``)."""

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    start_off: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        h, w = x.shape[2], x.shape[3]
        xf = fold_hw(
            x.astype(self.dtype or x.dtype), self.start_off, self.start_off
        )
        xf = FoldedConvNormAct(
            self.features, h, w, self.start_off, self.dropout,
            self.negative_slope, dtype=self.dtype, name="conv_0",
        )(xf, train)
        return FoldedConvNormAct(
            self.features, h, w, self.start_off - 1, self.dropout,
            self.negative_slope, dtype=self.dtype, name="conv_1",
        )(xf, train)


class FoldedUpCat(nn.Module):
    """UpCat whose TwoConv runs folded: transpose-conv upsample (plain XLA) →
    fold at the skip's offset → folded concat → FoldedPair → unfold.
    ``skip_f`` must be folded at ``skip_off`` with pads zeroed. Param paths
    match ``UpCat`` (``upsample``, ``convs/conv_{0,1}``)."""

    features: int
    up_features: int
    h: int
    w: int
    skip_off: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, skip_f: jax.Array, train: bool = True
    ) -> jax.Array:
        up = nn.ConvTranspose(
            self.up_features, kernel_size=(2, 2, 2), strides=(2, 2, 2),
            dtype=self.dtype, name="upsample",
        )(x)
        upf = fold_hw(up, self.skip_off, self.skip_off)
        xf = folded_concat(skip_f, upf)
        xf = FoldedPair(
            self.features, self.h, self.w, self.skip_off, self.dropout,
            self.negative_slope, dtype=self.dtype, name="convs",
        )(xf, train)
        return unfold_hw(
            xf, self.h, self.w, self.skip_off - 2, self.skip_off - 2
        )
