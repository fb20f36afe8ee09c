"""Building-block 3D conv modules (Flax linen, channels-last NDHWC).

TPU-first layout choice: NDHWC keeps the channel dim in lanes so XLA tiles
convs onto the MXU without transposes; all modules run in a configurable
compute dtype (bfloat16 by default) with float32 params.

Blocks mirror the reference's building blocks:
- ``ConvBlock``  == ``DownSampleConv`` (reference ``src/model.py:42-65``):
  Conv3d(k=4, s=2, p=1 default) + optional BatchNorm3d + LeakyReLU(0.2).
- ``TwoConv``/``Down``/``UpCat`` == the MONAI BasicUNet blocks the generator's
  backbone is built from (reference ``src/model.py:22-28`` instantiates
  ``monai.networks.nets.BasicUNet``): conv(k=3) → InstanceNorm(affine) →
  Dropout → LeakyReLU(0.1), max-pool downsampling, transpose-conv upsampling
  with skip concatenation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class InstanceNorm(nn.Module):
    """InstanceNorm3d(affine=True) equivalent: per-(sample, channel) moments
    over spatial dims. eps matches torch's 1e-5.

    ``fused_slope``: apply LeakyReLU(slope) inside the op and use the Pallas
    fused kernel on TPU (one VMEM pass, ``ops.pallas.fused_norm_act``) —
    callers must then skip their own activation.
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    fused_slope: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = self.dtype or x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))

        if self.fused_slope is not None:
            if x.ndim == 5 and jax.default_backend() == "tpu":
                from unet_bssfp_tpu.ops.pallas.fused_norm_act import (
                    fused_instance_norm_leaky_relu_vjp,
                )

                return fused_instance_norm_leaky_relu_vjp(
                    x, scale, bias, self.fused_slope, self.epsilon
                ).astype(dtype)

        axes = tuple(range(1, x.ndim - 1))  # spatial dims of NDHWC
        # Stats in at-least-f32: f32 for bf16/f32 activations (the production
        # paths), f64 preserved so f64 verification runs are actually f64.
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        if self.fused_slope is not None:
            y = nn.leaky_relu(y, self.fused_slope)
        return y.astype(dtype)


class _FoldedConvK4S2(nn.Module):
    """k4/s2/p1 conv via ``ops.folded.conv_k4s2_folded`` (shifted
    space-to-depth + dense 2³ conv — same FLOPs, 8× the reduction lanes).
    Parameter tree and shapes are identical to ``nn.Conv`` so checkpoints
    are interchangeable with the plain path."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from unet_bssfp_tpu.ops.folded import conv_k4s2_folded

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (4, 4, 4, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        return conv_k4s2_folded(
            x.astype(dtype), kernel.astype(dtype), bias.astype(dtype)
        )


class ConvBlock(nn.Module):
    """``DownSampleConv`` equivalent (reference ``src/model.py:42-65``):
    Conv3d + optional BatchNorm3d + LeakyReLU(negative_slope).

    Defaults k=4/s=2/p=1 (strided downsampling); the per-modality input heads
    use k=1/s=1/p=0 (reference ``src/model.py:19-21``).

    ``folded``: route a k4/s2/p1 conv through the shifted-s2d formulation
    (TPU: fills the MXU reduction dim at small Cin). Falls back to the plain
    conv for other geometries or odd spatial extents.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    activation: bool = True
    batchnorm: bool = True
    negative_slope: float = 0.2
    dtype: Optional[Dtype] = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        use_folded = (
            self.folded
            and (self.kernel, self.stride, self.padding) == (4, 2, 1)
            and all(s % 2 == 0 for s in x.shape[1:4])
        )
        if use_folded:
            x = _FoldedConvK4S2(self.features, self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(self.kernel,) * 3,
                strides=(self.stride,) * 3,
                padding=self.padding,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.activation:
            x = nn.leaky_relu(x, self.negative_slope)
        return x


class ConvNormAct(nn.Module):
    """One MONAI ``Convolution`` with ADN ordering Norm → Dropout → Act:
    Conv3d(k=3, p=1) → InstanceNorm(affine) → Dropout(p) → LeakyReLU(0.1).

    ``use_fused`` collapses the norm+act pair into the fused Pallas kernel
    and applies dropout *after* the activation. This is mathematically
    identical to the ADN ordering: LeakyReLU is positively homogeneous
    (LeakyReLU(a*x) = a*LeakyReLU(x) for a >= 0) and dropout multiplies by a
    non-negative mask, so dropout and LeakyReLU commute (up to float
    rounding).

    ``prelu`` replaces the fixed LeakyReLU slope with a learnable per-channel
    PReLU slope initialised at ``negative_slope`` (thesis MultiInputUNet uses
    PReLU, doc/thesis/03-methods.tex Architecture; torch init 0.25). The
    fused kernel assumes a static slope, so ``prelu`` forces the unfused path.
    """

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    use_fused: bool = True
    prelu: bool = False
    # w-packed conv GEMM (ops.packed_conv): pack adjacent output w-positions
    # into MXU lanes at small-Cout stages. Param-compatible with nn.Conv
    # (same "conv/kernel|bias" paths); falls back to the plain conv when the
    # static shape gives pack=1.
    wpack: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.wpack:
            from unet_bssfp_tpu.ops.packed_conv import PackedConv3x3

            x = PackedConv3x3(
                self.features, dtype=self.dtype, name="conv"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3, 3),
                padding=1,
                dtype=self.dtype,
                name="conv",
            )(x)
        dropout_active = self.dropout > 0.0 and train
        if self.use_fused and not self.prelu:
            x = InstanceNorm(
                dtype=self.dtype,
                fused_slope=self.negative_slope,
                name="norm",
            )(x)
            if dropout_active:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
            return x
        x = InstanceNorm(dtype=self.dtype, name="norm")(x)
        if dropout_active:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        if self.prelu:
            slope = self.param(
                "prelu_slope",
                nn.initializers.constant(self.negative_slope),
                (self.features,),
            ).astype(x.dtype)
            return jnp.where(x >= 0, x, slope * x)
        return nn.leaky_relu(x, self.negative_slope)


class TwoConv(nn.Module):
    """Two stacked ConvNormAct blocks (MONAI BasicUNet ``TwoConv``)."""

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    use_fused: bool = True
    prelu: bool = False
    wpack: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = ConvNormAct(
            self.features, self.dropout, self.negative_slope, self.dtype,
            self.use_fused, self.prelu, wpack=self.wpack, name="conv_0",
        )(x, train)
        x = ConvNormAct(
            self.features, self.dropout, self.negative_slope, self.dtype,
            self.use_fused, self.prelu, wpack=self.wpack, name="conv_1",
        )(x, train)
        return x


class Down(nn.Module):
    """Max-pool(2) then TwoConv (MONAI BasicUNet ``Down``)."""

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    use_fused: bool = True
    prelu: bool = False
    wpack: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        return TwoConv(
            self.features, self.dropout, self.negative_slope, self.dtype,
            self.use_fused, self.prelu, wpack=self.wpack, name="convs",
        )(x, train)


class UpCat(nn.Module):
    """Transpose-conv upsample ×2 → pad-to-skip → concat(skip, up) → TwoConv
    (MONAI BasicUNet ``UpCat`` with mode='deconv').

    ``up_features`` is in_channels//2 when ``halves`` (all but the last
    decoder stage of BasicUNet).
    """

    features: int          # TwoConv output channels
    up_features: int       # transpose-conv output channels
    dropout: float = 0.0
    negative_slope: float = 0.1
    dtype: Optional[Dtype] = None
    use_fused: bool = True
    prelu: bool = False
    wpack: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: jax.Array, train: bool = True
    ) -> jax.Array:
        x = nn.ConvTranspose(
            self.up_features,
            kernel_size=(2, 2, 2),
            strides=(2, 2, 2),
            dtype=self.dtype,
            name="upsample",
        )(x)
        # Pad upsampled map to match skip spatial dims (odd-sized inputs).
        pads = [(0, 0)]
        for ax in range(1, 4):
            diff = skip.shape[ax] - x.shape[ax]
            pads.append((diff // 2, diff - diff // 2))
        pads.append((0, 0))
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, pads, mode="edge")
        x = jnp.concatenate([skip, x], axis=-1)
        return TwoConv(
            self.features, self.dropout, self.negative_slope, self.dtype,
            self.use_fused, self.prelu, wpack=self.wpack, name="convs",
        )(x, train)
