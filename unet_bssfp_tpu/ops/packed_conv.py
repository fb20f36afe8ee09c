"""w-packed 3D convolution: full MXU lanes for small-channel stages.

Why: XLA lowers a NDHWC conv to an implicit GEMM whose N dimension is the
output-channel count. The generator's 64³/32³ stages have Cout = 32/64
(reference BasicUNet features, ``/root/reference/src/model.py:26``), so at
most 32/64 of the MXU's 128 lanes do useful work — a hard 25%/50% ceiling on
those stages regardless of tiling (round-1 VERDICT weak #4: step MFU ~12%).

Trick: compute ``pack`` adjacent output w-positions as one widened GEMM.
For pack=4 on a 3×3×3 kernel,

    y[b,d,h,4·w4+j,c] = Σ_{kd,kh,kw} x[b,d+kd-1,h+kh-1,4·w4+j+kw-1,i]
                        · W[kd,kh,kw,i,c]              (j = 0..3)

is exactly a conv with kernel (3,3,3+pack-1), window stride (1,1,pack) and
output features pack·Cout, where the widened kernel

    W'[kd,kh,kw',i,j·Cout+c] = W[kd,kh,kw'-j,i,c]  if 0 ≤ kw'-j < 3 else 0

is block-Toeplitz along (kw', j). It is half zeros for pack=4 (2× nominal
FLOPs) but N = pack·Cout fills all 128 lanes (4× utilization) → up to 2× net
on the N-ceiling-bound stages. Weights keep their original (3,3,3,Cin,Cout)
layout; widening is a differentiable pad+concat evaluated inside the jit (XLA
constant-folds it per step — it is tiny next to the activations).

The custom VJP applies the same packing to both backward GEMMs:
  - dx = conv(dy, flip(W)ᵀ), N = Cin          → packed with pack_x lanes
  - dW via the *packed* forward's filter-grad, N = pack·Cout = 128
so every MXU call in fwd+bwd runs with ≥96 active lanes.

Use :class:`PackedConv3x3` as a drop-in for ``nn.Conv(k=3, SAME)`` — the
parameter names/shapes ("kernel", "bias") match ``flax.linen.Conv``, so
checkpoints are interchangeable between packed and unpacked models.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def pick_pack(cout: int, width: int) -> int:
    """Largest pack in {4,2,1} with pack·cout ≤ 128 dividing ``width``."""
    for pack in (4, 2):
        if pack * cout <= 128 and width % pack == 0:
            return pack
    return 1


def _widen_kernel_w(w: jax.Array, pack: int) -> jax.Array:
    """(kd,kh,kw,ci,co) → (kd,kh,kw+pack-1,ci,pack·co) block-Toeplitz."""
    cols = [
        jnp.pad(w, ((0, 0), (0, 0), (j, pack - 1 - j), (0, 0), (0, 0)))
        for j in range(pack)
    ]
    return jnp.concatenate(cols, axis=-1)


def _conv_packed(x: jax.Array, w: jax.Array, pack: int) -> jax.Array:
    """SAME conv (odd kd/kh; kw=3) with w-packing. No VJP attached."""
    b, d, h, wd, _ = x.shape
    kd, kh, kw, _, cout = w.shape
    if pack == 1:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=((kd // 2, kd // 2), (kh // 2, kh // 2),
                     (kw // 2, kw // 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    wide = _widen_kernel_w(w, pack)
    y = jax.lax.conv_general_dilated(
        x, wide, window_strides=(1, 1, pack),
        padding=((kd // 2, kd // 2), (kh // 2, kh // 2), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y.reshape(b, d, h, wd, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_conv3d(x: jax.Array, w: jax.Array, pack: int) -> jax.Array:
    """SAME 3×3×3 conv, w-packed, lane-packed custom VJP.

    x: (B,D,H,W,Cin) with W % pack == 0; w: (3,3,3,Cin,Cout).
    """
    return _conv_packed(x, w, pack)


def _fwd(x, w, pack):
    return _conv_packed(x, w, pack), (x, w)


def _bwd(pack, res, dy):
    x, w = res
    # dx: correlation of dy with the flipped, channel-transposed kernel —
    # itself a SAME 3×3×3 conv with Cin/Cout swapped, so pack it too.
    w_flip_t = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    pack_x = pick_pack(x.shape[-1], x.shape[-2])
    dx = _conv_packed(dy, w_flip_t, pack_x)
    # dw: filter-grad of the *packed* conv (N = pack·Cout lanes), then fold
    # the widening back (slice the block-Toeplitz columns and sum).
    _, vjp = jax.vjp(lambda w_: _conv_packed(x, w_, pack), w)
    (dw,) = vjp(dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


packed_conv3d.defvjp(_fwd, _bwd)


class PackedConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3,3), padding=1)`` (param-compatible:
    "kernel" (3,3,3,Cin,Cout) + "bias" (Cout,)) that w-packs the GEMM when the
    static shape allows; falls back to the plain conv otherwise."""

    features: int
    dtype: Optional[Any] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, cin, self.features),
        )
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        kc = kernel.astype(dtype)
        pack = pick_pack(self.features, x.shape[-2])
        y = packed_conv3d(xc, kc, pack)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y
