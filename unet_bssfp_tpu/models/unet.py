"""BasicUNet-3D backbone (Flax, NDHWC).

Structurally equivalent to the MONAI ``BasicUNet`` the reference generator
wraps (reference ``src/model.py:22-28``): features (32, 64, 128, 256, 512, 32),
4 max-pool encoder stages, 4 transpose-conv decoder stages with skip
concatenation, dropout 0.05, InstanceNorm(affine) + LeakyReLU(0.1), final 1³
conv to ``out_channels``.

Channel plumbing for features (f0..f4, f5):
  conv_0: in → f0
  down_k: f_{k-1} → f_k              (k = 1..4)
  upcat_4: (f4 ↑ f4/2) ⊕ f3 → f3
  upcat_3: (f3 ↑ f3/2) ⊕ f2 → f2
  upcat_2: (f2 ↑ f2/2) ⊕ f1 → f1
  upcat_1: (f1 ↑ f1)   ⊕ f0 → f5    (no halving on the last stage)
  final:  f5 → out_channels (1³ conv)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from unet_bssfp_tpu.models.layers import Down, TwoConv, UpCat


def _can_fold(x: jax.Array) -> bool:
    """Folding needs even D (for the pool) and even H, W (for 2×2 groups)."""
    return all(s % 2 == 0 for s in x.shape[1:4])


def _can_pack(x: jax.Array, f0: int) -> bool:
    """The Pallas spatial-lane kernel needs H·W % 128 == 0 (lane tiling),
    even dims (for the pool) and channel counts ≤ 128."""
    from unet_bssfp_tpu.ops.pallas.conv3d import packed_supported

    return (packed_supported(x.shape) and _can_fold(x)
            and x.shape[-1] <= 128 and f0 <= 128)


class BasicUNet3D(nn.Module):
    out_channels: int = 6
    features: Tuple[int, ...] = (32, 64, 128, 256, 512, 32)
    dropout: float = 0.05
    negative_slope: float = 0.1
    dtype: Optional[Any] = None
    # Rematerialise each block in backward (jax.checkpoint): trades ~1.3x
    # FLOPs for activation memory — enables bigger batches / whole-volume
    # training within HBM.
    remat: bool = False
    # Fused Pallas InstanceNorm+LeakyReLU where legal (see models.layers).
    use_fused: bool = True
    # Learnable per-channel PReLU slopes (init negative_slope) instead of a
    # fixed LeakyReLU — the thesis MultiInputUNet activation.
    prelu: bool = False
    # Run the two full-resolution stages (conv_0 / upcat_1) in the shifted
    # space-to-depth folded layout (models.folded_layers): 4× the MXU lane
    # utilisation of the Cout=32 convs for a 16/9 FLOP blowup — measured
    # 1.58× fwd+bwd on the conv_0 stage on v5e. Exact numerics (the widened
    # kernels carry structural zeros) and identical param paths, so
    # checkpoints are interchangeable with the unfolded model. Pure XLA, so
    # it SPMD-partitions (the multi-chip default; ``packed`` wins single-
    # chip). Auto-falls back when spatial dims are odd or ``prelu`` is set.
    folded: bool = False
    # Run the two full-resolution stages through the Pallas spatial-lane
    # conv kernel (models.packed_layers / ops.pallas.conv3d): the input is
    # read from HBM once per conv instead of ~27× and the GEMMs run with
    # full MXU lanes — measured 1.9–2.9× over the XLA conv fwd+bwd on v5e.
    # Identical param paths (incl. learnable PReLU slopes); takes
    # precedence over ``folded``. Auto-falls back on unsupported shapes.
    packed: bool = False
    # w-packed conv GEMMs (ops.packed_conv) for the mid-resolution stages
    # down_1/upcat_2 (32³, Cout 64: pack=2 fills all 128 MXU lanes vs 64).
    # Exact numerics, param-compatible. Default off pending the in-step A/B
    # (scripts/wpack_ab.py; BENCH_NOTES_r4).
    wpack_mid: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = self.features
        assert len(f) == 6, "BasicUNet3D needs 6 feature sizes"

        two_conv, down, upcat = TwoConv, Down, UpCat
        if self.remat:
            # static_argnums counts self at 0; `train` is arg 2 (TwoConv/
            # Down) and arg 3 (UpCat).
            two_conv = nn.remat(TwoConv, static_argnums=(2,))
            down = nn.remat(Down, static_argnums=(2,))
            upcat = nn.remat(UpCat, static_argnums=(3,))

        packed = self.packed and _can_pack(x, f[0])
        folded = (not packed and self.folded and not self.prelu
                  and _can_fold(x))
        if packed:
            from unet_bssfp_tpu.models.folded_layers import PooledConvs
            from unet_bssfp_tpu.models.packed_layers import (
                PackedTwoConv,
                PackedUpCat,
                packed_max_pool2,
            )

            p_two_conv, p_upcat, p_convs = (
                PackedTwoConv, PackedUpCat, PooledConvs)
            if self.remat:
                p_two_conv = nn.remat(PackedTwoConv, static_argnums=(2,))
                p_upcat = nn.remat(PackedUpCat, static_argnums=(3,))
                p_convs = nn.remat(PooledConvs, static_argnums=(2,))

            from unet_bssfp_tpu.models.packed_layers import guard_cols

            wdim = x.shape[3]
            g0 = guard_cols(x.shape[2], wdim)
            xk0 = p_two_conv(
                f[0], self.dropout, self.negative_slope, dtype=self.dtype,
                prelu=self.prelu, name="conv_0")(x, train)
            x0p = packed_max_pool2(xk0, wdim + g0, g0)
            x1 = p_convs(f[1], self.dropout, self.negative_slope,
                         self.dtype, self.use_fused, self.prelu,
                         wpack=self.wpack_mid, name="down_1")(x0p, train)
        elif folded:
            from unet_bssfp_tpu.models.folded_layers import (
                FoldedTwoConv,
                FoldedUpCat,
                PooledConvs,
            )
            from unet_bssfp_tpu.ops.folded import folded_max_pool2

            f_two_conv, f_upcat, p_convs = (
                FoldedTwoConv, FoldedUpCat, PooledConvs)
            if self.remat:
                f_two_conv = nn.remat(FoldedTwoConv, static_argnums=(2,))
                f_upcat = nn.remat(FoldedUpCat, static_argnums=(3,))
                p_convs = nn.remat(PooledConvs, static_argnums=(2,))

            h, w = x.shape[2], x.shape[3]
            # start_off=0: stage output lands at offset -2 (pad-free for
            # even dims), which both the pool and the skip consume directly.
            xf0 = f_two_conv(
                f[0], self.dropout, self.negative_slope, dtype=self.dtype,
                start_off=0, name="conv_0")(x, train)
            x0p = folded_max_pool2(xf0, h, w, 0 - 2)
            x1 = p_convs(f[1], self.dropout, self.negative_slope,
                         self.dtype, self.use_fused, self.prelu,
                         wpack=self.wpack_mid, name="down_1")(x0p, train)
        else:
            x0 = two_conv(f[0], self.dropout, self.negative_slope,
                          self.dtype, self.use_fused, self.prelu,
                          name="conv_0")(x, train)
            x1 = down(f[1], self.dropout, self.negative_slope, self.dtype,
                      self.use_fused, self.prelu, wpack=self.wpack_mid,
                      name="down_1")(x0, train)
        x2 = down(f[2], self.dropout, self.negative_slope, self.dtype,
                  self.use_fused, self.prelu, name="down_2")(x1, train)
        x3 = down(f[3], self.dropout, self.negative_slope, self.dtype,
                  self.use_fused, self.prelu, name="down_3")(x2, train)
        x4 = down(f[4], self.dropout, self.negative_slope, self.dtype,
                  self.use_fused, self.prelu, name="down_4")(x3, train)

        u4 = upcat(f[3], f[4] // 2, self.dropout, self.negative_slope,
                   self.dtype, self.use_fused, self.prelu, name="upcat_4")(x4, x3, train)
        u3 = upcat(f[2], f[3] // 2, self.dropout, self.negative_slope,
                   self.dtype, self.use_fused, self.prelu, name="upcat_3")(u4, x2, train)
        u2 = upcat(f[1], f[2] // 2, self.dropout, self.negative_slope,
                   self.dtype, self.use_fused, self.prelu,
                   wpack=self.wpack_mid, name="upcat_2")(u3, x1, train)
        if packed:
            from unet_bssfp_tpu.models.packed_layers import PackedFinalConv
            from unet_bssfp_tpu.ops.pallas.conv3d import unpack_hw_auto

            u1k = p_upcat(f[5], f[1], wdim, self.dropout,
                          self.negative_slope, dtype=self.dtype,
                          prelu=self.prelu, name="upcat_1")(u2, xk0, train)
            out = PackedFinalConv(
                self.out_channels, dtype=self.dtype, name="final_conv",
            )(u1k)
            out = unpack_hw_auto(out, wdim + g0)
            return out[:, :, :, :wdim] if g0 else out
        if folded:
            u1 = f_upcat(f[5], f[1], h, w, -2, self.dropout,
                         self.negative_slope, dtype=self.dtype,
                         name="upcat_1")(u2, xf0, train)
        else:
            u1 = upcat(f[5], f[1], self.dropout, self.negative_slope,
                       self.dtype, self.use_fused, self.prelu,
                       name="upcat_1")(u2, x0, train)

        return nn.Conv(
            self.out_channels, kernel_size=(1, 1, 1), dtype=self.dtype,
            name="final_conv",
        )(u1)
