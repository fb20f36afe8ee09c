"""Shifted space-to-depth ("folded") 3×3×3 convolution for small-channel
stages — the TPU answer to the generator's 64³ / Cout-32 bottleneck.

Why (measured on v5e, scripts/conv_probe.py): a plain NDHWC conv with
Cout=32 runs at ~7% of bf16 peak — the implicit GEMM's N dim fills only 32 of
the MXU's 128 lanes and the op degenerates to HBM-bandwidth-bound. The same
hardware runs a conv with 96→128 channels at **87% of peak**. Folding 2×2
spatial positions (h, w) into channels turns the stage-0 convs
(24→32, 32→32, 96→32; reference BasicUNet features
``/root/reference/src/model.py:26``) into 96→128 / 128→128 / 384→128 convs.

The fold is *shifted*: input groups are offset by one voxel relative to
output groups, so each folded-axis kernel needs extent 2 (not 3) and the
widened block-sparse kernel is 9/16 dense — a 16/9 ≈ 1.78× FLOP blowup for a
4× lane-utilization gain (≈2.5× net at the 87% conv efficiency), instead of
the 4× blowup an aligned fold would need. Zeros in the widened kernel
contribute exactly zero, so results are bit-comparable to the plain conv
(up to float summation order).

Bookkeeping: a folded tensor carries a static integer ``offset`` per folded
axis; fold group ``c`` covers original positions ``{2c - off, 2c - off + 1}``
(phase j ↔ position 2c - off + j). Each folded conv consumes offset ``o`` and
produces ``o - 1``; chains of convs therefore need **no relayout between
layers** — only one fold at stage entry and one unfold at stage exit.
Odd offsets have one half-empty boundary group per side; those pad slots must
be zero before the tensor is used as a conv input (``pad_slot_mask``).

All ops are pure XLA (conv_general_dilated + reshapes): autodiff gives the
backward convs with the same folded channel counts (dW: N=128, dx: N=96+).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cmin(off: int) -> int:
    return -((1 - off) // 2)  # ceil((off-1)/2)


def _cmax(size: int, off: int) -> int:
    return (size - 1 + off) // 2


def fold_cols(size: int, off: int) -> Tuple[int, int]:
    """(c_min, n_cols) of the folded axis for original extent ``size``."""
    lo, hi = _cmin(off), _cmax(size, off)
    return lo, hi - lo + 1


def fold_hw(x: jax.Array, off_h: int, off_w: int) -> jax.Array:
    """(B,D,H,W,C) → (B,D,nh,nw,4C) folding (h,w) pairs into channels with
    the given group offsets. Lane order of the 4C dim is (jh, jw, c),
    jh major. Boundary pad slots are zero by construction."""
    b, d, h, w, c = x.shape
    ch_lo, nh = fold_cols(h, off_h)
    cw_lo, nw = fold_cols(w, off_w)
    pad_h = (off_h - 2 * ch_lo, 2 * _cmax(h, off_h) - off_h + 2 - h)
    pad_w = (off_w - 2 * cw_lo, 2 * _cmax(w, off_w) - off_w + 2 - w)
    x = jnp.pad(x, ((0, 0), (0, 0), pad_h, pad_w, (0, 0)))
    x = x.reshape(b, d, nh, 2, nw, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (B,D,nh,nw,jh,jw,C)
    return x.reshape(b, d, nh, nw, 4 * c)


def unfold_hw(
    xf: jax.Array, h: int, w: int, off_h: int, off_w: int
) -> jax.Array:
    """Inverse of :func:`fold_hw` — crops the boundary pads."""
    b, d, nh, nw, c4 = xf.shape
    c = c4 // 4
    x = xf.reshape(b, d, nh, nw, 2, 2, c).transpose(0, 1, 2, 4, 3, 5, 6)
    x = x.reshape(b, d, 2 * nh, 2 * nw, c)
    ch_lo = _cmin(off_h)
    cw_lo = _cmin(off_w)
    lo_h = off_h - 2 * ch_lo  # first real h sits at this padded index
    lo_w = off_w - 2 * cw_lo
    return x[:, :, lo_h:lo_h + h, lo_w:lo_w + w, :]


def pad_slot_mask(size: int, off: int, n_cols: int) -> np.ndarray:
    """(n_cols, 2) float mask: 1 where the slot maps to a real position."""
    lo = _cmin(off)
    cols = np.arange(lo, lo + n_cols)[:, None]
    pos = 2 * cols - off + np.arange(2)[None, :]
    return ((pos >= 0) & (pos < size)).astype(np.float32)


def mask_pad_slots(
    xf: jax.Array, h: int, w: int, off_h: int, off_w: int
) -> jax.Array:
    """Zero the half-empty boundary groups of an odd-offset folded tensor.

    For even offsets (and even sizes) there are no pad slots — statically a
    no-op. For odd offsets exactly two slots exist per axis: (first col,
    phase 0) and (last col, phase 1); only those boundary slices are touched,
    not the whole tensor."""
    b, d, nh, nw, c4 = xf.shape
    c = c4 // 4
    x = xf.reshape(b, d, nh, nw, 2, 2, c)
    if off_h % 2 != 0:
        x = x.at[:, :, 0, :, 0, :, :].set(0.0)
        x = x.at[:, :, nh - 1, :, 1, :, :].set(0.0)
    if off_w % 2 != 0:
        x = x.at[:, :, :, 0, :, 0, :].set(0.0)
        x = x.at[:, :, :, nw - 1, :, 1, :].set(0.0)
    return x.reshape(xf.shape)


def fold_conv_kernel(w: jax.Array) -> jax.Array:
    """(3,3,3,Cin,Cout) → (3,2,2,4Cin,4Cout) widened block-sparse kernel for
    the shifted fold (input offset o, output offset o-1)."""
    kd, kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "shifted fold assumes 3×3 along h,w"
    out = jnp.zeros((kd, 2, 2, 2, 2, cin, 2, 2, cout), w.dtype)
    for kh2 in range(2):
        for jih in range(2):
            for joh in range(2):
                k_h = 2 * kh2 + jih - joh
                if not 0 <= k_h < 3:
                    continue
                for kw2 in range(2):
                    for jiw in range(2):
                        for jow in range(2):
                            k_w = 2 * kw2 + jiw - jow
                            if not 0 <= k_w < 3:
                                continue
                            out = out.at[
                                :, kh2, kw2, jih, jiw, :, joh, jow, :
                            ].set(w[:, k_h, k_w])
    return out.reshape(kd, 2, 2, 4 * cin, 4 * cout)


def folded_conv3x3(
    xf: jax.Array,
    w: jax.Array,
    h: int,
    w_dim: int,
    off: int,
) -> jax.Array:
    """SAME 3×3×3 conv on an (h,w)-folded tensor.

    ``xf``: (B,D,nh,nw,4Cin) folded at offset ``off`` on both axes, with pad
    slots zeroed. ``w``: the canonical (3,3,3,Cin,Cout) kernel. Returns the
    folded output at offset ``off - 1`` (pad slots NOT yet masked — callers
    mask after bias, see :func:`mask_pad_slots`).
    """
    wf = fold_conv_kernel(w)
    oo = off - 1
    ci_h, ni_h = fold_cols(h, off)
    co_h, no_h = fold_cols(h, oo)
    ci_w, ni_w = fold_cols(w_dim, off)
    co_w, no_w = fold_cols(w_dim, oo)
    # output col h' reads input cols {h', h'+1} (abs); as array indices the
    # first window starts at co - ci, the last ends at (co+no-1) - ci + 1.
    pad_h = (ci_h - co_h, (co_h + no_h) - ci_h + 1 - ni_h)
    pad_w = (ci_w - co_w, (co_w + no_w) - ci_w + 1 - ni_w)
    return jax.lax.conv_general_dilated(
        xf, wf, (1, 1, 1),
        padding=((1, 1), pad_h, pad_w),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def folded_max_pool2(
    xf: jax.Array, h: int, w: int, off: int
) -> jax.Array:
    """2×2×2 max-pool consuming the fold: (B,D,nh,nw,4C) folded at ``off`` →
    plain (B,D/2,H/2,W/2,C). Pool pairs {2k,2k+1} are reassembled from the
    offset groups with shifted slices."""
    b, d, nh, nw, c4 = xf.shape
    c = c4 // 4
    x = xf.reshape(b, d, nh, nw, 2, 2, c)

    def axis_pairs(arr, n_cols, size, o, axis, phase_axis):
        # position p = 2c - o + j ; pool pair {2k, 2k+1}:
        #   2k   → c = (2k + o) / 2 … depends on parity of o.
        lo = _cmin(o)
        out = []
        for r in range(2):  # member of the pool pair: position 2k + r
            # 2k + r = 2c - o + j  →  with j = (o + r) % 2,
            # c = k + (o + r - j) // 2
            j = (o + r) % 2
            shift = (o + r - j) // 2  # c = k + shift
            start = shift - lo  # array index for k=0
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, start + size // 2)
            ph = [slice(None)] * arr.ndim
            taken = arr[tuple(sl)]
            phs = [slice(None)] * arr.ndim
            phs[phase_axis] = j
            out.append(taken[tuple(phs)])
        return jnp.maximum(out[0], out[1])

    # fold-h axis=2, phase axis 4; then fold-w axis=3 → after first reduce
    # the phase axis 4 is gone, w phase moves to axis 4.
    x = axis_pairs(x, nh, h, off, axis=2, phase_axis=4)  # (b,d,h/2,nw,2,c)
    x = axis_pairs(x, nw, w, off, axis=3, phase_axis=4)  # (b,d,h/2,w/2,c)
    # d pooling (plain axis)
    x = x.reshape(b, d // 2, 2, h // 2, w // 2, c)
    return jnp.max(x, axis=2)


def folded_concat(af: jax.Array, bf: jax.Array) -> jax.Array:
    """Channel-concat two folded tensors (same offsets): regroups so the
    result's lane order is (jh, jw, c_a ⊕ c_b), as folded convs expect."""
    *lead, ca4 = af.shape
    cb4 = bf.shape[-1]
    a = af.reshape(*lead, 4, ca4 // 4)
    b = bf.reshape(*lead, 4, cb4 // 4)
    return jnp.concatenate([a, b], axis=-1).reshape(*lead, ca4 + cb4)


def folded_instance_norm_stats(
    xf: jax.Array, count: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-(sample, original-channel) mean/var over a folded tensor whose pad
    slots are zero: moment form with the true element ``count`` so pads do
    not bias the statistics. Returns mean/var shaped (B,1,1,1,4C)."""
    b, d, nh, nw, c4 = xf.shape
    c = c4 // 4
    xr = xf.astype(jnp.float32).reshape(b, d, nh, nw, 4, c)
    s1 = jnp.sum(xr, axis=(1, 2, 3, 4), keepdims=True)     # (b,1,1,1,1,c)
    mean = s1 / count
    # Two-pass (mean-subtracted) second moment — the E[x²]−E[x]² form loses
    # precision by cancellation when |mean| ≫ std. The zero pad slots each
    # contribute mean² to the centred sum, so subtract them out exactly.
    n_pad = d * nh * nw * 4 - count
    cent = jnp.sum(
        jnp.square(xr - mean), axis=(1, 2, 3, 4), keepdims=True
    )
    var = jnp.maximum(cent - n_pad * mean * mean, 0.0) / count
    mean4 = jnp.broadcast_to(mean, (b, 1, 1, 1, 4, c)).reshape(
        b, 1, 1, 1, c4)
    var4 = jnp.broadcast_to(var, (b, 1, 1, 1, 4, c)).reshape(b, 1, 1, 1, c4)
    return mean4, var4


# ---------------------------------------------------------------------------
# Discriminator k4s2: shifted space-to-depth + dense 2-cube conv
# ---------------------------------------------------------------------------

def shifted_s2d_k4(x: jax.Array) -> jax.Array:
    """(B,D,H,W,C) → (B,D/2+1,H/2+1,W/2+1,8C): slot (q, p) = x(2q + p - 1)
    per axis (zero-padded borders), phase layout pw-major / pd-minor.

    A k=4 / stride-2 / pad-1 conv (the PatchGAN ``DownSampleConv``,
    reference ``src/model.py:42-65``) reads input groups offset by one voxel
    from the output grid; this *shifted* fold makes each folded-axis tap
    extent exactly 2, so the folded kernel is fully dense — identical FLOPs,
    8× more input channels for the MXU's 128-lane reduction dim.
    """
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    def fold_axis(a, axis, n_half):
        sl0 = [slice(None)] * a.ndim
        sl1 = [slice(None)] * a.ndim
        # one extra cell at the high end for the t=1 tap
        sl0[axis] = slice(0, 2 * (n_half + 1), 2)   # p=0: xp[0,2,4..]
        sl1[axis] = slice(1, 2 * (n_half + 1), 2)   # p=1: xp[1,3,5..]
        return jnp.concatenate([a[tuple(sl0)], a[tuple(sl1)]], axis=-1)

    y = fold_axis(xp, 1, d // 2)
    y = fold_axis(y, 2, h // 2)
    y = fold_axis(y, 3, w // 2)
    return y


def fold_kernel_k4s2(w: jax.Array) -> jax.Array:
    """(4,4,4,Cin,Cout) → (2,2,2,8·Cin,Cout) matching
    :func:`shifted_s2d_k4`'s phase layout (original tap k = 2t + p per
    axis; folded channel block index = pw·4 + ph·2 + pd)."""
    cin, cout = w.shape[3], w.shape[4]
    wr = w.reshape(2, 2, 2, 2, 2, 2, cin, cout)  # (td,pd,th,ph,tw,pw,ci,co)
    wt = jnp.transpose(wr, (0, 2, 4, 5, 3, 1, 6, 7))
    return wt.reshape(2, 2, 2, 8 * cin, cout)


def conv_k4s2_folded(x: jax.Array, w: jax.Array,
                     bias: jax.Array | None = None) -> jax.Array:
    """k=4 / stride-2 / pad-1 conv computed as shifted s2d + dense 2³ VALID
    conv. Bit-comparable to the plain conv (up to float summation order);
    requires even spatial extents. ``w``: (4,4,4,Cin,Cout) plain layout —
    checkpoints stay interchangeable with the plain path."""
    assert all(s % 2 == 0 for s in x.shape[1:4]), (
        f"conv_k4s2_folded needs even spatial dims, got {x.shape[1:4]}"
    )
    xf = shifted_s2d_k4(x)
    wf = fold_kernel_k4s2(w.astype(x.dtype))
    y = jax.lax.conv_general_dilated(
        xf, wf, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
