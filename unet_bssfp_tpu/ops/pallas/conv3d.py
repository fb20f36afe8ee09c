"""Pallas TPU 3×3×3 SAME conv for small-channel stages — spatial-lane layout.

The generator's full-resolution stages (Cout=32 @ 64³; reference BasicUNet
features ``/root/reference/src/model.py:22-28``) dominate the GAN step.
Measured on v5e (scripts/{conv_probe,fold_axis_probe}.py, two-point sync):
XLA lowers these convs to an im2col GEMM that re-reads the input ~27× from
HBM and fills only Cout=32 of 128 MXU lanes — 5–7 % of bf16 peak, HBM-bound.

This kernel stores activations **spatial-flattened**:

    (B, D, C, H·W)        lane index = h·W + w

so that per output d-slice the GEMM operand is the *zero-copy* VMEM slice
``B₃ = x_vmem[d:d+3]`` reshaped to ``(3·Cin, H·W)``: K = 3·Cin over
sublanes, N = H·W (4096 for a 64³ patch) over lanes — large in both dims,
so the MXU streams and the per-iteration loop overhead amortises over an
entire d-slice. The (kh, kw) taps become nine weight blocks
``W_khkw (Cout, 3·Cin)`` whose partial outputs are combined by masked lane
rolls of the f32 result (h-shift = roll ±W, w-shift = roll ±1; SAME padding
is the roll masks — no spatial padding in memory). The d halo is a cheap
leading-dim pad; each grid cell DMAs its (DT+2)-slice window to VMEM once,
dropping HBM traffic from ~27× to ~1× of the input.

Numerics: f32 accumulation, same contraction class as XLA's conv (bf16
outputs match within rounding). Autodiff via custom VJP: dx is this kernel
with flipped/transposed weights; dw is a sibling kernel accumulating
``B₃ @ (rolled dy)ᵀ`` blocks over the sequential grid.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM limit is 16 MB; v5e has far more physical
# VMEM, so the kernels request a larger window (whole-volume shapes need it:
# one (C, H·W) f32 slab is 1.5-2 MB and the roll-combine keeps several
# live). The planning budget stays below the requested limit to leave room
# for double-buffered pipeline blocks and scheduler slack.
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 28 * 1024 * 1024
# Cap for the fused tap-GEMM result (f32) — above this, chunk per kh, then
# per tap.
_YS_BUDGET = 12 * 1024 * 1024


def _sub(c: int) -> int:
    return -(-c // 8) * 8


# Conv formulation: "kstack" folds the three kw taps into the GEMM's K dim
# by storing three w-shifted copies of every input slab in VMEM (shifts on
# cheap bf16 Cin rows, amortised over the 3 output d-slices each slab
# feeds), leaving only the two kh rolls on the f32 result — ~3× less VPU
# roll/mask/add traffic than the legacy 9-tap combine at identical MXU
# FLOPs. The flip side is 3× the GEMM B-operand streamed from VMEM
# (K = 9·Cin vs 3·Cin), so it only wins where the roll savings dominate:
# measured on v5e (scripts/kstack_probe.py) 24→32@64³ fwd 1.44×/f+b 1.14×,
# but 32→32 0.84×, 96→32 0.96×, and whole-volume HW 0.77× — hence the
# shape gate in :func:`_use_kstack`. "legacy" is the original nine-tap
# roll-combine (required for the wguard layout); "kstack" forces it on.
_CONV_FORM = os.environ.get("UNET_BSSFP_CONV_FORM", "auto")


def _use_kstack(cin: int, cout: int, hw: int, wguard: int) -> bool:
    if wguard or _CONV_FORM == "legacy":
        return False
    if _CONV_FORM == "kstack":
        return True
    return cin < cout and hw <= 4096


def _pick_dt(d: int, hw: int, cin: int, cout: int,
             itemsize: int = 2, xfactor: int = 1) -> int:
    """Largest d-tile whose halo window + out block + f32 temps fit.
    ``xfactor``: VMEM copies of the input window (3 for kstack)."""
    x_slice = xfactor * _sub(cin) * hw * itemsize
    o_slice = _sub(cout) * hw * itemsize
    temps = 6 * _sub(cout) * hw * 4          # live f32 (COUT, HW) values
    for dt in (8, 4, 2, 1):
        # out block is double-buffered by the pipeline
        total = (dt + 2) * x_slice + 2 * dt * o_slice + temps
        if d % dt == 0 and total <= _VMEM_BUDGET:
            return dt
    return 1


def _roll_masked(y32, shift, lane, W, HW):
    """Roll the f32 (C, HW) value by ``shift`` lanes (+h·W + w offsets) and
    zero the SAME-padding positions the roll wrapped across."""
    kh, kw = shift
    amount = (kh * W + kw) % HW
    out = pltpu.roll(y32, amount, 1) if amount else y32
    if kh > 0:       # shifted toward +h: first kh h-rows invalid
        out = jnp.where(lane < kh * W, 0.0, out)
    elif kh < 0:
        out = jnp.where(lane >= HW + kh * W, 0.0, out)
    if kw > 0:       # shifted toward +w: first kw w-cols of each row invalid
        out = jnp.where(lane % W < kw, 0.0, out)
    elif kw < 0:
        out = jnp.where(lane % W >= W + kw, 0.0, out)
    return out


def _roll_w_masked(y32, s, lane, W):
    """Roll by ``s`` w-lanes (|s| < W) and zero the wrapped w-columns."""
    if s == 0:
        return y32
    out = pltpu.roll(y32, s % y32.shape[1], 1)
    if s > 0:
        return jnp.where(lane % W < s, 0.0, out)
    return jnp.where(lane % W >= W + s, 0.0, out)


def _roll_w_guarded(y32, s):
    """Roll by ``s`` w-lanes with NO mask — valid when each w-row carries
    ≥|s| trailing zero guard columns (``wguard`` layout): every value a roll
    wraps into a *data* position comes from a guard lane of the adjacent
    row, which is zero — exactly the SAME padding the mask used to create.
    Saves the 6 w-mask VPU passes per nine-tap combine."""
    if s == 0:
        return y32
    return pltpu.roll(y32, s % y32.shape[1], 1)


def _roll_h_masked(y32, sh, lane, W, HW):
    """Roll by ``sh`` h-rows (sh·W lanes) and zero the wrapped rows. Row
    rolls preserve lane%W, so w-masks applied before commute with this."""
    if sh == 0:
        return y32
    out = pltpu.roll(y32, (sh * W) % HW, 1)
    if sh > 0:
        return jnp.where(lane < sh * W, 0.0, out)
    return jnp.where(lane >= HW + sh * W, 0.0, out)


def _conv_kernel(xp_ref, wstack_ref, bias_ref, out_ref, x_vmem, sem,
                 *, DT, HW, W, CIN, COUT, WGUARD=0):
    """Grid (B, D//DT). xp_ref: (B, D+2, CIN, HW) in ANY/HBM (d padded).
    wstack_ref: (9*COUT, 3*CIN) — tap (kh, kw) at rows
    [(kh*3+kw)*COUT, ...); K ordered (kd, ci).
    out_ref block: (1, DT, COUT, HW). x_vmem: (DT+2, CIN, HW).
    ``WGUARD``: trailing zero guard columns per w-row — w-rolls then need
    no masks (see :func:`_roll_w_guarded`); the store re-zeroes the guard
    columns so the invariant holds for the next conv."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (COUT, HW), 1)
    guard_keep = (lane % W < W - WGUARD) if WGUARD else None

    def roll_w(y, s):
        return (_roll_w_guarded(y, s) if WGUARD
                else _roll_w_masked(y, s, lane, W))

    # Tap-group size: ONE GEMM for all nine taps amortises launch overhead,
    # but its (group*COUT, HW) f32 result must fit VMEM — fall back to
    # per-kh groups, then single taps, at whole-volume HW.
    group = next(g for g in (9, 3, 1)
                 if g * COUT * HW * 4 <= _YS_BUDGET or g == 1)

    def body(d, _):
        bmat = x_vmem[pl.ds(d, 3), :, :].reshape(3 * CIN, HW)
        acc = bias_ref[:] * jnp.ones((COUT, HW), jnp.float32)
        if group == 9:
            # Tree combine: sum the kw taps per kh row first (w-rolls ±1,
            # masked only in the legacy layout), then one h-roll ±W per kh
            # row — 8 rolls / 8 masks / 9 adds (legacy) or 8 rolls /
            # 2 masks / 9 adds (guarded) instead of the flat form's
            # 8 rolls / ~12 masks / 9 adds. (w-masks commute with row rolls
            # since lane%W is preserved.)
            ys = jax.lax.dot_general(
                wstack_ref[:], bmat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (9*COUT, HW)
            for kh in range(3):
                t = None
                for kw in range(3):
                    y = ys[(kh * 3 + kw) * COUT:(kh * 3 + kw + 1) * COUT, :]
                    y = roll_w(y, 1 - kw)
                    t = y if t is None else t + y
                acc = acc + _roll_h_masked(t, 1 - kh, lane, W, HW)
        else:
            for g0 in range(0, 9, group):
                ys = jax.lax.dot_general(
                    wstack_ref[pl.ds(g0 * COUT, group * COUT), :], bmat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (group*COUT, HW): tap blocks (kh, kw) from index g0
                for j in range(group):
                    kh, kw = divmod(g0 + j, 3)
                    y = ys[j * COUT:(j + 1) * COUT, :]
                    # W_khkw · X(h, w) → out(h - kh + 1, w - kw + 1)
                    if WGUARD:
                        y = _roll_h_masked(
                            roll_w(y, 1 - kw), 1 - kh, lane, W, HW)
                    else:
                        y = _roll_masked(y, (1 - kh, 1 - kw), lane, W, HW)
                    acc = acc + y
        if WGUARD:
            acc = jnp.where(guard_keep, acc, 0.0)
        out_ref[0, pl.ds(d, 1), :, :] = (
            acc.astype(out_ref.dtype).reshape(1, COUT, HW)
        )
        return 0

    jax.lax.fori_loop(0, DT, body, 0)


def _build_wshift_slabs(xs_vmem, DT, CIN, W, HW):
    """Prologue shared by the kstack kernels: the DMA left the raw slab in
    rows [CIN, 2·CIN); fill rows [0, CIN) with the kw=0 tap's operand
    X(·, w−1) (w-roll +1) and rows [2·CIN, 3·CIN) with kw=2's X(·, w+1)
    (w-roll −1), masked at the SAME-pad columns. bf16 Cin rows — each slab
    is read by three output d-slices, so the shift cost amortises 3×."""
    lane_in = jax.lax.broadcasted_iota(jnp.int32, (CIN, HW), 1)
    dtype = xs_vmem.dtype
    for s in range(DT + 2):
        # Mosaic's lane rotate is 32-bit only — roll in f32, store bf16.
        x0 = xs_vmem[s, pl.ds(CIN, CIN), :].astype(jnp.float32)
        xs_vmem[s, pl.ds(0, CIN), :] = _roll_w_masked(
            x0, 1, lane_in, W).astype(dtype)
        xs_vmem[s, pl.ds(2 * CIN, CIN), :] = _roll_w_masked(
            x0, -1, lane_in, W).astype(dtype)


def _conv_kernel_kstack(xp_ref, wstack_ref, bias_ref, out_ref, xs_vmem, sem,
                        *, DT, HW, W, CIN, COUT):
    """kstack form of :func:`_conv_kernel`. Grid (B, D//DT).
    wstack_ref: (3*COUT, 9*CIN) — rows (kh, co), K ordered (kd, kw, ci).
    xs_vmem: (DT+2, 3*CIN, HW) — per slab the three w-shifted copies.
    Per output d-slice: ONE GEMM over K = (kd, kw, ci) = 9·CIN against the
    zero-copy (9·CIN, HW) window, then a 2-roll/2-mask/3-add h-combine on
    the (COUT, HW) f32 result — vs the legacy form's 8 rolls/8 masks."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)],
        xs_vmem.at[:, pl.ds(CIN, CIN), :], sem,
    )
    dma.start()
    dma.wait()

    _build_wshift_slabs(xs_vmem, DT, CIN, W, HW)
    lane = jax.lax.broadcasted_iota(jnp.int32, (COUT, HW), 1)
    fused = 3 * COUT * HW * 4 <= _YS_BUDGET

    def body(d, _):
        bmat = xs_vmem[pl.ds(d, 3), :, :].reshape(9 * CIN, HW)
        acc = bias_ref[:] * jnp.ones((COUT, HW), jnp.float32)
        if fused:
            ys = jax.lax.dot_general(
                wstack_ref[:], bmat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3*COUT, HW), kh-major
            acc = acc + ys[COUT:2 * COUT, :]
            acc = acc + _roll_h_masked(ys[:COUT, :], 1, lane, W, HW)
            acc = acc + _roll_h_masked(ys[2 * COUT:, :], -1, lane, W, HW)
        else:
            for kh in range(3):
                y = jax.lax.dot_general(
                    wstack_ref[pl.ds(kh * COUT, COUT), :], bmat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + _roll_h_masked(y, 1 - kh, lane, W, HW)
        out_ref[0, pl.ds(d, 1), :, :] = (
            acc.astype(out_ref.dtype).reshape(1, COUT, HW)
        )
        return 0

    jax.lax.fori_loop(0, DT, body, 0)


def _dw_kernel_kstack(xp_ref, dy_ref, dw_ref, xs_vmem, sem,
                      *, DT, HW, W, CIN, COUT):
    """kstack dw: ONE GEMM per d-slice — the zero-copy (9·CIN, HW) window
    against a 3-block h-rolled dy stack → (9*CIN, 3*COUT), rows (kd, kw,
    ci), cols (kh, co). Only 2 rolls/2 masks per slice vs legacy's 8."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)],
        xs_vmem.at[:, pl.ds(CIN, CIN), :], sem,
    )
    dma.start()
    dma.wait()

    _build_wshift_slabs(xs_vmem, DT, CIN, W, HW)
    lane = jax.lax.broadcasted_iota(jnp.int32, (COUT, HW), 1)

    def body(d, acc):
        bmat = xs_vmem[pl.ds(d, 3), :, :].reshape(9 * CIN, HW)
        dy0 = dy_ref[0, pl.ds(d, 1), :, :].reshape(COUT, HW).astype(
            jnp.float32)
        dys = jnp.concatenate(
            [_roll_h_masked(dy0, kh - 1, lane, W, HW) for kh in range(3)],
            axis=0,
        ).astype(xs_vmem.dtype)  # (3*COUT, HW), kh-major
        return acc + jax.lax.dot_general(
            bmat, dys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (9*CIN, 3*COUT)

    acc = jax.lax.fori_loop(0, DT, body, jnp.zeros_like(dw_ref))
    dw_ref[:] = dw_ref[:] + acc


def _wstack(w: jax.Array, dtype) -> jax.Array:
    """(3,3,3,Cin,Cout) → (9*Cout, 3*Cin): row block (kh, kw), K=(kd, ci)."""
    k = jnp.transpose(w, (1, 2, 4, 0, 3))  # (kh, kw, Cout, kd, Cin)
    return k.reshape(9 * w.shape[4], 3 * w.shape[3]).astype(dtype)


def _wstack_k(w: jax.Array, dtype) -> jax.Array:
    """(3,3,3,Cin,Cout) → (3*Cout, 9*Cin): rows (kh, co), K=(kd, kw, ci)."""
    k = jnp.transpose(w, (1, 4, 0, 2, 3))  # (kh, Cout, kd, kw, Cin)
    return k.reshape(3 * w.shape[4], 9 * w.shape[3]).astype(dtype)


def _conv_fwd_impl(xk: jax.Array, w: jax.Array, bias: jax.Array, wdim: int,
                   interpret: bool = False, pad_d: bool = True,
                   wguard: int = 0) -> jax.Array:
    """``pad_d=False``: ``xk`` already carries a 1-slice d halo on each side
    (space-sharded callers exchange real neighbour slices instead of the
    SAME zero pad); output D = xk.shape[1] - 2."""
    B, D, CIN, HW = xk.shape
    if not pad_d:
        D = D - 2
    assert HW % wdim == 0 and HW % 128 == 0
    COUT = w.shape[4]
    # Mosaic requires sublane dims in multiples of 8 (sub-8 channel counts
    # fault the compiled kernel); zero-pad the channel dims and slice after.
    cin8, cout8 = _sub(CIN), _sub(COUT)
    if cin8 != CIN:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, cin8 - CIN), (0, 0)))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cin8 - CIN), (0, 0)))
    if cout8 != COUT:
        w = jnp.pad(w, ((0, 0),) * 4 + ((0, cout8 - COUT),))
        bias = jnp.pad(bias, (0, cout8 - COUT))
    cout_orig = COUT
    CIN, COUT = cin8, cout8
    kstack = _use_kstack(CIN, COUT, HW, wguard)
    DT = _pick_dt(D, HW, CIN, COUT, xk.dtype.itemsize,
                  xfactor=3 if kstack else 1)

    xp = jnp.pad(xk, ((0, 0), (1, 1), (0, 0), (0, 0))) if pad_d else xk
    b_col = bias.reshape(COUT, 1).astype(jnp.float32)

    if kstack:
        kernel = functools.partial(
            _conv_kernel_kstack, DT=DT, HW=HW, W=wdim, CIN=CIN, COUT=COUT,
        )
        wstack = _wstack_k(w, xk.dtype)
        w_spec = pl.BlockSpec((3 * COUT, 9 * CIN), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
        x_scratch = pltpu.VMEM((DT + 2, 3 * CIN, HW), xk.dtype)
    else:
        kernel = functools.partial(
            _conv_kernel, DT=DT, HW=HW, W=wdim, CIN=CIN, COUT=COUT,
            WGUARD=wguard,
        )
        wstack = _wstack(w, xk.dtype)
        w_spec = pl.BlockSpec((9 * COUT, 3 * CIN), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM)
        x_scratch = pltpu.VMEM((DT + 2, CIN, HW), xk.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // DT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            w_spec,
            pl.BlockSpec((COUT, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, DT, COUT, HW), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, COUT, HW), xk.dtype),
        scratch_shapes=[
            x_scratch,
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, wstack, b_col)
    return out[:, :, :cout_orig] if cout_orig != COUT else out


def _dw_kernel(xp_ref, dy_ref, dw_ref, x_vmem, sem,
               *, DT, HW, W, CIN, COUT, WGUARD=0):
    """Accumulates (3*CIN, 9*COUT) over the sequential grid: rows (kd, ci),
    column block (kh, kw) — one GEMM per d-slice against the stacked rolled
    dy (the stack build reuses the rolls the 9-dot form needed anyway)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (COUT, HW), 1)
    group = next(g for g in (9, 3, 1)
                 if g * COUT * HW * 4 <= _YS_BUDGET or g == 1)

    def roll_dy(dy0, kh, kw):
        # dw_khkw = Σ X(h+kh-1, w+kw-1) ⊗ dy(h, w): roll dy to align with
        # the unshifted X; masks (or guard columns) zero SAME-pad positions.
        if WGUARD:
            # dy carries zero guard columns (kernel-output invariant), so
            # the w component needs no mask; X's own guard columns are zero
            # too, killing any residual garbage in the contraction.
            return _roll_h_masked(
                _roll_w_guarded(dy0, kw - 1), kh - 1, lane, W, HW)
        return _roll_masked(dy0, (kh - 1, kw - 1), lane, W, HW)

    def body(d, acc):
        bmat = x_vmem[pl.ds(d, 3), :, :].reshape(3 * CIN, HW)
        dy0 = dy_ref[0, pl.ds(d, 1), :, :].reshape(COUT, HW).astype(
            jnp.float32)
        parts = []
        for g0 in range(0, 9, group):
            rolled = []
            for j in range(group):
                kh, kw = divmod(g0 + j, 3)
                rolled.append(roll_dy(dy0, kh, kw))
            dys = jnp.concatenate(rolled, axis=0).astype(x_vmem.dtype)
            parts.append(jax.lax.dot_general(
                bmat, dys,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))  # (3*CIN, group*COUT)
        return acc + (parts[0] if len(parts) == 1
                      else jnp.concatenate(parts, axis=1))

    acc = jax.lax.fori_loop(
        0, DT, body, jnp.zeros_like(dw_ref)
    )
    dw_ref[:] = dw_ref[:] + acc


def _dw_impl(xk: jax.Array, dy: jax.Array, wdim: int,
             interpret: bool = False, pad_d: bool = True,
             wguard: int = 0) -> jax.Array:
    B, D, CIN, HW = xk.shape
    if not pad_d:
        D = D - 2
    COUT = dy.shape[2]
    cin8, cout8 = _sub(CIN), _sub(COUT)
    if cin8 != CIN:
        xk = jnp.pad(xk, ((0, 0), (0, 0), (0, cin8 - CIN), (0, 0)))
    if cout8 != COUT:
        dy = jnp.pad(dy, ((0, 0), (0, 0), (0, cout8 - COUT), (0, 0)))
    cin_orig, cout_orig = CIN, COUT
    CIN, COUT = cin8, cout8
    kstack = _use_kstack(CIN, COUT, HW, wguard)
    DT = _pick_dt(D, HW, CIN, COUT, xk.dtype.itemsize,
                  xfactor=3 if kstack else 1)

    xp = jnp.pad(xk, ((0, 0), (1, 1), (0, 0), (0, 0))) if pad_d else xk
    if kstack:
        kernel = functools.partial(
            _dw_kernel_kstack, DT=DT, HW=HW, W=wdim, CIN=CIN, COUT=COUT,
        )
        out_spec = pl.BlockSpec((9 * CIN, 3 * COUT), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((9 * CIN, 3 * COUT), jnp.float32)
        x_scratch = pltpu.VMEM((DT + 2, 3 * CIN, HW), xk.dtype)
    else:
        kernel = functools.partial(
            _dw_kernel, DT=DT, HW=HW, W=wdim, CIN=CIN, COUT=COUT,
            WGUARD=wguard,
        )
        out_spec = pl.BlockSpec((3 * CIN, 9 * COUT), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((3 * CIN, 9 * COUT), jnp.float32)
        x_scratch = pltpu.VMEM((DT + 2, CIN, HW), xk.dtype)
    dw_flat = pl.pallas_call(
        kernel,
        grid=(B, D // DT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, DT, COUT, HW), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            x_scratch,
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, dy)
    if kstack:
        # rows (kd, kw, ci) × cols (kh, co) → (kd, kh, kw, ci, co)
        dw = dw_flat.reshape(3, 3, CIN, 3, COUT)
        dw = jnp.transpose(dw, (0, 3, 1, 2, 4))
    else:
        # rows (kd, ci) × cols (kh, kw, co) → (kd, kh, kw, ci, co)
        dw = dw_flat.reshape(3, CIN, 3, 3, COUT)
        dw = jnp.transpose(dw, (0, 2, 3, 1, 4))
    return dw[:, :, :, :cin_orig, :cout_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_packed(xk: jax.Array, w: jax.Array, bias: jax.Array,
                   wdim: int, interpret: bool = False,
                   wguard: int = 0) -> jax.Array:
    """SAME 3×3×3 conv on a spatial-lane tensor.

    xk: (B, D, Cin, H·W) (see :func:`pack_hw`); w: (3,3,3,Cin,Cout);
    bias: (Cout,); ``wdim`` = W. Returns (B, D, Cout, H·W). Equivalent to
    NDHWC ``lax.conv_general_dilated(..., padding='SAME')`` + bias up to
    layout.

    ``wguard``: the last ``wguard`` columns of every w-row are zero guard
    lanes (data width = wdim - wguard). The kernel then skips the six
    w-mask VPU passes per nine-tap combine and re-zeroes the output guards
    (callers must keep the guard columns zero — PackedConvNormAct's
    epilogue mask restores them after norm/activation).
    """
    return _conv_fwd_impl(xk, w.astype(xk.dtype), bias, wdim, interpret,
                          wguard=wguard)


def _project_guard_cotangent(dy, wdim, wguard):
    """Zero ``dy``'s guard columns. The primal's guard outputs are
    CONSTANTS (identically zero, re-zeroed by the kernel store), so the
    true VJP ignores their cotangents — but downstream ops that reduce over
    all lanes (e.g. ``PackedConvNormAct``'s full-lane InstanceNorm sums)
    deliver nonzero guard components, and the guard-unmasked rolls inside
    the bwd kernels would wrap them into data positions (dx) and the dw/db
    contractions would absorb them. One fused XLA select; wguard=0 is
    free."""
    if not wguard:
        return dy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, dy.shape[-1]), 3)
    return jnp.where(lane % wdim < wdim - wguard, dy,
                     jnp.zeros((), dy.dtype))


def _vjp_fwd(xk, w, bias, wdim, interpret, wguard):
    return conv3x3_packed(xk, w, bias, wdim, interpret, wguard), (xk, w)


def _vjp_bwd(wdim, interpret, wguard, res, dy):
    xk, w = res
    dy = _project_guard_cotangent(dy, wdim, wguard)
    w_flip_t = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    dx = _conv_fwd_impl(
        dy, w_flip_t.astype(dy.dtype),
        jnp.zeros((w.shape[3],), jnp.float32), wdim, interpret,
        wguard=wguard,
    )
    dw = _dw_impl(xk, dy, wdim, interpret, wguard=wguard).astype(w.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 3))
    return dx.astype(xk.dtype), dw, db.astype(jnp.float32)


conv3x3_packed.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_packed_halo(xp: jax.Array, w: jax.Array, bias: jax.Array,
                        wdim: int, interpret: bool = False,
                        wguard: int = 0) -> jax.Array:
    """:func:`conv3x3_packed` on an input that already carries a 1-slice d
    halo on each side (``xp``: (B, D+2, Cin, H·W) → (B, D, Cout, H·W)).

    Space-sharded callers exchange real neighbour slices over the mesh's
    ``space`` axis (``jax.lax.ppermute``) instead of the SAME zero pad —
    the context-parallel analogue for this model family (SURVEY.md §5.7)."""
    return _conv_fwd_impl(xp, w.astype(xp.dtype), bias, wdim, interpret,
                          pad_d=False, wguard=wguard)


def _halo_vjp_fwd(xp, w, bias, wdim, interpret, wguard):
    return conv3x3_packed_halo(xp, w, bias, wdim, interpret, wguard), (xp, w)


def _halo_vjp_bwd(wdim, interpret, wguard, res, dy):
    xp, w = res
    dy = _project_guard_cotangent(dy, wdim, wguard)
    w_flip_t = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    # dxp[j] = Σ_kd w[kd]ᵀ · dy[j-kd], j ∈ [0, D+2): the transposed conv on
    # dy padded by 2 per side, run through the pre-padded fwd impl.
    dyp = jnp.pad(dy, ((0, 0), (2, 2), (0, 0), (0, 0)))
    dxp = _conv_fwd_impl(
        dyp, w_flip_t.astype(dy.dtype),
        jnp.zeros((w.shape[3],), jnp.float32), wdim, interpret, pad_d=False,
        wguard=wguard,
    )
    dw = _dw_impl(xp, dy, wdim, interpret, pad_d=False,
                  wguard=wguard).astype(w.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 3))
    return dxp.astype(xp.dtype), dw, db.astype(jnp.float32)


conv3x3_packed_halo.defvjp(_halo_vjp_fwd, _halo_vjp_bwd)


# ---------------------------------------------------------------------------
# pfold formulation: w-phases folded into the GEMM's M dim
# ---------------------------------------------------------------------------
#
# The legacy/kstack/wguard kernels all emit (COUT, HW) GEMMs: M = Cout = 32
# of the MXU's 128 rows — a hard 25 % utilization ceiling at the generator's
# full-resolution stage shapes, and the measured kernels sit at 22–23 %
# (BENCH_NOTES_r3). This formulation folds the FOUR w-phases of the output
# into M instead: activations live as
#
#     (B, D, 4·C, H·W/4)      channel index = p·C + c  (phase-major),
#                             lane index = h·(W/4) + w4,  w = 4·w4 + p
#
# so one GEMM emits all four phases: M = 4·Cout = 128 — full MXU rows. The
# kw taps become *phase mixing*: output phase p, tap offset o ∈ {-1,0,+1}
# reads input phase p+o, which stays in the same lane for 10 of the 12
# (p, o) pairs; the two wrap pairs (p=0,o=-1 → phase 3 one lane left;
# p=3,o=+1 → phase 0 one lane right) are covered by two extra CIN-row
# shifted strips in the GEMM operand:  K = (kd, [Lm | U·4 | Rp], ci)
# = 18·Cin.  The weight matrix A places w[kd,kh,o+1] at the (p, block(p,o))
# positions and is 50 % dense — so the formulation's ceiling is 50 % of
# peak, 2× the channels-minor kernels', at identical useful FLOPs. kh stays
# a 2-roll/2-mask h-combine on the f32 result (same element count as
# kstack's: 4× the rows, ¼ the lanes).
#
# The fold itself is free: NDHWC (B,D,H,W,C) reshaped to (B,D,H·W/4, 4·C)
# is exactly the phase-major folded tensor, so :func:`pack_hw` performs it
# as the same MXU identity-GEMM relayout the packed path already pays.

_PFOLD_F = 4  # w-fold factor: 4·Cout(32) = 128 = full MXU rows


def _pfold_block(p: int, o: int) -> int:
    """Column block of the (Lm | U0..U3 | Rp) operand for output phase ``p``
    tap offset ``o``: 0 = Lm (phase 3, one lane left), 1+q = U_q, 5 = Rp
    (phase 0, one lane right)."""
    q = p + o
    if q == -1:
        return 0
    if q == _PFOLD_F:
        return 5
    return 1 + q


def _pfold_wmat(w: jax.Array, dtype) -> jax.Array:
    """(3,3,3,Cin,Cout) → A (3·4·Cout, 3·6·Cin): rows (kh, p, co), cols
    (kd, block, ci); zero at the 50 % of (p, block) pairs no tap uses.

    Built by stack/concat rather than ``.at[].set`` — scattering slices of a
    reversed tensor (the dx call passes ``w[::-1,::-1,::-1]``) crashes XLA's
    TPU fusion emitter (``Check failed: window.pad_low[i] == 0``)."""
    CIN, COUT = w.shape[3], w.shape[4]
    F = _PFOLD_F
    z = jnp.zeros((3, COUT, 3, CIN), w.dtype)
    rows = []
    for p in range(F):
        cols = [z] * 6
        for o in (-1, 0, 1):
            # w[kd, kh, o+1, ci, co] → (kh, co, kd, ci)
            cols[_pfold_block(p, o)] = jnp.transpose(
                w[:, :, o + 1], (1, 3, 0, 2))
        rows.append(jnp.stack(cols, axis=3))     # (3, COUT, 3, 6, CIN)
    a = jnp.stack(rows, axis=1)                  # (3, F, COUT, 3, 6, CIN)
    return a.reshape(3 * F * COUT, 3 * 6 * CIN).astype(dtype)


def _build_pfold_strips(xs_vmem, DT, CIN, W4, HW4):
    """Fill the Lm/Rp strips of each slab: the DMA left the folded slab
    (4·CIN rows) at rows [CIN, 5·CIN); row block [0, CIN) gets phase 3
    shifted one lane right (value at w4 = phase3[w4-1], SAME-pad masked) and
    [5·CIN, 6·CIN) gets phase 0 shifted one lane left."""
    lane_in = jax.lax.broadcasted_iota(jnp.int32, (CIN, HW4), 1)
    dtype = xs_vmem.dtype
    for s in range(DT + 2):
        ph3 = xs_vmem[s, pl.ds(4 * CIN, CIN), :].astype(jnp.float32)
        xs_vmem[s, pl.ds(0, CIN), :] = _roll_w_masked(
            ph3, 1, lane_in, W4).astype(dtype)
        ph0 = xs_vmem[s, pl.ds(CIN, CIN), :].astype(jnp.float32)
        xs_vmem[s, pl.ds(5 * CIN, CIN), :] = _roll_w_masked(
            ph0, -1, lane_in, W4).astype(dtype)


def _conv_kernel_pfold(xp_ref, wmat_ref, bias_ref, out_ref, xs_vmem, sem,
                       *, DT, HW4, W4, CIN, COUT):
    """Grid (B, D//DT). xp_ref: (B, D+2, 4·CIN, HW4) folded, d-padded.
    wmat_ref: (12·COUT, 18·CIN) from :func:`_pfold_wmat`. out_ref block:
    (1, DT, 4·COUT, HW4). xs_vmem: (DT+2, 6·CIN, HW4)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    F = _PFOLD_F

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)],
        xs_vmem.at[:, pl.ds(CIN, F * CIN), :], sem,
    )
    dma.start()
    dma.wait()

    _build_pfold_strips(xs_vmem, DT, CIN, W4, HW4)
    M = F * COUT
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, HW4), 1)
    fused = 3 * M * HW4 * 4 <= _YS_BUDGET

    def body(d, _):
        bmat = xs_vmem[pl.ds(d, 3), :, :].reshape(18 * CIN, HW4)
        acc = bias_ref[:] * jnp.ones((M, HW4), jnp.float32)
        if fused:
            ys = jax.lax.dot_general(
                wmat_ref[:], bmat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3·M, HW4), kh-major
            acc = acc + ys[M:2 * M, :]
            acc = acc + _roll_h_masked(ys[:M, :], 1, lane, W4, HW4)
            acc = acc + _roll_h_masked(ys[2 * M:, :], -1, lane, W4, HW4)
        else:
            for kh in range(3):
                y = jax.lax.dot_general(
                    wmat_ref[pl.ds(kh * M, M), :], bmat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + _roll_h_masked(y, 1 - kh, lane, W4, HW4)
        out_ref[0, pl.ds(d, 1), :, :] = (
            acc.astype(out_ref.dtype).reshape(1, M, HW4)
        )
        return 0

    jax.lax.fori_loop(0, DT, body, 0)


def _dw_kernel_pfold(xp_ref, dy_ref, dw_ref, xs_vmem, sem,
                     *, DT, HW4, W4, CIN, COUT):
    """pfold dw: per d-slice ONE GEMM of the (18·CIN, HW4) operand against
    the 3-block h-rolled folded dy stack → (18·CIN, 12·COUT), rows (kd,
    block, ci), cols (kh, p, co); the valid (p, block) pairs are summed to
    taps host-side."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    F = _PFOLD_F
    M = F * COUT

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * DT, DT + 2)],
        xs_vmem.at[:, pl.ds(CIN, F * CIN), :], sem,
    )
    dma.start()
    dma.wait()

    _build_pfold_strips(xs_vmem, DT, CIN, W4, HW4)
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, HW4), 1)

    def body(d, acc):
        bmat = xs_vmem[pl.ds(d, 3), :, :].reshape(18 * CIN, HW4)
        dy0 = dy_ref[0, pl.ds(d, 1), :, :].reshape(M, HW4).astype(
            jnp.float32)
        dys = jnp.concatenate(
            [_roll_h_masked(dy0, kh - 1, lane, W4, HW4) for kh in range(3)],
            axis=0,
        ).astype(xs_vmem.dtype)  # (3·M, HW4), kh-major
        return acc + jax.lax.dot_general(
            bmat, dys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (18·CIN, 3·M)

    acc = jax.lax.fori_loop(0, DT, body, jnp.zeros_like(dw_ref))
    dw_ref[:] = dw_ref[:] + acc


def _pick_dt_pfold(d: int, hw4: int, cin: int, cout: int,
                   itemsize: int = 2) -> int:
    F = _PFOLD_F
    x_slice = 6 * cin * hw4 * itemsize           # strips + folded slab
    o_slice = F * cout * hw4 * itemsize
    temps = 6 * F * cout * hw4 * 4
    for dt in (8, 4, 2, 1):
        total = (dt + 2) * x_slice + 2 * dt * o_slice + temps
        if d % dt == 0 and total <= _VMEM_BUDGET:
            return dt
    return 1


def _pfold_pad_channels(xf: jax.Array, c: int) -> Tuple[jax.Array, int]:
    """Pad the per-phase channel count to a sublane multiple (the kernels
    slice phase blocks at offsets p·CIN). Production channel counts (24, 32,
    96) need no pad; the general path un-interleaves, pads, re-interleaves —
    test-shape only."""
    c8 = _sub(c)
    if c8 == c:
        return xf, c
    b, d, fc, hw4 = xf.shape
    x5 = xf.reshape(b, d, _PFOLD_F, c, hw4)
    x5 = jnp.pad(x5, ((0, 0), (0, 0), (0, 0), (0, c8 - c), (0, 0)))
    return x5.reshape(b, d, _PFOLD_F * c8, hw4), c8


def _pfold_fwd_impl(xf: jax.Array, w: jax.Array, bias: jax.Array,
                    w4dim: int, interpret: bool = False,
                    pad_d: bool = True) -> jax.Array:
    """xf: (B, D, 4·CIN, HW4) phase-major folded; returns (B, D, 4·COUT,
    HW4). ``pad_d=False``: xf already carries a 1-slice d halo per side."""
    B, D, FCIN, HW4 = xf.shape
    if not pad_d:
        D = D - 2
    F = _PFOLD_F
    CIN = FCIN // F
    COUT = w.shape[4]
    assert FCIN == F * CIN and HW4 % 128 == 0 and HW4 % w4dim == 0
    xf, cin8 = _pfold_pad_channels(xf, CIN)
    if cin8 != CIN:
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, cin8 - CIN), (0, 0)))
        CIN = cin8
    cout8 = _sub(COUT)
    if cout8 != COUT:
        w = jnp.pad(w, ((0, 0),) * 4 + ((0, cout8 - COUT),))
        bias = jnp.pad(bias, (0, cout8 - COUT))
    cout_orig = COUT
    COUT = cout8
    DT = _pick_dt_pfold(D, HW4, CIN, COUT, xf.dtype.itemsize)

    xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0))) if pad_d else xf
    # bias per output row (p, co): tiled phase-major
    b_col = jnp.tile(bias.astype(jnp.float32), F).reshape(F * COUT, 1)

    kernel = functools.partial(
        _conv_kernel_pfold, DT=DT, HW4=HW4, W4=w4dim, CIN=CIN, COUT=COUT,
    )
    wmat = _pfold_wmat(w, xf.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, D // DT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * F * COUT, 18 * CIN), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F * COUT, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, DT, F * COUT, HW4), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, F * COUT, HW4), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((DT + 2, 6 * CIN, HW4), xf.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, wmat, b_col)
    if cout_orig != COUT:
        out = out.reshape(B, D, F, COUT, HW4)[:, :, :, :cout_orig]
        out = out.reshape(B, D, F * cout_orig, HW4)
    return out


def _pfold_dw_impl(xf: jax.Array, dy: jax.Array, w4dim: int,
                   interpret: bool = False, pad_d: bool = True) -> jax.Array:
    B, D, FCIN, HW4 = xf.shape
    if not pad_d:
        D = D - 2
    F = _PFOLD_F
    CIN = FCIN // F
    COUT = dy.shape[2] // F
    xf, cin8 = _pfold_pad_channels(xf, CIN)
    cin_orig, CIN = CIN, cin8
    dy, cout8 = _pfold_pad_channels(dy, COUT)
    cout_orig, COUT = COUT, cout8
    DT = _pick_dt_pfold(D, HW4, CIN, COUT, xf.dtype.itemsize)

    xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0))) if pad_d else xf
    kernel = functools.partial(
        _dw_kernel_pfold, DT=DT, HW4=HW4, W4=w4dim, CIN=CIN, COUT=COUT,
    )
    dw_flat = pl.pallas_call(
        kernel,
        grid=(B, D // DT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, DT, F * COUT, HW4), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((18 * CIN, 3 * F * COUT),
                               lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((18 * CIN, 3 * F * COUT),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((DT + 2, 6 * CIN, HW4), xf.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, dy)
    # rows (kd, block, ci) × cols (kh, p, co): each (p, o) pair contributes
    # to tap (kh, o+1) from its block — sum the 4 phases per tap.
    m = dw_flat.reshape(3, 6, CIN, 3, F, COUT)
    dw = jnp.zeros((3, 3, 3, CIN, COUT), jnp.float32)
    for o in (-1, 0, 1):
        tap = sum(
            jnp.transpose(m[:, _pfold_block(p, o), :, :, p, :], (0, 2, 1, 3))
            for p in range(F)
        )  # (kd, kh, ci, co)
        dw = dw.at[:, :, o + 1].set(tap)
    return dw[:, :, :, :cin_orig, :cout_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_pfold(xf: jax.Array, w: jax.Array, bias: jax.Array,
                  w4dim: int, interpret: bool = False) -> jax.Array:
    """SAME 3×3×3 conv on a phase-major w-folded tensor.

    xf: (B, D, 4·Cin, H·(W/4)) (see :func:`fold4_pack`); w: (3,3,3,Cin,
    Cout); bias: (Cout,); ``w4dim`` = W/4. Returns (B, D, 4·Cout, H·W/4).
    Equivalent to NDHWC ``lax.conv_general_dilated(..., 'SAME')`` + bias up
    to layout; GEMM M = 4·Cout = full MXU rows at the Cout=32 stages (2× the
    channels-minor formulation ceiling — see the section comment)."""
    return _pfold_fwd_impl(xf, w.astype(xf.dtype), bias, w4dim, interpret)


def _flip_t_stacked(w: jax.Array) -> jax.Array:
    """``transpose(w[::-1,::-1,::-1], (0,1,2,4,3))`` built from static
    slices + stacks: feeding a ``rev`` of ``w`` into :func:`_pfold_wmat`'s
    stack/concat graph crashes XLA's TPU fusion emitter (``Check failed:
    window.pad_low[i] == 0 (-1 vs. 0)``); the stacked form lowers clean."""
    s = jnp.stack([w[2], w[1], w[0]], axis=0)
    s = jnp.stack([s[:, 2], s[:, 1], s[:, 0]], axis=1)
    s = jnp.stack([s[:, :, 2], s[:, :, 1], s[:, :, 0]], axis=2)
    return jnp.transpose(s, (0, 1, 2, 4, 3))


def _pfold_vjp_fwd(xf, w, bias, w4dim, interpret):
    return conv3x3_pfold(xf, w, bias, w4dim, interpret), (xf, w)


def _pfold_vjp_bwd(w4dim, interpret, res, dy):
    xf, w = res
    w_flip_t = _flip_t_stacked(w)
    dx = _pfold_fwd_impl(
        dy, w_flip_t.astype(dy.dtype),
        jnp.zeros((w.shape[3],), jnp.float32), w4dim, interpret,
    )
    dw = _pfold_dw_impl(xf, dy, w4dim, interpret).astype(w.dtype)
    F = _PFOLD_F
    b_, d_, fco, hw4 = dy.shape
    db = jnp.sum(
        dy.astype(jnp.float32).reshape(b_, d_, F, fco // F, hw4),
        axis=(0, 1, 2, 4))
    return dx.astype(xf.dtype), dw, db.astype(jnp.float32)


conv3x3_pfold.defvjp(_pfold_vjp_fwd, _pfold_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_pfold_halo(xp: jax.Array, w: jax.Array, bias: jax.Array,
                       w4dim: int, interpret: bool = False) -> jax.Array:
    """:func:`conv3x3_pfold` on an input carrying a 1-slice d halo per side
    (space-sharded callers exchange real neighbour slices)."""
    return _pfold_fwd_impl(xp, w.astype(xp.dtype), bias, w4dim, interpret,
                           pad_d=False)


def _pfold_halo_vjp_fwd(xp, w, bias, w4dim, interpret):
    return conv3x3_pfold_halo(xp, w, bias, w4dim, interpret), (xp, w)


def _pfold_halo_vjp_bwd(w4dim, interpret, res, dy):
    xp, w = res
    w_flip_t = _flip_t_stacked(w)
    dyp = jnp.pad(dy, ((0, 0), (2, 2), (0, 0), (0, 0)))
    dxp = _pfold_fwd_impl(
        dyp, w_flip_t.astype(dy.dtype),
        jnp.zeros((w.shape[3],), jnp.float32), w4dim, interpret, pad_d=False,
    )
    dw = _pfold_dw_impl(xp, dy, w4dim, interpret, pad_d=False).astype(
        w.dtype)
    F = _PFOLD_F
    b_, d_, fco, hw4 = dy.shape
    db = jnp.sum(
        dy.astype(jnp.float32).reshape(b_, d_, F, fco // F, hw4),
        axis=(0, 1, 2, 4))
    return dxp.astype(xp.dtype), dw, db.astype(jnp.float32)


conv3x3_pfold_halo.defvjp(_pfold_halo_vjp_fwd, _pfold_halo_vjp_bwd)


def fold4_pack(x: jax.Array) -> jax.Array:
    """NDHWC (B, D, H, W, C) → phase-major w-folded (B, D, 4·C, H·W/4).

    The fold is a free reshape — (B,D,H,W/4,4·C) with channel index
    p·C + c — followed by the same MXU identity-GEMM relayout as
    :func:`pack_hw`."""
    b, d, h, w, c = x.shape
    F = _PFOLD_F
    assert w % F == 0
    return pack_hw(x.reshape(b, d, h, w // F, F * c))


def unfold4_unpack(xf: jax.Array, w4dim: int) -> jax.Array:
    """Inverse of :func:`fold4_pack` (``w4dim`` = W/4)."""
    b, d, fc, hw4 = xf.shape
    F = _PFOLD_F
    x5 = unpack_hw(xf, w4dim)          # (B, D, H, W/4, 4·C)
    return x5.reshape(b, d, hw4 // w4dim, w4dim * F, fc // F)


def pfold_supported(shape: Tuple[int, ...]) -> bool:
    """Static gate: NDHWC shape (B, D, H, W, C) the pfold kernel can take."""
    if len(shape) != 5:
        return False
    _, d, h, w, c = shape
    F = _PFOLD_F
    return (w % F == 0 and (h * w // F) % 128 == 0 and w // F >= 2
            and h >= 3 and d >= 1 and F * c <= 512)


# ---------------------------------------------------------------------------
# Multi-chip SPMD: shard_map wrappers over the data axis
# ---------------------------------------------------------------------------
#
# A Pallas call is an opaque custom call: GSPMD cannot partition it, so under
# a multi-device jit the packed path used to be unavailable (round-2 VERDICT
# missing #3). Per-sample convs need no halo on the batch axis, so the fix is
# the reference's DDP contract (``/root/reference/src/train.py:30-32``) done
# the TPU way: ``shard_map`` the kernel over the mesh's ``data`` axis — each
# device runs the kernel on its local batch shard, weights ride in
# replicated, and shard_map's transpose inserts the gradient ``psum`` for the
# replicated operands automatically.
#
# The mesh is a trace-time property of the *step*, not of the model, so it is
# carried by a context (`packed_conv_mesh`) that ``make_train_step`` /
# ``make_eval_step`` / ``make_predict_fn`` set while tracing; model code
# calls the ``*_auto`` variants which fall back to the plain single-device
# kernel when no mesh is active (or the batch does not divide).

_CONV_MESH: list = [None]   # [(Mesh, axis)] — innermost active context


class packed_conv_mesh:
    """Context manager: route packed convs through ``shard_map`` over
    ``mesh``'s ``axis`` (batch) — and, when ``space_axis`` is given, shard
    the packed d dim over it with ppermute halo exchange — while tracing
    under a multi-device jit."""

    def __init__(self, mesh, axis: str = "data",
                 space_axis: str | None = None):
        if mesh is not None and space_axis is not None:
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            if sizes.get(space_axis, 1) <= 1:
                space_axis = None
        self.entry = (mesh, axis, space_axis) if mesh is not None else None

    def __enter__(self):
        _CONV_MESH.append(self.entry)
        return self

    def __exit__(self, *exc):
        _CONV_MESH.pop()
        return False


def _active_conv_mesh(batch: int, d: Optional[int] = None):
    """(mesh, axis, space_axis) when an active context shards ``batch``
    (and, for the d-sharded variant, ``d``) cleanly."""
    entry = _CONV_MESH[-1]
    if entry is None:
        return None
    mesh, axis, space_axis = entry
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n = sizes.get(axis, 1)
    ns = sizes.get(space_axis, 1) if space_axis else 1
    if space_axis is not None:
        if d is None or ns <= 1 or d % ns != 0 or (d // ns) < 1:
            return None if n <= 1 else (
                (mesh, axis, None) if batch % n == 0 else None
            )
    if n * ns <= 1 or batch % n != 0:
        return None
    return mesh, axis, space_axis


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as smap
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as smap
    try:
        return smap(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_vma=False)
    except TypeError:  # pragma: no cover - older jax uses check_rep
        return smap(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def conv3x3_packed_auto(xk: jax.Array, w: jax.Array, bias: jax.Array,
                        wdim: int, interpret: bool = False,
                        wguard: int = 0) -> jax.Array:
    """:func:`conv3x3_packed`, shard_mapped over the active mesh's data
    axis — and its ``space`` axis (d-sharded, ppermute halo exchange) when
    the :class:`packed_conv_mesh` context names one — else the plain
    kernel."""
    active = _active_conv_mesh(xk.shape[0], xk.shape[1])
    if active is None:
        return conv3x3_packed(xk, w, bias, wdim, interpret, wguard)
    mesh, axis, space_axis = active
    from jax.sharding import PartitionSpec as P

    if space_axis is None:
        def f(xk_, w_, b_):
            return conv3x3_packed(xk_, w_, b_, wdim, interpret, wguard)

        return _shard_map(
            f, mesh, in_specs=(P(axis), P(), P()), out_specs=P(axis)
        )(xk, w, bias)

    nspace = dict(zip(mesh.axis_names, mesh.devices.shape))[space_axis]

    def f_halo(xk_loc, w_, b_):
        # Exchange 1-slice d halos with space neighbours; edge shards
        # receive zeros from ppermute — exactly the SAME zero pad.
        fwd = [(i, i + 1) for i in range(nspace - 1)]
        bwd = [(i + 1, i) for i in range(nspace - 1)]
        lo = jax.lax.ppermute(xk_loc[:, -1:], space_axis, fwd)
        hi = jax.lax.ppermute(xk_loc[:, :1], space_axis, bwd)
        xp = jnp.concatenate([lo, xk_loc, hi], axis=1)
        return conv3x3_packed_halo(xp, w_, b_, wdim, interpret, wguard)

    return _shard_map(
        f_halo, mesh,
        in_specs=(P(axis, space_axis), P(), P()),
        out_specs=P(axis, space_axis),
    )(xk, w, bias)


def pack_hw_auto(x: jax.Array) -> jax.Array:
    """:func:`pack_hw` under the active shard_map context (per-(b,d) op —
    no halo needed on either axis)."""
    active = _active_conv_mesh(x.shape[0], x.shape[1])
    if active is None:
        return pack_hw(x)
    mesh, axis, space_axis = active
    from jax.sharding import PartitionSpec as P

    spec = P(axis, space_axis) if space_axis else P(axis)
    return _shard_map(pack_hw, mesh, in_specs=(spec,),
                      out_specs=spec)(x)


def unpack_hw_auto(xk: jax.Array, wdim: int) -> jax.Array:
    """:func:`unpack_hw` under the active shard_map context."""
    active = _active_conv_mesh(xk.shape[0], xk.shape[1])
    if active is None:
        return unpack_hw(xk, wdim)
    mesh, axis, space_axis = active
    from jax.sharding import PartitionSpec as P

    spec = P(axis, space_axis) if space_axis else P(axis)
    return _shard_map(lambda a: unpack_hw(a, wdim), mesh,
                      in_specs=(spec,), out_specs=spec)(xk)


# ---------------------------------------------------------------------------
# Layout helpers + shape gate
# ---------------------------------------------------------------------------

def _pack_kernel(x_ref, eye_ref, o_ref, *, DB, C, HW):
    """(1, DB, HW, C) → (1, DB, C, HW) via identity GEMMs — the MXU does
    the transpose near memory roofline (XLA's minor-dim transpose costs
    ~5 ms per 100 MB on v5e). DB d-slices per grid cell amortise the
    per-cell pipeline overhead."""
    for d in range(DB):
        slab = x_ref[0, d, :, :]                  # (HW, C)
        o_ref[0, d, :, :] = jax.lax.dot_general(
            eye_ref[:], slab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _unpack_kernel(x_ref, eye_ref, o_ref, *, DB, C, HW):
    """(1, DB, C, HW) → (1, DB, HW, C) via identity GEMMs."""
    for d in range(DB):
        slab = x_ref[0, d, :, :]                  # (C, HW)
        o_ref[0, d, :, :] = jax.lax.dot_general(
            slab, eye_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mxu_transpose_ok(c: int, hw: int) -> bool:
    return (jax.default_backend() == "tpu" and hw % 128 == 0
            and 8 <= c <= 256)


def _pick_db(d: int, c: int, hw: int) -> int:
    """d-slices per pack cell: both layouts live in VMEM (the channels-
    minor side tile-pads C to 128 lanes)."""
    per = (hw * 128 + _sub(c) * hw) * 2 * 2      # in + out, double-buffered
    for db in (8, 4, 2, 1):
        if d % db == 0 and db * per <= _VMEM_BUDGET:
            return db
    return 1


@jax.custom_vjp
def pack_hw(x: jax.Array) -> jax.Array:
    """NDHWC (B, D, H, W, C) → spatial-lane (B, D, C, H·W).

    On TPU the channels-minor → spatial-minor relayout runs as a Pallas
    identity-GEMM (MXU transpose); elsewhere it is a plain XLA transpose."""
    b, d, h, w, c = x.shape
    hw = h * w
    if _mxu_transpose_ok(c, hw):
        db = _pick_db(d, c, hw)
        xs = x.reshape(b, d, hw, c)
        eye = jnp.eye(c, dtype=x.dtype)
        return pl.pallas_call(
            functools.partial(_pack_kernel, DB=db, C=c, HW=hw),
            grid=(b, d // db),
            in_specs=[
                pl.BlockSpec((1, db, hw, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, db, c, hw), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, d, c, hw), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(xs, eye)
    x = jnp.transpose(x, (0, 1, 4, 2, 3))
    return x.reshape(b, d, c, hw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def unpack_hw(xk: jax.Array, wdim: int) -> jax.Array:
    """Inverse of :func:`pack_hw`."""
    b, d, c, hw = xk.shape
    if _mxu_transpose_ok(c, hw):
        db = _pick_db(d, c, hw)
        eye = jnp.eye(c, dtype=xk.dtype)
        xs = pl.pallas_call(
            functools.partial(_unpack_kernel, DB=db, C=c, HW=hw),
            grid=(b, d // db),
            in_specs=[
                pl.BlockSpec((1, db, c, hw), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, db, hw, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, d, hw, c), xk.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(xk, eye)
        return xs.reshape(b, d, hw // wdim, wdim, c)
    x = xk.reshape(b, d, c, hw // wdim, wdim)
    return jnp.transpose(x, (0, 1, 3, 4, 2))


def _pack_vjp_fwd(x):
    return pack_hw(x), x.shape


def _pack_vjp_bwd(shape, dy):
    # pack is a permutation: the cotangent is the inverse permutation.
    return (unpack_hw(dy, shape[3]),)


pack_hw.defvjp(_pack_vjp_fwd, _pack_vjp_bwd)


def _unpack_vjp_fwd(xk, wdim):
    return unpack_hw(xk, wdim), None


def _unpack_vjp_bwd(wdim, _, dy):
    return (pack_hw(dy),)


unpack_hw.defvjp(_unpack_vjp_fwd, _unpack_vjp_bwd)


def packed_supported(shape: Tuple[int, ...]) -> bool:
    """Static gate: NDHWC shape (B, D, H, W, C) the kernel can take."""
    if len(shape) != 5:
        return False
    _, d, h, w, c = shape
    return (h * w) % 128 == 0 and h >= 3 and w >= 3 and d >= 1 and c <= 128


def conv3x3_reference_packed(xk, w, bias, wdim):
    """XLA reference for tests: same math via the NDHWC conv."""
    x = unpack_hw(xk, wdim)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return pack_hw(y + bias.astype(y.dtype))
