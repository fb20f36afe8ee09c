#!/usr/bin/env python3
"""Probe formulations of the discriminator's k4s2 convs on TPU.

The PatchGAN chain (reference ``src/model.py:68-92``) is five 4³-stride-2
convs; measured 7.2 ms fwd+bwd in the GAN step (BENCH_NOTES_r2). A k4s2p1
conv is exactly a *shifted* space-to-depth fold (x_f(q,p) = x(2q+p-1))
followed by a dense 2³ stride-1 VALID conv over the folded channels — same
FLOPs, no structural zeros. This script times both forms (fwd and fwd+bwd)
per disc stage to see whether XLA lowers the folded form better.

Usage: python scripts/disc_conv_probe.py [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    scalar = leaf.ravel()[0] if leaf.ndim else leaf
    return np.asarray(jax.device_get(scalar))


def two_point(fn, args, steps, warmup=2):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(warmup + steps):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / steps


def conv_k4s2(x, w):
    """Plain NDHWC k4s2 pad-1 conv; w: (4,4,4,Cin,Cout)."""
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def shifted_s2d(x):
    """x (B,D,H,W,C) → (B,D/2,H/2,W/2,8C) with x_f(q,p)=x(2q+p-1):
    phase p∈{0,1} per axis, index shifted by -1 (zero-padded)."""
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # slot (q, p) takes xp[2q+p] = x(2q+p-1); extent needs q in [0, d/2]
    # (one extra cell at the high end for the k=2 tap)
    def fold_axis(a, axis, n_half):
        # build phases: a has padded length n+2 on `axis`
        sl0 = [slice(None)] * a.ndim
        sl1 = [slice(None)] * a.ndim
        sl0[axis] = slice(0, 2 * (n_half + 1), 2)      # p=0: xp[0,2,4..]
        sl1[axis] = slice(1, 2 * (n_half + 1), 2)      # p=1: xp[1,3,5..]
        return jnp.concatenate([a[tuple(sl0)], a[tuple(sl1)]], axis=-1)

    y = fold_axis(xp, 1, d // 2)
    y = fold_axis(y, 2, h // 2)
    y = fold_axis(y, 3, w // 2)
    return y  # (B, d/2+1, h/2+1, w/2+1, 8C)


def fold_kernel_k4(w):
    """(4,4,4,Cin,Cout) → (2,2,2, 8*Cin, Cout) for the shifted fold.

    Folded tap (t, p) on an axis corresponds to original k = 2t + p.
    Channel order matches shifted_s2d: phase-major last-axis concat per
    axis, applied d→h→w, so folded channel index = ((pd*2+ph)*2+pw)*Cin+ci
    — wait: concat appends phase blocks on the channel axis per axis fold;
    after folding d,h,w the layout is [pw-major [ph [pd [c]]]] reversed —
    built here by construction to match fold order exactly.
    """
    cin, cout = w.shape[3], w.shape[4]
    wf = np.zeros((2, 2, 2, 8 * cin, cout), w.dtype)
    wn = np.asarray(w)
    for kd in range(4):
        td, pd = divmod(kd, 2)
        for kh in range(4):
            th, ph = divmod(kh, 2)
            for kw in range(4):
                tw, pw = divmod(kw, 2)
                # channel block: folds applied d, then h, then w; each
                # concat puts p=1 in the upper half of channels at that
                # stage → block index = pw*4 + ph*2 + pd
                blk = pw * 4 + ph * 2 + pd
                wf[td, th, tw, blk * cin:(blk + 1) * cin, :] = (
                    wn[kd, kh, kw]
                )
    return jnp.asarray(wf)


def conv_folded(xf, wf):
    return jax.lax.conv_general_dilated(
        xf, wf, (1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--check", action="store_true", help="numerics only")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    stages = [  # (side, cin, cout) — disc chain on 64³ patches, batch 8
        (64, 30, 32),
        (32, 32, 64),
        (16, 64, 128),
        (8, 128, 256),
        (4, 256, 512),
    ]
    B = 8
    for side, cin, cout in stages:
        check_only = args.check or jax.default_backend() != "tpu"
        if check_only:
            side, B = min(side, 8), 2    # CPU numerics at small shapes
        k = jax.random.PRNGKey(side)
        w = jax.random.normal(k, (4, 4, 4, cin, cout), jnp.float32) * 0.05
        wf = fold_kernel_k4(w)

        @jax.jit
        def data(kk):
            return jax.random.normal(
                kk, (B, side, side, side, cin), jnp.float32)

        x = data(jax.random.fold_in(k, 1))

        if check_only:
            ref = conv_k4s2(x, w)
            got = conv_folded(shifted_s2d(x), wf)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
            print(f"stage {side}³ {cin}->{cout}: numerics OK", flush=True)
            continue

        xb = x.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        wfb = wf.astype(jnp.bfloat16)

        f_plain = jax.jit(lambda x_, w_: conv_k4s2(x_, w_))
        f_fold = jax.jit(
            lambda x_, w_: conv_folded(shifted_s2d(x_), w_))
        g_plain = jax.jit(lambda x_, w_: jax.grad(
            lambda a, b: jnp.sum(conv_k4s2(a, b).astype(jnp.float32) ** 2),
            argnums=(0, 1))(x_, w_))
        g_fold = jax.jit(lambda x_, w_: jax.grad(
            lambda a, b: jnp.sum(
                conv_folded(shifted_s2d(a), b).astype(jnp.float32) ** 2),
            argnums=(0, 1))(x_, w_))

        tp = two_point(f_plain, (xb, wb), args.steps)
        tf = two_point(f_fold, (xb, wfb), args.steps)
        tpg = two_point(g_plain, (xb, wb), args.steps)
        tfg = two_point(g_fold, (xb, wfb), args.steps)
        print(
            f"stage {side:3d}³ {cin:3d}->{cout:3d}: "
            f"fwd plain {tp*1e3:6.2f} folded {tf*1e3:6.2f} ms "
            f"({tp/tf:4.2f}x) | fwd+bwd plain {tpg*1e3:6.2f} "
            f"folded {tfg*1e3:6.2f} ms ({tpg/tfg:4.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
