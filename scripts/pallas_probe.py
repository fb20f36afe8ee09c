"""Diagnostics for the packed conv kernel on the real chip.

1. pltpu.roll compiled semantics vs jnp.roll (direction check).
2. Tiny conv on-chip vs XLA reference — locate any mismatch.
3. Perf ablations at the conv0a shape: full kernel / no-rotation build /
   fixed-B (GEMM+loop only) — separates VPU-build, rotation, and loop cost.
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def probe_roll():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 1, 1)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    got = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = jnp.roll(x, 1, 1)
    same = bool(jnp.all(got == ref))
    rev = bool(jnp.all(got == jnp.roll(x, -1, 1)))
    print(f"pltpu.roll(+1) == jnp.roll(+1): {same}; == jnp.roll(-1): {rev}",
          flush=True)


def probe_tiny_conv():
    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_packed, conv3x3_reference_packed, pack_hw,
    )
    B, D, H, W, CIN, COUT = 1, 4, 4, 64, 3, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, CIN),
                          jnp.float32) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CIN, COUT),
                          jnp.float32) * 0.3
    bias = jnp.zeros((COUT,), jnp.float32)
    xk = pack_hw(x)
    got = np.asarray(conv3x3_packed(xk, w, bias, W))
    ref = np.asarray(conv3x3_reference_packed(xk, w, bias, W))
    err = np.abs(got - ref)
    print(f"tiny conv max|err| = {err.max():.3e}", flush=True)
    if err.max() > 1e-3:
        idx = np.argwhere(err > 1e-3)
        print(f"  {len(idx)} bad of {err.size}; first 8:", flush=True)
        for i in idx[:8]:
            b, d, hp, co, ln = i
            print(f"   d={d} hp={hp} co={co} lane={ln} (phase={ln//W} "
                  f"w={ln%W}) got={got[tuple(i)]:.4f} "
                  f"ref={ref[tuple(i)]:.4f}", flush=True)
        # lane histogram of errors
        lanes = idx[:, 4]
        print(f"  bad-lane stats: min={lanes.min()} max={lanes.max()} "
              f"edge0={np.sum(lanes % W == 0)} "
              f"edgeW={np.sum(lanes % W == W-1)} "
              f"phase0={np.sum(lanes < W)} "
              f"phase1={np.sum(lanes >= W)}", flush=True)


def probe_perf_ablation():
    """conv0a shape: measure the B-build cost in isolation."""
    B, D, HP, CIN, COUT, W = 8, 64, 32, 24, 32, 64
    DT = 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D + 2, HP, CIN, 128),
                          jnp.bfloat16)
    wstack = jax.random.normal(jax.random.PRNGKey(1),
                               (3 * COUT, 9 * CIN), jnp.bfloat16)

    def mk(mode):
        def kern(xp_ref, w_ref, out_ref, x_vmem, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            dma = pltpu.make_async_copy(
                xp_ref.at[b, pl.ds(i * DT, DT + 2)], x_vmem, sem)
            dma.start()
            dma.wait()

            fixed = x_vmem[0, 0, :, :].astype(jnp.bfloat16)
            fixed_b = jnp.concatenate([fixed] * 9, axis=0)

            def body(idx, _):
                d = idx // HP
                ho = idx % HP
                if mode == "fixed_b":
                    bmat = fixed_b
                elif mode == "build_norot":
                    taps = []
                    for kd in range(3):
                        s0 = x_vmem[pl.ds(d + kd, 1), pl.ds(ho, 1), :, :]
                        s0 = s0.reshape(CIN, 128)
                        taps.extend([s0, s0, s0])
                    bmat = jnp.concatenate(taps, axis=0)
                elif mode == "build_rot":
                    taps = []
                    for kd in range(3):
                        s0 = x_vmem[pl.ds(d + kd, 1), pl.ds(ho, 1), :, :]
                        s0 = s0.reshape(CIN, 128).astype(jnp.float32)
                        taps.append(pltpu.roll(s0, 64, 1))
                        taps.append(s0)
                        taps.append(pltpu.roll(s0, 64, 1))
                    bmat = jnp.concatenate(taps, axis=0).astype(jnp.bfloat16)
                acc = None
                for kw in range(3):
                    y = jax.lax.dot_general(
                        w_ref[pl.ds(kw * COUT, COUT), :], bmat,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
                out_ref[0, pl.ds(d, 1), pl.ds(ho, 1), :, :] = (
                    acc.astype(out_ref.dtype).reshape(1, 1, COUT, 128))
                return 0

            jax.lax.fori_loop(0, DT * HP, body, 0)

        return jax.jit(lambda x, w: pl.pallas_call(
            kern,
            grid=(B, D // DT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3 * COUT, 9 * CIN), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, DT, HP, COUT, 128), lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D, HP, COUT, 128),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((DT + 2, HP, CIN, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(x, w))

    for mode in ("fixed_b", "build_norot", "build_rot"):
        t = timeit(mk(mode), x, wstack)
        print(f"ablation {mode:12s}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    probe_roll()
    probe_tiny_conv()
    probe_perf_ablation()
