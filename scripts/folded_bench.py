"""On-chip A/B of the folded vs plain full-resolution U-Net stages, plus the
full generator fwd/bwd. All data generated on-device (the axon tunnel makes
host transfers expensive). Run solo — the tunnel serves one client well.

Usage: python scripts/folded_bench.py [--batch 8] [--res 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(out):
    """block_until_ready does not block over the axon tunnel (see bench.py);
    pull one element to host to force completion."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from unet_bssfp_tpu.models.folded_layers import FoldedTwoConv, FoldedUpCat
    from unet_bssfp_tpu.models.layers import TwoConv, UpCat
    from unet_bssfp_tpu.models.unet import BasicUNet3D
    from unet_bssfp_tpu.ops.folded import fold_hw, unfold_hw

    B, R = args.batch, args.res
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    @functools.partial(jax.jit, static_argnums=0)
    def make(shape):
        return jax.random.normal(key, shape, dt)

    def bench_pair(tag, plain_mod, folded_mod, x_args_plain, x_args_folded,
                   unfold_spec=None):
        p_params = plain_mod.init(key, *x_args_plain, train=False)

        @jax.jit
        def p_fwd(p, *xs):
            return plain_mod.apply(p, *xs, train=False)

        @jax.jit
        def p_fb(p, *xs):
            def loss(p):
                y = plain_mod.apply(p, *xs, train=False)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        @jax.jit
        def f_fwd(p, *xs):
            return folded_mod.apply(p, *xs, train=False)

        @jax.jit
        def f_fb(p, *xs):
            def loss(p):
                y = folded_mod.apply(p, *xs, train=False)
                if unfold_spec is not None:
                    y = unfold_hw(y, *unfold_spec)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        tp_f = timeit(p_fwd, p_params, *x_args_plain, iters=args.iters)
        tp_b = timeit(p_fb, p_params, *x_args_plain, iters=args.iters)
        tf_f = timeit(f_fwd, p_params, *x_args_folded, iters=args.iters)
        tf_b = timeit(f_fb, p_params, *x_args_folded, iters=args.iters)
        print(f"{tag}: plain fwd {tp_f:7.2f} ms | folded fwd {tf_f:7.2f} ms "
              f"({tp_f / tf_f:4.2f}x) || plain f+b {tp_b:7.2f} ms | "
              f"folded f+b {tf_b:7.2f} ms ({tp_b / tf_b:4.2f}x)", flush=True)

    # stage 0: TwoConv 24->32 @ R^3
    x = make((B, R, R, R, 24))
    bench_pair(
        f"conv_0  {R}^3 24->32",
        TwoConv(32, 0.0, use_fused=False, dtype=dt),
        FoldedTwoConv(32, 0.0, dtype=dt, start_off=0),
        (x,), (x,), unfold_spec=(R, R, -2, -2),
    )

    # upcat_1: (64ch @ R/2^3 up) + skip 32ch @ R^3 -> 32
    u2 = make((B, R // 2, R // 2, R // 2, 64))
    skip = make((B, R, R, R, 32))
    skip_f = jax.jit(lambda s: fold_hw(s, -2, -2))(skip)
    bench_pair(
        f"upcat_1 {R}^3 96->32",
        UpCat(32, 64, 0.0, use_fused=False, dtype=dt),
        FoldedUpCat(32, 64, R, R, -2, 0.0, dtype=dt),
        (u2, skip), (u2, skip_f),
    )

    # full generator-backbone fwd / fwd+bwd
    xin = make((B, R, R, R, 24))
    for folded in (False, True):
        mod = BasicUNet3D(dtype=dt, use_fused=False, folded=folded)
        params = mod.init(key, xin, train=False)

        @jax.jit
        def fwd(p, x):
            return mod.apply(p, x, train=False)

        @jax.jit
        def fb(p, x):
            def loss(p):
                y = mod.apply(p, x, train=False)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        tf = timeit(fwd, params, xin, iters=args.iters)
        tb = timeit(fb, params, xin, iters=args.iters)
        print(f"unet folded={folded}: fwd {tf:7.2f} ms | f+b {tb:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
