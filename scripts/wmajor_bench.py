"""On-chip A/B: Pallas packed-w-major conv vs XLA NDHWC conv at the hot
stage shapes, plus the pack/unpack transpose cost. Data device-generated;
sync via device_get (block_until_ready does not block over the axon
tunnel)."""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK = 197e12


def _sync(out):
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
    return (time.perf_counter() - t0) / iters * 1e3


@functools.partial(jax.jit, static_argnums=0)
def make(shape):
    return jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    B = args.batch

    from unet_bssfp_tpu.ops.pallas.conv3d import (
        conv3x3_packed,
        conv3x3_reference_packed,
        pack_hw,
    )

    # (tag, D, H, W, CIN, COUT)
    cases = [
        ("conv0a 64^3 24->32", 64, 64, 64, 24, 32),
        ("conv0b 64^3 32->32", 64, 64, 64, 32, 32),
        ("up1a   64^3 96->32", 64, 64, 64, 96, 32),
        ("s1a    32^3 64->64", 32, 32, 32, 64, 64),
        ("vol0a  96x128^2 24->32", 96, 128, 128, 24, 32),
    ]
    for tag, D, H, W, CIN, COUT in cases:
        xk = make((B, D, CIN, H * W))
        w = make((3, 3, 3, CIN, COUT))
        bias = jnp.zeros((COUT,), jnp.float32)
        x_cl = make((B, D, H, W, CIN))

        pallas_fwd = jax.jit(
            lambda xk, w, b, W=W: conv3x3_packed(xk, w, b, W))

        def xla_fwd(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), padding="SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y + b.astype(y.dtype)

        xla_fwd_j = jax.jit(xla_fwd)

        if args.check:
            got = pallas_fwd(xk, w, bias).astype(jnp.float32)
            ref = conv3x3_reference_packed(xk, w, bias, W).astype(
                jnp.float32)
            scale = float(jnp.max(jnp.abs(ref)))
            err = float(jnp.max(jnp.abs(got - ref))) / max(scale, 1e-9)
            print(f"{tag}: max rel err = {err:.3e}", flush=True)

        flops = 2 * B * D * H * W * 27 * CIN * COUT
        tp = timeit(pallas_fwd, xk, w, bias, iters=args.iters)
        tx = timeit(xla_fwd_j, x_cl, w, bias, iters=args.iters)

        def pct(t_ms):
            return flops / (t_ms * 1e-3) / PEAK * 100

        print(f"{tag}: pallas {tp:7.2f} ms ({pct(tp):5.1f}% peak) | "
              f"xla {tx:7.2f} ms ({pct(tx):5.1f}%) | {tx/tp:4.2f}x",
              flush=True)

        @jax.jit
        def pallas_fb(xk, w, b, W=W):
            def loss(xk, w, b):
                y = conv3x3_packed(xk, w, b, W)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(xk, w, b)

        @jax.jit
        def xla_fb(x, w, b):
            def loss(x, w, b):
                y = xla_fwd(x, w, b)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(x, w, b)

        tpb = timeit(pallas_fb, xk, w, bias, iters=args.iters)
        txb = timeit(xla_fb, x_cl, w, bias, iters=args.iters)
        print(f"{tag}: f+b pallas {tpb:7.2f} ms | xla {txb:7.2f} ms "
              f"| {txb/tpb:4.2f}x", flush=True)

    # pack/unpack transpose costs at stage-entry sizes
    for shape in [(B, 64, 64, 64, 24), (B, 64, 64, 64, 64)]:
        x_cl = make(shape)
        t = timeit(jax.jit(pack_hw), x_cl, iters=args.iters)
        print(f"pack_hw {shape}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
