"""Per-stage timing of the CURRENT packed generator (the parity-step conv
path): each stage timed with the exact module classes unet.py wires up, at
the exact shapes of the batch-8 64³ parity step. Locates where the
84 ms gen fwd+bwd goes now that the full-res stages run the Pallas kernel.

Run on the attached TPU: python scripts/stage_attrib.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK = 197e12  # v5e bf16


def two_point(fn, *args, n_short=3, n_long=13):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short)


def bench_mod(name, mod, xs, macs):
    """Time fwd and fwd+bwd (d/dparams, quadratic loss) of a module."""
    params = mod.init(jax.random.PRNGKey(0), *xs, False)

    @jax.jit
    def fwd(p, *xs):
        return mod.apply(p, *xs, False)

    @jax.jit
    def fwd_bwd(p, *xs):
        def loss(p):
            y = mod.apply(p, *xs, False).astype(jnp.float32)
            return jnp.sum(y * y)
        return jax.grad(loss)(p)

    dt_f = two_point(fwd, params, *xs)
    dt_b = two_point(fwd_bwd, params, *xs)
    log(f"{name}: fwd {dt_f*1e3:6.2f} ms ({2*macs/dt_f/PEAK*100:5.1f}%) | "
        f"fwd+bwd {dt_b*1e3:6.2f} ms ({6*macs/dt_b/PEAK*100:5.1f}%)")
    return dt_f, dt_b


def main():
    from unet_bssfp_tpu.models.layers import TwoConv, UpCat
    from unet_bssfp_tpu.models.packed_layers import (
        PackedFinalConv, PackedTwoConv, PackedUpCat,
    )
    from unet_bssfp_tpu.ops.pallas.conv3d import pack_hw_auto

    log(f"devices: {jax.devices()}")
    B = 8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def rnd(shape):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32).astype(dt)
        )(key)

    def mac2(res, cin, cmid, cout=None):
        cout = cout if cout is not None else cmid
        return B * res**3 * 27 * (cin * cmid + cmid * cout)

    tot_f = tot_b = 0.0

    # conv_0: PackedTwoConv 24->32 @ 64^3
    x = rnd((B, 64, 64, 64, 24))
    f, b = bench_mod("conv_0  pk 64^3  24->32",
                     PackedTwoConv(32, dtype=dt), (x,), mac2(64, 24, 32))
    tot_f += f; tot_b += b

    # down_1 convs (PooledConvs->TwoConv): 32->64 @ 32^3
    x = rnd((B, 32, 32, 32, 32))
    f, b = bench_mod("down_1  tc 32^3  32->64",
                     TwoConv(64, dtype=dt), (x,), mac2(32, 32, 64))
    tot_f += f; tot_b += b

    # down_2..4 = maxpool + TwoConv (pool is cheap; time TwoConv at the
    # post-pool res)
    for res, cin, cout in ((16, 64, 128), (8, 128, 256), (4, 256, 512)):
        x = rnd((B, res, res, res, cin))
        f, b = bench_mod(f"down_{res:<2} tc {res}^3 {cin}->{cout}",
                         TwoConv(cout, dtype=dt), (x,), mac2(res, cin, cout))
        tot_f += f; tot_b += b

    # upcat_4..2 (XLA UpCat: deconv + concat + TwoConv)
    for res, cin, skipc, feat, upf in (
        (4, 512, 256, 256, 256),
        (8, 256, 128, 128, 128),
        (16, 128, 64, 64, 64),
    ):
        x = rnd((B, res, res, res, cin))
        s = rnd((B, 2 * res, 2 * res, 2 * res, skipc))
        macs = (B * (2 * res) ** 3 * (8 * cin * upf // 8       # deconv k2s2
                                      + 27 * ((skipc + upf) * feat
                                              + feat * feat)))
        f, b = bench_mod(
            f"upcat   uc {2*res}^3 {skipc+upf}->{feat}",
            UpCat(feat, upf, dtype=dt), (x, s), macs)
        tot_f += f; tot_b += b

    # upcat_1 packed: deconv 64->64 @32^3 -> 64^3, concat skip 32 -> 96->32
    x = rnd((B, 32, 32, 32, 64))
    sk = jax.jit(pack_hw_auto)(rnd((B, 64, 64, 64, 32)))
    macs = (B * 64**3 * (8 * 64 * 64 // 8 + 27 * (96 * 32 + 32 * 32)))
    f, b = bench_mod("upcat_1 pk 64^3  96->32",
                     PackedUpCat(32, 64, 64, dtype=dt), (x, sk), macs)
    tot_f += f; tot_b += b

    # final conv (1^3, 32->6) on packed layout
    xk = jax.jit(pack_hw_auto)(rnd((B, 64, 64, 64, 32)))
    mod = PackedFinalConv(6, dtype=dt)
    params = mod.init(jax.random.PRNGKey(0), xk)

    @jax.jit
    def ffwd(p, xk):
        return mod.apply(p, xk)

    @jax.jit
    def fbwd(p, xk):
        def loss(p):
            y = mod.apply(p, xk).astype(jnp.float32)
            return jnp.sum(y * y)
        return jax.grad(loss)(p)

    f = two_point(ffwd, params, xk)
    b = two_point(fbwd, params, xk)
    log(f"final   pk 64^3  32->6 : fwd {f*1e3:6.2f} ms | fwd+bwd "
        f"{b*1e3:6.2f} ms")
    tot_f += f; tot_b += b

    log(f"stage sum: fwd {tot_f*1e3:6.1f} ms | fwd+bwd {tot_b*1e3:6.1f} ms "
        f"(whole-gen measured 30.2 / 84.1 ms)")


if __name__ == "__main__":
    main()
