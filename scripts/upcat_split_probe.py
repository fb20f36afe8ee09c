"""Probe: replace the upcat pair's concat+conv(96→32) with the linearity
split conv(skip 32→32) + conv(up 64→32) + add — eliminating the 96-ch
concat materialisation (fwd) and its backward slice, at identical GEMM
FLOPs (the K dim splits). Param tree unchanged (the weight is sliced at
call time).

Run on the attached TPU: python scripts/upcat_split_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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


def main():
    import unet_bssfp_tpu.ops.pallas.conv3d as c3

    log(f"devices: {jax.devices()}")
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B, D, H, W = 8, 64, 64, 64
    C1, C2, COUT = 32, 64, 32
    k1, k2, k3, k4 = jax.random.split(key, 4)
    skip = jax.random.normal(k1, (B, D, C1, H * W), jnp.float32).astype(dt)
    up = jax.random.normal(k2, (B, D, C2, H * W), jnp.float32).astype(dt)
    w = jax.random.normal(k3, (3, 3, 3, C1 + C2, COUT), jnp.float32) * 0.05
    bias = jax.random.normal(k4, (COUT,), jnp.float32) * 0.05

    def concat_form(s, u, w_, b_):
        xk = jnp.concatenate([s, u], axis=2)
        return c3.conv3x3_packed(xk, w_, b_, W)

    def split_form(s, u, w_, b_):
        y1 = c3.conv3x3_packed(s, w_[:, :, :, :C1], b_, W)
        y2 = c3.conv3x3_packed(
            u, w_[:, :, :, C1:], jnp.zeros((COUT,), jnp.float32), W)
        return y1 + y2

    jc = jax.jit(concat_form)
    js = jax.jit(split_form)
    t_c = two_point(jc, skip, up, w, bias) * 1e3
    t_s = two_point(js, skip, up, w, bias) * 1e3
    err = jnp.max(jnp.abs(jc(skip, up, w, bias).astype(jnp.float32)
                          - js(skip, up, w, bias).astype(jnp.float32)))
    log(f"fwd: concat {t_c:6.2f}  split {t_s:6.2f} ({t_c/t_s:4.2f}x)  "
        f"maxdiff {float(jax.device_get(err)):.2e}")

    def fb(form):
        def f(s, u, w_, b_):
            def loss(s_, u_, w__, b__):
                return jnp.sum(form(s_, u_, w__, b__).astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(s, u, w_, b_)
        return jax.jit(f)

    tb_c = two_point(fb(concat_form), skip, up, w, bias) * 1e3
    tb_s = two_point(fb(split_form), skip, up, w, bias) * 1e3
    log(f"f+b: concat {tb_c:6.2f}  split {tb_s:6.2f} ({tb_c/tb_s:4.2f}x)")


if __name__ == "__main__":
    main()
