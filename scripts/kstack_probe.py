"""A/B the kstack conv formulation (kw folded into the GEMM K dim via three
w-shifted VMEM slab copies; h-combine only on the f32 result) against the
legacy nine-tap roll-combine, at the parity-step stage shapes.

Run on the attached TPU: python scripts/kstack_probe.py
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

    # (B, D, H, W, CIN, COUT): parity-step stage shapes (conv_0 pair,
    # 32->32 second conv, upcat_1 96->32) + whole-volume + MedicalNet L1.
    cases = [
        ("conv0a 64^3 24->32", (8, 64, 64, 64, 24, 32)),
        ("conv0b 64^3 32->32", (8, 64, 64, 64, 32, 32)),
        ("upcat1 64^3 96->32", (8, 64, 64, 64, 96, 32)),
        ("medl1  32^3 64->64", (48, 32, 32, 32, 64, 64)),
        ("vol 96x128x128 24->32", (1, 96, 128, 128, 24, 32)),
    ]
    for tag, (B, D, H, W, CIN, COUT) in cases:
        k1, k2, k3, key = jax.random.split(key, 4)
        xk = jax.jit(lambda k: jax.random.normal(
            k, (B, D, CIN, H * W), jnp.float32).astype(dt))(k1)
        w = jax.random.normal(k2, (3, 3, 3, CIN, COUT), jnp.float32) * 0.1
        bias = jax.random.normal(k3, (COUT,), jnp.float32)
        dy = jax.jit(lambda k: jax.random.normal(
            k, (B, D, COUT, H * W), jnp.float32).astype(dt))(k1)

        outs = {}
        for form in ("legacy", "kstack"):
            c3._CONV_FORM = form

            @jax.jit
            def fwd(xk_, w_, b_):
                return c3.conv3x3_packed(xk_, w_, b_, W)

            @jax.jit
            def fb(xk_, w_, b_):
                def loss(a, b2, c):
                    return jnp.sum(
                        (c3.conv3x3_packed(a, b2, c, W)
                         * dy.astype(jnp.float32)).astype(jnp.float32))
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    xk_, w_, b_)
                return l, g

            tf = two_point(fwd, xk, w, bias) * 1e3
            tb = two_point(fb, xk, w, bias) * 1e3
            outs[form] = (tf, tb, fwd(xk, w, bias))
            log(f"{tag} {form}: fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms")
        err = float(jnp.max(jnp.abs(
            outs["legacy"][2].astype(jnp.float32)
            - outs["kstack"][2].astype(jnp.float32))))
        sp_f = outs["legacy"][0] / outs["kstack"][0]
        sp_b = outs["legacy"][1] / outs["kstack"][1]
        log(f"{tag}: kstack speedup fwd {sp_f:.2f}x  f+b {sp_b:.2f}x  "
            f"max|diff| {err:.2e}")
    c3._CONV_FORM = "kstack"


if __name__ == "__main__":
    main()
