"""A/B the pfold conv formulation (w-phases folded into the GEMM's M dim:
M = 4·Cout = 128 = full MXU rows, 2× the channels-minor formulation's 25 %
utilization ceiling — see ops/pallas/conv3d.py pfold section) against the
shipped packed kernel at the parity-step stage shapes.

Run on the attached TPU: python scripts/pfold_probe.py
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
    B = 8
    cases = [
        ("conv0 24->32 @64^3", 64, 64, 24, 32),
        ("stage 32->32 @64^3", 64, 64, 32, 32),
        ("upcat 96->32 @64^3", 64, 64, 96, 32),
        ("vol 24->32 @96x128^2", 96, 128, 24, 32),
    ]
    for name, D, HWdim, CIN, COUT in cases:
        H = W = HWdim
        k1, k2, k3, key = jax.random.split(key, 4)
        x = jax.random.normal(k1, (B, D, H, W, CIN), jnp.float32).astype(dt)
        w = (jax.random.normal(k2, (3, 3, 3, CIN, COUT), jnp.float32) * 0.1)
        bias = jax.random.normal(k3, (COUT,), jnp.float32) * 0.1
        xk = jax.jit(c3.pack_hw)(x)
        xf = jax.jit(c3.fold4_pack)(x)

        pk_f = jax.jit(lambda a, w_, b_: c3.conv3x3_packed(a, w_, b_, W))
        pf_f = jax.jit(lambda a, w_, b_: c3.conv3x3_pfold(a, w_, b_, W // 4))
        t_pk = two_point(pk_f, xk, w, bias) * 1e3
        t_pf = two_point(pf_f, xf, w, bias) * 1e3

        def fb(conv, a, w_, b_):
            def loss(a_, w__, b__):
                return jnp.sum(conv(a_, w__, b__).astype(jnp.float32))
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(a, w_, b_)

        pk_fb = jax.jit(lambda a, w_, b_: fb(
            lambda *s: c3.conv3x3_packed(*s, W), a, w_, b_))
        pf_fb = jax.jit(lambda a, w_, b_: fb(
            lambda *s: c3.conv3x3_pfold(*s, W // 4), a, w_, b_))
        tb_pk = two_point(pk_fb, xk, w, bias) * 1e3
        tb_pf = two_point(pf_fb, xf, w, bias) * 1e3

        # exactness cross-check on-chip (both vs the same f32 reduction)
        y_pk = jax.jit(lambda a, w_, b_: c3.unpack_hw(
            c3.conv3x3_packed(a, w_, b_, W), W))(xk, w, bias)
        y_pf = jax.jit(lambda a, w_, b_: c3.unfold4_unpack(
            c3.conv3x3_pfold(a, w_, b_, W // 4), W // 4))(xf, w, bias)
        err = jnp.max(jnp.abs(y_pk.astype(jnp.float32)
                              - y_pf.astype(jnp.float32)))
        log(f"{name}: packed fwd {t_pk:6.2f}  pfold fwd {t_pf:6.2f} "
            f"({t_pk/t_pf:4.2f}x)   f+b {tb_pk:6.2f} vs {tb_pf:6.2f} "
            f"({tb_pk/tb_pf:4.2f}x)   maxdiff {float(jax.device_get(err)):.2e}")

    # relayout costs at the model's stage boundaries
    for name, D, HWdim, C in [("pack 24ch", 64, 64, 24),
                              ("fold4 24ch", 64, 64, 24),
                              ("fold4 96ch", 64, 64, 96)]:
        H = W = HWdim
        x = jax.random.normal(key, (B, D, H, W, C), jnp.float32).astype(dt)
        fn = c3.pack_hw if name.startswith("pack") else c3.fold4_pack
        t = two_point(jax.jit(fn), x) * 1e3
        log(f"{name}: {t:6.2f} ms")


if __name__ == "__main__":
    main()
