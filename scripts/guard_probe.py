"""A/B the guard-column conv layout vs the legacy masked layout at the
parity-step stage shapes: PackedConvNormAct (the real layer, IN + act +
epilogue) and the raw kernel, fwd and fwd+bwd.

Run on the attached TPU: python scripts/guard_probe.py
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
    from unet_bssfp_tpu.models.packed_layers import (
        PackedConvNormAct, guard_cols,
    )

    log(f"devices: {jax.devices()}")
    B, D, H, W = 8, 64, 64, 64
    g = guard_cols(H, W)
    log(f"guard cols for (H={H}, W={W}): {g}")
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    for ci, co in ((24, 32), (32, 32), (96, 32)):
        for tag, wd, wg, hw in (
            ("legacy", W, 0, H * W),
            ("guard ", W + g, g, H * (W + g)),
        ):
            xk = jax.jit(lambda k, hw=hw, ci=ci: jax.random.normal(
                k, (B, D, ci, hw), jnp.float32).astype(dt))(key)
            if wg:
                lane = jnp.arange(hw) % wd
                xk = jnp.where(lane < wd - wg, xk, jnp.zeros((), dt))
            mod = PackedConvNormAct(co, wd, dtype=dt, wguard=wg)
            params = mod.init(jax.random.PRNGKey(1), xk, False)

            @jax.jit
            def fwd(p, xk, mod=mod):
                return mod.apply(p, xk, False)

            @jax.jit
            def fwd_bwd(p, xk, mod=mod):
                def loss(p):
                    y = mod.apply(p, xk, False).astype(jnp.float32)
                    return jnp.sum(y * y)
                return jax.grad(loss)(p)

            f = two_point(fwd, params, xk)
            b = two_point(fwd_bwd, params, xk)
            log(f"{ci:3d}->{co} {tag}: fwd {f*1e3:6.2f} ms | fwd+bwd "
                f"{b*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
