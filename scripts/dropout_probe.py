"""Dropout RNG cost in the packed generator: threefry (default) vs rbg vs
unsafe_rbg dropout keys, plus train=True forward cost (the D-phase gen fwd
pays dropout too). Also: max-pool VJP via equality-mask vs XLA
select-and-scatter.

Run on the attached TPU: python scripts/dropout_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


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
    from unet_bssfp_tpu.config import ModelConfig
    from unet_bssfp_tpu.train.state import build_models
    from unet_bssfp_tpu.models.packed_layers import packed_max_pool2
    from unet_bssfp_tpu.ops.pallas.conv3d import pack_hw_auto

    log(f"devices: {jax.devices()}")
    B = 8
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (B, 64, 64, 64, 24), jnp.float32))(key)

    mcfg = ModelConfig()
    gen, _ = build_models("pc-bssfp", mcfg)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "dropout": key}, x, train=True)
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    for tag, mk in [
        ("threefry  ", lambda: jax.random.PRNGKey(1)),
        ("rbg       ", lambda: jax.random.key(1, impl="rbg")),
        ("unsafe_rbg", lambda: jax.random.key(1, impl="unsafe_rbg")),
    ]:
        dk = mk()

        @jax.jit
        def fwd_bwd(p, x, dk):
            def loss(p):
                y, _ = gen.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    rngs={"dropout": dk}, mutable=["batch_stats"],
                )
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return jax.grad(loss)(p)

        @jax.jit
        def fwd(p, x, dk):
            y, _ = gen.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                rngs={"dropout": dk}, mutable=["batch_stats"],
            )
            return y

        try:
            tb = two_point(fwd_bwd, params, x, dk)
            tf = two_point(fwd, params, x, dk)
            log(f"dropout {tag}: fwd+bwd {tb*1e3:6.1f} ms | fwd(train) "
                f"{tf*1e3:6.1f} ms")
        except Exception as e:
            log(f"dropout {tag}: FAILED {type(e).__name__}: {e}")

    # max-pool VJP: XLA select-and-scatter vs equality-mask custom rule
    xk = jax.jit(pack_hw_auto)(
        jax.jit(lambda k: jax.random.normal(
            k, (B, 64, 64, 64, 32), jnp.bfloat16))(key))

    @jax.custom_vjp
    def pool_eq(xk):
        return packed_max_pool2(xk, 64)

    def pool_eq_fwd(xk):
        y = packed_max_pool2(xk, 64)
        return y, (xk, y)

    def pool_eq_bwd(res, dy):
        xk, y = res
        b, d, c, hw = xk.shape
        w = 64
        h = hw // w
        xr = xk.reshape(b, d // 2, 2, c, h // 2, 2, w // 2, 2)
        # y (b, d/2, h/2, w/2, c) -> broadcast to the 8 pool positions
        yb = jnp.transpose(y, (0, 1, 4, 2, 3))[
            :, :, None, :, :, None, :, None]
        dyb = jnp.transpose(dy, (0, 1, 4, 2, 3))[
            :, :, None, :, :, None, :, None]
        dx = jnp.where(xr == yb, dyb.astype(jnp.float32), 0.0)
        return (dx.reshape(b, d, c, hw).astype(xk.dtype),)

    pool_eq.defvjp(pool_eq_fwd, pool_eq_bwd)

    @jax.jit
    def pool_fb_xla(xk):
        def loss(xk):
            return jnp.sum(packed_max_pool2(xk, 64).astype(jnp.float32) ** 2)
        return jax.grad(loss)(xk)

    @jax.jit
    def pool_fb_eq(xk):
        def loss(xk):
            return jnp.sum(pool_eq(xk).astype(jnp.float32) ** 2)
        return jax.grad(loss)(xk)

    a = pool_fb_xla(xk)
    b_ = pool_fb_eq(xk)
    err = np.abs(np.asarray(jax.device_get(a[:1, :2, :2, :256]), np.float32)
                 - np.asarray(jax.device_get(b_[:1, :2, :2, :256]),
                              np.float32)).max()
    log(f"pool eq-mask bwd max|err| vs XLA: {err:.2e}")
    t1 = two_point(pool_fb_xla, xk)
    t2 = two_point(pool_fb_eq, xk)
    log(f"pool fwd+bwd: XLA select-scatter {t1*1e3:6.2f} ms | eq-mask "
        f"{t2*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
