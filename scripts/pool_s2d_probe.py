"""MedicalNet 3³/s2 max-pool, formulation 3: ONE s2d relayout + 26
contiguous elementwise maxes over the 27 (phase, shift) tap arrays — no
strided slicing, no reduce_window in the forward. Backward stays XLA's
select_and_scatter_add (the exact first-match scatter), called directly on
the saved residual so the slow reduce_window forward is never recomputed.

Run on the attached TPU: python scripts/pool_s2d_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


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


def pool_joint(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])


def _shift1(p, axis):
    """p[o] → p[o-1] along ``axis`` (out-grid), front-filled with -inf."""
    n = p.shape[axis]
    fill_shape = list(p.shape)
    fill_shape[axis] = 1
    fill = jnp.full(fill_shape, -jnp.inf, p.dtype)
    return jnp.concatenate(
        [fill, lax.slice_in_dim(p, 0, n - 1, 1, axis)], axis)


def pool_s2d(x):
    n, D, H, W, c = x.shape
    xr = x.reshape(n, D // 2, 2, H // 2, 2, W // 2, 2, c)
    ph = jnp.transpose(xr, (0, 2, 4, 6, 1, 3, 5, 7))
    # per-axis tap options: (phase, shift): window index 2o-1 = odd[o-1],
    # 2o = even[o], 2o+1 = odd[o]
    OPTS = ((1, True), (0, False), (1, False))
    out = None
    for pd, sd in OPTS:
        for phh, sh in OPTS:
            for pw, sw in OPTS:
                t = ph[:, pd, phh, pw]
                if sd:
                    t = _shift1(t, 1)
                if sh:
                    t = _shift1(t, 2)
                if sw:
                    t = _shift1(t, 3)
                out = t if out is None else jnp.maximum(out, t)
    return out


def sas_add(dy, x):
    from jax._src.lax import windowed_reductions as wr

    return wr._select_and_scatter_add(
        dy, x, lax.ge_p, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (48, 32, 32, 32, 64), jnp.bfloat16))(key)
    dy = jax.jit(lambda k: jax.random.normal(
        k, (48, 16, 16, 16, 64), jnp.bfloat16))(jax.random.PRNGKey(1))

    fj = jax.jit(pool_joint)
    fs = jax.jit(pool_s2d)
    a = np.asarray(jax.device_get(fj(x)[:1, :4, :4, :4]), np.float32)
    b = np.asarray(jax.device_get(fs(x)[:1, :4, :4, :4]), np.float32)
    log(f"s2d vs joint fwd max|err|: {np.abs(a - b).max():.2e}")

    fb = jax.jit(sas_add)
    gj = jax.jit(jax.grad(
        lambda x: jnp.sum(pool_joint(x).astype(jnp.float32) ** 2)))
    ga = np.asarray(jax.device_get(gj(x)[:1, :4, :4, :4]), np.float32)
    # grad of sum(y^2) = sas_add(2*y, x)
    y = fj(x)
    gb = np.asarray(jax.device_get(
        fb((2.0 * y.astype(jnp.float32)).astype(x.dtype), x)
        [:1, :4, :4, :4]), np.float32)
    log(f"sas_add vs autodiff grad max|err|: {np.abs(ga - gb).max():.2e}")

    for name, f, args in (("joint fwd   ", fj, (x,)),
                          ("s2d   fwd   ", fs, (x,)),
                          ("sas_add bwd ", fb, (dy, x)),
                          ("joint  f+b  ", gj, (x,))):
        log(f"{name}: {two_point(f, *args)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
