"""MedicalNet 3³/s2 max-pool: one 3-D reduce_window vs three separable 1-D
reduce_windows (w → h → d). Same math; per-stage select-and-scatter backward
picks lexicographic-first ties exactly like the joint pool. Shapes shrink
after each stage, so both FLOPs and bwd scatter work drop.

Run on the attached TPU: python scripts/pool_sep_probe.py
"""

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


def _rw1(x, axis):
    win = [1] * 5
    st = [1] * 5
    pad = [(0, 0)] * 5
    win[axis] = 3
    st[axis] = 2
    pad[axis] = (1, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, win, st, pad)


def pool_sep(x):
    return _rw1(_rw1(_rw1(x, 3), 2), 1)


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(
        k, (48, 32, 32, 32, 64), jnp.bfloat16))(key)

    fj = jax.jit(pool_joint)
    fs = jax.jit(pool_sep)
    a = np.asarray(jax.device_get(fj(x)[:1, :4, :4, :4]), np.float32)
    b = np.asarray(jax.device_get(fs(x)[:1, :4, :4, :4]), np.float32)
    log(f"sep vs joint fwd max|err|: {np.abs(a - b).max():.2e}")

    gj = jax.jit(jax.grad(
        lambda x: jnp.sum(pool_joint(x).astype(jnp.float32) ** 2)))
    gs = jax.jit(jax.grad(
        lambda x: jnp.sum(pool_sep(x).astype(jnp.float32) ** 2)))
    ga = np.asarray(jax.device_get(gj(x)[:1, :4, :4, :4]), np.float32)
    gb = np.asarray(jax.device_get(gs(x)[:1, :4, :4, :4]), np.float32)
    log(f"sep vs joint grad max|err|: {np.abs(ga - gb).max():.2e}")

    for name, f in (("joint fwd", fj), ("sep   fwd", fs),
                    ("joint f+b", gj), ("sep   f+b", gs)):
        log(f"{name}: {two_point(f, x)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
