"""Probe WHY stage-0 convs run at ~7% peak: GEMM calibration, space-to-depth
folded conv, f32-vs-bf16, and the optimized HLO of the plain conv.

All tensors are generated ON DEVICE (jax.random) — host->TPU transfers over
the axon tunnel are slow enough to wedge a probe for 20+ minutes.

Run on the attached TPU: python -u scripts/conv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PEAK = 197e12
KEY = None


def dev_rand(shape, dtype=jnp.bfloat16):
    global KEY
    KEY, k = jax.random.split(KEY)
    return jax.random.normal(k, shape, jnp.float32).astype(dtype)


def two_point(fn, n_short=3, n_long=23):
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn()
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn()
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short)


def main():
    global KEY
    jax.config.update("jax_default_prng_impl", "rbg")
    KEY = jax.random.PRNGKey(0)
    B = 8

    # --- 1. pure GEMM calibration: the implicit GEMM stage-0 would be ------
    M = B * 64 ** 3
    for k, n in [(648, 32), (648, 128), (128, 128)]:
        a = dev_rand((M, k))
        b = dev_rand((k, n))
        f = jax.jit(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.bfloat16))
        sync(f(a, b))
        dt = two_point(lambda: f(a, b))
        fl = 2 * M * k * n
        log(f"GEMM {M}x{k}x{n} bf16: {dt*1e3:6.2f} ms "
            f"({fl/dt/PEAK*100:5.1f}% peak)")

    # --- 2. space-to-depth folded conv: (3,3,2) 96->128 on (B,64,64,16) ----
    x4 = dev_rand((B, 64, 64, 16, 96))
    w4 = dev_rand((3, 3, 2, 96, 128))

    def conv_s2d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), padding=((1, 1), (1, 1), (1, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    f = jax.jit(conv_s2d)
    sync(f(x4, w4))
    dt = two_point(lambda: f(x4, w4))
    fl = 2 * B * 64 * 64 * 16 * 18 * 96 * 128
    useful = 2 * B * 64 ** 3 * 27 * 24 * 32
    log(f"s2d-folded conv (3,3,2) 96->128 @64x64x16: {dt*1e3:6.2f} ms "
        f"({fl/dt/PEAK*100:5.1f}% raw, "
        f"{useful/dt/PEAK*100:5.1f}% useful-as-24->32)")

    # --- 3. f32 vs bf16 plain conv + batch scaling --------------------------
    for name, dtype, bb in [("bf16", jnp.bfloat16, B),
                            ("f32", jnp.float32, B),
                            ("bf16 B=1", jnp.bfloat16, 1)]:
        x = dev_rand((bb, 64, 64, 64, 24), dtype)
        w = dev_rand((3, 3, 3, 24, 32), dtype)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        f = jax.jit(conv)
        sync(f(x, w))
        d = two_point(lambda: f(x, w))
        fl = 2 * bb * 64 ** 3 * 27 * 24 * 32
        log(f"plain conv 24->32 {name}: {d*1e3:6.2f} ms "
            f"({fl/d/PEAK*100:5.1f}% peak)")

    # --- 4. dump optimized HLO of the bf16 conv -----------------------------
    x = jnp.zeros((B, 64, 64, 64, 24), jnp.bfloat16)
    w = jnp.zeros((3, 3, 3, 24, 32), jnp.bfloat16)
    txt = (
        jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        .lower(x, w).compile().as_text()
    )
    with open("/tmp/conv_hlo.txt", "w") as fh:
        fh.write(txt)
    log(f"HLO dumped to /tmp/conv_hlo.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
