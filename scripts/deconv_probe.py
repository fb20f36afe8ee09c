"""k2s2 transpose-conv reformulation + MedicalNet 3^3/s2 max-pool bwd cost.

The k2s2 deconv is non-overlapping: each output voxel is one (Cin→Cout)
GEMM row — y = x @ W'(Cin, 8·Cout) then depth-to-space. XLA's transposed
conv at upcat_1's shape runs at ~10% peak; the GEMM form is MXU-friendly
but pays a relayout. Measure both, fwd and fwd+bwd.

Also: grad cost of MedicalNet's overlapping 3^3/s2 max-pool (one of the 4
select_and_scatters in the full-objective step).

Run on the attached TPU: python scripts/deconv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402


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


def deconv_xla(x, k):
    # flax ConvTranspose kernel layout (2,2,2,Cin,Cout)
    return jax.lax.conv_transpose(
        x, k, (2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def deconv_gemm(x, k):
    # NB measured SLOWER than XLA's transposed conv (the depth-to-space
    # transpose dominates), and this naive phase mapping does not match
    # lax.conv_transpose's flipped-kernel convention (max|err| ~ O(1)) —
    # kept only as the record of an abandoned direction.
    n, d, h, w, ci = x.shape
    co = k.shape[-1]
    kmat = jnp.transpose(k, (3, 0, 1, 2, 4)).reshape(ci, 8 * co)
    y = x.reshape(n, d, h, w, ci) @ kmat           # (n,d,h,w,8co)
    y = y.reshape(n, d, h, w, 2, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(n, 2 * d, 2 * h, 2 * w, co)


def main():
    import numpy as np

    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    B = 8

    for res, ci, co in ((32, 64, 64), (16, 128, 64)):
        x = jax.jit(lambda k: jax.random.normal(
            k, (B, res, res, res, ci), jnp.bfloat16))(key)
        k = jax.jit(lambda kk: 0.1 * jax.random.normal(
            kk, (2, 2, 2, ci, co), jnp.bfloat16))(jax.random.PRNGKey(1))

        fa = jax.jit(deconv_xla)
        fb = jax.jit(deconv_gemm)
        a = np.asarray(jax.device_get(fa(x, k)[:1, :4, :4, :4]), np.float32)
        b = np.asarray(jax.device_get(fb(x, k)[:1, :4, :4, :4]), np.float32)
        log(f"{res}^3 {ci}->{co}: gemm-d2s max|err| {np.abs(a-b).max():.2e}")

        ga = jax.jit(jax.grad(
            lambda x, k: jnp.sum(deconv_xla(x, k).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        gb = jax.jit(jax.grad(
            lambda x, k: jnp.sum(deconv_gemm(x, k).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        for name, f, args in (
            (f"deconv {res}^3 xla  fwd", fa, (x, k)),
            (f"deconv {res}^3 gemm fwd", fb, (x, k)),
            (f"deconv {res}^3 xla  f+b", ga, (x, k)),
            (f"deconv {res}^3 gemm f+b", gb, (x, k)),
        ):
            log(f"{name}: {two_point(f, *args)*1e3:6.2f} ms")

    # MedicalNet stem pool: 3^3 stride-2 pad-1 on (48, 32^3, 64)
    y = jax.jit(lambda k: jax.random.normal(
        k, (48, 32, 32, 32, 64), jnp.bfloat16))(key)

    def pool(v):
        return nn.max_pool(v, (3, 3, 3), strides=(2, 2, 2),
                           padding=((1, 1),) * 3)

    pf = jax.jit(pool)
    pg = jax.jit(jax.grad(
        lambda v: jnp.sum(pool(v).astype(jnp.float32) ** 2)))
    log(f"mednet pool fwd: {two_point(pf, y)*1e3:6.2f} ms")
    log(f"mednet pool f+b: {two_point(pg, y)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
