"""MedicalNet 3³/s2 max-pool, formulation 4: lane-pairing.

BENCH_NOTES_r3 concluded the stem pool is LAYOUT-bound: its 64-channel
minor dim fills only half the VPU's 128 lanes, and three formulation
changes (separable phase-split, separable 1-D windows, s2d tap maxes)
all tied or lost because none changed the lane fill. This probe attacks
the layout directly: max-pool is elementwise over channels, so two batch
slabs can be PAIRED onto the channel axis — (2N, d, h, w, 64) →
(N, d, h, w, 128) — filling every lane, at the cost of one relayout in
and one out. The relayouts are pure bandwidth (~0.5 ms each at this
shape, HBM-bound) while the pool itself runs at ~41 GB/s effective —
far below the ~819 GB/s roofline — so if the pool is lane-bound the
paired form should approach 2×.

Shapes: the perceptual term's stem-pool input at the parity config,
(48, 32, 32, 32, 64) bf16 per branch (pred branch needs fwd+bwd, target
branch fwd only).

Run on the attached TPU: python scripts/pool_pair_probe.py
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


def pool_joint(x):
    import flax.linen as nn

    return nn.max_pool(
        x, window_shape=(3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3
    )


def pair(x, k):
    n, d, h, w, c = x.shape
    y = x.reshape(n // k, k, d, h, w, c)
    y = jnp.moveaxis(y, 1, 4)  # (n/k, d, h, w, k, c)
    return y.reshape(n // k, d, h, w, k * c)


def unpair(y, k):
    m, d, h, w, kc = y.shape
    z = y.reshape(m, d, h, w, k, kc // k)
    z = jnp.moveaxis(z, 4, 1)
    return z.reshape(m * k, d, h, w, kc // k)


def pool_paired(x, k=2):
    return unpair(pool_joint(pair(x, k)), k)


def main():
    shape = (48, 32, 32, 32, 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(shape, dtype=np.float32), dtype=jnp.bfloat16
    )

    fj = jax.jit(pool_joint)
    # exactness (bf16 in, bf16 out; pairing only permutes elements)
    for k in (2, 4):
        fp = jax.jit(lambda a, kk=k: pool_paired(a, kk))
        np.testing.assert_array_equal(
            np.asarray(fj(x), dtype=np.float32),
            np.asarray(fp(x), dtype=np.float32),
        )
    log("exactness: paired k=2,4 == joint (bitwise)")

    def loss_j(a):
        return jnp.sum(pool_joint(a).astype(jnp.float32) ** 2)

    gj = jax.jit(jax.grad(loss_j))
    tj_f = two_point(fj, x)
    tj_fb = two_point(gj, x)
    log(f"joint   (48,...,64):  fwd {tj_f*1e3:6.2f} ms   fwd+bwd {tj_fb*1e3:6.2f} ms")

    for k in (2, 4):
        fp = jax.jit(lambda a, kk=k: pool_paired(a, kk))

        def loss_p(a, kk=k):
            return jnp.sum(pool_paired(a, kk).astype(jnp.float32) ** 2)

        gp = jax.jit(jax.grad(loss_p))
        # grad exactness: ties resolve identically because pairing is a
        # pure permutation — windows never mix paired slabs.
        np.testing.assert_allclose(
            np.asarray(gj(x), dtype=np.float32),
            np.asarray(gp(x), dtype=np.float32),
            rtol=0, atol=0,
        )
        tp_f = two_point(fp, x)
        tp_fb = two_point(gp, x)
        log(
            f"paired k={k} ({48//k},...,{64*k}): fwd {tp_f*1e3:6.2f} ms "
            f"({tj_f/tp_f:4.2f}x)   fwd+bwd {tp_fb*1e3:6.2f} ms "
            f"({tj_fb/tp_fb:4.2f}x)"
        )

    # relayout cost alone, to see what the pool-proper saving is
    pr = jax.jit(lambda a: unpair(pair(a, 2), 2))
    log(f"pair+unpair roundtrip alone: {two_point(pr, x)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
