"""Probe: which fold layout reaches the MXU ceiling at the real stage shapes?

Compares raw conv time for the stage-0 folded GEMM in three layouts:
  hw-folded : (B, 64, 33, 33, 4C) kernel (3,2,2)  [current ops/folded.py]
  dh-folded : (B, 33, 33, 64, 4C) kernel (2,2,3)  [keeps W=64 in sublanes]
  clean     : (B, 32, 32, 64, 4C) kernel (2,2,3)  [no odd cols — upper bound]
plus the fused elementwise cost of one InstanceNorm+mask pass on the folded
tensor, to separate conv time from overhead. All data device-generated.
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 8
PEAK = 197e12  # v5e bf16


def _sync(out):
    """block_until_ready does not block over the axon tunnel (see bench.py);
    pull one element to host to force completion."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    import numpy as np
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


@functools.partial(jax.jit, static_argnums=0)
def make(shape):
    return jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)


def conv(x, w, pads):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def report(tag, x_shape, k_shape, pads, iters=20):
    x = make(x_shape)
    w = make(k_shape)
    f = jax.jit(lambda x, w: conv(x, w, pads))
    t = timeit(f, x, w, iters=iters)
    out_sp = 1
    for i, s in enumerate(x_shape[1:4]):
        lo, hi = pads[i]
        out_sp *= s + lo + hi - k_shape[i] + 1
    kd, kh, kw, cin, cout = k_shape
    total = 2 * x_shape[0] * out_sp * kd * kh * kw * cin * cout
    pct = total / (t * 1e-3) / PEAK * 100
    print(f"{tag:34s}: {t:7.2f} ms  ({pct:5.1f}% peak)", flush=True)


def main():
    # stage-0 conv2 shape: 128 -> 128 lanes (4x32 -> 4x32)
    report("hw-fold 128->128 (64,33,33)",
           (B, 64, 33, 33, 128), (3, 2, 2, 128, 128),
           ((1, 1), (1, 0), (1, 0)))
    report("dh-fold 128->128 (33,33,64)",
           (B, 33, 33, 64, 128), (2, 2, 3, 128, 128),
           ((1, 0), (1, 0), (1, 1)))
    report("clean   128->128 (32,32,64)",
           (B, 32, 32, 64, 128), (2, 2, 3, 128, 128),
           ((1, 0), (1, 0), (1, 1)))
    # stage-0 conv1: 96 -> 128
    report("hw-fold  96->128 (64,32,32)",
           (B, 64, 32, 32, 96), (3, 2, 2, 96, 128),
           ((1, 1), (0, 1), (0, 1)))
    report("dh-fold  96->128 (32,32,64)",
           (B, 32, 32, 64, 96), (2, 2, 3, 96, 128),
           ((0, 1), (0, 1), (1, 1)))
    # upcat conv1: 384 -> 128
    report("hw-fold 384->128 (64,32,32)",
           (B, 64, 32, 32, 384), (3, 2, 2, 384, 128),
           ((1, 1), (0, 1), (0, 1)))
    report("dh-fold 384->128 (32,32,64)",
           (B, 32, 32, 64, 384), (2, 2, 3, 384, 128),
           ((0, 1), (0, 1), (1, 1)))

    # elementwise: one InstanceNorm-ish fused pass over the folded tensor
    xf = make((B, 64, 33, 33, 128))

    @jax.jit
    def norm_pass(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x32, axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.maximum(y, 0.1 * y).astype(x.dtype)

    t = timeit(norm_pass, xf)
    print(f"{'norm+act pass (64,33,33,128)':34s}: {t:7.2f} ms", flush=True)

    xf2 = make((B, 33, 33, 64, 128))
    t = timeit(norm_pass, xf2)
    print(f"{'norm+act pass (33,33,64,128)':34s}: {t:7.2f} ms", flush=True)

    # fold/unfold reshape cost
    x = make((B, 64, 64, 64, 32))

    @jax.jit
    def fold_pass(x):
        b, d, h, w, c = x.shape
        y = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6)
        return y.reshape(b, d, h // 2, w // 2, 4 * c)

    t = timeit(fold_pass, x)
    print(f"{'hw fold reshape (64^3,32)':34s}: {t:7.2f} ms", flush=True)

    @jax.jit
    def fold_dh_pass(x):
        b, d, h, w, c = x.shape
        y = x.reshape(b, d // 2, 2, h // 2, 2, w, c)
        y = y.transpose(0, 1, 3, 5, 2, 4, 6)
        return y.reshape(b, d // 2, h // 2, w, 4 * c)

    t = timeit(fold_dh_pass, x)
    print(f"{'dh fold reshape (64^3,32)':34s}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
