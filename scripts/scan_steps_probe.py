"""Probe: per-step host/tunnel dispatch overhead. The bench (and Trainer)
issue one jit call per GAN step; over the axon tunnel each call pays RPC +
dispatch. A lax.scan over K pre-stacked batches runs the identical update
sequence (bit-identical semantics — same step math, same order) in ONE
device call. If per-step time drops, the difference is pure dispatch
overhead, and a steps_per_call knob on the Trainer recovers it.

Run on the attached TPU: python scripts/scan_steps_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BATCH, IN_CH, OUT_CH, PATCH, log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    log(f"devices: {jax.devices()}")
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    state = create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=PATCH)
    step = make_train_step(gen, disc, tcfg, donate=False)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(
        (BATCH, PATCH, PATCH, PATCH, IN_CH)).astype(np.float32))
    y = jnp.asarray(rng.random(
        (BATCH, PATCH, PATCH, PATCH, OUT_CH)).astype(np.float32))

    # per-call baseline (the bench's own scheme)
    s, m = step(state, x, y)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(3):
        s, m = step(s, x, y)
    sync(m)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3 + 20):
        s, m = step(s, x, y)
    sync(m)
    t_long = time.perf_counter() - t0
    per_call = (t_long - t_short) / 20 * 1e3
    log(f"per-call step: {per_call:6.2f} ms")

    K = 8
    xs = jnp.broadcast_to(x, (K,) + x.shape)
    ys = jnp.broadcast_to(y, (K,) + y.shape)

    @jax.jit
    def scan_steps(st, xs_, ys_):
        # step is a jitted callable; jit-of-jit inlines under the scan.
        def body(st_, batch):
            xb, yb = batch
            return step(st_, xb, yb)
        return jax.lax.scan(body, st, (xs_, ys_))

    s2, ms = scan_steps(state, xs, ys)
    sync(ms)
    t0 = time.perf_counter()
    s2, ms = scan_steps(s2, xs, ys)
    sync(ms)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        s2, ms = scan_steps(s2, xs, ys)
    sync(ms)
    t_three = time.perf_counter() - t0
    per_scan_step = (t_three - t_one) / (2 * K) * 1e3
    log(f"scan-of-{K} step:  {per_scan_step:6.2f} ms/step "
        f"({per_call - per_scan_step:+.2f} ms dispatch recovered)")


if __name__ == "__main__":
    main()
