"""Whole-volume training-step measurement: the TPU fast path trains on
full (96,128,128) volumes instead of 64³ patches (DataConfig.whole_volume).
With the Pallas conv winning 2.9× at volume shapes this mode's volumes/sec
can beat the patch parity path. Also exercises the kernel's backward at
HW = 16384 end-to-end."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def two_point(fn, arg, n_short=2, n_long=8):
    out = fn(arg)
    _sync(out[1])
    t0 = time.perf_counter()
    s = arg
    for _ in range(n_short):
        s, m = fn(s)
    _sync(m)
    t1 = time.perf_counter() - t0
    s = arg
    t0 = time.perf_counter()
    for _ in range(n_long):
        s, m = fn(s)
    _sync(m)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short) * 1e3


def main():
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    mcfg = ModelConfig(remat=True)   # volume activations need remat in HBM
    tcfg = TrainConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    state = create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=32
    )
    rng = np.random.default_rng(0)
    for B in (1, 2):
        x = jnp.asarray(
            rng.random((B, 96, 128, 128, 24)).astype(np.float32))
        y = jnp.asarray(
            rng.random((B, 96, 128, 128, 6)).astype(np.float32))
        step = make_train_step(gen, disc, tcfg, donate=False)
        dt = two_point(lambda s: step(s, x, y), state)
        print(f"whole-volume GAN step (batch {B}): {dt:7.1f} ms "
              f"→ {B / dt * 1e3:.2f} volumes/s/chip", flush=True)


if __name__ == "__main__":
    main()
