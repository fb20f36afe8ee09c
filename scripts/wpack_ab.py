#!/usr/bin/env python3
"""Same-process in-step A/B: w-packed mid-stage convs on vs off.

Round-4 VERDICT item 5: the parked w-packed conv (ops/packed_conv.py) won
1.5× ISOLATED at the 32³/Cout-64 stage shapes (BENCH_NOTES_r2 item 1) but
was never A/B'd inside the full GAN step, where XLA may already overlap the
mid stages with neighbouring work (the lesson of the stem-pool lane pairing,
BENCH_NOTES_r3). This measures:

1. the full parity GAN train step with ``wpack_mid`` False vs True
   (same params — the formulation is checkpoint-compatible), and
2. the isolated down_1 / upcat_2 stage pair fwd+bwd, both variants,

back-to-back in one process (steal-robust two-point min-of-3 intervals).
Gate-in rule: >1.1× in-step → flip ModelConfig.wpack_mid's default;
else record the dead end in BENCH_NOTES_r4.

Run on the attached TPU:  python scripts/wpack_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

BATCH, PATCH, IN_CH, OUT_CH = 8, 64, 24, 6


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    scalar = leaf.ravel()[0] if leaf.ndim else leaf
    return np.asarray(jax.device_get(scalar))


def two_point(run, steps=10, warmup=3, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(warmup):
            out = run()
        sync(out)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(warmup + steps):
            out = run()
        sync(out)
        t_long = time.perf_counter() - t0
        best = min(best, max(t_long - t_short, 1e-6) / steps)
    return best


def step_ab():
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    tcfg = TrainConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((BATCH, PATCH, PATCH, PATCH, IN_CH)).astype(np.float32))
    y = jnp.asarray(
        rng.random((BATCH, PATCH, PATCH, PATCH, OUT_CH)).astype(np.float32))

    results = {}
    state0 = None
    for name, wp in (("plain", False), ("wpack", True)):
        mcfg = ModelConfig(wpack_mid=wp)
        gen, disc = build_models("pc-bssfp", mcfg)
        if state0 is None:
            state0 = create_gan_state(
                jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg,
                patch_size=PATCH,
            )
        step = make_train_step(gen, disc, tcfg, donate=False)
        s = state0
        t0 = time.perf_counter()
        s, m = step(s, x, y)
        sync(m)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run(step=step):
            nonlocal s
            s, m = step(s, x, y)
            return m

        ms = two_point(run) * 1e3
        results[name] = (ms, float(sync(m)))
        print(f"{name}: {ms:.1f} ms/step", flush=True)

    sp = results["plain"][0] / results["wpack"][0]
    print(f"in-step speedup wpack_mid: {sp:.3f}x "
          f"({results['plain'][0]:.1f} -> {results['wpack'][0]:.1f} ms)",
          flush=True)
    return sp


def stage_ab():
    """Isolated down_1+upcat_2 pair (the exact mid-res bucket) fwd+bwd."""
    from unet_bssfp_tpu.models.layers import Down, UpCat

    rng = np.random.default_rng(0)
    # down_1 input: conv_0 output pooled once = (B, 32³, 32ch);
    # upcat_2 inputs: u3 (B, 16³, 64ch) + skip x1 (B, 32³, 64ch).
    x0 = jnp.asarray(
        rng.random((BATCH, 64, 64, 64, 32)).astype(np.float32))
    u3 = jnp.asarray(
        rng.random((BATCH, 16, 16, 16, 128)).astype(np.float32))

    for name, wp in (("plain", False), ("wpack", True)):
        down = Down(64, 0.0, 0.1, jnp.bfloat16, wpack=wp)
        upcat = UpCat(64, 64, 0.0, 0.1, jnp.bfloat16, wpack=wp)
        vd = down.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
        x1 = down.apply(vd, x0, train=False)
        vu = upcat.init(
            {"params": jax.random.PRNGKey(1)}, u3, x1, train=False)

        def pair(vd_, vu_, x0_, u3_):
            x1_ = down.apply(vd_, x0_, train=False)
            return jnp.sum(
                upcat.apply(vu_, u3_, x1_, train=False).astype(jnp.float32)
            )

        fwd = jax.jit(pair)
        grad = jax.jit(jax.grad(pair, argnums=(0, 1)))
        sync(fwd(vd, vu, x0, u3))
        sync(grad(vd, vu, x0, u3))
        tf = two_point(lambda: fwd(vd, vu, x0, u3)) * 1e3
        tg = two_point(lambda: grad(vd, vu, x0, u3)) * 1e3
        print(f"stage pair {name}: fwd {tf:.2f} ms   fwd+bwd {tg:.2f} ms",
              flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    stage_ab()
    step_ab()


if __name__ == "__main__":
    main()
