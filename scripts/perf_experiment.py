"""Staged timing experiment on the attached chip: where does the GAN step's
time go, and what do the candidate optimisations buy?

Run:  python scripts/perf_experiment.py
All timings use two-point readback-cancelling measurement (see bench.py).
NB: params must be *arguments* of the jitted fns — closed-over arrays are
baked into the HLO as constants and blow the tunnel's remote-compile request
limit (HTTP 413).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import log, sync  # noqa: E402


def two_point(fn, init, n_short=3, n_long=23):
    out = init
    t0 = time.perf_counter()
    for _ in range(n_short):
        out = fn(out)
    sync(out)
    t1 = time.perf_counter() - t0
    out = init
    t0 = time.perf_counter()
    for _ in range(n_long):
        out = fn(out)
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_long - n_short)


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.ops.losses import l1_loss
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    B, P = args.batch, args.patch
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    import dataclasses
    gen_nofuse, _ = build_models(
        "pc-bssfp", dataclasses.replace(mcfg, use_pallas=False)
    )
    state = create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=P
    )
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.random((B, P, P, P, 24)).astype(np.float32))
    y32 = jnp.asarray(rng.random((B, P, P, P, 6)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    y16 = y32.astype(jnp.bfloat16)

    log(f"devices: {jax.devices()}  batch={B} patch={P}")

    # 1. generator forward (eval mode)
    @jax.jit
    def gen_fwd(params, bs, x):
        return gen.apply({"params": params, "batch_stats": bs}, x,
                         train=False)

    sync(gen_fwd(state.gen_params, state.gen_batch_stats, x32))
    dt = two_point(
        lambda _: gen_fwd(state.gen_params, state.gen_batch_stats, x32), None
    )
    log(f"gen fwd (eval, fused IN): {dt*1e3:.1f} ms")

    @jax.jit
    def gen_fwd_nofuse(params, bs, x):
        return gen_nofuse.apply({"params": params, "batch_stats": bs}, x,
                                train=False)

    sync(gen_fwd_nofuse(state.gen_params, state.gen_batch_stats, x32))
    dt = two_point(
        lambda _: gen_fwd_nofuse(
            state.gen_params, state.gen_batch_stats, x32
        ),
        None,
    )
    log(f"gen fwd (eval, XLA IN): {dt*1e3:.1f} ms")

    # 2. generator fwd+bwd (L1 only)
    @jax.jit
    def gen_fwd_bwd(params, bs, x, y):
        def loss(p):
            y_hat = gen.apply({"params": p, "batch_stats": bs}, x,
                              train=False)
            return l1_loss(y_hat.astype(jnp.float32), y)

        return jax.grad(loss)(params)

    sync(gen_fwd_bwd(state.gen_params, state.gen_batch_stats, x32, y32))
    dt = two_point(
        lambda _: gen_fwd_bwd(
            state.gen_params, state.gen_batch_stats, x32, y32
        ),
        None,
    )
    log(f"gen fwd+bwd: {dt*1e3:.1f} ms")

    # 3. discriminator fwd+bwd
    @jax.jit
    def disc_fwd_bwd(params, bs, x, y):
        def loss(p):
            logits = disc.apply({"params": p, "batch_stats": bs}, x, y,
                                train=False)
            return jnp.mean(logits)

        return jax.grad(loss)(params)

    sync(disc_fwd_bwd(state.disc_params, state.disc_batch_stats, x32, y32))
    dt = two_point(
        lambda _: disc_fwd_bwd(
            state.disc_params, state.disc_batch_stats, x32, y32
        ),
        None,
    )
    log(f"disc fwd+bwd: {dt*1e3:.1f} ms")

    # 3b. the reference's FULL objective adds the MedicalNet perceptual
    # term (always on in the reference; the headline bench step matches the
    # torch baseline, which is BCE+L1 only — see bench.py)
    from unet_bssfp_tpu.config import Config
    from unet_bssfp_tpu.train.loop import build_perceptual_fn

    perc_fn = build_perceptual_fn(Config(train=tcfg))

    # 4. full step variants
    for name, kwargs, (xx, yy) in [
        ("full step (parity, fp32 in)", {}, (x32, y32)),
        ("full step (parity, bf16 in)", {}, (x16, y16)),
        ("full step (reuse_fake)", {"reuse_fake": True}, (x32, y32)),
        ("full step (reuse_fake, bf16 in)", {"reuse_fake": True}, (x16, y16)),
        ("full step (+MedicalNet perceptual)",
         {"perceptual_fn": perc_fn}, (x32, y32)),
    ]:
        step = make_train_step(gen, disc, tcfg, donate=False, **kwargs)

        def run(carry, step=step, xx=xx, yy=yy):
            s = carry[0] if carry else state
            return step(s, xx, yy)

        out = run(None)
        sync(out[1])
        dt = two_point(run, None)
        log(f"{name}: {dt*1e3:.1f} ms")


def blocks(args):
    """Per-block cost table: time every TwoConv/transpose-conv shape of the
    generator individually (fwd and fwd+bwd) and compare against its MXU
    N-dim ceiling — locates which stages keep the step at ~12% MFU."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.models.layers import TwoConv
    from flax import linen as nn

    B = args.batch
    rng = np.random.default_rng(0)
    log("--- per-block timings (fwd / fwd+bwd, bf16 activations) ---")
    PEAK = 197e12  # v5e bf16

    specs = [
        ("conv_0   64^3  24->32", 64, 24, 32),
        ("down_1   32^3  32->64", 32, 32, 64),
        ("down_2   16^3  64->128", 16, 64, 128),
        ("down_3    8^3 128->256", 8, 128, 256),
        ("down_4    4^3 256->512", 4, 256, 512),
        ("up4conv   8^3 512->256", 8, 512, 256),
        ("up3conv  16^3 256->128", 16, 256, 128),
        ("up2conv  32^3 128->64", 32, 128, 64),
        ("up1conv  64^3  96->32", 64, 96, 32),
    ]
    for name, res, cin, cout in specs:
        mod = TwoConv(cout, dropout=0.0, dtype=jnp.bfloat16, use_fused=False)
        x = jnp.asarray(
            rng.random((B, res, res, res, cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x, train=False)

        @jax.jit
        def fwd(p, x, mod=mod):
            return mod.apply(p, x, train=False)

        @jax.jit
        def fwd_bwd(p, x, mod=mod):
            # sum(y*y): a linear loss lets XLA fold the forward away
            # (constant cotangent), which silently under-measures.
            def loss(p):
                y = mod.apply(p, x, train=False).astype(jnp.float32)
                return jnp.sum(y * y)
            return jax.grad(loss)(p)

        macs = B * res**3 * 27 * (cin * cout + cout * cout)
        ceiling = min(cout, 128) / 128.0
        sync(fwd(params, x))
        dt_f = two_point(lambda _: fwd(params, x), None)
        sync(fwd_bwd(params, x))
        dt_b = two_point(lambda _: fwd_bwd(params, x), None)
        log(
            f"{name}: fwd {dt_f*1e3:6.1f} ms ({2*macs/dt_f/PEAK*100:5.1f}% "
            f"peak, N-ceiling {ceiling*100:3.0f}%) | fwd+bwd "
            f"{dt_b*1e3:6.1f} ms ({6*macs/dt_b/PEAK*100:5.1f}%)"
        )


def variants(args):
    """Optimisation-candidate variants of the full parity step."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_train_step

    B, P = args.batch, args.patch
    tcfg = TrainConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, P, P, P, 24)).astype(np.float32))
    y = jnp.asarray(rng.random((B, P, P, P, 6)).astype(np.float32))

    log("--- full-step variants ---")
    for name, mkw, skw in [
        ("parity", {}, {}),
        ("no dropout", {"dropout": 0.0}, {}),
        ("remat", {"remat": True}, {}),
        ("reuse_fake + no dropout", {"dropout": 0.0}, {"reuse_fake": True}),
    ]:
        mcfg = ModelConfig(**mkw)
        gen, disc = build_models("pc-bssfp", mcfg)
        state = create_gan_state(
            jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=P
        )
        step = make_train_step(gen, disc, tcfg, donate=False, **skw)

        def run(carry, step=step):
            s = carry[0] if carry else state
            return step(s, x, y)

        out = run(None)
        sync(out[1])
        dt = two_point(run, None)
        log(f"{name}: {dt*1e3:.1f} ms/step")

    # Whole-volume training step (96x128x128): volumes/s comparison.
    mcfg = ModelConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    for bv in (1, 2):
        state = create_gan_state(
            jax.random.PRNGKey(0), "pc-bssfp", mcfg, tcfg, patch_size=96
        )
        step = make_train_step(gen, disc, tcfg, donate=False)
        xv = jnp.asarray(
            np.random.default_rng(1)
            .random((bv, 96, 128, 128, 24))
            .astype(np.float32)
        )
        yv = jnp.asarray(
            np.random.default_rng(2)
            .random((bv, 96, 128, 128, 6))
            .astype(np.float32)
        )

        def runv(carry, step=step, xv=xv, yv=yv):
            s = carry[0] if carry else state
            return step(s, xv, yv)

        try:
            out = runv(None)
            sync(out[1])
            dt = two_point(runv, None)
            log(
                f"whole-volume step (batch {bv}): {dt*1e3:.1f} ms "
                f"({bv/dt:.2f} volumes/s)"
            )
        except Exception as e:
            log(f"whole-volume step (batch {bv}) failed: {e}")


if __name__ == "__main__":
    _argv = sys.argv[1:]
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--patch", type=int, default=64)
    parser.add_argument(
        "--mode", choices=("stages", "blocks", "variants", "all"),
        default="stages",
    )
    _args = parser.parse_args(_argv)
    if _args.mode in ("stages", "all"):
        main(_args)
    if _args.mode in ("blocks", "all"):
        blocks(_args)
    if _args.mode in ("variants", "all"):
        variants(_args)
