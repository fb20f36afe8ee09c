"""Isolate the parity step's "optimizers + metrics + state" ~11 ms bucket
(BENCH_NOTES_r3 attribution): time the two AdamW updates alone on the real
generator/discriminator param trees, and a flat-buffer (single fused
vector) AdamW for comparison, to see whether per-tensor launch/fusion
overhead or pure HBM traffic dominates.

Run on the attached TPU: python scripts/opt_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, sync  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


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


def main():
    from unet_bssfp_tpu.config import ModelConfig, TrainConfig
    from unet_bssfp_tpu.train.state import build_models, make_optimizer

    log(f"devices: {jax.devices()}")
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    gen, disc = build_models("pc-bssfp", mcfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 64, mcfg.unet_in_channels), jnp.bfloat16)
    gv = gen.init(key, x, train=False)
    yz = jnp.zeros((1, 64, 64, 64, mcfg.out_channels), jnp.bfloat16)
    dv = disc.init(key, yz, yz, train=False)
    gp, dp = gv["params"], dv["params"]

    nbytes = sum(a.size * 4 for a in jax.tree.leaves(gp)) + sum(
        a.size * 4 for a in jax.tree.leaves(dp))
    nten = len(jax.tree.leaves(gp)) + len(jax.tree.leaves(dp))
    log(f"param bytes (f32): {nbytes/1e6:.1f} MB across {nten} tensors")

    opt = make_optimizer(tcfg)
    gos = opt.init(gp)
    dos = opt.init(dp)

    @jax.jit
    def both_updates(gp, gos, dp, dos):
        ggrads = jax.tree.map(lambda a: a * 1e-4, gp)
        dgrads = jax.tree.map(lambda a: a * 1e-4, dp)
        gu, gos2 = opt.update(ggrads, gos, gp)
        gp2 = optax.apply_updates(gp, gu)
        du, dos2 = opt.update(dgrads, dos, dp)
        dp2 = optax.apply_updates(dp, du)
        return gp2, gos2, dp2, dos2

    t = two_point(both_updates, gp, gos, dp, dos) * 1e3
    log(f"tree adamw (both nets, incl. synthetic grad tree-map): {t:6.2f} ms")

    # grads precomputed as inputs (closer to the in-step situation)
    ggrads = jax.tree.map(lambda a: jnp.ones_like(a) * 1e-4, gp)
    dgrads = jax.tree.map(lambda a: jnp.ones_like(a) * 1e-4, dp)

    @jax.jit
    def updates_only(gp, gos, dp, dos, ggrads, dgrads):
        gu, gos2 = opt.update(ggrads, gos, gp)
        gp2 = optax.apply_updates(gp, gu)
        du, dos2 = opt.update(dgrads, dos, dp)
        dp2 = optax.apply_updates(dp, du)
        return gp2, gos2, dp2, dos2

    t = two_point(updates_only, gp, gos, dp, dos, ggrads, dgrads) * 1e3
    log(f"tree adamw (grads as inputs):                          {t:6.2f} ms")

    # flat-buffer fused variant: one vector per net
    gflat, gunrav = jax.flatten_util.ravel_pytree(gp)
    dflat, dunrav = jax.flatten_util.ravel_pytree(dp)
    fopt = optax.adamw(tcfg.lr, b1=tcfg.b1, b2=tcfg.b2, eps=1e-8,
                       weight_decay=tcfg.weight_decay)
    gfos = fopt.init(gflat)
    dfos = fopt.init(dflat)
    gfg = jnp.ones_like(gflat) * 1e-4
    dfg = jnp.ones_like(dflat) * 1e-4

    @jax.jit
    def flat_updates(gflat, gfos, dflat, dfos, gfg, dfg):
        gu, gfos2 = fopt.update(gfg, gfos, gflat)
        gflat2 = optax.apply_updates(gflat, gu)
        du, dfos2 = fopt.update(dfg, dfos, dflat)
        dflat2 = optax.apply_updates(dflat, du)
        return gflat2, gfos2, dflat2, dfos2

    t = two_point(flat_updates, gflat, gfos, dflat, dfos, gfg, dfg) * 1e3
    log(f"flat adamw (single fused vector per net):              {t:6.2f} ms")


if __name__ == "__main__":
    import jax.flatten_util  # noqa: F401

    main()
