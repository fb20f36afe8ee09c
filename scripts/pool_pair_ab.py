"""Same-process A/B: perceptual term with vs without stem-pool lane pairing.

Pairing is NOT auto-enabled anywhere (see the note above ``features`` in
``models/medicalnet.py``); each arm constructs its own network explicitly —
``MedicalNetResNet10(pool_pair=2)`` vs the plain ``pool_pair=1`` — so both
compile in one process and are timed back-to-back (steal-robust two-point
intervals). Run on the attached TPU:

    python scripts/pool_pair_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    scalar = leaf.ravel()[0] if leaf.ndim else leaf
    return np.asarray(jax.device_get(scalar))


def two_point(fn, args, steps=10, warmup=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(warmup + steps):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / steps


def main():
    from unet_bssfp_tpu.models import medicalnet as mn

    print(f"devices: {jax.devices()}", flush=True)
    _, variables = mn.init_medicalnet(seed=0)

    B, C = 8, 6
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, 64, 64, 64, C)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, 64, 64, 64, C)), dtype=jnp.float32)

    results = {}
    for name, pool_pair in (("paired", 2), ("plain", 1)):
        net = mn.MedicalNetResNet10(dtype=jnp.bfloat16, pool_pair=pool_pair)

        def fwd(v, p, t, net=net):
            return mn.perceptual_distance(net, v, p, t)

        def fwdbwd(v, p, t, net=net):
            return jax.grad(
                lambda pp: mn.perceptual_distance(net, v, pp, t)
            )(p)

        cf = jax.jit(fwd).lower(variables, a, b).compile()
        cg = jax.jit(fwdbwd).lower(variables, a, b).compile()
        tf = two_point(cf, (variables, a, b))
        tg = two_point(cg, (variables, a, b))
        results[name] = (tf, tg, sync(cf(variables, a, b)),
                         float(jnp.sum(jnp.abs(cg(variables, a, b)))))
        print(
            f"{name:7s}: fwd {tf*1e3:6.2f} ms   fwd+bwd {tg*1e3:6.2f} ms",
            flush=True,
        )

    dv = abs(results["paired"][2] - results["plain"][2]) / (
        abs(results["plain"][2]) + 1e-12
    )
    dg = abs(results["paired"][3] - results["plain"][3]) / (
        abs(results["plain"][3]) + 1e-12
    )
    print(f"value rel-diff {dv:.2e}   grad-sum rel-diff {dg:.2e}", flush=True)
    sp_f = results["plain"][0] / results["paired"][0]
    sp_g = results["plain"][1] / results["paired"][1]
    print(f"speedup: fwd {sp_f:.3f}x   fwd+bwd {sp_g:.3f}x", flush=True)


if __name__ == "__main__":
    main()
