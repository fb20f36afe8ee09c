"""Capacity probe: is the quality regime's PSNR plateau a property of
the REGIME (augmented inputs) or of the MODEL/OPTIMIZATION (UNet + GAN)?

Trains a probe with *exact* capacity for the linked fixture's generating
map — the map is ``y = (tanh((x - .5) @ 2W + b) + 1)/2`` voxel-wise
(``data/synthetic.py::_linked_map``), and the probe IS that functional
form with learnable ``W, b`` — on the same augmented patch stream, same
batch/patch geometry, and the same val convention as
``scripts/quality_record.py``. Reading the result against
``scripts/oracle_ceiling.py``'s numbers:

  probe ~= oracle_aug      optimization recovers everything the regime
                           permits -> the UNet/GAN records' gap to
                           oracle_aug is model/objective-side
  probe ~= UNet records    the regime itself (augmentation noise in the
                           train signal) caps learning at that level ->
                           the UNet is already at the regime ceiling

Cheap by construction: the probe is one 24->6 dense over channels
(~0.3 GFLOP/step at the quality-regime batch), so wall time is data
pipeline + augmentation, not compute. Records a ``kind=
"capacity_probe"`` entry in CONVERGENCE.json.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--samples-per-vol", type=int, default=32)
    ap.add_argument("--modality", default="pc-bssfp")
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import quality_record  # same fixture + data config as the records

    # Fail fast (exit 75) instead of hanging forever when the tunneled
    # device server won't admit this client (BENCH_NOTES_r5 §9).
    quality_record.device_startup_probe(grace_s=0.0, timeout_s=150.0)

    from unet_bssfp_tpu.data.datamodule import DoveDataModule
    from unet_bssfp_tpu.ops.metrics import mae, psnr, ssim3d

    qr_ns = argparse.Namespace(
        smoke=args.smoke, samples_per_vol=args.samples_per_vol,
        workdir="/tmp/capacity_probe", max_epochs=args.epochs,
        modality=args.modality,
    )
    bids = quality_record.make_fixture(qr_ns)
    cfg = quality_record.build_config(qr_ns, bids)
    data = DoveDataModule(bids, config=cfg.data)
    data.setup()

    key = jax.random.PRNGKey(42)
    key, k_w = jax.random.split(key)
    params = {
        "w": 0.3 * jax.random.normal(k_w, (24, 6), jnp.float32),
        "b": jnp.zeros((6,), jnp.float32),
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def apply(p, x):
        # float32 throughout: the probe measures the REGIME, so its own
        # numerics must not add a bfloat16 floor.
        z = jnp.tanh(
            jax.lax.dot_general(
                x.astype(jnp.float32) - 0.5, 2.0 * p["w"],
                (((x.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            + p["b"]
        )
        return (z + 1.0) * 0.5

    @jax.jit
    def train_step(p, s, x, y):
        def loss_fn(p):
            return jnp.mean(jnp.abs(apply(p, x) - y.astype(jnp.float32)))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def val_step(p, x, y):
        y_hat = apply(p, x)
        y = y.astype(jnp.float32)
        return (jnp.mean(psnr(y_hat, y)), jnp.mean(ssim3d(y_hat, y)),
                jnp.mean(mae(y_hat, y)), jnp.asarray(y.shape[0], jnp.float32))

    keys = (args.modality, "dwi-tensor")
    t0 = time.monotonic()
    last = {}
    best_psnr = -1.0
    for epoch in range(args.epochs):
        key, k_tr, k_val = jax.random.split(key, 3)
        n_steps, tr_loss = 0, 0.0
        for batch in data.train_batches(k_tr, keys=keys):
            params, opt_state, loss = train_step(
                params, opt_state, batch[args.modality],
                batch["dwi-tensor_orig"],
            )
            tr_loss += float(loss)
            n_steps += 1
        acc = [0.0, 0.0, 0.0, 0.0]
        for batch in data.val_batches(k_val, keys=keys):
            p, s, l, n = val_step(
                params, batch[args.modality], batch["dwi-tensor_orig"]
            )
            for i, v in enumerate((p * n, s * n, l * n, n)):
                acc[i] += float(v)
        last = {
            "val_psnr": round(acc[0] / acc[3], 4),
            "val_ssim": round(acc[1] / acc[3], 4),
            "val_l1": round(acc[2] / acc[3], 5),
        }
        best_psnr = max(best_psnr, last["val_psnr"])
        print(f"epoch {epoch}: train_L1 {tr_loss / max(n_steps, 1):.4f} "
              f"val {last}", flush=True)

    import jax as _jax
    entry = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
        "kind": "capacity_probe",
        "device": _jax.devices()[0].device_kind,
        "smoke": bool(args.smoke),
        "linked": True,
        "samples_per_vol": args.samples_per_vol,
        "probe": "exact-form dense 24->6 (+tanh affine), f32, Adam",
        "lr": args.lr,
        "probe_epochs": args.epochs,
        "wall_seconds": round(time.monotonic() - t0, 1),
        "val_psnr_last": last.get("val_psnr"),
        "val_psnr_best": round(best_psnr, 4),
        "val_ssim_last": last.get("val_ssim"),
        "val_l1_last": last.get("val_l1"),
    }
    print(json.dumps(entry, indent=1))
    if not args.no_record:
        path = os.path.join(REPO, "CONVERGENCE.json")
        history = json.load(open(path)) if os.path.exists(path) else []
        history.append(entry)
        with open(path, "w") as fh:
            json.dump(history, fh, indent=1)
            fh.write("\n")
        print(f"recorded to {path} ({len(history)} records)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
