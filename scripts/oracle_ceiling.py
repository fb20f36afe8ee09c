"""Oracle PSNR ceiling of the linked synthetic fixture under the
reference's augmented-val convention.

The linked fixture's input->target relation is exactly deterministic
(``data/synthetic.py::_linked_map``), so the ONLY irreducible error in
the quality regime comes from the augmentation chain: train/val inputs
are k-space/intensity corrupted (reference ``src/data_module.py:130-147``
applies the chain to val too) while the loss/metric target stays the
pristine ``dwi-tensor_orig`` (reference ``src/data_module.py:139``).
This script measures, in the exact patch/batch space the Trainer's
``val_metric_PSNR`` uses (``train/steps.py::make_val_step``):

  oracle_aug     PSNR( linked_map(x_aug), y_orig )   -- the MAPPING
                 ORACLE under the shipped val convention: the exact
                 generating map applied to the corrupted input. Not a
                 strict Bayes bound (a model could partly invert the
                 invertible corruptions -- gamma, bias field -- before
                 mapping), but the score of "perfectly learned map, no
                 denoising"; a val record near it means mapping
                 capacity is exhausted and val PSNR is convention-
                 capped, not model-capped.
  oracle_clean   PSNR( linked_map(x_clean), y_orig ) -- float-precision
                 ceiling of the fixture itself. Test metrics run on
                 CLEAN inputs, so this is the true test-space ceiling:
                 if it is ~exact, the fixture imposes no test ceiling
                 and any test gap is training regime/budget/model.
  target_aug     PSNR( y_aug, y_orig )               -- how hard the
                 chain corrupts one volume (context for oracle_aug)

Purpose (VERDICT r3 "What's missing" #4): the judged quality records
(QUALITY.json, CONVERGENCE.json) sit at ~21 dB while the reference's
real-data band is 30-43 dB; this measurement decides how much of that
gap is the *regime* (augmented-val convention on a fixture whose
corruption is irreversible) versus *model/budget*. Records a
``kind="oracle_ceiling"`` entry in QUALITY.json.

Same data config as ``scripts/quality_record.py`` (12-subject linked
fixture, vol (96,128,128), patch 64, batch 8, spv 32, val_split 0.2),
averaged over ``--repeats`` differently-keyed val passes (training
re-keys the augmentation chain every epoch).

CPU-runnable: no model, no training -- just the data pipeline plus a
voxel-wise tanh map and the metric kernels.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_linked_map_fn(out_channels: int = 6, tag: int = 1):
    """The fixture's generating map as a jitted device fn.

    Weights are reproduced from the same seeded generator as
    ``data/synthetic.py::_linked_map`` (seed ``987650 + tag``) so the
    oracle is byte-for-byte the function that produced the targets.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Draw once: the generator stream must start at the seed for every
    # weight reconstruction (a per-call draw would hand later batches
    # weights from further down the stream — garbage).
    rng = np.random.default_rng(987650 + tag)
    cin = 24  # pc-bssfp channel count (data/synthetic.py fixture layout)
    w = rng.standard_normal((cin, out_channels)).astype(np.float32)
    w /= np.sqrt(cin)
    b = 0.1 * rng.standard_normal((out_channels,)).astype(np.float32)
    wj, bj = jnp.asarray(w), jnp.asarray(b)

    @jax.jit
    def fn(v):
        # HIGHEST: the oracle must not inherit the TPU's bf16 default
        # matmul precision — its error would masquerade as regime cost.
        z = jnp.tanh(
            jax.lax.dot_general(
                v - 0.5, 2.0 * wj,
                (((v.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            + bj
        )
        return (z + 1.0) * 0.5

    return fn


def measure(data, modality: str, repeats: int, seed0: int = 1000):
    """Run the oracle over ``repeats`` keyed val passes; return means."""
    import jax
    import jax.numpy as jnp

    from unet_bssfp_tpu.ops.metrics import mae, psnr, ssim3d

    oracle = make_linked_map_fn(6, tag=1)
    keys = (modality, "dwi-tensor")

    def batch_metrics(y_hat, y):
        y_hat = y_hat.astype(jnp.float32)
        y = y.astype(jnp.float32)
        n = y.shape[0]
        return (
            float(jnp.mean(psnr(y_hat, y))) * n,
            float(jnp.mean(ssim3d(y_hat, y))) * n,
            float(jnp.mean(mae(y_hat, y))) * n,
            n,
        )

    def run_pass(key, augment):
        acc = {"oracle": [0.0, 0.0, 0.0, 0], "target": [0.0, 0.0, 0.0, 0]}
        for batch in data.val_batches(key, keys=keys, augment=augment):
            y = batch["dwi-tensor_orig"]
            p, s, l, n = batch_metrics(oracle(batch[modality]), y)
            for i, v in enumerate((p, s, l, n)):
                acc["oracle"][i] += v
            if augment:
                p, s, l, n = batch_metrics(batch["dwi-tensor"], y)
                for i, v in enumerate((p, s, l, n)):
                    acc["target"][i] += v
        return acc

    def finish(acc):
        p, s, l, n = acc
        return {"psnr": round(p / n, 4), "ssim": round(s / n, 4),
                "l1": round(l / n, 5), "n_patches": n}

    agg = {"oracle": [0.0, 0.0, 0.0, 0], "target": [0.0, 0.0, 0.0, 0]}
    for r in range(repeats):
        one = run_pass(jax.random.PRNGKey(seed0 + r), augment=True)
        for k in agg:
            for i in range(4):
                agg[k][i] += one[k][i]
    clean = run_pass(jax.random.PRNGKey(seed0), augment=False)
    return {
        "oracle_aug": finish(agg["oracle"]),
        "target_aug_vs_orig": finish(agg["target"]),
        "oracle_clean": finish(clean["oracle"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--modality", default="pc-bssfp")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    args = ap.parse_args()

    import quality_record  # scripts/ sibling: same fixture + config

    from unet_bssfp_tpu.data.datamodule import DoveDataModule

    bids = quality_record.make_fixture(args)
    qr_ns = argparse.Namespace(
        smoke=args.smoke, samples_per_vol=32, workdir="/tmp/oracle_ceiling",
        max_epochs=1, modality=args.modality,
    )
    cfg = quality_record.build_config(qr_ns, bids)
    data = DoveDataModule(bids, config=cfg.data)
    data.setup()

    res = measure(data, args.modality, args.repeats)
    import jax
    entry = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True).stdout.strip(),
        "kind": "oracle_ceiling",
        "smoke": bool(args.smoke),
        "device": jax.devices()[0].device_kind,
        "task": (f"linked synthetic fixture "
                 f"({6 if args.smoke else 12} subjects, "
                 f"{args.modality} -> DT)"),
        "val_convention": "augmented val inputs, pristine target "
                          "(reference parity; src/data_module.py:130-147)",
        "repeats": args.repeats,
        **res,
        "note": "oracle_aug.psnr = exact generating map applied to the "
                "corrupted val input (mapping oracle, not a Bayes "
                "bound); oracle_clean = float-precision ceiling of the "
                "fixture mapping itself (the test-space ceiling: test "
                "metrics run on clean inputs).",
    }
    print(json.dumps(entry, indent=1))
    if args.out:
        existing = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing.append(entry)
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)
            f.write("\n")
        print(f"recorded to {args.out} ({len(existing)} records)")


if __name__ == "__main__":
    main()
