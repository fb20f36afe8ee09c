"""Public evaluation surface mirroring the reference's ``src/eval.py``.

Same function names — ``run_concurrently``, ``invert_dwi_tensor_norm``,
``calc_scalar_maps``, ``calc_diff_maps``, ``eval_model``,
``calc_error_table``, ``eval_dwi_tensors``, ``gen_predictions`` — on the
on-device eval stack (``unet_bssfp_tpu.eval``). The per-voxel math runs as
jitted JAX instead of the reference's ProcessPool + Python voxel loops
(``src/eval.py:23-36,84-118``); ``run_concurrently`` is kept for API parity
as a thread-pool fan-out.
"""

from __future__ import annotations

import argparse

from unet_bssfp_tpu.data.queue import parallel_map
from unet_bssfp_tpu.eval.evaluate import (  # noqa: F401
    calc_diff_maps,
    calc_error_table,
    calc_scalar_maps,
    eval_dwi_tensors,
    eval_model,
    gen_predictions,
)
from unet_bssfp_tpu.eval.evaluate import (
    invert_dwi_tensor_norm_files as invert_dwi_tensor_norm,  # noqa: F401
)


def run_concurrently(func, arglist, n_concurrent: int = 8):
    """API-parity fan-out helper (reference ``run_concurrently``,
    ``src/eval.py:23-36``): thread pool instead of a process pool — the
    heavy math is on-device, host work is IO-bound."""
    return parallel_map(func, arglist, num_workers=n_concurrent)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Post-process predictions and build error tables"
    )
    parser.add_argument("pred_path", help="prediction directory root")
    parser.add_argument("data_path", help="BIDS dataset root (masks/probseg)")
    parser.add_argument(
        "--rescale-args", default=None, help="rescale_args_dwi.txt path"
    )
    parser.add_argument("--out-csv", default="relative_errors.csv")
    parser.add_argument(
        "--checkpoint",
        action="append",
        default=[],
        metavar="MODALITY=PATH",
        help="generate predictions first: run test inference for MODALITY "
        "from the checkpoint at PATH into <pred_path>/<modality> "
        "(repeatable; the gen_predictions flow, reference "
        "src/eval.py:326-351)",
    )
    parser.add_argument("--config", default=None, help="JSON config path")
    args = parser.parse_args()

    if args.checkpoint:
        from unet_bssfp_tpu.config import Config
        from unet_bssfp_tpu.data.datamodule import DoveDataModule

        config = Config()
        if args.config:
            with open(args.config) as f:
                config = Config.from_json(f.read())
        for spec in args.checkpoint:
            if "=" not in spec:
                parser.error(
                    f"--checkpoint expects MODALITY=PATH, got {spec!r}"
                )
        checkpoints = dict(spec.split("=", 1) for spec in args.checkpoint)
        data = DoveDataModule(args.data_path, config=config.data)
        data.prepare_data()
        gen_predictions(
            data, checkpoints, args.pred_path, args.rescale_args, config
        )
    else:
        eval_dwi_tensors(args.pred_path, args.rescale_args)
    table = calc_error_table(args.pred_path, args.data_path, args.out_csv)
    print(table.to_string())


if __name__ == "__main__":
    main()
