"""Public plotting surface mirroring the reference's
``src/plot_metrics_errors.py`` (``:10-144``): ``plot_nn_metrics``,
``plot_rel_errors``, ``plot_stacked_bar_tensors``,
``plot_stacked_bar_scalars`` — paths from CLI instead of hard-coded."""

from __future__ import annotations

import argparse

from unet_bssfp_tpu.eval.plots import (  # noqa: F401
    plot_nn_metrics,
    plot_rel_errors,
    plot_stacked_bar_scalars,
    plot_stacked_bar_tensors,
)


def main() -> None:
    parser = argparse.ArgumentParser(description="Build report artifacts")
    parser.add_argument("rel_errors_csv", help="relative_errors.csv path")
    parser.add_argument("--log-dirs", nargs="*", default=[])
    parser.add_argument("--out-dir", default=".")
    args = parser.parse_args()

    if args.log_dirs:
        plot_nn_metrics(args.log_dirs, args.out_dir)
    plot_rel_errors(args.rel_errors_csv, args.out_dir)
    plot_stacked_bar_tensors(args.rel_errors_csv, args.out_dir)
    plot_stacked_bar_scalars(args.rel_errors_csv, args.out_dir)


if __name__ == "__main__":
    main()
