from unet_bssfp_tpu.eval.inference import predict_volume, run_test
from unet_bssfp_tpu.eval.evaluate import (
    eval_model,
    gen_predictions,
    eval_dwi_tensors,
    calc_scalar_maps,
    calc_diff_maps,
    calc_error_table,
    invert_dwi_tensor_norm_files,
)
from unet_bssfp_tpu.eval.plots import (
    plot_nn_metrics,
    plot_rel_errors,
    plot_stacked_bar_tensors,
    plot_stacked_bar_scalars,
)

__all__ = [
    "predict_volume",
    "run_test",
    "eval_model",
    "gen_predictions",
    "eval_dwi_tensors",
    "calc_scalar_maps",
    "calc_diff_maps",
    "calc_error_table",
    "invert_dwi_tensor_norm_files",
    "plot_nn_metrics",
    "plot_rel_errors",
    "plot_stacked_bar_tensors",
    "plot_stacked_bar_scalars",
]
