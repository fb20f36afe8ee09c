"""Grid-stitched full-volume inference + test loop.

Replaces the reference ``test_step``/``predict_step``
(``src/model.py:291-333``): iterate grid patches over each test volume, run
the generator, stitch with deterministic overlap averaging, compute metrics on
the stitched volumes, save input/pred/target NIfTIs.

Fixes reference defect #3 (SURVEY.md §7): the reference swaps aggregator
variables at readout (``src/model.py:299-305``) so its saved 'pred' is the
input and its test metrics compare input-vs-target; here pred/target/input are
kept straight.

Also provides the whole-volume fast path: (96,128,128) fits HBM easily, so
when ``whole_volume=True`` the generator runs once on the full volume —
no stitching, fewer FLOPs, better MXU utilisation (SURVEY.md §5.7).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.data.datamodule import DoveDataModule, SampleSpec
from unet_bssfp_tpu.data.nifti import load_affine, save_volume
from unet_bssfp_tpu.data.sampler import GridAggregator, extract_patches
from unet_bssfp_tpu.data.bids import parse_entities
from unet_bssfp_tpu.ops.metrics import mae, psnr, ssim3d


def predict_volume(
    predict_fn,
    state,
    volume: jax.Array,
    patch_size: int = 64,
    out_channels: int = 6,
    batch_size: int = 8,
    mode: str = "average",
    whole_volume: bool = False,
) -> jax.Array:
    """Run the generator over one ``(D, H, W, C)`` volume.

    Patch mode mirrors the reference's GridSampler loop; whole-volume mode is
    the TPU fast path (single forward, no stitch).
    """
    if whole_volume:
        return predict_fn(state, volume[None])[0]

    agg = GridAggregator(
        volume.shape[:3], out_channels, patch_size, mode=mode
    )
    patches = extract_patches(volume, agg.starts, patch_size)
    preds = []
    n = patches.shape[0]
    for i in range(0, n, batch_size):
        chunk = patches[i : i + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        out = predict_fn(state, chunk)
        if pad:
            out = out[: batch_size - pad]
        preds.append(out)
    return agg.stitch(jnp.concatenate(preds, axis=0))


def _stitched_metrics(
    pred: jax.Array, target: jax.Array, fid_fn=None
) -> Dict[str, float]:
    p = pred[None].astype(jnp.float32)
    t = target[None].astype(jnp.float32)
    out = {
        "test_metric_PSNR": float(jnp.mean(psnr(p, t))),
        "test_metric_SSIM": float(jnp.mean(ssim3d(p, t))),
        "test_metric_L1": float(jnp.mean(mae(p, t))),
    }
    if fid_fn is not None:
        label = getattr(fid_fn, "label", "FID")
        out[f"test_metric_{label}"] = float(fid_fn(p, t))
    return out


def save_predictions(
    out_dir: str,
    batch_idx: int,
    modality: str,
    spec: SampleSpec,
    x: np.ndarray,
    y: np.ndarray,
    y_hat: np.ndarray,
    affine: Optional[np.ndarray] = None,
    timestamp: Optional[str] = None,
) -> Dict[str, str]:
    """Write input/pred/target NIfTIs with the reference's naming scheme
    (``save_predicitions``, ``src/model.py:335-357``):
    ``{kind}-{idx}_mod-{modality}[_{time}]_sub-{sub}_ses-{ses}.nii.gz``.
    Sub/ses are parsed from the BIDS source paths; the affine is preserved.
    """
    os.makedirs(out_dir, exist_ok=True)
    in_ents = parse_entities(spec.path(modality))
    tgt_ents = parse_entities(spec.path("dwi-tensor"))
    time = f"_{timestamp}" if timestamp else ""
    paths = {}
    for kind, ents, data in (
        ("input", in_ents, x),
        ("pred", tgt_ents, y_hat),
        ("target", tgt_ents, y),
    ):
        name = (
            f"{kind}-{batch_idx}_mod-{modality}{time}"
            f"_sub-{ents.get('subject', 'NA')}"
            f"_ses-{ents.get('session', 'NA')}.nii.gz"
        )
        path = os.path.join(out_dir, name)
        save_volume(path, np.asarray(data, np.float32), affine)
        paths[kind] = path
    return paths


def run_test(
    predict_fn,
    state,
    data: DoveDataModule,
    modality: str,
    out_dir: str,
    patch_size: Optional[int] = None,
    whole_volume: bool = False,
    save: bool = True,
    fid_fn=None,
) -> Dict[str, float]:
    """Test loop over the held-out volumes (the ``trainer.test`` equivalent,
    reference ``src/model.py:291-313``): grid-stitched prediction per subject,
    metrics on stitched volumes (pred vs target — the *fixed* readout),
    NIfTI export. Target is the un-augmented ``dwi-tensor``
    (``unpack_batch(test=True)``, ``src/model.py:195-199``). Returns
    epoch-mean test metrics."""
    patch_size = patch_size or data.config.patch_size
    rows = []
    for idx, (spec, vols) in enumerate(
        data.test_volumes(keys=(modality, "dwi-tensor"))
    ):
        x = vols[modality]
        y = vols["dwi-tensor"]
        y_hat = predict_volume(
            predict_fn,
            state,
            x,
            patch_size=patch_size,
            out_channels=y.shape[-1],
            whole_volume=whole_volume,
        )
        metrics = _stitched_metrics(y_hat, y, fid_fn)
        rows.append(metrics)
        if save:
            # Preserve the target's scanner affine (defect #6 in SURVEY §7).
            try:
                affine = load_affine(spec.path("dwi-tensor"))
            except Exception:
                affine = None
            save_predictions(
                out_dir, idx, modality, spec,
                np.asarray(x), np.asarray(y), np.asarray(y_hat),
                affine=affine,
            )
    if not rows:
        return {}
    return {
        k: float(np.mean([r[k] for r in rows])) for k in rows[0]
    }
