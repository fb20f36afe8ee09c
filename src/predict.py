"""Single-volume prediction CLI: one NIfTI in → DT prediction (+ optional
scalar maps) out.

The serving-shaped entry point the reference lacks: load a preprocessed
modality volume, run the generator (whole-volume fast path, ~39 ms on v5e;
grid-stitched fallback via --patch), write ``pred.nii.gz`` with the source
affine, optionally derive the 7 scalar maps.

Usage:
  python src/predict.py INPUT.nii.gz --checkpoint CKPT --modality pc-bssfp \
      --out-dir preds [--scalar-maps] [--patch]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="bSSFP/T1w → DT inference")
    parser.add_argument("input", help="preprocessed input NIfTI")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--exported", default=None,
        help="serve from a src/export.py artifact instead of a checkpoint",
    )
    parser.add_argument("--modality", default="pc-bssfp")
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--config", default=None, help="JSON config path")
    parser.add_argument(
        "--scalar-maps", action="store_true",
        help="also write FA/MD/AD/RD/azimuth/inclination/RGB maps",
    )
    parser.add_argument(
        "--rescale-args", default=None,
        help="rescale_args_dwi.txt to de-normalise before scalar maps",
    )
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument(
        "--patch", action="store_true",
        help="force grid-stitched patch inference",
    )
    mode.add_argument(
        "--whole-volume", action="store_true",
        help="force whole-volume inference",
    )
    args = parser.parse_args()
    if args.checkpoint is None and args.exported is None:
        parser.error("one of --checkpoint / --exported is required")
    if args.checkpoint is not None and args.exported is not None:
        parser.error(
            "--checkpoint and --exported are mutually exclusive — the "
            "artifact carries its own frozen weights"
        )

    import jax
    import jax.numpy as jnp

    from unet_bssfp_tpu.config import Config
    from unet_bssfp_tpu.data.nifti import load_volume, save_volume
    from unet_bssfp_tpu.data.transforms import crop_or_pad
    from unet_bssfp_tpu.eval.inference import predict_volume
    from unet_bssfp_tpu.train.checkpoint import (
        load_checkpoint,
        load_config_for_checkpoint,
    )
    from unet_bssfp_tpu.train.state import build_models, create_gan_state
    from unet_bssfp_tpu.train.steps import make_predict_fn

    exported_call = None
    if args.exported:
        # Serving from a frozen artifact: no checkpoint, no model build —
        # the shape/weights live in the file (src/export.py).
        from unet_bssfp_tpu.eval.export import load_exported

        exported_call, exported_meta = load_exported(args.exported)
        target_shape = tuple(exported_meta["input_shape"][1:4])
        batch = int(exported_meta["input_shape"][0])
        if batch != 1:
            parser.error(
                f"exported artifact was frozen at batch={batch}; this CLI "
                f"serves one volume at a time — re-export with --batch 1"
            )
        if args.whole_volume or args.patch:
            flag = "--whole-volume" if args.whole_volume else "--patch"
            print(f"note: {flag} is ignored with --exported (the "
                  "artifact's frozen input shape decides)")
        if exported_meta.get("modality", args.modality) != args.modality:
            parser.error(
                f"exported artifact was frozen for modality "
                f"{exported_meta['modality']!r}, but --modality is "
                f"{args.modality!r}"
            )
    elif args.config:
        with open(args.config) as f:
            config = Config.from_json(f.read())
    else:
        saved = load_config_for_checkpoint(args.checkpoint)
        config = Config.from_json(saved) if saved else Config()
    if exported_call is None:
        target_shape = tuple(config.data.volume_shape)

    data, affine = load_volume(args.input)
    if exported_call is not None:
        # Channel-count mismatches would otherwise surface as an opaque
        # shape error deep inside jax.export — fail with the artifact's
        # modality instead (ADVICE r3).
        want_c = int(exported_meta["input_shape"][4])
        have_c = data.shape[3] if data.ndim == 4 else 1
        if have_c != want_c:
            parser.error(
                f"input has {have_c} channel(s) but the exported artifact "
                f"(modality {exported_meta.get('modality')!r}) was frozen "
                f"for {want_c}-channel input"
            )
    if exported_call is not None and any(
        data.shape[i] > target_shape[i] for i in range(3)
    ):
        # A --patch export frozen at e.g. 64³ would silently predict only
        # the centre crop of a larger volume — data loss, not serving.
        parser.error(
            f"exported artifact input shape {target_shape} is smaller than "
            f"the volume {data.shape[:3]}; re-export without --patch (or "
            f"with a matching volume_shape) to serve whole volumes"
        )
    vol = crop_or_pad(jnp.asarray(data), target_shape)
    # crop_or_pad shifts the voxel grid: carry the shift into the affine so
    # the prediction stays registered to the source.
    # Matches crop_or_pad: crop start (cur-tgt)//2 for crop, -(tgt-cur)//2
    # for pad (floor semantics differ for odd differences).
    def _offset(cur, tgt):
        return (cur - tgt) // 2 if cur >= tgt else -((tgt - cur) // 2)

    offset = [
        _offset(data.shape[i], target_shape[i]) for i in range(3)
    ]
    affine = np.asarray(affine, np.float64).copy()
    affine[:3, 3] += affine[:3, :3] @ np.asarray(offset, np.float64)

    if exported_call is not None:
        t0 = time.perf_counter()
        pred = exported_call(vol[None].astype(jnp.float32))[0]
        pred_np = np.asarray(jax.device_get(pred), np.float32)
        print(f"inference: {time.perf_counter() - t0:.3f}s "
              f"(exported artifact, frozen input {target_shape})")
    else:
        # Default to the mode the checkpoint was trained with: patch-trained
        # models get patch-stitched inference so InstanceNorm moments match
        # training (same rule as eval_model).
        if args.patch:
            whole_volume = False
        elif args.whole_volume:
            whole_volume = True
        else:
            whole_volume = config.data.whole_volume

        gen, _ = build_models(args.modality, config.model)
        state = create_gan_state(
            jax.random.PRNGKey(0), args.modality, config.model, config.train,
            patch_size=config.data.patch_size,
        )
        state = load_checkpoint(args.checkpoint, state)
        predict_fn = make_predict_fn(gen)

        t0 = time.perf_counter()
        pred = predict_volume(
            predict_fn,
            state,
            vol,
            patch_size=config.data.patch_size,
            out_channels=config.model.out_channels,
            whole_volume=whole_volume,
        )
        pred_np = np.asarray(pred, np.float32)
        print(f"inference: {time.perf_counter() - t0:.3f}s "
              f"({'whole-volume' if whole_volume else 'patch-stitched'})")

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.basename(args.input).split(".nii")[0]
    pred_path = os.path.join(args.out_dir, f"{base}_pred-dt.nii.gz")
    save_volume(pred_path, pred_np, affine)
    print(f"wrote {pred_path}")

    if args.scalar_maps:
        from unet_bssfp_tpu.ops.scalar_maps import (
            compute_scalar_maps,
            invert_dwi_tensor_norm,
            load_rescale_args,
        )

        d6 = jnp.asarray(pred_np)
        if args.rescale_args:
            d6 = invert_dwi_tensor_norm(
                d6, load_rescale_args(args.rescale_args)
            )
        maps = compute_scalar_maps(d6)
        for name in ("fa", "md", "ad", "rd", "azimuth", "inclination", "rgb"):
            out_path = os.path.join(args.out_dir, f"{base}_{name}.nii.gz")
            save_volume(out_path, np.asarray(getattr(maps, name)), affine)
        print(f"wrote 7 scalar maps to {args.out_dir}")


if __name__ == "__main__":
    main()
