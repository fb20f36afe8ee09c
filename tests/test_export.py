"""Serving-artifact export (`unet_bssfp_tpu/eval/export.py`): roundtrip
serialize → file → deserialize must reproduce the eval-mode generator
exactly, with no model code needed at load time."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_bssfp_tpu.config import ModelConfig, TrainConfig
from unet_bssfp_tpu.eval.export import (
    export_generator,
    load_exported,
    save_exported,
)
from unet_bssfp_tpu.train.state import build_models, create_gan_state

MCFG = ModelConfig(
    features=(4, 8, 8, 16, 16, 4),
    disc_features=(8, 8, 16),
    compute_dtype="float32",
)
PATCH = 16


def _tiny_state():
    return create_gan_state(
        jax.random.PRNGKey(0), "pc-bssfp", MCFG, TrainConfig(),
        patch_size=PATCH,
    )


def test_export_roundtrip_exact(tmp_path):
    state = _tiny_state()
    shape = (2, PATCH, PATCH, PATCH, 24)
    exported, meta = export_generator(
        "pc-bssfp", MCFG, state, shape, platforms=("cpu",),
        extra_meta={"git": "test"},
    )
    path = os.path.join(tmp_path, "model.ubx")
    save_exported(exported, meta, path)

    call, meta2 = load_exported(path)
    assert meta2["input_shape"] == list(shape)
    assert meta2["modality"] == "pc-bssfp"
    assert meta2["git"] == "test"

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(call(x))

    gen, _ = build_models("pc-bssfp", MCFG)
    variables = {
        "params": state.gen_params,
        "batch_stats": state.gen_batch_stats,
    }
    # jit the reference forward: the artifact embeds the jitted program, and
    # unjitted op-by-op execution fuses differently (~4e-6 drift on CPU).
    want = np.asarray(
        jax.jit(
            lambda a: gen.apply(variables, a, train=False).astype(
                jnp.float32
            )
        )(x)
    )
    np.testing.assert_array_equal(got, want)
    assert got.shape == (2, PATCH, PATCH, PATCH, 6)


def test_export_rejects_bad_magic(tmp_path):
    path = os.path.join(tmp_path, "junk.ubx")
    with open(path, "wb") as f:
        f.write(b"NOTANEXPORT")
    try:
        load_exported(path)
    except ValueError as e:
        assert "not a unet_bssfp_tpu export" in str(e)
    else:
        raise AssertionError("expected ValueError on bad magic")


def test_export_multiplatform_lowering():
    # CPU+TPU lowering must succeed on a CPU-only host (cross-platform
    # export is the point of shipping one artifact).
    state = _tiny_state()
    shape = (1, PATCH, PATCH, PATCH, 24)
    exported, meta = export_generator(
        "pc-bssfp", MCFG, state, shape, platforms=("cpu", "tpu")
    )
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    assert len(bytes(exported.serialize())) > 0


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    """checkpoint dir (with embedded config) → src/export.py → artifact →
    src/predict.py --exported → prediction NIfTI. Exercises the CLI glue
    (config resolution, MODALITY_CHANNELS, artifact IO) in subprocesses."""
    import subprocess
    import sys

    from unet_bssfp_tpu.config import Config, DataConfig, TrainConfig
    from unet_bssfp_tpu.data.nifti import save_volume
    from unet_bssfp_tpu.train.checkpoint import CheckpointManager

    vol_shape = (16, 16, 16)
    cfg = Config(
        data=DataConfig(patch_size=PATCH, volume_shape=vol_shape),
        model=MCFG,
        train=TrainConfig(),
    )
    ckpt_root = os.path.join(tmp_path, "ckpts")
    mgr = CheckpointManager(ckpt_root, top_k=1, config_json=cfg.to_json())
    mgr.save(0, _tiny_state(), {"val_loss": 1.0})
    mgr.wait()
    mgr.close()
    ckpt = os.path.join(ckpt_root, "0")
    assert os.path.isdir(ckpt)

    vol_path = os.path.join(tmp_path, "vol.nii.gz")
    rng = np.random.default_rng(1)
    save_volume(
        vol_path,
        rng.standard_normal((*vol_shape, 24)).astype(np.float32),
        np.eye(4),
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "UNET_BSSFP_PLATFORM": "cpu", "PYTHONPATH": repo}
    art = os.path.join(tmp_path, "model.ubx")
    subprocess.run(
        [sys.executable, os.path.join(repo, "src", "export.py"),
         "--checkpoint", ckpt, "--modality", "pc-bssfp", "--out", art,
         "--platforms", "cpu"],
        check=True, env=env, timeout=600,
    )
    assert os.path.getsize(art) > 0

    out_dir = os.path.join(tmp_path, "served")
    subprocess.run(
        [sys.executable, os.path.join(repo, "src", "predict.py"), vol_path,
         "--exported", art, "--out-dir", out_dir],
        check=True, env=env, timeout=600,
    )
    preds = [f for f in os.listdir(out_dir) if f.endswith("_pred-dt.nii.gz")]
    assert len(preds) == 1
