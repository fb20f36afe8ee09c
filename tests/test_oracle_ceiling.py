"""Oracle-ceiling tooling (scripts/oracle_ceiling.py).

The oracle's value rests on one identity: its reconstructed weights ARE
the fixture's generating weights, applied at full precision, on patches
that stay voxel-aligned across modalities through the data pipeline.
Both halves broke once during development (a per-call RNG draw handed
later batches weights from further down the stream), so both are pinned
here.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

from oracle_ceiling import make_linked_map_fn  # noqa: E402

from unet_bssfp_tpu.data.synthetic import _linked_map, make_synthetic_bids


def test_reconstructed_weights_match_generator_every_call(rng):
    """The jitted oracle equals data/synthetic.py::_linked_map on every
    call — not just the first (regression: per-call RNG advancement)."""
    fn = make_linked_map_fn(6, tag=1)
    for _ in range(3):  # repeated calls must not drift
        x = rng.random((4, 5, 5, 24)).astype(np.float32)
        want = _linked_map(x, 6, tag=1)
        got = np.asarray(fn(x))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_wrong_tag_does_not_match(rng):
    x = rng.random((4, 5, 5, 24)).astype(np.float32)
    want = _linked_map(x, 6, tag=1)
    got = np.asarray(make_linked_map_fn(6, tag=2)(x))
    assert np.abs(got - want).max() > 0.1


def test_pipeline_patches_stay_aligned(tmp_path):
    """Through BIDS load -> crop_or_pad -> patch extraction, the oracle
    applied to the pc-bssfp patch reproduces the dwi-tensor patch
    exactly: patch starts are shared across modalities."""
    from unet_bssfp_tpu.config import DataConfig
    from unet_bssfp_tpu.data.datamodule import DoveDataModule

    root = make_synthetic_bids(
        str(tmp_path / "bids"), subjects=("01", "02", "03"),
        sessions=("1",), volume_shape=(16, 16, 16), linked=True, seed=0,
    )
    cfg = DataConfig(
        data_dir=root, batch_size=4, patch_size=8, samples_per_vol=4,
        volume_shape=(16, 16, 16), val_split=0.34, test_split=0.0,
    )
    data = DoveDataModule(root, config=cfg)
    data.setup()
    fn = make_linked_map_fn(6, tag=1)
    seen = 0
    for batch in data.val_batches(
        jax.random.PRNGKey(0), keys=("pc-bssfp", "dwi-tensor"),
        augment=False,
    ):
        pred = np.asarray(fn(batch["pc-bssfp"]))
        np.testing.assert_allclose(
            pred, np.asarray(batch["dwi-tensor_orig"]), atol=1e-5
        )
        seen += batch["pc-bssfp"].shape[0]
    assert seen > 0
