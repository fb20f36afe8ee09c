"""Data layer: BIDS parsing, split, pairing, transforms, samplers, augment."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_bssfp_tpu.data.bids import BIDSIndex, parse_entities, subject_split
from unet_bssfp_tpu.data.datamodule import DoveDataModule
from unet_bssfp_tpu.data.sampler import (
    GridAggregator,
    extract_patches,
    grid_patch_starts,
    uniform_patch_starts,
)
from unet_bssfp_tpu.data.synthetic import make_synthetic_bids
from unet_bssfp_tpu.data.transforms import crop_or_pad
from unet_bssfp_tpu.data import augment


@pytest.fixture(scope="module")
def bids_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bids")
    return make_synthetic_bids(str(root), subjects=("01", "02", "03"),
                               sessions=("1", "2"), volume_shape=(16, 16, 16))


def test_parse_entities():
    ents = parse_entities("/x/sub-01/ses-2/dwi/sub-01_ses-2_desc-normtensor_dwi.nii.gz")
    assert ents["subject"] == "01"
    assert ents["session"] == "2"
    assert ents["desc"] == "normtensor"
    assert ents["suffix"] == "dwi"
    assert ents["extension"] == ".nii.gz"


def test_bids_index_queries(bids_root):
    idx = BIDSIndex(bids_root)
    idx.add_derivatives(f"{bids_root}/derivatives/preproc-dove")
    assert idx.get_subjects() == ["01", "02", "03"]
    dt = idx.get(scope="preproc-dove", subject="01", suffix="dwi",
                 desc="normtensor")
    assert len(dt) == 2  # two sessions
    t1 = idx.get(scope="preproc-dove", subject="01", suffix="T1w",
                 desc="normrepeat")
    assert len(t1) == 1


def test_subject_split_deterministic():
    subs = [f"{i:02d}" for i in range(20)]
    a = subject_split(subs, 0.1, 0.1, seed=42)
    b = subject_split(subs, 0.1, 0.1, seed=42)
    assert a == b
    train, val, test = a
    assert len(train) == 16 and len(val) == 2 and len(test) == 2
    assert set(train) | set(val) | set(test) == set(subs)
    c = subject_split(subs, 0.1, 0.1, seed=7)
    assert c != a


def test_crop_or_pad():
    v = jnp.ones((10, 20, 6, 2))
    out = crop_or_pad(v, (16, 16, 16))
    assert out.shape == (16, 16, 16, 2)
    # Padded border is fill value; cropped center preserved.
    assert float(out[0, 0, 0, 0]) == 0.0
    assert float(out[8, 8, 8, 0]) == 1.0


def test_uniform_patch_starts_in_range():
    starts = uniform_patch_starts(jax.random.PRNGKey(0), (16, 24, 24), 8, 100)
    s = np.asarray(starts)
    assert s.shape == (100, 3)
    assert (s >= 0).all()
    assert (s[:, 0] <= 8).all() and (s[:, 1] <= 16).all()
    # Uniform over the full range: extremes are hit.
    assert s[:, 0].max() > 4 and s[:, 0].min() < 4


def test_extract_patches_content(rng):
    vol = jnp.asarray(rng.random((12, 12, 12, 3)).astype(np.float32))
    starts = jnp.asarray([[0, 0, 0], [4, 4, 4]], jnp.int32)
    patches = extract_patches(vol, starts, 8)
    assert patches.shape == (2, 8, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(patches[0]), np.asarray(vol[:8, :8, :8]))
    np.testing.assert_allclose(
        np.asarray(patches[1]), np.asarray(vol[4:12, 4:12, 4:12])
    )


def test_grid_starts_cover_volume():
    starts = grid_patch_starts((96, 128, 128), 64)
    assert starts.shape == (8, 3)  # 2x2x2 (SURVEY §5.7)
    assert (starts >= 0).all()
    # Covers every voxel.
    cover = np.zeros((96, 128, 128), bool)
    for z, y, x in starts:
        cover[z : z + 64, y : y + 64, x : x + 64] = True
    assert cover.all()


def test_grid_aggregator_roundtrip(rng):
    vol = rng.random((24, 32, 32, 2)).astype(np.float32)
    agg = GridAggregator((24, 32, 32), 2, 16, mode="average")
    patches = extract_patches(jnp.asarray(vol), agg.starts, 16)
    out = np.asarray(agg.stitch(patches))
    # Identity model → stitched output equals input exactly (overlap averaging
    # of identical values).
    np.testing.assert_allclose(out, vol, atol=1e-6)

    agg_ow = GridAggregator((24, 32, 32), 2, 16, mode="overwrite")
    out2 = np.asarray(agg_ow.stitch(patches))
    np.testing.assert_allclose(out2, vol, atol=1e-6)


def test_datamodule_end_to_end(bids_root):
    dm = DoveDataModule(
        bids_root,
        batch_size=4,
        samples_per_vol=4,
        patch_size=8,
        volume_shape=(16, 16, 16),
        num_workers=2,
    )
    dm.prepare_data()
    total = len(dm.train_samples) + len(dm.val_samples) + len(dm.test_samples)
    # 3 subjects × 2 sessions DT × 2 bssfp pairs = 12 samples.
    assert total == 12
    # Subject-level separation.
    subs = lambda samples: {s.subject for s in samples}
    assert not (subs(dm.train_samples) & subs(dm.test_samples))

    batches = list(dm.train_batches(jax.random.PRNGKey(0),
                                    keys=("pc-bssfp", "dwi-tensor")))
    assert batches
    b = batches[0]
    assert b["pc-bssfp"].shape == (4, 8, 8, 8, 24)
    assert b["dwi-tensor"].shape == (4, 8, 8, 8, 6)
    assert b["dwi-tensor_orig"].shape == (4, 8, 8, 8, 6)
    # Values stay in a sane range after augmentation.
    assert np.isfinite(np.asarray(b["pc-bssfp"])).all()


def test_augmentations_shapes_and_effect(rng):
    vol = jnp.asarray(rng.random((16, 16, 16, 2)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    for name, fn in augment._DEFAULT_CHAIN:
        out = fn(key, vol)
        assert out.shape == vol.shape, name
        assert np.isfinite(np.asarray(out)).all(), name
        if name != "blur":
            # blur at the reference's std=(0.01,0.1) voxels is a
            # near-identity (kernel weight e^-50) by design.
            assert not np.allclose(np.asarray(out), np.asarray(vol)), name
    # Blur visibly blurs at a realistic sigma.
    blurred = augment.random_blur(key, vol, std_range=(1.0, 2.0))
    assert not np.allclose(np.asarray(blurred), np.asarray(vol))
    assert float(jnp.std(blurred)) < float(jnp.std(vol))


def test_augment_keeps_original_target(rng):
    vol = {
        "dwi-tensor": jnp.asarray(rng.random((8, 8, 8, 6)).astype(np.float32)),
        "pc-bssfp": jnp.asarray(rng.random((8, 8, 8, 24)).astype(np.float32)),
    }
    out = augment.augment_subject(jax.random.PRNGKey(0), vol, prob=1.0)
    np.testing.assert_allclose(
        np.asarray(out["dwi-tensor_orig"]), np.asarray(vol["dwi-tensor"])
    )
    assert not np.allclose(
        np.asarray(out["dwi-tensor"]), np.asarray(vol["dwi-tensor"])
    )


def test_augment_prob_zero_is_identity(rng):
    vol = jnp.asarray(rng.random((8, 8, 8, 2)).astype(np.float32))
    out = augment.augment_volume(jax.random.PRNGKey(0), vol, prob=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol))


def test_whole_volume_mode(bids_root):
    dm = DoveDataModule(
        bids_root,
        batch_size=2,
        patch_size=8,
        volume_shape=(16, 16, 16),
        num_workers=2,
        whole_volume=True,
    )
    dm.prepare_data()
    batches = list(dm.train_batches(jax.random.PRNGKey(0),
                                    keys=("pc-bssfp", "dwi-tensor")))
    assert batches
    b = batches[0]
    assert b["pc-bssfp"].shape == (2, 16, 16, 16, 24)
    assert b["dwi-tensor_orig"].shape == (2, 16, 16, 16, 6)
    assert dm.steps_per_epoch("train") == len(dm.train_samples) // 2


def test_grid_starts_rejects_small_volume():
    with pytest.raises(ValueError, match="smaller than patch"):
        grid_patch_starts((32, 128, 128), 64)


def test_volume_cache(bids_root):
    dm = DoveDataModule(
        bids_root, volume_shape=(16, 16, 16), num_workers=1,
        cache_volumes=True,
    )
    dm.prepare_data()
    spec = dm.train_samples[0]
    v1 = dm.load_subject(spec, keys=("dwi-tensor",))
    assert dm._volume_cache
    v2 = dm.load_subject(spec, keys=("dwi-tensor",))
    assert v2["dwi-tensor"] is v1["dwi-tensor"]  # served from cache


def test_partial_batch_respects_divisor(bids_root):
    """Mesh-divisible remainders: the final partial batch is rounded down to
    a multiple of batch_divisor (padded up by repetition when it would
    vanish), so shard_batch never sees an indivisible dim 0."""
    dm = DoveDataModule(
        bids_root, batch_size=4, samples_per_vol=1, patch_size=8,
        volume_shape=(16, 16, 16), num_workers=1,
        test_split=0.34, val_split=0.33,
    )
    dm.prepare_data()
    for split_batches in (
        dm.train_batches(jax.random.PRNGKey(0), keys=("dwi-tensor",),
                         batch_divisor=4),
        dm.val_batches(jax.random.PRNGKey(0), keys=("dwi-tensor",),
                       batch_divisor=4),
    ):
        for b in split_batches:
            assert b["dwi-tensor"].shape[0] % 4 == 0
            assert b["dwi-tensor"].shape[0] > 0


def test_linked_fixture_is_learnable(tmp_path):
    """``linked=True``: DT / one-cycle bSSFP / T1w are the fixed global
    deterministic voxel-wise maps of the pc-bSSFP field that the quality
    records rely on (scripts/convergence_bench.py --linked), identical
    across subjects; the default fixture has no such relation."""
    from unet_bssfp_tpu.data.nifti import load_volume
    from unet_bssfp_tpu.data.synthetic import _linked_map

    root = make_synthetic_bids(
        str(tmp_path / "linked"), subjects=("01", "02"), sessions=("1",),
        volume_shape=(8, 8, 8), linked=True,
    )

    def vol(sub, rel):
        path = os.path.join(
            root, "derivatives", "preproc-dove", f"sub-{sub}", "ses-1",
            rel.format(sub=sub),
        )
        return load_volume(path)[0]

    for sub in ("01", "02"):
        pc = vol(sub, "dwi/sub-{sub}_ses-1_desc-normflatbet_bssfp.nii.gz")
        dt = vol(sub, "dwi/sub-{sub}_ses-1_desc-normtensor_dwi.nii.gz")
        nopc = vol(sub, "dwi/sub-{sub}_ses-1_desc-nfbnopc_bssfp.nii.gz")
        t1w = vol(sub, "anat/sub-{sub}_ses-1_desc-normrepeat_T1w.nii.gz")
        np.testing.assert_allclose(dt, _linked_map(pc, 6, tag=1), atol=1e-6)
        np.testing.assert_allclose(nopc, _linked_map(pc, 24, tag=2),
                                   atol=1e-6)
        np.testing.assert_allclose(t1w, _linked_map(pc, 6, tag=3), atol=1e-6)
        assert 0.0 <= dt.min() and dt.max() <= 1.0

    # default (unlinked) fixture: no such relation
    root_u = make_synthetic_bids(
        str(tmp_path / "unlinked"), subjects=("01",), sessions=("1",),
        volume_shape=(8, 8, 8),
    )
    pc = load_volume(os.path.join(
        root_u, "derivatives", "preproc-dove", "sub-01", "ses-1", "dwi",
        "sub-01_ses-1_desc-normflatbet_bssfp.nii.gz"))[0]
    dt = load_volume(os.path.join(
        root_u, "derivatives", "preproc-dove", "sub-01", "ses-1", "dwi",
        "sub-01_ses-1_desc-normtensor_dwi.nii.gz"))[0]
    assert np.abs(dt - _linked_map(pc, 6, tag=1)).max() > 0.05


def test_two_cohort_offset_shifts_linked_map(tmp_path):
    """``link_tag_offset``: a second COHORT whose generating map is in the
    same family but genuinely different — the two-cohort domain-transfer
    fixture (pretrain on offset-0, finetune on offset-k; reference regime
    ``doc/thesis/03-methods.tex:784-787``)."""
    from unet_bssfp_tpu.data.nifti import load_volume
    from unet_bssfp_tpu.data.synthetic import _linked_map

    root = make_synthetic_bids(
        str(tmp_path / "b"), subjects=("01",), sessions=("1",),
        volume_shape=(8, 8, 8), linked=True, link_tag_offset=10,
    )
    d = os.path.join(root, "derivatives", "preproc-dove", "sub-01", "ses-1")
    pc = load_volume(os.path.join(
        d, "dwi", "sub-01_ses-1_desc-normflatbet_bssfp.nii.gz"))[0]
    dt = load_volume(os.path.join(
        d, "dwi", "sub-01_ses-1_desc-normtensor_dwi.nii.gz"))[0]
    t1w = load_volume(os.path.join(
        d, "anat", "sub-01_ses-1_desc-normrepeat_T1w.nii.gz"))[0]
    np.testing.assert_allclose(dt, _linked_map(pc, 6, tag=11), atol=1e-6)
    np.testing.assert_allclose(t1w, _linked_map(pc, 6, tag=13), atol=1e-6)
    # the shifted map differs from the offset-0 cohort's relation
    assert np.abs(dt - _linked_map(pc, 6, tag=1)).max() > 0.05
