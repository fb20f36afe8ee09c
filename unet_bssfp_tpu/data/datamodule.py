"""DoveDataModule — BIDS discovery, subject split, pairing, and batch streams.

TPU-native equivalent of the reference's ``DoveDataModule``
(``src/data_module.py:9-202``) with the same public knobs (batch 8, patch 64,
8 samples/volume, queue 16, workers 8, seed 42, splits 80/10/10):

- ``prepare_data()`` — walk the BIDS ``derivatives/preproc-dove`` scope,
  subject-level seeded split, and per-subject cross-session pairing: every DT
  file × every bSSFP file (reference ``src/data_module.py:108-117``; thesis:
  ~1077 paired samples from 120 subjects).
- ``setup()`` + ``train_batches()/val_batches()`` — volumes are loaded on
  host threads, crop-or-padded to (96,128,128), augmented *on device* with
  RNG-keyed functional transforms (keep-original-target semantics), then
  64³ patches are extracted with jitted dynamic slices and streamed as
  channels-last batches through a prefetch queue.
- ``test_volumes()`` — preprocess-only full volumes for grid-stitched
  inference (reference test path, ``src/data_module.py:148-150,168-183``).

This fixes reference defect #5 (SURVEY.md §7): the test loader there wraps a
``zip`` iterator in a DataLoader and unpacks 4-tuples from 2-tuples — here
test volumes are a plain generator consumed by ``eval.inference``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_bssfp_tpu.config import DataConfig
from unet_bssfp_tpu.data.augment import augment_subject
from unet_bssfp_tpu.data.bids import BIDSIndex, subject_split
from unet_bssfp_tpu.data.nifti import load_volume
from unet_bssfp_tpu.data.queue import PrefetchIterator, parallel_map
from unet_bssfp_tpu.data.sampler import extract_patches, uniform_patch_starts
from unet_bssfp_tpu.data.transforms import crop_or_pad

ALL_KEYS = ("dwi-tensor", "pc-bssfp", "bssfp", "t1w")


@dataclasses.dataclass(frozen=True)
class SampleSpec:
    """One paired training sample: file path per modality key."""

    subject: str
    paths: Dict[str, str]

    def path(self, key: str) -> str:
        return self.paths[key]


class DoveDataModule:
    def __init__(self, data_dir: str, config: Optional[DataConfig] = None, **kw):
        if config is None:
            config = DataConfig(data_dir=data_dir, **kw)
        else:
            config = dataclasses.replace(config, data_dir=data_dir, **kw)
        self.config = config
        self.name = "DOVE Dataset"
        self.description = (
            "Dataset of 3D and 4D MRI images of the brain acquired with"
            " different sequences and modalities including MP2RAGE, BOLD,"
            " DWI, and bSSFP."
        )
        self.index: Optional[BIDSIndex] = None
        self.train_samples: List[SampleSpec] = []
        self.val_samples: List[SampleSpec] = []
        self.test_samples: List[SampleSpec] = []
        self._augment = None
        self._volume_cache: Dict[str, np.ndarray] = {}

    # -- discovery ---------------------------------------------------------

    def prepare_data(self) -> None:
        cfg = self.config
        if not os.path.isdir(cfg.data_dir):
            raise FileNotFoundError(
                f"BIDS dataset root does not exist: {cfg.data_dir!r}"
            )
        self.index = BIDSIndex(cfg.data_dir)
        deriv = os.path.join(cfg.data_dir, cfg.derivatives)
        if os.path.isdir(deriv):
            self.index.add_derivatives(deriv)
        scope = os.path.basename(cfg.derivatives.rstrip("/"))
        subjects = self.index.get_subjects()
        train_subs, val_subs, test_subs = subject_split(
            subjects, cfg.val_split, cfg.test_split, cfg.seed
        )

        def build(subs: Sequence[str]) -> List[SampleSpec]:
            out = []
            for sub in subs:
                dwi = self.index.get(scope=scope, subject=sub, suffix="dwi",
                                     desc=cfg.desc_dwi)
                pc = self.index.get(scope=scope, subject=sub, suffix="bssfp",
                                    desc=cfg.desc_pc_bssfp)
                one = self.index.get(scope=scope, subject=sub, suffix="bssfp",
                                     desc=cfg.desc_bssfp)
                t1w = self.index.get(scope=scope, subject=sub, suffix="T1w",
                                     desc=cfg.desc_t1w)
                if not t1w:
                    continue
                # Cross-session pairing: every DT × every bSSFP index
                # (reference src/data_module.py:109-117).
                for dwi_f in dwi:
                    for i in range(min(len(pc), len(one))):
                        out.append(
                            SampleSpec(
                                subject=sub,
                                paths={
                                    "dwi-tensor": dwi_f,
                                    "pc-bssfp": pc[i],
                                    "bssfp": one[i],
                                    "t1w": t1w[0],
                                },
                            )
                        )
            return out

        self.train_samples = build(train_subs)
        self.val_samples = build(val_subs)
        self.test_samples = build(test_subs)
        if cfg.process_split and jax.process_count() > 1:
            # TPU-pod data feeding: every host loads only its stride-slice of
            # the (identically ordered, identically seeded) sample lists;
            # shard_batch assembles the per-process batches into global
            # arrays (parallel/mesh.py). batch_size is then per-process.
            pid, pn = jax.process_index(), jax.process_count()
            self.train_samples = self.train_samples[pid::pn]
            self.val_samples = self.val_samples[pid::pn]
            self.test_samples = self.test_samples[pid::pn]
        if not (self.train_samples or self.val_samples or self.test_samples):
            raise ValueError(
                f"no paired samples found under {cfg.data_dir!r} "
                f"(derivatives scope {scope!r}; desc tags "
                f"{cfg.desc_dwi}/{cfg.desc_pc_bssfp}/{cfg.desc_bssfp}/"
                f"{cfg.desc_t1w})"
            )

    def print_info(self) -> None:
        """Dataset stats (reference ``src/data_module.py:48-60``)."""
        if self.index is None:
            self.prepare_data()
        total = (
            len(self.train_samples)
            + len(self.val_samples)
            + len(self.test_samples)
        )
        print("=" * 30)
        print("Dataset name:        ", self.name)
        print("Dataset description: ", self.description)
        print("Number of samples:   ", total)
        print("=" * 30)

    def setup(self, stage: Optional[str] = None) -> None:
        if self.index is None:
            self.prepare_data()

    # -- loading -----------------------------------------------------------

    def load_subject(
        self, spec: SampleSpec, keys: Sequence[str] = ALL_KEYS
    ) -> Dict[str, np.ndarray]:
        """Load + crop-or-pad one sample's volumes (host → device-ready).
        With ``cache_volumes`` the preprocessed array is kept per path."""
        cfg = self.config

        def load_one(key):
            path = spec.path(key)
            if cfg.cache_volumes and path in self._volume_cache:
                return key, self._volume_cache[path]
            data, _ = load_volume(path)
            out = np.asarray(crop_or_pad(jnp.asarray(data), cfg.volume_shape))
            if cfg.cache_volumes:
                self._volume_cache[path] = out
            return key, out

        return dict(parallel_map(load_one, keys, cfg.num_workers))

    # -- batch streams -----------------------------------------------------

    def _patch_stream(
        self,
        samples: List[SampleSpec],
        key: jax.Array,
        keys: Sequence[str],
        augment: bool,
        batch_divisor: int = 1,
    ) -> Iterator[Dict[str, jax.Array]]:
        cfg = self.config
        order = np.asarray(
            jax.random.permutation(key, len(samples))
        )
        buffers: Dict[str, list] = {}

        def subject_patches(i, sub_key):
            vols = self.load_subject(samples[int(i)], keys)
            subject = {k: jnp.asarray(v) for k, v in vols.items()}
            if augment:
                k_aug, k_patch = jax.random.split(sub_key)
                subject = augment_subject(
                    k_aug, subject, prob=cfg.augment_prob
                )
            else:
                k_patch = sub_key
                if "dwi-tensor" in subject:
                    subject = dict(subject)
                    subject["dwi-tensor_orig"] = subject["dwi-tensor"]
            if cfg.whole_volume:
                return {k: v[None] for k, v in subject.items()}
            starts = uniform_patch_starts(
                k_patch, cfg.volume_shape, cfg.patch_size, cfg.samples_per_vol
            )
            return {
                k: extract_patches(v, starts, cfg.patch_size)
                for k, v in subject.items()
            }

        sub_keys = jax.random.split(key, len(samples))

        def gen():
            for i in order:
                patches = subject_patches(i, sub_keys[int(i)])
                for k, v in patches.items():
                    buffers.setdefault(k, []).append(v)
                n_buf = sum(b.shape[0] for b in buffers[keys[0]])
                while n_buf >= cfg.batch_size:
                    batch = {}
                    for k, blist in buffers.items():
                        cat = jnp.concatenate(blist, axis=0)
                        batch[k] = cat[: cfg.batch_size]
                        buffers[k] = [cat[cfg.batch_size :]]
                    n_buf -= cfg.batch_size
                    yield batch
            # Final partial batch (torch DataLoader drop_last=False
            # semantics): emitted at its true size — costs one extra compile
            # for the remainder shape, but small splits still contribute.
            # Under a mesh, dim 0 must divide the device count: round the
            # remainder down to a multiple of ``batch_divisor``, padding up
            # by repetition only when the remainder would vanish entirely.
            if buffers:
                rest = {
                    k: jnp.concatenate(blist, axis=0)
                    for k, blist in buffers.items()
                }
                n = rest[keys[0]].shape[0]
                if n > 0 and batch_divisor > 1:
                    keep = (n // batch_divisor) * batch_divisor
                    if keep == 0:
                        reps = -(-batch_divisor // n)
                        rest = {
                            k: jnp.tile(
                                v, (reps,) + (1,) * (v.ndim - 1)
                            )[:batch_divisor]
                            for k, v in rest.items()
                        }
                        n = batch_divisor
                    else:
                        rest = {k: v[:keep] for k, v in rest.items()}
                        n = keep
                if n > 0:
                    yield rest

        return PrefetchIterator(gen(), size=2)

    def train_batches(
        self,
        key: jax.Array,
        keys: Sequence[str] = ALL_KEYS,
        batch_divisor: int = 1,
    ) -> Iterator[Dict[str, jax.Array]]:
        return self._patch_stream(
            self.train_samples, key, keys, augment=True,
            batch_divisor=batch_divisor,
        )

    def val_batches(
        self,
        key: jax.Array,
        keys: Sequence[str] = ALL_KEYS,
        batch_divisor: int = 1,
        augment: bool = True,
    ) -> Iterator[Dict[str, jax.Array]]:
        # The reference applies the augmentation chain to val too
        # (src/data_module.py:146-147) — that is the default.
        # ``augment=False`` serves the clean-val measurement (how many dB
        # the augmented-val convention costs), logged by the Trainer as
        # ``val_clean_*`` when ``TrainConfig.log_clean_val`` is set.
        return self._patch_stream(
            self.val_samples, key, keys, augment=augment,
            batch_divisor=batch_divisor,
        )

    def test_volumes(
        self, keys: Sequence[str] = ALL_KEYS
    ) -> Iterator[Tuple[SampleSpec, Dict[str, jax.Array]]]:
        """Preprocess-only full volumes (reference
        ``src/data_module.py:148-150``)."""
        for spec in self.test_samples:
            vols = self.load_subject(spec, keys)
            yield spec, {k: jnp.asarray(v) for k, v in vols.items()}

    def steps_per_epoch(self, split: str = "train") -> int:
        cfg = self.config
        n = len(getattr(self, f"{split}_samples"))
        per_vol = 1 if cfg.whole_volume else cfg.samples_per_vol
        return (n * per_vol) // cfg.batch_size
