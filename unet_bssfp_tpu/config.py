"""Typed configuration layer.

The reference hard-codes every path and hyperparameter (reference
``README.md:5``; ctor defaults ``src/data_module.py:10-19``,
``src/model.py:142-147``; cluster paths ``src/train.py:89``,
``src/eval.py:330-346``). This module centralises them as dataclasses with the
reference's defaults so runs are reproducible and scriptable, while keeping the
same public knob names.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple


MODALITIES = ("dwi-tensor", "pc-bssfp", "bssfp", "t1w")

# Channel counts per modality (reference src/model.py:19-34; thesis
# 03-methods.tex:670-686: pc-bSSFP 24ch, DT 6ch, T1w repeated to 6ch).
MODALITY_CHANNELS = {
    "dwi-tensor": 6,
    "pc-bssfp": 24,
    "bssfp": 24,
    "t1w": 6,
}

# Modalities sharing an input-head parameter subtree
# (reference src/model.py:19-34: dwi-tensor/t1w share, pc-bssfp/bssfp share).
HEAD_GROUPS = {
    "dwi-tensor": "head6",
    "t1w": "head6",
    "pc-bssfp": "head24",
    "bssfp": "head24",
}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Mirrors DoveDataModule knobs (reference src/data_module.py:10-19)."""

    data_dir: str = ""
    derivatives: str = "derivatives/preproc-dove"
    batch_size: int = 8
    test_split: float = 0.1
    val_split: float = 0.1
    num_workers: int = 8
    max_queue_len: int = 16
    samples_per_vol: int = 8
    patch_size: int = 64
    seed: int = 42
    # CropOrPad target (reference src/data_module.py:127).
    volume_shape: Tuple[int, int, int] = (96, 128, 128)
    # BIDS desc-tag selectors (reference src/data_module.py:99-106).
    desc_dwi: str = "normtensor"
    desc_pc_bssfp: str = "normflatbet"
    desc_bssfp: str = "nfbnopc"
    desc_t1w: str = "normrepeat"
    # Augmentation probability per transform (reference
    # src/data_module.py:130-139: each p=0.1).
    augment_prob: float = 0.1
    # Train on whole (96,128,128) volumes instead of 64³ patches — the TPU
    # fast path (volumes fit HBM comfortably, SURVEY.md §5.7); patch mode is
    # the reference-parity default.
    whole_volume: bool = False
    # Keep preprocessed volumes in host RAM after first load (skip per-epoch
    # NIfTI re-reads). ~220MB per paired sample at (96,128,128): right for
    # small datasets/smoke runs, wrong for the full 1077-sample corpus.
    cache_volumes: bool = False
    # Multi-host (TPU pod): each process loads only its stride-slice of the
    # sample lists and batch_size becomes per-process (shard_batch assembles
    # global arrays via make_array_from_process_local_data). No effect when
    # jax.process_count() == 1.
    process_split: bool = True


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Generator/discriminator hyperparameters (reference src/model.py)."""

    # BasicUNet features (reference src/model.py:26).
    features: Tuple[int, ...] = (32, 64, 128, 256, 512, 32)
    dropout: float = 0.05
    unet_in_channels: int = 24
    out_channels: int = 6
    # MONAI BasicUNet defaults: LeakyReLU(0.1) + InstanceNorm(affine).
    unet_negative_slope: float = 0.1
    # DownSampleConv LeakyReLU slope (reference src/model.py:57).
    disc_negative_slope: float = 0.2
    # Discriminator channel ladder (reference src/model.py:79-83).
    disc_features: Tuple[int, ...] = (32, 64, 128, 256, 512)
    # Compute dtype: "bfloat16" for TPU speed-of-light, "float32" for parity
    # with the reference's fp32 training (src/train.py:33).
    compute_dtype: str = "bfloat16"
    # MultiInputUNet (multi-stage regime) backbone widths; None = thesis
    # defaults (48, 96, 192, 384, 768, 24) (doc/thesis/03-methods.tex).
    multistage_features: Optional[Tuple[int, ...]] = None
    # Use the Pallas fused InstanceNorm+LeakyReLU kernel in the generator.
    # Measured on v5e: neutral in forward (XLA fuses the chain equally well)
    # and ~4% slower in training (the custom-VJP recompute) — so off by
    # default; kept as tested infrastructure for shapes where XLA's fusion
    # falls short.
    use_pallas: bool = False
    # Rematerialise U-Net blocks in backward (memory for FLOPs).
    remat: bool = False
    # Shifted space-to-depth folded layout for the generator's two
    # full-resolution stages (models.folded_layers): measured 1.58× fwd+bwd
    # on the conv_0 stage on v5e, exact numerics, checkpoint-compatible
    # param paths, pure XLA (so it SPMD-partitions — the multi-chip path;
    # `packed` supersedes it single-chip). None = auto (True on TPU).
    folded: Optional[bool] = None
    # Pallas spatial-lane conv kernel for the generator's full-resolution
    # stages (ops.pallas.conv3d): HBM read once per conv (vs ~27× for XLA's
    # im2col), full MXU lanes — measured 1.9–2.9× fwd+bwd on v5e at the
    # stage shapes. Takes precedence over `folded` where supported.
    # None = auto: on for any TPU topology (train.state.auto_packed) — the
    # kernels shard_map over the `data` axis, and over a `space` axis via
    # ppermute d-halo exchange (ops.pallas.conv3d::packed_conv_mesh /
    # conv3x3_packed_halo); per-conv shape gates fall back to folded/XLA
    # inside the wrapper when an axis does not divide.
    packed: Optional[bool] = None
    # w-packed conv GEMMs (ops.packed_conv) for the generator's
    # mid-resolution stages down_1/upcat_2 (32³/Cout-64: pack=2 fills all
    # 128 MXU lanes). Exact numerics, checkpoint-compatible param paths.
    # Default off: the in-step A/B (scripts/wpack_ab.py, BENCH_NOTES_r4)
    # decides whether it gates in.
    wpack_mid: bool = False
    # Shifted space-to-depth formulation for the discriminator's k4s2
    # convs (ops.folded.conv_k4s2_folded): same FLOPs, 8× the MXU reduction
    # lanes at small Cin. MEASURED SLOWER on v5e (scripts/disc_conv_probe
    # r3: 0.34×/0.65× fwd+bwd at the dominant 64³/32³ stages — the s2d
    # gather costs more HBM traffic than the widened GEMM saves), so auto
    # resolves to False; kept as an opt-in formulation for study. Param
    # trees identical either way.
    disc_folded: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (reference src/model.py:142-147,
    src/train.py:15-43; thesis 03-methods.tex:777-787)."""

    lr: float = 1e-3
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    perceptual_factor: float = 1e3
    recon_factor: float = 1e2
    max_epochs: int = 50
    early_stop_monitor: str = "val_gen_loss_recon"
    early_stop_patience: int = 10
    checkpoint_monitor: str = "val_loss"
    checkpoint_top_k: int = 10
    checkpoint_dir: str = "logs/checkpoints"
    log_dir: str = "logs"
    seed: int = 42
    # Multi-stage regime (thesis 03-methods.tex:784-787).
    finetune_lr: float = 1e-5
    # Mesh axes: data-parallel by default; spatial axis for halo-sharded conv.
    mesh_axes: Tuple[str, ...] = ("data",)
    wandb_project: Optional[str] = None  # e.g. "dove"; None = CSV-only
    # Build the MedicalNet perceptual term (reference PerceptualL1Loss,
    # src/model.py:127-146 — the reference ALWAYS trains with it).
    # None = auto: on iff converted pretrained Med3D weights resolve
    # (`medicalnet_weights` / weights/ drop-in / $UNET_BSSFP_MEDICALNET) —
    # the reference's objective is PRETRAINED-perceptual; with the
    # random-feature fallback the 1e3-weighted term dominates the loss and
    # is measured to ANTI-correlate with voxel fidelity (CONVERGENCE.json
    # full_objective record: train L1 0.91→1.03, val PSNR −2.6 dB over 12
    # on-chip epochs), so auto mode trains L1+BCE instead. True forces the
    # term on regardless (warned in random-feature mode); False disables.
    with_perceptual: Optional[bool] = None
    # Fast GAN step: feed the discriminator the generator-phase fake
    # (detached) instead of re-running the updated generator — measured 27%
    # faster per step; False = reference-exact semantics.
    reuse_fake: bool = False
    # JAX PRNG implementation: "rbg" makes the dropout masks ~17% of step
    # time cheaper than "threefry" on v5e (measured); the random stream
    # differs but the algorithm is unchanged (the reference's torch RNG
    # stream is unrelated anyway).
    rng_impl: str = "rbg"
    # Path to a converted Med3D checkpoint (.npz of the torch state dict);
    # None = auto-discover (weights/ drop-in, $UNET_BSSFP_MEDICALNET), else
    # deterministic random features (see models.medicalnet).
    medicalnet_weights: Optional[str] = None
    # Chunk the batched MedicalNet perceptual forward into groups of this
    # many single-channel slabs (lax.map) to bound peak activation memory —
    # useful for whole-volume training; None = one batched call (fastest).
    perceptual_chunk: Optional[int] = None
    # Compute dtype of the MedicalNet network inside the TRAINING perceptual
    # term. None = follow ModelConfig.compute_dtype (bf16 by default — the
    # framework's training policy); set "float32" for strict reference
    # numerics. The FID/eval path always runs float32.
    perceptual_dtype: Optional[str] = None
    # Log a second, un-augmented validation pass per epoch as
    # ``val_clean_*`` next to the reference-parity augmented ``val_*``
    # metrics (the reference augments val inputs too,
    # src/data_module.py:146-147 — this measures what that convention
    # costs without changing training or early-stop semantics).
    log_clean_val: bool = False


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    pred_dir: str = "preds"
    rescale_args_dwi: str = "rescale_args_dwi.txt"
    out_csv: str = "relative_errors.csv"
    roi_names: Tuple[str, ...] = ("CSF", "GM", "WM")


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def _mk(cls, d):
            fields = {f.name for f in dataclasses.fields(cls)}
            kw = {k: v for k, v in d.items() if k in fields}
            for k, v in kw.items():
                if isinstance(v, list):
                    kw[k] = tuple(v)
            return cls(**kw)

        return Config(
            data=_mk(DataConfig, raw.get("data", {})),
            model=_mk(ModelConfig, raw.get("model", {})),
            train=_mk(TrainConfig, raw.get("train", {})),
            eval=_mk(EvalConfig, raw.get("eval", {})),
        )
