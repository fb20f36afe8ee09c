"""Serialized model export for serving — ``jax.export`` / StableHLO.

The deployment-shaped capability the reference lacks entirely (its serving
story is "load the Lightning checkpoint in Python", reference
``src/eval.py:21-41``): freeze a trained generator into a single
self-contained artifact — weights baked in as constants, lowered to
StableHLO for both CPU and TPU — that any JAX process can load and call
WITHOUT the model code, the checkpoint format, or the config system.

Artifact layout (one file):
    8-byte magic ``UBSSFPX1`` | u32 little-endian header length | JSON
    header (shape/dtype/modality/provenance) | ``jax.export`` payload.

The exported function is the eval-mode generator forward
(``train/steps.py::make_predict_fn``) at a fixed input shape. The model is
rebuilt with the portable XLA conv path (``packed=False``) so the artifact
carries no TPU-only Pallas custom calls and runs bit-identically on every
platform it was lowered for (the conv paths share one param tree and are
equality-tested in ``tests/test_packed_conv.py``).
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

MAGIC = b"UBSSFPX1"


def export_generator(
    modality: str,
    mcfg,
    state,
    input_shape: Sequence[int],
    *,
    in_dtype: str = "float32",
    platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
    extra_meta: Optional[dict] = None,
) -> Tuple[jexport.Exported, dict]:
    """Freeze the eval-mode generator at ``input_shape`` = (B, D, H, W, C).

    Weights from ``state`` are closure-captured, so they serialize into the
    artifact as constants — the consumer needs no checkpoint. Returns the
    ``jax.export.Exported`` and the metadata header dict.
    """
    import dataclasses

    from unet_bssfp_tpu.train.state import build_models

    # Portable conv path: no Pallas custom calls in the artifact.
    mcfg = dataclasses.replace(mcfg, packed=False)
    gen, _ = build_models(modality, mcfg)

    variables = jax.device_get(
        {"params": state.gen_params, "batch_stats": state.gen_batch_stats}
    )

    # Eval-mode forward (``train/steps.py::make_predict_fn`` semantics) with
    # the weights closure-captured → serialized as module constants.
    def serve(x):
        return gen.apply(variables, x, train=False).astype(jnp.float32)
    spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.dtype(in_dtype))
    # platforms=None: lower for the current default backend only (needed on
    # backends whose lowering platform isn't in the portable cpu/tpu pair,
    # e.g. the tunneled axon plugin).
    exported = jexport.export(
        jax.jit(serve),
        **({} if platforms is None else {"platforms": list(platforms)}),
    )(spec)
    if platforms is None:
        platforms = list(exported.platforms)
    meta = {
        "format": "unet_bssfp_tpu.export",
        "version": 1,
        "modality": modality,
        "input_shape": list(input_shape),
        "in_dtype": in_dtype,
        "out_channels": int(mcfg.out_channels),
        "compute_dtype": str(mcfg.compute_dtype),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    return exported, meta


def save_exported(exported: jexport.Exported, meta: dict, path: str) -> None:
    header = json.dumps(meta).encode("utf-8")
    payload = exported.serialize()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(bytes(payload))


def load_exported(path: str):
    """Load an artifact → ``(call, meta)``.

    ``call`` is a jitted function of one array with the exported input
    shape/dtype; it recompiles nothing beyond the embedded StableHLO and
    needs none of this package's model code.
    """
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(
                f"{path}: not a unet_bssfp_tpu export (magic {magic!r})"
            )
        raw_len = f.read(4)
        if len(raw_len) != 4:
            raise ValueError(f"{path}: truncated export (missing header length)")
        (hlen,) = struct.unpack("<I", raw_len)
        raw_header = f.read(hlen)
        if len(raw_header) != hlen:
            raise ValueError(
                f"{path}: truncated export (header {len(raw_header)}/{hlen} "
                "bytes)"
            )
        meta = json.loads(raw_header.decode("utf-8"))
        payload = f.read()
    exported = jexport.deserialize(bytearray(payload))
    call = jax.jit(exported.call)
    return call, meta
