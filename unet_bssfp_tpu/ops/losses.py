"""Loss primitives: L1, adversarial BCE-with-logits, SSIM loss.

The perceptual loss lives in ``models.medicalnet`` (it needs the feature
extractor); the composite PerceptualL1 objective with the reference's factor
plumbing lives in ``train.losses``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unet_bssfp_tpu.ops.metrics import ssim3d


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error (``torch.nn.L1Loss``, reference
    ``src/model.py:126``)."""
    return jnp.mean(jnp.abs(pred - target))


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable sigmoid cross-entropy, mean-reduced
    (``torch.nn.BCEWithLogitsLoss``, reference ``src/model.py:155``):
    ``max(z,0) - z*y + log(1 + exp(-|z|))``.
    """
    z = logits
    y = labels
    loss = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.mean(loss)


def ssim_loss(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """``1 - SSIM`` — the older multi-stage regime's structural term (thesis
    03-methods.tex training section; the published metrics CSVs carry a
    ``test_loss_SSIM`` column)."""
    return 1.0 - jnp.mean(ssim3d(pred, target, data_range=data_range))
