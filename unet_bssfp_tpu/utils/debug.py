"""Numerics debugging (SURVEY.md §5.2 TPU equivalent).

The reference's nearest analogues are Lightning ``detect_anomaly``
(``src/train.py:40``) and autograd anomaly mode. Here: global NaN checking
via ``jax_debug_nans`` and ``checkify`` wrapping for explicit per-kernel
assertions.
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def enable_nan_checks():
    """Raise on the first NaN produced by any jitted computation inside the
    context (the ``detect_anomaly`` equivalent)."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def checkify_fn(fn, errors=checkify.float_checks):
    """Wrap a jittable fn with checkify error accumulation: returns
    ``(err, out)``; call ``err.throw()`` on host to surface failures."""
    return checkify.checkify(fn, errors=errors)
