"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP strategy
(``strategy='ddp_find_unused_parameters_true'``, ``src/train.py:30``;
4-GPU data parallelism per thesis 03-methods.tex): a ``jax.sharding.Mesh``
over ICI with the batch sharded on a ``data`` axis and parameters replicated.
Under ``jit``, XLA inserts the gradient all-reduce (psum over ICI)
automatically from the sharding annotations — the scaling-book recipe: pick a
mesh, annotate shardings, let XLA place collectives.

``find_unused_parameters`` has no analogue here by design: only the active
modality head exists in the parameter pytree (see ``models.generator``).

A ``space`` axis is reserved for spatial (halo-exchange) sharding of
whole-volume convs — the context-parallel analogue for this model family
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-axis default: pure data parallel. Pass ``axes=('data', 'space')`` and a
    ``shape`` to reserve a spatial-sharding axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; when the mesh has a ``space``
    axis, additionally shard the first spatial dim (XLA adds conv halo
    exchanges)."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(axis, "space"))
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch (pytree of arrays) onto the mesh with dim-0
    sharding.

    Single-process (one host): a plain ``device_put`` of the global batch.

    Multi-process (TPU pod, ``jax.process_count() > 1``): each process passes
    its process-LOCAL slice of the batch (its own loader's samples — see
    ``DoveDataModule`` with ``process_split=True`` and
    ``scripts/run_train.sh``); the slices are assembled into one global array
    via ``jax.make_array_from_process_local_data`` without gathering the full
    batch on any host. The local batch size must be
    ``global_batch / process_count``.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        import numpy as np_

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np_.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
