"""Device-mesh and sharding helpers.

The reference has no distributed code at all (SURVEY.md §2: no
torch.distributed / NCCL / MPI anywhere) — scaling here is TPU-native by
construction:

* **batch dims** (which every operator and solver carries) shard over a
  "dp" mesh axis;
* the **operator dimension na** (the analog of sequence length for this
  workload) shards over a "tp"/"op" axis — matvec partial products reduce
  with ``psum`` collectives that XLA inserts from sharding annotations
  (GSPMD); solver loop carries are sharding-invariant (reductions via
  global sums, static shapes), so the whole while_loop stays SPMD.

These helpers only *annotate*; XLA lays the collectives on the ICI mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "with_batch_sharding", "P", "Mesh",
           "NamedSharding"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("dp", "tp"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh over the available devices, factoring the device count
    into the given axes (last axis gets the smaller factor)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    naxes = len(axis_names)
    # factor n_devices into naxes axes, as square as possible
    shape = [1] * naxes
    rem = n_devices
    for i in range(naxes - 1):
        f = _largest_factor_leq(rem, int(round(rem ** (1.0 / (naxes - i)))))
        shape[i] = f
        rem //= f
    shape[-1] = rem
    dev_arr = np.asarray(devices).reshape(shape)
    return Mesh(dev_arr, axis_names)


def _largest_factor_leq(n: int, k: int) -> int:
    k = max(1, min(k, n))
    for f in range(k, 0, -1):
        if n % f == 0:
            return f
    return 1


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place an array with its leading (batch) dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def with_batch_sharding(x, axis: str = "dp"):
    """Constraint form (usable inside jit): leading dim over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)
