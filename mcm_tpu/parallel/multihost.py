"""Multi-host feeding helpers.

Single-host v5e-8 needs none of this (BASELINE.md north star); on multi-host
pods each process holds only its local devices, so globally-sharded batch
arrays must be assembled from per-host shards.  These helpers wrap the
canonical JAX recipe (``jax.make_array_from_process_local_data``) so the
runner's scoring loop is host-count-agnostic:

* each host's pipeline iterates ITS contiguous slice of the dataset
  (``host_shard_range``), keeping global score order = dataset order;
* ``make_global_batch`` lifts the local uint8 batch into a global array
  sharded over the data axis.

Untestable on this single-host environment — exercised only when
``jax.process_count() > 1``; the logic degrades to identity on one host.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcm_tpu.parallel.mesh import DATA_AXIS


def host_shard_range(n_samples: int) -> Tuple[int, int]:
    """This process's contiguous [lo, hi) slice of the dataset (equal-ish
    split by process index; last host takes the remainder)."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = n_samples // n_proc
    lo = idx * per
    hi = n_samples if idx == n_proc - 1 else lo + per
    return lo, hi


def make_global_batch(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a data-axis-sharded global array from per-host batches.

    On one process this is just a device_put with the batch sharding."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
