"""Multi-host feeding + gathering, integrated into the runner.

Single-host v5e-8 needs none of this (BASELINE.md north star); on
multi-host pods each process holds only its local devices, so the runner
must (a) feed per-host slices that assemble into globally-ordered batches,
(b) read back only addressable shards, and (c) reassemble dataset-order
score arrays at the end.  The scheme:

* every process executes the SAME number of jitted steps (SPMD lockstep):
  global batch ``i`` covers dataset rows ``[i·B, (i+1)·B)`` and process
  ``h`` decodes its contiguous *stripe* ``[i·B + h·b, i·B + (h+1)·b)``
  (``b = B / process_count``, :func:`batch_stripe`);
* :func:`make_global_batch` lifts the local stripe into a data-axis-sharded
  global array (mesh device order is process-major, so stripes land on the
  holder's own devices and the global array is in dataset order);
* :func:`read_local` pulls back a process's addressable rows of a sharded
  output;
* :func:`assemble_global_outputs` allgathers the per-host stripe stacks and
  interleaves them back into dataset order (pure-numpy
  :func:`interleave_process_stripes`, unit-tested single-host), then drops
  tail padding exactly like ``collect_scores``.

Every function degenerates to the single-process fast path, so the runner
is host-count-agnostic by construction.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcm_tpu.parallel.mesh import DATA_AXIS


def host_shard_range(n_samples: int) -> Tuple[int, int]:
    """This process's contiguous [lo, hi) slice of a dataset (equal-ish
    split by process index; last host takes the remainder).  Used for
    dataset-level work splits (e.g. feature extraction sweeps); the batch
    hot loop uses :func:`batch_stripe` instead so steps stay lockstep."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = n_samples // n_proc
    lo = idx * per
    hi = n_samples if idx == n_proc - 1 else lo + per
    return lo, hi


def batch_stripe(global_batch_size: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> Tuple[int, int]:
    """This process's [lo, hi) stripe within every global batch."""
    n = process_count if process_count is not None else jax.process_count()
    idx = process_index if process_index is not None else jax.process_index()
    if global_batch_size % n:
        raise ValueError(f"batch size {global_batch_size} not divisible by "
                         f"process count {n}")
    b = global_batch_size // n
    return idx * b, (idx + 1) * b


def make_global_batch(mesh: Mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a data-axis-sharded global array from per-host stripes.

    On one process this is just a device_put with the batch sharding."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def put_global(x, sharding) -> jax.Array:
    """device_put that works for replicated/sharded values on any host
    count.  Multi-host: every process passes its full host-local copy and
    each device takes its slice (replicated params / TP shards / text
    features are identical on all hosts)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def read_local(x) -> np.ndarray:
    """Host copy of this process's rows of a (possibly global) array.

    On TP meshes each data row is replicated across the model axis, so a
    host's addressable shards contain every row-block once PER model-axis
    replica — dedupe by index so the stripe comes back exactly once."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    unique = {}
    for s in x.addressable_shards:
        key = tuple((sl.start or 0, sl.stop) for sl in s.index)
        unique.setdefault(key, s)
    shards = sorted(unique.values(), key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def interleave_process_stripes(stacked: np.ndarray) -> np.ndarray:
    """[n_proc, n_batches, b, ...] → [n_batches, n_proc·b, ...]: undo the
    per-batch striping so rows are in dataset order again."""
    n_proc, n_batches, b = stacked.shape[:3]
    out = stacked.transpose(1, 0, 2, *range(3, stacked.ndim))
    return out.reshape(n_batches, n_proc * b, *stacked.shape[3:])


#: per-allgather chunk budget for multi-host assembly (bytes of GLOBAL
#: rows per chunk).  Bounds peak host memory at ~(final array + one chunk)
#: instead of ~3× the final array — the difference between fine and OOM
#: when assembling ImageNet-train feature matrices on real pods
#: (VERDICT r2 weakness 2).
ASSEMBLE_CHUNK_BYTES = 64 << 20


def assemble_global_outputs(outs: Sequence[np.ndarray],
                            valids: Sequence[int], total: int,
                            chunk_bytes: int = ASSEMBLE_CHUNK_BYTES
                            ) -> np.ndarray:
    """Per-batch host-local outputs → global dataset-order array.

    ``outs[i]`` is this process's rows of batch ``i`` (the full batch on a
    single host).  Mirrors ``collect_scores`` semantics: per-batch ``valids``
    rows kept, concatenated, truncated to ``total``.

    Multi-host: the per-batch stripe stacks are allgathered in bounded
    chunks and written straight into the preallocated result, so host
    memory scales with (result + chunk), not with multiple transient
    copies of the whole pass."""
    if not outs:
        return np.zeros((0,), dtype=np.float32)
    if jax.process_count() == 1:
        # exactly collect_scores semantics — share the implementation so
        # the truncation/padding rules can't silently diverge
        from mcm_tpu.data.pipeline import collect_scores
        return collect_scores(outs, valids, total)
    local = np.stack([np.asarray(o) for o in outs])  # [n_batches, b, ...]

    from jax.experimental import multihost_utils

    n_batches, b = local.shape[:2]
    feat_shape = local.shape[2:]
    row_bytes = local.dtype.itemsize * int(np.prod(feat_shape,
                                                   dtype=np.int64))
    global_batch_bytes = max(1, row_bytes * b * jax.process_count())
    chunk = max(1, int(chunk_bytes) // global_batch_bytes)

    offsets = np.concatenate(([0], np.cumsum(valids)))
    n_rows = int(min(total, offsets[-1]))
    out = np.empty((n_rows,) + feat_shape, dtype=local.dtype)
    for lo in range(0, n_batches, chunk):
        hi = min(lo + chunk, n_batches)
        if offsets[lo] >= n_rows:
            # every host must still join the remaining collectives —
            # processes falling out of lockstep deadlocks the pod
            multihost_utils.process_allgather(local[lo:hi])
            continue
        stacked = np.asarray(
            multihost_utils.process_allgather(local[lo:hi]))
        full = interleave_process_stripes(stacked)   # [hi-lo, B, ...]
        for i in range(lo, hi):
            start = int(offsets[i])
            if start >= n_rows:
                break
            v = min(int(valids[i]), n_rows - start)
            out[start:start + v] = full[i - lo, :v]
    return out
