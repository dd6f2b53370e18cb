"""Full train-state checkpointing: params + optimizer moments + progress.

The per-epoch ``.npz`` params checkpoint (loop.py) exists for CONSUMPTION
— ``--model CLIP-Linear`` loads it like the reference loads a fine-tuned
model (``/root/reference/utils/train_eval_util.py:24-25``).  It is not
enough to RESUME training: AdamW's first-/second-moment estimates and the
step count are state too (restarting them from zero re-warms the
optimizer and changes the trajectory).  This module persists the whole
``TrainState`` so a preempted fine-tune continues exactly where it died —
the training-side analogue of the evaluator's ``--resume`` score caches.

Format: one ``.npz`` holding the flattened ``(params, opt_state)`` leaves
by index, the step counter, the completed-epoch count, and the pytree
structure string — restores REFUSE a checkpoint whose structure or leaf
shapes do not match the freshly-built state (a different optimizer,
model config, or package version must fail loudly, not deserialize into
the wrong slots).  Leaves are host numpy (fp32 params / moments, int
counters), written atomically (tmp + rename) so a preemption mid-write
cannot leave a truncated file that poisons the next resume.

Single-host only: every leaf must be fully addressable (true for any
single-process mesh).  Multi-host training should checkpoint via
``models.convert.save_params_orbax`` per host stripe instead.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from mcm_tpu.train.contrastive import TrainState


def _flatten(state: TrainState):
    import jax

    return jax.tree_util.tree_flatten((state.params, state.opt_state))


def save_train_state(state: TrainState, path: str, *, epoch: int) -> None:
    """Persist the full state after ``epoch`` completed epochs."""
    import jax

    leaves, treedef = _flatten(state)
    if not all(getattr(l, "is_fully_addressable", True) for l in leaves):
        raise ValueError("save_train_state is single-host only; use "
                         "models.convert.save_params_orbax for multi-host "
                         "training")
    arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["__step"] = np.asarray(state.step)
    arrs["__epoch"] = np.asarray(int(epoch), np.int64)
    arrs["__treedef"] = np.frombuffer(str(treedef).encode(), np.uint8)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        # write through a file object: np.savez(str) appends ".npz" to
        # extension-less paths, which would break the atomic rename
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_train_state(path: str,
                     template: TrainState) -> Tuple[TrainState, int]:
    """Restore ``(state, completed_epochs)`` onto ``template``'s devices.

    ``template`` is a freshly-built ``init_state(params)`` — it supplies
    the pytree structure, leaf shapes/dtypes, and shardings the restored
    arrays are validated against and placed with."""
    import jax

    leaves, treedef = _flatten(template)
    with np.load(path) as data:
        saved_def = bytes(data["__treedef"]).decode()
        if saved_def != str(treedef):
            raise ValueError(
                f"{path} was saved for a different train-state structure "
                f"(optimizer/model/config mismatch) — refusing to restore")
        new_leaves = []
        for i, t in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if arr.shape != tuple(t.shape):
                raise ValueError(f"{path}: leaf {i} shape {arr.shape} != "
                                 f"expected {tuple(t.shape)}")
            if arr.dtype != np.dtype(t.dtype):
                # same fail-loudly contract as structure/shape: silently
                # casting (e.g. fp32 moments into a bf16 template) would
                # resume a different trajectory with no error
                raise ValueError(f"{path}: leaf {i} dtype {arr.dtype} != "
                                 f"expected {np.dtype(t.dtype)}")
            sharding = getattr(t, "sharding", None)
            new_leaves.append(jax.device_put(arr, sharding)
                              if sharding is not None else arr)
        # step stays HOST numpy: the jitted train step places it on first
        # call, and resume's log line can read it without a d2h — on
        # tunneled dev TPUs a process's first device readback loads a
        # remote executable costing minutes (CLAUDE.md)
        step = np.asarray(data["__step"])
        epoch = int(data["__epoch"])
    params, opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return TrainState(params, opt_state, step), epoch
