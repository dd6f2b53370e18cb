"""Epoch-level CLIP fine-tuning loop: data pipeline, shuffling, checkpoints.

Round 1 shipped only the sharded train *step* (``contrastive.py``); this is
the loop that makes it a usable trainer: per-epoch seeded shuffling over the
(path, label) dataset, static-shape batches through the same native decode
pipeline the evaluator uses (``drop_remainder`` keeps one compiled step),
caption prompts built from class names ("a photo of a {c}" — the text pair
the zero-shot evaluator will score with), and per-epoch ``.npz`` checkpoints
loadable by ``--model CLIP-Linear`` (reference consumption path:
``/root/reference/utils/train_eval_util.py:24-25``).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import numpy as np

from mcm_tpu.config import CLIPConfig, Precision
from mcm_tpu.data.pipeline import DataPipeline
from mcm_tpu.train.contrastive import TrainState, make_train_step


class ShuffledView:
    """Zero-copy permuted view of a (path, label) dataset."""

    def __init__(self, dataset, perm: np.ndarray):
        self.dataset = dataset
        self.perm = perm

    def __len__(self) -> int:
        return len(self.perm)

    def __getitem__(self, i: int):
        return self.dataset[int(self.perm[i])]


def train_clip(cfg: CLIPConfig, dataset, class_names: Sequence[str],
               tokenizer, *, epochs: int = 1, batch_size: int = 64,
               seed: int = 5, optimizer=None,
               precision: Precision = Precision.fast(), mesh=None,
               params=None, num_workers: Optional[int] = None,
               image_size: Optional[int] = None,
               ckpt_path: Optional[str] = None, resume: bool = False,
               label_permutation: Optional[np.ndarray] = None,
               log: Callable[[str], None] = print) -> TrainState:
    """Fine-tune CLIP contrastively on an ImageFolder-style dataset.

    ``label_permutation`` maps a dataset label index to its row in
    ``class_names`` (``data.labels.prompt_permutation``): ImageNet100's
    class list is NOT in the ImageFolder sorted-wnid label order, and
    training on unmapped labels would pair nearly every image with the
    wrong class caption.  ``None`` = identity (class_names already in
    label order).

    Each image is paired with the prompt of its class name; batches are
    reshuffled every epoch (seeded, reproducible).  Returns the final
    TrainState; if ``ckpt_path`` is set, the params pytree is saved there
    after every epoch (npz, consumable by ``--model CLIP-Linear``) plus a
    full-state sibling (``<ckpt>.train_state.npz``: optimizer moments +
    step + epoch).  ``resume=True`` restores that sibling when present
    and continues from the next epoch — the per-epoch shuffle stream is
    replayed for completed epochs, so a resumed run walks the exact
    batch order of an uninterrupted one.
    """
    import jax

    from mcm_tpu.parallel import mesh as meshlib
    from mcm_tpu.parallel.multihost import make_global_batch

    if mesh is None:
        mesh = meshlib.make_mesh(None)
    init_state, train_step = make_train_step(cfg, optimizer=optimizer,
                                             precision=precision, mesh=mesh)
    if params is None:
        from mcm_tpu.models.init import init_clip
        params = init_clip(seed, cfg)
    state = init_state(params)

    prompts = [f"a photo of a {c}" for c in class_names]
    ids_all, mask_all = tokenizer(prompts, pad_to_multiple=8,
                                  context_length=cfg.text.context_length)
    ids_all = np.asarray(ids_all, np.int32)
    mask_all = np.asarray(mask_all, np.int32)
    if label_permutation is not None:
        # reorder prompt rows into dataset-label order once, up front
        ids_all = ids_all[label_permutation]
        mask_all = mask_all[label_permutation]

    rng = np.random.default_rng(seed)
    n = len(dataset)
    if n < batch_size:
        raise ValueError(f"dataset ({n}) smaller than batch ({batch_size})")
    size = image_size or cfg.vision.image_size

    state_path = f"{ckpt_path}.train_state.npz" if ckpt_path else None
    start_epoch = 0
    if resume and state_path and os.path.exists(state_path):
        from mcm_tpu.train.checkpoint import load_train_state
        state, start_epoch = load_train_state(state_path, state)
        log(f"resumed from {state_path}: {start_epoch} epoch(s) done, "
            f"step {int(np.asarray(state.step))}")

    for epoch in range(epochs):
        # the permutation is ALWAYS drawn so a resumed run's shuffle
        # stream is identical to an uninterrupted run's
        perm = rng.permutation(n)
        if epoch < start_epoch:
            continue
        pipe = DataPipeline(ShuffledView(dataset, perm),
                            batch_size, image_size=size,
                            num_workers=num_workers, drop_remainder=True)
        losses = []
        t0 = time.perf_counter()
        for batch in pipe:
            # multi-host: the pipeline yields this process's stripe of the
            # global batch; lift to data-sharded global arrays (identity
            # device_put on one host). drop_remainder ⇒ stripes are full.
            images = make_global_batch(mesh, batch.images)
            ids = make_global_batch(mesh, ids_all[batch.labels])
            mask = make_global_batch(mesh, mask_all[batch.labels])
            state, loss = train_step(state, images, ids, mask)
            losses.append(loss)
        mean_loss = float(np.mean([np.asarray(l) for l in losses]))
        log(f"epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f}  "
            f"({len(losses)} steps, {time.perf_counter() - t0:.1f}s)")
        if not np.isfinite(mean_loss):
            raise FloatingPointError(f"non-finite loss at epoch {epoch + 1}")
        if ckpt_path:
            _save_checkpoint(state.params, ckpt_path, log)
            leaves = jax.tree_util.tree_leaves(state.params)
            if all(getattr(l, "is_fully_addressable", True)
                   for l in leaves):
                from mcm_tpu.train.checkpoint import save_train_state
                save_train_state(state, state_path, epoch=epoch + 1)
            else:
                # a silent skip would make a later --resume quietly
                # restart from epoch 0 with re-warmed optimizer state
                log(f"WARNING: train-state sibling not written (params "
                    f"span processes; save_train_state is single-host) — "
                    f"--resume cannot continue this run from {state_path}")
    return state


def _save_checkpoint(params, ckpt_path: str, log) -> None:
    """npz on a single host; orbax (sharding-aware, collective) when the
    params span processes and a host copy isn't addressable."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    if all(getattr(l, "is_fully_addressable", True) for l in leaves):
        from mcm_tpu.models.convert import save_params
        save_params(jax.tree_util.tree_map(np.asarray, params), ckpt_path)
        log(f"checkpoint -> {ckpt_path}")
    else:
        from mcm_tpu.models.convert import save_params_orbax
        path = ckpt_path[:-4] if ckpt_path.endswith(".npz") else ckpt_path
        save_params_orbax(params, path)
        log(f"checkpoint (orbax, multi-host) -> {path}")
