"""Linear probing on frozen CLIP features.

Backs the reference's ``CLIP-Linear`` / ``vit-Linear`` model variants
(``/root/reference/utils/detection_util.py:124-133``,
``train_eval_util.py:24-25``): a linear classifier over frozen encoder
features, trained with softmax cross-entropy.  Features are extracted once
(they are frozen), so probe training is pure [N, D]x[D, C] matmul work —
ideal MXU utilization, minibatched on device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class LinearProbe(NamedTuple):
    w: jax.Array  # [D, C]
    b: jax.Array  # [C]


def init_linear_probe(seed: int, feat_dim: int,
                      n_classes: int) -> LinearProbe:
    # numpy init, NOT jax.random: on the tunneled axon TPU every
    # never-seen executable (jax.random.key/normal included) pays a
    # minutes-scale remote load for microseconds of real work (CLAUDE.md;
    # the CLIP init is numpy for the same reason)
    import numpy as np
    rng = np.random.Generator(np.random.SFC64(int(seed)))
    w = rng.standard_normal((feat_dim, n_classes),
                            dtype=np.float32) * feat_dim ** -0.5
    return LinearProbe(jnp.asarray(w), jnp.zeros((n_classes,), jnp.float32))


def probe_logits(probe: LinearProbe, features: jax.Array,
                 T: float = 1.0) -> jax.Array:
    logits = jnp.dot(features.astype(jnp.float32), probe.w,
                     preferred_element_type=jnp.float32) + probe.b
    return logits / T


def make_linear_probe_step(optimizer: Optional[
        optax.GradientTransformation] = None) -> Tuple[Callable, Callable]:
    """(init_fn, step_fn): step(probe, opt_state, feats, labels) →
    (probe, opt_state, loss, accuracy)."""
    optimizer = optimizer or optax.adamw(1e-3)

    def loss_fn(probe, feats, labels):
        logits = probe_logits(probe, feats)
        loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, acc

    @jax.jit
    def step_fn(probe, opt_state, feats, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            probe, feats, labels)
        updates, opt_state = optimizer.update(grads, opt_state, probe)
        return optax.apply_updates(probe, updates), opt_state, loss, acc

    def init_fn(seed, feat_dim, n_classes):
        probe = init_linear_probe(seed, feat_dim, n_classes)
        return probe, optimizer.init(probe)

    return init_fn, step_fn


def train_linear_probe(features, labels, n_classes: int, *, epochs: int = 10,
                       batch_size: int = 1024, seed: int = 0,
                       optimizer=None):
    """Minibatch-train a probe over pre-extracted frozen features.

    Returns ``(probe, mean_loss, mean_acc)`` — final-epoch averages
    weighted by batch size, not the last minibatch's numbers.  Batches
    are full-size: the ragged remainder is folded into the last batch as
    an overlap with the previous one (keeps ONE compiled step shape and
    never reports a single-example metric; with per-epoch reshuffling the
    slight duplication is noise)."""
    import numpy as np
    init_fn, step_fn = make_linear_probe_step(optimizer)
    probe, opt_state = init_fn(seed, features.shape[1], n_classes)
    n = features.shape[0]
    batch_size = min(batch_size, n)
    rng = np.random.default_rng(seed)
    mean_loss = mean_acc = float("nan")
    for _ in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        for lo in range(0, n, batch_size):
            if lo + batch_size > n:  # overlap, keep the static shape
                lo = n - batch_size
            idx = order[lo:lo + batch_size]
            probe, opt_state, loss, acc = step_fn(
                probe, opt_state, jnp.asarray(features[idx]),
                jnp.asarray(labels[idx]))
            losses.append(loss)
            accs.append(acc)
        mean_loss = float(np.mean([np.asarray(l) for l in losses]))
        mean_acc = float(np.mean([np.asarray(a) for a in accs]))
    return probe, mean_loss, mean_acc
