"""OOD score functions over CLIP image↔text similarity logits.

Replicates the score semantics of the reference hot loop
(``/root/reference/utils/detection_util.py:226-248``) as one jitted
function over a whole batch of image features:

* logits = L2norm(image) @ L2norm(text).T          (``:226,231-232``)
* ``MCM``       = -max softmax(logits / T)          (``:236,248``)
* ``max-logit`` = -max logits (raw, no softmax)     (``:233-234,248``)
* ``energy``    = -T * logsumexp(logits / T)        (``:237-239``)
* ``entropy``   = natural-log entropy of softmax    (``:240-243``)
* ``var``       = -variance of softmax              (``:245-246``)

Sign convention preserved exactly: scores are stored so that *lower = more
in-distribution*; the metrics layer negates again (``:259``).

Text features are computed ONCE per ID dataset and cached by the caller —
the reference re-tokenizes and re-encodes the full prompt set every batch
(``:228-231``), pure waste with identical output (SURVEY.md §3.1).

All reductions share one [B, C] logits matrix, so XLA fuses the whole
thing into the trailing matmul; a hand-written Pallas fusion lives in
:mod:`mcm_tpu.ops.mcm_score` for the large-C case.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

#: Public score names — the ``--score`` CLI choices minus ``maha``
#: (reference ``eval_ood_detection.py:36-37``).
CLIP_SCORES = ("MCM", "energy", "max-logit", "entropy", "var")


def l2_normalize(x: jax.Array, eps: float = 0.0) -> jax.Array:
    """x / ||x||₂ along the last axis, norm in fp32 (reference ``:226,231``)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True)) + eps
    return (x32 / norm).astype(x.dtype)


def similarity_logits(image_feats: jax.Array, text_feats: jax.Array,
                      normalize_image: bool = True,
                      normalize_text: bool = False) -> jax.Array:
    """Cosine-similarity logits [B, C] in fp32.

    ``text_feats`` are expected pre-normalized (cached per dataset);
    set ``normalize_text=True`` when passing raw encoder output.
    """
    if normalize_image:
        image_feats = l2_normalize(image_feats)
    if normalize_text:
        text_feats = l2_normalize(text_feats)
    return jnp.dot(image_feats.astype(jnp.float32),
                   text_feats.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32,
                   precision="highest")


def _scores_from_logits(logits: jax.Array, T: float) -> Dict[str, jax.Array]:
    """All five scores from one [B, C] logits matrix (fp32)."""
    scaled = logits / T
    # stable softmax
    m = jnp.max(scaled, axis=-1, keepdims=True)
    e = jnp.exp(scaled - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    smax = e / z
    logsumexp = jnp.squeeze(m + jnp.log(z), axis=-1)

    max_smax = jnp.max(smax, axis=-1)
    return {
        "MCM": -max_smax,
        # reference quirk kept: 'max-logit' takes max of RAW logits (:233-234)
        "max-logit": -jnp.max(logits, axis=-1),
        "energy": -(T * logsumexp),
        # scipy.stats.entropy with natural log over the softmax row (:243).
        # NaN rows must PROPAGATE like every other score: the where()
        # alone would turn a NaN softmax (zero-norm/garbage feature) into
        # -0.0 — the strongest-possible ID verdict — because NaN > 0 is
        # False; scipy returns NaN for the same row.
        "entropy": jnp.where(
            jnp.isnan(jnp.sum(smax, axis=-1)), jnp.nan,
            -jnp.sum(jnp.where(smax > 0, smax * jnp.log(smax), 0.0),
                     axis=-1)),
        "var": -jnp.var(smax, axis=-1),
    }


def _scores_from_logits_host(logits, T: float):
    """numpy twin of :func:`_scores_from_logits` — same formulas, same
    stable-softmax structure, fp32 throughout."""
    import numpy as np

    scaled = logits / np.float32(T)
    m = np.max(scaled, axis=-1, keepdims=True)
    e = np.exp(scaled - m)
    z = np.sum(e, axis=-1, keepdims=True)
    smax = e / z
    logsumexp = np.squeeze(m + np.log(z), axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        plogp = np.where(smax > 0, smax * np.log(smax), 0.0)
    # NaN propagation for garbage rows — see _scores_from_logits
    entropy = np.where(np.isnan(np.sum(smax, axis=-1)), np.nan,
                       -np.sum(plogp, axis=-1))
    return {
        "MCM": -np.max(smax, axis=-1),
        "max-logit": -np.max(logits, axis=-1),
        "energy": -(np.float32(T) * logsumexp),
        "entropy": entropy,
        "var": -np.var(smax, axis=-1),
    }


def compute_scores_host(image_feats, text_feats, score: str = "MCM",
                        T: float = 1.0):
    """Host (numpy) scoring from cached features — used on paths where the
    inputs already live on the host (``--resume``/``--eval_accuracy``
    feature caches): a fresh device executable for 3 GFLOPs of fp32 math
    costs minutes of remote compile on tunneled dev TPUs (measured 4.7 min
    for this exact segment), vs <1 s on the host."""
    import numpy as np

    img = np.asarray(image_feats, dtype=np.float32)
    img = img / np.linalg.norm(img, axis=-1, keepdims=True)
    logits = img @ np.asarray(text_feats, dtype=np.float32).T
    return _scores_from_logits_host(logits, T)[score].astype(np.float32)


@functools.partial(jax.jit, static_argnames=("score", "T"))
def compute_scores(image_feats: jax.Array, text_feats: jax.Array,
                   score: str = "MCM", T: float = 1.0) -> jax.Array:
    """OOD score per image: [B, D] x [C, D] → [B] fp32.

    ``image_feats`` raw encoder output; ``text_feats`` pre-L2-normalized.
    """
    logits = similarity_logits(image_feats, text_feats)
    return _scores_from_logits(logits, T)[score]


@functools.partial(jax.jit, static_argnames=("T",))
def compute_all_scores(image_feats: jax.Array,
                       text_feats: jax.Array,
                       T: float = 1.0) -> Dict[str, jax.Array]:
    """All scores at once (one encoder pass amortized over score variants)."""
    logits = similarity_logits(image_feats, text_feats)
    return _scores_from_logits(logits, T)


@jax.jit
def zero_shot_predictions(image_feats: jax.Array,
                          text_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(argmax class, max cosine sim) — zero-shot classification on the side."""
    logits = similarity_logits(image_feats, text_feats)
    return jnp.argmax(logits, axis=-1), jnp.max(logits, axis=-1)
