"""MSP (maximum softmax probability) score over classifier logits.

The pure-visual baseline the reference compares MCM against (README hard-OOD
claim; logits path as in ``detection_util.py:129-133``): score =
-max softmax(logits / T), same lower-is-ID sign convention as the CLIP
scores.  Energy/entropy/variance variants share the logits, mirroring
:mod:`mcm_tpu.scores.clip_scores`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mcm_tpu.scores.clip_scores import _scores_from_logits


@functools.partial(jax.jit, static_argnames=("score", "T"))
def msp_scores(logits: jax.Array, score: str = "MCM",
               T: float = 1.0) -> jax.Array:
    """[B, C] classifier logits → [B] OOD scores (lower = more ID).

    ``score`` names follow the CLIP-score vocabulary: ``MCM`` here means
    max-softmax (MSP), ``max-logit``/``energy``/``entropy``/``var`` as usual.
    """
    return _scores_from_logits(logits.astype(jnp.float32), T)[score]
