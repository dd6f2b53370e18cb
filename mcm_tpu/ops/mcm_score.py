"""Fused MCM-score Pallas kernel.

One VMEM pass per query tile: L2-normalize image features, matmul against
the cached normalized text matrix, temperature softmax, and the score
reduction — logits never round-trip to HBM (reference math:
``detection_util.py:226-248``).  Matters most at ImageNet scale
(C=1000) where the XLA path materializes a [B, C] fp32 logits tensor
between fusions.

Scores follow the same lower-is-ID sign convention as
:mod:`mcm_tpu.scores.clip_scores`; equivalence is tested against that
module on every score variant.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mcm_tpu.scores.clip_scores import CLIP_SCORES, compute_scores


def _score_kernel(img_ref, txt_ref, o_ref, *, score: str, T: float,
                  n_classes: int):
    img = img_ref[:].astype(jnp.float32)                      # [blk, D]
    # exact 1/sqrt + HIGHEST-precision dot, matching the XLA twin
    # (clip_scores.similarity_logits passes precision="highest" per the
    # CLAUDE.md rule): this 3-GFLOP epilogue is invisible in the profile,
    # and logits feed parity-relevant scores — approximate rsqrt/bf16
    # passes would make single-device TPU scores a systematically
    # different population than the sharded/CPU "identical-math" path
    norm = 1.0 / jnp.sqrt(jnp.sum(img * img, axis=-1, keepdims=True))
    imgn = img * norm
    txt = txt_ref[:].astype(jnp.float32)                      # [C, D]
    logits = jax.lax.dot_general(imgn, txt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    # mask the padded class columns (C padded to a lane multiple)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < n_classes
    neg_inf = jnp.float32(-1e30)
    logits = jnp.where(valid, logits, neg_inf)

    scaled = logits / T
    m = jnp.max(scaled, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(scaled - m), 0.0)
    z = jnp.sum(e, axis=-1, keepdims=True)
    smax = e / z

    if score == "MCM":
        out = -jnp.max(smax, axis=-1)
    elif score == "max-logit":
        out = -jnp.max(logits, axis=-1)
    elif score == "energy":
        out = -(T * (jnp.log(z[:, 0]) + m[:, 0]))
    elif score == "entropy":
        # NaN rows propagate (see clip_scores._scores_from_logits): the
        # where() alone would emit -0.0 — a maximal-ID verdict — for a
        # garbage feature row, because NaN > 0 is False
        out = jnp.where(
            jnp.isnan(jnp.sum(smax, axis=-1)), jnp.nan,
            -jnp.sum(jnp.where(smax > 0, smax * jnp.log(smax), 0.0),
                     axis=-1))
    elif score == "var":
        mean = jnp.sum(smax, axis=-1, keepdims=True) / n_classes
        sq = jnp.where(valid, jnp.square(smax - mean), 0.0)
        out = -(jnp.sum(sq, axis=-1) / n_classes)
    else:
        raise ValueError(f"unknown score {score}")
    o_ref[:] = out[:, None]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("score", "T", "block_b"))
def _pallas_mcm(image_feats: jax.Array, text_feats: jax.Array,
                score: str, T: float, block_b: int = 256) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = image_feats.shape
    c = text_feats.shape[0]
    c_pad = _round_up(c, 128)
    txt = jnp.zeros((c_pad, d), jnp.float32).at[:c].set(
        text_feats.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_score_kernel, score=score, T=float(T),
                          n_classes=c),
        grid=(pl.cdiv(b, block_b),),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
    )(image_feats, txt)
    return out[:, 0]


# Conservative per-program VMEM budget for the auto gate (the v5e scoped
# limit is ~16 MiB; headroom left for Mosaic's own scratch).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_DEFAULT_BLOCK_B = 256


def _pallas_fits(b: int, d: int, c: int, block_b: int) -> bool:
    """The kernel keeps the whole padded [C_pad, D] text matrix, one
    [block_b, D] image block, and the [block_b, C_pad] logits resident in
    VMEM; past ~a few thousand classes that exceeds the scoped budget and
    the Mosaic compile dies, where the XLA path would have worked."""
    c_pad = _round_up(c, 128)
    blk = min(block_b, b)
    fp32 = 4
    footprint = (c_pad * d + blk * d + blk * c_pad + blk) * fp32
    return footprint <= _VMEM_BUDGET_BYTES


def fused_mcm_scores(image_feats: jax.Array, text_feats: jax.Array,
                     score: str = "MCM", T: float = 1.0,
                     impl: Optional[str] = None) -> jax.Array:
    """[B, D] raw image features × [C, D] normalized text → [B] scores.

    ``impl``: "pallas" | "xla" | None (auto — the kernel on TPU when its
    VMEM-resident footprint fits, the identical-math XLA path otherwise)."""
    assert score in CLIP_SCORES, score
    if impl is None:
        from mcm_tpu.ops import on_tpu
        impl = ("pallas" if on_tpu() and _pallas_fits(
            image_feats.shape[0], image_feats.shape[1], text_feats.shape[0],
            _DEFAULT_BLOCK_B) else "xla")
    if impl == "pallas":
        return _pallas_mcm(image_feats, text_feats, score, float(T))
    return compute_scores(image_feats, text_feats, score=score, T=float(T))
