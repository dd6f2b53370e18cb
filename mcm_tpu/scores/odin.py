"""ODIN-style input preprocessing: gradient-sign perturbation of inputs.

Reference: ``/root/reference/utils/detection_util.py:122-146``
(``input_preprocessing``): pseudo-label the batch with its own argmax,
backprop the NLL to the *inputs*, and nudge the image against the gradient
sign (scaled per channel by the normalization std) so ID inputs become more
confident — sharpening the ID/OOD separation before scoring.

The reference needs ``images.grad`` bookkeeping; in JAX this is one
``jax.grad`` over a pure function of the images.  The perturbation is in
*normalized* image space (the reference perturbs post-Normalize tensors) —
callers normalize first, perturb, then score.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mcm_tpu.data.transforms import CLIP_STD


def _nll_of_pseudo_labels(logits: jax.Array) -> jax.Array:
    pseudo = jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, pseudo[:, None],
                                         axis=-1))


def odin_perturb(logits_fn: Callable[[jax.Array], jax.Array],
                 images: jax.Array, noise_magnitude: float,
                 std=CLIP_STD) -> jax.Array:
    """Perturbed images (same shape/space as ``images``).

    ``logits_fn(images) → [B, C]`` logits already divided by T;
    ``images`` NHWC normalized floats.  Matches the reference update
    ``x - ε · sign(∂NLL/∂x)/std`` (``:138-145``; their sign_grad is the
    negative gradient sign because the loss is NLL).
    """
    grad = jax.grad(lambda x: _nll_of_pseudo_labels(logits_fn(x)))(images)
    sign = jnp.where(grad >= 0, 1.0, -1.0)
    sign = sign / jnp.asarray(std, dtype=sign.dtype)  # NHWC channel last
    return images - noise_magnitude * sign


def clip_odin_logits_fn(encode_image_fn: Callable, text_feats: jax.Array,
                        T: float = 1.0) -> Callable:
    """The differentiable logits function ODIN perturbs against for CLIP:
    encode → L2-normalize → matmul with cached text features → /T.

    The single definition shared by every CLIP ODIN path (the eval step's
    in-program perturbation and :func:`make_odin_clip_perturb`) so the
    precision fix below cannot regress on one side only."""

    def logits_fn(images):
        from mcm_tpu.scores.clip_scores import l2_normalize
        feats = l2_normalize(encode_image_fn(images).astype(jnp.float32))
        # "highest": the perturbation is sign(grad) — a bf16-like default
        # matmul on CPU can flip signs near zero (CLAUDE.md precision note)
        return jnp.dot(feats, text_feats.astype(jnp.float32).T,
                       precision="highest") / T

    return logits_fn


def make_odin_clip_perturb(encode_image_fn: Callable, text_feats: jax.Array,
                           T: float = 1.0,
                           noise_magnitude: float = 0.0014):
    """ODIN perturbation bound to a CLIP image tower + cached text features.

    ``encode_image_fn(normalized_images) → [B, D]`` raw image features.
    Returns a jittable ``perturb(images) → images`` closure.
    """
    logits_fn = clip_odin_logits_fn(encode_image_fn, text_feats, T)

    @jax.jit
    def perturb(images):
        return odin_perturb(logits_fn, images, noise_magnitude)

    return perturb
