"""CLIP contrastive fine-tuning — the training side of the framework.

The reference is inference-only but carries a fine-tuned-checkpoint loading
path (``CLIP-Linear``, ``/root/reference/utils/train_eval_util.py:24-25``);
this module supplies the step that *produces* such checkpoints, TPU-native:

* symmetric InfoNCE over ``logit_scale · img@txtᵀ`` (standard CLIP loss);
* one jitted train step: normalize → both towers → loss → grad → optax
  update, sharded over the (data × model) mesh with the same TP param
  specs as inference (gradients inherit the param shardings; XLA inserts
  the data-axis psum for gradient accumulation);
* gradient checkpointing (``jax.checkpoint`` over the scanned block) trades
  FLOPs for HBM so large towers train at useful batch sizes.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mcm_tpu.config import CLIPConfig, Precision
from mcm_tpu.data.transforms import CLIP_MEAN, CLIP_STD, normalize_on_device
from mcm_tpu.models import clip as jclip
from mcm_tpu.parallel import mesh as meshlib
from mcm_tpu.scores.clip_scores import l2_normalize


#: CLIP's temperature cap: logit_scale is clamped so exp(·) ≤ 100 after
#: every update (OpenAI training recipe; pretrained checkpoints ship AT
#: this cap, and an unclamped fine-tune drifts past it into softmax
#: saturation and, eventually, exp overflow)
MAX_LOGIT_SCALE = 4.6051702  # ln(100)


def clip_contrastive_loss(image_feats: jax.Array, text_feats: jax.Array,
                          logit_scale: jax.Array,
                          positive_mask: Optional[jax.Array] = None
                          ) -> jax.Array:
    """Symmetric cross-entropy over the similarity matrix (fp32).

    ``positive_mask`` ([B, B] bool, diagonal always true): marks pairs
    whose captions are identical.  Class-name captions guarantee
    duplicates once batch > n_classes — with plain arange labels those
    duplicates are false negatives, putting a log(k) floor on the loss
    and pushing identical text rows apart; soft targets spread each
    row's mass uniformly over its true positives instead (multi-positive
    InfoNCE).  ``None`` = all-distinct (exactly the classic loss)."""
    img = l2_normalize(image_feats).astype(jnp.float32)
    txt = l2_normalize(text_feats).astype(jnp.float32)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    logits = scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
    if positive_mask is None:
        labels = jnp.arange(logits.shape[0])
        loss_i = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        loss_t = optax.softmax_cross_entropy_with_integer_labels(
            logits.T, labels)
        return 0.5 * (jnp.mean(loss_i) + jnp.mean(loss_t))
    pos = positive_mask.astype(jnp.float32)
    t_i = pos / pos.sum(-1, keepdims=True)
    t_t = pos.T / pos.T.sum(-1, keepdims=True)
    loss_i = -(jax.nn.log_softmax(logits, axis=-1) * t_i).sum(-1)
    loss_t = -(jax.nn.log_softmax(logits.T, axis=-1) * t_t).sum(-1)
    return 0.5 * (jnp.mean(loss_i) + jnp.mean(loss_t))


def _duplicate_caption_mask(input_ids: jax.Array,
                            mask: jax.Array) -> jax.Array:
    """[B, B] bool: rows whose (masked) token sequences are identical —
    the true-positive structure of a class-caption batch, derived from
    the tokens themselves so callers need no extra label plumbing."""
    ids = jnp.where(mask.astype(bool), input_ids, -1)
    return jnp.all(ids[:, None, :] == ids[None, :, :], axis=-1)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(cfg: CLIPConfig,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    precision: Precision = Precision.fast(),
                    mesh=None, remat: bool = True
                    ) -> Tuple[Callable, Callable]:
    """Build (init_state, train_step), both jitted over ``mesh``.

    ``train_step(state, images_u8 [B,H,W,3], input_ids [B,S], mask [B,S])
    → (state, loss)``; batch sharded on the data axis, params/optimizer
    state TP-sharded, loss replicated.
    """
    if optimizer is None:
        # CLIP recipe: weight decay on weight MATRICES only — decaying
        # logit_scale, LayerNorm scales/biases, and linear biases (all
        # ndim < 2) multiplicatively drags them from their pretrained
        # values every step regardless of gradient
        optimizer = optax.adamw(
            1e-5, weight_decay=0.2,
            mask=lambda params: jax.tree_util.tree_map(
                lambda p: jnp.ndim(p) >= 2, params))
    mesh = mesh if mesh is not None else meshlib.make_mesh(1)
    meshlib.validate_tp(cfg, mesh)
    # Attention for training: XLA by default, by measurement.
    # "pallas_bsd_vjp" (the inference kernel forward + XLA-recompute
    # backward, gradients exactly XLA's) is available as an explicit
    # opt-in on single-device meshes, but a shared-state alternating A/B
    # on the v5e shows it's a WASH against XLA under remat (both inside
    # the host's ±10% run variance; tools/train_attn_probe.py and
    # docs/PERF.md carry the full measurement story, including two
    # contradictory single runs that motivated the A/B).  Multi-device
    # meshes must keep XLA: the pjit partitioner cannot split the pallas
    # custom call.
    import dataclasses
    if precision.attn_impl == "pallas_bsd_vjp":
        if mesh.devices.size != 1:
            raise ValueError("attn_impl=pallas_bsd_vjp cannot be "
                             "pjit-partitioned — use a single-device mesh "
                             "or attn_impl='xla'")
        attn = "pallas_bsd_vjp"
    else:
        attn = "xla"
    precision = dataclasses.replace(precision, attn_impl=attn,
                                    mlp_impl="xla")

    param_sh = meshlib.param_shardings(mesh)
    batch_sh = meshlib.batch_sharding(mesh)
    repl = meshlib.replicated(mesh)

    def encode_image(params, x):
        return jclip.encode_image(params, cfg.vision, x, precision)

    def encode_text(params, ids, mask):
        return jclip.encode_text(params, cfg.text, ids, mask, precision)

    if remat:
        encode_image = jax.checkpoint(encode_image)
        encode_text = jax.checkpoint(encode_text)

    def loss_fn(params, images_u8, input_ids, mask):
        x = normalize_on_device(images_u8, CLIP_MEAN, CLIP_STD,
                                dtype=precision.activation_dtype)
        img = encode_image(params, x)
        txt = encode_text(params, input_ids, mask)
        return clip_contrastive_loss(
            img, txt, params["logit_scale"],
            positive_mask=_duplicate_caption_mask(input_ids, mask))

    def train_step(state: TrainState, images_u8, input_ids, mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images_u8,
                                                  input_ids, mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        # the CLIP temperature clamp (training recipe; see MAX_LOGIT_SCALE)
        params = {**params,
                  "logit_scale": jnp.clip(params["logit_scale"],
                                          0.0, MAX_LOGIT_SCALE)}
        return TrainState(params, opt_state, state.step + 1), loss

    def init_state(params) -> TrainState:
        # place params on the mesh with the TP shardings HERE (no-op when
        # the caller pre-sharded): jitted_step's in_shardings=None inherits
        # whatever the state carries, so un-placed host params would
        # otherwise replicate params + both AdamW moments on every chip —
        # exactly the memory the TP axis exists to save.  Optimizer moments
        # are zeros_like(params) and inherit the placement.
        from mcm_tpu.parallel.multihost import put_global
        params = jax.tree_util.tree_map(
            lambda x, s: put_global(jnp.asarray(x), s), params, param_sh)
        return TrainState(params, optimizer.init(params),
                          jnp.zeros((), jnp.int32))

    jitted_step = jax.jit(
        train_step,
        in_shardings=(None, batch_sh, batch_sh, batch_sh),
        out_shardings=(None, repl),
        # donate the input TrainState: without it XLA holds input AND
        # output params + both AdamW moments live across the step (~3.6 GB
        # transient for ViT-B fp32, 3x for ViT-L) — a params+moments-sized
        # chunk of exactly the HBM the remat above exists to save (review
        # finding, round 5).  Every caller reassigns
        # `state = train_step(state, ...)`, so the donated buffers are
        # never read again.
        donate_argnums=(0,))
    return init_state, jitted_step
