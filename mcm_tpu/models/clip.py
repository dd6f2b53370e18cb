"""CLIP in pure JAX — TPU-native re-implementation.

The reference delegates all model compute to HuggingFace ``CLIPModel``
(``/root/reference/utils/train_eval_util.py:23``; forwards invoked at
``utils/detection_util.py:225,229``).  This module owns that surface:

* vision tower: patchify (as a single MXU matmul, not a conv), CLS token,
  learned position embeddings, pre-LN transformer, post-LN on the CLS token,
  linear projection into the joint embedding space;
* text tower: token+position embeddings, causal pre-LN transformer, final LN,
  EOT-token pooling (argmax of token ids — the OpenAI EOT id is the largest),
  linear projection.

Architecture is pure functions over a parameter pytree (nested dicts with the
per-layer tensors stacked on a leading axis) so the whole tower is one
``lax.scan`` over layers: a single traced block, fast to compile, and XLA
fuses LayerNorm/GELU into the surrounding matmuls.  Numerics follow HF CLIP:
QuickGELU (``x * sigmoid(1.702 x)``), LayerNorm eps 1e-5, queries scaled by
``head_dim**-0.5``.

Precision policy: parameters live in fp32; activations are cast to
``precision.activation_dtype`` (bf16 for speed on the MXU, fp32 for parity);
every matmul accumulates in fp32 via ``preferred_element_type``; LayerNorm
and softmax always run in fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
from mcm_tpu.ops.attention import encoder_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive blocks
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    """LayerNorm in fp32 regardless of input dtype (returns input dtype)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP activation: x * sigmoid(1.702 x) (not tanh-GELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
           precision: Precision) -> jax.Array:
    """y = x @ w + b with fp32 accumulation, output in compute dtype."""
    cdt = precision.activation_dtype
    y = jnp.dot(x.astype(cdt), w.astype(cdt),
                precision=precision.matmul_precision,
                preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(cdt)


def transformer_block(x: jax.Array, layer: Params, *, heads: int, eps: float,
                      mask: Optional[jax.Array],
                      precision: Precision) -> jax.Array:
    """One pre-LN CLIP encoder layer: x += attn(ln1(x)); x += mlp(ln2(x))."""
    h = layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
    q = _dense(h, layer["attn"]["wq"], layer["attn"]["bq"], precision)
    k = _dense(h, layer["attn"]["wk"], layer["attn"]["bk"], precision)
    v = _dense(h, layer["attn"]["wv"], layer["attn"]["bv"], precision)
    a = encoder_attention(q, k, v, heads=heads, mask=mask,
                          precision=precision)
    a = _dense(a, layer["attn"]["wo"], layer["attn"]["bo"], precision)
    x = x + a

    h = layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
    if precision.mlp_impl == "pallas":
        from mcm_tpu.ops.mlp import fused_mlp
        cdt = precision.activation_dtype
        b, s, d = h.shape
        h = fused_mlp(h.reshape(b * s, d),
                      layer["mlp"]["w1"].astype(cdt),
                      layer["mlp"]["b1"],
                      layer["mlp"]["w2"].astype(cdt),
                      layer["mlp"]["b2"]).reshape(b, s, d)
        return x + h
    h = _dense(h, layer["mlp"]["w1"], layer["mlp"]["b1"], precision)
    h = quick_gelu(h)
    h = _dense(h, layer["mlp"]["w2"], layer["mlp"]["b2"], precision)
    return x + h


def run_transformer(x: jax.Array, layers: Params, *, heads: int, eps: float,
                    mask: Optional[jax.Array], precision: Precision,
                    collect_hidden: bool = False):
    """Scan one traced block over the stacked per-layer parameters.

    ``collect_hidden=True`` additionally returns the per-layer outputs
    stacked as [L, B, S, D] (parity harness: HF ``output_hidden_states``)."""

    def body(carry, layer):
        y = transformer_block(carry, layer, heads=heads, eps=eps,
                              mask=mask, precision=precision)
        return y, (y if collect_hidden else None)

    x, hs = jax.lax.scan(body, x, layers)
    return (x, hs) if collect_hidden else x


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, C] → [B, N, patch*patch*C] with (ph, pw, c) patch order.

    Extracting non-overlapping patches as a reshape + one big matmul maps the
    patch embedding straight onto the MXU instead of going through a conv
    (stride == kernel makes them equivalent).  The flatten order matches the
    checkpoint converter's transpose of the HF conv kernel.
    """
    b, h, w, c = pixel_values.shape
    p = patch_size
    x = pixel_values.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/p, W/p, p, p, C]
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def encode_image(params: Params, cfg: VisionConfig, pixel_values: jax.Array,
                 precision: Precision = Precision.parity(),
                 collect_hidden: bool = False):
    """Image features in the joint space (reference: ``net.get_image_features``,
    ``detection_util.py:225``).  NOT L2-normalized — scoring owns that.

    pixel_values: [B, H, W, C] float (already resized/cropped/normalized),
    NHWC.  Accepts NCHW too (auto-transposed) for drop-in parity testing.

    ``collect_hidden=True`` → ``(features, hiddens)`` with hiddens shaped
    [L+1, B, S, D]: the layer-0 input (post pre-LN) followed by every
    layer's output — index-compatible with HF ``output_hidden_states``.
    """
    v = params["vision"]
    if pixel_values.shape[-1] != 3 and pixel_values.shape[1] == 3:
        pixel_values = pixel_values.transpose(0, 2, 3, 1)
    cdt = precision.activation_dtype

    patches = patchify(pixel_values, cfg.patch_size)
    x = _dense(patches, v["patch_embed"], None, precision)  # [B, N, D]

    cls = jnp.broadcast_to(v["class_emb"].astype(cdt),
                           (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)  # [B, N+1, D]
    x = x + v["pos_emb"].astype(cdt)

    x = layer_norm(x, v["pre_ln"]["scale"], v["pre_ln"]["bias"],
                   cfg.layer_norm_eps)
    out = run_transformer(x, v["layers"], heads=cfg.heads,
                          eps=cfg.layer_norm_eps, mask=None,
                          precision=precision,
                          collect_hidden=collect_hidden)
    hiddens = None
    if collect_hidden:
        last, hs = out
        hiddens = jnp.concatenate([x[None], hs], axis=0)
        x = last
    else:
        x = out

    pooled = x[:, 0, :]  # CLS token
    pooled = layer_norm(pooled, v["post_ln"]["scale"], v["post_ln"]["bias"],
                        cfg.layer_norm_eps)
    feats = _dense(pooled, v["proj"], None, precision)
    return (feats, hiddens) if collect_hidden else feats


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------

def _text_mask(attention_mask: Optional[jax.Array], seq_len: int,
               batch: int) -> jax.Array:
    """Additive fp32 mask: causal + key-padding.  [B, 1, S, S]."""
    neg = jnp.asarray(-1e9, dtype=jnp.float32)
    causal = jnp.triu(jnp.full((seq_len, seq_len), neg, dtype=jnp.float32), 1)
    mask = jnp.broadcast_to(causal[None, None], (batch, 1, seq_len, seq_len))
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * neg
        mask = mask + pad[:, None, None, :]
    return mask


def encode_text(params: Params, cfg: TextConfig, input_ids: jax.Array,
                attention_mask: Optional[jax.Array] = None,
                precision: Precision = Precision.parity(),
                collect_hidden: bool = False):
    """Text features in the joint space (reference: ``net.get_text_features``,
    ``detection_util.py:229-230``).  NOT L2-normalized.

    input_ids: [B, S] int32 (S ≤ context_length).  Pooling takes the position
    of the largest token id (the EOT token, id vocab_size-1), matching HF's
    pooling for OpenAI checkpoints.

    ``collect_hidden=True`` → ``(features, hiddens)``, hiddens [L+1, B, S, D]
    (embedding output + every layer output, HF ``output_hidden_states``).
    """
    t = params["text"]
    cdt = precision.activation_dtype
    b, s = input_ids.shape

    x = t["token_emb"][input_ids].astype(cdt)
    x = x + t["pos_emb"][:s].astype(cdt)

    mask = _text_mask(attention_mask, s, b)
    out = run_transformer(x, t["layers"], heads=cfg.heads,
                          eps=cfg.layer_norm_eps, mask=mask,
                          precision=precision,
                          collect_hidden=collect_hidden)
    hiddens = None
    if collect_hidden:
        last, hs = out
        hiddens = jnp.concatenate([x[None], hs], axis=0)
        x = last
    else:
        x = out
    x = layer_norm(x, t["final_ln"]["scale"], t["final_ln"]["bias"],
                   cfg.layer_norm_eps)

    eot_idx = jnp.argmax(input_ids, axis=-1)  # EOT has the largest id
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    feats = _dense(pooled, t["proj"], None, precision)
    return (feats, hiddens) if collect_hidden else feats


# ---------------------------------------------------------------------------
# Convenience jitted entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def encode_image_jit(params: Params, cfg: CLIPConfig, pixel_values: jax.Array,
                     precision: Precision = Precision.parity()) -> jax.Array:
    return encode_image(params, cfg.vision, pixel_values, precision)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def encode_text_jit(params: Params, cfg: CLIPConfig, input_ids: jax.Array,
                    attention_mask: Optional[jax.Array] = None,
                    precision: Precision = Precision.parity()) -> jax.Array:
    return encode_text(params, cfg.text, input_ids, attention_mask, precision)
