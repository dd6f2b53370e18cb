"""Supervised ViT classifier — the MSP-baseline model.

The reference's hard-OOD comparison runs a supervised
``google/vit-base-patch16-224`` with an MSP score (README ``:27``; the
``vit-Linear`` branches at ``/root/reference/utils/detection_util.py:124-126``
take ``last_hidden_state[:, 0]`` into a linear head).  This implements that
tower natively: standard ViT (post-embedding LN-free, exact-GELU MLP,
eps 1e-12 LayerNorms, learned CLS + position embeddings) + classifier head.

Same functional style as :mod:`mcm_tpu.models.clip`: scan-stacked layers,
patchify-as-matmul, fp32 LN/softmax, bf16 matmul fast path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mcm_tpu.config import Precision, SupervisedViTConfig
from mcm_tpu.models.clip import _dense, layer_norm, patchify
from mcm_tpu.ops.attention import encoder_attention

Params = Dict[str, Any]


def _vit_block(x, layer, *, heads: int, eps: float,
               precision: Precision):
    """Pre-LN ViT block with exact (erf) GELU."""
    h = layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"], eps)
    q = _dense(h, layer["attn"]["wq"], layer["attn"]["bq"], precision)
    k = _dense(h, layer["attn"]["wk"], layer["attn"]["bk"], precision)
    v = _dense(h, layer["attn"]["wv"], layer["attn"]["bv"], precision)
    a = encoder_attention(q, k, v, heads=heads, mask=None,
                          precision=precision)
    x = x + _dense(a, layer["attn"]["wo"], layer["attn"]["bo"], precision)
    h = layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"], eps)
    h = _dense(h, layer["mlp"]["w1"], layer["mlp"]["b1"], precision)
    h = jax.nn.gelu(h.astype(jnp.float32),
                    approximate=False).astype(h.dtype)
    h = _dense(h, layer["mlp"]["w2"], layer["mlp"]["b2"], precision)
    return x + h


def forward_features(params: Params, cfg: SupervisedViTConfig,
                     pixel_values: jax.Array,
                     precision: Precision = Precision.parity()) -> jax.Array:
    """CLS-token features after the final LayerNorm ([B, width])."""
    if pixel_values.shape[-1] != 3 and pixel_values.shape[1] == 3:
        pixel_values = pixel_values.transpose(0, 2, 3, 1)
    cdt = precision.activation_dtype

    patches = patchify(pixel_values, cfg.patch_size)
    x = _dense(patches, params["patch_embed"], params["patch_bias"],
               precision)
    cls = jnp.broadcast_to(params["class_emb"].astype(cdt),
                           (x.shape[0], 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"].astype(cdt)

    def body(carry, layer):
        return _vit_block(carry, layer, heads=cfg.heads,
                          eps=cfg.layer_norm_eps, precision=precision), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"],
                   cfg.layer_norm_eps)
    return x[:, 0, :]


def forward_logits(params: Params, cfg: SupervisedViTConfig,
                   pixel_values: jax.Array,
                   precision: Precision = Precision.parity()) -> jax.Array:
    """Classifier logits [B, num_classes]."""
    feats = forward_features(params, cfg, pixel_values, precision)
    return _dense(feats, params["head"]["w"], params["head"]["b"],
                  precision).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_logits_jit(params, cfg: SupervisedViTConfig, pixel_values,
                       precision: Precision = Precision.parity()):
    return forward_logits(params, cfg, pixel_values, precision)


def resolve_vit_params(cfg: SupervisedViTConfig,
                       ckpt_dir=None, cache: bool = False):
    """Supervised-ViT weights from ``ckpt_dir`` (converted npz, else an HF
    ``google/vit-base-patch16-224`` snapshot), or None.  Shared by the MSP
    baseline CLI and the vit-Linear path of the main runner."""
    import os
    import warnings
    import zipfile

    from mcm_tpu.models.convert import load_params, load_state_dict

    ckpt_dir = ckpt_dir or os.environ.get("MCM_TPU_CKPT_DIR", "checkpoints")
    native = os.path.join(ckpt_dir, "vit-base-patch16-224.npz")
    if os.path.exists(native):
        try:
            return load_params(native)
        except (ValueError, OSError, KeyError, zipfile.BadZipFile) as e:
            # same healing as resolve_clip_params: a truncated cache must
            # not brick resolution while the HF snapshot sits next to it
            warnings.warn(f"cached {native} is unreadable ({e}); "
                          f"re-converting from the source checkpoint")
    snapshot = os.path.join(ckpt_dir, "vit-base-patch16-224")
    if os.path.isdir(snapshot):
        params = convert_hf_vit(load_state_dict(snapshot), cfg)
        if cache:
            try:
                from mcm_tpu.models.convert import save_params
                os.makedirs(ckpt_dir, exist_ok=True)
                save_params(params, native)
            except OSError:
                pass
        return params
    return None


def resolve_vit_weight_source(ckpt_dir=None):
    """The file :func:`resolve_vit_params` loads weights from, or None —
    the vit-Linear half of the ``--resume`` weight-identity fingerprint
    (see ``convert.resolve_clip_weight_source``)."""
    import os

    from mcm_tpu.models.convert import _snapshot_weight_file

    ckpt_dir = ckpt_dir or os.environ.get("MCM_TPU_CKPT_DIR", "checkpoints")
    native = os.path.join(ckpt_dir, "vit-base-patch16-224.npz")
    if os.path.exists(native):
        return native
    snapshot = os.path.join(ckpt_dir, "vit-base-patch16-224")
    if os.path.isdir(snapshot):
        return _snapshot_weight_file(snapshot) or snapshot
    return None


# ---------------------------------------------------------------------------
# HF google/vit-* checkpoint conversion
# ---------------------------------------------------------------------------

def convert_hf_vit(sd: Dict[str, np.ndarray],
                   cfg: SupervisedViTConfig) -> Params:
    """Map an HF ``ViTForImageClassification`` state dict onto our layout."""
    def T(name):
        return sd[name].T.astype(np.float32)

    def A(name):
        return sd[name].astype(np.float32)

    p = cfg.patch_size
    conv_w = sd["vit.embeddings.patch_embeddings.projection.weight"]
    patch_embed = conv_w.transpose(2, 3, 1, 0).reshape(p * p * 3, cfg.width)

    n = cfg.layers

    def stack(tmpl, transpose):
        from mcm_tpu.models.convert import _stack
        return _stack(sd, tmpl, n, transpose)

    pre = "vit.encoder.layer.{}"
    layers = {
        "ln1": {"scale": stack(pre + ".layernorm_before.weight", False),
                "bias": stack(pre + ".layernorm_before.bias", False)},
        "attn": {
            "wq": stack(pre + ".attention.attention.query.weight", True),
            "bq": stack(pre + ".attention.attention.query.bias", False),
            "wk": stack(pre + ".attention.attention.key.weight", True),
            "bk": stack(pre + ".attention.attention.key.bias", False),
            "wv": stack(pre + ".attention.attention.value.weight", True),
            "bv": stack(pre + ".attention.attention.value.bias", False),
            "wo": stack(pre + ".attention.output.dense.weight", True),
            "bo": stack(pre + ".attention.output.dense.bias", False),
        },
        "ln2": {"scale": stack(pre + ".layernorm_after.weight", False),
                "bias": stack(pre + ".layernorm_after.bias", False)},
        "mlp": {
            "w1": stack(pre + ".intermediate.dense.weight", True),
            "b1": stack(pre + ".intermediate.dense.bias", False),
            "w2": stack(pre + ".output.dense.weight", True),
            "b2": stack(pre + ".output.dense.bias", False),
        },
    }
    return {
        "patch_embed": patch_embed.astype(np.float32),
        "patch_bias": A("vit.embeddings.patch_embeddings.projection.bias"),
        "class_emb": A("vit.embeddings.cls_token").reshape(-1),
        "pos_emb": A("vit.embeddings.position_embeddings")[0],
        "layers": layers,
        "final_ln": {"scale": A("vit.layernorm.weight"),
                     "bias": A("vit.layernorm.bias")},
        "head": {"w": T("classifier.weight"), "b": A("classifier.bias")},
    }
