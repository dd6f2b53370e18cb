"""Random parameter initialization.

Used for tests and benchmarks when no pretrained checkpoint is on disk
(throughput is weight-independent).  Scales follow the OpenAI CLIP init
scheme closely enough for stable forward passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, SupervisedViTConfig, TextConfig, VisionConfig


def _ln(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _stacked_layers(key: jax.Array, layers: int, width: int,
                    mlp_ratio: int) -> dict:
    hidden = width * mlp_ratio
    ks = jax.random.split(key, 6)
    std = width ** -0.5

    def norm(k, shape, s):
        return (jax.random.normal(k, shape, jnp.float32) * s)

    return {
        "ln1": _ln_stack(layers, width),
        "attn": {
            "wq": norm(ks[0], (layers, width, width), std),
            "wk": norm(ks[1], (layers, width, width), std),
            "wv": norm(ks[2], (layers, width, width), std),
            "wo": norm(ks[3], (layers, width, width), std),
            "bq": jnp.zeros((layers, width), jnp.float32),
            "bk": jnp.zeros((layers, width), jnp.float32),
            "bv": jnp.zeros((layers, width), jnp.float32),
            "bo": jnp.zeros((layers, width), jnp.float32),
        },
        "ln2": _ln_stack(layers, width),
        "mlp": {
            "w1": norm(ks[4], (layers, width, hidden), std),
            "b1": jnp.zeros((layers, hidden), jnp.float32),
            "w2": norm(ks[5], (layers, hidden, width), hidden ** -0.5),
            "b2": jnp.zeros((layers, width), jnp.float32),
        },
    }


def _ln_stack(layers: int, dim: int):
    return {"scale": jnp.ones((layers, dim), jnp.float32),
            "bias": jnp.zeros((layers, dim), jnp.float32)}


def init_vision(key: jax.Array, cfg: VisionConfig) -> dict:
    ks = jax.random.split(key, 5)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": jax.random.normal(ks[0], (patch_dim, cfg.width),
                                         jnp.float32) * cfg.width ** -0.5,
        "class_emb": jax.random.normal(ks[1], (cfg.width,),
                                       jnp.float32) * cfg.width ** -0.5,
        "pos_emb": jax.random.normal(ks[2], (cfg.seq_len, cfg.width),
                                     jnp.float32) * 0.01,
        "pre_ln": _ln(cfg.width),
        "layers": _stacked_layers(ks[3], cfg.layers, cfg.width, cfg.mlp_ratio),
        "post_ln": _ln(cfg.width),
        "proj": jax.random.normal(ks[4], (cfg.width, cfg.projection_dim),
                                  jnp.float32) * cfg.width ** -0.5,
    }


def init_text(key: jax.Array, cfg: TextConfig) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "token_emb": jax.random.normal(ks[0], (cfg.vocab_size, cfg.width),
                                       jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(ks[1], (cfg.context_length, cfg.width),
                                     jnp.float32) * 0.01,
        "layers": _stacked_layers(ks[2], cfg.layers, cfg.width, cfg.mlp_ratio),
        "final_ln": _ln(cfg.width),
        "proj": jax.random.normal(ks[3], (cfg.width, cfg.projection_dim),
                                  jnp.float32) * cfg.width ** -0.5,
    }


def init_clip(key: jax.Array, cfg: CLIPConfig) -> dict:
    kv, kt = jax.random.split(key)
    return {
        "vision": init_vision(kv, cfg.vision),
        "text": init_text(kt, cfg.text),
        "logit_scale": jnp.asarray(4.6052, jnp.float32),  # ln(100)
    }


def init_supervised_vit(key: jax.Array, cfg: SupervisedViTConfig) -> dict:
    """Random init for the supervised ViT MSP-baseline classifier."""
    ks = jax.random.split(key, 5)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": jax.random.normal(ks[0], (patch_dim, cfg.width),
                                         jnp.float32) * cfg.width ** -0.5,
        "patch_bias": jnp.zeros((cfg.width,), jnp.float32),
        "class_emb": jax.random.normal(ks[1], (cfg.width,),
                                       jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(ks[2], (cfg.seq_len, cfg.width),
                                     jnp.float32) * 0.02,
        "layers": _stacked_layers(ks[3], cfg.layers, cfg.width, cfg.mlp_ratio),
        "final_ln": _ln(cfg.width),
        "head": {
            "w": jax.random.normal(ks[4], (cfg.width, cfg.num_classes),
                                   jnp.float32) * cfg.width ** -0.5,
            "b": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }
