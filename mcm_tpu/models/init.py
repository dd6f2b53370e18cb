"""Random parameter initialization.

Used for tests and benchmarks when no pretrained checkpoint is on disk
(throughput is weight-independent).  Scales follow the OpenAI CLIP init
scheme closely enough for stable forward passes.

Generation is HOST-side numpy: jax.random on a tunneled TPU costs ~50 s
of remote compiles for a B/16's ~15 shapes (and even reading a key's
data back via ``jax.random.key_data`` costs a ~60 s remote compile per
process) — numpy fills the same 150M params in a few seconds.  Pass a
plain int seed; jax PRNG keys are still accepted (their data seeds the
numpy generator — cheap on CPU backends, slow through a device tunnel).
"""

from __future__ import annotations

import jax
import numpy as np

from mcm_tpu.config import CLIPConfig, SupervisedViTConfig, TextConfig, VisionConfig


def _seed_of(key) -> np.random.SeedSequence:
    if isinstance(key, np.random.SeedSequence):
        return key
    if isinstance(key, (int, np.integer)):
        return np.random.SeedSequence(int(key))
    return np.random.SeedSequence(
        np.asarray(jax.random.key_data(key)).ravel().tolist())


def _rng_for(key) -> np.random.Generator:
    return np.random.default_rng(_seed_of(key))


def _ln(dim: int):
    return {"scale": np.ones((dim,), np.float32),
            "bias": np.zeros((dim,), np.float32)}


def _ln_stack(layers: int, dim: int):
    return {"scale": np.ones((layers, dim), np.float32),
            "bias": np.zeros((layers, dim), np.float32)}


def _stacked_layers(rng: np.random.Generator, layers: int, width: int,
                    mlp_ratio: int) -> dict:
    hidden = width * mlp_ratio
    std = width ** -0.5

    def norm(shape, s):
        return (rng.standard_normal(shape, dtype=np.float32) * s)

    return {
        "ln1": _ln_stack(layers, width),
        "attn": {
            "wq": norm((layers, width, width), std),
            "wk": norm((layers, width, width), std),
            "wv": norm((layers, width, width), std),
            "wo": norm((layers, width, width), std),
            "bq": np.zeros((layers, width), np.float32),
            "bk": np.zeros((layers, width), np.float32),
            "bv": np.zeros((layers, width), np.float32),
            "bo": np.zeros((layers, width), np.float32),
        },
        "ln2": _ln_stack(layers, width),
        "mlp": {
            "w1": norm((layers, width, hidden), std),
            "b1": np.zeros((layers, hidden), np.float32),
            "w2": norm((layers, hidden, width), hidden ** -0.5),
            "b2": np.zeros((layers, width), np.float32),
        },
    }


def init_vision(key, cfg: VisionConfig) -> dict:
    # _rng_for, not default_rng(key): int/SeedSequence seeds produce the
    # identical stream, and jax PRNG keys (which default_rng rejects)
    # work as the module docstring promises.
    rng = _rng_for(key)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": rng.standard_normal(
            (patch_dim, cfg.width), dtype=np.float32) * cfg.width ** -0.5,
        "class_emb": rng.standard_normal(
            (cfg.width,), dtype=np.float32) * cfg.width ** -0.5,
        "pos_emb": rng.standard_normal(
            (cfg.seq_len, cfg.width), dtype=np.float32) * 0.01,
        "pre_ln": _ln(cfg.width),
        "layers": _stacked_layers(rng, cfg.layers, cfg.width, cfg.mlp_ratio),
        "post_ln": _ln(cfg.width),
        "proj": rng.standard_normal(
            (cfg.width, cfg.projection_dim),
            dtype=np.float32) * cfg.width ** -0.5,
    }


def init_text(key, cfg: TextConfig) -> dict:
    rng = _rng_for(key)
    return {
        "token_emb": rng.standard_normal(
            (cfg.vocab_size, cfg.width), dtype=np.float32) * 0.02,
        "pos_emb": rng.standard_normal(
            (cfg.context_length, cfg.width), dtype=np.float32) * 0.01,
        "layers": _stacked_layers(rng, cfg.layers, cfg.width, cfg.mlp_ratio),
        "final_ln": _ln(cfg.width),
        "proj": rng.standard_normal(
            (cfg.width, cfg.projection_dim),
            dtype=np.float32) * cfg.width ** -0.5,
    }


def init_clip(key, cfg: CLIPConfig) -> dict:
    kv, kt = _seed_of(key).spawn(2)
    return {
        "vision": init_vision(kv, cfg.vision),
        "text": init_text(kt, cfg.text),
        "logit_scale": np.float32(4.6052),  # ln(100)
    }


def clip_param_sds(cfg: CLIPConfig):
    """ShapeDtypeStruct pytree of :func:`init_clip`'s output — for AOT
    ``lower().compile()`` checks.  Derived by materializing one init and
    mapping to shapes (seconds + transient RAM) rather than hand-listing
    shapes, so it can never drift from the real parameter layout."""
    params = init_clip(0, cfg)
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params)


def init_supervised_vit(key, cfg: SupervisedViTConfig) -> dict:
    """Random init for the supervised ViT MSP-baseline classifier."""
    rng = _rng_for(key)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "patch_embed": rng.standard_normal(
            (patch_dim, cfg.width), dtype=np.float32) * cfg.width ** -0.5,
        "patch_bias": np.zeros((cfg.width,), np.float32),
        "class_emb": rng.standard_normal(
            (cfg.width,), dtype=np.float32) * 0.02,
        "pos_emb": rng.standard_normal(
            (cfg.seq_len, cfg.width), dtype=np.float32) * 0.02,
        "layers": _stacked_layers(rng, cfg.layers, cfg.width, cfg.mlp_ratio),
        "final_ln": _ln(cfg.width),
        "head": {
            "w": rng.standard_normal(
                (cfg.width, cfg.num_classes),
                dtype=np.float32) * cfg.width ** -0.5,
            "b": np.zeros((cfg.num_classes,), np.float32),
        },
    }
