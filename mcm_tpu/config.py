"""Model and evaluation configuration.

TPU-native re-implementation of the model surface the reference consumes via
HuggingFace (``/root/reference/utils/train_eval_util.py:15-36`` maps CLI names
``ViT-B/16 | ViT-B/32 | ViT-L/14`` to OpenAI CLIP checkpoints).  Here the same
names map to static architecture configs for our own JAX CLIP implementation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP vision tower (ViT) architecture."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS token

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """CLIP text tower (causal transformer) architecture."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: int = 4
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    vision: VisionConfig
    text: TextConfig

    @property
    def embed_dim(self) -> int:
        return self.vision.projection_dim


def clip_vit_b32() -> CLIPConfig:
    return CLIPConfig(
        name="ViT-B/32",
        vision=VisionConfig(patch_size=32, width=768, layers=12, heads=12,
                            projection_dim=512),
        text=TextConfig(width=512, layers=12, heads=8, projection_dim=512),
    )


def clip_vit_b16() -> CLIPConfig:
    import os
    if os.environ.get("MCM_TPU_TEST_TINY_B16"):
        # test double for CLI-subprocess orchestration tests (suite wall
        # time; docs/TESTING.md): structurally identical — 224²/16 patches
        # (197-token sequences), full vocab, pre-LN, EOT pooling — but
        # 2 layers/128 wide so a 1-core CPU forward is instant.  NEVER set
        # outside tests: scores are architecture-meaningless.
        import warnings
        warnings.warn("MCM_TPU_TEST_TINY_B16 active: ViT-B/16 resolves to "
                      "a 2-layer/128-wide test double")
        return CLIPConfig(
            name="ViT-B/16",
            vision=VisionConfig(patch_size=16, width=128, layers=2, heads=4,
                                projection_dim=64),
            text=TextConfig(width=128, layers=2, heads=4, projection_dim=64),
        )
    return CLIPConfig(
        name="ViT-B/16",
        vision=VisionConfig(patch_size=16, width=768, layers=12, heads=12,
                            projection_dim=512),
        text=TextConfig(width=512, layers=12, heads=8, projection_dim=512),
    )


def clip_vit_l14() -> CLIPConfig:
    return CLIPConfig(
        name="ViT-L/14",
        vision=VisionConfig(patch_size=14, width=1024, layers=24, heads=16,
                            projection_dim=768),
        text=TextConfig(width=768, layers=12, heads=12, projection_dim=768),
    )


#: CLI checkpoint-name → architecture, the public surface of
#: ``--CLIP_ckpt`` (reference ``eval_ood_detection.py:34-35``).
CLIP_CONFIGS = {
    "ViT-B/32": clip_vit_b32,
    "ViT-B/16": clip_vit_b16,
    "ViT-L/14": clip_vit_l14,
}

#: Feature dim per checkpoint — replaces the reference's manual ``--feat_dim``
#: footgun (``eval_ood_detection.py:39``: "512 for ViT-B and 768 for ViT-L").
CLIP_FEAT_DIMS = {"ViT-B/32": 512, "ViT-B/16": 512, "ViT-L/14": 768}

#: HF hub ids kept for checkpoint-conversion compatibility
#: (reference ``train_eval_util.py:19-21``).
HF_CKPT_MAPPING = {
    "ViT-B/16": "openai/clip-vit-base-patch16",
    "ViT-B/32": "openai/clip-vit-base-patch32",
    "ViT-L/14": "openai/clip-vit-large-patch14",
}


@dataclasses.dataclass(frozen=True)
class Precision:
    """Numerical policy for the compute path.

    ``parity``  — fp32 activations, HIGHEST matmul precision.  Use when the
                  goal is bit-closeness to the fp32 PyTorch reference
                  (AUROC within 0.1%, BASELINE.md north star).
    ``fast``    — bf16 activations with fp32 accumulation.  The MXU-native
                  mode; the default for throughput benchmarks.
    """

    activation_dtype: jnp.dtype = jnp.bfloat16
    accumulate_dtype: jnp.dtype = jnp.float32
    #: lax matmul precision: "highest" forces true-fp32 MXU passes (parity);
    #: "default" lets fp32 inputs go through bf16x3/bf16 fast paths (speed).
    matmul_precision: str = "default"
    #: attention implementation for unmasked (vision) attention:
    #: "auto" — the pallas_bsd kernel on TPU in bf16 fast mode (measured
    #: 3741 vs 2945 img/s e2e on v5e, docs/PERF.md round 3), XLA
    #: elsewhere (CPU, parity mode, masked/text, odd head dims) — or
    #: force "xla" / "pallas_bsd" ([B,S,D]-native batched-dot kernel) /
    #: "pallas" (full-S per-(b·h) kernel) / "pallas_mh" (head-grouped) /
    #: "pallas_batched" (pre-split batched-dot) / "flash" (jax's TPU
    #: FlashAttention, S padded to 128-multiples).  Forced kernels apply
    #: to unmasked (vision) attention; masked (text-tower) calls always
    #: fall back to the XLA path.
    attn_impl: str = "auto"
    #: MLP implementation: "auto"/"xla" (XLA matmuls), or "pallas" — the
    #: fused fc1→act→fc2 kernel keeping the [B·S, 4D] intermediate in VMEM.
    mlp_impl: str = "auto"
    #: dtype of the attention probability tensor.  bf16 halves the HBM
    #: traffic of the hot loop's largest intermediate ([B, H, S, S]) —
    #: measured +12% end-to-end on v5e with ~1e-6 MCM-score deviation.
    #: parity mode keeps fp32.
    softmax_dtype: jnp.dtype = jnp.float32
    # LayerNorm always runs in fp32 regardless of activation dtype.

    @staticmethod
    def parity() -> "Precision":
        return Precision(activation_dtype=jnp.float32,
                         matmul_precision="highest",
                         softmax_dtype=jnp.float32)

    @staticmethod
    def fast() -> "Precision":
        return Precision(activation_dtype=jnp.bfloat16,
                         softmax_dtype=jnp.bfloat16)


def resolve_precision(name: str) -> Precision:
    if name in ("parity", "float32", "fp32", "highest"):
        return Precision.parity()
    if name in ("fast", "bfloat16", "bf16", "default"):
        return Precision.fast()
    raise ValueError(f"unknown precision policy: {name!r}")


@dataclasses.dataclass(frozen=True)
class SupervisedViTConfig:
    """Supervised ViT classifier (MSP baseline; reference README's
    google/vit-base-patch16-224 comparison path, ``detection_util.py:124-126``).

    Construct via :func:`supervised_vit_config` on CLI paths — it applies
    the ``MCM_TPU_TEST_TINY_VIT=1`` test-double override (CLI-subprocess
    orchestration tests only; see docs/TESTING.md)."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 1000
    layer_norm_eps: float = 1e-12

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def supervised_vit_config() -> SupervisedViTConfig:
    """The CLI's ViT-base config, honoring the test-double override."""
    import os
    if os.environ.get("MCM_TPU_TEST_TINY_VIT"):
        import warnings
        warnings.warn("MCM_TPU_TEST_TINY_VIT active: the supervised ViT "
                      "resolves to a 2-layer/128-wide test double")
        return SupervisedViTConfig(width=128, layers=2, heads=4)
    return SupervisedViTConfig()
