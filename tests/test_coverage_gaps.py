"""Coverage for resolution/caching paths and smaller API corners."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig

TINY = CLIPConfig(
    name="tiny",
    vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                        heads=4, projection_dim=32),
    text=TextConfig(vocab_size=128, context_length=16, width=48, layers=2,
                    heads=4, projection_dim=32),
)


def test_resolve_clip_params_npz_cache(tmp_path, monkeypatch):
    """resolve: native npz bundle wins; missing everything → None."""
    from mcm_tpu.models.convert import resolve_clip_params, save_params
    from mcm_tpu.models.init import init_clip

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    assert resolve_clip_params("ViT-B/16", str(ckpt_dir)) is None

    params = init_clip(jax.random.key(0), TINY)
    save_params(params, str(ckpt_dir / "ViT-B-16.npz"))
    loaded = resolve_clip_params("ViT-B/16", str(ckpt_dir))
    assert loaded is not None
    np.testing.assert_array_equal(
        np.asarray(loaded["vision"]["pos_emb"]),
        np.asarray(params["vision"]["pos_emb"]))


def test_resolve_clip_params_hf_snapshot_conversion(tmp_path):
    """resolve: local HF snapshot dir → converted + cached as npz."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import dataclasses

    from mcm_tpu.config import clip_vit_b16
    from mcm_tpu.models.convert import resolve_clip_params

    cfg = transformers.CLIPConfig(
        vision_config=dict(image_size=224, patch_size=16, hidden_size=768,
                           num_hidden_layers=12, num_attention_heads=12,
                           intermediate_size=3072, hidden_act="quick_gelu"),
        text_config=dict(vocab_size=49408, hidden_size=512,
                         num_hidden_layers=12, num_attention_heads=8,
                         intermediate_size=2048, hidden_act="quick_gelu"),
        projection_dim=512)
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    ckpt_dir = tmp_path / "ckpts"
    snap = ckpt_dir / "clip-vit-base-patch16"
    snap.mkdir(parents=True)
    torch.save(model.state_dict(), snap / "pytorch_model.bin")

    params = resolve_clip_params("ViT-B/16", str(ckpt_dir))
    assert params is not None
    assert params["vision"]["layers"]["attn"]["wq"].shape == (12, 768, 768)
    # converted bundle cached for next time
    assert (ckpt_dir / "ViT-B-16.npz").exists()


def test_tokenizer_resolve_positive(tmp_path):
    from mcm_tpu.text.tokenizer import (BOS_TOKEN, EOS_TOKEN, CLIPTokenizer,
                                        bytes_to_unicode)
    alphabet = list(bytes_to_unicode().values())
    tokens = alphabet + [c + "</w>" for c in alphabet] + [BOS_TOKEN,
                                                          EOS_TOKEN]
    (tmp_path / "vocab.json").write_text(
        json.dumps({t: i for i, t in enumerate(tokens)}), encoding="utf-8")
    (tmp_path / "merges.txt").write_text("#version: 0.2\n", encoding="utf-8")
    tok = CLIPTokenizer.resolve(str(tmp_path))
    assert tok is not None
    assert tok.decode(tok.encode("hello")) == "hello"


def test_resize_normalize_rectangular(rng):
    """Device resize handles non-square fixed shapes (H != W)."""
    from mcm_tpu.ops.preprocess import resize_normalize
    img = rng.integers(0, 256, size=(1, 256, 320, 3), dtype=np.uint8)
    out = np.asarray(resize_normalize(jnp.asarray(img), 224))
    assert out.shape == (1, 224, 224, 3)
    assert np.isfinite(out).all()


def test_odin_through_tiny_clip(rng):
    """ODIN perturbation through the real CLIP image tower (gradients flow
    through patchify/scan/attention)."""
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.scores.odin import make_odin_clip_perturb

    params = init_clip(jax.random.key(0), TINY)
    text = rng.standard_normal((5, 32)).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))

    def encode(x):
        return jclip.encode_image(params, TINY.vision, x, Precision.parity())

    perturb = make_odin_clip_perturb(encode, text, noise_magnitude=0.002)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    x2 = perturb(x)
    assert x2.shape == x.shape
    assert np.isfinite(np.asarray(x2)).all()
    assert not np.allclose(np.asarray(x2), np.asarray(x))
    # perturbation magnitude bounded by eps/std
    delta = np.abs(np.asarray(x2 - x))
    assert delta.max() <= 0.002 / 0.26 + 1e-6


def test_get_and_print_results_wrapper(rng, capsys):
    from types import SimpleNamespace

    from mcm_tpu.metrics.ood_metrics import get_and_print_results

    in_score = -rng.uniform(0.8, 1.0, 200)
    out_score = -rng.uniform(0.0, 0.5, 200)
    aurocs, auprs, fprs = [], [], []
    get_and_print_results(SimpleNamespace(score="MCM"), None, in_score,
                          out_score, aurocs, auprs, fprs)
    assert len(aurocs) == len(auprs) == len(fprs) == 1
    assert aurocs[0] > 0.99
    assert "AUROC" in capsys.readouterr().out


def test_orbax_roundtrip_sharded(tmp_path):
    """save_params_orbax on a TP-sharded pytree → restore → exact values
    (the multi-host trainer checkpoint path, loop._save_checkpoint)."""
    pytest.importorskip("orbax.checkpoint")
    from mcm_tpu.models.convert import load_params_orbax, save_params_orbax
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import make_mesh, shard_params

    params = init_clip(3, TINY)
    sharded = shard_params(params, make_mesh(8, model_parallel=2))
    path = str(tmp_path / "ckpt")
    save_params_orbax(sharded, path)
    restored = load_params_orbax(path)

    flat_in, tree_in = jax.tree_util.tree_flatten(params)
    flat_out, tree_out = jax.tree_util.tree_flatten(restored)
    assert tree_in == tree_out
    for a, b in zip(flat_in, flat_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_towers_accept_jax_keys_and_keep_int_streams():
    """init_vision/init_text honor the module contract ("jax PRNG keys
    are still accepted") directly — previously only init_clip shielded
    them via _seed_of — and the int-seed stream is byte-identical to the
    old default_rng(int) route (default_rng(n) == default_rng(SeedSequence(n)))."""
    from mcm_tpu.models.init import init_text, init_vision

    v = init_vision(jax.random.key(0), TINY.vision)
    t = init_text(jax.random.key(0), TINY.text)
    assert v["patch_embed"].shape == (8 * 8 * 3, 64)
    assert t["token_emb"].shape == (128, 48)

    v5 = init_vision(5, TINY.vision)
    want = np.random.default_rng(5).standard_normal(
        (8 * 8 * 3, 64), dtype=np.float32) * 64 ** -0.5
    np.testing.assert_array_equal(v5["patch_embed"], want)
