"""tools/parity_check.py end-to-end on a tiny random HF model: record
goldens with torch, check with our converted params — must PASS."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_probe(seed=0, batch=4, n_prompts=6, image_size=32, context=12,
                vocab_size=128):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_check
    return parity_check.probe_inputs(seed, batch, n_prompts, image_size,
                                     context, vocab_size)


def test_record_then_check_roundtrip(tmp_path):
    # tiny HF CLIP standing in for a real snapshot
    cfg = transformers.CLIPConfig(
        vision_config=dict(image_size=32, patch_size=8, hidden_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=256, hidden_act="quick_gelu"),
        text_config=dict(vocab_size=128, max_position_embeddings=16,
                         hidden_size=48, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=192,
                         hidden_act="quick_gelu",
                         bos_token_id=126, eos_token_id=127),
        projection_dim=32)
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)
    model.eval()

    pixels, ids, mask = _tiny_probe()
    with torch.no_grad():
        img = model.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()
        txt = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = imgn @ txtn.T
    e = np.exp(logits - logits.max(1, keepdims=True))
    mcm = -(e / e.sum(1, keepdims=True)).max(1)
    goldens = tmp_path / "goldens.npz"
    np.savez(goldens, image_features=img, text_features=txt, mcm=mcm,
             ckpt="tiny")

    # our side
    import jax.numpy as jnp
    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.models import clip as jclip
    from mcm_tpu.models.convert import convert_hf_clip
    from mcm_tpu.scores import compute_scores, l2_normalize

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=48,
                        layers=2, heads=4, projection_dim=32))
    params = convert_hf_clip(
        {k: v.numpy() for k, v in model.state_dict().items()}, tiny)

    ours_img = np.asarray(jclip.encode_image(
        params, tiny.vision, jnp.asarray(pixels), Precision.parity()))
    ours_txt = np.asarray(jclip.encode_text(
        params, tiny.text, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), Precision.parity()))
    ours_mcm = np.asarray(compute_scores(
        jnp.asarray(ours_img), l2_normalize(jnp.asarray(ours_txt)),
        score="MCM"))

    gold = np.load(goldens)
    np.testing.assert_allclose(ours_img, gold["image_features"], rtol=5e-4,
                               atol=5e-5)
    np.testing.assert_allclose(ours_txt, gold["text_features"], rtol=5e-4,
                               atol=5e-5)
    np.testing.assert_allclose(ours_mcm, gold["mcm"], rtol=1e-4, atol=1e-5)


def test_full_report_one_command(tmp_path):
    """The real-weights parity rehearsal (VERDICT r2 item 4), proven
    end-to-end on the synthesized full-size B/16 checkpoint: lay out the
    exact artifacts a user with real weights would have (an HF snapshot
    dir + image trees), run the ONE command, get a PASSing
    PARITY_REPORT.md."""
    from util_synth import make_clip_vocab, make_imagefolder_tree

    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.hf_synth import (build_hf_clip,
                                         synth_hf_clip_state_dict)

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    model = build_hf_clip(cfg, synth_hf_clip_state_dict(cfg, seed=7))
    ckpt_dir = tmp_path / "checkpoints"
    snap = ckpt_dir / "clip-vit-base-patch16"
    model.save_pretrained(str(snap), safe_serialization=True)
    make_clip_vocab(str(snap), vocab_size=cfg.text.vocab_size)
    del model

    data_root = tmp_path / "trees"
    make_imagefolder_tree(str(data_root / "dtd"), ["banded", "blotchy"], 3,
                          color_bias=40)
    id_tree = str(data_root / "id")
    make_imagefolder_tree(id_tree, ["cat", "dog"], 3)

    out = tmp_path / "PARITY_REPORT.md"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "full-report", "--ckpt", "ViT-B/16", "--ckpt-dir", str(ckpt_dir),
         "--id-tree", id_tree, "--ood-tree", str(data_root / "dtd"),
         "--max-images", "6", "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=1500)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]
    report = out.read_text()
    assert "**OVERALL: PASS**" in report
    assert "## Tokenizer" in report and "0 mismatches" in report
    assert "## Per-layer activations" in report
    assert "## Metrics" in report and "north star" in report
