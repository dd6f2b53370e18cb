"""Extras: hard-OOD pair CLI, template ensembling, converter tool, meters,
captions, MSP baseline CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from util_synth import make_imagefolder_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args, cwd):
    # orchestration-level CLI checks: tiny structurally-identical doubles
    # (docs/TESTING.md); full-size math is pinned by the parity tests
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               MCM_TPU_TEST_TINY_B16="1", MCM_TPU_TEST_TINY_VIT="1")
    return subprocess.run([sys.executable, os.path.join(REPO, script)] + args,
                          cwd=cwd, env=env, capture_output=True, text=True,
                          timeout=900)


def test_imagenet10_vs_20_cli(tmp_path):
    """The hard-OOD pair: ImageNet10 ID ↔ ImageNet20 OOD, with the curated
    class-name ordering path (reference eval_ood_detection.py:63-66)."""
    from mcm_tpu.data.labels import subset_wnids
    root = tmp_path / "datasets"
    make_imagefolder_tree(str(root / "ImageNet10" / "val"),
                          subset_wnids("ImageNet10"), 2)
    make_imagefolder_tree(str(root / "ImageNet10" / "train"),
                          subset_wnids("ImageNet10"), 2)
    make_imagefolder_tree(str(root / "ImageNet20" / "val"),
                          subset_wnids("ImageNet20"), 2, color_bias=30)

    proc = _run("eval_ood_detection.py", [
        "--in_dataset", "ImageNet10", "--root-dir", str(root),
        "--score", "MCM", "--name", "hard", "-b", "8",
        "--allow_random_weights", "--num_workers", "2"], cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    csv = (tmp_path / "results" / "ImageNet10" / "MCM" /
           "CLIP_ViT-B/16_T_1_ID_hard" / "hard.csv")
    assert csv.exists()
    assert "ImageNet20" in csv.read_text()


def test_msp_baseline_cli(tmp_path):
    from util_synth import make_pet_tree
    root = tmp_path / "datasets"
    make_pet_tree(str(root), per_breed=4)
    make_imagefolder_tree(str(root / "ImageNet_OOD_dataset" / "dtd" /
                              "images"), ["banded"], 4, color_bias=40)
    proc = _run("eval_msp_baseline.py", [
        "--in_dataset", "pet37", "--root-dir", str(root),
        "--name", "mspsmoke", "-b", "4", "--out_datasets", "dtd",
        "--allow_random_weights", "--num_workers", "2"], cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    csv = (tmp_path / "results" / "pet37" / "MSP_MCM" /
           "vit_T_1.0_ID_mspsmoke" / "mspsmoke.csv")
    assert csv.exists()


def test_template_ensembling_changes_text_feats(rng):
    import jax
    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import EvalStep, make_mesh
    from mcm_tpu.runner import _HashTokenizer, _encode_prompts

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=512, context_length=32, width=64,
                        layers=2, heads=4, projection_dim=32))
    params = init_clip(jax.random.key(0), tiny)
    step = EvalStep(tiny, precision=Precision.parity(), mesh=make_mesh(1))
    params = step.put_params(params)
    tok = _HashTokenizer(512)
    single = np.asarray(_encode_prompts(step, params, tok, ["cat", "dog"],
                                        ensemble=False))
    ens = np.asarray(_encode_prompts(step, params, tok, ["cat", "dog"],
                                     ensemble=True))
    assert single.shape == ens.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(ens, axis=-1), 1.0, rtol=1e-5)
    assert not np.allclose(single, ens)


def test_convert_tool_roundtrip(tmp_path):
    """HF CLIP state dict → npz bundle via the LIBRARY path (tiny
    depth-patched model; the CLI tool itself is driven full-size by
    test_convert_tool_cli_full_size below)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    cfg = transformers.CLIPConfig(
        vision_config=dict(image_size=224, patch_size=16, hidden_size=768,
                           num_hidden_layers=2, num_attention_heads=12,
                           intermediate_size=3072, hidden_act="quick_gelu"),
        text_config=dict(vocab_size=49408, hidden_size=512,
                         num_hidden_layers=2, num_attention_heads=8,
                         intermediate_size=2048, hidden_act="quick_gelu"),
        projection_dim=512)
    # NOTE: converter requires full-depth towers; patch config depth
    from mcm_tpu.config import clip_vit_b16
    import dataclasses
    b16 = clip_vit_b16()
    b16 = dataclasses.replace(
        b16, vision=dataclasses.replace(b16.vision, layers=2),
        text=dataclasses.replace(b16.text, layers=2))

    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg)

    from mcm_tpu.models.convert import convert_hf_clip, load_params, \
        save_params
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_hf_clip(sd, b16)
    out = tmp_path / "bundle.npz"
    save_params(params, str(out))
    loaded = load_params(str(out))
    assert loaded["vision"]["layers"]["attn"]["wq"].shape == (2, 768, 768)
    assert loaded["text"]["token_emb"].shape == (49408, 512)


def test_meters_and_captions(tmp_path, rng):
    from mcm_tpu.utils.captions import TextDataset, prepare_dataframe
    from mcm_tpu.utils.meters import AverageMeter, accuracy

    out = rng.standard_normal((50, 10))
    target = out.argmax(1)
    top1, top5 = accuracy(out, target, topk=(1, 5))
    assert top1 == 100.0 and top5 == 100.0
    wrong = (target + 1) % 10
    assert accuracy(out, wrong, topk=(1,))[0] == 0.0

    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 2)
    assert m.avg == 2.5 and m.count == 4

    ds = TextDataset(["a", "b", "c"], [0, 1, 2])
    assert len(ds) == 3 and ds[1] == ("b", 1)
    assert ds.batches(2) == [(["a", "b"], [0, 1]), (["c"], [2])]

    cap_dir = tmp_path / "gen_captions"
    cap_dir.mkdir()
    (cap_dir / "xx_captions.tsv").write_text(
        "image_id\tcaption\tcls\n1\thello\t0\n1\tworld\t0\n2\tfoo\t1\n")
    df = prepare_dataframe(str(cap_dir), "xx")
    assert list(df.columns) == ["image_id", "caption", "cls"]
    assert len(df) == 3


def test_multihost_helpers_single_process():
    import jax
    from mcm_tpu.parallel import make_mesh
    from mcm_tpu.parallel.multihost import host_shard_range, make_global_batch

    lo, hi = host_shard_range(100)
    assert (lo, hi) == (0, 100)
    mesh = make_mesh(8)
    batch = np.zeros((16, 4, 4, 3), np.uint8)
    arr = make_global_batch(mesh, batch)
    assert arr.shape == (16, 4, 4, 3)


def test_imagenet100_cli(tmp_path):
    """ImageNet100 label path: class_list wnids → index names, '_'→' '."""
    from mcm_tpu.data.labels import subset_wnids
    root = tmp_path / "datasets"
    wnids = subset_wnids("ImageNet100")[:100]
    # tiny tree: only 6 of the 100 classes materialized is NOT valid for
    # the ordering contract — materialize all 100 with 1 image each
    make_imagefolder_tree(str(root / "ImageNet100" / "val"), wnids, 1)
    make_imagefolder_tree(str(root / "ImageNet_OOD_dataset" / "dtd" /
                              "images"), ["banded"], 4, color_bias=40)
    proc = _run("eval_ood_detection.py", [
        "--in_dataset", "ImageNet100", "--root-dir", str(root),
        "--score", "MCM", "--name", "in100", "-b", "16",
        "--out_datasets", "dtd", "--allow_random_weights",
        "--num_workers", "2"], cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    csv = (tmp_path / "results" / "ImageNet100" / "MCM" /
           "CLIP_ViT-B/16_T_1_ID_in100" / "in100.csv")
    assert csv.exists()


def test_imagenet_full_ood_suite_pairing(tmp_path):
    """ImageNet ID → all four default OOD sets (iNaturalist/SUN/places365/
    dtd), exercising the pairing rule and every OOD directory layout."""
    from util_synth import make_imagefolder_tree
    root = tmp_path / "datasets"
    # tiny "ImageNet" val tree with 3 wnids (labels need not cover 1000 —
    # prompts come from the packaged 1000-name list)
    make_imagefolder_tree(str(root / "ImageNet" / "val"),
                          ["n01440764", "n01443537", "n01484850"], 2)
    ood_root = root / "ImageNet_OOD_dataset"
    make_imagefolder_tree(str(ood_root / "iNaturalist"), ["x"], 3,
                          color_bias=20)
    make_imagefolder_tree(str(ood_root / "SUN"), ["y"], 3, color_bias=40)
    make_imagefolder_tree(str(ood_root / "Places"), ["z"], 3, color_bias=60)
    make_imagefolder_tree(str(ood_root / "dtd" / "images"), ["w"], 3,
                          color_bias=80)
    proc = _run("eval_ood_detection.py", [
        "--in_dataset", "ImageNet", "--root-dir", str(root),
        "--score", "energy", "--name", "full", "-b", "4",
        "--allow_random_weights", "--num_workers", "2"], cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    csv = (tmp_path / "results" / "ImageNet" / "energy" /
           "CLIP_ViT-B/16_T_1_ID_full" / "full.csv")
    text = csv.read_text()
    for name in ("iNaturalist", "SUN", "places365", "dtd", "AVG"):
        assert name in text


def test_convert_tool_cli_full_size(tmp_path):
    """Drive tools/convert_checkpoint.py — the DOCUMENTED conversion CLI
    (docs/API.md, docs/MIGRATION.md) — as a subprocess on a synthesized
    full-size B/16 HF snapshot (the in-process library calls above cover
    the math; this covers the argparse surface, format sniff, out-stem,
    and bundle write the library tests never touch — review finding,
    round 5)."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.hf_synth import synth_hf_clip_state_dict

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    sd = synth_hf_clip_state_dict(cfg, seed=11)
    snap = tmp_path / "snap"
    snap.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(snap / "model.safetensors"))
    out = tmp_path / "converted"

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
         "--model", "clip", "--ckpt", "ViT-B/16",
         "--src", str(snap), "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]

    from mcm_tpu.models.convert import resolve_clip_params
    params = resolve_clip_params("ViT-B/16", str(out))
    assert params is not None, os.listdir(out)
    assert params["vision"]["layers"]["attn"]["wq"].shape == (12, 768, 768)
    np.testing.assert_array_equal(
        np.asarray(params["text"]["token_emb"]),
        sd["text_model.embeddings.token_embedding.weight"])
