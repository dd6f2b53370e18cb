"""Epoch-level training loop: shuffling, static-shape batches, checkpoint
save — and the checkpoint's consumption by --model CLIP-Linear."""

import os
import subprocess
import sys

import numpy as np

from util_synth import make_imagefolder_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_cfg():
    from mcm_tpu.config import CLIPConfig, TextConfig, VisionConfig
    return CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=512, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))


def test_train_clip_epochs_and_checkpoint(tmp_path):
    from mcm_tpu.data.folder import ImageFolder
    from mcm_tpu.models.convert import load_params
    from mcm_tpu.parallel import make_mesh
    from mcm_tpu.runner import _HashTokenizer
    from mcm_tpu.train import train_clip

    make_imagefolder_tree(str(tmp_path / "tree"), ["cat", "dog", "owl"], 6)
    ds = ImageFolder(str(tmp_path / "tree"))  # 18 images
    ckpt = tmp_path / "ft.npz"
    logs = []
    state = train_clip(_tiny_cfg(), ds, ["cat", "dog", "owl"],
                       _HashTokenizer(512), epochs=2, batch_size=8, seed=0,
                       mesh=make_mesh(4, model_parallel=2), image_size=32,
                       num_workers=1, ckpt_path=str(ckpt), log=logs.append)
    assert int(state.step) == 4  # 2 epochs x floor(18/8) steps
    assert any("epoch 2/2" in l for l in logs)
    loaded = load_params(str(ckpt))
    assert loaded["vision"]["layers"]["attn"]["wq"].shape == (2, 64, 64)
    assert np.isfinite(loaded["logit_scale"])


def test_shuffled_view_reorders_per_epoch():
    from mcm_tpu.train import ShuffledView

    ds = [(f"p{i}", i) for i in range(10)]
    rng = np.random.default_rng(0)
    v1 = ShuffledView(ds, rng.permutation(10))
    v2 = ShuffledView(ds, rng.permutation(10))
    order1 = [v1[i][1] for i in range(10)]
    order2 = [v2[i][1] for i in range(10)]
    assert sorted(order1) == sorted(order2) == list(range(10))
    assert order1 != order2  # reshuffled between epochs


def test_finetune_cli_then_clip_linear_eval(tmp_path):
    """tools/finetune_clip.py → eval_ood_detection.py --model CLIP-Linear
    consumes the produced checkpoint (full-size B/16, 1 epoch, tiny data)."""
    from util_synth import make_pet_tree
    root = tmp_path / "datasets"
    make_pet_tree(str(root), per_breed=4)
    make_imagefolder_tree(str(root / "ImageNet_OOD_dataset" / "dtd" /
                              "images"), ["banded"], 4, color_bias=40)
    # orchestration check (train→checkpoint→CLIP-Linear eval loop): the
    # tiny structurally-identical B/16 double keeps two full subprocess
    # model builds off the 1-core critical path (docs/TESTING.md)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               MCM_TPU_TEST_TINY_B16="1")
    out = tmp_path / "ft_pet.npz"
    # B/32 keeps the full-size-CLI path while staying ~4x cheaper on CPU
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "finetune_clip.py"),
         "--in_dataset", "pet37", "--root-dir", str(root), "--epochs", "1",
         "-b", "4", "--CLIP_ckpt", "ViT-B/32", "--allow_random_weights",
         "--num_workers", "2", "--out", str(out)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert out.exists()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_ood_detection.py"),
         "--in_dataset", "pet37", "--root-dir", str(root),
         "--model", "CLIP-Linear", "--finetune_ckpt", str(out),
         "--CLIP_ckpt", "ViT-B/32",
         "--score", "MCM", "--name", "ftev", "-b", "8",
         "--out_datasets", "dtd", "--allow_random_weights",
         "--num_workers", "2"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (tmp_path / "results" / "pet37" / "MCM" /
            "CLIP-Linear_ViT-B/32_T_1_ID_ftev" / "ftev.csv").exists()
