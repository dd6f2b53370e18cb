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


def test_resume_matches_uninterrupted(tmp_path):
    """2 epochs + resume-to-3 must equal 3 straight epochs exactly: the
    full-state checkpoint restores AdamW moments and the step counter,
    and completed epochs' shuffle permutations are replayed so the batch
    order is identical."""
    import jax
    import numpy as np

    from mcm_tpu.data.folder import ImageFolder
    from mcm_tpu.parallel import make_mesh
    from mcm_tpu.runner import _HashTokenizer
    from mcm_tpu.train import train_clip

    make_imagefolder_tree(str(tmp_path / "tree"), ["cat", "dog", "owl"], 6)
    ds = ImageFolder(str(tmp_path / "tree"))
    kw = dict(dataset=ds, class_names=["cat", "dog", "owl"],
              tokenizer=_HashTokenizer(512), batch_size=8, seed=0,
              mesh=make_mesh(1), image_size=32, num_workers=1,
              log=lambda s: None)

    a = train_clip(_tiny_cfg(), epochs=3,
                   ckpt_path=str(tmp_path / "a.npz"), **kw)

    ckpt_b = str(tmp_path / "b.npz")
    train_clip(_tiny_cfg(), epochs=2, ckpt_path=ckpt_b, **kw)
    assert os.path.exists(ckpt_b + ".train_state.npz")
    logs = []
    kw_resume = dict(kw, log=logs.append)
    b = train_clip(_tiny_cfg(), epochs=3, ckpt_path=ckpt_b, resume=True,
                   **kw_resume)
    assert any("resumed" in l for l in logs)
    assert any("epoch 3/3" in l for l in logs)
    assert not any("epoch 1/3" in l or "epoch 2/3" in l for l in logs)

    assert int(np.asarray(a.step)) == int(np.asarray(b.step)) == 6
    for la, lb in zip(jax.tree_util.tree_leaves(a.params),
                      jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_train_state_refuses_mismatched_structure(tmp_path):
    """A checkpoint from a different optimizer/model must fail loudly."""
    import optax
    import pytest

    from mcm_tpu.models.init import init_clip
    from mcm_tpu.train import load_train_state, make_train_step
    from mcm_tpu.train.checkpoint import save_train_state

    cfg = _tiny_cfg()
    init_state, _ = make_train_step(cfg)
    state = init_state(init_clip(0, cfg))
    path = str(tmp_path / "s.npz")
    save_train_state(state, path, epoch=1)

    # same model, different optimizer → different opt_state structure
    init_sgd, _ = make_train_step(cfg, optimizer=optax.sgd(1e-3))
    other = init_sgd(init_clip(0, cfg))
    with pytest.raises(ValueError, match="different train-state structure"):
        load_train_state(path, other)

    # happy path restores equal leaves
    restored, epoch = load_train_state(path, state)
    assert epoch == 1
    import jax
    import numpy as np
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
