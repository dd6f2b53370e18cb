"""Flowers-102 — the dataset the reference README promises
(``/root/reference/README.md:104``) but never implements.  Layout parsing,
split membership, the class_names_str contract, loader/label dispatch, and
the full CLI path on a synthetic tree."""

import os
import subprocess
import sys

import numpy as np
import pytest

from util_synth import make_flowers_tree, make_imagefolder_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def root(tmp_path):
    return make_flowers_tree(str(tmp_path), n_classes=4, per_class=4)


def test_splits_and_labels(root):
    from mcm_tpu.data import Flowers102
    train = Flowers102(root, split="train")
    val = Flowers102(root, split="val")
    test = Flowers102(root, split="test")
    assert len(train) == 4 and len(val) == 4 and len(test) == 8
    # ids round-robin classes: the train split holds ids 1..4 → one image
    # per class, labels 0..3 (0-based here, 1-based in the .mat)
    assert sorted(train.targets) == [0, 1, 2, 3]
    for path, _ in train.samples:
        assert os.path.exists(path), path
    # no overlap between splits
    all_paths = [p for ds in (train, val, test) for p, _ in ds.samples]
    assert len(set(all_paths)) == len(all_paths) == 16


def test_class_names_contract(root):
    from mcm_tpu.data import Flowers102
    ds = Flowers102(root, split="test")
    assert len(ds.class_names_str) == 102
    assert ds.class_names_str[0] == "pink primrose"
    assert ds.class_names_str[101] == "blackberry lily"


def test_loader_and_label_dispatch(root):
    from mcm_tpu.data import get_num_cls, set_train_loader, set_val_loader
    from mcm_tpu.data.labels import get_test_labels

    assert get_num_cls("flower102") == 102
    val = set_val_loader("flower102", root)
    assert len(val) == 8
    train = set_train_loader("flower102", root)
    assert len(train) == 4
    names = get_test_labels("flower102", val)
    assert len(names) == 102 and names[53] == "sunflower"


def test_missing_tree_raises(tmp_path):
    from mcm_tpu.data import Flowers102
    with pytest.raises(FileNotFoundError, match="setid"):
        Flowers102(str(tmp_path), split="test")


def test_cli_flower102_end_to_end(root, tmp_path):
    make_imagefolder_tree(os.path.join(root, "ImageNet_OOD_dataset", "dtd",
                                       "images"), ["banded"], 4,
                          color_bias=40)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               MCM_TPU_TEST_TINY_B16="1", MCM_TPU_TEST_TINY_VIT="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_ood_detection.py"),
         "--in_dataset", "flower102", "--root-dir", root,
         "--score", "MCM", "--name", "flsmoke", "-b", "4",
         "--out_datasets", "dtd", "--allow_random_weights",
         "--num_workers", "2"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_dir = (tmp_path / "results" / "flower102" / "MCM" /
               "CLIP_ViT-B/16_T_1_ID_flsmoke")
    csv = log_dir / "flsmoke.csv"
    assert csv.exists(), proc.stderr[-2000:]
    scores = np.load(log_dir / "ID_flower102_scores.npy")
    assert scores.shape == (8,) and np.isfinite(scores).all()


def test_msp_baseline_cli_accepts_flower102(root, tmp_path):
    """The MSP-baseline CLI's --in_dataset choices must track the main
    CLI's (a round-2 review found flower102 missing there)."""
    make_imagefolder_tree(os.path.join(root, "ImageNet_OOD_dataset", "dtd",
                                       "images"), ["banded"], 4,
                          color_bias=40)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               MCM_TPU_TEST_TINY_B16="1", MCM_TPU_TEST_TINY_VIT="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_msp_baseline.py"),
         "--in_dataset", "flower102", "--root-dir", root,
         "--name", "flmsp", "-b", "4", "--out_datasets", "dtd",
         "--allow_random_weights", "--num_workers", "2"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    csv = (tmp_path / "results" / "flower102" / "MSP_MCM" /
           "vit_T_1.0_ID_flmsp" / "flmsp.csv")
    assert csv.exists(), proc.stderr[-2000:]
