"""tools/scale_soak.py tree builder: resizing the soak tree must not leave
stale JPEGs behind (the soak's image count is its evidence — a leftover
larger tree would silently inflate it), while cached same-size trees and
the separately-markered train split are reused."""

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale_soak import OOD_SETS, build_tree  # noqa: E402


def _counts(root):
    n_id = len(glob.glob(os.path.join(root, "ImageNet", "val", "*", "*.jpg")))
    n_ood = len(glob.glob(os.path.join(root, "ImageNet_OOD_dataset", "**",
                                       "*.jpg"), recursive=True))
    n_train = len(glob.glob(os.path.join(root, "ImageNet", "train", "*",
                                         "*.jpg")))
    return n_id, n_ood, n_train


def test_resize_rebuilds_without_leftovers(tmp_path):
    root = str(tmp_path / "soak")
    build_tree(root, id_images=80, ood_images=16)
    assert _counts(root) == (80, 16 * len(OOD_SETS), 0)

    # same size again: cached (marker present), mtimes untouched
    probe = glob.glob(os.path.join(root, "ImageNet", "val", "*", "*.jpg"))[0]
    mtime = os.path.getmtime(probe)
    build_tree(root, id_images=80, ood_images=16)
    assert os.path.getmtime(probe) == mtime

    # smaller rebuild: old extra JPEGs must be gone, not shadowed
    build_tree(root, id_images=40, ood_images=8)
    assert _counts(root) == (40, 8 * len(OOD_SETS), 0)


def test_resize_preserves_train_split(tmp_path):
    root = str(tmp_path / "soak")
    build_tree(root, id_images=40, ood_images=8, train_images=1000)
    n_id, n_ood, n_train = _counts(root)
    assert n_train == 1000

    probe = glob.glob(os.path.join(root, "ImageNet", "train", "*",
                                   "*.jpg"))[0]
    mtime = os.path.getmtime(probe)
    build_tree(root, id_images=80, ood_images=8, train_images=1000)
    assert _counts(root) == (80, 8 * len(OOD_SETS), 1000)
    assert os.path.getmtime(probe) == mtime  # train cache reused


def test_alternating_datasets_reuse_each_others_trees(tmp_path):
    """Markers are scoped per dataset (and the shared OOD tree by its own
    size): soaking ImageNet, then ImageNet100, then ImageNet again must
    reuse ImageNet's val tree and the OOD tree, not rebuild them from
    scratch (review finding, round 5: one unscoped marker prefix meant
    every dataset switch forced a full rebuild on the 1-core host)."""
    root = str(tmp_path / "soak")
    build_tree(root, id_images=80, ood_images=16)
    probe_id = glob.glob(os.path.join(root, "ImageNet", "val", "*",
                                      "*.jpg"))[0]
    probe_ood = glob.glob(os.path.join(root, "ImageNet_OOD_dataset", "**",
                                       "*.jpg"), recursive=True)[0]
    m_id, m_ood = os.path.getmtime(probe_id), os.path.getmtime(probe_ood)

    build_tree(root, id_images=100, ood_images=16, in_dataset="ImageNet100")
    n100 = len(glob.glob(os.path.join(root, "ImageNet100", "val", "*",
                                      "*.jpg")))
    assert n100 == 100
    assert os.path.getmtime(probe_id) == m_id    # ImageNet val untouched
    assert os.path.getmtime(probe_ood) == m_ood  # shared OOD reused

    build_tree(root, id_images=80, ood_images=16)  # back to ImageNet
    assert os.path.getmtime(probe_id) == m_id      # fully cached
    assert _counts(root) == (80, 16 * len(OOD_SETS), 0)


def test_resize_train_split_rebuilds(tmp_path):
    """Shrinking train_images must rebuild the train split too — leftover
    JPEGs would silently inflate the Mahalanobis template estimation the
    train split exists to feed."""
    root = str(tmp_path / "soak")
    build_tree(root, id_images=40, ood_images=8, train_images=2000)
    assert _counts(root)[2] == 2000
    build_tree(root, id_images=40, ood_images=8, train_images=1000)
    assert _counts(root) == (40, 8 * len(OOD_SETS), 1000)
