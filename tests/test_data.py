"""Data layer: folder walker, transforms, pipeline, fine-grained datasets,
class-name contract."""

import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from mcm_tpu.data import (Cub2011, DataPipeline, Food101, ImageFolder,
                          OxfordIIITPet, StanfordCars, collect_scores,
                          get_num_cls, get_test_labels, subset_per_class)
from mcm_tpu.data.labels import (imagenet1k_classes, imagenet10_classes,
                                 imagenet20_classes, imagenet100_classes)
from mcm_tpu.data.transforms import (center_crop, load_image_uint8,
                                     normalize_host, normalize_on_device,
                                     resize_shorter_side)
from util_synth import (make_cars_tree, make_cub_tree, make_food_tree,
                        make_imagefolder_tree, make_pet_tree)


# -- ImageFolder --------------------------------------------------------------

def test_imagefolder_sorted_assignment(tmp_path):
    root = make_imagefolder_tree(str(tmp_path), ["n02", "n01", "n03"], 2)
    ds = ImageFolder(root)
    assert ds.classes == ["n01", "n02", "n03"]  # wnid-sorted labels
    assert len(ds) == 6
    paths = [p for p, _ in ds.samples]
    assert paths == sorted(paths)
    assert ds.targets == [0, 0, 1, 1, 2, 2]


def test_imagefolder_missing_root(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageFolder(str(tmp_path / "nope"))


def test_subset_per_class(tmp_path):
    root = make_imagefolder_tree(str(tmp_path), ["a", "b"], 5)
    sub = subset_per_class(ImageFolder(root), max_count=2)
    assert len(sub) == 4
    labels = [sub[i][1] for i in range(len(sub))]
    assert labels == [0, 0, 1, 1]


# -- transforms ---------------------------------------------------------------

def test_resize_shorter_side_landscape():
    img = Image.new("RGB", (400, 200))
    out = resize_shorter_side(img, 224)
    assert out.size == (448, 224)


def test_resize_shorter_side_portrait():
    img = Image.new("RGB", (100, 300))
    out = resize_shorter_side(img, 224)
    assert out.size == (224, 672)


def test_resize_noop_when_exact():
    img = Image.new("RGB", (224, 500))
    assert resize_shorter_side(img, 224) is img


def test_center_crop_rounding():
    # torchvision offset = round((dim-size)/2): for 225→224 that's round(0.5)=0
    img = Image.fromarray(
        np.arange(225 * 225 * 3, dtype=np.uint8).reshape(225, 225, 3))
    out = np.asarray(center_crop(img, 224))
    ref = np.asarray(img)[0:224, 0:224]
    np.testing.assert_array_equal(out, ref)


def test_center_crop_pads_small_images():
    img = Image.new("RGB", (50, 60), (255, 0, 0))
    out = np.asarray(center_crop(img, 100))
    assert out.shape == (100, 100, 3)
    assert (out[:, :, 0] == 255).sum() == 50 * 60  # original pixels intact


def test_normalize_device_matches_host(rng):
    batch = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    dev = np.asarray(normalize_on_device(jnp.asarray(batch)))
    host = normalize_host(batch)
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)
    # spot-check against the naive (x/255 - mean)/std formula
    from mcm_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    naive = (batch / 255.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(host, naive, rtol=1e-5, atol=1e-5)


def test_load_image_uint8(tmp_path):
    path = str(tmp_path / "x.jpg")
    Image.fromarray(np.zeros((60, 90, 3), np.uint8)).save(path)
    out = load_image_uint8(path, 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


# -- pipeline -----------------------------------------------------------------

def test_pipeline_order_and_padding(tmp_path):
    root = make_imagefolder_tree(str(tmp_path), ["a", "b"], 4)  # 8 images
    ds = ImageFolder(root)
    pipe = DataPipeline(ds, batch_size=3, image_size=16, num_workers=2)
    batches = list(pipe)
    assert len(batches) == 3
    assert [b.valid for b in batches] == [3, 3, 2]
    labels = np.concatenate([b.labels[:b.valid] for b in batches])
    np.testing.assert_array_equal(labels, ds.targets)
    # padding rows replicate the last real row
    assert batches[-1].labels[2] == batches[-1].labels[1]
    assert batches[-1].images.shape == (3, 16, 16, 3)


def test_pipeline_decode_error_propagates(tmp_path):
    # pinned to the decode failure itself (OSError naming the file), not a
    # bare Exception any construction error would satisfy (review finding,
    # round 5: the producer thread must re-raise, not swallow)
    root = make_imagefolder_tree(str(tmp_path), ["a"], 2)
    ds = ImageFolder(root)
    ds.samples[1] = (str(tmp_path / "missing.jpg"), 0)
    with pytest.raises(OSError, match="missing"):
        list(DataPipeline(ds, batch_size=2, image_size=16, num_workers=2))


def test_collect_scores_truncates():
    s = [np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])]
    out = collect_scores(s, valids=[3, 2], total=5)
    np.testing.assert_array_equal(out, [1, 2, 3, 4, 5])


# -- fine-grained datasets ----------------------------------------------------

def test_cub(tmp_path):
    root = make_cub_tree(str(tmp_path), n_classes=3, per_class=4)
    train, test = Cub2011(root, train=True), Cub2011(root, train=False)
    assert len(train) == 6 and len(test) == 6
    assert train.class_names_str == ["Fake Bird 1", "Fake Bird 2",
                                     "Fake Bird 3"]
    assert set(train.targets) == {0, 1, 2}


def test_pet(tmp_path):
    root = make_pet_tree(str(tmp_path))
    ds = OxfordIIITPet(root, split="test")
    assert ds.class_names_str == ["Abyssinian", "English Setter"]
    assert all(os.path.exists(p) for p, _ in ds.samples)


def test_food(tmp_path):
    root = make_food_tree(str(tmp_path))
    ds = Food101(root, split="train")
    assert ds.class_names_str == ["Apple pie", "Baby back ribs"]
    assert len(ds) == 6


def test_cars(tmp_path):
    root = make_cars_tree(str(tmp_path), n_classes=3, per_class=2)
    ds = StanfordCars(root, split="test")
    assert ds.class_names_str == ["Fake Car Model 1", "Fake Car Model 2",
                                  "Fake Car Model 3"]
    assert len(ds) == 6
    assert ds.targets == [0, 0, 1, 1, 2, 2]


def test_dataset_missing_raises(tmp_path):
    for cls, kwargs in [(Food101, dict(split="test")),
                        (OxfordIIITPet, dict(split="test")),
                        (StanfordCars, dict(split="train")),
                        (Cub2011, dict(train=True))]:
        with pytest.raises(FileNotFoundError):
            cls(str(tmp_path / "none"), **kwargs)


# -- labels -------------------------------------------------------------------

def test_imagenet_class_counts():
    assert len(imagenet1k_classes()) == 1000
    assert len(imagenet10_classes()) == 10
    assert len(imagenet20_classes()) == 20
    assert len(imagenet100_classes()) == 100


def test_imagenet1k_spot_values():
    names = imagenet1k_classes()
    assert names[0] == "tench"
    assert names[1] == "goldfish"


def test_imagenet10_wnid_order():
    # label order = wnid-sorted (matches ImageFolder index assignment)
    assert imagenet10_classes()[0] == "brambling bird"   # n01530575
    assert imagenet10_classes()[-1] == "warplane"        # n04552348


def test_imagenet20_wnid_order():
    assert imagenet20_classes()[0] == "common newt"      # n01630670
    assert imagenet20_classes()[-1] == "tank"            # n04389033


def test_get_num_cls():
    assert get_num_cls("ImageNet") == 1000
    assert get_num_cls("pet37") == 37
    with pytest.raises(KeyError):
        get_num_cls("bogus")


def test_get_test_labels_fine_grained(tmp_path):
    root = make_pet_tree(str(tmp_path))
    ds = OxfordIIITPet(root, split="test")
    assert get_test_labels("pet37", ds) == ds.class_names_str
    with pytest.raises(ValueError):
        get_test_labels("pet37", None)


def test_against_reference_label_functions():
    """When the reference tree is mounted, our class lists must equal its
    obtain_ImageNet*_classes outputs exactly."""
    import importlib.util
    import sys
    path = "/root/reference/utils/common.py"
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_common", path)
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_common"] = ref
    spec.loader.exec_module(ref)

    assert list(ref.obtain_ImageNet10_classes()) == imagenet10_classes()
    assert list(ref.obtain_ImageNet20_classes()) == imagenet20_classes()
    cwd = os.getcwd()
    os.chdir("/root/reference")  # its loaders use relative data/ paths
    try:
        assert [str(x) for x in ref.obtain_ImageNet_classes()] == \
            imagenet1k_classes()
        assert ref.obtain_ImageNet100_classes() == imagenet100_classes()
    finally:
        os.chdir(cwd)


def test_imagenet100_prompt_permutation():
    from mcm_tpu.data.labels import prompt_permutation, subset_wnids
    perm = prompt_permutation("ImageNet100")
    assert perm is not None and perm.shape == (100,)
    file_order = subset_wnids("imagenet100")
    wnids_sorted = sorted(file_order)
    # label i (sorted order) must point at the prompt row of the same wnid
    for label in (0, 13, 99):
        assert file_order[perm[label]] == wnids_sorted[label]
    assert prompt_permutation("ImageNet") is None


def test_food101_reference_name_swap(tmp_path):
    """Reference quirk kept: its hardcoded name list (food101.py:48) has
    'Cheesecake' at label 16 and 'Cheese plate' at 17, although its own
    labels come from sorted keys where 'cheese_plate' sorts first — the
    prompt SET is identical so OOD scores are unaffected, but
    label-indexed diagnostics must match the reference's pairing."""
    import json as _json
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    (base / "images").mkdir()
    classes = ["apple_pie", "cheese_plate", "cheesecake", "waffles"]
    meta = {c: [f"{c}/0001"] for c in classes}
    for c in classes:
        d = base / "images" / c
        d.mkdir()
        from PIL import Image
        import numpy as _np
        Image.fromarray(_np.zeros((8, 8, 3), _np.uint8)).save(
            d / "0001.jpg")
    with open(base / "meta" / "train.json", "w") as f:
        _json.dump(meta, f)
    ds = Food101(str(tmp_path), split="train")
    # sorted keys: apple_pie(0) cheese_plate(1) cheesecake(2) waffles(3)
    assert ds.classes == classes
    assert ds.class_names_str == ["Apple pie", "Cheesecake", "Cheese plate",
                                  "Waffles"]


def test_imagefolder_empty_class_raises(tmp_path):
    """torchvision raises for class dirs with no valid images; keeping
    them would let a stray dir shift every label vs the prompt lists."""
    root = tmp_path / "tree"
    (root / ".ipynb_checkpoints").mkdir(parents=True)
    (root / "n00000001").mkdir()
    from PIL import Image
    import numpy as _np
    Image.fromarray(_np.zeros((8, 8, 3), _np.uint8)).save(
        root / "n00000001" / "x.jpg")
    with pytest.raises(FileNotFoundError, match="no valid images"):
        ImageFolder(str(root))


def test_subset_tree_class_count_validated(tmp_path):
    """An ImageNet10 tree with an 11th populated class dir must be
    refused (labels would misalign with the 10 prompt rows), while the
    correct count passes even with placeholder wnids (synthetic smoke
    trees)."""
    from util_synth import make_imagefolder_tree

    from mcm_tpu.data.labels import get_test_labels

    root = tmp_path / "ImageNet10" / "val"
    make_imagefolder_tree(str(root), [f"n{i:08d}" for i in range(10)], 1)
    ds = ImageFolder(str(root))
    assert len(get_test_labels("ImageNet10", ds)) == 10

    make_imagefolder_tree(str(root), ["n99999999"], 1)
    with pytest.raises(ValueError, match="11 class dirs"):
        get_test_labels("ImageNet10", ImageFolder(str(root)))


def test_tar_member_traversal_refused(tmp_path):
    """The pre-3.10.12 fallback path must refuse members escaping the
    extraction root (and links outright)."""
    import io
    import tarfile as _tarfile

    from mcm_tpu.data.datasets import _check_tar_members

    buf = io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w") as tar:
        info = _tarfile.TarInfo("../escape.txt")
        info.size = 1
        tar.addfile(info, io.BytesIO(b"x"))
    buf.seek(0)
    with _tarfile.open(fileobj=buf) as tar:
        with pytest.raises(RuntimeError, match="escapes"):
            _check_tar_members(tar, str(tmp_path))

    buf = io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w") as tar:
        info = _tarfile.TarInfo("link")
        info.type = _tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tar.addfile(info)
    buf.seek(0)
    with _tarfile.open(fileobj=buf) as tar:
        with pytest.raises(RuntimeError, match="link"):
            _check_tar_members(tar, str(tmp_path))


def test_pipeline_stripe_resolved_lazily(tmp_path, monkeypatch):
    """Stripe auto-detection happens at FIRST USE, not at construction:
    a pipeline built before jax is (fully) initialized in a multi-process
    program must still decode only its stripe — binding (0, batch_size)
    at construction silently decoded the full batch on every host
    (review finding, round 5)."""
    import jax

    root = make_imagefolder_tree(str(tmp_path), ["a", "b"], 4)  # 8 images
    pipe = DataPipeline(ImageFolder(root), batch_size=8, image_size=16,
                        num_workers=1)
    assert pipe._stripe is None  # nothing resolved at construction
    # the world changes to 2 processes before the first decode
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert pipe.stripe == (4, 8)
    assert pipe.local_batch_size == 4
    batch = next(iter(pipe))
    assert batch.images.shape[0] == 4   # decodes only its stripe
    assert batch.valid == 8             # global accounting unchanged


def test_validate_out_datasets_rejects_typos():
    """--out_datasets typos fail in milliseconds, before the ID pass."""
    from mcm_tpu.data import validate_out_datasets

    validate_out_datasets(["dtd", "SUN", "iNaturalist"])
    with pytest.raises(ValueError, match="Sun"):
        validate_out_datasets(["iNaturalist", "Sun", "dtd"])
