"""Synthetic dataset trees for integration tests (no real data needed).

Generates tiny JPEG ImageFolder trees and the metadata layouts of the
fine-grained datasets so the full CLI → CSV path runs hermetically
(SURVEY.md §4 test strategy)."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np
from PIL import Image


def _write_jpeg(path: str, rng: np.random.Generator, size=(40, 32),
                color_bias: int = 0) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = rng.integers(0, 200, size=(size[1], size[0], 3), dtype=np.uint8)
    arr = np.clip(arr.astype(np.int32) + color_bias, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=90)


def make_imagefolder_tree(root: str, classes: Sequence[str], per_class: int = 3,
                          seed: int = 0, color_bias: int = 0) -> str:
    rng = np.random.default_rng(seed)
    for cls in classes:
        for i in range(per_class):
            _write_jpeg(os.path.join(root, cls, f"img_{i:03d}.jpg"), rng,
                        color_bias=color_bias)
    return root


def make_cub_tree(root: str, n_classes: int = 3, per_class: int = 4,
                  seed: int = 0) -> str:
    """CUB_200_2011 metadata layout (images.txt etc.)."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "CUB_200_2011")
    os.makedirs(base, exist_ok=True)
    images, labels, split, classes = [], [], [], []
    img_id = 1
    for c in range(1, n_classes + 1):
        cname = f"{c:03d}.Fake_Bird_{c}"
        classes.append(f"{c} {cname}")
        for i in range(per_class):
            rel = f"{cname}/img_{i}.jpg"
            _write_jpeg(os.path.join(base, "images", rel), rng)
            images.append(f"{img_id} {rel}")
            labels.append(f"{img_id} {c}")
            split.append(f"{img_id} {1 if i < per_class // 2 else 0}")
            img_id += 1
    for name, rows in [("images.txt", images),
                       ("image_class_labels.txt", labels),
                       ("train_test_split.txt", split),
                       ("classes.txt", classes)]:
        with open(os.path.join(base, name), "w") as f:
            f.write("\n".join(rows) + "\n")
    return root


def make_pet_tree(root: str, breeds=("Abyssinian", "english_setter"),
                  per_breed: int = 4, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "oxford-iiit-pet")
    os.makedirs(os.path.join(base, "annotations"), exist_ok=True)
    trainval, test = [], []
    for label, breed in enumerate(breeds, start=1):
        for i in range(1, per_breed + 1):
            image_id = f"{breed}_{i}"
            _write_jpeg(os.path.join(base, "images", f"{image_id}.jpg"), rng)
            row = f"{image_id} {label} 1 1"
            (trainval if i <= per_breed // 2 else test).append(row)
    for name, rows in [("trainval.txt", trainval), ("test.txt", test)]:
        with open(os.path.join(base, "annotations", name), "w") as f:
            f.write("\n".join(rows) + "\n")
    return root


def make_food_tree(root: str, classes=("apple_pie", "baby_back_ribs"),
                   per_class: int = 3, seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "food-101")
    os.makedirs(os.path.join(base, "meta"), exist_ok=True)
    meta: Dict[str, Dict[str, List[str]]] = {"train": {}, "test": {}}
    for cls in classes:
        rels = [f"{cls}/{i:06d}" for i in range(per_class * 2)]
        for rel in rels:
            _write_jpeg(os.path.join(base, "images", rel + ".jpg"), rng)
        meta["train"][cls] = rels[:per_class]
        meta["test"][cls] = rels[per_class:]
    for split in ("train", "test"):
        with open(os.path.join(base, "meta", f"{split}.json"), "w") as f:
            json.dump(meta[split], f)
    return root


def make_cars_tree(root: str, n_classes: int = 3, per_class: int = 2,
                   seed: int = 0) -> str:
    import scipy.io as sio
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "stanford_cars")
    devkit = os.path.join(base, "devkit")
    os.makedirs(devkit, exist_ok=True)
    class_names = np.array([f"Fake Car Model {c}" for c in range(1, n_classes + 1)],
                           dtype=object)
    sio.savemat(os.path.join(devkit, "cars_meta.mat"),
                {"class_names": class_names})
    for split, ann_path in [
            ("train", os.path.join(devkit, "cars_train_annos.mat")),
            ("test", os.path.join(base, "cars_test_annos_withlabels.mat"))]:
        img_dir = os.path.join(base, f"cars_{split}")
        rows = []
        k = 1
        for c in range(1, n_classes + 1):
            for _ in range(per_class):
                fname = f"{k:05d}.jpg"
                _write_jpeg(os.path.join(img_dir, fname), rng)
                rows.append((0, 0, 10, 10, c, fname))
                k += 1
        dt = [("bbox_x1", "O"), ("bbox_y1", "O"), ("bbox_x2", "O"),
              ("bbox_y2", "O"), ("class", "O"), ("fname", "O")]
        ann = np.array([tuple(np.array(v) for v in row) for row in rows],
                       dtype=dt)
        sio.savemat(ann_path, {"annotations": ann})
    return root


def make_flowers_tree(root: str, n_classes: int = 4, per_class: int = 3,
                      seed: int = 0) -> str:
    """Oxford Flowers-102 layout: ``flowers-102/jpg/image_XXXXX.jpg`` +
    ``imagelabels.mat``/``setid.mat``.  Each class contributes one train,
    one val, and ``per_class - 2`` test images (ids round-robin classes)."""
    import scipy.io as sio

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "flowers-102")
    n = n_classes * per_class
    labels = np.array([(i % n_classes) + 1 for i in range(n)])  # 1-based
    for i in range(1, n + 1):
        _write_jpeg(os.path.join(base, "jpg", f"image_{i:05d}.jpg"), rng,
                    color_bias=10 * labels[i - 1])
    ids = np.arange(1, n + 1)
    trn = ids[:n_classes]                      # first image of each class
    val = ids[n_classes:2 * n_classes]
    tst = ids[2 * n_classes:]
    sio.savemat(os.path.join(base, "imagelabels.mat"),
                {"labels": labels.reshape(1, -1)})
    sio.savemat(os.path.join(base, "setid.mat"),
                {"trnid": trn.reshape(1, -1), "valid": val.reshape(1, -1),
                 "tstid": tst.reshape(1, -1)})
    return root


def make_clip_vocab(out_dir: str, vocab_size: int = 49408) -> str:
    """A full-size, structurally-real CLIP BPE vocab (HF ``vocab.json`` +
    ``merges.txt``): the complete byte alphabet, ``</w>`` variants, a
    handful of real merges, filler entries up to ``vocab_size - 2``, and
    ``<|startoftext|>``/``<|endoftext|>`` as the two largest ids (OpenAI
    convention).  Lets both HF ``CLIPTokenizer.from_pretrained`` and our
    tokenizer run offline against a 49408-entry id space that matches the
    production text-tower embedding."""
    from mcm_tpu.text.tokenizer import BOS_TOKEN, EOS_TOKEN, bytes_to_unicode

    os.makedirs(out_dir, exist_ok=True)
    alphabet = list(bytes_to_unicode().values())
    tokens = alphabet + [c + "</w>" for c in alphabet]
    merges = [
        ("c", "a"), ("ca", "t</w>"), ("p", "h"), ("ph", "o"),
        ("pho", "t"), ("phot", "o</w>"), ("o", "f</w>"), ("a", "t</w>"),
        ("t", "h"), ("th", "e</w>"), ("i", "n"), ("e", "r"),
    ]
    tokens += ["".join(m) for m in merges]
    # unreachable filler (BPE can only emit byte-derived tokens) pads the id
    # space to the production embedding size
    tokens += [f"<fill{i}>" for i in range(vocab_size - 2 - len(tokens))]
    tokens += [BOS_TOKEN, EOS_TOKEN]
    assert len(tokens) == vocab_size
    vocab = {t: i for i, t in enumerate(tokens)}
    with open(os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n" +
                "\n".join(" ".join(m) for m in merges) + "\n")
    return out_dir
