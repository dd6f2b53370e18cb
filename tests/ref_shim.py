"""Run the REFERENCE's own pipeline code on this torchvision-less box.

The cross-implementation golden (tests/test_crossimpl_e2e.py) executes the
reference's actual scoring/metric/reporting functions
(``/root/reference/utils/detection_util.py``, ``utils/common.py``,
``utils/file_ops.py``, ``dataloaders/pet37.py``) head-to-head against our
CLI.  Those modules import torchvision at module scope, and the reference
assumes CUDA tensors — this shim provides:

* a faithful, minimal torchvision stub (``ImageFolder`` with torchvision's
  sorted-classes / sorted-walk semantics, ``VisionDataset`` with the
  ``StandardTransform`` composition rule, ``verify_str_arg``);
* ``RefPreprocess`` — the reference's ``val_preprocess``
  (``train_eval_util.py:27-34``: Resize(224) → CenterCrop(224) → ToTensor
  → Normalize) re-stated with the same PIL + torch calls torchvision's PIL
  backend makes, so pixels are bit-identical;
* loaders that import the reference modules by file path and no-op the
  ``.cuda()`` calls.

This file is test scaffolding for executing UNMODIFIED reference code; it
intentionally mirrors torchvision semantics rather than our own
``mcm_tpu.data`` implementations.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
from PIL import Image

REF_ROOT = "/root/reference"

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

_IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                   ".tiff", ".webp")


def install_torchvision_stub() -> None:
    """Register a minimal-but-faithful torchvision in sys.modules (no-op if
    the real torchvision is importable)."""
    try:
        if importlib.util.find_spec("torchvision") is not None:
            # a real torchvision (or this stub, registered with specs on a
            # previous call) — but a find_spec success can also be OUR
            # earlier install; only bail for a genuinely importable module
            if "torchvision" not in sys.modules or hasattr(
                    sys.modules["torchvision"], "__file__"):
                return
    except ValueError:
        # test_metrics.py registers a bare ModuleType stub whose __spec__
        # is None — find_spec raises for those; fall through and replace
        # it with the faithful stub
        pass
    # always (re)install: a bare stub registered earlier in the process
    # lacks the datasets.vision/utils surface the reference dataloaders
    # import

    import torch

    tv = types.ModuleType("torchvision")
    datasets = types.ModuleType("torchvision.datasets")
    ds_utils = types.ModuleType("torchvision.datasets.utils")
    ds_vision = types.ModuleType("torchvision.datasets.vision")

    def verify_str_arg(value, arg=None, valid_values=None):
        if valid_values is not None and value not in valid_values:
            raise ValueError(f"{arg}={value!r} not in {valid_values}")
        return value

    def _unavailable(*a, **k):
        raise RuntimeError("downloads are disabled in the test environment")

    class StandardTransform:
        def __init__(self, transform=None, target_transform=None):
            self.transform = transform
            self.target_transform = target_transform

        def __call__(self, inp, target):
            if self.transform is not None:
                inp = self.transform(inp)
            if self.target_transform is not None:
                target = self.target_transform(target)
            return inp, target

    class VisionDataset(torch.utils.data.Dataset):
        def __init__(self, root, transforms=None, transform=None,
                     target_transform=None):
            self.root = root
            has_transforms = transforms is not None
            has_separate = (transform is not None
                            or target_transform is not None)
            if has_transforms and has_separate:
                raise ValueError(
                    "Only transforms or transform/target_transform can be "
                    "passed as argument")
            self.transform = transform
            self.target_transform = target_transform
            if has_separate:
                transforms = StandardTransform(transform, target_transform)
            self.transforms = transforms

    class ImageFolder(torch.utils.data.Dataset):
        """torchvision.datasets.ImageFolder semantics: classes =
        sorted(dir entries), samples walked per class with
        ``sorted(os.walk(...))`` and sorted filenames, PIL RGB loader."""

        def __init__(self, root, transform=None, target_transform=None):
            self.root = root
            self.classes = sorted(e.name for e in os.scandir(root)
                                  if e.is_dir())
            if not self.classes:
                raise FileNotFoundError(f"no class folders in {root}")
            self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
            self.samples = []
            for cls in self.classes:
                target_dir = os.path.join(root, cls)
                for r, _, fnames in sorted(os.walk(target_dir,
                                                   followlinks=True)):
                    for fname in sorted(fnames):
                        if fname.lower().endswith(_IMG_EXTENSIONS):
                            self.samples.append((os.path.join(r, fname),
                                                 self.class_to_idx[cls]))
            self.imgs = self.samples
            self.targets = [t for _, t in self.samples]
            self.transform = transform
            self.target_transform = target_transform

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, idx):
            path, target = self.samples[idx]
            with open(path, "rb") as f:
                img = Image.open(f)
                img = img.convert("RGB")
            if self.transform is not None:
                img = self.transform(img)
            if self.target_transform is not None:
                target = self.target_transform(target)
            return img, target

    ds_utils.verify_str_arg = verify_str_arg
    ds_utils.check_integrity = lambda *a, **k: True
    ds_utils.download_and_extract_archive = _unavailable
    ds_utils.download_url = _unavailable
    ds_vision.VisionDataset = VisionDataset
    ds_vision.StandardTransform = StandardTransform
    datasets.ImageFolder = ImageFolder
    datasets.utils = ds_utils
    datasets.vision = ds_vision
    tv.datasets = datasets

    for mod in (tv, datasets, ds_utils, ds_vision):
        # a registered module without __spec__ breaks importlib.find_spec
        # for every LATER caller in the process ("__spec__ is None")
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
        sys.modules[mod.__name__] = mod


class RefPreprocess:
    """``val_preprocess`` exactly as torchvision's PIL backend executes it
    (``train_eval_util.py:27-34``)."""

    def __init__(self, size: int = 224):
        import torch

        self.size = size
        self._mean = torch.tensor(CLIP_MEAN).view(3, 1, 1)
        self._std = torch.tensor(CLIP_STD).view(3, 1, 1)

    def __call__(self, img: Image.Image):
        import torch

        size = self.size
        # transforms.Resize(int): shorter side → size, PIL bilinear
        w, h = img.size
        if not ((w <= h and w == size) or (h <= w and h == size)):
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                ow, oh = int(size * w / h), size
            img = img.resize((ow, oh), Image.BILINEAR)
        # transforms.CenterCrop(size): round((dim - size)/2) offsets,
        # zero-pad first if smaller
        w, h = img.size
        if w < size or h < size:
            padded = Image.new("RGB", (max(w, size), max(h, size)), 0)
            padded.paste(img, ((max(w, size) - w) // 2,
                               (max(h, size) - h) // 2))
            img = padded
            w, h = img.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
        img = img.crop((left, top, left + size, top + size))
        # ToTensor + Normalize (torchvision's exact op sequence)
        t = torch.from_numpy(
            np.array(img, np.uint8, copy=True)).permute(2, 0, 1)
        t = t.contiguous().to(torch.float32).div(255)
        return t.sub_(self._mean).div_(self._std)


def _load_by_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def patch_cuda_noop() -> None:
    """Make ``.cuda()`` the identity so the reference's GPU-pinned code
    runs on CPU tensors unchanged."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def load_reference_modules():
    """(detection_util, common, file_ops, pet37) — the reference's own
    modules, imported by file path with the stub installed."""
    install_torchvision_stub()
    patch_cuda_noop()
    det = _load_by_path("ref_detection_util",
                        os.path.join(REF_ROOT, "utils", "detection_util.py"))
    common = _load_by_path("ref_common",
                           os.path.join(REF_ROOT, "utils", "common.py"))
    file_ops = _load_by_path("ref_file_ops",
                             os.path.join(REF_ROOT, "utils", "file_ops.py"))
    pet37 = _load_by_path("ref_pet37",
                          os.path.join(REF_ROOT, "dataloaders", "pet37.py"))
    return det, common, file_ops, pet37
