#!/usr/bin/env python
"""Full-CLI soak at ImageNet scale on the real TPU.

Synthesizes (and caches under /tmp) an ImageNet-layout tree — ID val split
plus the four default OOD sets (reference pairing,
``/root/reference/eval_ood_detection.py:63-68``) — then runs the REAL
``eval_ood_detection.py`` subprocess twice:

1. cold: 1000-prompt text encode, ID + 4 OOD sweeps, accuracy diagnostic,
   CSV/log/plot artifacts;
2. ``--resume``: must reuse every cached score/feature file and finish
   much faster (no per-dataset extraction).

Random weights (egress-free), so metrics are chance-level; the soak
validates *mechanics at scale* — batch/truncation bookkeeping across
datasets, artifact completeness, resume — and reports steady-state
throughput from the run log.

Usage: python tools/scale_soak.py [--id-images 10000] [--ood-images 2048]
"""

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

OOD_SETS = ["iNaturalist", "SUN", "places365", "dtd"]
OOD_DIRS = {"iNaturalist": "iNaturalist", "SUN": "SUN",
            "places365": "Places", "dtd": os.path.join("dtd", "images")}


#: marker prefixes are scoped PER TREE (ID val per dataset, the shared
#: OOD tree, train per dataset) so alternating --in_dataset invalidates
#: only what actually changed — a single ".soak_" prefix meant every
#: dataset switch deleted the other dataset's markers and forced full
#: rebuilds on the 1-core host (review finding, round 5)
_MARKER_PREFIXES = (".soak_id_", ".soak_ood_", ".soak_train_")


def _reset_stale_tree(root: str, subdirs, marker_prefix: str) -> None:
    """Remove a previously-built, differently-sized tree: rebuilding a
    smaller tree over a larger one would leave the old extra JPEGs in
    place and the soak would silently sweep more images than the summary
    claims.  Also clears legacy unscoped ``.soak_*`` markers from older
    runs (their trees are unkeyed under the new scheme)."""
    import shutil
    for sub in subdirs:
        shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
    for m in os.listdir(root) if os.path.isdir(root) else []:
        legacy = (m.startswith(".soak_")
                  and not m.startswith(_MARKER_PREFIXES))
        if m.startswith(marker_prefix) or legacy:
            os.unlink(os.path.join(root, m))


def _id_wnids(in_dataset: str):
    """Class dirs for the ID tree: ImageNet100 MUST use the real asset
    wnid list (get_test_labels reads the packaged class_list; a tree of
    made-up wnids would yield empty classes → NaN class means)."""
    if in_dataset == "ImageNet100":
        asset = os.path.join(REPO, "mcm_tpu", "data", "assets",
                             "imagenet100_wnids.txt")
        return [l.strip() for l in open(asset) if l.strip()]
    return [f"n{i:08d}" for i in range(1, 41)]


def build_tree(root: str, id_images: int, ood_images: int,
               train_images: int = 0, in_dataset: str = "ImageNet") -> None:
    from util_synth import make_imagefolder_tree
    wnids = _id_wnids(in_dataset)
    n_cls = len(wnids)
    built = False
    id_marker = os.path.join(root, f".soak_id_{in_dataset}_{id_images}")
    if not os.path.exists(id_marker):
        _reset_stale_tree(root, (f"{in_dataset}/val",),
                          f".soak_id_{in_dataset}_")
        print(f"building {id_images} ID JPEGs ({in_dataset}) …")
        make_imagefolder_tree(os.path.join(root, in_dataset, "val"), wnids,
                              per_class=max(1, id_images // n_cls), seed=1)
        open(id_marker, "w").close()
        built = True
    # the OOD tree is dataset-independent: keyed only by its own size
    ood_marker = os.path.join(root, f".soak_ood_{ood_images}")
    if not os.path.exists(ood_marker):
        _reset_stale_tree(root, ("ImageNet_OOD_dataset",), ".soak_ood_")
        print(f"building 4×{ood_images} OOD JPEGs …")
        for k, name in enumerate(OOD_SETS):
            make_imagefolder_tree(
                os.path.join(root, "ImageNet_OOD_dataset", OOD_DIRS[name]),
                [f"ood_{k}_{c}" for c in range(8)],
                per_class=ood_images // 8, seed=100 + k, color_bias=40 * k)
        open(ood_marker, "w").close()
        built = True
    if not built:
        print(f"tree cached: {root}")
    if train_images:
        # Mahalanobis template estimation needs EVERY class of the ID
        # dataset present in train (the runner refuses NaN class means);
        # get_test_labels is the full class list (1000 or 100)
        train_wnids = (wnids if in_dataset == "ImageNet100"
                       else [f"n{i:08d}" for i in range(1, 1001)])
        tmarker = os.path.join(root, f".soak_train_{in_dataset}_"
                                     f"{train_images}")
        if not os.path.exists(tmarker):
            _reset_stale_tree(root, (f"{in_dataset}/train",),
                              f".soak_train_{in_dataset}_")
            print(f"building {train_images} train JPEGs "
                  f"({len(train_wnids)} classes) …")
            make_imagefolder_tree(os.path.join(root, in_dataset, "train"),
                                  train_wnids,
                                  per_class=max(1, train_images
                                                // len(train_wnids)),
                                  seed=7)
            open(tmarker, "w").close()


def run_cli(root: str, extra, name: str, score: str = "MCM",
            in_dataset: str = "ImageNet") -> float:
    cmd = [sys.executable, os.path.join(REPO, "eval_ood_detection.py"),
           "--in_dataset", in_dataset, "--root-dir", root,
           "--score", score, "--CLIP_ckpt", "ViT-B/16", "-b", "512",
           "--allow_random_weights",
           "--name", "soak"] + extra
    if score != "maha":
        cmd.append("--eval_accuracy")
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    tail = (proc.stdout + proc.stderr)[-3000:]
    if proc.returncode != 0:
        print(tail)
        raise SystemExit(f"{name}: CLI failed rc={proc.returncode}")
    log_dir = os.path.join(root, "results", in_dataset, score,
                           "CLIP_ViT-B/16_T_1_ID_soak")
    missing = [f for f in
               ["soak.csv", "ood_eval_info.log",
                f"ID_{in_dataset}_scores.npy"]
               + ([f"ID_{in_dataset}_features.npz"]
                  if score != "maha" else [])
               + [f"{d}_scores.npy" for d in OOD_SETS]
               + [f"{score}_{d}.png" for d in OOD_SETS]
               if not os.path.exists(os.path.join(log_dir, f))]
    if missing:
        raise SystemExit(f"{name}: missing artifacts: {missing}")
    csv = open(os.path.join(log_dir, "soak.csv")).read().splitlines()
    assert len(csv) == 1 + len(OOD_SETS) + 1, csv  # header + sets + AVG
    log = open(os.path.join(log_dir, "ood_eval_info.log")).read()
    m = re.search(r"throughput: ([\d.]+) img/s", log)
    thr = float(m.group(1)) if m else float("nan")
    acc = re.search(r"zero-shot accuracy: (top1 [\d.]+% top5 [\d.]+%)", log)
    print(f"{name}: wall {dt:.1f}s, loop throughput {thr:.1f} img/s, "
          f"{acc.group(1) if acc else 'no accuracy line'}")
    if score == "maha":
        # template-estimation telemetry (VERDICT r4 item 5: extraction
        # throughput, covariance/inversion wall-clock, cond number)
        for pat in (r"maha templates: .*", r"cond number: .*"):
            hit = re.search(pat, log)
            if hit:
                print(f"  {hit.group(0)}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--id-images", type=int, default=10000)
    ap.add_argument("--ood-images", type=int, default=2048)
    ap.add_argument("--train-images", type=int, default=2400)
    ap.add_argument("--root", default="/tmp/mcm_soak_tree")
    ap.add_argument("--in_dataset", default="ImageNet",
                    choices=["ImageNet", "ImageNet100"],
                    help="ImageNet100 soaks the maha route at the "
                         "reference's headline template scale: 100 real "
                         "asset wnids × (--train-images/100) train JPEGs")
    ap.add_argument("--maha", action="store_true",
                    help="soak the Mahalanobis path instead: template "
                         "estimation over the train split (--subset), then "
                         "ID + OOD maha sweeps, then a no-generate rerun "
                         "that must load the cached templates")
    args = ap.parse_args()
    if args.maha and args.ood_images < 512:
        # the maha path keeps the reference's OOD tail-drop quirk
        # (detection_util.py:189): OOD scores truncate to a multiple of
        # the 512 batch, so <512 OOD images yields an EMPTY score array
        # and the (reference-faithful) scipy describe call dies on it
        raise SystemExit("--maha needs --ood-images >= 512 (the preserved "
                         "reference tail-drop would empty the OOD scores)")

    if args.maha:
        build_tree(args.root, args.id_images, args.ood_images,
                   args.train_images, in_dataset=args.in_dataset)
        maha_args = ["--template_dir", os.path.join(args.root, "templates")]
        if args.in_dataset == "ImageNet":
            # the full-ImageNet tree is tiny per class; --subset caps the
            # sweep like the reference's max_count path
            maha_args += ["--subset", "1", "--max_count", "50"]
        cold = run_cli(args.root, maha_args, "maha cold", score="maha",
                       in_dataset=args.in_dataset)
        # second run: cached templates + cached scores via --resume
        warm = run_cli(args.root,
                       maha_args + ["--generate", "", "--resume"],
                       "maha cached", score="maha",
                       in_dataset=args.in_dataset)
        tdir = os.path.join(args.root, "templates")
        npz = [f for f in os.listdir(tdir) if f.endswith(".npz")]
        assert npz, "no template cache written"
        print(f"maha soak OK: templates {npz}; cached rerun {warm:.1f}s "
              f"vs cold {cold:.1f}s")
        return

    build_tree(args.root, args.id_images, args.ood_images,
               in_dataset=args.in_dataset)
    cold = run_cli(args.root, [], "cold", in_dataset=args.in_dataset)
    warm = run_cli(args.root, ["--resume"], "resume",
                   in_dataset=args.in_dataset)
    n = args.id_images + len(OOD_SETS) * args.ood_images
    if warm > 0.7 * cold:  # gate BEFORE the success line — log greppers
        raise SystemExit("resume did not reuse cached scores (too slow)")
    print(f"soak OK: {n} images; resume {warm:.1f}s vs cold {cold:.1f}s "
          f"({cold / max(warm, 1e-9):.1f}× faster)")


if __name__ == "__main__":
    main()
