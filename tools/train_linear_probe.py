#!/usr/bin/env python
"""Train a linear probe over frozen CLIP image features.

Produces the classifier that backs the reference's ``CLIP-Linear`` /
``vit-Linear`` configurations (``utils/train_eval_util.py:24-25``,
``utils/detection_util.py:127-133``): extract features for the ID train
split once (frozen encoder, one compiled pass), then minibatch-train a
linear head on the MXU.

Usage:
  python tools/train_linear_probe.py --in_dataset pet37 --root-dir datasets \
      [--ckpt_dir checkpoints] [--epochs 20] [--out probe_pet37.npz] \
      [--allow_random_weights]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in_dataset", default="pet37", type=str,
                   choices=["ImageNet", "ImageNet10", "ImageNet20",
                            "ImageNet100", "pet37", "food101", "car196",
                            "bird200"])
    p.add_argument("--root-dir", default="datasets", type=str)
    p.add_argument("--CLIP_ckpt", default="ViT-B/16", type=str,
                   choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    p.add_argument("-b", "--batch-size", default=256, type=int)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--seed", default=5, type=int)
    p.add_argument("--subset", action="store_true")
    p.add_argument("--max_count", default=250, type=int)
    p.add_argument("--out", default=None, type=str)
    p.add_argument("--ckpt_dir", default=None, type=str)
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--num_workers", default=None, type=int)
    args = p.parse_args()

    import optax

    from mcm_tpu.data import get_num_cls, set_train_loader, set_val_loader
    from mcm_tpu.runner import RunConfig, build_model_and_step, \
        extract_features
    from mcm_tpu.train.linear_probe import train_linear_probe
    from mcm_tpu.utils.meters import accuracy

    cfg = RunConfig(in_dataset=args.in_dataset, root_dir=args.root_dir,
                    clip_ckpt=args.CLIP_ckpt, batch_size=args.batch_size,
                    seed=args.seed, subset=args.subset,
                    max_count=args.max_count, ckpt_dir=args.ckpt_dir,
                    allow_random_weights=args.allow_random_weights,
                    num_workers=args.num_workers)
    params, _, step = build_model_and_step(cfg)

    train_ds = set_train_loader(args.in_dataset, args.root_dir,
                                subset=args.subset, max_count=args.max_count)
    print(f"extracting features for {len(train_ds)} train images ...")
    feats, labels = extract_features(step, params, train_ds, cfg)
    n_cls = get_num_cls(args.in_dataset)

    probe, loss, acc = train_linear_probe(
        feats, labels, n_cls, epochs=args.epochs,
        batch_size=args.batch_size, seed=args.seed,
        optimizer=optax.adamw(args.lr))
    print(f"train: loss {loss:.4f}  acc {acc * 100:.2f}%")

    val_ds = set_val_loader(args.in_dataset, args.root_dir)
    vfeats, vlabels = extract_features(step, params, val_ds, cfg)
    logits = vfeats @ np.asarray(probe.w) + np.asarray(probe.b)
    top1 = accuracy(logits, vlabels, topk=(1,))[0]
    print(f"val top-1: {top1:.2f}%")

    out = args.out or (f"probe_{args.in_dataset}_"
                       f"{args.CLIP_ckpt.replace('/', '-')}.npz")
    np.savez(out, w=np.asarray(probe.w), b=np.asarray(probe.b),
             val_top1=top1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
