#!/usr/bin/env python
"""Supervised-ViT MSP baseline evaluation.

The pure-visual baseline MCM is compared against (reference README's
google/vit-base-patch16-224 + MSP configuration; logits path as in
``utils/detection_util.py:124-133``).  Shares the data/metrics/reporting
stack with ``eval_ood_detection.py``; the model is the supervised ViT
classifier from :mod:`mcm_tpu.models.vit`.

Weights: place an HF ``ViTForImageClassification`` snapshot (e.g.
google/vit-base-patch16-224) under ``--ckpt_dir``; converted bundles are
cached as npz.  ``--allow_random_weights`` smoke-runs without weights.
"""

import argparse
import os

import numpy as np


def process_args():
    p = argparse.ArgumentParser(
        description="MSP baseline (supervised ViT) OOD evaluation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--in_dataset", default="ImageNet", type=str,
                   choices=["ImageNet", "ImageNet10", "ImageNet20",
                            "ImageNet100", "pet37", "food101", "car196",
                            "bird200", "flower102"])
    p.add_argument("--root-dir", default="datasets", type=str)
    p.add_argument("--name", default="eval_msp", type=str)
    p.add_argument("--seed", default=5, type=int)
    p.add_argument("-b", "--batch-size", default=512, type=int)
    p.add_argument("--T", type=float, default=1.0)
    p.add_argument("--score", default="MCM", type=str,
                   choices=["MCM", "energy", "max-logit", "entropy", "var"],
                   help="MCM == max-softmax (MSP) over classifier logits")
    p.add_argument("--ckpt_dir", default=None, type=str)
    p.add_argument("--allow_random_weights", action="store_true")
    p.add_argument("--out_datasets", default=None, type=str, nargs="+")
    p.add_argument("--num_workers", default=None, type=int)
    return p.parse_args()


def main():
    args = process_args()
    from mcm_tpu.data import (default_out_datasets, set_ood_loader,
                              set_val_loader, validate_out_datasets)
    from mcm_tpu.metrics import get_and_print_results, print_measures
    from mcm_tpu.runner import RunConfig, build_model_and_step, score_dataset
    from mcm_tpu.utils import Telemetry, setup_log, setup_seed
    from mcm_tpu.utils.results import save_as_dataframe

    setup_seed(args.seed)
    log_directory = (f"results/{args.in_dataset}/MSP_{args.score}/"
                     f"vit_T_{args.T}_ID_{args.name}")
    os.makedirs(log_directory, exist_ok=True)
    log = setup_log(log_directory, args.name)

    # the runner's vit-Linear machinery: weight resolution, one-time
    # device placement of the params (a local jit over numpy params would
    # re-transfer the full ~344 MB weight pytree every batch), the sharded
    # scoring step, and the streaming score pass with telemetry
    cfg = RunConfig(in_dataset=args.in_dataset, root_dir=args.root_dir,
                    name=args.name, seed=args.seed,
                    batch_size=args.batch_size, T=float(args.T),
                    model="vit-Linear", score=args.score,
                    ckpt_dir=args.ckpt_dir,
                    allow_random_weights=args.allow_random_weights,
                    num_workers=args.num_workers)
    params, _, step = build_model_and_step(cfg)
    telemetry = Telemetry()

    out_datasets = args.out_datasets or default_out_datasets(args.in_dataset)
    validate_out_datasets(out_datasets)  # fail typos before scoring

    val_ds = set_val_loader(args.in_dataset, args.root_dir)
    in_score = score_dataset(step, params, val_ds, None, cfg, telemetry)

    auroc_list, aupr_list, fpr_list = [], [], []
    for out_dataset in out_datasets:
        log.debug(f"Evaluting OOD dataset {out_dataset}")
        out_score = score_dataset(step, params,
                                  set_ood_loader(out_dataset, args.root_dir),
                                  None, cfg, telemetry)
        # the shared helper owns the lower-is-ID double negation
        # (CLAUDE.md invariant — one call site, same as eval_ood)
        get_and_print_results(args, log, in_score, out_score, auroc_list,
                              aupr_list, fpr_list,
                              method_name=f"MSP-{args.score}")
    print_measures(log, float(np.mean(auroc_list)), float(np.mean(aupr_list)),
                   float(np.mean(fpr_list)), "MSP-mean")
    save_as_dataframe(log_directory, args.name, out_datasets, fpr_list,
                      auroc_list, aupr_list)
    log.debug(telemetry.report())


if __name__ == "__main__":
    main()
