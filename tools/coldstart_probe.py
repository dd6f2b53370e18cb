"""Measure the warm-overlap cold-start win on the real chip (A/B CLI runs).

``runner._start_warm_overlap`` first-executes the image program in a
background thread while the text tower encodes, so the two remote
compiles overlap (tools/concurrent_firstexec_probe.py proved distinct
first executions parallelize).  The compile helper caches executables
server-side by program hash, so a credible A/B needs ALL-FRESH programs
in BOTH arms:

* fresh image program per arm — a batch size nothing ever used
  (341 / 347);
* fresh text program per arm — a class count whose [C, ctx] text batch
  was never encoded at this scale (ImageNet10 vs ImageNet20).

Each arm is one full CLI run (fresh subprocess) on a synthetic val tree
(120 images) + shared dtd OOD tree, B/16 random weights, axon backend.
Arm OFF pays text-compile THEN image-compile serially; arm ON overlaps
them.  The win is bounded by min(text stage, image compile) — report
both walls and the per-run logs for decomposition.

Usage: python tools/coldstart_probe.py [workdir]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_trees(root: str) -> None:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from util_synth import make_imagefolder_tree

    # wnid-style dirs; prompts come from the packaged class lists, the
    # tree only supplies images+labels
    make_imagefolder_tree(os.path.join(root, "ImageNet10", "val"),
                          [f"n{i:08d}" for i in range(10)], 12)
    make_imagefolder_tree(os.path.join(root, "ImageNet20", "val"),
                          [f"n{i:08d}" for i in range(20)], 6)
    make_imagefolder_tree(
        os.path.join(root, "ImageNet_OOD_dataset", "dtd", "images"),
        ["banded", "blotchy"], 5, color_bias=40)


def run_arm(name: str, workdir: str, root: str, in_ds: str, batch: int,
            warm: str) -> dict:
    env = dict(os.environ, MCM_TPU_WARM_OVERLAP=warm)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval_ood_detection.py"),
         "--in_dataset", in_ds, "--root-dir", root, "--score", "MCM",
         "--name", name, "-b", str(batch), "--out_datasets", "dtd",
         "--allow_random_weights", "--num_workers", "1"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0
    rec = {"arm": name, "in_dataset": in_ds, "batch": batch, "warm": warm,
           "wall_s": round(wall, 1), "returncode": proc.returncode}
    if proc.returncode != 0:
        rec["stderr_tail"] = proc.stderr[-1500:]
    log = os.path.join(workdir, "results", in_ds, "MCM",
                       f"CLIP_ViT-B/16_T_1_ID_{name}", "ood_eval_info.log")
    if os.path.exists(log):
        tel = [l.strip() for l in open(log)
               if "img/s" in l or "stage" in l or "telemetry" in l.lower()]
        rec["telemetry_tail"] = tel[-6:]
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/coldstart_probe"
    root = os.path.join(workdir, "datasets")
    os.makedirs(workdir, exist_ok=True)
    if not os.path.isdir(os.path.join(root, "ImageNet20")):
        make_trees(root)
    arms = [
        run_arm("cold_off", workdir, root, "ImageNet10", 341, "0"),
        run_arm("cold_on", workdir, root, "ImageNet20", 347, "1"),
    ]
    off, on = arms[0]["wall_s"], arms[1]["wall_s"]
    print("RESULT " + json.dumps({
        "wall_off_s": off, "wall_on_s": on,
        "saved_s": round(off - on, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
