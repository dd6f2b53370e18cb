#!/usr/bin/env python
"""Online-serving soak on the real TPU: OODDetector end to end.

Builds one detector (random weights — egress-free), exercises the bucketed
compiled-shape ladder with request sizes that hit every bucket, scores
files through the native decode pipeline, calibrates a threshold, and
checks the bucket-invariance contract (a prefix scored in a bigger bucket
matches within bf16 tolerance).  Reports per-bucket latency after warmup —
the number an online deployment cares about.

Usage: python tools/serve_soak.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import warnings

    from mcm_tpu.serve import OODDetector

    buckets = (1, 8, 64, 512)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        det = OODDetector(class_names=[f"class {i}" for i in range(1000)],
                          clip_ckpt="ViT-B/16", allow_random_weights=True,
                          batch_sizes=buckets)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(512, 224, 224, 3), dtype=np.uint8)

    # warm every bucket (one remote compile each on a fresh process)
    t0 = time.perf_counter()
    for b in buckets:
        det.score_images(imgs[:b])
    print(f"warmup (4 bucket compiles): {time.perf_counter() - t0:.1f}s")

    # per-bucket request latency, warm
    for b in buckets:
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            det.score_images(imgs[:b])
        dt = (time.perf_counter() - t0) / reps
        print(f"bucket {b:4d}: {dt * 1e3:8.1f} ms/request "
              f"({b / dt:7.1f} img/s)")

    # bucket invariance: same image, different compiled executable
    s512 = det.score_images(imgs)
    s64 = det.score_images(imgs[:64])
    err = float(np.max(np.abs(s512[:64] - s64)))
    assert err < 5e-3, f"bucket mismatch: {err}"

    # shape validation guards the compiled-shape contract
    try:
        det.score_images(rng.integers(0, 256, size=(2, 256, 256, 3),
                                      dtype=np.uint8))
        raise SystemExit("shape validation missing")
    except ValueError:
        pass

    # file scoring through the native pipeline + calibration
    from util_synth import make_imagefolder_tree
    tree = "/tmp/mcm_serve_soak"
    make_imagefolder_tree(os.path.join(tree, "x"), ["c"], 96)
    import glob
    paths = sorted(glob.glob(os.path.join(tree, "x", "c", "*.jpg")))
    fs = det.score_files(paths)
    assert fs.shape == (96,) and np.isfinite(fs).all()
    thr = det.calibrate(fs, tpr=0.95)
    frac = det.is_id(fs).mean()
    print(f"file scoring: 96 files ok; calibrated thr={thr:.4f}, "
          f"{frac:.2%} called ID")
    assert 0.90 <= frac <= 1.0
    # concurrent single-image clients: MicroBatcher coalescing vs the
    # serial per-request floor (each serial request pays a full tunnel
    # round trip at bucket-1 shape)
    from concurrent.futures import ThreadPoolExecutor

    from mcm_tpu.serve import MicroBatcher

    n_req, n_clients = 256, 16
    t0 = time.perf_counter()
    for i in range(32):  # serial baseline (32 is enough to see the floor)
        det.score_images(imgs[i])
    serial_rps = 32 / (time.perf_counter() - t0)

    with MicroBatcher(det, max_wait_ms=5) as mb:
        mb.submit(imgs[0]).result()  # warm the path
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_clients) as pool:
            scores = list(pool.map(
                lambda i: mb.submit(imgs[i % 512]).result(timeout=600),
                range(n_req)))
        batched_rps = n_req / (time.perf_counter() - t0)
    assert all(np.isfinite(s) for s in scores)
    print(f"concurrent clients: serial {serial_rps:.1f} req/s → "
          f"microbatched {batched_rps:.1f} req/s "
          f"({batched_rps / serial_rps:.1f}×, {mb.n_batches} device "
          f"batches for {mb.n_images} requests)")
    assert mb.n_batches < mb.n_images, "no coalescing happened"

    print(f"bucket-invariance max|Δ|={err:.2e}; serve soak OK")


if __name__ == "__main__":
    main()
