"""Time the parallelized serving warmup on the chip with fresh buckets.

serve.py::OODDetector.warmup now warms its batch buckets from one
thread each (round 4).  With N never-compiled bucket programs a serial
warmup costs ~sum of N full-tower remote compiles; overlapped it costs
~max.  This script builds a B/16 detector with three bucket sizes
nothing ever compiled (5, 21, 89 — the production ladders use powers of
two), logs each bucket's completion offset, and reports total warmup
wall vs the slowest single bucket.  total ≈ slowest ⇒ overlap worked;
total ≈ sum ⇒ the platform serializes.

Usage: python tools/warmup_parallel_probe.py
"""
from __future__ import annotations

import json
import time


def main() -> None:
    from mcm_tpu.serve import OODDetector

    # random weights + hash tokenizer: warmup timing only cares about
    # program SHAPES.  37 classes = the pet37 text program, long since
    # server-cached, so build time stays out of the measurement.
    det = OODDetector(class_names=[f"class {i}" for i in range(37)],
                      clip_ckpt="ViT-B/16", allow_random_weights=True,
                      batch_sizes=(5, 21, 89))

    t0 = time.perf_counter()
    marks: dict = {}

    def log(msg: str) -> None:
        marks[msg] = round(time.perf_counter() - t0, 1)
        print(f"[{marks[msg]:7.1f}s] {msg}", flush=True)

    det.warmup(log=log)
    total = round(time.perf_counter() - t0, 1)
    print("RESULT " + json.dumps({
        "bucket_done_offsets_s": marks,
        "total_warmup_s": total,
        "slowest_bucket_s": max(marks.values()) if marks else None,
    }), flush=True)


if __name__ == "__main__":
    main()
