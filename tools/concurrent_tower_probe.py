"""Do PRODUCTION-SIZE first executions overlap, or throttle each other?

tools/concurrent_firstexec_probe.py showed toy programs' first
executions parallelize (3.3 s vs 17.0 s).  But the cold-start A/B
(tools/coldstart_probe.py) measured the OPPOSITE at production scale:
with the warm-overlap thread on, the B/16 image program's first
readback blocked 178.7 s vs 45.9 s uncontended — concurrent tower-size
compiles appear to throttle each other ~4×.  This probe isolates that:
four fresh B/16 image-score programs (fresh batch sizes), two
first-executed serially, two concurrently, via the production EvalStep.

If concurrent_total ≈ serial_total the helper parallelizes tower-scale
compiles and the A/B was variance; if concurrent_total >> serial_total
the helper (or the tunnel) serializes+penalizes, and warmup must stay
serial.  Bump MCM_PROBE_GEN by 40 for fresh batch sizes.
"""
from __future__ import annotations

import json
import os
import threading
import time

import numpy as np


def main() -> None:
    import jax

    from mcm_tpu.config import CLIP_CONFIGS
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import EvalStep, make_mesh

    cfg = CLIP_CONFIGS["ViT-B/16"]()
    step = EvalStep(cfg, score="MCM", mesh=make_mesh(1))
    params = step.put_params(init_clip(0, cfg))
    text = step.put_replicated(
        np.full((37, cfg.embed_dim), 1.0 / np.sqrt(cfg.embed_dim),
                np.float32))

    gen = int(os.environ.get("MCM_PROBE_GEN", "0"))
    batches = [353 + gen, 359 + gen, 367 + gen, 373 + gen]

    def first_exec(b: int, results: dict) -> None:
        images = step.put_batch(np.zeros((b, 224, 224, 3), np.uint8))
        t0 = time.perf_counter()
        np.asarray(step.score(params, images, text))
        results[b] = round(time.perf_counter() - t0, 1)

    results: dict = {}
    t0 = time.perf_counter()
    first_exec(batches[0], results)
    first_exec(batches[1], results)
    serial_total = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=first_exec, args=(b, results))
               for b in batches[2:]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent_total = time.perf_counter() - t0

    print("RESULT " + json.dumps({
        "backend": jax.default_backend(),
        "per_first_exec_s": results,
        "serial_total_s": round(serial_total, 1),
        "concurrent_total_s": round(concurrent_total, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
