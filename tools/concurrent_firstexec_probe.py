"""Do FIRST executions of never-seen programs overlap across threads?

tools/aot_then_exec_probe.py pinned the axon tax to first execution
(AOT compile 12 s, first exec 213.7 s, second 0.03 s): the real remote
compile+load is deferred to first dispatch.  Serving warms its batch
buckets serially (serve.py::warmup) and the CLI pays text-tower then
eval-program first-executions back-to-back — if first executions of
DIFFERENT programs overlap when issued from two threads, both paths can
parallelize their warmup and cut cold start by up to one full compile
per extra program.  If the compile helper serializes, overlap buys
nothing.

Method: four never-seen shapes.  Two executed serially, two from
concurrent threads; compare totals.  parallel ≈ max vs serial ≈ sum.
Bump MCM_PROBE_GEN to re-run with fresh shapes.
"""
from __future__ import annotations

import json
import os
import threading
import time

import numpy as np


def first_exec(d: int, results: dict) -> None:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def block(x, w1, w2):
        h = jnp.maximum(x @ w1, 0.0)
        return jnp.sum((x + h @ w2) ** 2)

    f, b, s = 4 * d, 16, 64
    rng = np.random.Generator(np.random.SFC64(d))
    x = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32),
                    dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    np.asarray(block(x, w1, w2))  # readback = the only reliable barrier
    results[d] = round(time.perf_counter() - t0, 1)


def main() -> None:
    import jax

    gen = int(os.environ.get("MCM_PROBE_GEN", "0"))
    dims = [344 + 8 * gen, 472 + 8 * gen, 600 + 8 * gen, 728 + 8 * gen]

    results: dict = {}
    t0 = time.perf_counter()
    first_exec(dims[0], results)
    first_exec(dims[1], results)
    serial_total = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=first_exec, args=(d, results))
               for d in dims[2:]]
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
        "parallelizes": concurrent_total < 0.75 * serial_total,
    }), flush=True)


if __name__ == "__main__":
    main()
