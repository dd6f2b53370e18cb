"""Do remote compiles on the axon tunnel parallelize across threads?

The CLI's cold start pays its program compiles serially as execution
reaches them (text tower ~60 s, then eval/image program ~60 s).  If the
remote compile helper can work on two NEW programs at once, a background
warmup thread that AOT-compiles the eval program while the text tower
encodes would cut cold start by up to one full compile.  If the helper
serializes requests, overlap buys nothing (and might contaminate
timings — CLAUDE.md's failed-compile note).  This probe decides.

Method: four never-before-compiled program shapes (distinct D so the
server cache can't serve them).  Phase "serial" compiles two of them
back-to-back; phase "concurrent" compiles the other two from two
threads at once.  Compile is forced via AOT ``.lower().compile()`` —
no execution, so 1-core host contention stays minimal.  If
concurrent_total ≈ max(a, b) the helper parallelizes; ≈ a + b means it
serializes.

Shapes are offset by PROBE_GEN so the probe can be re-run against a
fresh server cache (bump the env var MCM_PROBE_GEN).
"""
from __future__ import annotations

import json
import os
import threading
import time

import numpy as np


def make_fn(d: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def block(x, w1, w2):
        h = jnp.maximum(x @ w1, 0.0)
        return jnp.sum((x + h @ w2) ** 2)

    return block


def compile_one(d: int, results: dict) -> None:
    import jax
    import jax.numpy as jnp

    f = 4 * d
    b, s = 32, 128
    fn = make_fn(d)
    shapes = (
        jax.ShapeDtypeStruct((b, s, d), jnp.bfloat16),
        jax.ShapeDtypeStruct((d, f), jnp.bfloat16),
        jax.ShapeDtypeStruct((f, d), jnp.bfloat16),
    )
    t0 = time.perf_counter()
    compiled = fn.lower(*shapes).compile()
    dt = time.perf_counter() - t0
    results[d] = round(dt, 1)
    del compiled


def main() -> None:
    import jax  # noqa: F401  (initialize backend once, in the main thread)

    gen = int(os.environ.get("MCM_PROBE_GEN", "0"))
    # distinct, never-used model dims (not 512/640/768/1024 — those are real)
    dims = [408 + 8 * gen, 536 + 8 * gen, 664 + 8 * gen, 920 + 8 * gen]

    results: dict = {}
    t0 = time.perf_counter()
    compile_one(dims[0], results)
    compile_one(dims[1], results)
    serial_total = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=compile_one, args=(d, results))
               for d in dims[2:]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent_total = time.perf_counter() - t0

    print("RESULT " + json.dumps({
        "backend": jax.default_backend(),
        "per_compile_s": results,
        "serial_total_s": round(serial_total, 1),
        "concurrent_total_s": round(concurrent_total, 1),
        "parallelizes": concurrent_total < 0.75 * serial_total,
    }), flush=True)


if __name__ == "__main__":
    main()
