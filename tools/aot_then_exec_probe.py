"""Where does the axon first-execution tax actually live?

tools/concurrent_compile_probe.py showed ``.lower().compile()`` of a
NEVER-seen program returns in ~2 s — so the ~60 s first-execution cost
is not the compile *call*.  This probe times the stages separately on
one fresh shape: AOT compile, then first execution of the compiled
object, then second execution.  If the first execute still pays tens of
seconds, the tax is the executable load/first-dispatch (and a warmup
must EXECUTE, not merely compile); if it is seconds, AOT compile alone
is a sufficient warmup.

Bump MCM_PROBE_GEN for a fresh shape (server cache is keyed by program).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    gen = int(os.environ.get("MCM_PROBE_GEN", "0"))
    d = 1176 + 8 * gen  # never-used model dim
    f, b, s = 4 * d, 32, 128

    @jax.jit
    def block(x, w1, w2):
        h = jnp.maximum(x @ w1, 0.0)
        return jnp.sum((x + h @ w2) ** 2)

    shapes = (
        jax.ShapeDtypeStruct((b, s, d), jnp.bfloat16),
        jax.ShapeDtypeStruct((d, f), jnp.bfloat16),
        jax.ShapeDtypeStruct((f, d), jnp.bfloat16),
    )
    t0 = time.perf_counter()
    compiled = block.lower(*shapes).compile()
    t1 = time.perf_counter()

    rng = np.random.Generator(np.random.SFC64(0))
    x = jnp.asarray(rng.standard_normal((b, s, d), dtype=np.float32),
                    dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    t2 = time.perf_counter()
    v1 = float(np.asarray(compiled(x, w1, w2)))
    t3 = time.perf_counter()
    v2 = float(np.asarray(compiled(x, w1, w2)))
    t4 = time.perf_counter()

    print("RESULT " + json.dumps({
        "backend": jax.default_backend(),
        "dim": d,
        "aot_compile_s": round(t1 - t0, 2),
        "h2d_s": round(t2 - t1, 2),
        "first_exec_s": round(t3 - t2, 2),
        "second_exec_s": round(t4 - t3, 3),
        "values_match": v1 == v2,
    }), flush=True)


if __name__ == "__main__":
    main()
