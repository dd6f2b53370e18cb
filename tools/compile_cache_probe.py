"""Does jax's persistent compilation cache kill the axon first-execution tax?

Every fresh process on the tunneled v5e pays a ~60 s remote load/compile
round trip for EACH new executable (CLAUDE.md environment facts; round-3
measured a replicated-array d2h costing 99 s-4.7 min first-use).  If
``jax_compilation_cache_dir`` can serve the serialized executable from local
disk, CLI startup / bench startup / serving warmup all get cheaper by
minutes per process.  If the tax is the remote *load* of a compiled program
onto the chip (not the compile), the cache buys nothing — this probe tells
us which.

Method: run the SAME small-but-real program (one ViT-B/16-shaped encoder
block forward at batch 64) in two fresh subprocesses with the cache dir
set, plus one control subprocess with the cache disabled, and compare each
process's time-to-first-result.  Timing is readback-based (np.asarray), per
the axon rule that block_until_ready does not block.

Usage:  python tools/compile_cache_probe.py            # orchestrates
        python tools/compile_cache_probe.py child DIR  # one measured child
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def child(cache_dir: str) -> None:
    import numpy as np

    t0 = time.perf_counter()
    import jax

    if cache_dir != "none":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    D, F, B, S = 768, 3072, 64, 197

    @jax.jit
    def block(x, w1, w2):
        h = jnp.maximum(x @ w1, 0.0)
        y = x + h @ w2
        # a reduction so the readback is tiny (axon: time via readback)
        return jnp.sum(y * y)

    rng = np.random.Generator(np.random.SFC64(0))
    x = jnp.asarray(rng.standard_normal((B, S, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, F), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D), dtype=np.float32) * 0.02,
                     dtype=jnp.bfloat16)
    t1 = time.perf_counter()
    val = float(np.asarray(block(x, w1, w2)))
    t2 = time.perf_counter()
    # second call: same executable, should be milliseconds
    val2 = float(np.asarray(block(x, w1, w2)))
    t3 = time.perf_counter()
    print(json.dumps({
        "backend": jax.default_backend(),
        "import_plus_h2d_s": round(t1 - t0, 2),
        "first_exec_s": round(t2 - t1, 2),
        "second_exec_s": round(t3 - t2, 3),
        "value": val, "value2": val2,
    }), flush=True)


def main() -> None:
    cache = "/tmp/mcm_jax_cache_probe"
    os.makedirs(cache, exist_ok=True)
    runs = []
    for name, arg in [("cold_cache", cache), ("warm_cache", cache),
                      ("no_cache", "none")]:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, __file__, "child", arg],
            capture_output=True, text=True, timeout=1200)
        wall = time.perf_counter() - t0
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"error": out.stdout[-500:] + out.stderr[-500:]}
        rec.update({"run": name, "proc_wall_s": round(wall, 1)})
        runs.append(rec)
        print(json.dumps(rec), flush=True)
        entries = [f for f in os.listdir(cache)] if os.path.isdir(cache) else []
        print(f"  cache entries now: {len(entries)}", flush=True)
    print("RESULT " + json.dumps(runs), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        main()
