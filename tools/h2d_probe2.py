#!/usr/bin/env python
"""Decider for the H2D-concurrency question: alternating serial/4-stream A/B.

tools/h2d_probe.py's 3-round sweep was swamped by the tunnel's minute-scale
H2D drift (serial 13.8→19.0 MB/s, 4-stream 14.8→26.0 within one run —
adjacent comparisons contradicted each other).  This probe applies the
CLAUDE.md A/B rule: small adjacent cells, strict A/B alternation with the
ORDER itself alternating across rounds (S,C / C,S / …), and the verdict
read from the per-round ratio distribution, not any single number.
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S = 512, 224
CELL = 4           # buffers per timed cell (~308 MB)
ROUNDS = 8
BYTES = B * S * S * 3


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    consume = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    gen = np.random.Generator(np.random.SFC64(11))
    bufs = [gen.integers(0, 256, size=(B, S, S, 3), dtype=np.uint8)
            for _ in range(CELL)]

    def transfer(buf):
        return int(np.asarray(consume(jax.device_put(buf, dev))))

    print("warming...", flush=True)
    transfer(bufs[0])

    def serial_cell():
        t0 = time.perf_counter()
        for b in bufs:
            transfer(b)
        return time.perf_counter() - t0

    def concurrent_cell(n_threads=4):
        chunks = [bufs[i::n_threads] for i in range(n_threads)]
        errs = []

        def worker(chunk):
            try:
                for b in chunk:
                    transfer(b)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(c,))
                   for c in chunks]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise errs[0]
        return time.perf_counter() - t0

    ratios = []
    for rnd in range(ROUNDS):
        if rnd % 2 == 0:
            ts, tc = serial_cell(), concurrent_cell()
        else:
            tc, ts = concurrent_cell(), serial_cell()
        r = ts / tc  # >1 means the 4-stream cell was faster
        ratios.append(r)
        print(f"r{rnd}: serial {CELL * BYTES / ts / 1e6:6.1f} MB/s  "
              f"conc4 {CELL * BYTES / tc / 1e6:6.1f} MB/s  "
              f"ratio {r:5.2f}  (order {'S,C' if rnd % 2 == 0 else 'C,S'})",
              flush=True)
    ratios = np.array(ratios)
    print(f"\nratio conc4/serial: median {np.median(ratios):.2f}  "
          f"mean {ratios.mean():.2f}  min {ratios.min():.2f}  "
          f"max {ratios.max():.2f}", flush=True)
    print("verdict: " + ("CONCURRENCY WINS" if np.median(ratios) > 1.15
                         else "no robust win — keep the serial put"),
          flush=True)


if __name__ == "__main__":
    main()
