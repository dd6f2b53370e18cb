#!/usr/bin/env python
"""Does the tunnel's H2D path parallelize across concurrent streams?

The decode-included e2e row is bound by the host→device transfer rate of
the dev tunnel (77 MB per 512-image uint8 batch; docs/PERF.md), and the
runner currently issues `put_batch` serially on the consumer thread.  If
the tunnel's H2D throughput is LATENCY-bound (per-RPC dead time between
chunks) rather than bandwidth-bound, two concurrent transfer streams
interleave and raise aggregate throughput — which would justify a
pipelined put in `_stream_pass` and lift the e2e ceiling itself.  If it
is bandwidth-bound, concurrency buys nothing and the serial put stays.

Methodology: each buffer is DISTINCT (no caching/dedup), and completion
is forced by a tiny jitted full reduction consumed to host — on axon,
`block_until_ready()` returns at schedule time (CLAUDE.md), so a timed
`device_put` alone measures nothing.  The reduction program is warmed
(one compile) before any timed window.  The consume tax (one ~0.1 ms
device reduction + one small d2h RPC per buffer) is identical across
serial/concurrent variants, so the CONCURRENT-vs-SERIAL ratio is clean
even though the absolute MB/s reads slightly low.
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S = 512, 224
N_BUFFERS = 8
BYTES = B * S * S * 3  # 77 MB per buffer


def make_buffers(n):
    # SFC64 (CLAUDE.md: PCG64 normals are pathological on this host; raw
    # uint8 fill is cheap either way) — distinct content per buffer so no
    # layer can dedup or cache the transfer
    gen = np.random.Generator(np.random.SFC64(7))
    return [gen.integers(0, 256, size=(B, S, S, 3), dtype=np.uint8)
            for _ in range(n)]


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    consume = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    def transfer(buf):
        x = jax.device_put(buf, dev)
        return int(np.asarray(consume(x)))  # forces the H2D to complete

    bufs = make_buffers(N_BUFFERS)
    print("warming the consume executable...", flush=True)
    t0 = time.perf_counter()
    transfer(bufs[0])
    print(f"  warm (compile+first exec): {time.perf_counter() - t0:.1f}s",
          flush=True)

    def run_serial(buffers):
        t0 = time.perf_counter()
        for b in buffers:
            transfer(b)
        return time.perf_counter() - t0

    def run_concurrent(buffers, n_threads):
        chunks = [buffers[i::n_threads] for i in range(n_threads)]
        errs = []

        def worker(chunk):
            try:
                for b in chunk:
                    transfer(b)
            except Exception as e:  # noqa: BLE001 — surface after join
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

    def report(name, wall, n):
        mb = n * BYTES / 1e6
        print(f"{name:22s}: {wall:6.2f}s  {mb / wall:7.1f} MB/s  "
              f"({n * B / wall:6.1f} img/s equivalent)", flush=True)

    # alternate serial/concurrent rounds so a drifting tunnel rate (the
    # day-to-day 147-281 img/s band) can't masquerade as a concurrency win
    for rnd in range(3):
        report(f"serial     x{N_BUFFERS} r{rnd}", run_serial(bufs), N_BUFFERS)
        report(f"concurrent2x{N_BUFFERS} r{rnd}",
               run_concurrent(bufs, 2), N_BUFFERS)
        report(f"concurrent4x{N_BUFFERS} r{rnd}",
               run_concurrent(bufs, 4), N_BUFFERS)


if __name__ == "__main__":
    main()
