#!/usr/bin/env python
"""Soak the HTTP serving frontend on the real chip: sustained concurrent
load through the full network stack (HTTP parse → in-memory native JPEG
decode → MicroBatcher coalescing → device → JSON response).

tools/serve_soak.py measures the in-process MicroBatcher; this adds the
deployable layer on top — the number a load balancer actually sees.

Phases (random weights; throughput is weight-independent):
  serial     one client, N sequential single-JPEG requests (the floor:
             every request pays a full HTTP + decode + device round trip)
  burst      T threads x K single-JPEG requests (the MicroBatcher's case)
  batch      JSON base64 batches of 64 (the bulk-client case)

Each bucket executable is warmed before timing (first execution per
process pays the ~60 s tunnel load, CLAUDE.md).  Prints one JSON line;
measured numbers live in docs/PERF.md.
"""

import base64
import http.client
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SERIAL_N = 48
BURST_THREADS = 16
BURST_PER_THREAD = 16
BATCH_CLIENTS = 4
BATCH_SIZE = 64


def make_jpegs(n, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    blobs = []
    for i in range(n):
        arr = rng.integers(0, 256, (420, 500, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=88)
        blobs.append(buf.getvalue())
    return blobs


def post(port, path, body, ctype, timeout=1200):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", path, body=body,
                     headers={"Content-Type": ctype})
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, (resp.status, data[:200])
        return json.loads(data)
    finally:
        conn.close()


def main():
    import warnings

    from mcm_tpu.serve import OODDetector
    from mcm_tpu.serve_http import OODServer

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        det = OODDetector(class_names=[f"class {i}" for i in range(1000)],
                          allow_random_weights=True,
                          batch_sizes=(1, 8, 64))
    # warm every bucket executable BEFORE serving, through the production
    # path (mcm-serve --warmup): serve.py warms buckets CONCURRENTLY, so
    # a never-compiled family costs ~max, not ~sum, of the per-bucket
    # compiles.  Serial warm-by-request posts hit the tunnel's worst-case
    # compile regime instead — two soak runs (2026-08-20) blew a 600 s
    # client timeout on the FIRST bucket-1 post exactly there.
    t0 = time.perf_counter()
    det.warmup()
    warm_s = time.perf_counter() - t0
    print(f"warmup (3 buckets, concurrent): {warm_s:.1f} s", flush=True)

    srv = OODServer(det, host="127.0.0.1", port=0, max_wait_ms=5.0)
    srv.start()
    port = srv.port
    blobs = make_jpegs(BURST_THREADS)

    # HTTP-layer smoke through each content type (compiles nothing new)
    post(port, "/v1/score", blobs[0], "image/jpeg")
    b64 = [base64.b64encode(b).decode() for b in blobs]
    post(port, "/v1/score",
         json.dumps({"images_b64": (b64 * 8)[:8]}), "application/json")
    post(port, "/v1/score",
         json.dumps({"images_b64": (b64 * 4)[:BATCH_SIZE]}),
         "application/json")

    # -- serial floor --------------------------------------------------------
    t0 = time.perf_counter()
    for i in range(SERIAL_N):
        post(port, "/v1/score", blobs[i % len(blobs)], "image/jpeg")
    serial = SERIAL_N / (time.perf_counter() - t0)
    print(f"serial: {serial:.1f} req/s", flush=True)

    # -- concurrent burst ----------------------------------------------------
    n_batches0 = srv.batcher.n_batches
    n_images0 = srv.batcher.n_images
    errors = []

    def client(tid):
        try:
            for _ in range(BURST_PER_THREAD):
                post(port, "/v1/score", blobs[tid], "image/jpeg")
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(t,))
               for t in range(BURST_THREADS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert not errors, errors[:3]
    total = BURST_THREADS * BURST_PER_THREAD
    burst = total / dt
    coalesce = ((srv.batcher.n_images - n_images0)
                / max(1, srv.batcher.n_batches - n_batches0))
    print(f"burst ({BURST_THREADS} threads): {burst:.1f} req/s "
          f"(coalescing {coalesce:.1f} img/batch)", flush=True)

    # -- bulk JSON batches ---------------------------------------------------
    payload = json.dumps({"images_b64": (b64 * 4)[:BATCH_SIZE]})
    results = []

    def bulk():
        out = post(port, "/v1/score", payload, "application/json")
        results.append(len(out["scores"]))

    threads = [threading.Thread(target=bulk) for _ in range(BATCH_CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert sum(results) == BATCH_CLIENTS * BATCH_SIZE
    bulk_rate = sum(results) / dt
    print(f"bulk json ({BATCH_CLIENTS}x{BATCH_SIZE}): "
          f"{bulk_rate:.1f} img/s", flush=True)

    srv.close()
    print(json.dumps({
        "serial_req_per_sec": round(serial, 1),
        "burst_req_per_sec": round(burst, 1),
        "burst_speedup": round(burst / serial, 2),
        "coalescing_img_per_batch": round(coalesce, 1),
        "bulk_json_img_per_sec": round(bulk_rate, 1),
        "warmup_s": round(warm_s, 1),
    }))


if __name__ == "__main__":
    main()
