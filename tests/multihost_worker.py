"""One process of a REAL multi-process jax.distributed run (no simulation).

Launched as a subprocess pair by ``test_multihost_procs.py``:

    python multihost_worker.py <proc_id> <n_procs> <coordinator> <out.npy> \
                               [model_parallel] [total] [chunk_bytes]

Each process owns 2 virtual CPU devices (``xla_force_host_platform_device_
count=2`` set by the launcher), connects to the coordinator, and drives the
runner's actual multi-host hot-loop path end-to-end:

  ``batch_stripe`` → decode-equivalent local stripes →
  ``EvalStep.put_batch`` (→ ``jax.make_array_from_process_local_data``) →
  the jitted ``EvalStep.score`` over a mesh spanning BOTH processes →
  ``read_local`` (addressable-shard readback) →
  ``assemble_global_outputs`` (chunked lockstep ``process_allgather``).

Process 0 saves the dataset-order score array; the launcher asserts it
equals the single-process run bit-for-bit in ordering (VERDICT r3 item 3:
these branches had only ever run in numpy simulations).

The optional args drive the two branches VERDICT r4 item 2 flagged as
never having executed with real processes:

* ``model_parallel=2`` → a (data=2, model=2) grid where each process's
  addressable shards genuinely duplicate its row block across the model
  axis — ``read_local``'s index dedup (``multihost.py:92-99``) must
  collapse them (asserted here before dedup, by the launcher after).
* ``total`` < generated rows with a tiny ``chunk_bytes`` → the
  ``offsets[lo] >= n_rows`` lockstep branch (``multihost.py:153-159``)
  executes under real gloo collectives: the truncated-away chunk must
  still join the allgather or the pod deadlocks.
"""

import sys


def main() -> None:
    proc_id, n_procs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_path = sys.argv[3], sys.argv[4]
    model_parallel = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    total = int(sys.argv[6]) if len(sys.argv) > 6 else 19
    chunk_bytes = int(sys.argv[7]) if len(sys.argv) > 7 else (64 << 20)

    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_procs, process_id=proc_id)
    assert jax.process_count() == n_procs, jax.process_count()

    import numpy as np

    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.models.init import init_clip
    from mcm_tpu.parallel import EvalStep, make_mesh
    from mcm_tpu.parallel.multihost import (assemble_global_outputs,
                                            batch_stripe, read_local)

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))

    n_global = len(jax.devices())
    assert n_global == 2 * n_procs, (n_global, jax.local_device_count())
    mesh = make_mesh(n_global, model_parallel=model_parallel)
    step = EvalStep(tiny, precision=Precision.parity(), mesh=mesh)
    params = step.put_params(init_clip(0, tiny))

    # identical deterministic streams on every process (the real runner
    # decodes per-host stripes of the same dataset; here the "dataset" is
    # a seeded RNG both processes replay).  n_images may exceed `total`:
    # the assembly must truncate exactly like the maha OOD tail-drop.
    rng = np.random.default_rng(0)
    text = rng.standard_normal((5, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    B = 8
    n_images = 24 if total < 19 else total
    images = rng.integers(0, 256, size=(n_images, 32, 32, 3), dtype=np.uint8)
    text_dev = step.put_replicated(text)

    lo_s, hi_s = batch_stripe(B)
    outs, valids = [], []
    for lo in range(0, n_images, B):
        gbatch = np.zeros((B, 32, 32, 3), np.uint8)
        v = min(B, n_images - lo)
        gbatch[:v] = images[lo:lo + v]
        arr = step.put_batch(gbatch[lo_s:hi_s])    # local stripe only
        assert not arr.is_fully_addressable        # genuinely global
        assert arr.shape[0] == B
        scored = step.score(params, arr, text_dev)
        if model_parallel > 1:
            # the branch under test: model-axis replication means this
            # process's addressable shards hold its row block MORE THAN
            # once — read_local's dedup is what makes the stripe come
            # back exactly once
            idx = [tuple((sl.start or 0, sl.stop) for sl in s.index)
                   for s in scored.addressable_shards]
            assert len(idx) > len(set(idx)), idx
        stripe = read_local(scored)
        assert stripe.shape[0] == B // n_procs, stripe.shape
        outs.append(stripe)
        valids.append(v)
    scores = assemble_global_outputs(outs, valids, total,
                                     chunk_bytes=chunk_bytes)
    assert scores.shape == (total,)

    if proc_id == 0:
        np.save(out_path, scores)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
