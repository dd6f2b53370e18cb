"""Multi-host feeding integration (VERDICT r1 item 5).

A real multi-process pod cannot run here, so these tests pin the pieces
whose math must be right by construction: the per-batch stripe split, the
stripe-decoding DataPipeline, and the dataset-order reassembly — plus a
full two-"host" simulation where two striped pipelines reproduce the
single-pipeline stream exactly.
"""

import numpy as np
import pytest

from util_synth import make_imagefolder_tree


def test_batch_stripe_split_and_errors():
    from mcm_tpu.parallel.multihost import batch_stripe

    assert batch_stripe(8, 0, 2) == (0, 4)
    assert batch_stripe(8, 1, 2) == (4, 8)
    assert batch_stripe(8) == (0, 8)  # single process: full batch
    with pytest.raises(ValueError, match="not divisible"):
        batch_stripe(10, 0, 4)


def test_interleave_process_stripes_orders_rows():
    from mcm_tpu.parallel.multihost import interleave_process_stripes

    # 2 procs, 3 batches, stripe width 2 → batch rows [p0(2), p1(2)]
    stacked = np.arange(2 * 3 * 2).reshape(2, 3, 2)
    out = interleave_process_stripes(stacked)
    assert out.shape == (3, 4)
    np.testing.assert_array_equal(out[0], [0, 1, 6, 7])
    np.testing.assert_array_equal(out[1], [2, 3, 8, 9])
    # trailing feature dims pass through
    stacked = np.arange(2 * 2 * 2 * 5).reshape(2, 2, 2, 5)
    assert interleave_process_stripes(stacked).shape == (2, 4, 5)


def test_assemble_matches_collect_scores_single_host():
    from mcm_tpu.data import collect_scores
    from mcm_tpu.parallel.multihost import assemble_global_outputs

    outs = [np.arange(4.0), np.arange(4.0) + 10]
    valids = [4, 2]  # padded tail batch
    np.testing.assert_array_equal(
        assemble_global_outputs(outs, valids, 6),
        collect_scores(outs, valids, 6))
    assert assemble_global_outputs([], [], 0).shape == (0,)


def test_striped_pipelines_reproduce_full_pipeline(tmp_path):
    """Two single-process pipelines with explicit stripes must together
    cover exactly what one full pipeline yields — including the padded
    tail batch where one stripe is entirely padding."""
    from mcm_tpu.data import DataPipeline
    from mcm_tpu.data.folder import ImageFolder
    from mcm_tpu.parallel.multihost import interleave_process_stripes

    make_imagefolder_tree(str(tmp_path / "tree"), ["a", "b", "c"], 3)
    ds = ImageFolder(str(tmp_path / "tree"))  # 9 images
    B = 4

    full = list(DataPipeline(ds, B, image_size=32, num_workers=1))
    stripes = [list(DataPipeline(ds, B, image_size=32, num_workers=1,
                                 stripe=(0, 2))),
               list(DataPipeline(ds, B, image_size=32, num_workers=1,
                                 stripe=(2, 4)))]
    assert len(full) == len(stripes[0]) == len(stripes[1]) == 3

    for i, fb in enumerate(full):
        # global valid count is identical on every "host"
        assert stripes[0][i].valid == stripes[1][i].valid == fb.valid
        # emulate process_allgather + reassembly
        imgs = interleave_process_stripes(
            np.stack([s[i].images for s in stripes])[:, None])[0]
        labels = interleave_process_stripes(
            np.stack([s[i].labels[None] for s in stripes]))[0]
        np.testing.assert_array_equal(imgs[:fb.valid],
                                      fb.images[:fb.valid])
        np.testing.assert_array_equal(labels[:fb.valid],
                                      fb.labels[:fb.valid])


def test_eval_step_stream_through_assemble(rng):
    """EvalStep outputs routed through assemble_global_outputs (the
    runner's path) must equal the direct single-device scores."""
    import jax

    from mcm_tpu.config import CLIPConfig, Precision, TextConfig, VisionConfig
    from mcm_tpu.parallel import EvalStep, make_mesh
    from mcm_tpu.parallel.multihost import (assemble_global_outputs,
                                            read_local)
    from mcm_tpu.models.init import init_clip

    tiny = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64, layers=2,
                            heads=4, projection_dim=32),
        text=TextConfig(vocab_size=128, context_length=16, width=64,
                        layers=2, heads=4, projection_dim=32))
    params = init_clip(jax.random.key(0), tiny)
    text = rng.standard_normal((5, 32)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    images = rng.integers(0, 256, size=(19, 32, 32, 3), dtype=np.uint8)

    step = EvalStep(tiny, precision=Precision.parity(), mesh=make_mesh(8))
    p = step.put_params(params)
    t = step.put_replicated(text)

    outs, valids = [], []
    for lo in range(0, 19, 8):
        batch = np.zeros((8, 32, 32, 3), np.uint8)
        v = min(8, 19 - lo)
        batch[:v] = images[lo:lo + v]
        outs.append(read_local(step.score(p, step.put_batch(batch), t)))
        valids.append(v)
    got = assemble_global_outputs(outs, valids, 19)

    ref_batch = np.zeros((24, 32, 32, 3), np.uint8)
    ref_batch[:19] = images
    ref = np.asarray(step.score(p, step.put_batch(ref_batch), t))[:19]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)


def test_chunked_multiproc_assembly(monkeypatch):
    """Two-'host' simulation of the bounded-memory assembly path: a fake
    process_allgather serves both hosts' stripe stacks chunk by chunk; the
    result must equal the unchunked dataset-order reassembly, every chunk
    must respect the byte budget, and hosts must keep issuing collectives
    even for chunks entirely past the truncation point (lockstep)."""
    import jax
    from jax.experimental import multihost_utils

    from mcm_tpu.parallel import multihost as mh

    n_proc, n_batches, b, d = 2, 7, 4, 16
    rng = np.random.default_rng(0)
    per_host = [rng.standard_normal((n_batches, b, d)).astype(np.float32)
                for _ in range(n_proc)]
    valids = [8, 8, 8, 8, 5, 8, 8]

    calls = []

    class FakeAllgather:
        def __init__(self):
            self.cursor = 0

        def __call__(self, x):
            n = x.shape[0]
            np.testing.assert_array_equal(
                x, per_host[0][self.cursor:self.cursor + n])
            calls.append(n)
            out = np.stack([h[self.cursor:self.cursor + n]
                            for h in per_host])
            self.cursor += n
            return out

    expected_full = mh.interleave_process_stripes(np.stack(per_host))
    expected = np.concatenate(
        [expected_full[i, :v] for i, v in enumerate(valids)])

    monkeypatch.setattr(jax, "process_count", lambda: n_proc)

    # chunk_bytes sized for exactly 2 global batches per allgather
    chunk_bytes = 2 * n_proc * b * d * 4
    for total in (sum(valids), 20):  # full pass + early truncation
        monkeypatch.setattr(multihost_utils, "process_allgather",
                            FakeAllgather())
        calls.clear()
        got = mh.assemble_global_outputs(list(per_host[0]), valids, total,
                                         chunk_bytes=chunk_bytes)
        np.testing.assert_array_equal(got, expected[:total])
        assert sum(calls) == n_batches      # every batch allgathered once
        assert max(calls) <= 2              # byte budget respected
        assert len(calls) >= 4              # chunking actually happened
