"""Serving on a multi-device mesh: OODDetector built over data-parallel
(and DP×TP) meshes must score identically to the single-device detector —
the online path reuses EvalStep's sharded program, so this locks the
serve-layer plumbing (put_batch sharding, bucket ladder, MicroBatcher)
to the parallel contract tested for the offline evaluator."""

import numpy as np
import pytest

IMGS = np.random.default_rng(21).integers(
    0, 256, size=(4, 224, 224, 3), dtype=np.uint8)


def _build(n_devices, model_parallel=1):
    import warnings

    from mcm_tpu.serve import OODDetector
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # parity precision: random-weight scores sit ~1e-4 apart, so the
        # cross-mesh comparison is only meaningful above bf16 matmul
        # noise (TP's row-parallel psum reorders reductions)
        return OODDetector(class_names=["cat", "dog", "owl"],
                           allow_random_weights=True, precision="parity",
                           batch_sizes=(2, 4), n_devices=n_devices,
                           model_parallel=model_parallel)


@pytest.fixture(scope="module")
def single_scores():
    return _build(1).score_images(IMGS)


@pytest.mark.parametrize("n_devices,model_parallel", [(2, 1), (4, 2)])
def test_detector_on_mesh_matches_single_device(n_devices, model_parallel,
                                                single_scores):
    det = _build(n_devices, model_parallel)
    sharded = det.score_images(IMGS)
    # same math, different partitioning: tight tolerance (the parallel
    # suite holds EvalStep itself to 1e-5 of single-device)
    np.testing.assert_allclose(sharded, single_scores, rtol=1e-4, atol=1e-5)

    from mcm_tpu.serve import MicroBatcher
    with MicroBatcher(det, max_wait_ms=20) as mb:
        futs = [mb.submit(img) for img in IMGS]
        got = np.array([f.result(timeout=300) for f in futs], np.float32)
    # coalesced batches land on bucket 2 or 4 — both divisible by the
    # DP mesh — and must reproduce the sharded direct path
    np.testing.assert_allclose(got, sharded, rtol=5e-3, atol=5e-4)
