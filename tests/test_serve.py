"""Online-serving API (mcm_tpu.serve.OODDetector): bucketed batch shapes,
file scoring through the native pipeline, threshold calibration."""

import time

import numpy as np
import pytest

from util_synth import make_imagefolder_tree


@pytest.fixture(scope="module")
def detector():
    from mcm_tpu.serve import OODDetector
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return OODDetector(class_names=["cat", "dog", "owl"],
                           allow_random_weights=True,
                           batch_sizes=(1, 4), n_devices=1)


def test_score_images_buckets_and_padding(detector):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(6, 224, 224, 3), dtype=np.uint8)
    scores = detector.score_images(imgs)
    assert scores.shape == (6,) and np.isfinite(scores).all()
    # MCM scores live in [-1, 0)
    assert (scores <= 0).all() and (scores >= -1).all()
    # padding must not leak: scoring a prefix gives identical values
    np.testing.assert_allclose(detector.score_images(imgs[:3]), scores[:3],
                               rtol=1e-5, atol=1e-6)
    # single unbatched image works too (different compiled bucket → bf16
    # tiling differences, so compare loosely)
    one = detector.score_images(imgs[0])
    np.testing.assert_allclose(one, scores[:1], rtol=5e-3, atol=5e-4)


def test_score_files_matches_score_images(detector, tmp_path):
    make_imagefolder_tree(str(tmp_path / "t"), ["x"], 5)
    import glob
    paths = sorted(glob.glob(str(tmp_path / "t" / "x" / "*")))
    from_files = detector.score_files(paths, num_workers=1)
    from mcm_tpu.data.pipeline import DataPipeline
    pipe = DataPipeline([(p, 0) for p in paths], 4, num_workers=1,
                        stripe=(0, 4))
    imgs = np.concatenate([b.images[:b.valid] for b in pipe])
    # tail elements may be scored by a different compiled bucket (bf16
    # tiling differences) — loose comparison
    np.testing.assert_allclose(from_files,
                               detector.score_images(imgs),
                               rtol=5e-3, atol=5e-4)


def test_warmup_compiles_buckets(detector):
    logs = []
    detector.warmup(include_features=True, log=logs.append)
    # buckets warm concurrently (one thread each — serve.py::warmup), so
    # completion ORDER is nondeterministic; every bucket must appear once
    assert sorted(logs) == sorted(f"warmed bucket {b}"
                                  for b in detector.batch_sizes)
    # warmup must not perturb scoring
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, size=(2, 224, 224, 3), dtype=np.uint8)
    s1 = detector.score_images(imgs)
    detector.warmup()
    np.testing.assert_array_equal(s1, detector.score_images(imgs))


def test_empty_batch_sizes_rejected():
    from mcm_tpu.serve import OODDetector
    with pytest.raises(ValueError, match="batch_sizes must be non-empty"):
        OODDetector(class_names=["a"], allow_random_weights=True,
                    batch_sizes=())


def test_warmup_propagates_bucket_failure(detector, monkeypatch):
    """The concurrent warmup keeps the serial loop's error contract: a
    bucket that fails to warm raises out of warmup() as soon as the
    failure lands (fail-fast wait(FIRST_EXCEPTION), not after every
    in-flight sibling compile)."""
    real_put = detector.step.put_batch

    def failing_put(batch):
        if batch.shape[0] == detector.batch_sizes[-1]:
            raise RuntimeError("synthetic bucket-compile failure")
        return real_put(batch)

    monkeypatch.setattr(detector.step, "put_batch", failing_put)
    with pytest.raises(RuntimeError, match="synthetic bucket-compile"):
        detector.warmup()


def test_classify_images_matches_scores(detector):
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, size=(6, 224, 224, 3), dtype=np.uint8)
    idx, scores = detector.classify_images(imgs)
    assert idx.shape == scores.shape == (6,)
    assert ((idx >= 0) & (idx < len(detector.class_names))).all()
    # host fp32 scoring from device features tracks the device score path
    np.testing.assert_allclose(scores, detector.score_images(imgs),
                               rtol=5e-3, atol=5e-4)
    # the prediction is the argmax of the same logits MCM reduces: the
    # MCM score equals minus the predicted class's softmax probability,
    # so the class with the max similarity is what the score came from
    one_idx, one_scores = detector.classify_images(imgs[0])
    assert one_idx[0] == idx[0]
    # same input validation as score_images
    with pytest.raises(TypeError, match="uint8"):
        detector.classify_images(imgs.astype(np.float32) / 255.0)
    with pytest.raises(ValueError, match="preprocessed"):
        detector.classify_images(
            np.zeros((1, 128, 128, 3), dtype=np.uint8))
    # scores the host can't reproduce from logits (odin's perturbation)
    # are refused, not silently swapped for a different family
    import dataclasses
    orig_cfg = detector.cfg
    try:
        detector.cfg = dataclasses.replace(orig_cfg, score="odin")
        with pytest.raises(ValueError, match="use score_images"):
            detector.classify_images(imgs[:1])
    finally:
        detector.cfg = orig_cfg


def test_microbatcher_extra_load_sheds(detector):
    """External device work (the HTTP classify path) reported via
    extra_load counts against submit()'s max_pending budget."""
    from mcm_tpu.serve import MicroBatcher, Overloaded

    img = np.zeros((224, 224, 3), np.uint8)
    with MicroBatcher(detector, max_pending=2,
                      extra_load=lambda: 2) as mb:
        with pytest.raises(Overloaded):
            mb.submit(img)
    with MicroBatcher(detector, max_pending=2,
                      extra_load=lambda: 1) as mb:
        assert mb.submit(img).result() is not None


def test_calibrate_and_is_id(detector):
    rng = np.random.default_rng(1)
    id_scores = rng.uniform(-1.0, -0.6, 1000)
    thr = detector.calibrate(id_scores, tpr=0.95)
    assert thr == pytest.approx(np.quantile(id_scores, 0.95))
    assert detector.is_id(id_scores).mean() == pytest.approx(0.95, abs=0.01)
    assert not detector.is_id(np.array([-0.1])).any()


def test_score_images_rejects_float_input(detector):
    with pytest.raises(TypeError, match="uint8"):
        detector.score_images(np.zeros((2, 224, 224, 3), np.float32))


def test_score_files_empty(detector):
    out = detector.score_files([])
    assert out.shape == (0,) and out.dtype == np.float32


def test_detector_rejects_maha_and_bad_buckets():
    from mcm_tpu.serve import OODDetector
    with pytest.raises(ValueError, match="load_maha_templates"):
        OODDetector(class_names=["a"], score="maha",
                    allow_random_weights=True)
    with pytest.raises(ValueError, match="not divisible"):
        OODDetector(class_names=["a"], allow_random_weights=True,
                    batch_sizes=(3,), n_devices=2)
    # a 0 bucket passes divisibility (0 % dp == 0) and would only explode
    # at request time inside the dispatcher (review finding, round 5)
    with pytest.raises(ValueError, match="positive"):
        OODDetector(class_names=["a"], allow_random_weights=True,
                    batch_sizes=(0, 4), n_devices=1)


def test_score_images_snapshots_scoring_family(detector, monkeypatch):
    """A load_maha_templates racing a multi-chunk request must not switch
    scoring families mid-request: the entry points snapshot self._maha
    once, so every chunk scores under the family the request started with
    (review finding, round 5)."""
    orig = detector._score_device
    seen = []

    def spy(images_device, maha=type(detector)._MAHA_LIVE):
        seen.append(maha)
        # simulate a concurrent load_maha_templates landing mid-request
        detector._maha = ("mu", "prec", False)
        return orig(images_device, maha=maha)

    monkeypatch.setattr(detector, "_score_device", spy)
    try:
        rng = np.random.default_rng(11)
        imgs = rng.integers(0, 256, (6, 224, 224, 3), dtype=np.uint8)
        scores = detector.score_images(imgs)   # buckets (1,4) → 2 chunks
        assert len(seen) == 2
        # both chunks got the SNAPSHOT (None), not the mid-request swap
        assert seen == [None, None]
        assert np.isfinite(scores).all()
    finally:
        detector._maha = None  # restore for other tests (module fixture)


def test_maha_serving(detector, tmp_path):
    """Templates from the batch evaluator drive Mahalanobis serving;
    scores must match the direct mahalanobis_score computation."""
    from mcm_tpu.scores.mahalanobis import mahalanobis_score

    rng = np.random.default_rng(3)
    d = 512  # B/16 joint space
    mu = rng.standard_normal((3, d)).astype(np.float32)
    a = rng.standard_normal((d, d)).astype(np.float32)
    prec = (np.eye(d) * 1.0 + 0.01 * (a @ a.T) / d).astype(np.float32)
    path = tmp_path / "templates_test.npz"
    np.savez(path, classwise_mean=mu, precision=prec, normalize=False)

    imgs = rng.integers(0, 256, size=(4, 224, 224, 3), dtype=np.uint8)
    mcm_scores = detector.score_images(imgs)
    # the stored normalize flag is authoritative: a contradicting explicit
    # value raises rather than silently scoring with the wrong geometry
    with pytest.raises(ValueError, match="contradicts"):
        detector.load_maha_templates(str(path), normalize=True)
    # a flagless (pre-round-2) cache demands an explicit choice
    legacy = tmp_path / "templates_legacy.npz"
    np.savez(legacy, classwise_mean=mu, precision=prec)
    with pytest.raises(ValueError, match="normalize"):
        detector.load_maha_templates(str(legacy))
    detector.load_maha_templates(str(path))
    try:
        maha = detector.score_images(imgs)
        feats = np.asarray(detector.step.features(
            detector.params, detector.step.put_batch(imgs)))
        expect = np.asarray(mahalanobis_score(feats, mu, prec))
        np.testing.assert_allclose(maha, expect, rtol=1e-4, atol=1e-4)
        assert not np.allclose(maha, mcm_scores)
        # classify must score through the SAME maha path — a calibrated
        # threshold has to mean the same thing on both entry points
        idx, cls_scores = detector.classify_images(imgs)
        np.testing.assert_allclose(cls_scores, maha, rtol=1e-4, atol=1e-4)
        assert ((idx >= 0) & (idx < len(detector.class_names))).all()
    finally:
        detector._maha = None  # restore for other tests (module fixture)


# -- MicroBatcher ---------------------------------------------------------------


def test_microbatcher_concurrent_submits_coalesce(detector):
    """40 single-image requests through the batcher: every future
    resolves, scores match the direct path, and requests were coalesced
    into far fewer device batches than requests."""
    from mcm_tpu.serve import MicroBatcher

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, size=(40, 224, 224, 3), dtype=np.uint8)
    direct = detector.score_images(imgs)

    with MicroBatcher(detector, max_wait_ms=20) as mb:
        futures = [mb.submit(img) for img in imgs]
        got = np.array([f.result(timeout=300) for f in futures], np.float32)

    # different bucket compositions → bf16 tiling differences (same
    # tolerance as the bucket-invariance tests above)
    np.testing.assert_allclose(got, direct, rtol=5e-3, atol=5e-4)
    assert mb.n_images == 40
    # detector buckets are (1, 4) → at least ceil(40/4)=10 batches, and
    # coalescing must beat one-batch-per-request by a wide margin
    assert 10 <= mb.n_batches <= 20, mb.n_batches


def test_microbatcher_idle_resolution_and_reuse(detector):
    """A lone request must resolve promptly (the one-behind pipeline may
    not hold its readback hostage until the next burst)."""
    from mcm_tpu.serve import MicroBatcher

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    with MicroBatcher(detector, max_wait_ms=1) as mb:
        s1 = mb.submit(img).result(timeout=300)
        s2 = mb.submit(img).result(timeout=300)  # dispatcher still alive
        assert s1 == s2  # same image, same bucket, same executable
        got = mb.score(np.stack([img, img]))
        assert got.shape == (2,)


def test_microbatcher_rejects_bad_input(detector):
    from mcm_tpu.serve import MicroBatcher

    with MicroBatcher(detector) as mb:
        with pytest.raises(TypeError, match="uint8"):
            mb.submit(np.zeros((224, 224, 3), np.float32))
        with pytest.raises(ValueError, match="one \\["):
            mb.submit(np.zeros((2, 224, 224, 3), np.uint8))
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.zeros((224, 224, 3), np.uint8))
    with pytest.raises(ValueError, match="max_batch"):
        MicroBatcher(detector, max_batch=512)  # buckets are (1, 4)


def test_microbatcher_fans_out_dispatch_failure(detector, monkeypatch):
    from mcm_tpu.serve import MicroBatcher

    def boom(images_device):
        raise RuntimeError("chip fell over")

    monkeypatch.setattr(detector, "_score_device", boom)
    img = np.zeros((224, 224, 3), np.uint8)
    with MicroBatcher(detector, max_wait_ms=1) as mb:
        fut = mb.submit(img)
        with pytest.raises(RuntimeError, match="chip fell over"):
            fut.result(timeout=60)


def test_microbatcher_close_drains_in_flight(detector):
    """Requests racing close() must still be answered, not dropped."""
    from mcm_tpu.serve import MicroBatcher

    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, size=(6, 224, 224, 3), dtype=np.uint8)
    mb = MicroBatcher(detector, max_wait_ms=50)
    futures = [mb.submit(img) for img in imgs]
    mb.close()  # immediately: some requests are still queued/in flight
    for f in futures:
        assert np.isfinite(f.result(timeout=300))


def _slow_fake_scores(detector, monkeypatch, delay=0.25):
    """Replace device scoring with a slow stub so requests deterministically
    pile up in the queue while the dispatcher is busy."""
    import time as _time

    def fake(images_device):
        _time.sleep(delay)
        return np.zeros(int(images_device.shape[0]), np.float32)

    monkeypatch.setattr(detector, "_score_device", fake)


def test_microbatcher_cancelled_request_is_skipped(detector, monkeypatch):
    """future.cancel() while queued must drop the request without killing
    the dispatcher (set_result on a cancelled future raises
    InvalidStateError — round-2 review finding)."""
    from mcm_tpu.serve import MicroBatcher

    _slow_fake_scores(detector, monkeypatch)
    img = np.zeros((224, 224, 3), np.uint8)
    with MicroBatcher(detector, max_wait_ms=1) as mb:
        f0 = mb.submit(img)          # dispatcher grabs this, then sleeps
        time.sleep(0.05)
        f1 = mb.submit(img)          # queued behind the sleeping batch
        f2 = mb.submit(img)
        assert f1.cancel()
        assert f2.result(timeout=60) == 0.0
        assert f0.result(timeout=60) == 0.0
        assert f1.cancelled()
        # dispatcher is still alive and serving
        assert mb.submit(img).result(timeout=60) == 0.0
    assert mb.n_images == 3  # f0, f2, and the liveness probe — not f1


def test_microbatcher_max_pending_backpressure(detector, monkeypatch):
    from mcm_tpu.serve import MicroBatcher, Overloaded

    _slow_fake_scores(detector, monkeypatch)
    img = np.zeros((224, 224, 3), np.uint8)
    with MicroBatcher(detector, max_wait_ms=1, max_pending=2) as mb:
        f0 = mb.submit(img)
        time.sleep(0.05)
        f1 = mb.submit(img)
        with pytest.raises(Overloaded, match="max_pending=2"):
            mb.submit(img)
        assert f0.result(timeout=60) == 0.0
        assert f1.result(timeout=60) == 0.0
        # capacity frees up once futures resolve
        assert mb.submit(img).result(timeout=60) == 0.0


def test_microbatcher_copies_the_submitted_buffer(detector):
    """The caller may recycle its decode buffer immediately after
    submit() — the request must be scored on the submitted pixels."""
    from mcm_tpu.serve import MicroBatcher

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    expected = detector.score_images(img)  # bucket-1, same executable
    buf = img.copy()
    with MicroBatcher(detector, max_wait_ms=200) as mb:
        fut = mb.submit(buf)
        buf[:] = 0  # recycle the buffer while the request is queued
        got = fut.result(timeout=300)
    np.testing.assert_allclose(got, expected[0], rtol=1e-6, atol=1e-7)


def test_maha_serving_accepts_reference_pt_pair(detector, tmp_path):
    """A migrating user's torch template pair (reference
    detection_util.py:175-176 format) loads directly: values identical to
    the npz path, normalize parsed from the filename suffix, contradiction
    still refused."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(5)
    d = 512
    mu = rng.standard_normal((3, d)).astype(np.float32)
    a = rng.standard_normal((d, d)).astype(np.float32)
    prec = (np.eye(d) + 0.01 * (a @ a.T) / d).astype(np.float32)
    mean_path = tmp_path / "CLIP_classwise_mean_pet37_250_False.pt"
    torch.save(torch.from_numpy(mu), mean_path)
    torch.save(torch.from_numpy(prec),
               tmp_path / "CLIP_precision_pet37_250_False.pt")

    with pytest.raises(ValueError, match="contradicts"):
        detector.load_maha_templates(str(mean_path), normalize=True)
    with pytest.raises(ValueError, match="classwise_mean"):
        detector.load_maha_templates(
            str(tmp_path / "CLIP_precision_pet37_250_False.pt"))
    detector.load_maha_templates(str(mean_path))
    try:
        got_mu, got_prec, got_norm = detector._maha
        np.testing.assert_array_equal(np.asarray(got_mu), mu)
        np.testing.assert_array_equal(np.asarray(got_prec), prec)
        assert got_norm is False
    finally:
        detector._maha = None


def test_microbatcher_score_awaits_prefix_on_overload(detector, monkeypatch):
    """score() hitting max_pending mid-batch must await the already-
    submitted prefix before re-raising — their slots were consumed and the
    dispatcher will score them; dropping the futures would leak pending
    work (ADVICE r2)."""
    from mcm_tpu.serve import MicroBatcher, Overloaded

    _slow_fake_scores(detector, monkeypatch)
    imgs = np.zeros((4, 224, 224, 3), np.uint8)
    with MicroBatcher(detector, max_wait_ms=1, max_pending=2) as mb:
        with pytest.raises(Overloaded):
            mb.score(imgs)
        # the prefix was awaited; capacity frees as the done-callbacks run
        # (set_result wakes result() waiters BEFORE callbacks, so poll
        # briefly rather than asserting the counter instantaneously)
        deadline = time.monotonic() + 10
        while mb._outstanding and time.monotonic() < deadline:
            time.sleep(0.01)
        assert mb._outstanding == 0
        assert mb.submit(imgs[0]).result(timeout=60) == 0.0
