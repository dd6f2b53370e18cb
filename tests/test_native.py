"""Native C++ decoder: parity vs the PIL pipeline, fallback, threading."""

import os

import numpy as np
import pytest
from PIL import Image

from mcm_tpu.data.transforms import load_image_uint8
from mcm_tpu.runtime.native import (decode_batch, decode_one,
                                    native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native decoder unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jpegs")
    paths = []
    shapes = [(300, 400), (400, 300), (224, 224), (100, 80), (1000, 700)]
    for i, (h, w) in enumerate(shapes):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([yy % 256, xx % 256, (yy + xx) % 256],
                       -1).astype(np.uint8)
        p = str(tmp / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    # grayscale jpeg
    g = str(tmp / "gray.jpg")
    Image.fromarray((np.mgrid[0:50, 0:70][0] % 256).astype(np.uint8),
                    "L").save(g)
    paths.append(g)
    # a PNG (native can't decode → fallback territory)
    png = str(tmp / "img.png")
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(png)
    return paths, png


def test_decode_parity_vs_pil(jpegs):
    paths, _ = jpegs
    for p in paths:
        ref = load_image_uint8(p, 224).astype(np.int32)
        got = decode_one(p, 224)
        assert got is not None, p
        diff = np.abs(ref - got.astype(np.int32))
        assert diff.max() <= 2, (p, diff.max())
        assert diff.mean() < 0.5, (p, diff.mean())


def test_fast_mode_close(jpegs):
    paths, _ = jpegs
    big = paths[4]  # 1000x700 — prescale kicks in
    ref = load_image_uint8(big, 224).astype(np.float64)
    got = decode_one(big, 224, fast=True).astype(np.float64)
    assert np.abs(ref - got).mean() < 4.0  # prescale is approximate


def test_decode_batch_with_failures(jpegs):
    paths, png = jpegs
    batch_paths = [paths[0], png, paths[1], "/nonexistent.jpg"]
    out, status = decode_batch(batch_paths, 128, n_threads=4)
    assert out.shape == (4, 128, 128, 3)
    assert status[0] == 0 and status[2] == 0
    assert status[1] != 0 and status[3] != 0  # png + missing fail over


def test_pipeline_uses_native_with_png_fallback(tmp_path, jpegs):
    """Mixed jpg/png tree: pipeline decodes both (native + PIL fallback)."""
    paths, png = jpegs
    import shutil
    root = tmp_path / "cls"
    root.mkdir()
    shutil.copy(paths[0], root / "a.jpg")
    shutil.copy(png, root / "b.png")
    from mcm_tpu.data import DataPipeline, ImageFolder
    ds = ImageFolder(str(tmp_path))
    pipe = DataPipeline(ds, batch_size=2, image_size=64)
    assert pipe.use_native
    batches = list(pipe)
    assert len(batches) == 1 and batches[0].valid == 2
    assert batches[0].images.shape == (2, 64, 64, 3)


def test_crop_rounding_matches_python_round(tmp_path):
    """(resized_dim - 224) odd → offset x.5: must use banker's rounding like
    Python round()/torchvision, not round-half-away (confirmed review bug)."""
    # 336x446 → resize shorter 336→224 gives 224x297; (297-224)/2 = 36.5
    yy, xx = np.mgrid[0:446, 0:336]
    img = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1).astype(np.uint8)
    p = str(tmp_path / "odd.jpg")
    Image.fromarray(img).save(p, quality=95)
    ref = load_image_uint8(p, 224).astype(np.int32)
    got = decode_one(p, 224).astype(np.int32)
    diff = np.abs(ref - got)
    assert diff.max() <= 2, diff.max()


def test_truncated_jpeg_fails_native_and_falls_back(tmp_path):
    """Corrupt-entropy JPEGs decode as libjpeg *warnings* (gray fill, rc=0
    by default) — the native path must report failure so the PIL fallback
    reproduces the reference's behavior for such files."""
    import numpy as np
    from PIL import Image

    from mcm_tpu.runtime.native import decode_batch, native_available
    if not native_available():
        pytest.skip("no native decoder")
    good = tmp_path / "good.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
                    ).save(good, quality=90)
    data = good.read_bytes()
    bad = tmp_path / "trunc.jpg"
    bad.write_bytes(data[: len(data) // 2])  # cut mid-scan

    out, status = decode_batch([str(good), str(bad)], size=64, n_threads=1)
    assert status[0] == 0
    assert status[1] != 0, "truncated JPEG must not decode 'successfully'"


def test_extraneous_data_jpeg_decodes_natively(tmp_path):
    """Junk bytes before a marker (JWRN_EXTRANEOUS_DATA) leave decoded
    pixels untouched and PIL accepts such files — the native path must
    classify that warning as benign and decode in place rather than
    punting every such file to the slow per-image PIL fallback."""
    import numpy as np
    from PIL import Image

    from mcm_tpu.runtime.native import decode_batch, native_available
    if not native_available():
        pytest.skip("no native decoder")
    good = tmp_path / "good.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
                    ).save(good, quality=90)
    data = good.read_bytes()
    assert data.endswith(b"\xff\xd9")
    bad = tmp_path / "extraneous.jpg"
    # Junk (no 0xFF bytes) before EOI -> "N extraneous bytes before 0xd9"
    bad.write_bytes(data[:-2] + bytes([1, 2, 3, 4] * 8) + b"\xff\xd9")
    im = Image.open(bad)
    im.load()  # PIL accepts this file without raising

    out, status = decode_batch([str(good), str(bad)], size=64, n_threads=1)
    assert status[0] == 0
    assert status[1] == 0, "benign extraneous-data warning must not fail"
    assert np.array_equal(out[0], out[1]), "pixels must be unaffected"


def _patch_sof_dims(data: bytes, h: int, w: int) -> bytes:
    """Rewrite the SOF0/SOF2 declared dimensions of a baseline JPEG."""
    i = 2
    while i < len(data) - 1:
        assert data[i] == 0xFF, "marker stream desync"
        marker = data[i + 1]
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        if marker in (0xC0, 0xC2):  # SOF0 / SOF2: [len][prec][h:2][w:2]...
            return (data[:i + 5] + h.to_bytes(2, "big")
                    + w.to_bytes(2, "big") + data[i + 9:])
        i += 2 + seg_len
    raise AssertionError("no SOF marker found")


def test_decompression_bomb_rejected(tmp_path):
    """A tiny JPEG whose SOF header declares huge dimensions must fail the
    native decode (status != 0) instead of allocating gigabytes per pool
    thread — the serving path feeds untrusted bytes (decoder.cpp bomb
    guard, capped at PIL's default MAX_IMAGE_PIXELS so accepted images
    behave identically to the PIL fallback)."""
    import time

    from mcm_tpu.runtime.native import decode_one_mem

    good = tmp_path / "good.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
                    ).save(good, quality=90)
    bomb = _patch_sof_dims(good.read_bytes(), 60000, 60000)
    t0 = time.perf_counter()
    assert decode_one_mem(bomb, 64) is None
    assert time.perf_counter() - t0 < 5.0, "reject must be header-time"
    # the real image still decodes (guard is far above normal photos)
    assert decode_one_mem(good.read_bytes(), 64) is not None
    # file path takes the same guard
    p = tmp_path / "bomb.jpg"
    p.write_bytes(bomb)
    assert decode_one(str(p), 64) is None


def test_decode_batch_into_preallocated_out(jpegs):
    """out= decodes in place (the pipeline's zero-copy path) and rejects
    wrong buffers."""
    paths, _ = jpegs
    ref, status_ref = decode_batch(paths[:3], 96, n_threads=2)
    buf = np.empty((3, 96, 96, 3), dtype=np.uint8)
    out, status = decode_batch(paths[:3], 96, n_threads=2, out=buf)
    assert out is buf
    np.testing.assert_array_equal(status, status_ref)
    np.testing.assert_array_equal(buf, ref)
    with pytest.raises(ValueError, match="C-contiguous"):
        decode_batch(paths[:3], 96,
                     out=np.empty((3, 96, 96, 3), np.uint8)[:, ::2])
    with pytest.raises(ValueError, match="C-contiguous"):
        decode_batch(paths[:3], 96, out=np.empty((2, 96, 96, 3), np.uint8))


def test_pipeline_early_exit_joins_producer(tmp_path, jpegs):
    """Breaking out of a pipeline iteration must not leave the producer
    decoding in the background (it would silently contend with the next
    pipeline on a small host)."""
    import threading

    from mcm_tpu.data.pipeline import DataPipeline

    paths, _ = jpegs
    ds = [(p, 0) for p in paths[:5]] * 8  # several batches
    pipe = DataPipeline(ds, batch_size=4, image_size=64, num_workers=2)
    it = iter(pipe)
    batch = next(it)
    assert batch.images.shape == (4, 64, 64, 3)
    it.close()  # triggers the finally: stop + drain + join
    assert not any(t.name == "mcm-pipeline-producer"
                   for t in threading.enumerate())


def test_host_tag_staleness(tmp_path, monkeypatch):
    """A cached .so built on a different CPU (mismatched host tag) must be
    treated as stale — -march=native code would SIGILL, and dlopen can't
    catch that."""
    from mcm_tpu.runtime import native
    if not native.native_available():
        pytest.skip("no native decoder")
    assert not native._is_stale()
    with open(native._TAG, "w") as f:
        f.write("othermachine:deadbeef")
    try:
        assert native._is_stale()
    finally:
        with open(native._TAG, "w") as f:
            f.write(native._host_tag())
    assert not native._is_stale()
