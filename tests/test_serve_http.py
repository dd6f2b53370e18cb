"""HTTP serving frontend (mcm_tpu.serve_http): request decode, scoring
through the MicroBatcher, thresholding, metrics, and error paths."""

import base64
import http.client
import io
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def detector():
    from mcm_tpu.serve import OODDetector
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return OODDetector(class_names=["cat", "dog", "owl"],
                           allow_random_weights=True,
                           batch_sizes=(1, 4), n_devices=1)


@pytest.fixture(scope="module")
def server(detector):
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0,
                   max_wait_ms=2.0) as srv:
        yield srv.start()


def _request(server, method, path, body=None, ctype="image/jpeg"):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    try:
        headers = {"Content-Type": ctype} if body is not None else {}
        conn.request(method, path, body=body, headers=headers)
        resp = conn.getresponse()
        return resp.status, resp.read(), dict(resp.getheaders())
    finally:
        conn.close()


def _jpeg_bytes(rng, w=260, h=300, quality=92):
    from PIL import Image
    img = Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_image_bytes_matches_file_pipeline(tmp_path):
    """The request-body decode path must equal the offline file path
    (native mem decode == native file decode; PIL fallback == PIL)."""
    from mcm_tpu.data.transforms import load_image_uint8
    from mcm_tpu.runtime import native
    from mcm_tpu.serve_http import decode_image_bytes

    data = _jpeg_bytes(np.random.default_rng(0))
    p = tmp_path / "img.jpg"
    p.write_bytes(data)

    via_bytes = decode_image_bytes(data)
    if native.native_available():
        via_file = native.decode_one(str(p))
        assert np.array_equal(via_bytes, via_file)
    else:
        assert np.array_equal(via_bytes, load_image_uint8(str(p)))

    # non-JPEG formats ride the PIL fallback
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "PNG")
    png = decode_image_bytes(buf.getvalue())
    assert png.shape == (224, 224, 3)

    with pytest.raises(ValueError):
        decode_image_bytes(b"definitely not an image")


def test_score_single_jpeg_matches_detector(server, detector):
    data = _jpeg_bytes(np.random.default_rng(1))
    status, body, _ = _request(server, "POST", "/v1/score", data)
    assert status == 200
    out = json.loads(body)
    assert len(out["scores"]) == 1

    from mcm_tpu.serve_http import decode_image_bytes
    direct = detector.score_images(decode_image_bytes(data)[None])
    np.testing.assert_allclose(out["scores"], direct, rtol=1e-5, atol=1e-6)


def test_score_json_batch(server, detector):
    rng = np.random.default_rng(2)
    blobs = [_jpeg_bytes(rng, w=230 + 10 * i) for i in range(3)]
    payload = json.dumps(
        {"images_b64": [base64.b64encode(b).decode() for b in blobs]})
    status, body, _ = _request(server, "POST", "/v1/score", payload,
                               ctype="application/json")
    assert status == 200
    out = json.loads(body)
    assert len(out["scores"]) == 3

    from mcm_tpu.serve_http import decode_image_bytes
    imgs = np.stack([decode_image_bytes(b) for b in blobs])
    # the batcher may coalesce into a different compiled bucket than the
    # direct path picks (bf16 tiling differences) — compare loosely
    np.testing.assert_allclose(out["scores"], detector.score_images(imgs),
                               rtol=5e-3, atol=5e-4)


def test_classify_endpoint(server, detector):
    rng = np.random.default_rng(12)
    blobs = [_jpeg_bytes(rng, w=235 + 9 * i) for i in range(3)]
    payload = json.dumps(
        {"images_b64": [base64.b64encode(b).decode() for b in blobs],
         "classify": True})
    status, body, _ = _request(server, "POST", "/v1/score", payload,
                               ctype="application/json")
    assert status == 200
    out = json.loads(body)
    assert len(out["scores"]) == 3
    assert all(n in detector.class_names for n in out["class_name"])
    assert [detector.class_names[i] for i in out["class_index"]] \
        == out["class_name"]

    # single raw body via the query param
    status, body, _ = _request(server, "POST", "/v1/score?classify=1",
                               blobs[0])
    assert status == 200
    out1 = json.loads(body)
    assert out1["class_name"][0] == out["class_name"][0]
    # classify host scores track the device-batched scores loosely
    # (fp32 host logits vs bf16 device scoring)
    np.testing.assert_allclose(out1["scores"], out["scores"][:1],
                               rtol=5e-3, atol=5e-4)


def test_is_id_appears_once_calibrated(server, detector):
    data = _jpeg_bytes(np.random.default_rng(3))
    old = detector.threshold
    try:
        detector.threshold = 0.0  # MCM scores are < 0 → everything ID
        status, body, _ = _request(server, "POST", "/v1/score", data)
        out = json.loads(body)
        assert status == 200
        assert out["threshold"] == 0.0 and out["is_id"] == [True]

        detector.threshold = -2.0  # below the score range → everything OOD
        status, body, _ = _request(server, "POST", "/v1/score", data)
        assert json.loads(body)["is_id"] == [False]
    finally:
        detector.threshold = old


def test_healthz_and_metrics(server):
    status, body, _ = _request(server, "GET", "/healthz")
    assert status == 200
    health = json.loads(body)
    assert health["status"] == "ok"
    assert health["model"] == "ViT-B/16"
    assert health["batch_buckets"] == [1, 4]

    # drive one scored request so counters are non-trivial
    _request(server, "POST", "/v1/score",
             _jpeg_bytes(np.random.default_rng(4)))
    status, body, headers = _request(server, "GET", "/metrics")
    assert status == 200
    text = body.decode()
    assert headers["Content-Type"].startswith("text/plain")
    assert 'mcm_requests_total{endpoint="/v1/score",status="200"}' in text
    assert "mcm_images_total" in text
    assert "mcm_coalescing_ratio" in text
    assert "mcm_score_latency_seconds_count" in text


def test_error_paths(server):
    # unknown path
    status, body, _ = _request(server, "GET", "/nope")
    assert status == 404
    status, body, _ = _request(server, "POST", "/nope", b"x")
    assert status == 404

    # undecodable single image
    status, body, _ = _request(server, "POST", "/v1/score", b"garbage")
    assert status == 400
    assert "undecodable" in json.loads(body)["error"]

    # malformed JSON / wrong schema / bad base64
    for payload in (b"{not json", b'{"images": []}',
                    b'{"images_b64": ["!!!not-b64!!!"]}'):
        status, body, _ = _request(server, "POST", "/v1/score", payload,
                                   ctype="application/json")
        assert status == 400, payload

    # empty batch
    status, body, _ = _request(server, "POST", "/v1/score",
                               b'{"images_b64": []}',
                               ctype="application/json")
    assert status == 400


def test_body_size_limit(detector):
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0,
                   max_body_bytes=1024) as srv:
        srv.start()
        # the oversized body is never read, so the server must drop the
        # keep-alive connection — otherwise the unread bytes would parse
        # as the next request
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        try:
            conn.request("POST", "/v1/score", body=b"x" * 2048,
                         headers={"Content-Type": "image/jpeg"})
            resp = conn.getresponse()
            assert resp.status == 413
            assert resp.getheader("Connection") == "close"
            resp.read()
        finally:
            conn.close()
        # a fresh connection works normally afterwards
        status, body, _ = _request(srv, "GET", "/healthz")
        assert status == 200


def _raw_exchange(server, raw: bytes, timeout=20.0) -> bytes:
    """Send raw bytes, read until the server closes (rejection paths set
    Connection: close, so recv terminates)."""
    import socket
    with socket.create_connection(("127.0.0.1", server.port),
                                  timeout=timeout) as s:
        s.sendall(raw)
        data = b""
        try:
            while True:
                chunk = s.recv(65536)
                if not chunk:
                    break
                data += chunk
        except TimeoutError:
            pass
        return data


def test_chunked_transfer_rejected(server):
    """http.server can't frame chunked bodies; RFC 7230 requires 501 +
    close instead of silently framing by Content-Length (CL.TE request
    smuggling)."""
    resp = _raw_exchange(server, (
        b"POST /v1/score HTTP/1.1\r\nHost: x\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n0\r\n\r\n"))
    assert resp.startswith(b"HTTP/1.1 501")
    assert b"connection: close" in resp.lower()


def test_conflicting_content_lengths_rejected(server):
    """Differing duplicate Content-Lengths = framing attack → 400 + close
    (RFC 7230 3.3.2), never 'pick one'."""
    resp = _raw_exchange(server, (
        b"POST /v1/score HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 5\r\nContent-Length: 100\r\n\r\nxxxxx"))
    assert resp.startswith(b"HTTP/1.1 400")


def test_malformed_content_length_rejected(server):
    """int() would accept '1_6'/'+16'/unicode digits that an intermediary
    frames differently — must be 400 (not 413) + close."""
    for bad in (b"1_6", b"+16", b"abc"):
        resp = _raw_exchange(server, (
            b"POST /v1/score HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: " + bad + b"\r\n\r\n"))
        assert resp.startswith(b"HTTP/1.1 400"), bad


def test_post_unknown_path_closes_connection(server):
    """A 404'd POST's unread body must not be parsed as the next request
    on the keep-alive connection (connection desync): exactly one
    response comes back and the smuggled request inside the body is
    never answered."""
    body = b"GET /metrics HTTP/1.1\r\nHost: x\r\n\r\n"
    resp = _raw_exchange(server, (
        b"POST /nope HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body))
    assert resp.startswith(b"HTTP/1.1 404")
    assert resp.lower().count(b"http/1.1 ") == 1, "smuggled request answered"
    assert b"mcm_requests_total" not in resp


def test_body_read_deadline(detector):
    """A byte-trickling client resets the per-recv idle timeout forever;
    the whole-body deadline must cut it off with 408 + close (otherwise
    one trickler pins a handler thread and blocks graceful drain)."""
    import socket
    import time as _time

    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0) as srv:
        srv.start()
        srv._httpd.RequestHandlerClass.body_deadline_s = 0.5
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=20) as s:
            s.sendall(b"POST /v1/score HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: 10\r\n\r\nab")
            _time.sleep(0.9)
            s.sendall(b"c")  # still 7 bytes short; deadline passed
            data = b""
            while True:
                chunk = s.recv(65536)
                if not chunk:
                    break
                data += chunk
        assert b"408" in data.split(b"\r\n", 1)[0]


def test_too_many_images_rejected(detector):
    from mcm_tpu.serve_http import OODServer
    rng = np.random.default_rng(3)
    tiny = base64.b64encode(_jpeg_bytes(rng, w=32, h=32)).decode()
    with OODServer(detector, host="127.0.0.1", port=0,
                   max_images_per_request=4) as srv:
        srv.start()
        status, body, _ = _request(
            srv, "POST", "/v1/score",
            json.dumps({"images_b64": [tiny] * 5}).encode(),
            ctype="application/json")
        assert status == 400
        assert "too many images" in json.loads(body)["error"]
        status, _, _ = _request(
            srv, "POST", "/v1/score",
            json.dumps({"images_b64": [tiny] * 4}).encode(),
            ctype="application/json")
        assert status == 200


def test_decompression_bomb_image_rejected(server):
    """Bytes declaring huge pixel dims must 400 on BOTH decode paths: the
    native decoder's bomb guard refuses, and the PIL fallback enforces
    the same cap instead of decoding up to ~534 MB with a warning."""
    rng = np.random.default_rng(4)
    data = bytearray(_jpeg_bytes(rng, w=64, h=48))
    i = 2  # patch the SOF dims (see tests/test_native.py)
    while True:
        marker, seg_len = data[i + 1], int.from_bytes(data[i + 2:i + 4],
                                                      "big")
        if marker in (0xC0, 0xC2):
            data[i + 5:i + 9] = (60000).to_bytes(2, "big") * 2
            break
        i += 2 + seg_len
    status, body, _ = _request(server, "POST", "/v1/score", bytes(data))
    assert status == 400
    err = json.loads(body)["error"]
    assert "declares" in err or "undecodable" in err


def test_backend_errors_not_leaked(detector):
    """RuntimeError text (XLA/driver internals, host paths) must go to the
    server log, not the client body."""
    from mcm_tpu.serve_http import OODServer
    rng = np.random.default_rng(5)
    with OODServer(detector, host="127.0.0.1", port=0) as srv:
        srv.start()

        def boom(images):
            raise RuntimeError("secret /root/internal/path deadbeef")

        srv.batcher.score = boom
        status, body, _ = _request(srv, "POST", "/v1/score",
                                   _jpeg_bytes(rng))
        assert status == 503
        assert b"secret" not in body and b"deadbeef" not in body
        assert json.loads(body)["error"] == "backend unavailable"


def test_unknown_paths_share_one_metrics_label(detector):
    """Client-controlled paths must not create unbounded metric keys (or
    inject Prometheus labels via quotes)."""
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0) as srv:
        srv.start()
        for path in ('/scan1', '/scan2', '/x%22injected'):
            status, _, _ = _request(srv, "GET", path)
            assert status == 404
        status, body, _ = _request(srv, "GET", "/metrics")
        text = body.decode()
        assert 'mcm_requests_total{endpoint="other",status="404"} 3' in text
        assert "scan1" not in text and "injected" not in text


def test_bind_failure_does_not_leak_dispatcher(detector):
    import socket
    import threading

    from mcm_tpu.serve_http import OODServer

    def batcher_threads():
        return sum(1 for t in threading.enumerate()
                   if t.name == "mcm-microbatcher")

    with socket.socket() as blocker:
        blocker.bind(("127.0.0.1", 0))
        blocker.listen(1)
        port = blocker.getsockname()[1]
        before = batcher_threads()
        with pytest.raises(OSError):
            OODServer(detector, host="127.0.0.1", port=port)
        assert batcher_threads() == before


def test_overload_sheds_with_503(detector):
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0,
                   max_pending=0) as srv:   # zero headroom → always shed
        srv.start()
        data = _jpeg_bytes(np.random.default_rng(5))
        status, body, _ = _request(srv, "POST", "/v1/score", data)
        assert status == 503
        # classify bypasses the batcher but sheds against the same budget
        status, body, _ = _request(srv, "POST", "/v1/score?classify=1",
                                   data)
        assert status == 503
        status, body, _ = _request(srv, "GET", "/metrics")
        assert "mcm_overloaded_total 2" in body.decode()


def test_concurrent_clients_coalesce(server, detector):
    """N parallel single-image clients should land in fewer device
    batches than N (the MicroBatcher's whole point)."""
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.default_rng(6)
    blobs = [_jpeg_bytes(rng, w=240 + i) for i in range(8)]
    before = server.batcher.n_batches
    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(
            lambda b: _request(server, "POST", "/v1/score", b), blobs))
    assert all(status == 200 for status, _, _ in results)
    used = server.batcher.n_batches - before
    # <=6 (not just <8): a batcher that coalesced once in eight requests
    # would pass a bare `used < len(blobs)` while near-totally failing at
    # its job (review finding, round 5); the ratio bound lives in
    # test_serve.py's 40-request sibling, this pins the HTTP path
    assert used <= 6, f"barely coalescing: {used} batches for 8 reqs"


def test_decode_images_bulk_pool_and_fallback(tmp_path):
    """The bulk path (native thread-pool mem decode) must match the
    per-image path row for row, fall back per failed row, and name the
    first undecodable row."""
    from mcm_tpu.serve_http import decode_image_bytes, decode_images_bulk

    rng = np.random.default_rng(8)
    blobs = [_jpeg_bytes(rng, w=250 + 7 * i) for i in range(4)]
    # a PNG exercises the per-row PIL fallback inside an otherwise
    # native-decoded batch
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (80, 90, 3), dtype=np.uint8)
                    ).save(buf, "PNG")
    blobs.append(buf.getvalue())

    bulk = decode_images_bulk(blobs)
    for got, data in zip(bulk, blobs):
        assert np.array_equal(got, decode_image_bytes(data))

    with pytest.raises(ValueError, match=r"images_b64\[1\]"):
        decode_images_bulk([blobs[0], b"junk", blobs[2]])


def test_native_decode_mem_batch_matches_single():
    from mcm_tpu.runtime import native
    if not native.native_available():
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(9)
    blobs = [_jpeg_bytes(rng, w=300, h=240 + 16 * i) for i in range(3)]
    blobs.insert(1, b"not a jpeg")
    batch, status = native.decode_mem_batch(blobs, n_threads=2)
    if batch is None:
        pytest.skip("prebuilt library without mcm_decode_mem_batch")
    assert list(status != 0) == [False, True, False, False]
    for i, data in enumerate(blobs):
        if status[i] == 0:
            assert np.array_equal(batch[i], native.decode_one_mem(data))


def _spawn_cli_server(tmp_path, extra_args=(), extra_env=None):
    """Start `python -m mcm_tpu.serve_http` on a free port with the tiny
    B/16 double on CPU; returns (proc, port)."""
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    names = tmp_path / "names.txt"
    names.write_text("cat\ndog\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               MCM_TPU_TEST_TINY_B16="1")
    env.update(extra_env or {})
    proc = subprocess.Popen(
        [sys.executable, "-m", "mcm_tpu.serve_http",
         "--classnames-file", str(names), "--allow-random-weights",
         "--host", "127.0.0.1", "--port", str(port),
         *extra_args],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    return proc, port


def test_sigterm_drains_and_exits(tmp_path):
    """The CLI server must exit 0 on SIGTERM after draining (a killed
    replica must not drop in-flight scores)."""
    import signal
    import time

    proc, port = _spawn_cli_server(tmp_path,
                                   extra_args=("--batch-buckets", "1,4"))
    try:
        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                status, body, _ = _request(
                    type("S", (), {"port": port}), "GET", "/healthz")
                up = status == 200
                break
            except OSError:
                time.sleep(0.5)
        assert up, "server never came up"
        # one scored request proves the pipeline, then drain
        data = _jpeg_bytes(np.random.default_rng(10))
        status, _, _ = _request(type("S", (), {"port": port}), "POST",
                                "/v1/score", data)
        assert status == 200
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out[-2000:]
        assert "shutdown complete" in out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()


def test_cli_server_on_dp_mesh(tmp_path):
    """--n-devices spans the serving mesh (2 virtual CPU devices here);
    buckets divide the data axis and requests score normally."""
    import time

    proc, port = _spawn_cli_server(
        tmp_path,
        extra_args=("--batch-buckets", "2,4", "--n-devices", "2"),
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    try:
        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                status, body, _ = _request(
                    type("S", (), {"port": port}), "GET", "/healthz")
                up = status == 200
                break
            except OSError:
                time.sleep(0.5)
        assert up, "mesh server never came up"
        assert json.loads(body)["batch_buckets"] == [2, 4]
        data = _jpeg_bytes(np.random.default_rng(11))
        status, body, _ = _request(type("S", (), {"port": port}), "POST",
                                   "/v1/score", data)
        assert status == 200
        assert len(json.loads(body)["scores"]) == 1
    finally:
        proc.terminate()
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out[-2000:]


def test_cli_classnames_file(tmp_path):
    """--classnames-file parsing (no server start)."""
    from mcm_tpu.serve_http import _load_class_names

    f = tmp_path / "names.txt"
    f.write_text("alpha\n\nbeta\n  gamma  \n")

    class A:
        classnames_file = str(f)
        in_dataset = None
    assert _load_class_names(A()) == ["alpha", "beta", "gamma"]

    class B:
        classnames_file = None
        in_dataset = "ImageNet10"
    names = _load_class_names(B())
    assert len(names) == 10

    class C:
        classnames_file = None
        in_dataset = "pet37"  # needs dataset metadata → helpful error
    with pytest.raises(SystemExit, match="classnames-file"):
        _load_class_names(C())


# -- round-5 serving-hardening review fixes ---------------------------------


def test_metrics_overloaded_counts_only_shed():
    """mcm_overloaded_total must count genuine load shedding, not every
    503: a 'backend unavailable' failure on an idle replica would
    otherwise read as traffic overload to autoscalers (review finding,
    round 5)."""
    from mcm_tpu.serve_http import ServeMetrics
    m = ServeMetrics()
    m.record("/v1/score", 503)             # backend failure: not shed
    assert m.overloaded == 0
    m.record("/v1/score", 503, shed=True)  # load shed
    m.record("connection", 503, shed=True)
    assert m.overloaded == 2
    assert m.requests[("/v1/score", 503)] == 2


def test_healthz_tracks_batcher_liveness(detector):
    """/healthz must flip to 503 once the dispatcher is gone (crash or
    drain) — a load balancer probing it otherwise keeps routing to a
    replica whose every score request 503s (review finding, round 5)."""
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0) as srv:
        srv.start()
        status, body, _ = _request(srv, "GET", "/healthz")
        assert status == 200 and json.loads(body)["status"] == "ok"
        srv.batcher.close()   # as after a dispatcher crash
        status, body, _ = _request(srv, "GET", "/healthz")
        assert status == 503
        assert json.loads(body)["status"] == "unavailable"


def test_classify_refusal_is_a_400_not_a_dropped_connection(server,
                                                            monkeypatch):
    """A ValueError out of the scoring call (e.g. ?classify=1 on a score
    family without a host-from-logits form) must surface as the client's
    400, not abort the connection with a server traceback (review
    finding, round 5)."""
    def refuse(images):
        raise ValueError("classify_images supports ... use score_images")
    monkeypatch.setattr(server.detector, "classify_images", refuse)
    rng = np.random.default_rng(7)
    status, body, _ = _request(server, "POST", "/v1/score?classify=1",
                               body=_jpeg_bytes(rng))
    assert status == 400
    assert "score_images" in json.loads(body)["error"]


def test_connection_cap_sheds_with_raw_503(detector):
    """Past max_connections, a new connection gets an immediate 503
    WITHOUT the server reading (or buffering) anything from it — the cap
    is what bounds aggregate body memory (review finding, round 5)."""
    import socket
    import time as _time
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0,
                   max_connections=1) as srv:
        srv.start()
        # occupy the single slot with an idle connection (its handler
        # thread blocks in the header read)
        holder = socket.create_connection(("127.0.0.1", srv.port),
                                          timeout=10)
        try:
            deadline = _time.monotonic() + 10
            while srv._conn_slots._value != 0:  # noqa: SLF001 — test-only
                assert _time.monotonic() < deadline, "slot never acquired"
                _time.sleep(0.01)
            status, body, _ = _request(srv, "GET", "/healthz")
            assert status == 503
            assert "too many connections" in json.loads(body)["error"]
        finally:
            holder.close()
        # slot released → next request serves normally
        deadline = _time.monotonic() + 10
        while srv._conn_slots._value != 1:  # noqa: SLF001
            assert _time.monotonic() < deadline, "slot never released"
            _time.sleep(0.01)
        status, _, _ = _request(srv, "GET", "/healthz")
        assert status == 200


def test_header_trickle_hits_deadline(detector):
    """A client trickling headers (or idling mid-header) must lose its
    connection at header_deadline_s — the per-recv idle timeout alone
    resets on every byte, letting a slowloris client pin a non-daemon
    handler thread and hang graceful drain (review finding, round 5)."""
    import socket
    from mcm_tpu.serve_http import OODServer
    with OODServer(detector, host="127.0.0.1", port=0) as srv:
        srv._httpd.RequestHandlerClass.header_deadline_s = 1.0
        srv.start()
        conn = socket.create_connection(("127.0.0.1", srv.port),
                                        timeout=15)
        try:
            # partial request: headers never complete
            conn.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n")
            # server must close (recv -> b"") rather than wait forever
            conn.settimeout(15)
            assert conn.recv(1024) == b""
        finally:
            conn.close()


def test_close_without_start_does_not_deadlock(detector):
    """`with OODServer(...)` whose body raises before start(): __exit__'s
    close() used to call shutdown(), which waits on an event only
    serve_forever() ever sets — deadlock (review finding, round 5)."""
    import threading
    from mcm_tpu.serve_http import OODServer
    srv = OODServer(detector, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.close, daemon=True)
    t.start()
    t.join(timeout=20)
    assert not t.is_alive(), "close() deadlocked on a never-started server"
