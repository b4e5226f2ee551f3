"""Batching decode/feature server — the serving face of the framework.

The reference's only scale story is a thread pool over files inside one
process (demo_live_extract.py:576-586).  This module serves the TPU batch
pipeline over HTTP with admission batching: concurrent requests are
collected for up to ``max_wait_ms`` (or until ``max_batch`` blobs) and
decoded as ONE corpus batch — exactly the regime the device pipeline is
built for (same-signature streams share executables; per-stream error
isolation keeps a poison request from failing its batchmates).

Endpoints (stdlib http.server; no external dependencies):

  POST /decode?fmt=i16|f32[&start=S&end=E][&recover=1]   body: ogg bytes
      -> 200, X-Sample-Rate/X-Channels/X-Samples headers, raw PCM
         ([C, N] row-major, int16 LE or float32 LE); start/end select a
         sample range decoded via the seek path (only the pages covering
         the range are parsed — random access into long files);
         recover=1 opts into the corruption-tolerant decode (resync past
         damage; X-Holes/X-Approximate carry JSON absolute sample ranges
         that were zero-filled / best-effort placed, X-Damage-Bytes the
         skipped byte count, X-Start-Sample the window origin —
         runtime/batch.decode_bytes_recover).  recover composes with
         start/end: random access into damaged files at O(range) cost
  POST /features?dim=64&kind=floor_final_ys[&device=1][&start=S&end=E]
      body: ogg bytes
      -> 200, X-Rows/X-Dim headers, raw float32 [rows, dim].
      start/end crop to the feature rows of exactly the packets emitting
      samples in [S, E) — only the covering pages are parsed, each row
      bit-identical to the full extraction's (features/batched.
      get_features_range).  Cropped responses append the rows' absolute
      audio-packet indices (int64 LE, X-Row-Packets: i64) after the
      matrix and carry X-First-Packet/X-Start-Sample/X-End-Sample/
      X-Sample-Rate; crops always run the host extractor numerics.
  GET  /stats
      -> JSON: request/batch counters (batched > requests/batches proves
         admission batching engaged)

Usage:
    server = DecodeServer(max_batch=64, max_wait_ms=20)
    server.start()          # returns the bound port
    ...
    server.stop()

or ``python -m parseoggvorbis_tpu.serving --port 8080``.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class _Pending:
    """One enqueued request, fulfilled by the batcher thread."""

    def __init__(self, blob: bytes, kind: str, opts: dict):
        self.blob = blob
        self.kind = kind  # "decode" | "features" | "recover"
        self.opts = opts
        self.done = threading.Event()
        self.result = None
        self.error: Optional[str] = None

    def fail(self, msg: str) -> None:
        self.error = msg
        self.done.set()


class _Batcher(threading.Thread):
    """Admission batching: drain the queue into one decode_corpus call.

    Waits up to ``max_wait_ms`` for the batch to fill once the first
    request arrives — latency is bounded while throughput requests
    coalesce into large device batches.
    """

    def __init__(self, max_batch: int, max_wait_ms: float, mesh=None,
                 route=None):
        super().__init__(daemon=True, name="pov-serving-batcher")
        self.q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.mesh = mesh  # jax.sharding.Mesh: shard decode batches over it
        if route is None and mesh is None and not os.environ.get("POV_ROUTE"):
            # serving default: the link-aware router.  decode_corpus's own
            # bare default stays "device" (library compat), but a server is
            # the production face: on a tunnel-capped host the device route
            # serves ~100x realtime where native serves ~900x, and a 900 s
            # soak showed the tunnel client layer growing per device
            # dispatch (framework-only soak is flat — ROUND5.md §18).
            # POV_ROUTE and an explicit route= still override.
            route = "auto"
        self.route = route  # decode_corpus backend (None = POV_ROUTE env)
        # ranged/recover requests run per-request (isolated); dispatching
        # them to a pool keeps one slow full-file recover from stalling
        # the batcher thread (each pending has its own done event)
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=4,
                                        thread_name_prefix="pov-serving-pr")
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "batched": 0,
                       "errors": 0}
        self._stopping = False

    def _count(self, key: str, delta: int = 1) -> None:
        with self._stats_lock:
            self._stats[key] += delta

    @property
    def stats(self) -> dict:
        with self._stats_lock:
            out = dict(self._stats)
        # observability: the configured decode route ("auto" = link-aware
        # default; null = POV_ROUTE env / decode_corpus default)
        out["route"] = self.route
        return out

    def submit(self, p: _Pending) -> None:
        if self._stopping:
            p.fail("server shutting down")
            return
        self._count("requests")
        self.q.put(p)
        # close the submit/stop race: a request enqueued after stop()'s
        # drain would otherwise sit unanswered until the client timeout.
        # Re-checking after the put means either stop()'s drain sees it,
        # or this fail() does (failing twice is harmless: done is an Event).
        if self._stopping:
            p.fail("server shutting down")

    def stop(self) -> None:
        self._stopping = True
        # fail anything still queued so handlers return promptly instead
        # of blocking out their full wait timeout
        while True:
            try:
                p = self.q.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                p.fail("server shutting down")
        # wake the run loop AFTER the drain (draining first could consume
        # the sentinel and leave the thread blocked in q.get forever)
        self.q.put(None)
        # in-flight per-request work (ranged/recover/feature crops)
        # completes and answers its own pendings; no new work after this
        self._pool.shutdown(wait=False)

    def run(self) -> None:
        import time

        while not self._stopping:
            first = self.q.get()
            if first is None:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            self._count("batches")
            self._count("batched", len(batch))
            try:
                self._run_batch(batch)
            except Exception as exc:  # defensive: never kill the thread
                # pool-dispatched pendings (ranged/recover/crops) answer
                # for themselves; failing them here would override their
                # isolated success/failure
                owned = [p for p in batch
                         if not getattr(p, "detached", False)]
                self._count("errors", len(owned))
                for p in owned:
                    p.fail("batch failed: %s" % exc)
        # drain on exit: fail anything that raced past stop()
        while True:
            try:
                p = self.q.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                p.fail("server shutting down")

    def _run_batch(self, batch: List[_Pending]) -> None:
        from .runtime.batch import decode_corpus, decode_sample_range

        all_decodes = [p for p in batch if p.kind == "decode"]
        # range requests decode only their pages via the seek path; each is
        # one small dispatch, isolated per request (a bad blob must not
        # fail its batchmates)
        ranged = [p for p in all_decodes
                  if "start" in p.opts or "end" in p.opts]
        decodes = [p for p in all_decodes if p not in ranged]
        feats = [p for p in batch if p.kind == "features"]

        def run_ranged(p):
            try:
                out = decode_sample_range(
                    p.blob, p.opts.get("start", 0), p.opts.get("end"),
                    out_i16=p.opts.get("fmt", "i16") == "i16")
                p.result = (out.pcm, out.sample_rate)
                p.done.set()
            except Exception as exc:
                self._count("errors")
                p.fail(str(exc))

        def run_recover(p):
            from .runtime.batch import decode_bytes_recover

            try:
                p.result = decode_bytes_recover(
                    p.blob, out_i16=p.opts.get("fmt", "i16") == "i16",
                    start=p.opts.get("start", 0), end=p.opts.get("end"))
                p.done.set()
            except Exception as exc:
                self._count("errors")
                p.fail(str(exc))

        for p in ranged:
            p.detached = True  # owned by the pool: exempt from the
            # batch-level defensive fail in run()
            self._pool.submit(run_ranged, p)
        for p in batch:  # recovery decodes, per-request isolated too
            if p.kind == "recover":
                p.detached = True
                self._pool.submit(run_recover, p)

        if decodes:
            outs = decode_corpus(
                [p.blob for p in decodes], strict=False,
                out_i16=all(p.opts.get("fmt", "i16") == "i16"
                            for p in decodes),
                mesh=self.mesh, route=self.route,
            )
            # chained files expand to multiple streams; serve the first
            # stream of each blob (blob_index maps outputs back)
            by_blob = {}
            for o in outs:
                by_blob.setdefault(o.blob_index, o)
            for i, p in enumerate(decodes):
                o = by_blob.get(i)
                if o is None or not o.ok:
                    self._count("errors")
                    p.fail(o.error if o is not None else "no output")
                else:
                    pcm = o.pcm
                    if p.opts.get("fmt", "i16") == "i16" \
                            and pcm.dtype != np.int16:
                        from .runtime.batch import pcm_f32_to_i16

                        pcm = pcm_f32_to_i16(pcm)
                    p.result = (pcm, o.sample_rate)
                    p.done.set()

        if feats:
            from .features.batched import get_features_batched, \
                get_features_range

            # cropped feature requests run per-request via the seek splice
            # (only the covering pages parse; host extractor numerics),
            # isolated like ranged decodes
            ranged_f = [p for p in feats
                        if "start" in p.opts or "end" in p.opts]
            feats = [p for p in feats if p not in ranged_f]

            def run_feature_crop(p):
                try:
                    p.result = get_features_range(
                        p.blob, p.opts.get("dim", 64),
                        p.opts.get("start", 0), p.opts.get("end"),
                        kind=p.opts.get("kind", "floor_final_ys"))
                    p.done.set()
                except Exception as exc:
                    self._count("errors")
                    p.fail(str(exc))

            for p in ranged_f:
                p.detached = True
                self._pool.submit(run_feature_crop, p)

            # group by (dim, kind, device): the device flag is part of the
            # numeric contract (residue kinds differ ~1e-6 between paths),
            # so one request's option must not leak onto its batchmates
            groups = {}
            for p in feats:
                # dim was validated/converted in do_POST: nothing here can
                # raise from one request's malformed input and poison the
                # whole admission batch via run()'s defensive catch
                groups.setdefault((p.opts.get("dim", 64),
                                   p.opts.get("kind", "floor_final_ys"),
                                   bool(p.opts.get("device"))),
                                  []).append(p)
            for (dim, kind, device), ps in groups.items():
                try:
                    mats = get_features_batched(
                        [p.blob for p in ps], dim, kind=kind, device=device)
                except Exception as exc:
                    self._count("errors", len(ps))
                    for p in ps:
                        p.fail(str(exc))
                    continue
                for p, m in zip(ps, mats):
                    p.result = m
                    p.done.set()


class _Handler(BaseHTTPRequestHandler):
    server_version = "parseoggvorbis_tpu/serving"

    def log_message(self, *args):  # quiet by default
        pass

    @property
    def batcher(self) -> _Batcher:
        return self.server.batcher  # type: ignore[attr-defined]

    def do_GET(self):
        if urlparse(self.path).path != "/stats":
            self.send_error(404)
            return
        body = json.dumps(self.batcher.stats).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        url = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(url.query).items()}
        length = int(self.headers.get("Content-Length", "0"))
        blob = self.rfile.read(length)
        # validate/convert every query param HERE: a malformed value must
        # 400 this one request, never raise inside the batcher where the
        # defensive catch would fail the whole admission batch
        try:
            timeout = float(qs.get("timeout", "300"))
        except ValueError:
            self.send_error(400, "bad timeout value")
            return
        if url.path == "/decode":
            fmt = qs.get("fmt", "i16")
            if fmt not in ("i16", "f32"):
                self.send_error(400, "fmt must be i16 or f32")
                return
            opts = {"fmt": fmt}
            # optional sample range (sample-exact seek): only the pages
            # covering [start, end) are decoded (runtime/batch.py)
            for key in ("start", "end"):
                if key in qs:
                    try:
                        opts[key] = int(qs[key])
                    except ValueError:
                        self.send_error(400, "bad %s value" % key)
                        return
            if "end" in opts and opts["end"] < opts.get("start", 0):
                self.send_error(400, "end must be >= start")
                return
            if qs.get("recover") == "1":
                # start/end window the recovery (random access into
                # damaged files, O(range) — runtime/batch.py)
                p = _Pending(blob, "recover", opts)
            else:
                p = _Pending(blob, "decode", opts)
        elif url.path == "/features":
            try:
                dim = int(qs.get("dim", "64"))
            except ValueError:
                dim = -1
            if dim <= 0:
                self.send_error(400, "dim must be a positive integer")
                return
            opts = {
                "dim": dim,
                "kind": qs.get("kind", "floor_final_ys"),
                "device": qs.get("device") == "1",
            }
            # optional crop (see module docstring): rows of exactly the
            # packets emitting samples in [start, end)
            for key in ("start", "end"):
                if key in qs:
                    try:
                        opts[key] = int(qs[key])
                    except ValueError:
                        self.send_error(400, "bad %s value" % key)
                        return
            if "end" in opts and opts["end"] < opts.get("start", 0):
                self.send_error(400, "end must be >= start")
                return
            p = _Pending(blob, "features", opts)
        else:
            self.send_error(404)
            return
        self.batcher.submit(p)
        if not p.done.wait(timeout=timeout):
            self.send_error(504, "decode timed out")
            return
        if p.error is not None:
            body = p.error.encode()
            self.send_response(422)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if p.kind == "recover":
            rec = p.result
            body = np.ascontiguousarray(rec.pcm).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Sample-Rate", str(rec.sample_rate))
            self.send_header("X-Channels", str(rec.pcm.shape[0]))
            self.send_header("X-Samples", str(rec.pcm.shape[1]))
            self.send_header("X-Dtype", str(rec.pcm.dtype))
            self.send_header("X-Holes", json.dumps(rec.holes))
            self.send_header("X-Approximate", json.dumps(rec.approximate))
            self.send_header("X-Damage-Bytes",
                             str(sum(b - a for a, b in rec.damage)))
            self.send_header("X-Start-Sample", str(rec.start_sample))
        elif p.kind == "decode":
            pcm, rate = p.result
            body = np.ascontiguousarray(pcm).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Sample-Rate", str(rate))
            self.send_header("X-Channels", str(pcm.shape[0]))
            self.send_header("X-Samples", str(pcm.shape[1]))
            self.send_header("X-Dtype", str(pcm.dtype))
        else:
            res, tail = p.result, b""
            mat = res if isinstance(res, np.ndarray) else res.features
            body = np.ascontiguousarray(mat, dtype=np.float32).tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Rows", str(mat.shape[0]))
            self.send_header("X-Dim", str(mat.shape[1]))
            if not isinstance(res, np.ndarray):  # RangedFeatures crop
                tail = np.ascontiguousarray(res.row_packets,
                                            dtype=np.int64).tobytes()
                self.send_header("X-Row-Packets", "i64")
                self.send_header("X-First-Packet", str(res.first_packet))
                self.send_header("X-Start-Sample", str(res.start_sample))
                self.send_header("X-End-Sample", str(res.end_sample))
                self.send_header("X-Sample-Rate", str(res.sample_rate))
            body += tail
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class DecodeServer:
    """Threaded HTTP server + admission batcher around the TPU pipeline.

    ``mesh`` (a jax.sharding.Mesh with a 'data' axis) shards each decode
    batch over the mesh — admission batching feeding multi-chip
    data-parallel decode (decode_corpus(mesh=...)).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 64, max_wait_ms: float = 20.0, mesh=None,
                 route=None):
        if route == "native" and mesh is not None:
            # fail at startup, not as blanket 'batch failed' responses
            raise ValueError("route='native' does not support mesh")
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.batcher = _Batcher(max_batch, max_wait_ms, mesh=mesh,
                                route=route)
        self.httpd.batcher = self.batcher  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> int:
        self.batcher.start()
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True, name="pov-serving-http")
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        self.batcher.stop()
        if self._thread:
            self._thread.join(timeout=10)


def main(argv=None, ready=None) -> int:
    """CLI entry point.  ``ready`` is a test hook: when given, it is called
    with the running server instead of blocking forever, and the server is
    stopped when it returns."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=20.0)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard decode batches over an N-device mesh")
    ap.add_argument("--route", default=None,
                    choices=("device", "native", "auto"),
                    help="decode backend: TPU batch pipeline (device), "
                         "C++ host decoder (native), or auto")
    args = ap.parse_args(argv)
    mesh = None
    if args.mesh:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)
    server = DecodeServer(args.host, args.port, args.max_batch,
                          args.max_wait_ms, mesh=mesh, route=args.route)
    port = server.start()
    print("serving on %s:%d (POST /decode, POST /features, GET /stats)"
          % (args.host, port))
    try:
        if ready is not None:
            ready(server)
        else:  # pragma: no cover - interactive loop
            threading.Event().wait()
    except KeyboardInterrupt:
        pass
    server.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
