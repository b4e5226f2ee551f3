"""Corpus crop sampling — the training-input face of the framework.

ML training over audio corpora consumes random fixed-length segments,
not whole files.  The reference's answer is "decode every file from
byte 0 and slice in Python" (demo_live_extract.py's thread pool); here
each batch decodes ONLY the pages covering its crops — the seek splice
(ogg/seek.py) through the batched device decode
(`decode_corpus(ranges=...)`) or the batched feature extraction
(`get_features_batched(ranges=...)`) — so a step costs O(crop), not
O(file), and the whole batch rides one device dispatch group.

    loader = CropLoader(paths, crop_samples=16384, batch_size=32, seed=0)
    for pcm in loader.take(1000):   # [32, C, 16384] float32, deterministic
        step(pcm)

Design points:

* **Deterministic & prefetch-safe**: step ``i`` draws from
  ``np.random.default_rng([seed, i])``, so the sample sequence is a pure
  function of (seed, step) — independent of prefetch depth, thread
  timing, or restarts (resume with ``start_step``).
* **O(crop) IO**: file sources are mmapped; only page headers (one
  up-front index walk) and the pages each crop touches are ever read.
* **Device-ready**: ``device=True`` returns jax arrays placed
  asynchronously (transfer overlaps the training step); ``mesh=`` shards
  the batch axis over the mesh's 'data' axis (jax.sharding) so each chip
  receives only its shard.
* **Prefetch**: a background thread keeps ``prefetch`` batches in
  flight; decode itself is already thread-parallel + device-async.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import numpy as np

__all__ = ["CropLoader"]


@dataclass
class _Source:
    blob: "bytes | memoryview"
    total: int  # total samples (stream-final granule)
    channels: int
    sample_rate: int
    blocksize0: int  # short blocksize (bounds rows/crop for features)
    index: object  # StreamPageIndex — walked ONCE; every step plans
    # its splices from this cache (per-step IO stays O(crop))
    _mmap: object = None  # keepalive for mmapped files


def _open_source(src) -> _Source:
    from .ogg.seek import walk_pages
    from .runtime.batch import parse_stream

    mm = None
    if isinstance(src, str):
        import mmap

        f = open(src, "rb")
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        f.close()
        blob = mm
    else:
        blob = src
    index = walk_pages(blob)
    total = index.total_samples or 0
    head = b"".join(bytes(blob[p.offset:p.end])
                    for p in index.pages[:index.header_end])
    sf = parse_stream(head)
    return _Source(blob=blob, total=total, channels=sf.channels,
                   sample_rate=sf.sample_rate, blocksize0=sf.blocksize0,
                   index=index, _mmap=mm)


class CropLoader:
    """Batched random-crop sampler over an Ogg Vorbis corpus.

    ``out="pcm"`` yields ``[B, C, crop_samples]`` float32 (or int16 with
    ``out_i16=True``); ``out="features"`` yields ``[B, crop_rows, dim]``
    float32 feature matrices — rows past the crop's actual coverage are
    zero-padded, and the default ``crop_rows`` is a guaranteed upper
    bound derived from the corpus's smallest blocksize (a caller-given
    smaller ``crop_rows`` truncates the tail rows; extraction itself is
    bit-identical to the full extraction's rows,
    features/batched.get_features_range).

    ``weight_by_duration=True`` (default) samples files proportionally to
    their length, so every audio second is equally likely — the unbiased
    choice for training; ``False`` samples files uniformly.  Streams
    shorter than the crop are zero-padded at the tail (their full decode
    is used).  All sources must share a channel count (assert at init;
    mixed corpora should be grouped by the caller).
    """

    def __init__(self, sources: Sequence[Union[str, bytes]],
                 crop_samples: int, batch_size: int, *, seed: int = 0,
                 out: str = "pcm", out_i16: bool = False,
                 feature_dim: int = 64,
                 feature_kind: str = "floor_final_ys",
                 crop_rows: Optional[int] = None,
                 weight_by_duration: bool = True,
                 steps: Optional[int] = None, start_step: int = 0,
                 prefetch: int = 2, device: bool = False, mesh=None,
                 host_threads: int = 8, **feature_kwargs) -> None:
        if out not in ("pcm", "features"):
            raise ValueError("out must be 'pcm' or 'features'")
        if not sources:
            raise ValueError("empty corpus")
        if crop_samples <= 0 or batch_size <= 0:
            raise ValueError("crop_samples and batch_size must be positive")
        if mesh is not None and not device:
            raise ValueError("mesh= requires device=True")
        self._sources = [_open_source(s) for s in sources]
        chans = {s.channels for s in self._sources}
        if len(chans) != 1:
            raise ValueError(
                "sources mix channel counts %s — group the corpus by "
                "channels" % sorted(chans))
        self.channels = chans.pop()
        self.sample_rate = self._sources[0].sample_rate
        self.crop_samples = int(crop_samples)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.out = out
        self.out_i16 = bool(out_i16)
        self.feature_dim = int(feature_dim)
        self.feature_kind = feature_kind
        # default feature row budget: a frame emits at least
        # blocksize0/2 samples (short-short lap), so a crop covers at
        # most crop/(bs0/2) (+ anchor/boundary) frames, each emitting at
        # most `channels` rows — a guaranteed upper bound derived from
        # the corpus's actual smallest blocksize; a fixed budget keeps
        # batch shapes static
        min_lap = min(s.blocksize0 for s in self._sources) // 2
        self.crop_rows = (int(crop_rows) if crop_rows is not None
                          else max(1, self.channels
                                   * (self.crop_samples // min_lap + 3)))
        self.steps = steps
        self.start_step = int(start_step)
        self.prefetch = max(1, int(prefetch))
        self.device = bool(device)
        self.mesh = mesh
        self.host_threads = int(host_threads)
        self._feature_kwargs = feature_kwargs
        totals = np.asarray([max(1, s.total) for s in self._sources],
                            dtype=np.float64)
        self._weights = (totals / totals.sum() if weight_by_duration
                         else np.full(len(totals), 1.0 / len(totals)))
        self._closed = False

    # -- sampling ---------------------------------------------------------

    def _plan_step(self, step: int):
        """(source_idx, (start, end))* for one step — pure in (seed, step)."""
        rng = np.random.default_rng([self.seed, step])
        idx = rng.choice(len(self._sources), size=self.batch_size,
                         p=self._weights)
        plans = []
        for i in idx.tolist():
            total = self._sources[i].total
            if total <= self.crop_samples:
                plans.append((i, (0, None)))  # short stream: whole + pad
                continue
            start = int(rng.integers(0, total - self.crop_samples + 1))
            plans.append((i, (start, start + self.crop_samples)))
        return plans

    def _materialize(self, step: int) -> np.ndarray:
        from .ogg.seek import plan_sample_range

        plans = self._plan_step(step)
        blobs = [self._sources[i].blob for i, _ in plans]
        # plan from each source's cached page index: per-step IO is the
        # crop's covering pages only, never a fresh O(file) index walk
        ranges = [plan_sample_range(self._sources[i].index, s, e)
                  for i, (s, e) in plans]
        if self.out == "pcm":
            from .runtime.batch import decode_corpus

            outs = decode_corpus(blobs, ranges=ranges, out_i16=self.out_i16,
                                 host_threads=self.host_threads)
            dtype = np.int16 if self.out_i16 else np.float32
            batch = np.zeros(
                (self.batch_size, self.channels, self.crop_samples), dtype)
            for b, o in enumerate(outs):
                n = min(o.pcm.shape[1], self.crop_samples)
                batch[b, :, :n] = o.pcm[:, :n]
            return batch
        from .features.batched import get_features_batched

        # every entry is ranged, so the splice converts mmaps to bytes
        # lazily — only the covering pages are ever materialized
        mats = get_features_batched(
            blobs, self.feature_dim, kind=self.feature_kind,
            host_threads=self.host_threads, ranges=ranges,
            **self._feature_kwargs)
        batch = np.zeros((self.batch_size, self.crop_rows, self.feature_dim),
                         np.float32)
        for b, m in enumerate(mats):
            r = min(m.shape[0], self.crop_rows)
            batch[b, :r] = m[:r]
        return batch

    def _place(self, batch: np.ndarray):
        if not self.device:
            return batch
        import jax

        if self.mesh is None:
            return jax.device_put(batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            batch, NamedSharding(self.mesh,
                                 P("data", *([None] * (batch.ndim - 1)))))

    # -- iteration --------------------------------------------------------

    def __iter__(self):
        stop = threading.Event()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def worker():
            step = self.start_step
            try:
                while not stop.is_set() and (
                        self.steps is None
                        or step < self.start_step + self.steps):
                    item = self._place(self._materialize(step))
                    while not stop.is_set():
                        try:
                            q.put((step, item), timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    step += 1
            except Exception as exc:  # surfaced on the consumer side
                while not stop.is_set():
                    try:
                        q.put(("error", exc), timeout=0.25)
                        break
                    except queue.Full:
                        continue
            finally:
                # deliver the end sentinel; a consumer that broke early
                # sets `stop` and drains, so this can never block forever
                while True:
                    try:
                        q.put(None, timeout=0.25)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                got = q.get()
                if got is None:
                    break
                if got[0] == "error":
                    raise got[1]
                yield got[1]
        finally:
            stop.set()
            # drain so the worker's blocked put can observe the stop
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30)

    def take(self, n: int):
        """Yield exactly ``n`` batches (bounded view of the iterator)."""
        it = iter(self)
        for _ in range(n):
            try:
                yield next(it)
            except StopIteration:
                return

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for s in self._sources:
            if s._mmap is not None:
                s._mmap.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
