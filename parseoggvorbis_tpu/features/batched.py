"""Dump-free corpus feature extraction — the TPU-native batch path.

The reference extracts features by round-tripping every intermediate value
through the debug-dump byte stream (decode -> pipe -> parse).  Here the C++
native front-end bulk-exports exactly the tensors the extractors need
(final_ys, full-window floor curves, residue spectra) and a synthetic tap
stream replays them through the *same validated extractor state machines* —
identical output, none of the scalar decode or dump serialization cost.

~100x faster per file than the dump path; scale across files with the
thread pool (native parse releases the GIL).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..native import frontend as native
from .extract import FeatureExtractorMixin
from .lib import DATA_FILTERS


class SyntheticTapReader(FeatureExtractorMixin):
    """Replays native-exported tensors as a tap-entry stream.

    Entry order matches the decoder's dump order exactly: setup floors
    (multiplier, xs)*, finish_setup, then per frame per channel
    floor_number [+ floor ys/curve if decoded], then after_residue per
    channel, then finish_audio_packet.
    """

    def __init__(self, parsed: "native.NativeParsed",
                 need: Sequence[str]) -> None:
        self._entries = self._build(parsed, set(need))
        self._pos = 0

    def read_entry(self):
        if self._pos >= len(self._entries):
            raise EOFError
        e = self._entries[self._pos]
        self._pos += 1
        return e

    @staticmethod
    def _build(p, need):
        entries = []
        floors = p.floor1_info()
        for info in floors:
            if info is None:
                continue
            mult, xs = info
            entries.append(("floor1_unpack multiplier", -1,
                            np.array([mult], np.uint8)))
            entries.append(("floor1_unpack xs", -1, xs.astype(np.uint32)))
        entries.append(("finish_setup", -1, np.zeros(0, np.uint8)))

        t_total = len(p.mode_idx)
        c = p.channels
        need_ys = "floor1 final_ys" in need
        need_curve = "floor1 floor" in need
        need_res = "after_residue" in need

        # bulk exports per mode bucket
        per_mode: Dict[int, dict] = {}
        for m in sorted(set(p.mode_idx.tolist())):
            ids = np.nonzero(p.mode_idx == m)[0]
            n = int(p.frame_n[ids[0]])
            floor_nums = p.mode_floor_numbers(m)
            pts = [len(floors[f][1]) if floors[f] else 0 for f in floor_nums]
            entry = {
                "ids": ids, "n": n, "floor_nums": floor_nums, "pts": pts,
                "order": {int(t): i for i, t in enumerate(ids)},
            }
            _, decoded, _, residue = p.export_frames(ids, n)
            entry["decoded"] = decoded
            if need_res:
                entry["residue"] = residue
            if need_ys:
                entry["ys"] = p.export_floor_ys(ids, int(sum(pts)))
            if need_curve:
                entry["curve"] = p.export_curves_full(ids, n)
            per_mode[m] = entry

        for t in range(t_total):
            m = int(p.mode_idx[t])
            e = per_mode[m]
            i = e["order"][t]
            ys_off = 0
            for ch in range(c):
                fnum = int(e["floor_nums"][ch])
                entries.append(("floor_number", ch,
                                np.array([fnum], np.uint8)))
                if e["decoded"][i, ch]:
                    if need_ys:
                        npts = e["pts"][ch]
                        entries.append((
                            "floor1 final_ys", -1,
                            e["ys"][i, ys_off : ys_off + npts].astype(np.uint32),
                        ))
                    if need_curve:
                        entries.append(("floor1 floor", -1,
                                        e["curve"][i, ch].astype(np.uint32)))
                ys_off += e["pts"][ch]
            if need_res:
                for ch in range(c):
                    entries.append(("after_residue", ch, e["residue"][i, ch]))
            entries.append(("finish_audio_packet", -1, np.zeros(0, np.uint8)))
        return entries


def _extract(reader, output_dim: int, kind: str, kwargs) -> np.ndarray:
    if kind in ("floor_final_ys", "floor_final_ys_rendered",
                "floor_final_ys_rendered_concat_residue"):
        return reader.read_floor_ys(output_dim=output_dim, **kwargs)
    return reader.read_residue_ys(output_dim=output_dim, **kwargs)


def get_features(raw_bytes: bytes, output_dim: int,
                 kind: str = "floor_final_ys", **kwargs) -> np.ndarray:
    """Features for one file via the native front-end (no dump round-trip)."""
    if kind not in DATA_FILTERS:
        raise ValueError("invalid kind %r" % (kind,))
    parsed = native.parse_stream_native(raw_bytes)
    reader = SyntheticTapReader(parsed, DATA_FILTERS[kind])
    return _extract(reader, output_dim, kind, kwargs)


@dataclass
class RangedFeatures:
    """Feature rows covering a sample range (see get_features_range)."""

    features: np.ndarray  # (rows, output_dim) float32
    row_packets: np.ndarray  # (rows,) i64: absolute audio-packet per row
    first_packet: int  # absolute packet index of the first covered frame
    start_sample: int  # first sample the covered frames emit
    end_sample: int  # one past the last sample they emit
    sample_rate: int


def _emission_window(parsed, plan):
    """Kept-frame window of a spliced parse: frames whose PCM emission
    overlaps [plan.start_sample, plan.end_sample).

    Returns ``(f0, f1, base, starts, nums)``: spliced-frame window
    [f0, f1), the absolute emission base, and per-frame emission starts/
    counts — the same granule-validated accounting the PCM seek path
    uses (runtime/device_decoder._compute_emission_nums)."""
    from types import SimpleNamespace

    from ..runtime import device_decoder as dd
    from ..runtime.batch import _solve_emission_base

    t = len(parsed.frame_n)
    none = (0, 0, 0, np.zeros(0, np.int64), np.zeros(0, np.int64))
    if t == 0:
        return none
    shim = SimpleNamespace(num_frames=t, frame_n=parsed.frame_n,
                           granules=parsed.granules)
    base = 0 if plan.from_start else _solve_emission_base(shim)
    nums = dd._compute_emission_nums(shim, abs_base=base)
    starts = base + np.concatenate([[0], np.cumsum(nums[:-1])])
    s = plan.start_sample
    e = (plan.end_sample if plan.end_sample is not None
         else np.iinfo(np.int64).max)
    keep = (nums > 0) & (starts < e) & (starts + nums > s)
    if not keep.any():
        return none
    idx = np.nonzero(keep)[0]
    return int(idx[0]), int(idx[-1]) + 1, base, starts, nums


def _row_frames_from_parsed(p, kind: str,
                            only_biggest_floor: bool = False) -> np.ndarray:
    """Audio-packet index of every feature row, from flags alone.

    Mirrors the row-emission rules of the host extractors (extract.py):
    the floor kinds emit one row per (frame, channel) whose floor was
    decoded (filtered to the biggest floor under ``only_biggest_floor``);
    the residue kinds emit one row per (frame, channel) for EVERY channel
    iff the frame's LAST channel's floor number is the biggest floor —
    the extractors' ``recent`` floor number is whatever the final
    ``floor_number`` tap set when the ``after_residue`` taps arrive (a
    stateful reference quirk, extract.py read_residue_ys).  CI asserts
    agreement with the extractors' own ``FeatureExtractorMixin.row_frames``
    recording (tests/test_features_range.py)."""
    floors = p.floor1_info()
    sizes = [len(i[1]) if i is not None else -1 for i in floors]
    biggest = int(np.argmax(np.asarray(sizes)))
    t_total = len(p.mode_idx)
    c = p.channels
    residue_kind = kind in ("residue_ys", "residue_ys_with_floor")
    rows_mask = np.zeros((t_total, c), dtype=bool)
    for m in sorted(set(p.mode_idx.tolist())):
        ids = np.nonzero(p.mode_idx == m)[0]
        fnums = p.mode_floor_numbers(m)
        keep_ch = np.asarray([int(f) == biggest for f in fnums])
        if residue_kind:
            rows_mask[ids] = bool(int(fnums[-1]) == biggest)
        else:
            decoded, _ = p.export_flags(ids)
            dm = decoded.astype(bool)
            if only_biggest_floor:
                dm = dm & keep_ch[None, :]
            rows_mask[ids] = dm
    # row order is frame-major, channel within frame — the tap order
    t_idx = np.broadcast_to(np.arange(t_total)[:, None], (t_total, c))
    return t_idx[rows_mask].astype(np.int64)


def get_features_range(raw_bytes: bytes, output_dim: int, start: int,
                       end: Optional[int] = None,
                       kind: str = "floor_final_ys",
                       serial: Optional[int] = None,
                       **kwargs) -> RangedFeatures:
    """Feature rows for exactly the packets emitting samples in
    [start, end) — random-access (crop) feature extraction.

    Costs O(range + one page): a header-only page walk anchors the range
    and only the covering pages are parsed (the same splice the PCM seek
    uses, ogg/seek.py); every returned row is BIT-identical to the
    corresponding row of the full extraction, and ``row_packets`` gives
    each row's absolute packet index so crops compose with full decodes.
    Capability beyond the reference, whose extractors always consume the
    file from byte 0 (demo_live_extract.py reads whole-file dumps).

    Frames that emit no PCM anywhere (a stream's first frame, fully
    granule-truncated tails) have no time span, so no time range selects
    their rows; ``get_features`` remains the whole-matrix surface.
    """
    if kind not in DATA_FILTERS:
        raise ValueError("invalid kind %r" % (kind,))
    from ..ogg.seek import plan_sample_range, walk_pages

    index = walk_pages(raw_bytes, serial=serial)
    plan = plan_sample_range(index, start, end)
    parsed = native.parse_stream_native(plan.splice(raw_bytes))

    def empty():
        return RangedFeatures(
            features=np.zeros((0, output_dim), np.float32),
            row_packets=np.zeros(0, np.int64), first_packet=-1,
            start_sample=plan.start_sample, end_sample=plan.start_sample,
            sample_rate=parsed.sample_rate)

    if plan.empty:
        return empty()
    f0, f1, _base, starts, nums = _emission_window(parsed, plan)
    if f1 <= f0:
        return empty()
    reader = SyntheticTapReader(parsed, DATA_FILTERS[kind])
    feats = _extract(reader, output_dim, kind, kwargs)
    rf = reader.row_frames
    mask = (rf >= f0) & (rf < f1)
    return RangedFeatures(
        features=np.ascontiguousarray(feats[mask]),
        row_packets=plan.anchor_packet + rf[mask],
        first_packet=plan.anchor_packet + f0,
        start_sample=int(starts[f0]),
        end_sample=int(starts[f1 - 1] + nums[f1 - 1]),
        sample_rate=parsed.sample_rate)


def get_features_batched(blobs: Sequence[bytes], output_dim: int,
                         kind: str = "floor_final_ys", host_threads: int = 8,
                         device: bool = False, mesh=None,
                         ranges: Optional[Sequence[
                             Optional[Tuple[int, Optional[int]]]]] = None,
                         **kwargs) -> List[np.ndarray]:
    """Corpus-scale feature extraction with thread-parallel native parse.

    ``device=True`` computes the feature matrices on the TPU
    (features/device.py): the host ships only packed floor Y values and
    dictionary-coded residues, the device renders/normalizes/assembles, and
    only the (time, output_dim) float32 matrices return over the link.
    ``mesh`` additionally shards same-plan stream stacks over the mesh's
    'data' axis (multi-chip corpus extraction; launch_features_mesh).
    Launches are asynchronous across the corpus, so one file's host parse
    overlaps another's device compute and transfers.  Streams the device
    path cannot plan (floor0 slots) fall back to the host extractors
    per-file.

    ``ranges`` enables batched crop extraction (ML segment sampling at
    scale): one optional ``(start_sample, end_sample_or_None)`` per blob.
    A ranged blob parses only the pages covering its range via the seek
    splice and returns exactly the rows get_features_range would — each
    bit-identical to the full extraction's corresponding row — while
    still batching with the rest of the corpus on device.
    """
    if mesh is not None and not device:
        raise ValueError("mesh= requires device=True (the mesh shards the "
                         "device feature path)")

    plans: List[Optional[object]] = [None] * len(blobs)
    if ranges is not None:
        from ..ogg.seek import splice_corpus

        blobs, plans = splice_corpus(blobs, ranges)
    only_big = bool(kwargs.get("only_biggest_floor", False))

    def trim(i, parsed, mat, rf=None):
        """Slice a spliced blob's rows to its requested sample range."""
        plan = plans[i]
        if plan is None:
            return mat
        f0, f1 = _emission_window(parsed, plan)[:2]
        if plan.empty or f1 <= f0:
            return np.zeros((0, mat.shape[1]), mat.dtype)
        if rf is None:
            rf = _row_frames_from_parsed(parsed, kind, only_big)
        return np.ascontiguousarray(mat[(rf >= f0) & (rf < f1)])

    def host_extract(i, parsed):
        reader = SyntheticTapReader(parsed, DATA_FILTERS[kind])
        mat = _extract(reader, output_dim, kind, kwargs)
        return trim(i, parsed, mat, rf=reader.row_frames)

    def launchable(i, parsed):
        """Empty-range splices (0 frames) can't plan a device launch."""
        return plans[i] is None or len(parsed.frame_n) > 0

    if device and mesh is not None:
        from .device import launch_features_mesh

        if host_threads > 1 and len(blobs) > 1:
            with ThreadPoolExecutor(max_workers=host_threads) as ex:
                parsed = list(ex.map(native.parse_stream_native, blobs))
        else:
            parsed = [native.parse_stream_native(b) for b in blobs]
        live = [i for i, p in enumerate(parsed) if launchable(i, p)]
        pendings_live = launch_features_mesh([parsed[i] for i in live],
                                             output_dim, mesh, kind=kind,
                                             **kwargs)
        pendings = [None] * len(parsed)
        for i, p in zip(live, pendings_live):
            pendings[i] = p
        out = []
        for i, (parsed_i, p) in enumerate(zip(parsed, pendings)):
            if p is None:  # planner rejected (e.g. floor0) or empty range
                out.append(host_extract(i, parsed_i))
            else:
                out.append(trim(i, parsed_i, p.fetch()))
        return out
    if device:
        from .device import DeviceFeaturesUnsupported, launch_features_device

        # Per-stream parse->plan->launch inside the thread pool: one
        # stream's host parse overlaps another's device dispatch and
        # prefetch.  Measured against the stacked alternative
        # (launch_features_grouped, one dispatch+fetch per distinct plan)
        # in interleaved same-process A/B on the tunneled chip: per-stream
        # p50 559.9x vs grouped 511.0x (and 442.5 vs 425.4 in a worse
        # mood) — the wall is host parse + transfer bytes, not RPC count,
        # and the per-stream flow pipelines the parse better.
        # The pure floor kinds need only final_ys/flags + frame metadata,
        # so their native parse skips residue storage and the curve render
        # (floors_only — measured ~2x cheaper; host parse is the largest
        # wall share of the device feature path).  Fallback paths (floor0
        # streams, planner rejects) re-parse fully for the host extractor.
        pure_floor = kind in ("floor_final_ys", "floor_final_ys_rendered")

        def parse_and_launch(i_b):
            i, b = i_b
            parsed = native.parse_stream_native(b, floors_only=pure_floor)
            if not launchable(i, parsed):
                return i, parsed, host_extract(i, parsed)
            try:
                pending = launch_features_device(parsed, output_dim, kind,
                                                 **kwargs)
            except DeviceFeaturesUnsupported:
                full = (native.parse_stream_native(b)
                        if getattr(parsed, "floors_only", False) else parsed)
                return i, full, host_extract(i, full)
            return i, parsed, pending

        items = list(enumerate(blobs))
        if host_threads > 1 and len(blobs) > 1:
            with ThreadPoolExecutor(max_workers=host_threads) as ex:
                launched = list(ex.map(parse_and_launch, items))
        else:
            launched = [parse_and_launch(it) for it in items]
        return [trim(i, parsed, p.fetch()) if hasattr(p, "fetch") else p
                for i, parsed, p in launched]

    if ranges is not None:
        items = list(enumerate(blobs))

        def host_one(i_b):
            i, b = i_b
            return host_extract(i, native.parse_stream_native(b))

        if host_threads > 1 and len(blobs) > 1:
            with ThreadPoolExecutor(max_workers=host_threads) as ex:
                return list(ex.map(host_one, items))
        return [host_one(it) for it in items]
    if host_threads > 1 and len(blobs) > 1:
        with ThreadPoolExecutor(max_workers=host_threads) as ex:
            return list(ex.map(
                lambda b: get_features(b, output_dim, kind, **kwargs), blobs
            ))
    return [get_features(b, output_dim, kind, **kwargs) for b in blobs]
