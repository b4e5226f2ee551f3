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
from typing import Dict, List, Sequence

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


def get_features_batched(blobs: Sequence[bytes], output_dim: int,
                         kind: str = "floor_final_ys", host_threads: int = 8,
                         device: bool = False, mesh=None,
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
    """
    if mesh is not None and not device:
        raise ValueError("mesh= requires device=True (the mesh shards the "
                         "device feature path)")
    if device and mesh is not None:
        from .device import launch_features_mesh

        if host_threads > 1 and len(blobs) > 1:
            with ThreadPoolExecutor(max_workers=host_threads) as ex:
                parsed = list(ex.map(native.parse_stream_native, blobs))
        else:
            parsed = [native.parse_stream_native(b) for b in blobs]
        pendings = launch_features_mesh(parsed, output_dim, mesh, kind=kind,
                                        **kwargs)
        out = []
        for blob, parsed_i, p in zip(blobs, parsed, pendings):
            if p is None:  # planner rejected (e.g. floor0): host fallback
                reader = SyntheticTapReader(parsed_i, DATA_FILTERS[kind])
                out.append(_extract(reader, output_dim, kind, kwargs))
            else:
                out.append(p.fetch())
        return out
    if device:
        from .device import DeviceFeaturesUnsupported, launch_features_device

        def parse_and_launch(b):
            parsed = native.parse_stream_native(b)
            try:
                pending = launch_features_device(parsed, output_dim, kind,
                                                 **kwargs)
            except DeviceFeaturesUnsupported:
                reader = SyntheticTapReader(parsed, DATA_FILTERS[kind])
                return _extract(reader, output_dim, kind, kwargs)
            return pending

        if host_threads > 1 and len(blobs) > 1:
            with ThreadPoolExecutor(max_workers=host_threads) as ex:
                launched = list(ex.map(parse_and_launch, blobs))
        else:
            launched = [parse_and_launch(b) for b in blobs]
        return [p.fetch() if hasattr(p, "fetch") else p for p in launched]

    if host_threads > 1 and len(blobs) > 1:
        with ThreadPoolExecutor(max_workers=host_threads) as ex:
            return list(ex.map(
                lambda b: get_features(b, output_dim, kind, **kwargs), blobs
            ))
    return [get_features(b, output_dim, kind, **kwargs) for b in blobs]
