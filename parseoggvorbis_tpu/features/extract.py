"""Feature extraction from debug-dump streams: Vorbis floors/residues as
acoustic feature matrices for speech ML.

``CallbacksOutputReader`` consumes the tap stream and produces (time, dim)
float32 matrices; behavior matches the reference extractors exactly
(demo_live_extract.py:262-505 — validated bit-for-bit against golden
matrices generated with the reference implementation), including their
stateful quirks:

* the per-entry ``xs``/``factor`` recomputation clips against the *current*
  entry's length (read_floor_ys);
* ``after_residue`` rows append to the **previous** emitted frame row at the
  running ``offset_dim`` (concat-residue kinds);
* ``floor_base`` persists across frames in read_residue_ys.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..callbacks.reader import DumpReader


class FeatureExtractorMixin:
    """The reference's ML feature extractors over any tap-entry stream.

    Requires a ``read_entry() -> (name, channel, data)`` method (raising
    EOFError at end) — provided by :class:`CallbacksOutputReader` for dump
    streams and by ``features.batched.SyntheticTapReader`` for the
    dump-free native/TPU corpus path.
    """

    def _read_setup_floors(self, sorted_xs: bool, upscale_xs_factor=1):
        multipliers: List[int] = []
        floor_xs: List[np.ndarray] = []
        floor_xs_upscaled: List[np.ndarray] = []
        while True:
            name, channel, data = self.read_entry()
            if name == "floor1_unpack multiplier":
                multipliers.append(int(data[0]))
            if name == "floor1_unpack xs":
                # int64 like the reference (tuples -> numpy.array); the raw
                # dump dtype is u32, which would overflow on clip(-1).
                xs = np.asarray(data).astype(np.int64)
                if sorted_xs:
                    xs = np.sort(xs)
                floor_xs.append(xs)
                if upscale_xs_factor != 1:
                    import scipy.ndimage

                    up = scipy.ndimage.zoom(
                        np.array(xs, dtype="float32"), zoom=upscale_xs_factor,
                        order=1, mode="nearest",
                    )
                    up = np.round(up).astype("int32")
                    floor_xs_upscaled.append(up)
            if name == "finish_setup":
                break
        assert len(multipliers) == len(floor_xs) > 0
        return multipliers, floor_xs, floor_xs_upscaled

    def read_floor_ys(self, output_dim, include_floor_number=None,
                      only_biggest_floor=False, sorted_xs=False,
                      upscale_xs_factor=1, xs_from_biggest_floor=False,
                      floor_always_positive=False, verbose=0) -> np.ndarray:
        """Floor envelope features: (time, output_dim) float32 in [-1, 1]."""
        if only_biggest_floor:
            assert include_floor_number in (None, False)
            include_floor_number = False
        if include_floor_number is None:
            include_floor_number = True
        multipliers, floor_xs, floor_xs_up = self._read_setup_floors(
            sorted_xs, upscale_xs_factor
        )
        num_floors = len(floor_xs)
        biggest = max(range(num_floors), key=lambda i: len(floor_xs[i]))
        dim = output_dim - (1 if include_floor_number else 0)

        res = np.zeros((500, output_dim), dtype="float32")
        frame_num = 0
        offset_dim = 0
        recent: Optional[int] = None
        # row -> 0-based audio-packet index (finish_audio_packet markers
        # seen so far); consumed by the ranged/crop extraction
        # (features/batched.get_features_range) — never affects the output
        row_frames: List[int] = []
        packet_num = 0

        def normalize(vals: np.ndarray) -> np.ndarray:
            if floor_always_positive:
                return vals.astype("float32") / 255.0
            return (vals.astype("float32") - 127.5) / 127.5

        def emit(frame_float: np.ndarray) -> None:
            nonlocal res, frame_num
            if frame_num >= res.shape[0]:
                res = np.concatenate([res, np.zeros_like(res)], axis=0)
            res[frame_num] = frame_float
            row_frames.append(packet_num)
            frame_num += 1

        while True:
            try:
                name, channel, data = self.read_entry()
            except EOFError:
                break
            if name == "finish_audio_packet":
                packet_num += 1
            if name == "floor_number":
                recent = int(data[0])
                assert 0 <= recent < num_floors

            xs = None
            factor = None
            if recent is not None:
                if only_biggest_floor and recent != biggest:
                    continue
                xs_list = floor_xs_up if floor_xs_up else floor_xs
                if xs_from_biggest_floor:
                    xs = xs_list[biggest]
                    if biggest != recent:
                        factor = int(round(float(max(floor_xs[biggest]))
                                           / float(max(floor_xs[recent]))))
                        xs = xs // factor
                    # quirk: clips against the CURRENT entry's length
                    xs = np.clip(xs, 0, len(data) - 1)
                else:
                    xs = xs_list[recent]

            if name in ("floor1 ys", "floor1 final_ys"):
                assert recent is not None
                if only_biggest_floor and recent != biggest:
                    continue
                assert len(data) == len(floor_xs[recent])
                vals = np.array(np.asarray(data)[:dim], dtype="float32") \
                    * multipliers[recent]
                frame = np.zeros((output_dim,), dtype="float32")
                offset_dim = 0
                if include_floor_number:
                    frame[0] = (recent + 1.0) / num_floors - 0.5
                    offset_dim = 1
                vals_f = normalize(vals)
                frame[offset_dim : offset_dim + vals_f.shape[0]] = vals_f
                emit(frame)
            elif name == "floor1 floor":
                assert recent is not None
                vals = np.array(np.asarray(data)[xs][:dim], dtype="float32")
                frame = np.zeros((output_dim,), dtype="float32")
                offset_dim = 0
                if include_floor_number:
                    frame[0] = (recent + 1.0) / num_floors - 0.5
                    offset_dim = 1
                vals_f = normalize(vals)
                frame[offset_dim : offset_dim + vals_f.shape[0]] = vals_f
                offset_dim += vals_f.shape[0]
                emit(frame)
            elif name == "after_residue":
                assert recent is not None
                if offset_dim == 0:  # no floor row emitted before
                    continue
                assert frame_num > 0
                assert output_dim >= offset_dim
                import scipy.ndimage

                idxs = np.arange(len(data))
                if factor:
                    idxs = idxs // factor
                # float64 like the reference (its dump reader yields python
                # floats, so log1p/zoom run in double before the f32 store)
                vals = np.log1p(np.abs(np.asarray(data, np.float64)[idxs])) * 0.1
                vals = scipy.ndimage.zoom(vals, zoom=0.5)
                vals = vals[: output_dim - offset_dim]
                res[frame_num - 1, offset_dim : offset_dim + vals.shape[0]] = vals
                offset_dim = 0
        self.row_frames = np.asarray(row_frames, dtype=np.int64)
        return res[:frame_num]

    def read_residue_ys(self, output_dim, scale=1.0, clip_abs_max=None,
                        log1p_abs_space=False, sorted_xs=False,
                        ignore_xs=False, floor_base_factor=1) -> np.ndarray:
        """Residue spectrum features sampled at floor xs: (time, dim) f32."""
        multipliers, floor_xs, _ = self._read_setup_floors(sorted_xs)
        floor_xs = [xs.astype("int32") for xs in floor_xs]
        num_floors = len(floor_xs)
        biggest = max(range(num_floors), key=lambda i: len(floor_xs[i]))

        res = np.zeros((500, output_dim), dtype="float32")
        frame_num = 0
        recent: Optional[int] = None
        floor_base = None
        row_frames: List[int] = []  # see read_floor_ys
        packet_num = 0
        while True:
            try:
                name, channel, data = self.read_entry()
            except EOFError:
                break
            if name == "finish_audio_packet":
                packet_num += 1
            if name == "floor_number":
                recent = int(data[0])
                assert 0 <= recent < num_floors
            idxs = None
            if recent is not None:
                if ignore_xs:
                    idxs = np.arange(len(data))[:output_dim]
                else:
                    idxs = np.clip(floor_xs[recent][:output_dim], 0, len(data) - 1)
            if name == "floor1 floor":
                assert recent is not None
                if recent != biggest:
                    continue
                floor_base = np.array(np.asarray(data)[idxs],
                                      dtype="float32") / 255.0
            elif name == "after_residue":
                assert recent is not None
                if recent != biggest:
                    continue
                selected = np.asarray(data, dtype="float32")[idxs]
                if not ignore_xs:
                    assert len(selected) == len(floor_xs[recent])
                if log1p_abs_space:
                    selected = np.log1p(np.abs(selected))
                if floor_base is not None:
                    if log1p_abs_space:
                        selected = selected + floor_base * floor_base_factor
                    else:
                        selected = selected * np.exp(
                            (floor_base - 1.0) * floor_base_factor
                        )
                if scale != 1:
                    selected = selected * scale
                if clip_abs_max is not None and clip_abs_max > 0:
                    selected = np.clip(selected, -clip_abs_max, clip_abs_max)
                frame = np.zeros((output_dim,), dtype="float32")
                frame[: selected.shape[0]] = selected
                if frame_num >= res.shape[0]:
                    res = np.concatenate([res, np.zeros_like(res)], axis=0)
                res[frame_num] = frame
                row_frames.append(packet_num)
                frame_num += 1
        self.row_frames = np.asarray(row_frames, dtype=np.int64)
        return res[:frame_num]


class CallbacksOutputReader(DumpReader, FeatureExtractorMixin):
    """Dump-stream reader plus the reference's ML feature extractors."""
