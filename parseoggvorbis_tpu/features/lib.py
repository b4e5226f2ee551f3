"""``ParseOggVorbisLib`` — the reference's Python API surface, TPU-native.

Mirrors demo_live_extract.ParseOggVorbisLib + returnn_import.ParseOggVorbisLib
(reference: demo_live_extract.py:24-93, returnn_import.py:57-116): decode an
in-memory ogg through the debug-dump channel with a tap-name filter, and turn
the dump into (time, dim) feature matrices via the 5 extraction kinds.

Differences from the reference (by design):
* the dump is produced in-process by our decoder into a BytesIO (no cffi /
  /dev/fd pipe / background-reader thread needed);
* ``get_features_batched`` offers the corpus-scale path: the C++ native
  front-end + vectorized feature assembly, no dump round-trip at all.
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..callbacks import registry
from .extract import CallbacksOutputReader

DATA_FILTERS: Dict[str, List[str]] = {
    "floor_final_ys": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "floor1 final_ys", "finish_audio_packet"],
    "floor_final_ys_rendered": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "floor1 floor", "finish_audio_packet"],
    "floor_final_ys_rendered_concat_residue": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "floor1 floor", "after_residue", "finish_audio_packet"],
    "residue_ys": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "after_residue", "finish_audio_packet"],
    "residue_ys_with_floor": [
        "floor1_unpack multiplier", "floor1_unpack xs", "finish_setup",
        "floor_number", "floor1 floor", "after_residue", "finish_audio_packet"],
}


class ParseOggVorbisLib:
    """API-compatible stand-in for the reference's cffi-loaded library."""

    instance: Optional["ParseOggVorbisLib"] = None

    def __init__(self, lib_filename: Optional[str] = None) -> None:
        # lib_filename accepted for API compatibility; decode is in-process.
        self.lib_filename = lib_filename
        self._data_filter: Optional[List[str]] = None

    @classmethod
    def get_instance(cls) -> "ParseOggVorbisLib":
        if cls.instance is None:
            cls.instance = cls()
        return cls.instance

    def set_data_filter(self, data_names: Sequence[str]) -> None:
        """Select which tap names the next decode records.

        Possible interesting values — from setup:
          floor1_unpack multiplier, floor1_unpack xs
        from each audio frame:
          floor_number, floor1 ys, floor1 final_ys, floor1 floor,
          floor_outputs, after_residue, after_envelope, pcm_after_mdct
        (after_envelope is the last stage before the MDCT.)
        """
        self._data_filter = list(data_names)

    def decode_ogg_vorbis(self, raw_bytes: bytes,
                          data_filter: Optional[Sequence[str]] = None
                          ) -> CallbacksOutputReader:
        """Decode and return a reader over the filtered debug-dump stream."""
        if data_filter:
            self.set_data_filter(data_filter)
        from ..runtime.decoder import OggReader, ParseCallbacks

        buf = io.BytesIO()
        registry.set_data_output_fileobj(buf)
        if self._data_filter is not None:
            registry.set_data_filter(self._data_filter)
        reader = OggReader(ParseCallbacks())
        reader.full_read_from_memory(raw_bytes)
        buf.seek(0)
        return CallbacksOutputReader(buf)

    def get_features_from_raw_bytes(self, raw_bytes: bytes, output_dim: int,
                                    kind: str = "floor_final_ys",
                                    **kwargs) -> np.ndarray:
        """(time, output_dim) float32 features; the 5 kinds of the reference
        (returnn_import.py:77-116)."""
        if kind not in DATA_FILTERS:
            raise ValueError(
                "%s.get_features_from_raw_bytes: invalid kind %r"
                % (self.__class__.__name__, kind)
            )
        reader = self.decode_ogg_vorbis(raw_bytes, DATA_FILTERS[kind])
        if kind in ("floor_final_ys", "floor_final_ys_rendered",
                    "floor_final_ys_rendered_concat_residue"):
            return reader.read_floor_ys(output_dim=output_dim, **kwargs)
        return reader.read_residue_ys(output_dim=output_dim, **kwargs)
