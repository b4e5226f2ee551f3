"""Batched file decode: host front-end pass + bucketed device dispatch + OLA.

This is the TPU-native replacement for the reference's thread-per-file batch
decode (demo_live_extract.py:576-586): instead of running the whole scalar
pipeline per file, the host performs only the bit-serial symbol pass and the
device decodes *all frames of all files* in a few large batched dispatches,
bucketed by (stream, mode) so every dispatch has a fixed shape.

Flow per file:
  1. host: Ogg demux + setup parse + per-packet symbol decode
     (``VorbisStream.decode_packet_symbols``) -> list of FrameSymbols
  2. device: for each mode bucket, one ``BucketPipeline`` call over the
     [B, C, n/2] batch -> windowed time frames
  3. overlap-add + granule truncation (host, bandwidth-bound) -> final PCM
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..ogg.page import read_page
from ..utils.errors import check
from ..vorbis.header import IdHeader
from ..vorbis.setup import Setup
from .decoder import FrameSymbols, VorbisStream
from .jax_backend import get_bucket_pipeline
from .state import DecodeState


@dataclass
class ParsedStream:
    """Host front-end product for one file/logical stream."""

    header: IdHeader
    setup: Setup
    frames: List[FrameSymbols]
    granules: List[int]  # expected ending pos per frame (-1 = unknown)
    vendor: str = ""
    comments: Optional[List[str]] = None


@dataclass
class DecodedAudio:
    pcm: np.ndarray  # [C, num_samples] float32
    sample_rate: int

    @property
    def num_channels(self) -> int:
        return self.pcm.shape[0]

    @property
    def num_samples(self) -> int:
        return self.pcm.shape[1]


def parse_stream(data: bytes) -> ParsedStream:
    """Host pass 1: parse a single-stream Ogg Vorbis file to frame symbols."""
    stream = VorbisStream()
    frames: List[FrameSymbols] = []
    granules: List[int] = []
    vendor = ""
    comments: List[str] = []
    offset = 0
    while True:
        page, offset = read_page(data, offset)
        if page is None:
            break
        for packet, is_last in page.packets():
            granule = page.absolute_granule_pos if is_last else -1
            if stream.packet_count == 0:
                from ..vorbis.header import parse_id_header

                stream.header = parse_id_header(packet)
            elif stream.packet_count == 1:
                from ..vorbis.header import parse_comment_header

                vendor, comments = parse_comment_header(packet)
            elif stream.packet_count == 2:
                stream.setup = Setup.parse_packet(packet, stream.header)
            else:
                frames.append(stream.decode_packet_symbols(packet))
                granules.append(granule)
            stream.packet_count += 1
    check(stream.setup is not None, "no setup packet found")
    return ParsedStream(
        header=stream.header,
        setup=stream.setup,
        frames=frames,
        granules=granules,
        vendor=vendor,
        comments=comments,
    )


def decode_frames_device(parsed: ParsedStream) -> List[np.ndarray]:
    """Device pass: decode all frames to windowed time frames (in order).

    Buckets frames by mode index so each dispatch is one fixed-shape batched
    pipeline call; returns per-frame [C, n] float32 windowed frames.
    """
    setup = parsed.setup
    num_channels = parsed.header.audio_channels
    by_mode: Dict[int, List[int]] = {}
    for t, sym in enumerate(parsed.frames):
        by_mode.setdefault(sym.mode_idx, []).append(t)

    results: List[Optional[np.ndarray]] = [None] * len(parsed.frames)
    for mode_idx, frame_ids in by_mode.items():
        mode = setup.modes[mode_idx]
        mapping = setup.mappings[mode.mapping]
        n = mode.blocksize
        half = n // 2
        # window variants stacked [W, n]: index = prev + 2*next (W=4 long, 1 short)
        if mode.block_flag:
            windows = np.stack(
                [mode.windows[(bool(i & 1), bool(i & 2))] for i in range(4)]
            )
        else:
            windows = mode.windows[(False, False)][None, :]
        pipe = get_bucket_pipeline(n, tuple(mapping.couplings), windows)

        b = len(frame_ids)
        residue = np.empty((b, num_channels, half), dtype=np.float32)
        curve = np.empty((b, num_channels, half), dtype=np.int32)
        decoded = np.empty((b, num_channels), dtype=bool)
        used = np.empty((b, num_channels), dtype=bool)
        win_sel = np.empty((b,), dtype=np.int32)
        for i, t in enumerate(frame_ids):
            sym = parsed.frames[t]
            residue[i] = sym.residues
            curve[i] = sym.floor_curves[:, :half]
            decoded[i] = sym.floor_decoded
            used[i] = sym.floor_used
            win_sel[i] = sym.win_sel if mode.block_flag else 0
        out = pipe(residue, curve, decoded, used, win_sel)  # [B, C, n]
        for i, t in enumerate(frame_ids):
            results[t] = out[i]
    return results


def overlap_add(parsed: ParsedStream, windowed: Sequence[np.ndarray]) -> DecodedAudio:
    """Host pass 3: overlap-add windowed frames into the final PCM stream."""
    num_channels = parsed.header.audio_channels
    state = DecodeState(num_channels)
    chunks: List[np.ndarray] = []
    for sym, frames_t, granule in zip(parsed.frames, windowed, parsed.granules):
        state.set_expected_ending_pos(granule)
        state.begin_frame(sym.n)
        off = state.frame_pos - state.buf_start
        state.buf[:, off : off + sym.n] += frames_t
        ready = state.ready_pcm()
        if ready is not None:
            chunks.append(ready)
    if chunks:
        pcm = np.concatenate(chunks, axis=1)
    else:
        pcm = np.zeros((num_channels, 0), dtype=np.float32)
    return DecodedAudio(pcm=pcm, sample_rate=parsed.header.audio_sample_rate)


def decode_bytes(data: bytes) -> DecodedAudio:
    parsed = parse_stream(data)
    windowed = decode_frames_device(parsed)
    return overlap_add(parsed, windowed)


def decode_file(path: str) -> DecodedAudio:
    with open(path, "rb") as f:
        return decode_bytes(f.read())


def decode_files(paths: Sequence[str]) -> List[DecodedAudio]:
    """Decode many files; device work is batched per file (and per bucket).

    For corpus-scale throughput use ``parallel.mesh.decode_corpus`` which
    additionally shards across devices.
    """
    return [decode_file(p) for p in paths]
