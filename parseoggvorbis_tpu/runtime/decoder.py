"""Streaming Vorbis decoder: host front-end + per-packet DSP pipeline.

This is the reference-semantics scalar path (numpy per packet), mirroring the
reference pipeline stage for stage (/root/reference/src/ParseOggVorbis.hpp:
1128-1274, spec 4.3) and pushing the same debug taps after every stage so the
differential harness can diff it against the patched libvorbis oracle.

The batched TPU path (``jax_backend``) consumes the same host front-end
(stages 1-5: mode/window select, floor Y decode + synthesis, residue symbol
decode) and runs stages 6-9 (coupling, floor multiply, iMDCT, window/OLA)
on device over [frames, channels] batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..callbacks import registry as taps_registry
from ..dsp.imdct import imdct, inverse_coupling
from ..dsp.tables import INVERSE_DB_TABLE
from ..ogg.page import Page, read_page
from ..utils.bitreader import BitReader
from ..utils.errors import check
from ..utils.specmath import ilog
from ..vorbis.header import IdHeader, parse_comment_header, parse_id_header
from ..vorbis.setup import Setup
from .state import DecodeState


class ParseCallbacks:
    """Consumer interface; return False from any hook to stop parsing.

    Mirrors the reference's public API (ParseOggVorbis.hpp:966-973).
    """

    def got_header(self, header: IdHeader) -> bool:
        return True

    def got_comments(self, vendor: str, comments: List[str]) -> bool:
        return True

    def got_setup(self, setup: Setup) -> bool:
        return True

    def got_pcm_data(self, channel_pcms: np.ndarray) -> bool:
        """channel_pcms: [C, num_samples] float32."""
        return True

    def got_eof(self) -> bool:
        return True


class StopParsing(Exception):
    pass


@dataclass
class FrameSymbols:
    """Host front-end output for one audio packet (device pipeline input).

    Fixed shapes per mode bucket: ``floor_curves`` [C, n] int,
    ``residues`` [C, n/2] float32.
    """

    mode_idx: int
    n: int
    prev_flag: bool
    next_flag: bool
    floor_curves: np.ndarray
    floor_decoded: List[bool]  # pre-propagation (envelope validity)
    floor_used: List[bool]  # post nonzero-vector propagate (multiply enable)
    residues: np.ndarray
    # per channel: final_ys / step2 flags in entry order (None if not decoded)
    floor_ys: Optional[List[Optional[np.ndarray]]] = None
    floor_flags: Optional[List[Optional[np.ndarray]]] = None
    # per channel: float32 LSP envelope [n/2] for floor0 channels, else None
    floor0_env: Optional[List[Optional[np.ndarray]]] = None

    @property
    def win_sel(self) -> int:
        """Window variant index: prev_flag + 2*next_flag (0 for short modes)."""
        return int(self.prev_flag) + 2 * int(self.next_flag)


class VorbisStream:
    """One logical Vorbis stream within an Ogg container."""

    def __init__(self) -> None:
        self.header: Optional[IdHeader] = None
        self.setup: Optional[Setup] = None
        self.decode_state: Optional[DecodeState] = None
        self.packet_count = 0
        self.audio_packet_count = 0
        self.taps: Optional[taps_registry.DecoderTaps] = None
        # cross-page packet reassembly (page-spanning packets supported —
        # a capability the reference lacks, ParseOggVorbis.hpp:66,89)
        from ..ogg.page import PacketAssembler

        self.assembler = PacketAssembler()

    # -- tap helper ------------------------------------------------------

    def _push(self, name: str, channel: int, data, kind: Optional[str] = None) -> None:
        if self.taps is not None:
            self.taps.push(name, channel, data, kind)

    def close(self) -> None:
        taps_registry.unregister_decoder(self)

    # -- header packets --------------------------------------------------

    def parse_id(self, data: bytes, callbacks: ParseCallbacks) -> None:
        self.header = parse_id_header(data)
        if not callbacks.got_header(self.header):
            raise StopParsing

    def parse_comment(self, data: bytes, callbacks: ParseCallbacks) -> None:
        vendor, comments = parse_comment_header(data)
        if not callbacks.got_comments(vendor, comments):
            raise StopParsing

    def parse_setup(self, data: bytes, callbacks: ParseCallbacks) -> None:
        header = self.header
        self.setup = Setup.parse_packet(data, header)
        self.decode_state = DecodeState(header.audio_channels)
        self.taps = taps_registry.register_decoder(
            self, "ParseOggVorbis", header.audio_sample_rate, header.audio_channels
        )
        for floor in self.setup.floors:
            if floor.floor_type == 1:
                f1 = floor.floor1
                self._push("floor1_unpack multiplier", -1,
                           np.array([f1.multiplier], dtype=np.uint8))
                self._push("floor1_unpack xs", -1, np.array(f1.xs, dtype=np.uint32))
        self._push("finish_setup", -1, None)
        if not callbacks.got_setup(self.setup):
            raise StopParsing

    # -- audio packets (spec 4.3) ---------------------------------------

    def decode_packet_symbols(self, data: bytes) -> "FrameSymbols":
        """Host-side half of audio decode: stages 1-5 of the pipeline.

        Everything bit-serial — mode/window select, floor Y Huffman decode +
        integer synthesis, residue symbol decode — producing the fixed-shape
        tensors the device back-end consumes.  Pushes the symbol-stage taps.
        """
        setup = self.setup
        header = self.header
        num_channels = header.audio_channels
        br = BitReader(data)

        # 4.3.1 packet type, mode and window decode
        check(len(data) > 0, "empty audio packet")  # callers skip these
        check(br.read_bits(1) == 0, "audio packet type bit")
        check(len(setup.modes) > 0, "no modes")
        mode_idx = br.read_bits(ilog(len(setup.modes) - 1))
        # non-power-of-two mode counts leave encodable out-of-range
        # numbers (spec: the packet is undecodable)
        check(mode_idx < len(setup.modes), "mode number out of range")
        mode = setup.modes[mode_idx]
        mapping = setup.mappings[mode.mapping]
        prev_flag = next_flag = False
        if mode.block_flag:
            prev_flag = bool(br.read_bits(1))
            next_flag = bool(br.read_bits(1))
        n = mode.blocksize
        half = n // 2

        # 4.3.2 floor curve decode (integer part)
        floor_curves = np.zeros((num_channels, n), dtype=np.int64)
        floor_decoded = [False] * num_channels  # pre-propagation: ys present
        floor_used = [False] * num_channels  # post nonzero-vector propagate
        floor_ys: List = [None] * num_channels
        floor_flags: List = [None] * num_channels
        floor0_env: List = [None] * num_channels
        for ch in range(num_channels):
            submap_number = mapping.muxs[ch]
            floor_number = mapping.submaps[submap_number].floor
            self._push("floor_number", ch, np.array([floor_number], dtype=np.uint8))
            floor = setup.floors[floor_number]
            if floor.floor_type == 0:
                # LSP floor decode (spec 6.2) — beyond the reference, which
                # rejects here (ParseOggVorbis.hpp:400-405)
                got = floor.floor0.decode_coeffs(br, setup.codebooks)
                if got is None:
                    continue
                amp_raw, coeffs = got
                floor_decoded[ch] = True
                floor_used[ch] = True
                floor0_env[ch] = floor.floor0.curve(amp_raw, coeffs, half)
                continue
            f1 = floor.floor1
            ys = f1.decode_ys(br, setup.codebooks)
            if ys is None:
                continue
            floor_decoded[ch] = True
            floor_used[ch] = True
            self._push("floor1 ys", -1, np.array(ys, dtype=np.uint32))
            final_ys, step2_flag = f1.synthesize_step1(ys)
            self._push("floor1 final_ys", -1, np.array(final_ys, dtype=np.uint32))
            self._push("floor1 step2_flag", -1, np.array(step2_flag, dtype=bool), "bool")
            curve = f1.render_curve_int(final_ys, step2_flag, n)
            self._push("floor1 floor", -1, curve.astype(np.uint32))
            floor_curves[ch] = curve
            floor_ys[ch] = np.asarray(final_ys, dtype=np.uint8)
            floor_flags[ch] = np.asarray(step2_flag, dtype=np.uint8)

        # 4.3.3 nonzero vector propagate
        for mag, ang in mapping.couplings:
            if floor_used[mag] or floor_used[ang]:
                floor_used[mag] = True
                floor_used[ang] = True

        # 4.3.4 residue decode
        residue_outputs = np.zeros((num_channels, half), dtype=np.float32)
        for submap_idx, submap in enumerate(mapping.submaps):
            submap_channels = [
                ch for ch in range(num_channels) if mapping.muxs[ch] == submap_idx
            ]
            channel_used = [floor_used[ch] for ch in submap_channels]
            residue = setup.residues[submap.residue]
            out = residue.decode(br, setup.codebooks, channel_used, half)
            for local_idx, ch in enumerate(submap_channels):
                residue_outputs[ch] = out[local_idx]

        return FrameSymbols(
            mode_idx=mode_idx,
            n=n,
            prev_flag=prev_flag,
            next_flag=next_flag,
            floor_curves=floor_curves,
            floor_decoded=floor_decoded,
            floor_used=floor_used,
            residues=residue_outputs,
            floor_ys=floor_ys,
            floor_flags=floor_flags,
            floor0_env=floor0_env,
        )

    def parse_audio(self, data: bytes, callbacks: ParseCallbacks) -> None:
        setup = self.setup
        header = self.header
        state = self.decode_state
        num_channels = header.audio_channels

        self._push("start_audio_packet", -1, None)
        self._push("abs_total_pos", -1,
                   np.array([state.abs_total_pos], dtype=np.uint64))
        self._push("expected_ending_total_pos", -1,
                   np.array([state.expected_ending_total_pos], dtype=np.int64))

        sym = self.decode_packet_symbols(data)
        mode = setup.modes[sym.mode_idx]
        mapping = setup.mappings[mode.mapping]
        window = mode.get_window(sym.prev_flag, sym.next_flag)
        n = sym.n
        half = n // 2
        state.begin_frame(n)

        floor_used = sym.floor_used
        # Envelope = inverse-dB lookup where a floor was decoded; zeros
        # otherwise (the reference's floor buffer stays zero-initialized for
        # channels used only via coupling propagation).
        floor_outputs = np.zeros((num_channels, n), dtype=np.float32)
        for ch in range(num_channels):
            if sym.floor_decoded[ch]:
                if sym.floor0_env is not None and sym.floor0_env[ch] is not None:
                    floor_outputs[ch, :half] = sym.floor0_env[ch]
                else:
                    floor_outputs[ch] = INVERSE_DB_TABLE[sym.floor_curves[ch]]
                self._push("floor_outputs", ch, floor_outputs[ch])

        residue_outputs = sym.residues.copy()
        for ch in range(num_channels):
            self._push("after_residue", ch, residue_outputs[ch])

        # 4.3.5 inverse coupling (reverse declaration order)
        for mag, ang in reversed(mapping.couplings):
            new_m, new_a = inverse_coupling(residue_outputs[mag], residue_outputs[ang])
            residue_outputs[mag] = new_m
            residue_outputs[ang] = new_a

        # 4.3.6 dot product (floor envelope * residue), in place
        for ch in range(num_channels):
            if floor_used[ch]:
                residue_outputs[ch][:half] *= floor_outputs[ch][:half]
            self._push("after_envelope", ch, residue_outputs[ch])

        # 4.3.7 inverse MDCT + windowed overlap-add
        pcm_frames = imdct(residue_outputs)  # [C, n]
        for ch in range(num_channels):
            self._push("pcm_after_mdct", ch, pcm_frames[ch])
            state.add_pcm_frame(ch, pcm_frames[ch], window)

        self._push("finish_audio_packet", -1, None)
        ready = state.ready_pcm()
        if ready is not None:
            for ch in range(num_channels):
                self._push("pcm", ch, ready[ch])
            if not callbacks.got_pcm_data(ready):
                raise StopParsing


class OggReader:
    """Top-level driver: page demux -> per-stream packet dispatch.

    Reference behavior: ParseOggVorbis.hpp:1385-1485.
    """

    def __init__(self, callbacks: ParseCallbacks) -> None:
        self.callbacks = callbacks
        self.streams: Dict[int, VorbisStream] = {}
        self.packet_count = 0

    def full_read(self, filename: str) -> None:
        with open(filename, "rb") as f:
            self.full_read_from_memory(f.read())

    def full_read_from_memory(self, data: bytes) -> None:
        offset = 0
        try:
            while True:
                page, offset = read_page(data, offset)
                if page is None:
                    break
                self._handle_page(page)
        except StopParsing:
            pass
        finally:
            for stream in self.streams.values():
                stream.close()

    def _handle_page(self, page: Page) -> None:
        serial = page.stream_serial_num
        if page.is_bos:
            check(serial not in self.streams, "duplicate BOS")
            self.streams[serial] = VorbisStream()
        check(serial in self.streams, "page for unknown stream")
        stream = self.streams[serial]

        for packet, granule in stream.assembler.feed(page):
            if stream.decode_state is not None:
                stream.decode_state.set_expected_ending_pos(granule)
            if stream.packet_count == 0:
                stream.parse_id(packet, self.callbacks)
            elif stream.packet_count == 1:
                stream.parse_comment(packet, self.callbacks)
            elif stream.packet_count == 2:
                stream.parse_setup(packet, self.callbacks)
            elif len(packet) == 0:
                # zero-length packet: legal framing (RFC 3533), undecodable
                # audio (spec 4.3.1 EOP) — skipped like libvorbis's
                # OV_ENOTAUDIO, never fabricated into a frame
                pass
            else:
                stream.parse_audio(packet, self.callbacks)
                stream.audio_packet_count += 1
            stream.packet_count += 1
            self.packet_count += 1

        if page.is_eos:
            if not self.callbacks.got_eof():
                raise StopParsing
            self.streams.pop(serial).close()
