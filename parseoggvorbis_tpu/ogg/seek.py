"""Sample-exact random access (seek) into Ogg Vorbis streams.

Capability beyond the reference (albertz/ParseOggVorbis decodes only from
byte 0; vorbisfile's ov_pcm_seek is the ecosystem bar): decode an arbitrary
sample range [start, end) of a long stream without parsing or computing the
preceding audio, bit-identical to slicing a full decode.

Design: Vorbis audio packet decode is stateless given the setup header
(floor/residue/coupling are intra-packet), and overlap-add only spans
adjacent frames — so decoding spliced bytes

    [header pages] + [pages from an anchor page .. end page]

reproduces the continuous decode exactly from the SECOND spliced frame's
emission onward (the first spliced frame emits nothing, exactly like the
first frame of a fresh stream; its right window half — the only part a
later frame uses — is computed from its own packet alone).  The anchor is
chosen so the spliced emission base lands at or before the requested start:

* a header-only page walk (no payload CRC, no packet decode) indexes every
  page's (offset, granule, flags, packet completions) per serial;
* the anchor is the nearest non-CONTINUED page at or before the last page
  whose granule position is <= start.  Nothing spans into a non-continued
  page, so the first packet starting there completes at or before that
  granule — emission base <= start is guaranteed (RFC 3533 granule = last
  completed sample of the page);
* the absolute emission base is solved from the first granule-bearing
  spliced frame m:  base = granule[m] - sum(lap emissions of frames 1..m),
  all blocksizes known after the splice parse;
* the standard device decode path runs with precomputed, granule-validated
  ``emission_nums`` (runtime/device_decoder._compute_emission_nums with
  ``abs_base``), and the result is sliced to [start, end).

The decode cost is O(range + one page), not O(start + range).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..utils.errors import ParseError, check
from .page import HEADER_FLAG_CONTINUED, HEADER_SIZE, _HEADER_STRUCT

__all__ = [
    "PageIndexEntry",
    "StreamPageIndex",
    "walk_pages",
    "plan_sample_range",
    "SplicePlan",
    "splice_corpus",
]


@dataclass
class PageIndexEntry:
    """Header-only view of one physical page."""

    offset: int  # byte offset of the 'OggS' capture pattern
    end: int  # byte offset one past the page's payload
    granule: int  # absolute granule position (-1: no packet completes)
    serial: int
    flags: int
    completions: int  # number of packets completing on this page
    seq: int = -1  # page sequence number (per serial; gap => lost pages)

    @property
    def is_continued(self) -> bool:
        return bool(self.flags & HEADER_FLAG_CONTINUED)


@dataclass
class StreamPageIndex:
    """Per-serial page index of one logical stream."""

    serial: int
    pages: List[PageIndexEntry]  # all pages of this serial, in file order
    header_end: int  # index into *pages*: first audio page

    @property
    def audio_pages(self) -> List[PageIndexEntry]:
        return self.pages[self.header_end:]

    @property
    def total_samples(self) -> Optional[int]:
        """Granule of the last granule-bearing page (None if none)."""
        for p in reversed(self.pages):
            if p.granule >= 0:
                return p.granule
        return None


def walk_pages(data: bytes, serial: Optional[int] = None) -> StreamPageIndex:
    """Header-only page walk; indexes one logical Vorbis stream.

    Parses only the 27-byte header + segment table of each page (payloads
    are skipped and CRC is NOT verified here — the decode of the spliced
    range re-verifies every page it actually consumes).  ``serial`` selects
    the logical stream in a multiplexed/chained file; default is the first
    stream whose BOS payload begins with the Vorbis id-header signature.
    """
    pages: List[PageIndexEntry] = []
    off = 0
    n = len(data)
    target = serial
    while off < n:
        if off + HEADER_SIZE > n:
            raise ParseError("truncated page header at offset %d" % off)
        (capture, version, flags, granule, pserial, seq, _crc,
         nseg) = _HEADER_STRUCT.unpack_from(data, off)
        check(capture == b"OggS", "bad capture pattern")
        check(version == 0, "bad stream structure version")
        seg_off = off + HEADER_SIZE
        check(seg_off + nseg <= n, "truncated segment table")
        segment_table = data[seg_off:seg_off + nseg]
        data_off = seg_off + nseg
        data_len = sum(segment_table)
        check(data_off + data_len <= n, "truncated page payload")
        if target is None and (flags & 0x2):  # BOS
            if data[data_off:data_off + 7] == b"\x01vorbis":
                target = pserial
        if target is not None and pserial == target:
            completions = sum(1 for lace in segment_table if lace < 255)
            pages.append(PageIndexEntry(
                offset=off, end=data_off + data_len, granule=granule,
                serial=pserial, flags=flags, completions=completions,
                seq=seq))
        off = data_off + data_len
    if target is None:
        raise ParseError("no Vorbis BOS page found")
    check(bool(pages), "no pages for serial %d" % target)

    # Header span: Vorbis framing puts the 3 header packets on pages that
    # precede all audio; audio begins on the page after the 3rd completion.
    done = 0
    header_end = None
    for i, p in enumerate(pages):
        done += p.completions
        if done >= 3:
            check(done == 3, "audio packet on a header page")
            header_end = i + 1
            break
    if header_end is None:
        # headers-only (or truncated-in-headers) stream: no audio pages
        header_end = len(pages)
    return StreamPageIndex(serial=target, pages=pages, header_end=header_end)


@dataclass
class SplicePlan:
    """Byte spans whose concatenation decodes a sample range exactly."""

    spans: List[Tuple[int, int]]  # (start, end) byte ranges into the file
    start_sample: int  # clamped requested start
    end_sample: Optional[int]  # clamped requested end (None: to stream end)
    empty: bool = False
    # True when the splice begins at the stream's first audio page: the
    # decode must then use abs_base=0 and the standard emission accounting
    # (which replicates the reference's initial/short-stream truncation
    # semantics) instead of solving the base from the first granule — on a
    # single-page stream that granule TRUNCATES, and solving from it
    # underestimates the base (found by the roundtrip fuzzer's seek probe)
    from_start: bool = False
    # 0-based index, among the stream's audio packets, of the first packet
    # that STARTS on the anchor page (= packets completing on earlier audio
    # pages; exact because nothing spans into a non-continued page).  Gives
    # spliced decodes an absolute packet/row coordinate system — used by the
    # ranged feature extraction (features/batched.get_features_range)
    anchor_packet: int = 0

    def splice(self, data: bytes) -> bytes:
        return b"".join(data[a:b] for a, b in self.spans)


def anchor_window(pages, start: int, end: Optional[int]):
    """(anchor, last) page indices covering samples [start, end) of a
    run of pages — THE anchor rule (module docstring): the nearest
    non-continued page at or before the last page with granule <= start,
    through the first page whose granule reaches ``end``.  Shared by the
    seek planner and the recovery decoder's span trimming (spans are
    seq-contiguous, so the non-continued-anchor guarantee holds there
    too)."""
    anchor = 0
    for i, p in enumerate(pages):
        if 0 <= p.granule <= start:
            anchor = i
        elif p.granule > start:
            break
    while anchor > 0 and pages[anchor].is_continued:
        anchor -= 1
    last = len(pages) - 1
    if end is not None:
        for i in range(anchor, len(pages)):
            if pages[i].granule >= end:
                last = i
                break
    return anchor, last


def plan_sample_range(index: StreamPageIndex, start: int,
                      end: Optional[int]) -> SplicePlan:
    """Plan the byte splice covering samples [start, end) of the stream.

    The plan's pages run from the anchor (emission base guaranteed
    <= clamped start, see module docstring) through the first page whose
    granule reaches ``end`` (or the stream's last page).  Header pages are
    always included.  An empty plan means the range contains no samples.
    """
    start = max(0, int(start))
    if end is not None:
        end = int(end)
    headers = [(p.offset, p.end) for p in index.pages[:index.header_end]]
    audio = index.audio_pages
    total = index.total_samples
    if not audio or total is None or (end is not None and end <= start) \
            or start >= total:
        return SplicePlan(spans=headers, start_sample=start,
                          end_sample=end, empty=True)

    anchor, last = anchor_window(audio, start, end)
    check(not audio[anchor].is_continued,
          "first audio page continues an unseen packet")
    spans = headers + [(audio[anchor].offset, audio[last].end)]
    return SplicePlan(spans=spans, start_sample=start, end_sample=end,
                      from_start=(anchor == 0),
                      anchor_packet=sum(p.completions
                                        for p in audio[:anchor]))


def splice_corpus(blobs, ranges, on_plan_error: str = "raise"):
    """Shared range->splice resolution for the batched callers
    (runtime/batch.decode_corpus, features/batched.get_features_batched).

    Returns ``(spliced_blobs, plans)``: ``plans[i]`` is the
    :class:`SplicePlan` for ranged blobs and None for pass-through
    entries.  A ``ranges`` entry may be ``None`` (whole blob),
    ``(start, end_or_None)``, or a prebuilt :class:`SplicePlan` — the
    latter skips the per-call page walk entirely (callers that decode
    the same sources repeatedly, e.g. data.CropLoader, plan from a
    cached index).  ``on_plan_error="keep"`` degrades an unplannable blob
    to decode-everything-and-slice: the blob passes through whole with a
    from_start plan still carrying the requested range, so a blob whose
    planning fails but whose full parse succeeds returns the REQUESTED
    crop (slow but correct) — never the full stream mislabeled as a crop
    — while a blob that cannot parse at all still surfaces its error
    per-stream instead of failing the whole batch.
    """
    if len(ranges) != len(blobs):  # caller usage error, not a parse error
        raise ValueError("ranges must have one entry per blob")
    spliced, plans = [], []
    for b, rng in zip(blobs, ranges):
        if rng is None:
            spliced.append(b)
            plans.append(None)
            continue
        if isinstance(rng, SplicePlan):
            plan = rng
        else:
            try:
                plan = plan_sample_range(walk_pages(b), rng[0], rng[1])
            except Exception:
                if on_plan_error != "keep":
                    raise
                spliced.append(b)
                start = max(0, int(rng[0]))
                end = rng[1] if rng[1] is None else int(rng[1])
                plans.append(SplicePlan(
                    spans=[(0, len(b))], start_sample=start,
                    end_sample=end, from_start=True))
                continue
        spliced.append(plan.splice(b))
        plans.append(plan)
    return spliced, plans
