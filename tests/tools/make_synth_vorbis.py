"""Synthesize legal Vorbis streams at ANY blocksize — including 8192.

libvorbis's encoder never emits blocks above 2048 (its mode templates),
so the 64..8192 decode range the spec allows (and the reference accepts,
/root/reference/src/ParseOggVorbis.hpp:1294-1298) cannot be covered by
encoder-generated corpora.  This tool writes a minimal-but-legal stream
from scratch — real floor-1 curves, type-1 residues with classbook +
VQ value book, mixed short/long modes with honest window flags — which
the SYSTEM libvorbis decoder accepts, giving an independent oracle for
our 8192 end-to-end path (round-2 VERDICT item 5).

Test-asset tool only; not part of the decode library.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

from parseoggvorbis_tpu.vorbis.codebook import assign_codewords  # noqa: E402
from repaginate import _emit_page, _lacings  # noqa: E402


class BitWriter:
    """Vorbis bitpack convention: LSb of each value first, bytes LSb-up."""

    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0  # bits used in the last byte

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) % 8

    def write_codeword(self, codeword: int, length: int) -> None:
        """Huffman codewords enter the stream MSb of the codeword first."""
        for i in range(length - 1, -1, -1):
            self.write((codeword >> i) & 1, 1)

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


def float32_pack(x: float) -> int:
    """Inverse of spec 9.2.2 float32_unpack, for exactly-representable x."""
    sign = 0
    if x < 0:
        sign = 0x80000000
        x = -x
    if x == 0:
        return 0
    m, e = np.frexp(x)  # x = m * 2^e, m in [0.5, 1)
    mant = int(m * (1 << 21))
    e -= 21
    exp_field = int(e) + 788
    assert 0 <= exp_field < 1024 and 0 < mant < (1 << 21)
    v = sign | (exp_field << 21) | mant
    return v


class _Flat:
    """A flat codebook: `entries` codewords, all the same length."""

    def __init__(self, entries: int, length: int):
        self.entries = entries
        self.length = length
        assigned = assign_codewords([(i, length) for i in range(entries)])
        self.codewords = {e: (l, cw) for e, l, cw in assigned}

    def write_scalar_header(self, w: BitWriter, dims: int):
        w.write(0x564342, 24)          # sync
        w.write(dims, 16)
        w.write(self.entries, 24)
        w.write(0, 1)                  # not ordered
        w.write(0, 1)                  # not sparse
        for _ in range(self.entries):
            w.write(self.length - 1, 5)

    def write_entry(self, w: BitWriter, entry: int):
        l, cw = self.codewords[entry]
        w.write_codeword(cw, l)


class SynthStream:
    """One synthetic mono Vorbis stream with blocksizes (bs0, bs1)."""

    FLOOR_ENTRIES = 64     # y values 0..63 (multiplier 4 -> range 64)
    CLASSES = 2            # residue classifications (0 = silent partition)
    VQ_ENTRIES = 16
    VQ_DIMS = 4
    PART_SIZE = 32
    RES_END = 2048

    LSP_ORDER = 4
    LSP_LN = 16  # floor0 bark_map_size

    def __init__(self, bs0: int = 4096, bs1: int = 8192, rate: int = 48000,
                 seed: int = 0, floor_kind: str = "floor1",
                 floor_xs=(128, 1024), residue_type: int = 1,
                 lsp_order: int = None, vq_sequence_p: bool = False,
                 lsp_dims: int = None, coupling_steps: int = 0,
                 single_entry_floor_book: bool = False,
                 unused_empty_book: bool = False, vq_dims: int = None,
                 amp_bits: int = 6):
        assert bs0 <= bs1 <= 8192
        assert floor_kind in ("floor1", "floor0", "mixed")
        # repeated (0,1) square-polar steps on the stereo stream: legal per
        # spec 4.2.4 (coupling_steps = read(8)+1, up to 256) but emitted by
        # no encoder — covers >64-step mappings end-to-end (a fixed-size
        # binding buffer once silently dropped steps 65+)
        assert 0 <= coupling_steps <= 256
        assert coupling_steps == 0 or floor_kind == "mixed"
        self.coupling_steps = coupling_steps
        # route the floor1 Y reads through a 1-used-entry codebook —
        # libvorbis' retconned extension (single codeword of length 1,
        # either bit value decodes to the entry); no encoder emits one
        self.single_entry_floor_book = bool(single_entry_floor_book)
        assert not single_entry_floor_book or floor_kind == "floor1"
        # append a sparse codebook with ZERO used entries, referenced by
        # nothing: legal (vorbis_book_init_decode builds no tables for
        # n==0, vorbis_sharedbook.c:319-334); no encoder emits one
        self.unused_empty_book = bool(unused_empty_book)
        if lsp_order is not None:
            # odd orders hit the distinct p/q product tail in every decoder
            # (spec 6.2.3's "m is odd" case); cumsum steps of 1-2 keep the
            # roots interlaced for any order with max mult 2*order < 16
            assert 2 <= lsp_order <= 7
            self.LSP_ORDER = lsp_order  # instance shadows the class default
        # book dims < order => the channel ships ceil(order/dims) vectors
        # and every block after the first is offset by the previous block's
        # last value (spec 6.2.2's cumulative block offset) — another path
        # no encoder-generated stream ever takes
        self.LSP_DIMS = lsp_dims or self.LSP_ORDER
        assert 2 <= self.LSP_DIMS <= self.LSP_ORDER
        self.bs0, self.bs1, self.rate = bs0, bs1, rate
        self.rng = np.random.RandomState(seed)
        self.floor_kind = floor_kind
        self.floor_xs = tuple(floor_xs)  # partition X values (same count)
        # types 0 and 1 share the same BITSTREAM layout (same codeword
        # sequence); only the decoder's add pattern differs (format 0 is
        # stride-interleaved, spec 8.6.3) — so covering type 0 end-to-end
        # costs exactly one header bit
        assert residue_type in (0, 1)
        self.residue_type = residue_type
        # mixed: stereo with ch0 -> floor0 submap, ch1 -> floor1 submap
        self.channels = 2 if floor_kind == "mixed" else 1
        self.floor_book = _Flat(self.FLOOR_ENTRIES, 6)
        self.class_book = _Flat(self.CLASSES ** 2, 2)  # dims 2
        # vq_dims that does NOT divide PART_SIZE is legal (no encoder emits
        # it): format 1 then truncates the FINAL codeword of each partition
        # (vorbis_book_decodev_add's k<n clamp), format 0 reads only
        # floor(PART_SIZE/dims) codewords (decodevs_add's step loop) — the
        # two formats' bitstreams differ in that case, handled in
        # write_residue_one_channel
        if vq_dims is not None:
            assert 1 <= vq_dims <= self.PART_SIZE
            self.VQ_DIMS = vq_dims
        # floor0 amplitude width: spec allows up to 63 (read(6)); >32 is
        # beyond libvorbis' oggpack_read limit, so only our two front-ends
        # can be differentially compared there
        assert 1 <= amp_bits <= 63
        self.amp_bits = amp_bits
        self.value_book = _Flat(self.VQ_ENTRIES, 4)
        # spec 3.2.1 step 10 (cumulative dims) — never set by libvorbis'
        # encoder, so only a synthetic stream can cover it end-to-end
        self.vq_sequence_p = vq_sequence_p
        self.lsp_book = _Flat(16, 4)  # floor0 coefficient VQ book
        self.two_modes = bs0 != bs1

    # ------------------------------------------------------------ headers --

    def id_header(self) -> bytes:
        out = bytearray(b"\x01vorbis")
        out += (0).to_bytes(4, "little")         # version
        out += bytes([self.channels])
        out += int(self.rate).to_bytes(4, "little")
        out += (0).to_bytes(4, "little") * 3     # bitrates
        out += bytes([(self.bs0.bit_length() - 1)
                      | ((self.bs1.bit_length() - 1) << 4)])
        out += bytes([1])                        # framing
        return bytes(out)

    def comment_header(self) -> bytes:
        vendor = b"parseoggvorbis_tpu synthetic"
        out = bytearray(b"\x03vorbis")
        out += len(vendor).to_bytes(4, "little") + vendor
        out += (0).to_bytes(4, "little")         # no comments
        out += bytes([1])
        return bytes(out)

    def setup_header(self) -> bytes:
        w = BitWriter()
        for b in b"\x05vorbis":
            w.write(b, 8)
        # --- codebooks: floor(0), classbook(1), VQ values(2), lsp(3)
        # [+ single-entry(4) when single_entry_floor_book]
        # [+ zero-used-entry book appended last when unused_empty_book]
        nbooks = 4 + (1 if self.single_entry_floor_book else 0) \
                   + (1 if self.unused_empty_book else 0)
        w.write(nbooks - 1, 8)
        self.floor_book.write_scalar_header(w, dims=1)
        w.write(0, 4)                            # lookup type 0
        self.class_book.write_scalar_header(w, dims=2)
        w.write(0, 4)
        self.value_book.write_scalar_header(w, dims=self.VQ_DIMS)
        w.write(2, 4)                            # lookup type 2 (explicit)
        # keep decoded amplitudes in the ~[-1, 1] range of real audio so
        # the differential eps (1e-5 abs) stays meaningful at n=8192
        w.write(float32_pack(-0.25), 32)         # minimum
        w.write(float32_pack(0.03125), 32)       # delta
        w.write(4 - 1, 4)                        # value bits
        w.write(1 if self.vq_sequence_p else 0, 1)  # sequence_p
        self.vq_mults = self.rng.randint(
            0, 16, self.VQ_ENTRIES * self.VQ_DIMS)
        for m in self.vq_mults:
            w.write(int(m), 4)
        # lsp book: each entry's values are strictly ascending (cumsum of
        # positive steps) and land MIDWAY between the bark grid's cosine
        # sample points (minimum/delta are halves/units of pi/LSP_LN), so
        # the decoded LSP roots stay interlaced and bounded away from every
        # evaluation point — 1/sqrt(p+q) is a dB scale, and roots near a
        # grid point overflow the envelope in ANY decoder (incl. libvorbis)
        self.lsp_book.write_scalar_header(w, dims=self.LSP_DIMS)
        w.write(2, 4)                            # lookup type 2
        unit = np.pi / self.LSP_LN
        if self.LSP_DIMS < self.LSP_ORDER:
            # multi-vector: block k's roots sit at (k * minimum + integers)
            # * unit, so a HALF-unit minimum would put second-block roots ON
            # the grid (two half-odd lattice values sum to an integer).  A
            # quarter-unit minimum keeps block1 at x.25 and block2 at x.5 —
            # off-grid everywhere, with the amplitude capped below to keep
            # the tighter x.25 margin out of envelope overflow
            w.write(float32_pack(2.25 * unit), 32)  # minimum
        else:
            w.write(float32_pack(2.5 * unit), 32)   # minimum
        w.write(float32_pack(unit), 32)          # delta
        w.write(4 - 1, 4)
        w.write(0, 1)
        steps = self.rng.randint(1, 3, (16, self.LSP_DIMS))
        self.lsp_mults = np.cumsum(steps, axis=1).reshape(-1)
        for m in self.lsp_mults:
            w.write(int(m), 4)
        if self.single_entry_floor_book:
            # book 4: ONE used entry, length 1, no VQ — the retconned
            # single-entry special case (vorbis_sharedbook.c:126-130)
            w.write(0x564342, 24)
            w.write(1, 16)                       # dims
            w.write(1, 24)                       # entries
            w.write(0, 1)                        # not ordered
            w.write(0, 1)                        # not sparse
            w.write(1 - 1, 5)                    # length 1
            w.write(0, 4)                        # lookup 0
        if self.unused_empty_book:
            # final book: sparse, every used-flag 0 — zero used entries,
            # referenced by no floor/residue.  The oracle accepts it
            # (n==0 skips table build); a decoder that runs the
            # underspecification check on the empty length list rejects
            # the whole stream.
            w.write(0x564342, 24)
            w.write(1, 16)                       # dims
            w.write(3, 24)                       # entries
            w.write(0, 1)                        # not ordered
            w.write(1, 1)                        # sparse
            for _ in range(3):
                w.write(0, 1)                    # used-flag 0
            w.write(0, 4)                        # lookup 0
        # --- time transforms (placeholder zeros)
        w.write(0, 6)
        w.write(0, 16)
        # --- floors
        def write_floor0():
            # LSP floor (spec 6.2): the surface NO mainstream encoder emits
            w.write(0, 16)                       # floor type 0
            w.write(self.LSP_ORDER, 8)           # order
            w.write(self.rate, 16)               # rate
            w.write(self.LSP_LN, 16)             # bark_map_size
            w.write(self.amp_bits, 6)            # amplitude bits
            w.write(8, 8)                        # amplitude offset (dB)
            w.write(1 - 1, 4)                    # one book
            w.write(3, 8)                        # the lsp book

        num_floors = 2 if self.floor_kind == "mixed" else 1
        w.write(num_floors - 1, 6)               # floor_count - 1
        if self.floor_kind in ("floor0", "mixed"):
            write_floor0()
        if self.floor_kind in ("floor1", "mixed"):
            w.write(1, 16)                           # floor type 1
            w.write(1, 5)                            # partitions
            w.write(0, 4)                            # partition class list: [0]
            w.write(2 - 1, 3)                        # class 0 dims = 2
            w.write(0, 2)                            # subclasses = 0
            # subclass book 0 (+1 encoding): the floor book, or the
            # single-entry book when exercising the retconned special case
            w.write((4 if self.single_entry_floor_book else 0) + 1, 8)
            w.write(4 - 1, 2)                        # multiplier 4 (range 64)
            # rangebits 11: the second floor point x1 = 2^rangebits must stay
            # below the SHORT mode's full-window curve length (the host
            # extractors index the rendered curve at xs — x1 == n would be an
            # IndexError in ours and the reference alike)
            w.write(11, 4)                           # rangebits
            for x in self.floor_xs:                  # partition X values
                w.write(int(x), 11)
        # --- residues
        w.write(0, 6)                            # residue_count - 1
        w.write(self.residue_type, 16)           # type 0 or 1
        w.write(0, 24)                           # begin
        w.write(self.RES_END, 24)                # end
        w.write(self.PART_SIZE - 1, 24)
        w.write(self.CLASSES - 1, 6)
        w.write(1, 8)                            # classbook = book 1
        w.write(0, 3)                            # class 0 cascade low = 0
        w.write(0, 1)
        w.write(1, 3)                            # class 1 cascade low = 1
        w.write(0, 1)
        w.write(2, 8)                            # class 1 stage-0 book = 2
        # --- mappings: one type-0 mapping
        w.write(0, 6)
        w.write(0, 16)                           # mapping type 0
        if self.floor_kind == "mixed":
            # two submaps: ch0 -> submap0 (floor0), ch1 -> submap1 (floor1)
            w.write(1, 1)                        # submaps follow
            w.write(2 - 1, 4)
            if self.coupling_steps:
                w.write(1, 1)                    # square-polar coupling
                w.write(self.coupling_steps - 1, 8)
                for _ in range(self.coupling_steps):
                    w.write(0, 1)                # magnitude ch (ilog(2-1)=1)
                    w.write(1, 1)                # angle ch
            else:
                w.write(0, 1)                    # no coupling
            w.write(0, 2)                        # reserved
            w.write(0, 4)                        # mux ch0 -> submap 0
            w.write(1, 4)                        # mux ch1 -> submap 1
            w.write(0, 8)                        # submap0: time (ignored)
            w.write(0, 8)                        #          floor 0 (LSP)
            w.write(0, 8)                        #          residue 0
            w.write(0, 8)                        # submap1: time
            w.write(1, 8)                        #          floor 1
            w.write(0, 8)                        #          residue 0
        else:
            w.write(0, 1)                            # one submap
            w.write(0, 1)                            # no coupling
            w.write(0, 2)                            # reserved
            w.write(0, 8)                            # time config (ignored)
            w.write(0, 8)                            # floor 0
            w.write(0, 8)                            # residue 0
        # --- modes
        if self.two_modes:
            w.write(2 - 1, 6)
            for flag in (0, 1):
                w.write(flag, 1)                 # block flag
                w.write(0, 16)                   # window type
                w.write(0, 16)                   # transform type
                w.write(0, 8)                    # mapping
        else:
            w.write(0, 6)
            w.write(0, 1)
            w.write(0, 16)
            w.write(0, 16)
            w.write(0, 8)
        w.write(1, 1)                            # framing
        return w.getvalue()

    # ------------------------------------------------------------- frames --

    def audio_packet(self, block_flag: int, prev_flag: int,
                     next_flag: int) -> bytes:
        w = BitWriter()
        w.write(0, 1)                            # audio packet
        if self.two_modes:
            w.write(block_flag, 1)               # mode number (1 bit)
        if block_flag:
            w.write(prev_flag, 1)
            w.write(next_flag, 1)
        n = self.bs1 if block_flag else self.bs0
        half = n // 2

        def write_floor0_channel():
            # spec 6.2.2: amplitude, book number (ilog(1) = 1 bit), one
            # LSP vector.  amplitude == 0 (1 in 8 frames) marks the channel
            # unused: no book/coefficients follow (and no residue reads for
            # a fully-unused submap).
            amp_hi = 20 if self.LSP_DIMS < self.LSP_ORDER else 64
            amp = (0 if self.rng.randint(0, 8) == 0
                   else int(self.rng.randint(1, amp_hi)))
            if self.amp_bits != 6 and amp:
                # keep the amp/maxval ratio of the 6-bit default so the
                # rendered envelope stays in the validated range
                amp = max(1, (((1 << self.amp_bits) - 1) * amp) // 63)
            w.write(amp, self.amp_bits)
            if amp == 0:
                return False
            w.write(0, 1)
            nvec = -(-self.LSP_ORDER // self.LSP_DIMS)
            for _ in range(nvec):
                self.lsp_book.write_entry(w, int(self.rng.randint(0, 16)))
            return True

        def write_floor1_channel():
            # floor 1 (spec 7.2.3): nonzero, y0/y1 raw (ilog(range-1) = 6
            # bits), then one partition of class 0 -> 2 Y entries
            w.write(1, 1)
            w.write(int(self.rng.randint(0, 41)), 6)
            w.write(int(self.rng.randint(0, 41)), 6)
            for _ in range(2):
                if self.single_entry_floor_book:
                    # single-entry book: one bit of EITHER value -> entry 0
                    w.write(int(self.rng.randint(0, 2)), 1)
                else:
                    self.floor_book.write_entry(w, int(self.rng.randint(0, 41)))
            return True

        used = []
        for ch in range(self.channels):
            ch_kind = (self.floor_kind if self.floor_kind != "mixed"
                       else ("floor0" if ch == 0 else "floor1"))
            used.append(write_floor0_channel() if ch_kind == "floor0"
                        else write_floor1_channel())

        def write_residue_one_channel():
            # residue type 1, one pass: classwords of 2 partitions via the
            # classbook, class-1 partitions carry PART_SIZE/VQ_DIMS entries
            limit = min(self.RES_END, half)
            parts = limit // self.PART_SIZE
            classes = self.rng.randint(0, self.CLASSES, parts)
            j = 0
            while j < parts:
                cword = int(classes[j]) * self.CLASSES \
                    + int(classes[min(j + 1, parts - 1)])
                if j + 1 >= parts:
                    cword = int(classes[j]) * self.CLASSES  # pad digit 0
                self.class_book.write_entry(w, cword)
                for k in range(2):
                    if j + k >= parts:
                        break
                    if classes[j + k] == 1:
                        # format 1 consumes ceil(ps/dims) codewords (the
                        # last one partially applied when dims does not
                        # divide ps); format 0 consumes floor(ps/dims)
                        if self.residue_type == 1:
                            ncw = -(-self.PART_SIZE // self.VQ_DIMS)
                        else:
                            ncw = self.PART_SIZE // self.VQ_DIMS
                        for _ in range(ncw):
                            self.value_book.write_entry(
                                w, int(self.rng.randint(0, self.VQ_ENTRIES)))
                j += 2

        # per submap (mixed: submap0 = ch0, submap1 = ch1), channels with
        # do-not-decode floors contribute no residue reads
        for ch in range(self.channels):
            if used[ch]:
                write_residue_one_channel()
        return w.getvalue()

    def make(self, num_frames: int = 24, truncate_final: int = 0) -> bytes:
        """A complete single-stream Ogg file with num_frames audio frames."""
        if self.two_modes:
            flags = list(self.rng.randint(0, 2, num_frames))
        else:
            flags = [0] * num_frames
        packets = [self.id_header(), self.comment_header(),
                   self.setup_header()]
        granules = [0, 0, 0]
        total = 0
        prev_n = None
        for t, bf in enumerate(flags):
            n = self.bs1 if bf else self.bs0
            prev_flag = int(prev_n == self.bs1) if prev_n else 0
            next_n = (self.bs1 if (t + 1 < num_frames and flags[t + 1])
                      else self.bs0)
            next_flag = int(next_n == self.bs1) if t + 1 < num_frames else 0
            packets.append(self.audio_packet(bf, prev_flag, next_flag))
            if prev_n is not None:
                total += prev_n // 4 + n // 4
            granules.append(total)
            prev_n = n
        if truncate_final:
            granules[-1] = max(0, total - truncate_final)

        serial = 0x53594E54  # 'SYNT'
        out = bytearray()
        # page 0: id (BOS); page 1: comment+setup; then one page per packet
        _emit_page(out, serial, 0, 0, 0x02,
                   _lacings(len(packets[0]), True), packets[0])
        _emit_page(out, serial, 1, 0, 0,
                   _lacings(len(packets[1]), True)
                   + _lacings(len(packets[2]), True),
                   packets[1] + packets[2])
        seq = 2
        for i in range(3, len(packets)):
            eos = 0x04 if i == len(packets) - 1 else 0
            _emit_page(out, serial, seq, granules[i], eos,
                       _lacings(len(packets[i]), True), packets[i])
            seq += 1
        return bytes(out)


def make_8192_stream(seed: int = 0, num_frames: int = 24,
                     mixed: bool = True, truncate_final: int = 0) -> bytes:
    """The test entry point: a legal stream whose long blocks are 8192."""
    s = SynthStream(bs0=4096 if mixed else 8192, bs1=8192, seed=seed)
    return s.make(num_frames=num_frames, truncate_final=truncate_final)


def make_floor0_stream(seed: int = 0, num_frames: int = 24,
                       bs0: int = 512, bs1: int = 2048) -> bytes:
    """A legal stream using the LSP floor (floor type 0) — the spec
    surface no mainstream encoder emits and the reference refuses to
    decode.  The system libvorbis decodes it, providing the oracle."""
    s = SynthStream(bs0=bs0, bs1=bs1, seed=seed, floor_kind="floor0")
    return s.make(num_frames=num_frames)


if __name__ == "__main__":
    blob = make_8192_stream()
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth8192.ogg"
    open(path, "wb").write(blob)
    print("wrote %s (%d bytes)" % (path, len(blob)))
