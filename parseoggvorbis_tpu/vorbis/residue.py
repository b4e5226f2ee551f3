"""Vorbis residue decode (spec 8.6): VQ spectral reconstruction.

Reference behavior: /root/reference/src/ParseOggVorbis.hpp:622-763.

TPU split: the classification/VQ codeword stream is bit-serial (host, this
module); the reconstructed spectra ship to the device compacted
(trailing-zero-trimmed dictionary codes, see runtime/device_decoder.py)
where the numeric pipeline consumes them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from ..utils.bitreader import BitReader
from ..utils.errors import check


@dataclass
class Residue:
    residue_type: int = 0
    begin: int = 0
    end: int = 0
    partition_size: int = 0
    num_classifications: int = 0
    classbook: int = 0
    cascades: List[int] = field(default_factory=list)
    # books[classification][pass]; -1 = unused
    books: Optional[np.ndarray] = None

    @classmethod
    def parse(cls, br: BitReader) -> "Residue":
        self = cls()
        self.residue_type = br.read_bits(16)
        check(self.residue_type <= 2, "residue type")
        self.begin = br.read_bits(24)
        self.end = br.read_bits(24)
        check(self.begin <= self.end, "residue begin/end")
        self.partition_size = br.read_bits(24) + 1
        self.num_classifications = br.read_bits(6) + 1
        self.classbook = br.read_bits(8)

        for _ in range(self.num_classifications):
            high_bits = 0
            low_bits = br.read_bits(3)
            if br.read_bits(1):
                high_bits = br.read_bits(5)
            self.cascades.append(high_bits * 8 + low_bits)

        books = np.full((self.num_classifications, 8), -1, dtype=np.int32)
        for i in range(self.num_classifications):
            for j in range(8):
                if self.cascades[i] & (1 << j):
                    books[i, j] = br.read_bits(8)
        self.books = books
        return self

    # -- decode ----------------------------------------------------------

    def decode(
        self,
        br: BitReader,
        codebooks,
        channel_used: Sequence[bool],
        decode_len: int,
        residue_type: Optional[int] = None,
    ) -> np.ndarray:
        """Decode residue vectors for a submap; returns [C, decode_len] f32.

        Type 2 interleaves all channels into one vector, decodes it as type 1,
        and de-interleaves (reference :685-694).
        """
        rtype = self.residue_type if residue_type is None else residue_type
        num_channel = len(channel_used)
        if rtype == 2:
            if not any(channel_used):  # spec 8.6.4: all unused -> skip
                return np.zeros((num_channel, decode_len), dtype=np.float32)
            flat = self.decode(
                br, codebooks, [True], num_channel * decode_len, residue_type=1
            )
            return flat.reshape(decode_len, num_channel).T.copy()

        out = np.zeros((num_channel, decode_len), dtype=np.float32)
        limit_begin = min(self.begin, decode_len)
        limit_end = min(self.end, decode_len)
        check(limit_begin <= limit_end, "residue limits")
        check(self.classbook < len(codebooks), "residue classbook out of range")
        class_codebook = codebooks[self.classbook]
        cw_per_codeword = class_codebook.dimensions
        n_to_read = limit_end - limit_begin
        if n_to_read == 0:
            return out
        partitions_to_read = n_to_read // self.partition_size
        ncls = self.num_classifications
        books = self.books
        psize = self.partition_size

        count_per_channel = partitions_to_read + cw_per_codeword
        classifications = np.zeros((num_channel, count_per_channel), dtype=np.int64)

        for pass_idx in range(8):
            partition_count = 0
            while partition_count < partitions_to_read:
                if pass_idx == 0:
                    for j in range(num_channel):
                        if channel_used[j]:
                            temp = class_codebook.decode_scalar(br)
                            for i in range(cw_per_codeword, 0, -1):
                                classifications[j, i - 1 + partition_count] = temp % ncls
                                temp //= ncls
                i = 0
                while i < cw_per_codeword and partition_count < partitions_to_read:
                    # NOTE: partition_count advances once per PARTITION
                    # (after the channel loop), per spec 8.6.2 step 6 and
                    # libvorbis.  The reference advances it per (i, j)
                    # INSIDE its channel loop (ParseOggVorbis.hpp:757) — a
                    # latent bug there, masked because its test files only
                    # exercise single-channel (type-2 interleaved) residues;
                    # multichannel uncoupled streams (e.g. libvorbis 4/6ch
                    # templates) misdecode under that order.  Found by
                    # tools/fuzz_roundtrip.py against system libvorbis.
                    for j in range(num_channel):
                        if channel_used[j]:
                            vq_class = classifications[j, partition_count]
                            vq_book = int(books[vq_class, pass_idx])
                            if vq_book >= 0:
                                vq_codebook = codebooks[vq_book]
                                offset = limit_begin + partition_count * psize
                                _accumulate_partition(
                                    br, vq_codebook, out[j], offset, psize, rtype
                                )
                    partition_count += 1
                    i += 1
        return out


def _accumulate_partition(br, vq_codebook, v, offset, partition_size, rtype):
    dims = vq_codebook.dimensions
    table = vq_codebook.vq_table
    if rtype == 0:
        # format 0: stride-interleaved add (spec 8.6.3)
        step = partition_size // dims
        for k in range(step):
            idx = vq_codebook.decode_scalar(br)
            check(table is not None and idx < len(table), "residue VQ entry")
            v[offset + k : offset + k + dims * step : step] += table[idx]
    else:
        # format 1: contiguous add (spec 8.6.4).  The last codeword is
        # clamped to the partition when dims does not divide
        # partition_size (libvorbis res1/res2 clamp identically; the
        # unclamped add would spill into the next partition)
        k = 0
        while k < partition_size:
            idx = vq_codebook.decode_scalar(br)
            check(table is not None and idx < len(table), "residue VQ entry")
            n = min(dims, partition_size - k)
            v[offset + k : offset + k + n] += table[idx][:n]
            k += n
