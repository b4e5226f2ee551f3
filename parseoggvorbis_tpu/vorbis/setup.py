"""Vorbis setup header (spec 4.2.4): codebooks, floors, residues, mappings, modes.

Immutable after parse; all audio decode reads from these tables.
Reference behavior: /root/reference/src/ParseOggVorbis.hpp:889-964, 1342-1373.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ..utils.bitreader import BitReader
from ..utils.errors import check
from .codebook import Codebook
from .floor import Floor
from .header import IdHeader
from .mapping import Mapping
from .mode import Mode
from .residue import Residue


@dataclass
class Setup:
    codebooks: List[Codebook] = field(default_factory=list)
    floors: List[Floor] = field(default_factory=list)
    residues: List[Residue] = field(default_factory=list)
    mappings: List[Mapping] = field(default_factory=list)
    modes: List[Mode] = field(default_factory=list)

    @classmethod
    def parse_packet(cls, data: bytes, header: IdHeader) -> "Setup":
        """Parse a setup packet (type 5, including the 7-byte preamble)."""
        check(len(data) >= 16, "setup packet too short")
        check(data[0] == 5, "setup packet type")
        check(data[1:7] == b"vorbis", "setup packet magic")
        br = BitReader(data[7:])
        self = cls.parse(br, header)
        return self

    @classmethod
    def parse(cls, br: BitReader, header: IdHeader) -> "Setup":
        self = cls()
        num_channels = header.audio_channels

        count = br.read_bits(8) + 1
        for _ in range(count):
            self.codebooks.append(Codebook.parse(br))
        check(not br.reached_end, "setup truncated in codebooks")

        # Time-domain transforms: placeholders, must be zero.
        count = br.read_bits(6) + 1
        for _ in range(count):
            check(br.read_bits(16) == 0, "time transform placeholder")
        check(not br.reached_end, "setup truncated in time transforms")

        count = br.read_bits(6) + 1
        for _ in range(count):
            self.floors.append(Floor.parse(br, len(self.codebooks)))
        check(not br.reached_end, "setup truncated in floors")

        count = br.read_bits(6) + 1
        for _ in range(count):
            r = Residue.parse(br)
            # 8-bit book fields: bound against the actual codebook count
            # so crafted headers reject cleanly (mirrors the native path)
            check(r.classbook < len(self.codebooks),
                  "residue classbook out of range")
            check(int(r.books.max()) < len(self.codebooks),
                  "residue book out of range")
            self.residues.append(r)
        check(not br.reached_end, "setup truncated in residues")

        count = br.read_bits(6) + 1
        for _ in range(count):
            self.mappings.append(
                Mapping.parse(br, num_channels, len(self.floors), len(self.residues))
            )
        check(not br.reached_end, "setup truncated in mappings")

        count = br.read_bits(6) + 1
        for _ in range(count):
            self.modes.append(
                Mode.parse(br, len(self.mappings), header.blocksize_0, header.blocksize_1)
            )
        check(not br.reached_end, "setup truncated in modes")

        check(br.read_bits(1) == 1, "setup framing bit")
        check(not br.reached_end, "setup framing past end")
        # The packet must be exactly consumed now (remaining bits of the
        # current byte + possibly one zero pad byte).
        check(br.read_bits(8) == 0, "setup trailing garbage")
        check(br.reached_end, "setup packet has trailing data")
        return self
