"""Vorbis mapping (spec 4.2.4): channel topology per mode.

Reference behavior: /root/reference/src/ParseOggVorbis.hpp:765-814.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..utils.bitreader import BitReader
from ..utils.errors import check
from ..utils.specmath import ilog


@dataclass
class Submap:
    floor: int
    residue: int


@dataclass
class Mapping:
    mapping_type: int = 0
    couplings: List[Tuple[int, int]] = field(default_factory=list)  # (magnitude, angle)
    muxs: List[int] = field(default_factory=list)  # channel -> submap idx
    submaps: List[Submap] = field(default_factory=list)

    @classmethod
    def parse(cls, br: BitReader, num_channels: int, num_floors: int, num_residues: int) -> "Mapping":
        self = cls()
        check(num_channels > 0, "mapping needs channels")
        bits = ilog(num_channels - 1)
        self.mapping_type = br.read_bits(16)
        check(self.mapping_type == 0, "mapping type")
        num_submaps = 1
        if br.read_bits(1):
            num_submaps = br.read_bits(4) + 1
        if br.read_bits(1):
            coupling_steps = br.read_bits(8) + 1
            for _ in range(coupling_steps):
                magnitude = br.read_bits(bits)
                angle = br.read_bits(bits)
                check(magnitude != angle, "coupling pair")
                check(magnitude < num_channels and angle < num_channels, "coupling channel")
                self.couplings.append((magnitude, angle))
        check(br.read_bits(2) == 0, "mapping reserved bits")

        if num_submaps > 1:
            for _ in range(num_channels):
                mux = br.read_bits(4)
                check(mux < num_submaps, "mapping mux")
                self.muxs.append(mux)
        else:
            self.muxs = [0] * num_channels

        for _ in range(num_submaps):
            br.read_bits(8)  # time configuration placeholder, discarded
            floor = br.read_bits(8)
            check(floor < num_floors, "submap floor")
            residue = br.read_bits(8)
            check(residue < num_residues, "submap residue")
            self.submaps.append(Submap(floor=floor, residue=residue))
        return self
