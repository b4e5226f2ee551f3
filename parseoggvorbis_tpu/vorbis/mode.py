"""Vorbis modes and window shape precalculation.

A mode selects short/long block and a mapping.  Long-block modes precompute
4 window variants keyed by (prev-short/long, next-short/long); short-block
modes have a single window.  Reference behavior: /root/reference/src/
ParseOggVorbis.hpp:816-887.  Window shape is the Vorbis window
``sin(pi/2 * sin^2(pi/2 * (i+.5)/len))`` with flat/zero regions when a long
block borders a short one.

Windows are pure constants per (blocksize0, blocksize1): in the TPU pipeline
they are device-resident constant tensors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np

from ..utils.bitreader import BitReader
from ..utils.errors import check


def vorbis_window_slope(length: int) -> np.ndarray:
    """The rising slope of the Vorbis window, length samples, float32."""
    i = np.arange(length, dtype=np.float64)
    x = np.sin(np.pi / 2 * (i + 0.5) / length)
    return np.sin(np.pi / 2 * x * x).astype(np.float32)


def make_window(blocksize: int, left: int, right: int) -> np.ndarray:
    """Window of size *blocksize* with given left/right slope lengths.

    Layout (reference ParseOggVorbis.hpp:842-859): zeros, rising slope of
    ``left`` samples starting at ``blocksize/4 - left/2``, flat ones, falling
    slope of ``right`` samples starting at ``blocksize - blocksize/4 -
    right/2``, zeros.
    """
    win = np.zeros(blocksize, dtype=np.float32)
    left_begin = blocksize // 4 - left // 2
    right_begin = blocksize - blocksize // 4 - right // 2
    win[left_begin : left_begin + left] = vorbis_window_slope(left)
    win[left_begin + left : right_begin] = 1.0
    win[right_begin : right_begin + right] = vorbis_window_slope(right)[::-1]
    return win


@dataclass
class Mode:
    block_flag: bool = False  # True = long window
    window_type: int = 0
    transform_type: int = 0
    mapping: int = 0
    blocksize: int = 0
    # windows[(prev_flag, next_flag)] for long modes; single entry for short.
    windows: Dict[tuple, np.ndarray] = field(default_factory=dict)

    @classmethod
    def parse(cls, br: BitReader, num_mappings: int, blocksize0: int, blocksize1: int) -> "Mode":
        self = cls()
        self.block_flag = bool(br.read_bits(1))
        self.window_type = br.read_bits(16)
        check(self.window_type == 0, "window type")
        self.transform_type = br.read_bits(16)
        check(self.transform_type == 0, "transform type")
        self.mapping = br.read_bits(8)
        check(self.mapping < num_mappings, "mode mapping index")
        self._precalc(blocksize0, blocksize1)
        return self

    def _precalc(self, blocksize0: int, blocksize1: int) -> None:
        self.blocksize = blocksize1 if self.block_flag else blocksize0
        if self.block_flag:
            for prev in (False, True):
                for nxt in (False, True):
                    left = (blocksize1 if prev else blocksize0) // 2
                    right = (blocksize1 if nxt else blocksize0) // 2
                    self.windows[(prev, nxt)] = make_window(self.blocksize, left, right)
        else:
            self.windows[(False, False)] = make_window(
                self.blocksize, blocksize0 // 2, blocksize0 // 2
            )

    def get_window(self, prev_flag: bool, next_flag: bool) -> np.ndarray:
        if not self.block_flag:
            return self.windows[(False, False)]
        return self.windows[(prev_flag, next_flag)]
