"""Overlap-add decode state — the only mutable state of a Vorbis stream.

Behavioral contract (reference: /root/reference/src/ParseOggVorbis.hpp:
975-1115, spec 1.3.2): windowed frames are placed on an absolute sample
timeline; frame t+1 starts ``3*n_t/4 - n_{t+1}/4`` samples after frame t;
after adding frame t (t >= 1) the decoder returns the samples between the
center of frame t-1 and the center of frame t (``n_{t-1}/4 + n_t/4``
samples); the first frame returns nothing; the Ogg granule position of a
page truncates (and validates) the sample count at the last packet of the
page.

Unlike the reference's ring buffer + memmove scheme, this implementation
keeps an explicit absolute window — behaviorally identical, and the same
model the batched device pipeline uses (frames become a scan over the
overlap carry).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DecodeState:
    __slots__ = (
        "num_channels",
        "buf",
        "buf_start",
        "frame_pos",
        "prev_win_size",
        "cur_win_size",
        "emit_pos",
        "abs_total_pos",
        "expected_ending_total_pos",
    )

    def __init__(self, num_channels: int) -> None:
        self.num_channels = num_channels
        self.buf: Optional[np.ndarray] = None  # [C, cur_win_size] float32
        self.buf_start = 0  # absolute position of buf[:, 0]
        self.frame_pos = 0  # absolute placement of the current frame
        self.prev_win_size = 0
        self.cur_win_size = 0
        self.emit_pos = 0  # absolute position of the next sample to emit
        self.abs_total_pos = 0
        self.expected_ending_total_pos = -1

    def set_expected_ending_pos(self, pos: int) -> None:
        self.expected_ending_total_pos = pos

    def begin_frame(self, win_size: int) -> None:
        """Advance placement for a new frame of *win_size* samples."""
        if self.cur_win_size > 0:
            new_pos = self.frame_pos + (self.cur_win_size // 4) * 3 - win_size // 4
        else:
            new_pos = 0
        self.prev_win_size = self.cur_win_size
        self.cur_win_size = win_size
        self.frame_pos = new_pos

        new_start = min(self.emit_pos, new_pos)
        new_end = new_pos + win_size
        new_buf = np.zeros((self.num_channels, new_end - new_start), dtype=np.float32)
        if self.buf is not None:
            old_start = self.buf_start
            old_end = old_start + self.buf.shape[1]
            lo = max(old_start, new_start)
            hi = min(old_end, new_end)
            if hi > lo:
                new_buf[:, lo - new_start : hi - new_start] = self.buf[
                    :, lo - old_start : hi - old_start
                ]
        self.buf = new_buf
        self.buf_start = new_start

    def add_pcm_frame(self, channel: int, pcm: np.ndarray, window: np.ndarray) -> None:
        """Windowed accumulate of one channel's iMDCT output."""
        off = self.frame_pos - self.buf_start
        self.buf[channel, off : off + len(pcm)] += pcm * window

    def ready_pcm(self) -> Optional[np.ndarray]:
        """Emit finished samples: [C, num] float32, or None if nothing yet.

        Applies granule-position truncation/validation exactly as the
        reference (ParseOggVorbis.hpp:1019-1059): mid-stream short frames are
        an error; the final page's granule shortens the last emission.
        """
        num = 0
        if self.prev_win_size > 0:
            end = self.frame_pos + self.cur_win_size // 2
            num = end - self.emit_pos
            assert num == self.prev_win_size // 4 + self.cur_win_size // 4
        expected = self.expected_ending_total_pos
        if expected >= 0:
            if self.abs_total_pos > expected:
                raise ValueError("stream position past granule position")
            if self.abs_total_pos + num >= expected:
                num = expected - self.abs_total_pos
            else:
                raise ValueError(
                    "granule position implies mid-stream short frame (bad stream)"
                )
        out = None
        if num > 0:
            start = self.emit_pos - self.buf_start
            out = self.buf[:, start : start + num].copy()
            self.abs_total_pos += num
        # The geometric emission cursor always advances to the current frame
        # center (same geometry as the reference's window-offset arithmetic).
        self.emit_pos = self.frame_pos + self.cur_win_size // 2
        if expected >= 0 and self.abs_total_pos != expected:
            raise ValueError("granule position mismatch at end of page")
        return out
