"""Spec 9.2 helper math: closed forms must match the spec's stepping loops."""

import numpy as np

from parseoggvorbis_tpu.utils import specmath


def loop_render_line(x0, y0, x1, y1, length):
    """Direct transcription of the spec 9.2.7 Bresenham loop (test oracle)."""
    vec = [0] * length
    if x0 >= length:
        return vec
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = ady // adx
    sy = base + 1
    ady -= base * adx
    err = 0
    y = y0
    sign = 1 if dy >= 0 else -1
    vec[x0] = y0
    for x in range(x0 + 1, x1):
        if x >= length:
            break
        err += ady
        if err >= adx:
            err -= adx
            y += sign * sy
        else:
            y += sign * base
        vec[x] = y
    return vec


def test_ilog():
    assert specmath.ilog(0) == 0
    assert specmath.ilog(1) == 1
    assert specmath.ilog(2) == 2
    assert specmath.ilog(3) == 2
    assert specmath.ilog(4) == 3
    assert specmath.ilog(7) == 3
    assert specmath.ilog(255) == 8


def test_render_point():
    assert specmath.render_point(0, 0, 10, 10, 5) == 5
    assert specmath.render_point(0, 10, 10, 0, 3) == 7
    # truncation toward the y0 side
    assert specmath.render_point(0, 0, 3, 10, 1) == 3
    assert specmath.render_point(0, 10, 3, 0, 1) == 7


def test_render_line_matches_loop():
    rng = np.random.RandomState(42)
    for _ in range(200):
        x0 = int(rng.randint(0, 50))
        x1 = int(x0 + rng.randint(1, 200))
        y0 = int(rng.randint(0, 255))
        y1 = int(rng.randint(0, 255))
        length = int(rng.randint(1, 256))
        expected = loop_render_line(x0, y0, x1, y1, length)
        got = np.zeros(length, dtype=np.int64)
        specmath.render_line_into(x0, y0, x1, y1, got)
        assert got.tolist() == expected, (x0, y0, x1, y1, length)


def test_neighbors():
    xs = [0, 128, 7, 2, 31]
    # low_neighbor: greatest value < xs[idx] among positions < idx
    assert specmath.low_neighbor(xs, 2) == 0
    assert specmath.low_neighbor(xs, 4) == 2
    assert specmath.high_neighbor(xs, 2) == 1
    assert specmath.high_neighbor(xs, 4) == 1


def test_float32_unpack():
    # 1.0 in Vorbis packed float: mantissa 1, exponent biased so ldexp(1, 0)
    v = (788 << 21) | 1  # exp field = 20 + 768
    assert specmath.float32_unpack(v) == 1.0
    assert specmath.float32_unpack(v | 0x80000000) == -1.0


def test_lookup1_values():
    assert specmath.lookup1_values(8, 3) == 2
    assert specmath.lookup1_values(27, 3) == 3
    assert specmath.lookup1_values(26, 3) == 2
    assert specmath.lookup1_values(1, 1) == 1


def test_render_line_vec_matches_into():
    out = specmath.render_line_vec(2, 5, 9, 40, 12)
    ref = np.zeros(12, dtype=np.int64)
    specmath.render_line_into(2, 5, 9, 40, ref)
    np.testing.assert_array_equal(out, ref)
    assert out[0] == out[1] == 0 and out[9] == 0  # outside [x0, x1) stays zero
    # x0 beyond the vector: no-op
    np.testing.assert_array_equal(specmath.render_line_vec(20, 0, 30, 5, 10),
                                  np.zeros(10, dtype=np.int64))


def test_float32_unpack_exponent_clamp():
    """The reference clamps the unpacked exponent to [-63, 63]
    (Utils.hpp:193-203); absurd setup floats stay finite."""
    huge = (1023 << 21) | 1  # raw exponent 1023 -> +235 unclamped
    tiny = 1                 # raw exponent 0 -> -788 unclamped
    assert specmath.float32_unpack(huge) == np.ldexp(1.0, 63)
    assert specmath.float32_unpack(tiny) == np.ldexp(1.0, -63)
    assert specmath.float32_unpack(0x80000000 | huge) == -np.ldexp(1.0, 63)
    assert np.isfinite(specmath.float32_unpack(0xFFFFFFFF))
