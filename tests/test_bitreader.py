"""BitReader truth table (mirrors the reference's only unit test,
/root/reference/tests/test_Utils.cpp:43-58, plus end-of-stream semantics)."""

from parseoggvorbis_tpu.utils.bitreader import BitReader


def rb(data: bytes, num: int) -> int:
    return BitReader(data).read_bits(num)


def test_single_bits():
    assert rb(b"\x00\x00\x00\x01", 1) == 0
    assert rb(b"\x01\x00\x00\x00", 1) == 1
    assert rb(b"\xff\x00\x00\x00", 1) == 1
    assert rb(b"\x02\x00\x00\x00", 1) == 0


def test_multi_bits():
    assert rb(b"\x02\x00\x00\x00", 2) == 2
    assert rb(b"\x02\x00\x00\x00", 3) == 2
    assert rb(b"\x02\x00\x00\x00", 8) == 2
    assert rb(b"\x02\x00\x00\x00", 9) == 2
    assert rb(b"\xff\x00\x00\x00", 8) == 255
    assert rb(b"\xff\xff\x00\x00", 16) == 0xFFFF
    assert rb(b"\x01\x02\x00\x00", 16) == 0x0201
    assert rb(b"\x01\x02\x03\x04", 32) == 0x04030201


def test_sequential_reads():
    br = BitReader(b"\x01\x02\x00\x00")
    assert br.read_bits(8) == 1
    assert br.read_bits(8) == 2
    br = BitReader(b"\x01\x01\x00\x00")
    assert br.read_bits(7) == 1
    assert br.read_bits(8) == 2


def test_cross_byte():
    # bits: b0=1 b1..b7=0 | b8=1 ...
    br = BitReader(b"\x81\x01")
    assert br.read_bits(4) == 1
    assert br.read_bits(8) == 0x18  # 1000 from first byte (high), 1 from next


def test_end_semantics():
    br = BitReader(b"\xff")
    assert br.read_bits(8) == 0xFF
    assert not br.reached_end  # exact consumption does not set the flag
    assert br.read_bits(8) == 0
    assert br.reached_end
    # partial read past end: available bits land at in-stream positions
    br = BitReader(b"\xff")
    assert br.read_bits(4) == 0xF
    assert br.read_bits(8) == 0x0F
    assert br.reached_end


def test_peek_and_skip():
    br = BitReader(b"\x35\xa7")
    assert br.peek_bits(8) == 0x35
    assert br.peek_bits(12) == 0x735
    assert br.read_bits(4) == 5
    assert br.peek_bits(8) == 0x73
    br.skip_bits(4)
    assert br.read_bits(8) == 0xA7


def test_read_bit_past_end_and_accessors():
    """Reading past the end returns 0 and latches reached_end (the
    reference BitReader's EOF semantics, Utils.hpp:388-402)."""
    br = BitReader(b"\x01")
    assert br.bit_position == 0
    assert br.read_bit() == 1
    assert br.bit_offset() == 1
    for _ in range(7):
        br.read_bit()
    assert br.bit_offset() == 0
    assert not br.reached_end_now()
    assert br.read_bit() == 0  # past the end
    assert br.reached_end_now()
