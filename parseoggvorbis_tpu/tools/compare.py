"""Differential dump comparison — the framework's verification harness.

Same semantics as the reference's tests/compare-debug-out.py: per audio
packet, floor setup and ``floor1 ys`` must match exactly; ``after_residue`` /
``after_envelope`` / ``pcm_after_mdct`` within an absolute epsilon; ``pcm``
compared as a rolling cross-packet concatenation per channel (flush
boundaries legitimately differ between decoders).

Usable as a library (``compare_dumps``) and as a CLI:

    python -m parseoggvorbis_tpu.tools.compare --ourout A --libvorbisout B
    python -m parseoggvorbis_tpu.tools.compare --ogg f.ogg --libvorbisout B
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..callbacks.reader import DumpReader

FLOAT_TAPS = ("after_residue", "after_envelope", "pcm_after_mdct")


class DumpStream:
    def __init__(self, path):
        self.reader = DumpReader(path)
        self.floors = []  # (multiplier, xs)
        self.pcm = {}  # channel -> list of arrays
        self.num_samples = {}

    def read_setup(self):
        while True:
            name, channel, data = self.reader.read_entry()
            if name == "finish_setup":
                return
            if name == "floor1_unpack multiplier":
                mult = int(data[0])
                name2, _, xs = self.reader.read_entry()
                assert name2 == "floor1_unpack xs"
                self.floors.append((mult, np.asarray(xs)))

    def _add_pcm(self, channel, data):
        self.pcm.setdefault(channel, []).append(np.asarray(data))
        self.num_samples[channel] = self.num_samples.get(channel, 0) + len(data)

    def read_audio_packet(self):
        """Collect one packet's taps; returns dict or None at EOF."""
        pending = None
        while True:
            try:
                name, channel, data = self.reader.read_entry()
            except EOFError:
                return None
            if name == "pcm":
                self._add_pcm(channel, data)
                continue
            pending = (name, channel, data)
            break
        name, channel, data = pending
        assert name == "start_audio_packet", name
        packet = {
            "floor": [],  # [channel, floor_number, ys or None]
            "after_residue": [],
            "after_envelope": [],
            "pcm_after_mdct": [],
        }
        last_floor = None
        while True:
            name, channel, data = self.reader.read_entry()
            if name == "finish_audio_packet":
                break
            if name == "pcm":
                self._add_pcm(channel, data)
            elif name == "floor_number":
                if last_floor is not None:
                    packet["floor"].append(last_floor)
                last_floor = [channel, int(data[0]), None]
            elif name == "floor1 ys":
                assert last_floor is not None
                last_floor[2] = np.asarray(data)
            elif name in packet:
                packet[name].append((channel, np.asarray(data)))
        if last_floor is not None:
            packet["floor"].append(last_floor)
        return packet


def compare_dumps(path1, path2, eps=1e-5, max_packets=None, verbose=False):
    """Assert two dumps describe the same decode; returns packet count."""
    s1, s2 = DumpStream(path1), DumpStream(path2)
    assert s1.reader.decoder_sample_rate == s2.reader.decoder_sample_rate
    assert s1.reader.decoder_num_channels == s2.reader.decoder_num_channels
    s1.read_setup()
    s2.read_setup()
    assert len(s1.floors) == len(s2.floors)
    for (m1, xs1), (m2, xs2) in zip(s1.floors, s2.floors):
        assert m1 == m2
        assert np.array_equal(xs1, xs2)

    num_packets = 0
    while True:
        p1 = s1.read_audio_packet()
        p2 = s2.read_audio_packet()
        assert (p1 is None) == (p2 is None), "packet count mismatch"
        if p1 is None:
            _compare_rolling_pcm(s1, s2, eps)
            break
        _compare_packet(p1, p2, eps, num_packets)
        _compare_rolling_pcm(s1, s2, eps)
        num_packets += 1
        if verbose and num_packets % 50 == 0:
            print("... %d packets ok" % num_packets)
        if max_packets is not None and num_packets >= max_packets:
            return num_packets
    assert not any(s1.pcm.values()) and not any(s2.pcm.values()), "undrained pcm"
    return num_packets


def _compare_packet(p1, p2, eps, packet_idx):
    assert len(p1["floor"]) == len(p2["floor"]), packet_idx
    for (c1, n1, ys1), (c2, n2, ys2) in zip(p1["floor"], p2["floor"]):
        assert c1 == c2 and n1 == n2, packet_idx
        assert (ys1 is None) == (ys2 is None), packet_idx
        if ys1 is not None:
            assert np.array_equal(ys1, ys2), \
                "floor1 ys differ in packet %d" % packet_idx
    for tap in FLOAT_TAPS:
        assert len(p1[tap]) == len(p2[tap]), (tap, packet_idx)
        for (c1, d1), (c2, d2) in zip(p1[tap], p2[tap]):
            assert c1 == c2
            assert d1.shape == d2.shape
            if len(d1):
                diff = np.max(np.abs(d1 - d2))
                assert diff < eps, "%s ch%d packet %d: max diff %g" % (
                    tap, c1, packet_idx, diff)


def _compare_rolling_pcm(s1, s2, eps):
    for channel in sorted(s1.pcm.keys() | s2.pcm.keys()):
        pcm1 = np.concatenate(s1.pcm.get(channel, [np.zeros(0, np.float32)]))
        pcm2 = np.concatenate(s2.pcm.get(channel, [np.zeros(0, np.float32)]))
        n = min(len(pcm1), len(pcm2))
        if n:
            diff = np.max(np.abs(pcm1[:n] - pcm2[:n]))
            assert diff < eps, "pcm ch%d: max diff %g" % (channel, diff)
        s1.pcm[channel] = [pcm1[n:]] if len(pcm1) > n else []
        s2.pcm[channel] = [pcm2[n:]] if len(pcm2) > n else []


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ogg", help="decode this ogg with OUR decoder first")
    ap.add_argument("--zip", dest="zipfile",
                    help="sweep all .ogg members of a zip (needs --oracleexec)")
    ap.add_argument("--oracleexec",
                    help="oracle decoder binary (--in/--debug_out contract) "
                         "used to produce the oracle dump per file")
    ap.add_argument("--ourout", help="existing dump from our decoder")
    ap.add_argument("--libvorbisout",
                    help="oracle dump (patched libvorbis or reference)")
    ap.add_argument("--eps", type=float, default=1e-5)
    args = ap.parse_args(argv)

    if args.zipfile:
        import subprocess
        import tempfile
        import zipfile as zf

        assert args.oracleexec, "--zip requires --oracleexec"
        count = 0
        with zf.ZipFile(args.zipfile) as z:
            for name in z.namelist():
                if not name.endswith(".ogg"):
                    continue
                count += 1
                print(name)
                with tempfile.TemporaryDirectory() as td:
                    ogg = td + "/f.ogg"
                    open(ogg, "wb").write(z.read(name))
                    oracle = td + "/oracle.dump"
                    subprocess.check_call(
                        [args.oracleexec, "--in", ogg, "--debug_out", oracle])
                    rc = main(["--ogg", ogg, "--libvorbisout", oracle,
                               "--eps", str(args.eps)])
                    if rc:
                        return rc
        print("Compared %d OGG files." % count)
        return 0

    ourout = args.ourout
    if args.ogg:
        assert not ourout, "--ogg xor --ourout"
        import tempfile

        from ..callbacks import registry
        from ..runtime.decoder import OggReader, ParseCallbacks

        tmp = tempfile.NamedTemporaryFile(suffix=".dump", delete=False)
        tmp.close()
        registry.set_data_output_file(tmp.name)
        OggReader(ParseCallbacks()).full_read(args.ogg)
        ourout = tmp.name
    assert ourout, "need --ogg or --ourout"

    n = compare_dumps(ourout, args.libvorbisout, eps=args.eps)
    print("Finished.")
    print("Num audio packets:", n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
