"""Command-line demo decoder — same CLI contract as the reference binary.

``python -m parseoggvorbis_tpu.cli --in f.ogg [--debug_out dump]
[--debug_stdout]`` prints header/comments/setup summary and the decoded
sample count, and can write the debug-dump file consumed by the differential
compare harness (reference: src/main.cpp + ArgParser, Callbacks.cpp:392-440).
"""

from __future__ import annotations

import sys

from .callbacks import registry
from .runtime.decoder import OggReader, ParseCallbacks


class _DemoCallbacks(ParseCallbacks):
    def __init__(self) -> None:
        self.sample_count = 0

    def got_header(self, header) -> bool:
        print(
            "Header: vorbis version: %d, channels: %d, sample rate: %d"
            % (header.vorbis_version, header.audio_channels, header.audio_sample_rate)
        )
        return True

    def got_comments(self, vendor, comments) -> bool:
        print("Vendor: %s" % vendor)
        for c in comments:
            print("Comment: %s" % c)
        return True

    def got_setup(self, setup) -> bool:
        print(
            "Setup: num codebooks: %d, num floors: %d, num mappings: %d, "
            "num modes: %d, num residues: %d"
            % (
                len(setup.codebooks),
                len(setup.floors),
                len(setup.mappings),
                len(setup.modes),
                len(setup.residues),
            )
        )
        return True

    def got_pcm_data(self, channel_pcms) -> bool:
        self.sample_count += channel_pcms.shape[1]
        return True

    def got_eof(self) -> bool:
        print("got eof. sample count: %d" % self.sample_count)
        return True


def print_usage(argv0: str) -> None:
    print("%s --in ogg_filename [--help] [--debug_out filename] [--debug_stdout]" % argv0)


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    ogg_filename = ""
    i = 1
    while i < len(argv):
        arg = argv[i]
        if arg == "--help":
            print_usage(argv[0])
            return 1
        elif arg == "--in":
            i += 1
            if i >= len(argv):
                print("missing arg after --in", file=sys.stderr)
                print_usage(argv[0])
                return 1
            ogg_filename = argv[i]
        elif arg == "--debug_out":
            i += 1
            if i >= len(argv):
                print("missing arg after --debug_out", file=sys.stderr)
                print_usage(argv[0])
                return 1
            registry.set_data_output_file(argv[i])
        elif arg == "--debug_stdout":
            registry.set_data_output_short_stdout()
        else:
            print('unexpected arg %d "%s"' % (i, arg), file=sys.stderr)
            print_usage(argv[0])
            return 1
        i += 1
    if not ogg_filename:
        print("need to provide --in ogg_filename", file=sys.stderr)
        print_usage(argv[0])
        return 1

    callbacks = _DemoCallbacks()
    reader = OggReader(callbacks)
    try:
        reader.full_read(ogg_filename)
    except Exception as exc:  # parity: errors print and exit 1
        print("error: %s" % exc, file=sys.stderr)
        return 1
    print("ok")
    print("Ogg total packets count: %d" % reader.packet_count)
    return 0


if __name__ == "__main__":
    sys.exit(main())
