"""Differential-dump comparison for tests — re-exports the package harness
(parseoggvorbis_tpu/tools/compare.py), which implements the reference's
compare-debug-out.py semantics."""

from parseoggvorbis_tpu.tools.compare import (  # noqa: F401
    DumpStream,
    FLOAT_TAPS,
    compare_dumps,
)
