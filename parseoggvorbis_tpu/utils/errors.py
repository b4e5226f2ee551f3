"""Error handling for the TPU-native Vorbis framework.

The reference uses error-as-value (``OkOrError`` with file:line messages,
/root/reference/src/Utils.hpp:33-44).  In Python we use exceptions, but keep
the same contract: every parse failure carries a source-location-style message
and aborts the current stream parse, propagating to the caller.
"""

from __future__ import annotations

import inspect


class ParseError(Exception):
    """A bitstream/spec violation detected during parsing or decode.

    Mirrors the reference's ``OkOrError`` error value (Utils.hpp:33-38): the
    message includes the call site so failures are diagnosable without a
    debugger.
    """


def check(cond: bool, msg: str = "") -> None:
    """Equivalent of the reference's ``CHECK`` macro (Utils.hpp:42).

    Raises :class:`ParseError` with the caller's file:line when *cond* is
    falsy.
    """
    if cond:
        return
    frame = inspect.currentframe()
    loc = ""
    if frame is not None and frame.f_back is not None:
        back = frame.f_back
        loc = "%s:%d: " % (back.f_code.co_filename, back.f_lineno)
    raise ParseError("%scheck failed%s" % (loc, (": " + msg) if msg else ""))
