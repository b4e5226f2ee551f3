#!/usr/bin/env python3
"""Line coverage for the package without external dependencies.

Uses ``sys.monitoring`` (PEP 669): a LINE callback that records the first
hit of each line and then returns DISABLE, so steady-state overhead is
near zero — the whole test suite runs at roughly normal speed.

Usage:
    python3 tools/line_coverage.py -m pytest tests/ -q     # run + report
    python3 tools/line_coverage.py --report cov.json       # re-report

The report lists, per module under parseoggvorbis_tpu/, executed vs
executable lines (executable = line numbers present in compiled code
objects, the same basis real coverage tools use) and the missed ranges.
"""

import dis
import json
import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "parseoggvorbis_tpu")
TOOL_ID = 4  # sys.monitoring.COVERAGE_ID


def _collect_executable(path):
    """All line numbers that appear in code objects of the module."""
    with open(path) as f:
        src = f.read()
    lines = set()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return lines

    def walk(co):
        for _, _, line in co.co_lines():
            if line:
                lines.add(line)
        for const in co.co_consts:
            if isinstance(const, type(co)):
                walk(const)

    walk(code)
    return lines


def run_with_coverage(argv, out_path):
    mon = sys.monitoring
    hits = {}  # path -> set of lines

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            hits.setdefault(fn, set()).add(line)
        return mon.DISABLE

    mon.use_tool_id(TOOL_ID, "pov-linecov")
    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    code = 0
    try:
        if argv[0] == "-m":
            sys.argv = argv[1:]
            runpy.run_module(argv[1], run_name="__main__", alter_sys=True)
        else:
            sys.argv = argv
            runpy.run_path(argv[0], run_name="__main__")
    except SystemExit as exc:
        code = exc.code if isinstance(exc.code, int) else 0
    finally:
        mon.set_events(TOOL_ID, 0)
        mon.free_tool_id(TOOL_ID)
        with open(out_path, "w") as f:
            json.dump({k: sorted(v) for k, v in hits.items()}, f)
    return code


def _ranges(missed):
    out = []
    for line in sorted(missed):
        if out and line == out[-1][1] + 1:
            out[-1][1] = line
        else:
            out.append([line, line])
    return ", ".join("%d" % a if a == b else "%d-%d" % (a, b)
                     for a, b in out)


def report(cov_path):
    hits = {k: set(v) for k, v in json.load(open(cov_path)).items()}
    rows = []
    tot_exec = tot_hit = 0
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            executable = _collect_executable(path)
            if not executable:
                continue
            hit = hits.get(path, set()) & executable
            tot_exec += len(executable)
            tot_hit += len(hit)
            rows.append((len(hit) / len(executable), path, executable - hit))
    rows.sort()
    for frac, path, missed in rows:
        rel = os.path.relpath(path, REPO)
        print("%5.1f%%  %-55s" % (100 * frac, rel), end="")
        if missed and frac < 1.0:
            r = _ranges(missed)
            print("  missing: %s" % (r if len(r) < 120 else r[:117] + "..."))
        else:
            print()
    print("TOTAL  %.1f%%  (%d/%d lines)"
          % (100 * tot_hit / max(tot_exec, 1), tot_hit, tot_exec))


def main():
    args = sys.argv[1:]
    if args and args[0] == "--report":
        report(args[1])
        return 0
    out = os.environ.get("POV_COV_OUT", "/tmp/pov_linecov.json")
    code = run_with_coverage(args, out)
    print("\ncoverage written to", out)
    report(out)
    return code


if __name__ == "__main__":
    sys.exit(main())
