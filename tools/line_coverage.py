"""Stdlib line-coverage for the opc2mongodb_spark package (no coverage.py here).

Runs a pytest subset under ``sys.settrace`` (threads included via
``threading.settrace``) recording executed lines of files under
``opc2mongodb_spark/``, then diffs against each file's *executable* line set
(derived from the compiled code objects' ``co_lines`` tables — the same lines
a tracer can ever hit) and prints per-file uncovered ranges.

Usage:
    python tools/line_coverage.py [--out report.json] [pytest args...]
    # e.g. python tools/line_coverage.py -q tests/test_opclive.py tests/test_engine.py

Caveats (triage the report with these in mind):
  * Code shipped to Spark Python workers (pandas UDFs, applyInPandas[WithState]
    bodies, mapInPandas generators, foreachBatch callables executed
    worker-side) runs in SEPARATE PROCESSES and is invisible to this tracer —
    such lines show as uncovered even when goldens exercise them. Driver-side
    code is measured faithfully. Annotate those blocks with
    ``# pragma: worker`` so the report separates "tracer-blind by
    architecture" from "genuinely untested".
  * Lines executed before the tracer starts are missed; the tool therefore
    must NOT import opc2mongodb_spark itself, and pytest is launched inside
    the trace so collection-time imports count.

Exclusion pragmas (r10 — the coverage.py convention, scoped like it):
  * ``# pragma: no cover``  — environment-blocked or unreachable-here lines
    (py4j fallbacks, import-success branches for absent packages).
  * ``# pragma: worker``    — code objects shipped to Spark Python workers.
A pragma on a BLOCK HEADER (def / class / if / try / with / except...)
excludes the whole statement through its last line; on any other line it
excludes that line alone. Excluded lines are dropped from the executable
denominator and counted per file (``excluded`` / ``excluded_worker``) so
the report still shows how much code is annotated away.
"""

from __future__ import annotations

import ast
import io
import json
import os
import sys
import threading
import tokenize

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
PKG = os.path.join(REPO, "opc2mongodb_spark")

_covered: dict[str, set[int]] = {}


def _global_trace(frame, event, arg):
    if event != "call":
        return None
    fn = frame.f_code.co_filename
    if not fn.startswith(PKG):
        return None
    lines = _covered.setdefault(fn, set())
    lines.add(frame.f_lineno)

    def _local(frame, event, arg):
        if event == "line":
            lines.add(frame.f_lineno)
        return _local

    return _local


def executable_lines(path: str) -> set[int]:
    """All line numbers present in the file's code objects' line tables."""
    with open(path, "rb") as f:
        src = f.read()
    top = compile(src, path, "exec")  # SyntaxError propagates to the caller
    out: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None:
                out.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # Docstring-only / structural line 0s never fire; drop non-positive.
    return {ln for ln in out if ln > 0}


_PRAGMAS = {"pragma: no cover": "no_cover", "pragma: worker": "worker"}


def pragma_excluded_lines(path: str) -> dict[int, str]:
    """Map excluded line -> pragma kind ('no_cover' | 'worker').

    A pragma comment on a statement's HEADER line (the line holding its
    first token — def/class/if/try/with/except/...) excludes the whole
    statement span (header through ``end_lineno``, nested bodies included);
    on any other line it excludes just that line. Implemented as: tokenize
    for comments (string literals containing the text don't trip it), then
    one AST walk matching comment lines to statement headers."""
    with open(path, "rb") as f:
        src = f.read()
    marked: dict[int, str] = {}
    for tok in tokenize.tokenize(io.BytesIO(src).readline):
        if tok.type == tokenize.COMMENT:
            for text, kind in _PRAGMAS.items():
                if text in tok.string:
                    marked[tok.start[0]] = kind
    if not marked:
        return {}
    out: dict[int, str] = dict(marked)
    tree = ast.parse(src, path)
    for node in ast.walk(tree):
        # excepthandler is a block header too ("except X:  # pragma: ...")
        # but is not an ast.stmt subclass — include it explicitly, like
        # coverage.py does.
        if not isinstance(node, (ast.stmt, ast.excepthandler)):
            continue
        kind = marked.get(node.lineno)
        if kind is None:
            continue
        for ln in range(node.lineno, (node.end_lineno or node.lineno) + 1):
            out[ln] = kind
    return out


def _ranges(lines: list[int]) -> list[str]:
    """Compress a sorted line list into EXACT contiguous ranges. No gap
    tolerance: every line inside a printed range really is in the input —
    a folded-over gap would print covered lines as missing and send triage
    at code that is already exercised."""
    out: list[str] = []
    i = 0
    while i < len(lines):
        j = i
        while j + 1 < len(lines) and lines[j + 1] == lines[j] + 1:
            j += 1
        out.append(str(lines[i]) if i == j else f"{lines[i]}-{lines[j]}")
        i = j + 1
    return out


def _parse_args(argv: list[str]) -> tuple[str | None, list[str]]:
    """Split our own --out option from the pytest passthrough args.

    Hand-rolled (not argparse) so mixed pytest flags like ``-p no:x`` pass
    through in their original order. ``--out`` without a value (or with an
    empty one) is a usage error, not a silent no-write."""
    out = None
    pytest_args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out" or argv[i].startswith("--out="):
            if argv[i] == "--out":
                if i + 1 >= len(argv):
                    raise SystemExit("line_coverage.py: --out requires a path")
                out = argv[i + 1]
                i += 2
            else:
                out = argv[i].split("=", 1)[1]
                i += 1
            if not out:
                raise SystemExit("line_coverage.py: --out requires a path")
        else:
            pytest_args.append(argv[i])
            i += 1
    return out, pytest_args


def main(argv: list[str]) -> int:
    out, pytest_args = _parse_args(argv)

    import pytest

    threading.settrace(_global_trace)
    sys.settrace(_global_trace)
    try:
        rc = pytest.main(pytest_args or ["-q", "tests/"])
    finally:
        sys.settrace(None)
        threading.settrace(None)

    report = {}
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)
            try:
                want = executable_lines(path)
            except SyntaxError:
                # A file that cannot compile must never read as covered —
                # flag it at 0% so it sorts to the top of the report.
                report[rel] = {
                    "executable": 0,
                    "covered": 0,
                    "pct": 0.0,
                    "missing": [],
                    "error": "SyntaxError: file does not compile",
                }
                continue
            excl = pragma_excluded_lines(path)
            want -= set(excl)
            got = _covered.get(path, set()) & want
            missing = sorted(want - got)
            report[rel] = {
                "executable": len(want),
                "covered": len(got),
                "pct": round(100.0 * len(got) / len(want), 1) if want else 100.0,
                "missing": _ranges(missing),
                "excluded": sum(1 for k in excl.values() if k == "no_cover"),
                "excluded_worker": sum(
                    1 for k in excl.values() if k == "worker"
                ),
            }

    print("\n=== line coverage (opc2mongodb_spark, driver-side only) ===")
    for rel, r in sorted(report.items(), key=lambda kv: kv[1]["pct"]):
        print(f"{r['pct']:6.1f}%  {r['covered']:5d}/{r['executable']:<5d} {rel}"
              + (f"  [{r['error']}]" if r.get("error") else ""))
        if r["missing"] and r["pct"] < 100.0:
            print(f"         missing: {', '.join(r['missing'][:25])}"
                  + (" ..." if len(r["missing"]) > 25 else ""))
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
