"""Unit coverage for the round-over-round tooling (pure functions only —
the subprocess/REST paths are exercised by their real runs, recorded in
README/SCALING)."""

from __future__ import annotations

import json
import os
import sys

# APPEND (not insert-at-0): tools/ modules must never shadow package or
# stdlib names for the rest of the pytest session.
sys.path.append(
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
)

sys.path.append(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench_compare  # noqa: E402
import scale_gate  # noqa: E402
import stress_oracle  # noqa: E402

import bench  # noqa: E402  (repo root)


def test_scale_gate_rules_catch_the_setsim_cliff():
    """The r11 scale-gate rule must flag the r9 setsim cliff (330x time for
    107x output), pass the fixed r10 shape (132x for 107x), pass an
    output-bound explosion (34x time for 2,389x output), and apply the
    round-over-round noise model only when BOTH the ratio and absolute
    deltas are exceeded."""
    def rec(tr, orr, t_big=10.0):
        return {"time_ratio": tr, "output_ratio": orr,
                "t_big": t_big, "t_small": t_big / tr}

    # the r9 cliff: flagged by the slope rule
    assert scale_gate.evaluate(rec(330.0, 107.0), None)
    # the r10 fix: passes (132 <= 2*107)
    assert not scale_gate.evaluate(rec(132.0, 107.0), None)
    # output-bound growth passes; linear small queries pass via the cap
    assert not scale_gate.evaluate(rec(34.2, 2389.5), None)
    assert not scale_gate.evaluate(rec(12.0, 1.0), None)
    # above-cap super-linearity with flat output: flagged
    assert scale_gate.evaluate(rec(25.0, 1.0), None)

    # prev-round regression: needs >1.5x AND >2s
    assert scale_gate.evaluate(rec(2.0, 1.0, t_big=10.0), {"t_big": 5.0})
    assert not scale_gate.evaluate(rec(2.0, 1.0, t_big=10.0), {"t_big": 8.0})
    assert not scale_gate.evaluate(
        rec(2.0, 1.0, t_big=2.4), {"t_big": 1.0}
    )  # 2.4x but only 1.4s absolute — jitter, not a cliff

    # time_ratio None (t_small clocked 0): a clean explanatory flag, not a
    # TypeError from the slope comparison (r11 ADVICE)
    flags = scale_gate.evaluate(
        {"time_ratio": None, "output_ratio": 1.0, "t_big": 5.0,
         "t_small": 0.0},
        {"t_big": 1.0},
    )
    assert flags == ["no t_small baseline (sf0.1 time measured as 0)"]


def test_scale_rotation_cohorts_partition_the_rotatable_registry():
    """The 6 name-hash cohorts must be disjoint, jointly cover every
    non-excluded registry name, and never include the every-round gate
    set — the stress-rotation coverage contract applied to scale."""
    from opc2mongodb_spark.queries import REGISTRY

    names = sorted(REGISTRY)
    exclude = set(bench.CORE) | set(scale_gate.EXTENDED_HEAVY)
    cohorts = [
        scale_gate.rotation_cohort(names, exclude, w)
        for w in range(scale_gate.N_COHORTS)
    ]
    seen: set[str] = set()
    for c in cohorts:
        assert not (set(c) & seen)  # disjoint
        assert not (set(c) & exclude)  # gate set stays out
        seen |= set(c)
    assert seen == set(names) - exclude  # joint cover
    # deterministic: same inputs -> same cohort
    assert cohorts[0] == scale_gate.rotation_cohort(names, exclude, 0)
    # balanced enough that one round's cohort stays runnable (~1/6 each)
    sizes = sorted(len(c) for c in cohorts)
    assert sizes[0] >= len(seen) // scale_gate.N_COHORTS - 15


def test_scale_rotation_ledger_merge_keeps_flap_history():
    """'ok' is the CURRENT round's verdict; a historic flag survives only
    in last_flap_round (the stress-ledger anti-sticky rule), and the
    measured medians land in the entry for the next rotation's
    round-over-round baseline."""
    rec_ok = {"flags": [], "t_small": 0.5, "t_big": 2.0,
              "time_ratio": 4.0, "output_ratio": 10.0}
    rec_bad = dict(rec_ok, flags=["slope: ..."])
    ledger = scale_gate.merge_ledger({}, {"q_a": rec_bad}, 12)
    assert ledger["q_a"]["ok"] is False
    assert ledger["q_a"]["last_flap_round"] == 12
    # six rounds later the same query comes back green: ok flips true,
    # the old flap round is preserved, the medians refresh
    ledger = scale_gate.merge_ledger(
        ledger, {"q_a": dict(rec_ok, t_big=1.8)}, 18
    )
    assert ledger["q_a"] == {
        "round": 18, "ok": True, "t_small": 0.5, "t_big": 1.8,
        "time_ratio": 4.0, "output_ratio": 10.0, "last_flap_round": 12,
    }
    # a never-flapped query carries no last_flap_round key at all
    ledger = scale_gate.merge_ledger(ledger, {"q_b": rec_ok}, 18)
    assert "last_flap_round" not in ledger["q_b"]


def test_scale_rotation_long_run_short_circuits_the_repeats():
    """One run past long_run_s must end the repeat loop — a cohort with an
    undiscovered cliff finishes the sweep instead of stalling 3x on it.
    The timed runs force via a noop-format write (bench.py's discipline —
    count() prunes map-only plans); the single count() is untimed and
    feeds only the output_ratio."""
    calls = {"count": 0, "save": 0}

    class Fake:
        def build(self, spark, sf_dir):
            return self

        def count(self):
            calls["count"] += 1
            return 7

        @property
        def write(self):
            return self

        def format(self, fmt):
            assert fmt == "noop"
            return self

        def mode(self, m):
            return self

        def save(self):
            calls["save"] += 1

    t, rows = scale_gate.run_query(
        {"q": Fake()}, None, "q", "/tmp/sfX", long_run_s=0.0
    )
    assert calls == {"count": 1, "save": 1} and rows == 7 and t >= 0.0
    # and without the limit the median-of-RUNS discipline is unchanged
    calls["count"] = calls["save"] = 0
    scale_gate.run_query({"q": Fake()}, None, "q", "/tmp/sfX")
    assert calls == {"count": 1, "save": scale_gate.RUNS}


def test_scale_rotation_prev_rule_requires_matching_action():
    """A noop-write median must not be compared against a count-era
    baseline: the prev rule applies only when both records carry the
    same forcing action."""
    rec = {"time_ratio": 2.0, "output_ratio": 1.0, "t_big": 10.0,
           "t_small": 5.0, "action": "noop"}
    # count-era prev (no action tag): prev rule skipped
    assert not scale_gate.evaluate(dict(rec), {"t_big": 1.0})
    # same-action prev: the regression fires as before
    assert scale_gate.evaluate(
        dict(rec), {"t_big": 1.0, "action": "noop"}
    )


def test_bench_compare_applies_absolute_noise_model():
    """regression iff delta > max(midspread_old, midspread_new, 0.35 s) —
    the SCALING.md criterion: a 0.3 s delta on a sub-second query is flat,
    a 1.0 s delta over a 0.35 s floor is a regression, a delta inside a
    recorded 2 s midspread is flat no matter its size sign."""
    old = {
        "queries": {"a": 0.10, "b": 2.00, "c": 5.00, "d": 1.00},
        "midspread": {"a": 0.05, "b": 0.10, "c": 2.00, "d": 0.10},
        "core_queries": ["a", "b"],
    }
    new = {
        "queries": {"a": 0.40, "b": 3.00, "c": 6.50, "d": 0.20},
        "midspread": {"a": 0.05, "b": 0.10, "c": 1.50, "d": 0.10},
    }
    rows = {r["query"]: r["verdict"] for r in bench_compare.compare(old, new)}
    assert rows == {
        "a": "flat",        # +0.30 <= 0.35 floor
        "b": "REGRESSION",  # +1.00 > 0.35
        "c": "flat",        # +1.50 <= 2.00 midspread
        "d": "improved",    # -0.80 beyond the floor
    }
    core = bench_compare.compare(old, new, core_only=True)
    assert sorted(r["query"] for r in core) == ["a", "b"]


def test_bench_noise_verdict_flags_contention_not_jitter():
    """r8 VERDICT #5: the compact bench line carries a health verdict.
    Noisy iff a CORE query's midspread exceeds BOTH 3x its median and the
    0.5 s absolute floor — the r8 driver-record signature (10.9 s midspread
    on a 1.9 s median) flags; sub-second jitter on a fast query does not;
    EXTENDED queries never flag CORE."""
    core = ["q_a", "q_b"]
    timings = {"q_a": 1.9, "q_b": 0.1, "q_x": 1.0}
    assert bench.noise_verdict(core, timings, {"q_a": 10.9, "q_b": 0.0})
    # 3x median exceeded but under the absolute floor -> still healthy
    assert not bench.noise_verdict(core, timings, {"q_a": 0.2, "q_b": 0.4})
    # big midspread inside 3x median -> healthy (loop-JIT profile)
    assert not bench.noise_verdict(core, timings, {"q_a": 5.0, "q_b": 0.0})
    # non-CORE contention does not flag the CORE contract
    assert not bench.noise_verdict(core, timings, {"q_x": 9.0})


def test_bench_final_line_carries_medians_and_fits_tail_capture():
    """r12 VERDICT #1: the driver parses the LAST stdout JSON line from a
    2,000-char tail capture; without a per-query map there PERF_r12's
    per_query/geomean/scaling blocks came back empty. The final line must
    (a) carry every HEADLINE query + lloyd3 as 3-decimal medians and
    (b) fit the capture whole even with pessimistic 3-digit-seconds
    timings, so it can never be decapitated like the r6/r7 detail line."""
    names = bench.HEADLINE + ["lloyd3"]
    timings = {n: 999.999 for n in names}  # pessimistic widths
    line = bench.final_summary_line(9999.999, 999.999, True, timings, 0.1)
    assert len(line) <= bench.TAIL_CAPTURE_BYTES, len(line)
    parsed = json.loads(line)
    assert parsed["queries"] == timings
    assert parsed["unit"] == "sec"
    assert "\n" not in line


def test_stress_parse_child_output_json_flaps_and_crash():
    """r8 ADVICE: flap lines are machine-readable JSON after the 'FLAP '
    prefix (the repr'd-tuple split was brittle); a chunk with no CHILD_*
    marker (crash or timeout kill) marks the WHOLE chunk bad."""
    part = ["q_a", "q_b", "q_c"]
    out = (
        'FLAP {"sf": "/root/testdata/sf0.01", "query": "q_b", "probs": "x"}\n'
        "CHILD_BAD\n"
    )
    assert stress_oracle.parse_child_output(out, part) == {"q_b"}
    assert stress_oracle.parse_child_output("CHILD_OK\n", part) == set()
    # no marker at all -> every query in the chunk is bad
    assert stress_oracle.parse_child_output("half a line", part) == set(part)


def test_stress_ledger_ok_resets_per_round():
    """r8 ADVICE: a historic flap must not be sticky-false forever — 'ok'
    is the latest round's verdict; the flap history lives in
    'last_flap_round' and survives later green rounds."""
    ledger = {"q_a": {"round": 7, "ok": False, "last_flap_round": 7}}
    stress_oracle.merge_ledger(ledger, {"q_a": True, "q_b": False}, 9)
    assert ledger["q_a"] == {"round": 9, "ok": True, "last_flap_round": 7}
    assert ledger["q_b"] == {"round": 9, "ok": False, "last_flap_round": 9}
    # legacy sticky-false entries with no last_flap_round heal on a green run
    ledger["q_c"] = {"round": 5, "ok": False}
    stress_oracle.merge_ledger(ledger, {"q_c": True}, 9)
    assert ledger["q_c"] == {"round": 9, "ok": True}


def test_stress_cohorts_partition_the_registry():
    """The 3 rotation cohorts are a deterministic disjoint cover: every
    name lands in exactly one cohort, and membership is stable across
    calls (so 'once per 3 rounds' is a real guarantee)."""
    names = [f"q_example_{i}" for i in range(97)]
    cohorts = [stress_oracle._cohort(names, w) for w in range(3)]
    assert sorted(n for c in cohorts for n in c) == sorted(names)
    assert all(
        stress_oracle._cohort(names, w) == cohorts[w] for w in range(3)
    )


def test_line_coverage_executable_lines_and_ranges(tmp_path):
    """executable_lines reads the compiled co_lines tables (module, nested
    function, comprehension) and _ranges compresses exact contiguous runs
    (a gap of even one line splits the range) — the two pure pieces of
    tools/line_coverage.py."""
    import line_coverage

    src = (
        "x = 1\n"            # 1
        "\n"
        "def f(a):\n"        # 3
        "    if a:\n"        # 4
        "        return 1\n" # 5
        "    return [i\n"    # 6
        "            for i in range(a)]\n"  # 7
        "\n"
        "class C:\n"         # 9
        "    y = 2\n"        # 10
    )
    p = tmp_path / "m.py"
    p.write_text(src)
    lines = line_coverage.executable_lines(str(p))
    assert {1, 3, 4, 5, 6, 9, 10} <= lines
    assert 2 not in lines and 8 not in lines

    assert line_coverage._ranges([]) == []
    assert line_coverage._ranges([4]) == ["4"]
    # EXACT contiguity only: a gap — even of one line — splits the range,
    # because missing-line sets already exclude non-executable lines and a
    # folded gap would print a covered line as uncovered
    assert line_coverage._ranges([1, 2, 4, 9, 10]) == ["1-2", "4", "9-10"]


def test_line_coverage_pragma_exclusions(tmp_path):
    """Pragma scoping (r10): a pragma on a block HEADER excludes the whole
    statement span (worker-shipped closures, env-blocked branches); on a
    plain line it excludes just that line; a pragma inside a STRING never
    trips (tokenize, not substring-grep); unmarked files return {}."""
    import line_coverage

    src = (
        "x = 1\n"                                        # 1: plain, kept
        "def f():  # pragma: worker\n"                   # 2: block header
        "    a = 1\n"                                    # 3: excluded
        "    return a\n"                                 # 4: excluded
        "y = 2  # pragma: no cover - env\n"              # 5: line-only
        "z = 'pragma: no cover'\n"                       # 6: string, kept
        "w = (  # pragma: no cover\n"                    # 7: assign header
        "    3\n"                                        # 8: excluded
        ")\n"                                            # 9: excluded
    )
    p = tmp_path / "m.py"
    p.write_text(src)
    got = line_coverage.pragma_excluded_lines(str(p))
    assert got == {
        2: "worker", 3: "worker", 4: "worker",
        5: "no_cover", 7: "no_cover", 8: "no_cover", 9: "no_cover",
    }
    (tmp_path / "clean.py").write_text("a = 'pragma: worker'\nb = 2\n")
    assert line_coverage.pragma_excluded_lines(str(tmp_path / "clean.py")) == {}

    # except clauses are block headers too (ast.excepthandler, not stmt)
    exc = (
        "try:\n"
        "    x = 1\n"
        "except ValueError:  # pragma: no cover - env\n"
        "    y = 2\n"
        "    z = 3\n"
    )
    (tmp_path / "exc.py").write_text(exc)
    assert line_coverage.pragma_excluded_lines(str(tmp_path / "exc.py")) == {
        3: "no_cover", 4: "no_cover", 5: "no_cover",
    }


def test_line_coverage_arg_split_preserves_pytest_flag_order():
    """--out (either spelling) is extracted; everything else reaches pytest
    verbatim and in order; a missing/empty --out value is a usage error,
    never a silent no-write."""
    import pytest as _pytest

    import line_coverage

    out, rest = line_coverage._parse_args(
        ["-q", "--out", "r.json", "-p", "no:cacheprovider", "tests/x.py"]
    )
    assert out == "r.json"
    assert rest == ["-q", "-p", "no:cacheprovider", "tests/x.py"]
    out2, rest2 = line_coverage._parse_args(["--out=r2.json"])
    assert out2 == "r2.json" and rest2 == []
    with _pytest.raises(SystemExit, match="--out requires a path"):
        line_coverage._parse_args(["-q", "--out"])
    with _pytest.raises(SystemExit, match="--out requires a path"):
        line_coverage._parse_args(["--out="])
