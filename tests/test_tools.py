"""Meta-tests of the parity gate itself: a gate that cannot fail is
not a gate. These prove `tools/check_parity.compare` flags every drift
class the driver's compare would flag — row count, column set, dtype,
and single-value differences (floats at one ULP included) — and stays
silent on genuinely equal frames regardless of row/column order."""

from __future__ import annotations

import math
import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_parity import canon, compare  # noqa: E402


def _frame(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_equal_frames_pass_under_any_order():
    a = _frame([(1, "x", 1.5), (2, "y", 2.5)], ["k", "s", "v"])
    b = _frame([(2, "y", 2.5), (1, "x", 1.5)], ["k", "s", "v"])[["v", "k", "s"]]
    assert compare("t", a, b) == []


def test_row_count_and_value_drift_flagged():
    a = _frame([(1, 1.5), (2, 2.5)], ["k", "v"])
    assert any(
        "row count" in p for p in compare("t", a, _frame([(1, 1.5)], ["k", "v"]))
    )
    drift = _frame([(1, 1.5), (2, 2.5 + 2**-50)], ["k", "v"])
    probs = compare("t", a, drift)
    assert any("mismatching rows" in p for p in probs)


def test_one_ulp_float_difference_is_caught():
    x = 0.1 + 0.2                      # 0.30000000000000004
    y = 0.3                            # one ULP away
    assert x != y
    probs = compare("t", _frame([(x,)], ["v"]), _frame([(y,)], ["v"]))
    assert any("mismatching rows" in p for p in probs)


def test_column_set_and_null_semantics():
    a = _frame([(1, None)], ["k", "v"])
    assert any(
        "columns" in p for p in compare("t", a, _frame([(1,)], ["k"]))
    )
    # NULL == NULL under the sentinel fill; NULL vs value flagged
    # (as a value mismatch or, for an all-NULL object column vs a
    # float column, as a post-canon dtype diff — either way nonempty)
    assert compare("t", a, _frame([(1, None)], ["k", "v"])) == []
    assert compare("t", a, _frame([(1, 0.0)], ["k", "v"])) != []
    c = _frame([(1, 1.5), (2, None)], ["k", "v"])
    probs = compare("t", c, _frame([(1, 1.5), (2, 0.0)], ["k", "v"]))
    assert any("mismatching rows" in p for p in probs)


def test_canon_normalizes_int_widths_and_bools():
    a = _frame([(1, True)], ["k", "b"])
    a["k"] = a["k"].astype("int32")
    b = _frame([(1, 1)], ["k", "b"])
    b["k"] = b["k"].astype("int64")
    b["b"] = b["b"].astype("int64")
    ca, cb = canon(a), canon(b)
    assert ca.equals(cb)
    assert not math.isnan(float(ca["k"].iloc[0]))


def test_deep_dir_hash_is_regeneration_stable(spark, tmp_path):
    """Two independent generations of the same scaled dir must produce
    the SAME content_hash (the round-8 fingerprint bug: hashing part
    FILENAMES, which embed per-write UUIDs, gave bit-identical dirs
    different hashes and broke deep-tier comparability)."""
    import json

    from tools.make_sf import make_scaled_sf

    hashes = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        make_scaled_sf("/root/testdata/sf0.001", out, copies=2, spark=spark)
        with open(f"{out}/MANIFEST.json") as fh:
            m = json.load(fh)
        assert m["hash_version"] == 2
        hashes.append(m["content_hash"])
    assert hashes[0] == hashes[1]


def test_bench_environment_probe_shape(monkeypatch):
    """The contamination probe must flag foreign java/pytest processes
    and high load, never flag an idle machine, and never raise."""
    import bench

    probe = bench.environment_probe()
    assert set(probe) >= {"loadavg_1m", "other_procs", "contaminated"}

    # Force the load signal.
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (999.0, 0.0, 0.0))
    assert bench.environment_probe()["contaminated"] is True


def test_bench_probe_ignores_harness_but_flags_runners(monkeypatch):
    """The probe classifies strictly by command position (executable
    basename; script/module slot for python) — never free argv text.
    Both failure modes of the old substring rules are pinned: an
    idle-waiting process whose PROMPT text mentions runner names must
    not flag (round-9 false positive), and a genuinely busy runner must
    flag even when its argument text carries a would-be exemption
    substring (round-10 hardening: the old `'claude -p' in args` escape
    hatch is gone)."""
    import subprocess

    import bench

    def fake_ps(lines):
        class R:
            stdout = "\n".join(lines)

        return lambda *a, **k: R()

    for idle in (
        # prompt text mentions pytest / bench.py / check_parity.py —
        # the executable (sh / some CLI / editor) is not a runner
        "9999 1 /bin/sh -c bash -c 'some-cli -p "
        "--output-format stream-json ... keep pytest green ...'",
        "9999 1 some-agent -p 'run bench.py and check_parity.py please'",
        "9999 1 vim bench.py",
        "9999 1 ps -eo pid=,ppid=,args=",
        "9999 1 python -c print(1)",
    ):
        monkeypatch.setattr(subprocess, "run", fake_ps([idle]))
        assert bench.environment_probe()["contaminated"] is False, idle

    for busy in (
        "9999 1 /usr/lib/jvm/bin/java -cp x org.apache.spark.deploy.SparkSubmit",
        "9999 1 python -m pytest tests/ -x -q",
        "9999 1 /opt/conda/bin/pytest tests",
        "9999 1 python tools/check_parity.py --only foo",
        "9999 1 python bench.py",
        # busy runner whose ARGUMENT text contains the old exemption
        # substring — must still flag
        "9999 1 python -m pytest tests/ -k 'claude -p harness'",
        "9999 1 pytest tests/test_x.py -k 'ps -eo'",
        # value-taking interpreter flags must not eat the script slot
        "9999 1 python -W ignore bench.py",
        "9999 1 python -X faulthandler -m pytest tests",
    ):
        monkeypatch.setattr(subprocess, "run", fake_ps([busy]))
        probe = bench.environment_probe()
        assert probe["contaminated"] is True, busy


def test_bench_probe_exempts_own_ancestry(monkeypatch):
    """The shell that LAUNCHED bench carries 'bench.py' in its args
    (round-9 second false positive) — the ppid chain is exempt; an
    unrelated bench.py still flags."""
    import os
    import subprocess

    import bench

    me = os.getpid()

    def fake_ps(lines):
        class R:
            stdout = "\n".join(lines)

        return lambda *a, **k: R()

    launcher = f"{me + 1} 1 /bin/bash -c python bench.py 2>&1 | tail -3"
    own = f"{me} {me + 1} python bench.py"
    foreign = "77777 1 python bench.py"

    monkeypatch.setattr(subprocess, "run", fake_ps([launcher, own]))
    assert bench.environment_probe()["contaminated"] is False

    monkeypatch.setattr(
        subprocess, "run", fake_ps([launcher, own, foreign])
    )
    assert bench.environment_probe()["contaminated"] is True


def test_bench_mid_run_scan_names_the_foreign_runner(monkeypatch):
    """The mid-run sentinel (round-10: a foreign job landing AFTER a
    clean start probe inflated a contiguous 10-query stretch 4-8×,
    silently) reuses the same strict classifier: a busy runner is
    returned by _scan_other_procs, harness/idle processes are not, and
    the scan never raises even when ps itself fails."""
    import subprocess

    import bench

    def fake_ps(lines):
        class R:
            stdout = "\n".join(lines)

        return lambda *a, **k: R()

    monkeypatch.setattr(
        subprocess, "run", fake_ps(["77777 1 python tools/check_parity.py"])
    )
    hits = bench._scan_other_procs()
    assert hits and "check_parity" in hits[0]

    monkeypatch.setattr(
        subprocess, "run", fake_ps(["77777 1 vim bench.py"])
    )
    assert bench._scan_other_procs() == []

    def boom(*a, **k):
        raise OSError("ps unavailable")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._scan_other_procs() == []


def test_bench_sentinel_thread_logs_hits_with_timestamps(monkeypatch):
    """The watcher thread accumulates (timestamp, argv) hits so the
    timing loop can ask which procs overlapped a given run window."""
    import time as _time

    import bench

    monkeypatch.setattr(bench, "_scan_other_procs", lambda: ["java foreign"])
    s = bench._IdleSentinel(interval_s=0.02)
    s.start()
    _time.sleep(0.15)
    s.stop()
    assert s.hits and s.hits[0][1] == ["java foreign"]
    assert s.procs_since(0.0) == ["java foreign"]
    assert s.procs_since(_time.time() + 60) == []

    monkeypatch.setattr(bench, "_scan_other_procs", lambda: [])
    assert s.wait_idle(max_wait_s=1.0) is True


def test_bench_measure_with_retry_redoes_contended_runs():
    """A run that overlapped a foreign busy process is re-measured
    after waiting for idle; only retries exhausted under PERSISTENT
    contention stamp the query into `contended` (a clean re-measure is
    the fix, not a contamination)."""
    import bench

    class FakeSentinel:
        interval_s = 5.0

        def __init__(self, windows_left):
            self.windows_left = windows_left
            self.waits = 0

        def procs_since(self, t0):
            if self.windows_left > 0:
                self.windows_left -= 1
                return ["java foreign"]
            return []

        def wait_idle(self, max_wait_s=180.0):
            self.waits += 1
            return True

    # long-run shape (dt >= 2*interval) so the synchronous edge scan
    # is not consulted
    run_fn = lambda: 10.0  # noqa: E731
    releases = []

    # contention clears after one retry: number kept, nothing stamped
    contended, retries = {}, {}
    s = FakeSentinel(windows_left=1)
    dt = bench._measure_with_retry(
        "q", run_fn, s, lambda: releases.append(1), contended, retries
    )
    assert dt == 10.0 and contended == {} and retries == {"q": 1}
    assert s.waits == 1 and releases

    # persistent contention: bounded attempts, then stamped
    contended, retries = {}, {}
    s = FakeSentinel(windows_left=99)
    dt = bench._measure_with_retry(
        "q", run_fn, s, lambda: None, contended, retries
    )
    assert dt == 10.0 and retries == {"q": 3}
    assert contended == {"q": ["java foreign"]}


def test_bench_steal_probe_triggers_re_measure(monkeypatch):
    """Round 11: a run during which the hypervisor stole >5% of the
    machine is re-measured through the same retry path as a foreign
    process (the sentinel cannot see steal — it is not a process), and
    only a still-stolen final attempt stamps `contended`."""
    import bench

    class IdleSentinel:
        interval_s = 5.0

        def procs_since(self, t0):
            return []

        def wait_idle(self, max_wait_s=180.0):
            return True

    # tick stream: attempt 1 sees 10% steal, attempt 2 runs clean
    ticks = iter([(0, 0), (1000, 10000), (1000, 10000), (1010, 20000)])
    monkeypatch.setattr(bench, "_cpu_ticks", lambda: next(ticks))
    contended, retries = {}, {}
    steal = {"budget": 10, "retries": {}}
    dt = bench._measure_with_retry(
        "q", lambda: 10.0, IdleSentinel(), lambda: None,
        contended, retries, steal_state=steal,
    )
    assert dt == 10.0 and contended == {}
    assert steal["retries"] == {"q": 1} and steal["budget"] == 9

    # persistent steal: bounded attempts, then stamped with the fraction
    monkeypatch.setattr(
        bench, "_cpu_ticks",
        lambda c=iter(range(100)): (next(c) * 1000, next(c) * 10000),
    )
    contended, retries = {}, {}
    steal = {"budget": 10, "retries": {}}
    bench._measure_with_retry(
        "q", lambda: 10.0, IdleSentinel(), lambda: None,
        contended, retries, steal_state=steal,
    )
    assert list(contended) == ["q"] and contended["q"][0].startswith("steal:")

    # exhausted budget: steal no longer triggers retries (numbers are
    # kept; a chronically-stolen boot must not triple the sweep)
    monkeypatch.setattr(
        bench, "_cpu_ticks",
        lambda c=iter(range(100)): (next(c) * 1000, next(c) * 10000),
    )
    contended, retries = {}, {}
    steal = {"budget": 0, "retries": {}}
    dt = bench._measure_with_retry(
        "q", lambda: 10.0, IdleSentinel(), lambda: None,
        contended, retries, steal_state=steal,
    )
    assert dt == 10.0 and retries == {} and contended == {}


def test_bench_summary_line_fills_queries_by_cost():
    """Round 11: the stdout line carries as many per-query timings as
    fit under the tail cap, most expensive first; the base fields and
    parseability are never sacrificed."""
    import json

    import bench

    base = {"metric": "m", "value": 1.0, "unit": "sec", "n_queries": 3,
            "sec_per_query": 0.3, "sf": 0.1, "queries_detail": "x"}
    timings = {f"query_{i:03d}": float(i) for i in range(200)}
    line = bench._summary_line(dict(base), timings, cap=600)
    assert len(line) <= 600
    parsed = json.loads(line)
    qs = parsed["queries"]
    # most expensive first: every included entry outranks every excluded
    assert qs and max(set(timings) - set(qs), key=lambda k: timings[k]) not in qs
    assert min(qs.values()) >= max(
        v for k, v in timings.items() if k not in qs
    )

    # cap below even one entry: queries dropped entirely, line parseable
    line = bench._summary_line(dict(base), timings, cap=120)
    parsed = json.loads(line)
    assert "queries" not in parsed and parsed["metric"] == "m"


def test_rotation_never_signed_tier_precedes_stale_and_signed():
    """Round-9 tiering: with never-signed + changed-since-signed queries
    together oversubscribing the driver's ~50-row CORRECTNESS window,
    a query with NO green row ever must sort before one that merely
    needs re-signing, and both before currently-signed rows. Verified
    against the real committed artifacts (the invariant is structural,
    not fixture-dependent)."""
    import glob
    import json

    import __spark_entry__ as e

    import re

    names = list(e.queries())
    last_signed: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(e.__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and not row.get("err")
            ):
                last_signed[name] = max(last_signed.get(name, 0), rnd)
    # mirror the production rule: a changed entry is only stale while
    # no LATER round has re-signed it
    stale = {
        n
        for n, r in e._CHANGED_SINCE_SIGNED.items()
        if 0 < last_signed.get(n, 0) <= r
    }

    def tier(n):
        if n not in last_signed:
            return 0
        return 1 if n in stale else 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), (
        "rotation must order tier-0 (never-signed) before tier-1 "
        "(stale signature) before tier-2 (signed)"
    )
    # the ~50-row driver window is filled with never-signed queries
    # first: every window slot up to the tier-0 count is tier-0
    n0 = tiers.count(0)
    assert all(t == 0 for t in tiers[: min(50, n0)]), (
        "a signed/stale query displaced a never-signed one from the "
        "driver window"
    )
