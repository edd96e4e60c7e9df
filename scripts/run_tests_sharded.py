#!/usr/bin/env python
"""Run the pytest suite as N concurrent shards (whole files per shard).

The full single-process suite is ~45 min of mostly-idle-JVM wall time;
local[32] has headroom for several local[8] sessions side by side, so
sharding by test FILE (session-scoped Spark fixtures stay per-process,
in-file resources never split) cuts the gate to roughly the longest
shard. No pytest-xdist in the container — this is plain subprocess
fan-out.

Balancing: shards are packed longest-processing-time-first from measured
per-file durations cached in ``tests/.shard_times.json`` (written after
every run from each shard's junit xml), falling back to file size for
files never measured. The cache self-tunes: the second run is balanced
by the first run's truth.

Usage: python scripts/run_tests_sharded.py [n_shards] [pytest args...]
Exit code: 0 iff every shard passed.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMES_PATH = os.path.join(REPO, "tests", ".shard_times.json")


def _assign(files: list[str], weights: dict[str, float], n: int) -> list[list[str]]:
    """Longest-processing-time-first bin packing."""
    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=lambda f: -weights[f]):
        i = min(range(n), key=lambda i: shards[i][0])
        shards[i] = (shards[i][0] + weights[f], shards[i][1] + [f])
    return [s[1] for s in shards if s[1]]


def main() -> int:
    args = sys.argv[1:]
    n = int(args.pop(0)) if args and args[0].isdigit() else 4
    files = sorted(
        os.path.relpath(p, REPO)
        for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    try:
        with open(TIMES_PATH) as fh:
            measured = json.load(fh)
    except (OSError, ValueError):
        measured = {}
    # fallback: file size is a weak but monotone-ish proxy for runtime
    weights = {
        f: float(measured.get(f, os.path.getsize(os.path.join(REPO, f)) / 1000))
        for f in files
    }
    shards = _assign(files, weights, n)

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")  # n concurrent JVMs
    # the round gate runs EVERYTHING: re-include the `exhaustive`-marked
    # tests that pytest.ini's addopts excludes from the default (driver)
    # selection (a later -m on the command line overrides addopts)
    if not any(a == "-m" for a in args):
        args = ["-m", "exhaustive or not exhaustive", *args]
    procs = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        xml_path = f"/tmp/rdw_shard_{i}.xml"
        log = open(f"/tmp/rdw_shard_{i}.log", "w")
        procs.append((i, shard, xml_path, log, subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q",
             f"--junitxml={xml_path}", *shard, *args],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        )))
        print(f"shard {i}: {len(shard)} files "
              f"(~{sum(weights[f] for f in shard):.0f}s est) -> "
              f"/tmp/rdw_shard_{i}.log")

    failed = False
    totals = {"passed": 0, "failures": 0, "errors": 0, "skipped": 0}
    new_times: dict[str, float] = {}
    for i, shard, xml_path, log, p in procs:
        rc = p.wait()
        log.close()
        # pytest exit 5 = no tests collected (fine under -k filters);
        # anything else nonzero = fail
        if rc not in (0, 5):
            failed = True
        try:
            root = ET.parse(xml_path).getroot()
            suite = root.find("testsuite") if root.tag == "testsuites" else root
            nt = int(suite.get("tests", 0))
            nf = int(suite.get("failures", 0))
            ne = int(suite.get("errors", 0))
            ns = int(suite.get("skipped", 0))
            totals["passed"] += nt - nf - ne - ns
            totals["failures"] += nf
            totals["errors"] += ne
            totals["skipped"] += ns
            per_file: dict[str, float] = {}
            for case in suite.iter("testcase"):
                # classname is the dotted module path (+ class), e.g.
                # "tests.test_sources.TestNorms" — the module segment is
                # the last one starting with "test_"
                parts = case.get("classname", "").split(".")
                src = next(
                    (p for p in reversed(parts) if p.startswith("test_")), None)
                if src is None:
                    continue
                per_file[src] = per_file.get(src, 0.0) + float(case.get("time", 0))
            for mod, t in per_file.items():
                new_times[f"tests/{mod}.py"] = round(t, 1)
        except (OSError, ET.ParseError):
            if rc != 5:
                failed = True
                print(f"shard {i}: junit xml missing/unparseable (rc={rc}) — "
                      f"see /tmp/rdw_shard_{i}.log")
        status = "OK" if rc in (0, 5) else f"FAIL rc={rc}"
        print(f"shard {i}: {status}")
        if rc not in (0, 5):
            with open(f"/tmp/rdw_shard_{i}.log") as fh:
                tail = fh.readlines()[-15:]
            sys.stdout.writelines(tail)

    if new_times:
        merged = {**measured, **new_times}
        with open(TIMES_PATH, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
    wall = time.time() - t0
    print(f"\n{totals['passed']} passed, {totals['failures']} failed, "
          f"{totals['errors']} errors, {totals['skipped']} skipped "
          f"in {wall:.0f}s across {len(shards)} shards")
    if totals["passed"] + totals["failures"] + totals["errors"] == 0:
        # rc=5 per shard is fine under a -k filter, but EVERY shard
        # collecting nothing means the filter (or collection itself) is
        # broken — a zero-test run must never exit green
        print("FAIL: no tests ran anywhere (bad -k filter or collection "
              "breakage)")
        return 1
    return 1 if (failed or totals["failures"] or totals["errors"]) else 0


if __name__ == "__main__":
    sys.exit(main())
