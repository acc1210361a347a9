#!/usr/bin/env python3
"""Regenerate README.md's test/query counts from run output.

The two numbers the README states — ScalaTest check count and
oracle-checked query count — drifted by hand-maintenance in rounds 12
and 13. This script is the single source of truth: it parses them out
of actual run logs and rewrites the README lines, so the counts can
only change together with a real run.

Usage:
    sbt -batch test > /tmp/test.log 2>&1
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout" ...
    python3 tools/check.py /root/testdata/sf0.01 /tmp/vout > /tmp/check.log
    python3 tools/readme_counts.py /tmp/test.log /tmp/check.log
"""
import re
import sys

test_log, check_log = sys.argv[1], sys.argv[2]

m = None
for line in open(test_log, errors="replace"):
    m2 = re.search(r"Tests: succeeded (\d+), failed (\d+)", line)
    if m2:
        m = m2
if m is None:
    sys.exit("no 'Tests: succeeded N' line in " + test_log)
n_tests, n_failed = int(m.group(1)), int(m.group(2))
if n_failed:
    sys.exit(f"refusing to record a failing run ({n_failed} failed)")

tail = open(check_log, errors="replace").read()
mc = re.search(r"(\d+)/(\d+) oracle-checked OK; rows-only \(no oracle\): \[([^\]]*)\]", tail)
if mc is None:
    sys.exit("no summary line in " + check_log)
n_ok, n_checked = int(mc.group(1)), int(mc.group(2))
if n_ok != n_checked:
    sys.exit(f"refusing to record a failing gate ({n_ok}/{n_checked})")
n_rows_only = len([t for t in mc.group(3).split(",") if t.strip()])
n_declared = n_checked + n_rows_only

readme = open("README.md").read()
readme, c1 = re.subn(
    r"\d+ of \d+ queries are oracle-checked",
    f"{n_ok} of {n_declared} queries are oracle-checked", readme)
readme, c2 = re.subn(
    r"# build \+ \d+ checks",
    f"# build + {n_tests} checks", readme)
if c1 != 1 or c2 != 1:
    sys.exit(f"README anchors not found exactly once (query line: {c1}, "
             f"check line: {c2})")
open("README.md", "w").write(readme)
print(f"README.md: {n_tests} checks, {n_ok} of {n_declared} "
      f"queries oracle-checked ({n_rows_only} rows-only)")
