#!/usr/bin/env python3
"""Convert tools/check.py text output into the per-round JSON artifact
(CHECK_r{N}.json): builder-run machine-readable correctness evidence,
committed at round close (VERDICT r19 #3 — the driver's CORRECTNESS
artifact arrived empty in round 19, leaving the round without committed
correctness evidence; this file closes that gap from the builder side).

Usage: python3 tools/check.py OUT SF | python3 tools/check_to_json.py > CHECK_rN.json
"""
import json
import re
import sys

rows = {}
n_pass = n_fail = 0
for line in sys.stdin:
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
    if m:
        rows[m.group(1)] = {"status": "pass", "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL ([^:\s]+):? ?(.*)", line.strip())
    if m:
        rows[m.group(1)] = {"status": "fail", "detail": m.group(2)[:200]}
        continue
    m = re.match(r"== (\d+) pass, (\d+) fail", line.strip())
    if m:
        n_pass, n_fail = int(m.group(1)), int(m.group(2))

json.dump({"pass": n_pass, "fail": n_fail, "queries": rows}, sys.stdout, indent=1)
print()
