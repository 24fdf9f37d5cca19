#!/usr/bin/env python
"""Validate result cells: each cell log must contain exactly one
completed run ("total time:" line) and a parseable stat JSON.  Cells
that fail are deleted with --apply so a rerun pass (rerun_half_a/b.sh)
re-measures them.

Motivated by a round-3 incident: two leftover background runners from a
previous session raced the sequential re-measurement over the same cell
directories for ~2 h; any cell finished in that window may hold
interleaved logs or a stat JSON from a contended (3 concurrent TPU
processes) run.
"""
import json
import os
import re
import sys

RT = sys.argv[1] if len(sys.argv) > 1 else "results_tpu"
apply = "--apply" in sys.argv

bad = []
for cell in sorted(os.listdir(RT)):
    d = os.path.join(RT, cell)
    if not os.path.isdir(d) or cell.startswith("_"):
        continue
    if not os.path.exists(os.path.join(d, "done")):
        continue
    if os.path.exists(os.path.join(d, "SKIPPED.txt")):
        continue  # documented structural skip, not a measurement
    log = os.path.join(d, "log.txt")
    reasons = []
    if os.path.exists(log):
        txt = open(log, errors="replace").read()
        # continuation tasks print per-stage "solving ... total time:"
        # lines plus the final one; exactly one FINAL line must exist
        n_tot = len(re.findall(r"^total time:", txt, re.M))
        n_any = len(re.findall(r"total time:", txt))
        if n_tot != 1 and not (n_tot == 0 and n_any == 1):
            reasons.append(
                f"{n_tot} final / {n_any} total 'total time:' lines"
            )
        if "\x00" in txt:
            reasons.append("NUL bytes (interleaved writes)")
    else:
        reasons.append("no log.txt")
    js = [f for f in os.listdir(d) if f.endswith(".json")]
    ok_json = False
    for f in js:
        try:
            json.load(open(os.path.join(d, f)))
            ok_json = True
        except Exception:
            reasons.append(f"unparseable {f}")
    if js and not ok_json:
        reasons.append("no valid stat JSON")
    if reasons:
        bad.append((cell, reasons))

for cell, reasons in bad:
    print(f"BAD  {cell}: {'; '.join(reasons)}")
    if apply:
        import shutil

        shutil.rmtree(os.path.join(RT, cell))
        print(f"     removed {cell}")
print(f"{len(bad)} bad cell(s)")
