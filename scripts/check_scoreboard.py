#!/usr/bin/env python
"""Fail loudly when REPORT.md's headline scoreboard drifts from the official
benchmark record (VERDICT r4 task 4: round 4 published 48.4k img/s in REPORT
while the driver-stamped record said 8.4k — measuring a different model).

REPORT.md carries a machine-readable copy of the quoted headline inside an
HTML comment:

    <!-- SCOREBOARD {"value": ..., "spec_name": ..., ...} -->

This script compares that block against the CURRENT record, which is:

  1. the newest driver-stamped ``BENCH_r*.json`` that carries identity
     fields (``spec_name`` — records before round 5 predate the
     self-proving format and are known-invalid, VERDICT r4 item 1), and
  2. ``results/bench_latest.json`` (written by every ``python bench.py``
     run) when it is present.

Rules: identity fields (spec_name, stage_widths, num_classes, experiment,
source) must match EXACTLY; accuracy within 2 points; n_eval must not
shrink; throughput/latency within a 35% band (run-to-run tunnel variance is
real — see memory of degraded axon days — but a 6x drift like r4's means the
wrong model was measured).

Exit 0 = reconciled; exit 1 = drift (message says which field).

Run: python scripts/check_scoreboard.py   (from the repo root; CI-friendly)
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

IDENTITY_FIELDS = ("spec_name", "num_classes", "experiment", "source")
PERF_FIELDS = ("value", "device_img_per_s", "device_p50_ms_bs1")
PERF_RTOL = 0.35


def load_scoreboard():
    with open(os.path.join(REPO, "REPORT.md")) as f:
        text = f.read()
    m = re.search(r"<!--\s*SCOREBOARD\s*(\{.*?\})\s*-->", text, re.DOTALL)
    if not m:
        print("FAIL: REPORT.md has no <!-- SCOREBOARD {...} --> block")
        sys.exit(1)
    return json.loads(m.group(1))


def official_records():
    """Yield (label, record_dict) for every record new enough to carry the
    self-proving identity fields."""
    out = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("spec_name"):
            out.append((os.path.basename(p), rec))
        else:
            print(f"note: {os.path.basename(p)} predates the self-proving "
                  "record format (no spec_name) — skipped")
    latest = os.path.join(REPO, "results", "bench_latest.json")
    if os.path.exists(latest):
        with open(latest) as f:
            out.append(("results/bench_latest.json", json.load(f)))
    return out


def compare(label, rec, sb):
    errs = []
    for k in IDENTITY_FIELDS:
        if k in sb and rec.get(k) != sb[k]:
            errs.append(f"{k}: record={rec.get(k)!r} scoreboard={sb[k]!r}")
    if "stage_widths" in sb and list(rec.get("stage_widths") or []) != list(sb["stage_widths"]):
        errs.append(f"stage_widths: record={rec.get('stage_widths')} "
                    f"scoreboard={sb['stage_widths']}")
    if sb.get("accuracy") is not None:
        ra = rec.get("accuracy")
        if ra is None or abs(ra - sb["accuracy"]) > 0.02:
            errs.append(f"accuracy: record={ra} scoreboard={sb['accuracy']}")
    if "n_eval" in sb and (rec.get("n_eval") or 0) < sb["n_eval"] * 0.99:
        errs.append(f"n_eval shrank: record={rec.get('n_eval')} scoreboard={sb['n_eval']}")
    for k in PERF_FIELDS:
        if k in sb and rec.get(k):
            rel = abs(rec[k] - sb[k]) / max(abs(sb[k]), 1e-9)
            if rel > PERF_RTOL:
                errs.append(f"{k}: record={rec[k]} scoreboard={sb[k]} "
                            f"({rel:.0%} > {PERF_RTOL:.0%} band)")
    return errs


def main():
    sb = load_scoreboard()
    recs = official_records()
    if not recs:
        print("FAIL: no identity-bearing benchmark record found "
              "(run `python bench.py` to produce results/bench_latest.json)")
        return 1
    bad = 0
    for label, rec in recs:
        errs = compare(label, rec, sb)
        if errs:
            bad += 1
            print(f"FAIL: REPORT scoreboard vs {label}:")
            for e in errs:
                print(f"  - {e}")
        else:
            print(f"ok: REPORT scoreboard matches {label}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
