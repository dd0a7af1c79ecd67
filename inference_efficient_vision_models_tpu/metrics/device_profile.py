"""Per-op device-time profiling via jax.profiler + xprof trace parsing.

The reference's only profiling is wall-clock timing
(`pruning/pruning_engine_structured.py:139-146`). This module captures a
real device trace and returns the per-HLO-op self-time table — the tool the
per-layer kernel profile in REPORT.md was produced with. Works on TPU;
returns [] gracefully when the xprof converter or device rows are absent
(e.g. CPU CI).

Usage:
    rows = profile_device_ops(lambda: jax.block_until_ready(fn(x)), iters=10)
    for r in rows[:10]:
        print(r["avg_self_us"], r["category"], r["name"])
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Callable, Dict, List


def profile_device_ops(run: Callable[[], None], *, iters: int = 10) -> List[Dict]:
    """Run ``run()`` ``iters`` times under a profiler trace; return per-op
    device self-times, sorted descending.

    Each row: {"name", "category", "occurrences", "total_self_us",
    "avg_self_us", "self_percent"}.
    """
    import jax

    with tempfile.TemporaryDirectory() as tdir:
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                run()
        xplanes = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
        if not xplanes:
            return []
        return _parse_xplane(xplanes, iters)


def _parse_xplane(paths: List[str], iters: int) -> List[Dict]:
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        return []
    try:
        data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    except Exception:
        return []
    tables = json.loads(data.decode() if isinstance(data, bytes) else data)
    if not tables:
        return []
    table = tables[0]
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        vals = dict(zip(cols, [c["v"] for c in r["c"]]))
        if vals.get("host_or_device") != "Device":
            continue
        rows.append({
            "name": vals.get("operation", ""),
            "category": vals.get("type", ""),
            "occurrences": vals.get("occurrences", 0),
            "total_self_us": vals.get("total_self_time", 0.0),
            "avg_self_us": vals.get("total_self_time", 0.0) / max(iters, 1),
        })
    total = sum(r["total_self_us"] for r in rows) or 1.0
    for r in rows:
        r["self_percent"] = 100.0 * r["total_self_us"] / total
    rows.sort(key=lambda r: -r["total_self_us"])
    return rows


def profile_hlo_ops(run: Callable[[], None], *, iters: int = 10) -> List[Dict]:
    """Finer-grained per-HLO-fusion breakdown (hlo_stats tool): each row has
    the fusion name, its HLO expression (shapes/layouts), and self time."""
    import jax

    with tempfile.TemporaryDirectory() as tdir:
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                run()
        xplanes = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
        if not xplanes:
            return []
        try:
            from xprof.convert import raw_to_tool_data as rtd

            data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
        except Exception:
            return []
        tables = json.loads(data.decode() if isinstance(data, bytes) else data)
        if not tables:
            return []
        table = tables[0] if isinstance(tables, list) else tables
        cols = [c["id"] for c in table["cols"]]
        rows = []
        for r in table["rows"]:
            vals = dict(zip(cols, [c["v"] for c in r["c"]]))
            rows.append({
                "name": vals.get("hlo_op_name", ""),
                "category": vals.get("category", ""),
                "expression": vals.get("hlo_op_expression", "")[:200],
                "total_self_us": vals.get("total_self_time", 0.0),
                "avg_self_us": vals.get("total_self_time", 0.0) / max(iters, 1),
            })
        rows.sort(key=lambda r: -r["total_self_us"])
        return rows
