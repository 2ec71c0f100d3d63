#!/usr/bin/env python
"""Summarize a jax.profiler trace: top HLO ops by self time.

Usage: python tools/analyze_trace.py TRACE_DIR [N]
(TRACE_DIR = the directory passed to jax.profiler.trace / profile_infer.py)
"""

import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {trace_dir}")

    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {"tqx": "out:json"}
    )
    obj = json.loads(data if isinstance(data, str) else data.decode())
    # format drift across xprof versions: {"table": {...}} vs [table, table]
    table = obj["table"] if isinstance(obj, dict) else obj[0]
    rows = table["rows"]
    cols = [c["label"] for c in table["cols"]]

    def col(r, *names):
        for name in names:
            if name in cols:
                return r["c"][cols.index(name)]["v"]
        raise KeyError(names)

    print(f"{'self_us':>12} {'avg_us':>10} {'occ':>6} {'bound':>8}  op")
    total = 0.0
    for r in rows[:topn]:
        self_us = float(col(r, "Total self-time (us)"))
        occ = int(col(r, "Occurrences", "#Occurrences"))
        name = col(r, "Type", "Operation Type")
        op = col(r, "Operation", "Operation Name")
        bound = str(col(r, "Bound by"))[:8] if "Bound by" in cols else ""
        total += self_us
        print(f"{self_us:12.0f} {self_us / max(occ,1):10.1f} {occ:6d} {bound:>8}  {name}: {op[:90]}")
    print(f"(top {topn} self-time sum: {total/1e3:.1f} ms)")


if __name__ == "__main__":
    main()
