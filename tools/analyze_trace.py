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
    rows = obj["table"]["rows"]
    cols = [c["label"] for c in obj["table"]["cols"]]

    def col(r, name):
        return r["c"][cols.index(name)]["v"]

    print(f"{'self_us':>12} {'avg_us':>10} {'occ':>6}  op")
    total = 0.0
    for r in rows[:topn]:
        self_us = float(col(r, "Total self-time (us)"))
        occ = int(col(r, "Occurrences"))
        name = col(r, "Type")
        op = col(r, "Operation")
        total += self_us
        print(f"{self_us:12.0f} {self_us / max(occ,1):10.1f} {occ:6d}  {name}: {op[:90]}")
    print(f"(top {topn} self-time sum: {total/1e3:.1f} ms)")


if __name__ == "__main__":
    main()
