#!/usr/bin/env python
"""Diff two jax.profiler traces op-by-op (e.g. bf16 vs int8 serving).

Usage: python tools/diff_trace.py TRACE_A TRACE_B [N]

Prints the top-N ops of A with B's time for the same (full) op name, the
delta, and a category rollup (conv/dot/transpose/convert/other) — the
attribution tool for "where does the int8 win go" (VERDICT r4 #1).
"""

import glob
import json
import sys
from collections import defaultdict


def load(trace_dir):
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
    table = obj["table"] if isinstance(obj, dict) else obj[0]
    cols = [c["label"] for c in table["cols"]]

    def col(r, *names):
        for name in names:
            if name in cols:
                return r["c"][cols.index(name)]["v"]
        raise KeyError(names)

    ops = {}
    for r in table["rows"]:
        name = col(r, "Operation Name", "Operation", "Op name")
        typ = col(r, "Operation Type", "Type", "Category")
        self_us = float(col(r, "Total self-time (us)", "Self-time (us)",
                            "Total self time (us)"))
        bound = ""
        for cand in ("Bound by", "Bounded-by"):
            if cand in cols:
                bound = col(r, cand)
        ops[name] = dict(type=typ, self_us=self_us, bound=bound)
    return ops


def cat(name, typ):
    t = str(typ).lower()
    if "idle" in name.lower():
        return "idle"
    for k in ("conv", "dot", "transpose", "convert", "concatenate",
              "reshape", "reduce", "scatter", "gather", "fusion"):
        if k in t or k in name.split(":")[0]:
            return k
    return "other"


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    a, b = load(a_dir), load(b_dir)

    tot_a = sum(o["self_us"] for o in a.values())
    tot_b = sum(o["self_us"] for o in b.values())
    print(f"total device+idle us: A={tot_a:.0f}  B={tot_b:.0f}  "
          f"delta={tot_b - tot_a:+.0f}")

    roll_a, roll_b = defaultdict(float), defaultdict(float)
    for n, o in a.items():
        roll_a[cat(n, o["type"])] += o["self_us"]
    for n, o in b.items():
        roll_b[cat(n, o["type"])] += o["self_us"]
    print(f"\n{'category':>14} {'A_us':>10} {'B_us':>10} {'delta':>10}")
    for k in sorted(set(roll_a) | set(roll_b),
                    key=lambda k: -max(roll_a[k], roll_b[k])):
        print(f"{k:>14} {roll_a[k]:>10.0f} {roll_b[k]:>10.0f} "
              f"{roll_b[k] - roll_a[k]:>+10.0f}")

    print(f"\n{'A_us':>10} {'B_us':>10} {'delta':>9} {'A_bound':>8}  op")
    rows = sorted(a.items(), key=lambda kv: -kv[1]["self_us"])[:topn]
    for name, o in rows:
        bo = b.get(name, {}).get("self_us", 0.0)
        print(f"{o['self_us']:>10.0f} {bo:>10.0f} {bo - o['self_us']:>+9.0f} "
              f"{o['bound']:>8}  {name[:140]}")
    only_b = sorted(
        ((n, o) for n, o in b.items() if n not in a),
        key=lambda kv: -kv[1]["self_us"],
    )[:15]
    if only_b:
        print("\nops only in B:")
        for name, o in only_b:
            print(f"{'':>10} {o['self_us']:>10.0f} {'':>9} {o['bound']:>8}  {name[:140]}")


if __name__ == "__main__":
    main()
