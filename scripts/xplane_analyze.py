"""Offline XPlane analyzer: per-line aggregation of a jax.profiler trace
(produced by scripts/trace_probe.py), so overlapping planes/lines are not
double-counted. Groups the 'XLA Ops' line by op family and prints the top
individual ops.

    python scripts/xplane_analyze.py /tmp/fr_trace [n_steps]
"""

import glob
import re
import sys
from collections import defaultdict

import jax


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or re.search(r"\bconv", n):
        return "conv"
    if "fusion" in n:
        return "fusion"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reshape" in n:
        return "copy/layout"
    if "dot" in n or "matmul" in n:
        return "dot"
    if "reduce" in n:
        return "reduce"
    if "select-and-scatter" in n:
        return "maxpool-bwd"
    if "scatter" in n or "gather" in n or "sort" in n or "top" in n:
        return "gather/scatter/sort"
    if "slice" in n or "dynamic-update" in n:
        return "slice/dus"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fr_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    pd = jax.profiler.ProfileData.from_file(files[0])

    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            tot = sum(ev.duration_ns for ev in line.events) / 1e6
            print(f"  line '{line.name}': {len(list(line.events))} events, "
                  f"{tot:.2f} ms total ({tot/n_steps:.2f} ms/step)")

        # aggregate ONLY op-level lines (exclusive op timings)
        for line in plane.lines:
            if "op" not in line.name.lower():
                continue
            agg = defaultdict(float)
            ev_agg = defaultdict(float)
            total = 0.0
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                total += dur
                agg[classify(ev.name)] += dur
                ev_agg[ev.name] += dur
            print(f"-- line '{line.name}' by family "
                  f"({total/n_steps:.2f} ms/step):")
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
                print(f"  {k:22s} {v/n_steps:8.2f} ms/step ({100*v/total:5.1f}%)")
            print("-- top 40 ops (ms/step):")
            for name, dur in sorted(ev_agg.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {dur/n_steps:8.3f}  {name[:130]}")


if __name__ == "__main__":
    main()
