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
    """Classify by the op's OWN name (the `%name = ...` head), never by
    substring over the full HLO text — operand lists mention other ops'
    names (e.g. `%copy-done` arguments), which previously binned every
    Pallas attention custom-call under copy/layout and every fusion with a
    conv operand under conv."""
    head = name.split(" = ")[0].lstrip("%").lower()
    if "_fused_call" in head or "pallas" in head:
        return "pallas-kernel"
    base = re.split(r"[.\d]", head)[0].rstrip("_-")
    if base.startswith("convolution") or base.startswith("conv"):
        return "conv"
    if base.endswith("fusion") or base == "fusion":
        return "fusion"
    if base in ("copy", "copy-start", "copy-done", "bitcast", "transpose",
                "reshape"):
        return "copy/layout"
    if base in ("dot", "matmul", "cublas", "custom-call"):
        return "dot/custom"
    if base.startswith("reduce"):
        return "reduce"
    if base == "select-and-scatter":
        return "maxpool-bwd"
    if base in ("scatter", "gather", "sort", "topk", "top-k"):
        return "gather/scatter/sort"
    if base.startswith("slice") or base.startswith("dynamic"):
        return "slice/dus"
    if base.startswith("all-") or base.startswith("collective"):
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
