"""Break the 'fusion' bucket of the R100 step trace into sub-families
(BN-stat reduces, BN-apply elementwise, PFC head, optimizer, conv-epilogue)
and split convs into fwd/dgrad/wgrad by output shape.

    python scripts/xplane_fusions.py /tmp/fr_trace [n_steps]
"""

import glob
import re
import sys
from collections import defaultdict

import jax


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fr_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])

    plane = next(p for p in pd.planes if "TPU" in p.name)
    line = next(l for l in plane.lines if l.name == "XLA Ops")

    fam = defaultdict(float)
    conv_shapes = defaultdict(float)
    fus_shapes = defaultdict(float)
    total = 0.0
    for ev in line.events:
        dur = ev.duration_ns / 1e6 / n_steps
        total += dur
        n = ev.name
        # first output shape
        m = re.search(r"= \(?((?:bf16|f32|s32|u32|pred|u8)\[[\d,]*\])", n)
        shape = m.group(1) if m else "?"
        if "convolution" in n or re.match(r"%conv", n):
            conv_shapes[shape] += dur
            if "86690" in n or "26007" in n or ",512]" in shape and "256," in shape:
                fam["head-matmul"] += dur
            else:
                fam["conv"] += dur
        elif "fusion" in n:
            fus_shapes[shape] += dur
            if "86690" in n:
                fam["pfc-weight-update"] += dur
            elif "convert_reduce" in n or ("reduce" in n and "f32[" in n.split("=")[1][:20]):
                fam["bn-stat-reduce"] += dur
            elif re.match(r"%(rsqrt|maximum|subtract|multiply|add|divide)", n):
                fam["elementwise-fusion"] += dur
            elif "convolution" in n:
                fam["conv-epilogue-fusion"] += dur
            else:
                fam["other-fusion"] += dur
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            fam["copy/layout"] += dur
        elif "select-and-scatter" in n:
            fam["maxpool-bwd"] += dur
        else:
            fam["other"] += dur

    print(f"total {total:.2f} ms/step")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:8.2f} ms/step ({100*v/total:5.1f}%)")

    print("-- conv time by output shape:")
    for k, v in sorted(conv_shapes.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v:8.2f}  {k}")
    print("-- fusion time by output shape:")
    for k, v in sorted(fus_shapes.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:8.2f}  {k}")


if __name__ == "__main__":
    main()
