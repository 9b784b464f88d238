"""Aggregate a serving trace into per-category totals (leaf ops only).

Groups the XLA op timeline by family (fused head, lazy-attention chain,
dense matmuls, cache writes, copies, ...), skipping control-flow wrappers
(while/cond/conditional) whose time includes their children.

  python tools/agg_profile.py <trace_dir> [--steps 63] [--calls 2]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict

from parse_profile import find_xplane


FAMILIES = [
    ("fused_head", re.compile(r"fused_head")),
    ("while/cond wrappers", re.compile(r"^%?(while|cond|conditional)")),
    # lazy-attention score/weights chain: f32[128,16,4,4,t] shapes
    ("attn scores/weights f32", re.compile(r"f32\[\d+,16,4,4,\d+\]")),
    ("attn out bf16", re.compile(r"bf16\[\d+,4,16,64\]")),
    ("copy", re.compile(r"^%?copy")),
    ("dynamic-update", re.compile(r"dynamic-update|update-slice")),
    ("convolution/dot", re.compile(r"convolution|dot")),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--steps", type=int, default=63)
    p.add_argument("--calls", type=int, default=2)
    p.add_argument("--top", type=int, default=0, help="also list top-N leaves")
    args = p.parse_args(argv)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.path), "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(int)
            for ev in line.events:
                tot[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
            fam = defaultdict(int)
            other = defaultdict(int)
            wrapper_ms = 0.0
            for name, ps in tot.items():
                for fname, rx in FAMILIES:
                    if rx.search(name):
                        if fname == "while/cond wrappers":
                            wrapper_ms += ps / 1e9
                        else:
                            fam[fname] += ps
                        break
                else:
                    # bucket leftover by opcode-ish prefix
                    key = name.lstrip("%").split(".")[0].split(" ")[0][:40]
                    other[key] += ps

            denom = args.calls * args.steps
            leaf_total = sum(fam.values()) + sum(other.values())
            print(f"leaf total: {leaf_total/1e9:.1f} ms "
                  f"({leaf_total/1e9/denom:.3f} ms/step); "
                  f"wrappers (incl. children): {wrapper_ms:.1f} ms")
            rows = [(k, v) for k, v in fam.items()] + list(other.items())
            for k, v in sorted(rows, key=lambda kv: -kv[1]):
                ms = v / 1e9
                if ms < 0.5:
                    continue
                print(f"  {ms:9.2f} ms  {ms/denom:7.4f} ms/step  {k}")
            if args.top:
                print("\n-- top leaves --")
                leaves = [
                    (n, ps) for n, ps in tot.items()
                    if not FAMILIES[1][1].search(n)
                ]
                for n, ps in sorted(leaves, key=lambda kv: -kv[1])[: args.top]:
                    print(f"  {ps/1e9:9.2f} ms  {n[:130]}")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
