"""Summarize a jax.profiler trace (xplane.pb) into a per-op time table.

Pairs with TrainConfig.profile_steps / jax.profiler.trace: point it at the
trace directory and get the on-device op breakdown without TensorBoard (the
tensorboard_plugin_profile wheel on this image is protobuf-incompatible).

  python tools/parse_profile.py <trace_dir_or_xplane.pb> [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def find_xplane(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def summarize(xplane_path: str, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules"):
                continue
            tot = defaultdict(int)
            total = 0
            for ev in line.events:
                tot[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
                total += ev.duration_ps
            print(f"\n== {plane.name} / {line.name}: {total/1e9:.1f} ms busy ==")
            for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ps/1e9:9.2f} ms {100*ps/max(total,1):5.1f}%  {name[:100]}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args(argv)
    summarize(find_xplane(args.path), args.top)


if __name__ == "__main__":
    main()
