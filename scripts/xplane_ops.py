#!/usr/bin/env python
"""Summarize device-side XLA op durations from a jax.profiler xplane trace.

Usage: python scripts/xplane_ops.py <trace_dir> [top_n]
Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python with this TF build
(self-applied below). Aggregates the '/device:TPU:0' plane's 'XLA Ops' line.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def summarize(trace_dir: str, top_n: int = 30):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    rows = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta[ev.metadata_id].name
                agg[name] += ev.duration_ps
                cnt[name] += 1
            total = sum(agg.values())
            rows.append((plane.name, agg, cnt, total))
    for plane_name, agg, cnt, total in rows:
        print(f"== {plane_name} | XLA Ops total {total/1e9:.3f} ms ==")
        for name, ps in agg.most_common(top_n):
            print(f"  {ps/1e9:9.3f} ms  x{cnt[name]:5d}  {name[:100]}")
    return rows


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
