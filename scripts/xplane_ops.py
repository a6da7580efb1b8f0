#!/usr/bin/env python
"""Summarize device-side XLA op durations from a jax.profiler xplane trace.

Usage: python scripts/xplane_ops.py <trace_dir> [top_n]

Two views of the '/device:TPU:*' plane's 'XLA Ops' line:
  1. the classic top-N by total duration;
  2. a per-op roofline-gap table (r3 gap hunt, BASELINE.md): for each op,
     achieved TF/s and GB/s from the op's own flops/bytes stats, its
     compute-roofline time, and the measured/ideal ratio — plus a per-step
     summary grouped by tf_op provenance (G/D x fwd/bwd, other). Ops are
     normalized per training step using the most common execution count
     (the while-body trip count), so one k-step dispatch trace reads as
     us/step directly.

Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python with this TF build
(self-applied below). Peak numbers are TPU v5e; adjust for other chips.
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

PEAK_FLOPS = 197e12  # v5e bf16 MXU
PEAK_BW = 819e9  # v5e HBM


def _group(tf_op: str) -> str:
    if "transpose(jvp(Discriminator))" in tf_op:
        return "D-bwd"
    if "jvp(Discriminator)" in tf_op:
        return "D-fwd"
    if "transpose(jvp(Generator))" in tf_op:
        return "G-bwd"
    if "jvp(Generator)" in tf_op:
        return "G-fwd"
    return "other"


def summarize(trace_dir: str, top_n: int = 30):
    """Print both views; returns the gap rows as
    (us_per_step, tf_s, gb_s, roof_us, x_roof, op_name, tf_op) tuples
    across all device planes, sorted within each plane."""
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
        smeta = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                agg[ev.metadata_id] += ev.duration_ps
                cnt[ev.metadata_id] += 1

            total = sum(agg.values())
            print(f"== {plane.name} | XLA Ops total {total/1e9:.3f} ms ==")
            for mid, ps in agg.most_common(top_n):
                print(f"  {ps/1e9:9.3f} ms  x{cnt[mid]:5d}  {meta[mid].name[:100]}")

            # --- roofline-gap view, normalized per step ------------------
            # The while-body trip count = the modal execution count among
            # multi-execution ops (one k-step dispatch -> k).
            counts = [n for n in cnt.values() if n > 1]
            k = collections.Counter(counts).most_common(1)[0][0] if counts else 1
            gap_rows = []
            groups = collections.Counter()
            groups_roof = collections.Counter()
            for mid, ps in agg.items():
                m = meta[mid]
                st = {smeta[s.metadata_id].name: s for s in m.stats}
                cat = st["hlo_category"].str_value if "hlo_category" in st else "?"
                if cat == "while" or cnt[mid] < k:
                    continue  # only ops inside the step body
                flops = st["flops"].int64_value if "flops" in st else 0
                byts = (
                    st["bytes_accessed"].int64_value if "bytes_accessed" in st else 0
                )
                tf_op = st["tf_op"].str_value if "tf_op" in st else ""
                per_exec = ps / 1e12 / cnt[mid]
                per_step = ps / 1e12 / k
                # COMPUTE roofline only: bytes_accessed counts every memory
                # space (VMEM-resident operands included), so a bytes
                # roofline over-credits copy/elementwise ops; flops/peak is
                # the honest "individually achievable" floor for MXU ops
                # and 0 (excluded from ratios) for pure-bandwidth ones.
                roof = flops / PEAK_FLOPS
                gap_rows.append(
                    (
                        per_step * 1e6,
                        flops / per_exec / 1e12 if per_exec else 0.0,
                        byts / per_exec / 1e9 if per_exec else 0.0,
                        roof * 1e6,
                        per_exec / roof if roof else 0.0,
                        m.display_name,
                        tf_op[-60:],
                    )
                )
                g = _group(tf_op)
                groups[g] += per_step * 1e6
                groups_roof[g] += roof * 1e6 * (cnt[mid] // k)
            if not gap_rows:
                continue
            gap_rows.sort(reverse=True)
            rows.extend(gap_rows)
            print(f"\n-- roofline-gap view ({k} steps/dispatch assumed) --")
            print(
                f"{'us/step':>8} {'TF/s':>6} {'GB/s':>6} {'roof_us':>8} "
                f"{'x_roof':>6}  op | tf_op"
            )
            for r in gap_rows[:top_n]:
                us, tf, gb, roof, ratio, nm, t = r
                print(
                    f"{us:8.1f} {tf:6.1f} {gb:6.1f} {roof:8.1f} {ratio:6.2f}  {nm} | {t}"
                )
            print(
                f"\nper-step op-sum: {sum(r[0] for r in gap_rows):.1f} us "
                f"(compute-roofline sum {sum(groups_roof.values()):.1f} us)"
            )
            print("per-step by group (us measured / us compute-roofline):")
            for g, v in groups.most_common():
                print(f"  {g:8s} {v:8.1f} / {groups_roof[g]:8.1f}")
    return rows


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
