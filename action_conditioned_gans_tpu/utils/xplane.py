"""Per-op roofline-gap analysis of ``jax.profiler`` xplane traces.

The profiling-ANALYSIS half of the tracing subsystem (SURVEY.md §6
tracing/profiling row): ``acgan train --profile-steps N`` captures the
trace; this module turns the `/device:TPU:*` plane's "XLA Ops" line into a
per-training-step op table with each op's achieved TF/s and GB/s (from the
op's own flops/bytes stats), its compute-roofline time, and the
measured/ideal ratio — plus a per-step summary grouped by tf_op provenance
(G/D × fwd/bwd, other). This view is how the r2/r3 perf disputes were
settled (BASELINE.md "xprof gap hunt"): op-sum vs while-wall exposes
scheduling gaps, and x_roof isolates kernel quality from program structure.

Ops are normalized per training step using the modal execution count (the
``steps_per_call`` while-body trip count), so one k-step dispatch trace
reads as µs/step directly.

Consumed by ``acgan profile-report <trace_dir>`` and the
``scripts/xplane_ops.py`` shim. Needs the pure-python protobuf impl with
this TF build (self-applied on import).
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import os
from typing import Dict, List, Tuple

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# TPU v5e peaks (bf16 MXU / HBM); override for other chips.
PEAK_FLOPS = float(os.environ.get("ACGAN_PEAK_FLOPS", 197e12))
PEAK_BW = float(os.environ.get("ACGAN_PEAK_BW", 819e9))


@dataclasses.dataclass(frozen=True)
class OpRow:
    """One XLA op inside the step body, normalized per training step."""

    us_per_step: float
    tf_s: float  # achieved TFLOP/s per execution
    gb_s: float  # achieved GB/s per execution (all memory spaces)
    roof_us: float  # compute-roofline time PER STEP (flops/peak x execs/step)
    x_roof: float  # measured / roofline (per-exec ratio == per-step ratio)
    name: str  # HLO display name
    tf_op: str  # tf_op provenance (trailing 60 chars)
    group: str  # D-bwd | D-fwd | G-bwd | G-fwd | other


@dataclasses.dataclass(frozen=True)
class PlaneSummary:
    plane: str
    steps_per_dispatch: int
    total_ms: float  # XLA Ops line total (all executions, whole trace)
    rows: List[OpRow]  # step-body ops, descending us_per_step
    top_total: List[Tuple[float, int, str]]  # (ms, count, name) by total time
    group_us: Dict[str, float]  # per-step measured µs by group
    group_roof_us: Dict[str, float]  # per-step compute-roofline µs by group

    @property
    def op_sum_us(self) -> float:
        return sum(r.us_per_step for r in self.rows)

    @property
    def roof_sum_us(self) -> float:
        return sum(self.group_roof_us.values())


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


def load_xspace(trace_dir: str):
    """Parse the newest ``*.xplane.pb`` under a jax.profiler trace dir (or a
    direct path to one)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isfile(trace_dir):
        paths = [trace_dir]
    else:
        paths = glob.glob(
            os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")
        ) or glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def plane_summaries(xs, top_n: int = 30) -> List[PlaneSummary]:
    """Structured per-device-plane analysis; see module docstring."""
    out = []
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
            if not agg:
                continue
            total_ms = sum(agg.values()) / 1e9
            top_total = [
                (ps / 1e9, cnt[mid], meta[mid].name[:100])
                for mid, ps in agg.most_common(top_n)
            ]
            # While-body trip count = modal execution count among
            # multi-execution ops (one k-step dispatch -> k).
            counts = [n for n in cnt.values() if n > 1]
            k = collections.Counter(counts).most_common(1)[0][0] if counts else 1
            rows: List[OpRow] = []
            groups: Dict[str, float] = collections.Counter()
            groups_roof: Dict[str, float] = collections.Counter()
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
                per_exec = ps / 1e12 / cnt[mid]  # seconds
                per_step = ps / 1e12 / k
                # COMPUTE roofline only: bytes_accessed counts every memory
                # space (VMEM-resident operands included), so a bytes
                # roofline over-credits copy/elementwise ops; flops/peak is
                # the honest "individually achievable" floor for MXU ops
                # and 0 (excluded from ratios) for pure-bandwidth ones.
                # roof is normalized PER STEP exactly like us_per_step
                # (flops is per execution; cnt/k executions per step), so
                # row roof_us values sum to roof_sum_us and x_roof compares
                # directly against the us_per_step column.
                roof = flops / PEAK_FLOPS * (cnt[mid] / k)
                g = _group(tf_op)
                rows.append(
                    OpRow(
                        us_per_step=per_step * 1e6,
                        tf_s=flops / per_exec / 1e12 if per_exec else 0.0,
                        gb_s=byts / per_exec / 1e9 if per_exec else 0.0,
                        roof_us=roof * 1e6,
                        x_roof=per_step / roof if roof else 0.0,
                        name=m.display_name,
                        tf_op=tf_op[-60:],
                        group=g,
                    )
                )
                groups[g] += per_step * 1e6
                groups_roof[g] += roof * 1e6
            if not rows:
                continue
            rows.sort(key=lambda r: r.us_per_step, reverse=True)
            out.append(
                PlaneSummary(
                    plane=plane.name,
                    steps_per_dispatch=k,
                    total_ms=total_ms,
                    rows=rows,
                    top_total=top_total,
                    group_us=dict(groups),
                    group_roof_us=dict(groups_roof),
                )
            )
    return out


def print_summary(s: PlaneSummary, top_n: int = 30) -> None:
    print(f"== {s.plane} | XLA Ops total {s.total_ms:.3f} ms ==")
    for ms, n, name in s.top_total[:top_n]:
        print(f"  {ms:9.3f} ms  x{n:5d}  {name}")
    print(f"\n-- roofline-gap view ({s.steps_per_dispatch} steps/dispatch assumed) --")
    print(
        f"{'us/step':>8} {'TF/s':>6} {'GB/s':>6} {'roof_us':>8} "
        f"{'x_roof':>6}  op | tf_op"
    )
    for r in s.rows[:top_n]:
        print(
            f"{r.us_per_step:8.1f} {r.tf_s:6.1f} {r.gb_s:6.1f} {r.roof_us:8.1f} "
            f"{r.x_roof:6.2f}  {r.name} | {r.tf_op}"
        )
    print(
        f"\nper-step op-sum: {s.op_sum_us:.1f} us "
        f"(compute-roofline sum {s.roof_sum_us:.1f} us)"
    )
    print("per-step by group (us measured / us compute-roofline):")
    for g, v in sorted(s.group_us.items(), key=lambda kv: -kv[1]):
        print(f"  {g:8s} {v:8.1f} / {s.group_roof_us.get(g, 0.0):8.1f}")


def summarize(trace_dir: str, top_n: int = 30):
    """Print both views for every device plane; returns the OpRows as
    (us_per_step, tf_s, gb_s, roof_us, x_roof, name, tf_op) tuples (the
    scripts/xplane_ops.py compatibility shape)."""
    xs = load_xspace(trace_dir)
    rows = []
    summaries = plane_summaries(xs, top_n)
    if not summaries:
        # CPU-platform traces carry no '/device:*' plane with an 'XLA Ops'
        # line — only TPU traces do. Say so instead of printing nothing.
        planes = [p.name for p in xs.planes]
        print(
            "no '/device:*' plane with an 'XLA Ops' line in this trace "
            f"(planes: {planes}) — capture the trace on TPU "
            "(`acgan train --profile-steps N`)"
        )
        return rows
    for s in summaries:
        print_summary(s, top_n)
        rows.extend(
            (r.us_per_step, r.tf_s, r.gb_s, r.roof_us, r.x_roof, r.name, r.tf_op)
            for r in s.rows
        )
    return rows
