"""Tests for the xplane roofline-gap analyzer (utils/xplane.py).

Builds a tiny synthetic XSpace proto — a device plane whose "XLA Ops" line
holds a while op (1 execution), two step-body ops (k=4 executions each),
and a warmup-only op (1 execution) — and pins the per-step normalization,
grouping, and roofline math against hand-computed values.
"""

import numpy as np
import pytest

pytest.importorskip("tensorflow")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

from action_conditioned_gans_tpu.utils.xplane import (  # noqa: E402
    PEAK_FLOPS,
    OpRow,
    plane_summaries,
    summarize,
)

K = 4  # steps per dispatch (while-body trip count)


def _build_xspace() -> xplane_pb2.XSpace:
    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"

    stat_ids = {}
    for i, name in enumerate(
        ["flops", "bytes_accessed", "tf_op", "hlo_category"], start=1
    ):
        sm = plane.stat_metadata[i]
        sm.id = i
        sm.name = name
        stat_ids[name] = i

    def add_op(mid, name, tf_op, category, flops, byts):
        em = plane.event_metadata[mid]
        em.id = mid
        em.name = name
        em.display_name = name
        s = em.stats.add()
        s.metadata_id = stat_ids["flops"]
        s.int64_value = flops
        s = em.stats.add()
        s.metadata_id = stat_ids["bytes_accessed"]
        s.int64_value = byts
        s = em.stats.add()
        s.metadata_id = stat_ids["tf_op"]
        s.str_value = tf_op
        s = em.stats.add()
        s.metadata_id = stat_ids["hlo_category"]
        s.str_value = category

    # 1: the while op itself (excluded: category "while")
    add_op(1, "while.1", "", "while", 0, 0)
    # 2: a conv executing at exactly half its compute roofline:
    #    flops such that roofline = 10 us; measured 20 us per exec.
    conv_flops = int(10e-6 * PEAK_FLOPS)
    add_op(2, "fusion.conv", "jvp(Generator)/conv0", "convolution", conv_flops, 10**6)
    # 3: a pure-bandwidth op (flops=0 -> excluded from x_roof), D-bwd.
    add_op(3, "fusion.gn", "transpose(jvp(Discriminator))/gn", "fusion", 0, 2 * 10**6)
    # 4: a warmup op executed once (excluded: cnt < k)
    add_op(4, "copy.start", "", "copy", 0, 10**3)

    line = plane.lines.add()
    line.name = "XLA Ops"

    def add_events(mid, dur_ps, n):
        for _ in range(n):
            ev = line.events.add()
            ev.metadata_id = mid
            ev.duration_ps = dur_ps

    add_events(1, 200_000_000, 1)  # while: 200 us total
    add_events(2, 20_000_000, K)  # conv: 20 us per exec
    add_events(3, 5_000_000, K)  # gn: 5 us per exec
    add_events(4, 7_000_000, 1)  # warmup copy
    return xs


def test_plane_summary_math():
    (s,) = plane_summaries(_build_xspace())
    assert s.plane == "/device:TPU:0"
    assert s.steps_per_dispatch == K
    # total: 200 + 4*20 + 4*5 + 7 us
    np.testing.assert_allclose(s.total_ms, (200 + 80 + 20 + 7) / 1e3, rtol=1e-9)

    by_name = {r.name: r for r in s.rows}
    assert set(by_name) == {"fusion.conv", "fusion.gn"}  # while+warmup excluded

    conv = by_name["fusion.conv"]
    assert isinstance(conv, OpRow)
    np.testing.assert_allclose(conv.us_per_step, 20.0, rtol=1e-6)
    np.testing.assert_allclose(conv.roof_us, 10.0, rtol=1e-6)
    np.testing.assert_allclose(conv.x_roof, 2.0, rtol=1e-6)  # half of roofline
    np.testing.assert_allclose(conv.tf_s, conv_tf_s(), rtol=1e-6)
    assert conv.group == "G-fwd"

    gn = by_name["fusion.gn"]
    np.testing.assert_allclose(gn.us_per_step, 5.0, rtol=1e-6)
    assert gn.x_roof == 0.0 and gn.roof_us == 0.0  # bandwidth-only op
    np.testing.assert_allclose(gn.gb_s, 2e6 / 5e-6 / 1e9, rtol=1e-6)  # 400 GB/s
    assert gn.group == "D-bwd"

    # rows sorted descending by us_per_step; group sums match the rows
    assert [r.name for r in s.rows] == ["fusion.conv", "fusion.gn"]
    np.testing.assert_allclose(s.op_sum_us, 25.0, rtol=1e-6)
    np.testing.assert_allclose(s.group_us["G-fwd"], 20.0, rtol=1e-6)
    np.testing.assert_allclose(s.group_roof_us["G-fwd"], 10.0, rtol=1e-6)


def conv_tf_s():
    return int(10e-6 * PEAK_FLOPS) / 20e-6 / 1e12


def test_multi_exec_per_step_roofline_consistent():
    """An op executing MORE than k times (e.g. 2 executions per step body)
    must have roof_us normalized per STEP exactly like us_per_step, so the
    per-row values sum to roof_sum_us and x_roof compares against the
    us_per_step column (r3b review finding)."""
    xs = _build_xspace()
    plane = xs.planes[0]
    # op 5: same conv flops, but 2*K executions at 20 us each.
    em = plane.event_metadata[5]
    em.id = 5
    em.name = "fusion.conv2x"
    em.display_name = "fusion.conv2x"
    s = em.stats.add()
    s.metadata_id = 1  # flops
    s.int64_value = int(10e-6 * PEAK_FLOPS)
    s = em.stats.add()
    s.metadata_id = 3  # tf_op
    s.str_value = "jvp(Generator)/conv_twice"
    s = em.stats.add()
    s.metadata_id = 4  # hlo_category
    s.str_value = "convolution"
    line = plane.lines[0]
    for _ in range(2 * K):
        ev = line.events.add()
        ev.metadata_id = 5
        ev.duration_ps = 20_000_000
    (summary,) = plane_summaries(xs)
    row = {r.name: r for r in summary.rows}["fusion.conv2x"]
    np.testing.assert_allclose(row.us_per_step, 40.0, rtol=1e-6)  # 2 x 20 us
    np.testing.assert_allclose(row.roof_us, 20.0, rtol=1e-6)  # 2 x 10 us
    np.testing.assert_allclose(row.x_roof, 2.0, rtol=1e-6)
    # invariant: per-row roof sums == the group roof sums.
    np.testing.assert_allclose(
        sum(r.roof_us for r in summary.rows), summary.roof_sum_us, rtol=1e-9
    )


def test_cli_profile_report_missing_trace(tmp_path, capsys):
    """A missing/empty trace dir exits via parser.error with a hint, not a
    raw FileNotFoundError traceback."""
    from action_conditioned_gans_tpu import cli

    with pytest.raises(SystemExit) as exc:
        cli.main(["profile-report", "--workdir", str(tmp_path / "nowhere")])
    assert exc.value.code == 2
    assert "--profile-steps" in capsys.readouterr().err


def test_summarize_end_to_end(tmp_path, capsys):
    d = tmp_path / "trace" / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(_build_xspace().SerializeToString())
    rows = summarize(str(tmp_path / "trace"))
    out = capsys.readouterr().out
    assert "roofline-gap view (4 steps/dispatch" in out
    assert "fusion.conv" in out and "G-fwd" in out
    # compatibility tuple shape
    assert len(rows) == 2 and len(rows[0]) == 7
    np.testing.assert_allclose(rows[0][0], 20.0, rtol=1e-6)


def test_cli_profile_report(tmp_path, capsys):
    d = tmp_path / "profile" / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(_build_xspace().SerializeToString())
    from action_conditioned_gans_tpu import cli

    jpath = tmp_path / "report.json"
    rc = cli.main(
        [
            "profile-report",
            "--workdir",
            str(tmp_path),
            "--top",
            "5",
            "--json",
            str(jpath),
        ]
    )
    assert rc == 0
    assert "per-step op-sum: 25.0 us" in capsys.readouterr().out
    import json

    (plane,) = json.loads(jpath.read_text())
    assert plane["steps_per_dispatch"] == K
    np.testing.assert_allclose(plane["op_sum_us"], 25.0, rtol=1e-6)
    assert {r["name"] for r in plane["rows"]} == {"fusion.conv", "fusion.gn"}


def test_cli_profile_report_no_device_plane(tmp_path, capsys):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.planes.add().name = "/host:CPU"
    d = tmp_path / "profile" / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    (d / "host.xplane.pb").write_bytes(xs.SerializeToString())
    from action_conditioned_gans_tpu import cli

    rc = cli.main(["profile-report", "--workdir", str(tmp_path)])
    assert rc == 1
    assert "capture it on TPU" in capsys.readouterr().out
