"""Benchmark harness for the BASELINE.json metrics.

Measures the fused G+D train step: frames/sec/chip and p50 per-step latency
at the given config, on whatever devices are attached (one real TPU chip
under the driver; the CPU mesh in tests). Also reports a conv-FLOPs roofline
utilization estimate for the ≥85%-of-roofline north star.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.data import make_dataset
from action_conditioned_gans_tpu.train.loop import batch_shardings, build_step_and_state
from action_conditioned_gans_tpu.utils.profiling import analytic_matmul_cost

# Peak MXU throughput (bf16 FLOP/s) and HBM bandwidth per chip, for
# roofline accounting only.
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,
    "cpu": 1e11,
}
_HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5": 2765e9,  # v5p
    "TPU v6 lite": 1640e9,
    "cpu": 50e9,
}


def _device_key() -> str:
    kind = jax.devices()[0].device_kind
    for name in _PEAK_FLOPS:
        if name != "cpu" and name.lower() in kind.lower():
            return name
    return "cpu" if jax.default_backend() == "cpu" else "TPU v4"


def _device_peak_flops() -> float:
    return _PEAK_FLOPS[_device_key()]


def step_cost_flops(compiled) -> Optional[float]:
    """Total FLOPs of the compiled fused step, from XLA's cost analysis."""
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _round_trip_s() -> float:
    """Measured cost of one empty dispatch→device_get barrier (fixed ~26 ms
    on the axon tunnel; see BASELINE.md methodology v2)."""
    _noop = jax.jit(lambda s: s + 1.0)
    _zero = jax.device_put(np.float32(0.0), jax.devices()[0])
    float(jax.device_get(_noop(_zero)))  # compile
    return min(_timed(lambda: float(jax.device_get(_noop(_zero)))) for _ in range(5))


def run_infer_bench(
    cfg: Config,
    batch: Optional[int] = None,
    rollout: Optional[int] = None,
    k: int = 32,
    windows: int = 3,
    calls_per_window: int = 8,
) -> Dict[str, float]:
    """Serving-path throughput: the jitted generator ONLY (the reference's
    ``sess.run(G, feed_dict=...)`` deployment story, SURVEY.md §4.2 /
    ``infer.Predictor``), no discriminator, no optimizer.

    Measures two shapes:
      * ``infer_fps`` — single-step next-frame prediction, ``k`` applications
        scanned inside one jit over a PRE-GENERATED input bank (per the
        platform microbench rule: a rotating bank, not an in-scan
        perturbation, which CSE can hoist through the network);
      * ``rollout_fps`` — autoregressive T-step rollout (Predictor.rollout
        semantics: each step consumes the previous prediction).
    True-barrier timing with the empty-round-trip constant subtracted.
    """
    from action_conditioned_gans_tpu.models import Generator

    m = cfg.model
    b = batch or cfg.train.batch_size
    t = rollout or max(cfg.train.rollout_length, 1)
    gen = Generator(m)
    key = jax.random.PRNGKey(0)
    kf, ka, ks, kp = jax.random.split(key, 4)
    frame0 = jnp.tanh(jax.random.normal(kf, (b, m.image_size, m.image_size, m.image_channels), jnp.float32))
    action0 = jax.random.normal(ka, (b, m.action_dim), jnp.float32)
    state0 = (
        jax.random.normal(ks, (b, m.state_dim), jnp.float32) if m.state_dim else None
    )
    params = gen.init(kp, frame0, action0, state0)["params"]

    # Input banks: k distinct frames/actions so no two scan iterations share
    # a subcomputation.
    frames = jnp.tanh(
        jax.random.normal(kf, (k, b, m.image_size, m.image_size, m.image_channels), jnp.float32)
    )
    actions = jax.random.normal(ka, (k, b, m.action_dim), jnp.float32)
    states = (
        jax.random.normal(ks, (k, b, m.state_dim), jnp.float32) if m.state_dim else None
    )
    roll_actions = jax.random.normal(ka, (b, t, m.action_dim), jnp.float32)
    roll_states = (
        jax.random.normal(ks, (b, t, m.state_dim), jnp.float32) if m.state_dim else None
    )

    @jax.jit
    def single_step_bank(params, frames, actions, states):
        def body(acc, xs):
            if states is None:
                f, a = xs
                s = None
            else:
                f, a, s = xs
            y = gen.apply({"params": params}, f, a, s)
            return acc + jnp.mean(y.astype(jnp.float32)), None

        xs = (frames, actions) if states is None else (frames, actions, states)
        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    @jax.jit
    def rollout_fn(params, frame0, actions, states):
        actions_tm = jnp.moveaxis(actions, 0, 1)
        states_tm = jnp.moveaxis(states, 0, 1) if states is not None else None

        def step(prev, xs):
            if states_tm is None:
                (a,) = xs
                s = None
            else:
                a, s = xs
            pred = gen.apply({"params": params}, prev, a, s)
            return pred.astype(prev.dtype), jnp.mean(pred.astype(jnp.float32))

        xs = (actions_tm,) if states_tm is None else (actions_tm, states_tm)
        _, outs = lax.scan(step, frame0, xs)
        return jnp.sum(outs)

    out: Dict[str, float] = {
        "config": cfg.name,
        "image_size": m.image_size,
        "batch_size": b,
        "rollout_length": t,
        "device": jax.devices()[0].device_kind,
    }
    rt = None

    def timeit(fn, *args) -> float:
        nonlocal rt
        float(jax.device_get(fn(*args)))  # compile + warm
        if rt is None:
            rt = _round_trip_s()

        def window() -> float:
            t0 = time.perf_counter()
            r = None
            for _ in range(calls_per_window):
                r = fn(*args)
            float(jax.device_get(r))
            el = time.perf_counter() - t0
            return max(el - rt, el * 0.5) / calls_per_window

        window()  # extra warm window
        return float(np.percentile([window() for _ in range(windows)], 50))

    per_call = timeit(single_step_bank, params, frames, actions, states)
    out["infer_step_latency_ms"] = per_call / k * 1e3
    out["infer_fps_per_chip"] = b * k / per_call
    per_roll = timeit(rollout_fn, params, frame0, roll_actions, roll_states)
    out["rollout_latency_ms"] = per_roll * 1e3
    out["rollout_fps_per_chip"] = b * t / per_roll
    out["barrier_round_trip_ms"] = (rt or 0.0) * 1e3
    return out


def run_serving_bench(
    cfg: Config,
    batch: Optional[int] = None,
    rollout: Optional[int] = None,
    windows: int = 3,
    calls_per_window: int = 4,
) -> Dict[str, float]:
    """End-to-end serving latency: live ``Predictor.rollout`` vs the AOT
    artifact's ``AotPredictor.rollout``.

    Unlike :func:`run_infer_bench` (device-resident scan + scalar reduce,
    which isolates compute), these timings INCLUDE host→device input
    placement and the full predicted-frames fetch — the latency a serving
    deployment actually observes per request. Both paths execute the same
    program (``infer.rollout_scan`` is the single rollout body), so their
    delta isolates ``jax.export`` artifact overhead, expected ≈ 0.
    """
    import os
    import tempfile

    from action_conditioned_gans_tpu.aot import AotPredictor, export_stablehlo
    from action_conditioned_gans_tpu.infer import Predictor
    from action_conditioned_gans_tpu.models import Generator

    m = cfg.model
    b = batch or cfg.train.batch_size
    t = rollout or max(cfg.train.rollout_length, 1)
    gen = Generator(m)
    kf, ka, ks, kp = jax.random.split(jax.random.PRNGKey(0), 4)
    frame0 = np.asarray(
        jnp.tanh(
            jax.random.normal(
                kf, (b, m.image_size, m.image_size, m.image_channels), jnp.float32
            )
        )
    )
    actions = np.asarray(jax.random.normal(ka, (b, t, m.action_dim), jnp.float32))
    states = (
        np.asarray(jax.random.normal(ks, (b, t, m.state_dim), jnp.float32))
        if m.state_dim
        else None
    )
    params = gen.init(
        kp,
        jnp.asarray(frame0),
        jnp.asarray(actions[:, 0]),
        jnp.asarray(states[:, 0]) if states is not None else None,
    )["params"]

    live = Predictor(cfg, params)

    def timeit(call) -> float:
        np.asarray(call())  # compile + warm (full fetch = the barrier)

        def window() -> float:
            t0 = time.perf_counter()
            for _ in range(calls_per_window):
                out = np.asarray(call())
            el = time.perf_counter() - t0
            del out
            return el / calls_per_window

        window()  # extra warm window
        return float(np.percentile([window() for _ in range(windows)], 50))

    out: Dict[str, float] = {
        "config": cfg.name,
        "image_size": m.image_size,
        "batch_size": b,
        "rollout_length": t,
        "device": jax.devices()[0].device_kind,
    }
    live_s = timeit(lambda: live.rollout(frame0, actions, states))
    out["serving_live_ms"] = live_s * 1e3
    out["serving_live_fps"] = b * t / live_s

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "gen.aot")
        meta = export_stablehlo(cfg, params, path, rollout_length=t)
        out["artifact_bytes"] = meta["bytes"]
        aot = AotPredictor(path)
        aot_s = timeit(lambda: aot.rollout(frame0, actions, states))
    out["serving_aot_ms"] = aot_s * 1e3
    out["serving_aot_fps"] = b * t / aot_s
    out["aot_overhead_pct"] = (aot_s / live_s - 1.0) * 100.0
    return out


def run_bench(cfg: Config, steps: int = 30, warmup: int = 5) -> Dict[str, float]:
    spc = max(cfg.train.steps_per_call, 1)
    mesh, state, step_fn = build_step_and_state(cfg)
    dataset = make_dataset(cfg, out_shardings=batch_shardings(cfg, mesh), stack=spc)
    rng = jax.random.PRNGKey(0)

    batch = dataset.batch_at(0)
    # Compile once (timed separately) and grab the cost analysis.
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, rng)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0

    # FLOP numerators, both reported (VERDICT r1: the cost model alone is
    # dishonest). The *analytic* count walks the step's jaxpr and prices each
    # conv/matmul by real arithmetic only (transpose/dilated convs WITHOUT
    # their inserted zeros) — this is the number the roofline target is
    # judged against. XLA's cost-analysis count is kept alongside for
    # cross-round comparability; it over-prices lhs-dilated convs and can
    # exceed the hardware peak. Both are computed on the XLA-backend step:
    # the pallas path's cost analysis double-counts (CostEstimate + the
    # custom-VJP XLA grads), and the model math is identical across backends.
    flops = analytic_flops = None
    try:
        if cfg.model.backend == "xla":
            count_step, count_state = step_fn, state
        else:
            xcfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, backend="xla")
            )
            _, count_state, count_step = build_step_and_state(xcfg, mesh=mesh)
        flops = step_cost_flops(count_step.lower(count_state, batch, rng).compile())
        analytic_flops, matmul_time_floor = analytic_matmul_cost(
            count_step,
            count_state,
            batch,
            rng,
            peak_flops=_PEAK_FLOPS[_device_key()],
            hbm_bw=_HBM_BW[_device_key()],
        )
    except Exception:
        matmul_time_floor = None

    for i in range(1, warmup):
        state, metrics = step_fn(state, dataset.batch_at(i), rng)
    jax.block_until_ready(metrics)

    # Timing methodology: windowed throughput ending in a HOST
    # MATERIALIZATION. On remote/tunneled PJRT platforms (axon), both
    # per-step AND windowed block_until_ready can return before the device
    # drains (observed: a 155 ms step "blocking" in 2 ms) — buffer-readiness
    # events are not a completion barrier there. Reading an actual output
    # value back to the host is: the window timer queues N steps and ends
    # with a scalar device_get. Any still-hidden tail lands in the next
    # window, so across 3 windows the p50 cannot under-report.
    #
    # The dispatch->device_get round trip itself costs a FIXED ~26 ms on the
    # tunnel (measured r2; a pure device_get of fetched data is ~20 us), so
    # the window subtracts a measured empty-round-trip constant — without
    # this every window over-reports by rt/(n_calls*spc) per step.
    k = min(4, steps)
    cached = [dataset.batch_at(warmup + i) for i in range(k)]
    jax.block_until_ready(cached)

    rt = _round_trip_s()

    def window(n_calls: int) -> float:
        """Per-STEP latency over a window of n_calls dispatches."""
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(n_calls):
            state, m = step_fn(state, cached[i % k], rng)
        float(jax.device_get(m["d_loss"]))  # true completion barrier
        jax.block_until_ready(state)
        elapsed = time.perf_counter() - t0
        # Never subtract below half the raw reading (guards tiny-rt hosts).
        return max(elapsed - rt, elapsed * 0.5) / (n_calls * spc)

    window(max(2, steps // 4))  # extra warm window
    lat = np.array([window(max(steps // 3, 2)) for _ in range(3)])
    p50 = float(np.percentile(lat, 50))
    n_chips = mesh.size
    frames_per_step = cfg.train.batch_size * max(cfg.train.rollout_length, 1)
    fps_chip = frames_per_step / p50 / n_chips

    out = {
        "config": cfg.name,
        "image_size": cfg.model.image_size,
        "batch_size": cfg.train.batch_size,
        "rollout_length": cfg.train.rollout_length,
        "steps_per_call": spc,
        "num_chips": n_chips,
        "p50_step_latency_ms": p50 * 1e3,
        "p90_step_latency_ms": float(np.percentile(lat, 90)) * 1e3,
        "barrier_round_trip_ms": rt * 1e3,
        "frames_per_sec_per_chip": fps_chip,
        "compile_s": compile_s,
        "device": jax.devices()[0].device_kind,
    }
    peak = _device_peak_flops()
    if analytic_flops:
        # Per-dispatch FLOPs -> per-step (steps_per_call fused steps/dispatch
        # are already amortized in p50 because window() divides by spc, and
        # analytic_matmul_cost counts the whole k-step scan — so divide).
        per_step = analytic_flops / spc
        achieved_a = per_step / p50 / n_chips
        out["step_tflops_analytic"] = per_step / 1e12
        out["achieved_tflops_per_chip_analytic"] = achieved_a / 1e12
        out["roofline_utilization_analytic"] = achieved_a / peak
        if matmul_time_floor:
            # Ceiling: every conv/matmul at per-op roofline speed (HBM-bound
            # ops cannot exceed bandwidth, so 100% MXU util is unreachable
            # for this model no matter the kernels). Elementwise traffic is
            # excluded — the true floor is higher, ceiling lower.
            ceiling = (analytic_flops / matmul_time_floor) / peak
            out["roofline_ceiling_utilization"] = ceiling
            out["utilization_vs_ceiling"] = out["roofline_utilization_analytic"] / ceiling
    if flops:
        achieved = flops / p50 / n_chips
        out["step_tflops"] = flops / 1e12
        out["achieved_tflops_per_chip"] = achieved / 1e12
        # CAVEAT: XLA's cost model over-counts lhs-dilated (transpose) convs
        # — it prices the inserted zeros — so this can exceed 1.0. Kept only
        # for cross-round comparability; judge against the analytic number.
        out["roofline_utilization"] = achieved / peak
    return out
