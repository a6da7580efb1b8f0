"""Host-side training loop (SURVEY.md §3 row 7, rebuilt).

The reference's Session loop alternates two ``sess.run`` dispatches and
periodically writes summaries/checkpoints. Here the host loop is thin: every
iteration launches ONE pre-compiled fused G+D step on device-resident data
(async dispatch — the host never blocks except at metric/log boundaries),
plus orbax checkpointing and metric/latency accounting.
"""

from __future__ import annotations

import os
import signal
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.data import make_dataset
from action_conditioned_gans_tpu.parallel import make_dp_train_step, make_gspmd_train_step, make_mesh
from action_conditioned_gans_tpu.train.state import (
    TrainState,
    init_state,
    param_count,
    restore_state,
)
from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager
from action_conditioned_gans_tpu.utils.metrics import MetricWriter


def place_state_global(state, mesh):
    """Place a host-resident or committed TrainState over the global mesh
    with the shardings the compiled step expects: the GSPMD state shardings
    when a TP (model) axis exists — multi-controller jit refuses to reshard
    committed arrays, so a replicated placement would be rejected against
    the P('model') in_shardings (caught by the dp2xtp2 multihost test) —
    replicated otherwise. Goes through a host round-trip so it is valid on
    every controller of a multi-process run."""
    state = jax.tree_util.tree_map(np.asarray, state)
    if mesh.shape[mesh.axis_names[1]] > 1:
        from action_conditioned_gans_tpu.parallel.gspmd import state_shardings

        return jax.device_put(state, state_shardings(state, mesh))
    return jax.device_put(state, NamedSharding(mesh, P()))


def build_step_and_state(cfg: Config, mesh=None):
    """Shared setup for train/bench: mesh, initial state, compiled fused step.

    Model-axis > 1 uses the GSPMD dp x tp path; otherwise the explicit
    shard_map DP path (also correct for a single device: mesh (1, 1)).
    """
    mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
    if mesh.shape[mesh.axis_names[1]] > 1 and cfg.model.backend == "pallas":
        # GSPMD has no partitioning rules for pallas_call: under tensor
        # parallelism the fused kernels would be replicated per shard rather
        # than channel-partitioned. Fall back to the XLA ops, which GSPMD
        # shards correctly (docs/ARCHITECTURE.md parallelism table).
        import dataclasses

        print("[acgan] model-parallel mesh: forcing backend=xla (pallas kernels are DP-only)")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backend="xla")
        )
    state = init_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    if jax.process_count() > 1:
        # Multi-controller: jit inputs must be GLOBAL arrays. init_state's
        # leaves are committed to this process's device 0; re-place them
        # (identical on every process — same seed) over the global mesh.
        state = place_state_global(state, mesh)
    if mesh.shape[mesh.axis_names[1]] > 1:
        step_fn = make_gspmd_train_step(cfg, mesh, state)
    else:
        step_fn = make_dp_train_step(cfg, mesh)
    return mesh, state, step_fn


def batch_shardings(cfg: Config, mesh, with_state: bool = True):
    """NamedSharding pytree for the clip batch: batch dim over 'data' (the
    leading steps_per_call axis, when present, is unsharded)."""
    from action_conditioned_gans_tpu.parallel.mesh import batch_pspec

    s = NamedSharding(mesh, batch_pspec(mesh, cfg.train.steps_per_call > 1))
    out = {"frames": s, "actions": s}
    if with_state:
        out["states"] = s
    return out


def train(
    cfg: Config,
    max_steps: Optional[int] = None,
    resume: bool = True,
    workdir: Optional[str] = None,
    profile_steps: int = 0,
) -> TrainState:
    """Run training. ``profile_steps`` > 0 captures a jax.profiler device
    trace of that many steps (after warmup) into <workdir>/profile for
    XProf/Perfetto (SURVEY.md §6 tracing)."""
    workdir = workdir or cfg.workdir
    os.makedirs(workdir, exist_ok=True)
    t = cfg.train
    if t.debug_nans:
        jax.config.update("jax_debug_nans", True)
    total = max_steps if max_steps is not None else t.total_steps

    mesh, state, step_fn = build_step_and_state(cfg)
    g_n, d_n = param_count(state)
    print(f"[acgan] {cfg.name}: G params {g_n:,} | D params {d_n:,} | mesh {dict(mesh.shape)}")

    ckpt = CheckpointManager(
        os.path.join(workdir, "checkpoints"), keep=t.checkpoint_keep
    )
    start = 0
    if resume and ckpt.latest_step() is not None:
        # Tolerant of EMA-presence mismatches between the checkpoint and the
        # current config (turning ema_decay on/off across a resume), then
        # re-placed over the mesh with the step's expected shardings
        # (TP-sharded when a model axis exists — the resume path previously
        # replicated unconditionally, which multi-controller TP jit rejects).
        state = restore_state(cfg, ckpt, template=state)
        state = place_state_global(state, mesh)
        start = int(np.asarray(state.step))
        print(f"[acgan] resumed from checkpoint at step {start}")

    k = max(t.steps_per_call, 1)
    # Multi-host: each process reads a disjoint file shard and its share of
    # the global batch; data.pipeline.place_batch assembles the global array
    # (synthetic data is generated under jit and is inherently global).
    # start_call fast-forwards streaming file sources across a resume
    # (synthetic batches are index-addressed by the call counter directly).
    dataset = make_dataset(
        cfg,
        out_shardings=batch_shardings(cfg, mesh),
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        stack=k,
        start_call=start // k,
    )
    writer = MetricWriter(os.path.join(workdir, "tb"))
    rng = jax.random.PRNGKey(t.seed + 1)

    # Preemption handling (SURVEY.md §6): TPU VMs get SIGTERM before
    # reclamation; checkpoint-and-exit so the next incarnation resumes.
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

    # Periodic held-out sampling -> eval scalars + TensorBoard image
    # summaries (the reference's periodic image summaries, SURVEY.md §6).
    # The held-out stream comes from the CONFIGURED data source (ADVICE r1:
    # evaluating synthetic clips while training on BAIR TFRecords made the
    # eval scalars misleading); synthetic held-out clips are seeded
    # disjointly from the training stream inside held_out_batches.
    sample_fn = None
    held_out = None
    held_out_stream = None

    def write_samples(step_idx: int) -> None:
        nonlocal sample_fn, held_out, held_out_stream
        from action_conditioned_gans_tpu.train.sample import (
            eval_metrics,
            held_out_batches,
            make_rollout_fn,
        )

        horizon = max(t.rollout_length, 1)
        if sample_fn is None:
            sample_fn = make_rollout_fn(cfg)
            # ONE fixed held-out batch, evaluated at every cadence boundary:
            # the logged eval_* scalars then move only with the model, not
            # with batch-sampling noise (a min(8,B)-clip eval re-drawn each
            # time would swamp the trend), and successive TB image
            # summaries show the same clips evolving. The stream handle is
            # kept so the finally-block can close its file-source
            # Prefetcher.
            held_out_stream = held_out_batches(
                cfg, min(8, t.batch_size), horizon, t.seed + 7919
            )
            held_out = next(held_out_stream)
        preds = sample_fn(state.g_params, held_out, jax.random.PRNGKey(0))
        em = eval_metrics(preds, held_out["frames"][:, 1:])
        if t.ema_decay > 0 and state.g_ema is not None:
            # Also roll out the EMA weights — the set sampling/serving uses
            # (--ema, Predictor(use_ema=True)) — so the TB trend tracks the
            # served model, not just the raw params (VERDICT r2 weak 5: EMA
            # was measured +3.2 dB but the logged curves ignored it).
            ema_preds = sample_fn(state.g_ema, held_out, jax.random.PRNGKey(0))
            em.update(
                {
                    f"{k}_ema": v
                    for k, v in eval_metrics(
                        ema_preds, held_out["frames"][:, 1:]
                    ).items()
                }
            )
            writer.write_images(
                step_idx, "pred_final_frame_ema", np.asarray(ema_preds[:, -1])
            )
        writer.write(step_idx, em)
        writer.write_images(step_idx, "pred_final_frame", np.asarray(preds[:, -1]))
        writer.write_images(
            step_idx, "gt_final_frame", np.asarray(held_out["frames"][:, -1])
        )

    # The profiler window is evaluated at k-step dispatch boundaries only.
    # 3 warmup dispatches keep compile + cache-warm out of the trace, but a
    # short run must still capture SOMETHING: clamp the warmup so at least
    # one traced dispatch fits before `total` (r5: config3's k=32 with
    # --steps 40 put profile_start at 96 and silently captured nothing).
    profile_start = -1
    if profile_steps > 0 and total > start:
        last_dispatch_top = start + ((total - start - 1) // k) * k
        warmup = 3 * k
        if start + warmup > last_dispatch_top:
            warmup = last_dispatch_top - start
            print(
                f"[acgan] profile warmup clamped to {warmup} step(s): the run "
                f"is too short for the 3x{k}-step warmup; expect compile/"
                "warmup noise in the trace (raise --steps or lower "
                "train.steps_per_call for a clean window)"
            )
        profile_start = start + warmup
    profile_stop = -1
    trace_open = False

    def crossed(before: int, after: int, every: int) -> bool:
        return every > 0 and (after // every) > (before // every)

    # When an lr schedule is active, stamp the effective lrs into each log
    # line. lr_value is PURE PYTHON — evaluating the optax schedule here
    # would dispatch tiny jnp programs on the default (TPU) backend, an
    # ad-hoc compile that can hang while the tunnel helper is wedged
    # (CLAUDE.md rule 6). D's within-step sub-updates (disc_steps > 1) span
    # a fraction of one train step's horizon; the logged value is the
    # train-step-boundary one.
    from action_conditioned_gans_tpu.train.state import lr_value

    schedule_on = not (t.warmup_steps == 0 and t.lr_schedule == "constant")

    def lr_metrics(step_done: int) -> dict:
        if not schedule_on:
            return {}
        # The schedule counter is the number of COMPLETED optimizer updates
        # when the step ran; the last step in this call used step_done - 1.
        return {
            "g_lr": lr_value(t, t.g_lr, step_done - 1),
            "d_lr": lr_value(t, t.d_lr, step_done - 1),
        }

    metrics = {}
    call = start // k  # keeps the synthetic stream aligned across resume
    done = start
    try:
        while done < total:
            if profile_start >= 0 and done >= profile_start:
                tracedir = os.path.join(workdir, "profile")
                print(f"[acgan] capturing {profile_steps}-step trace -> {tracedir}")
                jax.block_until_ready(jax.tree_util.tree_leaves(state.g_params)[0])
                jax.profiler.start_trace(tracedir)
                trace_open = True
                profile_start, profile_stop = -1, done + profile_steps
            if profile_stop >= 0 and done >= profile_stop:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                trace_open = False
                profile_stop = -1
                print("[acgan] trace captured")
            batch = dataset.batch_at(call)
            state, metrics = step_fn(state, batch, rng)
            before, done = done, done + k
            call += 1
            if crossed(before, done, t.log_every) or before == start:
                # Block on metrics only at log boundaries; keeps dispatch async.
                writer.write(done, {**jax.device_get(metrics), **lr_metrics(done)})
            writer.tick()
            if crossed(before, done, t.checkpoint_every):
                ckpt.save(done, jax.device_get(state))
            if crossed(before, done, t.sample_every):
                write_samples(done)
            if preempted["flag"]:
                print(f"[acgan] SIGTERM received: checkpointing at step {done} and exiting")
                ckpt.save(done, jax.device_get(state), force=True)
                break
        total = done
    finally:
        if trace_open:
            # The loop can exit (end-of-run, SIGTERM, exception) with the
            # window still open — e.g. profile_stop landed past `total`.
            # Flush rather than drop the capture.
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print("[acgan] trace captured (flushed at loop exit)")
        signal.signal(signal.SIGTERM, prev_handler)
        dataset_close = getattr(dataset, "close", None)
        if dataset_close is not None:
            dataset_close()
        if held_out_stream is not None:
            held_out_stream.close()  # drops any file-source Prefetcher it holds

    if total > start and ckpt.latest_step() != total:
        ckpt.save(total, jax.device_get(state), force=True)
    ckpt.wait()
    p50 = writer.p50_latency()
    if p50:
        fps = writer.frames_per_sec(
            t.batch_size * max(t.rollout_length, 1) * k, num_chips=mesh.size
        )
        # Ticks are taken right after ASYNC dispatch; on the tunneled TPU a
        # readiness event is not a completion barrier (CLAUDE.md rule 1), so
        # this is host dispatch cadence, not device step latency. True-barrier
        # numbers come from `acgan bench` / bench.py only (ADVICE r1).
        print(
            f"[acgan] p50 dispatch cadence {p50 * 1e3:.2f} ms "
            f"({k} step(s)/call) | ~{fps:.1f} frames/sec/chip "
            "(dispatch-cadence estimate; use `bench` for true-barrier perf)"
        )
    return state
