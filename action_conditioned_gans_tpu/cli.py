"""CLI entry point (SURVEY.md §2 row 1): ``acgan train|sample|eval|bench``.

Replaces the reference's ``python main.py --flags`` with subcommands over
the typed preset configs; any scalar config field can be overridden with
``--set section.field=value``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import List

from action_conditioned_gans_tpu.config import Config, get_preset


def _coerce(old, raw: str):
    if isinstance(old, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    return raw


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """--set train.batch_size=16 --set model.image_size=128 ..."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not raw:
            raise ValueError(f"override {ov!r} must be section.field=value")
        parts = key.split(".")
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{parts[0]: _coerce(getattr(cfg, parts[0]), raw)})
            continue
        if len(parts) != 2:
            raise ValueError(f"override key {key!r} must be section.field")
        section, field = parts
        sub = getattr(cfg, section)
        new_sub = dataclasses.replace(sub, **{field: _coerce(getattr(sub, field), raw)})
        cfg = dataclasses.replace(cfg, **{section: new_sub})
    return cfg


def _rollout_lengths(raw: str):
    """--rollout-length value: 'T' or 'T1,T2,...' -> list of horizons."""
    try:
        out = [int(x) for x in raw.split(",") if x.strip()]
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"{raw!r} is not an int or comma-list of ints"
        )
    if any(t < 0 for t in out):
        raise argparse.ArgumentTypeError(f"negative horizon in {raw!r}")
    return [t for t in out if t > 0]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="acgan", description=__doc__)
    p.add_argument(
        "command",
        choices=[
            "train",
            "sample",
            "eval",
            "export",
            "bench",
            "configs",
            "make-data",
            "profile-report",
            "doctor",
            "serve",
        ],
    )
    p.add_argument("--preset", default="config1", help="BASELINE.json preset name")
    p.add_argument("--workdir", default=None)
    p.add_argument("--steps", type=int, default=None, help="override total steps")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--out",
        default=None,
        help="sample/make-data/export output path; for profile-report, the "
        "INPUT trace dir (defaults to <workdir>/profile)",
    )
    p.add_argument("--num-clips", type=int, default=8)
    p.add_argument(
        "--ema",
        action="store_true",
        help="sample/eval with the EMA generator weights (needs a checkpoint "
        "trained with train.ema_decay > 0)",
    )
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="SEC.FIELD=VAL",
        help="config override, repeatable",
    )
    p.add_argument(
        "--top",
        type=int,
        default=30,
        help="profile-report: rows to print per view",
    )
    p.add_argument(
        "--json",
        default=None,
        help="profile-report: also write the full per-op rows as JSON",
    )
    p.add_argument(
        "--probe-timeout",
        type=int,
        default=120,
        help="doctor: seconds before the subprocess device probe is "
        "declared hung",
    )
    p.add_argument(
        "--platform",
        default=None,
        help="doctor: force a jax platform inside the probe subprocess "
        "(e.g. 'cpu'; default probes the environment's own platform)",
    )
    p.add_argument(
        "--profile-steps",
        type=int,
        default=0,
        help="capture a jax.profiler trace of N training steps into <workdir>/profile",
    )
    p.add_argument(
        "--format",
        choices=["npz", "stablehlo"],
        default="npz",
        help="export: 'npz' = weights+config archive (Predictor.from_npz); "
        "'stablehlo' = self-contained AOT program via jax.export "
        "(aot.AotPredictor — no model code in the serving container)",
    )
    p.add_argument(
        "--rollout-length",
        type=_rollout_lengths,
        default=[],
        metavar="T[,T...]",
        help="export --format stablehlo: also export T-step autoregressive "
        "rollout program(s) — one per comma-separated horizon, bundled in "
        "the one artifact (AotPredictor dispatches on the action length); "
        "0/empty = predict-only",
    )
    p.add_argument(
        "--artifact",
        default=None,
        help="serve: path to an exported artifact — .aot (AOT StableHLO "
        "program, no model code needed) or .npz (portable weights archive); "
        "omitted = restore the latest checkpoint from --workdir",
    )
    p.add_argument(
        "--host",
        default="127.0.0.1",
        help="serve: bind address (default loopback only)",
    )
    p.add_argument(
        "--port", type=int, default=8700, help="serve: TCP port (0 = any free)"
    )
    p.add_argument(
        "--multihost",
        action="store_true",
        help="initialize the multi-host JAX runtime (jax.distributed) — run "
        "the same command on every host of the pod (config 5, v5e-16)",
    )
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    # Opt-in persistent XLA compile cache (ACGAN_COMPILE_CACHE_DIR); must be
    # configured before the first jit of any subcommand.
    from action_conditioned_gans_tpu.utils.compile_cache import (
        maybe_enable_compile_cache,
    )

    maybe_enable_compile_cache()
    if args.command == "profile-report":
        # Analyze a `train --profile-steps N` trace: per-op roofline-gap
        # table + per-step group summary (no TPU needed — pure proto parse).
        from action_conditioned_gans_tpu.utils.xplane import (
            load_xspace,
            plane_summaries,
            print_summary,
        )

        trace_dir = args.out or (
            f"{args.workdir}/profile" if args.workdir else None
        )
        if not trace_dir:
            parser.error("profile-report needs --out <trace_dir> or --workdir")
        try:
            xs = load_xspace(trace_dir)
        except FileNotFoundError as e:
            parser.error(
                f"{e} — capture one first with "
                "`acgan train --profile-steps N --workdir <dir>`"
            )
        summaries = plane_summaries(xs, top_n=args.top)
        if not summaries:
            print(
                "no '/device:*' plane with an 'XLA Ops' line in this trace — "
                "capture it on TPU (`acgan train --profile-steps N`)"
            )
            return 1
        for s in summaries:
            print_summary(s, args.top)
        if args.json:
            payload = [
                {
                    "plane": s.plane,
                    "steps_per_dispatch": s.steps_per_dispatch,
                    "op_sum_us": s.op_sum_us,
                    "roof_sum_us": s.roof_sum_us,
                    "group_us": s.group_us,
                    "group_roof_us": s.group_roof_us,
                    "rows": [dataclasses.asdict(r) for r in s.rows],
                }
                for s in summaries
            ]
            with open(args.json, "w") as f:
                json.dump(payload, f, indent=1)
            print(f"[acgan] wrote {args.json}")
        return 0

    if args.command == "doctor":
        # Environment diagnosis WITHOUT touching devices in this process:
        # on the tunneled TPU platform a wedged helper makes any in-process
        # jax call hang unrecoverably, so all device checks run in
        # subprocesses with timeouts (utils/doctor.py).
        from action_conditioned_gans_tpu.utils.doctor import run_doctor

        cfg = get_preset(args.preset)
        if args.workdir:
            cfg = dataclasses.replace(cfg, workdir=args.workdir)
        cfg = apply_overrides(cfg, args.overrides)
        report = run_doctor(
            cfg, probe_timeout=args.probe_timeout, platform=args.platform
        )
        print(json.dumps(report, indent=1))
        return 0 if report["ok"] else 1

    if args.command == "configs":
        from action_conditioned_gans_tpu.config import PRESETS

        for name, c in PRESETS.items():
            print(
                f"{name}: {c.model.image_size}px T={c.train.rollout_length} "
                f"batch={c.train.batch_size} state_dim={c.model.state_dim} "
                f"ss={c.train.scheduled_sampling}"
            )
        return 0

    if args.multihost:
        # Coordinator/process env comes from the TPU VM metadata (GCE) or
        # JAX_COORDINATOR_ADDRESS et al.; collectives then span hosts over
        # ICI/DCN exactly as they span chips within one host.
        import jax

        jax.distributed.initialize()

    cfg = get_preset(args.preset)
    if args.workdir:
        cfg = dataclasses.replace(cfg, workdir=args.workdir)
    cfg = apply_overrides(cfg, args.overrides)

    if args.command == "train":
        from action_conditioned_gans_tpu.train.loop import train

        train(
            cfg,
            max_steps=args.steps,
            resume=not args.no_resume,
            profile_steps=args.profile_steps,
        )
        return 0

    if args.command == "serve":
        # HTTP inference endpoint (serve.py): /healthz, /predict, /rollout
        # over an AOT artifact, an npz archive, or the latest checkpoint.
        from action_conditioned_gans_tpu.serve import build_predictor, serve_forever

        # cfg.workdir always has the /tmp/acgan default, so require an
        # EXPLICIT source: silently restoring whatever stale checkpoint a
        # previous unrelated run left under the default dir is never what
        # the operator meant when standing up a serving endpoint.
        if not args.artifact and not args.workdir:
            parser.error("serve needs --artifact or an explicit --workdir")
        serve_forever(build_predictor(args, cfg), args.host, args.port)
        return 0

    if args.command in ("sample", "eval", "export"):
        if (
            args.command == "export"
            and len(args.rollout_length) > 0
            and args.format != "stablehlo"
        ):
            # Pure-argument validation — refuse BEFORE the (potentially
            # minutes-long) checkpoint restore below. Silently writing an
            # npz (which has no rollout program) would deploy an artifact
            # missing the horizon the user asked for.
            parser.error(
                "--rollout-length requires --format stablehlo "
                "(the npz archive holds weights, not programs)"
            )
        import jax

        from action_conditioned_gans_tpu.train.sample import evaluate, sample
        from action_conditioned_gans_tpu.train.state import init_state
        from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager

        if args.ema and cfg.train.ema_decay <= 0:
            # The restore template must CONTAIN a g_ema subtree to receive
            # the checkpoint's EMA weights — force it on so `--ema` works
            # without re-passing the training-time ema_decay override.
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999)
            )
        state = init_state(cfg, jax.random.PRNGKey(cfg.train.seed))
        ckpt = CheckpointManager(f"{cfg.workdir}/checkpoints")
        if ckpt.latest_step() is not None:
            if args.ema:
                # Strict: the checkpoint must actually carry EMA weights.
                try:
                    state = ckpt.restore(state)
                except Exception as e:
                    parser.error(
                        "--ema needs a checkpoint trained with "
                        f"train.ema_decay > 0 (restore failed: {e})"
                    )
            else:
                # Lenient: an EMA-carrying checkpoint still raw-samples
                # under a plain preset (structure reconciled to the config).
                from action_conditioned_gans_tpu.train.state import restore_state

                state = restore_state(cfg, ckpt, template=state)
            print(f"[acgan] loaded checkpoint step {ckpt.latest_step()}")
        elif args.ema or args.command == "export":
            # Without a checkpoint the forced ema_decay would seed g_ema
            # from the INIT params and silently sample untrained weights
            # (ADVICE r2); likewise exporting init weights as a serving
            # artifact is never what the user meant.
            parser.error(
                f"{'--ema' if args.ema else 'export'} needs a checkpoint "
                f"under {cfg.workdir}/checkpoints (none found)"
            )
        else:
            print("[acgan] WARNING: no checkpoint found; sampling from init")
        if args.ema:
            if state.g_ema is None:
                parser.error("--ema needs a checkpoint trained with train.ema_decay > 0")
            state = state.replace(g_params=state.g_ema)
        if args.command == "export":
            if args.format == "stablehlo":
                # Self-contained AOT program (weights baked in, symbolic
                # batch, cpu+tpu lowerings): loads with jax alone via
                # aot.AotPredictor — not even the model code ships.
                from action_conditioned_gans_tpu.aot import export_stablehlo

                out = args.out or f"{cfg.workdir}/generator.aot"
                meta = export_stablehlo(
                    cfg, state.g_params, out, rollout_length=args.rollout_length
                )
                print(
                    json.dumps(
                        {
                            "exported": out,
                            "ema": bool(args.ema),
                            "format": "stablehlo",
                            "platforms": meta["platforms"],
                            "rollout_lengths": meta["rollout_lengths"],
                            "bytes": meta["bytes"],
                        }
                    )
                )
                return 0
            # Portable serving artifact: generator weights + embedded
            # ModelConfig as one .npz (loads with numpy alone via
            # Predictor.from_npz — no orbax/TF in the serving container).
            from action_conditioned_gans_tpu.infer import export_generator

            out = args.out or f"{cfg.workdir}/generator.npz"
            export_generator(cfg, state.g_params, out)
            print(json.dumps({"exported": out, "ema": bool(args.ema)}))
            return 0
        if args.command == "sample":
            out = args.out or f"{cfg.workdir}/samples"
            metrics = sample(cfg, state, out, num_clips=args.num_clips)
        else:
            metrics = evaluate(cfg, state)
        print(json.dumps(metrics))
        return 0

    if args.command == "bench":
        from action_conditioned_gans_tpu.bench import run_bench

        print(json.dumps(run_bench(cfg, steps=args.steps or 30)))
        return 0

    if args.command == "make-data":
        # Materialize seeded synthetic pushing clips as BAIR-schema
        # TFRecords (native TF-free writer) so the tfrecord input paths can
        # be exercised end-to-end without the real dataset.
        import jax
        import numpy as np

        from action_conditioned_gans_tpu.data import generate_clips
        from action_conditioned_gans_tpu.data.native_tfrecord import (
            write_clips_tfrecord_native,
        )

        out = args.out or f"{cfg.workdir}/data/clips.tfrecord"
        n = args.num_clips
        d, m = cfg.data, cfg.model
        batch = generate_clips(
            jax.random.PRNGKey(cfg.train.seed),
            n,
            d.clip_len,
            m.image_size,
            m.action_dim,
        )
        frames = np.asarray(batch["frames"])
        # Pad per-timestep actions/states to clip_len (last row zeros): the
        # BAIR schema stores one feature set per FRAME.
        def pad_t(x):
            x = np.asarray(x)
            return np.concatenate([x, np.zeros_like(x[:, :1])], axis=1)

        write_clips_tfrecord_native(
            out, frames, pad_t(batch["actions"]), pad_t(batch["states"])
        )
        print(json.dumps({"written": out, "clips": n, "clip_len": d.clip_len}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
