"""Ahead-of-time compiled serving artifacts (StableHLO via ``jax.export``).

The reference's deployment story stops at TF ``Saver`` checkpoints restored
into a Python process that rebuilds the graph (SURVEY.md §4.4); the rebuild
already ships the dependency-light ``.npz`` route (``infer.export_generator``
/ ``Predictor.from_npz`` — weights + config, model code required). This
module is the step beyond: the generator FUNCTION itself, lowered to
StableHLO and serialized with the weights baked in as constants, so a
serving container needs **no model code at all** — only jax — and cannot
drift from the training-time architecture (the artifact IS the program).

TPU-native properties:

* **Cross-platform lowering** — ``platforms=("cpu", "tpu")`` lowers one
  artifact loadable on either backend, so a CPU CI host can produce the TPU
  serving artifact (no chip needed at export time; XLA consumes the same
  StableHLO on both).
* **Symbolic batch** — the batch dimension is exported as a symbolic
  dimension (``jax.export.symbolic_shape``), so one artifact serves any
  batch size; XLA specializes at call time (each concrete batch compiles
  once, like any jit).
* **Versioned, stable serialization** — ``jax.export`` writes a versioned
  calling convention; artifacts outlive the exporting process and survive
  jax upgrades within the documented compatibility window.

Format: a zip archive holding ``predict.jaxexport`` (single-step generator),
optionally ``rollout.jaxexport`` (T-step autoregressive ``lax.scan``,
T fixed at export), and ``meta.json`` (ModelConfig + shapes + platforms).

Usage::

    from action_conditioned_gans_tpu.aot import export_stablehlo, AotPredictor
    export_stablehlo(cfg, g_params, "/path/generator.aot", rollout_length=10)
    p = AotPredictor("/path/generator.aot")       # no package needed beyond jax
    nxt  = p.predict(frame, action)               # any batch size
    clip = p.rollout(frame0, actions)             # (B,H,W,C),(B,T,A) -> (B,T,H,W,C)
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import zipfile

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1
_META = "meta.json"
_PREDICT = "predict.jaxexport"
# Legacy single-horizon member name (artifacts exported before multi-horizon
# support); new artifacts write one member per horizon via _ROLLOUT_T.
_ROLLOUT = "rollout.jaxexport"
_ROLLOUT_T = "rollout_T{t}.jaxexport"


def _predict_fn(cfg, g_params):
    """Single-step generator with the weights closed over (constants)."""
    from action_conditioned_gans_tpu.models import Generator

    gen = Generator(cfg.model)
    if cfg.model.state_dim > 0:

        def predict(frame, action, state):
            return gen.apply({"params": g_params}, frame, action, state)

    else:

        def predict(frame, action):
            return gen.apply({"params": g_params}, frame, action, None)

    return predict


def _rollout_fn(cfg, g_params):
    """T-step autoregressive rollout (T fixed by the actions shape).

    The scan body is ``infer.rollout_scan`` — the SAME implementation the
    live Predictor serves, so the two paths cannot diverge.
    """
    from action_conditioned_gans_tpu.infer import rollout_scan
    from action_conditioned_gans_tpu.models import Generator

    gen = Generator(cfg.model)

    def apply_fn(prev, action, state):
        return gen.apply({"params": g_params}, prev, action, state)

    if cfg.model.state_dim > 0:

        def rollout(frame0, actions, states):
            return rollout_scan(apply_fn, frame0, actions, states)

    else:

        def rollout(frame0, actions):
            return rollout_scan(apply_fn, frame0, actions, None)

    return rollout


def export_stablehlo(
    cfg,
    g_params,
    path: str,
    *,
    platforms=("cpu", "tpu"),
    rollout_length: int = 0,
) -> dict:
    """Serialize the generator as a self-contained StableHLO artifact.

    ``platforms`` lists every backend the artifact must load on (exported
    once, the module carries per-platform lowerings where they differ).
    ``rollout_length`` additionally exports T-step autoregressive rollout
    programs (T is static — ``lax.scan`` length is part of the program):
    an int for one horizon, or a sequence of ints to bundle SEVERAL
    horizons into the one artifact (one program per T; ``AotPredictor``
    dispatches on the action sequence length). 0 / empty = predict-only.

    Returns the ``meta.json`` dict (shapes, platforms, sizes).
    """
    m = cfg.model
    horizons = (
        [int(rollout_length)] if isinstance(rollout_length, int) else
        sorted({int(x) for x in rollout_length})
    )
    horizons = [t for t in horizons if t > 0]
    if any(t < 0 for t in ([rollout_length] if isinstance(rollout_length, int) else rollout_length)):
        raise ValueError(f"negative rollout_length in {rollout_length!r}")
    # Weights are baked in as f32 constants; inputs are f32 (the generator
    # casts to its compute_dtype internally, same as the live Predictor).
    g_params = jax.device_get(g_params)

    (b,) = jax.export.symbolic_shape("b")
    frame = jax.ShapeDtypeStruct((b, m.image_size, m.image_size, m.image_channels), jnp.float32)
    action = jax.ShapeDtypeStruct((b, m.action_dim), jnp.float32)

    args = (frame, action)
    if m.state_dim > 0:
        args += (jax.ShapeDtypeStruct((b, m.state_dim), jnp.float32),)
    exp_predict = jax.export.export(
        jax.jit(_predict_fn(cfg, g_params)), platforms=list(platforms)
    )(*args)

    meta = {
        "format_version": FORMAT_VERSION,
        "model_config": dataclasses.asdict(m),
        "platforms": list(platforms),
        "state_dim": m.state_dim,
        # Back-compat display field (max horizon); the full set is
        # rollout_lengths and the loader dispatches on it.
        "rollout_length": max(horizons) if horizons else 0,
        "rollout_lengths": horizons,
        "predict_in": [str(s.shape) for s in args],
        "jax_version": jax.__version__,
    }

    exp_rollouts = {}
    for t_len in horizons:
        # Each rollout reuses the SAME symbolic scope as `b` above so the
        # batch dims unify; T is concrete per program.
        rargs = (
            frame,
            jax.ShapeDtypeStruct((b, t_len, m.action_dim), jnp.float32),
        )
        if m.state_dim > 0:
            rargs += (
                jax.ShapeDtypeStruct((b, t_len, m.state_dim), jnp.float32),
            )
        exp_rollouts[t_len] = jax.export.export(
            jax.jit(_rollout_fn(cfg, g_params)), platforms=list(platforms)
        )(*rargs)
        meta.setdefault("rollout_in", {})[str(t_len)] = [
            str(s.shape) for s in rargs
        ]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_PREDICT, exp_predict.serialize())
        for t_len, exp in exp_rollouts.items():
            z.writestr(_ROLLOUT_T.format(t=t_len), exp.serialize())
        z.writestr(_META, json.dumps(meta, indent=1))
    data = buf.getvalue()
    # Atomic publish: an interrupted export must not leave a truncated zip
    # at the destination for a later AotPredictor to trip over.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    meta["bytes"] = len(data)
    return meta


class AotPredictor:
    """Serve a ``export_stablehlo`` artifact — jax only, no model code.

    ``predict``/``rollout`` mirror the live ``infer.Predictor`` signatures;
    any batch size works (the exported batch dim is symbolic). Each call is
    wrapped in ``jax.jit`` so repeated serving at one batch size hits the
    executable cache (and ``ACGAN_COMPILE_CACHE_DIR`` persists it across
    processes).

    Multi-chip: pass ``mesh`` to shard serving batches over the mesh's
    first axis — GSPMD propagates the sharding through the deserialized
    program and XLA inserts the collectives, same as the live Predictor's
    DP path. (Tensor parallelism is NOT available here: the weights are
    constants inside the program, so they replicate per chip. TP serving
    of a >HBM model is the live ``infer.Predictor(mesh=...)``'s job.)
    """

    def __init__(self, path: str, mesh=None):
        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read(_META).decode())
            if self.meta.get("format_version") != FORMAT_VERSION:
                raise ValueError(
                    f"unsupported artifact format {self.meta.get('format_version')!r} "
                    f"(this loader speaks {FORMAT_VERSION})"
                )
            self._predict = jax.jit(jax.export.deserialize(z.read(_PREDICT)).call)
            # One rollout program per exported horizon (rollout_T{t});
            # legacy single-horizon artifacts stored one member under the
            # old name, keyed by meta["rollout_length"].
            self._rollouts = {}
            for name in z.namelist():
                if name.startswith("rollout_T") and name.endswith(".jaxexport"):
                    t_len = int(name[len("rollout_T") : -len(".jaxexport")])
                    self._rollouts[t_len] = jax.jit(
                        jax.export.deserialize(z.read(name)).call
                    )
            if not self._rollouts and _ROLLOUT in z.namelist():
                self._rollouts[int(self.meta["rollout_length"])] = jax.jit(
                    jax.export.deserialize(z.read(_ROLLOUT)).call
                )
        self.state_dim = int(self.meta["state_dim"])
        self.rollout_lengths = sorted(self._rollouts)
        # Back-compat attribute: the max exported horizon (0 = none).
        self.rollout_length = int(self.meta["rollout_length"])
        self.mesh = mesh

    def _args(self, *arrays, state):
        arrays = tuple(jnp.asarray(a, jnp.float32) for a in arrays)
        if self.state_dim > 0:
            if state is None:
                raise ValueError(
                    f"artifact was exported with state_dim={self.state_dim}; "
                    "pass `state`"
                )
            arrays += (jnp.asarray(state, jnp.float32),)
        elif state is not None:
            raise ValueError("artifact was exported without a state input")
        if self.mesh is not None:
            # Same DP placement (and divisibility contract) as the live
            # Predictor — one implementation, infer.shard_batches.
            from action_conditioned_gans_tpu.infer import shard_batches

            arrays = tuple(shard_batches(self.mesh, *arrays))
        return arrays

    def predict(self, frame, action, state=None):
        """One next-frame prediction — the reference's generator signature."""
        return self._predict(*self._args(frame, action, state=state))

    def rollout(self, frame0, actions, states=None):
        """Autoregressive rollout, dispatched on T to an exported horizon."""
        if not self._rollouts:
            raise ValueError(
                "artifact has no rollout program (export with rollout_length > 0)"
            )
        t_len = actions.shape[1]
        if t_len not in self._rollouts:
            raise ValueError(
                f"artifact rollout horizons are {self.rollout_lengths}, "
                f"got actions with T={t_len}"
            )
        if states is not None and states.shape[1] != t_len:
            raise ValueError(
                f"states horizon T={states.shape[1]} does not match the "
                f"actions horizon T={t_len}"
            )
        return self._rollouts[t_len](*self._args(frame0, actions, state=states))
