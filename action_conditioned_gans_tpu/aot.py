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
_ROLLOUT = "rollout.jaxexport"


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
    ``rollout_length > 0`` additionally exports a T-step autoregressive
    rollout program (T is static — ``lax.scan`` length is part of the
    program; export one artifact per serving horizon or use ``predict``
    loops host-side for variable T).

    Returns the ``meta.json`` dict (shapes, platforms, sizes).
    """
    m = cfg.model
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
        "rollout_length": int(rollout_length),
        "predict_in": [str(s.shape) for s in args],
        "jax_version": jax.__version__,
    }

    exp_rollout = None
    if rollout_length > 0:
        # The rollout reuses the SAME symbolic scope as `b` above so the
        # batch dims unify; T is concrete.
        rargs = (
            frame,
            jax.ShapeDtypeStruct((b, rollout_length, m.action_dim), jnp.float32),
        )
        if m.state_dim > 0:
            rargs += (
                jax.ShapeDtypeStruct(
                    (b, rollout_length, m.state_dim), jnp.float32
                ),
            )
        exp_rollout = jax.export.export(
            jax.jit(_rollout_fn(cfg, g_params)), platforms=list(platforms)
        )(*rargs)
        meta["rollout_in"] = [str(s.shape) for s in rargs]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_PREDICT, exp_predict.serialize())
        if exp_rollout is not None:
            z.writestr(_ROLLOUT, exp_rollout.serialize())
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
            self._rollout = (
                jax.jit(jax.export.deserialize(z.read(_ROLLOUT)).call)
                if _ROLLOUT in z.namelist()
                else None
            )
        self.state_dim = int(self.meta["state_dim"])
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
        """Autoregressive rollout at the exported horizon."""
        if self._rollout is None:
            raise ValueError(
                "artifact has no rollout program (export with rollout_length > 0)"
            )
        if actions.shape[1] != self.rollout_length:
            raise ValueError(
                f"artifact rollout horizon is {self.rollout_length}, "
                f"got actions with T={actions.shape[1]}"
            )
        if states is not None and states.shape[1] != self.rollout_length:
            raise ValueError(
                f"artifact rollout horizon is {self.rollout_length}, "
                f"got states with T={states.shape[1]}"
            )
        return self._rollout(*self._args(frame0, actions, state=states))
