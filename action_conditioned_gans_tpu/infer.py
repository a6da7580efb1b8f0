"""Inference / deployment API.

The reference's inference story is ``sess.run(G, feed_dict=...)`` on a
restored checkpoint (SURVEY.md §4.2). The rebuild's equivalent is a small
loadable predictor: restore the latest orbax checkpoint, get back jitted
single-step and autoregressive-rollout functions with the reference's
signatures.

    from action_conditioned_gans_tpu.infer import Predictor
    p = Predictor.from_checkpoint(cfg, "/path/workdir")
    nxt = p.predict(frame, action)            # (B,H,W,C) -> (B,H,W,C)
    clip = p.rollout(frame0, actions)         # (B,H,W,C),(B,T,A) -> (B,T,H,W,C)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.models import Generator
from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager


def export_generator(cfg: Config, g_params, path: str) -> None:
    """Write generator weights as a portable .npz archive (pure numpy — no
    orbax/TF needed to load), with the ModelConfig embedded as JSON so
    ``Predictor.from_npz`` can reconstruct the architecture standalone.

    The reference's deployment artifact is a TF Saver checkpoint loadable
    anywhere TF runs (SURVEY.md §4.4); this is the rebuild's dependency-free
    equivalent for serving containers (pairs with the TF-free native data
    reader)."""
    import json
    import os

    import dataclasses

    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(jax.device_get(g_params))
    arrays = {"/".join(k): np.asarray(v) for k, v in flat.items()}
    if "__model_config__" in arrays:
        raise ValueError("parameter tree collides with the metadata key")
    arrays["__model_config__"] = np.asarray(
        json.dumps(dataclasses.asdict(cfg.model))
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def shard_batches(mesh, *arrays):
    """Shard batch-leading arrays over ``mesh``'s first (data) axis.

    Shared by the live :class:`Predictor` and the AOT
    :class:`~action_conditioned_gans_tpu.aot.AotPredictor` so the DP serving
    contract (divisibility check included) has exactly one implementation.
    ``None`` entries pass through.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = mesh.axis_names[0]
    size = mesh.shape[data_axis]
    sharding = NamedSharding(mesh, P(data_axis))
    placed = []
    for a in arrays:
        if a is None:
            placed.append(None)
            continue
        if a.shape[0] % size != 0:
            raise ValueError(
                f"batch {a.shape[0]} is not divisible by the mesh data "
                f"axis ({size}); pad or resize the batch"
            )
        placed.append(jax.device_put(a, sharding))
    return placed


def rollout_scan(apply_fn, frame0, actions, states=None):
    """Autoregressive rollout: scan ``apply_fn(prev, action, state)`` over T.

    ``actions`` is (B, T, A); ``states`` (B, T, S) or None; returns
    (B, T, H, W, C). The single rollout-body implementation behind both the
    live and the AOT predictor (SURVEY.md §4.2 multi-step sampling).
    """
    actions_tm = jnp.moveaxis(actions, 0, 1)  # (T, B, A)
    states_tm = jnp.moveaxis(states, 0, 1) if states is not None else None

    def step(prev, xs):
        if states_tm is None:
            (action,) = xs
            state = None
        else:
            action, state = xs
        pred = apply_fn(prev, action, state)
        return pred.astype(prev.dtype), pred

    xs = (actions_tm,) if states_tm is None else (actions_tm, states_tm)
    _, preds = lax.scan(step, frame0, xs)
    return jnp.moveaxis(preds, 0, 1)  # (B, T, ...)


class Predictor:
    """Jitted generator inference over restored (or given) parameters.

    Pass ``mesh`` (or call :meth:`with_mesh`) to serve over multiple chips:
    the batch axis shards over the mesh's data axis and, when the mesh has a
    model axis > 1, conv output channels shard over it (the same GSPMD rules
    as training — ``parallel.gspmd.tp_param_pspec``); XLA inserts the ICI
    collectives. The reference's inference is single-device ``sess.run``
    (SURVEY.md §4.2) — multi-chip serving is rebuild-native scaling.
    """

    def __init__(self, cfg: Config, g_params, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from action_conditioned_gans_tpu.parallel.gspmd import tp_param_pspec

            model_axis = mesh.axis_names[-1]
            model_size = mesh.shape[model_axis] if len(mesh.axis_names) > 1 else 1

            def param_sharding(leaf):
                spec = (
                    tp_param_pspec(leaf, model_axis, model_size)
                    if len(getattr(leaf, "shape", ())) > 0
                    else P()
                )
                return NamedSharding(mesh, spec)

            g_params = jax.device_put(
                g_params, jax.tree_util.tree_map(param_sharding, g_params)
            )
        self.g_params = g_params
        self._gen = Generator(cfg.model)

        @jax.jit
        def _predict(params, frame, action, state):
            return self._gen.apply({"params": params}, frame, action, state)

        @jax.jit
        def _rollout(params, frame0, actions, states):
            def apply_fn(prev, action, state):
                return self._gen.apply({"params": params}, prev, action, state)

            return rollout_scan(apply_fn, frame0, actions, states)

        self._predict = _predict
        self._rollout = _rollout

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        cfg: Config,
        workdir: Optional[str] = None,
        step: Optional[int] = None,
        use_ema: bool = False,
        mesh=None,
    ) -> "Predictor":
        """Restore generator params from the latest (or given) checkpoint.

        ``use_ema=True`` serves the exponential-moving-average weights
        (requires the checkpoint to have been trained with
        ``train.ema_decay > 0``).
        """
        import dataclasses

        from action_conditioned_gans_tpu.train.state import init_state

        workdir = workdir or cfg.workdir
        mgr = CheckpointManager(f"{workdir}/checkpoints")

        def tmpl(decay: float):
            # Orbax matches the template's tree structure strictly, so the
            # template's EMA presence must match the CHECKPOINT's — not the
            # caller's config.
            c = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, ema_decay=decay)
            )
            return init_state(c, jax.random.PRNGKey(0))

        want_ema_tree = use_ema or cfg.train.ema_decay > 0
        try:
            try:
                state = mgr.restore(tmpl(0.999 if want_ema_tree else 0.0), step=step)
            except Exception as e:
                # Retry with the TOGGLED template (widened for an
                # EMA-carrying checkpoint under a plain config; narrowed
                # for a plain checkpoint under an EMA config). Under
                # use_ema=True, "no EMA weights" is only reported when the
                # non-EMA template DOES restore — i.e. the checkpoint is
                # fine but genuinely EMA-less; any other failure (corrupt
                # file, shape mismatch, wrong step) surfaces the ORIGINAL
                # error instead of masquerading as an EMA problem
                # (ADVICE r2, mirroring train.state.restore_state).
                try:
                    state = mgr.restore(
                        tmpl(0.0 if want_ema_tree else 0.999), step=step
                    )
                except Exception:
                    raise e
                if use_ema:
                    raise ValueError(
                        "use_ema=True but the checkpoint has no EMA weights "
                        "(train with train.ema_decay > 0)"
                    ) from e
        finally:
            mgr.close()
        return cls(cfg, state.g_ema if use_ema else state.g_params, mesh=mesh)

    @classmethod
    def from_npz(
        cls, path: str, cfg: Optional[Config] = None, mesh=None
    ) -> "Predictor":
        """Load a predictor from a portable ``export_generator`` archive.

        Needs neither orbax nor the training workdir: the archive embeds the
        ModelConfig, so a serving container can run on the .npz alone
        (``cfg=None`` reconstructs it; passing a Config overrides
        runtime-only fields like compute_dtype/backend but the architecture
        comes from the archive).
        """
        import json

        import dataclasses

        import numpy as np
        from flax import traverse_util

        from action_conditioned_gans_tpu.config import ModelConfig

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__model_config__"]))
            flat = {
                tuple(k.split("/")): jnp.asarray(z[k])
                for k in z.files
                if k != "__model_config__"
            }
        params = traverse_util.unflatten_dict(flat)
        model = ModelConfig(**meta)
        if cfg is None:
            cfg = Config(model=model)
        else:
            # Architecture fields come from the archive; RUNTIME-only knobs
            # (dtype, kernel backend, gradient-engine choices) stay the
            # caller's — an exported archive records how the model was
            # trained, not how this host should execute it (ADVICE r3:
            # wgrad was missing here, silently overwriting the caller's).
            runtime_only = (
                "compute_dtype",
                "backend",
                "gn_backward",
                "wgrad",
                "deconv",
                "conv0",
            )
            arch_fields = {
                f.name: getattr(model, f.name)
                for f in dataclasses.fields(ModelConfig)
                if f.name not in runtime_only
            }
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **arch_fields)
            )
        return cls(cfg, params, mesh=mesh)

    def with_mesh(self, mesh) -> "Predictor":
        """A copy of this predictor serving over ``mesh`` (see class doc)."""
        return Predictor(self.cfg, self.g_params, mesh=mesh)

    def _place(self, *arrays):
        """Shard batch-leading inputs over the data axis (no-op unmeshed)."""
        if self.mesh is None:
            return arrays
        return shard_batches(self.mesh, *arrays)

    # -- API ------------------------------------------------------------------
    def predict(self, frame, action, state=None):
        """One next-frame prediction — the reference's generator signature."""
        frame, action, state = self._place(frame, action, state)
        return self._predict(self.g_params, frame, action, state)

    def rollout(self, frame0, actions, states=None):
        """Autoregressive T-step prediction conditioned on an action sequence."""
        frame0, actions, states = self._place(frame0, actions, states)
        return self._rollout(self.g_params, frame0, actions, states)
