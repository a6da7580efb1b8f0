"""Train state: G/D parameters + two independent optimizer states.

The reference keeps two ``tf.train.AdamOptimizer``s over variable-scoped G/D
collections (SURVEY.md §3 row 6); here the split is structural — two param
pytrees, two ``optax`` states — so the "gradient flows are disjoint"
property (SURVEY.md §5.3) holds by construction.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from action_conditioned_gans_tpu.config import Config
from action_conditioned_gans_tpu.models import Discriminator, Generator


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    # EMA of g_params (cfg.train.ema_decay > 0), else None (absent from the
    # pytree, so checkpoints/shardings are unchanged when EMA is off).
    g_ema: Any = None


def scale_by_adam_moment_dtype(
    b1: float, b2: float, eps: float, moment_dtype
) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in ``moment_dtype``.

    Adam's cost on this model is pure HBM traffic (BASELINE.md step
    anatomy); storing mu/nu in bf16 halves their read+write bytes. The
    update math is unchanged: moments are upcast to f32 in-register, the
    EMA update and bias-corrected step are computed in f32, and only the
    STORED moments are rounded back (optax's stock ``mu_dtype`` covers mu
    only — nu is the same traffic, so both are converted here).
    """
    dtype = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        mu_f = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            updates,
            state.mu,
        )
        nu_f = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates,
            state.nu,
        )
        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(lambda m: m.astype(dtype), mu_f),
            nu=jax.tree_util.tree_map(lambda v: v.astype(dtype), nu_f),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def make_lr_schedule(t, peak_lr: float, updates_per_step: int = 1):
    """Resolve TrainConfig's schedule knobs to an lr for ``peak_lr``.

    Returns the plain float when the config asks for constant-no-warmup —
    the default — so the stock optimizer-state pytree (no schedule counter)
    is preserved bit-for-bit; otherwise an ``optax`` schedule callable.
    The decay horizon starts AFTER warmup and the final value holds
    (training past ``warmup + decay`` steps continues at the floor).

    ``updates_per_step``: how many optimizer updates this schedule's owner
    takes per TRAIN step (D takes ``disc_steps``). The optax counter ticks
    per UPDATE, so horizons are scaled by it — warmup_steps/lr_decay_steps
    always mean train steps, whatever disc_steps is.
    """
    if t.lr_schedule not in ("constant", "linear", "cosine"):
        raise ValueError(
            f"unknown lr_schedule {t.lr_schedule!r} "
            "(expected 'constant', 'linear', or 'cosine')"
        )
    if t.warmup_steps == 0 and t.lr_schedule == "constant":
        return peak_lr
    k = max(updates_per_step, 1)
    warmup = t.warmup_steps * k
    decay = (t.lr_decay_steps or max(t.total_steps - t.warmup_steps, 1)) * k
    end = peak_lr * t.lr_end_factor
    if t.lr_schedule == "constant":
        body = optax.constant_schedule(peak_lr)
    elif t.lr_schedule == "linear":
        body = optax.linear_schedule(peak_lr, end, decay)
    else:
        body = optax.cosine_decay_schedule(
            peak_lr, decay, alpha=t.lr_end_factor
        )
    if warmup == 0:
        return body
    return optax.join_schedules(
        [optax.linear_schedule(0.0, peak_lr, warmup), body], [warmup]
    )


def lr_value(t, peak_lr: float, count: int) -> float:
    """Pure-Python mirror of ``make_lr_schedule`` in TRAIN-STEP units.

    Used by the host loop to stamp effective lrs into log lines WITHOUT
    touching the device: evaluating the optax schedule eagerly would
    dispatch tiny jnp programs on the default (TPU) backend — exactly the
    ad-hoc-compile hang the platform rules forbid (CLAUDE.md rule 6).
    Equality with the optax schedule is pinned by test.
    """
    if t.warmup_steps == 0 and t.lr_schedule == "constant":
        return peak_lr
    import math

    w = t.warmup_steps
    if count < w:
        return peak_lr * count / w
    if t.lr_schedule == "constant":
        return peak_lr
    decay = t.lr_decay_steps or max(t.total_steps - w, 1)
    frac = min((count - w) / decay, 1.0)
    end = peak_lr * t.lr_end_factor
    if t.lr_schedule == "linear":
        return peak_lr + (end - peak_lr) * frac
    return end + (peak_lr - end) * 0.5 * (1.0 + math.cos(math.pi * frac))


def make_optimizers(cfg: Config) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    t = cfg.train
    # optax.flatten turns the ~50 per-tensor Adam fusions into ONE fused
    # vector op (identical elementwise math; see TrainConfig.flatten_optimizer).
    # Under tensor parallelism the moments must shard like their params
    # (parallel/gspmd.py rank-based rule), which a concatenated vector cannot,
    # so TP meshes keep the per-tensor layout.
    flat = t.flatten_optimizer and cfg.mesh.model <= 1
    moment_dtype = jnp.dtype(t.adam_moment_dtype)

    def tx(peak_lr: float, updates_per_step: int = 1) -> optax.GradientTransformation:
        lr = make_lr_schedule(t, peak_lr, updates_per_step)
        if moment_dtype == jnp.float32:
            inner = optax.adam(lr, b1=t.adam_b1, b2=t.adam_b2)
        else:
            inner = optax.chain(
                scale_by_adam_moment_dtype(
                    t.adam_b1, t.adam_b2, 1e-8, moment_dtype
                ),
                # Negates; tracks its own count when lr is a schedule.
                optax.scale_by_learning_rate(lr),
            )
        if t.grad_clip_norm > 0:
            # Clip BEFORE Adam so the moments see the clipped gradient
            # (the standard placement). G and D are chained independently —
            # their flows are disjoint by construction (module docstring).
            inner = optax.chain(
                optax.clip_by_global_norm(t.grad_clip_norm), inner
            )
        return optax.flatten(inner) if flat else inner

    # D's optax counter ticks disc_steps times per train step.
    return tx(t.g_lr), tx(t.d_lr, max(t.disc_steps, 1))


def init_state(cfg: Config, rng: jax.Array) -> TrainState:
    """Initialize parameters and optimizer states (all float32)."""
    m = cfg.model
    gen, disc = Generator(m), Discriminator(m)
    kg, kd = jax.random.split(rng)
    frame = jnp.zeros((1, m.image_size, m.image_size, m.image_channels), jnp.float32)
    action = jnp.zeros((1, m.action_dim), jnp.float32)
    state_vec = jnp.zeros((1, m.state_dim), jnp.float32) if m.state_dim else None
    g_params = gen.init(kg, frame, action, state_vec)["params"]
    d_params = disc.init(kd, frame, frame, action, state_vec)["params"]
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        g_ema=(
            jax.tree_util.tree_map(jnp.copy, g_params)
            if cfg.train.ema_decay > 0
            else None
        ),
    )


def restore_state(cfg: Config, mgr, step=None, template: TrainState = None) -> TrainState:
    """Restore a TrainState whose on-disk EMA presence may differ from
    ``cfg.train.ema_decay``.

    Orbax matches the restore template's tree structure strictly, so a
    checkpoint written with EMA on cannot restore into a template without
    the g_ema subtree and vice versa. Try the config's own template first,
    then the ema-toggled one, and finally RECONCILE the result to what the
    config wants: ema-on with no stored EMA seeds g_ema from the restored
    params; ema-off drops a stored EMA tree (so the state matches the
    compiled step's expected structure/shardings either way).
    """
    import dataclasses

    def tmpl(decay: float) -> TrainState:
        c = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, ema_decay=decay))
        return init_state(c, jax.random.PRNGKey(0))

    want_ema = cfg.train.ema_decay > 0
    try:
        state = mgr.restore(template if template is not None else tmpl(cfg.train.ema_decay), step=step)
    except Exception as first:
        try:
            state = mgr.restore(tmpl(0.999 if not want_ema else 0.0), step=step)
        except Exception:
            # Not an EMA-structure mismatch — surface the ORIGINAL failure
            # (truncated file, shape change, ...), not the retry's
            # misleading structure error.
            raise first
    if want_ema and state.g_ema is None:
        state = state.replace(
            g_ema=jax.tree_util.tree_map(jnp.copy, state.g_params)
        )
    if not want_ema and state.g_ema is not None:
        state = state.replace(g_ema=None)
    return state


def param_count(state: TrainState) -> Tuple[int, int]:
    g = sum(x.size for x in jax.tree_util.tree_leaves(state.g_params))
    d = sum(x.size for x in jax.tree_util.tree_leaves(state.d_params))
    return g, d
