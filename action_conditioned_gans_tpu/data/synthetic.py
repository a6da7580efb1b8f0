"""Seeded synthetic pushing-style clip generator (SURVEY.md §8 stage 2).

Emulates the BAIR-robot-pushing structure the reference trains on
(SURVEY.md §1): a pusher (end effector) moves under a 4-dim action; when it
contacts the object, the object is displaced. Per-timestep features mirror
the TFRecord schema: frame, 4-dim action, 3-dim end-effector state.

Everything is pure ``jax.numpy`` under ``vmap``/``scan`` and jit-compiles to
a single on-device program, so training batches never touch the host — the
TPU-native answer to the reference's queue-runner input path. Deterministic
in the PRNG key by construction.

Action semantics (all 4 dims are live):
  a[0], a[1] — pusher velocity (dx, dy) in normalized image coordinates
  a[2]       — grip: modulates the pusher's rendered half-size
  a[3]       — push strength: scales how far a contacted object is carried

State = (pusher_x, pusher_y, grip), mirroring BAIR's 3-dim
``endeffector_pos``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

# World constants (normalized [0, 1] coordinates).
_PUSHER_HALF = 0.06
_OBJECT_HALF = 0.09
_CONTACT = _PUSHER_HALF + _OBJECT_HALF
_MARGIN = 0.08
_EDGE_SHARPNESS = 60.0  # softness of rendered square edges


def _soft_square(grid_y, grid_x, cy, cx, half):
    """Differentiable square mask: (H, W) in [0, 1]."""
    my = jax.nn.sigmoid((half - jnp.abs(grid_y - cy)) * _EDGE_SHARPNESS)
    mx = jax.nn.sigmoid((half - jnp.abs(grid_x - cx)) * _EDGE_SHARPNESS)
    return my * mx


def _render_frame(grid_y, grid_x, bg, pusher_pos, obj_pos, obj_color, grip):
    """Compose background, object, pusher into an (H, W, 3) frame in [0, 1]."""
    obj_mask = _soft_square(grid_y, grid_x, obj_pos[0], obj_pos[1], _OBJECT_HALF)[..., None]
    pusher_half = _PUSHER_HALF * (1.0 + 0.5 * jnp.tanh(grip))
    pusher_mask = _soft_square(grid_y, grid_x, pusher_pos[0], pusher_pos[1], pusher_half)[
        ..., None
    ]
    pusher_color = jnp.array([0.85, 0.85, 0.9])
    frame = bg * (1 - obj_mask) + obj_color * obj_mask
    frame = frame * (1 - pusher_mask) + pusher_color * pusher_mask
    return frame


def _single_clip(key: jax.Array, seq_len: int, image_size: int, action_dim: int):
    """One clip: frames (T, H, W, 3) in [-1, 1], actions (T-1, A), states (T-1, 3)."""
    k_bg, k_obj, k_pos, k_act = jax.random.split(key, 4)

    coords = (jnp.arange(image_size, dtype=jnp.float32) + 0.5) / image_size
    grid_y = coords[:, None] * jnp.ones((1, image_size))
    grid_x = coords[None, :] * jnp.ones((image_size, 1))

    # Per-clip random smooth background (stands in for the lab-table texture).
    k_grad, k_base = jax.random.split(k_bg)
    g = jax.random.uniform(k_grad, (2, 3), minval=0.0, maxval=0.35)
    base = jax.random.uniform(k_base, (3,), minval=0.15, maxval=0.45)
    bg = base + grid_y[..., None] * g[0] + grid_x[..., None] * g[1]

    obj_color = jax.random.uniform(k_obj, (3,), minval=0.3, maxval=1.0)
    pusher0, obj0 = jax.random.uniform(
        k_pos, (2, 2), minval=2 * _MARGIN, maxval=1 - 2 * _MARGIN
    )

    # Smooth random-walk actions: correlated velocities look like a real arm.
    t = seq_len - 1
    noise = jax.random.normal(k_act, (t, action_dim)) * 0.6
    def smooth(carry, n):
        v = 0.7 * carry + 0.3 * n
        return v, v
    _, acts = lax.scan(smooth, jnp.zeros((action_dim,)), noise)
    # Scale motion dims to a plausible per-step displacement.
    scale = jnp.concatenate(
        [jnp.full((2,), 0.07), jnp.ones((action_dim - 2,))]
    )
    actions = jnp.tanh(acts) * scale

    def dynamics(carry, action):
        pusher, obj = carry
        delta = action[:2]
        new_pusher = jnp.clip(pusher + delta, _MARGIN, 1 - _MARGIN)
        # Contact model: if the (moved) pusher overlaps the object's bounding
        # box, the object is carried along, scaled by the push-strength dim.
        gap = jnp.max(jnp.abs(obj - new_pusher))
        strength = 1.0 + 0.5 * jnp.tanh(action[3]) if action.shape[0] > 3 else 1.0
        pushed = jnp.clip(obj + delta * strength, _MARGIN, 1 - _MARGIN)
        new_obj = jnp.where(gap < _CONTACT, pushed, obj)
        grip = action[2] if action.shape[0] > 2 else jnp.zeros(())
        return (new_pusher, new_obj), (new_pusher, new_obj, grip)

    (_, _), (pushers, objs, grips) = lax.scan(dynamics, (pusher0, obj0), actions)
    # Positions per frame: frame 0 is the initial scene, frames 1..T-1 follow
    # the action at t-1.
    all_pushers = jnp.concatenate([pusher0[None], pushers], axis=0)
    all_objs = jnp.concatenate([obj0[None], objs], axis=0)
    all_grips = jnp.concatenate([jnp.zeros((1,)), grips], axis=0)
    # states[t] = end-effector state AT SOURCE FRAME t (pre-action), matching
    # the file-source contract (tfrecord.py slices {t}/endeffector_pos at the
    # transition's source frame). The post-action state was emitted before r2
    # — off by one vs the readers, so a model trained on synthetic saw
    # shifted state semantics relative to real BAIR records.
    states = jnp.stack(
        [all_pushers[:-1, 0], all_pushers[:-1, 1], all_grips[:-1]], axis=-1
    )

    frames01 = jax.vmap(
        lambda p, o, gr: _render_frame(grid_y, grid_x, bg, p, o, obj_color, gr)
    )(all_pushers, all_objs, all_grips)
    frames = jnp.clip(frames01, 0.0, 1.0) * 2.0 - 1.0  # the [0,1] -> [-1,1] step
    return frames.astype(jnp.float32), actions.astype(jnp.float32), states.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def generate_clips(
    key: jax.Array,
    batch: int,
    seq_len: int,
    image_size: int,
    action_dim: int = 4,
    with_state: bool = True,
) -> Dict[str, jax.Array]:
    """Batched clip generation: the unified clip-batch dict.

    frames: (B, seq_len, H, W, 3) float32 in [-1, 1]
    actions: (B, seq_len-1, action_dim)
    states: (B, seq_len-1, 3)  (end-effector pos; included iff with_state)
    """
    keys = jax.random.split(key, batch)
    frames, actions, states = jax.vmap(
        lambda k: _single_clip(k, seq_len, image_size, action_dim)
    )(keys)
    out = {"frames": frames, "actions": actions}
    if with_state:
        out["states"] = states
    return out


class SyntheticClips:
    """Iterator facade: seeded, restartable, step-indexed batch stream.

    Batch i is a pure function of (seed, i) — resuming training at step N
    reproduces the exact data stream, which makes checkpoint-resume tests
    bit-exact (SURVEY.md §5.6).
    """

    def __init__(
        self,
        batch: int,
        seq_len: int,
        image_size: int,
        action_dim: int = 4,
        with_state: bool = True,
        seed: int = 0,
        out_shardings=None,
        stack: int = 1,
        frames_dtype: str = "float32",
    ):
        self.batch = batch
        self.seq_len = seq_len
        self.image_size = image_size
        self.action_dim = action_dim
        self.with_state = with_state
        self._base = jax.random.PRNGKey(seed)
        fn = functools.partial(
            generate_clips,
            batch=batch * max(stack, 1),
            seq_len=seq_len,
            image_size=image_size,
            action_dim=action_dim,
            with_state=with_state,
        )

        def gen(key):
            out = fn(key)
            if stack > 1:
                # (stack*B, ...) -> (stack, B, ...) for multi-step dispatch.
                out = jax.tree_util.tree_map(
                    lambda x: x.reshape((stack, batch) + x.shape[1:]), out
                )
            # Frames staged in data.device_dtype (generation stays f32; the
            # cast fuses into the generator program). bf16 halves the
            # stacked bank's HBM footprint + the per-step slice traffic.
            if frames_dtype != "float32":
                out["frames"] = out["frames"].astype(jnp.dtype(frames_dtype))
            return out

        # out_shardings places each fresh batch directly into its DP layout —
        # no host round-trip, no reshard.
        self._fn = jax.jit(gen, out_shardings=out_shardings)

    def batch_at(self, index) -> Dict[str, jax.Array]:
        return self._fn(jax.random.fold_in(self._base, index))

    def __iter__(self):
        i = 0
        while True:
            yield self.batch_at(i)
            i += 1
