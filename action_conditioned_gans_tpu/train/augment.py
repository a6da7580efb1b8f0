"""Differentiable D-input augmentation (DiffAugment genre, Zhao et al. 2020).

Limited-data GAN training regularizes the discriminator by augmenting BOTH
its real and fake inputs with differentiable transforms — gradients flow
through the transform to the generator, so D never sees un-augmented
images and cannot memorize the training set. The reference genre has no
augmentation; this is an opt-in capability (``train.d_augment``).

TPU-first design: randomness is PRE-DRAWN as one ``(N, K)`` uniform array
(`n_params` scalars per sample for the policy), and ``apply`` is a pure
deterministic function of it — so augmented batches chunk exactly under
discriminator microbatching (the param rows ride the same scan axis as the
images), shapes stay static, and everything vectorizes without per-sample
Python. The conditioning frame is transformed with the SAME per-sample
parameters as its paired next-frame (they come from one camera; breaking
their geometric alignment would corrupt the transition the D judges).

Ops (inputs in [-1, 1], NHWC):
  * ``color`` — per-sample brightness (±0.5), saturation (×[0,2) around the
    per-pixel channel mean), contrast (×[0.5,1.5) around the per-sample
    mean). 3 scalars.
  * ``translation`` — integer shift dx, dy ∈ [-⌈H/8⌉, ⌈H/8⌉], zero padding.
    2 scalars.
  * ``cutout`` — zero a ⌈H/2⌉×⌈W/2⌉ box at a random position. 2 scalars.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_OPS = ("color", "translation", "cutout")
_N_PARAMS = {"color": 3, "translation": 2, "cutout": 2}


def parse_policy(policy: str) -> Tuple[str, ...]:
    """'color,translation,cutout' -> validated op tuple ('' -> ())."""
    if not policy:
        return ()
    ops = tuple(p.strip() for p in policy.split(",") if p.strip())
    for op in ops:
        if op not in _OPS:
            raise ValueError(
                f"unknown d_augment op {op!r} (expected a comma-list of {_OPS})"
            )
    return ops


def n_params(ops: Tuple[str, ...]) -> int:
    return sum(_N_PARAMS[op] for op in ops)


def draw_params(key: jax.Array, ops: Tuple[str, ...], n: int) -> Optional[jax.Array]:
    """(n, n_params) uniform [0,1) draws; None for the empty policy."""
    if not ops:
        return None
    return jax.random.uniform(key, (n, n_params(ops)), jnp.float32)


def _color(x, u):
    # brightness: + (u0 - 0.5)
    x = x + (u[:, 0] - 0.5)[:, None, None, None]
    # saturation: scale around the per-PIXEL channel mean by u1 * 2
    m_pix = jnp.mean(x, axis=-1, keepdims=True)
    x = m_pix + (x - m_pix) * (u[:, 1] * 2.0)[:, None, None, None]
    # contrast: scale around the per-SAMPLE mean by u2 + 0.5
    m = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = m + (x - m) * (u[:, 2] + 0.5)[:, None, None, None]
    return x


def _translation(x, u):
    n, h, w, _ = x.shape
    sh, sw = -(-h // 8), -(-w // 8)  # ceil
    # dy, dx in [-s, s]: floor(u * (2s+1)) - s (u < 1 keeps it in range).
    dy = jnp.floor(u[:, 0] * (2 * sh + 1)).astype(jnp.int32) - sh
    dx = jnp.floor(u[:, 1] * (2 * sw + 1)).astype(jnp.int32) - sw
    padded = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    def slice_one(img, dy1, dx1):
        return lax.dynamic_slice(
            img, (sh + dy1, sw + dx1, 0), (h, w, x.shape[3])
        )

    return jax.vmap(slice_one)(padded, dy, dx)


def _cutout(x, u):
    n, h, w, _ = x.shape
    ch, cw = -(-h // 2), -(-w // 2)  # ceil: box size
    # Top-left corner in [0, h - ch] x [0, w - cw].
    ty = jnp.floor(u[:, 0] * (h - ch + 1)).astype(jnp.int32)
    tx = jnp.floor(u[:, 1] * (w - cw + 1)).astype(jnp.int32)
    ys = jnp.arange(h)[None, :, None]  # (1, h, 1)
    xs = jnp.arange(w)[None, None, :]  # (1, 1, w)
    inside = (
        (ys >= ty[:, None, None])
        & (ys < (ty + ch)[:, None, None])
        & (xs >= tx[:, None, None])
        & (xs < (tx + cw)[:, None, None])
    )  # (n, h, w)
    return x * (~inside)[..., None].astype(x.dtype)


_APPLY = {"color": _color, "translation": _translation, "cutout": _cutout}


def apply(
    ops: Tuple[str, ...],
    u: Optional[jax.Array],
    imgs: jax.Array,
    pair: Optional[jax.Array] = None,
):
    """Apply the policy with pre-drawn params ``u`` (from ``draw_params``).

    ``pair`` (the conditioning frame) receives the SAME per-sample
    transform. Returns ``(imgs_aug, pair_aug)`` (``pair_aug`` None when no
    pair given). Differentiable w.r.t. ``imgs``/``pair``; deterministic in
    ``u``.
    """
    if not ops or u is None:
        return imgs, pair
    dtype = imgs.dtype
    x = imgs.astype(jnp.float32)
    p = pair.astype(jnp.float32) if pair is not None else None
    off = 0
    for op in ops:
        k = _N_PARAMS[op]
        cols = u[:, off : off + k]
        fn = _APPLY[op]
        x = fn(x, cols)
        if p is not None:
            p = fn(p, cols)
        off += k
    x = x.astype(dtype)
    if p is not None:
        p = p.astype(pair.dtype)
    return x, p
