"""GroupNorm+activation with a saved-stats custom VJP (VERDICT r2 lever 1c).

The default-path GroupNorm backward that jax autodiff emits re-derives the
normalization statistics and differentiates through every intermediate —
XLA fuses it into several x-sized passes (~0.8 ms/step of the 2.85 ms
headline step, BASELINE.md step anatomy). This module keeps the FORWARD
bitwise-identical to the plain composite (``ops.xla.norm_act(kind="group")``
— same ops, same order, so XLA's conv+GN-stat fusion is untouched) but
replaces the AD backward with the closed-form GroupNorm gradient evaluated
from saved residuals (mean/rstd from the forward, the activation mask from
the saved output):

    xhat   = (x - mean) * rstd
    dpre   = act'(out) * g
    dbias  = sum dpre            dscale = sum dpre * xhat
    h      = dpre * scale
    dx     = rstd * (h - mean_G(h) - xhat * mean_G(h * xhat))

— three x-sized reads (x, out, g) and one write (dx) instead of autodiff's
re-derivation. Two interchangeable backward engines:

  * ``fused``  — the formula in plain XLA ops (fuses freely with the
    surrounding conv backward);
  * ``pallas`` — one Pallas program per sample computing every reduction
    and the dx map in VMEM (``ops/pallas/gn_bwd.py``); falls back to
    ``fused`` off the VMEM envelope.

Selected by ``ModelConfig.gn_backward`` ("ad" keeps plain autodiff).
Equivalence vs the AD backward is pinned by tests/test_gn_backward.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from action_conditioned_gans_tpu.ops.xla import _apply_act


def resolve_groups(channels: int, groups: int) -> int:
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


def act_bwd(g: jax.Array, out: jax.Array, act: str, leak: float) -> jax.Array:
    """Cotangent through the activation, reconstructed from the OUTPUT
    (saved primal) — every supported activation's gradient is recoverable
    from its output: sign(out) == sign(pre) for lrelu with leak > 0 (at
    leak == 0 negatives collapse to out == 0, so the mask must be strict,
    like relu's), and tanh' = 1 - tanh^2. Negative leak is non-monotone and
    NOT recoverable from the output — rejected at trace time."""
    if act == "lrelu":
        if leak < 0:
            raise ValueError(
                "saved-output activation backward requires leak >= 0 "
                "(negative-slope lrelu is not invertible from its output); "
                "use gn_backward='ad'"
            )
        if leak == 0:
            return jnp.where(out > 0, g, 0.0)
        return jnp.where(out >= 0, g, g * leak)
    if act == "relu":
        return jnp.where(out > 0, g, 0.0)
    if act == "tanh":
        return g * (1.0 - out * out)
    if act == "none":
        return g
    raise ValueError(f"unknown activation {act!r}")


def _group_mean_bc(t: jax.Array, groups: int) -> jax.Array:
    """Per-(sample, group) mean of (N, H, W, C), broadcast back to (N, 1,
    1, C)."""
    n, h, w, c = t.shape
    cg = c // groups
    m = t.reshape(n, h, w, groups, cg).mean(axis=(1, 2, 4), keepdims=True)
    return jnp.broadcast_to(m, (n, 1, 1, groups, cg)).reshape(n, 1, 1, c)


def gn_act_grads(
    x: jax.Array,
    scale: jax.Array,
    out: jax.Array,
    g: jax.Array,
    *,
    groups: int,
    eps: float,
    act: str,
    leak: float,
    mean: Optional[jax.Array] = None,  # (N, groups) f32, from the forward
    rstd: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form (dx, dscale, dbias) for GroupNorm+affine+activation.

    ``mean``/``rstd`` omitted -> recomputed from x (one reduction pass);
    used by the Pallas kernels' VJPs, which save only the pre-norm tensor.
    Shared backward core for ALL GroupNorm paths in the framework.
    """
    n, h, w, c = x.shape
    groups = resolve_groups(c, groups)
    cg = c // groups
    xf = x.astype(jnp.float32)
    if mean is None or rstd is None:
        xg = xf.reshape(n, h, w, groups, cg)
        mean_g = jnp.mean(xg, axis=(1, 2, 4))  # (N, groups)
        var_g = jnp.mean(
            jnp.square(xg - mean_g[:, None, None, :, None]), axis=(1, 2, 4)
        )
        mean, rstd = mean_g, lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(n, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(n, 1, 1, c)
    xhat = (xf - mean_c) * rstd_c
    dpre = act_bwd(g.astype(jnp.float32), out.astype(jnp.float32), act, leak)
    dbias = jnp.sum(dpre, axis=(0, 1, 2))
    dscale = jnp.sum(dpre * xhat, axis=(0, 1, 2))
    hh = dpre * scale.astype(jnp.float32)
    mh = _group_mean_bc(hh, groups)
    mhx = _group_mean_bc(hh * xhat, groups)
    dx = (rstd_c * (hh - mh - xhat * mhx)).astype(x.dtype)
    return dx, dscale, dbias


@functools.lru_cache(maxsize=None)
def _make_fn(groups: int, eps: float, act: str, leak: float, backward: str):
    def fwd_compute(x, scale, bias):
        """Bitwise-identical to ops.xla.norm_act(kind="group"): same ops in
        the same order (stats in f32, affine in f32, cast, then act), plus
        the (mean, rstd) residuals."""
        n, h, w, c = x.shape
        g = resolve_groups(c, groups)
        xf = x.astype(jnp.float32)
        xg = xf.reshape(n, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
        rstd = lax.rsqrt(var + eps)
        y = ((xg - mean) * rstd).reshape(n, h, w, c)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        out = _apply_act(y.astype(x.dtype), act, leak)
        return out, mean.reshape(n, g), rstd.reshape(n, g)

    @jax.custom_vjp
    def fused(x, scale, bias):
        out, _, _ = fwd_compute(x, scale, bias)
        return out

    def fused_fwd(x, scale, bias):
        out, mean, rstd = fwd_compute(x, scale, bias)
        return out, (x, scale, out, mean, rstd)

    def fused_bwd(res, g_out):
        x, scale, out, mean, rstd = res
        if backward == "pallas":
            from action_conditioned_gans_tpu.ops.pallas.gn_bwd import (
                gn_act_bwd_pallas,
                gn_bwd_supported,
            )

            if gn_bwd_supported(x):
                return gn_act_bwd_pallas(
                    x,
                    scale,
                    out,
                    g_out,
                    mean,
                    rstd,
                    groups=resolve_groups(x.shape[-1], groups),
                    act=act,
                    leak=leak,
                )
        return gn_act_grads(
            x,
            scale,
            out,
            g_out,
            groups=groups,
            eps=eps,
            act=act,
            leak=leak,
            mean=mean,
            rstd=rstd,
        )

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def group_norm_act(
    x: jax.Array,
    scale: Optional[jax.Array],
    bias: Optional[jax.Array],
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: str = "lrelu",
    leak: float = 0.2,
    backward: str = "fused",  # "fused" | "pallas"
) -> jax.Array:
    c = x.shape[-1]
    if scale is None:
        scale = jnp.ones((c,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    return _make_fn(groups, float(eps), act, float(leak), backward)(x, scale, bias)
