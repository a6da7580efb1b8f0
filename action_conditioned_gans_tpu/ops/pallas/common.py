"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Conservative per-program VMEM working-set budget (bytes). A v5e core has
# ~16 MB of VMEM; Mosaic needs headroom for double-buffered pipelines.
VMEM_BUDGET = 10 * 1024 * 1024


def interpret_mode() -> bool:
    """Run kernels in the Pallas interpreter off-TPU (CPU test mesh)."""
    return jax.default_backend() == "cpu"


def apply_act(y: jax.Array, act: str, leak: float) -> jax.Array:
    if act == "lrelu":
        return jnp.where(y >= 0, y, y * leak)
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "tanh":
        return jnp.tanh(y)
    if act == "none":
        return y
    raise ValueError(f"unknown activation {act!r}")


def resolve_groups(channels: int, groups: int) -> int:
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


def group_norm_epilogue_block(
    x2d: jax.Array,  # (NB * N, C) float32, NB samples' rows, sample-major
    scale_row: jax.Array,  # (1, C)
    bias_row: jax.Array,  # (1, C)
    groups: int,
    eps: float,
    samples: int,
) -> jax.Array:
    """Per-sample GroupNorm over a block of ``samples`` samples at once.

    Extends the aggregation-matrix trick with a row→sample indicator: the
    per-(sample, group) moments come from two matmuls
    ``(NB, rows) @ (rows, C) @ (C, g)`` and broadcast back through their
    transposes. All MXU work; no lane-dim reshapes.
    """
    rows, c = x2d.shape
    if samples <= 1:
        return group_norm_epilogue(x2d, scale_row, bias_row, groups, eps)
    n = rows // samples
    cg = c // groups

    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_group == grp_id).astype(jnp.float32)  # (C, g)

    row_sample = jax.lax.broadcasted_iota(jnp.int32, (samples, rows), 1) // n
    samp_id = jax.lax.broadcasted_iota(jnp.int32, (samples, rows), 0)
    rt = (row_sample == samp_id).astype(jnp.float32)  # (NB, rows)

    s1 = jnp.dot(rt, x2d, preferred_element_type=jnp.float32)  # (NB, C)
    s2 = jnp.dot(rt, x2d * x2d, preferred_element_type=jnp.float32)
    count = float(n * cg)
    gmean = jnp.dot(s1, m, preferred_element_type=jnp.float32) / count  # (NB, g)
    gsq = jnp.dot(s2, m, preferred_element_type=jnp.float32) / count
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)
    grstd = jax.lax.rsqrt(gvar + eps)

    mean_c = jnp.dot(gmean, m.T, preferred_element_type=jnp.float32)  # (NB, C)
    rstd_c = jnp.dot(grstd, m.T, preferred_element_type=jnp.float32)
    mean_rows = jnp.dot(rt.T, mean_c, preferred_element_type=jnp.float32)  # (rows, C)
    rstd_rows = jnp.dot(rt.T, rstd_c, preferred_element_type=jnp.float32)
    return (x2d - mean_rows) * rstd_rows * scale_row.astype(
        jnp.float32
    ) + bias_row.astype(jnp.float32)


def group_norm_epilogue(
    x2d: jax.Array,  # (N, C) float32, N = spatial positions of ONE sample
    scale_row: jax.Array,  # (1, C)
    bias_row: jax.Array,  # (1, C)
    groups: int,
    eps: float,
    logical_channels: int = 0,
) -> jax.Array:
    """GroupNorm over a single sample's (N, C) block, Mosaic-friendly.

    Mosaic cannot shape-cast the lane (channel) dimension, so instead of
    reshaping to (N, g, C/g) the per-group statistics are computed with a
    0/1 channel->group aggregation matrix on the MXU: two (1, C) x (C, g)
    dots for the moments, two (1, g) x (g, C) dots to broadcast them back.

    ``logical_channels``: when C is a subpixel-tiled view of a smaller
    logical channel dim (the conv-transpose kernel packs the 2x2 output
    phases as 4 channel blocks), statistics group by ``ch %
    logical_channels`` so they match the post-depth-to-space layout exactly.
    """
    n, c = x2d.shape
    lc = logical_channels or c
    tile = c // lc
    cg = lc // groups
    ch_group = (
        jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) % lc
    ) // cg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_group == grp_id).astype(jnp.float32)  # (C, g)
    mt = m.T  # (g, C)

    s1 = jnp.sum(x2d, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(x2d * x2d, axis=0, keepdims=True)
    count = float(n * cg * tile)
    gmean = jnp.dot(s1, m, preferred_element_type=jnp.float32) / count  # (1, g)
    gsq = jnp.dot(s2, m, preferred_element_type=jnp.float32) / count
    gvar = jnp.maximum(gsq - gmean * gmean, 0.0)
    grstd = jax.lax.rsqrt(gvar + eps)

    mean_c = jnp.dot(gmean, mt, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(grstd, mt, preferred_element_type=jnp.float32)
    return (x2d - mean_c) * rstd_c * scale_row.astype(jnp.float32) + bias_row.astype(
        jnp.float32
    )
