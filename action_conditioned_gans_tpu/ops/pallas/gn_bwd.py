"""Pallas GroupNorm+activation BACKWARD kernel (VERDICT r2 lever 1c).

One grid program per sample: x, out and the upstream cotangent blocks are
VMEM-resident while every reduction (dbias/dscale partials, the two
per-group means) and the dx map are computed in one pass — a single HBM
read of each input and a single write of dx, versus the multiple x-sized
passes XLA emits for the same math. The forward stays on the (already
conv-fused) XLA path; only the backward runs here — the inverse of the
usual custom-kernel split, chosen from the r2 xprof evidence that XLA's
forward fusions are near-roofline while the backward elementwise chains
are the remaining bandwidth cost.

Statistics arrive as residuals from the forward ((N, G) mean/rstd), so
nothing is recomputed. Per-group reductions use the channel->group
aggregation-matrix matmul trick from ``ops.pallas.common`` (Mosaic cannot
reshape the lane dimension).

Parity: tests/test_gn_backward.py pins this against the plain-AD backward
(interpret mode on CPU; ACGAN_PALLAS_TPU_PARITY=1 compiles on a real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from action_conditioned_gans_tpu.ops.gn import act_bwd
from action_conditioned_gans_tpu.ops.pallas.common import VMEM_BUDGET, interpret_mode


def gn_bwd_supported(x: jax.Array) -> bool:
    """Static gate: the per-sample working set (x, out, g, dx in f32 plus
    temps) must fit VMEM (double-buffered)."""
    if x.ndim != 4:
        return False
    _, h, w, c = x.shape
    if c < 8:
        return False
    working = 6 * h * w * c * 4  # x, out, g, dx, two f32 temps
    return 2 * working <= VMEM_BUDGET


def _kernel(
    x_ref,
    out_ref,
    g_ref,
    scale_ref,
    mean_ref,
    rstd_ref,
    dx_ref,
    dscale_ref,
    dbias_ref,
    *,
    groups,
    act,
    leak,
    rows,
    c,
):
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    o = out_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    cg = c // groups

    # Channel -> group 0/1 aggregation matrix (lane-dim reshapes are not
    # Mosaic-expressible; matmuls are).
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    grp_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_group == grp_id).astype(jnp.float32)  # (C, G)
    mt = m.T

    mean_c = jnp.dot(mean_ref[0], mt, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_ref[0], mt, preferred_element_type=jnp.float32)
    xhat = (x - mean_c) * rstd_c
    dpre = act_bwd(g, o, act, leak)

    dbias_ref[0] = jnp.sum(dpre, axis=0, keepdims=True)  # (1, C) partial
    dscale_ref[0] = jnp.sum(dpre * xhat, axis=0, keepdims=True)

    h = dpre * scale_ref[:].astype(jnp.float32)  # (rows, C)
    count = float(rows * cg)
    mh_g = jnp.dot(
        jnp.sum(h, axis=0, keepdims=True), m, preferred_element_type=jnp.float32
    ) / count  # (1, G)
    mhx_g = jnp.dot(
        jnp.sum(h * xhat, axis=0, keepdims=True), m, preferred_element_type=jnp.float32
    ) / count
    mh_c = jnp.dot(mh_g, mt, preferred_element_type=jnp.float32)
    mhx_c = jnp.dot(mhx_g, mt, preferred_element_type=jnp.float32)
    dx_ref[0] = (rstd_c * (h - mh_c - xhat * mhx_c)).astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_bwd(groups: int, act: str, leak: float, shape, dtype_name, g_dtype_name):
    b, h, w, c = shape
    rows = h * w
    dtype = jnp.dtype(dtype_name)
    g_dtype = jnp.dtype(g_dtype_name)

    def run(x3, o3, g3, scale2, mean, rstd):
        kern = functools.partial(
            _kernel, groups=groups, act=act, leak=leak, rows=rows, c=c
        )
        row_spec = pl.BlockSpec(
            (1, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        per_c = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        # Mosaic requires the last TWO block dims to divide 8/128 or equal
        # the array dims — a (1, G) block over (B, G) fails the sublane
        # rule, so the per-sample stats ride as (B, 1, G) with (1, 1, G)
        # blocks (leading dims may be 1 freely).
        per_g = pl.BlockSpec(
            (1, 1, groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        part_c = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[row_spec, row_spec, row_spec, per_c, per_g, per_g],
            out_specs=[row_spec, part_c, part_c],
            out_shape=[
                jax.ShapeDtypeStruct((b, rows, c), dtype),
                jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=10 * b * rows * c,
                bytes_accessed=(3 * b * rows * c + b * rows * c)
                * jnp.dtype(dtype).itemsize,
                transcendentals=0,
            ),
            interpret=interpret_mode(),
        )(x3, o3, g3, scale2, mean, rstd)

    del g_dtype  # recorded in the cache key only

    return run


def gn_act_bwd_pallas(
    x: jax.Array,
    scale: jax.Array,
    out: jax.Array,
    g: jax.Array,
    mean: jax.Array,  # (N, groups) f32
    rstd: jax.Array,
    *,
    groups: int,
    act: str,
    leak: float,
):
    """(dx, dscale, dbias) with per-sample partials reduced on the host side
    of the kernel (a (B, C) -> (C,) sum XLA fuses trivially)."""
    b, h, w, c = x.shape
    run = _make_bwd(
        groups, act, float(leak), (b, h, w, c), str(x.dtype), str(g.dtype)
    )
    x3 = x.reshape(b, h * w, c)
    o3 = out.reshape(b, h * w, c)
    g3 = g.reshape(b, h * w, c)
    dx3, dscale_p, dbias_p = run(
        x3,
        o3,
        g3,
        scale.reshape(1, c).astype(jnp.float32),
        mean.reshape(b, 1, -1),
        rstd.reshape(b, 1, -1),
    )
    return (
        dx3.reshape(b, h, w, c),
        dscale_p.reshape(b, c).sum(axis=0),
        dbias_p.reshape(b, c).sum(axis=0),
    )
