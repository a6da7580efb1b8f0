"""Patches-dot (im2col) weight gradient for the strided convs — opt-in via
``ModelConfig.wgrad="patches"``.

Why this exists (r3 xprof gap hunt, BASELINE.md): after the scheduling and
optimizer-traffic questions closed, the only ops still materially above
their own compute roofline in the headline step are XLA's weight-gradient
conv fusions (1.4-2.0x ideal) — contractions over batch x spatial with tiny
(4x4) output spatial dims, a shape class XLA's conv kernels tile poorly and
where custom Mosaic kernels measured ~51% of peak (docs/KERNELS.md), so a
Pallas rewrite is not expected to win either. This module tries the third
formulation: express dW as ONE large MXU matmul over explicitly extracted
input patches,

    dW[kh,kw,ci,co] = sum_{b,i,j} x[b, s*i+kh-p, s*j+kw-p, ci] * dy[b,i,j,co]
                    = patches(x)^T @ dy  folded over (b, i, j),

which is exactly the im2col lowering: K = B*H'*W' contraction rows feed a
(kh*kw*Cin, Cout) output tile — large, static, MXU-shaped. The cost is
materializing the patches tensor (kh*kw/s^2 x the input bytes); the bet is
that trading that HBM traffic for well-tiled matmul beats XLA's conv-shaped
wgrad kernel. Measured win-or-lose on the real chip per the repo's
perf-lever protocol (BASELINE.md r3/r4 tables).

Scope: the non-transposed conv path only (the discriminator's whole stack
and the generator encoder — D-bwd is the largest step-anatomy group at
968/782 us measured/roofline). Transpose-conv wgrad keeps XLA AD.

Semantics: identical forward (same XLA conv); dx is the SAME transposed-conv
HLO that AD emits (derived with ``jax.linear_transpose``, no extra forward
work); dw differs from AD only in accumulation — the patches dot accumulates
straight to float32 (``preferred_element_type``) where AD's wgrad conv
rounds through the bf16 operand dtype first, so bf16-compute dw is a hair
MORE precise. Equivalence pinned by tests/test_wgrad.py (exact in f32,
bf16-rounding tolerance in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from action_conditioned_gans_tpu.ops import xla as _xla


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_patches_wgrad(x, w, stride: int = 1, padding: str = "SAME"):
    """``ops.xla.conv2d`` with the weight gradient computed as an im2col
    matmul instead of XLA's conv-shaped wgrad (see module docstring)."""
    return _xla.conv2d(x, w, stride=stride, padding=padding)


def _fwd(x, w, stride, padding):
    return conv2d_patches_wgrad(x, w, stride, padding), (x, w)


def _dx_transposed_conv(dy, w, x_shape, stride, padding):
    """The transposed conv AD emits for dx, built explicitly from shape math
    (jax.linear_transpose is NOT usable here: under shard_map's
    varying-axes checking the cotangent carries a vma annotation a plain
    ShapeDtypeStruct spec cannot match)."""
    kh, kw, _, _ = w.shape
    pads = lax.padtype_to_pads(x_shape[1:3], (kh, kw), (stride, stride), padding)
    w_rev = w[::-1, ::-1].swapaxes(2, 3)  # (kh, kw, cout, cin)
    tpads = []
    for (lo, _hi), ksz, xs, ys in zip(pads, (kh, kw), x_shape[1:3], dy.shape[1:3]):
        dd = (ys - 1) * stride + 1  # dy size after input dilation
        lo_t = ksz - 1 - lo
        hi_t = xs - dd - lo_t + ksz - 1  # solves out == xs
        tpads.append((lo_t, hi_t))
    return lax.conv_general_dilated(
        dy,
        w_rev.astype(dy.dtype),
        window_strides=(1, 1),
        padding=tpads,
        lhs_dilation=(stride, stride),
        dimension_numbers=lax.conv_dimension_numbers(
            dy.shape, w_rev.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )


def _bwd(stride, padding, res, dy):
    x, w = res
    dx = _dx_transposed_conv(dy, w, x.shape, stride, padding)

    kh, kw, cin, cout = w.shape
    # Feature ordering of conv_general_dilated_patches is (C, kh, kw) with
    # the channel SLOWEST (pinned by tests/test_wgrad.py::test_patch_order).
    patches = lax.conv_general_dilated_patches(
        x,
        (kh, kw),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    dw = jnp.einsum(
        "bijf,bijo->fo",
        patches,
        dy,
        preferred_element_type=jnp.float32,
    )
    dw = dw.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)
    # The primal casts w to x.dtype before the conv; the transpose of that
    # cast returns the cotangent in w's own dtype (usually f32 params).
    return dx, dw.astype(w.dtype)


conv2d_patches_wgrad.defvjp(_fwd, _bwd)
