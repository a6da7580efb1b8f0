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

Scope: both conv families. The non-transposed path (the discriminator's
whole stack and the generator encoder — D-bwd is the largest step-anatomy
group at 968/782 us measured/roofline) extracts patches of X; the
transposed path (generator decoder) extracts patches of DY instead —
patches of the s-dilated input would be s^2*kh*kw times the input bytes,
while dy-side windows keep the blow-up at kh*kw/s^2 of dy. Derivation: the
forward `lax.conv_transpose(x, w)` equals a stride-1 conv over the
s-dilated, t-padded x, so dW[kh] = sum_u x[u] * dy[s*u + pa - kh] — a
stride-s window over dy per input position, with the kernel axis REVERSED
relative to the window order.

Semantics: identical forward (same XLA conv); dx is the SAME transposed-conv
HLO that AD emits (derived with ``jax.linear_transpose``, no extra forward
work); dw differs from AD only in accumulation — the patches dot accumulates
straight to float32 (``preferred_element_type``) where AD's wgrad conv
rounds through the bf16 operand dtype first, so bf16-compute dw is a hair
MORE precise. Equivalence pinned by tests/test_wgrad.py (exact in f32,
bf16-rounding tolerance in bf16).

Two bookkeeping caveats: (1) a custom_vjp always emits BOTH cotangents, so
where AD would skip a dead dx (first layers whose input needs no gradient,
D's stop-gradiented fake input) the dx conv appears in the jaxpr and is
removed by XLA's DCE — real execution cost is unchanged, but jaxpr-level
FLOP counts must take grads wrt both inputs to compare engines (pinned by
tests). (2) the patches extraction lowers to an identity one-hot-kernel
grouped conv doing ZERO arithmetic; utils/profiling.py prices it as
bytes-only so the analytic roofline numerator is invariant across engines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from action_conditioned_gans_tpu.ops import xla as _xla


@functools.partial(jax.jit, static_argnums=(1, 2, 3), inline=False)
def _acgan_patches_extract(x, filter_shape, window_strides, padding):
    """Patch extraction = pure data movement (identity one-hot grouped
    conv, zero arithmetic). Wrapped in a NAMED jit so the step jaxpr
    carries a ``pjit`` eqn utils/profiling.py can price bytes-only by name
    — robust even when ``feature_group_count == 1`` (single-channel x/dy,
    e.g. ``image_channels=1``), where the structural one-hot-kernel
    heuristic cannot distinguish it from a real conv. XLA inlines the call
    during lowering, so fusion/perf are unchanged."""
    return lax.conv_general_dilated_patches(
        x,
        filter_shape,
        window_strides,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
    patches = _acgan_patches_extract(x, (kh, kw), (stride, stride), padding)
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


def _conv_transpose_pads(k: int, s: int, padding: str):
    """The internal padding ``lax.conv_transpose`` applies to the s-dilated
    input (mirrors jax's _conv_transpose_padding; stable public behavior
    pinned by tests/test_wgrad.py forward bit-equality)."""
    if padding == "SAME":
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else -(-pad_len // 2)  # ceil
    elif padding == "VALID":
        pad_len = k + s - 2 + max(k - s, 0)
        pad_a = k - 1
    else:
        raise ValueError(f"unsupported padding {padding!r}")
    return pad_a, pad_len - pad_a


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_transpose_patches_wgrad(x, w, stride: int = 2, padding: str = "SAME"):
    """``ops.xla.conv2d_transpose`` with the weight gradient as a dy-side
    patches matmul (see module docstring)."""
    return _xla.conv2d_transpose(x, w, stride=stride, padding=padding)


def _t_fwd(x, w, stride, padding):
    return conv2d_transpose_patches_wgrad(x, w, stride, padding), (x, w)


def _t_bwd(stride, padding, res, dy):
    x, w = res
    kh, kw, cin, cout = w.shape
    pa_h, _ = _conv_transpose_pads(kh, stride, padding)
    pa_w, _ = _conv_transpose_pads(kw, stride, padding)
    # One padding serves both dx and the dy-patches: window u (stride s,
    # pad lo = k-1-pa) covers dy indices [s*u+pa-k+1, s*u+pa]; hi solves
    # windows-count == x size per dim (negative hi is legal in lax convs).
    pads = []
    for ksz, pa, xs_, ys in zip((kh, kw), (pa_h, pa_w), x.shape[1:3], dy.shape[1:3]):
        lo = ksz - 1 - pa
        pads.append((lo, (xs_ - 1) * stride + ksz - lo - ys))

    # dx: the forward is a CORRELATION of the dilated-padded x with w, so
    # its transpose correlates dy with the spatially-reversed, i/o-swapped
    # kernel, sampled back at the dilation grid — one stride-s conv.
    w_rev = w[::-1, ::-1].swapaxes(2, 3)  # (kh, kw, cout, cin)
    dx = lax.conv_general_dilated(
        dy,
        w_rev.astype(dy.dtype),
        window_strides=(stride, stride),
        padding=pads,
        dimension_numbers=lax.conv_dimension_numbers(
            dy.shape, w_rev.shape, ("NHWC", "HWIO", "NHWC")
        ),
    )

    patches = _acgan_patches_extract(
        dy, (kh, kw), (stride, stride), tuple(pads)
    )  # (B, H, W, cout*kh*kw), feature ordering (cout, j_h, j_w)
    dw = jnp.einsum(
        "bijf,bijc->fc",
        patches,
        x,
        preferred_element_type=jnp.float32,
    )
    # Window order j ascends dy indices = DESCENDS kernel offsets.
    dw = dw.reshape(cout, kh, kw, cin)[:, ::-1, ::-1, :].transpose(1, 2, 3, 0)
    return dx, dw.astype(w.dtype)


conv2d_transpose_patches_wgrad.defvjp(_t_fwd, _t_bwd)
