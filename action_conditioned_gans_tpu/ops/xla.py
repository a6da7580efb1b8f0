"""Plain-XLA implementations of the layer ops.

These are the always-available backend and the numerical oracle the Pallas
kernels are verified against (SURVEY.md §5.1: plain-XLA-on-CPU forward pass
vs Pallas TPU kernels within 1e-3).

Layout conventions (TPU-native):
  * activations: NHWC
  * conv kernels: HWIO  (kh, kw, in_ch, out_ch)
  * matmuls accumulate in float32 (``preferred_element_type``) regardless of
    the bfloat16 compute dtype, so the MXU runs bf16 inputs with fp32
    accumulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers  # alias


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding: str = "SAME",
) -> jax.Array:
    """Strided 2-D convolution (reference ``ops.conv2d``, SURVEY.md §3 row 3)."""
    dn = _DN(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # No explicit preferred_element_type: XLA already accumulates bf16 convs
    # in fp32 on the MXU, and a widened output dtype breaks the transpose
    # (grad) rule's operand dtype matching.
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=dn,
    )


def conv2d_transpose(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 2,
    padding: str = "SAME",
) -> jax.Array:
    """Fractionally-strided conv (reference ``ops.deconv2d``).

    Implemented as ``lax.conv_transpose`` so XLA lowers it to a single
    input-dilated convolution on the MXU rather than a scatter.
    """
    dn = _DN(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_transpose(
        x,
        w.astype(x.dtype),
        strides=(stride, stride),
        padding=padding,
        dimension_numbers=dn,
    )


def subpixel_deconv_supported(w_shape, stride: int, padding: str) -> bool:
    """Envelope of the exact subpixel decomposition: the k=4 / stride-2 /
    SAME geometry — the only transposed-conv shape the models use."""
    return (
        len(w_shape) == 4
        and stride == 2
        and w_shape[0] == 4
        and w_shape[1] == 4
        and padding == "SAME"
    )


def conv2d_transpose_subpixel(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 2,
    padding: str = "SAME",
) -> jax.Array:
    """``conv2d_transpose`` via the exact subpixel-phase decomposition
    (``ModelConfig.deconv="subpixel"``).

    Identity (derived for the Pallas kernel, ops/pallas/conv.py:289-297, and
    numerically pinned fwd+grad in tests/test_deconv.py): with ``x`` padded
    by 1, ``y[2a+r, 2b+c] = sum_{dy,dx in {0,1}} x_pad[a+dy+r, b+dx+c] @
    w[2dy+r, 2dx+c]`` — each output subpixel phase ``(r, c)`` is a stride-1
    2x2 conv with the phase kernel ``w[r::2, c::2]``. Stacking the four
    phase kernels on the output-channel axis turns the whole op into ONE
    VALID 2x2 conv to ``4*cout`` channels, finished by phase slicing +
    depth-to-space (pure data movement XLA fuses into the epilogue).

    Why it exists: identical math at minimal MACs with 4x the MXU
    output-lane fill. ``lax.conv_transpose`` to ``cout=3`` (the generator's
    output layer) leaves 125 of the MXU's 128 output lanes idle by
    construction — the r5 config3 xplane anatomy measured that op class at
    2.4-44x its compute roofline (BASELINE.md). Here the inner conv
    contracts exactly the true FLOPs (no dilation zeros) into 12 output
    channels. No custom VJP: gradients are plain AD through a conv and
    slices (dw sees the 4*cout-wide conv wgrad, dx a 2x2 dgrad), so DP
    ``check_vma`` verification stays ON — unlike the wgrad/pallas engines.

    Falls back to :func:`conv2d_transpose` off the k=4/stride-2/SAME
    envelope (same permanent-fallback idiom as the Pallas kernels).
    """
    if not subpixel_deconv_supported(w.shape, stride, padding):
        return conv2d_transpose(x, w, stride=stride, padding=padding)
    b, h, w_, cin = x.shape
    cout = w.shape[3]
    wd = w.astype(x.dtype)
    # (2, 2, cin, 4*cout); phase p = 2r + c owns output block p.
    wk = jnp.concatenate([wd[r::2, c::2] for r in range(2) for c in range(2)], axis=-1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = _DN(xp.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(
        xp, wk, window_strides=(1, 1), padding="VALID", dimension_numbers=dn
    )  # (b, h+1, w+1, 4*cout)
    phases = [
        z[:, r : r + h, c : c + w_, (2 * r + c) * cout : (2 * r + c + 1) * cout]
        for r in range(2)
        for c in range(2)
    ]
    y = jnp.stack(phases, axis=3)  # (b, h, w, 4, cout), phase-major
    y = y.reshape(b, h, w_, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w_, cout)


def s2d_conv_supported(w_shape, stride: int, padding: str) -> bool:
    """Envelope of the exact space-to-depth rewrite: the k=4 / stride-2 /
    SAME geometry — the only strided-conv shape the models use (even spatial
    dims are additionally required and checked at call time)."""
    return (
        len(w_shape) == 4
        and stride == 2
        and w_shape[0] == 4
        and w_shape[1] == 4
        and padding == "SAME"
    )


def conv2d_s2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 2,
    padding: str = "SAME",
) -> jax.Array:
    """``conv2d`` via an exact space-to-depth rewrite (``ModelConfig.conv0``).

    The input-side mirror of :func:`conv2d_transpose_subpixel`. Identity
    (pinned fwd+grad in tests/test_conv0.py): with ``x`` padded by 1 (what
    SAME means for k=4/stride-2/even H), ``y[i, j] = sum_{p,q in 0..3}
    x_pad[2i+p, 2j+q] @ w[p, q]``; writing ``p = 2*dp + r`` makes each term
    read phase ``(r, c)`` of the space-to-depth'd input at offset
    ``(dp, dq)`` — i.e. ONE stride-1 VALID 2x2 conv over the (H/2+1, W/2+1,
    4*cin) phase tensor with the phase kernels ``w[r::2, c::2]`` stacked on
    the input-channel axis.

    Why it exists: identical MACs with 4x the input-channel fill. The
    models' level-0 convs contract 3-10 image/conditioning channels, and
    their DGRAD is a 3-channel-OUTPUT transposed conv — the same
    construction-idle MXU class the subpixel engine targets (the r5 config3
    xplane anatomy measured the conv_0 family fwd+dgrad+wgrad at 2.4-44x
    compute roofline, 36% of the preset's op-sum, BASELINE.md). After the
    rewrite the dgrad produces the 4*cin=12-channel phase tensor instead.
    No custom VJP: gradients are plain AD through pad/reshape/transpose and
    an ordinary conv, so DP ``check_vma`` verification stays ON.

    Falls back to :func:`conv2d` off the k=4/stride-2/SAME envelope or for
    odd spatial dims (SAME pads (1, 2) there, breaking the phase split).
    """
    if (
        not s2d_conv_supported(w.shape, stride, padding)
        or x.shape[1] % 2
        or x.shape[2] % 2
    ):
        return conv2d(x, w, stride=stride, padding=padding)
    b, h, w_, cin = x.shape
    wd = w.astype(x.dtype)
    # (2, 2, 4*cin, cout); input-channel block p = 2r + c holds phase (r, c).
    wk = jnp.concatenate([wd[r::2, c::2] for r in range(2) for c in range(2)], axis=2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h2, w2 = (h + 2) // 2, (w_ + 2) // 2
    xs = (
        xp.reshape(b, h2, 2, w2, 2, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h2, w2, 4 * cin)
    )
    dn = _DN(xs.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        xs, wk, window_strides=(1, 1), padding="VALID", dimension_numbers=dn
    )  # (b, h/2, w/2, cout)


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Linear layer (reference ``ops.linear``)."""
    y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def leaky_relu(x: jax.Array, leak: float = 0.2) -> jax.Array:
    """Reference ``ops.lrelu(x, 0.2)``."""
    return jnp.where(x >= 0, x, x * jnp.asarray(leak, x.dtype))


def _apply_act(x: jax.Array, act: str, leak: float) -> jax.Array:
    if act == "lrelu":
        return leaky_relu(x, leak)
    if act == "relu":
        return jnp.maximum(x, jnp.zeros((), x.dtype))
    if act == "tanh":
        return jnp.tanh(x)
    if act == "none":
        return x
    raise ValueError(f"unknown activation {act!r}")


def norm_act(
    x: jax.Array,
    scale: Optional[jax.Array],
    bias: Optional[jax.Array],
    *,
    kind: str = "group",
    groups: int = 32,
    eps: float = 1e-5,
    act: str = "lrelu",
    leak: float = 0.2,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Fused normalization + activation.

    ``kind``:
      * ``"group"`` — GroupNorm over (H, W, C/g) per example. Stateless and
        bitwise-identical under data parallelism.
      * ``"batch"`` — per-batch statistics over (N, H, W); when ``axis_name``
        is set the moments are ``psum``-synced across the data mesh axis
        (sync-BN). Deliberately has NO running averages: a documented
        behavioral deviation from TF1 BatchNorm (SURVEY.md §8 hard-part 3) —
        GAN generators are typically sampled in train mode anyway.
      * ``"none"`` — bias-only (+ activation).

    Statistics are computed in float32 and the result cast back to x.dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if kind == "group":
        n, h, w_, c = xf.shape
        g = min(groups, c)
        while c % g:
            g -= 1
        xg = xf.reshape(n, h, w_, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + eps)
        y = xg.reshape(n, h, w_, c)
    elif kind == "batch":
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (xf - mean) * lax.rsqrt(var + eps)
    elif kind == "none":
        y = xf
    else:
        raise ValueError(f"unknown norm kind {kind!r}")

    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return _apply_act(y.astype(dtype), act, leak)
