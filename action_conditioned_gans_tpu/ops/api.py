"""Backend dispatch for the layer ops.

Models call these functions; the ``backend`` argument (threaded from
``ModelConfig.backend``) selects the plain-XLA implementation or the fused
Pallas TPU kernels. Pallas covers the ops where fusion wins (norm+activation
epilogues, MXU conv); anything it does not cover falls back to XLA so the
"pallas" backend is always safe to enable (SURVEY.md §8 stage 7: XLA
fallback is permanent).
"""

from __future__ import annotations

from typing import Optional

import jax

from action_conditioned_gans_tpu.ops import xla as _xla

_DEFAULT_BACKEND = "xla"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> str:
    return _DEFAULT_BACKEND


def _resolve(backend: Optional[str]) -> str:
    return backend if backend is not None else _DEFAULT_BACKEND


def _pallas():
    # Imported lazily: the pallas package requires a TPU-capable jaxlib path
    # and is only touched when explicitly requested.
    from action_conditioned_gans_tpu.ops import pallas as _p

    return _p


def _check_wgrad(wgrad: str, backend: str) -> None:
    # Validate BEFORE any backend early-return: an invalid engine name must
    # fail on every path, and pallas+patches is a contradiction (the pallas
    # conv carries its own custom VJP) that would otherwise silently measure
    # the wrong engine in an A/B run.
    if wgrad not in ("xla", "patches"):
        raise ValueError(f"unknown wgrad engine {wgrad!r}")
    if wgrad == "patches" and backend == "pallas":
        raise ValueError(
            "wgrad='patches' is incompatible with backend='pallas' (the "
            "pallas conv has its own custom VJP); use model.backend='xla'"
        )


def _check_conv(conv: str, wgrad: str, backend: str) -> None:
    # Same validate-before-dispatch rule as _check_wgrad/_check_deconv:
    # contradictions must fail on every path, not silently measure the wrong
    # engine in an A/B run. s2d rewrites the strided conv into a different
    # ordinary conv + data movement, so the pallas conv kernel and the
    # patches wgrad engine (both of which act on the ORIGINAL conv) cannot
    # compose with it.
    if conv not in ("xla", "s2d"):
        raise ValueError(f"unknown conv engine {conv!r}")
    if conv == "s2d" and backend == "pallas":
        raise ValueError(
            "conv='s2d' is incompatible with backend='pallas' (the pallas "
            "conv kernel acts on the original conv, which s2d rewrites); "
            "use model.backend='xla'"
        )
    if conv == "s2d" and wgrad == "patches":
        raise ValueError(
            "conv='s2d' is incompatible with wgrad='patches' (the patches "
            "wgrad engine acts on the original conv, which s2d replaces); "
            "choose one"
        )


def conv2d(
    x, w, *, stride=1, padding="SAME", backend=None, wgrad="xla", conv="xla"
) -> jax.Array:
    _check_wgrad(wgrad, _resolve(backend))
    _check_conv(conv, wgrad, _resolve(backend))
    if _resolve(backend) == "pallas":
        return _pallas().conv2d(x, w, stride=stride, padding=padding)
    if conv == "s2d":
        # Exact space-to-depth rewrite: one stride-1 2x2 conv over the 4*cin
        # phase tensor (ModelConfig.conv0; targets the small-channel
        # image-adjacent convs the r5 xplane anatomies named as the floor).
        return _xla.conv2d_s2d(x, w, stride=stride, padding=padding)
    if wgrad == "patches":
        # Same forward HLO; dW as one im2col matmul (ModelConfig.wgrad).
        from action_conditioned_gans_tpu.ops.wgrad import conv2d_patches_wgrad

        return conv2d_patches_wgrad(x, w, stride, padding)
    return _xla.conv2d(x, w, stride=stride, padding=padding)


def _check_deconv(deconv: str, wgrad: str, backend: str) -> None:
    # Same validate-before-dispatch rule as _check_wgrad: contradictions
    # must fail on every path, not silently measure the wrong engine in an
    # A/B run. subpixel rewrites the transposed conv into an ordinary conv
    # + data movement, so the pallas deconv kernel and the patches
    # transpose-wgrad engine (both of which act on the ORIGINAL transposed
    # conv) cannot compose with it.
    if deconv not in ("xla", "subpixel"):
        raise ValueError(f"unknown deconv engine {deconv!r}")
    if deconv == "subpixel" and backend == "pallas":
        raise ValueError(
            "deconv='subpixel' is incompatible with backend='pallas' (the "
            "pallas conv-transpose kernel already embeds the subpixel "
            "decomposition); use model.backend='xla'"
        )
    if deconv == "subpixel" and wgrad == "patches":
        raise ValueError(
            "deconv='subpixel' is incompatible with wgrad='patches' (the "
            "patches transpose-wgrad engine acts on the original transposed "
            "conv, which subpixel replaces); choose one"
        )


def conv2d_transpose(
    x, w, *, stride=2, padding="SAME", backend=None, wgrad="xla", deconv="xla"
) -> jax.Array:
    _check_wgrad(wgrad, _resolve(backend))
    _check_deconv(deconv, wgrad, _resolve(backend))
    if _resolve(backend) == "pallas":
        return _pallas().conv2d_transpose(x, w, stride=stride, padding=padding)
    if deconv == "subpixel":
        # Exact subpixel-phase rewrite: one 2x2 conv to 4*cout channels +
        # depth-to-space (ModelConfig.deconv; targets the 3-channel-output
        # transposed convs the r5 xplane anatomy measured at 44x roofline).
        return _xla.conv2d_transpose_subpixel(x, w, stride=stride, padding=padding)
    if wgrad == "patches":
        from action_conditioned_gans_tpu.ops.wgrad import (
            conv2d_transpose_patches_wgrad,
        )

        return conv2d_transpose_patches_wgrad(x, w, stride, padding)
    return _xla.conv2d_transpose(x, w, stride=stride, padding=padding)


def dense(x, w, b=None) -> jax.Array:
    """XLA-only by design: a (B, F) x (F, C) matmul plus bias is already a
    single MXU op with the bias add fused by XLA — there is nothing left to
    fuse, so no Pallas variant exists and no ``backend`` argument is taken
    (VERDICT r1 weak item 5: a signature that accepts-and-ignores lies)."""
    return _xla.dense(x, w, b)


def leaky_relu(x, leak: float = 0.2) -> jax.Array:
    return _xla.leaky_relu(x, leak)


def norm_act(
    x,
    scale,
    bias,
    *,
    kind="group",
    groups=32,
    eps=1e-5,
    act="lrelu",
    leak=0.2,
    axis_name=None,
    backend=None,
    gn_backward="ad",
) -> jax.Array:
    if _resolve(backend) == "pallas" and kind == "group" and axis_name is None:
        p = _pallas()
        if p.group_norm_act_supported(x, groups):
            return p.group_norm_act(
                x, scale, bias, groups=groups, eps=eps, act=act, leak=leak
            )
    if kind == "group" and gn_backward in ("fused", "pallas"):
        # XLA forward (bitwise-identical to the composite below), custom
        # closed-form backward (ModelConfig.gn_backward; VERDICT r2 1c).
        from action_conditioned_gans_tpu.ops.gn import group_norm_act

        return group_norm_act(
            x,
            scale,
            bias,
            groups=groups,
            eps=eps,
            act=act,
            leak=leak,
            backward=gn_backward,
        )
    return _xla.norm_act(
        x,
        scale,
        bias,
        kind=kind,
        groups=groups,
        eps=eps,
        act=act,
        leak=leak,
        axis_name=axis_name,
    )


def conv_norm_act(
    x,
    w,
    scale,
    bias,
    *,
    stride=1,
    transpose=False,
    kind="group",
    groups=32,
    eps=1e-5,
    act="lrelu",
    leak=0.2,
    axis_name=None,
    backend=None,
    gn_backward="ad",
    wgrad="xla",
    deconv="xla",
    conv="xla",
) -> jax.Array:
    """The fused conv(+transpose) -> norm -> activation block — the hot op of
    both models (BASELINE.json: "fused Pallas conv+norm+activation kernels").

    The pallas backend fuses the whole block into one kernel when the shapes
    qualify (per-sample conv output resident in VMEM); anything else falls
    back to conv + fused norm_act, then to plain XLA.
    """
    _check_deconv(deconv, wgrad, _resolve(backend))
    _check_conv(conv, wgrad, _resolve(backend))
    if _resolve(backend) == "pallas" and axis_name is None:
        p = _pallas()
        if transpose and p.conv_transpose_norm_act_supported(x, w, stride, kind, groups):
            return p.conv_transpose_norm_act(
                x,
                w,
                scale,
                bias,
                stride=stride,
                kind=kind,
                groups=groups,
                eps=eps,
                act=act,
                leak=leak,
            )
        if not transpose and p.conv_norm_act_supported(x, w, stride, kind, groups):
            return p.conv_norm_act(
                x,
                w,
                scale,
                bias,
                stride=stride,
                kind=kind,
                groups=groups,
                eps=eps,
                act=act,
                leak=leak,
            )
    if transpose:
        y = conv2d_transpose(
            x, w, stride=stride, backend=backend, wgrad=wgrad, deconv=deconv
        )
    else:
        y = conv2d(x, w, stride=stride, backend=backend, wgrad=wgrad, conv=conv)
    return norm_act(
        y,
        scale,
        bias,
        kind=kind,
        groups=groups,
        eps=eps,
        act=act,
        leak=leak,
        axis_name=axis_name,
        backend=backend,
        gn_backward=gn_backward,
    )
