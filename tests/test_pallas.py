"""Pallas kernel parity tests (SURVEY.md §5.1): fused kernels vs the plain
XLA oracle, forward and gradient, within the 1e-3 BASELINE tolerance.

On the CPU test mesh the kernels run in Pallas interpreter mode; the same
code lowers through Mosaic on TPU (exercised by bench/e2e runs there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.ops import xla as X
from action_conditioned_gans_tpu.ops import pallas as P

TOL = dict(atol=1e-3, rtol=1e-3)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("act", ["lrelu", "relu", "tanh", "none"])
def test_group_norm_act_parity(act):
    x = rand(0, 2, 8, 8, 64)
    scale = rand(1, 64) * 0.1 + 1.0
    bias = rand(2, 64) * 0.1
    got = P.group_norm_act(x, scale, bias, groups=8, act=act)
    want = X.norm_act(x, scale, bias, kind="group", groups=8, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def test_group_norm_act_grad_parity():
    x = rand(0, 2, 8, 8, 32)
    scale, bias = jnp.ones((32,)), jnp.zeros((32,))

    def f_fused(x, s, b):
        return jnp.sum(P.group_norm_act(x, s, b, groups=4) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(X.norm_act(x, s, b, kind="group", groups=4) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


@pytest.mark.parametrize(
    "stride,k,kind,act",
    [
        (2, 4, "group", "lrelu"),  # encoder / discriminator stage
        (1, 3, "group", "relu"),  # bottleneck stage
        (2, 4, "none", "lrelu"),  # norm-free first layer
        (1, 3, "none", "tanh"),
    ],
)
def test_conv_norm_act_parity(stride, k, kind, act):
    cin, cout = 16, 32
    x = rand(0, 2, 16, 16, cin)
    w = rand(1, k, k, cin, cout) * 0.1
    scale = rand(2, cout) * 0.1 + 1.0 if kind == "group" else None
    bias = rand(3, cout) * 0.1
    assert P.conv_norm_act_supported(x, w, stride, kind, 8)
    got = P.conv_norm_act(x, w, scale, bias, stride=stride, kind=kind, groups=8, act=act)
    want = X.norm_act(
        X.conv2d(x, w, stride=stride), scale, bias, kind=kind, groups=8, act=act
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def test_conv_norm_act_grad_parity():
    x = rand(0, 2, 8, 8, 8)
    w = rand(1, 4, 4, 8, 16) * 0.1
    scale, bias = jnp.ones((16,)), jnp.zeros((16,))

    def f(op, x, w, s, b):
        return jnp.sum(op(x, w, s, b) ** 2)

    fused = lambda x, w, s, b: P.conv_norm_act(x, w, s, b, stride=2, kind="group", groups=4)
    ref = lambda x, w, s, b: X.norm_act(
        X.conv2d(x, w, stride=2), s, b, kind="group", groups=4
    )
    g1 = jax.grad(lambda *a: f(fused, *a), argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g2 = jax.grad(lambda *a: f(ref, *a), argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


@pytest.mark.parametrize(
    "kind,act,cout",
    [("group", "relu", 16), ("none", "tanh", 3), ("group", "lrelu", 32)],
)
def test_conv_transpose_norm_act_parity(kind, act, cout):
    cin = 8
    x = rand(0, 2, 8, 8, cin)
    w = rand(1, 4, 4, cin, cout) * 0.1
    scale = rand(2, cout) * 0.1 + 1.0 if kind == "group" else None
    bias = rand(3, cout) * 0.1
    assert P.conv_transpose_norm_act_supported(x, w, 2, kind, 4)
    got = P.conv_transpose_norm_act(
        x, w, scale, bias, stride=2, kind=kind, groups=4, act=act
    )
    want = X.norm_act(
        X.conv2d_transpose(x, w, stride=2), scale, bias, kind=kind, groups=4, act=act
    )
    assert got.shape == want.shape == (2, 16, 16, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), **TOL)


def test_conv_transpose_grad_parity():
    x = rand(0, 2, 4, 4, 8)
    w = rand(1, 4, 4, 8, 8) * 0.1
    scale, bias = jnp.ones((8,)), jnp.zeros((8,))
    fused = lambda x, w, s, b: jnp.sum(
        P.conv_transpose_norm_act(
            x, w, s, b, stride=2, kind="group", groups=4, act="relu"
        )
        ** 2
    )
    ref = lambda x, w, s, b: jnp.sum(
        X.norm_act(
            X.conv2d_transpose(x, w, stride=2), s, b, kind="group", groups=4, act="relu"
        )
        ** 2
    )
    g1 = jax.grad(fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g2 = jax.grad(ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


def test_supported_rejects_out_of_envelope():
    big = jax.ShapeDtypeStruct((1, 512, 512, 256), jnp.float32)
    w = jax.ShapeDtypeStruct((4, 4, 256, 512), jnp.float32)
    assert not P.conv_norm_act_supported(big, w, 2, "group", 32)
    # odd kernel with stride 2 -> unsupported path
    x = jax.ShapeDtypeStruct((1, 16, 16, 8), jnp.float32)
    w3 = jax.ShapeDtypeStruct((3, 3, 8, 8), jnp.float32)
    assert not P.conv_norm_act_supported(x, w3, 2, "group", 4)
    # batch-kind norm never fuses here
    w4 = jax.ShapeDtypeStruct((4, 4, 8, 8), jnp.float32)
    assert not P.conv_norm_act_supported(x, w4, 2, "batch", 4)


def test_generator_full_model_parity():
    """Whole generator, pallas backend vs xla backend, same params."""
    from action_conditioned_gans_tpu.config import ModelConfig
    from action_conditioned_gans_tpu.models import Generator

    kw = dict(
        image_size=16,
        g_levels=2,
        g_base_channels=8,
        group_norm_groups=4,
        compute_dtype="float32",
    )
    gen_x = Generator(ModelConfig(backend="xla", **kw))
    gen_p = Generator(ModelConfig(backend="pallas", **kw))
    frame = rand(0, 2, 16, 16, 3)
    action = rand(1, 2, 4)
    params = gen_x.init(jax.random.PRNGKey(0), frame, action)
    out_x = gen_x.apply(params, frame, action)
    out_p = gen_p.apply(params, frame, action)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), **TOL)


def test_discriminator_full_model_parity():
    from action_conditioned_gans_tpu.config import ModelConfig
    from action_conditioned_gans_tpu.models import Discriminator

    kw = dict(
        image_size=16,
        d_levels=2,
        d_base_channels=8,
        group_norm_groups=4,
        compute_dtype="float32",
    )
    d_x = Discriminator(ModelConfig(backend="xla", **kw))
    d_p = Discriminator(ModelConfig(backend="pallas", **kw))
    frame = rand(0, 2, 16, 16, 3)
    action = rand(1, 2, 4)
    params = d_x.init(jax.random.PRNGKey(0), frame, frame, action)
    np.testing.assert_allclose(
        np.asarray(d_p.apply(params, frame, frame, action)),
        np.asarray(d_x.apply(params, frame, frame, action)),
        **TOL,
    )
