"""ops.api dispatch tests: backend routing and fallback behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu import ops
from action_conditioned_gans_tpu.ops import xla as X


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_default_backend_roundtrip():
    assert ops.get_default_backend() == "xla"
    ops.set_default_backend("pallas")
    try:
        assert ops.get_default_backend() == "pallas"
    finally:
        ops.set_default_backend("xla")
    with pytest.raises(ValueError):
        ops.set_default_backend("cuda")


@pytest.mark.parametrize("transpose", [False, True])
def test_conv_norm_act_backends_agree(transpose):
    x = rand(0, 2, 8, 8, 8)
    w = rand(1, 4, 4, 8, 16) * 0.1
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))
    kw = dict(stride=2, transpose=transpose, kind="group", groups=4, act="lrelu")
    a = ops.conv_norm_act(x, w, scale, bias, backend="xla", **kw)
    b = ops.conv_norm_act(x, w, scale, bias, backend="pallas", **kw)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_conv_norm_act_batch_norm_falls_back():
    # 'batch' norm is never fused; pallas backend must still be correct.
    x = rand(0, 2, 8, 8, 8)
    w = rand(1, 3, 3, 8, 8) * 0.1
    scale, bias = jnp.ones((8,)), jnp.zeros((8,))
    a = ops.conv_norm_act(x, w, scale, bias, stride=1, kind="batch", backend="xla")
    b = ops.conv_norm_act(x, w, scale, bias, stride=1, kind="batch", backend="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_conv2d_valid_padding_falls_back():
    x = rand(0, 1, 8, 8, 4)
    w = rand(1, 3, 3, 4, 4) * 0.1
    a = ops.conv2d(x, w, stride=1, padding="VALID", backend="pallas")
    b = X.conv2d(x, w, stride=1, padding="VALID")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert a.shape == (1, 6, 6, 4)
