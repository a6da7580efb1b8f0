"""Stateless spectral normalization (models/common.spectral_normalize +
ModelConfig.d_spectral_norm)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.models.common import spectral_normalize
from tests.test_train_step import make_batch, tiny_config
from action_conditioned_gans_tpu.train import init_state
from action_conditioned_gans_tpu.train.step import jit_train_step


def test_sigma_matches_svd():
    """Power iteration (converged) divides by the true largest singular
    value: the normalized matrix has sigma_max == 1."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((48, 32)), jnp.float32)
    wn = spectral_normalize(w, iters=60)
    sigma_before = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    sigma_after = float(np.linalg.svd(np.asarray(wn), compute_uv=False)[0])
    np.testing.assert_allclose(sigma_after, 1.0, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(wn) * sigma_before, np.asarray(w), rtol=1e-3, atol=1e-5
    )


def test_conv_kernel_flattening():
    """(H, K, I, O) kernels normalize over the (H·K·I, O) matrix and keep
    their shape/dtype."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((4, 4, 6, 8)), jnp.float32)
    wn = spectral_normalize(w, iters=60)
    assert wn.shape == w.shape and wn.dtype == w.dtype
    sigma = np.linalg.svd(
        np.asarray(wn).reshape(-1, 8), compute_uv=False
    )[0]
    np.testing.assert_allclose(float(sigma), 1.0, rtol=1e-3)


def test_gradient_is_finite_and_correct_direction():
    """dσ/dW = u vᵀ (stop-gradiented iteration vectors): the gradient of
    sigma through the normalization is finite, and for w = s·(fixed unit
    matrix) the normalized output is scale-INVARIANT — grads wrt the scale
    are ~0."""
    rng = np.random.default_rng(2)
    w0 = jnp.asarray(rng.standard_normal((12, 5)), jnp.float32)

    g = jax.grad(lambda w: jnp.sum(spectral_normalize(w, 40) ** 2))(w0)
    assert np.isfinite(np.asarray(g)).all()

    def scaled_out(s):
        return jnp.sum(spectral_normalize(w0 * s, 40) ** 2)

    ds = jax.grad(scaled_out)(jnp.float32(2.0))
    np.testing.assert_allclose(float(ds), 0.0, atol=1e-4)


def test_deterministic():
    w = jnp.asarray(np.random.default_rng(3).standard_normal((20, 7)), jnp.float32)
    a = spectral_normalize(w, 9)
    b = spectral_normalize(w, 9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spectral_step_trains():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, d_spectral_norm=True)
    )
    state = init_state(cfg, jax.random.PRNGKey(0))
    # Param tree unchanged by SN (stateless): same leaves as without it.
    plain = init_state(tiny_config(), jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(plain)
    step = jit_train_step(cfg)
    state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values())
    state, m = step(state, make_batch(cfg, seed=1), jax.random.PRNGKey(2))
    assert int(state.step) == 2


def test_sn_iters_validated():
    from action_conditioned_gans_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="sn_iters"):
        ModelConfig(sn_iters=0)
