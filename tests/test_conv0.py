"""Equivalence tests for the space-to-depth strided-conv engine
(ops/xla.py conv2d_s2d, ModelConfig.conv0="s2d") — the input-side mirror of
the subpixel deconv engine.

Pins: (1) forward equality with the plain strided conv across shapes —
square, non-square, cin in {3, 7, 10} (the 3-10-channel image-adjacent
class the engine exists for, BASELINE.md r5 config3 anatomy: 36% of op-sum
at 2.4-44x roofline); (2) dx/dw equality with AD through the plain path
(f32 tight, bf16 rounding tolerance — the MACs are reassociated across the
phase rewrite); (3) the permanent XLA fallback off the k=4/stride-2/SAME/
even-spatial envelope; (4) config/op contradiction rejection; (5) G and D
forward invariance on shared params; (6) a full fused train step
numerically on top of the default engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu import ops
from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.ops import xla as X


def _inputs(dtype, b=2, h=8, w=8, cin=3, cout=16, k=4, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, cin), dtype)
    wk = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    return x, wk


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [
        (2, 8, 8, 3, 16),  # G enc_0 class: 3-channel image input
        (1, 4, 6, 10, 32),  # D conv_0 class with conditioning, non-square
        (2, 16, 16, 7, 64),  # odd channel count, bigger spatial
        (3, 8, 8, 32, 64),  # interior-conv shape (engine still exact)
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_and_grads_match_plain(b, h, w, cin, cout, dtype):
    x, wk = _inputs(dtype, b=b, h=h, w=w, cin=cin, cout=cout)

    y_ref = X.conv2d(x, wk, stride=2)
    y_new = X.conv2d_s2d(x, wk, stride=2)
    assert y_new.shape == y_ref.shape == (b, h // 2, w // 2, cout)
    assert y_new.dtype == y_ref.dtype

    def loss_ref(x, wk):
        return jnp.sum(jnp.sin(X.conv2d(x, wk, stride=2)))

    def loss_new(x, wk):
        return jnp.sum(jnp.sin(X.conv2d_s2d(x, wk, stride=2)))

    (dx_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    (dx_n, dw_n) = jax.grad(loss_new, argnums=(0, 1))(x, wk)
    assert dx_n.dtype == x.dtype and dw_n.dtype == wk.dtype

    if dtype == jnp.float32:
        tol = dict(rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new), **tol)
        np.testing.assert_allclose(np.asarray(dx_r), np.asarray(dx_n), **tol)
        # dw accumulates over b*h*w terms; scale the atol to the gradient
        # magnitude (near-zero elements see pure cancellation noise).
        dw_scale = float(np.abs(np.asarray(dw_r)).max())
        np.testing.assert_allclose(
            np.asarray(dw_r), np.asarray(dw_n), rtol=2e-5,
            atol=2e-5 * max(dw_scale, 1.0),
        )
    else:
        # bf16 compute rounds each engine's differently-associated MACs;
        # agree to bf16 resolution of the magnitudes.
        for r, n in ((y_ref, y_new), (dx_r, dx_n), (dw_r, dw_n)):
            rf, nf = np.asarray(r, np.float32), np.asarray(n, np.float32)
            scale = np.abs(rf).max()
            np.testing.assert_allclose(rf, nf, atol=0.02 * scale, rtol=0.02)


@pytest.mark.parametrize(
    "stride,k,padding,h",
    [(3, 4, "SAME", 9), (2, 3, "SAME", 8), (2, 4, "VALID", 8), (1, 4, "SAME", 8),
     (2, 4, "SAME", 7)],  # odd spatial: SAME pads (1, 2), off the phase split
)
def test_off_envelope_falls_back_bit_identical(stride, k, padding, h):
    """Off k=4/stride-2/SAME/even-H the engine must return the plain path's
    exact HLO (the Pallas permanent-fallback idiom) — bit-identical."""
    x, wk = _inputs(jnp.float32, h=h, w=h, k=k)
    y_ref = X.conv2d(x, wk, stride=stride, padding=padding)
    y_new = X.conv2d_s2d(x, wk, stride=stride, padding=padding)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))


def test_contradictions_rejected_at_op_and_config():
    x, wk = _inputs(jnp.float32)
    with pytest.raises(ValueError, match="conv"):
        ops.conv2d(x, wk, stride=2, conv="bogus")
    with pytest.raises(ValueError, match="incompatible"):
        ops.conv2d(x, wk, stride=2, backend="pallas", conv="s2d")
    with pytest.raises(ValueError, match="incompatible"):
        ops.conv2d(x, wk, stride=2, wgrad="patches", conv="s2d")
    with pytest.raises(ValueError, match="incompatible"):
        ops.conv_norm_act(
            x, wk, None, jnp.zeros((16,)), stride=2,
            kind="none", act="none", wgrad="patches", conv="s2d",
        )
    with pytest.raises(ValueError, match="conv0"):
        ModelConfig(conv0="bogus")
    with pytest.raises(ValueError, match="incompatible"):
        ModelConfig(backend="pallas", conv0="s2d")
    with pytest.raises(ValueError, match="incompatible"):
        ModelConfig(wgrad="patches", conv0="s2d")


def _tiny_model(conv0):
    return ModelConfig(
        image_size=16,
        g_levels=2,
        g_base_channels=8,
        d_levels=2,
        d_base_channels=8,
        group_norm_groups=4,
        compute_dtype="float32",
        conv0=conv0,
    )


def test_generator_and_discriminator_forward_invariant():
    """Same params, same inputs: both models' outputs are engine-invariant
    (the level-0 convs sit on the k=4/stride-2/SAME/even envelope)."""
    from action_conditioned_gans_tpu.models import Discriminator, Generator

    frame = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    nxt = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 3), jnp.float32)
    action = jnp.asarray(np.random.RandomState(1).randn(2, 4), jnp.float32)

    g_ref = Generator(_tiny_model("xla"))
    g_params = g_ref.init(jax.random.PRNGKey(0), frame, action)
    y_ref = g_ref.apply(g_params, frame, action)
    y_new = Generator(_tiny_model("s2d")).apply(g_params, frame, action)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_new), rtol=2e-5, atol=2e-5
    )

    d_ref = Discriminator(_tiny_model("xla"))
    d_params = d_ref.init(jax.random.PRNGKey(0), nxt, frame, action)
    l_ref = d_ref.apply(d_params, nxt, frame, action)
    l_new = Discriminator(_tiny_model("s2d")).apply(d_params, nxt, frame, action)
    np.testing.assert_allclose(
        np.asarray(l_ref), np.asarray(l_new), rtol=2e-5, atol=2e-5
    )


def test_train_step_with_s2d_conv0():
    """One fused G+D step with conv0='s2d' stays numerically on top of the
    default engine (same rng, same batch)."""
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.train.state import init_state
    from action_conditioned_gans_tpu.train.step import make_train_step

    def cfg_for(conv0):
        return Config(
            name="conv0-test",
            model=_tiny_model(conv0),
            data=DataConfig(seq_len=2),
            train=TrainConfig(batch_size=4, rollout_length=1),
        )

    batch = generate_clips(jax.random.PRNGKey(1), 4, 2, 16, 4)
    rng = jax.random.PRNGKey(2)
    metrics = {}
    for eng in ("xla", "s2d"):
        cfg = cfg_for(eng)
        state = init_state(cfg, jax.random.PRNGKey(0))
        _, m = jax.jit(make_train_step(cfg))(state, batch, rng)
        metrics[eng] = {k: float(v) for k, v in m.items()}
    for key in ("g_loss", "d_loss", "g_recon"):
        np.testing.assert_allclose(
            metrics["xla"][key], metrics["s2d"][key], rtol=1e-4,
            err_msg=key,
        )
