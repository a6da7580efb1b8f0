"""Loss unit tests: the softplus forms equal the naive sigmoid-CE
definitions (the reference's losses, SURVEY.md §3 row 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from action_conditioned_gans_tpu.train import losses as L


def naive_ce(logits, target):
    p = jax.nn.sigmoid(logits)
    return -(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))


def test_discriminator_loss_matches_naive_ce():
    k = jax.random.PRNGKey(0)
    real = jax.random.normal(k, (64,)) * 2
    fake = jax.random.normal(jax.random.fold_in(k, 1), (64,)) * 2
    got = float(L.discriminator_loss(real, fake))
    want = float(jnp.mean(naive_ce(real, 1.0)) + jnp.mean(naive_ce(fake, 0.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_generator_adv_loss_matches_naive_ce():
    fake = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 2
    got = float(L.generator_adv_loss(fake))
    want = float(jnp.mean(naive_ce(fake, 1.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_losses_stable_at_extreme_logits():
    # the softplus form must not produce inf/nan where naive CE would
    real = jnp.array([80.0, -80.0])
    fake = jnp.array([-80.0, 80.0])
    assert np.isfinite(float(L.discriminator_loss(real, fake)))
    assert np.isfinite(float(L.generator_adv_loss(fake)))


def test_reconstruction_losses():
    a = jnp.zeros((2, 3))
    b = jnp.full((2, 3), 2.0)
    assert float(L.reconstruction_loss(a, b, "l2")) == 4.0
    assert float(L.reconstruction_loss(a, b, "l1")) == 2.0
    try:
        L.reconstruction_loss(a, b, "huber")
        assert False, "unknown kind must raise"
    except ValueError:
        pass


def test_discriminator_accuracy():
    real = jnp.array([1.0, -1.0, 2.0, 3.0])  # 3/4 classified real
    fake = jnp.array([-1.0, -2.0, 1.0, -3.0])  # 3/4 classified fake
    ra, fa = L.discriminator_accuracy(real, fake)
    assert float(ra) == 0.75 and float(fa) == 0.75


def test_one_sided_label_smoothing():
    """CE(x, 1-eps) expands to (1-eps)*softplus(-x) + eps*softplus(x); only
    the real term softens, and eps=0 is exactly the hard-label loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from action_conditioned_gans_tpu.train import losses as L

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.standard_normal(64), jnp.float32)
    fake = jnp.asarray(rng.standard_normal(64), jnp.float32)

    base = L.discriminator_loss(real, fake)
    eps = 0.1
    smoothed = L.discriminator_loss(real, fake, eps)
    # Manual cross-entropy against soft target p=1-eps on the real side.
    p = 1.0 - eps
    sig = jax.nn.sigmoid(real)
    manual_real = -jnp.mean(p * jnp.log(sig) + (1 - p) * jnp.log1p(-sig))
    manual = manual_real + jnp.mean(jax.nn.softplus(fake))
    np.testing.assert_allclose(float(smoothed), float(manual), rtol=1e-5)
    assert float(L.discriminator_loss(real, fake, 0.0)) == float(base)
    # Smoothing penalizes overconfident-real predictions: with strongly
    # positive real logits the smoothed loss exceeds the hard-label loss.
    conf = jnp.full((64,), 5.0)
    assert float(L.discriminator_loss(conf, fake, eps)) > float(
        L.discriminator_loss(conf, fake)
    )


def test_label_smoothing_through_train_step():
    import dataclasses

    import jax
    import numpy as np

    from tests.test_train_step import make_batch, tiny_config
    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import jit_train_step

    cfg = tiny_config(d_label_smooth=0.1)
    state = init_state(cfg, jax.random.PRNGKey(0))
    _, m = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values())


def test_hinge_losses():
    """Hinge math pins: margins relu(1-real)+relu(1+fake) for D, -mean for
    G; and the knob trains through the fused step while rejecting the
    CE-only label-smooth combination."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from action_conditioned_gans_tpu.train import losses as L

    real = jnp.array([2.0, 0.5, -1.0], jnp.float32)
    fake = jnp.array([-2.0, 0.5, 1.0], jnp.float32)
    want_d = np.mean([0.0, 0.5, 2.0]) + np.mean([0.0, 1.5, 2.0])
    np.testing.assert_allclose(
        float(L.discriminator_hinge_loss(real, fake)), want_d, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(L.generator_hinge_adv_loss(fake)), -float(np.mean([-2.0, 0.5, 1.0])),
        rtol=1e-6,
    )

    from tests.test_train_step import make_batch, tiny_config
    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import jit_train_step

    cfg = tiny_config(gan_loss="hinge")
    state = init_state(cfg, jax.random.PRNGKey(0))
    _, m = jit_train_step(cfg)(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values())

    with pytest.raises(ValueError, match="d_label_smooth"):
        jit_train_step(tiny_config(gan_loss="hinge", d_label_smooth=0.1))
    with pytest.raises(ValueError, match="gan_loss"):
        jit_train_step(tiny_config(gan_loss="wasserstein"))
