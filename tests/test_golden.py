"""Golden-value drift guards (SURVEY.md §5.1/§5.5): the seeded synthetic
data stream and a fixed-seed generator forward pass are pinned to recorded
statistics. If these move, either jax/XLA numerics changed or someone
changed the data/model semantics — both should be a conscious decision
(update the constants in the same commit and say why).

Recorded on CPU, float32, jax 0.9.0, 2026-08-16. Tolerances are loose
enough for cross-version rounding drift but tight enough to catch semantic
changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from action_conditioned_gans_tpu.config import ModelConfig
from action_conditioned_gans_tpu.data import generate_clips
from action_conditioned_gans_tpu.models import Generator


def test_synthetic_clip_statistics_pinned():
    b = generate_clips(jax.random.PRNGKey(42), 4, 6, 32, 4)
    f = np.asarray(b["frames"], np.float64)
    a = np.asarray(b["actions"], np.float64)
    s = np.asarray(b["states"], np.float64)
    got = dict(
        f_mean=f.mean(),
        f_std=f.std(),
        a_mean=a.mean(),
        a_absmean=np.abs(a).mean(),
        s_mean=s.mean(),
    )
    # Regenerated r2b: the k_bg key-reuse fix changed background colors and
    # the states contract moved to at-source-frame (pre-action) semantics.
    want = dict(
        f_mean=-0.01721,
        f_std=0.23585,
        a_mean=-0.01226,
        a_absmean=0.08787,
        s_mean=0.36790,
    )
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=2e-3, err_msg=k)


def test_generator_forward_pinned():
    cfg = ModelConfig(
        image_size=16,
        g_levels=2,
        g_base_channels=8,
        group_norm_groups=4,
        compute_dtype="float32",
    )
    gen = Generator(cfg)
    frame = jnp.linspace(-1, 1, 2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    action = jnp.asarray([[0.1, -0.2, 0.3, 0.0], [0.0, 0.5, -0.5, 1.0]], jnp.float32)
    params = gen.init(jax.random.PRNGKey(7), frame, action)
    out = np.asarray(gen.apply(params, frame, action), np.float64)
    np.testing.assert_allclose(out.mean(), 0.01044, atol=2e-3)
    np.testing.assert_allclose(out.std(), 0.06716, atol=2e-3)


def test_train_step_loss_trajectory_golden():
    """Four fused steps at a pinned tiny f32 config reproduce the recorded
    (d_loss, g_loss, g_recon) trajectory — a drift guard over the ENTIRE
    step semantics (rollout fold, vjp chaining, D-before-G ordering, rng
    folding, Adam). Tolerance is loose enough for cross-platform float
    reassociation but catches any semantic change. Regenerate deliberately
    if semantics change on purpose (see git history of these values)."""
    import jax

    from tests.test_train_step import make_batch, tiny_config

    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import jit_train_step

    # Regenerated r2b with the synthetic-data fixes (k_bg split, states at
    # source frame).
    golden = [
        (1.403255, 1.531947, 0.075054),
        (1.400398, 1.732495, 0.102866),
        (1.400784, 1.614021, 0.087148),
        (1.372578, 1.408354, 0.064585),
    ]
    cfg = tiny_config(rollout_length=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jit_train_step(cfg)
    for i, (d, g, r) in enumerate(golden):
        state, m = step(state, make_batch(cfg, seed=i), jax.random.PRNGKey(100))
        np.testing.assert_allclose(float(m["d_loss"]), d, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(float(m["g_loss"]), g, atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(float(m["g_recon"]), r, atol=2e-4, rtol=1e-3)
