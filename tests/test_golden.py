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
    want = dict(
        f_mean=-0.05107,
        f_std=0.32844,
        a_mean=-0.01226,
        a_absmean=0.08787,
        s_mean=0.36903,
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
