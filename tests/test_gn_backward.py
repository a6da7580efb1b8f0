"""GroupNorm custom-backward equivalence (VERDICT r2 lever 1c) and
bf16-Adam-moment equivalence (lever 1a): the perf knobs must be numerical
no-ops (within dtype tolerance) vs the plain AD / f32 paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.ops import xla as X
from action_conditioned_gans_tpu.ops.gn import group_norm_act

ACTS = ["lrelu", "relu", "tanh", "none"]


def _inputs(dtype, b=2, h=6, w=6, c=16, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    x = jax.random.normal(k1, (b, h, w, c), jnp.float32).astype(dtype)
    scale = jax.random.uniform(k2, (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    ct = jax.random.normal(k4, (b, h, w, c), jnp.float32).astype(dtype)
    return x, scale, bias, ct


@pytest.mark.parametrize("act", ACTS)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bitwise_matches_plain_composite(act, dtype):
    x, scale, bias, _ = _inputs(dtype)
    ref = X.norm_act(x, scale, bias, kind="group", groups=4, act=act)
    for backward in ("fused", "pallas"):
        got = group_norm_act(
            x, scale, bias, groups=4, act=act, backward=backward
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("act", ACTS)
@pytest.mark.parametrize("backward", ["fused", "pallas"])
def test_backward_matches_ad(act, backward):
    """vjp cotangents (dx, dscale, dbias) of the closed-form backward equal
    plain autodiff through the composite (f32, tight tolerance)."""
    x, scale, bias, ct = _inputs(jnp.float32)

    def ref_fn(x, s, b):
        return X.norm_act(x, s, b, kind="group", groups=4, act=act)

    def new_fn(x, s, b):
        return group_norm_act(x, s, b, groups=4, act=act, backward=backward)

    _, ref_vjp = jax.vjp(ref_fn, x, scale, bias)
    _, new_vjp = jax.vjp(new_fn, x, scale, bias)
    for r, n, name in zip(ref_vjp(ct), new_vjp(ct), ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(n), atol=2e-5, rtol=2e-5, err_msg=name
        )


@pytest.mark.parametrize("backward", ["fused", "pallas"])
def test_backward_bf16_within_kernel_tolerance(backward):
    """bf16 activations: the saved-output activation mask and f32 statistics
    keep grads within the 1e-3-ish kernel-parity bar (BASELINE.json)."""
    x, scale, bias, ct = _inputs(jnp.bfloat16, c=32)

    def ref_fn(x, s, b):
        return X.norm_act(x, s, b, kind="group", groups=8, act="lrelu")

    def new_fn(x, s, b):
        return group_norm_act(x, s, b, groups=8, act="lrelu", backward=backward)

    _, ref_vjp = jax.vjp(ref_fn, x, scale, bias)
    _, new_vjp = jax.vjp(new_fn, x, scale, bias)
    for r, n, name in zip(ref_vjp(ct), new_vjp(ct), ("dx", "dscale", "dbias")):
        r = np.asarray(r, np.float32)
        n = np.asarray(n, np.float32)
        tol = 2e-2 * max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(r, n, atol=tol, err_msg=name)


def test_non_divisible_groups_resolve_like_composite():
    x, _, _, ct = _inputs(jnp.float32, c=12)
    scale = jnp.ones((12,), jnp.float32)
    bias = jnp.zeros((12,), jnp.float32)
    # groups=32 resolves to a divisor of 12 in both paths.
    ref = X.norm_act(x, scale, bias, kind="group", groups=32, act="lrelu")
    got = group_norm_act(x, scale, bias, groups=32, act="lrelu", backward="fused")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    _, rv = jax.vjp(lambda a: X.norm_act(a, scale, bias, kind="group", groups=32), x)
    _, nv = jax.vjp(
        lambda a: group_norm_act(a, scale, bias, groups=32, backward="fused"), x
    )
    np.testing.assert_allclose(
        np.asarray(rv(ct)[0]), np.asarray(nv(ct)[0]), atol=2e-5
    )


def test_train_step_equivalent_across_gn_backends():
    """Full fused G+D step: gn_backward='fused'/'pallas' reproduce the 'ad'
    step's metrics and updated params (f32)."""
    from action_conditioned_gans_tpu.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import make_train_step

    def run(gn_backward):
        cfg = Config(
            name=f"gnb-{gn_backward}",
            model=ModelConfig(
                image_size=16,
                g_levels=2,
                g_base_channels=8,
                d_levels=2,
                d_base_channels=8,
                group_norm_groups=4,
                compute_dtype="float32",
                gn_backward=gn_backward,
            ),
            data=DataConfig(seq_len=2),
            train=TrainConfig(batch_size=4, rollout_length=1),
        )
        state = init_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg))
        batch = generate_clips(jax.random.PRNGKey(1), 4, 2, 16, 4)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(2))
        return state, metrics

    ref_state, ref_m = run("ad")
    for backward in ("fused", "pallas"):
        st, m = run(backward)
        for k in ref_m:
            np.testing.assert_allclose(
                float(m[k]), float(ref_m[k]), atol=1e-4, err_msg=k
            )
        for rl, nl in zip(
            jax.tree_util.tree_leaves(ref_state.g_params),
            jax.tree_util.tree_leaves(st.g_params),
        ):
            np.testing.assert_allclose(
                np.asarray(rl), np.asarray(nl), atol=1e-4
            )


# ---------------------------------------------------------------------------
# Adam moment dtype (lever 1a)
# ---------------------------------------------------------------------------


def test_adam_moment_dtype_f32_matches_optax():
    import optax

    from action_conditioned_gans_tpu.train.state import scale_by_adam_moment_dtype

    params = {"a": jnp.arange(6.0).reshape(2, 3) / 7, "b": jnp.ones((4,))}
    grads = {"a": jnp.linspace(-1, 1, 6).reshape(2, 3), "b": jnp.full((4,), 0.3)}
    ref = optax.scale_by_adam(b1=0.5, b2=0.999)
    new = scale_by_adam_moment_dtype(0.5, 0.999, 1e-8, jnp.float32)
    rs, ns = ref.init(params), new.init(params)
    for i in range(3):
        ru, rs = ref.update(grads, rs)
        nu, ns = new.update(grads, ns)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(ru[k]), np.asarray(nu[k]), atol=1e-6, err_msg=k
            )


def test_adam_moment_dtype_bf16_stores_bf16_and_tracks_f32():
    from action_conditioned_gans_tpu.train.state import scale_by_adam_moment_dtype

    params = {"a": jnp.ones((8, 8))}
    grads = {"a": jnp.full((8, 8), 0.25)}
    tx = scale_by_adam_moment_dtype(0.9, 0.999, 1e-8, jnp.bfloat16)
    s = tx.init(params)
    assert s.mu["a"].dtype == jnp.bfloat16 and s.nu["a"].dtype == jnp.bfloat16
    u, s = tx.update(grads, s)
    assert s.mu["a"].dtype == jnp.bfloat16
    # Constant gradient: the bias-corrected first step is exactly -ish the
    # gradient direction regardless of moment precision.
    np.testing.assert_allclose(np.asarray(u["a"]), 1.0, atol=1e-2)


def test_train_step_runs_with_bf16_adam_moments():
    from action_conditioned_gans_tpu.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.train import init_state
    from action_conditioned_gans_tpu.train.step import make_train_step

    cfg = Config(
        name="bf16-moments",
        model=ModelConfig(
            image_size=16,
            g_levels=2,
            g_base_channels=8,
            d_levels=2,
            d_base_channels=8,
            group_norm_groups=4,
            compute_dtype="float32",
        ),
        data=DataConfig(seq_len=2),
        train=TrainConfig(batch_size=4, adam_moment_dtype="bfloat16"),
    )
    state = init_state(cfg, jax.random.PRNGKey(0))
    mu_leaves = jax.tree_util.tree_leaves(state.g_opt)
    assert any(l.dtype == jnp.bfloat16 for l in mu_leaves)
    step = jax.jit(make_train_step(cfg))
    batch = generate_clips(jax.random.PRNGKey(1), 4, 2, 16, 4)
    p0 = jax.tree_util.tree_leaves(state.g_params)[0]
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["g_loss"]))
    p1 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert float(jnp.abs(p1 - p0).max()) > 0  # params actually moved
    assert jax.tree_util.tree_leaves(state.g_params)[0].dtype == jnp.float32


@pytest.mark.parametrize("backward", ["fused", "pallas"])
def test_backward_matches_ad_at_leak_zero(backward):
    """leak=0 collapses negative pre-activations to out == 0, so the
    saved-output mask must be STRICT (r3 review: out >= 0 silently passed
    the full gradient through every negative unit)."""
    x, scale, bias, ct = _inputs(jnp.float32)

    def ref_fn(x, s, b):
        return X.norm_act(x, s, b, kind="group", groups=4, act="lrelu", leak=0.0)

    def new_fn(x, s, b):
        return group_norm_act(
            x, s, b, groups=4, act="lrelu", leak=0.0, backward=backward
        )

    _, ref_vjp = jax.vjp(ref_fn, x, scale, bias)
    _, new_vjp = jax.vjp(new_fn, x, scale, bias)
    for r, n, name in zip(ref_vjp(ct), new_vjp(ct), ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(n), atol=2e-5, rtol=2e-5, err_msg=name
        )


def test_negative_leak_rejected_by_saved_output_backward():
    x, scale, bias, ct = _inputs(jnp.float32)

    def new_fn(x, s, b):
        return group_norm_act(
            x, s, b, groups=4, act="lrelu", leak=-0.1, backward="fused"
        )

    with pytest.raises(ValueError, match="leak >= 0"):
        _, vjp = jax.vjp(new_fn, x, scale, bias)
        vjp(ct)


def test_dp_step_with_fused_gn_backward():
    """gn_backward='fused' composes with shard_map DP + the scheduled-
    sampling scan: its custom_vjp hits the same scan-transpose vma
    bookkeeping gap as wgrad='patches', so make_dp_train_step must include
    it in the check_vma opt-out (regression: this crashed with 'Scan carry
    input and output got mismatched varying manual axes')."""
    from action_conditioned_gans_tpu.config import (
        Config,
        DataConfig,
        MeshConfig,
        ModelConfig,
        TrainConfig,
    )
    from action_conditioned_gans_tpu.data import generate_clips
    from action_conditioned_gans_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )
    from action_conditioned_gans_tpu.train.state import init_state

    def run(gn):
        cfg = Config(
            name="t",
            model=ModelConfig(
                image_size=16,
                g_levels=2,
                g_base_channels=8,
                d_levels=2,
                d_base_channels=8,
                group_norm_groups=4,
                compute_dtype="float32",
                gn_backward=gn,
            ),
            data=DataConfig(seq_len=3),
            train=TrainConfig(
                batch_size=8,
                rollout_length=2,
                scheduled_sampling=True,
                remat_rollout=True,
            ),
            mesh=MeshConfig(data=8, model=1),
        )
        mesh = make_mesh(cfg.mesh)
        state = init_state(cfg, jax.random.PRNGKey(0))
        batch = generate_clips(jax.random.PRNGKey(1), 8, 3, 16, 4)
        step = make_dp_train_step(cfg, mesh)
        _, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(2))
        return {k: float(v) for k, v in m.items()}

    a, b = run("fused"), run("ad")
    for key in ("g_loss", "d_loss", "g_recon"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-5, err_msg=key)
