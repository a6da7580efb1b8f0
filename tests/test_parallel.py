"""Distributed tests without a cluster (SURVEY.md §5.4): 8 virtual CPU
devices via --xla_force_host_platform_device_count (set in conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.config import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.data import generate_clips
from action_conditioned_gans_tpu.parallel import (
    make_dp_train_step,
    make_gspmd_train_step,
    make_mesh,
    shard_batch,
    tp_param_pspec,
)
from action_conditioned_gans_tpu.train import init_state
from action_conditioned_gans_tpu.train.step import jit_train_step


def tiny_config(batch_size=8, **mesh_kw) -> Config:
    return Config(
        name="tiny-dp",
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
        train=TrainConfig(batch_size=batch_size),
        mesh=MeshConfig(**mesh_kw) if mesh_kw else MeshConfig(),
    )


def make_batch(cfg, seed=0):
    return generate_clips(
        jax.random.PRNGKey(seed),
        cfg.train.batch_size,
        cfg.train.rollout_length + 1,
        cfg.model.image_size,
        cfg.model.action_dim,
    )


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def test_dp_step_matches_single_device():
    """psum-reduced DP step == single-device step on the concatenated batch."""
    cfg = tiny_config(batch_size=8)
    mesh = make_mesh(cfg.mesh)
    assert mesh.shape["data"] == 8

    state_sd = init_state(cfg, jax.random.PRNGKey(0))
    state_dp = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    new_sd, m_sd = jit_train_step(cfg)(state_sd, batch, rng)

    dp_step = make_dp_train_step(cfg, mesh)
    new_dp, m_dp = dp_step(state_dp, shard_batch(batch, mesh), rng)

    # NOTE: per-example losses are means over the local shard then pmean'd —
    # equal to the global mean since shards are equal-sized.
    np.testing.assert_allclose(float(m_sd["d_loss"]), float(m_dp["d_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_sd["g_loss"]), float(m_dp["g_loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_sd.g_params),
        jax.tree_util.tree_leaves(new_dp.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dp_multiple_steps_stable():
    cfg = tiny_config(batch_size=8)
    mesh = make_mesh(cfg.mesh)
    state = init_state(cfg, jax.random.PRNGKey(0))
    dp_step = make_dp_train_step(cfg, mesh)
    for i in range(3):
        state, metrics = dp_step(state, shard_batch(make_batch(cfg, i), mesh), jax.random.PRNGKey(i))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["g_loss"]))


def test_gspmd_dp_tp_step_runs():
    """4x2 dp x tp mesh: conv channels sharded over 'model', XLA inserts the
    collectives; losses must match the single-device step."""
    cfg = tiny_config(batch_size=8, data=4, model=2)
    mesh = make_mesh(cfg.mesh)
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    ref_state = init_state(cfg, jax.random.PRNGKey(0))
    _, m_ref = jit_train_step(cfg)(ref_state, batch, rng)

    step = make_gspmd_train_step(cfg, mesh, state)
    new_state, metrics = step(state, batch, rng)
    assert int(new_state.step) == 1
    np.testing.assert_allclose(float(m_ref["g_loss"]), float(metrics["g_loss"]), rtol=2e-3)

    # At least one conv kernel is actually sharded over the model axis.
    shardings = jax.tree_util.tree_map(lambda x: x.sharding.spec, new_state.g_params)
    specs = jax.tree_util.tree_leaves(shardings, is_leaf=lambda s: True)
    assert any("model" in str(s) for s in map(str, specs))


def test_indivisible_batch_raises_clearly():
    import pytest as _pytest

    cfg = tiny_config(batch_size=3)  # 3 % 8 devices != 0
    mesh = make_mesh(cfg.mesh)
    with _pytest.raises(ValueError, match="divisible"):
        make_dp_train_step(cfg, mesh)


def test_tp_param_pspec_rules():
    mk = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    assert tp_param_pspec(mk((4, 4, 8, 16)), "model", 2) == jax.sharding.PartitionSpec(
        None, None, None, "model"
    )
    assert tp_param_pspec(mk((16,)), "model", 2) == jax.sharding.PartitionSpec("model")
    # indivisible or tiny -> replicated
    assert tp_param_pspec(mk((4, 4, 8, 3)), "model", 2) == jax.sharding.PartitionSpec()
    assert tp_param_pspec(mk((3,)), "model", 2) == jax.sharding.PartitionSpec()
    assert tp_param_pspec(mk((4, 4, 8, 16)), "model", 1) == jax.sharding.PartitionSpec()


def test_dp_composes_with_pallas_backend():
    """The fused Pallas kernels run inside the shard_map DP step (per-device
    batch shard -> per-sample kernel grid) and match the XLA backend."""
    import dataclasses

    cfg = tiny_config(batch_size=8)
    cfg_p = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backend="pallas")
    )
    mesh = make_mesh(cfg.mesh)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    st_x = init_state(cfg, jax.random.PRNGKey(0))
    _, m_x = make_dp_train_step(cfg, mesh)(st_x, shard_batch(batch, mesh), rng)
    st_p = init_state(cfg_p, jax.random.PRNGKey(0))
    _, m_p = make_dp_train_step(cfg_p, mesh)(st_p, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(
        float(m_x["g_loss"]), float(m_p["g_loss"]), rtol=1e-3
    )


def test_tp_mesh_forces_xla_backend():
    """GSPMD cannot partition pallas_call: the trainer must fall back."""
    import dataclasses

    from action_conditioned_gans_tpu.train.loop import build_step_and_state

    cfg = tiny_config(batch_size=8, data=4, model=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backend="pallas")
    )
    mesh, state, step_fn = build_step_and_state(cfg)
    batch = make_batch(cfg)
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["g_loss"]))


def ss_config(batch_size=8, start=1.0, end=1.0, rollout=3):
    return Config(
        name="tiny-ss",
        model=ModelConfig(
            image_size=16,
            g_levels=2,
            g_base_channels=8,
            d_levels=2,
            d_base_channels=8,
            group_norm_groups=4,
            compute_dtype="float32",
        ),
        data=DataConfig(seq_len=rollout + 1),
        train=TrainConfig(
            batch_size=batch_size,
            rollout_length=rollout,
            scheduled_sampling=True,
            ss_start_prob=start,
            ss_end_prob=end,
        ),
        mesh=MeshConfig(),
    )


def test_scheduled_sampling_dp_matches_single_device_at_prob_one():
    """VERDICT r1 weak item 6: DP folds axis_index into the rng, so with
    0<ss<1 the Bernoulli draws differ per shard. At ss_prob=1 the draw is
    deterministic (bernoulli(key, 1) is always True), so the rng fold must be
    a provable no-op: DP == single-device exactly."""
    cfg = ss_config(start=1.0, end=1.0)
    mesh = make_mesh(cfg.mesh)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    state_sd = init_state(cfg, jax.random.PRNGKey(0))
    state_dp = init_state(cfg, jax.random.PRNGKey(0))
    new_sd, m_sd = jit_train_step(cfg)(state_sd, batch, rng)
    new_dp, m_dp = make_dp_train_step(cfg, mesh)(state_dp, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(m_sd["g_loss"]), float(m_dp["g_loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_sd.g_params),
        jax.tree_util.tree_leaves(new_dp.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_scheduled_sampling_dp_divergence_is_deterministic():
    """With 0<ss<1 DP INTENTIONALLY diverges from single-device (per-shard
    Bernoulli decorrelation, docs/ARCHITECTURE.md): pin that the divergence
    exists AND that the DP run itself is seed-deterministic."""
    cfg = ss_config(start=0.5, end=0.5)
    mesh = make_mesh(cfg.mesh)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    def dp_run():
        st = init_state(cfg, jax.random.PRNGKey(0))
        _, m = make_dp_train_step(cfg, mesh)(st, shard_batch(batch, mesh), rng)
        return float(m["g_loss"])

    st_sd = init_state(cfg, jax.random.PRNGKey(0))
    _, m_sd = jit_train_step(cfg)(st_sd, batch, rng)
    a, b = dp_run(), dp_run()
    assert a == b  # seed-deterministic
    assert abs(a - float(m_sd["g_loss"])) > 1e-7  # decorrelated draws differ


def test_sync_batchnorm_under_dp():
    """'batch' norm psum-syncs moments: DP result == global-batch result."""
    import dataclasses

    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, norm="batch"))
    mesh = make_mesh(cfg.mesh)

    state_sd = init_state(cfg, jax.random.PRNGKey(0))
    state_dp = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)
    _, m_sd = jit_train_step(cfg)(state_sd, batch, rng)
    _, m_dp = make_dp_train_step(cfg, mesh)(state_dp, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(m_sd["g_loss"]), float(m_dp["g_loss"]), rtol=2e-4)


def test_make_mesh_explicit_submesh_on_nondivisor():
    """data x model grids smaller than the device count are legal even when
    model does not divide the device count (r3 review: 2x3 on 8 devices was
    rejected by an auto-division-only check)."""
    from action_conditioned_gans_tpu.config import MeshConfig

    mesh = make_mesh(MeshConfig(data=2, model=3))
    assert mesh.shape == {"data": 2, "model": 3}


def test_dp_step_rejects_model_axis():
    """shard_map DP on a dp x tp mesh would silently duplicate the full step
    across the model axis; it must refuse and point at gspmd."""
    from action_conditioned_gans_tpu.config import MeshConfig

    cfg = tiny_config(batch_size=4)
    mesh = make_mesh(MeshConfig(data=2, model=2))
    with pytest.raises(ValueError, match="gspmd"):
        make_dp_train_step(cfg, mesh)


def test_disc_microbatch_under_dp_matches_single_device():
    """Regression for the r4 config5 preset-sweep failure: the microbatch
    chunk scans' scalar accumulators start as replicated zeros but come out
    of the body data-varying, so under shard_map's check_vma typing the scan
    carry types mismatched ("float32[] vs float32[]{V:data}") and the DP
    path could not even trace. _chunk_scan now pcasts the carry inits to
    varying; pin both that it traces AND that the chunked DP step still
    equals the unchunked single-device step (grad-accumulation exactness
    composed with the psum reduction)."""
    import dataclasses

    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, seq_len=3),
        train=dataclasses.replace(
            cfg.train, rollout_length=2, disc_microbatch=1
        ),
    )
    mesh = make_mesh(cfg.mesh)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    cfg_full = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, disc_microbatch=0)
    )
    state_sd = init_state(cfg_full, jax.random.PRNGKey(0))
    state_dp = init_state(cfg, jax.random.PRNGKey(0))
    new_sd, m_sd = jit_train_step(cfg_full)(state_sd, batch, rng)
    new_dp, m_dp = make_dp_train_step(cfg, mesh)(state_dp, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(m_sd["d_loss"]), float(m_dp["d_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_sd["g_loss"]), float(m_dp["g_loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_sd.g_params),
        jax.tree_util.tree_leaves(new_dp.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


# --- Knob-matrix trace coverage (VERDICT r4 next-step 6 / weak 2) ---------
#
# The r4 lesson: make_dp_train_step + disc_microbatch>0 could not even TRACE
# from r2 until the last r4 commit, because no test exercised that cell of
# the knob x parallel-mode matrix. Every training knob must at least trace
# and produce finite losses under BOTH parallel modes (shard_map DP and
# GSPMD dp x tp); a cell that cannot is either fixed or config-rejected at
# build with a clear error — never discovered by an on-chip sweep again.

KNOB_CELLS = {
    "r1": dict(train=dict(r1_weight=1.0)),
    "augment": dict(train=dict(d_augment="color,translation,cutout")),
    "hinge": dict(train=dict(gan_loss="hinge")),
    "label_smooth": dict(train=dict(d_label_smooth=0.1)),
    "schedule_clip": dict(
        train=dict(
            lr_schedule="cosine",
            warmup_steps=2,
            lr_decay_steps=8,
            lr_end_factor=0.1,
            grad_clip_norm=1.0,
        )
    ),
    "microbatch": dict(
        train=dict(disc_microbatch=2, rollout_length=2), data=dict(seq_len=3)
    ),
    "spectral_norm": dict(model=dict(d_spectral_norm=True)),
    "deconv_subpixel": dict(model=dict(deconv="subpixel")),
    "conv0_s2d": dict(model=dict(conv0="s2d")),
    # The stacked cell: every D-side knob at once, microbatched — the kind
    # of combination a real stability-tuning run would use.
    "r1_augment_microbatch": dict(
        train=dict(
            r1_weight=1.0,
            d_augment="color,translation",
            disc_microbatch=2,
            rollout_length=2,
        ),
        data=dict(seq_len=3),
    ),
}


def _apply_cell(cfg, cell):
    import dataclasses

    for section, kv in cell.items():
        cfg = dataclasses.replace(
            cfg, **{section: dataclasses.replace(getattr(cfg, section), **kv)}
        )
    return cfg


@pytest.mark.parametrize("mode", ["dp", "gspmd"])
@pytest.mark.parametrize("knob", sorted(KNOB_CELLS))
def test_knob_matrix_traces_and_is_finite(knob, mode):
    cfg = tiny_config(batch_size=8, **({"data": 4, "model": 2} if mode == "gspmd" else {}))
    cfg = _apply_cell(cfg, KNOB_CELLS[knob])
    mesh = make_mesh(cfg.mesh)
    state = init_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)
    if mode == "dp":
        step = make_dp_train_step(cfg, mesh)
        new_state, metrics = step(state, shard_batch(batch, mesh), rng)
    else:
        step = make_gspmd_train_step(cfg, mesh, state)
        new_state, metrics = step(state, batch, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


# Every check_vma-opted-out configuration (parallel/dp.py: custom-vjp
# engines cannot carry the vma annotation) loses the replication-
# verification safety net, so each must carry its own DP-vs-single-device
# equivalence pin instead (VERDICT r4 weak 3): the pmean'd DP step on the
# sharded batch equals the single-device step on the full batch.
CUSTOM_VJP_CELLS = {
    "wgrad_patches": dict(model=dict(wgrad="patches")),
    "gn_fused": dict(model=dict(gn_backward="fused")),
    "pallas": dict(model=dict(backend="pallas")),
}


@pytest.mark.parametrize("cell", sorted(CUSTOM_VJP_CELLS))
def test_custom_vjp_backend_dp_matches_single_device(cell):
    cfg = _apply_cell(tiny_config(batch_size=8), CUSTOM_VJP_CELLS[cell])
    mesh = make_mesh(cfg.mesh)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    state_sd = init_state(cfg, jax.random.PRNGKey(0))
    state_dp = init_state(cfg, jax.random.PRNGKey(0))
    new_sd, m_sd = jit_train_step(cfg)(state_sd, batch, rng)
    new_dp, m_dp = make_dp_train_step(cfg, mesh)(
        state_dp, shard_batch(batch, mesh), rng
    )
    np.testing.assert_allclose(float(m_sd["d_loss"]), float(m_dp["d_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_sd["g_loss"]), float(m_dp["g_loss"]), rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_sd.g_params),
        jax.tree_util.tree_leaves(new_dp.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_r1_penalty_microbatched_under_dp_runs():
    """R1's second-order grads through the microbatch chunk scan must also
    type-check under shard_map's vma rules (the r1 accumulator shares the
    pcast fix) and produce finite losses."""
    import dataclasses

    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, seq_len=3),
        train=dataclasses.replace(
            cfg.train, rollout_length=2, disc_microbatch=2, r1_weight=1.0
        ),
    )
    mesh = make_mesh(cfg.mesh)
    state = init_state(cfg, jax.random.PRNGKey(0))
    _, metrics = make_dp_train_step(cfg, mesh)(
        state, shard_batch(make_batch(cfg), mesh), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["d_loss"]))
    assert float(metrics["d_r1"]) > 0.0
