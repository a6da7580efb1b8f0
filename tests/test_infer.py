"""Inference API tests: checkpoint -> Predictor -> single-step + rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from action_conditioned_gans_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from action_conditioned_gans_tpu.infer import Predictor
from action_conditioned_gans_tpu.train import init_state
from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager


def tiny_config(workdir: str) -> Config:
    return Config(
        name="tiny-infer",
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
        train=TrainConfig(batch_size=2),
        workdir=workdir,
    )


def test_predictor_from_checkpoint(tmp_path):
    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{cfg.workdir}/checkpoints")
    mgr.save(5, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    p = Predictor.from_checkpoint(cfg)
    frame = jnp.zeros((2, 16, 16, 3), jnp.float32)
    action = jnp.ones((2, 4), jnp.float32)

    nxt = p.predict(frame, action)
    assert nxt.shape == frame.shape
    assert float(jnp.max(jnp.abs(nxt))) <= 1.0

    actions = jnp.ones((2, 5, 4), jnp.float32)
    clip = p.rollout(frame, actions)
    assert clip.shape == (2, 5, 16, 16, 3)

    # rollout step 1 equals a single predict on the same inputs
    np.testing.assert_allclose(
        np.asarray(clip[:, 0]), np.asarray(nxt), atol=1e-6
    )


def test_predictor_rollout_feeds_back(tmp_path):
    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(1))
    p = Predictor(cfg, state.g_params)
    frame = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3), minval=-1, maxval=1)
    actions = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4))
    clip = np.asarray(p.rollout(frame, actions))
    # autoregression: consecutive predictions differ (model isn't identity)
    assert np.abs(clip[:, 1] - clip[:, 0]).max() > 0


def test_predictor_use_ema(tmp_path):
    """Predictor(use_ema=True) serves the EMA tree; raises cleanly when the
    checkpoint has none."""
    import dataclasses

    import pytest

    cfg = tiny_config(str(tmp_path))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, ema_decay=0.5))
    state = init_state(cfg, jax.random.PRNGKey(0))
    # Make EMA distinguishable from the raw params.
    state = state.replace(
        g_ema=jax.tree_util.tree_map(lambda x: x + 0.01, state.g_params)
    )
    mgr = CheckpointManager(f"{cfg.workdir}/checkpoints")
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    raw = Predictor.from_checkpoint(cfg)
    ema = Predictor.from_checkpoint(cfg, use_ema=True)
    frame = jnp.zeros((2, 16, 16, 3), jnp.float32)
    action = jnp.ones((2, 4), jnp.float32)
    assert float(jnp.max(jnp.abs(raw.predict(frame, action) - ema.predict(frame, action)))) > 0

    cfg_off = tiny_config(str(tmp_path / "off"))
    s2 = init_state(cfg_off, jax.random.PRNGKey(0))
    m2 = CheckpointManager(f"{cfg_off.workdir}/checkpoints")
    m2.save(1, jax.device_get(s2), force=True)
    m2.wait()
    m2.close()
    with pytest.raises(ValueError, match="no EMA"):
        Predictor.from_checkpoint(cfg_off, use_ema=True)


def test_predictor_use_ema_without_decay_in_config(tmp_path):
    """An EMA checkpoint must be loadable with use_ema=True even when the
    CALLER's config has ema_decay=0 (the restore template is force-widened
    to contain the g_ema subtree)."""
    import dataclasses

    train_cfg = dataclasses.replace(
        tiny_config(str(tmp_path)),
        train=dataclasses.replace(tiny_config(str(tmp_path)).train, ema_decay=0.9),
    )
    state = init_state(train_cfg, jax.random.PRNGKey(0))
    state = state.replace(
        g_ema=jax.tree_util.tree_map(lambda x: x + 0.01, state.g_params)
    )
    mgr = CheckpointManager(f"{train_cfg.workdir}/checkpoints")
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    plain_cfg = tiny_config(str(tmp_path))  # ema_decay == 0
    assert plain_cfg.train.ema_decay == 0.0
    ema = Predictor.from_checkpoint(plain_cfg, use_ema=True)
    raw = Predictor.from_checkpoint(plain_cfg)
    frame = jnp.zeros((2, 16, 16, 3), jnp.float32)
    action = jnp.ones((2, 4), jnp.float32)
    diff = float(jnp.max(jnp.abs(raw.predict(frame, action) - ema.predict(frame, action))))
    assert diff > 0


def test_predictor_raw_load_of_plain_checkpoint_under_ema_config(tmp_path):
    """use_ema=False with an EMA-configured cfg must still load a checkpoint
    trained WITHOUT EMA (the fallback retries with the NARROWED template —
    it once retried with the identical widened one and re-failed)."""
    import dataclasses

    plain_cfg = tiny_config(str(tmp_path))
    state = init_state(plain_cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{plain_cfg.workdir}/checkpoints")
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    ema_cfg = dataclasses.replace(
        plain_cfg, train=dataclasses.replace(plain_cfg.train, ema_decay=0.999)
    )
    p = Predictor.from_checkpoint(ema_cfg)  # must not raise
    frame = jnp.zeros((2, 16, 16, 3), jnp.float32)
    action = jnp.ones((2, 4), jnp.float32)
    assert p.predict(frame, action).shape == frame.shape


def test_predictor_use_ema_surfaces_real_restore_error(tmp_path):
    """ADVICE r2: with use_ema=True, a restore failure that is NOT an
    EMA-structure mismatch (here: checkpoint from a different model
    geometry) must surface the real error, not be rewrapped as
    'checkpoint has no EMA weights'."""
    import dataclasses

    import pytest

    big_cfg = dataclasses.replace(
        tiny_config(str(tmp_path)),
        model=dataclasses.replace(tiny_config(str(tmp_path)).model, g_base_channels=16),
    )
    state = init_state(big_cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{big_cfg.workdir}/checkpoints")
    mgr.save(1, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    with pytest.raises(Exception) as ei:
        Predictor.from_checkpoint(tiny_config(str(tmp_path)), use_ema=True)
    assert "no EMA weights" not in str(ei.value)


def test_export_npz_round_trip(tmp_path):
    """export_generator -> Predictor.from_npz reproduces from_checkpoint
    predictions exactly, with the architecture reconstructed from the
    embedded ModelConfig (no cfg passed)."""
    from action_conditioned_gans_tpu.infer import export_generator

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(3))
    path = str(tmp_path / "g.npz")
    export_generator(cfg, state.g_params, path)

    ref = Predictor(cfg, state.g_params)
    loaded = Predictor.from_npz(path)
    assert loaded.cfg.model.image_size == cfg.model.image_size
    frame = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3), minval=-1, maxval=1)
    action = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    np.testing.assert_allclose(
        np.asarray(ref.predict(frame, action)),
        np.asarray(loaded.predict(frame, action)),
        atol=1e-6,
    )


def test_from_npz_deconv_is_runtime_only(tmp_path):
    """An archive exported from a deconv='subpixel' training run must NOT
    override the serving host's engine choice when a cfg is passed (the
    ADVICE r3 wgrad lesson: an archive records how the model was trained,
    not how this host should execute it) — and the predictions are engine-
    invariant anyway (tests/test_deconv.py pins the math)."""
    import dataclasses

    from action_conditioned_gans_tpu.infer import export_generator

    cfg = tiny_config(str(tmp_path))
    cfg_sub = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, deconv="subpixel")
    )
    state = init_state(cfg_sub, jax.random.PRNGKey(3))
    path = str(tmp_path / "g_subpixel.npz")
    export_generator(cfg_sub, state.g_params, path)

    # cfg=None: the archive's engine is adopted (trained-with defaults).
    assert Predictor.from_npz(path).cfg.model.deconv == "subpixel"
    # cfg passed: the host's engine survives.
    loaded = Predictor.from_npz(path, cfg=cfg)
    assert loaded.cfg.model.deconv == "xla"
    frame = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3), minval=-1, maxval=1)
    action = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    np.testing.assert_allclose(
        np.asarray(Predictor(cfg_sub, state.g_params).predict(frame, action)),
        np.asarray(loaded.predict(frame, action)),
        atol=1e-5,
    )


def test_from_npz_conv0_is_runtime_only(tmp_path):
    """Same runtime-only rule for the conv0 engine (mirror of the deconv
    test above; math invariance pinned in tests/test_conv0.py)."""
    import dataclasses

    from action_conditioned_gans_tpu.infer import export_generator

    cfg = tiny_config(str(tmp_path))
    cfg_s2d = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv0="s2d")
    )
    state = init_state(cfg_s2d, jax.random.PRNGKey(3))
    path = str(tmp_path / "g_s2d.npz")
    export_generator(cfg_s2d, state.g_params, path)

    # cfg=None: the archive's engine is adopted (trained-with defaults).
    assert Predictor.from_npz(path).cfg.model.conv0 == "s2d"
    # cfg passed: the host's engine survives.
    loaded = Predictor.from_npz(path, cfg=cfg)
    assert loaded.cfg.model.conv0 == "xla"
    frame = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3), minval=-1, maxval=1)
    action = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    np.testing.assert_allclose(
        np.asarray(Predictor(cfg_s2d, state.g_params).predict(frame, action)),
        np.asarray(loaded.predict(frame, action)),
        atol=1e-5,
    )


def test_cli_export_and_errors(tmp_path, capsys):
    import json as _json

    import pytest

    from action_conditioned_gans_tpu.cli import main
    from action_conditioned_gans_tpu.infer import Predictor as P

    overrides = []
    for o in (
        "model.image_size=16", "model.g_levels=2", "model.g_base_channels=8",
        "model.d_levels=2", "model.d_base_channels=8",
        "model.group_norm_groups=4", "model.compute_dtype=float32",
        "train.batch_size=2",
    ):
        overrides += ["--set", o]

    # No checkpoint -> argparse error, not an init-weights artifact.
    with pytest.raises(SystemExit) as exc:
        main(["export", "--preset", "config1", "--workdir", str(tmp_path)] + overrides)
    assert exc.value.code == 2
    capsys.readouterr()

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{cfg.workdir}/checkpoints")
    mgr.save(7, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    out = str(tmp_path / "exported.npz")
    assert (
        main(
            ["export", "--preset", "config1", "--workdir", str(tmp_path), "--out", out]
            + overrides
        )
        == 0
    )
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["exported"] == out
    p = P.from_npz(out)
    frame = jnp.zeros((1, 16, 16, 3), jnp.float32)
    action = jnp.ones((1, 4), jnp.float32)
    assert p.predict(frame, action).shape == frame.shape


def test_predictor_sharded_serving_matches_single_device(tmp_path):
    """Mesh-sharded serving (dp8 and dp4xtp2) reproduces the unmeshed
    predictions; parameters actually shard over the model axis under TP."""
    from jax.sharding import PartitionSpec as P

    from action_conditioned_gans_tpu.config import MeshConfig
    from action_conditioned_gans_tpu.parallel.mesh import make_mesh

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(2))
    ref = Predictor(cfg, state.g_params)
    frame = jax.random.uniform(jax.random.PRNGKey(0), (8, 16, 16, 3), minval=-1, maxval=1)
    action = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    actions = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 4))
    want_next = np.asarray(ref.predict(frame, action))
    want_clip = np.asarray(ref.rollout(frame, actions))

    for data, model in ((8, 1), (4, 2)):
        mesh = make_mesh(MeshConfig(data=data, model=model))
        p = ref.with_mesh(mesh)
        got_next = p.predict(frame, action)
        # The computation really ran distributed over the whole mesh.
        assert len(got_next.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(got_next), want_next, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(p.rollout(frame, actions)), want_clip, atol=1e-5
        )
        if model > 1:
            specs = {
                s
                for s in jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(
                        lambda x: x.sharding.spec, p.g_params
                    ),
                    is_leaf=lambda s: isinstance(s, P),
                )
            }
            assert P(None, None, None, "model") in specs, specs


def test_predictor_sharded_batch_divisibility_error(tmp_path):
    import pytest

    from action_conditioned_gans_tpu.config import MeshConfig
    from action_conditioned_gans_tpu.parallel.mesh import make_mesh

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    p = Predictor(cfg, state.g_params, mesh=make_mesh(MeshConfig(data=8, model=1)))
    with pytest.raises(ValueError, match="divisible"):
        p.predict(
            jnp.zeros((3, 16, 16, 3), jnp.float32), jnp.ones((3, 4), jnp.float32)
        )
