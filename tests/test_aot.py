"""AOT StableHLO serving artifacts (aot.py): export -> load -> parity.

The artifact's contract is "the serving container needs no model code" —
so every parity test compares the DESERIALIZED program's output against the
live Generator, and the symbolic-batch claim is tested by calling one
artifact at several batch sizes. Cross-platform lowering ("cpu","tpu") is
exercised at export time on the CPU suite platform (lowering for TPU needs
no TPU — that is the point of the feature).
"""

import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from action_conditioned_gans_tpu.aot import AotPredictor, export_stablehlo
from action_conditioned_gans_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from action_conditioned_gans_tpu.infer import Predictor
from action_conditioned_gans_tpu.train import init_state


def tiny_config(workdir: str, state_dim: int = 0) -> Config:
    return Config(
        name="tiny-aot",
        model=ModelConfig(
            image_size=16,
            g_levels=2,
            g_base_channels=8,
            d_levels=2,
            d_base_channels=8,
            group_norm_groups=4,
            compute_dtype="float32",
            state_dim=state_dim,
        ),
        data=DataConfig(seq_len=2),
        train=TrainConfig(batch_size=2),
        workdir=workdir,
    )


def _inputs(b, t=0, state_dim=0, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    frame = jax.random.uniform(ks[0], (b, 16, 16, 3), minval=-1, maxval=1)
    if t:
        action = jax.random.normal(ks[1], (b, t, 4))
        state = jax.random.normal(ks[2], (b, t, state_dim)) if state_dim else None
    else:
        action = jax.random.normal(ks[1], (b, 4))
        state = jax.random.normal(ks[2], (b, state_dim)) if state_dim else None
    return frame, action, state


def test_roundtrip_parity_and_symbolic_batch(tmp_path):
    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "g.aot")
    meta = export_stablehlo(cfg, state.g_params, path, rollout_length=3)
    assert meta["platforms"] == ["cpu", "tpu"]

    live = Predictor(cfg, state.g_params)
    p = AotPredictor(path)
    # One artifact, several batch sizes (the exported batch dim is symbolic).
    for b in (1, 2, 5):
        frame, action, _ = _inputs(b)
        np.testing.assert_allclose(
            np.asarray(p.predict(frame, action)),
            np.asarray(live.predict(frame, action)),
            atol=1e-6,
        )
    frame, actions, _ = _inputs(2, t=3)
    np.testing.assert_allclose(
        np.asarray(p.rollout(frame, actions)),
        np.asarray(live.rollout(frame, actions)),
        atol=1e-6,
    )


def test_state_conditioned_artifact(tmp_path):
    cfg = tiny_config(str(tmp_path), state_dim=3)
    state = init_state(cfg, jax.random.PRNGKey(1))
    path = str(tmp_path / "g.aot")
    export_stablehlo(cfg, state.g_params, path, rollout_length=2)

    live = Predictor(cfg, state.g_params)
    p = AotPredictor(path)
    frame, action, st = _inputs(2, state_dim=3)
    np.testing.assert_allclose(
        np.asarray(p.predict(frame, action, st)),
        np.asarray(live.predict(frame, action, st)),
        atol=1e-6,
    )
    frame, actions, sts = _inputs(2, t=2, state_dim=3)
    np.testing.assert_allclose(
        np.asarray(p.rollout(frame, actions, sts)),
        np.asarray(live.rollout(frame, actions, sts)),
        atol=1e-6,
    )
    # The state input is part of the exported signature, not optional.
    with pytest.raises(ValueError, match="state"):
        p.predict(frame, action)
    # A wrong STATES horizon gets the same friendly error as actions
    # (previously it surfaced as an opaque shape-refinement failure).
    with pytest.raises(ValueError, match="states horizon"):
        p.rollout(frame, actions, sts[:, :1])


def test_error_paths(tmp_path):
    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(2))
    path = str(tmp_path / "g.aot")
    export_stablehlo(cfg, state.g_params, path)  # predict-only

    p = AotPredictor(path)
    frame, action, _ = _inputs(2)
    with pytest.raises(ValueError, match="without a state"):
        p.predict(frame, action, jnp.zeros((2, 3)))
    with pytest.raises(ValueError, match="no rollout program"):
        p.rollout(frame, jnp.zeros((2, 3, 4)))

    path2 = str(tmp_path / "g2.aot")
    export_stablehlo(cfg, state.g_params, path2, rollout_length=4)
    p2 = AotPredictor(path2)
    with pytest.raises(ValueError, match="horizon"):
        p2.rollout(frame, jnp.zeros((2, 3, 4)))  # exported T=4, called T=3
    # No .tmp staging file left behind by the atomic publish.
    import os as _os

    assert not _os.path.exists(path2 + ".tmp")

    # Unknown format version refuses loudly instead of misparsing.
    bad = str(tmp_path / "bad.aot")
    with zipfile.ZipFile(path, "r") as zin, zipfile.ZipFile(bad, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "meta.json":
                m = json.loads(data)
                m["format_version"] = 999
                data = json.dumps(m).encode()
            zout.writestr(name, data)
    with pytest.raises(ValueError, match="unsupported artifact format"):
        AotPredictor(bad)


def test_mesh_dp_serving_matches_single_device(tmp_path):
    """AotPredictor(mesh=...) shards serving batches over the data axis;
    outputs match the unmeshed artifact and actually span all devices."""
    from action_conditioned_gans_tpu.config import MeshConfig
    from action_conditioned_gans_tpu.parallel.mesh import make_mesh

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(4))
    path = str(tmp_path / "g.aot")
    export_stablehlo(cfg, state.g_params, path, rollout_length=2)

    single = AotPredictor(path)
    meshed = AotPredictor(path, mesh=make_mesh(MeshConfig(data=8, model=1)))
    frame, action, _ = _inputs(8)
    got = meshed.predict(frame, action)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(single.predict(frame, action)), atol=1e-5
    )
    frame, actions, _ = _inputs(8, t=2)
    np.testing.assert_allclose(
        np.asarray(meshed.rollout(frame, actions)),
        np.asarray(single.rollout(frame, actions)),
        atol=1e-5,
    )
    with pytest.raises(ValueError, match="divisible"):
        meshed.predict(*_inputs(3)[:2])


def test_cli_export_stablehlo(tmp_path, capsys):
    from action_conditioned_gans_tpu.cli import main
    from action_conditioned_gans_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(f"{cfg.workdir}/checkpoints")
    mgr.save(3, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()

    overrides = []
    for o in (
        "model.image_size=16", "model.g_levels=2", "model.g_base_channels=8",
        "model.d_levels=2", "model.d_base_channels=8",
        "model.group_norm_groups=4", "model.compute_dtype=float32",
        "train.batch_size=2",
    ):
        overrides += ["--set", o]
    # --rollout-length with the npz format would silently drop the rollout
    # program the user asked for: refuse instead.
    with pytest.raises(SystemExit) as exc:
        main(
            ["export", "--preset", "config1", "--workdir", str(tmp_path),
             "--rollout-length", "2"] + overrides
        )
    assert exc.value.code == 2
    capsys.readouterr()

    out = str(tmp_path / "generator.aot")
    rc = main(
        ["export", "--preset", "config1", "--workdir", str(tmp_path),
         "--out", out, "--format", "stablehlo", "--rollout-length", "2"]
        + overrides
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["format"] == "stablehlo" and rec["rollout_lengths"] == [2]

    live = Predictor(cfg, state.g_params)
    p = AotPredictor(out)
    frame, action, _ = _inputs(2)
    np.testing.assert_allclose(
        np.asarray(p.predict(frame, action)),
        np.asarray(live.predict(frame, action)),
        atol=1e-6,
    )


def test_multi_horizon_artifact(tmp_path):
    """One artifact bundling several rollout horizons: rollout() dispatches
    on the action sequence length; an unexported T errors listing the
    available horizons."""
    cfg = tiny_config(str(tmp_path))
    state = init_state(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "g.aot")
    meta = export_stablehlo(cfg, state.g_params, path, rollout_length=[4, 2])
    assert meta["rollout_lengths"] == [2, 4]
    assert meta["rollout_length"] == 4  # back-compat display field = max

    live = Predictor(cfg, state.g_params)
    p = AotPredictor(path)
    assert p.rollout_lengths == [2, 4]
    for t in (2, 4):
        frame, actions, _ = _inputs(2, t=t)
        np.testing.assert_allclose(
            np.asarray(p.rollout(frame, actions)),
            np.asarray(live.rollout(frame, actions)),
            atol=1e-6,
        )
    frame, actions, _ = _inputs(2, t=3)
    with pytest.raises(ValueError, match=r"horizons are \[2, 4\]"):
        p.rollout(frame, actions)
