"""HTTP inference server (serve.py): round-trips, parity with the direct
predictor call, and error paths — over both the live Predictor and an AOT
artifact."""

import threading

import jax
import numpy as np
import pytest

from action_conditioned_gans_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
from action_conditioned_gans_tpu.infer import Predictor
from action_conditioned_gans_tpu.models import Generator
from action_conditioned_gans_tpu.serve import (
    build_predictor,
    client_predict,
    client_rollout,
    make_server,
)


def tiny_cfg(state_dim=0) -> Config:
    return Config(
        name="tiny",
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
    )


def make_params(cfg):
    m = cfg.model
    gen = Generator(m)
    frame = np.zeros((1, m.image_size, m.image_size, m.image_channels), np.float32)
    action = np.zeros((1, m.action_dim), np.float32)
    state = np.zeros((1, m.state_dim), np.float32) if m.state_dim else None
    return gen.init(jax.random.PRNGKey(0), frame, action, state)["params"]


@pytest.fixture(scope="module")
def live_server():
    cfg = tiny_cfg()
    predictor = Predictor(cfg, make_params(cfg))
    srv = make_server(predictor, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}"
    yield url, predictor, cfg
    srv.shutdown()
    srv.server_close()


def test_healthz(live_server):
    import json
    import urllib.request

    url, _, cfg = live_server
    with urllib.request.urlopen(url + "/healthz") as r:
        meta = json.loads(r.read())
    assert meta["ok"] is True
    assert meta["image_size"] == cfg.model.image_size
    assert meta["action_dim"] == cfg.model.action_dim


def test_predict_matches_direct_call(live_server):
    url, predictor, cfg = live_server
    rng = np.random.default_rng(0)
    frame = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    action = rng.standard_normal((2, cfg.model.action_dim)).astype(np.float32)
    via_http = client_predict(url, frame, action)
    direct = np.asarray(predictor.predict(frame, action))
    np.testing.assert_array_equal(via_http, direct)


def test_rollout_matches_direct_call(live_server):
    url, predictor, cfg = live_server
    rng = np.random.default_rng(1)
    frame0 = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    actions = rng.standard_normal((2, 3, cfg.model.action_dim)).astype(np.float32)
    via_http = client_rollout(url, frame0, actions)
    direct = np.asarray(predictor.rollout(frame0, actions))
    assert via_http.shape == (2, 3, 16, 16, 3)
    np.testing.assert_array_equal(via_http, direct)


def test_uint8_encoding_roundtrip(live_server):
    """?encoding=uint8: the response body shrinks ~4x and the client's
    transparent decode lands within one quantization step (2/255 wide →
    max error 1/255) of the float32 response."""
    import urllib.request

    from action_conditioned_gans_tpu.serve import _dump_npz

    url, predictor, cfg = live_server
    rng = np.random.default_rng(3)
    frame = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    action = rng.standard_normal((4, cfg.model.action_dim)).astype(np.float32)

    exact = client_predict(url, frame, action)
    quant = client_predict(url, frame, action, encoding="uint8")
    assert quant.dtype == np.float32
    assert np.max(np.abs(quant - exact)) <= 1.0 / 255.0 + 1e-6

    # The wire payload really is ~4x smaller (raw responses, same inputs).
    body = _dump_npz(frame=frame, action=action)

    def body_len(path):
        req = urllib.request.Request(url + path, data=body)
        with urllib.request.urlopen(req) as r:
            return len(r.read())

    n_f32, n_u8 = body_len("/predict"), body_len("/predict?encoding=uint8")
    assert n_u8 < n_f32 / 3.5

    # Rollout takes the flag too.
    actions = rng.standard_normal((2, 3, cfg.model.action_dim)).astype(np.float32)
    out = client_rollout(url, frame[:2], actions, encoding="uint8")
    direct = np.asarray(predictor.rollout(frame[:2], actions))
    assert out.shape == direct.shape
    assert np.max(np.abs(out - direct)) <= 1.0 / 255.0 + 1e-6


def test_bfloat16_predictor_serves_native_wire_dtypes():
    """The real presets run compute_dtype=bfloat16; npz has no bf16 (it
    round-trips as an unusable V2 void dtype), so the server must cast the
    response to float32 — the wire dtype must not leak the device compute
    dtype. Caught live by the r5 CPU verify drive against a config1-preset
    checkpoint."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    predictor = Predictor(cfg, make_params(cfg))
    srv = make_server(predictor, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        rng = np.random.default_rng(4)
        frame = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        action = rng.standard_normal((2, cfg.model.action_dim)).astype(
            np.float32
        )
        out = client_predict(url, frame, action)
        assert out.dtype == np.float32
        direct = np.asarray(predictor.predict(frame, action), np.float32)
        np.testing.assert_array_equal(out, direct)
        # uint8 quantization handles the bf16 source too.
        quant = client_predict(url, frame, action, encoding="uint8")
        assert quant.dtype == np.float32
        assert np.max(np.abs(quant - direct)) <= 1.0 / 255.0 + 1e-6
    finally:
        srv.shutdown()
        srv.server_close()


def test_unknown_encoding_is_refused(live_server):
    import json
    import urllib.error
    import urllib.request

    from action_conditioned_gans_tpu.serve import _dump_npz

    url, _, _ = live_server
    req = urllib.request.Request(
        url + "/predict?encoding=float16",
        data=_dump_npz(frame=np.zeros((1, 16, 16, 3), np.float32)),
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "encoding" in json.loads(e.value.read())["error"]


def test_error_paths(live_server):
    import json
    import urllib.error
    import urllib.request

    url, _, _ = live_server
    # Unknown route -> 404.
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(url + "/nope")
    assert e.value.code == 404
    # Not an npz body -> 400 naming the problem.
    req = urllib.request.Request(url + "/predict", data=b"not-npz")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "npz" in json.loads(e.value.read())["error"]
    # Missing input array -> 400 naming the absent key.
    from action_conditioned_gans_tpu.serve import _dump_npz

    req = urllib.request.Request(
        url + "/predict",
        data=_dump_npz(frame=np.zeros((2, 16, 16, 3), np.float32)),
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "missing input array" in json.loads(e.value.read())["error"]


def test_keepalive_connection_survives_errors(live_server):
    """HTTP/1.1 keep-alive: an errored POST must drain its body, or the
    leftover bytes get parsed as the next request line on the same
    connection."""
    import http.client

    from action_conditioned_gans_tpu.serve import _dump_npz

    url, _, _ = live_server
    conn = http.client.HTTPConnection(url.split("//")[1])
    try:
        body = _dump_npz(frame=np.zeros((1, 16, 16, 3), np.float32))
        conn.request("POST", "/nope", body=body)
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # The SAME connection still serves the next request.
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200
        r2.read()
    finally:
        conn.close()


def test_oversized_body_is_refused(live_server):
    """Content-Length beyond the cap -> 413 without buffering the body."""
    import http.client

    url, _, _ = live_server
    conn = http.client.HTTPConnection(url.split("//")[1])
    try:
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", str(50 * 2**30))
        conn.endheaders()
        r = conn.getresponse()
        assert r.status == 413
    finally:
        conn.close()


def test_negative_content_length_is_refused(live_server):
    """Negative Content-Length would turn rfile.read into read-until-EOF —
    a handler-thread DoS; must 400 immediately instead."""
    import http.client

    url, _, _ = live_server
    conn = http.client.HTTPConnection(url.split("//")[1])
    try:
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        r = conn.getresponse()
        assert r.status == 400
    finally:
        conn.close()


def test_meshed_predictor_serves_over_http():
    """serve × mesh: an HTTP request through a dp4×tp2 Predictor returns
    exactly the unmeshed result (the dryrun pins meshed serving in-process;
    this pins it through the endpoint — placement/fetch of sharded outputs
    happens inside the handler's np.asarray)."""
    from action_conditioned_gans_tpu.config import MeshConfig
    from action_conditioned_gans_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg()
    params = make_params(cfg)
    meshed = Predictor(cfg, params, mesh=make_mesh(MeshConfig(data=4, model=2)))
    plain = Predictor(cfg, params)
    srv = make_server(meshed, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        rng = np.random.default_rng(5)
        frame0 = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
        actions = rng.standard_normal((4, 3, cfg.model.action_dim)).astype(
            np.float32
        )
        via_http = client_rollout(url, frame0, actions)
        direct = np.asarray(plain.rollout(frame0, actions))
        np.testing.assert_allclose(via_http, direct, atol=1e-5)
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_serve_requires_explicit_source():
    """Bare `acgan serve` must refuse (cfg.workdir's /tmp default would
    otherwise silently serve a stale checkpoint)."""
    import pytest as _pytest

    from action_conditioned_gans_tpu.cli import main

    with _pytest.raises(SystemExit) as exc:
        main(["serve"])
    assert exc.value.code == 2


def test_aot_artifact_server(tmp_path):
    from action_conditioned_gans_tpu.aot import export_stablehlo

    cfg = tiny_cfg(state_dim=3)
    params = make_params(cfg)
    path = str(tmp_path / "gen.aot")
    export_stablehlo(cfg, params, path, rollout_length=3)

    import argparse

    args = argparse.Namespace(artifact=path, workdir=None, ema=False)
    predictor = build_predictor(args, cfg)
    srv = make_server(predictor, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        rng = np.random.default_rng(2)
        frame0 = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        actions = rng.standard_normal((2, 3, cfg.model.action_dim)).astype(np.float32)
        states = rng.standard_normal((2, 3, 3)).astype(np.float32)
        out = client_rollout(url, frame0, actions, states)
        direct = np.asarray(predictor.rollout(frame0, actions, states))
        np.testing.assert_array_equal(out, direct)
        # The artifact's own horizon error surfaces as a 400 with its text.
        with pytest.raises(RuntimeError, match="horizon"):
            client_rollout(url, frame0, actions[:, :1], states[:, :1])
        # State-conditioned artifact refuses a stateless request.
        with pytest.raises(RuntimeError, match="state"):
            client_rollout(url, frame0, actions)
    finally:
        srv.shutdown()
        srv.server_close()


def test_cli_serve_subprocess(tmp_path):
    """`acgan serve --artifact ... --port 0` end-to-end in a subprocess:
    banner JSON advertises the bound port; /healthz and /predict answer."""
    import json
    import os
    import subprocess
    import sys
    import time
    import urllib.request

    from action_conditioned_gans_tpu.aot import export_stablehlo

    cfg = tiny_cfg()
    path = str(tmp_path / "gen.aot")
    export_stablehlo(cfg, make_params(cfg), path, platforms=("cpu",))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from action_conditioned_gans_tpu.cli import main; "
        f"main(['serve','--artifact',{path!r},'--port','0'])"
    )
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    try:
        banner = json.loads(proc.stdout.readline())
        url = banner["serving"]
        assert banner["backend"] == "AotPredictor"
        deadline = time.time() + 60
        while True:
            try:
                with urllib.request.urlopen(url + "/healthz", timeout=5) as r:
                    assert json.loads(r.read())["ok"] is True
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.5)
        out = client_predict(
            url,
            np.zeros((2, 16, 16, 3), np.float32),
            np.zeros((2, cfg.model.action_dim), np.float32),
        )
        assert out.shape == (2, 16, 16, 3)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_build_predictor_npz_route(tmp_path):
    from action_conditioned_gans_tpu.infer import export_generator

    cfg = tiny_cfg()
    params = make_params(cfg)
    path = str(tmp_path / "gen.npz")
    export_generator(cfg, params, path)

    import argparse

    args = argparse.Namespace(artifact=path, workdir=None, ema=False)
    predictor = build_predictor(args, cfg)
    assert isinstance(predictor, Predictor)
    frame = np.zeros((2, 16, 16, 3), np.float32)
    action = np.zeros((2, cfg.model.action_dim), np.float32)
    assert np.asarray(predictor.predict(frame, action)).shape == (2, 16, 16, 3)
