"""Minimal HTTP inference server over a Predictor or an AOT artifact.

The reference's deployment story ends at ``sess.run(G, feed_dict=...)`` on a
restored checkpoint (SURVEY.md §4.2); a production deployment puts a request
loop in front of the compiled program. This is the rebuild's stdlib-only
equivalent — no web framework, no extra deps:

* ``GET /healthz``  → JSON: model geometry, serving backend, device kind.
* ``POST /predict`` → body npz ``{frame (B,H,W,C), action (B,A)[, state]}``,
  response npz ``{frames (B,H,W,C)}``.
* ``POST /rollout`` → body npz ``{frame0, actions (B,T,A)[, states]}``,
  response npz ``{frames (B,T,H,W,C)}``.

Arrays travel as ``np.savez`` archives (``application/x-npz``) — lossless,
zero-dependency on both ends (`client_predict`/`client_rollout` below wrap
``urllib``). Shape/horizon errors come back as 400s with the predictor's own
message; the platform's one-TPU-process rule (CLAUDE.md rule 2) is honored by
serializing all device work through one lock while the threaded server keeps
slow readers from blocking health checks.

``?encoding=uint8`` on either POST quantizes the response frames to uint8
with the data pipeline's own transform pair (encode
``round((clip(f,-1,1)+1)*127.5)``, decode ``u8/255*2-1`` — exactly what the
TFRecord writers/readers do, so the wire precision equals the training
data's). The r5 on-chip serve leg measured the float32 rollout response
(63 MB at B=128, T=10, 64²) to be transport-bound; uint8 cuts the body 4×.
The client helpers decode transparently and always return float32.

Works identically over the live jit path (``infer.Predictor``) and the
self-contained artifact (``aot.AotPredictor``) — both expose
``predict``/``rollout``, and ``build_predictor`` picks by CLI flags.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs

import numpy as np

_NPZ = "application/x-npz"
# Refuse request bodies beyond this (413): Content-Length is attacker-
# controlled once --host exposes the socket, and the handler buffers the
# body in RAM. 2 GiB covers any sane frame batch (config5 geometry at
# B=64, T=30 is ~1.5 GiB).
_MAX_BODY = 2 << 30


def _load_npz(body: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def _dump_npz(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def encode_frames(frames: np.ndarray) -> np.ndarray:
    """[-1,1] float → uint8, the TFRecord writers' transform
    (data/native_tfrecord.py:236)."""
    if frames.dtype.kind not in "fiu":  # ml_dtypes bfloat16 etc.
        frames = frames.astype(np.float32)
    return np.round((np.clip(frames, -1, 1) + 1) * 127.5).astype(np.uint8)


def decode_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 → [-1,1] float32, the readers' normalize
    (data/tfrecord.py:197)."""
    return frames.astype(np.float32) / 255.0 * 2.0 - 1.0


def predictor_meta(predictor) -> Dict[str, Any]:
    """Geometry/backend facts for /healthz, for either predictor kind."""
    import jax

    meta: Dict[str, Any] = {
        "device": jax.devices()[0].device_kind,
        "backend": type(predictor).__name__,
    }
    if hasattr(predictor, "meta"):  # AotPredictor: exported meta.json
        meta.update(
            {
                k: predictor.meta[k]
                for k in (
                    "image_size",
                    "image_channels",
                    "action_dim",
                    "state_dim",
                    "rollout_length",
                )
                if k in predictor.meta
            }
        )
    else:  # live Predictor: the config is authoritative
        m = predictor.cfg.model
        meta.update(
            image_size=m.image_size,
            image_channels=m.image_channels,
            action_dim=m.action_dim,
            state_dim=m.state_dim,
        )
    return meta


def make_server(predictor, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` picks a free one
    (read it back from ``server.server_port``)."""
    lock = threading.Lock()
    meta = predictor_meta(predictor)

    class Handler(BaseHTTPRequestHandler):
        server_version = "acgan-serve/1"
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, {"ok": True, **meta})
            else:
                self._send_json(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):
            # ALWAYS drain the body before responding: with HTTP/1.1
            # keep-alive, unread body bytes would be parsed as the next
            # request line, desyncing the connection.
            try:
                n = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                n = -1
            if n < 0:
                # Negative would make rfile.read() block until EOF — a
                # handler-thread DoS on a kept-alive connection.
                self.close_connection = True
                self._send_json(400, {"error": "bad Content-Length"})
                return
            if n > _MAX_BODY:
                self.close_connection = True
                self._send_json(
                    413, {"error": f"body of {n} bytes exceeds {_MAX_BODY}"}
                )
                return
            raw = self.rfile.read(n)
            path, _, query = self.path.partition("?")
            if path not in ("/predict", "/rollout"):
                self._send_json(404, {"error": f"unknown path {path!r}"})
                return
            encoding = parse_qs(query).get("encoding", ["float32"])[-1]
            if encoding not in ("float32", "uint8"):
                self._send_json(
                    400,
                    {"error": f"unknown encoding {encoding!r} (float32|uint8)"},
                )
                return
            try:
                arrays = _load_npz(raw)
            except Exception as e:
                self._send_json(
                    400, {"error": f"body is not an npz archive: {e}"}
                )
                return
            try:
                # One request on the device at a time (CLAUDE.md rule 2:
                # concurrent TPU work time-slices catastrophically). The
                # fetch (np.asarray) stays INSIDE the lock: jax dispatch is
                # async, so the predictor call alone only enqueues work.
                with lock:
                    if path == "/predict":
                        out = predictor.predict(
                            arrays["frame"],
                            arrays["action"],
                            arrays.get("state"),
                        )
                    else:
                        out = predictor.rollout(
                            arrays.get("frame0", arrays.get("frame")),
                            arrays["actions"],
                            arrays.get("states"),
                        )
                    out = np.asarray(out)
                # Quantization/casting happens OUTSIDE the lock: it's
                # host-side numpy work and must not extend the device's
                # critical section.
                if encoding == "uint8":
                    out = encode_frames(out)
                elif out.dtype.kind not in "fiu":
                    # npz has no bfloat16 (ml_dtypes registers it as a V2
                    # void dtype that np.load can't do math on) — the real
                    # presets run compute_dtype=bfloat16, so the wire dtype
                    # must not leak the device compute dtype. float32 is
                    # exact for bf16 values.
                    out = out.astype(np.float32)
                body = _dump_npz(frames=out)
            except KeyError as e:
                self._send_json(400, {"error": f"missing input array {e}"})
                return
            except (ValueError, TypeError, IndexError) as e:
                # The predictors' own shape/horizon/divisibility messages
                # (IndexError: a wrong-rank array indexed for a dim).
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — a 500 beats a reset
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, body, _NPZ)

    srv = ThreadingHTTPServer((host, port), Handler)
    # A wedged client connection must not block server shutdown.
    srv.daemon_threads = True
    srv.predictor_meta = meta  # reused by serve_forever's banner
    return srv


def build_predictor(args, cfg):
    """CLI glue: ``--artifact foo.aot`` loads the AOT program,
    ``--artifact foo.npz`` the portable weights archive (live jit path,
    no orbax/workdir needed); otherwise the live Predictor restores from
    ``--workdir``'s latest checkpoint."""
    from action_conditioned_gans_tpu.infer import Predictor

    artifact = getattr(args, "artifact", None)
    if artifact:
        if artifact.endswith(".npz"):
            # Pass the CLI-built cfg through: runtime-only knobs
            # (compute_dtype/backend/...) stay caller-controlled while the
            # architecture comes from the archive (from_npz's contract).
            return Predictor.from_npz(artifact, cfg=cfg)
        from action_conditioned_gans_tpu.aot import AotPredictor

        return AotPredictor(artifact)
    return Predictor.from_checkpoint(
        cfg, args.workdir, use_ema=bool(getattr(args, "ema", False))
    )


def serve_forever(predictor, host: str, port: int) -> None:
    srv = make_server(predictor, host, port)
    print(
        json.dumps(
            {"serving": f"http://{srv.server_address[0]}:{srv.server_port}", **srv.predictor_meta}
        ),
        flush=True,
    )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


# -- tiny stdlib client -------------------------------------------------------


def _post(url: str, arrays: Dict[str, np.ndarray]) -> np.ndarray:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=_dump_npz(**arrays), headers={"Content-Type": _NPZ}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            frames = _load_npz(resp.read())["frames"]
        if frames.dtype == np.uint8:  # ?encoding=uint8 response
            frames = decode_frames(frames)
        return frames
    except urllib.error.HTTPError as e:
        detail = e.read().decode(errors="replace")
        try:
            detail = json.loads(detail)["error"]
        except Exception:
            pass
        raise RuntimeError(f"server returned {e.code}: {detail}") from None


def _route(base_url: str, path: str, encoding: str) -> str:
    url = base_url.rstrip("/") + path
    return url + (f"?encoding={encoding}" if encoding != "float32" else "")


def client_predict(
    base_url: str, frame, action, state=None, encoding: str = "float32"
) -> np.ndarray:
    arrays = {"frame": np.asarray(frame), "action": np.asarray(action)}
    if state is not None:
        arrays["state"] = np.asarray(state)
    return _post(_route(base_url, "/predict", encoding), arrays)


def client_rollout(
    base_url: str, frame0, actions, states=None, encoding: str = "float32"
) -> np.ndarray:
    arrays = {"frame0": np.asarray(frame0), "actions": np.asarray(actions)}
    if states is not None:
        arrays["states"] = np.asarray(states)
    return _post(_route(base_url, "/rollout", encoding), arrays)
