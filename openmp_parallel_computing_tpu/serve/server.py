"""Synchronous HTTP serving surface.

Capability twin of the reference microservice (``microservices/grayscale/
app.py:10-45``): ``POST /<kernel>`` with a multipart ``image`` field and
optional form fields ``passes`` and ``threads`` (devices here), returning the
processed PNG with an ``X-Elapsed`` timing header. Differences, by design:

- no subprocess per request — the model lives device-resident behind a jit
  cache keyed on (kernel, shape, passes, devices);
- ``X-Elapsed`` mirrors the reference (whole server-side handling, decode +
  compute + encode); ``X-Compute`` additionally reports the device-only
  span, the analogue of the kernel-region timing in the monolithic driver
  (``monolithic/src/main.c:31-39``);
- implemented on the stdlib ThreadingHTTPServer (no Flask dependency).

Endpoints: POST /grayscale, /edge (fused sobel pipeline), /blur;
GET /healthz.
"""

from __future__ import annotations

import email.parser
import email.policy
import functools
import json
import tempfile
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from openmp_parallel_computing_tpu import imgio
from openmp_parallel_computing_tpu.ops.runner import (
    kernel_names,
    make_runner,
    pad_rows,
)
from openmp_parallel_computing_tpu.utils.config import ServeConfig
from openmp_parallel_computing_tpu.utils.metrics import registry as metrics

_warmed: set[tuple] = set()

# Compile-churn guards: on the single relayed TPU a first compile takes
# minutes, so arbitrary unauthenticated form values must not be able to
# serialize the server into back-to-back compiles. Every knob that keys a
# jit cache entry is clamped to a small allowlist; anything else is a 400.
ALLOWED_HORIZONS = (5, 10, 20, 50)
MAX_FEATURES = 16
MAX_PASSES = 100


def process_image(data_hwc: np.ndarray, kernel: str, passes: int,
                  devices: int, warm: bool = True
                  ) -> tuple[np.ndarray, float]:
    """Run the kernel pipeline; returns (result HWC u8, device seconds)."""
    chw, orig_h = pad_rows(jnp.asarray(np.transpose(data_hwc, (2, 0, 1))),
                           devices)
    key = (kernel, chw.shape, passes, devices)
    run = make_runner(kernel, passes, devices, orig_h=orig_h)
    if warm and key not in _warmed:
        _ = np.asarray(run(chw))  # keep compile out of X-Compute
        _warmed.add(key)
    t0 = time.perf_counter()
    out = np.asarray(run(chw))
    compute_s = time.perf_counter() - t0
    out = out[:, :orig_h, :]
    return np.transpose(out, (1, 2, 0)), compute_s


def _parse_multipart_ex(content_type: str, body: bytes):
    """Parse a multipart/form-data body.

    Returns ``(fields, filenames)``: text parts decoded to str, file parts
    kept as bytes, with each file part's original client filename in
    ``filenames[name]`` (the reference keys stored objects by it,
    ``event-driven/frontend/app.py:289``).
    """
    parser = email.parser.BytesParser(policy=email.policy.HTTP)
    msg = parser.parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body)
    fields: dict[str, bytes | str] = {}
    filenames: dict[str, str] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True)
        filename = part.get_filename()
        if filename is None and payload is not None:
            fields[name] = payload.decode(errors="replace").strip()
        else:
            fields[name] = payload or b""
            if filename:
                filenames[name] = filename
    return fields, filenames


def _parse_multipart(content_type: str, body: bytes):
    """Parse a multipart/form-data body into {field: bytes_or_str}."""
    return _parse_multipart_ex(content_type, body)[0]


@functools.lru_cache(maxsize=4)
def _mpc_engine(horizon: int, num_features: int):
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    return VisualServoMPC(MPCConfig(horizon=horizon,
                                    num_features=num_features))


def control_request(frame_hwc: np.ndarray, fields: dict) -> dict:
    """Real-time control endpoint body: frame + scenario state -> first
    controls (the MPC engine as a service; BASELINE's 'real-time control
    endpoint' replacing the batch-only reference surface)."""
    from openmp_parallel_computing_tpu.models.mpc import Scenario

    def parse(name):
        raw = fields.get(name)
        if raw is None:
            raise ValueError(f"missing field {name!r}")
        vec = np.asarray([float(v) for v in str(raw).split(",")],
                         np.float32)
        return vec

    p0 = parse("p0")
    target = parse("target")
    depth = parse("depth")
    horizon = int(fields.get("horizon", 20))
    if horizon not in ALLOWED_HORIZONS:
        raise ValueError(f"horizon must be one of {ALLOWED_HORIZONS}")
    m = depth.size
    if not 1 <= m <= MAX_FEATURES:
        raise ValueError(f"need 1..{MAX_FEATURES} features")
    if p0.size != 2 * m or target.size != 2 * m:
        raise ValueError("p0/target must have 2*len(depth) entries")
    mpc = _mpc_engine(horizon, m)
    scen = Scenario(
        p0=jnp.asarray(p0)[None], target=jnp.asarray(target)[None],
        depth=jnp.asarray(depth)[None],
        us0=jnp.zeros((1, horizon, 6), jnp.float32))
    chw = jnp.asarray(np.transpose(frame_hwc, (2, 0, 1)))
    t0 = time.perf_counter()
    u0, sol = mpc.control_step(chw, scen)
    u0 = np.asarray(u0)
    compute_s = time.perf_counter() - t0
    return {
        "u0": u0[0].tolist(),
        "cost": float(np.asarray(sol.cost)[0]),
        "primal_residual": float(np.asarray(sol.primal_residual)[0]),
        "compute_s": round(compute_s, 4),
    }


class Handler(BaseHTTPRequestHandler):
    server_version = "ompc-serve/0.1"

    def do_GET(self):
        if self.path == "/metricz":
            payload = json.dumps(metrics.snapshot()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        elif self.path == "/healthz":
            payload = json.dumps({
                "status": "ok",
                "backend": jax.default_backend(),
                "devices": len(jax.devices()),
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        else:
            self.send_error(404)

    def do_POST(self):
        kernel = self.path.strip("/")
        if kernel == "control":
            self._do_control()
            return
        if kernel not in kernel_names():
            self.send_error(404, f"unknown kernel {kernel!r}")
            return
        t_start = time.perf_counter()
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            fields = _parse_multipart(self.headers.get("Content-Type", ""),
                                      body)
            image = fields.get("image")
            if not isinstance(image, bytes) or not image:
                self.send_error(400, "missing multipart field 'image'")
                return
            passes = max(1, int(fields.get("passes", 1)))
            if passes > MAX_PASSES:
                self.send_error(400, f"passes > {MAX_PASSES}")
                return
            devices = max(1, min(int(fields.get("threads", 1)),
                                 len(jax.devices())))
            with tempfile.TemporaryDirectory() as td:
                src = Path(td) / "upload"
                src.write_bytes(image)
                decoded = imgio.load(src)
                out_hwc, compute_s = process_image(decoded, kernel, passes,
                                                   devices)
                dst = Path(td) / "out.png"
                # Low zlib level: identical pixels, ~4x faster encode —
                # PNG encoding dominates serving latency otherwise.
                imgio.save_png(dst, out_hwc, compression=1)
                png = dst.read_bytes()
        except Exception as exc:  # reference 500s with logged stderr
            metrics.inc("serve.errors")
            self.log_error("processing failed: %r", exc)
            self.send_error(500, str(exc))
            return
        elapsed = time.perf_counter() - t_start
        metrics.inc(f"serve.requests.{kernel}")
        metrics.observe("serve.request_s", elapsed)
        metrics.observe("serve.compute_s", compute_s)
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.send_header("Content-Length", str(len(png)))
        self.send_header("X-Elapsed", f"{elapsed:.4f}")
        self.send_header("X-Compute", f"{compute_s:.4f}")
        self.end_headers()
        self.wfile.write(png)

    def _do_control(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            fields = _parse_multipart(self.headers.get("Content-Type", ""),
                                      self.rfile.read(length))
            image = fields.get("image")
            if not isinstance(image, bytes) or not image:
                self.send_error(400, "missing multipart field 'image'")
                return
            with tempfile.TemporaryDirectory() as td:
                src = Path(td) / "frame"
                src.write_bytes(image)
                frame = imgio.load(src)
            result = control_request(frame, fields)
        except ValueError as exc:
            self.send_error(400, str(exc))
            return
        except Exception as exc:
            self.log_error("control failed: %r", exc)
            self.send_error(500, str(exc))
            return
        metrics.inc("serve.requests.control")
        metrics.observe("serve.control_s", result["compute_s"])
        payload = json.dumps(result).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, fmt, *args):  # quiet default request logging
        pass


def serve(cfg: ServeConfig | None = None) -> ThreadingHTTPServer:
    cfg = cfg or ServeConfig()
    httpd = ThreadingHTTPServer((cfg.host, cfg.port), Handler)
    return httpd


def main() -> None:
    from openmp_parallel_computing_tpu.utils.config import load

    cfg = load().serve
    httpd = serve(cfg)
    print(f"serving on {cfg.host}:{cfg.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
