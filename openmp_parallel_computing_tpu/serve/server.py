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
- implemented on the stdlib ThreadingHTTPServer (no Flask dependency);
- concurrent ``/control`` requests micro-batch into one device solve
  (``ControlBatcher``) and device work is bounded by a semaphore — the
  batched-serving design SURVEY §2a calls for, instead of the reference's
  one-subprocess-per-request model;
- a ``session`` form field binds a request sequence to carried
  receding-horizon state (warm-start plan + decayed ADMM duals,
  ``_SessionStore``) — the serving surface of ``MPCRuntime``'s carry,
  so a live controller is not re-solved from zero every frame.

Endpoints: POST /grayscale, /edge (fused sobel pipeline), /blur, /control;
GET /healthz, /metricz.
"""

from __future__ import annotations

import collections
import email.parser
import email.policy
import functools
import json
import math
import queue as queue_mod
import re
import tempfile
import threading
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
from openmp_parallel_computing_tpu.utils.httpguard import (
    BodyTooLarge,
    read_body,
)
from openmp_parallel_computing_tpu.utils.metrics import registry as metrics


class _WarmCache:
    """Thread-safe bounded once-per-key warm coordinator.

    ``claim(key)`` returns ``(event, owner)``: exactly one caller becomes
    the owner (runs the warm compile, then ``done(key)``); everyone else
    waits on the event *before* timing, so a concurrent first request can
    never charge the compile to its X-Compute span. A failed warm calls
    ``abort(key)`` so the next request retries instead of timing a cold
    executable forever. Bounded LRU so shape churn cannot grow it without
    limit.
    """

    def __init__(self, cap: int = 256):
        self._lock = threading.Lock()
        self._keys: collections.OrderedDict = collections.OrderedDict()
        self._cap = cap

    def claim(self, key) -> tuple[threading.Event, bool]:
        with self._lock:
            ev = self._keys.get(key)
            owner = ev is None
            if owner:
                ev = self._keys[key] = threading.Event()
            self._keys.move_to_end(key)
            while len(self._keys) > self._cap:
                self._keys.popitem(last=False)
            return ev, owner

    def done(self, key) -> None:
        with self._lock:
            ev = self._keys.get(key)
        if ev is not None:
            ev.set()

    def abort(self, key) -> None:
        with self._lock:
            ev = self._keys.pop(key, None)
        if ev is not None:
            ev.set()  # release waiters; they fall through and retry


def _ensure_warm(key, run_fn) -> None:
    """Warm-once barrier: owner compiles inside a device slot, others wait."""
    ev, owner = _warmed.claim(key)
    if owner:
        try:
            with _device_slots:
                run_fn()
        except Exception:
            _warmed.abort(key)
            raise
        _warmed.done(key)
    else:
        ev.wait(timeout=600.0)


class _ShapeGate:
    """Bounded admission of distinct image shapes on the HTTP surface.

    Every distinct frame shape keys new jit cache entries, and a first
    compile takes minutes on the single relayed TPU — so an unauthenticated
    client cycling image sizes could serialize the server into
    back-to-back compiles (the same churn the horizon/features/passes
    allowlists already prevent). First-come shapes are admitted up to
    ``cap``; after that only already-admitted shapes pass. A one-camera
    (or fixed-resolution fleet) deployment never notices the bound.
    """

    def __init__(self, cap: int = ServeConfig.max_shapes):
        self._lock = threading.Lock()
        self._shapes: set = set()
        self.cap = cap

    def admit(self, shape) -> bool:
        with self._lock:
            if shape in self._shapes:
                return True
            if len(self._shapes) >= self.cap:
                return False
            self._shapes.add(shape)
            return True


_SESSION_RE = re.compile(r"^[A-Za-z0-9_.-]{1,64}$")


class _SessionStore:
    """Receding-horizon session state for ``/control`` (round 5).

    A stateless control endpoint re-solves every frame from a zero plan
    and zero duals — the framework's own closed-loop features (the
    shift-by-one warm start and the decayed ADMM dual carry,
    ``models/mpc/runtime.py``) never reach the serving tier. A client
    that sends a ``session`` token binds its request sequence to a
    carried ``(us0, y0)`` pair: after each solve the server shifts the
    optimized plan and the decayed scaled duals exactly the way
    ``MPCRuntime.step`` does (the one ``solver._shift_tail_zero``
    convention every loop shares), and seeds the next request of that
    session with them. With the adaptive budget
    (``MPCConfig.admm_iters_extra``) a settled session then runs at the
    reduced base budget — warm requests are measurably cheaper AND
    better-conditioned than the stateless path
    (results/tpu_v5e/control_session_r5.json).

    Bounded two ways (both config-driven, ``ServeConfig.max_sessions`` /
    ``session_idle_s``): least-recently-used sessions are evicted past
    the cap, and idle sessions expire — an evicted session degrades to
    one cold frame, it does not error. Per-session state is two
    (horizon, 6) f32 arrays, so the default cap holds ~100 KB total.

    Concurrency contract: a real controller issues its session's
    requests SEQUENTIALLY (each depends on the previous response). Two
    in-flight requests on one token do not corrupt anything — both read
    the same carry, the later completion's shifted state wins — but the
    loser's solve is wasted; the store deliberately does not serialize
    per-token (a lock per session would let one stalled client hold a
    batcher slot).
    """

    def __init__(self, cap: int = ServeConfig.max_sessions,
                 idle_s: float = ServeConfig.session_idle_s):
        self._lock = threading.Lock()
        self._d: collections.OrderedDict = collections.OrderedDict()
        self.cap = cap
        self.idle_s = idle_s

    def get(self, sid: str, horizon: int, m: int) -> dict | None:
        """Fetch-and-touch; None when absent/expired or when the session
        was created under a different (horizon, features) — a changed
        problem shape makes the carried plan meaningless, so it restarts
        cold rather than erroring."""
        with self._lock:
            st = self._d.get(sid)
            if st is None:
                return None
            if (time.monotonic() - st["t"] > self.idle_s
                    or st["h"] != horizon or st["m"] != m):
                del self._d[sid]
                return None
            self._d.move_to_end(sid)
            return st

    def put(self, sid: str, horizon: int, m: int, us0, y0,
            frames: int) -> None:
        with self._lock:
            self._d[sid] = {"h": horizon, "m": m, "us0": us0, "y0": y0,
                            "frames": frames, "t": time.monotonic()}
            self._d.move_to_end(sid)
            now = time.monotonic()
            # Idle expiry first (oldest-touched live at the front), then
            # LRU past the cap.
            while self._d:
                k = next(iter(self._d))
                if now - self._d[k]["t"] > self.idle_s:
                    del self._d[k]
                else:
                    break
            while len(self._d) > self.cap:
                self._d.popitem(last=False)

    def drop(self, sid: str) -> None:
        with self._lock:
            self._d.pop(sid, None)

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)


_warmed = _WarmCache()
_shape_gate = _ShapeGate()
_sessions = _SessionStore()

# Ingestion cap (bytes): requests declaring more are 413'd before the
# body is read (utils.httpguard.read_body). Resized by serve().
_max_body = ServeConfig.max_body_mb * 1024 * 1024

# Bound on concurrent device computations. Request threads past the limit
# wait here instead of queueing work on the chip (ServeConfig.max_inflight;
# resized by serve()).
_device_slots = threading.BoundedSemaphore(ServeConfig.max_inflight)

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
    # orig_h is part of the key: make_runner's border mask depends on it,
    # so two images padding to the same shape still compile separately.
    key = (kernel, chw.shape, passes, devices, orig_h)
    run = make_runner(kernel, passes, devices, orig_h=orig_h)
    if warm:
        _ensure_warm(key, lambda: np.asarray(run(chw)))
    with _device_slots:
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


@functools.lru_cache(maxsize=8)
def _mpc_engine(horizon: int, num_features: int, adaptive: bool = True):
    """Serving engines. ``adaptive=False`` (the STATELESS ``/control``
    path) pins the fixed 1x5 budget (``admm_iters=5, admm_iters_extra=0``)
    instead of the engine-default adaptive gate: the gate's predicate is
    BATCH-global, so under micro-batch coalescing a request's result
    would depend on which other requests shared its batch whenever some
    cold solves settle under the tolerance at the reduced base budget
    (possible on small/gentle problems; production-scale cold solves trip
    the gate and run the same 5 iterations either way). A stateless
    request's reply must be a function of that request alone —
    tests/test_serve_batch.py pins batched == solo. SESSION requests keep
    the adaptive engine: their results already depend on carried state,
    extra iterations only tighten the solve, and the settled-session
    reduced budget is the feature's throughput win
    (results/tpu_v5e/control_session_r5.json)."""
    from openmp_parallel_computing_tpu.models.mpc import VisualServoMPC
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    if adaptive:
        return VisualServoMPC(MPCConfig(horizon=horizon,
                                        num_features=num_features))
    return VisualServoMPC(MPCConfig(horizon=horizon,
                                    num_features=num_features,
                                    admm_iters=5, admm_iters_extra=0))


class ControlOverload(RuntimeError):
    """Raised (and mapped to HTTP 503) when a /control frame is shed:
    its predicted or actual wait exceeds the request's staleness deadline.
    A real-time endpoint must reject stale frames rather than queue them —
    the reference fails fast with a 500 instead of queueing
    (``microservices/grayscale/app.py:36-38``)."""

    def __init__(self, msg: str, predicted_wait_s: float):
        super().__init__(msg)
        self.predicted_wait_s = predicted_wait_s


class _PendingControl:
    """One /control request waiting in the micro-batch collector."""

    __slots__ = ("frame", "p0", "target", "depth", "horizon", "event",
                 "result", "error", "t_submit", "deadline_s", "sid",
                 "us0", "y0", "session_frames")

    def __init__(self, frame, p0, target, depth, horizon,
                 deadline_s: float | None = None, sid: str | None = None,
                 us0=None, y0=None, session_frames: int = 0):
        self.frame = frame          # (C, H, W) u8
        self.p0 = p0
        self.target = target
        self.depth = depth
        self.horizon = horizon
        self.event = threading.Event()
        self.result: dict | None = None
        self.error: Exception | None = None
        self.t_submit = time.perf_counter()
        self.deadline_s = deadline_s   # None = no staleness bound
        # Receding-horizon session carry (_SessionStore): the warm-start
        # plan and decayed scaled duals from this session's last solve
        # (zeros on a fresh session). None sid = stateless request.
        self.sid = sid
        self.us0 = us0                 # (H, 6) f32 | None
        self.y0 = y0                   # (H, 6) f32 | None
        self.session_frames = session_frames

    @property
    def key(self):
        # Stateful requests batch separately: the warm solve carries
        # Scenario.y0 and returns Solution.dual, a different traced
        # program than the cold path (which stays bit-identical and
        # pays nothing for the session feature).
        return (self.horizon, self.depth.size, self.frame.shape,
                self.sid is not None)


class ControlBatcher:
    """Micro-batches concurrent /control requests into one device solve.

    SURVEY §2a asks for a "batched serving endpoint; device-resident model,
    host async queue": requests that arrive within ``window_s`` of the
    first pending one and share (horizon, features, frame shape) are padded
    to the next power-of-two bucket (bounded compile count) and solved as
    ONE ``control_step_multi`` computation; each caller gets its own row.
    A lone request pays at most ``window_s`` extra latency — small next to
    the device solve it amortizes under load.

    Admission control (round-4 hardening): without it, tail latency under
    sustained overload is unbounded — measured p99 17.2 s at concurrency
    16 on the dev relay (results/tpu_v5e/control_latency_r3.json), pure
    queueing against a 33 ms real-time budget. A request carrying a
    staleness ``deadline`` is therefore (a) rejected AT SUBMIT when its
    predicted wait — batches queued ahead of it times the measured
    per-batch solve time, plus the coalescing window — already exceeds
    the deadline, and (b) dropped AT DISPATCH if it aged past the
    deadline while queued (the prediction is an estimate; the age check
    is the hard bound). Shedding needs a solve-time estimate, so the
    first (compiling) request per key is always admitted.
    """

    def __init__(self, window_s: float = ServeConfig.batch_window_ms / 1e3,
                 max_batch: int = ServeConfig.max_batch,
                 default_deadline_s: float | None =
                 ServeConfig.control_deadline_ms / 1e3):
        self.window_s = window_s
        self.max_batch = max_batch
        self.default_deadline_s = default_deadline_s
        self._q: queue_mod.Queue = queue_mod.Queue()
        self._deferred: collections.deque = collections.deque()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._solve_s: dict = {}        # key -> EWMA of per-batch seconds
        self._inflight = False          # loop thread currently solving

    def configure(self, window_s: float, max_batch: int,
                  default_deadline_s: float | None = None) -> None:
        self.window_s = window_s
        self.max_batch = max(1, max_batch)
        if default_deadline_s is not None:
            self.default_deadline_s = (default_deadline_s
                                       if default_deadline_s > 0 else None)

    def predicted_wait_s(self, key) -> float | None:
        """Estimated submit->result wait for a new request of ``key``:
        None until a solve of that key has been measured (first compile
        in flight — always admit)."""
        est = self._solve_s.get(key)
        if est is None:
            return None
        n_ahead = self._q.qsize() + len(self._deferred)
        batches = n_ahead // self.max_batch + 1
        return (self.window_s + batches * est
                + (est if self._inflight else 0.0))

    def submit(self, frame_chw, p0, target, depth, horizon,
               timeout_s: float = 600.0,
               deadline_s: float | None = None, sid: str | None = None,
               us0=None, y0=None, session_frames: int = 0) -> dict:
        if deadline_s is None:
            deadline_s = self.default_deadline_s
        item = _PendingControl(frame_chw, p0, target, depth, horizon,
                               deadline_s=deadline_s, sid=sid, us0=us0,
                               y0=y0, session_frames=session_frames)
        if deadline_s is not None:
            predicted = self.predicted_wait_s(item.key)
            if predicted is not None and predicted > deadline_s:
                metrics.inc("serve.control_shed")
                raise ControlOverload(
                    f"predicted wait {predicted:.3f}s exceeds deadline "
                    f"{deadline_s:.3f}s; retry later or raise deadline_ms",
                    predicted)
        self._ensure_thread()
        self._q.put(item)
        if not item.event.wait(timeout=timeout_s):
            raise TimeoutError("control solve timed out")
        if item.error is not None:
            raise item.error
        assert item.result is not None
        return item.result

    def _ensure_thread(self) -> None:
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(target=self._loop,
                                                daemon=True)
                self._thread.start()

    def _collect(self) -> list[_PendingControl]:
        """First pending item plus every compatible one that shows up
        within the window (incompatible arrivals are deferred, not lost)."""
        first = (self._deferred.popleft() if self._deferred
                 else self._q.get())
        batch = [first]
        for it in list(self._deferred):
            if len(batch) >= self.max_batch:
                break
            if it.key == first.key:
                self._deferred.remove(it)
                batch.append(it)
        deadline = time.perf_counter() + self.window_s
        while len(batch) < self.max_batch:
            rem = deadline - time.perf_counter()
            if rem <= 0:
                break
            try:
                it = self._q.get(timeout=rem)
            except queue_mod.Empty:
                break
            if it.key == first.key:
                batch.append(it)
            else:
                self._deferred.append(it)
        return batch

    def _shed_stale(self, batch: list[_PendingControl]
                    ) -> list[_PendingControl]:
        """Drop queued items that would be stale by completion: age plus
        the measured solve time already exceeds their deadline. The hard
        bound behind the submit-time prediction."""
        now = time.perf_counter()
        fresh = []
        for it in batch:
            est = self._solve_s.get(it.key)
            if est is None:
                # Key never measured: the wait was the one-time warm
                # compile, not steady-state queueing — admit (same rule
                # as submit-time prediction).
                fresh.append(it)
                continue
            waited = now - it.t_submit
            if it.deadline_s is not None and waited + est > it.deadline_s:
                metrics.inc("serve.control_shed")
                it.error = ControlOverload(
                    f"frame stale: waited {waited:.3f}s of a "
                    f"{it.deadline_s:.3f}s deadline", waited + est)
                it.event.set()
            else:
                fresh.append(it)
        return fresh

    def _loop(self) -> None:
        while True:
            batch = self._shed_stale(self._collect())
            if not batch:
                continue
            self._inflight = True
            try:
                self._solve(batch)
            except Exception as exc:  # deliver the failure to every caller
                for it in batch:
                    it.error = exc
                    it.event.set()
            finally:
                self._inflight = False

    def _solve(self, batch: list[_PendingControl]) -> None:
        from openmp_parallel_computing_tpu.models.mpc import Scenario

        horizon, m, shape, stateful = batch[0].key
        B = len(batch)
        bucket = 1 << (B - 1).bit_length()   # pad: compiles only per pow2
        pad = bucket - B
        mpc = _mpc_engine(horizon, m, adaptive=stateful)

        def stacked(attr):
            rows = [getattr(it, attr) for it in batch]
            rows += [rows[-1]] * pad
            return jnp.asarray(np.stack(rows))

        # Session requests carry their warm-start plan and decayed duals
        # into the solve (Scenario.us0/y0 are per-row data, so warm and
        # fresh sessions batch together); the stateless path keeps the
        # pre-session zeros graph bit-identical.
        us0 = (stacked("us0") if stateful
               else jnp.zeros((bucket, horizon, 6), jnp.float32))
        y0 = stacked("y0") if stateful else None
        scen = Scenario(p0=stacked("p0"), target=stacked("target"),
                        depth=stacked("depth"), us0=us0, y0=y0)
        frames = stacked("frame")
        warm_key = ("control", shape, horizon, m, bucket, stateful)

        def _packed_step():
            u0, sol = mpc.control_step_multi(frames, scen)
            # ONE device->host fetch for all results: each separate
            # np.asarray pays a full host<->device round trip (~35 ms on
            # the relayed dev runtime — 3 fetches tripled the /control
            # latency, results/tpu_v5e/control_latency_r3.json). Session
            # batches additionally fetch the full plan + duals (the
            # next-frame carry) in the same packed fetch.
            parts = [u0.reshape(-1), sol.cost, sol.primal_residual]
            if stateful:
                parts += [sol.us.reshape(-1), sol.dual.reshape(-1)]
            return u0.shape[0], np.asarray(jnp.concatenate(parts))

        # The warm-up must run the SAME packed computation as the timed
        # path — warming control_step_multi alone would leave the
        # concatenate to compile inside the first request's compute_s.
        _ensure_warm(warm_key, lambda: _packed_step())
        with _device_slots:
            t0 = time.perf_counter()
            nb, packed = _packed_step()
            compute_s = time.perf_counter() - t0
        u0 = packed[:nb * 6].reshape(nb, 6)
        cost = packed[nb * 6:nb * 7]
        res = packed[nb * 7:nb * 8]
        if stateful:
            plan = packed[nb * 8:nb * 8 + nb * horizon * 6].reshape(
                nb, horizon, 6)
            dual = packed[nb * 8 + nb * horizon * 6:].reshape(
                nb, horizon, 6)
        # Solve-time estimate feeding admission control (EWMA per key:
        # the post-warm per-batch device+fetch cost).
        prev = self._solve_s.get(batch[0].key)
        self._solve_s[batch[0].key] = (compute_s if prev is None
                                       else 0.7 * prev + 0.3 * compute_s)
        metrics.observe("serve.batch_size", float(B))
        tail = np.zeros((1, 6), np.float32)
        for i, it in enumerate(batch):
            it.result = {
                "u0": u0[i].tolist(),
                "cost": float(cost[i]),
                "primal_residual": float(res[i]),
                "compute_s": round(compute_s, 4),
                "batched": B,
            }
            if it.sid is not None:
                # The MPCRuntime.step carry (solver._shift_tail_zero
                # convention): shift the optimized plan one step, decay
                # and shift the scaled duals, store for the session's
                # next request.
                _sessions.put(
                    it.sid, horizon, m,
                    np.concatenate([plan[i, 1:], tail]),
                    mpc.cfg.dual_decay * np.concatenate(
                        [dual[i, 1:], tail]),
                    it.session_frames + 1)
                it.result["session"] = it.sid
                it.result["session_frame"] = it.session_frames + 1
            it.event.set()


_batcher = ControlBatcher()


def control_request(frame_hwc: np.ndarray, fields: dict) -> dict:
    """Real-time control endpoint body: frame + scenario state -> first
    controls (the MPC engine as a service; BASELINE's 'real-time control
    endpoint' replacing the batch-only reference surface). Concurrent
    requests coalesce in the micro-batcher."""

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
    if not _shape_gate.admit(frame_hwc.shape):
        raise ValueError(
            f"too many distinct frame shapes this process "
            f"(> {_shape_gate.cap}); resend at an already-served size")
    # Staleness is a first-class request parameter: the client states how
    # long its frame stays worth acting on; past it the server sheds (503)
    # instead of queueing. Absent -> the server-wide default
    # (ServeConfig.control_deadline_ms); 0 = this request opts out.
    deadline_s: float | None = None
    if "deadline_ms" in fields:
        raw_deadline = float(str(fields["deadline_ms"]))
        # NaN passes `< 0` and is truthy — it would silently disable
        # every shed comparison; only the explicit 0 opts out.
        if not math.isfinite(raw_deadline) or raw_deadline < 0:
            raise ValueError("deadline_ms must be a finite number >= 0")
        deadline_s = raw_deadline / 1e3 if raw_deadline else float("inf")
    # Receding-horizon session: a client-supplied token binds this
    # request sequence to a carried (plan, duals) pair — the serving
    # surface of MPCRuntime's warm-start shift + decayed dual carry. An
    # unknown/expired token (or one whose problem shape changed) starts
    # a fresh session with a cold carry; the solve itself then runs the
    # full adaptive budget until the session settles.
    sid = us0 = y0 = None
    session_frames = 0
    if "session" in fields:
        sid = str(fields["session"])
        if not _SESSION_RE.match(sid):
            raise ValueError(
                "session must match [A-Za-z0-9_.-]{1,64}")
        st = _sessions.get(sid, horizon, m)
        if st is None:
            us0 = np.zeros((horizon, 6), np.float32)
            y0 = np.zeros((horizon, 6), np.float32)
        else:
            us0, y0 = st["us0"], st["y0"]
            session_frames = st["frames"]
    chw = np.ascontiguousarray(np.transpose(frame_hwc, (2, 0, 1)))
    return _batcher.submit(chw, p0, target, depth, horizon,
                           deadline_s=deadline_s, sid=sid, us0=us0,
                           y0=y0, session_frames=session_frames)


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
            body = read_body(self, _max_body)
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
                if not _shape_gate.admit(decoded.shape):
                    self.send_error(
                        400, f"too many distinct image shapes this process "
                             f"(> {_shape_gate.cap}); resend at an "
                             f"already-served size")
                    return
                out_hwc, compute_s = process_image(decoded, kernel, passes,
                                                   devices)
                dst = Path(td) / "out.png"
                # Low zlib level: identical pixels, ~4x faster encode —
                # PNG encoding dominates serving latency otherwise.
                imgio.save_png(dst, out_hwc, compression=1)
                png = dst.read_bytes()
        except BodyTooLarge as exc:
            metrics.inc("serve.rejected_large")
            self.send_error(413, str(exc))  # body never read
            return
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
            fields = _parse_multipart(self.headers.get("Content-Type", ""),
                                      read_body(self, _max_body))
            image = fields.get("image")
            if not isinstance(image, bytes) or not image:
                self.send_error(400, "missing multipart field 'image'")
                return
            with tempfile.TemporaryDirectory() as td:
                src = Path(td) / "frame"
                src.write_bytes(image)
                frame = imgio.load(src)
            result = control_request(frame, fields)
        except BodyTooLarge as exc:  # before ValueError: it subclasses it
            metrics.inc("serve.rejected_large")
            self.send_error(413, str(exc))
            return
        except ValueError as exc:
            self.send_error(400, str(exc))
            return
        except ControlOverload as exc:
            # Shed, not queued: the frame would be stale by completion.
            payload = json.dumps({
                "error": str(exc),
                "predicted_wait_s": round(exc.predicted_wait_s, 4),
            }).encode()
            self.send_response(503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Retry-After",
                             f"{max(0.0, exc.predicted_wait_s):.3f}")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
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
    global _device_slots, _max_body
    _batcher.configure(cfg.batch_window_ms / 1e3, cfg.max_batch,
                       default_deadline_s=cfg.control_deadline_ms / 1e3)
    _device_slots = threading.BoundedSemaphore(max(1, cfg.max_inflight))
    _shape_gate.cap = max(1, cfg.max_shapes)
    _max_body = max(1, cfg.max_body_mb) * 1024 * 1024
    _sessions.cap = max(1, cfg.max_sessions)
    _sessions.idle_s = cfg.session_idle_s
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
