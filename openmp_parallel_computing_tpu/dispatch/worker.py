"""Queue worker: the asynchronous compute service.

Capability twin of ``event-driven/grayscale_service/app.py:38-94``: consume
job messages ``{image_key, threads, repeat, passes?, kernel?}``, stream the
image out of the object store, run the kernel once per requested device
count x repeat while averaging wall time into ``times[str(devices)]``,
upload the result under ``processed/{basename}``, publish the completion
message ``{image_key, processed_key, times, passes}`` on
``<queue>_processed``, and ack only after the publish (at-least-once).

The thread-count sweep becomes a device-count sweep; compute runs
device-resident through the jit cache (no subprocess per job).
"""

from __future__ import annotations

import tempfile
import time
from pathlib import Path

import numpy as np

from openmp_parallel_computing_tpu import imgio
from openmp_parallel_computing_tpu.dispatch.queue import DurableQueue
from openmp_parallel_computing_tpu.dispatch.store import ObjectStore
from openmp_parallel_computing_tpu.serve.server import process_image
from openmp_parallel_computing_tpu.utils.config import DispatchConfig
from openmp_parallel_computing_tpu.utils.metrics import registry as metrics


class Worker:
    def __init__(self, cfg: DispatchConfig | None = None):
        self.cfg = cfg or DispatchConfig()
        self.store = ObjectStore(self.cfg.root)
        self.jobs = DurableQueue(self.cfg.root, self.cfg.queue,
                                 self.cfg.visibility_timeout_s)
        self.done = DurableQueue(self.cfg.root,
                                 f"{self.cfg.queue}_processed")

    def process(self, body: dict) -> dict:
        image_key = body["image_key"]
        devices = body.get("threads", [1])
        if isinstance(devices, int):
            devices = [devices]          # int -> list normalization (:41-44)
        repeat = int(body.get("repeat", 1))
        passes = int(body.get("passes", 1))
        kernel = body.get("kernel", "grayscale")

        with tempfile.TemporaryDirectory() as td:
            src = Path(td) / Path(image_key).name
            with open(src, "wb") as f:
                for chunk in self.store.get_stream(image_key):
                    f.write(chunk)
            decoded = imgio.load(src)

            times: dict[str, float] = {}
            out_hwc = None
            for d in devices:
                # absorb jit compilation outside the timed repeats so the
                # recorded per-device times compare kernels, not compiles
                process_image(decoded, kernel, passes, d)
                total = 0.0
                for _ in range(repeat):
                    t0 = time.perf_counter()
                    out_hwc, _ = process_image(decoded, kernel, passes, d)
                    total += time.perf_counter() - t0
                times[str(d)] = total / max(repeat, 1)

            dst = Path(td) / "out.png"
            imgio.save_png(dst, np.asarray(out_hwc), compression=1)
            processed_key = f"processed/{Path(image_key).name}"
            self.store.put_file(processed_key, dst)

        completion = {
            "image_key": image_key,
            "processed_key": processed_key,
            "times": times,
            "passes": passes,
        }
        # Durable completion record: lets the frontend answer status
        # queries after a restart (its in-memory cache and the acked
        # message are both gone by then).
        import json as _json

        self.store.put(f"status/{Path(image_key).name}.json",
                       _json.dumps(completion).encode())
        self.done.publish(completion)   # publish BEFORE the ack (queue
        metrics.inc("worker.jobs")      # consume() acks after we return)
        return completion

    def run(self, stop_when_empty: bool = False) -> None:
        self.jobs.consume(self.process, stop_when_empty=stop_when_empty)


def main() -> None:
    from openmp_parallel_computing_tpu.utils.config import load

    Worker(load().dispatch).run()


if __name__ == "__main__":
    main()
