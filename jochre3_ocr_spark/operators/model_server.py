"""Loopback layout-model HTTP server — the real-socket stand-in for the
reference's DLA service (``api/.../MainApp.scala:27-125`` serves the
YOLO endpoints; ``YoloPredictor.scala:60-138`` is the client contract
this server's wire shape mirrors). The sandbox has no ONNX/torch
runtime, so the forward is :class:`NumpyLayoutModel` (a real, if
simple, batched CV pass) — but everything AROUND the forward is the
genuine production article: a real TCP socket, real HTTP parsing, real
connection-refused/timeout/5xx failure modes for
:class:`HttpLayoutModel`'s retry contract to chew on.

Wire contract (mirrored by ``HttpLayoutModel.forward``):

* request: POST JSON ``{"min_confidence": float,
  "images": [base64(npy bytes), ...]}``
* response: JSON ``{"predictions": [[{"label", "left", "top", "width",
  "height", "confidence"}, ...] per image]}``

Failure injection for drives/tests:

* ``fail_first=K`` — the first K requests return HTTP 503 (transient;
  the client must retry through them).
* ``delay=S`` — sleep S seconds before answering (drives the client's
  per-attempt deadline).

Run standalone (for spark-submit drives)::

    python -m jochre3_ocr_spark.operators.model_server --port 0
    # prints one line: {"port": <actual>} — port 0 picks an ephemeral one
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .predictor import NumpyLayoutModel


class _State:
    """Mutable server-wide counters shared across handler instances
    (one handler object is constructed per request)."""

    def __init__(self, fail_first: int, delay: float):
        self.fail_first = fail_first
        self.delay = delay
        self.requests = 0
        self.lock = threading.Lock()


def _make_handler(model, state: _State):
    class Handler(BaseHTTPRequestHandler):
        # silence per-request stderr logging — workers' stderr is noisy
        # enough, and a drive asserts on stdout JSON
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def do_POST(self):  # noqa: N802 — http.server naming
            with state.lock:
                state.requests += 1
                n = state.requests
            if state.delay:
                import time

                time.sleep(state.delay)
            if n <= state.fail_first:
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b"injected transient failure")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length).decode("utf-8"))
                images = [
                    np.load(
                        io.BytesIO(base64.b64decode(blob)), allow_pickle=False
                    )
                    for blob in req["images"]
                ]
                preds = model.forward(images, float(req["min_confidence"]))
            except Exception as exc:  # noqa: BLE001 — wire error mapping
                # malformed request → 400 (permanent, client quarantines)
                self.send_response(400)
                self.end_headers()
                self.wfile.write(
                    f"{type(exc).__name__}: {exc}".encode("utf-8")
                )
                return
            body = json.dumps(
                {
                    "predictions": [
                        [
                            {
                                "label": b.label,
                                "left": b.left,
                                "top": b.top,
                                "width": b.width,
                                "height": b.height,
                                "confidence": b.confidence,
                            }
                            for b in per_img
                        ]
                        for per_img in preds
                    ]
                }
            ).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(
    port: int = 0,
    model=None,
    fail_first: int = 0,
    delay: float = 0.0,
) -> ThreadingHTTPServer:
    """Bind a threading HTTP server on 127.0.0.1:``port`` (0 = pick an
    ephemeral port; read the choice from ``server.server_address[1]``)
    and return it WITHOUT serving — call ``serve_forever`` on a thread
    (:func:`serve_background`) or drive ``handle_request`` manually."""
    model = model or NumpyLayoutModel()
    state = _State(fail_first, delay)
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), _make_handler(model, state)
    )
    server.jochre_state = state  # exposed for test assertions
    return server


def serve_background(
    port: int = 0, model=None, fail_first: int = 0, delay: float = 0.0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """:func:`serve` + serve_forever on a daemon thread. Returns
    (server, thread); stop with ``server.shutdown()``."""
    server = serve(port, model, fail_first, delay)
    t = threading.Thread(
        target=server.serve_forever, name="model-server", daemon=True
    )
    t.start()
    return server, t


def synthesize_page_table(spark, n: int, size: int = 640, partitions: int | None = None):
    """Deterministic page-image table (doc_id, image) for driving the
    predictor over real transports without external data: page i is a
    ``size``×``size`` white uint8 canvas with ``1 + i % 12`` black
    96×64 blocks on a fixed grid, npy-serialized — the same image
    encoding the production ``predict_layout_boxes`` ingests. Rendered
    distributed (one mapInPandas over a range), never on the driver."""
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 2)

    def render(batches):
        for b in batches:
            ids, blobs = [], []
            for i in b["id"]:
                i = int(i)
                img = np.full((size, size), 255, dtype=np.uint8)
                for k in range(1 + i % 12):
                    r, c = divmod(k, 5)
                    y, x = 32 + r * 120, 32 + c * 120
                    img[y : y + 64, x : x + 96] = 0
                buf = io.BytesIO()
                np.save(buf, img, allow_pickle=False)
                ids.append(f"page{i:07d}")
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "image": blobs})

    return (
        spark.range(n)
        .repartition(partitions)
        .mapInPandas(render, schema="doc_id string, image binary")
    )


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--fail-first", type=int, default=0)
    p.add_argument("--delay", type=float, default=0.0)
    args = p.parse_args(argv)
    server = serve(
        args.port, fail_first=args.fail_first, delay=args.delay
    )
    # one machine-readable line so a parent process can discover the
    # ephemeral port, then serve until killed
    print(json.dumps({"port": server.server_address[1]}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
