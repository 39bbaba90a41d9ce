"""Batched layout-prediction slot with the reference's OPERATIONAL
semantics: per-request keep-aspect input resize, exponential-backoff
retry, output rescale, and quarantine on permanent failure.

The reference posts one resized page image per request to an external
YOLO document-layout-analysis server and retries transport failures
with ``Schedule.exponential(1.second) && Schedule.recurs(5)`` — up to 5
retries at 1 s, 2 s, 4 s, 8 s, 16 s after the initial attempt
(core/segmentation/YoloPredictor.scala:60-138, retry policy :113;
request sizing per prediction type from reference.conf:56-70). Boxes
come back in RESIZED coordinates and are rescaled by 1/scale
(YoloPredictor.scala:133-138).

Here the same contract is Spark-batched: one Arrow batch of page images
→ one model ``forward`` (amortizing model/server round-trips across the
whole batch), wrapped in the identical retry schedule. The model is
pluggable; the sandbox ships a REAL numpy forward
(:class:`NumpyLayoutModel` — threshold + 8-connected components +
fill-ratio confidence) because no torch/ONNX/HTTP server exists in this
environment; a production deployment swaps in an ONNX session or an
HTTP client with the same ``forward`` signature and keeps every
operational guarantee (retry, rescale, quarantine) from this module.

Scale shape: ``predict_layout_boxes`` is a single ``mapInPandas`` over
the page table — narrow, zero shuffle; per-image decode failures
quarantine the row and permanent model failures quarantine the batch's
rows (status='error'), never the job.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from jochre3_ocr_spark.operators.contour_deskew import (
    connected_components_runs,
    resize_area_keep_aspect,
)


# ------------------------------------------------------ prediction types
@dataclass(frozen=True)
class PredictionType:
    """One YOLO endpoint granularity: request image size + default
    min-confidence (YoloPredictionType.scala via reference.conf:56-70)."""

    name: str
    image_size: int
    default_min_confidence: float


# reference.conf:62-70 (image-size-for-*, default-min-confidence.*)
BLOCKS = PredictionType("blocks", 640, 0.20)
TEXT_BLOCKS = PredictionType("text-blocks", 1280, 0.20)
LINES = PredictionType("lines", 1280, 0.05)
WORDS = PredictionType("words", 1280, 0.05)
GLYPHS = PredictionType("glyphs", 1280, 0.10)
WORD_TO_GLYPH = PredictionType("word-to-glyph", 1280, 0.20)

PREDICTION_TYPES = {
    t.name: t
    for t in (BLOCKS, TEXT_BLOCKS, LINES, WORDS, GLYPHS, WORD_TO_GLYPH)
}


@dataclass(frozen=True)
class PredictedBox:
    """PredictedRectangle (graphics/PredictedRectangle.scala): a labelled
    box + confidence, in ORIGINAL page coordinates after rescale."""

    label: str
    left: int
    top: int
    width: int
    height: int
    confidence: float

    @property
    def box(self) -> tuple[int, int, int, int]:
        """(left, top, width, height) — the segmenter strategies' block-
        prediction shape (operators/strategies.block_only_segment)."""
        return (self.left, self.top, self.width, self.height)


class TransientPredictionError(RuntimeError):
    """A retryable failure — the transport-error class the reference
    retries (connection refused / timeout / 5xx from the DLA server)."""


class PredictionFailedError(RuntimeError):
    """Raised after the retry schedule is exhausted; carries the last
    transient error. Callers quarantine (error rows), never crash the
    job."""


# --------------------------------------------------------- retry wrapper
class RetryingBatchPredictor:
    """The production predictor contract: Arrow batch in → one batched
    ``model.forward`` → boxes out, with the reference's operational
    semantics.

    * Per-batch input resize: every image is resized keep-aspect to the
      prediction type's request size (ResizeImageAndKeepAspectRatio,
      YoloPredictor.scala:68-76) BEFORE the forward; never upscales.
    * Retry: ``Schedule.exponential(initial_delay) && recurs(max_retries)``
      (YoloPredictor.scala:113) — delays initial_delay · 2^k for attempt
      k, at most ``max_retries`` retries after the first attempt. Only
      :class:`TransientPredictionError` is retried; anything else is a
      bug and propagates immediately.
    * Output rescale: boxes come back in resized coordinates and are
      mapped to original page coordinates via 1/scale
      (YoloPredictor.scala:133-138).
    * Per-attempt timeout: the reference bounds every request at 30 s
      (``zio.http.Client...timeout``, reference.conf:27, wired in
      YoloPredictor.scala:58) — a hung model call is indistinguishable
      from a dead server and must become a retryable failure, not a
      stalled Spark task. ``request_timeout`` (seconds, default 30,
      ``None`` disables) bounds each ``forward`` attempt; on expiry the
      attempt counts as a :class:`TransientPredictionError` and the
      retry schedule proceeds. The timed-out call runs on an abandoned
      daemon thread (Python cannot cancel a running call) — acceptable
      for a transport hang, and exactly the client-timeout semantics of
      the reference.
    * ``sleep`` is injectable so tests pin the exact backoff sequence
      without wall-clock waits.
    """

    def __init__(
        self,
        model,
        max_retries: int = 5,
        initial_delay: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
        request_timeout: float | None = 30.0,
    ):
        self.model = model
        self.max_retries = max_retries
        self.initial_delay = initial_delay
        self.sleep = sleep
        self.request_timeout = request_timeout

    def _forward_with_deadline(self, resized, min_confidence):
        if self.request_timeout is None:
            return self.model.forward(resized, min_confidence)
        # a plain DAEMON thread, not a ThreadPoolExecutor: executor
        # threads are non-daemon and joined at interpreter exit
        # (threading._register_atexit), so a genuinely hung forward
        # would block the PySpark worker from ever exiting — the exact
        # scenario this deadline exists for. A daemon thread is simply
        # abandoned.
        import threading

        result: list = []
        err: list = []

        def _call():
            try:
                result.append(self.model.forward(resized, min_confidence))
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                err.append(exc)

        t = threading.Thread(
            target=_call, name="predictor-request", daemon=True
        )
        t.start()
        t.join(timeout=self.request_timeout)
        if t.is_alive():
            raise TransientPredictionError(
                f"request exceeded {self.request_timeout}s timeout"
            )
        if err:
            raise err[0]
        return result[0]

    def predict_batch(
        self,
        images: Sequence[np.ndarray],
        prediction_type: PredictionType = BLOCKS,
        min_confidence: float | None = None,
    ) -> list[list[PredictedBox]]:
        if min_confidence is None:
            min_confidence = prediction_type.default_min_confidence
        size = prediction_type.image_size
        resized: list[np.ndarray] = []
        scales: list[float] = []
        for img in images:
            resized.append(resize_area_keep_aspect(img, max_w=size, max_h=size))
            # ResizeImageAndKeepAspectRatio returns EXACTLY
            # Scale(1 / max(heightRatio, widthRatio)) (ResizeImageAnd
            # KeepAspectRatio.scala:17,43) — NOT rounded-resized/original,
            # which drifts boxes by up to ~5px at page edges on
            # height-bound pages (int-truncated resized width)
            ratio = (
                max(img.shape[0] / size, img.shape[1] / size)
                if img.shape[0] and img.shape[1]
                else 1.0
            )
            scales.append(1.0 if ratio <= 1.0 else 1.0 / ratio)

        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt > 0:
                self.sleep(self.initial_delay * (2 ** (attempt - 1)))
            try:
                raw = self._forward_with_deadline(resized, min_confidence)
                break
            except TransientPredictionError as exc:
                last_err = exc
        else:
            raise PredictionFailedError(
                f"prediction failed after {self.max_retries} retries: "
                f"{last_err}"
            ) from last_err

        if len(raw) != len(resized):
            # a model returning the wrong number of per-image box lists is
            # a broken contract, not a transport blip: zip() would silently
            # DROP the trailing pages (no boxes, no error rows). Fail the
            # batch so the Spark op quarantines every row instead.
            raise PredictionFailedError(
                f"model returned {len(raw)} box lists for "
                f"{len(resized)} images — broken forward contract"
            )
        out: list[list[PredictedBox]] = []
        for boxes, scale in zip(raw, scales):
            inv = 1.0 / scale if scale else 1.0
            out.append(
                [
                    PredictedBox(
                        b.label,
                        int(b.left * inv),
                        int(b.top * inv),
                        int(b.width * inv),
                        int(b.height * inv),
                        b.confidence,
                    )
                    for b in boxes
                    if b.confidence >= min_confidence
                ]
            )
        return out


# ----------------------------------------------------- numpy "real" model
class NumpyLayoutModel:
    """A real (if simple) batched CV forward: dark-region detection by
    threshold + 8-connected components; confidence = component fill
    ratio within its bounding box. Deterministic, pure numpy — the
    sandbox stand-in for the YOLO server's weights, behind the exact
    production ``forward`` contract (batch of images → per-image box
    lists in RESIZED coordinates)."""

    def __init__(self, label: str = "TextBlock", threshold: int = 128,
                 min_area: int = 4):
        self.label = label
        self.threshold = threshold
        self.min_area = min_area

    def forward(
        self, images: Sequence[np.ndarray], min_confidence: float
    ) -> list[list[PredictedBox]]:
        out: list[list[PredictedBox]] = []
        for img in images:
            gray = img if img.ndim == 2 else img.mean(axis=2)
            mask = gray < self.threshold
            comps, rows, xs, xe = connected_components_runs(mask)
            boxes: list[PredictedBox] = []
            for comp in comps:
                c = np.asarray(comp, dtype=np.int64)
                top = int(rows[c].min())
                bottom = int(rows[c].max())
                left = int(xs[c].min())
                right = int(xe[c].max())
                w, h = right - left + 1, bottom - top + 1
                if w * h < self.min_area:
                    continue
                filled = int((xe[c] - xs[c] + 1).sum())
                boxes.append(
                    PredictedBox(
                        self.label, left, top, w, h, filled / float(w * h)
                    )
                )
            boxes.sort(key=lambda b: (b.top, b.left))
            out.append(boxes)
        return out


# ------------------------------------------------------- HTTP-shaped model
class HttpLayoutModel:
    """The production ``forward`` adapter: POST the image batch to a
    document-layout-analysis server and parse its box response — the
    client shape the reference runs against its YOLO server
    (YoloPredictor.scala:60-108: multipart POST per image, JSON
    ``YoloResult`` back; here one request carries the whole Arrow batch).

    The wire format is deterministic JSON: request
    ``{"min_confidence": f, "images": [<base64 npy>, ...]}``, response
    ``{"predictions": [[{"label","left","top","width","height",
    "confidence"}, ...] per image]}`` — boxes in RESIZED coordinates,
    exactly what :class:`RetryingBatchPredictor` rescales.

    ``transport`` is injectable — ``(url, body_bytes, timeout_s) ->
    response_bytes`` — so the contract is provable without a network
    (tests inject success / 5xx / garbage transports); the default is a
    stdlib urllib POST. Failure mapping is the retry boundary's
    contract: transport errors (connection refused, HTTP 5xx, socket
    timeout) raise :class:`TransientPredictionError` → retried with
    backoff; an unparsable or wrong-arity response is a broken server
    contract and raises :class:`PredictionFailedError` → the batch
    quarantines immediately.
    """

    def __init__(
        self,
        url: str,
        transport: Callable[[str, bytes, float], bytes] | None = None,
        timeout: float = 30.0,
    ):
        self.url = url
        self.transport = transport or _urllib_post
        self.timeout = timeout

    def forward(
        self, images: Sequence[np.ndarray], min_confidence: float
    ) -> list[list[PredictedBox]]:
        import base64
        import io
        import json

        blobs = []
        for img in images:
            buf = io.BytesIO()
            np.save(buf, img, allow_pickle=False)
            blobs.append(base64.b64encode(buf.getvalue()).decode("ascii"))
        body = json.dumps(
            {"min_confidence": min_confidence, "images": blobs}
        ).encode("utf-8")
        try:
            resp = self.transport(self.url, body, self.timeout)
        except TransientPredictionError:
            raise
        except Exception as exc:  # noqa: BLE001 — mapped below
            # 4xx is a PERMANENT client error (bad URL, bad payload) —
            # retrying a hopeless request costs the full backoff schedule
            # on every batch; only server-side/transport failures (5xx,
            # refused, timeout) are transient, per the docstring contract
            # only an int .code is an HTTP status — some transports hang
            # a string errno on .code, and letting int() raise here would
            # escape BOTH classifications and bypass the retry contract
            code = getattr(exc, "code", None)
            if isinstance(code, int) and 400 <= code < 500:
                raise PredictionFailedError(
                    f"permanent HTTP client error {code}: {exc}"
                ) from exc
            raise TransientPredictionError(
                f"{type(exc).__name__}: {exc}"
            ) from exc
        try:
            parsed = json.loads(resp.decode("utf-8"))
            preds = parsed["predictions"]
            return [
                [
                    PredictedBox(
                        str(b["label"]),
                        int(b["left"]),
                        int(b["top"]),
                        int(b["width"]),
                        int(b["height"]),
                        float(b["confidence"]),
                    )
                    for b in per_img
                ]
                for per_img in preds
            ]
        except (KeyError, TypeError, ValueError) as exc:
            raise PredictionFailedError(
                f"malformed prediction response: {type(exc).__name__}: {exc}"
            ) from exc


def _urllib_post(url: str, body: bytes, timeout: float) -> bytes:
    """Default stdlib transport: one POST, HTTP errors surface as
    exceptions (mapped to TransientPredictionError by the caller)."""
    import urllib.request

    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


# ------------------------------------------------------------ spark plan
BOX_SCHEMA = (
    "doc_id string, box_index int, label string, left int, top int, "
    "width int, height int, confidence double, status string, error string"
)


def predict_layout_boxes(
    df,
    make_predictor: Callable[[], RetryingBatchPredictor],
    prediction_type_name: str = "blocks",
    id_col: str = "doc_id",
    image_col: str = "image",
    min_confidence: float | None = None,
):
    """Run the batched predictor over a page-image table: one row per
    predicted box, in original page coordinates.

    ``make_predictor`` is a zero-arg factory executed ON THE WORKER
    (models/sessions are not picklable; the reference's per-executor
    HTTP client is the analog). Per-row decode failures and permanent
    prediction failures (retries exhausted) produce status='error' rows
    — the job never dies to one bad page or one down model server.

    Plan shape: scan → single mapInPandas; narrow, zero Exchange. Images
    are npy-serialized grayscale arrays (the sandbox's codec stand-in;
    sources/png_codec + jpeg_codec decode real formats upstream).

    Memory sizing for MB-scale pages — BOTH batch-size knobs, not just
    the Arrow one: ``spark.sql.execution.arrow.maxRecordsPerBatch``
    bounds records × image-bytes of direct memory per task crossing to
    Python, and ``spark.sql.parquet.columnarReaderBatchSize`` (default
    4096 rows) bounds the CONTIGUOUS heap the vectorized reader
    allocates per column batch — a 20k-page drive at 640² OOMed on the
    reader side before any Python ran (BENCH.md round 5). Size both to
    ~16-32 for image tables (``job.py --predict-http`` does).
    """
    import pandas as pd

    ptype = PREDICTION_TYPES[prediction_type_name]

    def run(batches):
        import io

        predictor = make_predictor()
        for b in batches:
            ids, imgs, errs = [], [], []
            for doc_id, blob in zip(b[id_col], b[image_col]):
                try:
                    img = np.load(io.BytesIO(bytes(blob)), allow_pickle=False)
                    ids.append(doc_id)
                    imgs.append(img)
                except Exception as exc:  # noqa: BLE001 — quarantine row
                    errs.append((doc_id, f"{type(exc).__name__}: {exc}"))
            rows = {k: [] for k in (
                "doc_id", "box_index", "label", "left", "top", "width",
                "height", "confidence", "status", "error",
            )}

            def _err_row(doc_id, msg):
                rows["doc_id"].append(doc_id)
                rows["box_index"].append(-1)
                rows["label"].append(None)
                rows["left"].append(0)
                rows["top"].append(0)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["confidence"].append(0.0)
                rows["status"].append("error")
                rows["error"].append(msg)

            for doc_id, msg in errs:
                _err_row(doc_id, msg)
            if ids:
                try:
                    per_img = predictor.predict_batch(
                        imgs, ptype, min_confidence
                    )
                except PredictionFailedError as exc:
                    for doc_id in ids:
                        _err_row(doc_id, f"PredictionFailedError: {exc}")
                    per_img = []
                for doc_id, boxes in zip(ids, per_img):
                    for i, box in enumerate(boxes):
                        rows["doc_id"].append(doc_id)
                        rows["box_index"].append(i)
                        rows["label"].append(box.label)
                        rows["left"].append(box.left)
                        rows["top"].append(box.top)
                        rows["width"].append(box.width)
                        rows["height"].append(box.height)
                        rows["confidence"].append(box.confidence)
                        rows["status"].append("ok")
                        rows["error"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=BOX_SCHEMA)
