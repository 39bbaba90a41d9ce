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
    * ``sleep`` is injectable so tests pin the exact backoff sequence
      without wall-clock waits.
    """

    def __init__(
        self,
        model,
        max_retries: int = 5,
        initial_delay: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.model = model
        self.max_retries = max_retries
        self.initial_delay = initial_delay
        self.sleep = sleep

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
                raw = self.model.forward(resized, min_confidence)
                break
            except TransientPredictionError as exc:
                last_err = exc
        else:
            raise PredictionFailedError(
                f"prediction failed after {self.max_retries} retries: "
                f"{last_err}"
            ) from last_err

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
                top = int(min(rows[k] for k in comp))
                bottom = int(max(rows[k] for k in comp))
                left = int(min(xs[k] for k in comp))
                right = int(max(xe[k] for k in comp))
                w, h = right - left + 1, bottom - top + 1
                if w * h < self.min_area:
                    continue
                filled = sum(int(xe[k] - xs[k] + 1) for k in comp)
                boxes.append(
                    PredictedBox(
                        self.label, left, top, w, h, filled / float(w * h)
                    )
                )
            boxes.sort(key=lambda b: (b.top, b.left))
            out.append(boxes)
        return out


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
