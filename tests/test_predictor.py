"""Batched inference slot: retry/backoff, resize/rescale, quarantine —
the reference's operational semantics (YoloPredictor.scala:60-138)
exercised end to end, including through the Spark operator and into the
segmenter strategies (VERDICT r2 item 3)."""

import io

import numpy as np
import pytest

from jochre3_ocr_spark.operators.predictor import (
    BLOCKS,
    NumpyLayoutModel,
    PredictedBox,
    PredictionFailedError,
    RetryingBatchPredictor,
    TransientPredictionError,
    predict_layout_boxes,
)


class FlakyModel:
    """Fails the first ``fail_times`` forwards with the retryable error,
    then delegates to a real model."""

    def __init__(self, fail_times: int, inner=None, error_cls=TransientPredictionError):
        self.fail_times = fail_times
        self.calls = 0
        self.inner = inner or NumpyLayoutModel()
        self.error_cls = error_cls

    def forward(self, images, min_confidence):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.error_cls(f"connection refused (attempt {self.calls})")
        return self.inner.forward(images, min_confidence)


def _page(rects, size=1280):
    """White page with filled black rectangles (left, top, w, h)."""
    img = np.full((size, size), 255, np.uint8)
    for left, top, w, h in rects:
        img[top : top + h, left : left + w] = 0
    return img


def test_retry_backoff_schedule_exact():
    """Schedule.exponential(1s) && recurs(5) (YoloPredictor.scala:113):
    two transient failures cost sleeps [1, 2] then succeed; the model is
    called exactly 3 times."""
    sleeps = []
    model = FlakyModel(fail_times=2)
    pred = RetryingBatchPredictor(model, sleep=sleeps.append)
    out = pred.predict_batch([_page([(100, 100, 200, 100)])], BLOCKS)
    assert sleeps == [1.0, 2.0]
    assert model.calls == 3
    assert len(out) == 1 and len(out[0]) == 1


def test_retry_exhaustion_raises_after_five():
    """Retries cap at 5 (delays 1,2,4,8,16) then PredictionFailedError."""
    sleeps = []
    model = FlakyModel(fail_times=99)
    pred = RetryingBatchPredictor(model, sleep=sleeps.append)
    with pytest.raises(PredictionFailedError, match="after 5 retries"):
        pred.predict_batch([_page([(0, 0, 10, 10)])], BLOCKS)
    assert sleeps == [1.0, 2.0, 4.0, 8.0, 16.0]
    assert model.calls == 6  # initial + 5 retries


def test_non_transient_error_propagates_immediately():
    """Only the transport-error class retries; a bug in the model is not
    masked by the schedule."""
    sleeps = []
    model = FlakyModel(fail_times=99, error_cls=ValueError)
    pred = RetryingBatchPredictor(model, sleep=sleeps.append)
    with pytest.raises(ValueError):
        pred.predict_batch([_page([(0, 0, 10, 10)])], BLOCKS)
    assert sleeps == [] and model.calls == 1


def test_resize_and_rescale_roundtrip_exact():
    """Per-batch input resize to the prediction type's request size
    (YoloPredictor.scala:68-76) and 1/scale output rescale (:133-138):
    a 1280px page through the 640px 'blocks' endpoint recovers the
    original even-coordinate boxes EXACTLY (scale is exactly 0.5 and
    INTER_AREA keeps axis-aligned even-coord rectangles sharp)."""
    rects = [(32, 32, 120, 80), (344, 32, 120, 80), (32, 500, 200, 64)]
    pred = RetryingBatchPredictor(NumpyLayoutModel())
    out = pred.predict_batch([_page(rects, size=1280)], BLOCKS)
    got = [(b.left, b.top, b.width, b.height) for b in out[0]]
    assert got == sorted(rects, key=lambda r: (r[1], r[0]))
    assert all(b.confidence == 1.0 for b in out[0])


def test_rescale_uses_exact_ratio_not_rounded_dims():
    """Session review: the rescale factor must be the reference's exact
    1/max(heightRatio, widthRatio) (ResizeImageAndKeepAspectRatio
    .scala:17,43), NOT rounded-resized-width/original-width — on a
    height-bound portrait page the int-truncated resized width drifts
    boxes by several px at the page edge."""
    h, w = 1280, 500  # height-bound: resized to 640x250, ratio exactly 2
    img = np.full((h, w), 255, np.uint8)
    img[1000:1100, 300:400] = 0  # even coords, survive exact /2
    pred = RetryingBatchPredictor(NumpyLayoutModel())
    out = pred.predict_batch([img], BLOCKS)[0]
    assert [(b.left, b.top, b.width, b.height) for b in out] == [
        (300, 1000, 100, 100)
    ]
    # non-even ratio page: scale must equal 1/ratio exactly
    h2, w2 = 1281, 500
    img2 = np.full((h2, w2), 255, np.uint8)
    img2[0:1281, 0:500] = 255
    img2[100:200, 100:200] = 0
    out2 = pred.predict_batch([img2], BLOCKS)[0]
    ratio = h2 / 640
    b = out2[0]
    # recovered box = detected-resized-box * ratio (int-truncated), and
    # the detected box is within 1px of 100/ratio..200/ratio
    assert abs(b.left - 100) <= ratio and abs(b.top - 100) <= ratio


def test_no_upscale_when_page_fits():
    """Pages already inside the request size pass through unresized
    (ResizeImageAndKeepAspectRatio never upscales)."""
    rects = [(11, 17, 33, 9)]  # odd coords survive only without resize
    pred = RetryingBatchPredictor(NumpyLayoutModel())
    out = pred.predict_batch([_page(rects, size=640)], BLOCKS)
    assert [(b.left, b.top, b.width, b.height) for b in out[0]] == rects


def test_min_confidence_filter():
    """Boxes under the endpoint's min-confidence are dropped (the
    reference passes min-confidence to the server; filtering is
    equivalent and keeps the contract local). An L-shaped component has
    fill ratio < 1 within its bbox."""
    img = np.full((640, 640), 255, np.uint8)
    img[100:200, 100:120] = 0  # vertical bar
    img[180:200, 100:220] = 0  # horizontal bar → one L component
    pred = RetryingBatchPredictor(NumpyLayoutModel())
    all_boxes = pred.predict_batch([img], BLOCKS, min_confidence=0.0)[0]
    assert len(all_boxes) == 1 and all_boxes[0].confidence < 0.5
    kept = pred.predict_batch([img], BLOCKS, min_confidence=0.5)[0]
    assert kept == []


def _npy_bytes(img):
    buf = io.BytesIO()
    np.save(buf, img)
    return buf.getvalue()


def test_spark_predict_layout_boxes(spark):
    """The Spark operator: per-row decode quarantine + box rows, narrow
    plan (zero Exchange)."""
    good = _npy_bytes(_page([(32, 32, 120, 80), (344, 32, 120, 80)]))
    df = spark.createDataFrame(
        [("d0", bytearray(good)), ("bad", bytearray(b"not npy"))],
        "doc_id string, image binary",
    )
    out = predict_layout_boxes(
        df, lambda: RetryingBatchPredictor(NumpyLayoutModel())
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = out.collect()
    ok = [r for r in rows if r["status"] == "ok"]
    err = [r for r in rows if r["status"] == "error"]
    assert {(r["left"], r["top"], r["width"], r["height"]) for r in ok} == {
        (32, 32, 120, 80), (344, 32, 120, 80)
    }
    assert len(err) == 1 and err[0]["doc_id"] == "bad"
    assert "Error" in err[0]["error"] or "error" in err[0]["error"].lower()


def test_spark_permanent_failure_quarantines_batch(spark):
    """A model that stays down (retries exhausted) yields status='error'
    rows for every doc in the batch — the job itself succeeds. The
    backoff runs on the WORKER with the injected no-op sleep."""
    good = _npy_bytes(_page([(32, 32, 120, 80)]))
    df = spark.createDataFrame(
        [("d0", bytearray(good)), ("d1", bytearray(good))],
        "doc_id string, image binary",
    )

    def make_predictor():
        # defined inside the factory so cloudpickle ships it by value
        # (test-module classes are not importable on the workers)
        class DownModel:
            def forward(self, images, min_confidence):
                raise TransientPredictionError("server down")

        return RetryingBatchPredictor(DownModel(), sleep=lambda s: None)

    rows = predict_layout_boxes(df, make_predictor).collect()
    assert len(rows) == 2
    assert all(r["status"] == "error" for r in rows)
    assert all("PredictionFailedError" in r["error"] for r in rows)


def test_real_socket_roundtrip_with_injected_503s(spark):
    """VERDICT r4 item 2 — the real-transport drive, in-suite form: a
    loopback HTTP model server on a REAL TCP socket (stdlib
    ThreadingHTTPServer), with the first two requests answering 503.
    predict_layout_boxes over HttpLayoutModel (the default urllib
    transport, no injection) must retry through the 503s and produce
    the same boxes as the in-process model, with the decode-quarantine
    row intact."""
    from jochre3_ocr_spark.operators.model_server import serve_background
    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    server, _ = serve_background(fail_first=2)
    port = server.server_address[1]
    try:
        good = _npy_bytes(_page([(32, 32, 120, 80), (344, 32, 120, 80)]))
        df = spark.createDataFrame(
            [("d0", bytearray(good)), ("bad", bytearray(b"not npy"))],
            "doc_id string, image binary",
        ).coalesce(1)  # one task → deterministic request ordering
        url = f"http://127.0.0.1:{port}/predict"

        def make_predictor():
            return RetryingBatchPredictor(
                HttpLayoutModel(url), sleep=lambda s: None
            )

        rows = predict_layout_boxes(df, make_predictor).collect()
        ok = [r for r in rows if r["status"] == "ok"]
        err = [r for r in rows if r["status"] == "error"]
        assert {
            (r["left"], r["top"], r["width"], r["height"]) for r in ok
        } == {(32, 32, 120, 80), (344, 32, 120, 80)}
        assert len(err) == 1 and err[0]["doc_id"] == "bad"
        assert server.jochre_state.requests >= 3  # 2 refused + 1 served
    finally:
        server.shutdown()


def test_real_socket_server_restart_recovery(spark):
    """Kill the server mid-run → connection refused (transient) → the
    retry schedule rides through → a restarted server on the SAME port
    serves the request. The real-socket twin of the injected-transport
    retry tests."""
    from jochre3_ocr_spark.operators.model_server import serve_background
    from jochre3_ocr_spark.operators.predictor import (
        HttpLayoutModel,
        NumpyLayoutModel,
    )

    server, _ = serve_background()
    port = server.server_address[1]
    server.shutdown()
    server.server_close()  # port free, nothing listening

    url = f"http://127.0.0.1:{port}/predict"
    restarted: list = []

    def sleep_then_restart(_s):
        # first backoff sleep: bring the server back on the same port
        if not restarted:
            restarted.append(serve_background(port=port))

    pred = RetryingBatchPredictor(
        HttpLayoutModel(url), sleep=sleep_then_restart
    )
    img = _page([(32, 32, 120, 80)])
    try:
        boxes = pred.predict_batch([img], BLOCKS)[0]
        want = RetryingBatchPredictor(NumpyLayoutModel()).predict_batch(
            [img], BLOCKS
        )[0]
        assert boxes == want
        assert len(restarted) == 1  # recovery went through the restart
    finally:
        if restarted:
            restarted[0][0].shutdown()


def test_real_socket_deadline_expires_then_quarantines():
    """A server that answers slower than the per-attempt deadline: every
    attempt times out on a REAL socket and the predictor surfaces
    PredictionFailedError after the retry schedule — the reference's
    30 s client timeout semantics (YoloPredictor.scala:58,
    reference.conf:27) at test-scale values."""
    from jochre3_ocr_spark.operators.model_server import serve_background
    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    server, _ = serve_background(delay=2.0)
    port = server.server_address[1]
    try:
        pred = RetryingBatchPredictor(
            HttpLayoutModel(f"http://127.0.0.1:{port}/predict"),
            max_retries=1,
            sleep=lambda s: None,
            request_timeout=0.3,
        )
        with pytest.raises(PredictionFailedError, match="timeout"):
            pred.predict_batch([_page([(32, 32, 120, 80)])], BLOCKS)
    finally:
        server.shutdown()


def test_predicted_boxes_drive_block_only_segmenter(spark):
    """Slot-to-chain integration: predictor boxes feed the BlockOnly
    segmenter strategy and come out as the document's sorted TextBlocks
    — the production path from DLA prediction into the OCR tree."""
    from jochre3_ocr_spark.operators.strategies import block_only_segment

    rects = [(32, 32, 120, 80), (344, 32, 120, 80), (32, 500, 200, 64)]
    pred = RetryingBatchPredictor(NumpyLayoutModel())
    boxes = pred.predict_batch([_page(rects, size=1280)], BLOCKS)[0]
    doc = block_only_segment("d0", 1280, 1280, boxes, left_to_right=False)
    assert len(doc.blocks) == 3
    got = {(b.rect.left, b.rect.top, b.rect.width, b.rect.height)
           for b in doc.blocks}
    assert got == set(rects)


# ---- per-attempt timeout (reference.conf:27 / YoloPredictor.scala:58) ----
class HangingModel:
    """forward blocks far past the request timeout — the hung-server case."""

    def __init__(self, hang_s=30.0):
        self.hang_s = hang_s
        self.calls = 0

    def forward(self, images, min_confidence):
        import time as _t

        self.calls += 1
        _t.sleep(self.hang_s)
        return [[] for _ in images]


def test_hung_forward_times_out_retries_then_fails():
    """VERDICT r3 item 3: a hung model call must become a per-attempt
    timeout -> TransientPredictionError -> the exact exponential backoff
    schedule -> PredictionFailedError, never a stalled task."""
    # 1 s hang ≫ the 0.05 s timeout, short enough that the 6 abandoned
    # worker threads drain quickly at interpreter exit
    model = HangingModel(hang_s=1.0)
    sleeps = []
    pred = RetryingBatchPredictor(
        model, sleep=sleeps.append, request_timeout=0.05
    )
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(PredictionFailedError) as ei:
        pred.predict_batch([img])
    assert "timeout" in str(ei.value)
    assert sleeps == [1.0, 2.0, 4.0, 8.0, 16.0]  # schedule preserved
    assert model.calls == 6  # initial + 5 retries, each attempt bounded


def test_fast_forward_unaffected_by_timeout():
    pred = RetryingBatchPredictor(NumpyLayoutModel(), request_timeout=30.0)
    img = np.full((20, 20), 255, dtype=np.uint8)
    img[5:10, 5:10] = 0
    out = pred.predict_batch([img])
    assert len(out) == 1 and len(out[0]) == 1


class ShortOutputModel:
    """Returns fewer per-image box lists than inputs (broken contract)."""

    def forward(self, images, min_confidence):
        return [[] for _ in images[:-1]]


def test_short_model_output_fails_batch_not_silent_drop():
    """ADVICE r3: a model returning fewer box lists than images used to
    silently drop the trailing pages through zip(); it must raise so the
    Spark op quarantines every row of the batch."""
    pred = RetryingBatchPredictor(ShortOutputModel(), request_timeout=None)
    imgs = [np.zeros((8, 8), dtype=np.uint8)] * 3
    with pytest.raises(PredictionFailedError) as ei:
        pred.predict_batch(imgs)
    assert "2 box lists for 3 images" in str(ei.value)


# ---------------- HTTP-shaped adapter (injected transport) ----------------
def _http_roundtrip_transport(url, body, timeout):
    """A fake DLA server: decodes the request, emits one full-image box
    per image — proves the wire contract end to end without a network."""
    import base64
    import io
    import json

    req = json.loads(body.decode("utf-8"))
    preds = []
    for blob in req["images"]:
        img = np.load(io.BytesIO(base64.b64decode(blob)), allow_pickle=False)
        preds.append(
            [
                {
                    "label": "TextBlock",
                    "left": 0,
                    "top": 0,
                    "width": int(img.shape[1]),
                    "height": int(img.shape[0]),
                    "confidence": 0.9,
                }
            ]
        )
    return json.dumps({"predictions": preds}).encode("utf-8")


def test_http_model_roundtrip_with_rescale():
    """HttpLayoutModel behind RetryingBatchPredictor: request encodes the
    RESIZED batch, response boxes come back in resized coordinates and
    are rescaled to the original page exactly like the reference client
    (YoloPredictor.scala:133-138)."""
    from jochre3_ocr_spark.operators.predictor import BLOCKS, HttpLayoutModel

    model = HttpLayoutModel("http://dla.test/predict",
                            transport=_http_roundtrip_transport)
    pred = RetryingBatchPredictor(model)
    img = np.zeros((1280, 960), dtype=np.uint8)  # 2x the 640 request size
    (boxes,) = pred.predict_batch([img], BLOCKS)
    assert len(boxes) == 1
    b = boxes[0]
    # resized 640x480 full-image box, rescaled by 2 -> original dims
    assert (b.width, b.height) == (960, 1280)


def test_http_transport_error_is_transient_and_retried():
    calls = []

    def flaky_transport(url, body, timeout):
        calls.append(url)
        if len(calls) < 3:
            raise ConnectionRefusedError("server down")
        return _http_roundtrip_transport(url, body, timeout)

    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    model = HttpLayoutModel("http://dla.test/predict", transport=flaky_transport)
    sleeps = []
    pred = RetryingBatchPredictor(model, sleep=sleeps.append)
    img = np.zeros((16, 16), dtype=np.uint8)
    out = pred.predict_batch([img])
    assert len(out) == 1
    assert sleeps == [1.0, 2.0]  # two transient failures, then success


def test_http_malformed_response_fails_immediately():
    """Garbage from the server is a broken contract, not a retryable
    transport blip: no retries, immediate PredictionFailedError."""
    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    calls = []

    def garbage_transport(url, body, timeout):
        calls.append(url)
        return b"not json at all"

    model = HttpLayoutModel("http://dla.test/predict", transport=garbage_transport)
    pred = RetryingBatchPredictor(model, sleep=lambda s: None)
    with pytest.raises(PredictionFailedError):
        pred.predict_batch([np.zeros((8, 8), dtype=np.uint8)])
    assert len(calls) == 1


def test_http_4xx_is_permanent_not_retried():
    """A client error (bad URL/payload) must quarantine immediately —
    retrying a 404 with full backoff on every batch is hopeless work."""
    import urllib.error

    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    calls = []

    def notfound_transport(url, body, timeout):
        calls.append(url)
        raise urllib.error.HTTPError(url, 404, "Not Found", {}, None)

    model = HttpLayoutModel("http://dla.test/missing",
                            transport=notfound_transport)
    pred = RetryingBatchPredictor(model, sleep=lambda s: None)
    with pytest.raises(PredictionFailedError, match="404"):
        pred.predict_batch([np.zeros((8, 8), dtype=np.uint8)])
    assert len(calls) == 1


def test_http_non_numeric_code_attr_stays_transient():
    """ADVICE r4: a transport exception carrying a non-numeric .code
    (e.g. a string errno) must classify as transient, not explode inside
    the except handler and bypass the retry contract entirely."""
    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    calls = []

    class WeirdTransportError(OSError):
        code = "ECONNRESET"  # string, not an HTTP status

    def weird_transport(url, body, timeout):
        calls.append(url)
        if len(calls) < 2:
            raise WeirdTransportError("connection reset")
        return _http_roundtrip_transport(url, body, timeout)

    model = HttpLayoutModel("http://dla.test/predict",
                            transport=weird_transport)
    pred = RetryingBatchPredictor(model, sleep=lambda s: None)
    out = pred.predict_batch([np.zeros((16, 16), dtype=np.uint8)])
    assert len(out) == 1 and len(calls) == 2


def test_http_5xx_stays_transient():
    import urllib.error

    from jochre3_ocr_spark.operators.predictor import HttpLayoutModel

    calls = []

    def flaky_5xx(url, body, timeout):
        calls.append(url)
        if len(calls) < 2:
            raise urllib.error.HTTPError(url, 503, "Unavailable", {}, None)
        return _http_roundtrip_transport(url, body, timeout)

    model = HttpLayoutModel("http://dla.test/predict", transport=flaky_5xx)
    pred = RetryingBatchPredictor(model, sleep=lambda s: None)
    out = pred.predict_batch([np.zeros((16, 16), dtype=np.uint8)])
    assert len(out) == 1 and len(calls) == 2
