"""Real-socket drive of the single-document API server
(jochre3_ocr_spark/serve.py — the MainApp.scala:27-125 /
AnalysisApp.scala:249-303 serving analog): every endpoint exercised
over live TCP with stdlib urllib, responses compared against the
direct library calls."""

import json
import unicodedata
import urllib.error
import urllib.request
import zipfile
from io import BytesIO
from urllib.parse import quote

import pytest

from jochre3_ocr_spark import api
from jochre3_ocr_spark.functions.lexicon import Lexicon
from jochre3_ocr_spark.serve import serve_background

NFD = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731


@pytest.fixture(scope="module")
def server():
    lex = Lexicon.from_words(["דער", "געװאָרן"])
    srv, _ = serve_background(lexicon=lex)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, lex
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode("utf-8"))


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.headers, r.read()


def test_word_in_lexicon_over_http(server):
    base, lex = server
    for word, want in (("דער", 1), ("דץר", -1), ("אקס", 0)):
        got = _get(f"{base}/word-in-lexicon?word={quote(word)}")
        assert got == {"frequency": want}
        assert want == api.word_in_lexicon(word, lex)


def test_standardize_words_over_http(server):
    base, lex = server
    got = _get(f"{base}/standardize-words?words={quote('דער')}")
    assert got == {"words": api.standardize_words(["דער"], lex)}


def test_dehyphenate_over_http(server):
    base, lex = server
    text = NFD("גע־\nװאָרן דער")
    _, body = _post(f"{base}/dehyphenate", {"text": text})
    assert json.loads(body) == {"text": api.dehyphenate_text(text, lex)}


SPANS = [
    ["block", None, None, 0],
    ["line", None, None, 1],
    ["word", "דער", None, 2],
]


def test_analyze_over_http(server):
    base, lex = server
    _, body = _post(
        f"{base}/analyze",
        {"doc_id": "d", "spans": SPANS,
         "formats": ["Alto4", "Text", "ProcessedText"]},
    )
    out = json.loads(body)["outputs"]
    want = api.analyze_spans(
        "d",
        [tuple(s) for s in SPANS],
        lex,
        formats=("Alto4", "Text", "ProcessedText"),
    )
    assert out == want
    assert out["Alto4"].startswith("<?xml")


def test_analyze_zip_download(server):
    """The <doc>_alto4.zip download (AnalysisLogic.scala:232-245):
    application/zip, attachment filename, deterministic member bytes
    equal to the rendered Alto4."""
    base, lex = server
    headers, body = _post(
        f"{base}/analyze-zip", {"doc_id": "d", "spans": SPANS}
    )
    assert headers["Content-Type"] == "application/zip"
    assert 'filename="d_alto4.zip"' in headers["Content-Disposition"]
    with zipfile.ZipFile(BytesIO(body)) as zf:
        assert zf.namelist() == ["d_alto4.xml"]
        xml = zf.read("d_alto4.xml").decode("utf-8")
    want = api.analyze_spans("d", [tuple(s) for s in SPANS], lex)
    assert xml == want["Alto4"]
    # deterministic bytes: same request → identical zip
    _, again = _post(f"{base}/analyze-zip", {"doc_id": "d", "spans": SPANS})
    assert again == body


def test_analyze_zip_nonascii_docid_sanitized_header(server):
    """doc_id is client input: a Hebrew (non-latin-1) doc_id must not
    crash header encoding mid-response, and CR/LF cannot inject
    headers — the Content-Disposition filename is sanitized to ASCII
    while the zip MEMBER keeps the real doc_id (UTF-8)."""
    base, _ = server
    doc_id = "דער\r\nX-Evil: 1"
    headers, body = _post(
        f"{base}/analyze-zip", {"doc_id": doc_id, "spans": SPANS}
    )
    assert headers["Content-Type"] == "application/zip"
    assert "X-Evil" not in headers
    assert "\r" not in headers["Content-Disposition"]
    with zipfile.ZipFile(BytesIO(body)) as zf:
        assert zf.namelist() == [f"{doc_id}_alto4.xml"]


def test_client_errors_are_4xx_not_500(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/analyze", {"doc_id": "d"})  # missing spans
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/word-in-lexicon")  # missing param
    assert e.value.code == 400
