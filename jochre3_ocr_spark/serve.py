"""Single-document HTTP serving layer — the reference's REST API
(``api/.../MainApp.scala:27-125`` boots the zio-http server;
``analysis/AnalysisApp.scala:249-303`` defines the endpoints) over the
:mod:`jochre3_ocr_spark.api` facade, on stdlib ``ThreadingHTTPServer``
like the layout-model server (``operators/model_server.py``). No Spark
session — these are the per-document library calls, which is exactly
the reference's serving shape (one document per request; the
batch/cluster path is ``plans/pipeline``).

| reference endpoint | here |
|---|---|
| POST /ocr/file (analyze → outputs)     | POST /analyze (JSON) |
| POST /ocr/file (Alto4 zip download)    | POST /analyze-zip (application/zip, AnalysisLogic.scala:232-245) |
| GET /word-in-lexicon?word=             | same |
| GET /standardize-words?words=a,b       | same |
| POST /dehyphenate                      | same (JSON {"text": …}) |

Run standalone::

    python -m jochre3_ocr_spark.serve --port 0 --lexicon words.txt
    # prints one line: {"port": <actual>} then serves until killed
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from jochre3_ocr_spark import api
from jochre3_ocr_spark.functions.lexicon import Lexicon


def _analyze_payload(payload: dict, lexicon: Lexicon) -> dict[str, str]:
    spans = [
        (s[0], s[1], s[2], int(s[3])) for s in payload["spans"]
    ]
    formats = tuple(payload.get("formats", ["Alto4"]))
    return api.analyze_spans(
        str(payload["doc_id"]), spans, lexicon, formats=formats
    )


def _header_filename(doc_id: str) -> str:
    """Sanitized ASCII filename for the Content-Disposition header:
    doc_id is CLIENT input — a CR/LF would inject response headers, and
    a non-latin-1 codepoint makes ``send_header`` raise AFTER the
    status line is buffered (mangling the response mid-write), so
    anything outside a conservative ASCII set becomes ``_``. Only the
    HEADER is sanitized; the zip MEMBER name keeps the real doc_id
    (zipfile encodes it UTF-8)."""
    safe = "".join(
        c if (c.isascii() and (c.isalnum() or c in "._-")) else "_"
        for c in doc_id
    )
    return f"{safe or 'doc'}_alto4.zip"


def _make_handler(lexicon: Lexicon):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # noqa: D102 — quiet
            pass

        # -- plumbing --------------------------------------------------
        def _send(self, code: int, body: bytes, ctype: str,
                  extra: dict | None = None) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(
                code, json.dumps(obj).encode("utf-8"), "application/json"
            )

        def _read_json(self) -> dict:
            length = int(self.headers.get("Content-Length", "0"))
            return json.loads(self.rfile.read(length).decode("utf-8"))

        # -- endpoints -------------------------------------------------
        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            q = parse_qs(url.query)
            try:
                if url.path == "/word-in-lexicon":
                    word = q["word"][0]
                    self._json(
                        200,
                        {"frequency": api.word_in_lexicon(word, lexicon)},
                    )
                elif url.path == "/standardize-words":
                    words = [
                        w for w in q.get("words", [""])[0].split(",") if w
                    ]
                    self._json(
                        200,
                        {"words": api.standardize_words(words, lexicon)},
                    )
                else:
                    self._json(404, {"error": f"unknown path {url.path}"})
            except (KeyError, IndexError) as exc:
                self._json(400, {"error": f"missing parameter: {exc}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            try:
                payload = self._read_json()
            except Exception as exc:  # noqa: BLE001 — wire error mapping
                self._json(400, {"error": f"bad JSON: {exc}"})
                return
            try:
                if url.path == "/dehyphenate":
                    self._json(
                        200,
                        {
                            "text": api.dehyphenate_text(
                                payload["text"], lexicon
                            )
                        },
                    )
                elif url.path == "/analyze":
                    self._json(
                        200, {"outputs": _analyze_payload(payload, lexicon)}
                    )
                elif url.path == "/analyze-zip":
                    from jochre3_ocr_spark.sources.sinks import (
                        make_alto_zip_bytes,
                    )

                    payload["formats"] = ["Alto4"]
                    out = _analyze_payload(payload, lexicon)
                    doc_id = str(payload["doc_id"])
                    # build body + headers fully BEFORE _send: the 400
                    # handler below assumes nothing has hit the wire yet
                    body = make_alto_zip_bytes(doc_id, out["Alto4"])
                    disposition = (
                        "attachment; "
                        f'filename="{_header_filename(doc_id)}"'
                    )
                    self._send(
                        200, body, "application/zip",
                        {"Content-Disposition": disposition},
                    )
                else:
                    self._json(404, {"error": f"unknown path {url.path}"})
            except (KeyError, IndexError, TypeError, ValueError) as exc:
                # malformed payloads are client errors, never 500s
                self._json(
                    400, {"error": f"{type(exc).__name__}: {exc}"}
                )

    return Handler


def serve(port: int = 0, lexicon: Lexicon | None = None) -> ThreadingHTTPServer:
    """Bind on 127.0.0.1:``port`` (0 = ephemeral) without serving —
    call serve_forever (or :func:`serve_background`)."""
    lexicon = lexicon or Lexicon.from_words([])
    return ThreadingHTTPServer(("127.0.0.1", port), _make_handler(lexicon))


def serve_background(
    port: int = 0, lexicon: Lexicon | None = None
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    server = serve(port, lexicon)
    t = threading.Thread(
        target=server.serve_forever, name="api-server", daemon=True
    )
    t.start()
    return server, t


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--lexicon", default=None,
                   help="word-list text file (one word per line)")
    args = p.parse_args(argv)
    if args.lexicon:
        from jochre3_ocr_spark.functions.lexicon import load_lexicon

        lexicon = load_lexicon([args.lexicon])
    else:
        lexicon = Lexicon.from_words([])
    server = serve(args.port, lexicon)
    print(json.dumps({"port": server.server_address[1]}), flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
