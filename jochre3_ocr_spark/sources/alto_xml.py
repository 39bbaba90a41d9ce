"""ALTO-4 XML scan and sink.

Scan: parse ALTO XML (the reference's gold-corpus format,
core/model/Alto.scala:42-72, with per-level fromXML at Page.scala:244-291,
TextBlock.scala:157-186, TextLine.scala:147-170, Word.scala:130-165) into
the span tree. Parsing is lenient like the reference — missing numeric
attributes default to 0/1 (Rectangle.fromXML, Rectangle.scala:216-221).

Sink: emit ALTO-4 XML from a Document (OutputFormat.Alto4,
core/output/OutputFormat.scala; element shapes from the model classes'
``toXml``). Confidences round to 2 decimals at serialization only
(MathUtils.roundTo, core/utils/MathUtils.scala:7-11).

On the Spark side both directions run inside pandas UDFs over string
columns (spark.read.text / binaryFile → parse; emit → df.write.text).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from io import StringIO

from jochre3_ocr_spark.operators.spantree import (
    ComposedBlock,
    Document,
    Glyph,
    Hyphen,
    Media,
    Rect,
    Space,
    TextBlock,
    TextLine,
    Word,
)

ALTO_NS = "http://www.loc.gov/standards/alto/ns-v4#"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _int_attr(el, name: str, default: int = 0) -> int:
    try:
        return int(el.get(name))
    except (TypeError, ValueError):
        return default


def _rect(el) -> Rect:
    return Rect(
        _int_attr(el, "HPOS", 0),
        _int_attr(el, "VPOS", 0),
        _int_attr(el, "WIDTH", 1),
        _int_attr(el, "HEIGHT", 1),
    )


def _parse_word(el) -> Word:
    glyphs = []
    alternatives = []
    for child in el:
        tag = _strip_ns(child.tag)
        if tag == "Glyph":
            glyphs.append(
                Glyph(
                    child.get("CONTENT", ""),
                    _rect(child),
                    float(child.get("GC") or 0.0),
                )
            )
        elif tag == "ALTERNATIVE":
            alternatives.append(
                (child.get("PURPOSE", ""), (child.text or ""))
            )
    return Word(
        content=el.get("CONTENT", ""),
        rect=_rect(el),
        glyphs=glyphs,
        alternatives=sorted(alternatives),
        confidence=float(el.get("WC") or 0.0),
        language=el.get("LANG"),
        subs_type=el.get("SUBS_TYPE"),
        subs_content=el.get("SUBS_CONTENT"),
    )


def _parse_line(el) -> TextLine:
    items = []
    for child in el:
        tag = _strip_ns(child.tag)
        if tag == "String":
            items.append(_parse_word(child))
        elif tag == "SP":
            items.append(Space(_rect(child)))
        elif tag == "HYP":
            items.append(Hyphen(child.get("CONTENT", ""), _rect(child)))
    return TextLine(items=items)


def _parse_text_block(el) -> TextBlock:
    return TextBlock(
        lines=[_parse_line(c) for c in el if _strip_ns(c.tag) == "TextLine"],
        language=el.get("LANG"),
        rect=_rect(el),
    )


def parse_alto(xml_text: str, doc_id: str | None = None) -> Document:
    """ALTO XML → Document. Handles TextBlock / ComposedBlock /
    Illustration under any Page/PrintSpace nesting."""
    root = ET.fromstring(xml_text)
    if doc_id is None:
        fn = root.find(f".//{{{ALTO_NS}}}fileName")
        if fn is None:
            fn = root.find(".//fileName")
        doc_id = (fn.text or "") if fn is not None else ""
    blocks: list = []

    def walk(el):
        tag = _strip_ns(el.tag)
        if tag == "TextBlock":
            blocks.append(_parse_text_block(el))
        elif tag == "ComposedBlock":
            blocks.append(
                ComposedBlock(
                    blocks=[
                        _parse_text_block(c)
                        for c in el
                        if _strip_ns(c.tag) == "TextBlock"
                    ],
                    rect=_rect(el),
                )
            )
        elif tag == "Illustration":
            blocks.append(Media(media_ref=el.get("ID", "")))
        else:
            for c in el:
                walk(c)

    walk(root)
    return Document(doc_id=doc_id, blocks=blocks)


# --------------------------------------------------------------- emission
def _fmt_conf(c: float) -> str:
    return f"{round(c, 2):g}"


def _box_attrs(rect: Rect) -> dict:
    return {
        "HPOS": str(rect.left),
        "VPOS": str(rect.top),
        "WIDTH": str(rect.width),
        "HEIGHT": str(rect.height),
    }


def _emit_line(line: TextLine, parent) -> None:
    el = ET.SubElement(parent, "TextLine")
    for item in line.items:
        if isinstance(item, Word):
            attrs = {
                **_box_attrs(item.rect),
                "CONTENT": item.content,
                "WC": _fmt_conf(item.confidence),
            }
            if item.language:
                attrs["LANG"] = item.language
            if item.subs_type:
                attrs["SUBS_TYPE"] = item.subs_type
            if item.subs_content:
                attrs["SUBS_CONTENT"] = item.subs_content
            w = ET.SubElement(el, "String", attrs)
            for purpose, content in item.alternatives:
                a = ET.SubElement(w, "ALTERNATIVE", {"PURPOSE": purpose})
                a.text = content
            for g in item.glyphs:
                ET.SubElement(
                    w,
                    "Glyph",
                    {
                        **_box_attrs(g.rect),
                        "CONTENT": g.content,
                        "GC": _fmt_conf(g.confidence),
                    },
                )
        elif isinstance(item, Space):
            ET.SubElement(el, "SP", _box_attrs(item.rect))
        elif isinstance(item, Hyphen):
            ET.SubElement(
                el, "HYP", {**_box_attrs(item.rect), "CONTENT": item.content}
            )


def emit_alto(doc: Document, width: int = 0, height: int = 0) -> str:
    """Document → ALTO-4 XML string (single Page/PrintSpace)."""
    root = ET.Element(
        "alto",
        {
            "xmlns": ALTO_NS,
            "xmlns:xlink": "http://www.w3.org/1999/xlink",
        },
    )
    desc = ET.SubElement(root, "Description")
    ET.SubElement(desc, "MeasurementUnit").text = "pixel"
    sii = ET.SubElement(desc, "sourceImageInformation")
    ET.SubElement(sii, "fileName").text = doc.doc_id
    layout = ET.SubElement(root, "Layout")
    page = ET.SubElement(
        layout,
        "Page",
        {
            "ID": doc.doc_id,
            "HEIGHT": str(height),
            "WIDTH": str(width),
            "PHYSICAL_IMG_NR": "1",
        },
    )
    ps = ET.SubElement(
        page,
        "PrintSpace",
        {"HEIGHT": str(height), "WIDTH": str(width), "HPOS": "0", "VPOS": "0"},
    )
    tb_counter = 0
    for block in doc.blocks:
        if isinstance(block, Media):
            ET.SubElement(ps, "Illustration", {"ID": block.media_ref})
        elif isinstance(block, ComposedBlock):
            tb_counter += 1
            cb = ET.SubElement(ps, "ComposedBlock", {"ID": f"CB_{tb_counter:05d}"})
            for child in block.blocks:
                tb_counter += 1
                tb = ET.SubElement(cb, "TextBlock", {"ID": f"TB_{tb_counter:05d}"})
                for line in child.lines:
                    _emit_line(line, tb)
        else:
            tb_counter += 1
            tb = ET.SubElement(ps, "TextBlock", {"ID": f"TB_{tb_counter:05d}"})
            for line in block.lines:
                _emit_line(line, tb)
    buf = StringIO()
    ET.ElementTree(root).write(buf, encoding="unicode", xml_declaration=True)
    return buf.getvalue()
