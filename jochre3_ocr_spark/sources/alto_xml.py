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


# --------------------------------------------------------- header metadata
from dataclasses import dataclass, field  # noqa: E402


@dataclass
class ProcessingStep:
    """Description/Processing (core/model/ProcessingStep.scala:7-43)."""

    id: str = "JOCHRE1"
    processing_time: str | None = None  # ISO offset datetime, None = omit
    processing_agency: str | None = None
    step_descriptions: tuple = ()
    step_settings: str | None = None
    software_creator: str | None = None
    software_name: str | None = None
    software_version: str | None = None
    application_description: str | None = None


def jochre_processing_step(processing_time: str | None = None) -> ProcessingStep:
    """ProcessingStep.jochre (ProcessingStep.scala:50-59) analog; the
    timestamp is injected for determinism."""
    return ProcessingStep(
        id="JOCHRE1",
        processing_time=processing_time,
        step_descriptions=("contentGeneration",),
        software_creator="Joliciel Informatique",
        software_name="Jochre",
        software_version="spark",
        application_description="PySpark-native Jochre3 OCR analytics engine",
    )


@dataclass
class TextStyle:
    """Styles/TextStyle (core/model/TextStyle.scala:5-17)."""

    id: str
    font_family: str | None = None
    font_type: str | None = None
    font_width: str | None = None
    font_size: float | None = None


@dataclass
class AltoTag:
    """Tags/LayoutTag | StructureTag (LayoutTag.scala, StructureTag.scala)."""

    kind: str  # "LayoutTag" | "StructureTag"
    id: str
    label: str


@dataclass
class AltoMeta:
    """Alto header sections beyond the Layout (Alto.scala:5-29)."""

    processing_steps: list = field(default_factory=list)
    text_styles: list = field(default_factory=list)
    tags: list = field(default_factory=list)


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
    baseline = None
    bl = el.get("BASELINE")
    if bl:
        try:
            # "x1,y1 x2,y2" (TextLine.fromXML / TextLine.scala:85)
            p1, p2 = bl.split(" ", 1)
            x1, y1 = (int(float(v)) for v in p1.split(","))
            x2, y2 = (int(float(v)) for v in p2.split(","))
            baseline = (x1, y1, x2, y2)
        except ValueError:
            baseline = None
    return TextLine(items=items, rect=_rect(el), baseline=baseline)


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
    page_meta = {
        "language": None,
        "confidence": 0.0,
        "rotation": 0.0,
        "width": 0,
        "height": 0,
    }

    def walk(el):
        tag = _strip_ns(el.tag)
        if tag == "Page":
            # Page.fromXML reads LANG, PC and ROTATION (Page.scala:260-267)
            page_meta["language"] = el.get("LANG") or page_meta["language"]
            page_meta["confidence"] = float(el.get("PC") or 0.0)
            page_meta["rotation"] = float(el.get("ROTATION") or 0.0)
            page_meta["width"] = _int_attr(el, "WIDTH", 0)
            page_meta["height"] = _int_attr(el, "HEIGHT", 0)
            for c in el:
                walk(c)
            return
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
            blocks.append(Media(media_ref=el.get("ID", ""), rect=_rect(el)))
        else:
            for c in el:
                walk(c)

    walk(root)
    return Document(
        doc_id=doc_id,
        blocks=blocks,
        language=page_meta["language"],
        confidence=page_meta["confidence"],
        rotation=page_meta["rotation"],
        width=page_meta["width"],
        height=page_meta["height"],
    )


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
    attrs = {}
    if line.rect is not None:
        attrs.update(_box_attrs(line.rect))
    if line.baseline is not None:
        x1, y1, x2, y2 = line.baseline
        attrs["BASELINE"] = f"{x1},{y1} {x2},{y2}"  # TextLine.scala:85
    el = ET.SubElement(parent, "TextLine", attrs)
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


def _emit_processing_step(desc, step: ProcessingStep) -> None:
    """ProcessingStep.toXml (ProcessingStep.scala:20-43)."""
    p = ET.SubElement(desc, "Processing", {"ID": step.id})
    if step.processing_time:
        ET.SubElement(p, "processingDateTime").text = step.processing_time
    if step.processing_agency:
        ET.SubElement(p, "processingAgency").text = step.processing_agency
    for d in step.step_descriptions:
        ET.SubElement(p, "processingStepDescription").text = d
    if step.step_settings:
        ET.SubElement(p, "processingStepSettings").text = step.step_settings
    sw = ET.SubElement(p, "processingSoftware")
    if step.software_creator:
        ET.SubElement(sw, "softwareCreator").text = step.software_creator
    if step.software_name:
        ET.SubElement(sw, "softwareName").text = step.software_name
    if step.software_version:
        ET.SubElement(sw, "softwareVersion").text = step.software_version
    if step.application_description:
        ET.SubElement(sw, "applicationDescription").text = (
            step.application_description
        )


def emit_alto(
    doc: Document,
    width: int = 0,
    height: int = 0,
    meta: AltoMeta | None = None,
) -> str:
    """Document → ALTO-4 XML string (single Page/PrintSpace); header
    sections (Processing / Styles / Tags) per Alto.scala:15-29."""
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
    if meta:
        for step in meta.processing_steps:
            _emit_processing_step(desc, step)
    layout = ET.SubElement(root, "Layout")
    page_attrs = {
        "ID": doc.doc_id,
        "HEIGHT": str(height),
        "WIDTH": str(width),
        "PHYSICAL_IMG_NR": "1",
        # Page.scala:147: LANG={language} PC={confidence.roundTo(2)}
        "PC": f"{round(doc.confidence, 2):g}",
    }
    if doc.language:
        page_attrs["LANG"] = doc.language
    if doc.rotation:
        page_attrs["ROTATION"] = f"{round(doc.rotation, 2):g}"
    page = ET.SubElement(layout, "Page", page_attrs)
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
    if meta and meta.text_styles:
        styles = ET.SubElement(root, "Styles")
        for st in meta.text_styles:
            attrs = {"ID": st.id}
            if st.font_family:
                attrs["FONTFAMILY"] = st.font_family
            if st.font_type:
                attrs["FONTTYPE"] = st.font_type
            if st.font_width:
                attrs["FONTWIDTH"] = st.font_width
            if st.font_size is not None:
                attrs["FONTSIZE"] = f"{st.font_size:.1f}"
            ET.SubElement(styles, "TextStyle", attrs)
    if meta and meta.tags:
        tags_el = ET.SubElement(root, "Tags")
        for tag in meta.tags:
            ET.SubElement(tags_el, tag.kind, {"ID": tag.id, "LABEL": tag.label})
    buf = StringIO()
    ET.ElementTree(root).write(buf, encoding="unicode", xml_declaration=True)
    return buf.getvalue()


def parse_alto_meta(xml_text: str) -> AltoMeta:
    """Header sections: Processing, TextStyle, Layout/Structure tags —
    the union merge mirrors Alto.fromXML (Alto.scala:42-72)."""
    root = ET.fromstring(xml_text)
    meta = AltoMeta()
    for el in root.iter():
        tag = _strip_ns(el.tag)
        if tag == "Processing":
            step = ProcessingStep(id=el.get("ID", ""))
            for c in el.iter():
                ct = _strip_ns(c.tag)
                text = (c.text or "").strip()
                if ct == "processingDateTime":
                    step.processing_time = text or None
                elif ct == "processingAgency":
                    step.processing_agency = text or None
                elif ct == "processingStepDescription":
                    step.step_descriptions = (*step.step_descriptions, text)
                elif ct == "processingStepSettings":
                    step.step_settings = text or None
                elif ct == "softwareCreator":
                    step.software_creator = text or None
                elif ct == "softwareName":
                    step.software_name = text or None
                elif ct == "softwareVersion":
                    step.software_version = text or None
                elif ct == "applicationDescription":
                    step.application_description = text or None
            meta.processing_steps.append(step)
        elif tag == "TextStyle":
            fs = el.get("FONTSIZE")
            meta.text_styles.append(
                TextStyle(
                    id=el.get("ID", ""),
                    font_family=el.get("FONTFAMILY"),
                    font_type=el.get("FONTTYPE"),
                    font_width=el.get("FONTWIDTH"),
                    # lenient default 12.0 like TextStyle.fromXML
                    font_size=(
                        float(fs) if fs and _is_float(fs) else (12.0 if fs else None)
                    ),
                )
            )
        elif tag in ("LayoutTag", "StructureTag"):
            meta.tags.append(
                AltoTag(kind=tag, id=el.get("ID", ""), label=el.get("LABEL", ""))
            )
    return meta


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False
