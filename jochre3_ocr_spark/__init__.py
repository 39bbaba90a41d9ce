"""jochre3_ocr_spark — a brand-new PySpark-native OCR-extraction analytics engine.

Re-expresses the computational semantics of joliciel-informatique/jochre3-ocr
(reference at /root/reference, Scala 3 / ZIO) as an idiomatic PySpark
DataFrame pipeline: one row per document, spans as array<struct>, all per-row
Python confined to Arrow-batched pandas UDFs / mapInPandas kernels.

Layout
------
functions/   pure-Python + column-expression scalar kernels
             (geometry, reading order, Yiddish simplifier/transliterator,
              lexicon semantics, text metrics)
operators/   span-tree rewrite rules, guesser (beam/hyphenation), segmentation
             (NMS/placement/spaces), dedup, similarity — per-doc kernels and
             the DataFrame operators wrapping them
sources/     deterministic corpus generator, ALTO XML scan/sink
plans/       the end-to-end DataFrame pipeline + checkpoint/resume
streaming/   Trigger.AvailableNow facade over the batch pipeline
"""

__version__ = "0.1.0"
