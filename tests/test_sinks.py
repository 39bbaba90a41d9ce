"""Directory scan + eval TSV + text sinks."""

import glob
import os

from jochre3_ocr_spark.sources.sinks import read_binary_dir, write_eval_tsv, write_text


def test_read_binary_dir(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"png-bytes")
    (tmp_path / "b.jpg").write_bytes(b"jpg-bytes")
    (tmp_path / "ignore.txt").write_text("nope")
    df = read_binary_dir(spark, str(tmp_path))
    rows = df.collect()
    assert {os.path.basename(r["path"]) for r in rows} == {"a.png", "b.jpg"}
    assert read_binary_dir(spark, str(tmp_path), max_files=1).count() == 1


def test_write_eval_tsv(spark, tmp_path):
    metrics = spark.createDataFrame(
        [("f1", 0.1, 100), ("f2", 0.3, 200)],
        "file string, cer double, char_count long",
    )
    out = str(tmp_path / "eval")
    write_eval_tsv(metrics, out)
    content = open(glob.glob(f"{out}/part-*.csv")[0]).read()
    lines = content.strip().split("\n")
    assert lines[0] == "file\tcer\tchar_count"
    assert len(lines) == 4  # header + 2 rows + mean
    assert lines[-1].startswith("mean\t0.2\t150")  # mean row last


def test_write_text(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", "hello\nworld")], "doc_id string, processed_text string"
    )
    out = str(tmp_path / "text")
    write_text(df, out)
    content = "".join(
        open(f).read() for f in sorted(glob.glob(f"{out}/part-*.txt"))
    )
    assert content.strip() == "d1\thello\\nworld"


def test_api_facade():
    """The REST-endpoint analogs (jochre3_ocr_spark/api.py)."""
    import unicodedata

    from jochre3_ocr_spark import api
    from jochre3_ocr_spark.functions.lexicon import Lexicon

    lex = Lexicon.from_words(["דער", "געװאָרן"])
    spans = [
        ("block", None, None, 0),
        ("line", None, None, 1),
        ("word", "דער", None, 2),
    ]
    out = api.analyze_spans("d", spans, lex, formats=("Alto4", "Text", "ProcessedText"))
    nfd = lambda s: unicodedata.normalize("NFD", s)
    assert out["Text"] == nfd("דער")
    assert out["ProcessedText"] == nfd("דער")
    assert out["Alto4"].startswith("<?xml")
    assert api.word_in_lexicon("דער", lex) == 1
    assert api.word_in_lexicon("דץר", lex) == -1
    assert api.standardize_words(["דער"], lex) == [nfd("דער")]
    assert api.dehyphenate_text(nfd("גע־\nװאָרן דער"), lex) == nfd("געװאָרן דער\n")
