import pytest


@pytest.fixture(scope="session")
def spark():
    from jochre3_ocr_spark.plans.pipeline import get_spark

    spark = get_spark("jochre3-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def lexicon():
    from jochre3_ocr_spark.functions.lexicon import Lexicon
    from jochre3_ocr_spark.sources.corpus import lexicon_words

    return Lexicon.from_words(lexicon_words())
