import numpy as np

from dataquality_spark.datagen import corpus
from dataquality_spark.functions.langid import get_model as get_langid
from dataquality_spark.functions.perplexity import EMPTY_PPL, get_model as get_charlm
from dataquality_spark.functions.pii import scrub_text
from dataquality_spark.functions.texthash import tokenize


def test_langid_separates_languages():
    m = get_langid()
    en = [corpus.sentence(1, 100 + i, 25) for i in range(40)]
    xx = [corpus.sentence(1, 200 + i, 25, corpus.XX_WORDS) for i in range(40)]
    langs_en, confs_en = m.predict_batch(en)
    langs_xx, _ = m.predict_batch(xx)
    assert langs_en == ["en"] * 40
    assert langs_xx == ["xx"] * 40
    assert confs_en.min() >= 0.6


def test_langid_empty_is_unknown():
    m = get_langid()
    assert m.predict_one("") == ("und", 0.0)
    assert m.predict_one("  ")[0] == "und"


def test_langid_deterministic():
    m = get_langid()
    t = corpus.sentence(2, 5, 30)
    assert m.predict_one(t) == m.predict_one(t)


def test_perplexity_separates_gibberish():
    lm = get_charlm()
    en = lm.perplexity_batch([corpus.sentence(1, 300 + i, 25) for i in range(30)])
    gib = lm.perplexity_batch([corpus.gibberish(1, 400 + i, 20) for i in range(30)])
    assert en.max() < 250.0  # all English under the "ok" threshold
    assert gib.min() > 250.0  # all gibberish above it
    assert lm.perplexity_one("") == EMPTY_PPL


def test_tokenize_matches_reference_semantics():
    # lowercase + split \W+ + drop empties (metadata.py:218-226)
    assert tokenize("Hello, World!  foo_bar") == ["hello", "world", "foo_bar"]
    assert tokenize("") == []
    assert tokenize("  ...  ") == []


def test_scrub_patterns_and_idempotence():
    s, pii, tox = scrub_text(
        "ssn 123-45-6789 mail a.b@x.io call 415-555-0134 you frakking tool"
    )
    assert "[SSN]" in s and "[EMAIL]" in s and "[PHONE]" in s and "[TOX]" in s
    assert pii == 3 and tox == 1
    s2, p2, t2 = scrub_text(s)
    assert s2 == s and p2 == 0 and t2 == 0


def test_scrub_clean_text_unchanged():
    t = corpus.sentence(3, 9, 20)
    assert scrub_text(t) == (t, 0, 0)
