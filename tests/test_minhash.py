import numpy as np

from dataquality_spark.datagen import corpus
from dataquality_spark.functions.minhash import (
    BANDS,
    NUM_PERM,
    band_hashes,
    bow_vector,
    exact_jaccard,
    minhash_jaccard_estimate,
    minhash_signature,
)
from dataquality_spark.functions.texthash import tokenize


def _toks(stream, n=30, words=None):
    return tokenize(corpus.sentence(11, stream, n, words))


def test_signature_shape_and_determinism():
    t = _toks(1)
    s1, s2 = minhash_signature(t), minhash_signature(t)
    assert s1.shape == (NUM_PERM,)
    np.testing.assert_array_equal(s1, s2)


def test_identical_sets_identical_bands():
    a = minhash_signature(["a", "b", "c"])
    b = minhash_signature(["c", "b", "a", "a"])  # set semantics
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(band_hashes(a), band_hashes(b))


def test_minhash_estimates_jaccard():
    errs = []
    for s in range(40):
        ta, tb = _toks(2 * s, 40), _toks(2 * s, 40)
        tb = tb[:30] + _toks(2 * s + 1, 10)  # overlap ~30/50
        est = minhash_jaccard_estimate(minhash_signature(ta), minhash_signature(tb))
        errs.append(abs(est - exact_jaccard(ta, tb)))
    assert np.mean(errs) < 0.12  # 64 perms -> se ~ 1/8


def test_near_dup_band_collision():
    """A 1-token edit on a 30-token sentence must collide in >= 1 band —
    this is the LSH recall property the F1 gate rides on."""
    for s in range(60):
        base = corpus.sentence(13, s, 30)
        toks = base.split()
        toks[s % 30] = "zzzedit"
        a = band_hashes(minhash_signature(tokenize(base)))
        b = band_hashes(minhash_signature(toks))
        assert np.any(a == b), f"no band collision for stream {s}"


def test_bow_vector_normalized_and_cosine():
    a = bow_vector(_toks(5))
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    assert bow_vector([]).sum() == 0.0
    # 1-token edit on 30 tokens -> cosine around 29/30, above the 0.95 gate
    base = corpus.sentence(17, 8, 30)
    toks = base.split()
    toks[3] = "zzzedit"
    cos = float(bow_vector(tokenize(base)) @ bow_vector(toks))
    assert cos >= 0.95
    # unrelated sentences stay far below the gate
    u = float(bow_vector(_toks(100)) @ bow_vector(_toks(200)))
    assert u < 0.9
