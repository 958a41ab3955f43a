"""Word-beam search with unigram/bigram LM — fixture-equal to the published
word-beam-search algorithm the reference vendors (expected values below were
captured by running the reference's own inline fixtures:
thirdparty/ctcwordbeamsearch/LanguageModel.py:112-119 and
WordBeamSearch.py:66-71)."""

import numpy as np

from calamari_spark.operators.ctc import WordLM, word_beam_decode


def test_lm_probs_match_reference_fixture():
    # LanguageModel.py __main__ fixture
    lm = WordLM("12 1 13 12 15 234 2526", " ,.:0123456789", "0123456789")
    assert abs(lm.bigram("12", "15") - 0.2) < 1e-12
    assert abs(lm.unigram("12") - 2 / 7) < 1e-12
    assert sorted(lm.next_chars("1")) == [" ", ",", ".", "2", "3", "5", ":"]
    assert lm.is_word("1")  # '1' IS a corpus word
    assert lm.is_word("12") and not lm.is_word("9")


def test_wbs_matches_reference_inline_fixture():
    # WordBeamSearch.py __main__ fixture: chars 'ab ', blank last
    lm = WordLM("a b aa ab ba bb", "ab ", "ab")
    mat = np.array([[0.3, 0.1, 0, 0.6], [0.3, 0.1, 0, 0.6]])
    assert word_beam_decode(mat, "ab ", lm, beam_width=25, use_ngrams=False) == "a"
    assert word_beam_decode(mat, "ab ", lm, beam_width=25, use_ngrams=True) == ""


def test_lm_rescoring_flips_an_optically_better_beam():
    # 'cat' occurs 3x, 'sat' once; optics slightly prefer 's' at t=0.
    # Without the LM the beam follows the optics ('sat'); with unigram
    # scoring the frequent word wins ('cat'). Captured from the reference.
    chars = "thecadogs "
    lm = WordLM("the cat the cat the cat the dog sat", chars, "thecadogs")
    T, C = 6, len(chars) + 1
    mat = np.full((T, C), 0.001)

    def col(c):
        return chars.index(c)

    blank = len(chars)
    mat[0, col("c")] = 0.44
    mat[0, col("s")] = 0.46
    mat[1, blank] = 0.9
    mat[2, col("a")] = 0.9
    mat[3, blank] = 0.9
    mat[4, col("t")] = 0.9
    mat[5, blank] = 0.9
    mat /= mat.sum(axis=1, keepdims=True)
    assert word_beam_decode(mat, chars, lm, beam_width=10, use_ngrams=False) == "sat"
    assert word_beam_decode(mat, chars, lm, beam_width=10, use_ngrams=True) == "cat"


def test_dangling_prefix_completion():
    # beam ends mid-word with a unique completion -> completed at the end
    chars = "catx "
    lm = WordLM("cat cat", chars, "catx")
    mat = np.full((4, len(chars) + 1), 0.001)
    mat[0, chars.index("c")] = 0.95
    mat[1, len(chars)] = 0.95
    mat[2, chars.index("a")] = 0.95
    mat[3, len(chars)] = 0.95
    mat /= mat.sum(axis=1, keepdims=True)
    out = word_beam_decode(mat, chars, lm, beam_width=5, use_ngrams=True)
    assert out == "cat"


def test_word_to_word_transition_fixture():
    # captured from the reference with allowWordToWordTransition: the
    # space-less 'abba' optics decode to 'abba' only when words may chain
    import numpy as np

    from calamari_spark.operators.ctc import WordLM, word_beam_decode

    chars = "ab "
    lm = WordLM("ab ba", chars, "ab")
    mat = np.full((8, 4), 0.001)
    for i, c in enumerate("abba"):
        mat[2 * i, chars.index(c)] = 0.95
        mat[2 * i + 1, 3] = 0.95
    mat /= mat.sum(axis=1, keepdims=True)
    args = dict(beam_width=16)
    assert word_beam_decode(mat, chars, lm, use_ngrams=False, **args) == "ab ab"
    assert word_beam_decode(
        mat, chars, lm, use_ngrams=False, allow_word_to_word=True, **args
    ) == "abba"
    assert word_beam_decode(
        mat, chars, lm, use_ngrams=True, allow_word_to_word=True, **args
    ) == "ab ba"


def test_from_counts_matches_corpus_built_lm():
    """The count-aware constructor (the scale path: vocab.json -> LM with no
    repeated-word corpus string) must agree with the corpus-tokenizing
    constructor on every probability surface."""
    corpus = "the cat sat on the mat , the cat ran"
    chars = "abcdefghijklmnopqrstuvwxyz ,"
    word_chars = "abcdefghijklmnopqrstuvwxyz"
    a = WordLM(corpus, chars, word_chars)

    words = [w for w in corpus.split(" ") if all(c in word_chars for c in w) and w]
    uni, big = {}, {}
    for w in words:
        uni[w] = uni.get(w, 0) + 1
    for w1, w2 in zip(words, words[1:]):
        big[(w1, w2)] = big.get((w1, w2), 0) + 1
    b = WordLM.from_counts(uni, chars, word_chars, bigram_counts=big)

    assert a._vocab == b._vocab
    assert a.n_words == b.n_words and a.n_unique == b.n_unique
    for w in uni:
        assert abs(a.unigram(w) - b.unigram(w)) < 1e-12
    for w1 in uni:
        for w2 in uni:
            assert abs(a.bigram(w1, w2) - b.bigram(w1, w2)) < 1e-12
    assert a.next_chars("th") == b.next_chars("th")
    assert a.next_words("c") == b.next_words("c")


def test_initial_words_thread_bigram_scoring_into_the_beam():
    """Mid-line decoding: with the left-context word seeded via
    initial_words, an optically ambiguous word resolves by
    bigram(prev, .); without context (or with a context that has no
    observed bigram) the optics win."""
    chars = "abcdehrtT "
    word_chars = "abcdehrtT"
    uni = {"the": 10, "cat": 5, "car": 5, "he": 2}
    # 'the cat' observed; 'the car' only via the +k fallback. 'he' has
    # successors (so its fallback mass exists — a w1 with NO observed
    # successor scores every w2 zero, reference LanguageModel semantics)
    # but none toward cat/car, so under 'he' the optics decide.
    big = {("the", "cat"): 8, ("he", "the"): 1}
    lm = WordLM.from_counts(uni, chars, word_chars, bigram_counts=big)

    def col(c):
        return chars.index(c)

    # frames spelling c-a-? where the last char is slightly MORE likely 'r'
    T = 3
    mat_cls = np.full((T, len(chars) + 1), 0.001)
    mat_cls[0, col("c")] = 0.95
    mat_cls[1, col("a")] = 0.95
    mat_cls[2, col("r")] = 0.50
    mat_cls[2, col("t")] = 0.45
    mat_cls /= mat_cls.sum(axis=1, keepdims=True)

    # optics alone (no usable bigram context): 'car' wins
    assert word_beam_decode(mat_cls, chars, lm, use_ngrams=True) == "car"
    assert (
        word_beam_decode(mat_cls, chars, lm, use_ngrams=True, initial_words=("he",))
        == "car"
    )
    # after 'the', bigram(the, cat)=seen >> bigram(the, car)=fallback: 'cat'
    assert (
        word_beam_decode(mat_cls, chars, lm, use_ngrams=True, initial_words=("the",))
        == "cat"
    )


def test_prefix_sums_match_the_subtree_walk_exactly():
    """unigram_prefix_sum / bigram_prefix_sum are the O(1)/O(successors)
    replacements for the per-extension subtree walks that made WBS linear
    in vocabulary size (scripts/dictscale_evidence.py: 37x slower at 50k
    words than 1k). They must agree with the walk on every prefix."""
    import math
    import random

    from calamari_spark.operators.ctc import WordLM

    rng = random.Random(7)
    words = {"".join(rng.choice("abcd") for _ in range(rng.randint(1, 6))):
             float(rng.randint(1, 50)) for _ in range(300)}
    bigs = {}
    ws = sorted(words)
    for _ in range(400):
        bigs[(rng.choice(ws), rng.choice(ws))] = float(rng.randint(1, 9))
    lm = WordLM.from_counts(words, "abcd ", "abcd", bigram_counts=bigs)

    prefixes = [""] + [w[:k] for w in ws[:60] for k in range(1, len(w) + 1)]
    prefixes += ["zz", "abcdq"]  # absent subtrees -> 0 mass
    for p in prefixes:
        nxt = lm.next_words(p)
        assert math.isclose(
            lm.unigram_prefix_sum(p), sum(lm.unigram(w) for w in nxt),
            rel_tol=1e-12, abs_tol=1e-300,
        ), p
        for w1 in ws[:25] + ["notavocabword"]:
            assert math.isclose(
                lm.bigram_prefix_sum(w1, p),
                sum(lm.bigram(w1, w) for w in nxt),
                rel_tol=1e-12, abs_tol=1e-300,
            ), (w1, p)


def test_mixed_case_vocab_prefix_sums_still_exact():
    """Case-variant vocab words force the exact-walk fallback in
    bigram_prefix_sum; results must still equal the walk."""
    import math

    from calamari_spark.operators.ctc import WordLM

    words = {"Cat": 3.0, "cat": 2.0, "car": 5.0, "dog": 1.0}
    bigs = {("dog", "Cat"): 2.0, ("dog", "car"): 1.0}
    lm = WordLM.from_counts(
        words, "CARcartdog ", "CARcartdog".replace(" ", ""),
        bigram_counts=bigs,
    )
    for p in ("", "c", "C", "ca", "Cat"):
        nxt = lm.next_words(p)
        assert math.isclose(
            lm.unigram_prefix_sum(p), sum(lm.unigram(w) for w in nxt),
            rel_tol=1e-12, abs_tol=1e-300,
        ), p
        assert math.isclose(
            lm.bigram_prefix_sum("dog", p),
            sum(lm.bigram("dog", w) for w in nxt),
            rel_tol=1e-12, abs_tol=1e-300,
        ), p


def test_wbs_decodes_gt_word_under_distractor_load():
    """2000 deterministic distractor words must not change the decoded
    word when the GT word outranks them (the dictscale evidence claim,
    pytest-sized)."""
    import random

    import numpy as np

    from calamari_spark.operators.ctc import WordLM, word_beam_decode

    charset = "abcdefghijklmnopqrstuvwxyz"
    gt = "spark"
    rng = random.Random(42)
    counts = {gt: 1000.0}
    while len(counts) < 2000:
        w = "".join(rng.choice(charset) for _ in range(rng.randint(3, 8)))
        counts.setdefault(w, float(rng.randint(1, 5)))
    lm = WordLM.from_counts(counts, charset + " ", charset)

    decoder_charset = list(charset + " ")  # blank is the LAST column
    cols = {c: i for i, c in enumerate(decoder_charset)}
    T = 2 * len(gt)
    mat = np.full((T, len(decoder_charset) + 1), 1e-9)
    for i, ch in enumerate(gt):
        mat[2 * i, cols[ch]] = 0.95      # char frame
        mat[2 * i + 1, len(decoder_charset)] = 0.95  # blank frame between
    mat /= mat.sum(axis=1, keepdims=True)
    assert word_beam_decode(mat, decoder_charset, lm, beam_width=10) == gt
