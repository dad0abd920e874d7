"""BPE training (pipeline/bpe.py) against a pure-Python reference
implementation of the same public algorithm — merge-for-merge and
piece-for-piece equality, plus the scale/determinism properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import xarray_scipy_spark.pipeline as pl

END = "</w>"


# --- reference implementation (dict-based, Sennrich et al. 2016) ----------


def ref_train(word_cnt: dict[str, int], num_merges: int, min_pair_count: int = 2):
    vocab = {w: [*w, END] for w in word_cnt}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_cnt[w]
        if not pairs:
            break
        # max count, ties broken lexicographically (the engine's order)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "widest widest widest",
        "low lower newest widest new",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _word_cnt(corpus_rows):
    cnt: dict[str, int] = {}
    for r in corpus_rows:
        for w in r["text"].split():
            cnt[w] = cnt.get(w, 0) + 1
    return cnt


def test_merges_match_reference(spark, corpus):
    merges, vocab = pl.train_bpe(corpus, num_merges=12)
    ref_merges, ref_vocab = ref_train(_word_cnt(corpus.collect()), 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    assert got == ref_vocab


def test_training_deterministic_across_partitioning(spark, corpus):
    m1, _ = pl.train_bpe(corpus, num_merges=6)
    m2, _ = pl.train_bpe(
        corpus.repartition(16), num_merges=6, checkpoint_every=2
    )
    assert m1 == m2


def test_min_pair_count_stops_early(spark, corpus):
    # demanding a count no pair can reach stops training immediately
    merges, vocab = pl.train_bpe(corpus, num_merges=10, min_pair_count=10**9)
    assert merges == []
    # pieces are still the initial char split
    row = vocab.filter(F.col("word") == "low").collect()[0]
    assert list(row["pieces"]) == ["l", "o", "w", END]


def test_apply_bpe_roundtrips_and_covers_oov(spark, corpus):
    merges, vocab = pl.train_bpe(corpus, num_merges=8)
    res = pl.apply_bpe(corpus, vocab).collect()
    seg = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    for r in res:
        expect = [p for w in r["text"].split() for p in seg[w]]
        assert list(r["bpe_pieces"]) == expect
    # a doc with an unseen word falls back to char pieces
    new = spark.createDataFrame([(99, "low zzz")], "doc_id long, text string")
    out = {r["doc_id"]: list(r["bpe_pieces"]) for r in pl.apply_bpe(new, vocab).collect()}
    assert out[99] == seg["low"] + ["z", "z", "z", END]


def test_pieces_rebuild_words(spark, corpus):
    # every word's pieces concatenate back to word + end marker
    _, vocab = pl.train_bpe(corpus, num_merges=8)
    for r in vocab.collect():
        assert "".join(r["pieces"]) == r["word"] + END


def test_validates_args(spark, corpus):
    with pytest.raises(ValueError, match="num_merges"):
        pl.train_bpe(corpus, num_merges=0)


def test_segment_words_wraps_line_terminators(spark):
    # ADVICE r16 medium: Java-regex '.' skips line terminators, so the
    # inference replace-chain's per-char wrap needs DOTALL "(?s)" —
    # without it an unwrapped \n fuses into the following piece as a
    # literal "\x01x" garbage token, diverging from train_bpe's
    # _initial_symbols split-on-"" (train/inference mismatch).
    words = spark.createDataFrame(
        [("a\nb",), ("a\rb",), ("a b",), ("ab",)], "word string"
    )
    merges = [("a", "b")]  # must NOT fire across the separator chars
    got = {
        r["word"]: list(r["pieces"])
        for r in pl.segment_words(words, merges).collect()
    }
    assert got["a\nb"] == ["a", "\n", "b", END]
    assert got["a\rb"] == ["a", "\r", "b", END]
    assert got["a b"] == ["a", " ", "b", END]
    assert got["ab"] == ["ab", END]


def test_reference_parity_on_driver_documents(spark):
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, vocab = pl.train_bpe(docs, num_merges=10)
    ref_merges, ref_vocab = ref_train(_word_cnt(docs.select("text").collect()), 10)
    assert merges == ref_merges
    got = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    assert got == ref_vocab
