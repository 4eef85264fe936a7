"""Distributed BPE training pinned against an independent pure-Python
reference (the Sennrich et al. 2016 pseudocode over a pandas word
dictionary) on a hand corpus AND the real sf0.001 corpus; pair-count
DuckDB parity runs in tests/test_oracle_parity.py via the EXTRA gate."""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

from gpt4ocontentextraction_spark.operators import bpe as B

SF = "/root/testdata/sf0.001"


# --- independent reference: dict-based greedy BPE (Sennrich alg. 1) -----


def _ref_word_counts(texts):
    wc = collections.Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                wc[w] += 1
    return wc


def _ref_pairs(vocab):
    pairs = collections.Counter()
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += cnt
    return pairs


def _ref_merge(syms, pair, merged):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(texts, n_merges):
    vocab = {
        tuple(list(w) + [B.END_OF_WORD]): c
        for w, c in _ref_word_counts(texts).items()
    }
    merges = []
    for rank in range(n_merges):
        pairs = _ref_pairs(vocab)
        if not pairs:
            break
        # (count DESC, left ASC, right ASC) — the engine's tie-break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merged = l + r
        merges.append((rank, l, r, merged, c))
        vocab = {
            _ref_merge(s, (l, r), merged): cnt for s, cnt in vocab.items()
        }
    return merges, vocab


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


HAND = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest",
    "widest widest",
    None,
]


def test_bpe_learn_matches_reference_hand(spark):
    want, _ = _ref_bpe(HAND, 8)
    got = [tuple(r) for r in B.bpe_learn(spark, _mk(spark, HAND), 8).collect()]
    assert got == want
    # the classic example learns 'est</w>' pieces: merged symbols grow
    assert any(len(m[3]) > 2 for m in got)


def test_bpe_merge_fold_greedy_nonoverlap(spark):
    # 'aaaa' under (a,a) -> [aa, aa]; 'aaa' -> [aa, a]
    merges, vocab = _ref_bpe(["aaaa aaa"], 1)
    assert merges[0][1:4] == ("a", "a", "aa")
    assert ("aa", "aa", B.END_OF_WORD) in vocab
    assert ("aa", "a", B.END_OF_WORD) in vocab
    got = [tuple(r) for r in B.bpe_learn(spark, _mk(spark, ["aaaa aaa"]), 1).collect()]
    assert got == merges


def test_bpe_stops_when_no_pair_repeats(spark):
    # every adjacent pair unique -> count-1 max -> zero merges
    df = _mk(spark, ["abc xyz"])
    assert B.bpe_learn(spark, df, 5).count() == 0


def test_bpe_learn_matches_reference_corpus(spark):
    texts = pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    want, _ = _ref_bpe(texts, B.BPE_MERGES)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = [tuple(r) for r in B.bpe_learn(spark, docs).collect()]
    assert got == want
    assert len(got) == B.BPE_MERGES  # real corpus sustains 8 merges


def test_bpe_vocab_stats_matches_reference(spark):
    texts = pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    _, vocab = _ref_bpe(texts, B.BPE_MERGES)
    n_words = sum(vocab.values())
    n_tokens = sum(len(s) * c for s, c in vocab.items())
    vocab_size = len({sym for s in vocab for sym in s})
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r = B.bpe_vocab_stats(spark, docs).collect()[0]
    assert r["n_words"] == n_words
    assert r["n_tokens"] == n_tokens
    assert r["vocab_size"] == vocab_size
    import math

    assert r["fertility"] == math.floor(n_tokens / n_words * 10000) / 10000
    # merges only ever shrink the token stream
    assert r["n_tokens"] <= sum((len(w) + 1) * c for w, c in
                                _ref_word_counts(texts).items())


def test_bpe_pair_counts_hand(spark):
    # 'ab ab b' -> pairs: (a,b) x2, (b,</w>) x3
    out = {
        (r["left"], r["right"]): r["pair_count"]
        for r in B.bpe_pair_counts(_mk(spark, ["ab ab b"])).collect()
    }
    assert out == {("a", "b"): 2, ("b", B.END_OF_WORD): 3}


# --- BPE apply / encode -------------------------------------------------


def _ref_encode_doc(text, merges):
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        syms = tuple(list(w) + [B.END_OF_WORD])
        for l, r in merges:
            syms = _ref_merge(syms, (l, r), l + r)
        toks.extend(syms)
    return toks


def test_bpe_encode_hand_words(spark):
    # rank-order application through the fixed causal table
    assert B._encode_word("the", B.BPE_ENCODE_MERGES) == ["the</w>"]
    assert B._encode_word("thing", B.BPE_ENCODE_MERGES) == [
        "th", "ing", "</w>"]
    assert B._encode_word("a", B.BPE_ENCODE_MERGES) == ["a", "</w>"]
    # s</w> fires on the FINAL s only; an/or fire mid-word
    assert B._encode_word("sans", B.BPE_ENCODE_MERGES) == ["s", "an", "s</w>"]


def test_bpe_encode_matches_reference_corpus(spark):
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ref = {
        int(d): _ref_encode_doc(t, B.BPE_ENCODE_MERGES)
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
        if t is not None
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tokens"])
        for r in B.bpe_encode(docs).collect()
    }
    assert set(got) == set(ref)
    for d, toks in ref.items():
        assert got[d] == (len(toks), " ".join(toks)), d


def test_bpe_encode_learned_table_reproduces_training_stream(spark):
    """Encoding the corpus with the LEARNED merge table must yield
    exactly the token count bpe_vocab_stats reports — apply (Arrow
    scan-merge kernel) and training retokenization (JVM _merge_fold
    chain) are independent implementations of the same greedy fold."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = [
        (r["left"], r["right"]) for r in B.bpe_learn(spark, docs).collect()
    ]
    enc = B.bpe_encode(docs, merges)
    total = enc.groupBy().sum("n_tokens").collect()[0][0]
    stats = B.bpe_vocab_stats(spark, docs).collect()[0]
    assert total == stats["n_tokens"]
    # and the encoded symbol vocabulary matches the trained one
    from pyspark.sql import functions as F

    vocab = (
        enc.select(F.explode(F.split("tokens", " ")).alias("s"))
        .agg(F.countDistinct("s"))
        .collect()[0][0]
    )
    assert vocab == stats["vocab_size"]


def test_bpe_encode_null_and_empty(spark):
    df = _mk(spark, ["", "  ", None, "ab"])
    got = {r["doc_id"]: r for r in B.bpe_encode(df).collect()}
    assert set(got) == {0, 1, 3}
    assert got[0]["n_tokens"] == 0 and got[0]["tokens"] == ""
    assert got[1]["n_tokens"] == 0
    assert got[3]["tokens"] == "a b </w>"


def test_bpe_learn_arms_equal(spark):
    """r6 hybrid pin: the in-process dictionary arm (the production
    path when the vocab fits BPE_DICT_BUDGET) and the distributed
    per-merge loop (dict_budget=0 forces it) learn the identical merge
    table on the hand corpus and the real sf0.001 corpus."""
    for df in (_mk(spark, HAND), spark.read.parquet(f"{SF}/documents.parquet")):
        local = [tuple(r) for r in B.bpe_learn(spark, df, 8).collect()]
        dist = [
            tuple(r)
            for r in B.bpe_learn(spark, df, 8, dict_budget=0).collect()
        ]
        assert local == dist and len(local) > 0
