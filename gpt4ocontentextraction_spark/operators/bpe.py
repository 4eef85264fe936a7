"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
tokenizer-construction step a pretraining data pipeline runs over the
cleaned corpus before token counting, packing and budget mixing
(reference analog: the tiktoken tokenizer imported at docker/main.py:32
is the ARTIFACT this operator family produces).

Scale shape: the only corpus-scale exchange is ONE map-side-combined
groupBy collapsing the token stream to the (word, count) dictionary —
BPE's classic trick: training never touches the corpus again, it runs
on the dictionary, weighted by counts (web-scale corpora collapse ~1e12
tokens to ~1e8 distinct words). Each merge iteration is then one
dictionary-sized aggregate (adjacent-pair counts, map-side combinable)
whose top-1 collect is a single row, plus one narrow fold projection
applying the merge — the k-means Lloyd loop shape, with iteration state
persisted and scope-released (cached.mark/release_since).

Determinism: all counts are exact integers; the winning pair per
iteration is (count DESC, left ASC, right ASC) — ties break
lexicographically on the binary UTF-8 order both engines share — so the
learned merge table is a pure function of the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cached

END_OF_WORD = "</w>"  # Sennrich's end-of-word marker symbol
BPE_TOPK = 20  # bpe_pair_counts gate cut
BPE_MERGES = 8  # default merge budget for bpe_learn


def _word_counts(docs: DataFrame) -> DataFrame:
    """(w, cnt) word dictionary — the one corpus-scale exchange."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_pair_counts(docs: DataFrame, k: int = BPE_TOPK) -> DataFrame:
    """Iteration-0 BPE statistics: corpus-wide adjacent character-pair
    counts over the word dictionary (each word contributes its pairs
    times its corpus frequency; the last character pairs with the
    end-of-word marker), cut to the top k by (count DESC, pair ASC).

    The transform/sequence pair enumeration is a JVM projection over
    the dictionary; the pair aggregate and the TakeOrderedAndProject
    cut are both distributed — no window, no driver loop."""
    wc = _word_counts(docs)
    pairs = wc.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w)), i -> struct("
                " substring(w, i, 1) AS l,"
                f" CASE WHEN i < length(w) THEN substring(w, i + 1, 1)"
                f" ELSE '{END_OF_WORD}' END AS r))"
            )
        ).alias("p"),
        "cnt",
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(k)
    )


BPE_PAIR_COUNTS_SQL = f"""
WITH bw AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
  WHERE text IS NOT NULL
),
bwc AS (SELECT w, count(*) AS cnt FROM bw WHERE length(w) > 0 GROUP BY w),
bp AS (
  SELECT substr(w, CAST(i AS INT), 1) AS "left",
         CASE WHEN i < length(w) THEN substr(w, CAST(i + 1 AS INT), 1)
              ELSE '{END_OF_WORD}' END AS "right",
         cnt
  FROM bwc, unnest(range(1, length(w) + 1)) AS u(i)
)
SELECT "left", "right", CAST(SUM(cnt) AS BIGINT) AS pair_count
FROM bp GROUP BY "left", "right"
ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT {BPE_TOPK}
"""


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(l, r, cnt-weighted pair count) over the symbol-array dictionary."""
    return (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), i -> struct("
                    " element_at(syms, i) AS l,"
                    " element_at(syms, i + 1) AS r))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


def _merge_fold(left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) in the
    syms array, as a single JVM fold — Column-lambda form (F.aggregate),
    so arbitrary corpus symbols never pass through SQL string literals.
    'aaaa' under (a,a) folds to [aa, aa], never [aa, aaa]: once a merge
    fires, the merged symbol can't be the next step's left side."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        hit = (
            F.try_element_at(acc, F.lit(-1)) == F.lit(left)
        ) & (s == F.lit(right))
        return (
            F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            )
            # try_element_at(-1) on the empty initial acc is NULL (the
            # strict form throws), so `hit` is NULL -> otherwise: plain
            # append, no size() guard needed
            .otherwise(F.concat(acc, F.array(s)))
        )

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


# Driver-arm dictionary budget (rows). BPE training only ever touches
# the (word, count) dictionary — vocab-bounded, NOT corpus-bounded
# (~1e8 distinct words for 1e12 tokens) — so when it fits, the merge
# loop runs in-process after the one corpus-scale exchange instead of
# issuing 2 Spark jobs per merge (VERDICT r5 #6: 32k merges would mean
# 64k sequential driver jobs over a relation that fits in memory).
# Above the budget the distributed loop below remains the path.
BPE_DICT_BUDGET = int(os.environ.get("SPARK_GRAFT_BPE_DICT_BUDGET", "2000000"))


def _merge_seq(syms: list[str], l: str, r: str, merged: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge — the in-process twin
    of _merge_fold (equality pinned in tests/test_bpe.py)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == l and syms[i + 1] == r:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_learn_local(
    wc_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-process Sennrich merge loop over the collected dictionary:
    identical argmax tie-break to the distributed form — (count DESC,
    left ASC, right ASC); Python's code-point string order equals
    Spark/DuckDB's binary UTF-8 order (UTF-8 is order-preserving)."""
    from collections import Counter, defaultdict

    vocab = [[list(w) + [END_OF_WORD], int(c)] for w, c in wc_rows]
    # incremental pair statistics (the standard fast-BPE bookkeeping):
    # per-pair corpus count plus the set of dictionary entries holding
    # the pair, so each merge touches only the affected words — O(hits)
    # per merge instead of O(vocab), which is what makes a 32k-merge
    # vocabulary train in seconds rather than rescanning the dictionary
    # 32k times. Counts are maintained by exact deltas, so the argmax
    # sees the same Counter a full recount would build.
    pairs: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for idx, (syms, cnt) in enumerate(vocab):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] += cnt
            where[p].add(idx)
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        cand = [(-c, p) for p, c in pairs.items() if c >= 2]
        if not cand:
            break
        nc, (l, r) = min(cand)
        c = -nc
        merged = l + r
        out.append((rank, l, r, merged, int(c)))
        for idx in list(where[(l, r)]):
            syms, cnt = vocab[idx]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] -= cnt
                where[p].discard(idx)
            new = _merge_seq(syms, l, r, merged)
            vocab[idx][0] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pairs[p] += cnt
                where[p].add(idx)
    return out


def bpe_learn(
    spark,
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    dict_budget: int | None = None,
) -> DataFrame:
    """Learn the first n_merges BPE merges over the corpus. Returns the
    merge table (rank, left, right, merged, pair_count) — bounded
    driver-local rows, like the k-means centroid materialization; stops
    early when no adjacent pair remains with count >= 2 (merging a
    count-1 pair can never help a tokenizer).

    Hybrid execution (VERDICT r5 #6): the one corpus-scale exchange
    builds the (word, count) dictionary; when the dictionary fits
    BPE_DICT_BUDGET rows it is collected ONCE and the merge loop runs
    in-process (the dictionary is all BPE ever needs — n_merges Spark
    jobs collapse to zero), else the distributed per-merge loop runs
    unchanged. Both arms produce the identical table (pinned in
    tests/test_bpe.py on the hand corpus and sf0.001).

    No SQL oracle exists for the iterative argmax-retokenize loop, so
    the gate is rows-only; tests/test_bpe.py pins the full table against
    an independent pure-Python reference implementation (the Sennrich
    pseudocode over a pandas-computed word dictionary) on both a hand
    corpus and the real sf0.001 corpus."""
    schema = (
        "rank long, left string, right string, merged string,"
        " pair_count long"
    )
    budget = BPE_DICT_BUDGET if dict_budget is None else dict_budget
    wc = cached.track(_word_counts(docs))
    n_dict = wc.count()  # rides the one corpus-scale exchange
    if n_dict <= budget:
        rows = [(r["w"], r["cnt"]) for r in wc.collect()]
        cached.release_entry(wc)
        return spark.createDataFrame(
            _bpe_learn_local(rows, n_merges), schema
        )
    words = cached.track(
        wc.select(
            F.expr(
                f"concat(split(w, ''), array('{END_OF_WORD}'))"
            ).alias("syms"),
            "cnt",
        )
    )
    words.count()
    cached.release_entry(wc)
    out = []
    for rank in range(n_merges):
        scope = cached.mark()
        top = (
            _adjacent_pairs(words)
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            cached.release_since(scope)
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        out.append((rank, l, r, l + r, c))
        new_words = cached.track(
            words.select(_merge_fold(l, r).alias("syms"), "cnt")
        )
        # materialize the fold into the new persist while the previous
        # iteration's cache is still live, then drop ONLY that previous
        # entry (the k-means scope discipline)
        new_words.count()
        cached.release_entry(words)
        words = new_words
    cached.release_entry(words)
    return spark.createDataFrame(out, schema)


def bpe_vocab_stats(spark, docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Tokenizer report after applying the learned merges to the corpus
    dictionary: total words, total tokens (= symbols across the
    dictionary weighted by word frequency), fertility (tokens per word,
    floored 1e-4) and distinct-symbol vocabulary size — the
    byte-per-token / fertility statistic that decides whether a
    tokenizer fits a corpus. One dictionary-sized plan: the n_merges
    folds chain over the persisted dictionary, then a single aggregate
    (exact integer sums) plus a distinct count over exploded symbols."""
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn(spark, docs, n_merges).collect()
    ]
    words = _word_counts(docs).select(
        F.expr(f"concat(split(w, ''), array('{END_OF_WORD}'))").alias("syms"),
        "cnt",
    )
    for l, r in merges:
        words = words.select(_merge_fold(l, r).alias("syms"), "cnt")
    words = cached.track(words)
    agg = words.agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.size("syms")).cast("long").alias("n_tokens"),
    )
    vocab = words.select(F.explode("syms").alias("s")).agg(
        F.countDistinct("s").cast("long").alias("vocab_size")
    )
    res = agg.crossJoin(vocab).select(
        "n_words",
        "n_tokens",
        (
            F.floor(
                F.col("n_tokens").cast("double")
                / F.col("n_words").cast("double")
                * 10000
            )
            / 10000
        ).alias("fertility"),
        "vocab_size",
    )
    rows = res.collect()
    cached.release_entry(words)
    return spark.createDataFrame(
        rows, "n_words long, n_tokens long, fertility double, vocab_size long"
    )


# ---------------------------------------------------------------------------
# BPE apply / encode (the tokenizer-APPLICATION step: train -> encode -> pack)
# ---------------------------------------------------------------------------

# Fixed, causal merge table for the oracle gate (every side exists when
# its rank fires: e</w> from rank 0, th from rank 1). ASCII-only so the
# generated SQL twin needs no literal escaping; the LEARNED-table path
# is exercised by tests/test_bpe.py against bpe_vocab_stats.
BPE_ENCODE_MERGES = [
    ("e", END_OF_WORD),
    ("t", "h"),
    ("th", "e" + END_OF_WORD),
    ("i", "n"),
    ("a", "n"),
    ("o", "r"),
    ("in", "g"),
    ("s", END_OF_WORD),
]


def _encode_word(word: str, merges) -> list:
    """Apply the merge table to one word, rank order, greedy leftmost
    non-overlapping per rank — exactly the training-time retokenization
    (_merge_fold), so encode(corpus dictionary) reproduces the token
    stream bpe_learn's final iteration saw."""
    syms = list(word) + [END_OF_WORD]
    for left, right in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_encode_udf(merges):
    """Arrow-batched whole-document encoder with a per-worker WORD cache:
    Zipf's law makes the distinct-word set tiny relative to the token
    stream (~1e8 words for ~1e12 tokens), so almost every word is a dict
    hit — the same trick real tokenizers (tiktoken's LRU, tokenizers'
    Rust cache) use. The cache is bounded; overflow clears it (refill is
    cheap and correctness never depends on it)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merges = [tuple(m) for m in merges]
    cache: dict = {}

    @pandas_udf("n_tokens long, tokens string")
    def enc(texts):
        n_out, t_out = [], []
        for t in texts.tolist():
            if t is None:
                n_out.append(None)
                t_out.append(None)
                continue
            toks: list = []
            for w in t.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    if len(cache) > 1_000_000:
                        cache.clear()
                    got = _encode_word(w, merges)
                    cache[w] = got
                toks.extend(got)
            n_out.append(len(toks))
            t_out.append(" ".join(toks))
        return pd.DataFrame({"n_tokens": n_out, "tokens": t_out})

    return enc


def bpe_encode(docs: DataFrame, merges=BPE_ENCODE_MERGES) -> DataFrame:
    """Encode the corpus with a learned (or fixed) BPE merge table:
    (doc_id, n_tokens, tokens) where tokens is the space-joined subword
    stream (each word closed by </w>). The missing link between
    bpe_learn (training) and pack_sequences / token_budget_mix
    (consumers): real pipelines count and pack TOKENIZED lengths, not
    whitespace words.

    Scale shape: the merge table is a tiny driver-side constant closed
    over by the UDF (a broadcast in spirit); the encode is ONE
    Arrow-batched projection with zero shuffles, linear in corpus size,
    and word-cache-accelerated (see _bpe_encode_udf)."""
    enc = _bpe_encode_udf(merges)
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .filter(F.col("text").isNotNull())
        .select("doc_id", enc("text").alias("e"))
        .select(
            "doc_id",
            F.col("e.n_tokens").alias("n_tokens"),
            F.col("e.tokens").alias("tokens"),
        )
    )


def _bpe_word_sql(var: str, merges) -> str:
    """DuckDB twin of _encode_word for an ASCII merge table: the
    rank-order greedy-left merge as a chain of list_reduce folds
    (first element seeds the accumulator; acc[:-2] drops exactly the
    trailing element — DuckDB 1.0 slice semantics, probed)."""
    expr = f"list_transform(string_split({var}, '') || ['{END_OF_WORD}'], s -> [s])"
    for left, right in merges:
        merged = left + right
        expr = (
            f"list_reduce({expr}, (acc, x) -> CASE WHEN acc[-1] = '{left}'"
            f" AND x[1] = '{right}' THEN acc[:-2] || ['{merged}']"
            f" ELSE acc || x END)"
        )
        expr = f"list_transform({expr}, s -> [s])"
    return f"flatten({expr})"


BPE_ENCODE_SQL = f"""
WITH be AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         flatten(list_transform(
           list_filter(string_split(text, ' '), w -> length(w) > 0),
           w -> {_bpe_word_sql('w', BPE_ENCODE_MERGES)})) AS toks
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       array_to_string(toks, ' ') AS tokens
FROM be
"""
