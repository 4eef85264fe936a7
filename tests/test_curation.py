"""Corpus-curation operator semantics (operators/curation.py): crafted
edge cases the sf-corpus parity sweep can't isolate, plus plan-shape pins
for the scale claims (zero-shuffle repetition scan, broadcast benchmark
join, no full-corpus window in quota sampling / packing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import curation as C
from gpt4ocontentextraction_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "a a a a a a a a a a", "en"),  # one word repeated: top_word=1.0
        (2, "b c d e f g h i j k", "en"),  # all distinct: dup fracs 0
        (3, "solo", "de"),  # single word: no bigrams
        (4, "x y x y x y x y", "fr"),  # alternating: dup_bigram high
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_repetition_stats_edges(spark, tiny_docs):
    out = {
        r["doc_id"]: r for r in C.repetition_stats(tiny_docs).collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 10
    assert r1["top_word_frac"] == 1.0
    assert r1["dup_word_frac"] == 1.0
    assert r1["keep"] == 0  # top word >10%
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_word_frac"] == 0.1
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["keep"] == 1  # 0.1 <= 0.10 boundary inclusive
    r3 = out[3]
    assert r3["n_words"] == 1
    # no bigrams: denominators guard to 1, fractions 0
    assert r3["top_bigram_frac"] == 0.0 and r3["dup_bigram_frac"] == 0.0
    r4 = out[4]
    # "x y" 4x + "y x" 3x over 7 bigrams -> every bigram duplicated
    assert r4["dup_bigram_frac"] == 1.0
    assert r4["keep"] == 0


def test_repetition_stats_null_text_emits_no_row(spark):
    # the oracle's UNNEST over a NULL split yields zero rows; the engine
    # must match (it previously emitted a null-metrics row — r5 review)
    docs = spark.createDataFrame(
        [(1, None, "en"), (2, "a b a", "en")],
        "doc_id long, text string, lang string",
    )
    assert [r["doc_id"] for r in C.repetition_stats(docs).collect()] == [2]


def test_repetition_scan_has_no_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(C.repetition_stats(docs))
    # doc-local stats: one Arrow eval over the scan, ZERO shuffles
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_contamination_flags_planted_leaks(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = C.contamination_check(docs)
    flagged = {
        r["doc_id"]: r
        for r in out.where(F.col("flagged") == 1).collect()
    }
    assert flagged, "planted eval-dup variants must be flagged"
    # RECALL on the planted leaks: every variant of a benchmark doc is a
    # train doc whose 8-grams are ALL 8-grams of its benchmark original
    # (the variant only drops trailing words), so its contam_frac is 1.0
    # and it must be flagged
    bench_ids = [
        r["doc_id"]
        for r in docs.where(
            F.col("doc_id") % C.CONTAM_BENCH_MOD == 0
        ).collect()
    ]
    assert bench_ids
    for b in bench_ids:
        planted = int(b) + 1_000_000
        assert planted in flagged, f"variant of benchmark doc {b} missed"
        assert flagged[planted]["contam_frac"] == 1.0
    # flags beyond the planted set are legitimate too: base docs whose
    # VARIANT landed in the benchmark stratum (d % 97 == 70, since
    # 10^6 % 97 == 27) or natural exact-duplicate pairs straddling the
    # benchmark split — every flag must be one of those, never noise
    for d, r in flagged.items():
        planted_fwd = d >= 1_000_000 and (d - 1_000_000) % C.CONTAM_BENCH_MOD == 0
        planted_rev = d < 1_000_000 and (d + 1_000_000) % C.CONTAM_BENCH_MOD == 0
        natural_dup = r["contam_frac"] >= 0.9  # exact-dup of a bench doc
        assert planted_fwd or planted_rev or natural_dup, (d, r)


def test_contamination_broadcasts_benchmark_grams(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(C.contamination_check(docs))
    # the gram-membership join must broadcast the (tiny) benchmark side,
    # never shuffle the train grams by gram string
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quota_sample_exact_per_stratum(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = C.quota_sample(docs, k=25)
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    strata = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in strata.items():
        assert per.get(lang, 0) == min(25, n)
    # deterministic: same call, same selection
    a = sorted((r["lang"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["lang"], r["doc_id"])
        for r in C.quota_sample(docs, k=25).collect()
    )
    assert a == b


def test_quota_sample_null_lang_is_a_stratum(spark):
    # NULL lang must behave as its own stratum (oracle window semantics):
    # an equi-join on lang never matches NULL, which previously starved
    # the coverage check and doubled slack forever (r5 review)
    docs = spark.createDataFrame(
        [(1, "x y", None), (2, "y z", "en"), (3, "z w", None)],
        "doc_id long, text string, lang string",
    )
    rows = sorted(
        C.quota_sample(docs, k=1).collect(), key=lambda r: r["doc_id"]
    )
    assert [(r["doc_id"], r["lang"], r["rn"]) for r in rows] == [
        (1, None, 1),
        (2, "en", 1),
    ]


def test_quota_sample_windows_only_survivors(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(C.quota_sample(docs))
    # the slack threshold filter must precede the rank window so the sort
    # ranks ~k*slack survivors, never a full stratum
    assert plan.index("Filter") < plan.index("Window")


def test_pack_sequences_is_contiguous_prefix_sum(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = sorted(
        C.pack_sequences(docs).collect(), key=lambda r: r["doc_id"]
    )
    offset = 0
    for r in rows:
        assert r["start_offset"] == offset
        assert r["first_seq"] == offset // C.PACK_SEQ_LEN
        end = offset + r["n_tokens"] - 1
        assert r["last_seq"] == end // C.PACK_SEQ_LEN
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        offset += r["n_tokens"]


def test_pack_sequences_block_window_not_global(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(C.pack_sequences(docs))
    # the per-doc cumsum window is PARTITIONED by block — the full corpus
    # never funnels through one reducer; the only SinglePartition
    # exchange feeds the window over the AGGREGATED block totals
    # (n/PACK_BLOCK rows) and its cumsum expression, nothing row-level
    assert "hashpartitioning(block" in plan
    single = plan.count("SinglePartition")
    assert single == 1
    assert plan.index("hashpartitioning(block") < plan.index("SinglePartition")


# ---------------------------------------------------------------------------
# unigram_logprob (CCNet perplexity-filter shape)
# ---------------------------------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    import math

    rows = [(1, "a a a a", "en"), (2, "a a a z", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in C.unigram_logprob(df).collect()}
    # corpus: a x7, z x1, total 8
    nll_a = -math.log(7 / 8)
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["avg_nll"] - math.floor(nll_a * 10000) / 10000) < 1e-9
    # the doc containing the rare token is less likely under the LM
    assert out[2]["avg_nll"] > out[1]["avg_nll"]
    assert out[2]["ppl"] > out[1]["ppl"]


# ---------------------------------------------------------------------------
# dsir_weights (importance sampling toward the target slice)
# ---------------------------------------------------------------------------


def test_dsir_weights_favor_target_like_docs(spark):
    # single-char words hash to distinct buckets mod 64 (polyhash('c')=cp):
    # a->33 b->34 z->58 y->57
    rows = [
        (1, "a b a b", "en"),
        (2, "a b a b", "en"),
        (3, "z y z y", "fr"),
        (4, "a b z y", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["avg_log_weight"] for r in C.dsir_weights(df).collect()
    }
    # docs made of target-slice tokens outrank docs of never-in-target
    # tokens; the mixed doc lands between
    assert out[1] > out[4] > out[3]
    assert out[1] == out[2]  # identical docs, identical weights


# ---------------------------------------------------------------------------
# top_ngrams (corpus-wide frequent-gram statistics)
# ---------------------------------------------------------------------------


def test_top_ngrams_counts_and_tiebreak(spark):
    rows = [
        (1, "x y z w x y z w"),   # 'x y' twice (overlapping windows)
        (2, "x y z w only once"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.top_ngrams(df, n=2, k=3).collect()
    got = [(r["gram"], r["n_occurrences"], r["n_docs"]) for r in out]
    # 'x y', 'y z', 'z w' each occur 3x across 2 docs; k=3 cuts ties
    # by gram asc, so the deterministic winners are exactly these
    assert sorted(got) == [("x y", 3, 2), ("y z", 3, 2), ("z w", 3, 2)]


def test_top_ngrams_plan_take_ordered(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    plan = (
        C.top_ngrams(df)._jdf.queryExecution().executedPlan().toString()
    )
    # per-partition heaps merged on the driver, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


# ---------------------------------------------------------------------------
# quality_classifier (fastText-shape linear model over hashed unigrams)
# ---------------------------------------------------------------------------


def test_quality_classifier_deterministic_and_monotone(spark):
    rows = [
        (1, "a b a b", "en"),
        (2, "a b a b", "en"),  # identical doc -> identical score
        (3, "a b", "en"),      # same mean feature weight -> same score
        (4, None, "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in C.quality_classifier(df).collect()}
    assert set(out) == {1, 2, 3}  # NULL text dropped
    assert out[1]["score"] == out[2]["score"] == out[3]["score"]
    assert out[1]["quality"] == out[2]["quality"]
    assert out[1]["keep"] in (0, 1)
    # sigmoid bounds and the keep rule applied to the floored value
    for d in (1, 2, 3):
        q = out[d]["quality"]
        assert 0.0 <= q <= 1.0
        assert out[d]["keep"] == (1 if q >= C.QCLF_KEEP_MIN else 0)


def test_quality_classifier_plan_broadcast_model(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    plan = (
        C.quality_classifier(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the model joins broadcast; the token stream never shuffles by bucket
    assert "BroadcastHashJoin" in plan
    # r6: bucket ids come from the Arrow word-bucket kernel — vectorized
    # (ArrowEvalPython), never row-at-a-time Python
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# line_repetition_stats (Gopher line-granularity rules)
# ---------------------------------------------------------------------------


def test_line_repetition_fractions(spark):
    rows = [
        (1, "aaaa\nbb\naaaa\ncc"),    # 'aaaa' twice: 1 dup line of 4
        (2, "xx\nyy\nzz"),             # no dups
        (3, "qq\nqq\nqq"),             # 2 dup occurrences of 3
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.line_repetition_stats(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == 0.25
    # dup chars = 4 ('aaaa' second occurrence) of 12 total
    assert out[1]["dup_line_char_frac"] == 0.3333
    assert out[1]["keep"] == 0  # char fraction 0.33 > 0.20
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["keep"] == 1
    assert out[3]["dup_line_frac"] == 0.6666 and out[3]["keep"] == 0


def test_line_repetition_plan_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = (
        C.line_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # stats are doc-local


def test_seeded_line_dups_cross_thresholds(spark):
    from gpt4ocontentextraction_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = C.line_repetition_stats(
        C.seed_line_dups(dedup.reflow_lines(docs))
    ).collect()
    keeps = {r["keep"] for r in res}
    assert keeps == {0, 1}
    assert any(r["dup_line_frac"] > 0 for r in res)


# ---------------------------------------------------------------------------
# filter_funnel (pipeline attrition report)
# ---------------------------------------------------------------------------


def test_filter_funnel_monotone_and_real_attrition(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r["stage_idx"]: r for r in C.filter_funnel(docs).collect()}
    assert [rows[i]["stage"] for i in range(4)] == [
        "input",
        "length",
        "quality",
        "gopher_word",
    ]
    ns = [rows[i]["n_surviving"] for i in range(4)]
    assert ns[0] == 500
    assert ns == sorted(ns, reverse=True)  # cumulative stages only shrink
    assert len(set(ns)) == 4  # every stage drops SOMETHING (non-degenerate)


# ---------------------------------------------------------------------------
# token_quantiles (discrete rank-selection quantiles per language)
# ---------------------------------------------------------------------------


def test_token_quantiles_rank_selection(spark):
    from gpt4ocontentextraction_spark.operators import textstats

    # lang 'en': token counts 1..10 -> q50 = rank ceil(0.5*10)=5 -> 5,
    # q90 -> rank 9 -> 9, q99 -> rank 10 -> 10
    rows = [(i, " ".join(["w"] * i), "en") for i in range(1, 11)]
    rows += [(100, "a b c", "fr"), (101, None, "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["lang"], r["q"]): (r["n_docs"], r["q_tokens"])
        for r in textstats.token_quantiles(df).collect()
    }
    assert got[("en", 0.5)] == (10, 5)
    assert got[("en", 0.9)] == (10, 9)
    assert got[("en", 0.99)] == (10, 10)
    # single-doc language: every quantile is that doc; NULL text excluded
    assert got[("fr", 0.5)] == (1, 3)
    assert got[("fr", 0.99)] == (1, 3)


def test_token_quantiles_tie_break_deterministic(spark):
    from gpt4ocontentextraction_spark.operators import textstats

    # all docs have the same token count: rank selection must still be
    # unique and the value identical regardless of which row wins
    rows = [(i, "x y z", "en") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = textstats.token_quantiles(df).collect()
    assert len(out) == 3
    assert all(r["q_tokens"] == 3 and r["n_docs"] == 7 for r in out)


# ---------------------------------------------------------------------------
# normalize_text (NFC + control strip + whitespace collapse)
# ---------------------------------------------------------------------------


def test_normalize_text_rules(spark):
    bel, tab, acute = chr(7), chr(9), chr(0x301)
    rows = [
        (1, "cafe" + acute + " time"),          # NFC composes
        (2, "a" + bel + "b"),                    # control stripped
        (3, "x" + tab + tab + "y   z"),          # whitespace collapsed
        (4, "  padded  "),                       # trimmed
        (5, "already clean"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.normalize_text(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["normalized"] == "caf" + chr(0xE9) + " time"
    assert out[1]["changed"] == 1
    assert out[1]["n_chars_after"] == out[1]["n_chars_before"] - 1
    assert out[2]["normalized"] == "ab"
    assert out[3]["normalized"] == "x y z"
    assert out[4]["normalized"] == "padded"
    assert out[5]["changed"] == 0
    assert out[5]["normalized"] == "already clean"


def test_normalize_text_idempotent(spark):
    """Normalizing an already-normalized corpus changes nothing."""
    rows = [(i, f"plain text {i} here") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = C.normalize_text(df).select(
        "doc_id", F.col("normalized").alias("text")
    )
    twice = C.normalize_text(once).collect()
    assert all(r["changed"] == 0 for r in twice)


# ---------------------------------------------------------------------------
# vocab_coverage (top-k words + cumulative corpus coverage)
# ---------------------------------------------------------------------------


def test_vocab_coverage_counts_and_cumulative(spark):
    rows = [(1, "a a a b b c"), (2, "a b x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["rank"]: r for r in C.vocab_coverage(df, k=3).collect()}
    # counts: a=4, b=3, c=1, x=1 -> top3 = a, b, c (tie c<x)
    assert (out[1]["word"], out[1]["cnt"]) == ("a", 4)
    assert (out[2]["word"], out[2]["cnt"]) == ("b", 3)
    assert (out[3]["word"], out[3]["cnt"]) == ("c", 1)
    assert out[1]["frac"] == 0.444444  # floor(4/9 * 1e6)/1e6
    assert out[2]["cum_frac"] == 0.777777
    # cumulative strictly increases and stays <= 1
    cums = [out[i]["cum_frac"] for i in (1, 2, 3)]
    assert cums == sorted(cums) and cums[-1] <= 1.0


def test_vocab_coverage_full_vocab_reaches_one(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = C.vocab_coverage(docs).collect()
    assert len(out) < C.VOCAB_K  # synthetic vocab smaller than k
    assert max(r["cum_frac"] for r in out) == 1.0


# ---------------------------------------------------------------------------
# token_budget_mix (token-budget stratified domain mixing)
# ---------------------------------------------------------------------------


def test_token_budget_mix_budget_rule(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = C.token_budget_mix(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"de", "en", "es", "fr", "zh"}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (r["sample_key"], r["doc_id"]))
        # cumulative column is the running sum in hash order
        run = 0
        for r in rows:
            # kept <=> the stratum had not yet reached the budget
            assert run < C.TOKEN_BUDGET
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
        # the selection stops AT the crossing doc: either the budget was
        # reached, or the stratum ran out of docs entirely
        n_lang = (
            docs.where(F.col("lang") == lang).count()
        )
        assert run >= C.TOKEN_BUDGET or len(rows) == n_lang


def test_token_budget_mix_keep_all_when_under_budget(spark):
    # one stratum whose total token count never reaches the budget:
    # the whole stratum is kept (the histogram finds no cutoff bucket)
    rows = [(i, "w " * 5, "xx") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = C.token_budget_mix(df).collect()
    assert len(out) == 10


def test_token_budget_mix_histogram_prunes_before_window(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(C.token_budget_mix(docs))
    # the bucket-cutoff filter must precede the exact cumsum window so
    # the sort only ever sees ~the mix, never a full stratum
    assert plan.index("Filter") < plan.index("Window")
    # and the cutoff relation arrives broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# pretraining_mix (filters -> exact dedup -> packing, one plan)
# ---------------------------------------------------------------------------


def test_pretraining_mix_stage_attrition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = sorted(
        C.pretraining_mix(docs).collect(), key=lambda r: r["doc_id"]
    )
    # real attrition through both stages: filters drop docs, dedup drops
    # more (exact counts pinned so a silent semantics change is loud)
    assert len(out) == 209
    # packing is a contiguous prefix sum over the SURVIVORS in doc_id
    # order — same invariant as pack_sequences but on the filtered set
    offset = 0
    for r in out:
        assert r["start_offset"] == offset
        assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1
        offset += r["n_tokens"]


def test_pretraining_mix_is_subset_of_funnel_survivors(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mix_ids = {
        r["doc_id"] for r in C.pretraining_mix(docs).collect()
    }
    funnel = {
        r["stage"]: r["n_surviving"]
        for r in C.filter_funnel(docs).collect()
    }
    # dedup can only shrink the funnel's final survivor set
    assert len(mix_ids) <= funnel["gopher_word"]
    # and every packed doc passed the filters: recompute the keep set
    rep = C.repetition_stats(docs).select("doc_id", "n_words", "keep")
    q = C.quality_classifier(docs).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    kept = {
        r["doc_id"]
        for r in rep.join(q, "doc_id")
        .where(
            (F.col("n_words") >= C.FUNNEL_MIN_WORDS)
            & (F.col("keep") == 1)
            & (F.col("q_keep") == 1)
        )
        .collect()
    }
    assert mix_ids <= kept


# --- mojibake / encoding repair -----------------------------------------


def test_fix_mojibake_real_transcode_recovers_clean(spark):
    broken = "caf" + C.MOJI_SNIPPET_BROKEN[4:6]  # 'cafÃ©' via the codec table
    rows = [(1, "x " + C.MOJI_SNIPPET_BROKEN.strip()), (2, "plain ascii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.fix_mojibake(df).collect()}
    assert out[1]["fixed"] == "x " + C.MOJI_SNIPPET_CLEAN.strip()
    assert out[1]["was_fixed"] == 1
    assert out[1]["n_chars_after"] < out[1]["n_chars_before"]
    assert out[2]["fixed"] == "plain ascii" and out[2]["was_fixed"] == 0
    assert len(broken) == 5  # sanity: the slice really is 'cafÃ©'


def test_fix_mojibake_guard_refuses_lossy_rows(spark):
    # mixing mojibake with a char Latin-1 can't encode (em dash) must
    # leave the row untouched — the '?' count guard
    rows = [
        (1, "a " + C.MOJI_MIXED_BROKEN.strip()),
        # lone mojibake lead byte followed by ASCII: invalid UTF-8
        # bytes after re-encode -> U+FFFD guard refuses
        (2, "abc Ã© ok Ã¿t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.fix_mojibake(df).collect()}
    assert out[1]["fixed"] == rows[0][1] and out[1]["was_fixed"] == 0
    # row 2 is genuinely repairable mojibake ('é', 'ÿ' both Latin-1);
    # it must be FIXED (the detect+guards allow it)
    assert out[2]["was_fixed"] == 1
    assert out[2]["fixed"] == "abc é ok ÿt"


def test_fix_mojibake_invalid_bytes_guard(spark):
    # 'Ã' then a >U+00FF char: re-encode turns the char into '?', the
    # latin1-safe guard refuses; 'Ã' then ASCII never matches the detect RE
    rows = [(1, "bad Ã— tail"), (2, "bare Ãx tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.fix_mojibake(df).collect()}
    assert out[1]["was_fixed"] == 0 and out[1]["fixed"] == rows[0][1]
    assert out[2]["was_fixed"] == 0 and out[2]["fixed"] == rows[1][1]


def test_fix_mojibake_idempotent_and_seeded_classes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    seeded = C.seed_mojibake(docs)
    out = C.fix_mojibake(seeded)
    rows = out.collect()
    import pyspark.sql.functions as F

    by_cls = {0: [], 1: [], 2: []}
    for r in rows:
        by_cls[r["doc_id"] % 3].append(r)
    assert all(r["was_fixed"] == 1 for r in by_cls[0])
    assert all(r["fixed"].endswith(C.MOJI_SNIPPET_CLEAN) for r in by_cls[0])
    assert all(r["was_fixed"] == 0 for r in by_cls[1])
    assert all(r["was_fixed"] == 0 for r in by_cls[2])
    # idempotence: repairing the repaired corpus changes nothing
    again = C.fix_mojibake(out.select("doc_id", F.col("fixed").alias("text")))
    assert again.filter(F.col("was_fixed") != 0).count() == 0


# --- URL filtering ------------------------------------------------------


def test_url_filter_classes_and_dedup(spark):
    rows = [
        (10, "https://src0.example.com/articles/10"),          # clean
        (11, "https://spam-mirror.biz/mirror/11"),             # blocklist
        (12, "https://src0.example.com/files/12.exe"),         # extension
        (13, "https://src0.example.com/casino-gambling/13"),   # badwords
        (14, "HTTPS://Dup.Example.COM/posts/14?utm_source=f#x"),
        (19, "HTTPS://Dup.Example.COM/posts/14?utm_medium=r"),  # dup of 14
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in C.url_filter(df).collect()}
    assert out[10]["reject_reason"] is None and out[10]["keep"] == 1
    assert out[11]["reject_reason"] == "blocklist"
    assert out[12]["reject_reason"] == "extension"
    assert out[13]["reject_reason"] == "badwords"
    assert out[13]["n_badwords"] == 2  # casino + gambling
    # canonicalization: host lowered, query/fragment stripped
    assert out[14]["norm_url"] == "https://dup.example.com/posts/14"
    assert out[14]["norm_url"] == out[19]["norm_url"]
    assert out[14]["is_dup"] == 0 and out[14]["keep"] == 1
    assert out[19]["is_dup"] == 1 and out[19]["keep"] == 0


def test_url_filter_rejected_dup_never_keeps(spark):
    # a rejected URL that is ALSO the canonical keeper must not keep
    rows = [
        (1, "https://spam-mirror.biz/x"),
        (2, "https://spam-mirror.biz/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in C.url_filter(df).collect()}
    assert out[1]["keep"] == 0 and out[2]["keep"] == 0
    assert out[1]["is_dup"] == 0 and out[2]["is_dup"] == 1


def test_url_filter_seeded_corpus_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = C.url_filter(C.seed_urls(docs))
    agg = out.groupBy("reject_reason").count().collect()
    got = {r["reject_reason"]: r["count"] for r in agg}
    assert got["blocklist"] == 100
    assert got["extension"] == 100
    assert got["badwords"] == 100
    assert got[None] == 200
    assert out.filter(F.col("is_dup") == 1).count() == 50
    assert out.filter(F.col("keep") == 1).count() == 150
