"""Unit tests for operators/curation.py edge cases the sf-data parity
suite can't reach: empty/short documents, threshold boundaries, split
determinism, redaction order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_repetition_empty_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "", "en"),                # no tokens at all
            (2, "word", "en"),            # 1 token: no bigrams/trigrams
            (3, "a b", "en"),             # 2 tokens: no trigrams
            (4, "x x x x", "en"),         # max repetition
        ],
    )
    out = {r["doc_id"]: r for r in curation.repetition_stats(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["top_unigram_frac"] == 0.0
    assert out[2]["top_unigram_frac"] == 1.0
    assert out[2]["top_bigram_frac"] == 0.0
    assert out[3]["dup_trigram_frac"] == 0.0
    # "x x x x": 4 identical unigrams, 3 identical bigrams
    assert out[4]["top_unigram_frac"] == 1.0
    assert out[4]["dup_bigram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-4)


def test_gopher_filter_token_bounds(spark):
    short = " ".join(f"w{i}" for i in range(5))
    ok = " ".join(f"w{i}" for i in range(30))
    repeated = "spam ham " * 40  # top bigram dominates
    df = _docs(spark, [(1, short, "en"), (2, ok, "en"), (3, repeated, "en")])
    out = {r["doc_id"]: r["keep"] for r in curation.gopher_filter(df).collect()}
    assert out == {1: False, 2: True, 3: False}


def test_hash_split_deterministic_and_exhaustive(spark):
    df = _docs(spark, [(i, "t", "en") for i in range(64)])
    a = {r["doc_id"]: r["split"] for r in curation.hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(df.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    # different seed -> different assignment for at least one row
    c = {r["doc_id"]: r["split"] for r in curation.hash_split(df, seed="other").collect()}
    assert c != a


def test_hash_split_rejects_bad_buckets(spark):
    df = _docs(spark, [(1, "t", "en")])
    with pytest.raises(ValueError, match="train_buckets"):
        curation.hash_split(df, train_buckets=250, val_buckets=20)
    with pytest.raises(ValueError, match="train_buckets"):
        curation.hash_split(df, train_buckets=256, val_buckets=0)


def test_hash_split_full_256_boundary_has_no_test_rows(spark):
    # train+val == 256 covers the whole bucket space; the naive hex
    # threshold '100' would string-compare below every bucket >= 0x10
    # and dump ~94% of rows into 'test'
    df = _docs(spark, [(i, "t", "en") for i in range(512)])
    out = {
        r["split"]: r["count"]
        for r in curation.hash_split(df, train_buckets=128, val_buckets=128)
        .groupBy("split")
        .count()
        .collect()
    }
    assert "test" not in out
    assert out.get("train", 0) + out.get("val", 0) == 512
    assert out.get("train", 0) > 0 and out.get("val", 0) > 0


def test_stratified_sample_exactly_k(spark):
    rows = [(i, "t", lang) for i, lang in enumerate(["en"] * 10 + ["de"] * 3 + ["fr"] * 1)]
    df = _docs(spark, rows)
    out = curation.stratified_sample(df, k=2).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in out}
    assert counts == {"en": 2, "de": 2, "fr": 1}  # stratum smaller than k kept whole


def test_passage_stats_detects_cross_doc_boilerplate(spark):
    chunk = " ".join(f"tok{i}" for i in range(16))
    unique1 = " ".join(f"one{i}" for i in range(16))
    unique2 = " ".join(f"two{i}" for i in range(16))
    df = _docs(
        spark,
        [(1, f"{chunk} {unique1}", "en"), (2, f"{chunk} {unique2}", "en")],
    )
    out = {r["doc_id"]: r for r in curation.passage_stats(df).collect()}
    for d in (1, 2):
        assert out[d]["n_passages"] == 2
        assert out[d]["dup_passages"] == 1
        assert out[d]["dup_frac"] == 0.5


def test_pii_scan_and_redact_order(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith@corp.example.com ip 10.1.2.3 tel 555-123-4567 end")],
        "doc_id bigint, text string",
    )
    scan = curation.pii_scan(df).collect()[0]
    assert (scan["n_email"], scan["n_ipv4"], scan["n_phone"]) == (1, 1, 1)
    red = curation.pii_redact(df).collect()[0]["redacted"]
    assert red == "mail [EMAIL] ip [IP] tel [PHONE] end"
    # the phone pattern must not nibble the already-redacted ip's octets
    assert "[IP]" in red and "555" not in red


def test_corpus_stats_percentile_matches_interpolation(spark):
    df = spark.createDataFrame(
        [(i, "a b c", "en", n) for i, n in enumerate([10, 20, 30, 40])],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    row = curation.corpus_stats(df).collect()[0]
    assert row["n_docs"] == 4
    assert row["p50_chars"] == 25.0  # linear interpolation between 20 and 30
    assert row["mean_chars"] == 25.0
    assert row["total_tokens"] == 12


def test_pack_sequences_matches_naive_global_window(spark):
    rows = [(i, " ".join(["w"] * (3 + (i * 7) % 11)), "en") for i in range(50)]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in curation.pack_sequences(df, seq_len=16, bucket_size=8).collect()
    }
    # naive reference: sequential cumsum in plain Python
    cum = 0
    for i, text, _lang in rows:
        n = len(text.split())
        assert out[i] == (n, cum // 16, cum % 16), (i, out[i], cum)
        cum += n


def test_pack_sequences_bucket_size_invariant(spark):
    df = _docs(spark, [(i, "a b c", "en") for i in range(40)])
    a = sorted(map(tuple, curation.pack_sequences(df, seq_len=7, bucket_size=4).collect()))
    b = sorted(map(tuple, curation.pack_sequences(df, seq_len=7, bucket_size=1000).collect()))
    assert a == b


def test_pack_sequences_rejects_string_ids(spark):
    # a string id would cast to NULL in the range bucket and collapse
    # every row into one bucket (single-reducer window) — reject instead
    df = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(TypeError, match="numeric"):
        curation.pack_sequences(df, seq_len=8)


def test_pack_sequences_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError, match="seq_len"):
        curation.pack_sequences(_docs(spark, [(1, "a", "en")]), seq_len=0)


def test_decontaminate_flags_exact_ngram_overlap(spark):
    shared = "alpha beta gamma delta"
    train = _docs(
        spark,
        [
            (1, f"noise one two {shared} tail words", "en"),
            (2, "completely unrelated text here now", "en"),
        ],
    )
    ev = _docs(spark, [(100, f"prefix {shared} suffix", "en")])
    out = {r["doc_id"]: r["n_hits"] for r in curation.decontaminate(train, ev, n=4).collect()}
    assert 1 in out and out[1] >= 1  # shares the 4-gram
    assert 2 not in out  # clean doc emits no row


def _plain_window_sample(df, k, seed="sample-v1"):
    """Reference: the unbounded per-stratum window form."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= k)
    )


def test_stratified_sample_threshold_path_matches_plain_window(spark):
    # 1000-row stratum (>> 8k) engages the hash-threshold prefilter; a
    # 3-row stratum takes the unfiltered path; results must equal the
    # plain-window form row for row, ranks included
    rows = [(i, "t", "en") for i in range(1000)] + [
        (10000 + i, "t", "de") for i in range(3)
    ]
    df = _docs(spark, rows)
    got = sorted(
        (r["lang"], r["doc_id"], r["sample_rank"])
        for r in curation.stratified_sample(df, k=5).collect()
    )
    want = sorted(
        (r["lang"], r["doc_id"], r["sample_rank"])
        for r in _plain_window_sample(df, 5).collect()
    )
    assert got == want
    assert len([g for g in got if g[0] == "en"]) == 5
    assert len([g for g in got if g[0] == "de"]) == 3


def test_stratified_sample_starved_threshold_falls_back(spark):
    # oversample so small the filter keeps < k rows: the rescan must
    # still produce the exact plain-window sample
    rows = [(i, "t", "en") for i in range(500)]
    df = _docs(spark, rows)
    got = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in curation.stratified_sample(df, k=10, oversample=0.01).collect()
    )
    want = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in _plain_window_sample(df, 10).collect()
    )
    assert got == want


def test_stratified_sample_null_stratum_kept(spark):
    rows = [(1, "t", None), (2, "t", None), (3, "t", "en")]
    df = _docs(spark, rows)
    out = curation.stratified_sample(df, k=2).collect()
    assert len([r for r in out if r["lang"] is None]) == 2
    assert len([r for r in out if r["lang"] == "en"]) == 1


def test_expectations_report_counts_and_null_trap(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A"), (4, 7.0, None)],
        "id bigint, amount double, grade string",
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["violation_rate"])
        for r in curation.expectations_report(
            df,
            {
                "amount_positive": "amount > 0",
                "grade_known": "grade IN ('A', 'B')",
                "id_not_null": "id IS NOT NULL",
            },
        ).collect()
    }
    # NULL amount fails 'amount > 0' (NULL predicate = violation)
    assert out["amount_positive"] == (4, 2, 0.5)
    assert out["grade_known"] == (4, 1, 0.25)
    assert out["id_not_null"] == (4, 0, 0.0)


def test_expectations_report_single_scan_plan(spark):
    df = spark.createDataFrame([(1, 2.0)], "id bigint, v double")
    plan = (
        curation.expectations_report(
            df, {"a": "v > 0", "b": "v < 10", "c": "id IS NOT NULL"}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") <= 1, plan


def test_expectations_report_requires_rules(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError, match="rule"):
        curation.expectations_report(df, {})


def test_expectations_report_dotted_rule_names(spark):
    df = spark.createDataFrame([(1, 10.0), (2, -1.0)], "id bigint, amount double")
    out = {
        r["rule"]: r["n_violations"]
        for r in curation.expectations_report(
            df, {"amount.is.positive": "amount > 0"}
        ).collect()
    }
    assert out == {"amount.is.positive": 1}


def test_expectations_report_empty_input_matches_oracle_shape(spark):
    # ADVICE r03: the old GROUP BY oracle returned zero rows per rule on
    # an empty table while Spark returns one row per rule with zero
    # counts. Both sides must emit one row per rule on empty input.
    import duckdb

    from wikidata_to_surrealdb_spark.plans.queries import QUERIES

    rules = {"a_pos": "o_totalprice > 0", "b_set": "o_orderstatus IN ('O')"}
    empty = spark.createDataFrame(
        [], "o_totalprice double, o_orderstatus string"
    )
    rows = sorted(
        (r.rule, r.n_rows, r.n_violations, r.violation_rate)
        for r in curation.expectations_report(empty, rules).collect()
    )
    assert rows == [("a_pos", 0, 0, 0.0), ("b_set", 0, 0, 0.0)]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS "
        "SELECT CAST(NULL AS DOUBLE) AS o_totalprice, "
        "CAST(NULL AS VARCHAR) AS o_orderstatus, "
        "CAST(NULL AS DATE) AS o_orderdate WHERE FALSE"
    )
    got = con.sql(QUERIES["curation_expectations"].oracle).fetchall()
    con.close()
    # one row per shipped rule, all-zero counts
    assert len(got) == 4
    assert all(r[1] == 0 and r[2] == 0 for r in got)


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis-Spirakis deterministic priority sampling)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_partition_stable(spark):
    rows = [(i, 1 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = {r.doc_id for r in curation.weighted_sample(df, "doc_id", "w", k=50).collect()}
    b = {
        r.doc_id
        for r in curation.weighted_sample(df.repartition(13), "doc_id", "w", k=50).collect()
    }
    assert a == b and len(a) == 50


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # half the rows weigh 10x more; across many seeds they should
    # dominate the sample
    rows = [(i, 10 if i < 250 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    heavy = 0
    for seed in ("s1", "s2", "s3"):
        got = curation.weighted_sample(df, "doc_id", "w", k=50, seed=seed).collect()
        heavy += sum(1 for r in got if r.doc_id < 250)
    # expectation ~85% heavy; require a clear majority
    assert heavy > 0.7 * 150


def test_weighted_sample_excludes_nonpositive_weights(spark):
    rows = [(1, 0), (2, -5), (3, 4), (4, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r.doc_id for r in curation.weighted_sample(df, "doc_id", "w", k=10).collect()}
    assert got == {3, 4}


def test_weighted_sample_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(100)], ["doc_id", "w"])
    plan = (
        curation.weighted_sample(df, "doc_id", "w", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# corpus_mix (temperature-weighted training-mix materialization)
# ---------------------------------------------------------------------------


def test_corpus_mix_quota_math_and_determinism(spark):
    # source a: weight-2 docs, source b: weight-1 docs -> alpha=2 gives
    # per-doc mass 4 vs 1; totals: a = 10 docs * 4 = 40, b = 10 * 1 = 10
    # -> quotas floor(20 * 40/50)=16 and floor(20 * 10/50)=4
    rows = [(i, "a" if i < 10 else "b", 2 if i < 10 else 1) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = curation.corpus_mix(df, budget=20, alpha=2)
    got = {(r.doc_id, r.source) for r in out.collect()}
    from collections import Counter

    counts = Counter(s for _, s in got)
    # quota caps at the source's own size (10): floor allocation = 16 -> 10
    assert counts["a"] == 10 and counts["b"] == 4
    again = {
        (r.doc_id, r.source)
        for r in curation.corpus_mix(df.repartition(7), budget=20, alpha=2).collect()
    }
    assert got == again


def test_corpus_mix_alpha_one_natural_proportions(spark):
    rows = [(i, "a" if i < 30 else "b", 1) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = curation.corpus_mix(df, budget=20, alpha=1)
    from collections import Counter

    counts = Counter(r.source for r in out.collect())
    assert counts == {"a": 15, "b": 5}  # 30:10 mass -> 15:5


def test_corpus_mix_alpha3_guard(spark):
    """alpha>=3 carries an explicit overflow guard: under non-ANSI Spark
    a DECIMAL(38,0) overflow of w^alpha yields NULL, which F.sum would
    silently skip — a skewed quota. The guard fails loudly instead."""
    import pytest as _pytest

    # safe magnitudes: alpha=3 works and allocates deterministically
    rows = [(i, "a" if i < 10 else "b", 3 if i < 10 else 1) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    from collections import Counter

    counts = Counter(
        r.source for r in curation.corpus_mix(df, budget=12, alpha=3).collect()
    )
    # mass a = 10*27 = 270, b = 10*1 = 10 -> floor(12*270/280)=11, floor(12*10/280)=0
    assert counts == {"a": 10}  # 11 capped at source size 10; b floored to 0
    # overflowing magnitudes: (10^13)^3 = 10^39 > DECIMAL(38,0) max
    big = spark.createDataFrame(
        [(1, "a", 10**13), (2, "b", 1)], ["doc_id", "source", "n_chars"]
    )
    # ANSI Spark throws on the multiply itself; non-ANSI reaches the
    # raise_error guard — either way the failure is LOUD, never a
    # silently skewed quota
    with _pytest.raises(
        Exception, match="overflowed DECIMAL|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        curation.corpus_mix(big, budget=2, alpha=3).collect()
    # prove the guard path itself fires where ANSI would have nulled:
    # same data, ANSI off for the action
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with _pytest.raises(Exception, match="overflowed DECIMAL"):
            curation.corpus_mix(big, budget=2, alpha=3).collect()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")


def test_corpus_mix_exact_floor_at_boundary_masses(spark):
    """Round 10: the per-source quota is an EXACT rational floor in
    DECIMAL, not a double ratio. At masses past 2^53 the two disagree:
    (10^17-1)/10^17 rounds UP to 1.0 in double, so the old double path
    allocated a slot the exact floor denies. Both engines must take the
    exact branch."""
    # budget=1, masses (10^17-1) vs 1: exact quotas floor((1e17-1)/1e17)=0
    # and floor(1/1e17)=0 -> NOTHING selected. The double path would
    # (wrongly) select one doc from source a.
    df = spark.createDataFrame(
        [(1, "a", 10**17 - 1), (2, "b", 1)], ["doc_id", "source", "n_chars"]
    )
    assert curation.corpus_mix(df, budget=1, alpha=1).count() == 0
    # DuckDB oracle mirror of the same boundary quota arithmetic
    # (HUGEINT // — the expression the catalog oracle uses): also 0
    import duckdb

    assert (
        duckdb.sql(
            "SELECT CAST((1 * CAST(99999999999999999 AS HUGEINT))"
            " // CAST(100000000000000000 AS HUGEINT) AS INTEGER)"
        ).fetchone()[0]
        == 0
    )
    # exact-integer ratio boundary (num % tot == 0): no off-by-one either
    # side of it. masses a=3, b=1, budget=8 -> quotas 6 (capped at 3) and 2
    rows = [(i, "a", 1) for i in range(3)] + [(3, "b", 1), (4, "b", 1)]
    df2 = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    from collections import Counter

    counts = Counter(
        r.source for r in curation.corpus_mix(df2, budget=8, alpha=1).collect()
    )
    # masses a=3, b=2, tot=5: floor(24/5)=4 -> capped 3; floor(16/5)=3 -> capped 2
    assert counts == {"a": 3, "b": 2}


def test_corpus_mix_degenerate_masses(spark):
    """Zero and NULL masses are well-defined, not crashes: an all-zero
    corpus selects nothing (the ANSI decimal mod would otherwise raise
    DIVIDE_BY_ZERO on tot=0), and an all-NULL-weight source is excluded
    without tripping the overflow guard (SUM over no non-NULL inputs is
    a legitimate NULL, not an overflow)."""
    zero = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], ["doc_id", "source", "n_chars"]
    )
    assert curation.corpus_mix(zero, budget=5, alpha=2).count() == 0
    mixed = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 4)],
        "doc_id long, source string, n_chars long",
    )
    got = curation.corpus_mix(mixed, budget=2, alpha=2).collect()
    # source a contributes no mass -> excluded; b owns the whole budget
    assert {(r.doc_id, r.source) for r in got} == {(3, "b")}


def test_corpus_mix_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, "a", 1)], ["doc_id", "source", "n_chars"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curation.corpus_mix(df, alpha=0)
    with _pytest.raises(ValueError):
        curation.corpus_mix(df, alpha=1.5)


# ---------------------------------------------------------------------------
# substring (span-level) dedup
# ---------------------------------------------------------------------------


def test_substring_dedup_hand_cases(spark):
    """Known boilerplate: docs 1 and 2 share an 8-token run (kept in the
    canonical first occurrence, removed from the second); doc 3 repeats
    its own run twice (second occurrence removed); doc 4 is clean; doc 5
    is shorter than the window (never fingerprinted)."""
    import hashlib

    from wikidata_to_surrealdb_spark.operators.dedup import substring_dedup

    boiler = "the quick brown fox jumps over the lazy"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {boiler} omega"),
            (2, f"start {boiler} end"),
            (3, f"{boiler} {boiler}"),
            (4, "totally unique words that never repeat anywhere here"),
            (5, "tiny doc"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_dedup(docs, window=8).collect()
    }

    def h(tokens):
        return hashlib.md5(" ".join(tokens).encode()).hexdigest()

    b = boiler.split()
    # doc 1 holds the canonical (smallest doc_id) occurrence: untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_hash"] == h(["alpha", *b, "omega"])
    # doc 2's copy is covered by one window -> all 8 tokens removed
    assert out[2]["n_tokens"] == 10 and out[2]["n_removed"] == 8
    assert out[2]["cleaned_hash"] == h(["start", "end"])
    # doc 3: BOTH its runs lose to doc 1's canonical occurrence
    # (smallest (doc_id, start) across the corpus), so all 16 tokens go
    assert out[3]["n_tokens"] == 16 and out[3]["n_removed"] == 16
    assert out[3]["cleaned_hash"] == h([])
    assert out[4]["n_removed"] == 0
    assert out[5]["n_tokens"] == 2 and out[5]["n_removed"] == 0
    assert out[5]["cleaned_hash"] == h(["tiny", "doc"])


def test_substring_dedup_rejects_tiny_window(spark):
    import pytest as _pytest

    from wikidata_to_surrealdb_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        substring_dedup(docs, window=1)


def test_importance_weights_empty_target_class(spark):
    """r16 monokey finding: a target class NO document matches trained
    an LM with vocabulary 0, and the uniform fallback divided by zero
    (Spark ANSI error vs DuckDB NULL). With the greatest(v,1) guard the
    empty model is well-defined and uninformative — every gram scores
    the default 0 on the target side, so the weight reduces to
    -log10 p_background."""
    from wikidata_to_surrealdb_spark.operators.curation import (
        importance_weights,
    )

    rows = [(i, "aha aha haha", "b") for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    out = {
        r["doc_id"]: r
        for r in importance_weights(docs, F.col("source") == "t").collect()
    }
    assert len(out) == 6
    # target side contributes exactly 0 per gram -> weight = -score_b,
    # and p_background < 1 per gram so the weight is strictly positive
    assert all(out[i]["log10_weight"] > 0 for i in range(6))


def test_nb_classifier_empty_seed_class(spark):
    """r16 monokey finding: an empty seed class (nothing matches
    pos_cond — or everything does) made the unsmoothed prior plog10(0),
    overflowing the e12 BIGINT in both engines. Laplace-smoothed priors
    keep it finite: the classifier still runs and the prior pulls every
    token-less doc toward the populated class."""
    from wikidata_to_surrealdb_spark.operators import curation

    rows = [
        (1, "spam spam click", "crawl"),
        (2, "click junk spam", "crawl"),
        (3, "", "crawl"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # no doc matches: n_pos = 0
    out = {
        r.doc_id: r
        for r in curation.nb_quality_classifier(
            df, F.col("source") == "seed"
        ).collect()
    }
    assert len(out) == 3
    assert all(isinstance(r.logodds_e12, int) for r in out.values())
    assert out[3].pred == "lo"  # prior alone: negatives dominate
    # every doc matches: n_neg = 0 — the mirror case
    out2 = curation.nb_quality_classifier(
        df, F.col("source") == "crawl"
    ).collect()
    assert len(out2) == 3 and all(r.pred == "hi" for r in out2)


def test_importance_weights_favor_target_domain(spark):
    """DSIR sanity: docs from the target distribution must score higher
    log-ratio than off-domain docs; gramless docs get NULL weight."""
    from wikidata_to_surrealdb_spark.operators.curation import (
        importance_weights,
    )

    rows = []
    for i in range(20):  # target domain: repetitive 'aha' prose
        rows.append((i, "aha aha haha ahah aaha", "t"))
    for i in range(20, 40):  # background-only domain: 'zyx' prose
        rows.append((i, "zyx xyz zzyy xxyz yzzx", "b"))
    rows.append((99, "", "b"))  # no grams
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {
        r["doc_id"]: r
        for r in importance_weights(docs, F.col("source") == "t").collect()
    }
    t_w = [out[i]["log10_weight"] for i in range(20)]
    b_w = [out[i]["log10_weight"] for i in range(20, 40)]
    assert min(t_w) > max(b_w)
    assert all(w > 0 for w in t_w)  # target docs: p_t > p_b
    assert out[99]["n_grams"] == 0 and out[99]["log10_weight"] is None
    assert len(out) == 41


def test_containment_catches_quote_in_larger_doc(spark):
    """A short doc quoted verbatim inside a much larger doc: containment
    ~1.0 even though Jaccard is tiny — the case this operator exists
    for. Ubiquitous shingles (df > max_df) are excluded from pairing."""
    from wikidata_to_surrealdb_spark.operators.dedup import (
        containment_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(10))
    filler = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, f"{filler} {quote}"),
            (3, "totally different content entirely here"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(docs, threshold=0.5).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r["containment"] == 1.0  # every quote shingle is in doc 2
    assert r["size_a"] == 8  # 10 tokens -> 8 distinct 3-shingles
    # Jaccard on the same pair is far below the containment score:
    # |A∩B| = 8 shared shingles, |A∪B| = 8 + 198 filler+seam shingles
    assert r["inter"] / (r["size_a"] + r["size_b"] - r["inter"]) < 0.1


def test_nb_classifier_separates_obvious_classes(spark):
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators import curation

    rows = [
        (1, "good good wholesome prose", "seed"),
        (2, "good wholesome words", "seed"),
        (3, "spam spam click here", "crawl"),
        (4, "click spam junk", "crawl"),
        (5, "wholesome good text", "crawl"),   # crawl doc that reads curated
        (6, "", "crawl"),                      # token-less: prior only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curation.nb_quality_classifier(df, F.col("source") == "seed")
    got = {r.doc_id: (r.pred, r.n_tokens) for r in out.collect()}
    assert got[1][0] == "hi" and got[2][0] == "hi"
    assert got[3][0] == "lo" and got[4][0] == "lo"
    assert got[5][0] == "hi"          # classified by content, not label
    assert got[6] == ("lo", 0)        # prior: negatives outnumber positives
    # log-odds are exact integers and monotone with spamminess
    lo = {r.doc_id: r.logodds_e12 for r in out.collect()}
    assert lo[3] < lo[5] and isinstance(lo[3], int)


def test_c4_span_dedup_keeps_first_occurrence(spark):
    from wikidata_to_surrealdb_spark.operators import curation

    shared = "One fine day. The cat sat down. It rained hard."
    rows = [
        (1, shared + " Unique tail one."),
        (2, shared + " Different ending two."),   # repeats the 3-span
        (3, "Totally separate. Nothing shared here. Short doc."),
        (4, "Too short. Only two."),              # no 3-sentence span
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in curation.c4_sentence_span_dedup(df).collect()}
    assert out[1].n_sentences == 4 and out[1].n_removed == 0
    # doc 2's copy of the shared span is the LATER occurrence -> stripped
    assert out[2].n_sentences == 4 and out[2].n_removed == 3
    assert out[3].n_removed == 0
    assert out[4].n_sentences == 2 and out[4].n_removed == 0


def test_observed_profile_uses_collect_metrics(spark):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators import curation

    rows = [(1, "abc", "en"), (2, None, "de"), (3, "", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.metric: r.value for r in curation.observed_profile(df).collect()}
    assert out == {
        "n_rows": 3,
        "null_text": 1,
        "empty_text": 2,   # NULL coalesces to '' and counts as empty too
        "total_chars": 3,
        "max_doc_id": 3,
    }
    # the mechanism: an observed plan carries a CollectMetrics node
    obs = Observation("x")
    plan = (
        df.observe(obs, F.count(F.lit(1)).alias("n"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "CollectMetrics" in plan
