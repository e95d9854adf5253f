#!/usr/bin/env python
"""Full-catalog adversarial parity sweep: run EVERY oracle-paired
catalog query on an injected copy of a testdata sf dir, Spark vs
DuckDB, and report disagreements.

The committed suites (tests/test_{null,unicode,numeric}_parity.py) pin
fixed subsets so regressions fail fast in CI; this tool is the
discovery half of the program — all 166 queries against any variant:

    python tools/adversarial_probe.py --variant null
    python tools/adversarial_probe.py --variant unicode --sf-dir /root/testdata/sf0.01
    python tools/adversarial_probe.py --variant numeric
    python tools/adversarial_probe.py --variant clean   # baseline sanity

Variants (all deterministic — fixed id residues, so findings reproduce):
  clean    unmodified copy (baseline; any failure is a plain parity bug)
  null     NULLs into documents.text/lang/source/n_chars and
           events.event_type/value
  unicode  multi-byte text (umlauts, CJK, emoji, combining chars)
           appended/prepended to documents.text
  numeric  NaN/+Inf/-Inf/-0.0 AND 1e15 (beyond the 2^53/10^scale
           exact-grid domain) into events.value; 0 and 1e12 into
           documents.n_chars
  dupdense every document x4 (2 exact copies + 1 prefixed near-copy,
           fresh ids) — the dedup-family worst case
  longdoc  ~2/31 docs become giants: 40x pure repetition (tiny
           distinct-shingle sets) or +200 pseudo-random vocab words
           (huge distinct-shingle sets) — the per-row array-HOF and
           posting-list worst case
  hotkey   key skew (r13): ~4/5 of events land on ONE user_id (777)
           and ~3/4 of documents on one source / ~2/3 on one lang —
           giant window partitions, giant applyInPandas groups, hot
           groupBy/join keys, mass ts ties inside the hot user (any
           under-specified sort/tie-break surfaces here)
  preepoch (r15) ~1/3 of events shift 60 years into the past — every
           per-user stream MIXES pre- and post-epoch timestamps, so
           negative epoch-micros flow through sessionize gaps, as-of
           lookups, range bins, trailing-window bucketing (the r15
           floor-div fix's regime), SCD2 intervals, and date_trunc.
           Any truncate-toward-zero arithmetic or unsigned-time
           assumption surfaces here. Documents untouched.
  monokey  (r16) fully degenerate keys: every document the SAME
           text/lang/source, every event ONE user and ONE timestamp,
           every embedding ONE vector — single-bucket LSH, df == N,
           cardinality-1 keys, 100%-tie orderings, empty seed classes.
           Debut sweep found two real bugs (NB classifier prior
           overflow on an empty class; char-LM uniform fallback
           dividing by zero vocab).

  tpchnum  (r18) NaN/+Inf/-Inf/-0.0 + decimal-boundary magnitudes
           (9.5e11 / 7.5e11 / 1e15) into the TPC-H money columns
           (lineitem l_quantity/l_extendedprice/l_discount/l_tax,
           o_totalprice, p_retailprice, c_acctbal, s_acctbal) — the
           exact-DECIMAL dsum/fround machinery's loud-vs-silent cast
           asymmetry class. Documents/events/embeddings untouched.

Exit code = number of disagreeing queries (0 = full parity).
Round-8 provenance: this sweep found 10+ real cross-engine bugs the
clean driver data could never reach (see COVERAGE.md round-8 delta).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_UNI = " Ärger über naïve café straße ÇOCUK 北京 数据 🎉 Ω"

# the one text every monokey document carries (long enough for k=3
# shingles, chunking windows, and BPE merges; repeated words on purpose
# so repetition stats are non-trivial yet identical per doc)
_MONO_TEXT = (
    "the quick brown fox jumps over the lazy dog while merge vector "
    "stream pipelines shuffle data every day and the quick fox jumps "
    "again over the same lazy stream of data"
)

DOC_SQL = {
    "clean": "SELECT * FROM read_parquet('{src}/documents.parquet')",
    "null": """
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 3 THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 11 = 2 THEN NULL ELSE source END AS source,
             CASE WHEN doc_id % 19 = 7 THEN NULL ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet')""",
    "unicode": f"""
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || '{_UNI}'
                  WHEN doc_id % 7 = 5 THEN 'ÉLÈVE déjà vu ' || text
                  ELSE text END AS text,
             lang, source,
             CASE WHEN doc_id % 7 = 3 THEN length(text || '{_UNI}')
                  WHEN doc_id % 7 = 5 THEN length('ÉLÈVE déjà vu ' || text)
                  ELSE n_chars END AS n_chars
      FROM read_parquet('{{src}}/documents.parquet')""",
    "numeric": """
      SELECT doc_id, text, lang, source,
             CASE WHEN doc_id % 41 = 3 THEN 0
                  WHEN doc_id % 41 = 7 THEN 1000000000000
                  ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet')""",
    # duplicate-dense: every document gains 2 exact copies + 1 prefixed
    # near-copy under fresh ids (4x volume) — the worst case for every
    # dedup family at once: exact groups of >= 3, identical MinHash
    # signatures flooding LSH buckets, prefix-join posting lists where
    # whole groups share every (even rarest) shingle, span/containment
    # chains. Events untouched.
    "dupdense": """
      SELECT doc_id * 4 + rep AS doc_id,
             CASE WHEN rep = 3 THEN 'dup variant ' || text ELSE text END AS text,
             lang, source,
             CASE WHEN rep = 3 THEN length('dup variant ' || text)
                  ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet'),
           (SELECT unnest([0, 1, 2, 3]) AS rep)""",
    # long-document tail (r12, new axis): ~2 of every 31 docs become
    # giants — one class is the SAME text repeated 40x (pathological
    # repetition: huge token arrays collapsing to tiny distinct-shingle
    # sets; stresses rolling windows, winnowing, repetition filters,
    # substring/span dedup), the other gains 200 deterministic
    # pseudo-random vocabulary words (large DISTINCT shingle sets;
    # stresses shingle explosion, posting lists, BPE segmentation,
    # chunking). Every per-row array HOF runs on 10-40x its usual
    # input; n_chars tracks the new lengths.
    "longdoc": """
      SELECT doc_id,
             CASE WHEN doc_id % 31 = 4 THEN repeat(text || ' ', 40)
                  WHEN doc_id % 31 = 9 THEN text || ' ' || array_to_string(
                    list_transform(generate_series(1, 200),
                      i -> 'w' || ((doc_id * 7919 + i * 104729) % 9973)), ' ')
                  ELSE text END AS text,
             lang, source,
             CASE WHEN doc_id % 31 = 4 THEN length(repeat(text || ' ', 40))
                  WHEN doc_id % 31 = 9 THEN length(text || ' ' || array_to_string(
                    list_transform(generate_series(1, 200),
                      i -> 'w' || ((doc_id * 7919 + i * 104729) % 9973)), ' '))
                  ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet')""",
    # key skew (r13): the scale killer the clean data never shows. A
    # production crawl/event stream always has a dominant tenant — the
    # variant pins that shape: one hot source (3/4 of docs) and one hot
    # lang (2/3) so per-source/per-lang aggregates, stratified quotas,
    # and the (lang, min-shingle) blocking key all see one giant group.
    # Text/ids untouched — any divergence is a key-handling bug, not a
    # content effect.
    "hotkey": """
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 != 0 THEN 'en' ELSE lang END AS lang,
             CASE WHEN doc_id % 4 != 0 THEN 'hotsource' ELSE source END AS source,
             n_chars
      FROM read_parquet('{src}/documents.parquet')""",
    "preepoch": "SELECT * FROM read_parquet('{src}/documents.parquet')",
    # fully degenerate keys (r16, new axis): EVERY document carries the
    # SAME text/lang/source — the single-bucket worst case the
    # occupancy work points at, reached exactly: one LSH bucket holds
    # the whole corpus (every signature identical), df == N collapses
    # idf to 0 (BM25 goes negative-constant), every quantile input is
    # constant, every blocking key has cardinality 1, and every
    # ordering inside text/dedup families is 100% ties — any
    # under-specified tie-break or divide-by-variance surfaces here.
    # doc_id untouched, so divergence is degenerate-key handling, not
    # content.
    "monokey": f"""
      SELECT doc_id,
             '{_MONO_TEXT}' AS text,
             'xx' AS lang,
             'mono' AS source,
             CAST({len(_MONO_TEXT)} AS BIGINT) AS n_chars
      FROM read_parquet('{{src}}/documents.parquet')""",
    # micro-documents (r16): the entire corpus becomes sub-gram /
    # sub-shingle / sub-sentence texts — empty string, single char,
    # one word, two chars. Every tokenizer emits empty-or-one arrays,
    # every k-shingle set is empty, char-bigram streams vanish, BPE
    # trains on (almost) nothing, chunkers and sentence splitters get
    # inputs shorter than their windows — any length assumption,
    # 0-denominator ratio, or empty-aggregate NULL mishandling
    # surfaces here. Events/embeddings untouched.
    "microdoc": """
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN ''
                             WHEN 1 THEN 'a'
                             WHEN 2 THEN 'hi'
                             ELSE 'ok go' END AS text,
             lang, source,
             CAST(CASE doc_id % 4 WHEN 0 THEN 0
                                  WHEN 1 THEN 1
                                  WHEN 2 THEN 2
                                  ELSE 5 END AS BIGINT) AS n_chars
      FROM read_parquet('{src}/documents.parquet')""",
    # embedding stress (r17): documents untouched — see EMBED_SQL
    "vecstress": "SELECT * FROM read_parquet('{src}/documents.parquet')",
    # TPC-H numeric stress (r18): documents untouched — see TPCH_SQL
    "tpchnum": "SELECT * FROM read_parquet('{src}/documents.parquet')",
}

EVENT_SQL = {
    "clean": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "null": """
      SELECT event_id, ts, user_id,
             CASE WHEN event_id % 23 = 4 THEN NULL ELSE event_type END
               AS event_type,
             CASE WHEN event_id % 29 = 6 THEN NULL ELSE value END AS value,
             props
      FROM read_parquet('{src}/events.parquet')""",
    "unicode": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "dupdense": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "longdoc": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "numeric": """
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % 31 = 4 THEN 'nan'::DOUBLE
                  WHEN event_id % 31 = 9 THEN 'infinity'::DOUBLE
                  WHEN event_id % 31 = 14 THEN '-infinity'::DOUBLE
                  WHEN event_id % 31 = 19 THEN -0.0
                  WHEN event_id % 31 = 24 THEN 1e15
                  ELSE value END AS value,
             props
      FROM read_parquet('{src}/events.parquet')""",
    # ~4/5 of all events collapse onto user 777 (one giant sessionize/
    # asof/funnel/retention partition) and half the timestamps truncate
    # to the hour — the source data has globally unique ts, so without
    # the truncation the tie-break regime is unreachable; with it the
    # hot user holds ~60 identical-(user, ts) groups and every per-user
    # ordering needs a total tie-break to stay cross-engine
    # deterministic.
    "hotkey": """
      SELECT event_id,
             CASE WHEN event_id % 2 = 0 THEN date_trunc('hour', ts)
                  ELSE ts END AS ts,
             CASE WHEN user_id % 5 != 0 THEN 777 ELSE user_id END AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet')""",
    # pre-epoch mixture (r15): a third of all events move 60 years
    # into the past, so negative epoch-micros mix with positive ones
    # inside every per-user ordering. Ids/users/values untouched —
    # any divergence is time-arithmetic (truncate-vs-floor, unsigned
    # assumptions), not a content effect.
    "preepoch": """
      SELECT event_id,
             CASE WHEN event_id % 3 = 1 THEN ts - INTERVAL 60 YEAR
                  ELSE ts END AS ts,
             user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet')""",
    # fully degenerate keys (r16): ONE user and ONE timestamp for the
    # entire stream — every per-user ordering is 100% ties, the
    # sessionizer sees one mass-tie session, funnels can only ever
    # reach step 0 (nothing is STRICTLY after), as-of joins match at
    # the boundary everywhere, and every window/groupBy key has
    # cardinality 1. event_id/event_type/value untouched.
    "monokey": """
      SELECT event_id,
             TIMESTAMP '2024-01-15 12:00:00' AS ts,
             CAST(777 AS BIGINT) AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet')""",
    "microdoc": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "vecstress": "SELECT * FROM read_parquet('{src}/events.parquet')",
    "tpchnum": "SELECT * FROM read_parquet('{src}/events.parquet')",
}

# the monokey axis also rewrites EMBEDDINGS: every vector becomes the
# corpus's vec_id-min vector (labels kept), so every pairwise cosine is
# exactly 1.0, sign-LSH puts the whole corpus in ONE bucket per band,
# and every top-k / rank / neighbor choice is decided purely by the
# documented id tie-breaks. Other variants copy embeddings verbatim.
EMBED_SQL = {
    "monokey": """
      SELECT e.vec_id,
             (SELECT embedding FROM read_parquet('{src}/embeddings.parquet')
              ORDER BY vec_id LIMIT 1) AS embedding,
             e.label
      FROM read_parquet('{src}/embeddings.parquet') e""",
    # embedding stress (r17, eleventh axis): the one table the first
    # ten axes never dirty beyond monokey's single-vector collapse.
    # Four deterministic residue classes: ZERO vectors (norm 0 — every
    # cosine becomes a division by zero, where the engines genuinely
    # disagree: Spark doubles give IEEE NaN/Inf, DuckDB doubles give
    # NULL, numpy GEMM gives NaN that then fails >= threshold), a NaN
    # component, a +Inf component (one poisoned coordinate propagating
    # through every dot product, norm, and quantizer), and NULL
    # embeddings (the realistic missing-row case). Dims stay correct:
    # fixed dimensionality is a schema contract, mixed-dim input is
    # out of scope by design. vec_id/label untouched, so any
    # divergence is non-finite-vector handling, not content.
    "vecstress": """
      SELECT vec_id,
             CASE
               WHEN vec_id % 23 = 3 THEN
                 list_transform(embedding, x -> CAST(0.0 AS FLOAT))
               WHEN vec_id % 29 = 5 THEN
                 list_transform(embedding,
                   (x, i) -> CASE WHEN i = 1 THEN 'nan'::FLOAT ELSE x END)
               WHEN vec_id % 31 = 7 THEN
                 list_transform(embedding,
                   (x, i) -> CASE WHEN i = 1 THEN 'infinity'::FLOAT ELSE x END)
               WHEN vec_id % 37 = 11 THEN NULL
               ELSE embedding
             END AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet')""",
}

# documented oracle-scope exceptions per variant (the operator is right;
# the oracle is inexpressible in DuckDB 1.0 — see the query's catalog doc)
KNOWN_SCOPE = {
    "unicode": {"mm_frame_sample"},  # md5 over a byte slice splitting a codepoint
}


# the preepoch axis also rewrites ORDERS (cohort/SCD2/CDC period
# arithmetic runs on o_orderdate): same residue, same 60-year shift.
# Other variants copy orders verbatim.
ORDER_SQL = {
    "preepoch": """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             CASE WHEN o_orderkey % 3 = 1
                  THEN o_orderdate - INTERVAL 60 YEAR
                  ELSE o_orderdate END AS o_orderdate,
             o_orderpriority
      FROM read_parquet('{src}/orders.parquet')""",
}


# TPC-H numeric stress (r18, twelfth axis): the r8 numeric program
# dirtied events.value/documents.n_chars but never the TPC-H monetary
# columns, whose ~25 queries run the exact-DECIMAL dsum/fround
# machinery — the same loud-vs-silent cast asymmetry class vecstress
# found on the scaled-int grid (DuckDB refuses a non-representable
# DECIMAL cast loudly; non-ANSI Spark NULLs it silently). Four
# non-finite classes (NaN / +Inf / -Inf / -0.0) plus a LARGE-FINITE
# magnitude per money table: 9.5e11 in l_extendedprice is representable
# in the scale-2 DECIMAL(18,2) sums but NOT at the revenue/charge
# scales 6/8 (limits 1e12 / 1e10), so one residue class walks the
# representability boundary inside a single query. Join/group keys and
# dates untouched — any divergence is money-column handling, not
# structure. Deterministic residues on the table keys; lineitem keys on
# l_orderkey*7 + l_linenumber so all seven line numbers of an order
# don't land in one class.
_LI_K = "(l_orderkey * 7 + l_linenumber)"
TPCH_SQL = {
    "tpchnum": {
        "lineitem": f"""
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             CASE WHEN {_LI_K} % 43 = 5 THEN 'nan'::DOUBLE
                  WHEN {_LI_K} % 43 = 9 THEN 'infinity'::DOUBLE
                  WHEN {_LI_K} % 43 = 23 THEN -0.0
                  WHEN {_LI_K} % 43 = 31 THEN 1e15
                  ELSE l_quantity END AS l_quantity,
             CASE WHEN {_LI_K} % 41 = 3 THEN 'nan'::DOUBLE
                  WHEN {_LI_K} % 41 = 7 THEN 'infinity'::DOUBLE
                  WHEN {_LI_K} % 41 = 11 THEN '-infinity'::DOUBLE
                  WHEN {_LI_K} % 41 = 13 THEN -0.0
                  WHEN {_LI_K} % 41 = 17 THEN 9.5e11
                  ELSE l_extendedprice END AS l_extendedprice,
             CASE WHEN {_LI_K} % 37 = 5 THEN 'nan'::DOUBLE
                  WHEN {_LI_K} % 37 = 11 THEN 'infinity'::DOUBLE
                  ELSE l_discount END AS l_discount,
             CASE WHEN {_LI_K} % 47 = 7 THEN 'nan'::DOUBLE
                  WHEN {_LI_K} % 47 = 13 THEN '-infinity'::DOUBLE
                  ELSE l_tax END AS l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{{src}}/lineitem.parquet')""",
        "orders": """
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 31 = 4 THEN 'nan'::DOUBLE
                  WHEN o_orderkey % 31 = 9 THEN 'infinity'::DOUBLE
                  WHEN o_orderkey % 31 = 14 THEN '-infinity'::DOUBLE
                  WHEN o_orderkey % 31 = 19 THEN -0.0
                  WHEN o_orderkey % 31 = 24 THEN 7.5e11
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet')""",
        "part": """
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             CASE WHEN p_partkey % 29 = 3 THEN 'nan'::DOUBLE
                  WHEN p_partkey % 29 = 8 THEN 'infinity'::DOUBLE
                  WHEN p_partkey % 29 = 13 THEN -0.0
                  ELSE p_retailprice END AS p_retailprice
      FROM read_parquet('{src}/part.parquet')""",
        "customer": """
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 29 = 4 THEN 'nan'::DOUBLE
                  WHEN c_custkey % 29 = 9 THEN '-infinity'::DOUBLE
                  WHEN c_custkey % 29 = 14 THEN -0.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM read_parquet('{src}/customer.parquet')""",
        "supplier": """
      SELECT s_suppkey, s_name, s_nationkey,
             CASE WHEN s_suppkey % 23 = 3 THEN 'nan'::DOUBLE
                  WHEN s_suppkey % 23 = 7 THEN 'infinity'::DOUBLE
                  ELSE s_acctbal END AS s_acctbal
      FROM read_parquet('{src}/supplier.parquet')""",
    },
}


def build_variant(src: str, dst: str, variant: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"COPY ({DOC_SQL[variant].format(src=src)}) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY ({EVENT_SQL[variant].format(src=src)}) "
        f"TO '{dst}/events.parquet' (FORMAT PARQUET)"
    )
    rewritten = {"documents", "events"}
    if variant in ORDER_SQL:
        con.sql(
            f"COPY ({ORDER_SQL[variant].format(src=src)}) "
            f"TO '{dst}/orders.parquet' (FORMAT PARQUET)"
        )
        rewritten.add("orders")
    if variant in EMBED_SQL:
        con.sql(
            f"COPY ({EMBED_SQL[variant].format(src=src)}) "
            f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"
        )
        rewritten.add("embeddings")
    for table, sql in TPCH_SQL.get(variant, {}).items():
        con.sql(
            f"COPY ({sql.format(src=src)}) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        rewritten.add(table)
    con.close()
    for t in TABLES:
        if t not in rewritten:
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    out = [tuple(nv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", choices=sorted(DOC_SQL), default="null"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated catalog names to probe (default: the full "
        "catalog); used for the sf0.1 heavy-query sweeps where running "
        "all ~170 oracles at 10x scale would take hours",
    )
    args = ap.parse_args()

    import duckdb

    from wikidata_to_surrealdb_spark.plans.queries import QUERIES

    tmp = tempfile.mkdtemp(prefix=f"adv_{args.variant}_")
    build_variant(args.sf_dir, tmp, args.variant)
    print(f"variant={args.variant} corpus={tmp}", flush=True)

    # oracle side first: duckdb + a live SparkSession in one process can
    # exhaust the file-descriptor limit
    only = None
    if args.queries:
        only = {n.strip() for n in args.queries.split(",") if n.strip()}
        unknown = only - set(QUERIES)
        if unknown:
            raise SystemExit(f"unknown catalog queries: {sorted(unknown)}")

    oracle_res = {}
    for name, spec in QUERIES.items():
        if only is not None and name not in only:
            continue
        if spec.oracle is None or "alias" in spec.tags:
            # alias specs share another spec's fn+oracle verbatim —
            # probing both names doubles the work for zero extra signal
            continue
        con = duckdb.connect()
        # spill guard (r10): a pathological oracle at sf0.1 spilled
        # doubling temp files until the DISK was the failure mode —
        # cap the spill (the query then errors and is recorded as
        # ORACLE_ERR, which is the finding) and keep the temp dir out
        # of the repo working tree (git add must never see it)
        con.sql(f"SET temp_directory = '{tmp}/duck_spill'")
        con.sql("SET max_temp_directory_size = '20GB'")
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet'")
        t0 = time.perf_counter()
        try:
            rel = con.sql(spec.oracle)
            oracle_res[name] = (rel.columns, rel.fetchall())
            status = "ok"
        except Exception as e:  # recorded, not fatal: the report is the point
            oracle_res[name] = ("ERR", f"{type(e).__name__}: {e}"[:200])
            status = f"ERR {type(e).__name__}"
        print(
            f"oracle {name}: {status} ({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        con.close()

    from wikidata_to_surrealdb_spark.session import get_spark

    spark = get_spark(app_name=f"adversarial_{args.variant}")
    spark.sparkContext.setLogLevel("ERROR")
    known = KNOWN_SCOPE.get(args.variant, set())
    bad = []
    for name in oracle_res:
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name].fn(spark, tmp)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            o_cols, o_rows = oracle_res[name]
            if o_cols == "ERR":
                status = f"ORACLE_ERR {o_rows}"
            elif sorted(s_cols) != sorted(o_cols):
                status = "SCHEMA_DIFF"
            elif len(s_rows) != len(o_rows):
                status = f"ROWS {len(s_rows)} vs {len(o_rows)}"
            elif normalize(s_rows, s_cols) != normalize(o_rows, o_cols):
                sn, dn = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:1]
                status = f"VALS {diff}"
            else:
                status = "PASS"
        except Exception as e:
            status = f"SPARK_ERR {type(e).__name__}: {e}"[:200]
        if status != "PASS":
            tag = " (documented oracle scope)" if name in known else ""
            print(f"DIVERGE {name}: {status}{tag}", flush=True)
            if name not in known:
                bad.append(name)
        else:
            print(
                f"spark {name}: ok ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
    print(
        f"DONE variant={args.variant} total={len(oracle_res)} "
        f"diverging={len(bad)}: {bad}"
    )
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    return len(bad)


if __name__ == "__main__":
    raise SystemExit(main())
