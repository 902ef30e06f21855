"""Driver-facing query suite over /root/testdata tables.

Each query has a Spark DataFrame implementation (built-in functions only —
whole-stage-codegen'd, no Python in the plan) and a matching DuckDB oracle in
``ORACLE_SQL``. Column names/aliases match exactly; floats are rounded to 6dp
on both sides; every ORDER BY/top-k has a deterministic unique tiebreak.

Families (SURVEY.md §2 inventory -> queries):
- fulltext: tokenize/tf (A7), df/N/avgdl (A8), full BM25 top-k (T1) over
  ``documents`` — the flagship, mirroring the engine's scoring exactly
- text analysis: token counts, quality scores, language-ID heuristic,
  content fingerprints (training-data-pipeline ops)
- dedup: exact (hash groupBy), prefix-key, n-gram Jaccard, MinHash+LSH
  candidate pairs, SimHash
- similarity: brute-force cosine top-k over ``embeddings``, cosine near-dup
  pairs
- relational glue: TPC-H-ish agg/join/window/anti-join (S3, J1-J4, A1-A6, W2)

Hash parity across engines: ``hex_to_long(md5(s)[:15])`` — verified identical
between Spark ``conv(substring(md5(s),1,15),16,10)`` and DuckDB
``('0x' || substr(md5(s),1,15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1, B = 1.2, 0.75
BM25_QUERY = "key value scan"  # flagship query terms (documents vocabulary)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term, pos) — posexplode of the whitespace analyzer."""
    return (
        docs.select("doc_id", F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "term"))
        .where(F.col("term") != "")
    )


def _tok_arr(text_col: str = "text"):
    """Token ARRAY column (same analyzer as _tokens, un-exploded): lower +
    \\s+ split + drop empties. Used where per-doc set semantics help BEFORE
    the explode (array_distinct -> explode emits each (doc, term) once, so
    downstream aggs are plain counts with map-side combine). NOTE: avoid
    building per-term counters from this with higher-order filter() lambdas
    — they evaluate interpreted per element (no whole-stage codegen) and
    measured 2x slower than explode + conditional agg (OPTIMIZATION_r06.md)."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _rank_topk(df: DataFrame, k: int, *order) -> DataFrame:
    """Global top-k with a rank column, WITHOUT a single-partition window
    over the full input: orderBy().limit(k) plans TakeOrderedAndProject
    (per-partition top-k + driver merge), and only the <= k survivors get the
    row_number — over a constant partition key so WindowExec never sees an
    undefined-partition global sort (VERDICT r1 finding #2)."""
    topk = df.orderBy(*order).limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w))


# --- fulltext family ----------------------------------------------------------


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BM25 (k1=1.2,b=0.75) top-10 for a fixed query over documents
    (lang='en'), computed with built-ins only. The index-backed engine
    (operators.bm25) matches this math.

    r6 shape (guide §2.3/§2.4 — "aggregate before you shuffle"): ONE explode
    feeds ONE groupBy(doc_id) that computes dl AND each query term's tf as
    conditional-count agg columns (map-side partial agg collapses the token
    stream to <= n_docs rows per partition before the exchange). The old
    plan ran three separate groupBys over the token stream (dl, tf, df) and
    joined them back. Collection stats (n_docs, avgdl, per-term df)
    aggregate over the per-doc frame and broadcast back as one row; only
    <= 10 rows ever reach the rank window. Same math, same values (verified
    vs the DuckDB oracle at sf0.001/0.01/0.1/1.0).

    (An array-expression formulation with zero explode measured SLOWER:
    higher-order filter() lambdas evaluate interpreted per element, outside
    whole-stage codegen — see OPTIMIZATION_r06.md.)"""
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    uterms = list(dict.fromkeys(BM25_QUERY.split()))
    toks = _tokens(docs)
    per = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"tf{i}")
            for i, t in enumerate(uterms)
        ],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}") for i in range(len(uterms))],
    )
    matched = per.where(" OR ".join(f"tf{i} > 0" for i in range(len(uterms))))
    partials = [
        F.when(
            F.col(f"tf{i}") > 0,
            F.log1p((F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5))
            * (F.col(f"tf{i}") * (K1 + 1.0))
            / (F.col(f"tf{i}") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        for i in range(len(uterms))
    ]
    total = partials[0]
    for p in partials[1:]:
        total = total + p
    scored = (
        matched.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(total, 6).alias("bm25_score"))
    )
    return _rank_topk(scored, 10, F.desc("bm25_score"), F.asc("doc_id")).select(
        "rank", "doc_id", "bm25_score"
    )


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency per term, top 20 (df desc, term asc) — A8.

    r6 shape: explode array_distinct(tokens) instead of the full token
    stream + countDistinct — per-doc dedup happens scan-side in the array,
    so the aggregation is a plain count with map-side partial agg (the
    shuffle carries <= |vocab| rows per partition instead of expanding every
    (term, doc) pair through countDistinct's two-phase distinct)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    return (
        docs.select(F.explode(F.array_distinct(_tok_arr())).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def q_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, tf) posting rows for the flagship query terms — A7."""
    toks = _tokens(_t(spark, sf_dir, "documents"))
    qterms = spark.createDataFrame([(t,) for t in BM25_QUERY.split()], "term string").distinct()
    return toks.join(F.broadcast(qterms), "term").groupBy("term", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection statistics (N, avgdl) over lang='en' — A8. dl is an array
    expression on the scan (r6, guide §2.4): one agg job, zero shuffles of
    token rows (docs with zero tokens are excluded, as _tokens did)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    dl = docs.select(F.size(_tok_arr()).alias("dl")).where(F.col("dl") > 0)
    return dl.agg(F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl"))


# --- text-analysis family -------------------------------------------------------


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 50))
    return toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tokens"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of text) — P7/F2 analogue (db.py:120-122)."""
    return (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.md5(F.col("text")).alias("fp"))
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scores: token count, mean token length, stopword ratio."""
    toks = _tokens(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 200))
    sw = F.col("term").isin(STOPWORDS).cast("int")
    return toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg(F.length("term")), 6).alias("mean_tok_len"),
        F.round(F.avg(sw), 6).alias("stopword_ratio"),
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-list language-ID heuristic (en vs de marker ratios)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = _tokens(docs)
    en = F.col("term").isin(STOPWORDS).cast("int")
    de = F.col("term").isin(["der", "die", "das", "und", "nicht", "ist"]).cast("int")
    r = toks.groupBy("doc_id").agg(F.avg(en).alias("en_r"), F.avg(de).alias("de_r"))
    return r.select(
        "doc_id", F.when(F.col("en_r") >= F.col("de_r"), F.lit("en")).otherwise(F.lit("de")).alias("pred_lang")
    )


# --- dedup family ------------------------------------------------------------------


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (P7): groups sharing identical
    3-token prefixes (full-text md5 yields no dups on this synthetic set)."""
    docs = _t(spark, sf_dir, "documents")
    key = F.concat_ws(" ", F.slice(F.split(F.lower("text"), r"\s+"), 1, 3)).alias("prefix_key")
    return (
        docs.select("doc_id", key)
        .groupBy("prefix_key")
        .agg(F.count("*").cast("long").alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .where(F.col("n_docs") > 1)
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-gram shingle Jaccard near-dup pairs among doc_id<80 (threshold .08)."""
    toks = _tokens(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 80))
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        toks.withColumn("t2", F.lead("term", 1).over(w))
        .where(F.col("t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", "t2").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= 0.08)
        .select("doc_a", "doc_b", "jaccard")
    )


N_MINHASH = 8
LSH_BANDS = 4  # 2 rows per band


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 perms) + LSH (4 bands x 2 rows) candidate pairs, doc_id<150.
    shingle->minhash->band->bucket-join; hash = md5-derived 60-bit ints
    (identical in the DuckDB oracle).

    r6 shape: the 8 permutations are 8 min-agg COLUMNS over one explode of
    the per-doc distinct term array, not an 8x crossJoin row expansion + a
    (doc_id, h) shuffle; per-doc term dedup is array_distinct on the scan
    (no .distinct() exchange), and band signatures are column expressions
    over the 8 minhash columns (no collect_list groupBy). One balanced
    shuffle on doc_id replaces four."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    toks = docs.select("doc_id", F.explode(F.array_distinct(_tok_arr())).alias("term"))
    mh = toks.groupBy("doc_id").agg(
        *[
            F.min(_md5_long(F.concat_ws(":", F.lit(h), F.col("term")))).alias(f"mh{h}")
            for h in range(N_MINHASH)
        ]
    )
    rows_per_band = N_MINHASH // LSH_BANDS
    def _band_sig(b: int):
        parts = [
            F.concat_ws(":", F.lit(h), F.col(f"mh{h}"))
            for h in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        return F.md5(F.concat_ws(",", F.sort_array(F.array(*parts))))
    bands = mh.select(
        "doc_id", F.posexplode(F.array(*[_band_sig(b) for b in range(LSH_BANDS)])).alias("band", "sig")
    )
    pairs = (
        bands.alias("a")
        .join(
            F.broadcast(bands.alias("b")),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_bands"))
    )
    return pairs


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit tf-weighted SimHash per document, doc_id<100.

    Left in its original explode/crossJoin shape DELIBERATELY (r6): a
    32-agg-column rewrite (one sum per bit) measured ~2x SLOWER — 64
    when/sum expressions blow up the generated code (codegen compile cost +
    interpreted fallback) while the data here is tiny; see
    OPTIMIZATION_r06.md."""
    toks = _tokens(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 100))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("hv", _md5_long("term"))
    bits = spark.range(32).select(F.col("id").cast("int").alias("bit"))
    contrib = (
        tf.crossJoin(F.broadcast(bits))
        .withColumn(
            "delta",
            F.when(F.expr("(hv >> bit) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("delta").alias("s"))
    )
    return contrib.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0).cast("long"))).alias("simhash")
    )


# --- similarity family -----------------------------------------------------------


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 vs vec_id=0 (the ANN baseline; T1 analogue).

    r6: the query vector's norm is computed ONCE inside the broadcast row
    (same double, bitwise) instead of re-traversing the 64-wide query array
    per scanned row — one of three array aggregations per row removed."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("qn"),
    )
    joined = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
    cos = _dot(F.col("embedding"), F.col("qe")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.col("qn")
    )
    scored = joined.select("vec_id", F.round(cos, 6).alias("cosine"))
    return _rank_topk(scored, 20, F.desc("cosine"), F.asc("vec_id")).select("rank", "vec_id", "cosine")


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos > 0.3) among vec_id<100.

    r6: each side's norm is computed once per ROW before the pair join (the
    sqrt of the same dot — bitwise-identical cosine) instead of once per
    PAIR: 2 array traversals per pair removed out of 3."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        )
    )
    a, b = emb.alias("a"), F.broadcast(emb.alias("b"))
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") > 0.3)
    )


# --- relational glue (TPC-H-ish) ----------------------------------------------------


def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue top-10 customers (J4/A1).

    r6 shape (guide §2.3 "aggregate before you shuffle"): lineitem is
    pre-aggregated to one revenue row per l_orderkey BEFORE the join — the
    map-side partial agg collapses the ~4x lineitem fan-in, so the join
    exchange carries one narrow row per order instead of every lineitem
    (price+discount included). The orders side is projected to its two used
    columns. Customer stays a broadcast. Revenue = sum of per-order sums —
    same doubles summed, rounded once at the end (value-matched vs the
    oracle, which also sums in arbitrary order)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("orev")
    )
    rev = (
        per_order.join(o, per_order["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("orev"), 2).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(10)


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top event by value (W2 rank analogue), user_id<50."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup with the streaming operator (same plan runs
    under Structured Streaming with a watermark — streaming.windowed_event_counts)."""
    from .streaming import windowed_event_counts

    ev = _t(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    return out.select(
        "window_start",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total_value", 4).alias("total_value"),
    )


def q_ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidate pairs over embeddings (the near-dup scale
    path). The hyperplanes are seeded numpy literals (rng 42), so the DuckDB
    oracle replays the identical projections — full value match."""
    from .operators.ann import lsh_bucketed_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    got = lsh_bucketed_pairs(emb, n_planes=6, dim=64, threshold=0.15)
    return got.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (coarse-quantized) ANN top-10 vs vec_id=0 — the reference's
    nlist/nprobe search (vector_db.py:94) Spark-side. The gate probes ALL
    cells (nprobe = n_cells), where IVF is provably exact == brute force, so
    the DuckDB oracle is the exhaustive cosine top-k; approximation quality
    at nprobe < n_cells is gated in pytest (tests/test_ann.py recall bound)."""
    from .operators.ann import ivf_topk, train_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_cells=8, iters=2, sample=512)
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = ivf_topk(emb.where(F.col("vec_id") != 0), cents, list(q), k=10, nprobe=8)
    return got.select("id", F.round("cosine", 6).alias("cosine"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash LSH pairing (VERDICT r1 missing #4): 32-bit signatures banded
    into 4x8-bit keys; candidates sharing a band key get their exact hamming
    distance (bit_count of xor). Mirrors operators.dedup.simhash_pairs."""
    sh = q_simhash(spark, sf_dir)
    # mask (NOT %): band-0's unshifted value keeps the sign bit, and Spark's
    # % of a negative long is negative — a sign-straddling pair with equal
    # low bytes would get keys v and v-256 and silently never collide. The
    # DuckDB oracle's `& 255` was always correct; this matches it.
    band_arr = F.array(
        *[F.shiftrightunsigned("simhash", 8 * b).bitwiseAND(F.lit(255)).cast("long") for b in range(4)]
    )
    bands = sh.select("doc_id", "simhash", F.posexplode(band_arr).alias("band", "key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long").alias("hamming"),
        )
        .distinct()
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J3, reference IN-list presence check db.py:341-356):
    parts with at least one heavy lineitem, counted per brand.

    r6 shape (guide §3.1): distinct the filtered lineitem's join keys (map-
    side partial distinct — bounded by |part|) and BROADCAST them, so the
    part table is never shuffled: scan -> broadcast semi -> partial agg.
    The old plan sort-merge-joined both sides (two exchanges + sorts)."""
    p = _t(spark, sf_dir, "part")
    li_keys = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 30)
        .select("l_partkey")
        .distinct()
    )
    return (
        p.join(F.broadcast(li_keys), p["p_partkey"] == li_keys["l_partkey"], "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").cast("long").alias("n_parts"))
    )


def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source (S5, reference json.load evaluate_gemini_cap.py:49-50):
    round-trip nation through JSON files and read with an explicit schema."""
    import tempfile

    from .sources import read_json_source

    path = f"{tempfile.gettempdir()}/ir_gate_nation_json"
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    nat.write.mode("overwrite").json(path)
    return read_json_source(spark, path, "n_nationkey int, n_name string, n_regionkey int")


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/format functions (F5 path basename server.py:170, F6
    zero-pad coco_utils.py:50 + truncate server.py:86, F7 round)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return docs.select(
        "doc_id",
        F.format_string("%012d.jpg", F.col("doc_id").cast("int")).alias("padded"),
        F.substring("text", 1, 20).alias("prefix"),
        F.regexp_extract("source", r"([^/]+)$", 1).alias("basename"),
        F.round(F.col("n_chars") / 7.0, 4).alias("sevenths"),
    )


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sample (S7 done scale-portably — same rows on any
    cluster/partitioning, replayable in SQL): ~1/10 of documents."""
    from .sources import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 10).select("doc_id", "lang", "n_chars")


def _bm25_ranked(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """BM25 ranking reused by the eval queries (same math as q_bm25_topk)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    toks = _tokens(docs)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    qterms = spark.createDataFrame([(t,) for t in BM25_QUERY.split()], "term string").distinct()
    tf = toks.join(F.broadcast(qterms), "term").groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn(
            "partial",
            F.col("idf") * (F.col("tf") * (K1 + 1.0)) / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )
    return _rank_topk(scored, k, F.desc("score"), F.asc("doc_id"))


def q_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 overlap fraction between BM25 and raw-tf rankings — the
    reference's two-model top-N overlap golden (post_test_score.py:34-79)."""
    bm25 = _bm25_ranked(spark, sf_dir, k=10).select("doc_id")
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    toks = _tokens(docs)
    qterms = spark.createDataFrame([(t,) for t in BM25_QUERY.split()], "term string").distinct()
    tf_sum = toks.join(F.broadcast(qterms), "term").groupBy("doc_id").agg(F.count("*").alias("tfsum"))
    tf_rank = tf_sum.orderBy(F.desc("tfsum"), F.asc("doc_id")).limit(10).select("doc_id")
    common = bm25.join(tf_rank, "doc_id").count()
    return spark.createDataFrame([(round(common / 10.0, 6),)], "overlap double")


def q_eval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision of the BM25 top-20 against relevant = docs
    containing every query term (MAP.py:1-18 positional AP)."""
    from .operators.evaluation import average_precision

    ranked = _bm25_ranked(spark, sf_dir, k=20).select(F.lit(0).alias("query_id"), "rank", "doc_id")
    docs = _t(spark, sf_dir, "documents").where(F.col("lang") == "en")
    toks = _tokens(docs).select("doc_id", "term").distinct()
    qterms = BM25_QUERY.split()
    relevant = (
        toks.where(F.col("term").isin(qterms))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(set(qterms)))
        .select(F.lit(0).alias("query_id"), "doc_id")
    )
    ap = average_precision(ranked, relevant)
    return ap.select(F.round("ap", 6).alias("ap"))


def q_customer_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J1/J2 resume pattern): customers with no orders since 1998,
    per nation — the exact shape of the index build's checkpoint resume."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1998-01-01"))
    n = _t(spark, sf_dir, "nation")
    no = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        no.join(F.broadcast(n), no["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "term_df": q_term_df,
    "term_tf": q_term_tf,
    "doc_stats": q_doc_stats,
    "token_counts": q_token_counts,
    "fingerprint": q_fingerprint,
    "quality": q_quality,
    "langid": q_langid,
    "exact_dedup": q_exact_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "cosine_topk": q_cosine_topk,
    "embed_neardup": q_embed_neardup,
    "tpch_pricing": q_tpch_pricing,
    "top_customers": q_top_customers,
    "events_window": q_events_window,
    "events_hourly": q_events_hourly,
    "eval_overlap": q_eval_overlap,
    "eval_map": q_eval_map,
    "ann_lsh_pairs": q_ann_lsh_pairs,
    "ivf_topk": q_ivf_topk,
    "customer_no_orders": q_customer_no_orders,
    "simhash_pairs": q_simhash_pairs,
    "semi_join": q_semi_join,
    "json_source": q_json_source,
    "sample": q_sample,
    "string_funcs": q_string_funcs,
}

# --- DuckDB oracles -------------------------------------------------------------

_TOKENS_EN = """
tokens AS (
  SELECT doc_id, t.term, t.pos FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term,
                    unnest(range(1, len(regexp_split_to_array(lower(text), '\\s+')) + 1)) AS pos) t
  WHERE lang = 'en' AND t.term <> ''
)
"""

_TOKENS_ALL = _TOKENS_EN.replace("WHERE lang = 'en' AND", "WHERE")

ORACLE_SQL = {
    "bm25_topk": f"""
WITH {_TOKENS_EN},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT DISTINCT unnest(string_split('{BM25_QUERY}', ' ')) AS term),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tokens t JOIN qt USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * (1.2 + 1.0))
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))), 6) AS bm25_score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id)
SELECT CAST(row_number() OVER (ORDER BY bm25_score DESC, doc_id ASC) AS INT) AS rank, doc_id, bm25_score
FROM scored ORDER BY bm25_score DESC, doc_id ASC LIMIT 10
""",
    "term_df": f"""
WITH {_TOKENS_EN}
SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
ORDER BY df DESC, term ASC LIMIT 20
""",
    "term_tf": f"""
WITH {_TOKENS_ALL},
qt AS (SELECT DISTINCT unnest(string_split('{BM25_QUERY}', ' ')) AS term)
SELECT t.term, t.doc_id, count(*) AS tf FROM tokens t JOIN qt USING (term) GROUP BY 1, 2
""",
    "doc_stats": f"""
WITH {_TOKENS_EN},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id)
SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl
""",
    "token_counts": """
WITH tokens AS (
  SELECT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 50 AND t.term <> '')
SELECT doc_id, count(*) AS n_tokens FROM tokens GROUP BY doc_id
""",
    "fingerprint": """
SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 100
""",
    "quality": """
WITH tokens AS (
  SELECT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 200 AND t.term <> '')
SELECT doc_id, count(*) AS n_tokens,
       round(avg(length(term)), 6) AS mean_tok_len,
       round(avg(CASE WHEN term IN ('the','a','of','and','to','in','is','it','for','on') THEN 1 ELSE 0 END), 6) AS stopword_ratio
FROM tokens GROUP BY doc_id
""",
    "langid": """
WITH tokens AS (
  SELECT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 200 AND t.term <> ''),
r AS (SELECT doc_id,
        avg(CASE WHEN term IN ('the','a','of','and','to','in','is','it','for','on') THEN 1 ELSE 0 END) AS en_r,
        avg(CASE WHEN term IN ('der','die','das','und','nicht','ist') THEN 1 ELSE 0 END) AS de_r
      FROM tokens GROUP BY doc_id)
SELECT doc_id, CASE WHEN en_r >= de_r THEN 'en' ELSE 'de' END AS pred_lang FROM r
""",
    "exact_dedup": """
WITH k AS (
  SELECT doc_id, array_to_string(regexp_split_to_array(lower(text), '\\s+')[1:3], ' ') AS prefix_key
  FROM documents)
SELECT prefix_key, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM k GROUP BY prefix_key HAVING count(*) > 1
""",
    "ngram_jaccard": """
WITH tokens AS (
  SELECT doc_id, t.term, t.pos FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term,
                    unnest(range(1, len(regexp_split_to_array(lower(text), '\\s+')) + 1)) AS pos) t
  WHERE doc_id < 80 AND t.term <> ''),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           term || ' ' || lead(term, 1) OVER w AS shingle
    FROM tokens WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
  WHERE shingle IS NOT NULL),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.08
""",
    "minhash_lsh": """
WITH toks AS (
  SELECT DISTINCT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 150 AND t.term <> ''),
mh AS (
  SELECT doc_id, h,
         min(CAST(('0x' || substr(md5(h || ':' || term), 1, 15)) AS BIGINT)) AS minhash
  FROM toks CROSS JOIN (SELECT unnest(range(0, 8)) AS h)
  GROUP BY doc_id, h),
bands AS (
  SELECT doc_id, CAST(h // 2 AS INT) AS band,
         md5(string_agg(h || ':' || minhash, ',' ORDER BY h || ':' || minhash)) AS sig
  FROM mh GROUP BY doc_id, 2)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    "simhash": """
WITH toks AS (
  SELECT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 100 AND t.term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf,
              CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
       FROM toks GROUP BY doc_id, term),
contrib AS (
  SELECT doc_id, bit, sum(CASE WHEN (hv >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, 32)) AS bit)
  GROUP BY doc_id, bit)
SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id
""",
    "cosine_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
cos AS (
  SELECT vec_id, round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM pairs GROUP BY vec_id)
SELECT CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank, vec_id, cosine
FROM cos ORDER BY cosine DESC, vec_id ASC LIMIT 20
""",
    "embed_neardup": """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM e a JOIN e b ON a.vec_id < b.vec_id),
cos AS (
  SELECT vec_a, vec_b, round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM pairs GROUP BY vec_a, vec_b)
SELECT vec_a, vec_b, cosine FROM cos WHERE cosine > 0.3
""",
    "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "top_customers": """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey ASC LIMIT 10
""",
    "events_window": """
SELECT user_id, event_id, round(value, 6) AS value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
  FROM events WHERE user_id < 50)
WHERE rnk = 1
""",
    "events_hourly": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""",
    "eval_overlap": f"""
WITH {_TOKENS_EN},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT DISTINCT unnest(string_split('{BM25_QUERY}', ' ')) AS term),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tokens t JOIN qt USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
bm25 AS (
  SELECT tf.doc_id, sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s GROUP BY tf.doc_id),
bm25_top AS (SELECT doc_id FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 10),
tf_top AS (
  SELECT doc_id FROM (SELECT doc_id, sum(tf) AS tfsum FROM tf GROUP BY doc_id)
  ORDER BY tfsum DESC, doc_id ASC LIMIT 10)
SELECT round(count(*) / 10.0, 6) AS overlap FROM bm25_top JOIN tf_top USING (doc_id)
""",
    "eval_map": f"""
WITH {_TOKENS_EN},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (SELECT DISTINCT unnest(string_split('{BM25_QUERY}', ' ')) AS term),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tokens t JOIN qt USING (term) GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM (
    SELECT tf.doc_id, sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s GROUP BY tf.doc_id)
  ORDER BY rank LIMIT 20),
relevant AS (
  SELECT doc_id FROM tf GROUP BY doc_id
  HAVING count(DISTINCT term) = (SELECT count(*) FROM qt)),
hits AS (
  SELECT r.rank,
         sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           OVER (ORDER BY r.rank) AS hits_at,
         rel.doc_id IS NOT NULL AS is_rel
  FROM ranked r LEFT JOIN relevant rel USING (doc_id))
SELECT round(coalesce(sum(hits_at / rank) FILTER (WHERE is_rel), 0)
       / (SELECT count(*) FROM relevant), 6) AS ap
FROM hits
""",
    "customer_no_orders": """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01')
GROUP BY n_name
""",
    "simhash_pairs": """
WITH toks AS (
  SELECT doc_id, t.term FROM documents,
    LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term) t
  WHERE doc_id < 100 AND t.term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf,
              CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS hv
       FROM toks GROUP BY doc_id, term),
contrib AS (
  SELECT doc_id, bit, sum(CASE WHEN (hv >> bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, 32)) AS bit)
  GROUP BY doc_id, bit),
sh AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM contrib GROUP BY doc_id),
bands AS (
  SELECT doc_id, simhash, band, (simhash >> (8 * band)) & 255 AS key
  FROM sh CROSS JOIN (SELECT unnest(range(0, 4))::INT AS band))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
""",
    "semi_join": """
SELECT p_brand, count(*) AS n_parts FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 30)
GROUP BY p_brand
""",
    "json_source": """
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    "sample": """
SELECT doc_id, lang, n_chars FROM documents
WHERE CAST(('0x' || substr(md5('s7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
""",
    "string_funcs": """
SELECT doc_id,
       printf('%012d.jpg', doc_id) AS padded,
       substr(text, 1, 20) AS prefix,
       regexp_extract(source, '([^/]+)$', 1) AS basename,
       round(n_chars / 7.0, 4) AS sevenths
FROM documents WHERE doc_id < 50
""",
}


def _lsh_pairs_oracle_sql(n_planes: int = 6, dim: int = 64, threshold: float = 0.15) -> str:
    """DuckDB replay of operators.ann.lsh_bucket's seeded hyperplanes: the
    planes are rng(42) literals on both sides, so bucket ids (sign bits of
    the projections) and hence candidate pairs match exactly. The cosine is
    the unnest-sum formulation proven hash-identical in the other gates."""
    import numpy as np

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim))
    dots = [
        "list_dot_product(CAST(embedding AS DOUBLE[]), [" + ", ".join(repr(float(x)) for x in planes[j]) + "])"
        for j in range(n_planes)
    ]
    bucket = " + ".join(f"(CASE WHEN {d} > 0 THEN {1 << j} ELSE 0 END)" for j, d in enumerate(dots))
    return f"""
WITH b AS (
  SELECT vec_id AS id, embedding, ({bucket}) AS bucket
  FROM embeddings WHERE vec_id < 300),
pairs AS (
  SELECT a.id AS id_a, b2.id AS id_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b2.embedding)::DOUBLE AS y
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.id < b2.id),
cos AS (
  SELECT id_a, id_b, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c
  FROM pairs GROUP BY id_a, id_b)
SELECT id_a, id_b, round(c, 6) AS cosine FROM cos WHERE c >= {threshold}
"""


ORACLE_SQL["ann_lsh_pairs"] = _lsh_pairs_oracle_sql()

# nprobe = n_cells makes IVF exact (see q_ivf_topk docstring): the oracle is
# exhaustive cosine top-10, same tiebreak as brute_force_topk.
ORACLE_SQL["ivf_topk"] = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
cos AS (
  SELECT vec_id, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c
  FROM pairs GROUP BY vec_id)
SELECT vec_id AS id, round(c, 6) AS cosine FROM cos ORDER BY c DESC, vec_id ASC LIMIT 10
"""
