"""Inverted-index build: the engine's core job (reference K9 analogue —
``vector_db.py:33-42`` builds the IVF_FLAT index; here the "index" is a
term-range-partitioned, doc-sorted, delta-gap+varint block-max posting table).

Pipeline (SURVEY.md §3.3 target lifecycle):

  pages (Iceberg/parquet scan, lang pushdown)
    -> mapInPandas extract ON THE SCAN SIDE (shared kernel, byte-identical
       per url) — html never enters a shuffle; only the ~30-60x smaller
       extracted text moves
    -> dense doc_id assignment (coordination-free: url-only scan counts per
       fixed logical group md5(url) % P_LOGICAL -> driver prefix sums; hash
       repartition of the extracted rows by group + sorted assign.
       Deterministic on any cluster width, no sampling, no corpus persist,
       no global sort)
    -> docs table (doc_id, url, dl, text, bucket)
    -> per BUCKET (checkpointed, resumable):
         mapInPandas SPIMI run generation -> (term, doc_id, tf, dl)
         -> repartition(P, term, doc_group)  # THE big shuffle; hashing on
            (term, doc_group = doc_id >> 14) splits Zipf head terms across
            partitions at doc-group granularity — skew handling without a
            separate salt column — while keeping every (term, doc_group) run
            whole in one partition, so block boundaries are DETERMINISTIC
            (kill/resume yields bit-identical block rows) with no
            boundary-sampling pass
         -> sortWithinPartitions(term, doc_id)
         -> mapInPandas block encoder (delta-gap+varint, <=BLOCK_SIZE docs per
            block, blocks never cross fixed doc-range boundaries so query-time
            doc-group scoring is exact; per-block max_tf_norm = WAND bound)
         -> append postings (bucket-partitioned) + checkpoint row w/ metrics
    -> stats table (term df) derived from postings; global (N, avgdl) from docs

At 10^12 docs each bucket is an independent Iceberg append commit; resume
left-anti-joins pages against the checkpoint manifest exactly like the
reference's md5-presence anti-join (``db.py:324-339``), but per-partition.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BLOCK_SIZE, INDEX_FORMAT, K1, B
from ..catalog import Catalog
from ..textproc import (
    P_LOGICAL,
    bm25_tf_norm,
    doc_len_expr,
    extract_text_expr,
    extract_text_series,
    term_frequencies_batch,
    tokenize_series,
)

# Blocks never span a DOC_GROUP boundary: every posting of doc d lives in a
# block with first_doc >> DOC_GROUP_BITS == d >> DOC_GROUP_BITS, which makes
# query-time (query, doc_group) partial scoring exact (operators.bm25).
DOC_GROUP_BITS = 14

DOCS_SCHEMA = "doc_id long, url string, dl int, text string, bucket int"
RUNS_SCHEMA = "term string, doc_id long, tf int, dl int"
# max_tf_norm is the tight WAND bound for the build-time avgdl; (max_tf,
# min_dl) let the query engine derive a correct (slightly looser) bound for
# the CURRENT avgdl — tf_norm is increasing in tf and decreasing in dl, so
# tf_norm(max_tf, min_dl, avgdl_now) >= tf_norm(tf_i, dl_i, avgdl_now) for
# every posting in the block. This keeps pruning exact after incremental
# appends shift collection statistics (operators.incremental).
#
# Format v4: blocks carry NO per-posting doc lengths. A doc's dl used to be
# repeated in every term's block that contains the doc (~hundreds of copies
# for a typical web page — measured ~45% of total posting payload bytes);
# it now lives ONCE per (bucket, doc_group) in the ``doclens`` sidecar
# (DOCLENS_SCHEMA below), loaded by the decode kernels per doc-group.
POSTINGS_SCHEMA = (
    "term string, first_doc long, last_doc long, n_docs int, "
    "max_tf_norm double, max_tf int, min_dl int, "
    "docs_enc binary, tfs_enc binary"
)
# dl sidecar: one row per (bucket, doc_group) — ids_enc is the group's sorted
# doc ids as delta-gap varints (first gap absolute), dls_enc their doc
# lengths as varints, positionally aligned. Rewritten with its bucket by
# every bucket rewrite (build/append/delete/compact). Stored as plain sorted
# parquet under <root>/doclens/bucket=B even when the index tables are
# Iceberg: the decode kernels read it executor-side via pyarrow with
# (bucket, doc_group) pushdown — a point-lookup side table, not a scan input
# Catalyst ever plans over.
DOCLENS_SCHEMA = "doc_group long, ids_enc binary, dls_enc binary"
CHECKPOINT_SCHEMA = "bucket int, status string, n_docs long, n_postings long, wall_ms long, lineage string"
# sum_dl and max_doc_id make every maintenance op O(touched buckets): append/
# delete update (N, sum dl) by bucket-scoped deltas instead of re-aggregating
# the whole docs table, and max_doc_id replaces the full-corpus max(doc_id)
# job when allocating the next append's id range (deletes never lower it, so
# "id > max_doc_id" <=> "not yet reflected in stats_global" — the invariant
# crash-repair uses to decide whether orphaned docs were already counted).
# p_logical pins the doc-id assignment modulus PER INDEX (ids derive from it;
# see textproc doc-id contract), tp_n pins the term-prefix directory modulus
# (the tp layout is computed from it at build AND query time — a query under a
# different modulus would silently miss postings), and format is the on-disk
# layout version every reader checks (Catalog.global_doc_stats raises a clear
# rebuild-required error on mismatch instead of a field-not-found crash —
# ADVICE r3 #4).
GLOBAL_STATS_SCHEMA = (
    "n_docs long, avgdl double, k1 double, b double, sum_dl long, max_doc_id long, "
    "p_logical int, tp_n int, format int"
)

# Second partition dimension on postings/stats: tp = crc32(term) % tp_n.
# Directory layout bucket=B/tp=T means a k-term query prunes to <= k of the
# tp_n term-prefix directories per bucket (Catalyst PartitionFilters) instead
# of opening every bucket file — the inverted-index analogue of IVF probe-time
# partition pruning (reference vector_db.py:33-42). The driver computes the
# same crc32 prefix for the query's IN-list (zlib.crc32 == Spark crc32).
# TERM_PREFIX_PARTITIONS is only the DEFAULT for new builds: the effective
# modulus is pinned per index in stats_global (tp_n) and every reader/writer
# threads the pinned value — at 10^12 docs pass a larger tp_n to build_index
# (it bounds files-per-query at k/tp_n of the term space); 16 keeps sandbox
# file counts sane.
TERM_PREFIX_PARTITIONS = 16


def term_prefix_expr(col: str = "term", tp_n: int = TERM_PREFIX_PARTITIONS):
    return F.pmod(F.crc32(F.encode(F.col(col), "UTF-8")), F.lit(int(tp_n))).cast("int")


def term_prefix(term: str, tp_n: int = TERM_PREFIX_PARTITIONS) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % int(tp_n)


def write_stats_global(
    catalog: Catalog, n_docs: int, sum_dl: int, max_doc_id: int, p_logical: int, tp_n: int
) -> float:
    """Overwrite the single-row global stats table; returns the new avgdl."""
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    catalog.overwrite_row(
        "stats_global",
        (
            int(n_docs),
            float(avgdl),
            K1,
            B,
            int(sum_dl),
            int(max_doc_id),
            int(p_logical),
            int(tp_n),
            INDEX_FORMAT,
        ),
        GLOBAL_STATS_SCHEMA,
    )
    return avgdl


# --- Step 0: dense doc_id assignment + extraction -----------------------------


def _group_expr(p_logical: int = P_LOGICAL):
    """url_group column — must match textproc.url_group exactly."""
    return F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long") % p_logical


def assign_doc_ids(
    pages: DataFrame,
    n_buckets: int,
    num_partitions: int | None = None,
    start_id: int = 0,
    fixed_bucket: int | None = None,
    p_logical: int = P_LOGICAL,
    engine: str = "arrow",
) -> DataFrame:
    """Deterministic dense doc ids + extracted text, with NO corpus persist
    and NO sampled shuffle.

    Contract (oracle mirrors it in pure Python, textproc.url_sort_key): ids
    are dense in (url_group, url) order where url_group = md5_60bit(url) %
    P_LOGICAL — a fixed constant, so ids do not depend on cluster width.

    Three stages, all deterministic:
    1. counts per url_group — a column-pruned scan of ``url`` only -> driver
       prefix sums over P_LOGICAL rows;
    2. EXTRACT on the scan side, BEFORE any shuffle: the html payload is
       ~30-60x larger than the extracted text (real pages are 50-100 KB of
       markup for 1-2 KB of text), so extracting first means the id shuffle
       moves text, never html — at 100 TB of pages that is the difference
       between shuffling 100 TB and shuffling ~3 TB. When the parquet scan
       under-splits (tiny corpora bin-packed into few input splits), a cheap
       round-robin repartition restores kernel parallelism first — by
       construction that only happens when the corpus is small enough for
       the html shuffle to be trivial;
    3. hash-repartition the extracted rows by url_group (equal keys
       co-locate; no boundary sampling), sort (url_group, url) within
       partitions, then an Arrow-batched mapInPandas assigns
       offset[group] + position.

    Memory contract: rows of a group are contiguous within the sorted
    partition, so a group spanning Arrow batches needs only a running
    ``{group: rows_seen}`` counter carried across batches — NEVER a buffered
    frame. (Buffering the trailing partial group would hold a straggling
    group's payloads in pandas memory: at 10^9 docs a url_group is ~10^6
    docs, gigabytes per worker.) The counter dict is bounded by the number
    of groups per partition (<= P_LOGICAL).

    ``engine``: "arrow" (default) runs extraction + assignment in pandas/
    Arrow UDFs — the normative contract path. "sql" computes the SAME ids
    and the SAME text with zero Python workers: extraction via the
    whole-stage-codegen replica (textproc.extract_text_expr, proven
    byte-identical on the test battery) projected scan-side before the
    shuffle, and id assignment as offset[g] + row_number() over a
    (partitionBy g, orderBy url) window — the same hash shuffle + in-
    partition sort the arrow path performs, with identical determinism.
    """
    spark = pages.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    _t0 = time.time()
    counts = pages.select(_group_expr(p_logical).alias("g")).groupBy("g").count().collect()
    if os.environ.get("IR_TRACE") == "1":
        print(f"IR_TRACE   assign.counts_job: {time.time() - _t0:.1f}s", flush=True)
    by_g = {int(r["g"]): int(r["count"]) for r in counts}
    offsets = {}
    acc = 0
    for g in range(p_logical):
        offsets[g] = acc
        acc += by_g.get(g, 0)
    boff = spark.sparkContext.broadcast(offsets)

    src = pages.select("url", "html").withColumn("g", _group_expr(p_logical))
    if engine == "sql":
        from pyspark.sql import Window

        # decode() must REPLACE malformed UTF-8 (not ANSI-throw) to match the
        # Python kernel's errors="replace" — session.SPARK_CONF sets this, but
        # set it here too so a plain SparkSession gets a building engine
        # instead of a MALFORMED_CHARACTER_CODING crash on the first bad byte
        spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
        ext = src.select(
            "g", "url", extract_text_expr(F.col("html")).alias("text")
        ).withColumn("dl", doc_len_expr(F.col("text")))
        off_df = spark.createDataFrame(
            [(g, o) for g, o in offsets.items()], "g long, goff long"
        )
        w = Window.partitionBy("g").orderBy("url")
        assigned = (
            ext.join(F.broadcast(off_df), "g")
            .withColumn(
                "doc_id",
                (F.row_number().over(w) - 1).cast("long") + F.col("goff") + F.lit(int(start_id)),
            )
            .withColumn(
                "bucket",
                F.lit(int(fixed_bucket)).cast("int")
                if fixed_bucket is not None
                else (F.col("doc_id") % n_buckets).cast("int"),
            )
        )
        return assigned.select("doc_id", "url", "dl", "text", "bucket")
    if src.rdd.getNumPartitions() < nparts:
        src = src.repartition(nparts)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = extract_text_series(pdf["html"])
            toks = text.str.lower().str.split()
            yield pd.DataFrame(
                {
                    "g": pdf["g"].values,
                    "url": pdf["url"].values,
                    "dl": toks.map(len).astype("int32").values,
                    "text": text.values,
                }
            )

    extracted = src.mapInPandas(extract, schema="g long, url string, dl int, text string")
    parts = extracted.repartition(nparts, "g").sortWithinPartitions("g", "url")

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}  # group -> rows already assigned (this partition)
        for pdf in batches:
            if pdf.empty:
                continue
            gs = pdf["g"].values
            # position within each group run + broadcast group offset +
            # cross-batch running count for the group
            change = np.concatenate(([True], gs[1:] != gs[:-1]))
            starts = np.flatnonzero(change)
            run_id = np.cumsum(change) - 1
            pos = np.arange(gs.size, dtype=np.int64) - starts[run_id]
            run_lens = np.diff(np.append(starts, gs.size))
            base = np.empty(starts.size, dtype=np.int64)
            for i, (si, ln) in enumerate(zip(starts.tolist(), run_lens.tolist())):
                g = int(gs[si])
                prev = seen.get(g, 0)
                base[i] = start_id + boff.value[g] + prev
                seen[g] = prev + int(ln)
            doc_ids = base[run_id] + pos
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "url": pdf["url"].values,
                    "dl": pdf["dl"].values.astype("int32"),
                    "text": pdf["text"].values,
                    # round-robin: gaps inside a bucket's blocks are ~n_buckets,
                    # still one varint byte for any sane bucket count
                    "bucket": (
                        np.full(gs.size, fixed_bucket, dtype=np.int32)
                        if fixed_bucket is not None
                        else (doc_ids % n_buckets).astype("int32")
                    ),
                }
            )

    return parts.mapInPandas(assign, schema=DOCS_SCHEMA)


# --- SPIMI run generation ------------------------------------------------------


def posting_runs(docs: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """docs -> (term, doc_id, tf, dl) runs via the shared SPIMI kernel.

    min_parallelism guards against tiny-file bin-packing: a parquet scan of
    small files collapses to 1-2 input splits (openCostInBytes packing), which
    would serialize the Python kernel AND everything it feeds (persist,
    range-boundary sampling, shuffle map side). The pandas kernel costs ~100x
    more per byte than a JVM scan, so a cheap row shuffle to restore
    parallelism always pays for itself when the scan under-splits.
    """
    src = docs.select("doc_id", "text")
    if min_parallelism and src.rdd.getNumPartitions() < min_parallelism:
        src = src.repartition(min_parallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield term_frequencies_batch(pdf["doc_id"], pdf["text"])

    return src.mapInPandas(gen, schema=RUNS_SCHEMA)


def posting_runs_sql(docs: DataFrame) -> DataFrame:
    """JVM run generation: the same (term, doc_id, tf, dl) rows as
    :func:`posting_runs` with zero Python workers — explode the analyzer
    (lower + single-space split of the collapsed text) and count (doc, term)
    pairs with a hash aggregate (partial map-side combine, so the shuffle
    carries ~unique pairs, the same volume the pandas kernel emits).

    Analyzer parity: extracted text is single-space collapsed and trimmed,
    so splitting on one space IS Python's str.split(); empty text explodes
    to one "" token which is filtered (str.split() of "" is []).

    NOTE: the build pipeline does not call this + a separate repartition any
    more (that was TWO shuffles of the posting volume); see
    :func:`sorted_posting_runs_sql`. Kept for callers that want plain runs."""
    toks = docs.select(
        "doc_id",
        "dl",
        F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("term"),
    ).where(F.col("term") != "")
    return (
        toks.groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "doc_id", "tf", F.col("dl").cast("int").alias("dl"))
    )


def sorted_posting_runs_sql(docs: DataFrame, nparts: int) -> DataFrame:
    """All-JVM (term, doc_id)-sorted posting runs in ONE shuffle (r6,
    guide §2.4 "remove shuffles outright").

    The old sql pipeline paid two full shuffles of the posting volume:
    groupBy(term, doc_id, dl) exchanged ~unique pairs to aggregate tf, then
    ``repartition(nparts, term, doc_group)`` exchanged them AGAIN into the
    encoder's layout. Here the exploded token stream is hash-repartitioned
    straight into the encoder's (term, doc_group) layout and the tf
    aggregate runs ON that partitioning: HashPartitioning(term, doc_group)
    satisfies the aggregate's ClusteredDistribution(term, doc_group, doc_id,
    dl) because doc_group is a function of doc_id and the partitioning keys
    are a subset of the grouping keys — Catalyst plans NO second exchange
    (asserted in tests/test_sql_engine.py). Same rows, same layout, same
    blocks as before — one exchange instead of two."""
    toks = (
        docs.select(
            "doc_id",
            "dl",
            F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("term"),
        )
        .where(F.col("term") != "")
        .withColumn("doc_group", F.shiftright(F.col("doc_id"), DOC_GROUP_BITS))
    )
    return (
        toks.repartition(nparts, "term", "doc_group")
        .groupBy("term", "doc_group", "doc_id", "dl")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "doc_id", "tf", F.col("dl").cast("int").alias("dl"))
        .sortWithinPartitions("term", "doc_id")
    )


# --- Block encoder --------------------------------------------------------------


def _encode_partition_frame(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """(term, doc_id)-sorted posting rows -> block rows, fully vectorized.

    Block boundaries: a new block at every term change, every doc-group
    change, and every BLOCK_SIZE postings within a (term, doc_group) segment.
    One varint pass encodes ALL blocks' gaps/tfs/dls, split by byte offsets —
    per-block Python calls would dominate on web text, where half the
    vocabulary are unique single-document tokens (measured 20-30x).
    """
    from ..codec import segmented_varint_encode

    terms = pdf["term"].values
    d = pdf["doc_id"].values.astype(np.int64)
    tf = pdf["tf"].values.astype(np.int64)
    dl = pdf["dl"].values.astype(np.int64)
    n = d.size
    groups = d >> DOC_GROUP_BITS
    seg_change = np.concatenate(
        ([True], (terms[1:] != terms[:-1]) | (groups[1:] != groups[:-1]))
    )
    seg_starts_pos = np.flatnonzero(seg_change)
    seg_id = np.cumsum(seg_change) - 1
    off_in_seg = np.arange(n, dtype=np.int64) - seg_starts_pos[seg_id]
    block_start = seg_change | (off_in_seg % BLOCK_SIZE == 0)
    bstarts = np.flatnonzero(block_start)
    bends = np.append(bstarts[1:], n)

    tf_norm = bm25_tf_norm(tf, dl, avgdl, K1, B)
    gaps = d.copy()
    gaps[1:] -= d[:-1]
    gaps[bstarts] = d[bstarts]

    return pd.DataFrame(
        {
            "term": terms[bstarts],
            "first_doc": d[bstarts],
            "last_doc": d[bends - 1],
            "n_docs": (bends - bstarts).astype("int32"),
            "max_tf_norm": np.maximum.reduceat(tf_norm, bstarts),
            "max_tf": np.maximum.reduceat(tf, bstarts).astype("int32"),
            "min_dl": np.minimum.reduceat(dl, bstarts).astype("int32"),
            "docs_enc": segmented_varint_encode(gaps.astype(np.uint64), bstarts, bends),
            "tfs_enc": segmented_varint_encode(tf.astype(np.uint64), bstarts, bends),
        }
    )


def encode_blocks(runs_sorted: DataFrame, avgdl: float) -> DataFrame:
    """Sorted (term, doc_id) runs -> compressed block rows.

    mapInPandas with cross-batch buffering: a term's run may span Arrow
    batches within a partition; the trailing partial term is held until the
    next batch (terms may also span *partitions* — that is fine: doc ranges
    are disjoint, so the query engines just see multiple block sequences).
    """

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tail: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame, keep_tail: bool):
            nonlocal tail
            if pdf.empty:
                return None
            terms = pdf["term"].values
            if keep_tail:
                last = terms[-1]
                cut = np.searchsorted(terms, last, side="left")
                if cut == 0:  # whole batch is one term: keep buffering
                    tail = pdf
                    return None
                tail = pdf.iloc[cut:]
                pdf = pdf.iloc[:cut]
            else:
                tail = None
            return _encode_partition_frame(pdf, avgdl)

        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            res = flush(pdf, keep_tail=True)
            if res is not None and not res.empty:
                yield res
        if tail is not None:
            res = flush(tail.reset_index(drop=True), keep_tail=False)
            if res is not None and not res.empty:
                yield res

    return runs_sorted.mapInPandas(enc, schema=POSTINGS_SCHEMA)


# --- The build job ---------------------------------------------------------------


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    catalog: Catalog,
    *,
    lang: str | None = "en",
    n_buckets: int = 4,
    num_term_partitions: int | None = None,
    resume: bool = False,
    p_logical: int | None = None,
    tp_n: int | None = None,
    engine: str = "arrow",
    bucket_concurrency: int = 1,
) -> dict:
    """Build (or resume) the full index. Returns build metrics.

    Resumability contract (north rule): each bucket's postings append is
    followed by a checkpoint row; on resume, buckets present in the manifest
    are skipped (left-anti semantics) and partially-written buckets are
    discarded and rebuilt. Kill at any point -> identical final index.

    ``p_logical`` (default textproc.P_LOGICAL) is the doc-id assignment
    modulus — an index-format parameter recorded in stats_global and every
    checkpoint lineage row. Doc ids derive from it, so a resume under a
    DIFFERENT value is refused (the rebuilt buckets would renumber documents
    relative to the already-committed ones). Sizing at scale: see the doc-id
    contract in textproc (group ~= <=512 MB of extracted text).

    ``tp_n`` (default TERM_PREFIX_PARTITIONS) is the term-prefix directory
    modulus — the second pinned format parameter. The query engines read the
    recorded value from the catalog (never the module constant), so an index
    built with a different tp_n stays queryable; a resume under a different
    value is refused for the same reason as p_logical (already-committed
    buckets' tp directories were laid out under the pinned modulus).

    ``engine``: "arrow" (default) — extraction/tokenization in vectorized
    pandas UDFs, the input-hint contract path. "sql" — the whole pipeline up
    to block encoding runs JVM-side (extract_text_expr + posting_runs_sql +
    window id assignment): identical output index, proven bit-identical in
    tests/test_sql_engine.py EXCEPT for one documented input class —
    UTF-8-encoded surrogate byte sequences (ED A0-BF 80-BF), where Java's
    decoder emits one U+FFFD per 3-byte sequence and Python's one per byte
    (pinned in test_extract_expr_surrogate_bytes_known_divergence) — with
    only the block encoder left in Python.
    Prefer "sql" where Python-worker throughput is the bottleneck — built-in
    expressions are the fast path, UDFs the slow one.

    ``bucket_concurrency``: how many bucket pipelines run concurrently from
    driver threads (default 1 = serial). 2-3 overlaps each bucket's fixed
    driver/commit tail with the next bucket's compute without multiplying
    executor-side resource use (task slots bound total concurrency); the
    kill/resume contract is unchanged (see the in-function comment).
    """
    t_start = time.time()
    trace = os.environ.get("IR_TRACE") == "1"
    t_last = [t_start]

    def _tr(step: str) -> None:
        if trace:
            now = time.time()
            print(f"IR_TRACE {step}: {now - t_last[0]:.1f}s", flush=True)
            t_last[0] = now

    nparts = num_term_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if lang is not None:
        pages = pages.where(F.col("lang") == lang)
    # only url+html survive to the id-assignment shuffle/persist (the input
    # text column is never read: extraction owns the text)
    pages = pages.select("url", "html")

    done: set[int] = set()
    if resume and catalog.exists("checkpoints"):
        done = {r["bucket"] for r in catalog.read("checkpoints").select("bucket").distinct().collect()}
        if catalog.exists("stats_global"):
            pinned = catalog.p_logical()
            if p_logical is not None and int(p_logical) != pinned:
                raise ValueError(
                    f"p_logical mismatch: index was built with {pinned}, resume "
                    f"requested {p_logical} — doc ids derive from p_logical, so "
                    "a mixed-modulus index would renumber documents; rebuild "
                    "from scratch to change it"
                )
            p_logical = pinned
            pinned_tp = catalog.tp_n()
            if tp_n is not None and int(tp_n) != pinned_tp:
                raise ValueError(
                    f"tp_n mismatch: index was built with term-prefix modulus "
                    f"{pinned_tp}, resume requested {tp_n} — already-committed "
                    "buckets laid out their tp directories under the pinned "
                    "modulus, so a mixed-modulus index would silently miss "
                    "postings at query time; rebuild from scratch to change it"
                )
            tp_n = pinned_tp
    else:
        for t in ("docs", "postings", "checkpoints", "stats", "stats_global", "doclens", "blooms"):
            catalog.drop(t)
    if p_logical is None:
        p_logical = P_LOGICAL
    if tp_n is None:
        tp_n = TERM_PREFIX_PARTITIONS

    # Step 0: docs (itself checkpoint #-1: reused verbatim on resume so doc
    # ids are stable across kill/restart). Extraction runs ONCE — into the
    # docs parquet write — and every downstream consumer reads that table
    # back column-pruned (r6: the old .persist() paid a 4-6 s in-memory
    # columnar cache fill to save re-reads that parquet serves for <1 s:
    # the bucket pipelines prune to their bucket=N directory, the stats agg
    # reads only (bucket, dl, doc_id), bloom only url).
    if not (resume and catalog.exists("docs")):
        docs = assign_doc_ids(
            pages, n_buckets=n_buckets, num_partitions=nparts, p_logical=p_logical, engine=engine
        )
        # directory-partition by bucket (each of the nparts tasks writes one
        # file per bucket): bucket-filtered reads prune directories AND keep
        # full file-level parallelism — never repartition(n, "bucket"), which
        # collapses to n_buckets live partitions
        catalog.write(docs, "docs", partition_by=["bucket"])
        _tr("docs_assign_write")
    docs = catalog.read("docs")

    # one job yields global AND per-bucket stats (avoids a per-bucket agg job
    # later — every extra action costs a full job round-trip)
    brows = docs.groupBy("bucket").agg(
        F.count("*").alias("nd"), F.sum("dl").alias("toks"), F.max("doc_id").alias("mx")
    ).collect()
    per_bucket = {int(r["bucket"]): (int(r["nd"]), int(r["toks"] or 0)) for r in brows}
    n_docs = sum(nd for nd, _ in per_bucket.values())
    total_toks = sum(tk for _, tk in per_bucket.values())
    max_doc_id = max((int(r["mx"]) for r in brows if r["mx"] is not None), default=-1)
    avgdl = write_stats_global(catalog, n_docs, total_toks, max_doc_id, p_logical, tp_n)
    _tr("global_stats")

    metrics = {"n_docs": n_docs, "avgdl": avgdl, "buckets": {}}
    for b in range(n_buckets):
        if b in done:
            metrics["buckets"][b] = "resumed"
    todo = [b for b in range(n_buckets) if b not in done]
    # The checkpoint manifest is the ONE shared sink bucket pipelines append
    # to; concurrent parquet appends to a single directory can collide on the
    # writer's _temporary staging dir, so manifest commits serialize here.
    # Everything else a pipeline writes is bucket-disjoint (postings=/stats=/
    # doclens=/blooms= bucket=B directories).
    ck_lock = threading.Lock()

    def _build_bucket(b: int) -> None:
        t0 = time.time()
        # partial files from a killed run of this bucket are discarded by the
        # mode("overwrite") bucket-directory writes in write_bucket
        bucket_docs = docs.where(F.col("bucket") == b)
        if engine == "sql":
            # one exchange: token stream repartitioned straight into the
            # encoder's (term, doc_group) layout, tf aggregated ON that
            # partitioning (see sorted_posting_runs_sql)
            sorted_runs = sorted_posting_runs_sql(bucket_docs, nparts)
        else:
            runs = posting_runs(bucket_docs, min_parallelism=nparts).withColumn(
                "doc_group", F.shiftright(F.col("doc_id"), DOC_GROUP_BITS)
            )
            # HASH repartition on (term, doc_group): same co-location and
            # head-term splitting as a range shuffle, but fully deterministic
            # with NO boundary-sampling pass (a range shuffle would re-execute
            # — or force caching of — the whole SPIMI kernel just to sample
            # boundaries). Term-lookup pruning is preserved: each output file
            # is sorted by (term, doc_id), so parquet row-group min/max stats
            # stay selective.
            sorted_runs = (
                runs.repartition(nparts, "term", "doc_group")
                .sortWithinPartitions("term", "doc_id")
                .drop("doc_group")
            )
        blocks = encode_blocks(sorted_runs, avgdl)
        write_bucket(
            catalog, blocks, bucket_docs, b, nparts, n_keys=per_bucket.get(b, (0, 0))[0], tp_n=tp_n
        )
        _tr(f"bucket{b}_postings_stats")
        nd, toks = per_bucket.get(b, (0, 0))
        wall_ms = int((time.time() - t0) * 1000)
        lineage = json.dumps(
            {
                "job": "build_index",
                "bucket": b,
                "n_term_partitions": nparts,
                "avgdl": avgdl,
                "k1": K1,
                "b": B,
                "p_logical": int(p_logical),
                "tp_n": int(tp_n),
                "format": INDEX_FORMAT,
            }
        )
        with ck_lock:
            catalog.append_row(
                "checkpoints", (b, "done", nd, toks, wall_ms, lineage), CHECKPOINT_SCHEMA
            )
        _tr(f"bucket{b}_checkpoint")
        metrics["buckets"][b] = {"docs": nd, "wall_ms": wall_ms}

    if bucket_concurrency <= 1 or len(todo) <= 1:
        for b in todo:
            _build_bucket(b)
    else:
        # Overlap bucket pipelines from driver threads (VERDICT r4
        # what's-wrong #5): each bucket's commit tail is fixed driver/commit
        # round-trips during which the executors idle — at production bucket
        # counts that serial floor is the build's width-independent wall.
        # Spark's scheduler accepts jobs from multiple driver threads; a
        # distinct FAIR pool per pipeline keeps one bucket's long shuffle
        # from starving another's small commit jobs (pools round-robin under
        # spark.scheduler.mode=FAIR, session.SPARK_CONF). Checkpoint
        # atomicity is unchanged: each bucket still commits data BEFORE its
        # manifest row, so a crash leaves some buckets checkpointed and the
        # rest rebuildable by resume — exactly the serial failure model.
        from concurrent.futures import ThreadPoolExecutor

        def _in_pool(b: int) -> None:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"ir_bucket_{b}")
            try:
                _build_bucket(b)
            finally:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

        with ThreadPoolExecutor(max_workers=int(bucket_concurrency)) as ex:
            futs = {ex.submit(_in_pool, b): b for b in todo}
            errs = [(futs[f], f.exception()) for f in futs]
            for b, e in sorted(errs):
                if e is not None:
                    raise e

    metrics["wall_s"] = time.time() - t_start
    return metrics


def write_bucket_postings(
    catalog: Catalog,
    blocks: DataFrame,
    bucket: int,
    nparts: int,
    tp_n: int = TERM_PREFIX_PARTITIONS,
) -> None:
    """Persist ONE bucket's block rows plus its derived per-term df stats.

    The bucket DIRECTORY is the atomic commit/rewrite unit: blocks land under
    ``postings/bucket=B/tp=T`` (term-prefix subdirectories, see
    TERM_PREFIX_PARTITIONS) via an overwrite of that bucket's directory only —
    bucket writes never share a ``_temporary`` staging dir (safe to overlap)
    and delete/compact swap whole directories. ``stats`` follows the same
    layout with rows (term, df); readers aggregate ``sum(df)`` over their
    (tiny, IN-list + tp-pruned) term set.

    ``blocks`` is persisted for the duration so the stats rows aggregate from
    the in-memory frame instead of re-reading the just-written parquet — one
    fewer full bucket scan per commit. Explicit (tp, term) within-partition
    sorts keep per-file term runs contiguous for parquet row-group min/max
    pruning (the dynamic-partition writer only guarantees clustering by tp).
    """
    blocks = blocks.withColumn("tp", term_prefix_expr(tp_n=tp_n)).persist()
    try:
        _write_postings_rows(catalog, blocks, bucket, tp_n)
        _write_bucket_stats(catalog, blocks, bucket, nparts, tp_n)
    finally:
        blocks.unpersist()
        catalog.invalidate_reads()  # direct parquet writes bypass Catalog.write


def _write_postings_rows(
    catalog: Catalog, blocks: DataFrame, bucket: int, tp_n: int = TERM_PREFIX_PARTITIONS
) -> None:
    # Cluster by tp BEFORE the dynamic-partition write (r6, guide §6 small
    # files): from the encoder's (term, doc_group) layout every task holds
    # every tp, so the writer emitted nparts x tp_n tiny files per bucket
    # (512 at sandbox defaults — measured ~6 s/bucket of pure writer
    # overhead, and every query paid the file-open/listing cost back). One
    # cheap shuffle of the compressed block rows -> one file per tp dir;
    # per-file (term, first_doc) sort keeps row-group min/max pruning.
    out = blocks.repartition(int(tp_n), "tp").sortWithinPartitions("tp", "term", "first_doc")
    if catalog.use_iceberg:
        catalog.append(out.withColumn("bucket", F.lit(bucket)), "postings")
    else:
        out.write.mode("overwrite").partitionBy("tp").parquet(
            os.path.join(catalog.path("postings"), f"bucket={bucket}")
        )


def _write_bucket_stats(
    catalog: Catalog, blocks: DataFrame, bucket: int, nparts: int, tp_n: int = TERM_PREFIX_PARTITIONS
) -> None:
    bstats = (
        blocks.groupBy("term")
        .agg(F.sum("n_docs").cast("long").alias("df"))
        .withColumn("tp", term_prefix_expr(tp_n=tp_n))
        # cluster by tp so each tp dir gets ONE file (was coalesce(nparts/4)
        # -> nparts/4 x tp_n files; the term_dfs IN-list lookup opens fewer)
        .repartition(int(tp_n), "tp")
        .sortWithinPartitions("tp", "term")
    )
    if catalog.use_iceberg:
        catalog.append(bstats.withColumn("bucket", F.lit(bucket)), "stats")
    else:
        bstats.write.mode("overwrite").partitionBy("tp").parquet(
            os.path.join(catalog.path("stats"), f"bucket={bucket}")
        )


def write_bucket(
    catalog: Catalog,
    blocks: DataFrame,
    bucket_docs: DataFrame,
    bucket: int,
    nparts: int,
    n_keys: int | None = None,
    tp_n: int = TERM_PREFIX_PARTITIONS,
) -> None:
    """Full bucket commit: postings first (the one big job — it also
    materializes the ``blocks`` cache), then the three independent sidecars
    — per-term df stats (from the persisted blocks), the doclens array and
    the url bloom (both from ``bucket_docs``) — submitted CONCURRENTLY from
    driver threads. Spark's scheduler accepts jobs from multiple driver
    threads; each sidecar is a small job whose cost at cluster scale is
    dominated by its fixed driver round-trip while the executors idle, so
    overlapping them shortens every bucket commit's serial tail (there is
    one commit per bucket: at production bucket counts the tail is pure
    serial floor). The writes touch four disjoint directories/tables
    (postings=, stats=, doclens=, blooms=bucket=B), so no two jobs share a
    ``_temporary`` staging dir. Failure of any sidecar propagates after all
    three finish (no partially-awaited commit)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..blooms import write_bucket_bloom

    trace = os.environ.get("IR_TRACE") == "1"
    spark = catalog.spark

    def _timed(name, fn, *args):
        # Each sidecar runs in its OWN scheduler pool (r6): pools round-robin
        # under FAIR mode but are FIFO *within* — with all three sidecars in
        # the bucket's pool they serialized behind each other (measured: the
        # last-submitted bloom job's wall was the SUM of the three sidecars
        # whenever the cluster had free slots). A per-(bucket, sidecar) pool
        # lets the three small jobs overlap; total work is unchanged.
        prev = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"ir_sc_{bucket}_{name}")
        t0 = time.time()
        try:
            return fn(*args)
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", prev)
            if trace:
                print(f"IR_TRACE   wb{bucket}.{name}: {time.time() - t0:.1f}s", flush=True)

    blocks = blocks.withColumn("tp", term_prefix_expr(tp_n=tp_n)).persist()
    try:
        _timed("postings", _write_postings_rows, catalog, blocks, bucket, tp_n)
        with ThreadPoolExecutor(max_workers=3) as ex:
            futs = [
                ex.submit(_timed, "stats", _write_bucket_stats, catalog, blocks, bucket, nparts, tp_n),
                ex.submit(_timed, "doclens", write_bucket_doclens, catalog, bucket_docs, bucket),
                ex.submit(_timed, "bloom", write_bucket_bloom, catalog, bucket_docs, bucket, n_keys),
            ]
            errs = [f.exception() for f in futs]
            for e in errs:
                if e is not None:
                    raise e
    finally:
        blocks.unpersist()
        catalog.invalidate_reads()  # direct parquet writes bypass Catalog.write


def write_bucket_doclens(catalog: Catalog, bucket_docs: DataFrame, bucket: int) -> None:
    """Persist ONE bucket's dl sidecar (DOCLENS_SCHEMA): per doc_group, the
    sorted doc ids (delta-gap varint) and their doc lengths (varint).

    Rewritten as part of every bucket rewrite, next to the bucket's postings.
    Storage is O(docs) instead of the old O(postings) per-posting dls_enc —
    a doc's dl was repeated once per distinct term in the doc (~45% of
    posting payload bytes on the fixture corpus). One overwrite of
    doclens/bucket=B; deliberately plain parquet in BOTH catalog modes (see
    DOCLENS_SCHEMA comment), sorted by doc_group for row-group min/max
    pruning by the kernels' pyarrow point reads.
    """
    from ..codec import varint_encode

    src = bucket_docs.select(
        F.shiftright(F.col("doc_id"), DOC_GROUP_BITS).alias("doc_group"), "doc_id", "dl"
    )

    def enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(np.int64)
        gaps = ids.copy()
        gaps[1:] -= ids[:-1]
        return pd.DataFrame(
            {
                "doc_group": [int(key[0])],
                "ids_enc": [varint_encode(gaps.astype(np.uint64))],
                "dls_enc": [varint_encode(pdf["dl"].to_numpy(np.uint64))],
            }
        )

    out = (
        src.groupBy("doc_group")
        .applyInPandas(enc, schema=DOCLENS_SCHEMA)
        .sortWithinPartitions("doc_group")
    )
    out.write.mode("overwrite").parquet(os.path.join(catalog.path("doclens"), f"bucket={bucket}"))
