"""Interactive serving path: the reference's HTTP ``/search`` endpoint
(``server.py:128-177``) re-expressed over the Spark engine, plus the ingest
mutation (``/append``) mirroring the reference's ``/label-images`` /
``/embed-text`` POST endpoints (``server.py:50-101``) — there the mutation
path feeds new captions/embeddings into the store; here it feeds new pages
into the index through the batch append operator.

Two layers:

- :class:`SearchSession` — the warm-path object a long-lived driver holds:
  one SparkSession + one Catalog whose driver-side metadata caches
  (stats_global, per-term df — ``catalog.py``) stay hot across requests, so
  a repeat query costs only the pruned scoring job. This is the unit the
  latency contract is written against (bench.py's single-query p50/p95).
  Its :meth:`SearchSession.append` wraps ``operators.incremental.
  append_bucket`` with HTTP-ingest bucket allocation (a dedicated id range,
  disjoint from build and streaming ranges).
- :func:`make_http_server` — a stdlib ``http.server`` wrapper exposing
  ``GET /search?q=...&k=10`` returning the reference's response shape
  ``{"query": ..., "results": [{"rank", "doc_id", "url", "bm25_score"}]}``
  and ``POST /append`` taking ``{"pages": [{"url", "html" (base64),
  "lang"}, ...]}``. The server is THREADED for /search: concurrent queries
  are independent read-only jobs, each tagged with its own FAIR scheduler
  pool (session.SPARK_CONF sets spark.scheduler.mode=FAIR) so the driver
  overlaps them instead of queueing one behind another's stages. /append
  stays strictly serialized behind a lock (the append contract —
  operators.incremental — requires it). Horizontal scale beyond one driver
  still comes from read-only replicas over the same
  immutable-between-commits index tables, with ingest on ONE writer.

No new dependencies: stdlib http only. The reference's rate-limit sleep
(``server.py:152``, sleep(4) per Gemini call) has no analogue — scoring is
local to the cluster.
"""

from __future__ import annotations

import base64
import itertools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from .catalog import Catalog
from .operators.bm25 import attach_urls, bm25_topk_naive, bm25_topk_wand

# HTTP-ingest buckets count up from here: disjoint from build buckets (small
# ints), streaming micro-batch buckets (1_000_000 + batch_id) and streaming
# compaction targets (descending below 1_000_000).
HTTP_INGEST_BUCKET_START = 2_000_000


class SearchSession:
    """Warm query session over a built index (reference ``/search`` core)."""

    def __init__(self, spark: SparkSession, warehouse: str, engine: str = "wand"):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self.engine = bm25_topk_wand if engine == "wand" else bm25_topk_naive
        self._qid_iter = itertools.count()  # atomic under the GIL
        # appends are strictly serialized (operators.incremental contract);
        # the threaded HTTP server funnels every /append through this lock
        self._append_lock = threading.Lock()

    def search(self, query_text: str, k: int = 10) -> list[dict]:
        """One query -> ranked [{rank, doc_id, url, bm25_score}, ...].

        Thread-safe and overlappable: each call tags its jobs with its own
        FAIR scheduler pool (local properties are per-Python-thread under
        PySpark's pinned-thread mode), so two clients' independent read-only
        scoring jobs round-robin on the cluster instead of head-of-line
        blocking behind each other's stages."""
        qid = next(self._qid_iter)
        # pass the batch as a plain list: the engine normalizes driver-side,
        # so no LocalTableScan collect job is spent on the query row itself
        qbatch = [(qid, query_text, int(k))]
        sc = self.spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"ir_search_{qid % 16}")
        try:
            rows = attach_urls(self.engine(self.spark, self.catalog, qbatch), self.catalog).collect()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
        return [
            {
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "url": r["url"],
                "bm25_score": float(r["bm25_score"]),
            }
            for r in sorted(rows, key=lambda r: r["rank"])
        ]

    def append(self, pages: list[dict], bucket: int | None = None, lang: str | None = "en") -> dict:
        """Ingest pages (list of {"url", "html" bytes, "lang", optional
        "warc_ts"/"text"}) as one fresh bucket — the serving-side wrapper
        over operators.incremental.append_bucket (anti-join dedup, doc-id
        continuation, bucket-scoped encode, checkpoint commit all apply).
        Returns the append metrics; queries see the new docs immediately
        (the version-keyed metadata caches invalidate on the commit).
        Serialized behind the session's append lock — concurrent HTTP
        ingest must not interleave (operators.incremental contract)."""
        from .operators.incremental import _checkpointed_buckets, append_bucket

        with self._append_lock:
            return self._append_locked(pages, bucket, lang, _checkpointed_buckets, append_bucket)

    def _append_locked(self, pages, bucket, lang, _checkpointed_buckets, append_bucket) -> dict:
        if bucket is None:
            used = [b for b in _checkpointed_buckets(self.catalog) if b >= HTTP_INGEST_BUCKET_START]
            bucket = (max(used) + 1) if used else HTTP_INGEST_BUCKET_START
        pdf = pd.DataFrame(
            {
                "url": [p["url"] for p in pages],
                "warc_ts": pd.Series(
                    [p.get("warc_ts", np.datetime64("1970-01-01T00:00:00")) for p in pages],
                    dtype="datetime64[us]",
                ),
                "html": [
                    p["html"] if isinstance(p["html"], (bytes, bytearray)) else str(p["html"]).encode()
                    for p in pages
                ],
                "text": [p.get("text", "") for p in pages],
                "lang": [p.get("lang", "en") for p in pages],
            }
        )
        df = self.spark.createDataFrame(
            pdf, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        return append_bucket(self.spark, df, self.catalog, bucket, lang=lang)


def make_http_server(
    session: SearchSession, host: str = "127.0.0.1", port: int = 8080
) -> ThreadingHTTPServer:
    """HTTP wrapper: GET /search?q=...&k=10 (reference server.py:128-177)
    and POST /append with {"pages": [{"url", "html" base64, "lang"}, ...]}
    (reference ingest mutations server.py:50-101). Threaded: /search
    requests overlap (independent read-only jobs in per-request FAIR
    pools); /append serializes inside SearchSession.append."""

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (stdlib API name)
            if urlparse(self.path).path != "/append":
                self.send_error(404, "only /append accepts POST")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                pages = payload["pages"]
                for p in pages:
                    p["html"] = base64.b64decode(p["html"])
            except (KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": f"bad /append payload: {e}"})
                return
            try:
                res = session.append(pages, bucket=payload.get("bucket"))
            except Exception as e:  # surface engine errors as 500 JSON
                self._json(500, {"error": str(e)[:500]})
                return
            self._json(200, {k: v for k, v in res.items() if isinstance(v, (int, float))})
        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            if u.path != "/search":
                self.send_error(404, "only /search is served")
                return
            qs = parse_qs(u.query)
            q = (qs.get("q") or [""])[0]
            if not q:
                self.send_error(400, "missing q parameter")
                return
            try:
                k = int((qs.get("k") or ["10"])[0])
            except ValueError:
                self.send_error(400, "k must be an int")
                return
            try:
                results = session.search(q, k=k)
            except Exception as e:  # surface engine errors as 500 JSON
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)[:500]}).encode())
                return
            body = json.dumps({"query": q, "k": k, "results": results}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet: the driver log is the log
            pass

    return ThreadingHTTPServer((host, port), Handler)
