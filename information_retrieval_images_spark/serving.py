"""Interactive serving path: the reference's HTTP ``/search`` endpoint
(``server.py:128-177``) re-expressed over the Spark engine.

Two layers:

- :class:`SearchSession` — the warm-path object a long-lived driver holds:
  one SparkSession + one Catalog whose driver-side metadata caches
  (stats_global, per-term df — ``catalog.py``) stay hot across requests, so
  a repeat query costs only the pruned scoring job. This is the unit the
  latency contract is written against (bench.py's single-query p50/p95).
- :func:`make_http_server` — a stdlib ``http.server`` wrapper exposing
  ``GET /search?q=...&k=10`` returning the reference's response shape
  ``{"query": ..., "results": [{"rank", "doc_id", "url", "bm25_score"}]}``.
  Single-threaded by design: the Spark driver serializes query jobs anyway;
  horizontal serving scale comes from running several driver replicas
  against the same (immutable-between-commits) index tables, which the
  read-only query path supports natively.

No new dependencies: stdlib http only. The reference's rate-limit sleep
(``server.py:152``, sleep(4) per Gemini call) has no analogue — scoring is
local to the cluster.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .catalog import Catalog
from .operators.bm25 import attach_urls, bm25_topk_naive, bm25_topk_wand


class SearchSession:
    """Warm query session over a built index (reference ``/search`` core)."""

    def __init__(self, spark: SparkSession, warehouse: str, engine: str = "wand"):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self.engine = bm25_topk_wand if engine == "wand" else bm25_topk_naive
        self._next_qid = 0

    def search(self, query_text: str, k: int = 10) -> list[dict]:
        """One query -> ranked [{rank, doc_id, url, bm25_score}, ...]."""
        qid = self._next_qid
        self._next_qid += 1
        # pass the batch as a plain list: the engine normalizes driver-side,
        # so no LocalTableScan collect job is spent on the query row itself
        qbatch = [(qid, query_text, int(k))]
        rows = attach_urls(self.engine(self.spark, self.catalog, qbatch), self.catalog).collect()
        return [
            {
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "url": r["url"],
                "bm25_score": float(r["bm25_score"]),
            }
            for r in sorted(rows, key=lambda r: r["rank"])
        ]


def make_http_server(session: SearchSession, host: str = "127.0.0.1", port: int = 8080) -> HTTPServer:
    """HTTP wrapper: GET /search?q=...&k=10 (reference server.py:128-177)."""

    class Handler(BaseHTTPRequestHandler):
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

    return HTTPServer((host, port), Handler)
