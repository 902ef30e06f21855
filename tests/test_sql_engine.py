"""engine="sql" parity: the all-JVM build path (extract_text_expr +
posting_runs_sql + window id assignment) must produce the IDENTICAL index to
the arrow path — same doc ids, same text bytes, same block rows.

Why it exists: built-in expressions are Spark's fast path (whole-stage
codegen, no Python workers); the arrow path stays the normative input-hint
contract, and this suite is the proof that "sql" is a pure optimization."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from information_retrieval_images_spark import fixtures
from information_retrieval_images_spark.catalog import Catalog
from information_retrieval_images_spark.operators.index_build import (
    build_index,
    posting_runs,
    posting_runs_sql,
)
from information_retrieval_images_spark.textproc import (
    doc_len_expr,
    extract_text_expr,
    extract_text_series,
)

EDGE_HTMLS = [
    b"<p>hello &amp; goodbye</p>",
    b"<script>var x = '<div>not text</div>';</script>visible",
    b"<style>.a{color:red}</style>text<!-- comment <b>bold</b> -->tail",
    b"<SCRIPT>UPPER</SCRIPT>ok<STYLE>s</STYLE>",
    b"<script>unclosed block",
    b"<div class='a' data-x=\"<>\">inner</div>",
    b"a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &apos;a&apos; &nbsp;b",
    b"   lots \t of \n whitespace   ",
    b"<script>a<!-- </script> -->b</script>c",
    b"",
    b"plain text no tags",
    b"<script >spaced</script >x<script\ny>nl</script\n>",
    # single-pass entity semantics: &amp;lt; must NOT double-decode
    b"&amp;lt; &amp;amp; x&amp;nbsp;y",
    b"<p>unicode \xc3\xa9\xc3\xa0 &amp; \xe2\x82\xac10</p>",
    b"nbsp run a\xc2\xa0\xc2\xa0b",  # U+00A0 is Python \s — must collapse
    # --- non-ASCII / malformed-UTF-8 fuzz battery (ADVICE r4 #4): real web
    # corpora carry all of these; decode parity needs
    # spark.sql.legacy.codingErrorAction=true (session.SPARK_CONF) or the
    # JVM path THROWS instead of replacing
    b"<p>caf\xc3\xa9 na\xc3\xafve \xe6\xbc\xa2\xe5\xad\x97</p>",  # multibyte
    b"<p>bad \xff\xfe bytes</p>",  # lone invalid bytes -> U+FFFD each
    b"<p>trunc \xe6\xbc</p>",  # truncated 3-byte sequence at end
    b"<p>\xc3\x28</p>",  # invalid continuation byte
    b"\xf0\x9f\x98<p>lead-trunc</p>",  # truncated 4-byte at start
    "<p>İstanbul Iı dotted</p>".encode(),  # Turkish dotted/dotless I
    "<p>ẞ sharp-s</p>".encode(),  # capital sharp s
    "<p>sep line paranel</p>".encode(),  # Unicode separators
    b"<p>emoji \xf0\x9f\x98\x80 ok</p>",
    "<p>ZĀ́LGO á combining</p>".encode(),
    b"<script>x</script><p>\x1c\x1d\x1e\x1f seps</p>",  # 0x1C-1F: Python \s
]

# the ONE known decode divergence (textproc JVM-replica notes): UTF-8-encoded
# surrogate byte sequences — Python replaces each byte with U+FFFD, Java the
# whole 3-byte sequence with one. Pinned here so a behavior change (either
# side) is caught and the caveat stays honest.
SURROGATE_BYTES_HTML = b"<p>mix \xed\xa0\x80 surrogate-bytes</p>"


def test_extract_expr_matches_python_kernel(spark):
    want = extract_text_series(pd.Series(EDGE_HTMLS)).tolist()
    df = spark.createDataFrame([(h,) for h in EDGE_HTMLS], "html binary")
    got_rows = df.select(
        extract_text_expr(F.col("html")).alias("text")
    ).collect()
    got = [r["text"] for r in got_rows]
    assert got == want, list(zip(got, want))


def test_extract_expr_lowercase_parity(spark):
    """The analyzer lowercases downstream; Spark lower() must agree with
    Python str.lower() on the full battery (Turkish İ, ẞ, multibyte)."""
    want = [t.lower() for t in extract_text_series(pd.Series(EDGE_HTMLS))]
    df = spark.createDataFrame([(h,) for h in EDGE_HTMLS], "html binary")
    got = [
        r["t"] for r in df.select(F.lower(extract_text_expr(F.col("html"))).alias("t")).collect()
    ]
    assert got == want, list(zip(got, want))


def test_extract_expr_surrogate_bytes_known_divergence(spark):
    """Pin the ONE known decode divergence: surrogate byte sequences yield
    one U+FFFD per BYTE in Python, one per SEQUENCE in the JVM. If either
    side changes, the documented caveat must be re-evaluated."""
    py = extract_text_series(pd.Series([SURROGATE_BYTES_HTML]))[0]
    df = spark.createDataFrame([(SURROGATE_BYTES_HTML,)], "html binary")
    jv = df.select(extract_text_expr(F.col("html")).alias("t")).collect()[0]["t"]
    assert py == "mix ��� surrogate-bytes"
    assert jv == "mix � surrogate-bytes"


def test_extract_expr_matches_on_fixture_corpus(spark):
    pages = fixtures.make_pages_pandas(120)
    want = extract_text_series(pages["html"]).tolist()
    want_dl = [len(t.split()) for t in want]
    df = spark.createDataFrame(pages[["url", "html"]])
    got = (
        df.select("url", extract_text_expr(F.col("html")).alias("text"))
        .withColumn("dl", doc_len_expr(F.col("text")))
        .toPandas()
        .set_index("url")
        .loc[pages["url"]]
    )
    assert got["text"].tolist() == want
    assert got["dl"].tolist() == want_dl


def test_posting_runs_sql_matches_arrow(spark):
    pages = fixtures.make_pages_pandas(60)
    texts = extract_text_series(pages["html"])
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(pages), dtype=np.int64),
                "dl": [len(t.split()) for t in texts],
                "text": texts,
            }
        )
    )

    def norm(df):
        return (
            df.toPandas()
            .astype({"doc_id": "int64", "tf": "int64", "dl": "int64"})
            .sort_values(["term", "doc_id"])
            .reset_index(drop=True)
        )

    a = norm(posting_runs(docs.select("doc_id", "dl", "text")))
    b = norm(posting_runs_sql(docs))
    pd.testing.assert_frame_equal(a[["term", "doc_id", "tf", "dl"]], b[["term", "doc_id", "tf", "dl"]])


@pytest.mark.parametrize("n_docs", [150])
def test_sql_build_bit_identical_to_arrow(spark, tmp_path_factory, n_docs):
    pdf = fixtures.make_pages_pandas(n_docs)
    cats = {}
    for eng in ("arrow", "sql"):
        cat = Catalog(spark, str(tmp_path_factory.mktemp(f"eng_{eng}")))
        build_index(spark, spark.createDataFrame(pdf), cat, n_buckets=2, engine=eng)
        cats[eng] = cat

    def docs_frame(cat):
        return (
            cat.read("docs")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "url", "dl", "text", "bucket"]]
        )

    pd.testing.assert_frame_equal(docs_frame(cats["arrow"]), docs_frame(cats["sql"]))

    def blocks_frame(cat):
        out = cat.read("postings").toPandas()
        for c in ("docs_enc", "tfs_enc"):
            out[c] = out[c].map(bytes)
        return out.sort_values(["bucket", "term", "first_doc"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(blocks_frame(cats["arrow"]), blocks_frame(cats["sql"]))
