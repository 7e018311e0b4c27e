"""Web-archive ingestion queries: WARC record parsing and boilerplate
line-density classification.

Two capabilities a Common-Crawl-scale text pipeline needs BEFORE any of
the dedup/quality stages can run:

1. *Record extraction.* CC ships concatenated WARC records — multiple
   ``WARC/1.0`` header blocks + payloads per file. The engine must
   split a blob into records, parse the header fields (type, target
   URI, Content-Length), and VALIDATE the declared length against the
   actual body — truncated records (a routine CC defect) must be
   flagged, not silently ingested. The reference downloads one image
   per HTTP response (backend downloader ``_download_single``) and
   never faces framing; at 100 TB framing IS the scan. Everything here
   is JVM expressions — ``split`` / ``regexp_extract`` / ``length`` —
   so record extraction stays inside whole-stage codegen; no Python
   touches the byte path.

2. *Boilerplate removal.* Line-density classification in the
   Arc90-readability / jusText family: chunk a document into lines,
   score each line's stopword density and completeness, keep content
   lines. Per-doc output (content ratio, kept chars) drives the same
   keep/drop decisions as the reference's validator gates
   (reference validator/integrity.py size/validity gates) but for
   text. Pure ``transform``/``filter``/``aggregate`` higher-order
   expressions over the token array — zero UDFs, so the plan scales as
   a single narrow map stage + one groupBy.

Scale notes: the WARC query's only shuffle is the blob groupBy (in
production the blob IS the scan unit — one row per WARC file from
``binaryFile`` or a line-delimited reader — so the assemble-side
groupBy disappears and only the narrow parse remains). Boilerplate is
shuffle-free after the scan: explode + re-group on the same doc_id
key, and AQE coalesces the tiny post-explode partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []

_CRLF = "\r\n"

# Every doc_id % 17 == 0 record declares 3 bytes MORE than its body —
# the truncated-record simulation the parser must flag (len_ok=false).
_TRUNC_MOD = 17
_BLOBS = 41  # records per synthetic WARC file ≈ fixture_rows / 41


@register(
    "webtext_warc_records",
    oracle="""
    WITH src AS (
      SELECT doc_id, doc_id % 41 AS blob_id,
             CASE doc_id % 3 WHEN 0 THEN 'response'
                             WHEN 1 THEN 'metadata'
                             ELSE 'conversion' END AS rec_type,
             'https://' || source || '.example/doc/'
               || CAST(doc_id AS VARCHAR) AS uri,
             substr(text, 1, 64) AS payload
      FROM documents
    ), recs AS (
      SELECT blob_id, doc_id,
        'WARC/1.0' || chr(13) || chr(10)
          || 'WARC-Type: ' || rec_type || chr(13) || chr(10)
          || 'WARC-Target-URI: ' || uri || chr(13) || chr(10)
          || 'Content-Length: '
          || CAST(length(payload)
                  + CASE WHEN doc_id % 17 = 0 THEN 3 ELSE 0 END
                  AS VARCHAR)
          || chr(13) || chr(10) || chr(13) || chr(10)
          || payload || chr(13) || chr(10) || chr(13) || chr(10) AS rec
      FROM src
    ), blobs AS (
      SELECT blob_id, string_agg(rec, '' ORDER BY doc_id) AS blob
      FROM recs GROUP BY blob_id
    ), raw AS (
      SELECT unnest(list_filter(string_split(blob, 'WARC/1.0'),
                                x -> x <> '')) AS raw
      FROM blobs
    )
    SELECT
      CAST(regexp_extract(raw, '/doc/([0-9]+)', 1) AS BIGINT) AS doc_id,
      regexp_extract(raw, 'WARC-Type: ([^\r\n]+)', 1) AS rec_type,
      CAST(regexp_extract(raw, 'Content-Length: ([0-9]+)', 1)
           AS BIGINT) AS content_length,
      CAST(length(regexp_extract(raw, '\r\n\r\n([^\r]*)\r\n\r\n', 1))
           AS BIGINT) AS body_chars,
      length(regexp_extract(raw, '\r\n\r\n([^\r]*)\r\n\r\n', 1))
        = CAST(regexp_extract(raw, 'Content-Length: ([0-9]+)', 1)
               AS BIGINT) AS len_ok
    FROM raw
    """,
    doc="WARC/1.0 record framing round-trip: assemble multi-record "
    "blobs deterministically from documents, then split + parse "
    "headers + validate Content-Length against the actual body. "
    "Truncated records (doc_id % 17 == 0, declared 3 bytes long) "
    "must surface len_ok=false. Both engines run the FULL parse "
    "path — the oracle is not by-construction.",
)
def webtext_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    rec_type = (
        F.when(doc_id % 3 == 0, "response")
        .when(doc_id % 3 == 1, "metadata")
        .otherwise("conversion")
    )
    uri = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc/"),
        doc_id.cast("string"),
    )
    payload = F.substring("text", 1, 64)
    declared = F.length(payload) + F.when(
        doc_id % _TRUNC_MOD == 0, F.lit(3)
    ).otherwise(F.lit(0))
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: "), rec_type, F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.lit("Content-Length: "), declared.cast("string"),
        F.lit(_CRLF + _CRLF),
        payload, F.lit(_CRLF + _CRLF),
    )
    # One blob per synthetic WARC file, records concatenated in doc_id
    # order (array_sort on the (doc_id, rec) struct sorts by doc_id).
    blobs = (
        d.select((doc_id % _BLOBS).alias("blob_id"),
                 F.struct(doc_id.alias("k"), rec.alias("rec")).alias("s"))
        .groupBy("blob_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("s")),
                            lambda s: s["rec"]),
                "",
            ).alias("blob")
        )
    )
    # --- the actual capability: framing + header parse + validation ---
    raw = blobs.select(
        F.explode(
            F.filter(F.split("blob", r"WARC/1\.0"), lambda x: x != "")
        ).alias("raw")
    )
    clen = F.regexp_extract("raw", r"Content-Length: ([0-9]+)", 1).cast(
        "long"
    )
    body = F.regexp_extract("raw", "\r\n\r\n([^\r]*)\r\n\r\n", 1)
    return raw.select(
        F.regexp_extract("raw", r"/doc/([0-9]+)", 1).cast("long")
        .alias("doc_id"),
        F.regexp_extract("raw", "WARC-Type: ([^\r\n]+)", 1)
        .alias("rec_type"),
        clen.alias("content_length"),
        F.length(body).cast("long").alias("body_chars"),
        (F.length(body) == clen).alias("len_ok"),
    )


_LINE_W = 12     # tokens per pseudo-line
_STOP_MAX = 3    # content line: full width AND <= 3 stopwords
_STOPWORDS = ("the", "a")


@register(
    "text_boilerplate_density",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), lined AS (
      SELECT doc_id, toks,
             CAST(ceil(len(toks) / 12.0) AS INT) AS n_lines
      FROM t
    ), lines AS (
      SELECT doc_id, n_lines,
             unnest(list_transform(range(0, n_lines),
                                   i -> toks[1+12*i : 12*(i+1)])) AS line
      FROM lined
    ), scored AS (
      SELECT doc_id, n_lines,
             CAST(length(array_to_string(line, ' ')) AS BIGINT)
               AS line_chars,
             (len(line) = 12
              AND len(list_filter(line, w -> w IN ('the', 'a'))) <= 3)
               AS is_content
      FROM lines
    )
    SELECT doc_id,
           CAST(max(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT)
             AS content_lines,
           round(sum(CASE WHEN is_content THEN 1 ELSE 0 END) * 1.0
                 / max(n_lines), 4) AS content_ratio,
           CAST(sum(CASE WHEN is_content THEN line_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM scored GROUP BY doc_id
    """,
    doc="Arc90/jusText-family boilerplate removal: chunk each doc "
    "into 12-token pseudo-lines, classify lines by completeness + "
    "stopword density, report per-doc content ratio and kept "
    "chars. Higher-order expressions only (transform/filter/"
    "slice/aggregate) — no UDF; one narrow map + one groupBy on "
    "the scan key.",
)
def text_boilerplate_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # token array staged as a column attribute: inlined into the
    # per-line transform lambda it would re-split the doc once per
    # pseudo-line (no subexpression elimination inside higher-order
    # lambdas — the same quadratic trap operators/winnow.py documents)
    staged = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("_toks"),
    )
    n_lines = F.ceil(F.size("_toks") / F.lit(float(_LINE_W))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.slice(F.col("_toks"), i * _LINE_W + 1, _LINE_W),
    )
    exploded = staged.select(
        "doc_id", n_lines.alias("n_lines"), F.explode(lines).alias("line")
    )
    n_stop = F.size(
        F.filter("line", lambda w: w.isin(*_STOPWORDS))
    )
    is_content = (F.size("line") == _LINE_W) & (n_stop <= _STOP_MAX)
    line_chars = F.length(F.array_join("line", " ")).cast("long")
    scored = exploded.select(
        "doc_id", "n_lines",
        is_content.alias("is_content"),
        line_chars.alias("line_chars"),
    )
    content = F.sum(F.when(F.col("is_content"), 1).otherwise(0))
    return scored.groupBy("doc_id").agg(
        F.max("n_lines").cast("long").alias("n_lines"),
        content.cast("long").alias("content_lines"),
        F.round(content / F.max("n_lines"), 4).alias("content_ratio"),
        F.sum(
            F.when(F.col("is_content"), F.col("line_chars")).otherwise(0)
        ).cast("long").alias("kept_chars"),
    )
