"""Invariants for the webtext-ingest pair beyond the DuckDB oracle
mirror (tests/test_queries_oracle.py runs the exact-value comparison):
the WARC parser must recover exactly one record per source document
and flag exactly the planted truncations; boilerplate metrics must be
internally consistent with the raw documents.
"""

from __future__ import annotations

import duckdb
import pytest

from pixcrawler_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).df()


def test_warc_roundtrip_recovers_every_record(spark, docs_pdf):
    out = (
        REGISTRY["webtext_warc_records"].fn(spark, SF_DIR).toPandas()
    )
    # one parsed record per document, ids intact through the framing
    assert sorted(out["doc_id"]) == sorted(docs_pdf["doc_id"])
    # exactly the planted truncations (doc_id % 17 == 0) are flagged
    flagged = set(out.loc[~out["len_ok"], "doc_id"])
    assert flagged == {d for d in docs_pdf["doc_id"] if d % 17 == 0}
    # truncated records declare exactly 3 bytes more than the body
    bad = out[~out["len_ok"]]
    assert (bad["content_length"] - bad["body_chars"] == 3).all()
    good = out[out["len_ok"]]
    assert (good["content_length"] == good["body_chars"]).all()
    # body never exceeds the 64-byte payload cap
    assert (out["body_chars"] <= 64).all()


def test_boilerplate_metrics_consistent(spark, docs_pdf):
    out = (
        REGISTRY["text_boilerplate_density"].fn(spark, SF_DIR).toPandas()
    )
    assert len(out) == len(docs_pdf)
    assert (out["content_lines"] <= out["n_lines"]).all()
    assert (out["content_ratio"] >= 0).all()
    assert (out["content_ratio"] <= 1).all()
    m = out.merge(
        docs_pdf.assign(doc_chars=docs_pdf["text"].str.len()),
        on="doc_id",
    )
    # kept chars can never exceed the document's own length
    assert (m["kept_chars"] <= m["doc_chars"]).all()
    # line count matches ceil(tokens / 12) recomputed from the raw text
    n_toks = m["text"].str.split(" ").map(
        lambda ws: sum(1 for w in ws if w)
    )
    assert (m["n_lines"] == (n_toks + 11) // 12).all()
