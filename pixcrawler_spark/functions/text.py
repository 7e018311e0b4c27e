"""Text / outlink extraction from html:binary — the byte-identical
invariant (BASELINE.json input_hint: "byte-identical extracted text
per url").

The extraction ORACLE is `extract_text_py` / `extract_outlinks_py`
(pure Python over one bytes value); the fixture generator writes the
pages table so that ``pages.text == extract_text_py(pages.html)`` for
every url, and tests assert the Spark UDF reproduces it byte-for-byte.

Spark side is an Arrow-batched pandas UDF (no per-row Python in the
engine hot path — one Python call per ~10k-row Arrow batch, vectorized
pandas str ops inside). Reference analog: the parser stage of the
icrawler feeder/parser/downloader pipeline (builder/_engine.py:542-578
wraps parsers; here parsing is deterministic regex extraction).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# Oracle regexes (bytes-level, DOTALL so truncated/corrupted html still
# yields a deterministic result).
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_HREF_RE = re.compile(rb'<a href="([^"]*)"')


def extract_text_py(html: bytes | None) -> str | None:
    """Extraction oracle: title + each <p> body, joined by newline.

    None html (fetch failure) → None. Malformed/truncated html →
    whatever the regexes find (deterministic), joined the same way.
    """
    if html is None:
        return None
    parts = [m.decode("utf-8", errors="replace") for m in _TITLE_RE.findall(html)]
    parts += [m.decode("utf-8", errors="replace") for m in _PARA_RE.findall(html)]
    return "\n".join(parts)


def extract_outlinks_py(html: bytes | None) -> list[str] | None:
    """Outlink oracle: href values of <a> anchors, document order,
    duplicates preserved (frontier dedup happens downstream)."""
    if html is None:
        return None
    return [m.decode("utf-8", errors="replace") for m in _HREF_RE.findall(html)]


# ---------------------------------------------------------------------------
# Vectorized Spark UDFs (Arrow batches)
# ---------------------------------------------------------------------------
def _extract_text_batch(s: pd.Series) -> pd.Series:
    return s.map(extract_text_py)


def _extract_outlinks_batch(s: pd.Series) -> pd.Series:
    return s.map(extract_outlinks_py)


extract_text_udf = F.pandas_udf(_extract_text_batch, StringType())
extract_outlinks_udf = F.pandas_udf(_extract_outlinks_batch, ArrayType(StringType()))


def with_extraction(df, html_col: str = "html"):
    """Append ``extracted_text`` and ``outlinks`` columns (one Arrow
    round-trip for both via a single struct-returning pass would save
    a serialization; kept as two named UDFs for plan readability —
    Spark batches them into one Python runner stage anyway)."""
    return df.withColumns(
        {
            "extracted_text": extract_text_udf(F.col(html_col)),
            "outlinks": extract_outlinks_udf(F.col(html_col)),
        }
    )


def map_in_pandas_extract(df, html_col: str = "html"):
    """Alternative mapInPandas extraction keeping all other columns —
    used by the crawl round where the fetch join already materialized
    the page row. Single Python stage, one pass per partition."""
    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_str}, extracted_text string, outlinks array<string>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["extracted_text"] = pdf[html_col].map(extract_text_py)
            pdf["outlinks"] = pdf[html_col].map(extract_outlinks_py)
            yield pdf

    return df.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# Anchor-text extraction (href + link text pairs)
# ---------------------------------------------------------------------------
# The web-graph relevance signal outlink extraction drops: WHAT the
# linking page calls the target. Same oracle/UDF discipline as above.
_ANCHOR_RE = re.compile(rb'<a href="([^"]*)"[^>]*>(.*?)</a>', re.DOTALL)


def extract_anchors_py(html: bytes | None) -> list[dict] | None:
    """Anchor oracle: (href, anchor text) per <a>...</a>, document
    order, duplicates preserved. None html (fetch failure) → None."""
    if html is None:
        return None
    return [
        {
            "href": h.decode("utf-8", errors="replace"),
            "anchor": a.decode("utf-8", errors="replace"),
        }
        for h, a in _ANCHOR_RE.findall(html)
    ]


def _extract_anchors_batch(s: pd.Series) -> pd.Series:
    return s.map(extract_anchors_py)


extract_anchors_udf = F.pandas_udf(
    _extract_anchors_batch,
    ArrayType(
        StructType(
            [
                StructField("href", StringType()),
                StructField("anchor", StringType()),
            ]
        )
    ),
)
