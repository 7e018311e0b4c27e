"""Config validation + keyword-expansion truth table
(reference semantics: builder/_keywords.py:36-89, builder/_config.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.config import (
    ConfigError,
    DatasetConfig,
    load_config,
    sanitize_keyword,
    validate_keyword,
)
from pixcrawler_spark.operators import keywords as kw


def _cfg(categories, **opts):
    return load_config(
        {"dataset_name": "t", "categories": categories, "options": opts}
    )


# -- config validation -------------------------------------------------------
def test_defaults_filled():
    c = _cfg({"cats": ["tabby"]})
    assert c.max_images == 10 and c.max_retries == 5
    assert c.keyword_generation == "auto" and c.engines == ("google", "bing", "baidu")


@pytest.mark.parametrize(
    "bad",
    [
        {"categories": {"c": ["ok kw"]}},  # missing dataset_name
        {"dataset_name": "", "categories": {"c": []}},
        {"dataset_name": "x", "categories": {}},
        {"dataset_name": "x", "categories": {"c": ["a"]}},  # too short
        {"dataset_name": "x", "categories": {"c": ["bad<kw"]}},
        {"dataset_name": "x", "categories": {"c": []}, "options": {"max_retries": 25}},
        {"dataset_name": "x", "categories": {"c": []}, "options": {"keyword_generation": "maybe"}},
        {"dataset_name": "x", "categories": {"c": []}, "options": {"engines": ["altavista"]}},
    ],
)
def test_invalid_configs_rejected(bad):
    with pytest.raises(ConfigError):
        load_config(bad)


def test_sanitize_and_validate():
    assert sanitize_keyword("a/b\\c") == "a_b_c"
    assert validate_keyword("ok") and not validate_keyword("x")
    assert not validate_keyword("a" * 101)


# -- truth table --------------------------------------------------------------
@pytest.fixture(scope="module")
def cats(spark):
    cfg = DatasetConfig(
        dataset_name="t",
        categories={"cats": ["tabby", "siamese"], "dogs": []},
    )
    return kw.categories_df(spark, cfg)


def _rows(df):
    return {(r["category"], r["keyword"], r["origin"]) for r in df.collect()}


def test_disabled_uses_category_name(cats):
    got = _rows(kw.prepare_keywords(cats, "disabled"))
    assert got == {
        ("cats", "tabby", "user"),
        ("cats", "siamese", "user"),
        ("dogs", "dogs", "category_name"),
    }


def test_auto_generates_only_when_empty(cats):
    got = _rows(kw.prepare_keywords(cats, "auto"))
    assert ("cats", "tabby", "user") in got
    assert all(o == "generated" for c, k, o in got if c == "dogs")
    assert ("dogs", "types of dogs", "generated") in got
    assert not any(o == "generated" for c, k, o in got if c == "cats")


def test_enabled_unions_user_and_generated(cats):
    got = _rows(kw.prepare_keywords(cats, "enabled"))
    assert ("cats", "tabby", "user") in got
    assert ("cats", "common cats", "generated") in got
    assert ("dogs", "popular dogs", "generated") in got


# -- variations + offsets ------------------------------------------------------
def test_variation_cap_and_determinism(spark, cats):
    kws = kw.prepare_keywords(cats, "disabled")
    v1 = kw.expand_variations(kws, max_images=100, seed=7)
    v2 = kw.expand_variations(kws, max_images=100, seed=7)
    assert v1.collect() == v2.collect()  # deterministic incl. ranks
    cap = min(len(kw.VARIATION_TEMPLATES), max(3, 100 // 5))
    per = v1.groupBy("category", "keyword").count().collect()
    assert all(r["count"] == cap for r in per)
    # low budget → floor of 3 variations
    v3 = kw.expand_variations(kws, max_images=5, seed=7)
    assert v3.groupBy("keyword").count().collect()[0]["count"] == 3


def test_engine_offsets_in_range(spark, cats):
    kws = kw.prepare_keywords(cats, "disabled")
    v = kw.expand_variations(kws, max_images=20, seed=7)
    w = kw.with_engine_offsets(v, ("google", "bing", "baidu"))
    rows = w.collect()
    assert {r["engine"] for r in rows} == {"google", "bing", "baidu"}
    from pixcrawler_spark.config import ENGINE_CONFIGS

    for r in rows:
        lo, hi = ENGINE_CONFIGS[r["engine"]]["offset_range"]
        step = ENGINE_CONFIGS[r["engine"]]["variation_step"]
        base = r["offset"] - (r["variation_rank"] - 1) * step
        assert lo <= base < hi


def test_next_term_rotation(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], r) for r in range(6)], "alts array<string>, retry int"
    )
    got = [
        r["t"]
        for r in df.select(
            kw.next_term_expr(F.col("alts"), F.col("retry")).alias("t")
        ).collect()
    ]
    assert got == ["a", "b", "c", "a", "b", "c"]
