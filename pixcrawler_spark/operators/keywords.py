"""Keyword expansion: the reference's query-seeding logic as DataFrame ops.

Reproduces (file:line cites into /root/reference):
- prepare_keywords truth table (builder/_keywords.py:36-89):
    no keywords + auto/enabled  -> generated keywords
    no keywords + disabled      -> [category]
    keywords    + enabled       -> union-distinct(user, generated)
    keywords    + auto/disabled -> user keywords unchanged
- template variation fill (builder/_downloader.py:136-137 formats
  templates per keyword; the reference ships 433 category templates —
  we ship our own small generic table, the MECHANISM is what's ported)
- select_variations (builder/_engine.py:64-80): cap =
  min(len, max(3, max_images//5)), then the reference's random.shuffle
  becomes a seeded deterministic order (md5(variation || '#' || seed))
  per SURVEY §7's determinism rule
- offset arithmetic (builder/_engine.py:455-457): offset =
  base_offset + i * variation_step with base_offset derived
  deterministically from (keyword, engine) instead of randint
- next_term retry rotation (builder/_keywords.py:679-697):
  alternatives[retry % len(alternatives)]

Everything is expression-level (codegen); the category/template tables
are broadcast literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.config import ENGINE_CONFIGS, DatasetConfig

# Our own generic variation templates (mechanism parity with the
# reference's per-category template lists; NOT copied from it).
VARIATION_TEMPLATES: tuple[str, ...] = (
    "{keyword}",
    "{keyword} high quality",
    "{keyword} close up",
    "{keyword} detailed",
    "{keyword} photo",
    "{keyword} image",
    "best {keyword}",
    "{keyword} collection",
    "{keyword} examples",
    "{keyword} gallery",
    "{keyword} wide angle",
    "{keyword} professional",
)


def categories_df(spark: SparkSession, config: DatasetConfig) -> DataFrame:
    rows = [(c, list(kws)) for c, kws in sorted(config.categories.items())]
    return spark.createDataFrame(
        rows, "category string, keywords array<string>"
    )


def generated_keywords_expr(category_col):
    """Deterministic stand-in for AI keyword generation (the reference
    disables AI in its prod path, builder/tasks.py:645-716): category
    name crossed with a fixed modifier list."""
    mods = F.array(*[F.lit(m) for m in ("types of", "common", "popular")])
    return F.transform(mods, lambda m: F.concat(m, F.lit(" "), category_col))


def prepare_keywords(cats: DataFrame, keyword_generation: str) -> DataFrame:
    """The truth table as one CASE over (has_keywords, mode).

    Returns (category, keyword, origin) where origin in
    {user, generated, category_name}.
    """
    has_kw = F.size("keywords") > 0
    gen = generated_keywords_expr(F.col("category"))
    if keyword_generation == "disabled":
        final = F.when(has_kw, F.col("keywords")).otherwise(
            F.array(F.col("category"))
        )
        origin = F.when(has_kw, F.lit("user")).otherwise(F.lit("category_name"))
        df = cats.select(
            "category", F.explode(final).alias("keyword"), origin.alias("origin")
        )
        return df.dropDuplicates(["category", "keyword"])
    if keyword_generation == "auto":
        # generate only when nothing was provided
        user_part = cats.where(has_kw).select(
            "category", F.explode("keywords").alias("keyword"),
            F.lit("user").alias("origin"),
        )
        gen_part = cats.where(~has_kw).select(
            "category", F.explode(gen).alias("keyword"),
            F.lit("generated").alias("origin"),
        )
        return user_part.unionByName(gen_part).dropDuplicates(
            ["category", "keyword"]
        )
    # enabled: user keywords union generated, user origin wins on dup
    user_part = cats.select(
        "category", F.explode("keywords").alias("keyword"),
        F.lit("user").alias("origin"),
    )
    gen_part = cats.select(
        "category", F.explode(gen).alias("keyword"),
        F.lit("generated").alias("origin"),
    )
    both = user_part.unionByName(gen_part)
    from pyspark.sql import Window

    w = Window.partitionBy("category", "keyword").orderBy("origin")  # generated < user
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn(
            "origin",
            F.when(F.col("origin") == "generated", "generated").otherwise("user"),
        )
    )


def expand_variations(
    keywords: DataFrame, max_images: int, seed: int = 42
) -> DataFrame:
    """Cross keywords with templates, cap + seeded-shuffle per
    select_variations semantics. Returns (category, keyword, variation,
    variation_rank)."""
    templates = F.array(*[F.lit(t) for t in VARIATION_TEMPLATES])
    cap = min(len(VARIATION_TEMPLATES), max(3, max_images // 5))
    filled = keywords.select(
        "category",
        "keyword",
        F.explode(
            F.slice(templates, 1, cap)  # prefix-take BEFORE shuffle, like the ref
        ).alias("template"),
    ).withColumn(
        "variation", F.replace(F.col("template"), F.lit("{keyword}"), F.col("keyword"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("category", "keyword").orderBy(
        F.md5(F.concat(F.col("variation"), F.lit(f"#{seed}"))), F.asc("variation")
    )
    return filled.select(
        "category", "keyword", "variation",
        F.row_number().over(w).alias("variation_rank"),
    )


def with_engine_offsets(variations: DataFrame, engines: tuple[str, ...]) -> DataFrame:
    """Cross with engine configs; offset = base + (rank-1) * step where
    base is the deterministic stand-in for randint(*offset_range)
    (builder/_search_engines.py:34-42): pmod(xxhash64(keyword, engine),
    hi - lo) + lo. Returns one fetch-work row per (variation, engine)."""
    eng_rows = [
        (name, c["offset_range"][0], c["offset_range"][1], c["variation_step"], c["score"])
        for name, c in ENGINE_CONFIGS.items()
        if name in engines
    ]
    spark = variations.sparkSession
    eng_df = spark.createDataFrame(
        eng_rows, "engine string, off_lo int, off_hi int, step int, engine_score double"
    )
    joined = variations.crossJoin(F.broadcast(eng_df))
    base = F.pmod(
        F.xxhash64(F.col("keyword"), F.col("engine")),
        F.col("off_hi") - F.col("off_lo"),
    ) + F.col("off_lo")
    return joined.withColumn(
        "offset", (base + (F.col("variation_rank") - 1) * F.col("step")).cast("int")
    ).drop("off_lo", "off_hi", "step")


def next_term_expr(alternatives_col, retry_col):
    """Retry-term rotation: alternatives[retry % len] (1-indexed
    element_at; builder/_keywords.py:679-697)."""
    return F.element_at(
        alternatives_col, (F.pmod(retry_col, F.size(alternatives_col)) + 1).cast("int")
    )
