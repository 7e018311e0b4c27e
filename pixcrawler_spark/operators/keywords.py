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


# ---------------------------------------------------------------------------
# Smart-combination retry strategies 1-8 (builder/_keywords.py:356-473) +
# progressive band selection (:458-473) + 15-alternative cap, original
# first (:538-564). The reference's random.choice becomes a
# deterministic md5 pick — pmod(hex32(md5(keyword|retry|salt)), n) —
# per SURVEY §7's determinism rule, portable to the DuckDB oracle
# (same md5, same hex-prefix int). Term tables are OUR OWN small
# generic lists (mechanism parity, not the reference's 433-entry
# per-category vocabulary).
# ---------------------------------------------------------------------------
SMART_TERMS: dict[str, tuple[str, ...]] = {
    "quality": ("high quality", "high resolution", "4k", "detailed"),
    "style": ("realistic", "artistic", "minimalist"),
    "basic": ("photo", "image", "picture"),
    "emotional": ("beautiful", "stunning", "striking"),
    "professional": ("professional", "studio", "commercial"),
    "camera": ("close up", "wide angle", "macro"),
    "lighting": ("soft lighting", "dramatic lighting", "natural light"),
    "background": ("white background", "plain background", "outdoor scene"),
    "color": ("colorful", "monochrome", "vibrant"),
    "location": ("indoor", "outdoor", "urban"),
    "time_period": ("modern", "vintage", "classic"),
    "size_format": ("large", "small", "square"),
    "texture": ("smooth", "textured", "glossy"),
    "condition": ("new", "pristine", "aged"),
    "arrangement": ("single", "group", "organized"),
    "generic_quality": ("excellent", "premium", "fine"),
    "focus": ("sharp focus", "shallow depth", "crisp"),
}

# retry band → allowed strategies (builder/_keywords.py:458-473)
STRATEGY_BANDS: tuple[tuple[int, tuple[int, ...]], ...] = (
    (2, (1, 2)),
    (4, (1, 2, 3)),
    (6, (2, 3, 4)),
    (8, (3, 4, 5)),
    (10, (4, 5, 6)),
    (12, (5, 6, 7)),
)
FALLBACK_BAND: tuple[int, ...] = (6, 7, 8)
MAX_ALTERNATIVES = 15  # generated alternatives; the original is always first


def _h32(key_col):
    """First 8 md5 hex chars as a bigint — the shared deterministic
    pick hash (identical in DuckDB: ('0x' || substring(md5(k),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(key_col), 1, 8), 16, 10).cast("bigint")


def _pick_key(kw_col, rc_col, salt: str):
    return F.concat(kw_col, F.lit("|"), rc_col.cast("string"), F.lit("|" + salt))


def _pick(cat: str, kw_col, rc_col, salt: str):
    """Deterministic random.choice analog over a term category."""
    terms = SMART_TERMS[cat]
    arr = F.array(*[F.lit(t) for t in terms])
    idx = F.pmod(_h32(_pick_key(kw_col, rc_col, salt)), F.lit(len(terms)))
    return F.element_at(arr, (idx + 1).cast("int"))


def _join_terms(*cols):
    return F.concat_ws(" ", *cols)


def smart_strategy_term_expr(kw_col, rc_col, strategy_col):
    """The term strategy ``strategy_col`` (1-8) produces for
    (keyword, retry_count) — each branch mirrors the reference's
    composition incl. its retry-count conditionals
    (builder/_keywords.py:356-455)."""
    q = SMART_TERMS["quality"]
    nq = len(q)
    # strategy 2's random.sample(quality, 2) → two distinct indices
    j1 = F.pmod(_h32(_pick_key(kw_col, rc_col, "s2:quality:1")), F.lit(nq))
    j2 = F.pmod(
        j1 + 1 + F.pmod(_h32(_pick_key(kw_col, rc_col, "s2:quality:2")), F.lit(nq - 1)),
        F.lit(nq),
    )
    qarr = F.array(*[F.lit(t) for t in q])
    q1 = F.element_at(qarr, (j1 + 1).cast("int"))
    q2 = F.element_at(qarr, (j2 + 1).cast("int"))

    s1 = F.when(
        rc_col <= 3,
        _join_terms(
            _pick("style", kw_col, rc_col, "s1:style"),
            _pick("quality", kw_col, rc_col, "s1:quality"),
            kw_col,
        ),
    ).otherwise(
        _join_terms(
            _pick("style", kw_col, rc_col, "s1:style"),
            _pick("quality", kw_col, rc_col, "s1:quality"),
            kw_col,
            _pick("basic", kw_col, rc_col, "s1:basic"),
        )
    )
    s2 = F.when(
        rc_col <= 5,
        _join_terms(
            _pick("emotional", kw_col, rc_col, "s2:emotional"), q1, q2, kw_col
        ),
    ).otherwise(
        _join_terms(
            _pick("emotional", kw_col, rc_col, "s2:emotional"),
            _pick("professional", kw_col, rc_col, "s2:professional"),
            q1, q2, kw_col,
        )
    )
    s3 = _join_terms(
        _pick("camera", kw_col, rc_col, "s3:camera"),
        _pick("lighting", kw_col, rc_col, "s3:lighting"),
        _pick("style", kw_col, rc_col, "s3:style"),
        kw_col,
    )
    s4 = _join_terms(
        _pick("background", kw_col, rc_col, "s4:background"),
        _pick("color", kw_col, rc_col, "s4:color"),
        _pick("quality", kw_col, rc_col, "s4:quality"),
        kw_col,
        _pick("basic", kw_col, rc_col, "s4:basic"),
    )
    s5 = _join_terms(
        _pick("professional", kw_col, rc_col, "s5:professional"),
        _pick("lighting", kw_col, rc_col, "s5:lighting"),
        _pick("quality", kw_col, rc_col, "s5:quality"),
        _pick("emotional", kw_col, rc_col, "s5:emotional"),
        _pick("focus", kw_col, rc_col, "s5:focus"),
        kw_col,
        _pick("basic", kw_col, rc_col, "s5:basic"),
    )
    s6 = _join_terms(
        _pick("location", kw_col, rc_col, "s6:location"),
        _pick("time_period", kw_col, rc_col, "s6:time"),
        _pick("style", kw_col, rc_col, "s6:style"),
        kw_col,
    )
    s7 = _join_terms(
        _pick("size_format", kw_col, rc_col, "s7:size"),
        _pick("texture", kw_col, rc_col, "s7:texture"),
        _pick("color", kw_col, rc_col, "s7:color"),
        kw_col,
    )
    s8 = _join_terms(
        _pick("condition", kw_col, rc_col, "s8:condition"),
        _pick("arrangement", kw_col, rc_col, "s8:arrangement"),
        _pick("generic_quality", kw_col, rc_col, "s8:generic"),
        kw_col,
    )
    return (
        F.when(strategy_col == 1, s1)
        .when(strategy_col == 2, s2)
        .when(strategy_col == 3, s3)
        .when(strategy_col == 4, s4)
        .when(strategy_col == 5, s5)
        .when(strategy_col == 6, s6)
        .when(strategy_col == 7, s7)
        .otherwise(s8)
    )


def smart_strategy_id_expr(kw_col, rc_col):
    """Progressive band selection (builder/_keywords.py:458-473):
    higher retry counts draw from more complex strategy sets; the
    random.choice within the band is the deterministic md5 pick."""
    pick_h = _h32(_pick_key(kw_col, rc_col, "band"))

    def band_pick(strategies: tuple[int, ...]):
        arr = F.array(*[F.lit(s) for s in strategies])
        return F.element_at(
            arr, (F.pmod(pick_h, F.lit(len(strategies))) + 1).cast("int")
        )

    expr = band_pick(FALLBACK_BAND)
    for bound, strategies in reversed(STRATEGY_BANDS):
        expr = F.when(rc_col <= bound, band_pick(strategies)).otherwise(expr)
    return expr


def smart_term_expr(kw_col, rc_col):
    """The retry term for (keyword, retry_count): band-select a
    strategy, run it."""
    return smart_strategy_term_expr(
        kw_col, rc_col, smart_strategy_id_expr(kw_col, rc_col)
    )


def smart_alternatives_expr(kw_col, rc_col):
    """The full alternative list (builder/_keywords.py:520-564):
    original keyword FIRST, then min(15, 3 + retry) generated terms
    for retry_count + i (i = 0..), order-preserving deduped. The
    reference's trailing shuffle is determinized to generation order
    and its <8 fallback padding is unnecessary here (salted picks make
    in-list collisions rare, and dedup keeps the list well-formed
    either way)."""
    num = F.least(F.lit(MAX_ALTERNATIVES), F.lit(3) + rc_col)
    gen = F.transform(
        F.sequence(F.lit(0), num - 1),
        lambda i: smart_term_expr(kw_col, rc_col + i),
    )
    return F.array_distinct(F.concat(F.array(kw_col), gen))
