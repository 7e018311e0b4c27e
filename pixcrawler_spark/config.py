"""Crawl-config loading & validation — the engine's "query" language.

Reproduces the reference's config semantics (JSON Schema CONFIG_SCHEMA
at builder/_config.py:31-94; load/validate/default-fill in
ConfigManager, builder/_generator.py:380-553) as a driver-side
dataclass with explicit checks. Nothing here touches executors: the
validated config becomes broadcast literals / tiny DataFrames.

Semantics kept 1:1 with the reference:
- required: dataset_name (str), categories (map<str, list[str]>);
- optional options with defaults: max_images=10, max_retries=5
  (bounded 1..20, builder/_config.py:175-181), keyword_generation in
  {auto, disabled, enabled} (builder/_constants.py:71), engines
  ordered list (google/bing/baidu configs at builder/_config.py:97-120),
  generate_labels=True;
- keyword validity: length in [2,100], no characters from
  [<>:"/\\|?*] (builder/_keywords.py:223-256);
- sanitize: '/' and '\\' replaced by '_' (builder/_generator.py:1247-1248);
- frontier extensions (FIXTURES.md §3): seeds, max_depth.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

KEYWORD_MODES = ("auto", "disabled", "enabled")
INVALID_KEYWORD_CHARS = re.compile(r'[<>:"/\\|?*]')

# Per-engine fetch-offset constants (reference builder/_config.py:97-120).
ENGINE_CONFIGS: dict[str, dict] = {
    "google": {"offset_range": (0, 20), "variation_step": 20, "score": 1.0},
    "bing": {"offset_range": (0, 30), "variation_step": 10, "score": 0.8},
    "baidu": {"offset_range": (10, 50), "variation_step": 15, "score": 0.6},
}

DEFAULTS = {
    "max_images": 10,
    "max_retries": 5,
    "keyword_generation": "auto",
    "generate_labels": True,
    "engines": ("google", "bing", "baidu"),
    "max_depth": 3,
    "seed": 42,
}


class ConfigError(ValueError):
    pass


def validate_keyword(kw: str) -> bool:
    """Keyword validity predicate (builder/_keywords.py:223-256)."""
    return 2 <= len(kw) <= 100 and not INVALID_KEYWORD_CHARS.search(kw)


def sanitize_keyword(kw: str) -> str:
    """Filesystem-safe projection (builder/_generator.py:1247-1248)."""
    return kw.replace("/", "_").replace("\\", "_")


@dataclass(frozen=True)
class DatasetConfig:
    dataset_name: str
    categories: dict[str, list[str]]
    max_images: int = DEFAULTS["max_images"]
    max_retries: int = DEFAULTS["max_retries"]
    keyword_generation: str = DEFAULTS["keyword_generation"]
    generate_labels: bool = DEFAULTS["generate_labels"]
    engines: tuple[str, ...] = DEFAULTS["engines"]
    max_depth: int = DEFAULTS["max_depth"]
    seed: int = DEFAULTS["seed"]
    seeds: tuple[str, ...] = field(default_factory=tuple)


def load_config(obj: dict | str) -> DatasetConfig:
    """Validate + default-fill a config dict (or JSON string/path).

    Raises ConfigError with the first violated rule, mirroring the
    reference's fail-fast JSON-Schema validation.
    """
    if isinstance(obj, str):
        if obj.lstrip().startswith("{"):
            obj = json.loads(obj)
        else:
            with open(obj) as f:
                obj = json.load(f)
    if not isinstance(obj, dict):
        raise ConfigError("config must be a JSON object")

    name = obj.get("dataset_name")
    if not isinstance(name, str) or not name:
        raise ConfigError("dataset_name: non-empty string required")
    cats = obj.get("categories")
    if not isinstance(cats, dict) or not cats:
        raise ConfigError("categories: non-empty object required")
    categories: dict[str, list[str]] = {}
    for cat, kws in cats.items():
        if kws is None:
            kws = []
        if not isinstance(kws, list) or not all(isinstance(k, str) for k in kws):
            raise ConfigError(f"categories[{cat}]: list of strings required")
        bad = [k for k in kws if not validate_keyword(k)]
        if bad:
            raise ConfigError(f"categories[{cat}]: invalid keywords {bad}")
        categories[cat] = [sanitize_keyword(k) for k in kws]

    opts = obj.get("options", {}) or {}
    max_images = int(opts.get("max_images", DEFAULTS["max_images"]))
    if max_images < 1:
        raise ConfigError("options.max_images: must be >= 1")
    max_retries = int(opts.get("max_retries", DEFAULTS["max_retries"]))
    if not (1 <= max_retries <= 20):  # bound from builder/_config.py:175-181
        raise ConfigError("options.max_retries: must be in [1, 20]")
    kg = opts.get("keyword_generation", DEFAULTS["keyword_generation"])
    if kg not in KEYWORD_MODES:
        raise ConfigError(f"options.keyword_generation: one of {KEYWORD_MODES}")
    engines = tuple(opts.get("engines", DEFAULTS["engines"]))
    unknown = [e for e in engines if e not in ENGINE_CONFIGS]
    if unknown:
        raise ConfigError(f"options.engines: unknown {unknown}")
    max_depth = int(opts.get("max_depth", DEFAULTS["max_depth"]))
    if max_depth < 0:
        raise ConfigError("options.max_depth: must be >= 0")

    return DatasetConfig(
        dataset_name=name,
        categories=categories,
        max_images=max_images,
        max_retries=max_retries,
        keyword_generation=kg,
        generate_labels=bool(opts.get("generate_labels", True)),
        engines=engines,
        max_depth=max_depth,
        seed=int(opts.get("seed", DEFAULTS["seed"])),
        seeds=tuple(obj.get("seeds", ())),
    )
