"""BPE tokenizer induction (Sennrich et al. 2016), Spark-first.

The reference counts tokens with a fixed regex; a training-data
pipeline that FEEDS a tokenizer also needs to LEARN one from the
corpus. Byte-pair encoding's training loop is inherently sequential
(each merge depends on the counts AFTER the previous merge), so the
scale design puts the sequential loop where it is cheap and keeps the
corpus-sized work to exactly ONE shuffle:

1. ``word_vocab``: corpus -> (word, freq) — the only corpus-sized
   aggregation (uniform hash keys, map-side combine). Classic BPE
   trains on the word-frequency table, not the running text, so
   everything after this step runs on a VOCABULARY-sized frame
   (10^5-10^6 rows at web scale — a dim table).
2. ``learn_bpe_merges``: K iterations over the vocab frame. Each
   iteration explodes adjacent symbol pairs weighted by word freq,
   aggregates pair counts (vocab-sized shuffle), takes the argmax
   with a deterministic tiebreak (count desc, pair asc — required for
   cross-run reproducibility), and applies the merge to the symbol
   arrays with a pure Catalyst ``aggregate`` fold (no UDF). The
   argmax is a 1-row collect — a bounded driver scalar per
   iteration, same class as the engine's max-round lookup.
3. ``apply_bpe``: tokenize the corpus with the learned merge list —
   an Arrow-batched mapInPandas (the merge loop per word is
   pointer-chasing, the documented Python-boundary case), with the
   merge table broadcast as a plain closure constant.

Determinism: ties on pair counts are broken lexicographically, so the
merge SEQUENCE (not just the set) is reproducible at any cluster size
— pytest asserts sequence equality against a pure-python reference
trainer on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_vocab",
    "learn_bpe_merges",
    "apply_bpe",
    "bpe_reference_train",
    "bpe_reference_apply",
]

END = "</w>"  # end-of-word marker (Sennrich's formulation)


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-tokenized text — the ONE
    corpus-sized aggregation of BPE training."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq, syms: array<string>) — characters + end marker."""
    return vocab.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def _merge_expr(a: str, b: str):
    """Catalyst fold applying ONE merge (a, b) -> ab left-to-right
    over the ``syms`` array — the exact sequential semantics of the
    reference trainer (an overlapping triple a,b,b merges the FIRST
    pair only). No UDF: aggregate() with an array accumulator."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (x == b_lit)
            # guard: the element we would extend must not itself be
            # the RESULT of a merge at this position... it cannot be:
            # a merged element equals a||b != a (b is non-empty), so
            # element_at(acc,-1) == a identifies an unconsumed 'a'.
            ,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_lit, b_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, freq) vocab.

    Returns (merges, final_syms_df). Each iteration: one vocab-sized
    pair-count aggregate + a 1-row argmax collect + a map-only fold
    applying the merge. The vocab frame is persisted per iteration
    and the previous round's cache released (bounded lineage, same
    pattern as connected components)."""
    syms = _initial_symbols(vocab).persist()
    syms.count()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            syms.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(
                            F.col("syms"), 1, F.size("syms") - 1
                        ),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda l, r: F.struct(
                            l.alias("a"), r.alias("b")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(),
            F.col("p.a").asc(),
            F.col("p.b").asc(),
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        nxt = syms.select(
            "word", "freq", _merge_expr(a, b).alias("syms")
        ).persist()
        nxt.count()
        syms.unpersist()
        syms = nxt
    return merges, syms


def apply_bpe(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: adds
    ``bpe_tokens array<string>`` and ``n_bpe_tokens``. Arrow-batched
    mapInPandas — the per-word merge loop is pointer-chasing Python,
    the documented UDF-boundary case; the merge table ships as a
    closure constant (rank dict, O(1) lookups)."""
    rank = {m: i for i, m in enumerate(merges)}
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bpe_tokens array<string>, n_bpe_tokens int"

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            toks = bpe_reference_apply(w, rank)
            cache[w] = toks
            return toks

        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in str(text).split():
                    toks.extend(encode_word(w))
                toks_col.append(toks)
                n_col.append(len(toks))
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks_col
            pdf["n_bpe_tokens"] = pd.array(n_col, dtype="int32")
            yield pdf

    return df.mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Pure-python reference (the pytest ground truth, Sennrich's algorithm)
# ---------------------------------------------------------------------------
def bpe_reference_train(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    vocab = {w: list(w) + [END] for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def bpe_reference_apply(
    word: str, rank: dict[tuple[str, str], int]
) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms
