"""BPE tokenizer TRAINING — the iterated merge loop (VERDICT r8 #5;
``bpe_merge_candidates`` in the suite is one inner-loop iteration, this
module drives N of them and materializes the artifact a tokenizer
actually ships: the rank-ordered merge table).

Algorithm (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016 — the public BPE formulation): start
from characters, repeatedly (1) count adjacent symbol pairs across the
corpus, (2) merge the most frequent pair everywhere, greedy
left-to-right non-overlapping. The trained merge table applied in rank
order IS the tokenizer.

Spark-first representation: a word's symbol sequence is ONE string
with every symbol wrapped ``\\t sym \\n`` (symbols come from
whitespace-split words, so they can never contain either delimiter).
That wrapping makes every step a built-in string expression:

  * pair extraction: ``regexp_extract_all`` + zipped adjacent slices
    (map-only);
  * merge application: literal ``replace(s, '\\tL\\n\\tR\\n',
    '\\tLR\\n')`` — SQL replace is left-to-right NON-OVERLAPPING,
    which is exactly BPE's greedy tie-handling ("aaaa" + merge (a,a)
    -> [aa, aa], never [a, aa, a]); both anchors make partial-symbol
    false matches impossible;
  * token counting: ``'\\n'`` occurrences per string.

Scale shape: the corpus collapses ONCE into the distinct-word
vocabulary with frequencies (the classic BPE trainer optimization —
every later pass is vocabulary-sized, not corpus-sized). Each merge
iteration is one bounded-domain aggregation (pair keys are
|alphabet|²-ish) + one map-only rewrite; the driver holds only the
merge table (n rows), never vocabulary or corpus. The vocabulary
DataFrame is re-persisted per iteration and the previous cache
released, so lineage never re-executes earlier merges.

DuckDB reproduces the identical loop (the suite's
``bpe_train_merges_stats`` oracle builds the same stages as chained
CTEs), so the trainer is value-hash verified cross-engine — ties
broken by (count DESC, left, right) binary string order in both.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup_text import tokens_col

_SYM_RE = r"\t([^\t\n]*)\n"


def _wrap_chars(col: F.Column) -> F.Column:
    """word -> '\\tc1\\n\\tc2\\n...' (one wrapped symbol per char)."""
    return F.regexp_replace(col, r"(.)", "\t$1\n")


def _syms(col: F.Column) -> F.Column:
    return F.regexp_extract_all(col, F.lit(_SYM_RE), 1)


def _token_count(col: F.Column) -> F.Column:
    """symbols per wrapped string = '\\n' occurrences (cheap: two
    lengths, no regex)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"\n", ""))


def build_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(s, freq): the distinct-word vocabulary in wrapped-symbol form —
    the one corpus-sized pass of the whole trainer."""
    return (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.explode(tokens_col(text_col)).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(_wrap_chars(F.col("w")).alias("s"), "freq")
    )


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[dict]:
    """Run ``n_merges`` BPE iterations over the corpus; returns the
    merge table as a list of dicts — ``rank`` (1-based), ``left_sym``,
    ``right_sym``, ``merged_sym``, ``pair_count`` (corpus adjacency
    count at selection time), ``corpus_tokens_after`` (total symbols
    across the corpus once merges 1..rank are applied). Stops early if
    no pair occurs at least twice (nothing left worth merging)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    vocab = build_vocab(df, text_col).persist()
    merges: list[dict] = []
    try:
        for rank in range(1, n_merges + 1):
            syms = _syms(F.col("s"))
            top = (
                vocab.select(
                    F.explode(
                        F.zip_with(
                            F.slice(syms, 1, F.size(syms) - 1),
                            F.slice(syms, 2, F.size(syms) - 1),
                            lambda a, b: F.struct(a.alias("l"),
                                                  b.alias("r")),
                        )
                    ).alias("pr"),
                    "freq",
                )
                .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
                .agg(F.sum("freq").cast("bigint").alias("cnt"))
                .orderBy(F.desc("cnt"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top or int(top[0]["cnt"]) < 2:
                break
            left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            pat = F.lit(f"\t{left}\n\t{right}\n")
            rep = F.lit(f"\t{left}{right}\n")
            nxt = vocab.select(
                F.replace(F.col("s"), pat, rep).alias("s"), "freq"
            ).persist()
            after = int(
                nxt.agg(F.sum(F.col("freq") * _token_count(F.col("s"))))
                .first()[0]
            )
            vocab.unpersist()
            vocab = nxt
            merges.append({
                "rank": rank, "left_sym": left, "right_sym": right,
                "merged_sym": left + right, "pair_count": cnt,
                "corpus_tokens_after": after,
            })
        return merges
    finally:
        vocab.unpersist()


def _apply_udf(ordered: list[dict]):
    """Arrow-batched vocabulary-memoized BPE apply (VERDICT r9 #2 —
    the vocab-scale path). The per-merge string rewrites are IDENTICAL
    to the expression chain (Python ``str.replace`` is left-to-right
    non-overlapping, same as SQL ``replace``), but run once per
    DISTINCT word per executor: the memo dict is the executor-local
    form of the trainer's vocabulary-collapse trick — Zipf'd corpora
    hit it almost always, so per-row cost is a dict lookup, and the
    whole apply stays MAP-ONLY (the vocab-table alternative would
    explode + regroup the full token stream: two corpus-wide shuffles
    at 100 TB). Cache is capped so an adversarial all-unique corpus
    degrades to recompute, never to executor OOM."""
    from pyspark.sql.functions import pandas_udf

    pairs = [
        (f"\t{mm['left_sym']}\n\t{mm['right_sym']}\n",
         f"\t{mm['merged_sym']}\n")
        for mm in ordered
    ]
    memo: dict[str, list[str]] = {}

    def seg_word(w: str) -> list[str]:
        t = memo.get(w)
        if t is None:
            s = "".join(f"\t{c}\n" for c in w)
            for pat, rep in pairs:
                if pat in s:
                    s = s.replace(pat, rep)
            # unwrap: '\\ta\\n\\tbc\\n' -> ['a', 'bc'] (symbols can
            # never contain either delimiter — see module docstring)
            t = s[1:-1].split("\n\t") if s else []
            if len(memo) < 1_000_000:
                memo[w] = t
        return t

    @pandas_udf("array<string>")
    def apply(words: pd.Series) -> pd.Series:
        return words.map(
            lambda ws: None if ws is None
            else [tok for w in ws for tok in seg_word(w)]
        )

    return apply


def bpe_segment(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    max_expr_merges: int = 16,
) -> DataFrame:
    """Apply a trained merge table (rank order) to a text column.
    Adds ``out_col`` (array<string>) and ``<out_col>_n`` (token
    count).

    Two physically different plans, one semantics (pinned equal in
    tests/test_bpe.py):

    * ``len(merges) <= max_expr_merges`` — one literal ``replace``
      per merge as a pure-Column expression chain (JVM-side,
      whole-stage codegen, zero Python). Right for the trainer-sized
      tables the suite ships.
    * larger tables — a real tokenizer vocabulary (30k merges) would
      build a 30k-deep Catalyst expression tree (analysis blows up
      long before execution), so the apply switches to ONE
      Arrow-batched pandas UDF with executor-local word→tokens
      memoization (``_apply_udf``). Still map-only: no shuffle is
      introduced either way."""
    ordered = sorted(merges, key=lambda mm: mm["rank"])

    if len(ordered) > max_expr_merges:
        toks = _apply_udf(ordered)(tokens_col(text_col))
        return df.withColumn(out_col, toks).withColumn(
            f"{out_col}_n", F.size(out_col).cast("long")
        )

    def _apply(pat: str, rep: str):
        # closure factory: PySpark introspects lambda arity, so default
        # args would read as extra higher-order-function parameters
        return lambda s: F.replace(s, F.lit(pat), F.lit(rep))

    words = F.transform(tokens_col(text_col), _wrap_chars)
    for mm in ordered:
        words = F.transform(
            words,
            _apply(f"\t{mm['left_sym']}\n\t{mm['right_sym']}\n",
                   f"\t{mm['merged_sym']}\n"),
        )
    toks = F.flatten(
        F.transform(words, lambda s: _syms(s))
    )
    return df.withColumn(out_col, toks).withColumn(
        f"{out_col}_n", F.size(out_col).cast("long")
    )
