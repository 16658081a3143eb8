"""Deduplication operators.

1. `dedup_latest` — the north-rule "dedup-and-validate" shuffle: one
   row per url keeping max warc_ts, with EXPLICIT two-phase salting for
   skewed hosts (a few hosts own most pages — FIXTURES.md §1). The
   reference has no analog (it never sees two crawls of one document);
   the semantics come from the north rule's
   "salts skewed hosts before the dedup-and-validate shuffle".

   Determinism: the keeper is max over struct(warc_ts, doc_id, ...) —
   lexicographic struct ordering with a total-order prefix, so ties
   can't flip between runs/parallelism levels (SURVEY.md §7).

   Scale note: phase 1 (url, salt) aggregation is a map-side-combinable
   hash agg that splits each hot url across `n_salts` reducers; phase 2
   re-aggregates the tiny survivor set. At 10^12 rows this bounds any
   single reducer to ~rows(url)/n_salts. AQE skew handling only fixes
   joins, not aggregations — hence manual salt.

2. Exact + near-duplicate *content* dedup (training-data tier):
   `exact_text_dedup`, plus MinHash/SimHash/Jaccard live in
   operators/textstats.py and are exposed as queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dedup_latest", "exact_text_dedup"]


def dedup_latest(
    df: DataFrame,
    key: str = "url",
    order_cols: tuple[str, ...] = ("warc_ts", "doc_id"),
    n_salts: int = 16,
) -> DataFrame:
    """Keep, per `key`, the row with the greatest (order_cols) tuple.

    Implemented as salted two-phase max-of-struct aggregation (no
    window, no sort): payload columns ride inside the struct so the
    shuffle carries exactly one combined record per (key, salt) out of
    the map side.
    """
    payload = [c for c in df.columns if c != key]
    ordered = [*order_cols, *[c for c in payload if c not in order_cols]]
    packed = df.select(
        F.col(key),
        F.pmod(F.xxhash64(*[F.col(c) for c in ordered[:2]]), F.lit(n_salts)).alias("_salt"),
        F.struct(*[F.col(c) for c in ordered]).alias("_rec"),
    )
    partial = packed.groupBy(key, "_salt").agg(F.max("_rec").alias("_rec"))
    final = partial.groupBy(key).agg(F.max("_rec").alias("_rec"))
    return final.select(F.col(key), *[F.col(f"_rec.{c}").alias(c) for c in ordered])


def exact_text_dedup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: md5-of-text groups, keeper = min(id).
    Returns (content_hash, keeper_id, n_dups)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
    )
