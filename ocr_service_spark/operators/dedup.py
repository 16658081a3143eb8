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

__all__ = ["dedup_latest", "exact_text_dedup", "drop_hot_shingles",
           "connected_components"]


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


def drop_hot_shingles(
    sh: DataFrame, shingle_col: str = "g", max_df: int = 100
) -> DataFrame:
    """Skew guard for shingle self-joins: remove shingles whose document
    frequency exceeds `max_df` before any (doc_id, shingle) equi-join.

    Without this, one boilerplate shingle shared by 10^6 docs produces
    ~10^12/2 candidate pairs in the join — the classic stop-shingle
    quadratic blow-up. With it, per-shingle join fan-out is bounded by
    max_df^2 regardless of corpus size.

    Scale shape: the doc-frequency count is a map-side-combinable hash
    agg on the shingle key; the surviving hot set is tiny by
    construction (only shingles above the cap), so the exclusion is a
    broadcast left-anti join — no extra full shuffle of `sh`.
    """
    hot = (
        sh.groupBy(shingle_col)
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_df)
        .select(shingle_col)
    )
    return sh.join(F.broadcast(hot), shingle_col, "left_anti")


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


def connected_components(edges: DataFrame, src: str = "u", dst: str = "v",
                         max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list, Pregel-style
    min-label propagation: every node repeatedly adopts the minimum
    label among itself and its neighbors until a sweep changes nothing.
    Returns (id, label) with label = min node id in the component.

    Scale shape: each sweep is ONE shuffle of the (tiny) edge list
    joined to the current labels — for near-dup clustering the edges
    are LSH candidate pairs, orders of magnitude smaller than the
    corpus. Convergence takes O(component diameter) sweeps; dup
    clusters are shallow so 2-4 in practice (`max_iter` only guards
    pathological graphs — large-star/small-star, Kiveris et al., is
    the drop-in replacement if diameters ever get deep). Labels are
    localCheckpoint'ed per sweep so the plan stays linear instead of
    doubling per iteration; the convergence test aggregates to a
    single driver-side scalar (a count, not a collect)."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    labels = e.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            e.join(labels, e.v == labels.id)
            .groupBy("u").agg(F.min("label").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels.id == nbr.u, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("new_label"),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("new_label") < F.col("old_label")).count()
        labels = new.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels
