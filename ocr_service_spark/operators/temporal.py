"""Temporal join operators Spark has no native form of: as-of join
and tolerance (range) join. Both are listed in the build mandate as
canonical "custom operator" targets; the reference has no analog
(single-document service, SURVEY.md §2.3).

Both are compositions of existing DataFrame ops — no Python on any
path:

- `asof_join` uses the union + ordered-window last-non-null trick:
  tag both inputs, union, and for each left row read the latest
  right row at or before its timestamp via `last(ignorenulls)` over
  a (by-keys, time, side) window. ONE shuffle on the by-keys; within
  a partition the sort is the window sort Spark would pay for any
  per-key ordering. Right rows sort before left rows at equal
  timestamps, giving `r.ts <= l.ts` semantics exactly.
- `bucketed_range_join` turns the non-equi |l.ts - r.ts| <= tol
  predicate into an equi-join: each left row probes the 2-3
  tolerance-width time buckets its window can touch, the right side
  maps to its single bucket, and the bucket equi-join + exact
  refinement filter replaces the O(n*m) cross product. At 10^12
  rows the join is as balanced as the event-time distribution —
  bucket width == tolerance bounds fan-out at 3x left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "bucketed_range_join"]


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: tuple[str, ...] = ("user_id",)) -> DataFrame:
    """For each left row, append the columns of the latest right row
    with `right.on <= left.on` within the same `by` group (NULLs if
    none). Right value columns are packed into ONE struct before the
    window fill so they always come from the SAME right row even if
    some right values are NULL. Precondition: (by, on) unique on the
    right — equal-timestamp right rows within a group have no defined
    order."""
    rvals = [c for c in right.columns if c not in {*by, on}]
    if not rvals:
        # 'struct<>' is unparsable — fail with intent instead of an
        # analysis error deep in the plan (ADVICE r3)
        raise ValueError(
            "asof_join: right side carries no value columns beyond "
            f"by={by!r} and on={on!r}; nothing to append")
    rstruct_t = "struct<" + ",".join(
        f"{f.name}:{f.dataType.simpleString()}"
        for f in right.schema if f.name in rvals) + ">"
    lcols = left.columns
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct_t).alias("_r"))
    r = right.select(
        *by, on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in {*by, on}],
        F.lit(0).alias("_side"),
        F.struct(*rvals).alias("_r"))
    u = l.unionByName(r)
    w = (Window.partitionBy(*by).orderBy(on, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(c) for c in rvals])


def bucketed_range_join(left: DataFrame, right: DataFrame,
                        tolerance_us: int, l_on: str = "ts",
                        r_on: str = "ts") -> DataFrame:
    """All (left, right) pairs with |left.l_on - right.r_on| <=
    tolerance (inclusive), as left rows + right columns, matched rows
    only — aggregate with a LEFT semantics wrapper if zero-match left
    rows must survive (see the range_join query for the pattern).
    Right columns must not collide with left's (rename first)."""
    # unix_micros needs TIMESTAMP; NTZ inputs are cast — the session-tz
    # offset shifts every value uniformly, so deltas and the bucket ⊇
    # window containment are unaffected
    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    wdt = F.lit(tolerance_us)
    lb = left.withColumn(
        "_b", F.explode(F.sequence(F.floor((us(l_on) - wdt) / wdt),
                                   F.floor((us(l_on) + wdt) / wdt))))
    rb = right.withColumn("_b", F.floor(us(r_on) / wdt))
    return (
        lb.join(rb, "_b")
        .filter(F.abs(us(l_on) - us(r_on)) <= wdt)
        .drop("_b")
    )
