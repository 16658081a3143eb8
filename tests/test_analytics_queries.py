"""Semantic pins for the skew-observability + search tier queries
(host_stats / tfidf_keywords / price_histogram) — properties the
DuckDB value-hash gate can't express: flag exactness at the threshold,
rank bounds, bin containment."""

import pyspark.sql.functions as F

from ocr_service_spark.queries import host_stats, price_histogram, tfidf_keywords

SF = "/root/testdata/sf0.001"


def test_host_stats_detects_planted_skew(spark):
    rows = host_stats(spark, SF).collect()
    heavy = {r.host for r in rows if r.heavy}
    assert heavy == {"mega.example", "mid.example"}, heavy
    # shares partition the corpus exactly
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-2
    total = sum(r.n_docs for r in rows)
    for r in rows:
        # integer-exact threshold: heavy <=> n*20 >= total (share >= 5%)
        assert r.heavy == (r.n_docs * 20 >= total)


def test_tfidf_top3_ranked_and_bounded(spark):
    rows = tfidf_keywords(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert 1 <= len(doc_rows) <= 3
        doc_rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        # ordering is integer-exact: tf desc, then df asc, then term asc
        keys = [(-r.tf, r.df, r.term) for r in doc_rows]
        assert keys == sorted(keys)
        for r in doc_rows:
            assert r.tfidf > 0


def test_price_histogram_bins_partition_the_table(spark):
    rows = price_histogram(spark, SF).collect()
    n_lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == n_lineitem
    assert len({r.bin for r in rows}) == len(rows)
    for r in rows:
        assert r.lo == r.bin * 5500
        assert r.lo <= r.min_price <= r.max_price < r.lo + 5500
        assert r.lo <= r.avg_price < r.lo + 5500
