"""Corpus-construction tier: connected components, benchmark
decontamination, URL normalization/filtering."""

import os

import pyspark.sql.functions as F

from ocr_service_spark.operators.dedup import connected_components
from ocr_service_spark.queries import QUERIES


def test_connected_components_chain_and_singleton_free(spark):
    # chain 1-2-3-4 (diameter 3 forces >1 propagation sweep), pair
    # 10-11, and an isolated edgeless node never appears
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long")
    out = {r.id: r.label for r in connected_components(edges, "a", "b").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_chain_log_rounds(spark):
    # large-star/small-star must crack a diameter-256 chain in
    # O(log^2 n) rounds, not O(diameter) sweeps (VERDICT r3 item 4).
    # Chain node ids shuffled via a fixed permutation so the min is in
    # the middle, not an endpoint.
    n = 256
    perm = [(i * 181) % n for i in range(n)]  # 181 coprime with 256
    edges = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)], "a long, b long")
    stats = {}
    out = {r.id: r.label
           for r in connected_components(edges, "a", "b", stats=stats).collect()}
    assert set(out.values()) == {0}
    assert len(out) == n
    assert stats["rounds"] <= 12, stats  # log2(256)=8; label-prop needs ~128


def test_connected_components_self_loop_only_node(spark):
    edges = spark.createDataFrame(
        [(1, 2), (9, 9), (2, 2)], "a long, b long")
    out = {r.id: r.label for r in connected_components(edges, "a", "b").collect()}
    assert out == {1: 1, 2: 1, 9: 9}


def test_connected_components_merges_two_chains(spark):
    # two chains that share a node collapse to one component
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (100, 7), (100, 101)], "a long, b long")
    out = {r.id: r.label for r in connected_components(edges, "a", "b").collect()}
    assert set(out.values()) == {5}
    assert len(out) == 5


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_flags_planted_overlap(spark, tmp_path):
    # doc 97*0=0 is "eval"; doc 1 copies a 3-gram from it, doc 2 shares
    # nothing, doc 3 is a full copy of the eval doc
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "src0", 30),
        (1, "x y alpha beta gamma z", "en", "src0", 22),
        (2, "totally disjoint words here", "en", "src0", 27),
        (3, "alpha beta gamma delta epsilon", "en", "src0", 30),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r.n_hits for r in QUERIES["decontaminate"](spark, sf).collect()}
    assert set(out) == {1, 3}
    assert out[1] == 1  # only 'alpha beta gamma' is an eval 3-gram
    assert out[3] == 3  # all three 3-grams of the copied sentence


def test_url_filter_normalization_branches(spark, tmp_path):
    rows = [
        # id 0: http + :80 (strip) + /index.html/ (trailing / strip,
        #       .html kept) + utm params scrubbed + fragment strip
        (0, "t", "en", "srcA", 1),
        # id 1: https + :443 (strip) + /img.JPG → keep=False (media ext)
        (1, "t", "en", "srcA", 1),
        # id 2: http + :8080 kept
        (2, "t", "en", "srcA", 1),
        # id 3: https, no port, no query, host src..3 → blocked host
        (3, "t", "en", "srcB", 1),
        # id 5: https + ?utm_medium=email only → query gone entirely
        (5, "t", "en", "srcA", 1),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in QUERIES["url_filter"](spark, sf).collect()}

    assert out[0].url_norm == "http://srca0.example.com/Docs/0/index.html?id=0"
    assert out[0].host == "srca0.example.com"
    assert out[0].keep is True

    assert out[1].url_norm == "https://srca1.example.com/Docs/1/img.JPG"
    assert out[1].keep is False  # .jpg case-insensitive

    assert out[2].url_norm.startswith("http://srca2.example.com:8080/")

    assert out[3].host == "srcb3.example.com"
    assert out[3].keep is False  # blocked host suffix

    assert out[5].url_norm == "https://srca0.example.com/Docs/5"
    assert "?" not in out[5].url_norm  # utm-only query fully scrubbed


def test_dup_clusters_invariants(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    rows = QUERIES["dup_clusters"](spark, sf).collect()
    assert rows, "sf0.01 corpus contains planted near-dups"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members), "label = min member id"
        assert all(m.cluster_size == len(members) for m in members)
        assert len(members) >= 2, "no singleton clusters (edges only)"


def test_corpus_build_composition_invariants(spark):
    sf = "/root/testdata/sf0.01"
    out = QUERIES["corpus_build"](spark, sf).collect()
    assert out, "pipeline keeps a non-trivial corpus at sf0.01"
    ids = {r.doc_id for r in out}

    kept_urls = {r.doc_id for r in QUERIES["url_filter"](spark, sf).collect()
                 if r.keep}
    assert ids <= kept_urls, "every survivor passed the URL gate"

    noncanon = {r.doc_id for r in QUERIES["dup_clusters"](spark, sf).collect()
                if r.doc_id != r.cluster_id}
    assert not ids & noncanon, "non-canonical dup members dropped"

    contaminated = {r.doc_id for r in QUERIES["decontaminate"](spark, sf).collect()}
    assert not ids & contaminated, "contaminated docs dropped"
    assert not {i for i in ids if i % 97 == 0}, "eval split excluded"

    splits = {r.split for r in out}
    assert splits <= {"train", "valid", "test"}


def test_connected_components_partition_invariance(spark):
    # labels must not depend on physical layout (north rule: results
    # invariant across cluster sizes)
    rows = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (21, 22)]
    e3 = spark.createDataFrame(rows, "a long, b long").repartition(3)
    e11 = spark.createDataFrame(rows, "a long, b long").repartition(11)
    out3 = sorted((r.id, r.label) for r in connected_components(e3, "a", "b").collect())
    out11 = sorted((r.id, r.label) for r in connected_components(e11, "a", "b").collect())
    assert out3 == out11


def test_connected_components_empty_edges(spark):
    e = spark.createDataFrame([], "a long, b long")
    assert connected_components(e, "a", "b").count() == 0
