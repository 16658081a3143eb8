"""incremental_pagerank semantics on crafted inputs: a third,
independent implementation (pure-Python dict sweep) checked against
the Spark delta path, with doc ids SEARCHED so the nasty cases are
guaranteed present:

- a batch edge that duplicates an existing corpus edge (must merge to
  one edge, and its src's degree must NOT double-count),
- a batch-only src and dst host (is_new=True, zero prior rank, still
  receives teleport mass renormalized to the merged host count),
- untouched corpus srcs whose contributions must carry over exactly.

The DuckDB oracle already proves delta == direct merged sweep on the
real tables at three scales; this test proves the SPEC itself on
inputs where every branch is exercised.
"""

from __future__ import annotations

import hashlib


def _dst(doc_id: int, j: int) -> int:
    h = hashlib.md5(f"lk:{doc_id}:{j}".encode()).hexdigest()
    return int(h[:15], 16) % 97


def _edges(ids):
    return {(i % 97, _dst(i, j)) for i in ids for j in (1, 2, 3)}


def _find_ids():
    """Small doc-id sets with a guaranteed corpus/batch duplicate edge
    and a guaranteed batch-only host."""
    corpus = [1, 2, 3]  # srcs 1,2,3 (ids % 5 != 4)
    ec = _edges(corpus)
    hosts_c = {s for s, _ in ec} | {d for _, d in ec}
    dup_batch = None
    for k in range(1, 400):
        b = 1 + 97 * k  # same src host as doc 1
        if b % 5 != 4:
            continue
        if any((b % 97, _dst(b, j)) in ec for j in (1, 2, 3)):
            dup_batch = b
            break
    assert dup_batch is not None
    new_batch = None
    for b in range(4, 40000, 5):  # ids ≡ 4 (mod 5)
        if b % 97 in hosts_c or b % 97 == dup_batch % 97:
            continue
        if all(_dst(b, j) not in hosts_c for j in (1, 2, 3)):
            new_batch = b
            break
    assert new_batch is not None
    return corpus, [dup_batch, new_batch]


def _brute_force(corpus_ids, batch_ids):
    ec, eb = _edges(corpus_ids), _edges(batch_ids)
    em = ec | eb
    hosts_c = {s for s, _ in ec} | {d for _, d in ec}
    hosts_m = {s for s, _ in em} | {d for _, d in em}
    deg_c, deg_m = {}, {}
    for s, _ in ec:
        deg_c[s] = deg_c.get(s, 0) + 1
    for s, _ in em:
        deg_m[s] = deg_m.get(s, 0) + 1
    pr0 = 10**12 // len(hosts_c)
    p1 = {h: 150 * 10**9 // len(hosts_c) for h in hosts_c}
    for s, d in ec:
        p1[d] += (pr0 * 85) // (deg_c[s] * 100)
    pr2 = {h: 150 * 10**9 // len(hosts_m) for h in hosts_m}
    for s, d in em:
        pr2[d] += (p1.get(s, 0) * 85) // (deg_m[s] * 100)
    return {f"host{h}.example": (pr2[h], h not in hosts_c) for h in hosts_m}


def test_delta_sweep_matches_brute_force_on_crafted_edges(spark, tmp_path):
    from ocr_service_spark.queries import QUERIES

    corpus_ids, batch_ids = _find_ids()
    # structural guarantees the search promised
    assert _edges(corpus_ids) & _edges(batch_ids)  # duplicate edge
    hosts_c = {s for s, _ in _edges(corpus_ids)} | {
        d for _, d in _edges(corpus_ids)}
    assert batch_ids[1] % 97 not in hosts_c  # batch-only src host

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i,) for i in corpus_ids + batch_ids], "doc_id long"
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        r.host: (r.pr_scaled, r.is_new)
        for r in QUERIES["incremental_pagerank"](spark, sf).collect()
    }
    assert got == _brute_force(corpus_ids, batch_ids)
    assert any(is_new for _, is_new in got.values())
    assert any(not is_new for _, is_new in got.values())
