"""Golden-pair test: kernel output must byte-match the corpus
generator's independently computed expected text (FIXTURES.md §5 —
the assertion the reference implied but never made, SURVEY.md §5.1)."""

from ocr_service_spark.corpus import gen_docs
from ocr_service_spark.kernel.dispatch import extract_document

N = 150


def test_kernel_matches_generator_expectations():
    docs = gen_docs(N)
    checked = 0
    kinds = set()
    for d in docs:
        res = extract_document(d.html)
        kinds.add(d.kind)
        if d.kind == "malformed":
            # must not raise; text may be partial or error
            continue
        assert res.error is None, f"doc {d.doc_id}: {res.error}"
        assert res.text == d.expected_text, (
            f"doc {d.doc_id} ({d.kind}) mismatch:\n"
            f"got: {res.text[:400]!r}\nexp: {d.expected_text[:400]!r}"
        )
        checked += 1
    assert checked >= N * 0.9
    assert {"html", "pdf", "malformed"} <= kinds


def test_corpus_has_engineered_properties():
    docs = gen_docs(N)
    urls = [d.url for d in docs]
    assert len(set(urls)) < len(urls), "duplicates present"
    hosts = [u.split("/")[2] for u in urls]
    big = sum(1 for h in hosts if h == "big0.example")
    assert big > N * 0.2, "host skew present"
    assert any(d.kind == "pdf" for d in docs)
    # charset diversity
    assert any(b"windows-1251" in d.html[:200] for d in docs if d.kind == "html")


def test_determinism():
    a = gen_docs(40)
    b = gen_docs(40)
    for x, y in zip(a, b):
        assert x.html == y.html and x.url == y.url and x.warc_ts == y.warc_ts
