"""kernel/links.py unit tests: the anchor extractor must survive the
same hostility the main extractor does (traps mirror what the
link_graph oracle gates end-to-end)."""

from ocr_service_spark.kernel.links import extract_links


def test_basic_anchor_with_entity_and_nested_markup():
    html = b'<a href="https://h.example/p">ref &amp; <b>bold</b> 5</a>'
    assert extract_links(html) == [("https://h.example/p", "ref & bold 5")]


def test_script_rawtext_is_never_a_link():
    html = (b"<script>var s = '<a href=\"https://evil.example/\">x</a>';"
            b"</script><a href=\"https://ok.example/\">ok</a>")
    assert extract_links(html) == [("https://ok.example/", "ok")]


def test_href_less_anchor_is_a_target_not_a_link():
    assert extract_links(b'<a name="top">jump target</a>') == []


def test_implicit_close_on_new_anchor():
    html = b"<a href='a'>one<a href='b'>two</a>"
    assert extract_links(html) == [("a", "one"), ("b", "two")]


def test_truncated_doc_flushes_open_anchor():
    assert extract_links(b"<a href='x'>cut off mid-anchor") == [
        ("x", "cut off mid-anchor")]


def test_unquoted_href_and_garbage_prefix():
    assert extract_links(b"\xff\xfe junk <a href=u>unquoted</a>") == [
        ("u", "unquoted")]


def test_empty_and_none_payloads():
    assert extract_links(b"") == []
    assert extract_links(None) == []


def test_whitespace_normalization_inside_anchor():
    html = b"<a href='h'>  spread\t\nacross   lines </a>"
    assert extract_links(html) == [("h", "spread across lines")]


def test_charset_sniff_applies_to_anchor_text():
    # cp1251 anchor text round-trips through the M3 charset sniff
    body = ('<html><head><meta charset="windows-1251"></head><body>'
            '<a href="/x">Привет мир</a></body></html>').encode("cp1251")
    assert extract_links(body) == [("/x", "Привет мир")]
