"""Anchor/link extraction kernel: payload bytes -> [(href, text)].

The link-graph product of a Common-Crawl-style pipeline: host-level
edges feed crawl-frontier ranking and host-quality priors (the same
role the reference's field extractors play for its documents —
core/processor.py field pipeline — re-aimed at web link structure).

Deliberately separate from the extraction hot path: extract_html's
fused tokenizer discards attributes by design (extract_html.py:216),
so this module drives stdlib html.parser — the same behavioral
reference the fast extractor is A/B-tested against — and captures
every <a href=...> together with the anchor's flattened, normalized
text. html.parser's rawtext handling means an '<a href=...>' inside a
<script> string is NEVER reported as a link. Never raises on
malformed HTML.
"""

from __future__ import annotations

from html.parser import HTMLParser

from ocr_service_spark.kernel.extract_html import sniff_charset

__all__ = ["extract_links"]


class _AnchorParser(HTMLParser):
    """Collect (href, normalized anchor text) pairs.

    Anchors without an href attribute are skipped (they are named
    targets, not links). Nested markup inside the anchor is flattened
    into its text; entities arrive decoded (convert_charrefs). A start
    <a> while one is open implicitly closes the open one (HTML5), and
    a document truncated inside an <a> still flushes at close().
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._texts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            if self._href is not None:
                self._flush()
            href = next((v for k, v in attrs if k == "href"), None)
            if href is not None:
                self._href = href
                self._texts = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._href is not None:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None and data:
            self._texts.append(data)

    def _flush(self) -> None:
        text = " ".join("".join(self._texts).split())
        self.links.append((self._href, text))
        self._href, self._texts = None, []

    def close(self) -> None:
        super().close()
        if self._href is not None:
            self._flush()


def extract_links(raw: bytes | None) -> list[tuple[str, str]]:
    """bytes -> [(href, anchor_text)], charset-sniffed (M3), in
    document order. Empty/None payloads and parser blowups yield []."""
    if not raw:
        return []
    text = raw.decode(sniff_charset(raw), errors="replace")
    p = _AnchorParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass
    return p.links
