"""HTML text + outlink extraction.

The engine analogue of the reference's payload normalization
(reference: internal/infrastructure/blockchain/ethereum_service.go:421-456
convertBlock — raw RPC payload -> typed row; :318-325 sanitizeData —
bytes -> UTF-8-safe string). The ``input_hint`` invariant: extracted text
must be **byte-identical per url** between the Spark path and the oracle —
guaranteed by sharing this exact pure function, asserted bytewise in tests.

Implementation: stdlib ``html.parser.HTMLParser`` (tolerant of malformed
markup — the fixture injects ~1% truncated documents), script/style
contents dropped, character references decoded, whitespace collapsed to
single spaces. No locale-dependent operations, no wall clock.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

_SKIP_CONTENT = {"script", "style", "noscript", "template"}


class _TextAndLinks(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def _parse(html: bytes | str | None) -> _TextAndLinks:
    parser = _TextAndLinks()
    if html is None:
        return parser
    if isinstance(html, (bytes, bytearray, memoryview)):
        text = bytes(html).decode("utf-8", errors="replace")
    else:
        text = html
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        # Total function: malformed input yields whatever was parsed so far.
        pass
    return parser


def extract_text(html: bytes | str | None) -> str:
    """Visible text of ``html``: tag-stripped, entity-decoded,
    whitespace-collapsed. Deterministic, total, pure."""
    parsed = _parse(html)
    return " ".join(" ".join(parsed.chunks).split())


def extract_page(html, base: str) -> tuple[str, list[str]]:
    """One parse: (visible text, per-doc-deduped CANONICAL outlinks) —
    shared verbatim by the Spark UDF and the oracle, so it is the binding
    definition of a page's extraction."""
    from ethereum_raw_data_crawler_spark.functions.urls import canonicalize_url

    parsed = _parse(html)
    text = " ".join(" ".join(parsed.chunks).split())
    seen: dict[str, None] = {}
    for href in parsed.links:
        try:
            absolute = urljoin(base, href) if base else href
        except ValueError:
            continue
        c = canonicalize_url(absolute)
        if c is not None:
            seen[c] = None
    return text, list(seen)


def extract_links(html: bytes | str | None, base_url: str | None = None) -> list[str]:
    """``<a href>`` targets of ``html`` resolved against ``base_url``,
    in document order, duplicates preserved (dedup is the frontier's job —
    reference dedups at the store via unique index, mongodb.go:86-92)."""
    parsed = _parse(html)
    if base_url is None:
        return parsed.links
    out = []
    for href in parsed.links:
        try:
            out.append(urljoin(base_url, href))
        except ValueError:
            continue
    return out
