"""The fast HTML scanner must be event-identical to the HTMLParser
reference on everything it accepts, and must fall back (never guess) on
anything outside its subset — extracted text and links are byte-equal on
arbitrary inputs by construction."""

import numpy as np
import pytest

from ethereum_raw_data_crawler_spark.functions.extract import (
    _fast_parse,
    _parse,
    _parse_reference,
)


def _same(html) -> None:
    got = _parse(html)
    want = _parse_reference(html)
    assert got.chunks == want.chunks, (html, got.chunks, want.chunks)
    assert got.links == want.links, (html, got.links, want.links)


ADVERSARIAL = [
    "",
    "plain words only",
    "data with > alone",
    "x< y>z",
    "x<1digit>z",
    "a<a href=x>unquoted</a>",
    "<a href='single'>q</a>",
    "<A HREF=\"X\">upper</A>",
    "<br/>self<hr />close",
    "<script>var a = 1 < 2;</script>after",
    "<script/>not-skipped",
    "<style>p { color: red }</style>tail",
    "amp &amp; entity",
    "&#65; charref",
    "<!-- comment -->c",
    "<!DOCTYPE html><p>d</p>",
    "<?pi ?>e",
    "<p>unclosed",
    "<p>trail<",
    "<p>trail<a",
    '<p>trail<a href="ht',
    '<p>trail<a href="http://x/"',
    "<p>trail</bo",
    "nested <template><p>gone</p></template> kept",
    '<a href="">empty</a>',
    '<a href="x">l</a><a href="x">dup</a>',
    "é unicode <p>café</p>",
    # CDATA semantics: a same-name open tag inside script/style is raw
    # data to HTMLParser, not a nested element (ADVICE r2, medium)
    "<script>x<script>y</script>z</script>w",
    "<style>x<style>y</style>z</style>w",
    "<script>if (a<b) {}</script>tail",
    "<script></ script >ok",
    "<script></scriptfoo></script>ok",
    "<script></script x></script>k",
    "<script>never closed",
    "<noscript><script>x</script>hid</noscript>z",
    # handle_starttag fires inside skipped noscript/template subtrees, so
    # links there ARE collected by HTMLParser
    '<noscript><a href="http://x.example/">t</a></noscript>after',
    '<template><a href="http://t.example/">x</a></template>end',
    '<a href="http://l.example/"/>selfclosing',
]


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_adversarial_equivalence(html):
    _same(html)


def test_fast_path_taken_for_simple_corpus_shape():
    html = '<html><head><title>7/3</title></head><body>w1 w2<a href="https://h/p">l9</a></body></html>'
    assert _fast_parse(html) is not None
    _same(html)


def test_fallback_on_entities_and_comments():
    assert _fast_parse("a &amp; b") is None
    assert _fast_parse("<!-- c -->") is None
    assert _fast_parse("<a href='s'>x</a>") is None


def test_synth_corpus_equivalence_including_malformed():
    """Every t1 page (1% truncated mid-byte) parses identically, and the
    generator's stored text still matches the extractor."""
    from ethereum_raw_data_crawler_spark.functions.extract import extract_text
    from ethereum_raw_data_crawler_spark.sources import synth

    pages = synth.gen_pages(synth.T1)
    for html, text in zip(pages["html"], pages["text"]):
        _same(html)
        assert extract_text(html) == text


def test_random_truncations_equivalence():
    """Cutting a valid page at EVERY byte offset (the fixture's malformed
    mode, exhaustively) stays event-identical."""
    base = (
        '<html><head><title>9/9</title></head><body>alpha beta gamma'
        '<a href="https://host1.example/p/1">l1</a>'
        '<a href="https://host2.example/p/2?a=1">l2</a></body></html>'
    ).encode()
    for cut in range(len(base) + 1):
        _same(base[:cut])


def test_random_fuzz_equivalence():
    rng = np.random.default_rng(7)
    alphabet = list("<>/ab \"='&;#!?-x1")
    for _ in range(3000):
        s = "".join(rng.choice(alphabet, size=rng.integers(0, 60)))
        _same(s)


def test_cdata_structured_fuzz_equivalence():
    """Token-level fuzz biased toward script/style nesting, the CDATA
    corner the character fuzz above almost never reaches."""
    rng = np.random.default_rng(11)
    tokens = [
        "<script>", "</script>", "<style>", "</style>", "<script/>",
        "<noscript>", "</noscript>", "<template>", "</template>",
        '<a href="http://h/">', "</a>", "txt ", "< ", ">", "x",
        "</ script >", "</scripty>",
    ]
    for _ in range(3000):
        s = "".join(rng.choice(tokens, size=rng.integers(0, 12)))
        _same(s)
