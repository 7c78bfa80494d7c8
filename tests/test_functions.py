"""Unit tests: URL canonicalizer + HTML extractor (SURVEY.md §5.2 item 3).

Mirrors the reference's unit-test focus on the per-message conversion
path (reference: websocket_scheduler_test.go:119-168 — hex parse +
invalid-message robustness)."""

import pytest
from hypothesis import given, strategies as st

from ethereum_raw_data_crawler_spark.functions.extract import extract_links, extract_text
from ethereum_raw_data_crawler_spark.functions.urls import (
    canonicalize_url,
    host_of,
    path_of,
    url_hash64,
)


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTPS://HOST1.EXAMPLE/p/0", "https://host1.example/p/0"),
        ("https://host1.example/p/0?utm_source=x", "https://host1.example/p/0"),
        ("https://host1.example/p/0?b=2&a=1", "https://host1.example/p/0?a=1&b=2"),
        ("https://host1.example:443/p/0", "https://host1.example/p/0"),
        ("http://host1.example:80/", "http://host1.example/"),
        ("http://host1.example:8080/x", "http://host1.example:8080/x"),
        ("https://host1.example/a/../b/./c", "https://host1.example/b/c"),
        ("https://host1.example/%7Euser/%2fx", "https://host1.example/~user/%2Fx"),
        ("https://host1.example", "https://host1.example/"),
        ("https://host1.example/p#frag", "https://host1.example/p"),
        ("https://host1.example/p?gclid=1&ref=z&keep=1",
         "https://host1.example/p?keep=1"),
        ("https://user:pw@host1.example/p", "https://host1.example/p"),
        ("https://host1.example./p", "https://host1.example/p"),
        # canon v3 (hypothesis-found): a trailing ';' must not shield a
        # final dot segment — urljoin drops the ';' first, then resolves
        ("http://0/.;", "http://0/"),
        ("https://host1.example/a/..;", "https://host1.example/"),
        ("https://host1.example/a;", "https://host1.example/a"),
    ],
)
def test_canonicalize(raw, canon):
    assert canonicalize_url(raw) == canon


@pytest.mark.parametrize("raw", ["ftp://h/x", "not a url", "", None, "mailto:a@b"])
def test_canonicalize_rejects(raw):
    assert canonicalize_url(raw) is None


@pytest.mark.parametrize(
    "raw, canon",
    [
        # \Z-anchor regression (canon v3 fix): $ matched before a trailing
        # newline, so these took the FAST path keeping the \n on pass 1
        # and lost it via urlsplit's \t\r\n strip on pass 2 — key drift
        ("https://um\n", "https://um/"),
        ("http://gq\n", "http://gq/"),
        ("https://9\n/p", "https://9/p"),
        ("https://a\nb/p", "https://ab/p"),  # inner newline: urlsplit strip
    ],
)
def test_canonicalize_newline_idempotent(raw, canon):
    assert canonicalize_url(raw) == canon
    assert canonicalize_url(canon) == canon


def test_canonicalize_idempotent_on_fixture_urls():
    from ethereum_raw_data_crawler_spark.sources import synth

    for u in synth.gen_pages(synth.T1)["url"]:
        c = canonicalize_url(u)
        assert c is not None
        assert canonicalize_url(c) == c


@given(st.text(max_size=200))
def test_canonicalize_total(s):
    """Total function: never raises, output is canonical or None."""
    c = canonicalize_url(s)
    if c is not None:
        assert canonicalize_url(c) == c
        assert host_of(c)
        assert path_of(c).startswith("/")


def test_url_hash_is_stable_signed_64():
    h = url_hash64("https://host1.example/p/0")
    assert isinstance(h, int)
    assert -(2**63) <= h < 2**63
    assert h == url_hash64("https://host1.example/p/0")
    assert h != url_hash64("https://host1.example/p/1")


def test_url_hash_bit_exact_with_spark_xxhash64(spark):
    """The oracle's pure-Python hash and the engine's JVM-side F.xxhash64
    must agree bit-for-bit (the engine's dedup correctness rides on it)."""
    import random

    from pyspark.sql import functions as F

    random.seed(2)
    urls = [f"https://host{i}.example/p/{i}" for i in range(50)] + [
        "".join(random.choice("abc0…%/?=.-_~:") for _ in range(random.randint(1, 100)))
        for _ in range(500)
    ] + ["", "a" * 31, "b" * 32, "c" * 33, "d" * 100]
    df = spark.createDataFrame([(u,) for u in urls], "s string")
    got = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()]
    want = [url_hash64(u) for u in urls]
    assert got == want


def test_extract_text_basic():
    html = (
        b"<html><head><title>t</title><style>x{}</style></head>"
        b"<body>hello <b>world</b> &amp; more<script>no()</script></body></html>"
    )
    assert extract_text(html) == "t hello world & more"


def test_extract_text_malformed_total():
    assert isinstance(extract_text(b"<html><body>abc<a hre"), str)
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert isinstance(extract_text(b"\xff\xfe garbage <b>x"), str)


@given(st.binary(max_size=400))
def test_extract_text_never_raises(b):
    assert isinstance(extract_text(b), str)


def test_extract_links_resolves_relative():
    html = b'<a href="/p/3">x</a><a href="https://other.example/q">y</a><a name="no"></a>'
    assert extract_links(html, "https://host1.example/p/0") == [
        "https://host1.example/p/3",
        "https://other.example/q",
    ]


# ---------------------------------------------------------------------------
# fast-path pins: the canonicalizer's already-canonical shortcut and the
# extractor's urljoin skip must be exactly equivalent to the slow paths
# ---------------------------------------------------------------------------

def _slow_canonicalize(url):
    """The full (pre-fast-path) canonicalization pipeline, inlined here as
    the behavioral reference."""
    import ethereum_raw_data_crawler_spark.functions.urls as U

    m = U._FAST_CANON
    try:
        U._FAST_CANON = type("never", (), {"match": staticmethod(lambda s: None)})
        return U.canonicalize_url(url)
    finally:
        U._FAST_CANON = m


_URL_ALPHABET = list("abcZ019-._~!$&'()*+,;=:@/%2F?#uthp:")


@given(st.text(alphabet=_URL_ALPHABET, max_size=40))
def test_canonical_fast_path_equivalence(tail):
    for prefix in ("https://host1.example", "http://Host2.EXAMPLE:80", "https://h"):
        u = prefix + tail
        assert canonicalize_url(u) == _slow_canonicalize(u), u


def test_canonical_fast_path_equivalence_fixture():
    from ethereum_raw_data_crawler_spark.sources import synth

    pages = synth.gen_pages(synth.T1)
    for u in pages["url"]:
        assert canonicalize_url(u) == _slow_canonicalize(u)
    for variant in (
        "https://h.example/a/../b", "https://h.example/.hidden/x",
        "https://h.example/a/./b", "https://h.example/a/..", "https://h.example/.",
        "https://h.example", "https://h.example/p?a=1", "https://h.example/p%41",
        "https://h.example./p", "https://h-.example/p", "https://h.example/a//b",
    ):
        assert canonicalize_url(variant) == _slow_canonicalize(variant), variant


@given(st.text(alphabet=_URL_ALPHABET, max_size=30))
def test_absolute_href_urljoin_skip_equivalence(tail):
    """canonicalize(urljoin(base, href)) == canonicalize(href) for
    absolute http(s) hrefs — the premise of extract_page's skip."""
    from urllib.parse import urljoin

    for scheme in ("http://", "https://"):
        href = scheme + tail
        from ethereum_raw_data_crawler_spark.functions.extract import _ABS_HTTP
        if not _ABS_HTTP.match(href):
            continue
        for base in ("https://base.example/dir/page", "http://b.example/"):
            try:
                joined = urljoin(base, href)
            except ValueError:
                continue
            assert canonicalize_url(joined) == canonicalize_url(href), (base, href)
