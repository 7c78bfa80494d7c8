"""Deterministic synthetic web corpus (FIXTURES.md §1-4, §9).

Seeded, wall-clock-free generation of the Common-Crawl-style ``pages``
universe plus ``seeds`` / ``robots`` / ``politeness`` / ``fetch_failures``
fixtures. Identical (seed, scale) inputs produce identical bytes. Pure
pandas/numpy so the oracle can consume the corpus without a SparkSession;
``write_corpus`` materializes parquet for the Spark side (same frames).

The corpus plays the role of the remote Ethereum node (reference:
internal/infrastructure/blockchain/ethereum_service.go:142-185
GetBlockByNumber): a "fetch" is a join of the popped batch against this
table. Host sizes are Zipfian (s=1.2) so the top host holds ~15-20% of
pages — the hot-key skew the salted-host repartition must handle
(SURVEY.md §4.2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ethereum_raw_data_crawler_spark.config import EPOCH
from ethereum_raw_data_crawler_spark.functions.extract import extract_text
from ethereum_raw_data_crawler_spark.functions.urls import canonicalize_url

_WORDS = (
    "data spark crawl frontier fetch page host queue batch round robot "
    "budget retry token shuffle partition snapshot commit resume trace "
    "bloom filter anti join window rank priority seed link text parse "
    "schedule worker metric lineage skew salt broadcast prune scan merge "
    "append order hash byte arrow vector column row table"
).split()

_LANGS = ("en", "de", "vi")
_LANG_P = (0.8, 0.1, 0.1)


@dataclass(frozen=True)
class Scale:
    hosts: int
    pages_per_host: int  # average; actual per-host counts are Zipfian

    @property
    def total_pages(self) -> int:
        return self.hosts * self.pages_per_host


T1 = Scale(hosts=10, pages_per_host=50)      # smoke (~500 rows)
T2 = Scale(hosts=50, pages_per_host=200)     # correctness (~10k rows)
BENCH = Scale(hosts=500, pages_per_host=2000)  # bench (~1M rows)


def _host_counts(scale: Scale) -> np.ndarray:
    """Zipf(s=1.2) page counts per host, summing ~= total_pages."""
    ranks = np.arange(1, scale.hosts + 1, dtype=np.float64)
    w = ranks ** -1.2
    w /= w.sum()
    counts = np.maximum(1, np.round(w * scale.total_pages)).astype(np.int64)
    return counts


def hostname(h: int) -> str:
    return f"host{h}.example"


def base_url(h: int, i: int) -> str:
    return f"https://{hostname(h)}/p/{i}"


def gen_pages(scale: Scale, seed: int = 42) -> pd.DataFrame:
    """The pages universe. Columns exactly per input_hint:
    (url, warc_ts, html:binary, text, lang)."""
    rng = np.random.default_rng(seed)
    counts = _host_counts(scale)

    # Universe of base canonical urls, host-major order, for outlink draws.
    universe: list[str] = []
    host_idx: list[int] = []
    for h in range(1, scale.hosts + 1):
        c = int(counts[h - 1])
        universe.extend(base_url(h, i) for i in range(c))
        host_idx.extend([h] * c)
    n = len(universe)

    # Vectorized draws, one batch per attribute (fixed draw order = determinism).
    tracking = rng.random(n) < 0.05
    uppercase = rng.random(n) < 0.02
    malformed = rng.random(n) < 0.01
    n_links = rng.integers(0, 9, size=n)
    n_words = rng.integers(20, 61, size=n)
    lang = rng.choice(len(_LANGS), size=n, p=_LANG_P)
    track_k = rng.integers(0, 100, size=n)
    word_pool = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    link_pool = rng.integers(0, n, size=int(n_links.sum()))

    urls, htmls, texts = [], [], []
    wpos = 0
    lpos = 0
    page_i = 0
    for h in range(1, scale.hosts + 1):
        c = int(counts[h - 1])
        for i in range(c):
            j = page_i
            url = base_url(h, i)
            if tracking[j]:
                url = f"{url}?utm_source=t{track_k[j]}"
            if uppercase[j]:
                url = url.replace("https://", "HTTPS://").replace(
                    hostname(h), hostname(h).upper()
                )
            body = " ".join(
                _WORDS[k] for k in word_pool[wpos : wpos + int(n_words[j])]
            )
            wpos += int(n_words[j])
            links = "".join(
                f'<a href="{universe[k]}">l{k}</a>'
                for k in link_pool[lpos : lpos + int(n_links[j])]
            )
            lpos += int(n_links[j])
            html = (
                f"<html><head><title>{h}/{i}</title></head>"
                f"<body>{body}{links}</body></html>"
            ).encode("utf-8")
            if malformed[j]:
                html = html[: int(len(html) * 0.8)]
            urls.append(url)
            htmls.append(html)
            texts.append(extract_text(html))
            page_i += 1

    warc_ts = pd.Series(
        pd.Timestamp(EPOCH).tz_localize(None)
        + pd.to_timedelta(np.arange(n) * 7, unit="s")
    ).dt.tz_localize("UTC")
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": [_LANGS[k] for k in lang],
        }
    )


def gen_seeds(scale: Scale, seed: int = 42) -> pd.DataFrame:
    """First page of each of the first ceil(H/2) hosts, plus 5 duplicates
    and 3 non-canonical variants (dedup must collapse them)."""
    n_seed_hosts = math.ceil(scale.hosts / 2)
    rows = []
    for k, h in enumerate(range(1, n_seed_hosts + 1)):
        rows.append((base_url(h, 0), 0 if k < 10 else 1))
    rows.extend(rows[:5])  # 5 exact duplicates
    # 3 non-canonical variants of already-listed seeds
    u1, p1 = rows[0]
    rows.append((u1.replace("https://", "HTTPS://"), p1))
    if n_seed_hosts >= 2:
        u2, p2 = rows[1]
        rows.append((u2 + "?utm_campaign=x", p2))
    if n_seed_hosts >= 3:
        u3, p3 = rows[2]
        rows.append((u3.replace(".example/", ".example:443/"), p3))
    return pd.DataFrame(rows, columns=["url", "priority"]).astype(
        {"priority": "int32"}
    )


def gen_robots(scale: Scale, seed: int = 42) -> pd.DataFrame:
    """allowed=false for every 13th host; disallow_prefix=/p/99 for every
    7th (the robots gate — reference analog: SkipReceipts, config.go:41)."""
    rows = [
        (
            hostname(h),
            h % 13 != 0,
            "/p/99" if h % 7 == 0 else None,
        )
        for h in range(1, scale.hosts + 1)
    ]
    return pd.DataFrame(rows, columns=["host", "allowed", "disallow_prefix"])


def gen_politeness(scale: Scale, seed: int = 42) -> pd.DataFrame:
    """budget_per_round: 2 for the hot top-5 hosts, else 5; per (host,
    round), no carry-over (SURVEY.md §7 known-hard #3)."""
    rows = [
        (hostname(h), 2 if h <= 5 else 5) for h in range(1, scale.hosts + 1)
    ]
    return pd.DataFrame(rows, columns=["host", "budget_per_round"]).astype(
        {"budget_per_round": "int32"}
    )


def gen_fetch_failures(scale: Scale, seed: int = 42) -> pd.DataFrame:
    """1% of URLs fail their 1st fetch attempt (succeed on retry); 0.2%
    fail attempts 1-3 (must transition to skip_until, then recover) —
    mirrors the failedBlocks/skippedBlocks machine (reference:
    scheduler_service.go:324-357)."""
    rng = np.random.default_rng(seed + 1)
    counts = _host_counts(scale)
    universe = []
    for h in range(1, scale.hosts + 1):
        universe.extend(
            canonicalize_url(base_url(h, i)) for i in range(int(counts[h - 1]))
        )
    n = len(universe)
    r = rng.random(n)
    rows = []
    for j in range(n):
        if r[j] < 0.002:
            rows.append((universe[j], [1, 2, 3]))
        elif r[j] < 0.012:
            rows.append((universe[j], [1]))
    return pd.DataFrame(rows, columns=["url_canon", "fail_attempts"])


def gen_all(scale: Scale, seed: int = 42) -> dict[str, pd.DataFrame]:
    return {
        "pages": gen_pages(scale, seed),
        "seeds": gen_seeds(scale, seed),
        "robots": gen_robots(scale, seed),
        "politeness": gen_politeness(scale, seed),
        "fetch_failures": gen_fetch_failures(scale, seed),
    }


def write_corpus(out_dir: str, scale: Scale, seed: int = 42) -> dict[str, str]:
    """Materialize the corpus as parquet (one file per table) for the
    Spark side. Returns {table: path}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, pdf in gen_all(scale, seed).items():
        path = os.path.join(out_dir, f"{name}.parquet")
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        # Spark cannot read TIMESTAMP(NANOS) parquet — coerce ns -> us
        fields = [
            f.with_type(pa.timestamp("us", tz=f.type.tz))
            if pa.types.is_timestamp(f.type)
            else f
            for f in table.schema
        ]
        table = table.cast(pa.schema(fields))
        pq.write_table(table, path)
        paths[name] = path
    return paths
