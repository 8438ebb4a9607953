"""Deterministic synthetic `webpages` table (FIXTURES.md §1).

Common-Crawl-style pages: (url:string unique, warc_ts:timestamp[us],
html:binary 2% null, text:string 1% null + 0.5% empty-but-not-null,
lang:string).  Everything is a pure function of (row index, seed) so
any slice of the table can be regenerated independently — which is
what makes shard-parallel generation and resume verification work.

No wall clock, no unseeded RNG (seed fixed at 42 by default).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

WEBPAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary(), nullable=True),
        pa.field("text", pa.string(), nullable=True),
        pa.field("lang", pa.string(), nullable=False),
    ]
)

_LANGS = [
    "en", "de", "fr", "es", "zh", "ru", "pt", "ja", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "fi", "hu", "el", "da",
]

_WORDS = (
    "the of and to in is was for that with as his on be at by had not are "
    "but from or have an they which one you were all her she there would "
    "their we him been has when who will no more if out so up said what "
    "its about than into them can only other time new some could these two "
    "may first then do any like my now over such our man me even most made "
    "after also did many off before must well back through years where "
    "data web page site search index crawl archive content server network "
    "system model query engine stream column vector batch shuffle encode"
).split()


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def generate_webpages(
    n_rows: int,
    seed: int = SEED,
    start_row: int = 0,
    html_tail: bool = False,
) -> pa.Table:
    """Generate rows [start_row, start_row + n_rows) of the webpages table.

    Deterministic per absolute row index: ``generate_webpages(100)`` ==
    concat of two 50-row slices.  ``html_tail`` enables the heavy-tailed
    html length distribution used at bench scale (giant-blob skew).
    """
    if n_rows == 0:
        return WEBPAGES_SCHEMA.empty_table()
    idx = np.arange(start_row, start_row + n_rows, dtype=np.int64)
    total_hint = start_row + n_rows
    n_hosts = max(16, total_hint // 100)

    # Per-row independent RNG streams derived from (seed, absolute row id)
    # so slices are reproducible. Philox supports counter-style streams.
    rng = np.random.Generator(np.random.Philox(key=seed))

    # host: Zipf over n_hosts, chosen by a per-row hash-derived uniform
    host_w = _zipf_weights(n_hosts)
    host_cdf = np.cumsum(host_w)
    u_host = _row_uniform(idx, seed, 1)
    host_ids = np.searchsorted(host_cdf, u_host, side="right")
    hosts = np.array([f"site{h:05d}.example.org" for h in range(n_hosts)])

    # url: unique per row
    slugs = np.char.mod("page-%012d", idx)
    urls = np.char.add(np.char.add(np.char.add("https://", hosts[host_ids]), "/"), slugs)

    # warc_ts: base + cumsum of per-row deltas; computed closed-form so
    # slices are consistent: delta(i) drawn from {1s,2s,5s,60s} plus 1%
    # day-jumps — use per-row deterministic draws and a prefix trick:
    # ts(i) = BASE + sum_{j<=i} delta(j).  For slice independence we use
    # the expected-prefix approximation is NOT acceptable (bit-identity),
    # so delta is a pure function of j and we pay O(end) cumsum once.
    all_j = np.arange(0, start_row + n_rows, dtype=np.int64)
    u_d = _row_uniform(all_j, seed, 2)
    choices = np.array([1_000_000, 2_000_000, 5_000_000, 60_000_000], dtype=np.int64)
    deltas = choices[(u_d * 4).astype(np.int64).clip(0, 3)]
    jump_mask = _row_uniform(all_j, seed, 3) < 0.01
    deltas = np.where(jump_mask, deltas + 86_400_000_000, deltas)
    ts_all = BASE_TS_US + np.cumsum(deltas)
    ts = ts_all[start_row:]

    # lang: Zipf over 20 codes ("en" ≈ 60% via s tuned weights)
    lang_w = _zipf_weights(len(_LANGS), s=2.2)
    lang_cdf = np.cumsum(lang_w)
    lang_ids = np.searchsorted(lang_cdf, _row_uniform(idx, seed, 4), side="right")
    langs = np.array(_LANGS)[lang_ids]

    # text: deterministic sentences, Zipf word frequencies
    word_w = _zipf_weights(len(_WORDS), s=1.1)
    word_cdf = np.cumsum(word_w)
    n_words = (20 + (_row_uniform(idx, seed, 5) * 180)).astype(np.int64)
    texts: list[str | None] = []
    word_arr = np.array(_WORDS)
    for i, row in enumerate(idx):
        u = _row_uniform(row + np.arange(n_words[i]) * 7919, seed, 6)
        texts.append(" ".join(word_arr[np.searchsorted(word_cdf, u, side="right")]))

    # null / empty patterns: 1% text null, 0.5% empty-but-not-null, 2% html null
    u_tnull = _row_uniform(idx, seed, 7)
    text_vals = [
        None if u < 0.01 else ("" if u < 0.015 else t) for u, t in zip(u_tnull, texts)
    ]
    u_hnull = _row_uniform(idx, seed, 8)

    htmls: list[bytes | None] = []
    for i, (u, t) in enumerate(zip(u_hnull, text_vals)):
        if u < 0.02:
            htmls.append(None)
            continue
        body = t or ""
        rep = 1
        if html_tail and u > 0.995:  # giant-blob skew tail
            rep = int(50 + (u - 0.995) * 200 * 1000)
        page = (
                f'<!DOCTYPE html><html lang="{langs[i]}"><head><meta charset="utf-8">'
                f"<title>{urls[i]}</title></head><body>\n"
                + (f'<div class="content section"><p>{body}</p></div>\n' * rep)
                + "</body></html>"
        )
        htmls.append(page.encode("utf-8"))

    return pa.table(
        {
            "url": pa.array(urls.tolist(), type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(text_vals, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        },
        schema=WEBPAGES_SCHEMA,
    )


def _row_uniform(idx: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Deterministic uniform[0,1) per absolute row index — splitmix64 hash."""
    salt = np.uint64((seed * 0x9E3779B97F4A7C15 + stream) & 0xFFFFFFFFFFFFFFFF)
    x = (np.asarray(idx).astype(np.uint64) + salt) * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def write_webpages_parquet(path: str, n_rows: int, seed: int = SEED, html_tail: bool = False) -> str:
    import pyarrow.parquet as pq

    pq.write_table(generate_webpages(n_rows, seed=seed, html_tail=html_tail), path)
    return path
