"""Text analysis + deduplication for large-scale training-data pipelines.

These are first-class engine components beyond the reference's operator
set (the reference has no text ops): language-ID, quality scoring,
token counting, fingerprinting, and dedup at four levels — exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes: everything is map_batches (stateless, vectorized) or a
shuffle keyed exactly once; per-doc work uses numpy/pandas kernels, and
stages that need compiled state (regexes, stopword sets) are callable
CLASSES used as actor pools so setup runs once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _default_concurrency() -> int:
    """Actor-pool size leaving slack for task-pool stages in the same
    pipeline (shared formula: stages/_pool.py)."""
    from ._pool import default_pool_size

    return default_pool_size()

# ------------------------------------------------------------ analysis


class TextQuality:
    """Actor-pool stage: per-doc quality stats (length, token count,
    punctuation/stopword/alpha ratios).  Regexes compile once per actor
    (__init__), batches are pandas for string kernels."""

    STOPWORDS = frozenset(
        "the of and to in is was for that with as his on be at by had not are but from or have an they which one you were all her she there would their we him been has when who will no more if out so up said what its about than into them can only other time new some could these two may first then do".split()
    )

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[A-Za-z]+")
        self.punct_re = re.compile(r"[^\w\s]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df[self.text_col].fillna("")
        df = df.copy()
        n_chars = text.str.len().astype("int64")
        df["n_chars_q"] = n_chars
        # vectorized counts (pandas str kernels, no Python per row)
        low = text.str.lower()
        n_tokens = low.str.count("[a-z]+").astype("int64")
        df["n_tokens"] = n_tokens
        # token-level stats via one explode instead of per-row loops
        toks = low.str.findall("[a-z]+")
        flat = toks.explode().dropna()
        if len(flat):
            grp = flat.index
            stop_counts = flat.isin(self.STOPWORDS).groupby(grp).sum()
            len_sums = flat.str.len().groupby(grp).sum()
        else:
            stop_counts = pd.Series(dtype="float64")
            len_sums = pd.Series(dtype="float64")
        nt = n_tokens.astype("float64")
        df["stopword_ratio"] = (stop_counts.reindex(df.index, fill_value=0) / nt.where(nt > 0)).fillna(0.0)
        df["punct_ratio"] = (text.str.count(r"[^\w\s]") / n_chars.where(n_chars > 0)).fillna(0.0)
        df["mean_token_len"] = (len_sums.reindex(df.index, fill_value=0) / nt.where(nt > 0)).fillna(0.0)
        return df


def gopher_repetition(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_dup_line_frac: float = 0.3,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0):
    """Gopher-style repetition/quality rules (Rae et al. 2021, public
    'Scaling Language Models' appendix A: duplicate-line fraction and
    mean-word-length windows — the standard web-corpus filter family).
    Per doc: n_lines, dup_line_frac (1 - distinct/total lines),
    mean_word_len, and the keep flag.  Vectorized: one explode +
    groupby per metric (pandas C kernels), no per-row Python."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        txt = df[text_col].fillna("")
        lines = txt.str.split("\n")
        ex = lines.explode()
        grp = ex.index
        n_lines = ex.groupby(grp).size().reindex(df.index, fill_value=0)
        n_uniq = ex.groupby(grp).nunique().reindex(df.index, fill_value=0)
        dup_frac = (1.0 - n_uniq / n_lines.where(n_lines > 0)).fillna(0.0)
        words = txt.str.findall(r"\S+")
        wex = words.explode().dropna()
        wlen = wex.str.len().groupby(wex.index).mean().reindex(df.index)
        mean_wl = wlen.fillna(0.0)
        out = pd.DataFrame(
            {
                id_col: df[id_col],
                "n_lines": n_lines.astype("int64"),
                "dup_line_frac": dup_frac.round(6),
                "mean_word_len": mean_wl.round(6),
            }
        )
        out["keep"] = (
            (out["dup_line_frac"] <= max_dup_line_frac)
            & (out["mean_word_len"] >= min_mean_word_len)
            & (out["mean_word_len"] <= max_mean_word_len)
        )
        return out

    return ds.map_batches(fn, batch_format="pandas")


def token_count(ds, text_col: str = "text", alias: str = "n_tokens"):
    """Whitespace token count, pure Arrow kernels (no Python per row)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column(text_col), "")
        trimmed = pc.utf8_trim_whitespace(t)
        n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int32()), n)
        return batch.append_column(alias, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Heuristic n-gram language ID over a small built-in profile set.
    Stateful stage: profiles built once per actor.  (A real pipeline
    would load fastText here — the Ray plumbing is identical.)"""

    PROFILES = {
        "en": " the and ing ion to of in is it",
        "de": " der die und sch ein ich den cht",
        "fr": " les de la ent une que des ait",
        "es": " de la que el en los del una",
        "it": " di che la il un per con del",
        "nl": " de het een van en ij aan voor",
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.grams = {
            lang: {p.strip() for p in prof.split() if p.strip()} for lang, prof in self.PROFILES.items()
        }

    def classify(self, t: str) -> str:
        """Scalar reference implementation (pytest + oracle-SQL twin)."""
        low = f" {t.lower()} "
        best, best_score = "und", 0
        for lang, grams in self.grams.items():
            score = sum(low.count(f" {g} ") + low.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # vectorized: per gram ONE C-level str.count pass over the whole
        # batch (non-overlapping counts — identical to str.count), then
        # an argmax with first-language-wins tie semantics
        import re

        low = " " + df[self.text_col].fillna("").str.lower() + " "
        langs = list(self.grams)
        scores = np.zeros((len(df), len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for g in self.grams[lang]:
                scores[:, li] += low.str.count(re.escape(f" {g} ")).to_numpy()
                scores[:, li] += low.str.count(re.escape(g)).to_numpy()
        best = scores.argmax(axis=1)  # first max wins = profile order
        pred = np.array(langs, dtype=object)[best]
        pred[scores.max(axis=1) <= 0] = "und"
        df["lang_pred"] = pred
        return df


# GPT-2-flavored pretokenizer pattern (published in the GPT-2 release):
# contractions, letter runs, digit runs, punctuation runs, whitespace —
# RE2-compatible, so Arrow and DuckDB count identical non-overlapping
# matches and the oracle can verify bit-exactly.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(ds, text_col: str = "text", alias: str = "n_bpe_tokens"):
    """BPE-ish token count: one vectorized RE2 pass per batch (a real
    BPE tokenizer's pretokenization step; the merge table isn't needed
    for counting-budget estimates at corpus scale)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch.column(text_col), "")
        n = pc.count_substring_regex(t, BPE_ISH_PATTERN)
        return batch.append_column(alias, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def md5_fingerprint(ds, col: str, alias: str = "fingerprint"):
    """Content fingerprint (md5 hex — SQL-oracle verifiable).  Batch
    kernel: DuckDB's C++ md5 over the zero-copy Arrow column (NULL →
    NULL), not a per-row hashlib loop."""
    from supersonic_ray.functions.dhash import md5_hex

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(alias, md5_hex(batch.column(col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprint(ds, col: str, window: int = 16, alias: str = "rfp"):
    """Document fingerprint: min of rolling polynomial hashes (winnowing
    flavor) — detects shared long substrings across docs.  The window
    hashes are computed as ``window`` fully-vectorized numpy ops (a
    shifted-slice polynomial sum under uint64 wraparound — identical
    values to a sequential Horner roll), never per-position Python."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        """Whole-batch kernel (round-4; replaces a per-row map): one
        byte-concat of the batch, ONE global rolling-hash pass with
        cross-doc windows masked by the ragged gather, and per-doc
        minima via np.minimum.reduceat.  Bit-identical to the previous
        per-doc roll (same powers, same uint64 wraparound); docs
        shorter than the window keep the md5 fallback."""
        B = np.uint64(257)
        # B^(window-1-j) for j = 0..window-1
        powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)

        df = df.copy()
        texts = df[col]
        isna = texts.isna().to_numpy()
        bs = [(t.encode() if t else b"") for t in texts.fillna("")]
        n_docs = len(bs)
        lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n_docs)
        out_vals = np.zeros(n_docs, dtype=np.uint64)
        long_mask = lens >= window
        if long_mask.any():
            a = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
            offs = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            n_win = len(a) - window + 1
            h_all = np.zeros(n_win, dtype=np.uint64)
            for j in range(window):
                h_all += a[j : j + n_win] * powers[j]
            s_counts = np.where(long_mask, lens - window + 1, 0)
            tot = int(s_counts.sum())
            seg_starts = np.cumsum(s_counts) - s_counts
            doc_of = np.repeat(np.arange(n_docs), s_counts)
            pos = np.arange(tot, dtype=np.int64) - np.repeat(seg_starts, s_counts)
            hvals = h_all[offs[doc_of] + pos]
            out_vals[long_mask] = np.minimum.reduceat(hvals, seg_starts[long_mask])
        for i in np.flatnonzero(~long_mask):
            out_vals[i] = np.uint64(
                int.from_bytes(hashlib.md5(bs[i]).digest()[:8], "little")
            )
        # STABLE object dtype: values are uint64-range Python ints, so a
        # numeric dtype would flip between int64/uint64 per batch (and
        # Ray's block concat would coerce mixed batches to float64,
        # silently losing low bits)
        df[alias] = pd.Series(
            [None if na else int(v) for na, v in zip(isna, out_vals)],
            index=df.index,
            dtype="object",
        )
        return df

    return ds.map_batches(fn, batch_format="pandas")


def rolling_fingerprint_md5(ds, col: str, window: int = 16, alias: str = "rfp"):
    """SQL-oracle form of the winnowing fingerprint: the window hash is
    md5_number_lower of the LITERAL window substring (DuckDB batch
    kernel, one pass per batch) instead of the polynomial roll — same
    min-over-windows semantics, every value reproducible by a DuckDB
    oracle verbatim.  Output is a 16-hex-char string column (hex keeps
    uint64 exact through pandas).  The polynomial ``rolling_fingerprint``
    remains the scale path (no substring materialization)."""
    from supersonic_ray.functions.dhash import md5_window_min_hex

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(alias, md5_window_min_hex(batch.column(col), window))

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------ dedup


def exact_dedup(ds, content_col: str, id_col: str):
    """Exact dedup: content-hash each row, pick the min-id winner per
    hash, keep winner rows.

    Scale shape: the all-to-all shuffle moves ONLY (hash, id) pairs —
    never the document payload; winners come back to the full rows via
    an adaptive semi join (broadcast under the limit, hash-partitioned
    above).  At 100 TB the shuffled bytes are ~28 B/doc instead of the
    whole corpus."""
    from .joins import semi_join_auto
    from .ops import fanout

    from supersonic_ray.functions.dhash import md5_hex

    def add_hash(batch: pa.Table) -> pa.Table:
        # batch md5 kernel (128-bit — collision-safe at 10^12 docs,
        # unlike a 64-bit sip).  NULL content hashes to a non-hex
        # sentinel so NULL and "" stay DISTINCT groups (SQL GROUP BY
        # semantics; the synthetic fixtures pin empty-but-not-null)
        h = pc.fill_null(md5_hex(batch.column(content_col)), "__null__")
        return batch.append_column("__h", h)

    hashed = fanout(ds.map_batches(add_hash, batch_format="pyarrow"), n_consumers=2)

    # vectorized min-by-key winner pick: partial (per-batch) min inside
    # map_batches, then a tiny final groupby — no per-group Python tasks
    from .aggregates import AggSpec, group_aggregate

    winners = group_aggregate(
        hashed.select_columns(["__h", id_col]), ["__h"], [AggSpec("min", id_col, id_col)]
    )
    kept = semi_join_auto(hashed, winners.select_columns([id_col]), [id_col], [id_col])
    return kept.drop_columns(["__h"])


_HASH_KEY = "raysonic-shingle"  # 16 bytes; fixed -> stable across workers


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Stable vectorized 64-bit token hashes (SipHash via pandas) —
    NEVER Python hash(): its per-process seed would desync LSH buckets
    across Ray workers."""
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.array(toks, dtype=object), hash_key=_HASH_KEY)


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """k-token shingle hashes via a vectorized polynomial roll over
    per-token hashes (uint64 wraparound arithmetic)."""
    toks = text.lower().split()
    tok_h = _token_hashes(toks)
    B = np.uint64(1099511628211)
    if len(toks) < k:
        h = np.uint64(0)
        for x in tok_h:
            h = h * B + np.uint64(x)
        return np.array([h], dtype=np.uint64)
    n = len(toks) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    powers = B ** np.arange(k, dtype=np.uint64)
    for j in range(k):
        out += tok_h[j : j + n] * powers[k - 1 - j]
    return out


class MinHasher:
    """Actor-pool stage: doc → minhash signature (n_hashes permutations
    via affine transforms over 64-bit shingle hashes)."""

    def __init__(self, text_col: str = "text", n_hashes: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, n_hashes).astype(np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 2**61 - 1, n_hashes).astype(np.uint64)
        self.text_col = text_col
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        """Single-doc reference path (kept for tests/spot checks)."""
        sh = _shingles(text or "", self.k)
        # (n_sh, n_hash) affine then min — vectorized
        vals = sh[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def _batch_signatures(self, texts: pd.Series) -> np.ndarray:
        """Whole-batch signatures (round-4; replaces a per-row Python
        map): ONE token-hash call over the batch's flattened tokens,
        the k-gram polynomial roll computed globally with cross-doc
        windows masked out, and per-(doc, hash) minima via 64
        ``np.minimum.reduceat`` segment reductions — no per-document
        Python beyond the rare short-doc (<k tokens) fallback.
        Bit-identical to ``signature`` per doc (same token hash, same
        uint64 wraparound arithmetic)."""
        from itertools import chain

        k = self.k
        B = np.uint64(1099511628211)
        tok_lists = texts.fillna("").str.lower().str.split()
        lens = tok_lists.str.len().to_numpy(dtype=np.int64)
        flat = list(chain.from_iterable(tok_lists))
        th = _token_hashes(flat)
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])

        powers = B ** np.arange(k, dtype=np.uint64)
        N = len(th)
        if N >= k:
            n_win = N - k + 1
            sh_all = np.zeros(n_win, dtype=np.uint64)
            for j in range(k):
                sh_all += th[j : j + n_win] * powers[k - 1 - j]
        else:
            sh_all = np.zeros(0, dtype=np.uint64)

        long_mask = lens >= k
        s_counts = np.where(long_mask, lens - k + 1, 1)
        tot = int(s_counts.sum())
        seg_starts = np.cumsum(s_counts) - s_counts
        doc_of = np.repeat(np.arange(len(texts)), s_counts)
        pos_in_doc = np.arange(tot, dtype=np.int64) - np.repeat(seg_starts, s_counts)
        sh = np.empty(tot, dtype=np.uint64)
        long_rows = long_mask[doc_of]
        if long_rows.any():
            sh[long_rows] = sh_all[offs[doc_of[long_rows]] + pos_in_doc[long_rows]]
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            for i in np.flatnonzero(~long_mask):  # rare: docs with < k tokens
                h = np.uint64(0)
                for x in th[offs[i] : offs[i + 1]]:
                    h = h * B + np.uint64(x)
                sh[seg_starts[i]] = h

        sigs = np.empty((len(texts), len(self.a)), dtype=np.uint64)
        for f in range(len(self.a)):
            sigs[:, f] = np.minimum.reduceat(sh * self.a[f] + self.b[f], seg_starts)
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if not len(df):
            df["__sig"] = pd.Series([], dtype="object")
            return df
        sigs = self._batch_signatures(df[self.text_col]).astype("<u8")
        # signatures as little-endian bytes: uint64 survives pandas→Arrow
        df["__sig"] = [row.tobytes() for row in sigs]
        return df


class Md5MinHasher:
    """Oracle-mode MinHasher (round-5): shingle = the LITERAL k-token
    window joined by \\x1f; hash family f = md5_number_lower('f:' ||
    shingle) via the DuckDB batch kernel — every signature value is
    reproducible by a SQL oracle verbatim.  Emits the same ``__sig``
    layout as MinHasher (n_hashes uint64 LE bytes), so the banding /
    winner-pick / semi-join machinery downstream is IDENTICAL: the
    driver oracle validates the distributed orchestration, only the
    hash primitive is swapped for a SQL-computable one.  (MinHasher's
    SipHash + affine permutations stay the production path — no window
    strings, pure numpy.)"""

    def __init__(self, text_col: str = "text", n_hashes: int = 64, k: int = 5):
        self.text_col, self.n, self.k = text_col, n_hashes, k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from supersonic_ray.functions.dhash import md5_u64_multi

        df = df.copy()
        if not len(df):
            df["__sig"] = pd.Series([], dtype="object")
            return df
        shingle_lists = []
        for t in df[self.text_col].fillna(""):
            toks = t.lower().split()
            if len(toks) >= self.k:
                ss = {"\x1f".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)}
            else:
                ss = {"\x1f".join(toks)}
            shingle_lists.append(sorted(ss))
        counts = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64)
        flat = pa.array([s for lst in shingle_lists for s in lst], pa.string())
        cols = md5_u64_multi(flat, [f"{f}:" for f in range(self.n)])
        starts = np.cumsum(counts) - counts
        sigs = np.empty((len(df), self.n), dtype=np.uint64)
        for f in range(self.n):
            h = cols[f]
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            hv = h.to_numpy(zero_copy_only=False).astype(np.uint64)
            sigs[:, f] = np.minimum.reduceat(hv, starts)
        df["__sig"] = [row.astype("<u8").tobytes() for row in sigs]
        return df


def minhash_lsh_dedup(
    ds,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    concurrency: int | None = None,
    hasher: str = "sip",
):
    """MinHash + LSH near-dedup.

    shingle→minhash per batch (actor pool) → explode to
    (band_id, band_hash, doc) rows → groupby band bucket → per bucket
    keep min-id, mark others as dup candidates → verified-union of
    candidate losers → anti-join to drop them.  At 100 TB every step is
    a map_batches or ONE groupby on the band key; no driver-side state.
    """
    from .ops import fanout

    rows_per_band = n_hashes // bands
    hash_cls = {"sip": MinHasher, "md5": Md5MinHasher}[hasher]
    signed = fanout(
        ds.map_batches(
            # INSTANCE → plain tasks on warm workers.  The hasher's
            # state (seeded permutation tables, a few KB) ships once in
            # the serialized fn; an actor pool amortizes nothing and
            # pays its ramp per call (A/B at sf0.1/32cpu: tasks 1.0-1.3 s
            # vs autoscaling pool 4.7-4.8 s for the md5 signature pass)
            hash_cls(text_col=text_col, n_hashes=n_hashes),
            batch_format="pandas",
            concurrency=concurrency,
        ),
        n_consumers=2,  # bucket pass + anti-join probe
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({"band_key": pd.Series([], dtype="int64"), id_col: pd.Series([], dtype="int64")})
        sigs = np.frombuffer(b"".join(df["__sig"]), dtype="<u8").reshape(n, n_hashes)
        B = np.uint64(1099511628211)
        band_keys = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            bh = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for j in range(rows_per_band):
                bh = bh * B + sigs[:, b * rows_per_band + j]
            band_keys[:, b] = bh
        return pd.DataFrame(
            {
                "band_key": band_keys.reshape(-1).view(np.int64),
                id_col: np.repeat(df[id_col].to_numpy(), bands),
            }
        )

    pairs = signed.map_batches(explode, batch_format="pandas")

    # Vectorized winner pick (round-4; replaces a per-bucket map_groups
    # that spawned one Python task per band bucket — ~10^13 tiny groups
    # at 10^12 docs x 16 bands).  A doc survives iff it is the min id
    # of EVERY bucket it lands in, and every doc lands in exactly
    # `bands` buckets, so:
    #   winners  = min(id) per band_key      (partial+final aggregate)
    #   wins(id) = #buckets a given id won   (tiny second aggregate)
    #   keep     = ids with wins == bands    (losers never enumerate)
    # All exchanges carry (int64, int64) pairs; no per-group tasks.
    from .aggregates import AggSpec, group_aggregate
    from .joins import semi_join_auto

    winners = group_aggregate(pairs, ["band_key"], [AggSpec("min", id_col, id_col)])
    wins = group_aggregate(
        winners.select_columns([id_col]), [id_col], [AggSpec("count", None, "__wins")]
    )

    def all_bands(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("__wins"), bands)
        return batch.filter(keep).select([id_col])

    keep_ids = wins.map_batches(all_bands, batch_format="pyarrow")
    # keeper ids NEVER land on the driver: adaptive semi join (broadcast
    # under the counted limit, hash-partitioned above) — at 100 TB the
    # keep set is billions of ids and must stay a Dataset.
    kept = semi_join_auto(signed, keep_ids, [id_col], [id_col])
    return kept.drop_columns(["__sig"])


def _distributed_anti_join(ds, dup_ids, id_col: str):
    """ds minus rows whose id appears in dup_ids.  Adaptive: the loser
    set never lands on the driver unless it is provably small (counted
    after materialize); above the broadcast limit both sides
    hash-partition through Dataset.join left_anti."""
    from .joins import semi_join_auto

    return semi_join_auto(ds, dup_ids, [id_col], [id_col], anti=True)


class SimHasher:
    """SimHash (64-bit) over token features; near-dups share hash up to
    a few flipped bits.  Dedup: exact match on rotated prefix buckets.

    ``hasher='md5'`` (oracle mode, round-5) swaps the SipHash token
    kernel for ``md5_number_lower(token)`` so a DuckDB oracle recomputes
    every bit-plane vote, the 63-bit hash, the rotated-prefix buckets
    and the greedy min-id survivor scan verbatim; 'sip' stays the
    production path (no SQL round-trip per batch)."""

    def __init__(self, text_col: str = "text", hasher: str = "sip"):
        self.text_col = text_col
        self.hasher = hasher

    def _hash_tokens(self, flat: list[str]) -> np.ndarray:
        if self.hasher == "md5":
            from supersonic_ray.functions.dhash import md5_u64

            h = md5_u64(pa.array(flat, pa.string()))
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            return h.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _token_hashes(flat)

    @staticmethod
    def simhash(text: str) -> int:
        """Single-doc reference path (kept for tests/spot checks)."""
        toks = (text or "").lower().split()
        if not toks:
            return 0
        hashes = _token_hashes(toks)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        h = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
        return int(h >> np.uint64(1))  # 63-bit: survives pandas/Arrow int64

    def _batch_simhash(self, texts: pd.Series) -> np.ndarray:
        """Whole-batch simhashes (round-4; replaces a per-row Python
        map): one token-hash call over the flattened batch, then 64
        bit-plane ``np.add.reduceat`` segment sums — bit-identical to
        ``simhash`` per doc."""
        from itertools import chain

        tok_lists = texts.fillna("").str.lower().str.split()
        lens = tok_lists.str.len().to_numpy(dtype=np.int64)
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        nz = lens > 0
        if not nz.any():
            return out.astype(np.int64)
        flat = list(chain.from_iterable(tok_lists))
        th = self._hash_tokens(flat)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        starts = offs[:-1][nz]  # strictly increasing: every nz doc has >=1 token
        nz_lens = lens[nz]
        for b in range(64):
            ones = np.add.reduceat(
                ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64), starts
            )
            v = 2 * ones - nz_lens
            out[nz] |= (v > 0).astype(np.uint64) << np.uint64(b)
        return (out >> np.uint64(1)).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if not len(df):
            df["simhash"] = pd.Series([], dtype="int64")
            return df
        df["simhash"] = self._batch_simhash(df[self.text_col])
        return df


_BUCKET_CAP = 4096  # max rows given to an O(n²) in-bucket verify


def _shard_buckets(ds, bucket_col: str, fn, n_shards: int | None = None):
    """Run a per-bucket verify/winner function with ONE exchange and a
    BOUNDED task count (round-5): ``groupby(bucket).map_groups(fn)``
    spawns one tiny pandas task per DISTINCT bucket — at 10^12 docs the
    rotated-prefix/LSH bucket count is of the same order, a scheduler
    killer (the round-4 verdict's anti-pattern class).  Instead
    hash-shard on the bucket id (all of a bucket's rows land in one
    shard), then loop the shard's buckets inside one task via a C-level
    pandas groupby.  Python task count = n_shards, never bucket count;
    per-bucket semantics (greedy scans, O(n²) verifies, _BUCKET_CAP
    guards) are unchanged."""
    n_shards = n_shards or _default_concurrency() * 4

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_array(df[bucket_col].to_numpy())
        df["__shard"] = (h % np.uint64(n_shards)).astype("int64")
        return df

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__shard"])
        outs = [fn(sub) for _, sub in g.groupby(bucket_col, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("__shard")
        .map_groups(per_shard, batch_format="pandas")
    )


def _cap_bucket(g: pd.DataFrame, id_col: str, label: str) -> pd.DataFrame:
    """Skew guard for quadratic verify loops: one hot bucket (empty or
    boilerplate docs sharing a hash prefix) must not go O(n²) on
    millions of rows.  Deterministic: keep the min-id _BUCKET_CAP rows,
    log the drop (candidate RECALL loss only — never correctness of
    kept rows)."""
    if len(g) <= _BUCKET_CAP:
        return g
    import logging

    logging.getLogger("supersonic_ray").warning(
        "%s: hot bucket of %d rows capped to %d (candidate recall loss)",
        label, len(g), _BUCKET_CAP,
    )
    return g.nsmallest(_BUCKET_CAP, id_col)


def simhash_dedup(ds, text_col: str, id_col: str, prefix_bits: int = 16, hasher: str = "sip"):
    """Bucket by 4 rotated prefixes of the simhash; within a bucket,
    keep min-id among hashes within hamming distance ≤ 3 (greedy scan
    in id order: a doc eliminated by an earlier survivor does not
    itself eliminate later docs)."""
    from .ops import fanout

    signed = fanout(
        # instance → tasks (see minhash_lsh_dedup: the hasher state is
        # a few KB, actor pools only add ramp)
        ds.map_batches(
            SimHasher(text_col=text_col, hasher=hasher), batch_format="pandas"
        ),
        n_consumers=2,
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        h = df["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        rows = []
        for rot in range(4):
            r = ((h << np.uint64(16 * rot)) | (h >> np.uint64(63 - 16 * rot))) & np.uint64((1 << 63) - 1)
            rows.append(
                pd.DataFrame(
                    {
                        "bucket": (np.uint64(rot) << np.uint64(48)) | (r >> np.uint64(63 - prefix_bits)),
                        id_col: df[id_col].to_numpy(),
                        "simhash": df["simhash"].to_numpy(),
                    }
                )
            )
        out = pd.concat(rows, ignore_index=True)
        out["bucket"] = out["bucket"].astype("int64")
        return out

    pairs = signed.map_batches(explode, batch_format="pandas")

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = _cap_bucket(g, id_col, "simhash_dedup").sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        hs = np.array([int(x) for x in g["simhash"].tolist()], dtype=np.uint64)
        lose = set()
        for i in range(len(ids)):
            if ids[i] in lose:
                continue
            # vectorized Hamming distance against all later rows
            x = hs[i + 1 :] ^ hs[i]
            pop = np.zeros(len(x), dtype=np.int64)
            while x.any():
                pop += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            for j in np.flatnonzero(pop <= 3):
                lose.add(ids[i + 1 + j])
        return pd.DataFrame({id_col: sorted(lose)}) if lose else pd.DataFrame({id_col: []}).astype({id_col: g[id_col].dtype})

    dup_ids = _shard_buckets(pairs, "bucket", losers)
    return _distributed_anti_join(signed, dup_ids, id_col)


def _md5_shingle_hash_sets(texts, k: int) -> list[np.ndarray]:
    """Per-doc DISTINCT shingle hash sets in the md5 oracle mode:
    literal k-token \\x1f-joined window strings hashed with
    md5_number_lower, one DuckDB batch pass for the whole input (the
    SQL oracle recomputes identical sets from the window strings, so
    intersection/union cardinalities — hence Jaccard — match exactly)."""
    from supersonic_ray.functions.dhash import md5_u64

    shingle_lists = []
    for t in texts:
        toks = (t or "").lower().split()
        if len(toks) >= k:
            ss = sorted({"\x1f".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
        else:
            ss = ["\x1f".join(toks)]
        shingle_lists.append(ss)
    counts = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=len(shingle_lists))
    flat = pa.array([s for lst in shingle_lists for s in lst], pa.string())
    h = md5_u64(flat)
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    hv = h.to_numpy(zero_copy_only=False).astype(np.uint64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return [hv[offs[i] : offs[i + 1]] for i in range(len(shingle_lists))]


def ngram_jaccard_pairs(ds, text_col: str, id_col: str, k: int = 3, threshold: float = 0.6, hasher: str = "sip"):
    """Exact n-gram Jaccard similarity for candidate pairs surfaced by a
    single LSH band pass — returns (id_a, id_b, jaccard) rows.

    ``hasher='md5'`` (oracle mode): signatures come from Md5MinHasher
    and the shipped shingle sets are md5 hashes of the literal window
    strings — bucket keys, candidate pairs and every Jaccard value are
    then recomputed verbatim by the DuckDB oracle."""
    hash_cls = {"sip": MinHasher, "md5": Md5MinHasher}[hasher]
    hasher_obj = hash_cls(text_col=text_col, n_hashes=16, k=k)
    signed = ds.map_batches(hasher_obj, batch_format="pandas", concurrency=_default_concurrency())

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if not n:
            return pd.DataFrame({"bucket": [], id_col: [], "__sh": []})
        sigs = np.frombuffer(b"".join(df["__sig"]), dtype="<u8").reshape(n, -1)
        B = np.uint64(1099511628211)
        bh = np.zeros(n, dtype=np.uint64)
        for j in range(4):
            bh = bh * B + sigs[:, j]
        # ship the DEDUPED shingle-hash set (binary), never the document
        # text, through the bucket shuffle — and compute it exactly once
        # per doc here instead of O(n²) times inside the verify loop
        if hasher == "md5":
            sets = _md5_shingle_hash_sets(df[text_col], k)
            sh = pd.Series([s.astype("<u8").tobytes() for s in sets], index=df.index)
        else:
            sh = df[text_col].map(lambda t: np.unique(_shingles(t or "", k)).astype("<u8").tobytes())
        return pd.DataFrame({"bucket": bh.view(np.int64), id_col: df[id_col].to_numpy(), "__sh": sh.to_numpy()})

    buckets = signed.map_batches(explode, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = _cap_bucket(g, id_col, "ngram_jaccard_pairs").sort_values(id_col)
        ids = g[id_col].tolist()
        sets = [frozenset(np.frombuffer(b, dtype="<u8")) for b in g["__sh"]]
        rows = []
        for i in range(len(ids)):
            sa = sets[i]
            for j in range(i + 1, len(ids)):
                sb = sets[j]
                if not sa and not sb:
                    continue
                jac = len(sa & sb) / len(sa | sb)
                if jac >= threshold:
                    rows.append({"id_a": ids[i], "id_b": ids[j], "jaccard": jac})
        return pd.DataFrame(rows) if rows else pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    return _shard_buckets(buckets, "bucket", verify)


# --------------------------------------------------------------- PII scrub

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, RE2 pattern, replacement) — RE2 on both the Arrow side
    # (pc.replace_substring_regex) and the DuckDB oracle (regexp_replace
    # 'g'), so semantics cannot drift.  Order matters: emails before
    # bare phone digits so an address is never half-eaten.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def pii_redact(
    ds,
    text_col: str = "text",
    alias: str = "redacted",
    count_alias: str = "n_redactions",
    patterns: list[tuple[str, str, str]] | None = None,
):
    """Training-corpus PII scrub: replace email / phone / IPv4 / SSN
    shapes with typed placeholder tokens and count the hits per row.

    Pure Arrow RE2 kernels (replace_substring_regex + count_substring_regex)
    — zero Python per row, stateless task fn (patterns are module
    constants, nothing to build per actor).  NULL text stays NULL, and
    the hit count for NULL text is NULL (SQL convention)."""
    pats = patterns or PII_PATTERNS

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        n = pa.nulls(len(batch), pa.int64())
        redacted = t
        for _, pat, repl in pats:
            hits = pc.cast(pc.count_substring_regex(redacted, pat), pa.int64())
            n = pc.if_else(pc.is_valid(hits), pc.coalesce(pc.add(n, hits), hits), n)
            redacted = pc.replace_substring_regex(redacted, pat, repl)
        return batch.append_column(alias, redacted).append_column(count_alias, n)

    return ds.map_batches(fn, batch_format="pyarrow")


# -------------------------------------------------- line-level dedup (CCNet)

MAX_LINES_PER_DOC = 1 << 20  # rank = doc_id * MAX + line_no packs into int64


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
    out_col: str = "text_dedup",
):
    """Corpus-wide duplicate-LINE removal (CCNet / RefinedWeb style):
    split each document into fixed-width word lines, keep only the
    FIRST occurrence of each distinct line corpus-wide (first = smallest
    (doc, line_no) position), and reassemble the surviving lines per
    document in original order.  Documents whose every line is a
    duplicate (or that have no words) drop out.

    100-TB shape — the full line TEXT crosses an exchange at most once
    (the final reassembly):

    1. explode (map_batches, pandas-vectorized): (id, line_no, line);
    2. hash lines with the DuckDB md5 batch kernel; the dedup shuffle
       then moves only (hash16B, rank8B) pairs, never text;
    3. winners = groupby(hash).min(rank) — distributive partials;
    4. losers = pairs ANTI-JOIN winners on (hash, rank) — narrow rows,
       hash-partitioned, no driver set;
    5. kept lines = lines ANTI-JOIN losers on rank alone (rank is
       unique per line occurrence; the loser set is small for real
       corpora so this usually broadcasts — the exact_dedup trick);
    6. reassemble: ordered distributed CONCAT by (id, line_no).
    """
    from .aggregates import AggSpec, group_aggregate
    from .joins import anti_join as _aj, semi_join_auto

    def explode_hash(df: pd.DataFrame) -> pa.Table:
        from supersonic_ray.functions.dhash import md5_hex

        d = df[[id_col]].copy()
        # single-space split matches SQL string_split(text, ' ');
        # empty tokens (leading/double spaces, empty text) are dropped
        # identically on both sides
        d["__w"] = df[text_col].fillna("").str.split(" ")
        e = d.explode("__w", ignore_index=True)
        e = e[e["__w"].notna() & (e["__w"] != "")]
        if e.empty:
            # typed ARROW empty block with the FULL output schema: an
            # empty pandas frame loses its columns in Ray's block
            # builder, and a later map stage would rebuild it as a
            # zero-column block (UDFs are skipped on empty blocks) —
            # hence explode and rank/hash live in ONE UDF here, and
            # drop_empty_blocks prunes these below
            return pa.table({
                id_col: pa.array([], pa.from_numpy_dtype(df[id_col].dtype)),
                "line_no": pa.array([], pa.int64()),
                "line": pa.array([], pa.string()),
                "__rank": pa.array([], pa.int64()),
                "__h": pa.array([], pa.string()),
            })
        e["__wi"] = e.groupby(id_col, sort=False).cumcount()
        e["line_no"] = e["__wi"] // words_per_line
        lines_df = (
            e.groupby([id_col, "line_no"], sort=False)["__w"]
            .agg(" ".join)
            .reset_index(name="line")
        )
        batch = pa.Table.from_pandas(lines_df, preserve_index=False)
        # drop the pandas schema metadata (a dict) so Ray's shuffle can
        # hash-dedup block schemas instead of warning every task
        batch = batch.replace_schema_metadata(None)
        max_ln = pc.max(batch.column("line_no")).as_py()
        if max_ln is not None and max_ln >= MAX_LINES_PER_DOC:
            raise ValueError(
                f"line_dedup: document with {max_ln + 1} lines exceeds "
                f"MAX_LINES_PER_DOC={MAX_LINES_PER_DOC}; rank packing "
                "would collide across documents"
            )
        rank = pc.add(
            pc.multiply(batch.column(id_col), pa.scalar(MAX_LINES_PER_DOC, pa.int64())),
            batch.column("line_no"),
        )
        return batch.append_column("__rank", rank).append_column(
            "__h", md5_hex(batch.column("line"))
        )

    # materialize ONCE: two consumers (the narrow dedup pairs and the
    # final kept-lines probe) would otherwise each re-run the explode +
    # md5 of the whole corpus — the most expensive stage — twice.  The
    # object store spills as needed; this is the fanout cost model
    # documented on ops.fanout.  drop_empty_blocks prunes partitions
    # whose every document was empty (their blocks would otherwise
    # degrade to zero-column downstream and break the dedup joins).
    from .ops import drop_empty_blocks

    lines = drop_empty_blocks(
        ds.map_batches(explode_hash, batch_format="pandas")
    )
    if lines.count() == 0:
        # all-empty corpus: nothing survives; emit a typed empty result
        import ray.data as rd

        sch = lines.schema()
        id_type = dict(zip(sch.names, sch.types)).get(id_col, pa.int64())
        return rd.from_arrow(pa.table({
            id_col: pa.array([], id_type),
            out_col: pa.array([], pa.string()),
        }))

    pairs = lines.select_columns(["__h", "__rank"])
    winners = group_aggregate(pairs, ["__h"], [AggSpec("min", "__rank", "__rank")])
    losers = _anti_pairs(pairs, winners)
    kept = semi_join_auto(lines, losers, ["__rank"], ["__rank"], anti=True)

    out = group_aggregate(
        kept,
        [id_col],
        [AggSpec("concat", "line", out_col, order_by="line_no", separator=" ")],
    )
    return out


def _anti_pairs(pairs, winners):
    """pairs minus winners on the composite (__h, __rank) — both sides
    are narrow (hash, rank) datasets of comparable size, so this always
    takes the hash-partitioned path rather than counting for broadcast."""
    from .joins import partitioned_semi_join

    return partitioned_semi_join(
        pairs, winners, ["__h", "__rank"], ["__h", "__rank"], anti=True
    ).select_columns(["__rank"])


# --------------------------------------------- training-data assembly


def pack_sequences(
    ds,
    budget: int,
    text_col: str = "text",
    key_col: str = "source",
    order_col: str = "doc_id",
    token_alias: str = "n_tokens",
):
    """Greedy sequence packing for training-data assembly: assign docs
    to token-budget bins, per key_col, in order_col order.  A doc joins
    the current bin unless adding it would exceed ``budget`` (a doc
    larger than the budget gets its own bin).

    Scale shape: token counts are computed per batch with the Arrow
    kernels (token_count), then ONLY (key, order, tokens) — three
    fixed-width columns, never the text — travel through the hash
    exchange; the serial greedy scan runs per key group over an int
    array.  The scan is order-serial by definition, so the pack window
    IS the partitioning contract: at 10^12-doc scale callers pack per
    (key, shard-of-order-range) — same code, composite key — rather
    than per global key.
    """

    counted = token_count(ds, text_col, token_alias)

    def slim(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, order_col, token_alias])

    narrow = counted.map_batches(slim, batch_format="pyarrow")

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = g[token_alias].to_numpy()
        bins = np.empty(len(toks), dtype=np.int64)
        b = 0
        fill = 0
        for i, t in enumerate(toks):
            if fill and fill + t > budget:
                b += 1
                fill = 0
            bins[i] = b
            fill += int(t)
        g["bin_id"] = bins
        return g

    # round-5: task count = num_shards, not distinct pack keys (each
    # key's rows still land whole in one shard; the serial greedy scan
    # runs per key INSIDE the shard task)
    from .aggregates import _sharded_key_merge

    return _sharded_key_merge(narrow, [key_col], pack)


def vocab_top_words(ds, text_col: str = "text", k: int = 100):
    """Corpus vocabulary: lowercase, split on non-[a-z] runs, count
    corpus-wide, return the top-k words under the total order
    (count DESC, word ASC).

    Scale shape: explode + per-batch partial count (value_counts inside
    map_batches, one row per DISTINCT word per batch) so the word
    exchange carries pre-aggregated (word, cnt) pairs — never one row
    per token occurrence — then a small groupby-sum and a top-k."""

    def explode_count(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        flat = pc.list_flatten(pc.split_pattern_regex(txt, "[^a-z]+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.combine_chunks().value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partial = ds.map_batches(explode_count, batch_format="pyarrow")
    agg = partial.groupby("word").sum("cnt")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"word": batch.column("word"), "cnt": batch.column("sum(cnt)")}
        )

    out = agg.map_batches(rename, batch_format="pyarrow")
    return out.sort(["cnt", "word"], descending=[True, False]).limit(k)


# max distinct words the IDF table may hold before the driver refuses
# to collect it (same loud-failure convention as SCALAR_COLLECT_LIMIT);
# 5M words ~= 80 MB broadcast — comfortable per node.
TFIDF_VOCAB_LIMIT = 5_000_000


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 3):
    """Per-document top-k TF-IDF terms — the canonical two-pass
    aggregate → broadcast-back → rescore shape:

    pass 1 (distributed): document frequency per word.  Each batch
    explodes to DISTINCT (doc, word) pairs and pre-counts words, so the
    exchange carries one (word, partial_df) row per distinct word per
    batch; a small groupby-sum finishes DF.  The resulting IDF table is
    bounded by VOCABULARY size (guarded by TFIDF_VOCAB_LIMIT), ray.put
    ONCE, and looked up inside every pass-2 task — never re-shipped per
    batch, never a shuffle join against the corpus.

    pass 2 (map-only): per batch, term frequencies via Arrow group_by,
    score = tf * ln(N / df), per-doc top-k under (score DESC, word ASC).
    Returns (id_col, word, score) with score rounded to 6 decimals so
    the SQL oracle can compare exactly.
    """
    import ray

    def _doc_word_pairs(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        lists = pc.split_pattern_regex(txt, "[^a-z]+")
        flat = pc.list_flatten(lists)
        ids = batch.column(id_col).take(pc.list_parent_indices(lists))
        pairs = pa.table({"doc": ids, "word": flat})
        return pairs.filter(pc.not_equal(pairs.column("word"), ""))

    def df_partial(batch: pa.Table) -> pa.Table:
        distinct = _doc_word_pairs(batch).group_by(["doc", "word"]).aggregate([])
        vc = distinct.column("word").combine_chunks().value_counts()
        return pa.table(
            {"word": vc.field("values"), "df": pc.cast(vc.field("counts"), pa.int64())}
        )

    n_docs = ds.count()
    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("df")
        .materialize()
    )
    if df_ds.count() > TFIDF_VOCAB_LIMIT:
        raise ValueError(
            f"tfidf_top_terms: vocabulary exceeds TFIDF_VOCAB_LIMIT={TFIDF_VOCAB_LIMIT}; "
            "shard the corpus or raise the limit explicitly"
        )
    df_pd = df_ds.to_pandas()
    idf_index = pd.Index(df_pd["word"].to_numpy())
    idf_vals = np.log(float(n_docs) / df_pd["sum(df)"].to_numpy(dtype=np.float64))
    idf_ref = ray.put((idf_index, idf_vals))

    def score(batch: pa.Table) -> pa.Table:
        # per-worker-process IDF cache (the membership-filter pattern):
        # plasma fetch + index warm-up once per worker, not per batch
        ck = idf_ref.hex()
        cached = _IDF_CACHE.get(ck)
        if cached is None:
            cached = ray.get(idf_ref)
            if len(_IDF_CACHE) >= 4:
                _IDF_CACHE.pop(next(iter(_IDF_CACHE)))
            _IDF_CACHE[ck] = cached
        idx, vals = cached
        tf = (
            _doc_word_pairs(batch)
            .group_by(["doc", "word"])
            .aggregate([("word", "count")])
        )
        g = tf.to_pandas()
        if not len(g):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "word": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64())}
            )
        indexer = idx.get_indexer(g["word"].to_numpy())
        if (indexer < 0).any():
            # pass 1 and pass 2 re-execute the input independently; a
            # word absent from the pass-1 vocabulary means an upstream
            # stage is nondeterministic — fail loudly, never apply a
            # wrong IDF silently (vals[-1] would)
            bad = g["word"].to_numpy()[indexer < 0][:5]
            raise ValueError(
                f"tfidf pass-2 saw words absent from the pass-1 vocabulary "
                f"(e.g. {list(bad)!r}) — nondeterministic upstream dataset?"
            )
        g["score"] = (
            g["word_count"].to_numpy(dtype=np.float64) * vals[indexer]
        ).round(6)
        g = g.sort_values(["doc", "score", "word"], ascending=[True, False, True])
        top = g.groupby("doc", sort=False).head(k)
        return pa.table(
            {
                id_col: pa.array(top["doc"].to_numpy(), pa.int64()),
                "word": pa.array(top["word"], pa.string()),
                "score": pa.array(top["score"].to_numpy(), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


_IDF_CACHE: dict = {}


def substring_span_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    concurrency: int | None = None,
    batch_size: int = 512,
    key_mode: str = "rolling",
):
    """Exact-substring span dedup (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"; RefinedWeb's
    exact-substring pass): every ``window``-token span that appears in
    MORE THAN ONE document is duplicated text, and ALL its occurrences
    are removed at token level from every document.

    Distributed shape (no suffix array — that is the single-machine
    tool; this is the hash-sharded equivalent over Ray Data):

    1. map-only: per document, all W-token windows as exploded
       (window_key, doc, start) rows.  ``key_mode="rolling"``
       (default — the 10^12-doc shape): NO window strings are built
       (md5 amplifies memory W-fold); two independent 64-bit
       polynomial rolls over per-token SipHashes (sliding_window_view,
       fully vectorized) give a 128-bit key space.
       ``key_mode="md5"`` keys on md5 of the LITERAL window text
       (vectorized DuckDB kernel; exactly SQL-reproducible — the
       driver-oracle mode, span-identical to rolling by test).
    2. candidates: distinct (key, doc) per batch (a doc never spans
       batches, so per-batch distinct IS global distinct) → one
       groupby(key).count() → keys in ≥ 2 docs.  Only 24-byte pairs
       cross this exchange.
    3. positions ⋉ candidates via the adaptive semi join, then ONE
       ordered-CONCAT group aggregate collapses each affected doc's
       duplicate starts to a single csv string (distributed run-concat
       partials — no per-doc Python tasks).
    4. adaptive LEFT OUTER join of the docs against that (small:
       affected docs only) span table; final map re-cuts each doc's
       tokens and emits exact counts + the cleaned text.

    Removing ALL occurrences (not all-but-one) matches the paper;
    documents shorter than ``window`` tokens are untouched by
    construction."""
    from supersonic_ray.functions.dhash import md5_hex

    from .aggregates import AggSpec, group_aggregate
    from .joins import hash_join_auto, semi_join_auto
    from .ops import fanout

    if key_mode not in ("md5", "rolling"):
        raise ValueError(f"key_mode must be 'md5' or 'rolling', got {key_mode!r}")
    key_cols = ["__w"] if key_mode == "md5" else ["__w1", "__w2"]

    def explode_windows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        if key_mode == "md5":
            # whole-batch (round-5 late): tokenize per doc (C-speed
            # str.split keeps Python whitespace semantics), then ONE
            # DuckDB pass builds every window string AND its md5 via a
            # windowed string_agg frame — all C++, and the W-fold
            # window-string materialization never enters the Python
            # heap (the old shape ran a per-row/per-window join loop).
            from itertools import chain

            from supersonic_ray.functions.dhash import _con

            id_arr = batch.column(id_col)
            if isinstance(id_arr, pa.ChunkedArray):
                id_arr = id_arr.combine_chunks()
            toks_per_doc = [(t or "").split() for t in texts]
            lens = np.fromiter(
                map(len, toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
            )
            n_flat = int(lens.sum())
            if n_flat < window:
                return pa.table(
                    {
                        id_col: pa.array([], id_arr.type),
                        "__i": pa.array([], pa.int32()),
                        "__w": pa.array([], pa.string()),
                    }
                )
            parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            pos = np.arange(n_flat, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(lens)[:-1])), lens
            )
            con = _con()
            con.register(
                "__ssdd_toks",
                pa.table(
                    {
                        "r": pa.array(parent),
                        "p": pa.array(pos),
                        "tok": pa.array(
                            list(chain.from_iterable(toks_per_doc)), pa.string()
                        ),
                    }
                ),
            )
            try:
                out = con.execute(
                    f"""
                    SELECT r, p, md5(string_agg(tok, ' ') OVER w) AS w,
                           count(*) OVER w AS n
                    FROM __ssdd_toks
                    WINDOW w AS (PARTITION BY r ORDER BY p
                                 ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
                    QUALIFY n = {window}
                    """
                ).arrow()
            finally:
                con.unregister("__ssdd_toks")
            rix = out.column("r").combine_chunks()
            return pa.table(
                {
                    id_col: id_arr.take(rix),
                    "__i": pc.cast(out.column("p"), pa.int32()),
                    "__w": pc.cast(out.column("w"), pa.string()),
                }
            )
        # rolling mode — the 10^12-doc shape: NO window strings are ever
        # built (the md5 path amplifies memory W-fold); two independent
        # 64-bit polynomial rolls over per-token SipHashes give a
        # 128-bit key space.  Whole-BATCH vectorized (round-5 late):
        # tokenize per doc (C-speed str.split keeps Python whitespace
        # semantics exactly), but hash the batch's ENTIRE flat token
        # stream in TWO pd.util.hash_array calls and run the polynomial
        # roll over the flat stream, masking windows that cross a doc
        # boundary.  Bit-identical to the old per-doc roll: per-token
        # hashes are element-wise, and uint64 wraparound +/* is exact
        # mod 2^64 in any accumulation order.  (The old shape paid two
        # Python hash-call dispatches PER DOCUMENT — the per-row-loop
        # anti-pattern in the hot stage of the corpus's biggest map.)
        from itertools import chain

        id_type = batch.column(id_col).type
        empty = pa.table(
            {
                id_col: pa.array([], id_type),
                "__i": pa.array([], pa.int32()),
                "__w1": pa.array([], pa.int64()),
                "__w2": pa.array([], pa.int64()),
            }
        )
        toks_per_doc = [(t or "").split() for t in texts]
        lens = np.fromiter(map(len, toks_per_doc), dtype=np.int64, count=len(toks_per_doc))
        n_flat = int(lens.sum())
        if n_flat < window:
            return empty
        flat = np.empty(n_flat, dtype=object)
        flat[:] = list(chain.from_iterable(toks_per_doc))
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        th = pd.util.hash_array(flat, hash_key=_HASH_KEY)
        th2 = pd.util.hash_array(flat, hash_key="raysonic-ssdd-k2")

        B1, B2 = np.uint64(1099511628211), np.uint64(0x9E3779B97F4A7C15)
        p1 = B1 ** np.arange(window, dtype=np.uint64)[::-1]
        p2 = B2 ** np.arange(window, dtype=np.uint64)[::-1]
        n_win = n_flat - window + 1
        w1 = np.zeros(n_win, dtype=np.uint64)
        w2 = np.zeros(n_win, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(window):
                w1 += th[j : j + n_win] * p1[j]
                w2 += th2[j : j + n_win] * p2[j]
        # a window is real only when it lies inside ONE document
        valid = parent[:n_win] == parent[window - 1 :]
        if not valid.any():
            return empty
        vpar = parent[:n_win][valid]
        # take through Arrow: NULL doc ids survive (they just never
        # match the span join later) instead of crashing int(None)
        id_arr = batch.column(id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        return pa.table(
            {
                id_col: id_arr.take(pa.array(vpar)),
                "__i": pa.array(
                    (np.flatnonzero(valid) - doc_off[vpar]).astype(np.int32)
                ),
                # bit-reinterpret to int64: Arrow/pandas stages downstream
                # (groupby blocks, membership indexes) mishandle uint64
                "__w1": pa.array(w1[valid].view(np.int64)),
                "__w2": pa.array(w2[valid].view(np.int64)),
            }
        )

    # recompute, not materialize: the exploded table is ~window× the
    # corpus — pinning it is the worst object-store footprint in the
    # repo, and the round-5 sf0.1 A/B has recompute 15-20 % FASTER
    # (21-24 s vs 26-28 s) on top of the zero pin (ops.fanout docstring)
    positions = fanout(
        ds.select_columns([id_col, text_col]).map_batches(
            explode_windows, batch_format="pyarrow", batch_size=batch_size
        ),
        n_consumers=2,
        mode="recompute",
    )

    # GLOBAL count-distinct of docs per window key in ONE exchange
    # (round-5, second pass): the correctness fix (global, not
    # per-batch, (key, doc) dedup — a doc's exploded windows CAN
    # straddle blocks at target_max_block_size) first shipped as
    # group_aggregate's distinct plan, which costs two all-to-alls;
    # each Ray exchange has ~3-6 s fixed overhead at bench scale, so
    # collapse to the shard-contract shape instead: per-batch local
    # (key, doc) dedup (pure shrink, always safe), hash-shard by KEY
    # ONLY, then one vectorized per-shard dedup+count — all of a key's
    # rows land in one shard, so per-shard distinct IS global distinct.
    # Exchanges carry 24-byte pairs; Python task count = num_shards
    # (the dedup_by_key/windows.py contract, never the key count).
    n_shards = _default_concurrency() * 4

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(key_cols + [id_col])
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        out = df[key_cols + [id_col]].copy()
        out["__shard"] = (h % np.uint64(n_shards)).astype("int64")
        return out

    def shard_candidates(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop_duplicates(key_cols + [id_col])
        counts = pairs.groupby(key_cols, sort=False)[id_col].size()
        dups = counts[counts >= 2].reset_index()[key_cols]
        return dups

    candidates = (
        positions.select_columns(key_cols + [id_col])
        .map_batches(local_dedup, batch_format="pandas")
        .groupby("__shard")
        .map_groups(shard_candidates, batch_format="pandas")
    )

    dup_pos = semi_join_auto(positions, candidates, key_cols)
    spans = group_aggregate(
        dup_pos.select_columns([id_col, "__i"]),
        [id_col],
        [AggSpec("concat", "__i", "__spans", order_by="__i", separator=",")],
    )

    merged = hash_join_auto(
        ds.select_columns([id_col, text_col]),
        spans,
        [id_col],
        [id_col],
        join_type="left_outer",
    )

    def cut(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        # a corpus with NO cross-doc duplicate spans yields an EMPTY
        # span table whose schema the outer join can't recover — treat
        # the missing column as all-NULL (nothing to cut)
        if "__spans" in batch.column_names:
            span_col = batch.column("__spans").to_pylist()
        else:
            span_col = [None] * len(batch)
        n_toks, dropped, kept_txt = [], [], []
        for t, sp in zip(texts, span_col):
            toks = (t or "").split()
            n = len(toks)
            covered = np.zeros(n, dtype=bool)
            if sp:
                for s in str(sp).split(","):
                    i = int(float(s))
                    covered[i : i + window] = True
            n_toks.append(n)
            dropped.append(int(covered.sum()))
            kept_txt.append(" ".join(tok for tok, c in zip(toks, covered) if not c))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "dropped_tokens": pa.array(dropped, pa.int64()),
                "kept_tokens": pa.array([n - d for n, d in zip(n_toks, dropped)], pa.int64()),
                "kept_text": pa.array(kept_txt, pa.string()),
            }
        )

    return merged.map_batches(cut, batch_format="pyarrow")


def bpe_train_merges(ds, text_col: str = "text", n_merges: int = 3):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    the first ``n_merges`` merge rules over the corpus.  Returns a tiny
    pa.Table (round, lhs, rhs, merged, n) — one row per learned merge.

    Scale shape — the classic two-level factoring: the corpus is read
    ONCE into a compact (word, count) vocabulary table (per-batch
    value_counts partials → one groupby-sum, same exchange contract as
    vocab_top_words), and every merge round runs over THAT table —
    vocabulary-sized, orders of magnitude smaller than the corpus.
    Each round is one distributed pair-count pass (vectorized adjacent
    pairs via list offsets + pa.TableGroupBy partials → groupby-sum →
    a driver take(1) of the single argmax row) and one map-only merge
    application.  The vocab table is materialized once per round so
    round r+1's count pass re-reads blocks instead of replaying r
    chained maps; its size is the documented bound (vocabulary, not
    corpus — pass a pre-aggregated vocab Dataset for 10^8+ vocabularies
    if object-store pinning matters).

    EXACT SQL replication (the oracle contract): symbols ride as a
    double-space-joined, double-space-wrapped string
    ``"  c1  c2  ...  cn  "`` and a merge (a, b) is ONE plain
    ``replace(s, " a  b ", " ab ")``.  Because each occurrence keeps
    one space on either side, non-overlapping left-to-right REPLACE
    (Arrow replace_substring == DuckDB replace == Python str.replace
    semantics) consumes only the INNER gap — adjacent disjoint
    occurrences still match, and chained overlaps ("a a a") merge
    leftmost-first exactly like greedy BPE application.  Ties break
    deterministically by (count DESC, lhs ASC, rhs ASC)."""
    from .ops import top_k

    def word_counts(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(text_col), "")
        flat = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.combine_chunks().value_counts()
        return pa.table(
            {"w": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    vocab = (
        ds.select_columns([text_col])
        .map_batches(word_counts, batch_format="pyarrow")
        .groupby("w")
        .sum("cnt")
    )

    def to_symbols(batch: pa.Table) -> pa.Table:
        # "hello" -> "  h  e  l  l  o  " (RE2 on both sides: DuckDB
        # regexp_replace(w, '(.)', '\1  ', 'g') is the same kernel)
        s = pc.replace_substring_regex(batch.column("w"), "(.)", r"\1  ")
        s = pc.binary_join_element_wise(pa.scalar("  "), s, pa.scalar(""))
        return pa.table({"s": s, "cnt": batch.column("sum(cnt)")})

    words = vocab.map_batches(to_symbols, batch_format="pyarrow").materialize()

    def pair_counts(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.utf8_trim(batch.column("s"), " "), "  ")
        lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table(
                {
                    "lhs": pa.array([], pa.string()),
                    "rhs": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = parents[:-1] == parents[1:]
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        pairs = pa.table(
            {
                "lhs": flat.slice(0, len(flat) - 1).filter(pa.array(same)),
                "rhs": flat.slice(1).filter(pa.array(same)),
                "n": pa.array(cnt[parents[:-1][same]], pa.int64()),
            }
        )
        # select by NAME: group_by().aggregate() column order is
        # pyarrow-version-specific (keys-first vs aggregates-first)
        agg = pairs.group_by(["lhs", "rhs"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "lhs": agg.column("lhs"),
                "rhs": agg.column("rhs"),
                "n": agg.column("n_sum"),
            }
        )

    merges: list[dict] = []
    for r in range(1, int(n_merges) + 1):
        best = top_k(
            words.map_batches(pair_counts, batch_format="pyarrow")
            .groupby(["lhs", "rhs"])
            .sum("n"),
            ["sum(n)", "lhs", "rhs"],
            k=1,
            descending=[True, False, False],
        ).take(1)  # ONE argmax row — the only driver collect per round
        if not best:
            break
        a, b, n = best[0]["lhs"], best[0]["rhs"], int(best[0]["sum(n)"])
        merges.append({"round": r, "lhs": a, "rhs": b, "merged": a + b, "n": n})
        if r == int(n_merges):
            break  # skip the last (unused) apply pass

        def apply_merge(batch: pa.Table, _a=a, _b=b) -> pa.Table:
            s = pc.replace_substring(
                batch.column("s"), f" {_a}  {_b} ", f" {_a}{_b} "
            )
            return pa.table({"s": s, "cnt": batch.column("cnt")})

        words = words.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "round": pa.array([m["round"] for m in merges], pa.int64()),
            "lhs": pa.array([m["lhs"] for m in merges], pa.string()),
            "rhs": pa.array([m["rhs"] for m in merges], pa.string()),
            "merged": pa.array([m["merged"] for m in merges], pa.string()),
            "n": pa.array([m["n"] for m in merges], pa.int64()),
        }
    )
