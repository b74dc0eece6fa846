"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting. All vectorized map_batches over (id, text).

Language-ID is a stopword/charset n-gram heuristic (stateful stage: tables
built once per actor/worker); quality scoring mirrors the usual pretraining
filters (length, punctuation density, stopword ratio); token counting is a
whitespace count plus a BPE-ish wordpiece regex count; fingerprinting is
winnowing over a rolling hash (Schleimer et al., SIGMOD'03).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import re2pin
from ..urlnorm import url_hash64

# distinctive stopwords per language (testdata langs: en es fr de zh)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "with"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es"},
    "fr": {"le", "la", "les", "des", "et", "que", "en", "un", "une", "est", "du"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "mit", "von", "zu"},
    "pt": {"o", "a", "os", "as", "de", "que", "e", "em", "um", "uma", "é", "do", "da"},
}
_CJK = re.compile(r"[一-鿿]")
# RE2-pinned classes (see re2pin): the SQL oracles' \w / \d / [^\w\s] are
# ASCII under RE2, and python's unicode escapes silently diverge on
# accented/exotic input — pin the engine to the oracle's semantics
_WORD = re2pin.WORD_RE
_DIGIT = re2pin.DIGIT
# BPE-ish token regex: words, numbers, punctuation runs (GPT-2 style,
# simplified; engine-only — no SQL pairing — so the unicode classes stay)
_BPE_ISH = re.compile(r"[A-Za-zÀ-ÿ]+|\d+|[^\sA-Za-zÀ-ÿ\d]+")
_PUNCT = re2pin.PUNCT


class LangId:
    """Stopword/charset language classifier. State (compiled per-language
    stopword alternation regexes) built once per actor/worker; the whole
    batch classifies via vectorized ``str.count`` per language + a numpy
    argmax with first-language-wins tie-break — identical output to the
    former per-row token-membership loop (each stopword token occurrence
    matches the \\b-anchored alternation exactly once; parity pinned by the
    ``lang_scores`` SQL oracle)."""

    def __init__(self):
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.res = {
            lang: re2pin.ascii_word_bounded("|".join(sorted(ws)))
            for lang, ws in _STOPWORDS.items()
        }

    def classify_one(self, text: str) -> str:
        if _CJK.search(text):
            return "zh"
        toks = [t.lower() for t in _WORD.findall(text)]
        if not toks:
            return "unknown"
        best, best_score = "unknown", 0
        for lang, table in self.tables.items():
            score = sum(1 for t in toks if t in table)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        low = t.str.lower()
        langs = list(self.res)
        scores = np.stack(
            [low.str.count(self.res[lang]).to_numpy() for lang in langs]
        )
        best = np.asarray(langs, dtype=object)[scores.argmax(axis=0)]
        best[scores.max(axis=0) == 0] = "unknown"
        best[~t.str.contains(_WORD).to_numpy(dtype=bool)] = "unknown"
        best[t.str.contains(_CJK).to_numpy(dtype=bool)] = "zh"
        batch["lang_pred"] = best
        return batch


def token_stats(batch: pa.Table) -> pa.Table:
    """Vectorized token counting: whitespace tokens + BPE-ish pieces.

    ws_tokens matches DuckDB's len(regexp_split_to_array(trim(text),'\\s+'))
    so the oracle pair is exact.
    """
    import pyarrow.compute as pc

    text = batch.column("text")
    # RE2 edge-strip (pyarrow regexes are RE2, like DuckDB's):
    # utf8_trim_whitespace is a UNICODE trim (eats \v/NBSP) and would
    # diverge from the oracle's regexp_replace(.., '^\s+|\s+$') on them
    trimmed = pc.replace_substring_regex(text, r"^\s+|\s+$", "")
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    ws_tokens = pc.list_value_length(splits).cast(pa.int64())
    texts = text.to_pylist()
    bpe = np.fromiter(
        (len(_BPE_ISH.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    n_chars = pc.utf8_length(text).cast(pa.int64())
    return batch.append_column("ws_tokens", ws_tokens).append_column(
        "bpe_tokens", pa.array(bpe)
    ).append_column("n_chars_calc", n_chars)


class QualityScorer:
    """Pretraining-style quality signals + composite score.

    Signals: char length, mean word length, punctuation ratio, digit ratio,
    stopword ratio (any language table), uppercase ratio. Composite is a
    fixed linear blend in [0,1] — deterministic, documented, tunable.
    """

    def __init__(self):
        self.all_stop = frozenset().union(*_STOPWORDS.values())
        self.stop_re = re2pin.ascii_word_bounded("|".join(sorted(self.all_stop)))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        n_chars = t.str.len()
        # all-vectorized signals (no per-row python): word count and total
        # word-char count give the exact same mean word length as the old
        # np.mean-per-row pass (same integers, same float64 division), and
        # the stopword alternation counts one hit per stopword token
        n_words_raw = t.str.count(_WORD)
        n_words = n_words_raw.clip(lower=1)
        n_word_chars = t.str.count(re2pin.WORD_CHAR)
        mean_wlen = (n_word_chars / n_words).where(n_words_raw > 0, 0.0).astype(float)
        punct = t.str.count(_PUNCT)
        digits = t.str.count(_DIGIT)
        upper = t.str.count(r"[A-Z]")
        stop_ratio = (
            t.str.lower().str.count(self.stop_re) / n_words
        ).astype(float)
        punct_ratio = (punct / n_chars.clip(lower=1)).astype(float)
        digit_ratio = (digits / n_chars.clip(lower=1)).astype(float)
        upper_ratio = (upper / n_chars.clip(lower=1)).astype(float)
        length_score = (n_chars.clip(upper=2000) / 2000.0).astype(float)
        wlen_score = 1.0 - (mean_wlen - 5.0).abs().clip(upper=5.0) / 5.0
        score = (
            0.3 * length_score
            + 0.2 * wlen_score
            + 0.2 * (1.0 - punct_ratio.clip(upper=0.3) / 0.3)
            + 0.2 * stop_ratio.clip(upper=0.5) / 0.5
            + 0.1 * (1.0 - digit_ratio.clip(upper=0.3) / 0.3)
        )
        out = batch.copy()
        out["n_words"] = n_words_raw
        out["mean_word_len"] = mean_wlen
        out["punct_ratio"] = punct_ratio
        out["digit_ratio"] = digit_ratio
        out["upper_ratio"] = upper_ratio
        out["stopword_ratio"] = stop_ratio
        out["quality_score"] = score
        return out


def _rolling_hash64(s: str, k: int) -> np.ndarray:
    """Vectorized polynomial rolling hash of all char k-grams (uint64
    wraparound arithmetic — the classic Rabin-Karp shape, numpy-wide)."""
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    base = np.uint64(1099511628211)  # FNV prime as the polynomial base
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = 1
        for i in range(1, k):
            powers[i] = powers[i - 1] * base
        n = len(codes) - k + 1
        # windowed dot product mod 2^64: sum_j codes[i+j] * base^(k-1-j)
        out = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # k (=8) vector passes, no per-gram python
            out += codes[j : j + n] * powers[k - 1 - j]
    return out


def fingerprint_winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing fingerprints (Schleimer et al.): char k-gram rolling
    hashes, rightmost-min per window, deduped consecutive picks. Fully
    vectorized: k vector passes for the rolling hash + one sliding-window
    argmin pass."""
    # RE2-pinned \s and space-only strip: the paired oracle is
    # trim(regexp_replace(lower(text), '\s+', ' ', 'g')) — RE2 \s has no
    # \v/NBSP, and DuckDB trim() strips spaces only
    s = re2pin.WS_RUN.sub(" ", text.lower()).strip(" ")
    if not s:
        return []
    if len(s) < k:
        return [int(_rolling_hash64(s.ljust(k, "\0"), k)[0])]
    hs = _rolling_hash64(s, k)
    if len(hs) <= window:
        return [int(hs.min())]
    # rightmost minimum per window, vectorized: reverse, windowed argmin
    sw = np.lib.stride_tricks.sliding_window_view(hs[::-1], window)
    rev_arg = sw.argmin(axis=1)[::-1]
    pos = np.arange(len(hs) - window + 1) + (window - 1 - rev_arg)
    keep = np.ones(len(pos), dtype=bool)
    keep[1:] = pos[1:] != pos[:-1]
    return hs[pos[keep]].tolist()


class Fingerprinter:
    """map_batches stage: adds fingerprints list + a compact doc signature."""

    def __init__(self, k: int = 8, window: int = 4):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [fingerprint_winnow(t, self.k, self.window) for t in texts]
        sig = np.fromiter(
            (min(f) if f else 0 for f in fps), dtype=np.uint64, count=len(fps)
        )
        return batch.append_column(
            "fingerprints", pa.array(fps, type=pa.list_(pa.uint64()))
        ).append_column("doc_sig", pa.array(sig, type=pa.uint64()))


def lang_id(ds, concurrency: int | None = None):
    """Dataset stage wrapper; actor pool when concurrency given."""
    kw = {"batch_format": "pandas", "batch_size": 4096}
    if concurrency:
        return ds.map_batches(LangId, concurrency=concurrency, **kw)
    return ds.map_batches(LangId(), **kw)


def quality(ds, concurrency: int | None = None):
    kw = {"batch_format": "pandas", "batch_size": 4096}
    if concurrency:
        return ds.map_batches(QualityScorer, concurrency=concurrency, **kw)
    return ds.map_batches(QualityScorer(), **kw)
