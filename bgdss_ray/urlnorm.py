"""URL canonicalization and hashing.

The reference dedups raw URL strings with an in-memory set
(/root/reference/src/modules/sites/portal_saude_mg.py:417-422) and
absolutizes relative hrefs with urljoin (:509-510). Here canonicalization is
explicit (lowercase scheme/host, default-port strip, sorted query, fragment
strip, path normalization) because the dedup key at 10^10-URL scale must be a
stable 64-bit hash of the canonical form, not the raw string.

``url_hash64`` is the one hash used everywhere (engine stages, oracle,
seen-set shards) so both sides of every equality test share it. The value
is the little-endian first 8 bytes of md5 — exactly DuckDB's
``md5_number_upper`` — so crawl artifacts (url_hash, the synthetic web's
content draws) are reproducible by the SQL oracles from first principles.
Swap for xxhash64 on a real cluster for ~5x hashing throughput (same
64-bit contract); the oracle pairing is a test-fixture property, not an
engine dependency.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import numpy as np

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base: str | None = None) -> str:
    """Canonical URL: absolutize, lowercase scheme/host, strip fragment &
    default port, sort query params, collapse empty path to '/'."""
    if base:
        url = urljoin(base, url)
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    # normalize duplicate slashes (keep it simple + reversible)
    while "//" in path:
        path = path.replace("//", "/")
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def hash64_one(text: str) -> int:
    """Stable unsigned 64-bit hash of one string
    (== DuckDB ``md5_number_upper(text)``)."""
    return int.from_bytes(
        hashlib.md5(text.encode("utf-8")).digest()[:8], "little"
    )


def url_hash64(texts) -> np.ndarray:
    """Vectorized stable 64-bit hash → uint64 ndarray.

    Accepts any iterable of str (python list, pandas Series, pyarrow Array
    via .to_pylist upstream). md5 per item runs ~1M/s/core; at cluster
    scale substitute xxhash.xxh64_intdigest with the same signature.
    """
    m5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(m5(t.encode("utf-8")).digest()[:8], "little")
            for t in texts
        ),
        dtype=np.uint64,
        count=len(texts),
    )
