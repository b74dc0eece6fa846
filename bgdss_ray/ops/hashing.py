"""Shared deterministic-hash idioms for sampling operators.

Both deterministic samplers key every row by ``md5(str(id))`` so the
"random" choice is exactly reproducible on the DuckDB side
(``md5(CAST(id AS VARCHAR))``), stable under repartitioning, and free of
RNG state: ``deterministic_sample`` ranks the full 128 bits,
``mixture_sample`` thresholds the first 32. This helper is the one copy
of the digest loop (hashlib has no vectorized md5; everything after the
loop is numpy). ``ops/dedup.md5_hash64`` is intentionally separate — it
hashes raw TEXT (not ``str(id)``) and reads little-endian u64, a
different, equally load-bearing byte contract.
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_digest_matrix(ids) -> np.ndarray:
    """(n, 16) uint8 matrix of ``md5(str(i))`` digests, one row per id.

    Big-endian numeric order of the rows == hex-string order == DuckDB's
    ``md5()`` collation order, so callers may rank via u8/u8 views or
    threshold a prefix without rendering hex strings."""
    m = hashlib.md5
    buf = b"".join(m(str(i).encode()).digest() for i in ids)
    return np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
