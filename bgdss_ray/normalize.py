"""Municipality name normalization: stateful lookup stage with per-actor cache.

The reference corrects user-typed municipality names with an LLM behind an
lru+dict cache keyed 'UF:NAME', passthrough-on-error, 'erro4040' as the
not-found sentinel (municipality_corrector.py:20-43,119,129-136). Its
*deterministic* core — the behavior the MDS scrapers actually rely on — is
the dropdown match: exact case-insensitive, then substring, else not-found
(mds_parcelas.py:343-385; mds_saldo.py:572-614). That core is what this
stage implements; the LLM corrector remains a pluggable variant exactly like
the extraction stage.

Ray shape: a callable class for map_batches (actor pool) holding the
dimension table (UF → official names) and the result cache — per-worker
state, the reference's caching pattern.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

NOT_FOUND = "erro4040"  # municipality_corrector.py not-found sentinel


def match_municipality(name: str, options: list[str]) -> str | None:
    """Exact case-insensitive match first, then substring
    (mds_parcelas.py:357-372)."""
    up = name.upper()
    for opt in options:
        if opt.upper() == up:
            return opt
    for opt in options:
        if up in opt.upper():
            return opt
    return None


class MunicipalityNormalizer:
    """map_batches stage over (uf, municipality) columns.

    ``dimension``: {UF: [official names]} — broadcast once per actor via
    constructor. Adds ``municipality_norm`` ('erro4040' when unmatched) and
    ``muni_found`` bool. Cache keyed 'UF:NAME' like the reference.
    """

    def __init__(self, dimension: dict[str, list[str]]):
        self.dim = {uf.upper(): names for uf, names in dimension.items()}
        self.cache: dict[str, str] = {}

    def lookup(self, uf: str, name: str) -> str:
        key = f"{uf.upper()}:{name.upper()}"
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        options = self.dim.get(uf.upper(), [])
        result = match_municipality(name, options) or NOT_FOUND
        self.cache[key] = result
        return result

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["municipality_norm"] = [
            self.lookup(u, n) for u, n in zip(batch["uf"], batch["municipality"])
        ]
        batch["muni_found"] = batch["municipality_norm"] != NOT_FOUND
        return batch


def normalize_municipalities(ds, dimension: dict[str, list[str]],
                             concurrency: int = 2):
    """Actor-pool normalization stage."""
    return ds.map_batches(
        MunicipalityNormalizer,
        fn_constructor_args=(dimension,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
