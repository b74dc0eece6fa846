"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` BEFORE importing this module; nothing
here (or in bgdss_ray) calls ray.init/ray.shutdown.

- ``entry()``: flagship pipeline on /root/testdata/sf0.001 — flat documents
  → interleaved spans (input_hint schema) → deterministic 7-field
  extraction → quality enrichment; returns a ray.data.Dataset.
- ``queries()``: every implemented operator/pipeline from SURVEY.md §2 plus
  the training-data ops; each callable takes sf_dir.
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible entries
  (column names match exactly; money sums as exact integer cents).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from bgdss_ray import pipelines as P
from bgdss_ray.queries import SQL_PAIRED


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return P.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in SQL_PAIRED.items()
    }
    q.update(
        {
            # crawl_documents is SQL-paired via its per-doc span digest
            # (crawl_documents in SQL_PAIRED); crawl_metrics carries
            # wall-clock rate columns SQL cannot reproduce — its
            # deterministic columns are paired as crawl_wave_counts
            "crawl_metrics": P.crawl_metrics_pipeline,
        }
    )
    return q


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in SQL_PAIRED.items()}
