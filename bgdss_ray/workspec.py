"""Work-spec generation: the crawl "query" — year/month/municipality
configs → the seed frontier cross product.

Reproduces the reference's config semantics:
  - years list builders single/range/multiple/all (mds_saldo.py:139-152;
    'all' = 2011..current year — current year is a parameter here, never
    the wall clock, for determinism);
  - months list builders single/multiple/all, legacy int with 13 = all
    (mds_saldo.py:154-170);
  - the month-set text parser "1,3,5-8,12" → sorted union of singles and
    ranges with the same validation rules (mds_saldo_ui.py:716-781);
  - portal semantics year==999 → all years, month==13 → all months
    (portal_saude_ui.py:223-247).

The cross product is emitted as seed frontier rows (SURVEY.md §2.10) — one
row per (site, year, month, municipality) combination, driver-side (the
work list is tiny; the frontier it seeds is not).
"""

from __future__ import annotations

from typing import Any


class WorkSpecError(ValueError):
    pass


def parse_month_spec(months_str: str) -> list[int]:
    """'1,3,5-8,12' → sorted unique [1,3,5,6,7,8,12] (mds_saldo_ui.py:716-781)."""
    months: set[int] = set()
    parts = [p.strip() for p in months_str.split(",")]
    for part in parts:
        if "-" in part:
            range_parts = part.split("-")
            if len(range_parts) != 2:
                raise WorkSpecError(f"invalid range format: {part!r}")
            start, end = int(range_parts[0].strip()), int(range_parts[1].strip())
            if start < 1 or start > 12 or end < 1 or end > 12:
                raise WorkSpecError("months must be 1..12")
            if start > end:
                raise WorkSpecError("range start must be <= end")
            months.update(range(start, end + 1))
        else:
            m = int(part)
            if m < 1 or m > 12:
                raise WorkSpecError("months must be 1..12")
            months.add(m)
    if not months:
        raise WorkSpecError("at least one month required")
    return sorted(months)


def years_list(year_config: dict[str, Any] | int, current_year: int = 2023) -> list[int]:
    """mds_saldo.py:139-152 semantics; 999 = all (portal_saude_ui.py:223-247)."""
    if isinstance(year_config, int):
        if year_config == 999:
            return list(range(2011, current_year + 1))
        return [year_config]
    t = year_config.get("type")
    if t == "single":
        return [year_config["year"]]
    if t == "range":
        return list(range(year_config["start_year"], year_config["end_year"] + 1))
    if t == "multiple":
        return list(year_config["years"])
    if t == "all":
        return list(range(2011, current_year + 1))
    return [current_year]


def months_list(month_config: dict[str, Any] | int) -> list[int]:
    """mds_saldo.py:154-170 semantics; legacy int, 13 = all."""
    if isinstance(month_config, dict):
        t = month_config.get("type")
        if t == "single":
            return [month_config["month"]]
        if t == "multiple":
            return list(month_config["months"])
        if t == "all":
            return list(range(1, 13))
    else:
        if month_config == 13:
            return list(range(1, 13))
        if 1 <= month_config <= 12:
            return [month_config]
    return [1]


def seed_work_rows(
    sites: list[str],
    year_config: dict[str, Any] | int,
    month_config: dict[str, Any] | int,
    municipalities: list[str] | None = None,
    current_year: int = 2023,
) -> list[dict]:
    """The cross product as seed work rows (one per combination), in the
    reference's loop-nest order: site → year → month → municipality
    (mds_saldo.py:86-103,296-389)."""
    rows: list[dict] = []
    seq = 0
    munis = municipalities if municipalities else [None]
    for site in sites:
        for y in years_list(year_config, current_year):
            for m in months_list(month_config):
                for muni in munis:
                    rows.append(
                        {
                            "site": site,
                            "year": y,
                            "month": m,
                            "municipality": muni,
                            "seq": seq,
                        }
                    )
                    seq += 1
    return rows


def seeds_from_work_rows(rows: list[dict], url_template: str) -> list[dict]:
    """Work rows → seed frontier rows for pipeline.crawl (url + seq)."""
    out = []
    for r in rows:
        out.append(
            {
                "url": url_template.format(**r),
                "title": f"{r['site']} {r['year']}-{r['month']:02d}",
                "seq": r["seq"],
            }
        )
    return out


# ---------------------------------------------------------------------------
# Early-stop heuristics (SURVEY §2.8: adaptive frontier pruning — the driver
# loop reads per-partition counts between waves and prunes remaining work)


def scan_years_with_earlystop(years_in_order: list[int],
                              counts: dict[int, int]) -> list[int]:
    """Years actually attempted under the reference's year-scan stop rule
    (portal_saude_ui.py:1546-1550): scanning in the given (newest-first)
    order, an empty year stops the scan once the gap to the last year WITH
    data exceeds 3 — the stopping year itself counts as attempted."""
    attempted: list[int] = []
    with_data: list[int] = []
    for y in years_in_order:
        attempted.append(y)
        if counts.get(y, 0) > 0:
            with_data.append(y)
        elif with_data and (with_data[-1] - y) > 3:
            break
    return attempted


def scan_months_until_empty(months_in_order: list[int],
                            counts: dict[int, int]) -> list[int]:
    """Months attempted under the month-scan rule (portal_saude_ui.py:
    1581-1584): the first month with zero results stops the scan (a likely
    future month); the empty month itself was attempted."""
    attempted: list[int] = []
    for m in months_in_order:
        attempted.append(m)
        if counts.get(m, 0) == 0:
            break
    return attempted


def drop_future_months(year: int, months: list[int],
                       now_year: int, now_month: int) -> list[int]:
    """Declarative form of the future-month skip (portal_saude_ui.py:
    1444-1448, which breaks the current year's scan at the first empty
    month beyond "now"): past years keep all months, future years none,
    the current year keeps months <= now_month."""
    if year < now_year:
        return list(months)
    if year > now_year:
        return []
    return [m for m in months if m <= now_month]


def period_counts(ds, period_col: str) -> dict:
    """Distributed per-period row counts: one Count aggregate (shuffle of
    the slim period column only) → an O(periods) driver dict. This is the
    between-waves signal the early-stop folds consume — never a row-level
    driver read."""
    from ray.data.aggregate import Count

    agg = (
        ds.select_columns([period_col])
        .groupby(period_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return dict(zip(agg[period_col], agg["n"]))


def prune_workspec(rows: list[dict], year_counts: dict[int, int],
                   now_year: int | None = None,
                   now_month: int | None = None) -> list[dict]:
    """Adaptive pruning of remaining work rows from observed per-year
    counts (+ optional future-month skip), preserving row order and seq.
    The reference interleaves these stops inside its scrape loops; here
    the equivalent fold runs between crawl waves on aggregate counts."""
    years_seen_order: list[int] = []
    for r in rows:
        if r["year"] not in years_seen_order:
            years_seen_order.append(r["year"])
    keep_years = set(scan_years_with_earlystop(years_seen_order, year_counts))
    out = []
    for r in rows:
        if r["year"] not in keep_years:
            continue
        if now_year is not None and now_month is not None:
            if r["month"] not in drop_future_months(
                r["year"], [r["month"]], now_year, now_month
            ):
                continue
        out.append(r)
    return out
