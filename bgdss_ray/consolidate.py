"""Consolidation: summary aggregates, validation stats, presentation sinks.

Reproduces the reference's sink-side aggregate surface:
  - per-column non-sentinel counts + total rows (summary sheet,
    pdf_data_to_table.py:321-365);
  - validation stats: bad-format counts re-checked with the same regexes
    (pdf_data_to_table.py:377-423);
  - processing summary: success rate (pdf_data_to_table.py:465-498);
  - run consolidation across periods: sums/counts over result envelopes
    (portal_saude_ui.py:1459-1508,1601-1676);
  - pt header rename (pdf_data_to_table.py:46-56) and the final
    small-table export.

All implemented as Ray Data aggregates / vectorized map_batches — the
summary is a global aggregate computed with per-batch partials, not a
driver loop.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .config import SENTINEL
from .schemas import PT_RENAME, RESOLUTION_COLUMNS
from .validators import (
    valid_brazilian_date_mask,
    valid_resolution_number_mask,
)


def summary_stats(resolutions_ds) -> pd.DataFrame:
    """Per-column count of values != sentinel, plus total rows.

    Partial counts per batch inside map_batches, tiny final combine —
    the pre-aggregate pattern (one partial row per batch, then a sum).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        row = {"total_rows": len(df)}
        for c in RESOLUTION_COLUMNS:
            if c in df.columns:
                row[f"{c}_informado"] = int((df[c] != SENTINEL).sum())
        return pa.Table.from_pandas(pd.DataFrame([row]), preserve_index=False)

    parts = resolutions_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:  # no_data is a valid empty result (mds_saldo.py:427-434)
        cols = ["total_rows"] + [f"{c}_informado" for c in RESOLUTION_COLUMNS]
        parts = pd.DataFrame([{c: 0 for c in cols}])
    return parts.sum(axis=0).to_frame().T.astype("int64")


def validation_stats(resolutions_ds) -> pd.DataFrame:
    """Format re-validation at the sink (pdf_data_to_table.py:399-416):
    counts of malformed numero/date among non-sentinel values."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        num = df["numero_resolucao"]
        di = df["data_inicial"]
        row = {
            "rows": len(df),
            "bad_numero": int(
                ((num != SENTINEL) & ~valid_resolution_number_mask(num)).sum()
            ),
            "bad_data_inicial": int(
                ((di != SENTINEL) & ~valid_brazilian_date_mask(di)).sum()
            ),
            "sentinel_cells": int(
                sum((df[c] == SENTINEL).sum() for c in RESOLUTION_COLUMNS if c in df)
            ),
        }
        return pa.Table.from_pandas(pd.DataFrame([row]), preserve_index=False)

    parts = resolutions_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        parts = pd.DataFrame(
            [{"rows": 0, "bad_numero": 0, "bad_data_inicial": 0, "sentinel_cells": 0}]
        )
    return parts.sum(axis=0).to_frame().T.astype("int64")


def processing_summary(resolutions_ds) -> dict:
    """Success-rate summary over the ok error-channel column
    (pdf_data_to_table.py:465-498)."""

    def partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("ok").to_pandas()
        return pa.table({"n": [len(ok)], "ok": [int(ok.sum())]})

    agg = resolutions_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(agg["n"].sum()) if not agg.empty else 0
    ok = int(agg["ok"].sum()) if not agg.empty else 0
    return {
        "total": n,
        "successful": ok,
        "failed": n - ok,
        "success_rate": (ok / n) if n else 0.0,
    }


def rename_pt(table: pa.Table) -> pa.Table:
    """Portuguese presentation headers (pdf_data_to_table.py:46-56,202)."""
    return table.rename_columns(
        [PT_RENAME.get(c, c) for c in table.schema.names]
    )


def write_final_table(resolutions_ds, out_path: str,
                      processed_at: str = "") -> pd.DataFrame:
    """Final small-table export: the reference's two-sheet Excel workbook
    (pdf_data_to_table.py:287-362) — main sheet 'Resoluções' with
    clamp(max cell len, 10, 100) column widths, plus a 'Resumo' sheet of
    non-sentinel statistics (widths A=30, B=20) — written by the
    dependency-free OOXML writer in ``xlsx.py`` when ``out_path`` ends in
    .xlsx, else CSV with the same 9 pt-headed columns.

    ``processed_at`` replaces the reference's wall-clock 'Data de
    Processamento' cell (callers pass a timestamp; empty keeps the export
    deterministic for tests). The resolutions table is the crawl's *small*
    relational artifact, so a driver-side to_pandas is the right call
    (guide: small results only).
    """
    df = resolutions_ds.to_pandas()
    keep = [c for c in RESOLUTION_COLUMNS if c in df.columns]
    out = df[keep].rename(columns=PT_RENAME)
    if not out_path.endswith(".xlsx"):
        out.to_csv(out_path, index=False)
        return out

    from .config import NOT_CLASSIFIED
    from .xlsx import auto_widths, write_xlsx

    def n_not(col: str, sentinel: str = SENTINEL) -> int:
        return int((out[col] != sentinel).sum()) if col in out.columns else 0

    # the reference's summary rows (pdf_data_to_table.py:330-355)
    resumo = pd.DataFrame(
        {
            "Estatística": [
                "Total de Resoluções",
                "Resoluções com Data Inicial",
                "Resoluções com Prazo Execução",
                "Resoluções com Vedações",
                "Resoluções com Dotação Orçamentária",
                "Resoluções Relacionadas a Outras",
                "Resoluções com Link Disponível",
                "Resoluções Classificadas por Categoria",
                "Data de Processamento",
            ],
            "Valor": [
                len(out),
                n_not("Data Inicial"),
                n_not("Prazo Execução"),
                n_not("Vedado a Utilização"),
                n_not("Dotação Orçamentária"),
                n_not("Relacionada"),
                n_not("Link"),
                n_not("Abreviação", NOT_CLASSIFIED),
                processed_at,
            ],
        }
    )
    write_xlsx(out_path, [
        ("Resoluções", out, auto_widths(out)),
        ("Resumo", resumo, [30.0, 20.0]),
    ])
    return out
