"""MDS-style CSV ingestion: latin-1, ';' with a robust fallback ladder.

Reproduces the reference's CSV handling (mds_parcelas.py:564-572 and the
robust ladder mds_saldo.py:852-892): latin-1 encoding, one junk descriptive
header row before the real header (skiprows=1), try ';' then ',' then
sniffed delimiter, finally a raw non-empty-line count. Implemented two ways:

- ``read_mds_csv``: a Ray Data pipeline over CSV *payload bytes* (binary
  column) — the ladder runs per payload inside map_batches, so thousands of
  exported CSVs parse in parallel;
- ``parse_mds_csv_bytes``: the per-payload ladder itself (also the oracle
  for tests).
"""

from __future__ import annotations

import io

import pandas as pd
import pyarrow as pa


def parse_mds_csv_bytes(payload: bytes) -> tuple[pd.DataFrame | None, str, int]:
    """Parse one MDS CSV export.

    Returns (df_or_None, method, record_count). Ladder identical to
    mds_saldo.py:852-892: ';' → ',' → sniffed → raw line count.
    """
    for sep, method in ((";", "semicolon"), (",", "comma"), (None, "sniffed")):
        try:
            df = pd.read_csv(
                io.BytesIO(payload),
                encoding="latin-1",
                sep=sep,
                engine="python" if sep is None else "c",
                skiprows=1,
                on_bad_lines="skip",
            )
            if len(df) > 0:
                return df, method, len(df)
        except Exception:
            continue
    # fallback: raw non-empty line count after the junk header row
    try:
        text = payload.decode("latin-1")
        lines = [ln.strip() for ln in text.splitlines()[1:] if ln.strip()]
        return None, "raw_lines", len(lines)
    except Exception:
        return None, "failed", 0


class MdsCsvParser:
    """map_batches stage: (csv_id:string, payload:binary) → long-form rows.

    Output: one row per record with csv_id, parse method, plus the logical
    MDS columns found (stringly-typed, like the exports). Files that only
    line-count (no parseable table) emit a single summary row with
    record_count and null fields.
    """

    COLUMNS = ["municipio", "uf", "ano", "mes", "parcela", "conta", "saldo"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("csv_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        frames = []
        for cid, payload in zip(ids, payloads):
            df, method, count = parse_mds_csv_bytes(payload)
            if df is not None:
                df = df.copy()
                df.columns = [str(c).strip().lower() for c in df.columns]
                keep = [c for c in self.COLUMNS if c in df.columns]
                out = df[keep].astype(str) if keep else pd.DataFrame(index=df.index)
                for c in self.COLUMNS:
                    if c not in out.columns:
                        out[c] = None
                out = out[self.COLUMNS]
            else:
                out = pd.DataFrame({c: [None] for c in self.COLUMNS})
            out.insert(0, "csv_id", cid)
            out["parse_method"] = method
            out["record_count"] = count
            frames.append(out)
        merged = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=["csv_id", *self.COLUMNS, "parse_method", "record_count"]
        )
        return pa.Table.from_pandas(merged, preserve_index=False)


def read_mds_csv(payload_ds, batch_size: int = 64):
    """Dataset of (csv_id, payload) → parsed long-form dataset."""
    return payload_ds.map_batches(
        MdsCsvParser(), batch_format="pyarrow", batch_size=batch_size
    )


def count_csv_records(payload: bytes) -> int:
    """The reference's _count_csv_records return value (count only)."""
    return parse_mds_csv_bytes(payload)[2]
