"""pyarrow.Schema constants for every table at a stage boundary.

The reference keeps schemas implicit (dict keys, sentinel fills —
/root/reference/src/utils/pdf_data_to_table.py:232-263); here every table is
an explicit Arrow schema checked at stage boundaries.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "media"
        pa.field("text", pa.string()),       # paragraph text, or link title for media
        pa.field("media_ref", pa.string()),  # "" for text spans, URL for media spans
        pa.field("offset", pa.int32()),      # 0-based strictly increasing position
    ]
)

# The canonical interleaved-span documents table (BASELINE.json input_hint).
DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Frontier rows (SURVEY.md §1.1 row 1).
FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),          # canonical URL
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.float32()),
        pa.field("seq", pa.int64()),           # discovery order within the wave
        pa.field("title", pa.string()),
    ]
)

# Fetch results (SURVEY.md §1.1 row 2) + deterministic schedule columns.
FETCH_RESULTS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("status", pa.int32()),
        pa.field("attempts", pa.int32()),
        pa.field("body", pa.large_binary()),
        pa.field("content_len", pa.int64()),
        pa.field("kind", pa.string()),          # "listing" | "pdf" | "error"
        pa.field("crawl_seq", pa.int64()),      # global deterministic fetch rank
        pa.field("vtime", pa.float64()),        # virtual fetch time (politeness)
    ]
)

# 9-column extraction output (reference pdf_data_to_table.py:34-44).
RESOLUTION_COLUMNS = [
    "numero_resolucao",
    "relacionada",
    "objeto",
    "data_inicial",
    "prazo_execucao",
    "vedado_utilizacao",
    "dotacao_orcamentaria",
    "link",
    "abreviacao",
]
RESOLUTIONS = pa.schema([pa.field(c, pa.string()) for c in RESOLUTION_COLUMNS])

# Portuguese presentation headers (reference pdf_data_to_table.py:46-56).
PT_RENAME = {
    "numero_resolucao": "Número da Resolução",
    "relacionada": "Relacionada",
    "objeto": "Objeto",
    "data_inicial": "Data Inicial",
    "prazo_execucao": "Prazo de Execução",
    "vedado_utilizacao": "Vedado a Utilização",
    "dotacao_orcamentaria": "Dotação Orçamentária",
    "link": "Link",
    "abreviacao": "Abreviação",
}

METRICS = pa.schema(
    [
        pa.field("wave", pa.int32()),
        pa.field("frontier_size", pa.int64()),
        pa.field("selected", pa.int64()),
        pa.field("fetched_ok", pa.int64()),
        pa.field("fetch_errors", pa.int64()),
        pa.field("new_urls", pa.int64()),
        pa.field("rejected_urls", pa.int64()),
        pa.field("docs_emitted", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("urls_per_s", pa.float64()),
        pa.field("frontier_ops_per_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def assert_schema(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Cheap boundary check: names + types must match exactly."""
    if table.schema.names != schema.names or any(
        not table.schema.field(n).type.equals(schema.field(n).type)
        for n in schema.names
    ):
        raise TypeError(
            f"schema mismatch at {where}: got {table.schema}, want {schema}"
        )
    return table
