"""Deterministic 7-field extraction: span documents → resolutions table.

The reference delegates this to an LLM whose prompt IS the field spec
(/root/reference/src/ai/pdf_call.py:316-397): numero_resolucao, relacionada,
objeto, data_inicial, prazo_execucao, vedado_utilizacao,
dotacao_orcamentaria — sentinel "NÃO INFORMADO" when absent — then the
system attaches link (from the url_mapping manifest, pdf_call.py:101-103)
and abreviacao (first budget code → category, validators.py:108-129).

Here the default extractor is a deterministic regex/rule implementation of
that contract (SURVEY.md §2.5: "for testability the default extractor is
deterministic"), run as a map_batches stage. An LLM-backed actor variant
would plug in behind the same batch signature (client + rate limiter in
__init__), but is deliberately not used anywhere in tests.

Length gate (>=100 chars, pdf_call.py:73-81) and 20k-char truncation
(pdf_call.py:246) are applied exactly as the reference does.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import SENTINEL
from .schemas import RESOLUTION_COLUMNS, RESOLUTIONS
from .validators import categorize_series, sentinel_fill, valid_brazilian_date_mask

_NUMERO = re.compile(r"\b(\d{1,5}/20\d{2})\b")
_RELACIONADA = re.compile(
    r"(?:[Aa]ltera|[Mm]odifica|[Rr]evoga|em substituição|[Cc]omplementa)"
    r"[^0-9]{0,80}?(\d{1,5}/20\d{2})"
)
_DATE = re.compile(r"\b(\d{2}/\d{2}/\d{4})\b")
_DOTACAO = re.compile(r"dota[çc][ãa]o or[çc]ament[áa]ria\s+([\d][\d.\-]*\d)", re.I)
_VEDADO_KEY = re.compile(r"vedad[ao]|proibid[ao]|não poderá ser utilizado", re.I)
_PRAZO_KEY = re.compile(r"prazo", re.I)
_HEADER = re.compile(r"^\s*RESOLU", re.I)


def doc_text_and_paras(spans: list[dict]) -> tuple[str, list[str]]:
    paras = [s["text"] for s in spans if s["kind"] == "text" and s["text"].strip()]
    return "\n\n".join(paras), paras


def extract_one(text: str, paras: list[str]) -> dict[str, str]:
    """Rule-based extraction of the 7 fields from one document's text."""
    out = {c: SENTINEL for c in RESOLUTION_COLUMNS[:7]}

    m = _NUMERO.search(text)
    if m:
        out["numero_resolucao"] = m.group(1)

    m = _RELACIONADA.search(text)
    if m:
        out["relacionada"] = m.group(1)

    # objeto: first paragraph after the header line (prompt: "first
    # paragraph ... after the number and date")
    for p in paras:
        if not _HEADER.match(p):
            out["objeto"] = p
            break

    m = _DATE.search(text)
    if m:
        out["data_inicial"] = m.group(1)

    for p in paras:
        if _PRAZO_KEY.search(p):
            m = _DATE.search(p)
            if m:
                out["prazo_execucao"] = m.group(1)
                break

    for p in paras:
        if _VEDADO_KEY.search(p):
            out["vedado_utilizacao"] = p
            break

    m = _DOTACAO.search(text)
    if m:
        out["dotacao_orcamentaria"] = m.group(1)
    return out


class ResolutionExtractor:
    """map_batches stage: DOCUMENTS batch → RESOLUTIONS batch (+doc_id, ok).

    ``url_mapping`` is the broadcast small side of the provenance join
    (doc_id → url); pass a plain dict (driver captures it in the closure /
    actor constructor — reference joins the manifest the same way,
    pdf_call.py:164-173). When the doc_id itself is the fetched URL (crawl
    output), it is used directly.
    """

    def __init__(
        self,
        url_mapping: dict[str, str] | None = None,
        min_text_chars: int = 100,
        max_text_chars: int = 20_000,
    ):
        self.url_mapping = url_mapping or {}
        self.min_text_chars = min_text_chars
        self.max_text_chars = max_text_chars

    def link_for(self, doc_id: str) -> str:
        if doc_id in self.url_mapping:
            return self.url_mapping[doc_id]
        if doc_id.startswith("http"):
            return doc_id
        return SENTINEL

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        rows: dict[str, list] = {c: [] for c in RESOLUTION_COLUMNS}
        out_ids: list[str] = []
        ok: list[bool] = []
        for doc_id, spans in zip(ids, spans_col):
            text, paras = doc_text_and_paras(spans)
            out_ids.append(doc_id)
            if len(text) < self.min_text_chars:  # length gate, pdf_call.py:73-81
                ok.append(False)
                for c in RESOLUTION_COLUMNS:
                    rows[c].append(SENTINEL)
                continue
            ok.append(True)
            if len(text) > self.max_text_chars:
                # truncation, pdf_call.py:246 — rebuild paras from the
                # truncated text so para-scanned fields (objeto, prazo,
                # vedado) see exactly what the char-scanned fields see
                text = text[: self.max_text_chars]
                paras = [p for p in text.split("\n\n") if p.strip()]
            fields = extract_one(text, paras)
            for c in RESOLUTION_COLUMNS[:7]:
                rows[c].append(fields[c])
            rows["link"].append(self.link_for(doc_id))
            rows["abreviacao"].append("")  # vectorized below

        df = pd.DataFrame(rows)
        # abreviacao from first budget code of dotacao (validators.py:108-129)
        df["abreviacao"] = categorize_series(df["dotacao_orcamentaria"])
        for c in RESOLUTION_COLUMNS:
            df[c] = sentinel_fill(df[c])
        df.insert(0, "doc_id", out_ids)
        df["ok"] = np.asarray(ok)
        # error-channel kept as data: failed rows stay, reference keeps them
        # for stats (pdf_data_to_table.py:172,477-478)
        return pa.Table.from_pandas(df, preserve_index=False)


def extract_resolutions(docs_ds, url_mapping: dict[str, str] | None = None,
                        batch_size: int = 1024):
    """DOCUMENTS dataset → resolutions dataset (doc_id + 9 cols + ok)."""
    return docs_ds.map_batches(
        ResolutionExtractor(url_mapping),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
