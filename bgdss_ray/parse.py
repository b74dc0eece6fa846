"""Parsing stages: HTML → interleaved spans + links; PDF text → text spans.

Reference semantics reproduced:
  - link extraction via the ``h2.title > a`` selector, skipping empty
    href/text (portal_saude_mg.py:388-414);
  - href absolutization with urljoin (portal_saude_mg.py:509-510);
  - PDF markdown text → paragraphs (pdf_call.py:206 produces markdown; we
    split on blank lines).

Two implementations on purpose:
  - ``parse_html_spans`` / ``parse_pdf_spans``: simple per-string functions
    used by the sequential oracle;
  - ``SpanParser``: the engine's map_batches callable (regexes compiled once
    per actor, Arrow in / Arrow out) — tests assert both produce identical
    span sequences on the same corpus (FIXTURES.md "per-row invariant").
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .re2pin import split_ws
from .schemas import DOCUMENTS, SPAN_STRUCT
from .urlnorm import canonicalize

# One scan, DOM order: group 1 = desc paragraph, groups 2+3 = link href/title.
_SPAN_RE = re.compile(
    r'<p class="desc">(.*?)</p>'
    r'|<h2 class="title"><a href="([^"]*)">(.*?)</a></h2>',
    re.S,
)


def parse_html_spans(html: str, base_url: str) -> list[dict]:
    """Ordered interleaved spans of one listing page (oracle-side)."""
    spans = []
    for i, m in enumerate(_SPAN_RE.finditer(html)):
        if m.group(1) is not None:
            spans.append(
                {"kind": "text", "text": m.group(1), "media_ref": "", "offset": i}
            )
        else:
            href, title = m.group(2), m.group(3)
            if not href or not title.strip():
                continue  # reference skips empty href/text (portal_saude_mg.py:399-403)
            spans.append(
                {
                    "kind": "media",
                    "text": title,
                    "media_ref": canonicalize(href, base=base_url),
                    "offset": i,
                }
            )
    return spans


def parse_pdf_spans(text: str) -> list[dict]:
    """Paragraph text spans of one extracted document (oracle-side)."""
    out = []
    for i, para in enumerate(p for p in text.split("\n\n") if p.strip()):
        out.append({"kind": "text", "text": para, "media_ref": "", "offset": i})
    return out


def links_of(spans: list[dict]) -> list[tuple[str, str]]:
    """(url, title) of media spans, in span order."""
    return [(s["media_ref"], s["text"]) for s in spans if s["kind"] == "media"]


class SpanParser:
    """Engine-side map_batches callable: fetch-result batch → documents batch.

    Input columns: url (canonical), kind ('listing'|'pdf'), body (binary),
    status. Output: DOCUMENTS schema (doc_id, spans) — one row per
    successfully fetched, valid page. Stateless aside from compiled
    regexes, so it runs as cheap Ray tasks; compile cost is amortized by
    making it a callable class anyway.
    """

    def __init__(self, min_pdf_bytes: int = 1024, pdf_magic: bytes = b"%PDF-",
                 rules=None):
        self.min_pdf_bytes = min_pdf_bytes
        self.pdf_magic = pdf_magic
        # declarative selector config (adapters.ParseRules) compiles to the
        # same single-scan regex; None keeps the built-in default selectors
        self.span_re = rules.compile() if rules is not None else _SPAN_RE

    def spans_for_row(self, url: str, kind: str, body: bytes) -> list[dict] | None:
        if kind == "listing":
            return parse_html_spans(body.decode("utf-8", errors="replace"), url)
        if kind == "pdf":
            # PDF validity filter (portal_saude_mg.py:539-561)
            if len(body) < self.min_pdf_bytes or not body.startswith(self.pdf_magic):
                return None
            text = body[len(b"%PDF-1.4\n"):].decode("utf-8", errors="replace")
            return parse_pdf_spans(text)
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        kinds = batch.column("kind").to_pylist()
        bodies = batch.column("body").to_pylist()
        statuses = batch.column("status").to_numpy(zero_copy_only=False)
        doc_ids: list[str] = []
        spans_col: list[list[dict]] = []
        for url, kind, body, status in zip(urls, kinds, bodies, statuses):
            if status != 200 or body is None:
                continue
            spans = self.spans_for_row(url, kind, body)
            if spans is None:
                continue
            doc_ids.append(url)
            spans_col.append(spans)
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                pa.array(spans_col, type=pa.list_(SPAN_STRUCT)),
            ],
            schema=DOCUMENTS,
        )


def spanify_flat_documents(batch: pa.Table) -> pa.Table:
    """Adapter: flat text documents (testdata ``documents`` table:
    doc_id,text,…) → interleaved-span DOCUMENTS rows.

    Splits text into ~12-word paragraphs (text spans) and appends one media
    span per document derived from doc_id — a deterministic bridge from the
    driver's testdata to the input_hint schema.
    """
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids, spans_col = [], []
    for i, t in zip(ids, texts):
        # RE2-pinned split: str.split() is a unicode-ws split (\v/NBSP)
        # while the spanify oracle splits on RE2 '\s+'
        words = split_ws(t)
        spans = []
        off = 0
        for j in range(0, len(words), 12):
            spans.append(
                {
                    "kind": "text",
                    "text": " ".join(words[j : j + 12]),
                    "media_ref": "",
                    "offset": off,
                }
            )
            off += 1
        spans.append(
            {
                "kind": "media",
                "text": f"attachment {i}",
                "media_ref": f"https://media.example.gov.br/blob/{i}.pdf",
                "offset": off,
            }
        )
        doc_ids.append(str(i))
        spans_col.append(spans)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(spans_col, type=pa.list_(SPAN_STRUCT)),
        ],
        schema=DOCUMENTS,
    )
