"""Extractor vs synth ground truth: the 7-field contract on crawled PDFs."""

import pyarrow as pa
import pytest
import ray.data as rd

from bgdss_ray.config import SENTINEL, NOT_CLASSIFIED, CrawlConfig
from bgdss_ray.consolidate import (
    processing_summary,
    rename_pt,
    summary_stats,
    validation_stats,
)
from bgdss_ray.extract import ResolutionExtractor, extract_resolutions
from bgdss_ray.oracle import crawl_oracle
from bgdss_ray.parse import parse_pdf_spans
from bgdss_ray.schemas import DOCUMENTS, PT_RENAME, RESOLUTION_COLUMNS, SPAN_STRUCT
from bgdss_ray.synth import SynthWeb, SynthWebConfig
from bgdss_ray.validators import BUDGET_CATEGORIES

WEB = SynthWebConfig(seed=42, n_hosts=5, years=(2023,), months=(1,))


@pytest.fixture(scope="module")
def pdf_docs():
    """Valid PDF span-docs from the oracle crawl, with synth ground truth."""
    w = SynthWeb(WEB)
    res = crawl_oracle(w, w.seeds(), CrawlConfig(max_depth=3))
    docs = [(u, s) for u, s in res.documents if w.classify(u) == "pdf"]
    assert len(docs) > 20
    return w, docs


def _docs_table(docs):
    return pa.Table.from_arrays(
        [
            pa.array([u for u, _ in docs], type=pa.string()),
            pa.array([s for _, s in docs], type=pa.list_(SPAN_STRUCT)),
        ],
        schema=DOCUMENTS,
    )


def test_extractor_matches_synth_ground_truth(pdf_docs):
    w, docs = pdf_docs
    table = ResolutionExtractor()(_docs_table(docs))
    df = table.to_pandas().set_index("doc_id")
    for url, _spans in docs:
        host, y, m, k = w._parse_doc(url)
        row = df.loc[url]
        num = w._doc_num(host, y, m, k)
        assert row["numero_resolucao"] == f"{num}/{y}"
        day = 1 + w._h("day", host, y, m, k) % 28
        assert row["data_inicial"] == f"{day:02d}/{m:02d}/{y}"
        # relacionada present iff synth embedded it
        if w._u("rel", host, y, m, k) < 0.60:
            rel = 1 + w._h("relnum", host, y, m, k) % 99_999
            assert row["relacionada"] == f"{rel}/{y - 1}"
        else:
            assert row["relacionada"] == SENTINEL
        if w._u("dot", host, y, m, k) < 0.85:
            from bgdss_ray.synth import BUDGET_CODES

            code = BUDGET_CODES[w._h("code", host, y, m, k) % len(BUDGET_CODES)]
            unit = w._h("unit", host, y, m, k) % 9999
            assert row["dotacao_orcamentaria"] == f"10.{code}.{unit:04d}.2025"
            assert row["abreviacao"] == BUDGET_CATEGORIES[code]
        else:
            assert row["dotacao_orcamentaria"] == SENTINEL
            assert row["abreviacao"] == NOT_CLASSIFIED
        if w._u("ved", host, y, m, k) < 0.70:
            assert "vedad" in row["vedado_utilizacao"].lower() or "proibid" in row["vedado_utilizacao"].lower()
        else:
            assert row["vedado_utilizacao"] == SENTINEL
        # objeto = first non-header paragraph
        assert row["objeto"].startswith(("Dispõe", "Aprova", "Institui", "Autoriza", "Estabelece"))
        # link: doc_id is the URL itself for crawled docs
        assert row["link"] == url


def test_length_gate_marks_failed_rows():
    spans = parse_pdf_spans("curto demais")
    t = pa.Table.from_arrays(
        [pa.array(["d1"], type=pa.string()), pa.array([spans], type=pa.list_(SPAN_STRUCT))],
        schema=DOCUMENTS,
    )
    out = ResolutionExtractor()(t).to_pandas()
    assert not out.loc[0, "ok"]
    assert out.loc[0, "numero_resolucao"] == SENTINEL


def test_url_mapping_broadcast_join(pdf_docs):
    """Manifest lookup with sentinel fill for missing keys (pdf_call.py:101-103)."""
    _w, docs = pdf_docs
    t = pa.Table.from_arrays(
        [
            pa.array(["known", "unknown"], type=pa.string()),
            pa.array([docs[0][1], docs[1][1]], type=pa.list_(SPAN_STRUCT)),
        ],
        schema=DOCUMENTS,
    )
    out = ResolutionExtractor(url_mapping={"known": "https://x/y.pdf"})(t).to_pandas()
    assert out.loc[0, "link"] == "https://x/y.pdf"
    assert out.loc[1, "link"] == SENTINEL


def test_consolidation_over_dataset(pdf_docs, ray_session):
    _w, docs = pdf_docs
    ds = rd.from_arrow(_docs_table(docs))
    res_ds = extract_resolutions(ds)
    stats = summary_stats(res_ds)
    assert int(stats["total_rows"].iloc[0]) == len(docs)
    assert int(stats["numero_resolucao_informado"].iloc[0]) == len(docs)
    assert 0 < int(stats["relacionada_informado"].iloc[0]) < len(docs)

    vstats = validation_stats(res_ds)
    assert int(vstats["bad_numero"].iloc[0]) == 0
    assert int(vstats["bad_data_inicial"].iloc[0]) == 0

    psum = processing_summary(res_ds)
    assert psum["successful"] == len(docs)
    assert psum["success_rate"] == 1.0


def test_rename_pt():
    t = pa.table({c: ["x"] for c in RESOLUTION_COLUMNS})
    out = rename_pt(t)
    assert out.schema.names == [PT_RENAME[c] for c in RESOLUTION_COLUMNS]
