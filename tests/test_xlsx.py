"""Dependency-free XLSX export: OOXML round-trip + the reference's
width/summary semantics (pdf_data_to_table.py:287-362)."""

import zipfile

import pandas as pd
import pytest
import ray.data as rd

from bgdss_ray.config import SENTINEL
from bgdss_ray.consolidate import write_final_table
from bgdss_ray.schemas import PT_RENAME, RESOLUTION_COLUMNS
from bgdss_ray.xlsx import auto_widths, read_xlsx_sheet, write_xlsx


def _res_df(n=7):
    rows = []
    for i in range(n):
        rows.append(
            {
                "doc_id": f"http://h/doc-{i}.pdf",
                "numero_resolucao": f"{i + 1}/2023" if i % 2 == 0 else SENTINEL,
                "relacionada": SENTINEL,
                "objeto": "x" * (120 if i == 0 else 5),  # forces width clamp
                "data_inicial": "01/02/2023",
                "prazo_execucao": SENTINEL,
                "vedado_utilizacao": SENTINEL,
                "dotacao_orcamentaria": "1234.5678-9",
                "link": f"http://h/doc-{i}.pdf",
                "abreviacao": "Saúde" if i % 3 == 0 else "NÃO CLASSIFICADO",
                "ok": True,
            }
        )
    return pd.DataFrame(rows)


def test_write_xlsx_roundtrip(tmp_path):
    df = pd.DataFrame({"a": ["x", "y & z", "<tag>"], "b": ["1", "", "ação"]})
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, [("Sheet1", df, [12.0, 15.0])])
    back, widths = read_xlsx_sheet(p, 1)
    assert list(back.columns) == ["a", "b"]
    assert back["a"].tolist() == ["x", "y & z", "<tag>"]
    assert back["b"].tolist() == ["1", "", "ação"]  # escaping + unicode intact
    assert widths == [12.0, 15.0]
    # valid zip with the mandatory OOXML parts
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml"} <= names


def test_auto_widths_clamped():
    df = pd.DataFrame({"tiny": ["a"], "huge": ["x" * 500]})
    w = auto_widths(df)
    assert w == [10.0, 100.0]  # clamp(max len, 10, 100), reference rule


def test_final_table_excel_export(tmp_path, ray_session):
    ds = rd.from_pandas(_res_df())
    p = str(tmp_path / "final.xlsx")
    out = write_final_table(ds, p, processed_at="17/08/2026 00:00:00")
    # main sheet: 9 pt-headed columns, every row round-trips
    main, widths = read_xlsx_sheet(p, 1)
    want_cols = [PT_RENAME.get(c, c) for c in RESOLUTION_COLUMNS]
    assert list(main.columns) == want_cols
    assert len(main) == len(out) == 7
    assert len(widths) == len(want_cols)
    assert all(10.0 <= w <= 100.0 for w in widths)
    assert max(widths) == 100.0  # the 120-char objeto clamps to 100
    # summary sheet: the reference's statistic rows with true counts
    resumo, rwidths = read_xlsx_sheet(p, 2)
    assert rwidths == [30.0, 20.0]
    stats = dict(zip(resumo["Estatística"], resumo["Valor"]))
    assert stats["Total de Resoluções"] == "7"
    assert stats["Resoluções com Data Inicial"] == "7"
    assert stats["Resoluções com Prazo Execução"] == "0"
    assert stats["Resoluções Classificadas por Categoria"] == "3"
    assert stats["Data de Processamento"] == "17/08/2026 00:00:00"


def test_final_table_csv_fallback(tmp_path, ray_session):
    ds = rd.from_pandas(_res_df(3))
    p = str(tmp_path / "final.csv")
    out = write_final_table(ds, p)
    back = pd.read_csv(p)
    assert len(back) == 3 and list(back.columns) == list(out.columns)
