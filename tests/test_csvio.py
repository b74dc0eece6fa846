"""CSV fallback-ladder parity with the reference (mds_saldo.py:852-892)."""

import pyarrow as pa
import ray.data as rd

from bgdss_ray.csvio import count_csv_records, parse_mds_csv_bytes, read_mds_csv


def _mds_payload(sep=";", n=3, junk=True):
    head = "Relatório de Parcelas Pagas - exportado em 01/01/2024\n" if junk else ""
    cols = sep.join(["municipio", "uf", "ano", "mes", "parcela", "conta", "saldo"])
    rows = "\n".join(
        sep.join([f"Município {i}", "MG", "2023", "1", f"R$ 1.23{i},45", f"c{i}", f"R$ {i},00"])
        for i in range(n)
    )
    return (head + cols + "\n" + rows).encode("latin-1")


def test_semicolon_standard_path():
    df, method, n = parse_mds_csv_bytes(_mds_payload(";"))
    assert method == "semicolon" and n == 3
    assert "municipio" in [c.lower() for c in df.columns]
    # latin-1 accents survived
    assert df.iloc[0, 0].startswith("Munic")


def test_comma_fallback():
    df, method, n = parse_mds_csv_bytes(_mds_payload(","))
    assert n == 3
    assert method in ("semicolon", "comma")  # ';' read may collapse to 1 col → 0 rows? ladder decides
    assert len(df) == 3


def test_single_column_parses_like_reference():
    # pandas happily parses a delimiter-free file as one column — the
    # reference ladder therefore returns the parsed count, not raw lines
    payload = "junk header\nonly one column no delimiters\nanother line\n\n".encode("latin-1")
    _df, method, n = parse_mds_csv_bytes(payload)
    assert method == "semicolon" and n == 1


def test_raw_line_count_fallback():
    # all parsers yield 0 rows (junk + header, no data) → raw-line fallback,
    # which counts everything after the first line (reference quirk:
    # mds_saldo.py:884-888 counts the real header as a data line)
    payload = "junk header\nmunicipio;uf\n\n".encode("latin-1")
    _df, method, n = parse_mds_csv_bytes(payload)
    assert method == "raw_lines"
    assert n == 1
    assert count_csv_records(payload) == 1


def test_ray_pipeline_parses_many(ray_session):
    payloads = [_mds_payload(";", n=2), _mds_payload(",", n=4)]
    t = pa.table(
        {
            "csv_id": pa.array(["a", "b"], type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )
    out = read_mds_csv(rd.from_arrow(t)).to_pandas()
    assert set(out["csv_id"]) == {"a", "b"}
    assert out[out.csv_id == "a"].shape[0] == 2
    assert out[out.csv_id == "b"].shape[0] == 4
    assert (out["record_count"] > 0).all()
