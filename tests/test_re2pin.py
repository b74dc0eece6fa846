"""RE2-vs-python character-class parity on HOSTILE inputs (\\v, NBSP,
accents, arabic digits) — the latent-divergence class the ASCII test corpus
can't catch. Each test drives the ENGINE's pinned kernel and the paired
DuckDB regex over the same nasty strings and asserts equality."""

import duckdb
import pandas as pd
import pytest

from bgdss_ray import re2pin

NASTY = [
    "",
    " ",
    "\v",
    "a\vb c",
    "\v leading vt",
    "trailing vt \v",
    "nb sp and\ttab",
    "resolução ação café",
    "éthe the é",
    "arabic ٣٤ digits 34",
    "under_score x-y",
    "multi   spaces\n\nnewlines\r\ncrlf\fff",
]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_split_ws_matches_re2_split(con):
    for s in NASTY:
        want = con.execute(
            r"""SELECT CASE WHEN regexp_replace(?, '^\s+|\s+$', '', 'g') = ''
                     THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(
                            regexp_replace(?, '^\s+|\s+$', '', 'g'), '\s+') END""",
            [s, s],
        ).fetchone()[0]
        assert re2pin.split_ws(s) == list(want), repr(s)


def test_word_re_matches_re2_word(con):
    for s in NASTY:
        want = con.execute(
            r"SELECT regexp_extract_all(?, '\w+')", [s]
        ).fetchone()[0]
        assert re2pin.WORD_RE.findall(s) == list(want), repr(s)


def test_digit_and_punct_counts_match(con):
    for s in NASTY:
        nd = con.execute(r"SELECT len(regexp_extract_all(?, '\d'))", [s]).fetchone()[0]
        np_ = con.execute(
            r"SELECT len(regexp_extract_all(?, '[^\w\s]'))", [s]
        ).fetchone()[0]
        assert len(re2pin.DIGIT.findall(s)) == nd, repr(s)
        assert len(re2pin.PUNCT.findall(s)) == np_, repr(s)


def test_ascii_word_boundary_matches_re2(con):
    pat = re2pin.ascii_word_bounded("the|é|de")
    for s in NASTY:
        want = con.execute(
            r"SELECT len(regexp_extract_all(?, '\b(the|é|de)\b'))", [s]
        ).fetchone()[0]
        got = len(pat.findall(s))
        assert got == want, (repr(s), got, want)


def test_curation_symbol_class_matches_sql(con):
    from bgdss_ray.ops.curation import _SYMBOL

    for s in NASTY:
        want = con.execute(
            r"""SELECT length(?) - length(regexp_replace(?, '[^A-Za-z0-9\s]', '', 'g'))""",
            [s, s],
        ).fetchone()[0]
        assert len(_SYMBOL.findall(s)) == want, repr(s)


def test_curation_tokens_match_sql_on_nasty(con):
    """End-to-end: curation's _token_frame bigram universe == the SQL's
    \\s+-split token arrays on hostile whitespace."""
    from bgdss_ray.ops.curation import _token_frame

    texts = pd.Series(NASTY)
    di, flat = _token_frame(texts)
    got = {i: [] for i in range(len(NASTY))}
    for i, t in zip(di, flat):
        got[int(i)].append(t)
    for i, s in enumerate(NASTY):
        want = con.execute(
            r"""SELECT CASE WHEN regexp_replace(?, '^\s+|\s+$', '', 'g') = ''
                     THEN CAST([] AS VARCHAR[])
                     ELSE regexp_split_to_array(
                            regexp_replace(?, '^\s+|\s+$', '', 'g'), '\s+') END""",
            [s, s],
        ).fetchone()[0]
        assert got[i] == list(want), repr(s)
