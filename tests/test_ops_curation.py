"""Curation ops: decontamination, repetition filter, planted augmentation.

Engine paths are exercised through real Ray Datasets; semantics are pinned
against small hand-computed examples and pure-pandas oracles.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bgdss_ray.ops.curation import (
    Decontaminator,
    RepetitionFilter,
    benchmark_ngram_set,
    decontaminate,
    plant_repetition,
)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_decontaminate_flags_copied_ngram(ray_session):
    bench_text = "a b c d e f g h i j k l"  # benchmark doc (id 0, 0 % 37 == 0)
    rows = [
        {"doc_id": 0, "text": bench_text},
        # copies an 8-token window of the benchmark doc verbatim
        {"doc_id": 1, "text": "x y " + "b c d e f g h i" + " z"},
        # same vocabulary, different order: no 8-gram can match
        {"doc_id": 2, "text": "b a d c f e h g j i l k"},
        # too short to form any 8-gram
        {"doc_id": 3, "text": "one two three"},
    ]
    # doc 1's text embeds the window as contiguous tokens
    rows[1]["text"] = "x y b c d e f g h i z"
    out = decontaminate(_docs(rows), n=8, id_mod=37).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert bool(out.loc[0, "contaminated"])  # benchmark self-hit
    assert bool(out.loc[1, "contaminated"])
    assert int(out.loc[1, "n_matched"]) == 1
    assert not bool(out.loc[2, "contaminated"])
    assert not bool(out.loc[3, "contaminated"])
    assert int(out.loc[3, "n_grams"]) == 0
    # n_grams = tokens - 7 for docs with >= 8 tokens
    assert int(out.loc[0, "n_grams"]) == 12 - 7
    assert int(out.loc[1, "n_grams"]) == 11 - 7


def test_benchmark_set_is_small_side(ray_session):
    rows = [{"doc_id": i, "text": "t " + " ".join(str(j) for j in range(20))}
            for i in range(80)]
    ref, n = benchmark_ngram_set(_docs(rows), n=8, id_mod=37)
    # only ids 0, 37, 74 contribute; identical texts -> identical gram set
    assert n == 20 + 1 - 7  # 21 tokens -> 14 grams
    import ray

    hset = ray.get(ref)
    assert len(hset) == n and hset.dtype == np.uint64


def test_repetition_filter_branches(ray_session):
    rows = [
        {"doc_id": 0, "text": "u v w x y z " * 5},            # clean
        {"doc_id": 1, "text": "dup\ndup\ndup\nuniq"},          # line dups
        {"doc_id": 2, "text": "ok words @@@@@@@@@@@@@@@@"},    # symbols
        {"doc_id": 3, "text": "go stop " * 40},                # bigram loop
    ]
    out = (
        _docs(rows)
        .map_batches(RepetitionFilter(), batch_format="pandas")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "dup_line_frac"] == pytest.approx(1 - 2 / 4, abs=0)
    assert not bool(out.loc[1, "keep"])
    assert out.loc[2, "symbol_ratio"] > 0.10 and not bool(out.loc[2, "keep"])
    # 'go stop'*40 -> 80 tokens, 79 bigrams, 'stop go' 39x, 'go stop' 40x
    assert out.loc[3, "top_bigram_frac"] == pytest.approx(40 / 79, abs=0)
    assert not bool(out.loc[3, "keep"])
    # the clean doc: top bigram 'u v' appears 5x of 29 bigrams
    assert bool(out.loc[0, "keep"])
    assert out.loc[0, "n_lines"] == 1


def test_plant_repetition_classes_and_precedence():
    df = pd.DataFrame(
        {
            "doc_id": [77, 7, 5, 3, 11],
            "text": ["alpha beta gamma"] * 5,
        }
    )
    out = plant_repetition(df).set_index("doc_id")
    # 77 = 7*11 -> the %11 branch wins (elif precedence)
    assert out.loc[77, "text"].count("\n") == 2
    assert "@" in out.loc[7, "text"] and "\n" not in out.loc[7, "text"]
    assert out.loc[5, "text"].endswith(" alpha beta" * 1) or "alpha beta" in out.loc[5, "text"]
    assert out.loc[5, "text"] == "alpha beta gamma" + " alpha beta" * 80
    assert out.loc[3, "text"] == "alpha beta gamma"
    assert out.loc[11, "text"].count("\n") == 2


def test_stratified_sample_matches_pandas_oracle(ray_session):
    from bgdss_ray.queries import stratified_sample
    from bgdss_ray.urlnorm import url_hash64

    sf = "/root/testdata/sf0.001"
    got = (
        stratified_sample(sf)
        .to_pandas()
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev["h"] = url_hash64(ev["event_id"].astype(str).tolist())
    want = (
        ev.sort_values(["h", "event_id"])
        .groupby("event_type", sort=False)
        .head(20)[["event_type", "event_id", "value"]]
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("event_type").size() <= 20).all()


def test_tfidf_top_terms_semantics(ray_session):
    """Rank-1 term per doc maximizes the linear-idf key tf*N/df — checked
    with an EXACT-rational pandas oracle (Fraction), so the test itself
    cannot float-flip; rare terms beat ubiquitous ones."""
    from fractions import Fraction

    from bgdss_ray.queries import tfidf_top_terms

    sf = "/root/testdata/sf0.001"
    got = tfidf_top_terms(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = docs.set_index("doc_id")["text"].fillna("").str.strip().str.split(r"\s+", regex=True)
    tf = {}
    dfreq = {}
    for d, L in toks.items():
        if L == [""]:
            continue
        from collections import Counter

        c = Counter(L)
        tf[d] = c
        for term in c:
            dfreq[term] = dfreq.get(term, 0) + 1
    assert (got.groupby("doc_id").size() <= 3).all()
    assert (got.groupby("doc_id")["rank"].min() == 1).all()
    # spot-check 25 docs: the engine's rank-1 equals the exact argmax
    for d in list(tf)[:25]:
        scores = {t: Fraction(c, dfreq[t]) for t, c in tf[d].items()}
        best = min(sorted(scores), key=lambda t: (-scores[t], t))
        eng = got[(got.doc_id == d) & (got["rank"] == 1)]["term"].iloc[0]
        assert eng == best, (d, eng, best)


def test_curate_corpus_composite(ray_session):
    """keep == rep_keep AND NOT contaminated AND is_canonical, with every
    leg live (planted repetition, benchmark overlap, planted clones)."""
    from bgdss_ray.queries import curate_corpus

    got = curate_corpus("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 500 and got.doc_id.is_unique
    legs = got.rep_keep & ~got.contaminated & got.is_canonical
    assert (got.keep == legs).all()
    assert (~got.rep_keep).sum() > 0
    assert got.contaminated.sum() > 0
    assert (~got.is_canonical).sum() > 0
    # clone groups: the min id of each planted group is canonical
    clones = got[got.doc_id % 13 == 0]
    assert clones.is_canonical.sum() >= 1
    assert (~clones.is_canonical).sum() >= 1


def test_curate_corpus_bucket_width_invariance(ray_session):
    """Bucket granularity is semantics-free: the min-per-text-hash dedup is
    per-key, so output is identical at any bucket width (the data-derived
    fan-out can scale without changing results)."""
    from bgdss_ray.queries import curate_corpus

    a = (
        curate_corpus("/root/testdata/sf0.001", bucket_bits=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        curate_corpus("/root/testdata/sf0.001", bucket_bits=12)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_chunk_documents_reconstruction_and_overlap(ray_session):
    """Chunks tile each doc with exact 50-char overlaps; concatenating
    chunk[:stride] pieces plus the last tail reconstructs the text."""
    import numpy as np
    import ray.data as rd

    from bgdss_ray.ops.curation import CHUNK_SIZE, CHUNK_STRIDE, chunk_documents

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ch = chunk_documents(ds).to_pandas().sort_values(
        ["doc_id", "chunk_no"])
    docs = ds.to_pandas().set_index("doc_id")["text"].fillna("")
    for doc_id, g in ch.groupby("doc_id"):
        text = docs[doc_id]
        assert (g["start"].to_numpy()
                == np.arange(len(g)) * CHUNK_STRIDE).all()
        rebuilt = "".join(c[:CHUNK_STRIDE] for c in g["chunk"][:-1])
        rebuilt += g["chunk"].iloc[-1]
        assert rebuilt == text
        for _, r in g.iterrows():
            assert r["chunk"] == text[r["start"]:r["start"] + CHUNK_SIZE]
    n_docs_with_text = int((docs.str.len() > 0).sum())
    assert ch["doc_id"].nunique() == n_docs_with_text


def test_pack_sequences_budget_and_contiguity(ray_session):
    """Within each doc: pack ids are non-decreasing and start at 0; a
    pack's char total never exceeds budget + one chunk's overflow (the
    streaming rule closes a pack when the prefix crosses the boundary);
    bucket width never changes the result."""
    import numpy as np
    import ray.data as rd

    from bgdss_ray.ops.curation import (PACK_BUDGET, chunk_documents,
                                        pack_sequences)

    SF = "/root/testdata/sf0.001"
    chunks = chunk_documents(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    ).materialize()
    a = pack_sequences(chunks).to_pandas().sort_values(
        ["doc_id", "chunk_no"]).reset_index(drop=True)
    b = pack_sequences(chunks, n_buckets=7).to_pandas().sort_values(
        ["doc_id", "chunk_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    for doc_id, g in a.groupby("doc_id"):
        pid = g["pack_id"].to_numpy()
        assert pid[0] == 0
        assert (np.diff(pid) >= 0).all()
        lens = np.diff(np.r_[0, g["cum_chars"].to_numpy()])
        for p in np.unique(pid):
            tot = lens[pid == p].sum()
            # a pack only opens below the boundary, so it can overflow by
            # at most its last chunk
            assert tot <= PACK_BUDGET + lens[pid == p][-1]
