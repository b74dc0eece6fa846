"""Property-based tests (hypothesis) over the pure function library."""

import numpy as np
from hypothesis import given, settings, strategies as st

from bgdss_ray.functions import extract_json_from_markdown, slug_sanitize
from bgdss_ray.ops.textstats import fingerprint_winnow
from bgdss_ray.politeness import HostState, next_vtime
from bgdss_ray.config import PolitenessConfig
from bgdss_ray.urlnorm import canonicalize, hash64_one, url_hash64
from bgdss_ray.workspec import parse_month_spec

url_paths = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters="/-_."),
    min_size=0, max_size=30,
)


@given(path=url_paths,
       host=st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
       q=st.lists(st.tuples(st.from_regex(r"[a-z]{1,5}", fullmatch=True),
                            st.from_regex(r"[a-z0-9]{0,5}", fullmatch=True)),
                  max_size=4))
@settings(max_examples=150, deadline=None)
def test_canonicalize_idempotent(path, host, q):
    query = "&".join(f"{k}={v}" for k, v in q)
    url = f"https://{host}/{path}" + (f"?{query}" if query else "")
    c1 = canonicalize(url)
    assert canonicalize(c1) == c1  # idempotence
    # query-order invariance
    query_rev = "&".join(f"{k}={v}" for k, v in reversed(q))
    url2 = f"https://{host}/{path}" + (f"?{query_rev}" if query_rev else "")
    assert canonicalize(url2) == c1


@given(st.lists(st.text(min_size=0, max_size=50), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_hash64_vector_matches_scalar(texts):
    vec = url_hash64(texts)
    assert [int(v) for v in vec] == [hash64_one(t) for t in texts]


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_winnow_whitespace_invariant(text):
    # the engine's invariance class is RE2's \s ([ \t\n\f\r] — what the
    # paired DuckDB oracle collapses), NOT python's unicode \s
    from bgdss_ray.re2pin import WS_RUN

    squeezed = WS_RUN.sub(" ", text)
    assert fingerprint_winnow(text) == fingerprint_winnow(squeezed)


@given(st.lists(st.booleans(), min_size=1, max_size=200),
       st.floats(min_value=0.1, max_value=10.0))
@settings(max_examples=50, deadline=None)
def test_politeness_monotone_nondecreasing(kinds, delay):
    cfg = PolitenessConfig(default_delay_s=delay)
    state = HostState()
    prev = -1.0
    for is_pdf in kinds:
        t = next_vtime(state, is_pdf, cfg)
        assert t >= prev  # virtual times never go backwards per host
        prev = t


@given(st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_month_spec_roundtrip(months):
    spec = ",".join(str(m) for m in months)
    assert parse_month_spec(spec) == sorted(set(months))


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_slug_is_safe(name):
    s = slug_sanitize(name)
    assert all(c.isalnum() or c in ("_", "-") for c in s)
    assert s == s.lower()
    assert slug_sanitize(s) == s  # idempotent


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_json_fence_extractor_total(content):
    # never raises, always returns a string
    out = extract_json_from_markdown(content)
    assert isinstance(out, str)
