"""Determinism of the synthetic web + sanity of the sequential oracle."""

from bgdss_ray.config import CrawlConfig
from bgdss_ray.oracle import crawl_oracle
from bgdss_ray.synth import SynthWeb, SynthWebConfig
from bgdss_ray.urlnorm import canonicalize

SMALL = SynthWebConfig(seed=42, n_hosts=6, years=(2023,), months=(1, 2))


def test_fetch_pure_and_deterministic():
    w1, w2 = SynthWeb(SMALL), SynthWeb(SMALL)
    urls = [canonicalize(s["url"]) for s in w1.seeds()]
    for u in urls[:20]:
        assert w1.fetch(u, 1) == w2.fetch(u, 1)
        assert w1.fetch(u, 1) == w1.fetch(u, 1)


def test_seeds_contain_duplicates_that_canonicalize_equal():
    w = SynthWeb(SynthWebConfig(seed=42, n_hosts=30))
    seeds = w.seeds()
    canons = [canonicalize(s["url"]) for s in seeds]
    assert len(set(canons)) < len(canons), "seed list must exercise dedup"


def test_listing_and_pdf_bodies():
    w = SynthWeb(SMALL)
    u = canonicalize(w.listing_url(w.hosts[0], 2023, 1, 1))
    status, body = w.fetch(u, 1)
    if status == 200:
        assert b'<h2 class="title">' in body or b"</body>" in body
    pdf = canonicalize(w.doc_url(w.hosts[0], 2023, 1, 0))
    s2, b2 = w.fetch(pdf, 1)
    if s2 == 200 and len(b2) >= 1024:
        assert b2.startswith(b"%PDF-")


def test_retry_ladder_exists():
    """Some URL in the corpus must 500 on attempt 1 then 200 on attempt 3."""
    w = SynthWeb(SynthWebConfig(seed=42, n_hosts=30))
    urls = [canonicalize(s["url"]) for s in w.seeds()]
    flaky = [
        u for u in urls
        if w.status_of(u, 1) == 500 and w.status_of(u, 3) == 200
    ]
    assert flaky, "corpus must include transient-500 URLs"


def test_oracle_end_to_end_shape():
    w = SynthWeb(SMALL)
    res = crawl_oracle(w, w.seeds(), CrawlConfig(max_depth=3))
    assert len(res.crawl_order) == len(set(res.crawl_order)), "no URL fetched twice"
    assert len(res.crawl_order) > len([s for s in w.seeds()]) / 2
    assert res.documents, "some docs must be emitted"
    assert len(res.seen) >= len(res.crawl_order)
    # vtimes: per-host monotonic non-decreasing
    per_host = {}
    from bgdss_ray.urlnorm import host_of
    for u, vt in zip(res.crawl_order, res.vtimes):
        h = host_of(u)
        assert vt >= per_host.get(h, -1.0)
        per_host[h] = vt
    # span offsets strictly increasing per document
    for _doc, spans in res.documents:
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_oracle_deterministic():
    w = SynthWeb(SMALL)
    a = crawl_oracle(w, w.seeds(), CrawlConfig(max_depth=2))
    b = crawl_oracle(w, w.seeds(), CrawlConfig(max_depth=2))
    assert a.crawl_order == b.crawl_order
    assert a.seen == b.seen
    assert a.vtimes == b.vtimes
