import numpy as np

from bgdss_ray.urlnorm import canonicalize, hash64_one, host_of, url_hash64


def test_canonicalize_lowercases_and_sorts_query():
    a = canonicalize("HTTPS://HOST.GOV.BR/path?b=2&a=1#frag")
    b = canonicalize("https://host.gov.br/path?a=1&b=2")
    assert a == b == "https://host.gov.br/path?a=1&b=2"


def test_canonicalize_default_port_and_empty_path():
    assert canonicalize("http://x.gov.br:80") == "http://x.gov.br/"
    assert canonicalize("http://x.gov.br:8080/p") == "http://x.gov.br:8080/p"


def test_canonicalize_relative_with_base():
    # reference absolutizes with urljoin (portal_saude_mg.py:509-510)
    out = canonicalize("/docs/2023/1/res-0.pdf", base="https://h.gov.br/resolucoes?page=1")
    assert out == "https://h.gov.br/docs/2023/1/res-0.pdf"


def test_canonicalize_collapses_duplicate_slashes():
    assert canonicalize("https://h.gov.br//a///b") == "https://h.gov.br/a/b"


def test_hash64_stable_and_vector_matches_scalar():
    urls = [f"https://h.gov.br/{i}" for i in range(100)]
    vec = url_hash64(urls)
    assert vec.dtype == np.uint64
    assert all(int(vec[i]) == hash64_one(urls[i]) for i in range(100))
    # regression pin: stability across processes/runs
    assert hash64_one("https://h.gov.br/0") == url_hash64(["https://h.gov.br/0"])[0]


def test_host_of():
    assert host_of("https://A.Gov.BR/x") == "a.gov.br"
