"""robots.txt parsing + enforcement (the reference declares
respect_robots_txt but never enforces it; this engine does)."""

from bgdss_ray.robots import ALLOW_ALL, RobotsIndex, parse_robots
from bgdss_ray.synth import SynthWeb, SynthWebConfig


def test_parse_robots_star_section():
    r = parse_robots(
        "# c\nUser-agent: gbot\nDisallow: /private/\n"
        "User-agent: *\nDisallow: /docs/2019/\nDisallow:\nCrawl-delay: 2.5\n"
    )
    assert r.disallow == ("/docs/2019/",)  # empty Disallow = allow-all, skipped
    assert r.crawl_delay == 2.5
    assert not r.allows("/docs/2019/1/res-0.pdf")
    assert r.allows("/docs/2020/1/res-0.pdf")
    assert r.allows("/resolucoes")


def test_parse_robots_no_star_group():
    r = parse_robots("User-agent: gbot\nDisallow: /\n")
    assert r.disallow == () and r.crawl_delay is None


def test_allow_all_default():
    assert ALLOW_ALL.allows("/anything")


def test_index_lazy_cache():
    calls = []

    def fetch(host):
        calls.append(host)
        return "User-agent: *\nDisallow: /x/\n" if host == "a" else None

    idx = RobotsIndex(fetch)
    assert not idx.allowed("a", "/x/y")
    assert idx.allowed("a", "/y")
    assert idx.allowed("b", "/x/y")
    idx.allowed("a", "/z")
    assert calls == ["a", "b"]  # one fetch per host


def test_synth_robots_deterministic_and_mixed():
    w = SynthWeb(SynthWebConfig(seed=42, n_hosts=30))
    bodies = [w.robots_body(h) for h in w.hosts]
    assert bodies == [w.robots_body(h) for h in w.hosts]
    with_dis = [b for b in bodies if b and "Disallow" in b]
    with_delay = [b for b in bodies if b and "Crawl-delay" in b]
    assert with_dis and with_delay, "corpus must exercise both rule kinds"
