"""SourceAdapter protocol + declarative parse rules (SURVEY §2.12)."""

import re

from bgdss_ray.adapters import ParseRules, SourceAdapter, SynthWebAdapter
from bgdss_ray.parse import _SPAN_RE, SpanParser
from bgdss_ray.synth import SynthWebConfig


def test_default_rules_compile_to_builtin_regex():
    assert ParseRules().pattern() == _SPAN_RE.pattern


def test_custom_rules_drive_the_parser():
    rules = ParseRules(text_tag="div", text_class="body",
                       link_container_tag="h3", link_container_class="doc",
                       link_tag="a")
    parser = SpanParser(rules=rules)
    html = ('<div class="body">first para</div>'
            '<h3 class="doc"><a href="/docs/x.pdf">Doc X</a></h3>'
            '<div class="body">second para</div>')
    spans = []
    for i, m in enumerate(parser.span_re.finditer(html)):
        spans.append(m.group(1) if m.group(1) is not None else (m.group(2), m.group(3)))
    assert spans == ["first para", ("/docs/x.pdf", "Doc X"), "second para"]


def test_synth_adapter_satisfies_protocol():
    a = SynthWebAdapter(SynthWebConfig(seed=42, n_hosts=3))
    assert isinstance(a, SourceAdapter)  # runtime_checkable structural check
    seeds = a.seeds()
    assert seeds and {"url", "seq"} <= set(seeds[0])
    url = __import__("bgdss_ray.urlnorm", fromlist=["canonicalize"]).canonicalize(
        seeds[0]["url"]
    )
    status, body = a.fetch(url)
    assert status in (200, 404, 500)
    assert a.classify(url) in ("listing", "pdf", "other")
    assert isinstance(a.parse_rules(), ParseRules)
