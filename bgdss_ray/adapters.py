"""User-extension surface (SURVEY §2.12): the source-adapter protocol and
declarative parse-rule config.

The reference discovers site scrapers by signature
(``execute_scraping(ano, mes, ...)``, CLAUDE.md:196-208) and carries a
declarative-but-unused selector config (config/sites_config.json:17-135).
Here both become first-class seams:

- ``SourceAdapter``: the protocol a new site plugs in — seeds for the
  frontier, a fetch function, a parse-rule set. ``SynthWebAdapter`` wraps
  the synthetic corpus and is what the crawl pipeline effectively uses.
- ``ParseRules``: declarative selector config (tag/class pairs) compiled
  into the single-scan span regex the parser runs — the
  ``sites_config.json`` "site template" made operational.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Protocol, runtime_checkable


@dataclass(frozen=True)
class ParseRules:
    """Declarative selector config → one compiled DOM-order scan regex.

    Defaults reproduce the reference's Portal Saude selectors: text
    paragraphs ``p.desc``, links ``h2.title > a`` (portal_saude_mg.py:
    388-414; sites_config.json:17-135 declares the same shape).
    """

    text_tag: str = "p"
    text_class: str = "desc"
    link_container_tag: str = "h2"
    link_container_class: str = "title"
    link_tag: str = "a"

    def pattern(self) -> str:
        t, tc = re.escape(self.text_tag), re.escape(self.text_class)
        lc, lcc = re.escape(self.link_container_tag), re.escape(self.link_container_class)
        la = re.escape(self.link_tag)
        return (
            rf'<{t} class="{tc}">(.*?)</{t}>'
            rf'|<{lc} class="{lcc}"><{la} href="([^"]*)">(.*?)</{la}></{lc}>'
        )

    def compile(self) -> re.Pattern:
        return re.compile(self.pattern(), re.S)


@runtime_checkable
class SourceAdapter(Protocol):
    """What a new source site implements to plug into the crawl engine.

    ``seeds`` feeds the frontier bootstrap (pipeline.crawl ``seeds=``),
    ``fetch`` is the pure page function workers call (swap for an HTTP
    session in production), ``parse_rules`` configures the span parser,
    ``classify`` maps a URL to its page kind ('listing'|'pdf'|other).
    """

    def seeds(self) -> list[dict]: ...

    def fetch(self, url_canon: str, attempt: int = 1) -> tuple[int, bytes]: ...

    def classify(self, url_canon: str) -> str: ...

    def parse_rules(self) -> ParseRules: ...


class SynthWebAdapter:
    """The synthetic gov.br corpus as a SourceAdapter (the default)."""

    def __init__(self, web_cfg):
        from .synth import SynthWeb

        self.web = SynthWeb(web_cfg)

    def seeds(self) -> list[dict]:
        return self.web.seeds()

    def fetch(self, url_canon: str, attempt: int = 1) -> tuple[int, bytes]:
        return self.web.fetch(url_canon, attempt)

    def classify(self, url_canon: str) -> str:
        return self.web.classify(url_canon)

    def parse_rules(self) -> ParseRules:
        return ParseRules()
