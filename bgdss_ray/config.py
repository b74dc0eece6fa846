"""Engine configuration.

Politeness/retry constants mirror the reference's declared budgets
(reference: config/sites_config.json:184-217, src/modules/sites/
portal_saude_mg.py:479,504-537, config/settings.py:66,81-82). All time
accounting in the engine is done on a *virtual clock* (seconds as floats
starting at 0.0) so crawl schedules are deterministic and time-free in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PolitenessConfig:
    """Per-host request budget (reference: sites_config.json:184-217)."""

    default_delay_s: float = 2.0          # delay between requests to one host
    requests_per_minute: int = 30         # sliding-window cap per host
    burst_allowance: int = 5              # first N requests may go immediately
    max_concurrent_per_host: int = 3      # in-flight cap per host
    inter_download_delay_s: float = 0.5   # portal_saude_mg.py:479


@dataclass(frozen=True)
class RetryConfig:
    """Fetch retry ladder (reference: portal_saude_mg.py:504-537)."""

    max_attempts: int = 3
    backoff_base_s: float = 2.0           # sleep 2*attempt seconds (virtual)
    timeout_s: float = 30.0


@dataclass(frozen=True)
class CrawlConfig:
    """Crawl-wide knobs."""

    max_depth: int = 3                    # frontier expansion depth cap
    max_pages: int = 1_000_000            # global page budget
    min_pdf_bytes: int = 1024             # PDF validity floor (portal_saude_mg.py:539-561)
    pdf_magic: bytes = b"%PDF-"
    respect_robots: bool = True           # enforced (reference only declares it)
    min_text_chars: int = 100             # extraction length gate (pdf_call.py:73-81)
    max_text_chars: int = 20_000          # extraction truncation (pdf_call.py:246)
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    retry: RetryConfig = field(default_factory=RetryConfig)
    # Ray execution sizing
    fetch_concurrency: int = 8            # fetch actor pool size
    parse_batch_size: int = 4096
    seen_shards: int = 16                 # sharded seen-set actor count


SENTINEL = "NÃO INFORMADO"
NOT_CLASSIFIED = "NÃO CLASSIFICADO"

DEFAULT_CRAWL = CrawlConfig()
