"""robots.txt rules: parse, per-host index, admission filter.

The reference *declares* ``respect_robots_txt: true`` and a crawl-delay
budget (config/sites_config.json:213-217) but never enforces either; the
north rule requires a real robots + crawl-delay politeness scheduler, so
this engine enforces both:

- ``Disallow`` prefixes (User-agent: * section) filter candidates at
  admission, before seen-marking — a disallowed URL is never enqueued,
  never fetched, never in the seen set (same rule in oracle and engine);
- ``Crawl-delay`` overrides the host's default politeness delay in the
  virtual-clock fold.

At cluster scale the per-host rules live with the politeness shards (state
is O(hosts)); here a lazy per-host cache backed by the (pure) robots body
function plays that role.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RobotsRules:
    disallow: tuple[str, ...] = ()
    crawl_delay: float | None = None

    def allows(self, path: str) -> bool:
        return not any(d and path.startswith(d) for d in self.disallow)


ALLOW_ALL = RobotsRules()


def parse_robots(text: str) -> RobotsRules:
    """Minimal robots.txt parser: the ``User-agent: *`` group's Disallow
    prefixes and Crawl-delay. Empty Disallow lines mean allow-all (spec)."""
    disallow: list[str] = []
    delay: float | None = None
    in_star = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star = val == "*"
        elif in_star and key == "disallow":
            if val:
                disallow.append(val)
        elif in_star and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return RobotsRules(tuple(disallow), delay)


class RobotsIndex:
    """Lazy per-host rules cache. ``fetch_fn(host) -> str | None`` supplies
    the robots body (None/empty → allow all)."""

    def __init__(self, fetch_fn):
        self.fetch_fn = fetch_fn
        self.cache: dict[str, RobotsRules] = {}

    def rules_for(self, host: str) -> RobotsRules:
        r = self.cache.get(host)
        if r is None:
            body = self.fetch_fn(host)
            r = parse_robots(body) if body else ALLOW_ALL
            self.cache[host] = r
        return r

    def allowed(self, host: str, path: str) -> bool:
        return self.rules_for(host).allows(path)

    def crawl_delay(self, host: str) -> float | None:
        return self.rules_for(host).crawl_delay
