"""Deterministic synthetic gov.br-style web — the fetch corpus.

There is no network in the sandbox and the reference's three portals are
irrelevant to correctness; what matters is reproducing the reference's crawl
semantics (listing pages → doc links → PDF payloads, portal_saude_mg.py
:314-414,504-561) on a corpus both the Ray engine and the sequential oracle
can see identically. The trick that makes this scale to any size with zero
storage: **a page's content is a pure function of its URL and the seed** —
``fetch(url, attempt)`` is deterministic, so a 10^10-URL web costs nothing to
"host" and fetch actors need no shared corpus state.

URL space:
  https://{host}/resolucoes?by_month={m}&by_year={y}&ordering=newest&page={p}
      → HTML listing with <h2 class="title"><a …> items (reference selector,
        portal_saude_mg.py:301,394-409), a rel=next link while p < n_pages,
        and occasional cross-host links.
  https://{host}/docs/{y}/{m}/res-{k}.pdf
      → pseudo-PDF bytes: b"%PDF-1.4\\n" + Portuguese resolution text with
        the 7 extractable fields embedded (pdf_call.py:316-397 contract);
        ~5% deliberately corrupt (short or missing magic,
        portal_saude_mg.py:539-561 filter path).

Failure modeling (pure in (url, attempt)): ~3% permanent 404, ~3% transient
500 for attempts 1-2 then 200 (exercises the 3x retry ladder,
portal_saude_mg.py:504-537).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import parse_qsl, urlsplit

from .urlnorm import canonicalize, hash64_one

MONTH_NAMES_PT = [
    "janeiro", "fevereiro", "marco", "abril", "maio", "junho",
    "julho", "agosto", "setembro", "outubro", "novembro", "dezembro",
]

BUDGET_CODES = ["301", "302", "303", "304", "305", "306", "122", "242"]

_MUNICIPALITIES = [
    "Belo Horizonte", "Uberlândia", "Contagem", "Juiz de Fora", "Betim",
    "Montes Claros", "Ribeirão das Neves", "Uberaba", "Governador Valadares",
    "Ipatinga", "Sete Lagoas", "Divinópolis", "Santa Luzia", "Ibirité",
    "Poços de Caldas", "Patos de Minas", "Pouso Alegre", "Teófilo Otoni",
    "Barbacena", "Sabará",
]

_OBJETO_TEMPLATES = [
    "Dispõe sobre a transferência de recursos financeiros para o custeio das ações de saúde no município de {mun}.",
    "Aprova o repasse fundo a fundo destinado ao fortalecimento da atenção primária no município de {mun}.",
    "Institui incentivo financeiro de custeio para a vigilância em saúde no município de {mun}.",
    "Autoriza a celebração de convênio para aquisição de equipamentos hospitalares em {mun}.",
    "Estabelece normas para a execução orçamentária do fundo estadual de saúde em {mun}.",
]

_VEDADO_TEMPLATES = [
    "É vedado a utilização dos recursos para despesas de capital não previstas no plano de trabalho.",
    "Fica vedada a utilização dos recursos para pagamento de pessoal efetivo e gratificações.",
    "É proibido o uso da verba para finalidade diversa da pactuada neste instrumento.",
]


@dataclass(frozen=True)
class SynthWebConfig:
    seed: int = 42
    n_hosts: int = 30
    years: tuple[int, ...] = (2022, 2023)
    months: tuple[int, ...] = (1, 2, 3)
    pages_max: int = 3          # listing pages per (host, year, month)
    docs_max: int = 12          # doc links per listing page (0 → no_data)
    crosslink_rate: float = 0.10
    corrupt_rate: float = 0.05
    rate_404: float = 0.03
    rate_flaky: float = 0.03    # 500 on attempts 1-2, then 200


class SynthWeb:
    """Pure-function synthetic web. Every method is deterministic in
    (config.seed, arguments); no wall clock, no RNG state."""

    def __init__(self, config: SynthWebConfig | None = None, **kw):
        self.cfg = config or SynthWebConfig(**kw)

    # -- deterministic randomness ------------------------------------
    def _h(self, *parts) -> int:
        return hash64_one(f"{self.cfg.seed}|" + "|".join(str(p) for p in parts))

    def _u(self, *parts) -> float:
        return self._h(*parts) / 2.0**64

    # -- topology ------------------------------------------------------
    @property
    def hosts(self) -> list[str]:
        # Zipf-ish skew comes from hot hosts getting more listing months
        # via cross-links; names are stable.
        return [f"portal{i:02d}.saude.example.gov.br" for i in range(self.cfg.n_hosts)]

    def listing_url(self, host: str, year: int, month: int, page: int) -> str:
        return (
            f"https://{host}/resolucoes?by_month={month}&by_year={year}"
            f"&ordering=newest&page={page}"
        )

    def doc_url(self, host: str, year: int, month: int, k: int) -> str:
        return f"https://{host}/docs/{year}/{month}/res-{k}.pdf"

    def seeds(self) -> list[dict]:
        """Seed frontier rows (raw, pre-canonicalization), with deliberate
        duplicates (case/fragment/param-order variants) to exercise
        first-occurrence-wins dedup (portal_saude_mg.py:417-422).

        Hot-host skew: host 0 and 1 get every (year, month); others get a
        hash-selected subset — two hosts ≈ large share of seed URLs
        (FIXTURES.md F2).
        """
        rows: list[dict] = []
        seq = 0
        for i, host in enumerate(self.hosts):
            for y in self.cfg.years:
                for m in self.cfg.months:
                    if i >= 2 and self._u("seedsel", host, y, m) < 0.55:
                        continue
                    url = self.listing_url(host, y, m, 1)
                    title = f"Resoluções {MONTH_NAMES_PT[m - 1]} {y}"
                    rows.append({"url": url, "title": title, "seq": seq})
                    seq += 1
                    # ~15% of seeds re-appear as a non-canonical duplicate
                    if self._u("seeddup", host, y, m) < 0.15:
                        dup = (
                            f"HTTPS://{host.upper()}/resolucoes?page=1&by_year={y}"
                            f"&by_month={m}&ordering=newest#top"
                        )
                        rows.append({"url": dup, "title": title, "seq": seq})
                        seq += 1
        return rows

    @property
    def seed_capacity_per_host(self) -> int:
        """Upper bound on seed rows one host can emit (each (year, month)
        yields at most the seed + one duplicate variant)."""
        return len(self.cfg.years) * len(self.cfg.months) * 2

    def seeds_for_hosts(self, lo: int, hi: int) -> list[dict]:
        """Seed rows for hosts[lo:hi] with CAPACITY-SPACED sequence numbers:
        seq = host_idx * seed_capacity_per_host + local position. The seq
        ORDER matches :meth:`seeds` exactly (hosts in index order, (y, m)
        in loop order, dup right after its original) — only the values are
        sparse — so admission's first-occurrence-wins okey ordering is
        identical. This is what lets seed generation itself run
        distributed: a worker needs no global prefix sum, just its host
        range."""
        cap = self.seed_capacity_per_host
        hosts = self.hosts
        rows: list[dict] = []
        for i in range(lo, min(hi, len(hosts))):
            host = hosts[i]
            seq = i * cap
            for y in self.cfg.years:
                for m in self.cfg.months:
                    if i >= 2 and self._u("seedsel", host, y, m) < 0.55:
                        continue
                    url = self.listing_url(host, y, m, 1)
                    title = f"Resoluções {MONTH_NAMES_PT[m - 1]} {y}"
                    rows.append({"url": url, "title": title, "seq": seq})
                    seq += 1
                    if self._u("seeddup", host, y, m) < 0.15:
                        dup = (
                            f"HTTPS://{host.upper()}/resolucoes?page=1&by_year={y}"
                            f"&by_month={m}&ordering=newest#top"
                        )
                        rows.append({"url": dup, "title": title, "seq": seq})
                        seq += 1
        return rows

    # -- routing ---------------------------------------------------------
    @staticmethod
    def classify(url_canon: str) -> str:
        path = urlsplit(url_canon).path
        if path.startswith("/docs/") and path.endswith(".pdf"):
            return "pdf"
        if path.startswith("/resolucoes"):
            return "listing"
        return "other"

    @staticmethod
    def _parse_listing(url_canon: str) -> tuple[str, int, int, int]:
        s = urlsplit(url_canon)
        q = dict(parse_qsl(s.query))
        return (
            s.hostname or "",
            int(q.get("by_year", 0)),
            int(q.get("by_month", 0)),
            int(q.get("page", 1)),
        )

    @staticmethod
    def _parse_doc(url_canon: str) -> tuple[str, int, int, int]:
        s = urlsplit(url_canon)
        parts = s.path.split("/")  # ['', 'docs', y, m, 'res-k.pdf']
        return (
            s.hostname or "",
            int(parts[2]),
            int(parts[3]),
            int(parts[4].removeprefix("res-").removesuffix(".pdf")),
        )

    # -- page content ------------------------------------------------------
    def n_pages(self, host: str, year: int, month: int) -> int:
        return 1 + self._h("npages", host, year, month) % self.cfg.pages_max

    def n_docs(self, host: str, year: int, month: int, page: int) -> int:
        # ~12% empty listings: the `no_data` success path (mds_saldo.py:427-434)
        if self._u("nodata", host, year, month, page) < 0.12:
            return 0
        return 1 + self._h("ndocs", host, year, month, page) % self.cfg.docs_max

    def listing_body(self, url_canon: str) -> bytes:
        """Listing HTML: interleaved <p class="desc"> paragraphs and
        <h2 class="title"><a> items (the reference's selector,
        portal_saude_mg.py:301) — parsing this in DOM order produces the
        interleaved text/media span sequence of the input_hint schema."""
        host, y, m, p = self._parse_listing(url_canon)
        items = []
        base_k = (p - 1) * self.cfg.docs_max
        for j in range(self.n_docs(host, y, m, p)):
            k = base_k + j
            href = f"/docs/{y}/{m}/res-{k}.pdf"
            num = self._doc_num(host, y, m, k)
            title = f"Resolução SES nº {num}/{y}"
            if self._u("desc", host, y, m, p, j) < 0.5:
                mun = _MUNICIPALITIES[self._h("dmun", host, y, m, k) % len(_MUNICIPALITIES)]
                items.append(
                    f'<p class="desc">Publicada em {MONTH_NAMES_PT[m - 1]} de {y}, '
                    f"referente ao município de {mun}.</p>"
                )
            items.append(f'<h2 class="title"><a href="{href}">{title}</a></h2>')
        if p < self.n_pages(host, y, m):
            nxt = f"/resolucoes?by_month={m}&by_year={y}&ordering=newest&page={p + 1}"
            items.append(f'<h2 class="title"><a href="{nxt}">Próxima página</a></h2>')
        if self._u("xlink", host, y, m, p) < self.cfg.crosslink_rate:
            other = self.hosts[self._h("xhost", host, y, m, p) % min(4, self.cfg.n_hosts)]
            if other != host:
                xurl = self.listing_url(other, y, m, 1)
                items.append(f'<h2 class="title"><a href="{xurl}">Portal parceiro</a></h2>')
        html = (
            "<html><head><title>Resoluções</title></head><body>\n"
            + "\n".join(items)
            + "\n</body></html>"
        )
        return html.encode("utf-8")

    def _doc_num(self, host: str, y: int, m: int, k: int) -> int:
        return 1 + self._h("docnum", host, y, m, k) % 99_999

    def resolution_text(self, url_canon: str) -> str:
        """The extractable Portuguese text of one resolution document.

        Field presence rates (~10-15% sentinel per optional field) mirror
        FIXTURES.md F5 so the summary-sheet aggregates have work to do.
        """
        host, y, m, k = self._parse_doc(url_canon)
        num = self._doc_num(host, y, m, k)
        mun = _MUNICIPALITIES[self._h("mun", host, y, m, k) % len(_MUNICIPALITIES)]
        day = 1 + self._h("day", host, y, m, k) % 28
        objeto = _OBJETO_TEMPLATES[self._h("obj", host, y, m, k) % len(_OBJETO_TEMPLATES)]
        paras = [
            f"RESOLUÇÃO SES/MG Nº {num}/{y}, de {day:02d}/{m:02d}/{y}",
            objeto.format(mun=mun),
        ]
        if self._u("rel", host, y, m, k) < 0.60:
            rel = 1 + self._h("relnum", host, y, m, k) % 99_999
            paras.append(f"Altera a Resolução SES/MG nº {rel}/{y - 1}.")
        if self._u("prazo", host, y, m, k) < 0.55:
            pd_ = 1 + self._h("prazod", host, y, m, k) % 28
            pm = 1 + self._h("prazom", host, y, m, k) % 12
            paras.append(
                f"O prazo de execução das ações encerra-se em {pd_:02d}/{pm:02d}/{y + 1}."
            )
        if self._u("ved", host, y, m, k) < 0.70:
            paras.append(
                _VEDADO_TEMPLATES[self._h("vedt", host, y, m, k) % len(_VEDADO_TEMPLATES)]
            )
        if self._u("dot", host, y, m, k) < 0.85:
            code = BUDGET_CODES[self._h("code", host, y, m, k) % len(BUDGET_CODES)]
            unit = self._h("unit", host, y, m, k) % 9999
            cents = self._h("cents", host, y, m, k) % 100
            val = 1000 + self._h("val", host, y, m, k) % 900_000
            paras.append(
                f"A despesa correrá à conta da dotação orçamentária "
                f"10.{code}.{unit:04d}.2025, no valor de R$ {val:,}".replace(",", ".")
                + f",{cents:02d}."
            )
        paras.append(
            f"Belo Horizonte, {day:02d} de {MONTH_NAMES_PT[m - 1]} de {y}."
        )
        return "\n\n".join(paras)

    def pdf_body(self, url_canon: str) -> bytes:
        host, y, m, k = self._parse_doc(url_canon)
        text = self.resolution_text(url_canon).encode("utf-8")
        u = self._u("corrupt", host, y, m, k)
        if u < self.cfg.corrupt_rate / 2:
            return text[:500]                      # missing magic AND short
        if u < self.cfg.corrupt_rate:
            return (b"%PDF-1.4\n" + text)[:900]    # magic ok but < 1 KiB
        body = b"%PDF-1.4\n" + text
        if len(body) < 1400:                       # pad safely past the 1 KiB floor
            body += b"\n%" + b"." * (1400 - len(body))
        return body

    def robots_body(self, host: str) -> str | None:
        """Deterministic robots.txt per host: ~25% disallow the first
        year's /docs/ tree, ~30% declare a Crawl-delay (1s or 3s, vs the
        2s default budget). None → no robots file (allow all)."""
        u1 = self._u("robots_dis", host)
        u2 = self._u("robots_delay", host)
        lines = ["User-agent: *"]
        if u1 < 0.25:
            lines.append(f"Disallow: /docs/{min(self.cfg.years)}/")
        if u2 < 0.15:
            lines.append("Crawl-delay: 1")
        elif u2 < 0.30:
            lines.append("Crawl-delay: 3")
        return "\n".join(lines) if len(lines) > 1 else None

    # -- the fetch function --------------------------------------------
    def status_of(self, url_canon: str, attempt: int) -> int:
        u = self._u("status", url_canon)
        if u < self.cfg.rate_404:
            return 404
        if u < self.cfg.rate_404 + self.cfg.rate_flaky and attempt < 3:
            return 500
        return 200

    def fetch(self, url_canon: str, attempt: int = 1) -> tuple[int, bytes]:
        """Simulated HTTP GET: (status, body). Pure and total."""
        status = self.status_of(url_canon, attempt)
        if status != 200:
            return status, b""
        kind = self.classify(url_canon)
        if kind == "listing":
            return 200, self.listing_body(url_canon)
        if kind == "pdf":
            return 200, self.pdf_body(url_canon)
        return 404, b""


def canonical_seed_rows(web: SynthWeb) -> list[dict]:
    """Seeds with canonical URL attached (raw kept for provenance)."""
    out = []
    for r in web.seeds():
        canon = canonicalize(r["url"])
        out.append({**r, "url_canon": canon})
    return out
