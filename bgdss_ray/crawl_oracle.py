"""DuckDB oracle SQL for the crawl family — the synthetic web recomputed
from first principles.

Every content draw in :mod:`bgdss_ray.synth` is ``md5_number_upper`` of a
``'{seed}|{name}|{part}|...'`` key (little-endian first 8 bytes of md5, see
``urlnorm.hash64_one``), so DuckDB can regenerate the ENTIRE driver web —
seed selection, page counts, doc counts, cross-links, robots rules, HTTP
statuses, body bytes — and replay the BFS crawl exactly:

- ``PRELUDE``: the (host, year, month, page) parameter universe with all
  per-page draws, every page's outgoing links in DOM anchor order, robots
  gating, and the status/attempt ladder (404 permanent / 500-500-200 flaky,
  ``fetch.py``).
- ``WAVES``: the BFS unrolled to the driver config's ``max_depth=3`` — four
  wave CTEs, each applying first-occurrence-wins dedup by order key
  ``parent_seq * 2**32 + link_pos`` (``frontier.order_key``), the
  prior-wave seen set, and robots blocking; ``crawl_seq`` is the global
  FIFO rank, exactly the queue model in ``pipeline.crawl``.
- ``RESTEXT`` / ``ITEMS``: the resolution text and listing-HTML items
  rebuilt string-for-string (``synth.resolution_text`` /
  ``synth.listing_body``), giving exact utf-8 ``content_len`` for every
  body including the three corrupt-PDF branches and the 1402-byte pad.
- ``VTIME``: the per-host politeness virtual clock
  (``politeness.next_vtime``: burst 5, 2 s delay, 30/min sliding window,
  0.5 s pdf inter-download) as a recursive CTE carrying
  (t, last_pdf, 30-slot window list) per host — every vtime is a multiple
  of 0.5 so doubles compare bit-exactly; flaky rows add the logged
  2*1+2*2 = 6 s retry backoff.

The oracle targets the fixed driver web (``pipelines.DRIVER_WEB``: seed 42,
10 hosts, years 2022-2023, months 1-3, pages_max 3, docs_max 12,
crosslink 0.10, corrupt 0.05, 404 0.03, flaky 0.03) and driver config
(``max_depth=3``); it reads no input tables. Reference semantics:
portal_saude_mg.py:301,314-414,504-561 (selectors, retry ladder, PDF
validity), sites_config.json politeness constants.
"""

from __future__ import annotations

_U64 = "CAST(power(2, 64) AS DOUBLE)"


def _u(key: str) -> str:
    """Float draw in [0,1): md5_number_upper(key) / 2**64 (same IEEE ops as
    ``SynthWeb._u``)."""
    return f"(CAST(md5_number_upper({key}) AS DOUBLE) / {_U64})"


def _h(key: str) -> str:
    return f"md5_number_upper({key})"


def _k(*parts: str) -> str:
    return " || '|' || ".join(parts)


def _hk(name: str, *parts: str) -> str:
    return _h(f"'42|{name}|' || " + _k(*parts))


def _uk(name: str, *parts: str) -> str:
    return _u(f"'42|{name}|' || " + _k(*parts))


_LISTING_URL = ("'https://' || {h} || '/resolucoes?by_month=' || {m} || "
                "'&by_year=' || {y} || '&ordering=newest&page=' || {p}")
_DOC_URL = ("'https://' || {h} || '/docs/' || {y} || '/' || {m} || "
            "'/res-' || {k} || '.pdf'")


def _lurl(hh="host", yy="y", mm="m", pp="p") -> str:
    return _LISTING_URL.format(h=hh, m=mm, y=yy, p=pp)


def _durl(hh="host", yy="y", mm="m", kk="k") -> str:
    return _DOC_URL.format(h=hh, y=yy, m=mm, k=kk)


MONTHS = ("['janeiro','fevereiro','marco','abril','maio','junho','julho',"
          "'agosto','setembro','outubro','novembro','dezembro']")
MUNS = ("['Belo Horizonte','Uberlândia','Contagem','Juiz de Fora','Betim',"
        "'Montes Claros','Ribeirão das Neves','Uberaba','Governador Valadares',"
        "'Ipatinga','Sete Lagoas','Divinópolis','Santa Luzia','Ibirité',"
        "'Poços de Caldas','Patos de Minas','Pouso Alegre','Teófilo Otoni',"
        "'Barbacena','Sabará']")
OBJS = ("['Dispõe sobre a transferência de recursos financeiros para o custeio "
        "das ações de saúde no município de {mun}.',"
        "'Aprova o repasse fundo a fundo destinado ao fortalecimento da atenção "
        "primária no município de {mun}.',"
        "'Institui incentivo financeiro de custeio para a vigilância em saúde "
        "no município de {mun}.',"
        "'Autoriza a celebração de convênio para aquisição de equipamentos "
        "hospitalares em {mun}.',"
        "'Estabelece normas para a execução orçamentária do fundo estadual de "
        "saúde em {mun}.']")
VEDS = ("['É vedado a utilização dos recursos para despesas de capital não "
        "previstas no plano de trabalho.',"
        "'Fica vedada a utilização dos recursos para pagamento de pessoal "
        "efetivo e gratificações.',"
        "'É proibido o uso da verba para finalidade diversa da pactuada neste "
        "instrumento.']")
CODES = "['301','302','303','304','305','306','122','242']"


PRELUDE = f"""
hosts AS (
  SELECT i, 'portal' || lpad(CAST(i AS VARCHAR), 2, '0')
         || '.saude.example.gov.br' AS host
  FROM (SELECT unnest(generate_series(0, 9)) AS i)
),
hblock AS (  -- robots: ~25% of hosts disallow /docs/2022/
  SELECT host, {_u("'42|robots_dis|' || host")} < 0.25 AS blocked_2022 FROM hosts
),
ym AS (
  SELECT y, m FROM (SELECT unnest([2022, 2023]) AS y)
  CROSS JOIN (SELECT unnest([1, 2, 3]) AS m)
),
hym AS (
  SELECT i, host, y, m,
         {_uk("seedsel", "host", "y", "m")} AS u_seedsel,
         1 + CAST({_hk("npages", "host", "y", "m")} % 3 AS BIGINT) AS n_pages
  FROM hosts CROSS JOIN ym
),
pages AS (  -- every possible listing page with its content draws
  SELECT hy.i, hy.host, hy.y, hy.m, pp.p, hy.n_pages,
         {_lurl("hy.host", "hy.y", "hy.m", "pp.p")} AS url,
         CASE WHEN {_uk("nodata", "hy.host", "hy.y", "hy.m", "pp.p")} < 0.12
              THEN 0
              ELSE 1 + CAST({_hk("ndocs", "hy.host", "hy.y", "hy.m", "pp.p")} % 12 AS BIGINT)
         END AS n_docs,
         pp.p < hy.n_pages AS has_next,
         {_uk("xlink", "hy.host", "hy.y", "hy.m", "pp.p")} < 0.10 AS x_draw,
         CAST({_hk("xhost", "hy.host", "hy.y", "hy.m", "pp.p")} % 4 AS BIGINT) AS x_i
  FROM hym hy CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS p) pp
),
page_links AS (  -- every page's outgoing links, DOM anchor order (pos)
  SELECT pg.url AS src, d.j AS pos,
         {_durl("pg.host", "pg.y", "pg.m", "((pg.p - 1) * 12 + d.j)")} AS dst,
         TRUE AS is_pdf, pg.host AS lhost, pg.y AS ly, pg.m AS lm,
         (pg.p - 1) * 12 + d.j AS lk, CAST(NULL AS BIGINT) AS lp
  FROM pages pg CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS j) d
  WHERE d.j < pg.n_docs
  UNION ALL
  SELECT pg.url, pg.n_docs AS pos,
         {_lurl("pg.host", "pg.y", "pg.m", "(pg.p + 1)")},
         FALSE, pg.host, pg.y, pg.m, NULL, pg.p + 1
  FROM pages pg WHERE pg.has_next
  UNION ALL
  SELECT pg.url, pg.n_docs + CASE WHEN pg.has_next THEN 1 ELSE 0 END AS pos,
         {_lurl("hx.host", "pg.y", "pg.m", "1")},
         FALSE, hx.host, pg.y, pg.m, NULL, 1
  FROM pages pg JOIN hosts hx ON hx.i = pg.x_i
  WHERE pg.x_draw AND hx.i <> pg.i
),
cand_links AS (  -- robots gate attached per candidate link
  SELECT pl.*, hb.blocked_2022 AND pl.is_pdf AND pl.ly = 2022 AS blocked
  FROM page_links pl JOIN hblock hb ON hb.host = pl.lhost
),
statuses AS (  -- fetch ladder per distinct url: 404 permanent, flaky 500x2
  SELECT url,
         CASE WHEN su < 0.03 THEN 404 ELSE 200 END AS status,
         CASE WHEN su >= 0.03 AND su < 0.06 THEN 3 ELSE 1 END AS attempts
  FROM (
    SELECT url, {_u("'42|status|' || url")} AS su FROM (
      SELECT url FROM pages
      UNION
      SELECT DISTINCT dst FROM page_links WHERE is_pdf
    )
  )
)
"""

WAVES = """
w0 AS (  -- seeds: hosts 0-1 every (y, m); others pass the seedsel draw
  SELECT pg.url, pg.host, pg.y, pg.m, pg.p,
         row_number() OVER (ORDER BY hy2.i, hy2.y, hy2.m) - 1 AS seq
  FROM hym hy2
  JOIN pages pg ON pg.host = hy2.host AND pg.y = hy2.y AND pg.m = hy2.m AND pg.p = 1
  WHERE hy2.i < 2 OR hy2.u_seedsel >= 0.55
),
c1 AS (  -- candidates from wave 0's OK listings, min order key per url
  SELECT cl.dst, cl.is_pdf, cl.lhost, cl.ly, cl.lm, cl.lk, cl.lp,
         min(w.seq * 4294967296 + cl.pos) AS okey
  FROM w0 w
  JOIN statuses s ON s.url = w.url AND s.status = 200
  JOIN cand_links cl ON cl.src = w.url AND NOT cl.blocked
  WHERE cl.dst NOT IN (SELECT url FROM w0)
  GROUP BY ALL
),
w1 AS (
  SELECT dst AS url, is_pdf, lhost AS host, ly AS y, lm AS m, lk AS k, lp AS p,
         (SELECT max(seq) FROM w0) + row_number() OVER (ORDER BY okey) AS seq
  FROM c1
),
c2 AS (
  SELECT cl.dst, cl.is_pdf, cl.lhost, cl.ly, cl.lm, cl.lk, cl.lp,
         min(w.seq * 4294967296 + cl.pos) AS okey
  FROM w1 w
  JOIN statuses s ON s.url = w.url AND s.status = 200
  JOIN cand_links cl ON cl.src = w.url AND NOT cl.blocked
  WHERE NOT w.is_pdf
    AND cl.dst NOT IN (SELECT url FROM w0 UNION ALL SELECT url FROM w1)
  GROUP BY ALL
),
w2 AS (
  SELECT dst AS url, is_pdf, lhost AS host, ly AS y, lm AS m, lk AS k, lp AS p,
         (SELECT max(seq) FROM w1) + row_number() OVER (ORDER BY okey) AS seq
  FROM c2
),
c3 AS (
  SELECT cl.dst, cl.is_pdf, cl.lhost, cl.ly, cl.lm, cl.lk, cl.lp,
         min(w.seq * 4294967296 + cl.pos) AS okey
  FROM w2 w
  JOIN statuses s ON s.url = w.url AND s.status = 200
  JOIN cand_links cl ON cl.src = w.url AND NOT cl.blocked
  WHERE NOT w.is_pdf
    AND cl.dst NOT IN (SELECT url FROM w0 UNION ALL SELECT url FROM w1
                       UNION ALL SELECT url FROM w2)
  GROUP BY ALL
),
w3 AS (  -- wave-4 candidates are all depth-gated (max_depth 3): BFS ends
  SELECT dst AS url, is_pdf, lhost AS host, ly AS y, lm AS m, lk AS k, lp AS p,
         (SELECT max(seq) FROM w2) + row_number() OVER (ORDER BY okey) AS seq
  FROM c3
),
crawl AS (
  SELECT url, FALSE AS is_pdf, host, y, m, CAST(NULL AS BIGINT) AS k, p,
         seq, 0 AS depth
  FROM w0
  UNION ALL
  SELECT url, is_pdf, host, y, m, k, p, seq, 1 FROM w1
  UNION ALL
  SELECT url, is_pdf, host, y, m, k, p, seq, 2 FROM w2
  UNION ALL
  SELECT url, is_pdf, host, y, m, k, p, seq, 3 FROM w3
)
"""

RESTEXT = f"""
restext AS (  -- synth.resolution_text rebuilt string-for-string
  SELECT host, y, m, k, concat_ws(chr(10) || chr(10),
    'RESOLUÇÃO SES/MG Nº ' || num || '/' || y || ', de ' || dd || '/' ||
      lpad(CAST(m AS VARCHAR), 2, '0') || '/' || y,
    replace({OBJS}[1 + obj_i], '{{mun}}', mun),
    CASE WHEN u_rel < 0.60
         THEN 'Altera a Resolução SES/MG nº ' || rel || '/' || (y - 1) || '.'
    END,
    CASE WHEN u_prazo < 0.55
         THEN 'O prazo de execução das ações encerra-se em ' || pdd || '/' ||
              pmm || '/' || (y + 1) || '.'
    END,
    CASE WHEN u_ved < 0.70 THEN {VEDS}[1 + ved_i] END,
    CASE WHEN u_dot < 0.85
         -- synth applies .replace(',', '.') to the WHOLE sentence up to
         -- the value (so '2025,' reads '2025.'); only the cents separator
         -- is appended afterwards and stays a comma
         THEN 'A despesa correrá à conta da dotação orçamentária 10.' ||
              code || '.' || unit4 || '.2025. no valor de R$ ' || val_fmt ||
              ',' || cents2 || '.'
    END,
    'Belo Horizonte, ' || dd || ' de ' || {MONTHS}[m] || ' de ' || y || '.'
  ) AS text,
  u_corrupt
  FROM (
    SELECT host, y, m, k,
      1 + CAST({_hk("docnum", "host", "y", "m", "k")} % 99999 AS BIGINT) AS num,
      lpad(CAST(1 + CAST({_hk("day", "host", "y", "m", "k")} % 28 AS BIGINT) AS VARCHAR), 2, '0') AS dd,
      {MUNS}[1 + CAST({_hk("mun", "host", "y", "m", "k")} % 20 AS BIGINT)] AS mun,
      CAST({_hk("obj", "host", "y", "m", "k")} % 5 AS BIGINT) AS obj_i,
      {_uk("rel", "host", "y", "m", "k")} AS u_rel,
      1 + CAST({_hk("relnum", "host", "y", "m", "k")} % 99999 AS BIGINT) AS rel,
      {_uk("prazo", "host", "y", "m", "k")} AS u_prazo,
      lpad(CAST(1 + CAST({_hk("prazod", "host", "y", "m", "k")} % 28 AS BIGINT) AS VARCHAR), 2, '0') AS pdd,
      lpad(CAST(1 + CAST({_hk("prazom", "host", "y", "m", "k")} % 12 AS BIGINT) AS VARCHAR), 2, '0') AS pmm,
      {_uk("ved", "host", "y", "m", "k")} AS u_ved,
      CAST({_hk("vedt", "host", "y", "m", "k")} % 3 AS BIGINT) AS ved_i,
      {_uk("dot", "host", "y", "m", "k")} AS u_dot,
      {CODES}[1 + CAST({_hk("code", "host", "y", "m", "k")} % 8 AS BIGINT)] AS code,
      lpad(CAST(CAST({_hk("unit", "host", "y", "m", "k")} % 9999 AS BIGINT) AS VARCHAR), 4, '0') AS unit4,
      lpad(CAST(CAST({_hk("cents", "host", "y", "m", "k")} % 100 AS BIGINT) AS VARCHAR), 2, '0') AS cents2,
      replace(format('{{:,}}', 1000 + CAST({_hk("val", "host", "y", "m", "k")} % 900000 AS BIGINT)), ',', '.') AS val_fmt,
      {_uk("corrupt", "host", "y", "m", "k")} AS u_corrupt
    FROM (SELECT DISTINCT host, y, m, k FROM crawl WHERE is_pdf)
  )
)
"""

ITEMS = f"""
page_items AS (  -- synth.listing_body items in DOM order; ord gaps ok
  SELECT pg.url, d.j * 2 AS ord, 'text' AS sk,
         'Publicada em ' || {MONTHS}[pg.m] || ' de ' || pg.y ||
         ', referente ao município de ' ||
         {MUNS}[1 + CAST({_hk("dmun", "pg.host", "pg.y", "pg.m", "((pg.p - 1) * 12 + d.j)")} % 20 AS BIGINT)] || '.' AS content,
         '' AS ref,
         '<p class="desc">' AS w_open, '</p>' AS w_close
  FROM pages pg CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS j) d
  WHERE d.j < pg.n_docs
    AND {_uk("desc", "pg.host", "pg.y", "pg.m", "pg.p", "d.j")} < 0.5
  UNION ALL
  SELECT pg.url, d.j * 2 + 1, 'media',
         'Resolução SES nº ' ||
         (1 + CAST({_hk("docnum", "pg.host", "pg.y", "pg.m", "((pg.p - 1) * 12 + d.j)")} % 99999 AS BIGINT)) ||
         '/' || pg.y,
         {_durl("pg.host", "pg.y", "pg.m", "((pg.p - 1) * 12 + d.j)")},
         '<h2 class="title"><a href="/docs/' || pg.y || '/' || pg.m ||
         '/res-' || ((pg.p - 1) * 12 + d.j) || '.pdf">', '</a></h2>'
  FROM pages pg CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS j) d
  WHERE d.j < pg.n_docs
  UNION ALL
  SELECT pg.url, 24, 'media', 'Próxima página',
         {_lurl("pg.host", "pg.y", "pg.m", "(pg.p + 1)")},
         '<h2 class="title"><a href="/resolucoes?by_month=' || pg.m ||
         '&by_year=' || pg.y || '&ordering=newest&page=' || (pg.p + 1) || '">',
         '</a></h2>'
  FROM pages pg WHERE pg.has_next
  UNION ALL
  SELECT pg.url, 25, 'media', 'Portal parceiro',
         {_lurl("hx.host", "pg.y", "pg.m", "1")},
         '<h2 class="title"><a href="' ||
         {_lurl("hx.host", "pg.y", "pg.m", "1")} || '">', '</a></h2>'
  FROM pages pg JOIN hosts hx ON hx.i = pg.x_i
  WHERE pg.x_draw AND hx.i <> pg.i
),
listing_len AS (  -- utf-8 byte length of the listing HTML
  -- 68 = header '<html><head><title>Resoluções</title></head><body>' (52)
  --      + newline + trailing newline + '</body></html>' (15)
  SELECT pg.url,
         68 + coalesce(sum(strlen(pi.w_open || pi.content || pi.w_close)), 0)
            + CASE WHEN count(pi.url) > 0 THEN count(pi.url) - 1 ELSE 0 END AS body_len
  FROM pages pg LEFT JOIN page_items pi ON pi.url = pg.url
  GROUP BY pg.url
),
pdf_len AS (  -- synth.pdf_body: two corrupt branches + the 1402-byte pad
  SELECT {_durl("r.host", "r.y", "r.m", "r.k")} AS url,
         CASE WHEN uc < 0.025 THEN least(tl, 500)
              WHEN uc < 0.05 THEN least(9 + tl, 900)
              WHEN 9 + tl < 1400 THEN 1402
              ELSE 9 + tl END AS body_len,
         uc >= 0.05 AS valid
  FROM (
    SELECT host, y, m, k, strlen(text) AS tl, u_corrupt AS uc FROM restext
  ) r
)
"""

VTIME = """
hrows AS (  -- per-host request sequence in FIFO (crawl_seq) order
  SELECT c.url, c.host, c.is_pdf,
         row_number() OVER (PARTITION BY c.host ORDER BY c.seq) - 1 AS rn
  FROM crawl c
),
fold AS (  -- politeness.next_vtime as a per-host recursive fold:
           -- state = (t, last_pdf, last-30-vtimes window)
  SELECT host, rn, CAST(0.0 AS DOUBLE) AS t,
         CASE WHEN is_pdf THEN CAST(0.0 AS DOUBLE)
              ELSE CAST('-infinity' AS DOUBLE) END AS last_pdf,
         [CAST(0.0 AS DOUBLE)] AS win, 1 AS cnt
  FROM hrows WHERE rn = 0
  UNION ALL
  SELECT host, rn, t2,
         CASE WHEN is_pdf THEN t2 ELSE last_pdf END,
         list_slice(list_append(win, t2),
                    greatest(1, len(win) + 1 - 29), len(win) + 1),
         cnt + 1
  FROM (
    SELECT r.host, r.rn, r.is_pdf, f.last_pdf, f.win, f.cnt,
           CASE WHEN r.is_pdf
                THEN greatest(tw, f.last_pdf + 0.5) ELSE tw END AS t2
    FROM (
      SELECT f0.*, r0.rn AS nrn,
             CASE WHEN len(f0.win) >= 30
                  THEN greatest(CASE WHEN f0.cnt < 5 THEN f0.t
                                     ELSE f0.t + 2.0 END,
                                f0.win[1] + 60.0)
                  ELSE CASE WHEN f0.cnt < 5 THEN f0.t
                            ELSE f0.t + 2.0 END
             END AS tw
      FROM fold f0 JOIN hrows r0
        ON r0.host = f0.host AND r0.rn = f0.rn + 1
    ) f JOIN hrows r ON r.host = f.host AND r.rn = f.nrn
  )
),
vtimes AS (
  SELECT h.url, f.t AS vt
  FROM hrows h JOIN fold f ON f.host = h.host AND f.rn = h.rn
)
"""


PDFTEXT = f"""
pdftext AS (  -- decoded body after the %PDF-1.4 prefix, incl. the pad tail
  -- body = b'%PDF-1.4\\n' + utf8(text) [+ b'\\n%' + b'.' * (1400 - 9 - tl)]
  -- (synth.pdf_body valid branch); strlen() is BYTES in DuckDB, matching
  -- the byte-count pad arithmetic exactly
  SELECT {_durl("r.host", "r.y", "r.m", "r.k")} AS url,
         CASE WHEN 9 + strlen(r.text) < 1400
              THEN r.text || chr(10) || '%' ||
                   repeat('.', 1400 - 9 - strlen(r.text))
              ELSE r.text END AS ftext
  FROM restext r WHERE r.u_corrupt >= 0.05
),
okpdf AS (  -- crawled, fetched OK, passed the PDF validity filter
  SELECT pt.url, pt.ftext
  FROM pdftext pt
  JOIN statuses s ON s.url = pt.url AND s.status = 200
)
"""


def _compose(*sections: str) -> str:
    return "WITH RECURSIVE " + ",\n".join(s.strip() for s in sections) + "\n"


_LOG_SELECT = """
SELECT c.url,
       md5_number_upper(c.url) AS url_hash,
       c.host, c.depth, s.status, s.attempts,
       CAST(CASE WHEN s.status <> 200 THEN 0
                 WHEN c.is_pdf THEN pl.body_len
                 ELSE ll.body_len END AS BIGINT) AS content_len,
       CASE WHEN c.is_pdf THEN 'pdf' ELSE 'listing' END AS kind,
       c.seq AS crawl_seq,
       v.vt + CASE WHEN s.attempts = 3 THEN 6.0 ELSE 0.0 END AS vtime
FROM crawl c
JOIN statuses s ON s.url = c.url
JOIN vtimes v ON v.url = c.url
LEFT JOIN listing_len ll ON ll.url = c.url
LEFT JOIN pdf_len pl ON pl.url = c.url
ORDER BY crawl_seq
"""

CRAWL_LOG_SQL = _compose(PRELUDE, WAVES, RESTEXT, ITEMS, VTIME) + _LOG_SELECT


# Every span of every document the crawl emits, bit-exact: listing spans
# come straight from the DOM-ordered page_items (desc paragraphs interleaved
# with link titles; media_ref is the canonical destination URL), pdf spans
# from the padded resolution text split on blank lines (parse_pdf_spans).
# offset = rank among the page's emitted spans (the regex scan index —
# synth never emits empty href/title items, so no index gaps).
_DOC_SPANS_SELECT = """
SELECT c.url AS doc_id,
       CAST(row_number() OVER (PARTITION BY pi.url ORDER BY pi.ord) - 1
            AS INT) AS "offset",
       pi.sk AS kind, pi.content AS text, pi.ref AS media_ref
FROM crawl c
JOIN statuses s ON s.url = c.url AND s.status = 200
JOIN page_items pi ON pi.url = c.url
WHERE NOT c.is_pdf
UNION ALL
SELECT q.url AS doc_id,
       CAST(row_number() OVER (PARTITION BY q.url ORDER BY q.j) - 1
            AS INT) AS "offset",
       'text' AS kind, q.para AS text, '' AS media_ref
FROM (
  SELECT o.url, jj.j, o.secs[jj.j] AS para
  FROM (SELECT url, string_split(ftext, chr(10) || chr(10)) AS secs
        FROM okpdf) o
  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS j) jj
  WHERE jj.j <= len(o.secs) AND trim(o.secs[jj.j]) <> ''
) q
JOIN crawl c2 ON c2.url = q.url
"""

CRAWL_DOC_SPANS_SQL = (
    _compose(PRELUDE, WAVES, RESTEXT, ITEMS, PDFTEXT) + _DOC_SPANS_SELECT
)

# Per-document digest of the NESTED spans payload (crawl_documents'
# list<struct> column reduced to scalar columns): span counts by kind plus
# an order-insensitive bit_xor of a per-span md5 over every field —
# value-covers the nested shape the driver's hash can't compare directly.
CRAWL_DOCUMENTS_DIGEST_SQL = (
    _compose(PRELUDE, WAVES, RESTEXT, ITEMS, PDFTEXT)
    + ", spans AS (" + _DOC_SPANS_SELECT + """)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (kind = 'text') AS BIGINT) AS n_text,
       CAST(count(*) FILTER (kind = 'media') AS BIGINT) AS n_media,
       bit_xor(md5_number_upper(
           CAST("offset" AS VARCHAR) || '|' || kind || '|' ||
           text || '|' || media_ref)) AS span_xor
FROM spans GROUP BY doc_id
""")


# Per-wave deterministic frontier/fetch counters (the timing columns of the
# metrics table are excluded — wall-clock is not SQL-reproducible).
# Semantics pinned to pipeline._write_metrics: selected = wave size,
# new_urls = frontier_size = next wave's size, rejected_urls = candidates
# routed to the admission shards (every link occurrence from OK listings,
# including robots-blocked / depth-gated / already-seen) minus admitted,
# docs_emitted = OK listings (even empty ones) + OK valid pdfs.
CRAWL_WAVE_COUNTS_SQL = _compose(PRELUDE, WAVES, RESTEXT, ITEMS) + """
, base AS (
  SELECT c.depth AS wave, c.url, c.is_pdf, s.status,
         CASE WHEN s.status = 200 AND (NOT c.is_pdf OR pl.valid)
              THEN 1 ELSE 0 END AS emits
  FROM crawl c
  JOIN statuses s ON s.url = c.url
  LEFT JOIN pdf_len pl ON pl.url = c.url
),
wstats AS (
  SELECT wave,
         count(*) AS selected,
         sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS fetched_ok,
         sum(CASE WHEN status <> 200 THEN 1 ELSE 0 END) AS fetch_errors,
         sum(emits) AS docs_emitted
  FROM base GROUP BY wave
),
cands AS (
  SELECT b.wave, count(*) AS n_cand
  FROM base b JOIN cand_links cl ON cl.src = b.url
  WHERE NOT b.is_pdf AND b.status = 200
  GROUP BY b.wave
)
SELECT CAST(w.wave AS INT) AS wave,
       CAST(coalesce(nx.selected, 0) AS BIGINT) AS frontier_size,
       CAST(w.selected AS BIGINT) AS selected,
       CAST(w.fetched_ok AS BIGINT) AS fetched_ok,
       CAST(w.fetch_errors AS BIGINT) AS fetch_errors,
       CAST(coalesce(nx.selected, 0) AS BIGINT) AS new_urls,
       CAST(coalesce(c.n_cand, 0) - coalesce(nx.selected, 0) AS BIGINT)
         AS rejected_urls,
       CAST(w.docs_emitted AS BIGINT) AS docs_emitted
FROM wstats w
LEFT JOIN wstats nx ON nx.wave = w.wave + 1
LEFT JOIN cands c ON c.wave = w.wave
ORDER BY wave
"""


def _priority_waves(n_waves: int, wave_cap: int, per_host_cap: int) -> str:
    """Unrolled priority-frontier wave CTEs (pipeline.crawl_priority /
    priority.select_wave semantics) for the fixed driver web:

    - backlog rows carry okey (seeds: -2^32 + seed seq; links: parent
      crawl_seq * 2^32 + link pos, min per url — first-occurrence-wins
      dedup keeps the min-okey occurrence's DEPTH via arg_min) and
      priority = year*12 + month - depth (priority.priority_scores);
    - per-wave selection = greedy over (priority DESC, okey ASC) with a
      per-host cap and a global wave cap, which is exactly "per-host
      row_number <= cap, then global row_number <= wave_cap" over that
      order (skipped rows don't consume cap slots);
    - crawl_seq = waves' cumulative FIFO rank in selection order;
    - unselected rows REMAIN in the backlog; the seen set is everything
      ever admitted to the backlog (depth-gated / robots-blocked candidates
      are NOT marked seen and may be re-discovered at an admissible depth
      later — to_backlog gates before the seen check-and-add).

    The wave count is a deterministic property of the driver web; the
    builder asserts exhaustion via the pb{n} = empty check in tests.
    """
    out = []
    out.append(f"""
pb0 AS MATERIALIZED (  -- seed backlog: page-1 listings, depth 0, okey = -2^32 + seq
  SELECT pg.url, FALSE AS is_pdf, pg.host, pg.y, pg.m,
         CAST(NULL AS BIGINT) AS k, pg.p, 0 AS depth,
         -4294967296 + (row_number() OVER (ORDER BY hy2.i, hy2.y, hy2.m) - 1)
           AS okey,
         CAST(pg.y * 12 + pg.m AS DOUBLE) AS prio
  FROM hym hy2
  JOIN pages pg ON pg.host = hy2.host AND pg.y = hy2.y AND pg.m = hy2.m
              AND pg.p = 1
  WHERE hy2.i < 2 OR hy2.u_seedsel >= 0.55
)""")
    seen_union = "SELECT url FROM pb0"
    cum = None
    for w in range(n_waves):
        seq_expr = "r - 1" if cum is None else f"{cum} + r - 1"
        out.append(f"""
ps{w} AS MATERIALIZED (  -- wave {w} selection under per-host + wave caps
  SELECT url, is_pdf, host, y, m, k, p, depth, okey, prio,
         CAST({seq_expr} AS BIGINT) AS seq
  FROM (
    SELECT *, row_number() OVER (ORDER BY prio DESC, okey) AS r
    FROM (
      SELECT *, row_number()
               OVER (PARTITION BY host ORDER BY prio DESC, okey) AS hr
      FROM pb{w}
    ) WHERE hr <= {per_host_cap}
  ) WHERE r <= {wave_cap}
)""")
        cum = (f"(SELECT count(*) FROM ps{w})" if cum is None
               else f"({cum} + (SELECT count(*) FROM ps{w}))")
        out.append(f"""
pc{w} AS MATERIALIZED (  -- wave-{w} candidates: min-okey occurrence wins (incl. depth)
  SELECT cl.dst,
         min(wv.seq * 4294967296 + cl.pos) AS okey,
         arg_min(wv.depth, wv.seq * 4294967296 + cl.pos) + 1 AS depth,
         any_value(cl.is_pdf) AS is_pdf, any_value(cl.lhost) AS host,
         any_value(cl.ly) AS y, any_value(cl.lm) AS m,
         any_value(cl.lk) AS k, any_value(cl.lp) AS p,
         any_value(cl.blocked) AS blocked
  FROM ps{w} wv
  JOIN statuses s ON s.url = wv.url AND s.status = 200
  JOIN cand_links cl ON cl.src = wv.url
  WHERE NOT wv.is_pdf
  GROUP BY cl.dst
),
pn{w} AS MATERIALIZED (  -- admitted to the backlog (depth/robots gates, then seen)
  SELECT dst AS url, is_pdf, host, y, m, k, p, depth, okey,
         CAST(y * 12 + m - depth AS DOUBLE) AS prio
  FROM pc{w}
  WHERE depth <= 3 AND NOT blocked
    AND dst NOT IN ({seen_union})
),
pb{w + 1} AS MATERIALIZED (  -- carry-over (cap-deferred) rows precede nothing: order
                -- is re-derived from (prio, okey) every wave
  SELECT * FROM pb{w} WHERE okey NOT IN (SELECT okey FROM ps{w})
  UNION ALL
  SELECT * FROM pn{w}
)""")
        seen_union += f" UNION ALL SELECT url FROM pn{w}"
    union = " UNION ALL ".join(
        f"SELECT url, is_pdf, host, y, m, k, p, seq, depth, {w} AS wave "
        f"FROM ps{w}" for w in range(n_waves)
    )
    out.append(f"""
crawl AS MATERIALIZED (
  SELECT * FROM ({union})
)""")
    return ",\n".join(s.strip() for s in out)


# PRIORITY_LOG_SQL (assigned at module end, after _compose): the priority-
# frontier crawl log for the driver workload (wave_cap=200, per_host_cap=25,
# 4 waves to frontier exhaustion), all 10 columns — host-capped recency-
# scored selection replayed wave by wave, then the same content-length and
# politeness machinery as the BFS oracle.


# The deterministic 7-field extraction contract (extract.extract_one +
# ResolutionExtractor: length gate, sentinel fill, link passthrough,
# abreviacao from the first budget code) replayed over the regenerated
# padded pdf text. The pad tail ('\\n%...') attaches to the final paragraph
# exactly as the engine's split sees it.
RESOLUTIONS_SQL = _compose(PRELUDE, WAVES, RESTEXT, PDFTEXT) + r"""
, fields AS (
  SELECT url, ftext,
         string_split(ftext, chr(10) || chr(10)) AS p
  FROM okpdf
),
ext AS (
  SELECT url, ftext,
    regexp_extract(ftext, '\b(\d{1,5}/20\d{2})\b', 1) AS numero,
    regexp_extract(ftext,
      '(?:[Aa]ltera|[Mm]odifica|[Rr]evoga|em substituição|[Cc]omplementa)[^0-9]{0,80}?(\d{1,5}/20\d{2})',
      1) AS relacionada_raw,
    coalesce(list_filter(p,
      x -> NOT regexp_matches(x, '^\s*RESOLU', 'i'))[1], '') AS objeto_raw,
    regexp_extract(ftext, '\b(\d{2}/\d{2}/\d{4})\b', 1) AS data_raw,
    coalesce(list_filter(p,
      x -> regexp_matches(x, 'prazo', 'i')
           AND regexp_extract(x, '\b(\d{2}/\d{2}/\d{4})\b', 1) <> ''
    )[1], '') AS prazo_para,
    coalesce(list_filter(p,
      x -> regexp_matches(x, 'vedad[ao]|proibid[ao]|não poderá ser utilizado', 'i')
    )[1], '') AS vedado_raw,
    regexp_extract(ftext,
      'dota[çc][ãa]o or[çc]ament[áa]ria\s+([0-9][0-9.\-]*[0-9])', 1) AS dotacao_raw
  FROM fields
),
sent AS (
  SELECT url,
    CASE WHEN trim(numero) = '' THEN 'NÃO INFORMADO' ELSE trim(numero) END AS numero_resolucao,
    CASE WHEN trim(relacionada_raw) = '' THEN 'NÃO INFORMADO' ELSE trim(relacionada_raw) END AS relacionada,
    CASE WHEN trim(objeto_raw) = '' THEN 'NÃO INFORMADO' ELSE trim(objeto_raw) END AS objeto,
    CASE WHEN trim(data_raw) = '' THEN 'NÃO INFORMADO' ELSE trim(data_raw) END AS data_inicial,
    CASE WHEN trim(regexp_extract(prazo_para, '\b(\d{2}/\d{2}/\d{4})\b', 1)) = ''
         THEN 'NÃO INFORMADO'
         ELSE trim(regexp_extract(prazo_para, '\b(\d{2}/\d{2}/\d{4})\b', 1)) END AS prazo_execucao,
    CASE WHEN trim(vedado_raw) = '' THEN 'NÃO INFORMADO' ELSE trim(vedado_raw) END AS vedado_utilizacao,
    CASE WHEN trim(dotacao_raw) = '' THEN 'NÃO INFORMADO' ELSE trim(dotacao_raw) END AS dotacao_orcamentaria,
    dotacao_raw
  FROM ext
)
SELECT url AS doc_id,
       numero_resolucao, relacionada, objeto, data_inicial, prazo_execucao,
       vedado_utilizacao, dotacao_orcamentaria,
       url AS link,
       CASE regexp_extract(dotacao_raw, '\b(301|302|303|304|305|306|122|242)\b', 1)
            WHEN '301' THEN 'Atenção Primária'
            WHEN '302' THEN 'MAC'
            WHEN '303' THEN 'Assistência Farmacêutica'
            WHEN '304' THEN 'Vigilância Sanitária'
            WHEN '305' THEN 'Vigilância Epidemiológica'
            WHEN '306' THEN 'Alimentação e Nutrição'
            WHEN '122' THEN 'ADM'
            WHEN '242' THEN 'Assist. ao Portador de Deficiência'
            ELSE 'NÃO CLASSIFICADO' END AS abreviacao,
       TRUE AS ok
FROM sent
"""


PRIORITY_LOG_SQL = _compose(
    PRELUDE, _priority_waves(n_waves=4, wave_cap=200, per_host_cap=25),
    RESTEXT, ITEMS, VTIME,
) + _LOG_SELECT


def _priority_wave_counts_select(n_waves: int) -> str:
    """Per-wave deterministic counters of the priority crawl. Unlike BFS,
    priority n_cand counts the DEDUPED candidate table (pipeline.py
    priority path passes cand.num_rows), so rejected = |pc_w| - |pn_w|."""
    cand_counts = "\n  UNION ALL ".join(
        f"SELECT {w} AS wave, (SELECT count(*) FROM pc{w}) AS n_cand, "
        f"(SELECT count(*) FROM pn{w}) AS n_new" for w in range(n_waves)
    )
    return f"""
, wstats AS (
  SELECT c.wave,
         count(*) AS selected,
         sum(CASE WHEN s.status = 200 THEN 1 ELSE 0 END) AS fetched_ok,
         sum(CASE WHEN s.status <> 200 THEN 1 ELSE 0 END) AS fetch_errors,
         sum(CASE WHEN s.status = 200 AND (NOT c.is_pdf OR pl.valid)
                  THEN 1 ELSE 0 END) AS docs_emitted
  FROM crawl c
  JOIN statuses s ON s.url = c.url
  LEFT JOIN pdf_len pl ON pl.url = c.url
  GROUP BY c.wave
),
cn AS ({cand_counts})
SELECT CAST(w.wave AS INT) AS wave,
       CAST(cn.n_new AS BIGINT) AS frontier_size,
       CAST(w.selected AS BIGINT) AS selected,
       CAST(w.fetched_ok AS BIGINT) AS fetched_ok,
       CAST(w.fetch_errors AS BIGINT) AS fetch_errors,
       CAST(cn.n_new AS BIGINT) AS new_urls,
       CAST(greatest(cn.n_cand - cn.n_new, 0) AS BIGINT) AS rejected_urls,
       CAST(w.docs_emitted AS BIGINT) AS docs_emitted
FROM wstats w JOIN cn ON cn.wave = w.wave
ORDER BY wave
"""


PRIORITY_WAVE_COUNTS_SQL = _compose(
    PRELUDE, _priority_waves(n_waves=4, wave_cap=200, per_host_cap=25),
    RESTEXT, ITEMS,
) + _priority_wave_counts_select(4)
