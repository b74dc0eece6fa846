"""Scalar function library: filename builders, markdown/JSON cleaners.

Exact-behavior reimplementations of the reference's small string functions
(SURVEY.md §2.3 "filename builders" / "JSON-from-markdown extractor" /
"markdown cleaner"), kept as plain scalar UDFs so equality tests are direct.
"""

from __future__ import annotations

import re

MONTH_NAMES_PT = {
    "01": "janeiro", "02": "fevereiro", "03": "marco", "04": "abril",
    "05": "maio", "06": "junho", "07": "julho", "08": "agosto",
    "09": "setembro", "10": "outubro", "11": "novembro", "12": "dezembro",
}


def month_dir_name(mes: str) -> str:
    """'03' → '03_marco'; unknown values pass through
    (portal_saude_mg.py:206-219)."""
    return f"{mes}_{MONTH_NAMES_PT.get(mes, mes)}"


def slug_sanitize(name: str) -> str:
    """Keep alnum plus '_' and '-', lowercase (pdf_data_to_table.py:276-277)."""
    return "".join(c for c in name if c.isalnum() or c in ("_", "-")).lower()


def sequential_pdf_name(mes: str, ano: str | int, order: int) -> str:
    """'[mes]-[ano]-RES-{order:03d}.pdf' — the reference's crawl-order-
    defining filename scheme (portal_saude_mg.py:488-501)."""
    return f"{mes}-{ano}-RES-{order:03d}.pdf"


def extract_json_from_markdown(content: str) -> str:
    """Strip ```json fences via first '{' … last '}' (openai_client.py:43-55;
    inline duplicate pdf_call.py:260-275)."""
    content = content.strip()
    if content.startswith("```json"):
        start = content.find("{")
        end = content.rfind("}") + 1
        if start != -1 and end != 0:
            return content[start:end]
    return content


_MD_LINK = re.compile(r"\[([^\]]+)\]\([^)]+\)")
_MD_CHARS = re.compile(r"[#*_`]")


def clean_markdown_reply(content: str) -> str:
    """The municipality-corrector reply cleaner
    (municipality_corrector.py:94-114): drop header lines, unwrap links,
    strip md chars and quotes."""
    result = content.strip()
    if result.startswith("#"):
        for line in result.split("\n"):
            clean = line.strip()
            if clean and not clean.startswith("#") and not clean.startswith("[") \
                    and not clean.startswith("http"):
                result = clean
                break
    result = _MD_LINK.sub(r"\1", result)
    result = _MD_CHARS.sub("", result)
    return result.strip().strip('"').strip("'").strip()
