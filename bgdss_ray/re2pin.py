"""RE2-pinned character classes shared by every SQL-paired text stage.

DuckDB regexes are RE2. RE2's default (non-unicode-class) escapes are
ASCII-only and differ from python's unicode `re` in ways that silently
break engine/oracle parity on non-ASCII or exotic-whitespace input:

==========  =======================  ============================
escape      RE2 (DuckDB)             python ``re`` (unicode)
==========  =======================  ============================
``\\s``      ``[ \\t\\n\\f\\r]``      adds ``\\v``, NBSP, …
``\\w``      ``[0-9A-Za-z_]``         adds accented letters, …
``\\d``      ``[0-9]``                adds arabic-indic digits, …
``\\b``      ASCII-word boundary      unicode-word boundary
==========  =======================  ============================

(The ``\\s`` row is verified empirically against DuckDB:
``regexp_matches('\\x0b', '\\s')`` is FALSE — RE2 ``\\s`` has no ``\\v``.)

Every engine-side tokenizer/counter that pairs with a DuckDB oracle must
use THESE classes so parity holds on every input, not just the
whitespace-clean ASCII test corpus. str.strip()/str.split() (unicode) are
likewise banned in paired paths — use :func:`strip_ws` / :func:`split_ws`.
"""

from __future__ import annotations

import re

# literal class bodies, for composing into bigger patterns
WS = r" \t\n\f\r"          # RE2 \s
WORD = r"0-9A-Za-z_"       # RE2 \w

WS_RUN = re.compile(rf"[{WS}]+")
EDGE_WS = re.compile(rf"^[{WS}]+|[{WS}]+$")
WORD_RE = re.compile(rf"[{WORD}]+")
WORD_CHAR = re.compile(rf"[{WORD}]")
DIGIT = re.compile(r"[0-9]")
PUNCT = re.compile(rf"[^{WORD}{WS}]")  # == RE2 [^\w\s]


def strip_ws(s: str) -> str:
    """``regexp_replace(s, '^\\s+|\\s+$', '', 'g')`` under RE2 semantics."""
    return EDGE_WS.sub("", s)


def split_ws(s: str) -> list[str]:
    """RE2-``\\s+`` split of the RE2-stripped string; [] for all-ws input
    (matches the paired oracles' ``CASE WHEN trim(text)='' THEN []`` +
    split shape on every corpus the synth generator emits)."""
    s = strip_ws(s)
    return WS_RUN.split(s) if s else []


# RE2-ASCII \b emulation: a boundary is a TRANSITION (exactly one side is
# an ASCII word char), not merely "no word char adjacent" — 'é' between
# spaces has NO \b around it in RE2 even though nothing word-ish touches it
ASCII_B = rf"(?:(?<![{WORD}])(?=[{WORD}])|(?<=[{WORD}])(?![{WORD}]))"


def ascii_word_bounded(alternation: str) -> re.Pattern:
    """``\\b(alt)\\b`` with RE2's ASCII word boundary: python's ``\\b`` is
    relative to unicode ``\\w``, so 'éthe' has no boundary before 'the' in
    python but does in RE2 (é is non-word there). :data:`ASCII_B` pins the
    transition semantics exactly."""
    return re.compile(rf"{ASCII_B}({alternation}){ASCII_B}")
