"""LLM extraction client shell: sliding-window rate limiter + retry/backoff.

Reimplements the reference's AI client layer semantics
(/root/reference/src/ai/openai_client.py):

- ``SlidingWindowRateLimiter`` — 50 calls / 60 s sliding window; when full,
  sleep until the oldest call leaves the window (openai_client.py:17-40,112).
- ``LLMExtractionClient.chat`` — ≤3 attempts; rate-limit errors back off
  ``min(2**attempt, 60)`` s, transient API errors ``2**attempt`` s,
  authentication / unexpected errors raise immediately; exhausting retries
  raises ``LLMError`` (openai_client.py:121-145,162-208).

The transport is INJECTED (any callable ``messages -> str``): no network
library exists in this environment and none is imported. Tests drive the
shell with fake clients on a virtual clock; production would inject a real
HTTP transport. The deterministic regex extractor (extract.py) remains the
default everywhere — ``LLMExtractorStage`` is the actor-pool stage a user
plugs an LLM into, emitting the exact RESOLUTIONS schema.
"""

from __future__ import annotations

import json
import time
from collections import deque
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import SENTINEL
from .functions import extract_json_from_markdown
from .schemas import RESOLUTION_COLUMNS


class LLMError(Exception):
    """Terminal client failure (openai_client.py AIError equivalent)."""

    def __init__(self, message: str, api_error: str | None = None):
        super().__init__(message)
        self.api_error = api_error


class RateLimitError(Exception):
    """Provider signalled request-rate exhaustion (retryable, long backoff)."""


class AuthenticationError(Exception):
    """Invalid credentials (never retried)."""


class APIError(Exception):
    """Transient provider error (retryable, short backoff)."""


class SlidingWindowRateLimiter:
    """Client-side sliding-window limiter (openai_client.py:17-40).

    Keeps the timestamps of the last ``max_calls`` calls; when the window is
    full, sleeps exactly ``period - (now - oldest)`` so the oldest call
    falls out. ``clock``/``sleep`` are injectable for virtual-clock tests.
    """

    def __init__(self, max_calls: int = 50, period: float = 60.0,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        self.max_calls = max_calls
        self.period = period
        self.clock = clock
        self.sleep = sleep
        self.calls: deque[float] = deque()

    def acquire(self) -> float:
        """Block until a call slot is free; returns seconds slept."""
        now = self.clock()
        while self.calls and self.calls[0] <= now - self.period:
            self.calls.popleft()
        slept = 0.0
        if len(self.calls) >= self.max_calls:
            slept = self.period - (now - self.calls[0])
            if slept > 0:
                self.sleep(slept)
            now = self.clock()
            while self.calls and self.calls[0] <= now - self.period:
                self.calls.popleft()
        self.calls.append(now)
        return slept


class LLMExtractionClient:
    """Retry/backoff wrapper over an injected transport.

    ``transport`` is any callable ``(messages: list[dict]) -> str`` that may
    raise the taxonomy above. Mirrors openai_client.py:121-145 +
    chat_completion's attempt loop (:162-208): RateLimitError sleeps
    ``min(2**attempt, 60)`` then retries; APIError sleeps ``2**attempt``;
    AuthenticationError and unknown exceptions raise LLMError immediately;
    after ``max_retries`` failed attempts raises LLMError.
    """

    def __init__(self, transport: Callable[[list[dict]], str],
                 max_retries: int = 3,
                 limiter: SlidingWindowRateLimiter | None = None,
                 sleep: Callable[[float], None] = time.sleep):
        self.transport = transport
        self.max_retries = max_retries
        self.limiter = limiter or SlidingWindowRateLimiter()
        self._sleep = sleep

    def chat(self, messages: list[dict]) -> str:
        self.limiter.acquire()
        for attempt in range(1, self.max_retries + 1):
            try:
                return self.transport(messages)
            except RateLimitError as e:
                if attempt < self.max_retries:
                    self._sleep(min(2.0 ** attempt, 60.0))
                else:
                    raise LLMError("Rate limit exceeded", api_error=str(e))
            except AuthenticationError as e:
                raise LLMError("Invalid API key", api_error=str(e))
            except APIError as e:
                if attempt < self.max_retries:
                    self._sleep(2.0 ** attempt)
                else:
                    raise LLMError("API error", api_error=str(e))
            except Exception as e:  # unexpected: no retry (openai_client.py:143-145)
                raise LLMError("Unexpected error", api_error=str(e))
        raise LLMError("Max retries exceeded")


# the 7 extraction fields the prompt demands (pdf_call.py:316-397)
_FIELDS = RESOLUTION_COLUMNS[:7]


def make_extraction_messages(text: str) -> list[dict]:
    """Field-spec prompt equivalent (pdf_call.py:316-397, abridged)."""
    return [
        {"role": "system",
         "content": "Extraia os campos da resolução como JSON: "
                    + ", ".join(_FIELDS)
                    + f'. Use "{SENTINEL}" quando ausente.'},
        {"role": "user", "content": text},
    ]


class LLMExtractorStage:
    """Actor-pool map_batches stage: DOCUMENTS batch → RESOLUTIONS batch via
    an injected LLM transport — the slot documented in extract.py, made
    concrete. Client + limiter are built ONCE per actor (``__init__``), one
    rate-limited chat call per document in ``__call__``.

    Same gates as the deterministic extractor: <100-char docs are sentinel
    rows (ok=False), text truncates to 20k chars (pdf_call.py:73-81,246).
    Malformed/failed responses degrade to sentinel rows with ok=False —
    the reference keeps failed extractions for stats (pdf_data_to_table.py:172).
    """

    def __init__(self, transport_factory: Callable[[], Callable],
                 url_mapping: dict[str, str] | None = None,
                 min_text_chars: int = 100, max_text_chars: int = 20_000,
                 max_retries: int = 3,
                 limiter: SlidingWindowRateLimiter | None = None):
        self.client = LLMExtractionClient(
            transport_factory(), max_retries=max_retries, limiter=limiter
        )
        self.url_mapping = url_mapping or {}
        self.min_text_chars = min_text_chars
        self.max_text_chars = max_text_chars

    def link_for(self, doc_id: str) -> str:
        if doc_id in self.url_mapping:
            return self.url_mapping[doc_id]
        if doc_id.startswith("http"):
            return doc_id
        return SENTINEL

    def _fields_for(self, text: str) -> dict[str, str] | None:
        try:
            reply = self.client.chat(make_extraction_messages(text))
            obj = json.loads(extract_json_from_markdown(reply))
        except (LLMError, json.JSONDecodeError, TypeError):
            return None
        if not isinstance(obj, dict):
            return None
        return {c: str(obj.get(c, SENTINEL)) for c in _FIELDS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .validators import categorize_series, sentinel_fill
        from .extract import doc_text_and_paras

        ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        rows: dict[str, list] = {c: [] for c in RESOLUTION_COLUMNS}
        ok: list[bool] = []
        for doc_id, spans in zip(ids, spans_col):
            text, _paras = doc_text_and_paras(spans)
            if len(text) < self.min_text_chars:
                ok.append(False)
                for c in RESOLUTION_COLUMNS:
                    rows[c].append(SENTINEL)
                continue
            fields = self._fields_for(text[: self.max_text_chars])
            if fields is None:
                ok.append(False)
                for c in RESOLUTION_COLUMNS:
                    rows[c].append(SENTINEL)
                continue
            ok.append(True)
            for c in _FIELDS:
                rows[c].append(fields[c])
            rows["link"].append(self.link_for(doc_id))
            rows["abreviacao"].append("")

        df = pd.DataFrame(rows)
        df["abreviacao"] = categorize_series(df["dotacao_orcamentaria"])
        for c in RESOLUTION_COLUMNS:
            df[c] = sentinel_fill(df[c])
        df.insert(0, "doc_id", ids)
        df["ok"] = np.asarray(ok)
        return pa.Table.from_pandas(df, preserve_index=False)


def extract_resolutions_llm(docs_ds, transport_factory,
                            url_mapping: dict[str, str] | None = None,
                            batch_size: int = 64, concurrency: int = 2,
                            limiter: SlidingWindowRateLimiter | None = None):
    """DOCUMENTS dataset → resolutions via the LLM actor pool (one client +
    limiter per actor; small batches keep call latency overlapped).
    ``limiter`` defaults to the reference's 50 calls / 60 s window — pass
    an uncapped one for offline/fake transports (the window sleeps for
    real)."""
    return docs_ds.map_batches(
        LLMExtractorStage,
        fn_constructor_args=(transport_factory, url_mapping),
        fn_constructor_kwargs={"limiter": limiter},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
