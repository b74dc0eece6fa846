"""LLM extraction shell: sliding-window rate limiter + retry/backoff +
actor stage — driven entirely by fake transports on virtual clocks (no
network; semantics mirror /root/reference/src/ai/openai_client.py:17-145)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from bgdss_ray.config import SENTINEL
from bgdss_ray.llm import (
    APIError,
    AuthenticationError,
    LLMError,
    LLMExtractionClient,
    LLMExtractorStage,
    RateLimitError,
    SlidingWindowRateLimiter,
)
from bgdss_ray.schemas import SPAN_STRUCT


class VClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        assert s >= 0
        self.t += s


def make_limiter(max_calls=5, period=60.0):
    clk = VClock()
    return SlidingWindowRateLimiter(max_calls, period, clock=clk, sleep=clk.sleep), clk


def test_limiter_allows_burst_then_blocks():
    rl, clk = make_limiter(max_calls=5)
    for _ in range(5):
        assert rl.acquire() == 0.0
    # 6th call: window full, all calls at t=0 → sleep a full period
    assert rl.acquire() == 60.0
    assert clk.t == 60.0
    # the slide emptied the window: next 4 calls are free again
    for _ in range(4):
        assert rl.acquire() == 0.0


def test_limiter_sleeps_until_oldest_leaves_window():
    rl, clk = make_limiter(max_calls=5)
    for i in range(5):
        rl.acquire()
        clk.t += 10.0  # calls at t = 0,10,20,30,40; now t=50
    slept = rl.acquire()
    assert slept == pytest.approx(10.0)  # period-(now-oldest) = 60-(50-0)
    assert clk.t == pytest.approx(60.0)


def test_limiter_steady_state_rate():
    """Long run: the limiter never admits more than max_calls per period."""
    rl, clk = make_limiter(max_calls=5, period=60.0)
    times = []
    for _ in range(25):
        rl.acquire()
        times.append(clk.t)
    times = np.asarray(times)
    for t in times:
        assert ((times >= t - 60.0 + 1e-9) & (times <= t)).sum() <= 5


def _client(transport, **kw):
    sleeps = []
    limiter, _clk = make_limiter(max_calls=1000)
    c = LLMExtractionClient(
        transport, limiter=limiter, sleep=sleeps.append, **kw
    )
    return c, sleeps


def test_retry_rate_limit_backoff_then_success():
    n = {"calls": 0}

    def transport(msgs):
        n["calls"] += 1
        if n["calls"] < 3:
            raise RateLimitError("429")
        return "ok"

    c, sleeps = _client(transport)
    assert c.chat([]) == "ok"
    assert n["calls"] == 3
    assert sleeps == [2.0, 4.0]  # min(2**attempt, 60)


def test_retry_exhaustion_raises_llm_error():
    def transport(msgs):
        raise RateLimitError("429")

    c, sleeps = _client(transport)
    with pytest.raises(LLMError, match="Rate limit exceeded"):
        c.chat([])
    assert sleeps == [2.0, 4.0]  # 3 attempts, backoff between


def test_api_error_short_backoff():
    n = {"calls": 0}

    def transport(msgs):
        n["calls"] += 1
        if n["calls"] == 1:
            raise APIError("503")
        return "ok"

    c, sleeps = _client(transport)
    assert c.chat([]) == "ok"
    assert sleeps == [2.0]


def test_auth_error_never_retries():
    n = {"calls": 0}

    def transport(msgs):
        n["calls"] += 1
        raise AuthenticationError("bad key")

    c, sleeps = _client(transport)
    with pytest.raises(LLMError, match="Invalid API key"):
        c.chat([])
    assert n["calls"] == 1 and sleeps == []


def test_unexpected_error_never_retries():
    def transport(msgs):
        raise ValueError("boom")

    c, sleeps = _client(transport)
    with pytest.raises(LLMError, match="Unexpected error"):
        c.chat([])
    assert sleeps == []


def test_every_chat_passes_through_limiter():
    limiter, clk = make_limiter(max_calls=2, period=60.0)
    c = LLMExtractionClient(lambda m: "ok", limiter=limiter, sleep=lambda s: None)
    for _ in range(2):
        c.chat([])
    t_before = clk.t
    c.chat([])  # third call must be rate-limited
    assert clk.t == t_before + 60.0


# ------------------------------------------------------ extractor stage --
def _spans_batch():
    long_txt = ("RESOLUÇÃO SES/MG 100/2023. " + "conteúdo do objeto " * 10).strip()
    spans_ok = [
        {"kind": "text", "text": long_txt, "media_ref": "", "offset": 0},
    ]
    spans_short = [{"kind": "text", "text": "curto", "media_ref": "", "offset": 0}]
    return pa.Table.from_arrays(
        [
            pa.array(["http://h/doc-a.pdf", "http://h/doc-b.pdf"]),
            pa.array([spans_ok, spans_short], type=pa.list_(SPAN_STRUCT)),
        ],
        names=["doc_id", "spans"],
    )


def fake_transport_factory():
    def transport(messages):
        # deterministic structured reply, markdown-wrapped like real models
        body = {
            "numero_resolucao": "100/2023",
            "relacionada": SENTINEL,
            "objeto": "conteúdo",
            "data_inicial": "01/02/2023",
            "prazo_execucao": SENTINEL,
            "vedado_utilizacao": SENTINEL,
            "dotacao_orcamentaria": "1234.5678-9",
        }
        return "```json\n" + json.dumps(body, ensure_ascii=False) + "\n```"

    return transport


def test_llm_extractor_stage_contract():
    stage = LLMExtractorStage(fake_transport_factory)
    out = stage(_spans_batch())
    df = out.to_pandas()
    assert list(df["ok"]) == [True, False]  # short doc gated out
    row = df.iloc[0]
    assert row["numero_resolucao"] == "100/2023"
    assert row["data_inicial"] == "01/02/2023"
    assert row["link"] == "http://h/doc-a.pdf"  # doc_id-is-URL provenance
    assert df.iloc[1]["numero_resolucao"] == SENTINEL
    # malformed-reply degradation
    stage_bad = LLMExtractorStage(lambda: (lambda m: "not json at all"))
    df_bad = stage_bad(_spans_batch()).to_pandas()
    assert list(df_bad["ok"]) == [False, False]
    assert (df_bad["numero_resolucao"] == SENTINEL).all()


def test_llm_pipeline_matches_deterministic_extractor(ray_session):
    """The LLM actor path with the 'perfect model' fake transport produces
    exactly the deterministic extractor's fields on the testdata corpus
    (docs < 20k chars, so both see identical text/paras)."""
    import ray.data as rd

    from bgdss_ray.extract import extract_resolutions
    from bgdss_ray.pipelines import llm_extract_pipeline, spanify_pipeline

    sf = "/root/testdata/sf0.001"
    via_llm = llm_extract_pipeline(sf).to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    direct = extract_resolutions(spanify_pipeline(sf)).to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert list(via_llm.columns) == list(direct.columns)
    for c in ["doc_id", "numero_resolucao", "data_inicial",
              "dotacao_orcamentaria", "abreviacao", "ok"]:
        assert (via_llm[c] == direct[c]).all(), c


def test_llm_stage_counts_calls_through_limiter():
    calls = {"n": 0}

    def factory():
        def transport(messages):
            calls["n"] += 1
            return json.dumps({c: "x" for c in [
                "numero_resolucao", "relacionada", "objeto", "data_inicial",
                "prazo_execucao", "vedado_utilizacao", "dotacao_orcamentaria"]})

        return transport

    limiter, _clk = make_limiter(max_calls=1000)
    stage = LLMExtractorStage(factory, limiter=limiter)
    stage(_spans_batch())
    assert calls["n"] == 1  # only the length-gated-in doc hits the API
    assert len(limiter.calls) == 1
