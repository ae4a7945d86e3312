"""LLMProvider payload shapes (faked transports) + bottom-up tree
summaries (T8 with the LLM path wired)."""

from __future__ import annotations

import pytest

from fusionspark.operators.llm import LLMProvider, bottom_up_summaries


def test_llm_provider_payload_shapes():
    calls = []

    def fake_ollama(url, payload, headers):
        calls.append(url)
        assert payload["stream"] is False and payload["options"]["num_predict"] == 150
        return {"response": "ollama says hi"}

    assert LLMProvider("ollama", transport=fake_ollama).complete("p", max_tokens=150) == "ollama says hi"
    assert calls[0].endswith("/api/generate")

    def fake_openai(url, payload, headers):
        assert headers["Authorization"] == "Bearer k"
        assert payload["messages"][0]["role"] == "user"
        return {"choices": [{"message": {"content": "openai says hi"}}]}

    assert LLMProvider("openai", api_key="k", transport=fake_openai).complete("p") == "openai says hi"

    def fake_anthropic(url, payload, headers):
        assert headers["anthropic-version"] == "2023-06-01"
        return {"content": [{"text": "anthropic says hi"}]}

    assert LLMProvider("anthropic", api_key="k", transport=fake_anthropic).complete("p") == "anthropic says hi"

    with pytest.raises(ValueError):
        LLMProvider("nope")


def _toy_tree(spark):
    rows = [
        # (doc, sec, level, title, content, parent)
        (1, 1, 1, "Root", "", 0),
        (1, 2, 2, "Alpha", "alpha content long enough to pass the fifty char summary gate", 1),
        (1, 3, 2, "Beta", "beta content also long enough to pass the fifty char summary gate", 1),
        (1, 4, 2, "Tiny", "short", 1),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id: long, sec_idx: long, level: int, title: string, content: string, parent_idx: long",
    )


def test_bottom_up_summaries_fallback(spark):
    out = {r["sec_idx"]: r["summary"] for r in bottom_up_summaries(_toy_tree(spark)).collect()}
    assert out[2].startswith("alpha content") and out[2].endswith("...")
    assert out[4] == ""  # under the 50-char gate
    # the parent (no content) summarizes from child `title: summary` lines
    assert "Alpha: alpha content" in out[1] and "Beta: beta content" in out[1]


def test_bottom_up_summaries_llm_path(spark):
    summary = "LLM SUMMARY of this section, long enough to exceed the gate"

    def fake(url, payload, headers):
        return {"response": summary}

    prov = LLMProvider("ollama", transport=fake)
    out = {r["sec_idx"]: r["summary"] for r in bottom_up_summaries(_toy_tree(spark), prov).collect()}
    assert out[2] == summary and out[3] == summary
    assert out[1] == summary  # parent summarized from child lines
    assert out[4] == ""


def test_bottom_up_summaries_provider_error_falls_back(spark):
    def broken(url, payload, headers):
        raise OSError("no network")

    prov = LLMProvider("ollama", transport=broken)
    out = {r["sec_idx"]: r["summary"] for r in bottom_up_summaries(_toy_tree(spark), prov).collect()}
    assert out[2].startswith("alpha content") and out[2].endswith("...")
