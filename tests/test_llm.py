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


def _search_tree(spark):
    rows = [
        # (doc, sec, level, title, content, parent)
        (1, 1, 1, "Root", "beta overview", 0),
        (1, 2, 2, "Alpha", "nothing matching the keywords here", 1),
        (1, 3, 2, "Beta", "beta beta beta keyword rich content", 1),
        (1, 4, 3, "AlphaLeaf", "the actual answer hides here", 2),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id: long, sec_idx: long, level: int, title: string, content: string, parent_idx: long",
    )


def test_reasoning_search_llm_scored_descent(spark):
    """VERDICT r2 #2: the LLMProvider gates descent (_evaluateChildren) and
    retrieval (_evaluateRelevance); the deterministic keyword path is
    unchanged and picks a different leaf by construction."""
    from fusionspark.operators.tree import reasoning_search

    def fake_tree_llm(url, payload, headers):
        # faked ollama transport: routes Alpha over Beta, the opposite of
        # what keyword overlap would do (nested so cloudpickle ships it
        # by value — the test module is not importable on executors)
        p = payload["prompt"]
        if "Evaluate the relevance" in p:  # _evaluateRelevance on a leaf
            return {"response": '```json\n{"score": 0.7, "reasoning": "it answers"}\n```'}
        if '"Root"' in p and "[1]" in p:  # the Alpha/Beta sibling set
            return {
                "response": '[{"index": 0, "score": 0.9, "reasoning": "likely"},'
                ' {"index": 1, "score": 0.1, "reasoning": "unlikely"}]'
            }
        return {"response": '[{"index": 0, "score": 0.8, "reasoning": "descend"}]'}

    tree = _search_tree(spark)
    provider = LLMProvider("ollama", transport=fake_tree_llm)

    llm_hits = reasoning_search(
        tree, ["beta"], id_col="doc_id", provider=provider, query="beta"
    ).collect()
    assert [r["sec_idx"] for r in llm_hits] == [4]  # LLM routed to AlphaLeaf
    assert llm_hits[0]["score"] == pytest.approx(0.7)  # leaf relevance score

    kw_hits = reasoning_search(tree, ["beta"], id_col="doc_id").collect()
    assert [r["sec_idx"] for r in kw_hits] == [3]  # keyword path picks Beta


def test_reasoning_search_llm_error_falls_back_to_keywords(spark):
    """A dead provider must degrade to the reference's keyword fallback
    inside the SAME call (per sibling set / per leaf), not throw."""
    from fusionspark.operators.tree import reasoning_search

    def broken(url, payload, headers):  # nested: shipped by value
        raise ConnectionError("llm down")

    tree = _search_tree(spark)
    provider = LLMProvider("ollama", transport=broken)
    hits = reasoning_search(
        tree, ["beta"], id_col="doc_id", provider=provider, query="beta"
    ).collect()
    assert [r["sec_idx"] for r in hits] == [3]  # same as the keyword path
