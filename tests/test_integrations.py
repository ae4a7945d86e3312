"""Integration adapters (LangChain-style store/retriever, AI-SDK tools),
tenant proxy, autosave snapshots."""

from __future__ import annotations

import json
import os

import pytest

from fusionspark.engine import CollectionConfig, FusionSparkEngine
from fusionspark.integrations import SparkVectorStore, ai_tools


@pytest.fixture()
def eng(spark, tmp_path):
    return FusionSparkEngine(spark, str(tmp_path / "int_store"))


def test_vector_store_roundtrip(eng):
    store = SparkVectorStore(eng, "docs", dimensions=64)
    ids = store.add_texts(
        ["the quick brown fox", "pack my box with jugs", "spark engines scale"],
        metadatas=[{"src": "a"}, {"src": "b"}, {"src": "c"}],
    )
    assert len(ids) == 3
    # the deterministic mock embedder is hash-based: identical text => identical
    # vector, so querying with a stored text must return it at rank 1
    docs = store.similarity_search("the quick brown fox", k=2)
    assert docs and docs[0]["page_content"] == "the quick brown fox"
    assert docs[0]["metadata"]["src"] == "a" and "score" in docs[0]["metadata"]

    scored = store.similarity_search_with_score("spark engines scale", k=1)
    assert scored[0][0]["page_content"] == "spark engines scale"
    assert isinstance(scored[0][1], float)

    retr = store.as_retriever(k=1)
    assert retr.invoke("pack my box with jugs")[0]["page_content"] == "pack my box with jugs"


def test_vector_store_from_texts(eng):
    store = SparkVectorStore.from_texts(["alpha beta", "gamma delta"], eng, "ft")
    assert len(store.similarity_search("alpha", k=2)) == 2


def test_ai_tools_execute(eng):
    tools = {t["name"]: t for t in ai_tools(eng)}
    assert "fusionspark_search" in tools
    for t in tools.values():
        assert t["inputSchema"]["type"] == "object" and t["description"]
    tools["fusionspark_create_collection"]["execute"]({"name": "tl", "dimensions": 8})
    out = tools["fusionspark_rag_ingest"]["execute"]({"text": "word " * 200})
    assert out["chunks"] >= 1
    with pytest.raises(RuntimeError):
        tools["fusionspark_search"]["execute"]({})  # missing required args


def test_tenant_proxy_isolation(eng):
    eng.create_collection("shared", CollectionConfig(dimensions=64))
    acme = eng.tenant("shared", "acme")
    globex = eng.tenant("shared", "globex")
    acme.insert([{"id": "a1", "content": "acme secret data"}])
    globex.insert([{"id": "g1", "content": "globex secret data"}])
    a_hits = acme.search(query_text="anything at all", top_k=5)
    g_hits = globex.search(query_text="anything at all", top_k=5)
    assert {h["id"] for h in a_hits} == {"a1"}
    assert {h["id"] for h in g_hits} == {"g1"}
    assert acme.get("g1") is None and acme.get("a1")["id"] == "a1"


def test_autosave_snapshot(eng, tmp_path):
    eng.create_collection("snap", CollectionConfig(dimensions=4))
    eng.insert("snap", [{"id": "s1", "vector": [1, 0, 0, 0]}])
    backup = str(tmp_path / "backups")
    handle = eng.autosave(backup, interval_s=3600)  # timer idle; snapshot manually
    dest = handle.snapshot()
    handle.stop()
    assert os.path.isfile(os.path.join(dest, "_catalog.json"))
    with open(os.path.join(dest, "_catalog.json")) as f:
        assert "snap" in json.load(f)
    assert any(p.startswith("collection=snap") for p in os.listdir(dest))
