"""Framework integration adapters — SURVEY §2 integration surface.

Reference: /root/reference/src/integrations/langchain.js:35-198
(LangChain-compatible VectorStore/Retriever) and
/root/reference/src/integrations/ai-tools.js:42-175 (AI-SDK-style tool
definitions).  Both are duck-typed protocol adapters: no langchain / ai-sdk
import is required (or available here) — the classes implement the standard
method surface (add_texts / similarity_search / as_retriever;
name/description/inputSchema/execute) so they drop into either framework,
while every operation executes as the engine's DataFrame plans.
"""

from __future__ import annotations

import time
from typing import Any


class SparkVectorStore:
    """LangChain-style vector store over FusionSparkEngine
    (langchain.js:35-140)."""

    def __init__(self, engine, collection: str = "langchain_default", dimensions: int = 64):
        from fusionspark.engine import CollectionConfig

        self.engine = engine
        self.collection = collection
        if collection not in engine._catalog:
            engine.create_collection(collection, CollectionConfig(dimensions=dimensions))

    # LangChain Document ≈ {"page_content": str, "metadata": dict}

    def add_documents(self, documents: list[dict]) -> list[str]:
        ids, entries = [], []
        for i, doc in enumerate(documents):
            meta = dict(doc.get("metadata") or {})
            doc_id = meta.get("id") or f"doc_{int(time.time() * 1000)}_{i}"
            entries.append(
                {"id": doc_id, "content": doc["page_content"], "metadata": meta}
            )
            ids.append(doc_id)
        self.engine.insert(self.collection, entries)
        return ids

    def add_texts(self, texts: list[str], metadatas: list[dict] | None = None) -> list[str]:
        metadatas = metadatas or [{} for _ in texts]
        return self.add_documents(
            [{"page_content": t, "metadata": m} for t, m in zip(texts, metadatas)]
        )

    def similarity_search(self, query: str, k: int = 4, filter: dict | None = None) -> list[dict]:
        hits = self.engine.search(
            self.collection, query_text=query, top_k=k, metadata_filter=filter
        )
        return [self._to_document(h) for h in hits]

    def similarity_search_with_score(self, query: str, k: int = 4) -> list[tuple[dict, float]]:
        hits = self.engine.search(self.collection, query_text=query, top_k=k)
        return [(self._to_document(h), h["score"]) for h in hits]

    def _to_document(self, hit: dict) -> dict:
        row = self.engine.get(self.collection, hit["id"]) or {}
        meta = dict(row.get("metadata") or {})
        meta["score"] = hit["score"]
        return {"page_content": row.get("content") or "", "metadata": meta}

    def as_retriever(self, k: int = 4) -> "SparkRetriever":
        return SparkRetriever(self, k=k)

    @classmethod
    def from_texts(cls, texts: list[str], engine, collection: str = "langchain_default", **kw):
        store = cls(engine, collection, **kw)
        store.add_texts(texts)
        return store


class SparkRetriever:
    """LangChain-style retriever (langchain.js:150-198)."""

    def __init__(self, vector_store: SparkVectorStore, k: int = 4):
        self.vector_store = vector_store
        self.k = k

    def get_relevant_documents(self, query: str) -> list[dict]:
        return self.vector_store.similarity_search(query, k=self.k)

    invoke = get_relevant_documents  # modern LangChain retriever protocol


def ai_tools(engine) -> list[dict]:
    """AI-SDK-style tool definitions (ai-tools.js:42-175): each entry has
    name / description / inputSchema / execute, sharing the server's tool
    registry so the HTTP and in-process surfaces stay in lockstep."""
    from fusionspark.server import Router

    router = Router(engine)
    schemas: dict[str, dict] = {
        "fusionspark_create_collection": {
            "type": "object",
            "properties": {"name": {"type": "string"}, "dimensions": {"type": "number"}},
            "required": ["name"],
        },
        "fusionspark_list_collections": {"type": "object", "properties": {}},
        "fusionspark_search": {
            "type": "object",
            "properties": {
                "collection": {"type": "string"}, "query": {"type": "string"},
                "topK": {"type": "number"}, "filter": {"type": "object"},
                "tenantId": {"type": "string"},
            },
            "required": ["collection", "query"],
        },
        "fusionspark_hybrid_search": {
            "type": "object",
            "properties": {
                "collection": {"type": "string"}, "query": {"type": "string"},
                "topK": {"type": "number"},
            },
            "required": ["collection", "query"],
        },
        "fusionspark_rag_ingest": {
            "type": "object",
            "properties": {
                "text": {"type": "string"}, "collection": {"type": "string"},
                "docId": {"type": "string"},
            },
            "required": ["text"],
        },
        "fusionspark_rag_query": {
            "type": "object",
            "properties": {
                "query": {"type": "string"}, "maxTokens": {"type": "number"},
                "collection": {"type": "string"},
            },
            "required": ["query"],
        },
        "fusionspark_memory_remember": {
            "type": "object",
            "properties": {
                "agentId": {"type": "string"}, "content": {"type": "string"},
                "importance": {"type": "number"},
            },
            "required": ["agentId", "content"],
        },
        "fusionspark_memory_recall": {
            "type": "object",
            "properties": {
                "agentId": {"type": "string"}, "query": {"type": "string"},
                "topK": {"type": "number"},
            },
            "required": ["agentId", "query"],
        },
        "fusionspark_memory_forget": {
            "type": "object",
            "properties": {"agentId": {"type": "string"}, "type": {"type": "string"}},
            "required": ["agentId"],
        },
    }

    def make_execute(tool_name: str):
        def execute(args: dict) -> Any:
            out = router.call_tool(tool_name, args)
            if "error" in out:
                raise RuntimeError(out["error"])
            return out["result"]

        return execute

    manifest = {t["name"]: t["description"] for t in router.tool_manifest()["tools"]}
    return [
        {
            "name": name,
            "description": manifest.get(name, ""),
            "inputSchema": schema,
            "execute": make_execute(name),
        }
        for name, schema in schemas.items()
    ]
