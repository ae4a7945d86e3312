"""Embedding providers — SURVEY §2.13 / V8 / V9.

The MockEmbedder is a bit-exact port of
/root/reference/src/embedders/providers.js:87-105 (djb2-style hash with JS
`| 0` int32 overflow, window substring, L2 normalize) — it is what makes
vector tests deterministic without a model.  Real providers (Ollama/OpenAI)
are HTTP clients in the reference (:54-85); here they are pluggable
batch functions behind the same mapInPandas wrapper, stubbed with
NotImplementedError since this environment has no network/model.

Scale design (V8, RAGPipeline's sequential embed loop → batch):
distinct-text first (dedup compute), Arrow-batched pandas transform on
executors, then broadcast-join the small embedding table back.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType

DIMENSIONS = 64  # MockEmbedder default (providers.js:89)


def _int32(x: int) -> int:
    """JS `| 0` semantics: wrap to signed 32-bit."""
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def mock_embed(text: str, dimensions: int = DIMENSIONS) -> list[float]:
    """Bit-exact MockEmbedder._embed (providers.js:91-104):

    per dimension i: h = 5381 + i folded over a 20-char window starting at
    floor(i/dim * len) via h = (h*33 + charCode) | 0; component =
    ((h % 2000) - 1000) / 1000 (JS % keeps sign); then L2-normalize.
    """
    text = text or ""
    vec = np.zeros(dimensions, dtype=np.float32)
    n = len(text)
    for i in range(dimensions):
        h = 5381 + i
        start = int(i / dimensions * n)
        w = text[start : start + 20]
        for ch in w:
            h = _int32(_int32(h << 5) + h + ord(ch))
        rem = h % 2000 if h >= 0 else -((-h) % 2000)  # JS remainder keeps sign
        vec[i] = np.float32((rem - 1000) / 1000)
    norm = float(np.sqrt(np.sum(vec.astype(np.float64) ** 2)))
    if norm > 0:
        vec = (vec.astype(np.float64) / norm).astype(np.float32)
    return [float(v) for v in vec]


EMBED_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_texts(
    texts: DataFrame,
    text_col: str = "text",
    dimensions: int = DIMENSIONS,
    embed_fn: Callable[[str, int], list[float]] = mock_embed,
) -> DataFrame:
    """V8: batched embedding of DISTINCT texts (compute-dedup, the Spark
    answer to the reference's memo-cache, providers.js:23-39)."""
    distinct = texts.select(F.col(text_col).alias("text")).distinct()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "text": pdf["text"],
                    "embedding": [embed_fn(t, dimensions) for t in pdf["text"]],
                }
            )

    return distinct.mapInPandas(run, schema=EMBED_SCHEMA)


def embed_documents(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach embeddings to documents via the distinct-text table (broadcast
    join back — embeddings table is |distinct texts|, not |rows|)."""
    emb = embed_texts(documents, text_col)
    return documents.join(
        F.broadcast(emb), documents[text_col] == emb["text"], "left"
    ).select(documents[id_col], emb["embedding"])


def ollama_embed(text: str, dimensions: int = DIMENSIONS) -> list[float]:
    """Real-provider stub (providers.js:54-66): HTTP embedding service.
    No network in this environment."""
    raise NotImplementedError("network embedding provider not available here")
