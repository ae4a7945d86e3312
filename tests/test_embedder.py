"""Mock-embedder parity tests (reference providers.js:87-105): unit norm,
determinism, dimension, and byte-parity against the reference JS
implementation when available."""

from __future__ import annotations

import json
import math
import shutil
import subprocess

import pytest

from fusionspark.io import load_table
from fusionspark.operators.embedder import DIMENSIONS, embed_texts, mock_embed


def test_unit_norm_and_determinism():
    v1 = mock_embed("hello spark world")
    v2 = mock_embed("hello spark world")
    assert v1 == v2
    assert len(v1) == DIMENSIONS
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-6


def test_different_texts_differ():
    assert mock_embed("alpha") != mock_embed("beta")


def test_empty_text_deterministic_nonzero():
    """Empty text still hashes (h = 5381+i, empty window) → a fixed unit
    vector, exactly like the reference (providers.js:92-97)."""
    v = mock_embed("")
    assert v == mock_embed("")
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-6
    # first component: h=5381 → ((5381 % 2000) - 1000)/1000 = 0.381 pre-norm
    assert v[0] > 0


def test_spark_embed_distinct(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    out = embed_texts(d, "text").collect()
    assert len(out) == d.select("text").distinct().count()
    for r in out:
        assert len(r["embedding"]) == DIMENSIONS


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_node_parity(tmp_path):
    import os

    ref = "/root/reference/src/embedders/providers.js"
    if not os.path.exists(ref):
        pytest.skip("reference checkout unavailable")
    texts = ["hello world", "spark", "", "a", "the quick brown fox " * 10, "ünïcödé ✓"]
    script = tmp_path / "embed.js"
    script.write_text(
        """
const { MockEmbedder } = require('%s');
const texts = JSON.parse(require('fs').readFileSync(process.argv[2], 'utf8'));
(async () => {
  const e = new MockEmbedder({});
  const out = [];
  for (const t of texts) out.push(await e._embed(t));
  console.log(JSON.stringify(out));
})();
""" % ref
    )
    inp = tmp_path / "texts.json"
    inp.write_text(json.dumps(texts))
    res = subprocess.run(
        ["node", str(script), str(inp)], capture_output=True, text=True, check=True
    )
    expected = json.loads(res.stdout)
    for t, exp in zip(texts, expected):
        act = mock_embed(t)
        assert len(act) == len(exp)
        for a, b in zip(act, exp):
            assert abs(a - b) < 1e-6, f"mismatch for {t!r}"
