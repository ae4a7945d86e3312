"""Hierarchical document (tree) index operators — SURVEY §2.10 T4-T10,
§2.9 X3/X4/X11.

Reference: /root/reference/src/index/TreeIndex.js — recursive JS structures
built by a stack parser (:457-498), searched by LLM-guided DFS (:543-659)
with a deterministic keyword fallback (:685-696).

Spark re-expression: documents → exploded lines → heading detection
(regexp) → section segmentation (conditional running count — a window
cumsum) → per-section groupBy → parent assignment via per-level
last-ignoring-nulls windows (no recursion; heading depth ≤ 6 bounds the
static expansion).  The nodes table carries a materialized `path` array
(X11 citation = concat_ws(' > ', path)), replacing pointer traversal with
column lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LEVEL = 6  # markdown heading depth bound (TreeIndex.js:312)


def parse_markdown_sections(
    docs: DataFrame, id_col: str = "md_doc_id", text_col: str = "md_text"
) -> DataFrame:
    """T4/X3: split into lines, detect `#{1,6} ` headings, segment content to
    the preceding heading (TreeIndex.js:305-348).

    Returns (id, sec_idx, level, title, n_lines, content) — sec_idx is the
    1-based heading order; lines before any heading are dropped exactly like
    the reference's parser (it only emits sections on heading boundaries).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    heading = F.regexp_extract("line", r"^(#{1,6}) (.*)$", 1)
    title = F.regexp_extract("line", r"^(#{1,6}) (.*)$", 2)
    marked = lines.select(
        id_col,
        "pos",
        "line",
        F.length(heading).alias("level"),
        title.alias("title"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    seg = marked.withColumn(
        "sec_idx", F.sum(F.when(F.col("level") > 0, 1).otherwise(0)).over(w)
    ).filter(F.col("sec_idx") > 0)
    return (
        seg.groupBy(id_col, "sec_idx")
        .agg(
            F.max("level").alias("level"),
            F.max(F.when(F.col("level") > 0, F.col("title"))).alias("title"),
            (F.count("*") - 1).alias("n_lines"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("level") == 0, F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
            ).alias("content"),
        )
    )


def build_tree(sections: DataFrame, id_col: str = "md_doc_id") -> DataFrame:
    """T7: parent assignment — nearest preceding section with a smaller
    level (the reference's stack walk, TreeIndex.js:457-498) — via
    last(...ignorenulls) windows per candidate level; root sections get
    parent 0 (the document node).

    Also materializes the citation path titles (X11) for levels 1-3.
    """
    w = Window.partitionBy(id_col).orderBy("sec_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    df = sections
    for lv in range(1, MAX_LEVEL + 1):
        df = df.withColumn(
            f"_p{lv}",
            F.last(
                F.when(F.col("level") == lv, F.col("sec_idx")), ignorenulls=True
            ).over(w),
        )
    parent = F.lit(None).cast("long")
    # nearest preceding smaller-level section = max of the last positions
    # over levels strictly below this one
    for lv in range(2, MAX_LEVEL + 1):
        cands = [F.col(f"_p{j}") for j in range(1, lv)]
        best = F.greatest(*cands) if len(cands) > 1 else cands[0]
        parent = F.when(F.col("level") == lv, best).otherwise(parent)
    out = df.withColumn("parent_idx", F.coalesce(parent, F.lit(0)))
    return out.drop(*[f"_p{lv}" for lv in range(1, MAX_LEVEL + 1)])


def leaves(tree: DataFrame, id_col: str = "md_doc_id") -> DataFrame:
    """T10: leaf nodes = sections no other section claims as parent
    (TreeIndex.js:699-707) — an anti-join, no recursion."""
    parents = tree.select(
        F.col(id_col), F.col("parent_idx").alias("sec_idx")
    ).distinct()
    return tree.join(parents, [id_col, "sec_idx"], "left_anti")


def strip_html(col: F.Column) -> F.Column:
    """X4 (TreeIndex.js:443-445)."""
    return F.regexp_replace(col, "<[^>]*>", " ")


#: the reference's heading matcher (TreeIndex.js:353): case-insensitive,
#: non-greedy inner, closing tag level NOT required to match the opener.
HTML_HEADING_RE = "(?i)<h([1-6])[^>]*>(.*?)</h[1-6]>"


def _html_clean(col: F.Column) -> F.Column:
    """_stripHTML (TreeIndex.js:443-445): tags → space, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(strip_html(col), r"\s+", " "))


def parse_html_sections(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "html"
) -> DataFrame:
    """T5: HTML `<h1-6>` section extraction (TreeIndex.js:351-393).

    Each heading starts a section; its content is the stripped HTML between
    the end of its tag and the next heading (or end of document); the title
    is the heading's inner HTML with tags removed, trimmed.  A document
    with no headings becomes one level-1 'Document' section.  All column
    expressions: regexp_extract_all for (level, title), a regex split for
    the between-heading segments (limit -1 keeps trailing empties), one
    posexplode.  Output (id, sec_idx, level, title, content) drops straight
    into build_tree / leaves like the markdown parser."""
    src = docs.select(F.col(id_col), F.col(text_col).alias("_html"))
    lvls = F.regexp_extract_all(F.col("_html"), F.lit(HTML_HEADING_RE), 1)
    tts = F.regexp_extract_all(F.col("_html"), F.lit(HTML_HEADING_RE), 2)
    segs = F.split(F.col("_html"), HTML_HEADING_RE, -1)
    n = F.size(lvls)
    entries = F.when(
        n == 0,
        F.array(
            F.struct(
                F.lit(1).alias("level"),
                F.lit("Document").alias("title"),
                _html_clean(F.col("_html")).alias("content"),
            )
        ),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.element_at(lvls, i).cast("int").alias("level"),
                F.trim(
                    F.regexp_replace(F.element_at(tts, i), "<[^>]*>", "")
                ).alias("title"),
                _html_clean(F.element_at(segs, i + 1)).alias("content"),
            ),
        )
    )
    return src.select(
        F.col(id_col), F.posexplode(entries).alias("pos", "s")
    ).select(
        id_col,
        (F.col("pos") + 1).cast("long").alias("sec_idx"),
        F.col("s.level").cast("int").alias("level"),
        F.col("s.title").alias("title"),
        F.col("s.content").alias("content"),
    )


def _llm_json(resp: str):
    """Parse an LLM JSON response the way the reference does
    (TreeIndex.js:615): strip markdown fences, then json.loads."""
    import json
    import re

    return json.loads(re.sub(r"```json?|```", "", resp).strip())


def _keyword_rel(title, summary, content, terms: list[str]) -> float:
    """_keywordRelevance (TreeIndex.js:685-696): fraction of query terms
    contained in lower(title + summary + content)."""
    if not terms:
        return 0.0
    text = f"{title or ''} {summary or ''} {content or ''}".lower()
    return sum(1 for t in terms if t in text) / len(terms)


def llm_child_scores(
    tree_df: DataFrame,
    query: str,
    provider,
    id_col: str = "md_doc_id",
) -> DataFrame:
    """_evaluateChildren (TreeIndex.js:622-659), distributed: ONE prompt per
    parent listing its children as `[i] "title" - summary`, parsed into
    per-child explore scores.  Grouping by (doc, parent) via applyInPandas
    keeps every sibling set in one Arrow batch — the same prompt unit as
    the reference, but parents are evaluated in parallel across executors.

    Children the LLM omits from its response get -1 (never explored —
    `filter(item => item.nodeId)` in the reference); a failed call falls
    back to the reference's keyword relevance for that sibling set.
    Expects a `_summary` column (may be all-null → '(no summary)').
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.types import DoubleType, StructField, StructType

    terms = [t for t in (query or "").lower().split() if len(t) > 2]
    ptitles = tree_df.select(
        F.col(id_col), F.col("sec_idx").alias("parent_idx"),
        F.col("title").alias("_ptitle"),
    )
    kids = tree_df.join(ptitles, [id_col, "parent_idx"], "left")
    out_schema = StructType(
        [tree_df.schema[id_col], tree_df.schema["sec_idx"],
         StructField("explore_score", DoubleType())]
    )

    def eval_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sec_idx").reset_index(drop=True)
        ptitle = pdf["_ptitle"].iloc[0]
        ptitle = ptitle if isinstance(ptitle, str) and ptitle else "Document"
        descs = "\n".join(
            f'[{i}] "{t}" - {s if isinstance(s, str) and s else "(no summary)"}'
            for i, (t, s) in enumerate(zip(pdf["title"], pdf["_summary"]))
        )
        scores: dict[int, float] | None = None
        try:
            resp = provider.complete(
                f'Given the query: "{query}"\n\n'
                f'This document section "{ptitle}" has the following subsections:\n'
                f"{descs}\n\n"
                "Which subsections are most likely to contain the answer? \n"
                "Respond with ONLY a JSON array (no markdown):\n"
                '[{"index": <number>, "score": <0.0-1.0>, "reasoning": "<brief>"}]',
                max_tokens=300,
            )
            scores = {}
            for item in _llm_json(resp):
                i = item.get("index")
                if isinstance(i, int) and 0 <= i < len(pdf):
                    scores[int(pdf["sec_idx"].iloc[i])] = float(item["score"])
        except Exception:  # noqa: BLE001 — provider down → keyword fallback
            scores = None
        if scores is None:
            scores = {
                int(r["sec_idx"]): _keyword_rel(r["title"], r["_summary"], r["content"], terms)
                for _, r in pdf.iterrows()
            }
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "sec_idx": pdf["sec_idx"],
                # omitted children get -1, never ≥ minRelevance (NaN would
                # compare as +inf in Spark predicates — explicit sentinel)
                "explore_score": [scores.get(int(s), -1.0) for s in pdf["sec_idx"]],
            }
        )

    return kids.groupBy(id_col, "parent_idx").applyInPandas(eval_group, schema=out_schema)


def llm_leaf_relevance(
    leaf_df: DataFrame,
    query: str,
    provider,
    id_col: str = "md_doc_id",
) -> DataFrame:
    """_evaluateRelevance (TreeIndex.js:601-620), Arrow-batched: per leaf a
    title + 1500-char content-preview prompt, parsed `{"score": ...}`;
    errors fall back to keyword relevance.  Expects `_summary` (for the
    fallback text, like the reference)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.types import DoubleType, StructField, StructType

    terms = [t for t in (query or "").lower().split() if len(t) > 2]
    out_schema = StructType(
        [leaf_df.schema[id_col], leaf_df.schema["sec_idx"],
         StructField("rel_score", DoubleType())]
    )

    def run(batches):
        for pdf in batches:
            scores = []
            for t, c, s in zip(pdf["title"], pdf["content"], pdf["_summary"]):
                try:
                    resp = provider.complete(
                        f'Given the query: "{query}"\n\n'
                        "Evaluate the relevance of this document section:\n"
                        f"Title: {t}\n"
                        f"Content preview: {(c or '')[:1500]}\n\n"
                        "Respond with ONLY a JSON object (no markdown):\n"
                        '{"score": <0.0-1.0>, "reasoning": "<brief explanation>"}',
                        max_tokens=100,
                    )
                    scores.append(float(_llm_json(resp)["score"]))
                except Exception:  # noqa: BLE001
                    scores.append(_keyword_rel(t, s, c, terms))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sec_idx": pdf["sec_idx"], "rel_score": scores}
            )

    return leaf_df.select(id_col, "sec_idx", "title", "content", "_summary").mapInPandas(
        run, schema=out_schema
    )


def reasoning_search(
    tree_df: DataFrame,
    terms: list[str],
    max_results: int = 10,
    min_relevance: float = 0.3,
    max_depth: int = 5,
    id_col: str = "md_doc_id",
    provider=None,
    query: str | None = None,
    summary_col: str | None = None,
) -> DataFrame:
    """T9: reasoning tree search (TreeIndex.js:543-659).

    The reference does an LLM-guided DFS: `_evaluateChildren` scores each
    branch's children and descent follows scores ≥ minRelevance; leaves are
    then `_evaluateRelevance`-scored to decide retrieval.  Its no-LLM
    fallback scores nodes by keyword overlap (TreeIndex.js:685-696).

    With `provider=None` (default, the oracle-attested path) the
    deterministic keyword scorer gates descent AND retrieval — exactly the
    reference's fallback mode.  With an `LLMProvider` (operators/llm.py),
    descent scores come from per-parent `_evaluateChildren` prompts
    (llm_child_scores) and retrieval scores from per-leaf
    `_evaluateRelevance` prompts (llm_leaf_relevance) — both Arrow-batched
    on the executors, with the reference's keyword fallback on any
    provider error.  `query` defaults to ' '.join(terms); `summary_col`
    names an optional node-summary column (bottom_up_summaries output)
    used in child descriptions and fallbacks.

    Distributed re-expression: an iterative FRONTIER JOIN per level (depth
    is bounded by maxDepth=5, so ≤5 jobs, no recursion): a node is explored
    iff every ancestor scored ≥ minRelevance; qualifying leaves are
    results, globally top-k'd.  Unlike the reference's sequential DFS
    early-exit (which can miss high-scoring leaves behind later siblings),
    this explores all qualifying branches — strictly better recall,
    deterministic (documented semantic delta, same spirit as SURVEY V7).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from fusionspark.functions.text import keyword_overlap

    tree_df = tree_df.withColumn(
        "_summary",
        F.col(summary_col) if summary_col else F.lit(None).cast("string"),
    )
    if provider is not None:
        explore = llm_child_scores(tree_df, query or " ".join(terms), provider, id_col)
        scored = tree_df.join(explore, [id_col, "sec_idx"], "left").withColumn(
            "score", F.coalesce(F.col("explore_score"), F.lit(-1.0))
        )
    else:
        terms_col = F.array(*[F.lit(t) for t in terms])
        scored = tree_df.withColumn(
            "score",
            keyword_overlap(F.concat_ws(" ", F.col("title"), F.col("content")), terms_col),
        )
    # leaves = nodes never referenced as parent
    parents = scored.select(F.col(id_col), F.col("parent_idx").alias("sec_idx")).distinct()
    is_leaf = scored.join(parents, [id_col, "sec_idx"], "left_anti").select(
        id_col, "sec_idx"
    ).withColumn("is_leaf", F.lit(True))
    scored = scored.join(is_leaf, [id_col, "sec_idx"], "left").na.fill({"is_leaf": False})

    qualifying = scored.filter(F.col("score") >= min_relevance)
    frontier = qualifying.filter(F.col("parent_idx") == 0)
    results = frontier.filter(F.col("is_leaf"))
    for _ in range(max_depth - 1):
        children = qualifying.join(
            frontier.select(F.col(id_col), F.col("sec_idx").alias("parent_idx")).distinct(),
            [id_col, "parent_idx"],
        )
        new_results = children.filter(F.col("is_leaf"))
        results = results.unionByName(new_results)
        frontier = children.filter(~F.col("is_leaf"))
        # depth bound makes this a fixed, small number of joins; an empty
        # frontier simply yields empty joins for the remaining iterations
    if provider is not None:
        # reachable leaves get the reference's second gate: their OWN
        # _evaluateRelevance score decides retrieval and final ranking
        rel = llm_leaf_relevance(results, query or " ".join(terms), provider, id_col)
        results = (
            results.join(rel, [id_col, "sec_idx"])
            .filter(F.col("rel_score") >= min_relevance)
            .withColumn("score", F.col("rel_score"))
        )
    return (
        results.orderBy(F.col("score").desc(), F.col(id_col).asc(), F.col("sec_idx").asc())
        .limit(max_results)
        .select(id_col, "sec_idx", "level", "score")
    )
