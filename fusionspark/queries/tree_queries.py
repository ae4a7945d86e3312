"""Tree-index family (SURVEY §2.10 T4/T7/T10, §2.9 X3/X4/X11/X13) over a
deterministically constructed markdown corpus (the driver's documents are
flat word-salad, so structure is synthesized identically on both engines:
groups of 10 docs become one markdown doc with #/##/### headings)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusionspark.io import load_table
from fusionspark.operators import tree
from fusionspark.queries import query

# ── markdown corpus construction (both dialects) ──────────────────────────

MD_CORPUS_SQL = """
md_corpus AS (
    SELECT doc_id // 10 AS md_doc_id,
           string_agg(
               repeat('#', CASE WHEN doc_id % 10 = 0 THEN 1
                                ELSE 1 + (doc_id % 10) % 3 END)
               || ' Section ' || doc_id::VARCHAR || chr(10) || text,
               chr(10) ORDER BY doc_id) AS md_text
    FROM documents GROUP BY doc_id // 10
)
"""


def md_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    j = F.col("doc_id") % 10
    level = F.when(j == 0, F.lit(1)).otherwise((F.lit(1) + (j % 3)).cast("int"))
    d2 = d.withColumn("lvl", level).withColumn(
        "sec_text",
        F.concat(
            F.expr("repeat('#', lvl)"),
            F.lit(" Section "),
            F.col("doc_id").cast("string"),
            F.lit("\n"),
            F.col("text"),
        ),
    )
    return (
        d2.groupBy(F.expr("doc_id div 10").alias("md_doc_id"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "sec_text"))),
                    lambda s: s.getField("sec_text"),
                ),
            ).alias("md_text")
        )
    )


# DuckDB rebuild of parse_markdown_sections (tree.py): lines → headings →
# running section count → per-section aggregate.
MD_SECTIONS_SQL = f"""
WITH {MD_CORPUS_SQL.strip()},
split_t AS (
    SELECT md_doc_id, string_split(md_text, chr(10)) AS ls FROM md_corpus
),
idx_t AS (
    SELECT md_doc_id, ls, unnest(generate_series(1, len(ls))) AS pos FROM split_t
),
lines AS (
    SELECT md_doc_id, pos, ls[pos] AS line FROM idx_t
),
marked AS (
    SELECT md_doc_id, pos, line,
           length(regexp_extract(line, '^(#{{1,6}}) (.*)$', 1)) AS level,
           regexp_extract(line, '^(#{{1,6}}) (.*)$', 2) AS title
    FROM lines
),
seg AS (
    SELECT *, (SUM(CASE WHEN level > 0 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY md_doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING))::BIGINT AS sec_idx
    FROM marked
),
sections AS (
    SELECT md_doc_id, sec_idx,
           MAX(level) AS level,
           MAX(CASE WHEN level > 0 THEN title END) AS title,
           (COUNT(*) - 1)::BIGINT AS n_lines,
           MAX(CASE WHEN level = 0 THEN line END) AS content
    FROM seg WHERE sec_idx > 0
    GROUP BY md_doc_id, sec_idx
)
"""

_PLVL = ",\n           ".join(
    f"last_value(CASE WHEN level = {lv} THEN sec_idx END IGNORE NULLS)"
    f" OVER (PARTITION BY md_doc_id ORDER BY sec_idx"
    f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p{lv}"
    for lv in range(1, 7)
)

_PARENT_CASE = "CASE " + " ".join(
    f"WHEN level = {lv} THEN greatest("
    + ", ".join(f"p{j}" for j in range(1, lv))
    + ")"
    for lv in range(2, 7)
) + " END"

TREE_SQL = f"""
{MD_SECTIONS_SQL},
withp AS (
    SELECT md_doc_id, sec_idx, level, title, n_lines, content,
           {_PLVL}
    FROM sections
),
tree_t AS (
    SELECT md_doc_id, sec_idx, level, title, n_lines, content,
           COALESCE({_PARENT_CASE}, 0)::BIGINT AS parent_idx
    FROM withp
)
"""


@query(
    "md_sections",
    f"{MD_SECTIONS_SQL}\n"
    "SELECT md_doc_id, sec_idx, level, title, n_lines FROM sections",
)
def md_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/X3: markdown heading parse → flat sections
    (TreeIndex.js:305-348)."""
    df = tree.parse_markdown_sections(md_corpus_df(spark, sf_dir))
    return df.select("md_doc_id", F.col("sec_idx").cast("long").alias("sec_idx"), F.col("level").cast("long").alias("level"), "title", F.col("n_lines").cast("long").alias("n_lines"))


@query(
    "tree_parents",
    f"{TREE_SQL}\n"
    "SELECT md_doc_id, sec_idx, level, parent_idx FROM tree_t",
)
def tree_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: stack-free parent assignment (nearest preceding smaller level;
    TreeIndex.js:457-498)."""
    df = tree.build_tree(tree.parse_markdown_sections(md_corpus_df(spark, sf_dir)))
    return df.select("md_doc_id", F.col("sec_idx").cast("long").alias("sec_idx"), F.col("level").cast("long").alias("level"), F.col("parent_idx").cast("long").alias("parent_idx"))


@query(
    "tree_leaves",
    f"{TREE_SQL}\n"
    """
    SELECT t.md_doc_id, t.sec_idx, t.level FROM tree_t t
    ANTI JOIN (SELECT DISTINCT md_doc_id, parent_idx FROM tree_t) p
      ON t.md_doc_id = p.md_doc_id AND t.sec_idx = p.parent_idx
    """,
)
def tree_leaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: leaves = nodes never referenced as parent (anti-join;
    TreeIndex.js:699-707)."""
    t = tree.build_tree(tree.parse_markdown_sections(md_corpus_df(spark, sf_dir)))
    return tree.leaves(t).select("md_doc_id", F.col("sec_idx").cast("long").alias("sec_idx"), F.col("level").cast("long").alias("level"))


@query(
    "citation_paths",
    f"{TREE_SQL}\n"
    """
    SELECT c.md_doc_id, c.sec_idx,
           concat_ws(' > ', 'Doc ' || c.md_doc_id::VARCHAR,
                     gp.title, p.title, c.title) AS citation
    FROM tree_t c
    LEFT JOIN tree_t p  ON c.md_doc_id = p.md_doc_id AND c.parent_idx = p.sec_idx
    LEFT JOIN tree_t gp ON p.md_doc_id = gp.md_doc_id AND p.parent_idx = gp.sec_idx
    """,
)
def citation_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: citation path join root > ... > node (TreeIndex.js:710-715);
    concat_ws skips the missing ancestors for shallow nodes."""
    t = tree.build_tree(tree.parse_markdown_sections(md_corpus_df(spark, sf_dir)))
    c, p, gp = t.alias("c"), t.alias("p"), t.alias("gp")
    joined = c.join(
        p,
        (F.col("c.md_doc_id") == F.col("p.md_doc_id"))
        & (F.col("c.parent_idx") == F.col("p.sec_idx")),
        "left",
    ).join(
        gp,
        (F.col("p.md_doc_id") == F.col("gp.md_doc_id"))
        & (F.col("p.parent_idx") == F.col("gp.sec_idx")),
        "left",
    )
    return joined.select(
        F.col("c.md_doc_id").alias("md_doc_id"),
        F.col("c.sec_idx").cast("long").alias("sec_idx"),
        F.concat_ws(
            " > ",
            F.concat(F.lit("Doc "), F.col("c.md_doc_id").cast("string")),
            F.col("gp.title"),
            F.col("p.title"),
            F.col("c.title"),
        ).alias("citation"),
    )


@query(
    "html_strip",
    """
    SELECT doc_id,
           length(regexp_replace('<h1>Doc ' || doc_id::VARCHAR || '</h1><p>' || text || '</p>',
                                 '<[^>]*>', ' ', 'g'))::BIGINT AS strip_len
    FROM documents
    """,
)
def html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/T5: HTML tag strip (TreeIndex.js:443-445) over constructed HTML."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<h1>Doc "), F.col("doc_id").cast("string"), F.lit("</h1><p>"),
        F.col("text"), F.lit("</p>"),
    )
    return d.select(
        "doc_id", F.length(tree.strip_html(html)).cast("long").alias("strip_len")
    )


_SENT_SQL = """
sent_corpus AS (
    SELECT doc_id,
           'the ' || w[1] || ' ' || w[2] || ' is ' || w[3] || ' ' || w[4]
           || '. the ' || w[5] || ' ' || w[6] || ' covers ' || w[7] || ' ' || w[8] || '.'
           AS stext
    FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
          FROM documents)
    WHERE len(w) >= 8
)
"""

_M1 = r"(.{3,30})\s+(?:is|are|was|were)\s+(.{3,50})"
_M2 = r"(.{3,30})\s+(covers|requires|includes|contains|provides|manages)\s+(.{3,50})"


@query(
    "triples_extract",
    f"""
    WITH {_SENT_SQL.strip()},
    sentences AS (
        SELECT doc_id, trim(s) AS s FROM (
            SELECT doc_id, unnest(string_split_regex(stext, '[.!?]+')) AS s
            FROM sent_corpus
        ) WHERE length(trim(s)) > 10
    ),
    m1 AS (
        SELECT doc_id,
               trim(regexp_extract(s, '{_M1}', 1)) AS subject,
               'is' AS predicate,
               substr(trim(regexp_extract(s, '{_M1}', 2)), 1, 50) AS object
        FROM sentences WHERE regexp_matches(s, '{_M1}')
    ),
    m2 AS (
        SELECT doc_id,
               trim(regexp_extract(s, '{_M2}', 1)) AS subject,
               trim(regexp_extract(s, '{_M2}', 2)) AS predicate,
               substr(trim(regexp_extract(s, '{_M2}', 3)), 1, 50) AS object
        FROM sentences WHERE regexp_matches(s, '{_M2}')
    )
    SELECT * FROM m1 UNION ALL SELECT * FROM m2
    """,
)
def triples_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: regex triple extraction over sentences
    (RecursiveLearningEngine.js:803-813) on a constructed sentence corpus."""
    d = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    stext = F.concat(
        F.lit("the "), F.element_at(w, 1), F.lit(" "), F.element_at(w, 2),
        F.lit(" is "), F.element_at(w, 3), F.lit(" "), F.element_at(w, 4),
        F.lit(". the "), F.element_at(w, 5), F.lit(" "), F.element_at(w, 6),
        F.lit(" covers "), F.element_at(w, 7), F.lit(" "), F.element_at(w, 8),
        F.lit("."),
    )
    corpus = d.withColumn("w", w).filter(F.size("w") >= 8).select("doc_id", stext.alias("stext"))
    sentences = (
        corpus.select("doc_id", F.explode(F.split("stext", r"[.!?]+")).alias("s"))
        .withColumn("s", F.trim("s"))
        .filter(F.length("s") > 10)
    )
    m1 = (
        sentences.filter(F.col("s").rlike(_M1))
        .select(
            "doc_id",
            F.trim(F.regexp_extract("s", _M1, 1)).alias("subject"),
            F.lit("is").alias("predicate"),
            F.substring(F.trim(F.regexp_extract("s", _M1, 2)), 1, 50).alias("object"),
        )
    )
    m2 = (
        sentences.filter(F.col("s").rlike(_M2))
        .select(
            "doc_id",
            F.trim(F.regexp_extract("s", _M2, 1)).alias("subject"),
            F.trim(F.regexp_extract("s", _M2, 2)).alias("predicate"),
            F.substring(F.trim(F.regexp_extract("s", _M2, 3)), 1, 50).alias("object"),
        )
    )
    return m1.unionByName(m2)


# ── T9: reasoning tree search (deterministic fallback scorer) ─────────────

from fusionspark.queries.text_queries import QUERY as _RQUERY, _TERMS as _RTERMS  # noqa: E402

_SCORE_SQL = (
    "("
    + " + ".join(
        f"CASE WHEN contains(lower(concat_ws(' ', title, content)), '{t}') THEN 1 ELSE 0 END"
        for t in _RTERMS
    )
    + f")::DOUBLE / {len(_RTERMS)}"
)


@query(
    "tree_reasoning_search",
    f"{TREE_SQL},\n"
    f"""
    scored AS (
        SELECT md_doc_id, sec_idx, level, parent_idx, {_SCORE_SQL} AS score
        FROM tree_t
    ),
    lv AS (
        SELECT s.* FROM scored s
        ANTI JOIN (SELECT DISTINCT md_doc_id, parent_idx FROM scored) p
          ON s.md_doc_id = p.md_doc_id AND s.sec_idx = p.parent_idx
    )
    SELECT md_doc_id, sec_idx, level, ROUND(score, 6) AS score FROM (
        SELECT l.md_doc_id, l.sec_idx, l.level, l.score
        FROM lv l
        LEFT JOIN scored p  ON l.md_doc_id = p.md_doc_id AND l.parent_idx = p.sec_idx
        LEFT JOIN scored gp ON p.md_doc_id = gp.md_doc_id AND p.parent_idx = gp.sec_idx
        WHERE l.score >= 0.3
          AND (l.parent_idx = 0 OR (p.score >= 0.3
               AND (p.parent_idx = 0 OR gp.score >= 0.3)))
        ORDER BY l.score DESC, l.md_doc_id ASC, l.sec_idx ASC LIMIT 10
    )
    """,
)
def tree_reasoning_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: LLM-guided DFS with deterministic keyword fallback
    (TreeIndex.js:543-659,685-696) as a bounded frontier-join loop: a leaf
    is retrieved iff it and every ancestor score ≥ minRelevance=0.3."""
    t = tree.build_tree(tree.parse_markdown_sections(md_corpus_df(spark, sf_dir)))
    out = tree.reasoning_search(t, _RTERMS, max_results=10, min_relevance=0.3)
    return out.select(
        "md_doc_id",
        F.col("sec_idx").cast("long").alias("sec_idx"),
        F.col("level").cast("long").alias("level"),
        F.round("score", 6).alias("score"),
    )


# ── HTML section parsing (T5) ─────────────────────────────────────────────
# HTML corpus constructed identically on both engines: every doc gets an
# <h1>; doc_id%3<>0 adds an <h2> with inner tags in the title; doc_id%4=0
# adds an <h3>; doc_id%7=0 has NO headings at all (exercises the
# 'Document' fallback).  The oracle is the closed form of the reference
# parser (TreeIndex.js:351-393) over this corpus; the Spark side runs the
# generic regex parser + build_tree, so equality validates the parser.

_HTML_STRIP = "trim(regexp_replace(regexp_replace({x}, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"

HTML_SECTIONS_ORACLE = f"""
WITH base AS (
    SELECT doc_id, text, lang, source,
           doc_id % 7 = 0 AS plain,
           doc_id % 3 <> 0 AS has2,
           doc_id % 4 = 0 AS has3
    FROM documents
),
secs AS (
    -- no-heading fallback: single 'Document' section
    SELECT doc_id, 1::BIGINT AS sec_idx, 1 AS level, 'Document' AS title,
           {_HTML_STRIP.format(x="'<span>' || text || '</span>'")} AS content,
           0::BIGINT AS parent_idx
    FROM base WHERE plain
    UNION ALL
    SELECT doc_id, 1::BIGINT, 1, 'Doc ' || doc_id::VARCHAR,
           {_HTML_STRIP.format(x="'<p>' || text || '</p>'")},
           0::BIGINT
    FROM base WHERE NOT plain
    UNION ALL
    SELECT doc_id, 2::BIGINT, 2,
           trim(regexp_replace('Part <b>' || lang || '</b>', '<[^>]*>', '', 'g')),
           {_HTML_STRIP.format(x="'<div>' || source || ' details</div>'")},
           1::BIGINT
    FROM base WHERE NOT plain AND has2
    UNION ALL
    SELECT doc_id, (CASE WHEN has2 THEN 3 ELSE 2 END)::BIGINT, 3, 'Notes',
           'final notes',
           (CASE WHEN has2 THEN 2 ELSE 1 END)::BIGINT
    FROM base WHERE NOT plain AND has3
)
SELECT doc_id, sec_idx, level::BIGINT AS level, title, content, parent_idx
FROM secs
"""


@query("html_sections", HTML_SECTIONS_ORACLE)
def html_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: <h1-6> section extraction (TreeIndex.js:351-393) through the
    generic regex parser, then T7 parent assignment via the SAME build_tree
    the markdown path uses."""
    d = load_table(spark, sf_dir, "documents")
    html = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("<span>"), F.col("text"), F.lit("</span>")),
    ).otherwise(
        F.concat(
            F.lit('<h1 id="d">Doc '), F.col("doc_id").cast("string"), F.lit("</h1><p>"),
            F.col("text"), F.lit("</p>"),
            F.when(
                F.col("doc_id") % 3 != 0,
                F.concat(
                    F.lit("<h2>Part <b>"), F.col("lang"), F.lit("</b></h2><div>"),
                    F.col("source"), F.lit(" details</div>"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 4 == 0, F.lit("<h3>Notes</h3>final notes")).otherwise(F.lit("")),
        )
    )
    secs = tree.parse_html_sections(d.select("doc_id", html.alias("html")), id_col="doc_id")
    t = tree.build_tree(secs, id_col="doc_id")
    return t.select(
        "doc_id",
        F.col("sec_idx").cast("long").alias("sec_idx"),
        F.col("level").cast("long").alias("level"),
        "title",
        "content",
        F.col("parent_idx").cast("long").alias("parent_idx"),
    )
