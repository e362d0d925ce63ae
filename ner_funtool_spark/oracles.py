"""DuckDB oracle SQL builders.

Each builder returns ANSI SQL (DuckDB dialect) computing the same
result as the corresponding Spark query in ``__spark_entry__.py``, from
the driver's pre-registered views (documents, embeddings, lineitem, …).
SQL is generated from the SAME constants the Spark operators use
(config.DOC_*_WORDS, tagger.MAX_LEN) so the two sides cannot drift.

Why this is a valid oracle for a CRF pipeline: the rules decoder uses
hard BMES-constraint transitions + class emissions, and
tests/test_crf.py proves its Viterbi output equals the maximal-run
BMES labeling — which is exactly the window-function formulation below.
"""

from __future__ import annotations

from .config import DOC_OBJ_WORDS, DOC_OP_WORDS
from .operators.tagger import MAX_LEN


def _inlist(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def doc_mentions_cte(max_len: int = MAX_LEN) -> str:
    """CTE chain: documents -> (repo, path, sent_id, mbegin, mend, text, etype).

    Mirrors segment_lines (one line per doc: no newlines in the corpus)
    + tokenize_batch truncation + doc_token_classes + the constrained
    Viterbi/maximal-run span assembly + char-offset mention extraction.
    """
    return f"""
toks AS (
    SELECT doc_id, source, text AS doc_text,
           generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS tok
    FROM (SELECT *, list_slice(string_split(text, ' '), 1, {max_len}) AS l
          FROM documents)
),
classed AS (
    SELECT *,
           CASE WHEN tok IN ({_inlist(DOC_OP_WORDS)}) THEN 'op'
                WHEN tok IN ({_inlist(DOC_OBJ_WORDS)}) THEN 'obj'
                ELSE NULL END AS cls,
           (COALESCE(SUM(length(tok)) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + pos)::INT AS tok_begin
    FROM toks
),
runs AS (
    SELECT *,
           CASE WHEN cls IS DISTINCT FROM lag(cls) OVER (
                    PARTITION BY doc_id ORDER BY pos)
                THEN 1 ELSE 0 END AS brk
    FROM classed
),
grp AS (
    SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
    FROM runs
),
mention_rows AS (
    SELECT source AS repo,
           'docs/' || doc_id || '.txt' AS path,
           0::BIGINT AS sent_id,
           MIN(tok_begin)::INT AS mbegin,
           MAX(tok_begin + length(tok))::INT AS mend,
           string_agg(tok, ' ' ORDER BY pos) AS text,
           cls AS etype
    FROM grp
    WHERE cls IS NOT NULL
    GROUP BY doc_id, source, gid, cls
)"""


def doc_mentions_sql() -> str:
    return f"WITH {doc_mentions_cte()} SELECT * FROM mention_rows"


def doc_triples_sql() -> str:
    """Full flagship oracle: mention triples UNION ALL CONTAINS rows."""
    return f"""
WITH {doc_mentions_cte()},
doc_sha AS (
    SELECT 'docs/' || doc_id || '.txt' AS path, source AS repo,
           sha256(text) AS content_sha
    FROM documents
)
SELECT m.repo || '/' || m.path AS subj,
       CASE m.etype WHEN 'op' THEN 'MENTIONS_OP' ELSE 'MENTIONS_OBJ' END AS pred,
       m.text AS obj,
       m.repo AS repo,
       d.content_sha AS content_sha
FROM mention_rows m JOIN doc_sha d ON m.path = d.path AND m.repo = d.repo
UNION ALL
SELECT repo AS subj, 'CONTAINS' AS pred, repo || '/' || path AS obj,
       repo, content_sha
FROM doc_sha
"""
