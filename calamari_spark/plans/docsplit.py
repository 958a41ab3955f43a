"""THE deterministic 8-words-per-line document split, shared by every
query that renders documents into synthetic line-oriented containers
(PDF: textplans.q_pdf_extract; PAGE-XML/Abbyy: containerplans) or
consumes the same split as "lines" (pipelineplans.q_repetition_stats).

One Catalyst expression and one DuckDB CTE fragment — previously three
hand-kept copies whose comments promised they stay identical; now a
change to the split (the ceil/len expression, the word slice bounds)
lands everywhere or nowhere."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORDS_PER_LINE = 8


def lines_col(w: Column, n: int = WORDS_PER_LINE) -> Column:
    """Array of space-joined n-word lines from word-array column ``w``
    (empty array for an empty word array)."""
    n_lines = F.ceil(F.size(w) / F.lit(n)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * n + 1, n)),
    )


def lines_cte(reg_sql: str, n: int = WORDS_PER_LINE, where: str = "") -> str:
    """DuckDB fragment producing (doc_id, line_no, line) — the exact
    mirror of lines_col over ``string_split(reg_sql, ' ')``. ``where``
    optionally filters the documents scan (e.g. the containers' empty-doc
    exclusion)."""
    w_clause = f"WHERE {where}" if where else ""
    return f"""
  SELECT doc_id, CAST(u.i AS INT) AS line_no,
         array_to_string(
           w[(CAST(u.i AS BIGINT)*{n}+1):(CAST(u.i AS BIGINT)*{n}+{n})],
           ' ') AS line
  FROM (SELECT doc_id, string_split({reg_sql}, ' ') AS w
        FROM documents {w_clause}),
       UNNEST(range(CAST(ceil(len(w)/{n}.0) AS BIGINT))) AS u(i)
"""
