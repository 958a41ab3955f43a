"""Text-pipeline queries over the driver `documents` table.

These are the training-data-pipeline operators (boilerplate strip, language
ID, quality scoring, token counting, fingerprinting, dedup) expressed as
Catalyst-native plans, each with a DuckDB oracle. The strip/regularize
semantics mirror the reference text processors
(reference: calamari_ocr/ocr/dataset/textprocessors/basic_text_processors.py:20-35,
text_regularizer.py + resources/rulesets/{spaces,quotes}.json), and the
distinct-chars query is the reference's codec construction
(reference: calamari_ocr/ocr/codec.py:65-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from calamari_spark.functions.text import (
    REG_SPACES_SQL as _REG_SQL,
    regularized_spaces_col as _regularized_col,
)
from calamari_spark.sources.tables import load_table


# Synthetic page chrome for the HTML strip surface (see the HTML section
# below for the full rationale): defined here because the merged driver row
# q_strip_regularize exercises the strip on the same scan.
_PAGE_PRE = (
    '<html><head><title>doc</title>'
    '<script type="text/javascript">var x = 1 < 2;</script>'
    "<style>p{margin:0}</style></head>"
    '<body><nav><a href="#">home</a> | <a href="#">about</a></nav>'
    '<div id="main"><p>'
)
_PAGE_POST = (
    " &amp; trailing &lt;markup&gt;</p></div>"
    "<aside>related links</aside>"
    "<footer>&copy; 2026 corpus</footer></body></html>"
)


def q_strip_regularize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip + HTML main-content extraction fused into ONE
    driver row (same merge pattern as langid riding in q_quality_score):
    ``clean_text`` attests the reference Strip/space-regularize processors;
    the page-wrap -> strip round trip attests the north-rule HTML
    boilerplate strip (functions/text.HTML_BOILERPLATE_RULES) on the same
    scan — ``main_text`` must recover the article text plus the decoded
    entity suffix from inside full page chrome. The standalone q_html_strip
    stays in SHADOW_QUERIES. Whole-stage-codegen regexp chain; no shuffle
    at all — a pure map over the scan, and stays so at 100 TB."""
    from calamari_spark.functions.text import html_strip_col

    docs = load_table(spark, "documents", sf_dir)
    # r6: stage clean_text and page as their own projections so the
    # regularizer chain runs once per row (the single-select shape
    # macro-expanded it 6x — clean feeds the output column AND both page
    # references; CollapseProject keeps multi-referenced non-cheap aliases
    # staged). Same expressions, same values.
    staged = docs.select(
        "doc_id", _regularized_col(F.col("text")).alias("clean_text")
    ).select(
        "doc_id",
        "clean_text",
        F.concat(F.lit(_PAGE_PRE), F.col("clean_text"), F.lit(_PAGE_POST)).alias("page"),
    )
    return (
        staged.select(
            "doc_id",
            "clean_text",
            F.length("page").alias("n_raw"),
            html_strip_col(F.col("page")).alias("main_text"),
        )
        .withColumn("n_main", F.length("main_text"))
        .orderBy("doc_id")
    )


def _strip_regularize_sql() -> str:
    from calamari_spark.functions.text import html_strip_sql

    pre = _PAGE_PRE.replace("'", "''")
    post = _PAGE_POST.replace("'", "''")
    page = f"'{pre}' || {_REG_SQL} || '{post}'"
    return f"""
SELECT doc_id,
       {_REG_SQL} AS clean_text,
       length({page}) AS n_raw,
       {html_strip_sql(page)} AS main_text,
       length({html_strip_sql(page)}) AS n_main
FROM documents ORDER BY doc_id
"""


Q_STRIP_SQL = _strip_regularize_sql()


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + counts (the n_tokens feed for length
    bucketing; reference analog: element_length_fn, data.py:88-92), plus
    the BPE-ish pre-tokenizer count (q_bpe_tokens merged here so one driver
    row attests both tokenizers; the standalone query remains in
    SHADOW_QUERIES for pytest parity). Pure map, no shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    # r6: stage the regularized text once (the single-select shape ran the
    # regexp chain 3x per row — once per output column)
    return (
        docs.select("doc_id", _regularized_col(F.col("text")).alias("clean"))
        .select(
            "doc_id",
            F.size(F.split("clean", " ")).alias("n_tokens"),
            F.length("clean").alias("clean_chars"),
            F.size(
                F.regexp_extract_all("clean", F.lit(_BPE_PATTERN), 0)
            ).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# BPE-ish pre-tokenization (GPT-2-style contraction/word/number/punct
# splitting, ASCII-scoped so both regex engines agree byte-for-byte)
_BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (the
    training-data-pipeline token budgeter): counts per doc plus the
    corpus-wide token total — all JVM-side regexp_count/extract."""
    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    per_doc = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(clean, F.lit(_BPE_PATTERN), 0)).alias("n_bpe_tokens"),
        F.size(F.split(clean, " ")).alias("n_ws_tokens"),
    )
    return per_doc.orderBy("doc_id")


_BPE_PATTERN_SQL = _BPE_PATTERN.replace("'", "''")

Q_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len(string_split({_REG_SQL}, ' ')) AS n_tokens,
       length({_REG_SQL}) AS clean_chars,
       len(regexp_extract_all({_REG_SQL}, '{_BPE_PATTERN_SQL}')) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""

Q_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all({_REG_SQL}, '{_BPE_PATTERN_SQL}')) AS n_bpe_tokens,
       len(string_split({_REG_SQL}, ' ')) AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


BPE_PAIR_TOPN = 20


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge round of tokenizer TRAINING: corpus-wide
    frequencies of adjacent character pairs inside pre-tokenized words
    (SentencePiece/HF trainers compute exactly this table to pick each
    merge). The 100 TB shape is two-stage: the corpus collapses to the
    distinct-word frequency table first (one shuffle with map-side partial
    agg — the token explosion never crosses the exchange unaggregated),
    then pairs explode over the DISTINCT-word table, which is tiny next to
    the corpus (Heaps' law), weighted by word frequency. Top-N with a full
    deterministic tie order (count DESC, pair ASC) so both engines cut the
    same prefix."""
    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    toks = docs.select(
        F.explode(F.regexp_extract_all(clean, F.lit(_BPE_PATTERN), 0)).alias("tok")
    )
    words = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("wf"))
    pairs = words.filter(F.length("tok") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, 2),
            )
        ).alias("pair"),
        "wf",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_PAIR_TOPN)
    )


Q_BPE_PAIR_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all({_REG_SQL}, '{_BPE_PATTERN_SQL}')) AS tok
  FROM documents
),
words AS (SELECT tok, count(*) AS wf FROM toks GROUP BY tok),
pairs AS (
  SELECT substr(tok, CAST(u.i AS BIGINT), 2) AS pair, wf
  FROM words, UNNEST(range(1, length(tok))) AS u(i)
  WHERE length(tok) >= 2
)
SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT {BPE_PAIR_TOPN}
"""


def _langid_cols():
    """Marker-token language-ID expressions shared by q_quality_score (the
    merged driver query) and the standalone q_langid (shadow)."""
    clean = F.concat(F.lit(" "), _regularized_col(F.col("text")), F.lit(" "))

    def count_marker(m):
        return (F.length(clean) - F.length(F.replace(clean, F.lit(m), F.lit("")))) / len(m)

    en = count_marker(" the ") + count_marker(" is ") + count_marker(" a ")
    es = count_marker(" el ") + count_marker(" la ") + count_marker(" de ")
    de = count_marker(" der ") + count_marker(" und ") + count_marker(" das ")
    pred = (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("unknown")
    )
    return pred


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features: punctuation ratio, stopword ratio, mean
    token length, composite score — plus the marker-token language-ID
    (q_langid merged here: both are per-doc scalar annotations every
    training-data filter pass computes together; the standalone query
    remains in SHADOW_QUERIES). Pure map — no shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    n_chars = F.length(clean)
    n_tokens = F.size(F.split(clean, " "))
    n_punct = n_chars - F.length(F.regexp_replace(clean, r"[.,:;?!]", ""))
    n_the = (n_chars - F.length(F.replace(clean, F.lit("the"), F.lit("")))) / 3
    punct_ratio = F.round(n_punct / n_chars, 6)
    stop_ratio = F.round(n_the / n_tokens, 6)
    avg_tok = F.round(n_chars / n_tokens, 6)
    score = F.round(
        F.when(n_tokens >= 5, 1.0).otherwise(0.2)
        * F.when(punct_ratio < 0.2, 1.0).otherwise(0.5)
        * F.least(F.lit(1.0), avg_tok / 4.0),
        6,
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_tok.alias("avg_token_len"),
        score.alias("quality"),
        _langid_cols().alias("pred_lang"),
        F.col("lang").alias("tagged_lang"),
    ).orderBy("doc_id")


def _marker_sql_frag(m):
    return f"(length(padded) - length(replace(padded, '{m}', ''))) / {len(m)}"


_LANGID_CASE = """CASE WHEN en >= es AND en >= de AND en > 0 THEN 'en'
            WHEN es >= de AND es > 0 THEN 'es'
            WHEN de > 0 THEN 'de'
            ELSE 'unknown' END"""

Q_QUALITY_SQL = f"""
SELECT doc_id,
       round(n_punct / n_chars, 6)  AS punct_ratio,
       round(n_the / n_tokens, 6)   AS stopword_ratio,
       round(n_chars / n_tokens, 6) AS avg_token_len,
       round((CASE WHEN n_tokens >= 5 THEN 1.0 ELSE 0.2 END)
             * (CASE WHEN n_punct / n_chars < 0.2 THEN 1.0 ELSE 0.5 END)
             * least(1.0, (n_chars / n_tokens) / 4.0), 6) AS quality,
       {_LANGID_CASE} AS pred_lang,
       lang AS tagged_lang
FROM (
  SELECT doc_id, lang,
         CAST(length(clean) AS DOUBLE) AS n_chars,
         CAST(len(string_split(clean, ' ')) AS DOUBLE) AS n_tokens,
         CAST(length(clean) - length(regexp_replace(clean, '[.,:;?!]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST((length(clean) - length(replace(clean, 'the', ''))) / 3 AS DOUBLE) AS n_the,
         {_marker_sql_frag(' the ')} + {_marker_sql_frag(' is ')} + {_marker_sql_frag(' a ')} AS en,
         {_marker_sql_frag(' el ')} + {_marker_sql_frag(' la ')} + {_marker_sql_frag(' de ')} AS es,
         {_marker_sql_frag(' der ')} + {_marker_sql_frag(' und ')} + {_marker_sql_frag(' das ')} AS de
  FROM (SELECT doc_id, lang, {_REG_SQL} AS clean, ' ' || {_REG_SQL} || ' ' AS padded FROM documents)
) ORDER BY doc_id
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (deterministic, SQL-expressible
    analog of an n-gram classifier): count per-language marker substrings,
    argmax with fixed tie order en > es > de > unknown. The expressions
    come from the SAME _langid_cols helper the merged q_quality_score
    uses, so driver query and shadow cannot drift."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        _langid_cols().alias("pred_lang"),
        F.col("lang").alias("tagged_lang"),
    ).orderBy("doc_id")


Q_LANGID_SQL = f"""
SELECT doc_id,
       {_LANGID_CASE} AS pred_lang,
       lang AS tagged_lang
FROM (
  SELECT doc_id, lang,
         {_marker_sql_frag(' the ')} + {_marker_sql_frag(' is ')} + {_marker_sql_frag(' a ')} AS en,
         {_marker_sql_frag(' el ')} + {_marker_sql_frag(' la ')} + {_marker_sql_frag(' de ')} AS es,
         {_marker_sql_frag(' der ')} + {_marker_sql_frag(' und ')} + {_marker_sql_frag(' das ')} AS de
  FROM (SELECT doc_id, lang, ' ' || {_REG_SQL} || ' ' AS padded FROM documents)
) ORDER BY doc_id
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint = md5 of the normalized text (the SQL-portable
    stand-in for a rolling hash; md5 is identical across engines)."""
    docs = load_table(spark, "documents", sf_dir)
    clean = F.lower(_regularized_col(F.col("text")))
    return docs.select("doc_id", F.md5(clean).alias("fingerprint")).orderBy("doc_id")


Q_FINGERPRINT_SQL = f"SELECT doc_id, md5(lower({_REG_SQL})) AS fingerprint FROM documents ORDER BY doc_id"


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content-prefix fingerprint: one shuffle on the hash;
    keeper = min(doc_id) per group (deterministic). At 100 TB this is the
    cheapest dedup pass and runs before any UDF stage."""
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(F.substring(F.lower(_regularized_col(F.col("text"))), 1, 24))
    return (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("group_size"), F.min("doc_id").alias("keeper"))
        .filter(F.col("group_size") > 1)
        .orderBy("fp")
    )


Q_EXACT_DEDUP_SQL = f"""
SELECT fp, count(*) AS group_size, min(doc_id) AS keeper
FROM (SELECT doc_id, md5(substring(lower({_REG_SQL}), 1, 24)) AS fp FROM documents)
GROUP BY fp HAVING count(*) > 1 ORDER BY fp
"""


def q_distinct_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec construction: distinct chars over the corpus
    (reference: codec.py:65-106) — explode + distinct, sorted."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .orderBy("ch")
    )


Q_DISTINCT_CHARS_SQL = """
SELECT DISTINCT ch FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
WHERE ch != '' ORDER BY ch
"""


def q_reassemble_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction pipeline's relational skeleton run on the flat driver
    table: split text into ordered word-spans, per-span map, then ordered
    reassembly per document. In the real pipeline this is
    posexplode(spans) ... collect_list(struct(offset, ...)) with salting;
    here it proves order-correct reassembly against the SQL oracle."""
    docs = load_table(spark, "documents", sf_dir)
    spans = docs.select(
        "doc_id", F.posexplode(F.split(_regularized_col(F.col("text")), " ")).alias("pos", "word")
    )
    mapped = spans.withColumn("word", F.upper(F.col("word")))
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("reassembled")
        )
        .orderBy("doc_id")
    )


Q_REASSEMBLE_SQL = f"""
SELECT doc_id, string_agg(upper(word), ' ' ORDER BY pos) AS reassembled
FROM (
  SELECT doc_id,
         unnest(string_split(clean, ' ')) AS word,
         generate_subscripts(string_split(clean, ' '), 1) AS pos
  FROM (SELECT doc_id, {_REG_SQL} AS clean FROM documents)
)
GROUP BY doc_id ORDER BY doc_id
"""


MISSING_PRED_MOD = 7  # docs with doc_id % 7 == 0 have no prediction

EVAL_MODES = ("skip", "empty", "error")


def _eval_totals(joined: DataFrame, mode: str) -> DataFrame:
    per_line = joined.select(
        F.length("gt").alias("chars"),
        F.levenshtein("gt", "pred").alias("errs"),
    )
    return per_line.agg(
        F.count(F.lit(1)).alias("total_instances"),
        F.sum("chars").alias("total_chars"),
        F.sum("errs").alias("total_char_errs"),
        F.round(F.sum("errs") / F.sum("chars"), 6).alias("avg_ler"),
    ).select(F.lit(mode).alias("mode"), "*")


def evaluate_predictions(gt: DataFrame, pred: DataFrame, mode: str = "skip") -> DataFrame:
    """Evaluator join + totals with ALL THREE of the reference's
    non_existing_pred_handling modes (evaluator.py:219-237):

    * ``skip``  — drop gt lines with no prediction (inner join);
    * ``empty`` — score them against '' (left join + coalesce, errs =
      full line length);
    * ``error`` — refuse to produce a number: raise naming how many gt
      lines lack a prediction (reference asserts the counts match and
      dies loudly; the distributed analog is a left-anti count — one
      cheap job before the scoring plan).

    ``gt`` carries (doc_id, gt); ``pred`` carries (doc_id, pred)."""
    if mode not in EVAL_MODES:
        raise ValueError(f"mode must be one of {EVAL_MODES}, got {mode!r}")
    if mode == "error":
        n_missing = gt.join(pred, "doc_id", "left_anti").count()
        if n_missing:
            raise ValueError(
                f"{n_missing} ground-truth lines have no prediction "
                "(non_existing_pred_handling=error; reference "
                "evaluator.py:219-227)"
            )
        joined = gt.join(pred, "doc_id")
    elif mode == "skip":
        joined = gt.join(pred, "doc_id")  # id-equi-join, evaluator.py:239-249
    else:
        joined = gt.join(pred, "doc_id", "left").withColumn(
            "pred", F.coalesce("pred", F.lit(""))
        )
    from calamari_spark.plans.common import fan_out

    # the edit distance is the expensive kernel; pin its parallelism
    return _eval_totals(fan_out(joined, "doc_id"), mode)


def q_cer_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluator join+aggregate (reference: evaluator.py:205-261 +
    model.py:53-66): gt = clean text, pred = seeded corruption (drop all
    'a', 'o'->'0'); per-line levenshtein; avg_ler = sum(errs)/sum(chars).

    Parameterized over the reference's non_existing_pred_handling_mode
    (evaluator.py:219-237): predictions are MISSING for doc_id % 7 == 0,
    and the query emits one totals row per handling mode — 'skip' drops
    the gt line (inner join), 'empty' scores it against '' (left join +
    coalesce, errs = full line length). The loud 'error' mode also exists
    (evaluate_predictions(mode='error') raises on missing preds) but a
    raise cannot be a driver board row — tested in test_text_ops."""
    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    gt = docs.select("doc_id", clean.alias("gt"))
    pred = docs.filter((F.col("doc_id") % MISSING_PRED_MOD) != 0).select(
        "doc_id",
        F.replace(F.replace(clean, F.lit("a"), F.lit("")), F.lit("o"), F.lit("0")).alias("pred"),
    )

    # ONE levenshtein pass serves both modes: on rows where a prediction
    # exists, levenshtein(gt, pred) == levenshtein(gt, coalesce(pred, '')),
    # and the skip-mode totals are just the has_pred subset of the
    # empty-mode per-line map. The map is materialized once (see
    # materialize) — the edit distance is the dominant cost of this row.
    # evaluate_predictions() remains the general mode-by-mode API.
    from calamari_spark.plans.common import fan_out, materialize

    per_line = materialize(
        fan_out(gt.join(pred, "doc_id", "left"), "doc_id").select(
            F.length("gt").alias("chars"),
            F.col("pred").isNotNull().alias("has_pred"),
            F.levenshtein("gt", F.coalesce("pred", F.lit(""))).alias("errs"),
        )
    )

    def totals(df: DataFrame, mode: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("total_instances"),
            F.sum("chars").alias("total_chars"),
            F.sum("errs").alias("total_char_errs"),
            F.round(F.sum("errs") / F.sum("chars"), 6).alias("avg_ler"),
        ).select(F.lit(mode).alias("mode"), "*")

    return (
        totals(per_line.filter("has_pred"), "skip")
        .unionByName(totals(per_line, "empty"))
        .orderBy("mode")
    )


Q_CER_SQL = f"""
WITH gt AS (SELECT doc_id, {_REG_SQL} AS gt FROM documents),
pred AS (
  SELECT doc_id, replace(replace({_REG_SQL}, 'a', ''), 'o', '0') AS pred
  FROM documents WHERE doc_id % {MISSING_PRED_MOD} != 0
),
skip_lines AS (
  SELECT length(g.gt) AS chars, levenshtein(g.gt, p.pred) AS errs
  FROM gt g JOIN pred p ON g.doc_id = p.doc_id
),
empty_lines AS (
  SELECT length(g.gt) AS chars, levenshtein(g.gt, coalesce(p.pred, '')) AS errs
  FROM gt g LEFT JOIN pred p ON g.doc_id = p.doc_id
)
SELECT 'skip' AS mode, count(*) AS total_instances,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(errs) AS BIGINT) AS total_char_errs,
       round(CAST(sum(errs) AS DOUBLE) / sum(chars), 6) AS avg_ler
FROM skip_lines
UNION ALL
SELECT 'empty', count(*), CAST(sum(chars) AS BIGINT), CAST(sum(errs) AS BIGINT),
       round(CAST(sum(errs) AS DOUBLE) / sum(chars), 6)
FROM empty_lines
ORDER BY mode
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup: word-3-gram shingles, self-join on shared
    shingle, Jaccard = |inter| / (|A|+|B|-|inter|). The shingle join is the
    scale-out trick: only docs sharing >=1 shingle ever meet (vs O(n^2)
    cross join), and stop-shingles occurring in > MAX_DF docs are dropped
    first — without the cap one hot shingle at 10^12 docs creates a
    quadratic join partition (the classic skew blow-up)."""
    MAX_DF = 100
    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    from calamari_spark.plans.common import fan_out, materialize

    # r6 plan (same result set, verified against the unchanged oracle):
    # * the per-(doc, shingle) distinct is array_distinct of the PER-DOC
    #   shingle array — a pure map — not a global distinct shuffle of every
    #   shingle occurrence (the r5 shape's first exchange);
    # * the MAX_DF stop-shingle filter drops the Zipf HEAD, so the small
    #   side is the STOP set (df > MAX_DF), not the rare set: aggregate df
    #   with map-side partial agg, broadcast the stop set, and drop stop
    #   shingles with a map-side anti join — the r5 left_semi against the
    #   corpus-sized rare set shuffled the shingle table a second time
    #   (guide §3.2: reduce the big side before shuffling it);
    # * candidate pairs come from ONE groupBy(sh) with in-array pair
    #   expansion over the per-shingle doc list (bounded: df <= MAX_DF by
    #   the pre-filter, so <= C(MAX_DF, 2) pairs per group) instead of the
    #   two-sided self-join (guide §2.4: two ops keyed the same way share
    #   one exchange).
    words = fan_out(docs, "doc_id").select("doc_id", F.split(clean, " ").alias("w"))
    n = F.size("w") - 2
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.col("w")[i], F.col("w")[i + 1], F.col("w")[i + 2]),
        )
    )
    # referenced by the stop-set agg AND the anti-join input: one build
    raw_shingles = materialize(
        words.filter(n > 0).select("doc_id", F.explode(shingle_arr).alias("sh"))
    )
    stop = (
        raw_shingles.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_DF)
        .select("sh")
    )
    shingles = raw_shingles.join(F.broadcast(stop), "sh", "left_anti")
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    grouped = shingles.groupBy("sh").agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
    ids = F.col("ids")
    m = F.size(ids)
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), m - 2),
            lambda i: F.transform(
                F.slice(ids, i + 2, m),
                lambda y: F.struct(ids[i].alias("a"), y.alias("b")),
            ),
        )
    )
    inter = (
        grouped.filter(m >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


Q_NGRAM_JACCARD_SQL = f"""
WITH words AS (SELECT doc_id, string_split({_REG_SQL}, ' ') AS w FROM documents),
raw_shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words WHERE len(w) >= 3)
),
shingles AS (
  SELECT doc_id, sh FROM raw_shingles
  WHERE sh IN (SELECT sh FROM raw_shingles GROUP BY sh HAVING count(*) <= 100)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
ORDER BY doc_a, doc_b
"""


# payload appended to every document so each ruleset family has work to do
# (ligatures, roman numerals, fancy quotes/dashes, micro sign, punctuation
# spacing); identical literal on both engines
_RULE_PAYLOAD = ' ﬁﬀx Ⅻ ax—b µm "q" y . z…'


def q_regularize_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 'zpd' rulegroup (quotes, spaces, roman digits, consonantal
    ligatures, various, punctuation — reference: resources/rulegroups.json,
    text_regularizer.py:47-119) as one whole-stage-codegen'd column chain;
    the oracle SQL is GENERATED from the same rule data."""
    from calamari_spark.functions.text import regularize_column

    docs = load_table(spark, "documents", sf_dir)
    raw = F.concat(F.col("text"), F.lit(_RULE_PAYLOAD))
    return docs.select(
        "doc_id", regularize_column(raw, rulegroups=["zpd"]).alias("clean_text")
    ).orderBy("doc_id")


def _regularize_extended_sql() -> str:
    # The full zpd chain (incl. uvius) is ~192 rules — past DuckDB's
    # 128-deep expression binder — so the oracle stages the chain across
    # CTEs of <=60 nested calls each, still generated from the one rule
    # table that drives the Spark column chain.
    from calamari_spark.functions.text import regularize_sql_chunks

    payload = _RULE_PAYLOAD.replace("'", "''")
    chunks = regularize_sql_chunks("t", rulegroups=["zpd"])
    ctes = [f"s0 AS (SELECT doc_id, (text || '{payload}') AS t FROM documents)"]
    for i, expr in enumerate(chunks, 1):
        ctes.append(f"s{i} AS (SELECT doc_id, {expr} AS t FROM s{i - 1})")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, t AS clean_text FROM s{len(chunks)} ORDER BY doc_id"
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization driver query (reference: text_normalizer.py:24-28).
    The corpus is ASCII, so a decomposed sequence is synthesized
    deterministically first ('e' -> 'e' + COMBINING ACUTE U+0301); NFC must
    recompose it to the single codepoint U+00E9, shrinking the char count.
    The Python-side NFC runs as an Arrow-batched pandas UDF (nfc_column)."""
    from calamari_spark.functions.text import nfc_column

    docs = load_table(spark, "documents", sf_dir)
    decomposed = F.replace(
        _regularized_col(F.col("text")), F.lit("e"), F.lit("e\u0301")
    )
    out = docs.select("doc_id", decomposed.alias("decomposed"))
    return (
        out.select(
            "doc_id",
            F.length("decomposed").alias("n_decomposed"),
            nfc_column(F.col("decomposed")).alias("normalized"),
        )
        .withColumn("n_nfc", F.length("normalized"))
        .orderBy("doc_id")
    )


Q_TEXT_NORMALIZE_SQL = f"""
SELECT doc_id,
       length(decomposed) AS n_decomposed,
       nfc_normalize(decomposed) AS normalized,
       length(nfc_normalize(decomposed)) AS n_nfc
FROM (SELECT doc_id, replace({_REG_SQL}, 'e', 'e' || chr(769)) AS decomposed FROM documents)
ORDER BY doc_id
"""


# deterministic Latin->Hebrew mapping used to synthesize RTL runs for the
# bidi display query ('a'..'v' -> U+05D0..U+05E5; the corpus is a-z digits)
_HEBREW_BASE = 0x05D0


def q_bidi_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidi display reordering (reference: basic_text_processors.py:61-67,
    python-bidi). RTL runs are synthesized deterministically: every word at
    an odd position is mapped to Hebrew codepoints, then the logical line is
    reordered for display with bidi_str. The UAX#9 run reversal is not
    SQL-expressible, but the pipeline is deterministic by construction —
    the oracle is the committed golden fixture (scripts/make_golden.py)."""
    from typing import Iterator

    import pandas as pd

    docs = load_table(spark, "documents", sf_dir)
    src = docs.select("doc_id", _regularized_col(F.col("text")).alias("clean"))

    schema = "doc_id long, logical string, display string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from calamari_spark.functions.text import bidi_str

        def to_rtl(word: str) -> str:
            return "".join(
                chr(_HEBREW_BASE + (ord(c) - ord("a")) % 22) if "a" <= c <= "z" else c
                for c in word
            )

        for b in batches:
            rows = []
            for doc_id, clean in zip(b["doc_id"], b["clean"]):
                words = clean.split(" ")
                logical = " ".join(
                    to_rtl(w) if i % 2 == 1 else w for i, w in enumerate(words)
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "logical": logical,
                        "display": bidi_str(logical),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "logical", "display"])

    return src.mapInPandas(run, schema=schema).orderBy("doc_id")


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function surface with an oracle: a JSON payload is synthesized
    identically in both engines (plain concat), then Spark parses it with
    from_json (typed schema) while DuckDB uses json_extract — proving the
    engine's JSON path expressions against an independent parser. The
    extended-prediction container uses the same to_json/from_json pair."""
    docs = load_table(spark, "documents", sf_dir)
    payload = F.concat(
        F.lit('{"doc": {"id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('"}, "n_chars": '),
        F.col("n_chars").cast("string"),
        F.lit("}"),
    )
    schema = "struct<doc: struct<id: long, lang: string>, n_chars: long>"
    parsed = docs.select("doc_id", F.from_json(payload, schema).alias("j"))
    return parsed.select(
        "doc_id",
        F.col("j.doc.id").alias("json_id"),
        F.col("j.doc.lang").alias("json_lang"),
        F.col("j.n_chars").alias("json_n_chars"),
    ).orderBy("doc_id")


Q_JSON_SQL = """
SELECT doc_id,
       CAST(json_extract(payload, '$.doc.id') AS BIGINT) AS json_id,
       json_extract_string(payload, '$.doc.lang') AS json_lang,
       CAST(json_extract(payload, '$.n_chars') AS BIGINT) AS json_n_chars
FROM (
  SELECT doc_id,
         '{"doc": {"id": ' || CAST(doc_id AS VARCHAR) || ', "lang": "' || lang
         || '"}, "n_chars": ' || CAST(n_chars AS VARCHAR) || '}' AS payload
  FROM documents
) ORDER BY doc_id
"""


def _bidi_golden_oracle() -> str:
    from calamari_spark.plans.golden import golden_oracle

    return golden_oracle("q_bidi_display")


TEXT_QUERIES = {
    "q_strip_regularize": (q_strip_regularize, Q_STRIP_SQL),
    "q_text_normalize": (q_text_normalize, Q_TEXT_NORMALIZE_SQL),
    "q_bidi_display": (q_bidi_display, _bidi_golden_oracle()),
    "q_json_extract": (q_json_extract, Q_JSON_SQL),
    "q_regularize_extended": (q_regularize_extended, _regularize_extended_sql()),
    "q_token_count": (q_token_count, Q_TOKEN_COUNT_SQL),
    "q_quality_score": (q_quality_score, Q_QUALITY_SQL),
    "q_exact_dedup": (q_exact_dedup, Q_EXACT_DEDUP_SQL),
    "q_reassemble_spans": (q_reassemble_spans, Q_REASSEMBLE_SQL),
    "q_cer_eval": (q_cer_eval, Q_CER_SQL),
    "q_ngram_jaccard_pairs": (q_ngram_jaccard_pairs, Q_NGRAM_JACCARD_SQL),
}

# HTML main-content extraction (the north rule's "HTML boilerplate strip /
# DOM heuristics" surface, stated literally). The corpus has no HTML
# column, so the page is SYNTHESIZED deterministically around each
# document's text — head/script/style/nav/aside/footer chrome plus
# entity-encoded trailing markup — and the strip must recover exactly the
# article text. One rule list (functions/text.HTML_BOILERPLATE_RULES)
# drives the Catalyst chain, the Python twin, and the DuckDB oracle.
# (_PAGE_PRE/_PAGE_POST are defined next to q_strip_regularize, the merged
# driver row that attests this surface on the board.)


def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from calamari_spark.functions.text import html_strip_col

    docs = load_table(spark, "documents", sf_dir)
    page = F.concat(
        F.lit(_PAGE_PRE), _regularized_col(F.col("text")), F.lit(_PAGE_POST)
    )
    return docs.select(
        "doc_id",
        F.length(page).alias("n_raw"),
        html_strip_col(page).alias("main_text"),
    ).withColumn("n_main", F.length("main_text")).orderBy("doc_id")


def _html_strip_sql() -> str:
    from calamari_spark.functions.text import html_strip_sql

    pre = _PAGE_PRE.replace("'", "''")
    post = _PAGE_POST.replace("'", "''")
    page = f"'{pre}' || {_REG_SQL} || '{post}'"
    return f"""
SELECT doc_id,
       length({page}) AS n_raw,
       {html_strip_sql(page)} AS main_text,
       length({html_strip_sql(page)}) AS n_main
FROM documents ORDER BY doc_id
"""


# PDF/layout parse (the north rule's remaining extraction surface): each
# document renders to a real single-page PDF (pure-Python writer,
# sources/pdf.py — same from-spec approach as the PNG codec) whose content
# stream lists text objects in SCRAMBLED order; the extract stage must
# recover reading order from glyph coordinates. The oracle rebuilds the
# expected 8-words-per-line split with string ops only, so the whole
# render->parse round trip (escaping, xref, stream parse, layout sort) is
# what the hash attests.
def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from calamari_spark.plans.common import fan_out
    from calamari_spark.plans.docsplit import lines_col

    docs = load_table(spark, "documents", sf_dir)
    w = F.split(_regularized_col(F.col("text")), " ")
    # fan_out: the render+parse round trip is the expensive per-row kernel
    src = fan_out(docs, "doc_id").select("doc_id", lines_col(w).alias("lines"))

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from calamari_spark.sources.pdf import make_pdf

        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "pdf": [make_pdf(list(ls)) for ls in b["lines"]],
                }
            )

    pdfs = src.mapInPandas(render, "doc_id long, pdf binary")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from calamari_spark.sources.pdf import extract_text

        for b in batches:
            rows = []
            for doc_id, blob in zip(b["doc_id"], b["pdf"]):
                for i, line in enumerate(extract_text(bytes(blob))):
                    rows.append({"doc_id": doc_id, "line_no": i, "line": line})
            yield pd.DataFrame(rows, columns=["doc_id", "line_no", "line"])

    return pdfs.mapInPandas(parse, "doc_id long, line_no int, line string").orderBy(
        "doc_id", "line_no"
    )


def _pdf_sql() -> str:
    from calamari_spark.plans.docsplit import lines_cte

    return f"""
SELECT doc_id, line_no, line
FROM ({lines_cte(_REG_SQL)})
ORDER BY doc_id, line_no
"""


Q_PDF_SQL = _pdf_sql()


# Link extraction — the DOM parse's other output (a web-extraction
# pipeline keeps the outlink graph alongside the main text). Links are
# synthesized deterministically per document (one absolute URL whose
# subdomain/path derive from doc_id, one relative URL), then extracted
# with the same regex in both engines; the domain column normalizes
# absolute URLs (relative ones get '').
def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    page = F.concat(
        F.lit("<p>"),
        _regularized_col(F.col("text")),
        F.lit('</p><a href="https://site'),
        F.pmod(F.col("doc_id"), F.lit(3)),
        F.lit(".example.org/doc/"),
        F.pmod(F.col("doc_id"), F.lit(97)),
        F.lit('">out</a><a href="/rel/'),
        F.pmod(F.col("doc_id"), F.lit(7)),
        F.lit('">rel</a>'),
    )
    hrefs = F.regexp_extract_all(page, F.lit('href="([^"]+)"'), 1)
    return (
        docs.select("doc_id", F.explode(hrefs).alias("href"))
        .withColumn("domain", F.regexp_extract("href", "^https?://([^/]+)", 1))
        .orderBy("doc_id", "href")
    )


Q_LINK_SQL = f"""
SELECT doc_id, u.href AS href,
       regexp_extract(u.href, '^https?://([^/]+)', 1) AS domain
FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(
           '<p>' || {_REG_SQL} || '</p><a href="https://site' ||
           (doc_id % 3) || '.example.org/doc/' || (doc_id % 97) ||
           '">out</a><a href="/rel/' || (doc_id % 7) || '">rel</a>',
           'href="([^"]+)"', 1)) AS href
  FROM documents
) u
ORDER BY doc_id, href
"""


# merged into driver rows above (q_token_count / q_quality_score /
# q_simhash / x_dataset_stats) but still oracle-verified by pytest — the
# driver's attestation window is 50 rows, so near-duplicate shapes share one
TEXT_SHADOW_QUERIES = {
    "q_bpe_tokens": (q_bpe_tokens, Q_BPE_SQL),
    "q_bpe_pair_counts": (q_bpe_pair_counts, Q_BPE_PAIR_SQL),
    "q_langid": (q_langid, Q_LANGID_SQL),
    "q_fingerprint": (q_fingerprint, Q_FINGERPRINT_SQL),
    "q_distinct_chars": (q_distinct_chars, Q_DISTINCT_CHARS_SQL),
    "q_html_strip": (q_html_strip, _html_strip_sql()),
    "q_pdf_extract": (q_pdf_extract, Q_PDF_SQL),
    "q_link_extract": (q_link_extract, Q_LINK_SQL),
}
