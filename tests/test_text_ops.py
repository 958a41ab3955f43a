"""Text-processor unit tests with the reference's own golden strings
(reference: calamari_ocr/test/processors/test_text_regularizer.py:10-67)."""

from calamari_spark.functions.text import bidi_str, regularize_str


def test_space_quotes():
    assert regularize_str("“Resolve quotes”", rulesets=["quotes", "spaces"]) == "''Resolve quotes''"
    assert (
        regularize_str("  “Resolve   spaces  ”   ", rulesets=["quotes", "spaces"])
        == "''Resolve spaces ''"
    )


def test_none():
    assert regularize_str("“Resolve quotes”", rulesets=[], rulegroups=["no"]) != "''Resolve quotes''"


def test_rule_sets():
    assert regularize_str("This \"''\"`is a  test..", rulesets=[], rulegroups=[]) == "This \"''\"`is a  test.."
    assert regularize_str("This \"''\"`is a  test..", rulesets=["spaces"]) == "This \"''\"`is a test.."
    assert regularize_str("This \"''\"`is a  test..", rulesets=["quotes"]) == "This '''''''is a  test.."
    assert regularize_str("This is .  . a test..", rulesets=["punctuation"]) == "This is. . a test. ."
    assert regularize_str("This is .  . a  test..", rulesets=[], rulegroups=["all"]) == "This is. . a test. ."


def test_ligatures_roman():
    assert regularize_str("ﬁne ﬀ Ⅳ", rulesets=["ligatures_consonantal", "roman_digits"]) == "fine ff IV"
    assert regularize_str("æon œuf", rulesets=["ligatures_vocal"]) == "aeon oeuf"


def test_uvius_scribal_rules():
    # reference: resources/rulesets/uvius.json (raw rules, order-sensitive):
    # I->J, z->U+0292 (ezh), U+A75B (r rotunda)->r
    assert regularize_str("Izaak ꝛex", rulesets=["uvius"]) == "Jʒaak rex"
    # full zpd group: quotes first (fancy double -> ''), then uvius ('' -> ")
    assert regularize_str("“Izaak”", rulesets=[], rulegroups=["zpd"]) == '"Jʒaak"'


def test_sql_chunking_order_invariant(duck):
    """The staged-CTE oracle (regularize_sql_chunks) must apply the rule
    chain in the exact same order at ANY chunk size — a chunk-boundary bug
    would silently reorder rules across stages. Checked against the Python
    chain on inputs whose rewrites cross chunk boundaries (quotes output
    feeds uvius's '' rule, which lives ~190 rules later)."""
    from calamari_spark.functions.text import regularize_sql_chunks

    samples = ["“Izaak”", "z ꝛ I …", "  “x”  ﬁ Ⅻ µ", "q̈ ''", ""]
    expected = [regularize_str(s, rulesets=[], rulegroups=["zpd"]) for s in samples]
    # chunk sizes stay under DuckDB's 128-call binder cap — a chunk big
    # enough to hold the whole chain would just recreate the failure the
    # staging exists to avoid
    for chunk in (1, 7, 60, 100):
        chunks = regularize_sql_chunks("t", rulegroups=["zpd"], chunk=chunk)
        ctes = ["s0 AS (SELECT ? AS t)"] + [
            f"s{i} AS (SELECT {expr} AS t FROM s{i - 1})"
            for i, expr in enumerate(chunks, 1)
        ]
        sql = "WITH " + ", ".join(ctes) + f" SELECT t FROM s{len(chunks)}"
        for s, want in zip(samples, expected):
            got = duck.execute(sql, [s]).fetchone()[0]
            assert got == want, (chunk, s)


def test_bidi_ltr_passthrough():
    assert bidi_str("plain latin text") == "plain latin text"


def test_bidi_rtl_run_reversed():
    # a 3-char Hebrew run must come out reversed in display order
    s = "ab אבג cd"
    assert bidi_str(s) == "ab גבא cd"


def test_regularize_column_matches_python(spark):
    from pyspark.sql import functions as F
    from calamari_spark.functions.text import regularize_column

    samples = [
        "  “Resolve   spaces  ”   ",
        "This \"''\"`is a  test..",
        "multi\nline\n text ",
        "already clean",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["t"])
    out = [
        r["o"]
        for r in df.select(
            regularize_column(F.col("t"), rulesets=["quotes", "spaces"]).alias("o")
        ).collect()
    ]
    expected = [regularize_str(s, rulesets=["quotes", "spaces"]) for s in samples]
    assert out == expected


def test_evaluator_error_mode_raises_on_missing_pred(spark):
    """Reference evaluator.py:219-227: non_existing_pred_handling='error'
    dies loudly when a gt line has no prediction; with complete predictions
    it scores identically to 'skip'."""
    import pytest
    from pyspark.sql import functions as F

    from calamari_spark.plans.textplans import evaluate_predictions

    gt = spark.createDataFrame(
        [(1, "abc"), (2, "def"), (3, "ghi")], "doc_id long, gt string"
    )
    pred_missing = spark.createDataFrame(
        [(1, "abc"), (3, "gxi")], "doc_id long, pred string"
    )
    with pytest.raises(ValueError, match="1 ground-truth lines have no prediction"):
        evaluate_predictions(gt, pred_missing, "error")

    pred_full = spark.createDataFrame(
        [(1, "abc"), (2, "def"), (3, "gxi")], "doc_id long, pred string"
    )
    err = evaluate_predictions(gt, pred_full, "error").collect()[0]
    skip = evaluate_predictions(gt, pred_full, "skip").collect()[0]
    assert err["mode"] == "error" and skip["mode"] == "skip"
    assert err[1:] == skip[1:]
    assert err["total_instances"] == 3 and err["total_char_errs"] == 1

    with pytest.raises(ValueError, match="mode"):
        evaluate_predictions(gt, pred_full, "loud")


def test_html_strip_boilerplate_and_entities():
    """Main-content extraction: chrome containers (head/nav/aside/footer),
    script/style payloads, and comments vanish; entities decode AFTER tag
    strip (so encoded markup stays literal text); &amp; decodes last."""
    from calamari_spark.functions.text import html_strip_str

    page = (
        '<html><head><title>t</title><script>var a = 1 < 2;</script>'
        "<style>p{margin:0}</style></head>"
        '<body><NAV><a href="#">home</a></NAV>'
        "<!-- tracking pixel -->"
        "<div id='main'><p>real &quot;content&quot; &amp; more &lt;b&gt;</p></div>"
        "<aside>links</aside><footer>c</footer></body></html>"
    )
    assert html_strip_str(page) == 'real "content" & more <b>'
    # header element is removed, but <head... must not swallow <header...
    assert html_strip_str("<header>x</header><p>y</p>") == "y"
    assert html_strip_str("a &amp;lt; b") == "a &lt; b"  # no double decode
    assert html_strip_str("  <p>  spaced   out  </p> ") == "spaced out"


def test_html_strip_spark_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from calamari_spark.functions.text import html_strip_col, html_strip_str

    pages = [
        "<html><head><script>j()</script></head><body><p>alpha beta</p></body></html>",
        "<div><nav>n</nav><p>x &amp; y</p><footer>f</footer></div>",
        "plain text, no markup",
        "<p>unclosed <b>bold",
    ]
    df = spark.createDataFrame([(p,) for p in pages], "page string")
    got = [r["s"] for r in df.select(html_strip_col(F.col("page")).alias("s")).collect()]
    assert got == [html_strip_str(p) for p in pages]
