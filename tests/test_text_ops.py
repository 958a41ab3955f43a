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
