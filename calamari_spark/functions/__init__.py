from calamari_spark.functions.text import (  # noqa: F401
    RULESETS,
    RULEGROUPS,
    regularize_column,
    regularize_str,
    nfc_column,
    strip_column,
    bidi_str,
)
