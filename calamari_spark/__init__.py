"""calamari_spark — a from-scratch PySpark-native extraction/analytics engine.

Re-expresses the query & data-processing capabilities of the reference
line-based ATR engine (Calamari-OCR/calamari, studied read-only at
/root/reference) as an idiomatic Spark DataFrame pipeline:

* documents are Iceberg/parquet tables of interleaved text+media spans
  ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``
* text spans flow through Catalyst-native boilerplate-strip column
  expressions (strip / NFC / regex regularizer rulesets)
* media spans flow through vectorized pandas/Arrow UDF stages:
  batch PNG decode -> center-normalization -> CNN-BiLSTM inference ->
  CTC decoding -> confidence-voting ensemble fusion
* the recombined span sequence is reassembled per document in original
  order with a salted two-level aggregation.

No code is copied from the reference; algorithm semantics are re-derived
and cited per-function as ``reference: file:line``.
"""

__version__ = "0.1.0"
