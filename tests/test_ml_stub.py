"""M6-M8 stub stage: load-once iterator UDF shape, deterministic
pseudo-classification, P11 confidence gate."""

import pytest

from ocr_service_spark.operators.ml_stub import (
    _StubModel,
    apply_confidence_gate,
    with_doc_classification,
)


def test_classification_deterministic_and_gated(spark):
    df = spark.createDataFrame(
        [(1, "справка о регистрации", "default"),
         (2, "annual report text body", "default"),
         (3, None, "default")],
        "id long, corrected_text string, template string")
    out = apply_confidence_gate(with_doc_classification(df))
    rows = {r.id: r for r in out.collect()}

    again = {r.id: r for r in
             apply_confidence_gate(with_doc_classification(df)).collect()}
    for i in (1, 2):
        assert rows[i].classification == again[i].classification
        assert 0.5 <= rows[i].classification.confidence < 1.0
        expect = (rows[i].classification.predicted_type
                  if rows[i].classification.confidence > 0.7 else "default")
        assert rows[i].document_type == expect
    assert rows[3].classification.predicted_type is None
    assert rows[3].document_type == "default"


def test_real_model_path_is_loud():
    with pytest.raises(NotImplementedError):
        _StubModel().load_weights("/nonexistent")
