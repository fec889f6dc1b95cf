"""End-to-end sequence-example integration golden, ported from the
reference's ``integration_tests/sequence_example_e2e_test.py``: write
tf.SequenceExamples to a TFRecord, read them through the Spark source
(context columns + a ``##SEQUENCE##`` struct of ``array<array<T>>``),
compute full statistics, validate against the ported
``_BASIC_SCHEMA_FOR_VALIDATION``, and match the ported
``_BASIC_GOLDEN_ANOMALIES`` — reasons, exact description strings, and the
MULTIPLE_REASONS roll-up — then confirm ``update_schema`` repairs them.
"""

import pytest

from data_validation_spark.anomalies import AnomalyType as AT
from data_validation_spark.io import tfrecord as tfr
from data_validation_spark.schema import (
    BoolDomain,
    FeatureSpec,
    FeatureType,
    Presence,
    Schema,
    StructDomain,
    ValueCount,
)
from data_validation_spark.stats.engine import compute_statistics
from data_validation_spark.stats.options import StatsOptions
from data_validation_spark.validate.infer import update_schema
from data_validation_spark.validate.rules import validate_statistics

# _EXAMPLE_A (sequence_example_e2e_test.py:32): sequence_int64_feature has a
# missing step, [1, 2], and an explicitly empty step; context_int64_feature
# is present-but-empty.
EXAMPLE_A = (
    {
        "context_bytes_feature": [b"0"],
        "context_int64_feature": [],
        "label": [1.0],
        "example_weight": [5.0],
    },
    {
        "sequence_int64_feature": [None, [1, 2], []],
        "sequence_float_feature": [[0.0, 0.0]],
    },
)
# _EXAMPLE_B (:131): one 3-value step; sequence_float_feature and
# context_int64_feature are absent entirely.
EXAMPLE_B = (
    {
        "context_bytes_feature": [b"1"],
        "label": [2.0],
        "example_weight": [10.0],
    },
    {"sequence_int64_feature": [[2, 3, 4]]},
)

SEQ_INT = "##SEQUENCE##.sequence_int64_feature"
SEQ_FLOAT = "##SEQUENCE##.sequence_float_feature"


def _validation_schema():
    """Port of _BASIC_SCHEMA_FOR_VALIDATION (:1448)."""
    return Schema(
        feature=[
            FeatureSpec(
                name="context_bytes_feature",
                type=FeatureType.BYTES,
                value_counts=[ValueCount(min=1, max=1), ValueCount(min=1, max=1)],
                bool_domain=BoolDomain(true_value="1", false_value="0"),
                presence=Presence(min_fraction=1.0, min_count=1),
            ),
            FeatureSpec(
                name="context_int64_feature",
                type=FeatureType.INT,
                presence=Presence(min_count=1),
            ),
            FeatureSpec(
                name="example_weight",
                type=FeatureType.FLOAT,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_fraction=1.0, min_count=1),
            ),
            FeatureSpec(
                name="label",
                type=FeatureType.FLOAT,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_fraction=1.0, min_count=1),
            ),
            FeatureSpec(
                name="##SEQUENCE##",
                type=FeatureType.STRUCT,
                value_count=ValueCount(min=1, max=1),
                presence=Presence(min_fraction=1.0, min_count=1),
                struct_domain=StructDomain(
                    feature=[
                        FeatureSpec(
                            name="sequence_float_feature",
                            type=FeatureType.FLOAT,
                            presence=Presence(min_count=1),
                            value_count=ValueCount(min=1, max=1),
                        ),
                        FeatureSpec(
                            name="sequence_int64_feature",
                            type=FeatureType.INT,
                            presence=Presence(min_fraction=1.0, min_count=1),
                            value_counts=[
                                ValueCount(min=1),
                                ValueCount(min=2, max=2),
                            ],
                        ),
                    ]
                ),
            ),
        ]
    )


def test_sequence_example_wire_roundtrip(tmp_path):
    p = str(tmp_path / "seq.tfrecord")
    tfr.write_tfrecord_sequence_examples(p, [EXAMPLE_A, EXAMPLE_B])
    frames = list(tfr.read_frames(p, verify_crc=True))
    assert len(frames) == 2
    ctx_a, seq_a = tfr.parse_sequence_example(frames[0])
    assert ctx_a["context_bytes_feature"] == [b"0"]
    assert ctx_a["context_int64_feature"] == []
    assert ctx_a["label"] == [1.0] and ctx_a["example_weight"] == [5.0]
    # missing step and empty step both decode to []
    assert seq_a["sequence_int64_feature"] == [[], [1, 2], []]
    assert seq_a["sequence_float_feature"] == [[0.0, 0.0]]
    ctx_b, seq_b = tfr.parse_sequence_example(frames[1])
    assert "context_int64_feature" not in ctx_b
    assert "sequence_float_feature" not in seq_b
    assert seq_b["sequence_int64_feature"] == [[2, 3, 4]]


@pytest.fixture(scope="module")
def seq_stats(spark, tmp_path_factory):
    """10×A + 10×B (reference setUpClass), read → stats."""
    p = str(tmp_path_factory.mktemp("seq") / "input.tfrecord")
    tfr.write_tfrecord_sequence_examples(p, [EXAMPLE_A, EXAMPLE_B] * 10)
    df = tfr.read_tfrecord_sequence_examples(spark, p)
    return compute_statistics(df, StatsOptions())


def test_sequence_stats_golden_facts(seq_stats):
    """Spot-pins from _BASIC_GOLDEN_STATS (:151)."""
    ds = seq_stats.default_slice()
    assert ds.num_examples == 20

    cb = ds.feature("context_bytes_feature")
    assert cb.common.num_non_missing == 20 and cb.common.num_missing == 0
    assert cb.common.min_num_values == 1 and cb.common.max_num_values == 1

    ci = ds.feature("context_int64_feature")
    assert ci.common.num_non_missing == 10 and ci.common.num_missing == 10
    assert ci.common.min_num_values == 0 and ci.common.max_num_values == 0

    lb = ds.feature("label")
    assert lb.numeric.min == 1.0 and lb.numeric.max == 2.0
    assert lb.numeric.mean == pytest.approx(1.5)

    si = ds.feature(SEQ_INT)
    assert si.common.num_non_missing == 20
    pv = si.common.presence_and_valency
    assert len(pv) == 2
    assert (pv[0].min_num_values, pv[0].max_num_values) == (1, 3)
    assert (pv[1].min_num_values, pv[1].max_num_values) == (0, 3)

    sf = ds.feature(SEQ_FLOAT)
    assert sf.common.num_non_missing == 10 and sf.common.num_missing == 10
    assert sf.numeric.min == 0.0 and sf.numeric.max == 0.0


def test_sequence_anomalies_golden(seq_stats):
    """Port of _BASIC_GOLDEN_ANOMALIES (:1536): exactly three flagged
    features with exact reason types and description strings."""
    r = validate_statistics(seq_stats, _validation_schema())
    info = r.feature_anomaly_info()
    assert set(info) == {"context_bytes_feature", SEQ_FLOAT, SEQ_INT}

    cb = info["context_bytes_feature"]
    assert cb["type"] == "VALUE_NESTEDNESS_MISMATCH"
    assert cb["short_description"] == "Mismatched value nest level"
    assert cb["description"] == (
        "The values have a different nest level than expected. "
        "Value counts will not be checked."
    )

    sf = info[SEQ_FLOAT]
    assert sf["type"] == "VALUE_NESTEDNESS_MISMATCH"
    assert sf["description"] == (
        "This feature has a value_count, but the nestedness level of the "
        "feature > 1. For features with nestedness levels greater than 1, "
        "value_counts, not value_count, should be specified."
    )

    si = info[SEQ_INT]
    assert si["type"] == "MULTIPLE_REASONS"
    assert si["short_description"] == "Multiple errors"
    assert si["description"] == (
        "Some examples have fewer values than expected at nestedness "
        "level 1. Some examples have more values than expected at "
        "nestedness level 1."
    )
    assert [x["type"] for x in si["reasons"]] == [
        "FEATURE_TYPE_LOW_NUMBER_VALUES",
        "FEATURE_TYPE_HIGH_NUMBER_VALUES",
    ]
    assert {a.type for a in r.anomalies} == {
        AT.VALUE_NESTEDNESS_MISMATCH,
        AT.FEATURE_TYPE_LOW_NUMBER_VALUES,
        AT.FEATURE_TYPE_HIGH_NUMBER_VALUES,
    }


def test_sequence_update_schema_repairs(seq_stats):
    """The reference's final step: update_schema on the validation schema
    yields a schema the same stats validate cleanly against."""
    fixed = update_schema(_validation_schema(), seq_stats)
    assert validate_statistics(seq_stats, fixed).passed
    # _BASIC_SCHEMA_FROM_UPDATE pins sequence_int64_feature's repaired
    # per-level bounds to value_counts [{min:1}, {max:3}] (:1625-1636):
    # level-1 min 2 cleared (observed 0), max raised to the observed 3.
    si = fixed.get_feature(SEQ_INT)
    assert [(vc.min, vc.max) for vc in si.value_counts] == [(1, None), (None, 3)]
