"""Anomaly-reason coverage matrix: every ``AnomalyType`` member must be
produced by at least one scenario in this module, or carry a documented
exclusion citing reference evidence that the reference itself never emits
it. The test enumerates the live enum, so adding a member without an
emitter + scenario fails here — the reason set is a CLOSED set, not just
"high breadth".

Stats-level reasons run through ``validate_statistics`` on hand-built
artifacts (no Spark); the five row-level reasons run through the Spark
row-level checkers on tiny frames.
"""

import pytest

from data_validation_spark.anomalies import AnomalyType as AT
from data_validation_spark.schema import (
    BoolDomain,
    DatasetConstraints,
    DriftComparator,
    FeatureSpec,
    FeatureType,
    FixedShape,
    FloatDomain,
    ImageDomain,
    IntDomain,
    NaturalLanguageDomain,
    NumExamplesVersionComparator,
    Presence,
    Schema,
    SparseFeature,
    StringDomain,
    TokenConstraint,
    UniqueConstraints,
    ValueCount,
    WeightedFeature,
)
from data_validation_spark.stats.result import BytesStats, NumericStats
from data_validation_spark.validate.rules import validate_statistics
from test_validate import (  # reuse the golden-test artifact builders
    _nested_feature,
    _string_feature,
    make_feature,
    make_stats,
)

# Members the engine defines for anomalies-proto artifact parity but that the
# REFERENCE never emits either (no emitter anywhere in the reference's
# anomalies/*.cc or api/validation_api.py — each listed in the proto and, for
# the first two, in validation_api.py's _GLOBAL_ONLY_ANOMALY_TYPES set only):
#   COMPARATOR_TREATMENT_DATA_MISSING — only CONTROL_DATA_MISSING is raised
#     (feature_util.cc:484); treatment-side absence short-circuits earlier.
#   SCHEMA_TRAINING_SERVING_SKEW — listed in validation_api.py:46, no emitter.
#   BOOL_TYPE_INVALID_CONFIG — no reference file mentions it outside the proto.
REFERENCE_DEAD = {
    AT.COMPARATOR_TREATMENT_DATA_MISSING,
    AT.SCHEMA_TRAINING_SERVING_SKEW,
    AT.BOOL_TYPE_INVALID_CONFIG,
}

# Row-level reasons produced by the Spark checkers (covered in
# test_rowlevel_reasons below, collected separately from the stats scenarios).
ROW_LEVEL = {
    AT.DUPLICATE_KEY,
    AT.REFERENTIAL_ORPHAN,
    AT.ROW_CONSTRAINT_VIOLATION,
    AT.PIXEL_INTEGRITY_VIOLATION,
    AT.CAPTION_MISMATCH,
}


def _nl_feature(name, nl):
    f = make_feature(name, type_="STRING")
    f.custom["nl_statistics"] = nl
    return f


def _sparse_feature_stats(name, stats):
    f = make_feature(name)
    f.custom["sparse_feature_stats"] = stats
    return f


def _weighted_feature_stats(name, stats):
    f = make_feature(name)
    f.custom["weighted_feature_stats"] = stats
    return f


def _scenarios():
    """(label, stats, schema, kwargs) tuples; each validated independently."""
    out = []

    # presence / type family
    out.append((
        "presence",
        make_stats([make_feature("a", non_missing=4, missing=6)]),
        Schema(feature=[FeatureSpec(name="a", presence=Presence(min_count=5, min_fraction=0.5))]),
        {},
    ))
    out.append((
        "never_present",
        make_stats([make_feature("a", non_missing=0, missing=10, min_vals=0, max_vals=0)]),
        Schema(feature=[FeatureSpec(name="a", presence=Presence(min_count=1))]),
        {},
    ))
    out.append((
        "type_mismatch_new_missing",
        make_stats([
            make_feature("a", type_="STRING", string=_string_feature("a", {"x": 1.0}).string),
            make_feature("extra"),
        ]),
        Schema(feature=[
            FeatureSpec(name="a", type=FeatureType.INT),
            FeatureSpec(name="gone", presence=Presence(min_count=1)),
        ]),
        {},
    ))
    out.append((
        "empty_input",
        make_stats([], num_examples=0),
        Schema(),
        {},
    ))

    # value counts / shape / nestedness
    out.append((
        "value_counts",
        make_stats([make_feature("a", min_vals=0, max_vals=7)]),
        Schema(feature=[FeatureSpec(name="a", value_count=ValueCount(min=1, max=3))]),
        {},
    ))
    out.append((
        "nestedness",
        make_stats([_nested_feature("n", [(1, 2), (0, 9)])]),
        Schema(feature=[FeatureSpec(name="n", value_count=ValueCount(min=1, max=3))]),
        {},
    ))
    out.append((
        "fixed_shape",
        make_stats([make_feature("a", missing=2, min_vals=1, max_vals=1)]),
        Schema(feature=[FeatureSpec(name="a", shape=FixedShape(dim=[1]))]),
        {},
    ))

    # int / float / string / bool domains
    out.append((
        "int_domain",
        make_stats([make_feature("a", numeric=NumericStats(min=-5, max=100))]),
        Schema(feature=[FeatureSpec(name="a", int_domain=IntDomain(min=0, max=50))]),
        {},
    ))
    out.append((
        "int_domain_string",
        make_stats([_string_feature("s", {"1": 3.0, "abc": 2.0})]),
        Schema(feature=[FeatureSpec(name="s", int_domain=IntDomain(min=0, max=100))]),
        {},
    ))
    out.append((
        "int_domain_on_float",  # round-5 rule; schema.cc:81-115,820-831
        make_stats([make_feature("a", type_="FLOAT", numeric=NumericStats(min=0.5, max=1.5))]),
        Schema(feature=[FeatureSpec(
            name="a", type=FeatureType.FLOAT, int_domain=IntDomain(min=0, max=2),
        )]),
        {},
    ))
    out.append((
        "float_domain",
        make_stats([make_feature(
            "a", type_="FLOAT",
            numeric=NumericStats(min=-99.0, max=float("inf"), num_nan=2, num_pos_inf=1),
        )]),
        Schema(feature=[FeatureSpec(
            name="a",
            float_domain=FloatDomain(min=0.0, max=10.0, disallow_nan=True, disallow_inf=True),
        )]),
        {},
    ))
    out.append((
        "float_domain_string",
        make_stats([_string_feature("s", {"1.5": 3.0, "xyz": 2.0})]),
        Schema(feature=[FeatureSpec(name="s", float_domain=FloatDomain())]),
        {},
    ))
    out.append((
        "string_domain",
        # invalid UTF-8 short-circuits the enum check (string_domain_util.cc:
        # 157-164), so off-domain values and bad UTF-8 need separate features
        make_stats([
            _string_feature("fmt", {"png": 6.0, "tiff": 4.0}),
            _string_feature("raw", {"a": 5.0}, invalid_utf8=3),
        ]),
        Schema(feature=[
            FeatureSpec(
                name="fmt", type=FeatureType.BYTES,
                string_domain=StringDomain(value=["png"], min_domain_mass=0.95),
            ),
            FeatureSpec(
                name="raw", type=FeatureType.BYTES,
                string_domain=StringDomain(value=["a"]),
            ),
        ]),
        {},
    ))
    out.append((
        "bool_int",
        make_stats([
            make_feature("b", numeric=NumericStats(min=0, max=3)),
            make_feature("c", numeric=NumericStats(min=-2, max=1)),
        ]),
        Schema(feature=[
            FeatureSpec(name="b", bool_domain=BoolDomain()),
            FeatureSpec(name="c", bool_domain=BoolDomain()),
        ]),
        {},
    ))
    out.append((
        "bool_float_string",
        make_stats([
            make_feature("f", type_="FLOAT", numeric=NumericStats(min=0.0, max=0.5)),
            _string_feature("s", {"TRUE": 5.0, "maybe": 5.0}),
        ]),
        Schema(feature=[
            FeatureSpec(name="f", bool_domain=BoolDomain()),
            FeatureSpec(name="s", bool_domain=BoolDomain(true_value="TRUE", false_value="FALSE")),
        ]),
        {},
    ))
    out.append((
        "bool_malformed",  # round-5 rule; bool_domain_util.cc:78-91
        make_stats([_string_feature("s", {"YES": 5.0})]),
        Schema(feature=[FeatureSpec(
            name="s", bool_domain=BoolDomain(true_value="YES", false_value="YES"),
        )]),
        {},
    ))

    # uniques
    out.append((
        "uniques",
        make_stats([
            _string_feature("lo", {"a": 1.0, "b": 1.0}),
            _string_feature("hi", {"a": 1.0, "b": 1.0}),
            make_feature("none", numeric=NumericStats()),
        ]),
        Schema(feature=[
            FeatureSpec(name="lo", unique_constraints=UniqueConstraints(min=5)),
            FeatureSpec(name="hi", unique_constraints=UniqueConstraints(min=1, max=1)),
            FeatureSpec(name="none", unique_constraints=UniqueConstraints(min=1)),
        ]),
        {},
    ))

    # schema hygiene + semantic update
    out.append((
        "hygiene",
        make_stats([make_feature("a")]),
        Schema(feature=[
            FeatureSpec(name="a"),
            FeatureSpec(name="", presence=Presence(min_count=1)),
            FeatureSpec(name="d", domain="shared", presence=Presence(min_fraction=-0.5)),
        ]),
        {},
    ))
    sem = make_feature("cap", type_="STRING", string=_string_feature("cap", {"x": 1.0}).string)
    sem.custom["domain_info"] = "natural_language_domain {}"
    out.append(("semantic_update", make_stats([sem]), Schema(feature=[FeatureSpec(name="cap")]), {}))

    # derived features
    der = make_feature("d")
    der.custom["validation_derived_source"] = "src"
    out.append((
        "derived_invalid_source",
        make_stats([der]), Schema(feature=[FeatureSpec(name="d")]), {},
    ))
    out.append((
        "derived_bad_lifecycle",
        make_stats([der]),
        Schema(feature=[FeatureSpec(name="d", validation_derived_source="src")]),
        {},
    ))

    # image domain
    out.append((
        "image_domain",
        make_stats([make_feature(
            "img", type_="BYTES", bytes_=BytesStats(max_num_bytes=5000.0),
            custom={"image_format_histogram": {"jpeg": 50, "UNKNOWN": 50}},
        )]),
        Schema(feature=[FeatureSpec(
            name="img",
            image_domain=ImageDomain(minimum_supported_image_fraction=0.8,
                                     max_image_byte_size=4000),
        )]),
        {},
    ))

    # NL domain: coverage + all four sequence constraints + stats-missing
    out.append((
        "nl_constraints",
        make_stats([
            _nl_feature("text", {
                "feature_coverage": 0.5,
                "avg_token_length": 2.0,
                "token_statistics": {
                    "the": {"fraction_of_sequences": 0.5,
                            "per_sequence_min_frequency": 1,
                            "per_sequence_max_frequency": 3},
                },
            }),
            make_feature("bare", type_="STRING"),
        ]),
        Schema(feature=[
            FeatureSpec(name="text", natural_language_domain=NaturalLanguageDomain(
                min_coverage=0.9, min_avg_token_length=3.0,
                token_constraints=[
                    TokenConstraint(value="the", min_fraction_of_sequences=0.9),
                    TokenConstraint(value="the", max_fraction_of_sequences=0.1),
                    TokenConstraint(value="the", min_per_sequence=2),
                    TokenConstraint(value="the", max_per_sequence=1),
                ],
            )),
            FeatureSpec(name="bare", natural_language_domain=NaturalLanguageDomain(
                min_coverage=0.9,
            )),
        ]),
        {},
    ))

    # sparse / weighted features
    out.append((
        "sparse_weighted_stats",
        make_stats([
            _sparse_feature_stats("sp", {
                "missing_value": 2, "missing_index": 3,
                "min_length_diff": -1, "max_length_diff": 2,
            }),
            _weighted_feature_stats("wf", {
                "missing_value": 1, "missing_weight": 2,
                "min_weight_length_diff": -1, "max_weight_length_diff": 1,
            }),
        ]),
        Schema(
            sparse_feature=[SparseFeature(name="sp", index_feature="i", value_feature="v")],
            weighted_feature=[WeightedFeature(name="wf", feature="f", weight_feature="w")],
        ),
        {},
    ))
    out.append((
        "name_collisions",
        make_stats([make_feature("x"), make_feature("y")]),
        Schema(
            feature=[FeatureSpec(name="x"), FeatureSpec(name="y")],
            sparse_feature=[SparseFeature(name="x", index_feature="i", value_feature="v")],
            weighted_feature=[WeightedFeature(name="y", feature="f", weight_feature="w")],
        ),
        {},
    ))

    # dataset constraints + comparators
    out.append((
        "dataset_low",
        make_stats([make_feature("a")], num_examples=10),
        Schema(feature=[FeatureSpec(name="a")],
               dataset_constraints=DatasetConstraints(min_examples_count=100)),
        {},
    ))
    out.append((
        "dataset_high",
        make_stats([make_feature("a")], num_examples=10),
        Schema(feature=[FeatureSpec(name="a")],
               dataset_constraints=DatasetConstraints(max_examples_count=5)),
        {},
    ))
    drift_schema = Schema(
        feature=[FeatureSpec(name="a")],
        dataset_constraints=DatasetConstraints(
            num_examples_drift_comparator=NumExamplesVersionComparator(
                min_fraction_threshold=0.5, max_fraction_threshold=2.0)),
    )
    out.append((
        "num_examples_low",
        make_stats([make_feature("a")], num_examples=10), drift_schema,
        {"previous_statistics": make_stats([make_feature("a")], num_examples=100)},
    ))
    out.append((
        "num_examples_high",
        make_stats([make_feature("a")], num_examples=300), drift_schema,
        {"previous_statistics": make_stats([make_feature("a")], num_examples=100)},
    ))
    out.append((
        "drift_linf_and_missing",
        make_stats([
            _string_feature("fmt", {"png": 5.0, "jpeg": 5.0}),
            _string_feature("lost", {"x": 1.0}),
        ]),
        Schema(feature=[
            FeatureSpec(name="fmt", drift_comparator=DriftComparator(infinity_norm_threshold=0.1)),
            FeatureSpec(name="lost", drift_comparator=DriftComparator(infinity_norm_threshold=0.1)),
        ]),
        {"previous_statistics": make_stats([_string_feature("fmt", {"png": 9.0, "jpeg": 1.0})])},
    ))
    out.append((
        "drift_jsd_nad",
        make_stats([_string_feature("fmt", {"png": 10.0})]),
        Schema(feature=[FeatureSpec(name="fmt", drift_comparator=DriftComparator(
            jensen_shannon_divergence_threshold=0.1,
            normalized_abs_difference_threshold=0.1,
        ))]),
        {"previous_statistics": make_stats([_string_feature("fmt", {"gif": 10.0})])},
    ))
    return out


def _produced_stats_level():
    produced = set()
    for label, stats, schema, kwargs in _scenarios():
        r = validate_statistics(stats, schema, **kwargs)
        got = {a.type for a in r.anomalies}
        assert got, f"scenario {label} produced no anomalies"
        produced |= got
        # MULTIPLE_REASONS is an aggregate type surfaced in the per-feature
        # roll-up whenever >1 reason lands on one feature.
        for info in r.feature_anomaly_info().values():
            produced.add(AT(info["type"]))
    return produced


def test_stats_level_reasons_closed_set():
    produced = _produced_stats_level()
    expected = set(AT) - REFERENCE_DEAD - ROW_LEVEL
    missing = sorted(t.value for t in expected - produced)
    assert not missing, f"AnomalyType members with no producing scenario: {missing}"


def test_reference_dead_members_stay_dead():
    """If an emitter for a REFERENCE_DEAD member appears, it must graduate
    into a scenario instead of silently leaving this exclusion stale."""
    produced = _produced_stats_level()
    stale = sorted(t.value for t in REFERENCE_DEAD & produced)
    assert not stale, f"members marked reference-dead but now produced: {stale}"


def test_rowlevel_reasons(spark):
    """The five row-level reasons, each from its Spark checker on a tiny
    frame; PIXEL_INTEGRITY_VIOLATION via an undecodable payload."""
    from data_validation_spark.validate.rowlevel import (
        check_caption_equality,
        check_pixel_integrity,
        check_referential,
        check_row_constraints,
        check_uniqueness,
    )

    produced = set()

    dup = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "id string")
    produced |= {r["anomaly_type"] for r in check_uniqueness(dup, "id").collect()}

    child = spark.createDataFrame([("a",), ("zzz",)], "fk string")
    parent = spark.createDataFrame([("a",)], "pk string")
    produced |= {
        r["anomaly_type"] for r in check_referential(child, "fk", parent, "pk").collect()
    }

    rows = spark.createDataFrame([("r1", -5)], "id string, w int")
    schema = Schema(feature=[FeatureSpec(name="w", int_domain=IntDomain(min=0))])
    produced |= {
        r["anomaly_type"] for r in check_row_constraints(rows, schema, "id").collect()
    }

    imgs = spark.createDataFrame(
        [("i1", bytearray(b"not-an-image"), 4, 4, "png", "cap")],
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )
    produced |= {
        r["anomaly_type"] for r in check_pixel_integrity(imgs).collect()
    }

    ref = spark.createDataFrame([("i1", "other")], "image_id string, caption_ref string")
    produced |= {
        r["anomaly_type"] for r in check_caption_equality(imgs, ref).collect()
    }

    missing = sorted(t.value for t in ROW_LEVEL if t.value not in produced)
    assert not missing, f"row-level reasons not produced: {missing}"
