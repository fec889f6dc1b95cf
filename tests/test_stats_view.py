"""FeaturePath + schema_util accessors + stats_util views/IO + display-util
additions — parity with the reference's utils surface (path.py,
utils/schema_util.py, utils/stats_util.py, utils/display_util.py)."""

import numpy as np
import pandas as pd
import pytest

import data_validation_spark as dvs
from data_validation_spark.paths import FeaturePath, normalize_feature_id
from data_validation_spark.schema import (
    BoolDomain,
    FeatureType,
    IntDomain,
    Schema,
    StringDomain,
)
from data_validation_spark.stats.result import (
    CommonStats,
    CrossFeatureStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    NumericStats,
)


# ------------------------------------------------------------- FeaturePath --
def test_feature_path_basics():
    p = FeaturePath(["a", "b"])
    assert p.to_path() == "a.b" and str(p) == "a.b"
    assert p.parent() == FeaturePath(["a"])
    assert p.child("c").steps() == ("a", "b", "c")
    assert FeaturePath.from_string("a.b") == p
    assert FeaturePath.from_string("") == FeaturePath(())
    assert len(p) == 2 and list(p) == ["a", "b"]
    assert FeaturePath(["a"]) < p
    assert hash(FeaturePath(["a", "b"])) == hash(p)
    assert not FeaturePath(())
    with pytest.raises(ValueError):
        FeaturePath(()).parent()
    with pytest.raises(TypeError):
        FeaturePath([1])


def test_normalize_feature_id():
    assert normalize_feature_id("x").steps() == ("x",)
    assert normalize_feature_id("a.b").steps() == ("a", "b")
    assert normalize_feature_id(("a", "b")).to_path() == "a.b"
    p = FeaturePath(["q"])
    assert normalize_feature_id(p) is p


# ------------------------------------------------------------- schema_util --
def test_schema_util_get_set_domain():
    schema = dvs.generate_dummy_schema_with_paths(
        [["a"], ["b", "c"], ["b", "d"]]
    )
    # dummy schema shape: nested paths become STRUCT features
    b = dvs.get_feature(schema, "b")
    assert b.type == FeatureType.STRUCT
    assert {f.name for f in b.struct_domain.feature} == {"c", "d"}
    # get through the struct by dotted string and by FeaturePath
    assert dvs.get_feature(schema, "b.c").name == "c"
    assert dvs.get_feature(schema, FeaturePath(["b", "d"])).name == "d"
    with pytest.raises(ValueError):
        dvs.get_feature(schema, "missing")
    with pytest.raises(ValueError):
        dvs.get_feature(schema, "a.x")  # 'a' is not a STRUCT

    dvs.set_domain(schema, "a", IntDomain(min=1, max=9))
    assert dvs.get_domain(schema, "a") == IntDomain(min=1, max=9)
    # oneof semantics: setting a new domain clears the old kind
    dvs.set_domain(schema, "a", BoolDomain(true_value="y"))
    f = dvs.get_feature(schema, "a")
    assert f.int_domain is None and f.bool_domain is not None
    # global string domain by name
    schema.string_domain.append(StringDomain(name="colors", value=["r", "g"]))
    dvs.set_domain(schema, "b.c", "colors")
    assert dvs.get_domain(schema, "b.c").name == "colors"
    with pytest.raises(ValueError):
        dvs.set_domain(schema, "a", "no_such_global")
    with pytest.raises(TypeError):
        dvs.set_domain(schema, "b", IntDomain())  # STRUCT refuses domains
    with pytest.raises(ValueError):
        dvs.get_domain(schema, "b.d")  # no domain set
    with pytest.raises(TypeError):
        dvs.get_feature("not a schema", "a")


# ------------------------------------------------------------- stats views --
def _artifact():
    f_x = FeatureStats(
        name="x",
        type="FLOAT",
        common=CommonStats(num_non_missing=10),
        numeric=NumericStats(mean=1.5),
        custom={"my_stat": 42.0},
    )
    f_nested = FeatureStats(name="p.q", type="INT")
    f_derived = FeatureStats(
        name="der",
        type="FLOAT",
        validation_derived_source={
            "deriver_name": "my_deriver",
            "source_paths": ["x"],
        },
    )
    default = DatasetStats(
        slice_key="All Examples",
        num_examples=10,
        features={"x": f_x, "p.q": f_nested, "der": f_derived},
        cross_features=[
            CrossFeatureStats("x", "p.q", count=10, correlation=0.5, covariance=2.0)
        ],
    )
    sl = DatasetStats(slice_key="flag_A", num_examples=4, features={"x": f_x})
    return DatasetStatsList([default, sl])


def test_accessors_and_views():
    stats = _artifact()
    ds = stats.slices[0]
    assert dvs.get_feature_stats(ds, "x").numeric.mean == 1.5
    assert dvs.get_feature_stats(ds, FeaturePath(["p", "q"])).type == "INT"
    with pytest.raises(ValueError):
        dvs.get_feature_stats(ds, "nope")
    with pytest.raises(TypeError):
        dvs.get_feature_stats(stats, "x")  # wrong artifact level
    assert dvs.get_custom_stats(ds.features["x"], "my_stat") == 42.0
    with pytest.raises(ValueError):
        dvs.get_custom_stats(ds.features["x"], "absent")

    lv = dvs.DatasetListView(stats)
    assert sorted(lv.list_slices()) == ["All Examples", "flag_A"]
    assert lv.get_default_slice().proto().num_examples == 10
    dv_ = lv.get_slice("flag_A")
    assert dv_.proto().num_examples == 4
    assert lv.get_slice("zzz") is None

    view = lv.get_default_slice_or_die()
    assert view.get_feature("x").numeric_statistics().mean == 1.5
    assert view.get_feature(FeaturePath(["p", "q"])) is not None
    assert view.get_feature("absent") is None
    assert view.get_feature("x").custom_statistic("my_stat") == 42.0
    assert view.get_feature("x").custom_statistic("absent") is None
    paths = view.list_features()
    assert FeaturePath(["p", "q"]) in paths and FeaturePath(["x"]) in paths

    cf = view.get_cross_feature("x", "p.q")
    assert cf.proto().correlation == 0.5
    assert view.get_cross_feature("x", "zz") is None
    assert view.list_cross_features() == [
        (FeaturePath(["x"]), FeaturePath(["p", "q"]))
    ]

    der = view.get_derived_feature("my_deriver", ["x"])
    assert der.proto().name == "der"
    assert view.get_derived_feature("my_deriver", ["y"]) is None

    # get_slice_stats
    one = dvs.get_slice_stats(stats, "flag_A")
    assert len(one.slices) == 1 and one.slices[0].slice_key == "flag_A"
    with pytest.raises(ValueError):
        dvs.get_slice_stats(stats, "nope")


def test_default_slice_single_slice_fallback():
    stats = DatasetStatsList([DatasetStats(slice_key="only", num_examples=1)])
    lv = dvs.DatasetListView(stats)
    assert lv.get_default_slice().proto().slice_key == "only"


# -------------------------------------------------------------------- IO ---
def test_text_binary_sharded_roundtrip(tmp_path):
    stats = _artifact()
    t = str(tmp_path / "stats.json")
    dvs.write_stats_text(stats, t)
    assert dvs.load_stats_text(t) == stats

    b = str(tmp_path / "stats.bin")
    dvs.write_stats_binary(stats, b)
    assert dvs.load_stats_binary(b) == stats
    # load_statistics sniffs either form
    assert dvs.load_statistics(t) == stats
    assert dvs.load_statistics(b) == stats
    with pytest.raises(OSError):
        dvs.load_stats_binary(t)

    # sharded: two shards with disjoint slices merge to the full artifact
    sh1 = DatasetStatsList([stats.slices[0]])
    sh2 = DatasetStatsList([stats.slices[1]])
    prefix = str(tmp_path / "sharded" / "stats")
    paths = dvs.write_sharded_statistics([sh1, sh2], prefix)
    assert [p.endswith(dvs.default_sharded_output_suffix()) for p in paths] == [
        True,
        True,
    ]
    lv = dvs.load_sharded_statistics(input_path_prefix=prefix)
    assert sorted(lv.list_slices()) == ["All Examples", "flag_A"]
    lv2 = dvs.load_sharded_statistics(input_paths=paths)
    assert sorted(lv2.list_slices()) == ["All Examples", "flag_A"]
    with pytest.raises(ValueError):
        dvs.load_sharded_statistics()
    with pytest.raises(ValueError):
        dvs.load_sharded_statistics(input_path_prefix=str(tmp_path / "nope"))
    assert dvs.default_sharded_output_supported()


# ------------------------------------------------- display-util additions ---
def test_skew_and_match_stats_dataframes():
    from data_validation_spark.validate.skew import FeatureSkew, MatchStats

    fs = [
        FeatureSkew("b", base_count=5, test_count=5, match_count=3,
                    base_only=1, test_only=0, mismatch_count=1),
        FeatureSkew("a", base_count=2, test_count=2, match_count=2),
    ]
    df = dvs.get_skew_result_dataframe(fs)
    assert list(df.feature_name) == ["a", "b"]  # sorted
    assert df.loc[1, "diff_count"] == 2
    ms = MatchStats(
        base_with_id_count=10, test_with_id_count=9, identifiers_count=11,
        ids_missing_in_base_count=1, ids_missing_in_test_count=2,
        matching_pairs_count=8, duplicate_id_count_base=1,
        duplicate_id_count_test=2,
    )
    mdf = dvs.get_match_stats_dataframe(ms)
    assert mdf.loc[0, "duplicate_id_count"] == 3
    assert mdf.loc[0, "matching_pairs_count"] == 8


def test_confusion_count_dataframes():
    rows = [
        ("f", "cat", "cat", 8),
        ("f", "cat", "dog", 2),
        ("f", "dog", "cat", 1),
        ("g", "x", "x", 5),
    ]
    out = dvs.get_confusion_count_dataframes(rows)
    assert set(out) == {"f", "g"}
    f = out["f"]
    # equal pairs dropped; base counts include the equal pair
    assert list(f["Base value"]) == ["cat", "dog"]
    cat_row = f[f["Base value"] == "cat"].iloc[0]
    assert cat_row["Pair count"] == 2 and cat_row["Base count"] == 10
    assert len(out["g"]) == 0


def test_statistics_html_and_compare_slices():
    stats = _artifact()
    html = dvs.get_statistics_html(stats)  # default slice only
    # single-artifact display names the dataset by the default lhs_name
    # (reference get_statistics_html signature default 'lhs_statistics')
    assert "data-statistics-b64" in html and "lhs_statistics" in html
    two = dvs.get_statistics_html(
        dvs.get_slice_stats(stats, "All Examples"),
        dvs.get_slice_stats(stats, "flag_A"),
        lhs_name="left", rhs_name="right",
    )
    assert "left" in two and "right" in two
    # name-clash fallback (reference behavior): both renamed
    clash = dvs.get_statistics_html(
        dvs.get_slice_stats(stats, "All Examples"),
        dvs.get_slice_stats(stats, "All Examples"),
        lhs_name="same", rhs_name="same",
    )
    assert "lhs_statistics" in clash and "rhs_statistics" in clash
    # allowlist projection drops other features
    only_x = dvs.get_statistics_html(stats, allowlist_features=["x"])
    assert "p.q" not in only_x
    html2 = dvs.compare_slices(stats, "All Examples", "flag_A")
    assert "flag_A" in html2
    with pytest.raises(ValueError):
        dvs.compare_slices(stats, "All Examples", "zzz")
    with pytest.raises(TypeError):
        dvs.get_statistics_html("not stats")
    empty = dvs.get_statistics_html(
        DatasetStatsList([DatasetStats(slice_key="All Examples", num_examples=0)])
    )
    assert "Empty dataset" in empty


# ------------------------------------------- cross-feature stats plumbing ---
def test_cross_feature_stats_attach(spark):
    pdf = pd.DataFrame(
        {"u": np.arange(20, dtype=float), "v": np.arange(20, dtype=float) * -2}
    )
    df = spark.createDataFrame(pdf)
    out = dvs.cross_feature_stats(df, [("u", "v")])
    stats = DatasetStatsList(
        [DatasetStats(slice_key="All Examples", num_examples=20)]
    )
    merged = dvs.attach_cross_feature_stats(stats, out.collect())
    cf = merged.slices[0].cross_features[0]
    assert cf.path_x == "u" and cf.path_y == "v" and cf.count == 20
    assert cf.correlation == pytest.approx(-1.0)
    assert cf.covariance == pytest.approx(float(np.cov(pdf.u, pdf.v, bias=True)[0, 1]))
    # round-trips through the artifact JSON
    assert DatasetStatsList.from_json(merged.to_json()) == merged


# ------------------------------------- PTransform-style names + TFRecord IO --
def test_tfrecord_stats_roundtrip_and_records_and_binary(tmp_path):
    stats = _artifact()
    p = str(tmp_path / "stats.tfrecord")
    dvs.write_stats_tfrecord(stats, p)
    assert dvs.load_stats_tfrecord(p) == stats
    # load_statistics sniffs TFRecord framing too
    assert dvs.load_statistics(p) == stats

    sh1 = dvs.get_slice_stats(stats, "All Examples")
    sh2 = dvs.get_slice_stats(stats, "flag_A")
    binp = str(tmp_path / "merged.bin")
    dvs.write_statistics_to_records_and_binary(
        [sh1, sh2], binp, records_path_prefix=str(tmp_path / "recs")
    )
    merged = dvs.load_stats_binary(binp)
    assert sorted(s.slice_key for s in merged.slices) == ["All Examples", "flag_A"]
    lv = dvs.load_sharded_statistics(input_path_prefix=str(tmp_path / "recs"))
    assert sorted(lv.list_slices()) == ["All Examples", "flag_A"]


def test_ptransform_style_aliases():
    from data_validation_spark.io.artifacts import merge_stats
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.validate.skew import detect_feature_skew

    assert dvs.GenerateStatistics is compute_statistics
    assert dvs.MergeDatasetFeatureStatisticsList is merge_stats
    assert dvs.DetectFeatureSkew is detect_feature_skew
    assert dvs.WriteStatisticsToBinaryFile is dvs.write_stats_binary
    assert dvs.WriteStatisticsToTFRecord is dvs.write_stats_tfrecord


def test_get_feature_value_slicer_validation(spark):
    from data_validation_spark.stats.slicing import SliceSpec

    spec = dvs.experimental_get_feature_value_slicer({"a": None, "b": ["x", 1]})
    assert isinstance(spec, SliceSpec)
    assert spec.features == {"a": None, "b": ["x", 1]}
    with pytest.raises(TypeError):
        dvs.experimental_get_feature_value_slicer({"a": "scalar_string"})
    with pytest.raises(NotImplementedError):
        dvs.experimental_get_feature_value_slicer({"a": [1.5]})
    with pytest.raises(NotImplementedError):
        dvs.experimental_get_feature_value_slicer({"a": [True]})

    # end-to-end: the built spec drives engine slicing
    from data_validation_spark.stats.options import StatsOptions

    pdf = pd.DataFrame({"g": ["u", "u", "v"], "x": [1.0, 2.0, 3.0]})
    stats = dvs.compute_statistics(
        spark.createDataFrame(pdf),
        StatsOptions(slice_specs=[dvs.experimental_get_feature_value_slicer({"g": None})]),
    )
    keys = sorted(s.slice_key for s in stats.slices)
    assert keys == ["All Examples", "g_u", "g_v"]


def test_full_reference_export_surface():
    # every name the reference's tfdv/__init__.py exports resolves here
    names = """CombinerStatsGenerator CrossFeatureView DatasetListView
    DatasetView DetectFeatureSkew FeaturePath FeatureView GenerateStatistics
    MergeDatasetFeatureStatisticsList StatsOptions TransformStatsGenerator
    WriteStatisticsToBinaryFile WriteStatisticsToRecordsAndBinaryFile
    WriteStatisticsToTFRecord compare_slices default_sharded_output_suffix
    default_sharded_output_supported display_anomalies display_schema
    experimental_get_feature_value_slicer generate_dummy_schema_with_paths
    generate_statistics_from_csv generate_statistics_from_dataframe
    generate_statistics_from_tfrecord get_confusion_count_dataframes
    get_domain get_feature get_feature_stats get_match_stats_dataframe
    get_skew_result_dataframe get_slice_stats get_statistics_html
    infer_schema load_anomalies_text load_schema_text
    load_sharded_statistics load_statistics load_stats_binary
    load_stats_text set_domain update_schema validate_corresponding_slices
    validate_examples_in_csv validate_examples_in_tfrecord
    validate_statistics visualize_statistics write_anomalies_text
    write_schema_text write_stats_text""".split()
    missing = [n for n in names if getattr(dvs, n, None) is None]
    assert not missing, missing


# --------------------- reference-test goldens (exact message regexes) -------
# Ported from schema_util_test.py:149-205,327-347,617-631 and
# stats_util_test.py:355-371 — the reference's own assertRaisesRegex
# patterns must match our exceptions.
def test_reference_error_message_goldens():
    schema = Schema()
    from data_validation_spark.schema import FeatureSpec

    schema.feature.append(FeatureSpec(name="feature1"))
    with pytest.raises(ValueError, match="Feature.*not found in the schema"):
        dvs.get_feature(schema, "feature2")
    with pytest.raises(ValueError, match="does not refer to a valid STRUCT feature"):
        dvs.get_feature(schema, FeaturePath(["feature1", "sub_feature2"]))
    with pytest.raises(ValueError, match="has no domain associated"):
        dvs.get_domain(schema, "feature1")
    schema.string_domain.append(StringDomain(name="domain1", value=["a", "b"]))
    with pytest.raises(ValueError, match="Invalid global string domain"):
        dvs.set_domain(schema, "feature1", "domain2")
    with pytest.raises(TypeError, match="domain is of type"):
        dvs.set_domain(Schema(), "feature", {})
    # struct sub-feature miss (schema_util_test.py:162-180)
    s2 = dvs.generate_dummy_schema_with_paths([["feature1", "sub_feature1"]])
    with pytest.raises(ValueError, match="Feature.*not found in the schema"):
        dvs.get_feature(s2, FeaturePath(["feature1", "sub_feature2"]))


def test_get_derived_feature_ambiguous_reference_golden():
    # stats_util_test.py:355-371: two features sharing one derived source
    src = {"deriver_name": "my_deriver_name", "source_paths": ["f0_step1.f0_step2", "f1"]}
    ds = DatasetStats(
        slice_key="All Examples",
        features={
            "d1": FeatureStats("d1", "FLOAT", validation_derived_source=dict(src)),
            "d2": FeatureStats("d2", "FLOAT", validation_derived_source=dict(src)),
        },
    )
    view = dvs.DatasetListView(DatasetStatsList([ds])).get_default_slice()
    with pytest.raises(ValueError, match="Ambiguous result, 2 features matched"):
        view.get_derived_feature(
            "my_deriver_name",
            [FeaturePath(["f0_step1", "f0_step2"]), FeaturePath(["f1"])],
        )
    assert view.get_derived_feature("mismatched_name", ["f0_step1.f0_step2", "f1"]) is None
    assert view.get_derived_feature("my_deriver_name", []) is None


def test_display_skew_confusion_reference_goldens():
    """display_util_test.py:959-1129 ported: exact frames (string values in
    place of the reference's proto bytes_value)."""
    from data_validation_spark.validate.skew import FeatureSkew

    skew_results = [
        FeatureSkew("foo", base_count=101, test_count=102, match_count=103,
                    base_only=104, test_only=105, mismatch_count=106),
        FeatureSkew("bar", base_count=201, test_count=202, match_count=203,
                    base_only=204, test_only=205, mismatch_count=206),
        FeatureSkew("baz"),
    ]
    df = dvs.get_skew_result_dataframe(skew_results)
    expected = pd.DataFrame(
        [
            # our diff_count is the identity base_only+test_only+mismatch
            # (the reference proto carries it as an independent field)
            ["bar", 201, 202, 203, 204, 205, 206, 615],
            ["baz", 0, 0, 0, 0, 0, 0, 0],
            ["foo", 101, 102, 103, 104, 105, 106, 315],
        ],
        columns=["feature_name", "base_count", "test_count", "match_count",
                 "base_only", "test_only", "mismatch_count", "diff_count"],
    )
    assert df.equals(expected)

    # empty input keeps the full column set
    empty = dvs.get_skew_result_dataframe([])
    assert list(empty.columns) == list(expected.columns) and len(empty) == 0

    confusion = [
        ("foo", "val1", "val1", 99),
        ("foo", "val1", "val2", 1),
        ("foo", "val2", "val3", 1),
        ("foo", "val3", "val3", 100),
        ("bar", "val1", "val2", 1),
    ]
    dfs = dvs.get_confusion_count_dataframes(confusion)
    assert set(dfs.keys()) == {"foo", "bar"}
    assert dfs["foo"].equals(
        pd.DataFrame(
            [["val1", "val2", 1, 100, 1], ["val2", "val3", 1, 1, 101]],
            columns=["Base value", "Test value", "Pair count", "Base count",
                     "Test count"],
        )
    )
    assert dfs["bar"].equals(
        pd.DataFrame(
            [["val1", "val2", 1, 1, 1]],
            columns=["Base value", "Test value", "Pair count", "Base count",
                     "Test count"],
        )
    )


def test_get_natural_language_statistics_dataframes(spark):
    """display_util.get_natural_language_statistics_dataframes parity over
    the engine's nl_statistics custom stat: plot-ready frames per dataset
    per feature, None when no NL stats exist."""
    from data_validation_spark.stats.engine import compute_statistics
    from data_validation_spark.stats.options import StatsOptions
    from data_validation_spark.stats.text import attach_nl_token_stats

    pdf = pd.DataFrame(
        {"txt": ["the cat sat", "the dog ran fast", "a cat ran"]}
    )
    df = spark.createDataFrame(pdf)
    stats = compute_statistics(df, StatsOptions())
    attach_nl_token_stats(stats, df, "txt", constrained_tokens=["cat", "the"])

    out = dvs.get_natural_language_statistics_dataframes(stats)
    assert out is not None and list(out) == ["lhs_statistics"]
    entry = out["lhs_statistics"]["txt"]
    tlh = entry["token_length_histogram"]
    assert list(tlh.columns) == ["high_values", "low_values", "sample_counts"]
    assert len(tlh) >= 1
    # 10 tokens total, equal-mass grid: counts sum to the token count
    assert sum(tlh.sample_counts) == pytest.approx(10.0)
    ts = entry["token_statistics"]
    assert sorted(ts.token_name) == ["cat", "the"]
    cat = ts[ts.token_name == "cat"].iloc[0]
    assert cat.frequency == 2
    assert cat.fraction_of_sequences == pytest.approx(2 / 3)
    assert cat.per_sequence_min_frequency == 1
    assert cat.per_sequence_avg_frequency == pytest.approx(1.0)
    pos = cat.positions
    assert list(pos.columns) == ["high_values", "low_values", "sample_counts"]
    assert sum(pos.sample_counts) == 2  # both 'cat' occurrences bucketed

    # no NL stats anywhere → None (reference returns None)
    bare = compute_statistics(df, StatsOptions())
    assert dvs.get_natural_language_statistics_dataframes(bare) is None
