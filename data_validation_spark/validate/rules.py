"""Constraint evaluation: (statistics artifact, Schema) → Anomalies.

Driver-side behavioral port of the reference's C++ validation layer
(``tensorflow_data_validation/anomalies/schema.cc:1012-1195``,
``feature_util.cc``, per-domain ``*_domain_util.cc``,
``dataset_constraints_util.cc``) — the stats artifact is tiny, so this phase
needs no cluster. Reason codes carry TFDV parity (see anomalies.py).
"""

from __future__ import annotations

import math
from typing import Optional

from data_validation_spark.anomalies import (
    Anomalies,
    Anomaly,
    AnomalyType,
    DriftSkewMeasurement,
    Severity,
)
from data_validation_spark.schema import (
    FeatureSpec,
    FeatureType,
    Schema,
)
from data_validation_spark.stats.result import (
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
)
from data_validation_spark.validate import drift as drift_metrics

# stats type → acceptable schema types (schema.cc type-check semantics:
# INT stats satisfy FLOAT schema; STRING stats satisfy BYTES schema).
_TYPE_OK = {
    "INT": {FeatureType.INT, FeatureType.FLOAT},
    "FLOAT": {FeatureType.FLOAT},
    "STRING": {FeatureType.BYTES},
    "BYTES": {FeatureType.BYTES},
    "STRUCT": {FeatureType.STRUCT},
}


def validate_statistics(
    statistics: DatasetStatsList,
    schema: Schema,
    environment: Optional[str] = None,
    previous_statistics: Optional[DatasetStatsList] = None,
    serving_statistics: Optional[DatasetStatsList] = None,
    previous_version_statistics: Optional[DatasetStatsList] = None,
    severity_overrides: Optional[dict[AnomalyType, Severity]] = None,
    new_features_are_warnings: bool = False,
    features_needed: Optional[set] = None,
) -> Anomalies:
    """Validate the default slice of ``statistics`` against ``schema``.

    ``features_needed`` mirrors the reference's ValidationOptions
    (``schema_anomalies.cc:114-117`` ShouldCreateFeature): when given, a
    column present in the data but absent from the schema is only reported
    as SCHEMA_NEW_COLUMN if its name is in the set; other unknown columns
    are ignored entirely.

    ``severity_overrides`` / ``new_features_are_warnings`` mirror the
    reference's ``FeatureStatisticsToProtoConfig`` severity resolution
    (``schema.cc:349-372``): all anomalies default to ERROR, the deprecated
    new-features flag downgrades SCHEMA_NEW_COLUMN to WARNING, and explicit
    per-reason overrides win over both.
    """
    schema = _flatten_struct_domains(schema)
    ds = statistics.default_slice()
    out = Anomalies()
    if ds is None or ds.num_examples == 0:
        out.anomalies.append(
            Anomaly(
                feature="",
                type=AnomalyType.DATA_MISSING,
                short_description="Data is missing",
                description="The dataset contains no examples.",
            )
        )
        return out

    prev = previous_statistics.default_slice() if previous_statistics else None
    serving = serving_statistics.default_slice() if serving_statistics else None
    prev_version = (
        previous_version_statistics.default_slice() if previous_version_statistics else None
    )

    _check_dataset_constraints(ds, schema, prev, prev_version, out)

    # Logical sparse/weighted feature names are schema-known too: their stats
    # rows carry the custom sparse/weighted stats and must not trip the
    # new-column check (reference knows them as paths; cf.
    # validation_api_test.py:1244 where 'weighted_feature' raises only the
    # WEIGHTED_FEATURE_* reasons).
    schema_names = (
        set(schema.feature_names())
        | {s.name for s in schema.sparse_feature}
        | {w.name for w in schema.weighted_feature}
    )
    for name, fs in sorted(ds.features.items()):
        if name not in schema_names:
            if features_needed is not None and name not in features_needed:
                continue
            out.anomalies.append(
                Anomaly(
                    feature=name,
                    type=AnomalyType.SCHEMA_NEW_COLUMN,
                    severity=Severity.ERROR,
                    short_description="New column",
                    description="New column (column in data but not in schema)",
                    slice_key=ds.slice_key,
                )
            )

    for spec in schema.feature:
        if spec.is_deprecated or not schema.feature_in_environment(spec, environment):
            continue
        _check_schema_hygiene(spec, ds, out)
        fs = ds.feature(spec.name)
        if fs is None:
            if spec.is_required():
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.SCHEMA_MISSING_COLUMN,
                        "Column dropped",
                        "Column is completely missing",
                        ds.slice_key,
                    )
                )
            continue
        validate_feature(fs, spec, schema, ds, out)
        _check_comparators(fs, spec, prev, serving, ds, out)

    _check_sparse_weighted(ds, schema, out)
    _resolve_severities(out, severity_overrides, new_features_are_warnings)
    return out


def validate_corresponding_slices(
    statistics: DatasetStatsList,
    schema: Schema,
    environment: Optional[str] = None,
    previous_statistics: Optional[DatasetStatsList] = None,
    serving_statistics: Optional[DatasetStatsList] = None,
    **kwargs,
) -> Anomalies:
    """Validate each slice against the CORRESPONDING slice of the control
    statistics (reference ``validation_api.py:910-958``): sliced stats flatten
    into one unsliced artifact with ``slice(<key>)::feature`` names, the
    schema replicates per slice key, and normal validation runs once.
    DatasetConstraints apply to the overall (default) slice only.
    """
    keys: set[str] = set()
    statistics, k = _flatten_sliced(statistics)
    keys |= k
    if previous_statistics is not None:
        previous_statistics, k = _flatten_sliced(previous_statistics)
        keys |= k
    if serving_statistics is not None:
        serving_statistics, k = _flatten_sliced(serving_statistics)
        keys |= k
    schema = _replicate_schema_for_slices(schema, keys)
    return validate_statistics(
        statistics,
        schema,
        environment=environment,
        previous_statistics=previous_statistics,
        serving_statistics=serving_statistics,
        **kwargs,
    )


def _prepend_slice_name(slice_name: str, name: str) -> str:
    return f"slice({slice_name})::{name}"


def _flatten_sliced(stats: DatasetStatsList) -> tuple[DatasetStatsList, set[str]]:
    import copy as _copy

    default = stats.default_slice()
    if default is None:
        raise ValueError("Missing default slice")
    flat = DatasetStats(
        slice_key=default.slice_key,
        num_examples=default.num_examples,
        weighted_num_examples=default.weighted_num_examples,
    )
    keys: set[str] = set()
    for sl in stats.slices:
        keys.add(sl.slice_key)
        for name, fs in sl.features.items():
            copied = _copy.deepcopy(fs)
            copied.name = _prepend_slice_name(sl.slice_key, name)
            flat.features[copied.name] = copied
    return DatasetStatsList([flat]), keys


def _replicate_schema_for_slices(schema: Schema, slice_names: set[str]) -> Schema:
    import copy as _copy

    out = Schema(
        string_domain=list(schema.string_domain),
        dataset_constraints=schema.dataset_constraints,
        default_environment=list(schema.default_environment),
    )
    for slice_name in sorted(slice_names):
        for f in schema.feature:
            nf = _copy.deepcopy(f)
            nf.name = _prepend_slice_name(slice_name, f.name)
            out.feature.append(nf)
        for sf in schema.sparse_feature:
            nsf = _copy.deepcopy(sf)
            nsf.name = _prepend_slice_name(slice_name, sf.name)
            out.sparse_feature.append(nsf)
        for wf in schema.weighted_feature:
            nwf = _copy.deepcopy(wf)
            nwf.name = _prepend_slice_name(slice_name, wf.name)
            out.weighted_feature.append(nwf)
    return out


def _flatten_struct_domains(schema: Schema) -> Schema:
    """Expand struct_domain children into dotted-path feature specs
    (schema.cc:154-156,511-524): a child of struct feature ``p`` validates as
    ``p.child`` — the engine's stats naming for StructType columns. Per the
    reference's documented quirk, a required child is checked even when the
    parent itself is optional/missing."""
    if not any(f.struct_domain for f in schema.feature):
        return schema
    new = schema.copy()
    flat: list[FeatureSpec] = []

    def expand(spec: FeatureSpec, prefix: str = "") -> None:
        spec.name = prefix + spec.name
        sd = spec.struct_domain
        if sd is not None and spec.type is not None and spec.type != FeatureType.STRUCT:
            # struct_domain on a non-STRUCT declared type: leave the domain
            # in place (the AllowedFeatureTypes gate reports it) and do NOT
            # validate its children — the reference's ClearDomain drops the
            # whole struct_domain (schema.cc:820-831).
            flat.append(spec)
            return
        spec.struct_domain = None
        flat.append(spec)
        if sd:
            for child in sd.feature:
                expand(child, spec.name + ".")

    for f in new.feature:
        expand(f)
    new.feature = flat
    return new


def _resolve_severities(
    out: Anomalies,
    severity_overrides: Optional[dict[AnomalyType, Severity]],
    new_features_are_warnings: bool,
) -> None:
    """Severity resolution (``schema.cc:349-372``): per-reason overrides win;
    the legacy new-features flag downgrades SCHEMA_NEW_COLUMN to WARNING."""
    if not severity_overrides and not new_features_are_warnings:
        return
    for a in out.anomalies:
        if severity_overrides and a.type in severity_overrides:
            a.severity = severity_overrides[a.type]
        elif new_features_are_warnings and a.type == AnomalyType.SCHEMA_NEW_COLUMN:
            a.severity = Severity.WARNING


def _has_domain(spec: FeatureSpec) -> bool:
    return any(
        getattr(spec, f) is not None
        for f in (
            "int_domain",
            "float_domain",
            "string_domain",
            "bool_domain",
            "image_domain",
            "natural_language_domain",
            "time_domain",
            "url_domain",
            "mid_domain",
        )
    ) or bool(spec.domain)


def _check_schema_hygiene(spec: FeatureSpec, ds, out: Anomalies) -> None:
    """Schema self-checks (``schema.cc:735-768``): unnamed features, features
    with a domain but no declared type, negative presence fractions."""
    sk = ds.slice_key
    if not spec.name:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FEATURE_MISSING_NAME,
                "Feature missing name",
                "unspecified name (maybe meant to be the empty string): find "
                "name rather than deprecating.",
                sk,
            )
        )
        return
    if spec.type is None and (spec.domain or spec.string_domain is not None):
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FEATURE_MISSING_TYPE,
                "Feature missing type",
                "unspecified type: inferring the type to be BYTES, given the "
                "domain specified.",
                sk,
            )
        )
    if spec.presence and spec.presence.min_fraction < 0.0:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.INVALID_SCHEMA_SPECIFICATION,
                "Invalid schema specification",
                "min_fraction should not be negative: clear is equal to zero",
                sk,
            )
        )


def _check_sparse_weighted(ds, schema: Schema, out: Anomalies) -> None:
    """Custom-stat-driven sparse/weighted feature checks
    (``anomalies/schema.cc:1197-1292``), plus the name-collision precedence
    of ``schema.cc:226-269``: a weighted feature colliding with a regular or
    sparse feature of the same name → WEIGHTED_FEATURE_NAME_COLLISION; a
    sparse feature colliding with a regular feature →
    SPARSE_FEATURE_NAME_COLLISION (the colliding pair is skipped for the
    per-feature checks, as the reference deprecates both)."""
    feature_names = {f.name for f in schema.feature if not f.is_deprecated}
    sparse_names = {s.name for s in schema.sparse_feature}
    collided: set[str] = set()
    for wf in schema.weighted_feature:
        if wf.name in feature_names or wf.name in sparse_names:
            collided.add(wf.name)
            out.anomalies.append(
                _anom(
                    wf.name,
                    AnomalyType.WEIGHTED_FEATURE_NAME_COLLISION,
                    "Weighted feature name collision",
                    "Weighted feature name collision.",
                    ds.slice_key,
                )
            )
    for sf in schema.sparse_feature:
        if sf.name in collided:
            continue
        if sf.name in feature_names:
            collided.add(sf.name)
            out.anomalies.append(
                _anom(
                    sf.name,
                    AnomalyType.SPARSE_FEATURE_NAME_COLLISION,
                    "Sparse feature name collision",
                    "Sparse feature name collision.",
                    ds.slice_key,
                )
            )
    for sf in schema.sparse_feature:
        if sf.name in collided:
            continue
        fs = ds.feature(sf.name)
        s = fs.custom.get("sparse_feature_stats") if fs else None
        if s is None:
            continue
        # schema.cc:1197-1248 (UpdateSparseFeature): exact wording, per-index
        # reporting, and one anomaly per nonzero min/max diff stat.
        if s.get("missing_value", 0) > 0:
            out.anomalies.append(
                _anom(
                    sf.name,
                    AnomalyType.SPARSE_FEATURE_MISSING_VALUE,
                    "Missing value feature",
                    f"Found {s['missing_value']} examples missing value feature",
                    ds.slice_key,
                    measurement=float(s["missing_value"]),
                )
            )
        mi_by = s.get("missing_index_by_index") or (
            {sf.index_feature or "index": s["missing_index"]}
            if s.get("missing_index", 0)
            else {}
        )
        for idx_name, cnt in mi_by.items():
            if cnt:
                out.anomalies.append(
                    _anom(
                        sf.name,
                        AnomalyType.SPARSE_FEATURE_MISSING_INDEX,
                        "Missing index feature",
                        f"Found {cnt} examples missing index feature: {idx_name}",
                        ds.slice_key,
                        measurement=float(cnt),
                    )
                )
        idx_names = list(
            (s.get("min_length_diff_by_index") or {}).keys()
        ) or ([sf.index_feature] if sf.index_feature else [])
        for idx_name in idx_names:
            for stat_name, key in (
                ("max_length_diff", "max_length_diff_by_index"),
                ("min_length_diff", "min_length_diff_by_index"),
            ):
                d = (s.get(key) or {}).get(idx_name, s.get(stat_name))
                if d is not None and d != 0:
                    out.anomalies.append(
                        _anom(
                            sf.name,
                            AnomalyType.SPARSE_FEATURE_LENGTH_MISMATCH,
                            "Length mismatch between value and index feature",
                            f"Mismatch between index feature: {idx_name} and "
                            f"value column, with {stat_name} = {int(d)}",
                            ds.slice_key,
                        )
                    )
    for wf in schema.weighted_feature:
        if wf.name in collided:
            continue
        fs = ds.feature(wf.name)
        s = fs.custom.get("weighted_feature_stats") if fs else None
        if s is None:
            continue
        if s.get("missing_value", 0) > 0:
            out.anomalies.append(
                _anom(
                    wf.name,
                    AnomalyType.WEIGHTED_FEATURE_MISSING_VALUE,
                    "Missing value feature",
                    f"Found {s['missing_value']} examples missing value feature.",
                    ds.slice_key,
                    measurement=float(s["missing_value"]),
                )
            )
        if s.get("missing_weight", 0) > 0:
            out.anomalies.append(
                _anom(
                    wf.name,
                    AnomalyType.WEIGHTED_FEATURE_MISSING_WEIGHT,
                    "Missing weight feature",
                    f"Found {s['missing_weight']} examples missing weight feature.",
                    ds.slice_key,
                    measurement=float(s["missing_weight"]),
                )
            )
        lo, hi = s.get("min_weight_length_diff"), s.get("max_weight_length_diff")
        if (lo is not None and lo != 0) or (hi is not None and hi != 0):
            # schema.cc:1278-1288: one combined anomaly naming both stats
            out.anomalies.append(
                _anom(
                    wf.name,
                    AnomalyType.WEIGHTED_FEATURE_LENGTH_MISMATCH,
                    "Length mismatch between value and weight feature",
                    "Mismatch between weight and value feature with "
                    f"min_weight_length_diff = {int(lo or 0)} and "
                    f"max_weight_length_diff = {int(hi or 0)}.",
                    ds.slice_key,
                )
            )


def _anom(feature, type_, short, desc, slice_key, measurement=None, threshold=None,
          severity=Severity.ERROR):
    return Anomaly(
        feature=feature,
        type=type_,
        severity=severity,
        short_description=short,
        description=desc,
        slice_key=slice_key,
        measurement=measurement,
        threshold=threshold,
    )


def validate_feature(
    fs: FeatureStats, spec: FeatureSpec, schema: Schema, ds: DatasetStats, out: Anomalies
) -> None:
    sk = ds.slice_key
    c = fs.common

    # ---- presence (feature_util.cc:618-663) -------------------------------
    if c.num_non_missing == 0:
        if spec.is_required():
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.FEATURE_TYPE_NOT_PRESENT,
                    "Column dropped",
                    f"The feature {spec.name} was present in fewer examples than expected: "
                    "it is never present.",
                    sk,
                )
            )
        return  # no further checks possible without values
    if spec.presence:
        if spec.presence.min_count > 0 and c.num_non_missing < spec.presence.min_count:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.FEATURE_TYPE_LOW_NUMBER_PRESENT,
                    "Column dropped",
                    f"The feature was present in fewer examples than expected: "
                    f"minimum count = {spec.presence.min_count}, actual = {c.num_non_missing}",
                    sk,
                    measurement=float(c.num_non_missing),
                    threshold=float(spec.presence.min_count),
                )
            )
        if spec.presence.min_fraction > 0:
            frac = c.fraction_present
            mf = spec.presence.min_fraction
            # min_fraction == 1 tolerates float noise down to 0.9999
            # (reference epsilon special case).
            violated = frac < (0.9999 if mf == 1.0 else mf)
            if violated:
                desc = (
                    "The feature was expected everywhere, but was missing in "
                    f"{_fmt_num(c.num_missing)} examples."
                    if mf == 1.0
                    else f"The feature was present in fewer examples than expected: "
                    f"minimum fraction = {mf:f}, actual = {frac:f}"
                )
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.FEATURE_TYPE_LOW_FRACTION_PRESENT,
                        "Column dropped",
                        desc,
                        sk,
                        measurement=frac,
                        threshold=mf,
                    )
                )

    # ---- type check (schema.cc:1026-1049) ----------------------------------
    if spec.type is not None and fs.type in _TYPE_OK:
        if spec.type not in _TYPE_OK[fs.type]:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.UNEXPECTED_DATA_TYPE,
                    "Unexpected data type",
                    f"Expected data of type: {spec.type.value} but got {fs.type}",
                    sk,
                )
            )

    # ---- value counts (feature_util.cc:136-215) ----------------------------
    _check_value_counts(fs, spec, sk, out)

    # ---- fixed shape (feature_util.cc:558-616) ------------------------------
    if spec.shape is not None:
        size = spec.shape.size
        if c.num_missing > 0 or c.min_num_values != size or c.max_num_values != size:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.INVALID_FEATURE_SHAPE,
                    "Invalid feature shape",
                    "The feature has missing values or variable valency, which is "
                    f"incompatible with declared shape of size {size}.",
                    sk,
                )
            )

    # ---- derived features (schema.cc:1171-1194) ------------------------------
    _check_derived_feature(fs, spec, sk, out)

    # ---- semantic-domain update (schema.cc:1120-1129) ------------------------
    # domain_info custom stat on a feature whose schema has NO domain set →
    # best-effort semantic update, reported as an anomaly.
    if not _has_domain(spec) and fs.custom.get("domain_info"):
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.SEMANTIC_DOMAIN_UPDATE,
                "Updated semantic domain",
                f"Updated semantic domain for feature: {spec.name}",
                sk,
            )
        )

    # ---- domain/type compatibility (schema.cc:81-115,820-831) ---------------
    # The declared schema type must be in each domain kind's allowed set
    # (AllowedFeatureTypes); a mismatched domain reports
    # DOMAIN_INVALID_FOR_TYPE and only ITS checks are skipped (the reference
    # clears just the offending domain_info oneof — here the dataclass can
    # carry several domains, so compatible ones keep validating).
    bad_domains = _domain_type_mismatches(spec)
    for bad_domain in bad_domains:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.DOMAIN_INVALID_FOR_TYPE,
                "The domain does not match the type",
                f'The domain "{bad_domain}" does not match the type: '
                f"{spec.type.value}",
                sk,
            )
        )

    # ---- domains ------------------------------------------------------------
    if "int_domain" not in bad_domains:
        _check_int_domain(fs, spec, sk, out)
    if "float_domain" not in bad_domains:
        _check_float_domain(fs, spec, sk, out)
    if "domain" not in bad_domains and "string_domain" not in bad_domains:
        _check_string_domain(fs, spec, schema, sk, out)
    if "bool_domain" not in bad_domains:
        _check_bool_domain(fs, spec, sk, out)
    if "image_domain" not in bad_domains:
        _check_image_domain(fs, spec, sk, out)
    if "natural_language_domain" not in bad_domains:
        _check_nl_domain(fs, spec, sk, out)

    # ---- unique constraints (feature_util.cc:665-698) ------------------------
    if spec.unique_constraints:
        uc = spec.unique_constraints
        if fs.string is None:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.FEATURE_TYPE_NO_UNIQUE,
                    "No unique values",
                    "UniqueConstraints specified for the feature, but unique values "
                    "were not counted (i.e., feature is not string or categorical).",
                    sk,
                )
            )
        else:
            u = fs.string.unique
            if uc.min is not None and u < uc.min:
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.FEATURE_TYPE_LOW_UNIQUE,
                        "Low number of unique values",
                        f"Expected at least {uc.min} unique values but found only {u}.",
                        sk,
                        measurement=float(u),
                        threshold=float(uc.min),
                    )
                )
            if uc.max is not None and u > uc.max:
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.FEATURE_TYPE_HIGH_UNIQUE,
                        "High number of unique values",
                        f"Expected no more than {uc.max} unique values but found {u}.",
                        sk,
                        measurement=float(u),
                        threshold=float(uc.max),
                    )
                )


def _check_value_counts(fs: FeatureStats, spec: FeatureSpec, sk, out: Anomalies) -> None:
    """``UpdateValueCount`` / ``UpdateValueCounts`` semantics
    (``feature_util.cc:136-215``): singular ``value_count`` is only valid for
    single-nest-level features; plural ``value_counts`` must have exactly one
    entry per nest level. Mismatches emit VALUE_NESTEDNESS_MISMATCH and skip
    the per-level bound checks (the reference clears the constraint)."""
    mmv = fs.common.min_max_num_values()
    levels = len(mmv)
    if spec.value_count is not None:
        if levels > 1:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.VALUE_NESTEDNESS_MISMATCH,
                    "Mismatched value nest level",
                    "This feature has a value_count, but the nestedness level of "
                    "the feature > 1. For features with nestedness levels greater "
                    "than 1, value_counts, not value_count, should be specified.",
                    sk,
                )
            )
        else:
            _check_one_value_count(spec.name, spec.value_count, mmv[0], None, sk, out)
    if spec.value_counts is not None:
        if len(spec.value_counts) != levels:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.VALUE_NESTEDNESS_MISMATCH,
                    "Mismatched value nest level",
                    "The values have a different nest level than expected. "
                    "Value counts will not be checked.",
                    sk,
                    measurement=float(levels),
                    threshold=float(len(spec.value_counts)),
                )
            )
        else:
            for i, (vc, mm) in enumerate(zip(spec.value_counts, mmv)):
                _check_one_value_count(spec.name, vc, mm, i, sk, out)


def _check_one_value_count(name, vc, min_max, level, sk, out: Anomalies) -> None:
    lo, hi = min_max
    at = f" at nestedness level {level}" if level is not None else ""
    if vc.min is not None and lo < vc.min:
        out.anomalies.append(
            _anom(
                name,
                AnomalyType.FEATURE_TYPE_LOW_NUMBER_VALUES,
                "Missing values",
                f"Some examples have fewer values than expected{at}.",
                sk,
                measurement=float(lo),
                threshold=float(vc.min),
            )
        )
    if vc.max is not None and hi > vc.max:
        out.anomalies.append(
            _anom(
                name,
                AnomalyType.FEATURE_TYPE_HIGH_NUMBER_VALUES,
                "Superfluous values",
                f"Some examples have more values than expected{at}.",
                sk,
                measurement=float(hi),
                threshold=float(vc.max),
            )
        )


def _check_derived_feature(fs: FeatureStats, spec: FeatureSpec, sk, out: Anomalies) -> None:
    """Derived-feature bookkeeping (``schema.cc:1171-1194``): statistics mark
    a feature as validation-derived via the ``validation_derived_source``
    custom stat; the schema must carry the source and the VALIDATION_DERIVED
    lifecycle stage."""
    stats_source = fs.custom.get("validation_derived_source")
    if stats_source and not spec.validation_derived_source:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.DERIVED_FEATURE_INVALID_SOURCE,
                "Derived source not set in schema.",
                "Derived source not set in schema.",
                sk,
            )
        )
    if (
        spec.validation_derived_source
        and spec.lifecycle_stage != "VALIDATION_DERIVED"
        and not spec.is_deprecated
    ):
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.DERIVED_FEATURE_BAD_LIFECYCLE,
                "Derived feature has wrong lifecycle.",
                "Derived feature has wrong lifecycle.",
                sk,
            )
        )


def _observed_range(fs: FeatureStats):
    n = fs.numeric
    if n is None:
        return None, None
    lo = n.min
    hi = n.max
    return lo, hi


def _domain_type_mismatches(spec: FeatureSpec) -> set:
    """AllowedFeatureTypes (``schema.cc:81-115``): which declared schema
    types each domain kind accepts. Returns the set of offending domain_info
    field names (reference ``GetDomainInfoName`` = proto field names)."""
    t = spec.type
    if t is None:
        return set()
    B, I, F, S = (
        FeatureType.BYTES,
        FeatureType.INT,
        FeatureType.FLOAT,
        FeatureType.STRUCT,
    )
    checks = (
        ("domain", bool(spec.domain), {B}),
        ("bool_domain", spec.bool_domain is not None, {I, B, F}),
        ("int_domain", spec.int_domain is not None, {I, B}),
        ("float_domain", spec.float_domain is not None, {F, B}),
        ("string_domain", spec.string_domain is not None, {B}),
        ("struct_domain", spec.struct_domain is not None, {S}),
        (
            "natural_language_domain",
            spec.natural_language_domain is not None,
            {B, I},
        ),
        ("image_domain", spec.image_domain is not None, {B}),
        ("time_domain", spec.time_domain is not None, {I, B}),
    )
    return {
        name for name, present, allowed in checks if present and t not in allowed
    }


def _check_int_domain(fs, spec, sk, out):
    if spec.int_domain is None:
        return
    d = spec.int_domain
    int64_lo, int64_hi = -(1 << 63), (1 << 63) - 1
    if fs.string is not None and fs.type in ("STRING", "INT"):
        # int domain on a string / categorical-int feature: every observed
        # value must parse as an int64 (int_domain_util.cc:97-122 string
        # path; SimpleAtoi also rejects int64 overflow). On an INT-typed
        # feature with bounds, an unparseable value makes the DOMAIN invalid
        # (int_domain_util.cc:158-168); on a BYTES/STRING feature it is an
        # INT_TYPE_NOT_INT_STRING value anomaly (:150-157).
        lo = hi = None
        for b in fs.string.rank_histogram:
            try:
                v = int(b.label)
                if not int64_lo <= v <= int64_hi:
                    raise ValueError
            except ValueError:
                if fs.type == "INT":
                    if d.min is not None or d.max is not None:
                        out.anomalies.append(
                            _anom(
                                spec.name,
                                AnomalyType.DOMAIN_INVALID_FOR_TYPE,
                                "Invalid values",
                                "Integer had values that were not valid Int64, "
                                f'such as "{b.label}".',
                                sk,
                            )
                        )
                    return
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.INT_TYPE_NOT_INT_STRING,
                        "Non-integer string values",
                        f'String values that were not ints were found, such as "{b.label}".',
                        sk,
                    )
                )
                return
            lo = v if lo is None else min(lo, v)
            hi = v if hi is None else max(hi, v)
        if lo is None:
            return
        lo, hi = float(lo), float(hi)
    else:
        lo, hi = _observed_range(fs)
        if lo is None:
            return
        # IntDomain is interpreted as castable-to-int64
        # (int_domain_util.cc:77-92): observed values beyond int64 with
        # bounds configured invalidate the domain rather than the values.
        # Strict > deliberately: float(int64_hi) rounds up to 2^63, so a max
        # of exactly 2.0**63 passes — the reference's own double comparison
        # (`num_stats().max() > LLONG_MAX`, :85-88) has the same boundary
        # behavior, and parity wins over mathematical tightness here.
        if (d.min is not None or d.max is not None) and (
            lo < float(int64_lo) or hi > float(int64_hi)
        ):
            bad = lo if lo < float(int64_lo) else hi
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.DOMAIN_INVALID_FOR_TYPE,
                    "Invalid values",
                    "Integer had values that were not valid Int64, such as "
                    f'"{bad:.6f}".',
                    sk,
                )
            )
            return
    if d.min is not None and lo < d.min:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.INT_TYPE_SMALL_INT,
                "Out-of-range values",
                f"Unexpectedly small value: {_fmt_num(lo)}.",
                sk,
                measurement=lo,
                threshold=float(d.min),
            )
        )
    if d.max is not None and hi > d.max:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.INT_TYPE_BIG_INT,
                "Out-of-range values",
                f"Unexpectedly large value: {_fmt_num(hi)}.",
                sk,
                measurement=hi,
                threshold=float(d.max),
            )
        )


def _check_float_domain(fs, spec, sk, out):
    if spec.float_domain is None:
        return
    d = spec.float_domain
    if fs.type == "STRING" and fs.string is not None and fs.numeric is None:
        # float domain on a string feature (float_domain_util.cc parsing path)
        for b in fs.string.rank_histogram:
            try:
                float(b.label)
            except ValueError:
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.FLOAT_TYPE_STRING_NOT_FLOAT,
                        "Non-float string values",
                        f"String value '{b.label}' does not parse as a float.",
                        sk,
                    )
                )
                return
        return
    n = fs.numeric
    if n is None:
        return
    if d.min is not None and n.min < d.min:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FLOAT_TYPE_SMALL_FLOAT,
                "Out-of-range values",
                f"Unexpectedly low values: {_fmt_num(n.min)}<{_fmt_num(d.min)}"
                "(upto six significant digits)",
                sk,
                measurement=n.min,
                threshold=d.min,
            )
        )
    if d.max is not None and n.max > d.max:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FLOAT_TYPE_BIG_FLOAT,
                "Out-of-range values",
                f"Unexpectedly high value: {_fmt_num(n.max)}>{_fmt_num(d.max)}"
                "(upto six significant digits)",
                sk,
                measurement=n.max,
                threshold=d.max,
            )
        )
    if d.disallow_nan and n.num_nan > 0:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FLOAT_TYPE_HAS_NAN,
                "Invalid values",
                "Float feature has NaN values.",
                sk,
                measurement=float(n.num_nan),
            )
        )
    if d.disallow_inf and (n.num_pos_inf + n.num_neg_inf) > 0:
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.FLOAT_TYPE_HAS_INF,
                "Invalid values",
                "Float feature has Inf values.",
                sk,
                measurement=float(n.num_pos_inf + n.num_neg_inf),
            )
        )


def _percentage_as_string(count: float, total: float) -> str:
    """string_domain_util.cc:75-89 (PercentageAsString): '?' when the total
    is unknown/zero, '<1%' below one percent, else '~N%' with N floored."""
    if not total:
        return "?"
    percent = 100.0 * count / total
    if percent < 1.0:
        return "<1%"
    return "~%d%%" % math.floor(percent)


def _check_string_domain(fs, spec, schema, sk, out):
    domain = schema.resolve_string_domain(spec)
    if domain is None:
        return
    st = fs.string
    if st is None:
        return
    if st.invalid_utf8_count > 0:
        # invalid UTF-8 short-circuits the enum check entirely
        # (string_domain_util.cc:157-164)
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.ENUM_TYPE_INVALID_UTF8,
                "Invalid UTF8 strings",
                "Found strings that were not valid UTF8 strings.",
                sk,
                measurement=float(st.invalid_utf8_count),
            )
        )
        return
    if not st.rank_histogram:
        return
    counts = st.value_counts()
    hist_total = sum(counts.values())
    if hist_total == 0:
        return
    # GetTotalValueCountInExamples: the common-stats value count; a hand-built
    # artifact may omit it (0) → percentages render as '?'
    total = float(fs.common.tot_num_values or 0)
    off = {k: v for k, v in counts.items() if k not in set(domain.value)}
    off_mass = sum(off.values()) / (total or hist_total)
    min_mass = domain.min_domain_mass
    if spec.distribution_constraints is not None:
        min_mass = min(min_mass, spec.distribution_constraints.min_domain_mass)
    max_off_domain = 1.0 - min_mass
    if off_mass > max_off_domain + 1e-12 or (max_off_domain == 0 and off):
        # exact reference rendering (string_domain_util.cc:166-197): every
        # missing value in lexicographic order with its frequency percentage
        rendered = ", ".join(
            f"{v} ({_percentage_as_string(off[v], total)})" for v in sorted(off)
        )
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.ENUM_TYPE_UNEXPECTED_STRING_VALUES,
                "Unexpected string values",
                f"Examples contain values missing from the schema: {rendered}. ",
                sk,
                measurement=off_mass,
                threshold=max_off_domain,
            )
        )


def _check_bool_domain(fs, spec, sk, out):
    if spec.bool_domain is None:
        return
    d = spec.bool_domain
    if d.true_value and d.false_value and d.true_value == d.false_value:
        # UpdateBoolDomainSelf (bool_domain_util.cc:78-91): true and false
        # values equal is a malformed domain; the reference clears false_value
        # and reports with this exact description.
        out.anomalies.append(
            _anom(
                spec.name,
                AnomalyType.INVALID_DOMAIN_SPECIFICATION,
                "Malformed BoolDomain",
                f"True and false value equal for BoolDomain:{d.true_value}. "
                "The suggested change is to clear the false_value, but a "
                "domain expert should review this change.",
                sk,
            )
        )
        return
    if fs.type == "INT" and fs.numeric is not None:
        # UpdateBoolDomain INT branch (bool_domain_util.cc:189-212): the first
        # out-of-{0,1} extreme reports and converts; exact reference strings.
        if fs.numeric.min < 0:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.BOOL_TYPE_SMALL_INT,
                    "Non-boolean values",
                    f"Integers (such as {_fmt_num(fs.numeric.min)}) not in "
                    "{0, 1}: converting to an integer.",
                    sk,
                    measurement=fs.numeric.min,
                )
            )
        elif fs.numeric.max > 1:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.BOOL_TYPE_BIG_INT,
                    "Non-boolean values",
                    f"Integers (such as {_fmt_num(fs.numeric.max)}) not in "
                    "{0, 1}: converting to an integer.",
                    sk,
                    measurement=fs.numeric.max,
                )
            )
    elif fs.type == "FLOAT":
        # FLOAT branch (bool_domain_util.cc:213-280): a float feature whose
        # values are all exactly 0/1 is a VALID bool; flag only out-of-{0,1}
        # extremes, NaN, or interior mass detected via the quantiles
        # histogram. One anomaly, first detection wins.
        n = fs.numeric
        detail = None
        if n is not None:
            if n.min not in (0.0, 1.0):
                detail = f"Floats (such as {_fmt_num(n.min)}) not in {{0, 1}}"
            elif n.max not in (0.0, 1.0):
                detail = f"Floats (such as {_fmt_num(n.max)}) not in {{0, 1}}"
            elif n.num_nan > 0:
                detail = "Floats (such as NaN) not in {0, 1}"
            else:
                for h in n.histograms:
                    if detail:
                        break
                    for b in h.buckets:
                        if b.sample_count <= 0:
                            continue
                        if b.high_value < 0:
                            detail = "Float values < 0 not in {0, 1}"
                            break
                        if b.low_value > 1:
                            detail = "Float values > 1 not in {0, 1}"
                            break
                        if h.type == "QUANTILES" and b.high_value < 1 and b.low_value > 0:
                            detail = "Float values falling between 0 and 1"
                            break
        if detail is not None:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.BOOL_TYPE_UNEXPECTED_FLOAT,
                    "Non-boolean values",
                    f"{detail}: converting to float_domain.",
                    sk,
                )
            )
    elif fs.type == "STRING" and fs.string is not None:
        allowed = {d.true_value, d.false_value} - {""}
        bad = [b.label for b in fs.string.rank_histogram if b.label not in allowed]
        if bad:
            valid_desc = (
                "{}"
                if not allowed
                else "{" + ", ".join(f'"{v}"' for v in sorted(allowed)) + "}"
            )
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.BOOL_TYPE_UNEXPECTED_STRING,
                    "Non-boolean values",
                    f'Saw unexpected value "{bad[0]}" instead of {valid_desc}.',
                    sk,
                )
            )


def _check_image_domain(fs, spec, sk, out):
    """Port of ``anomalies/image_domain_util.cc:43-108``."""
    if spec.image_domain is None:
        return
    d = spec.image_domain
    if d.minimum_supported_image_fraction is not None:
        hist = fs.custom.get("image_format_histogram")
        if hist:
            total = sum(hist.values())
            unknown = hist.get("UNKNOWN", 0)
            supported = (total - unknown) / total if total else 0.0
            if supported < d.minimum_supported_image_fraction:
                out.anomalies.append(
                    _anom(
                        spec.name,
                        AnomalyType.LOW_SUPPORTED_IMAGE_FRACTION,
                        "Low supported image fraction",
                        f"Fraction of values containing a supported image format "
                        f"({supported:.6g}) is below the threshold "
                        f"({d.minimum_supported_image_fraction}).",
                        sk,
                        measurement=supported,
                        threshold=d.minimum_supported_image_fraction,
                    )
                )
    if d.max_image_byte_size is not None and fs.bytes is not None:
        if fs.bytes.max_num_bytes > d.max_image_byte_size:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.MAX_IMAGE_BYTE_SIZE_EXCEEDED,
                    "Num bytes exceeds the max byte size.",
                    f"The largest image has bytes: {int(fs.bytes.max_num_bytes)}. "
                    f"The max allowed byte size is: {d.max_image_byte_size}.",
                    sk,
                    measurement=fs.bytes.max_num_bytes,
                    threshold=float(d.max_image_byte_size),
                )
            )


def _check_nl_domain(fs, spec, sk, out):
    """NL domain constraints (``natural_language_domain_util.cc:48-142``):
    coverage + avg-token-length thresholds and per-token sequence
    constraints, evaluated against the ``nl_statistics`` custom stat."""
    if spec.natural_language_domain is None:
        return
    d = spec.natural_language_domain
    nl = fs.custom.get("nl_statistics")
    min_cov = d.effective_min_coverage()
    has_constraints = (
        min_cov is not None
        or d.min_avg_token_length is not None
        or bool(d.token_constraints)
    )
    if nl is None:
        # Back-compat: a bare coverage number may exist without full nl stats.
        cov = fs.custom.get("nl_coverage")
        if cov is not None and min_cov is not None:
            nl = {"feature_coverage": cov}
        elif has_constraints:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.STATS_NOT_AVAILABLE,
                    "Natural language stats are not computed.",
                    "Constraints specified in natural language domain cannot be "
                    "verified because natural language stats have not been computed.",
                    sk,
                )
            )
            return
        else:
            return
    if min_cov is not None:
        cov = nl.get("feature_coverage")
        if cov is not None and cov < min_cov:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.FEATURE_COVERAGE_TOO_LOW,
                    "Feature coverage is too low.",
                    f"Fraction of tokens in the vocabulary: {cov:.6g} is lower "
                    f"than the threshold set in the Schema: {min_cov}.",
                    sk,
                    measurement=cov,
                    threshold=min_cov,
                )
            )
    if d.min_avg_token_length is not None:
        atl = nl.get("avg_token_length")
        if atl is not None and atl < d.min_avg_token_length:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.FEATURE_COVERAGE_TOO_SHORT_AVG_TOKEN_LENGTH,
                    "Average token length is too short.",
                    f"Average token length is: {atl:.6g} which is lower than the "
                    f"threshold set in the Schema: {d.min_avg_token_length}.",
                    sk,
                    measurement=atl,
                    threshold=d.min_avg_token_length,
                )
            )
    token_stats = nl.get("token_statistics", {})
    for tc in d.token_constraints:
        ts = token_stats.get(tc.value)
        if ts is None:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.STATS_NOT_AVAILABLE,
                    "Natural language stats are not computed.",
                    f"Token constraints for value: {tc.value} cannot be "
                    "verified because its token statistics were not computed.",
                    sk,
                )
            )
            continue
        frac = ts.get("fraction_of_sequences", 0.0)
        if tc.min_fraction_of_sequences is not None and frac < tc.min_fraction_of_sequences:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.SEQUENCE_VALUE_TOO_SMALL_FRACTION,
                    "Value occurs in too small a fraction of sequences.",
                    f"Fraction of sequences with value: {tc.value} is: {frac:.6g} "
                    f"which is lower than the threshold set in the Schema: "
                    f"{tc.min_fraction_of_sequences}.",
                    sk,
                    measurement=frac,
                    threshold=tc.min_fraction_of_sequences,
                )
            )
        if tc.max_fraction_of_sequences is not None and frac > tc.max_fraction_of_sequences:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.SEQUENCE_VALUE_TOO_LARGE_FRACTION,
                    "Value occurs in too large a fraction of sequences.",
                    f"Fraction of sequences with value: {tc.value} is: {frac:.6g} "
                    f"which is higher than the threshold set in the Schema: "
                    f"{tc.max_fraction_of_sequences}.",
                    sk,
                    measurement=frac,
                    threshold=tc.max_fraction_of_sequences,
                )
            )
        mn = ts.get("per_sequence_min_frequency", 0)
        if tc.min_per_sequence is not None and mn < tc.min_per_sequence:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.SEQUENCE_VALUE_TOO_FEW_OCCURRENCES,
                    "Value has too few per-sequence occurrences.",
                    f"Value: {tc.value} occurs at least: {mn} times within a "
                    f"sequence, which is lower than the threshold set in the "
                    f"Schema: {tc.min_per_sequence}.",
                    sk,
                    measurement=float(mn),
                    threshold=float(tc.min_per_sequence),
                )
            )
        mx = ts.get("per_sequence_max_frequency", 0)
        if tc.max_per_sequence is not None and mx > tc.max_per_sequence:
            out.anomalies.append(
                _anom(
                    spec.name,
                    AnomalyType.SEQUENCE_VALUE_TOO_MANY_OCCURRENCES,
                    "Value has too many per-sequence occurrences.",
                    f"Value: {tc.value} occurs at most: {mx} times within a "
                    f"sequence, which is higher than the threshold set in the "
                    f"Schema: {tc.max_per_sequence}.",
                    sk,
                    measurement=float(mx),
                    threshold=float(tc.max_per_sequence),
                )
            )


def _check_comparators(fs, spec, prev, serving, ds, out):
    """Drift (vs previous span) / skew (vs serving) comparators
    (``feature_util.cc:288-492``)."""
    for comparator, other, which, missing_type in (
        (spec.drift_comparator, prev, "drift", AnomalyType.COMPARATOR_CONTROL_DATA_MISSING),
        (spec.skew_comparator, serving, "skew", AnomalyType.COMPARATOR_CONTROL_DATA_MISSING),
    ):
        if comparator is None:
            continue
        if other is None:
            # No control dataset supplied at all → comparator not evaluated
            # (reference skips drift checks without previous/serving stats).
            continue
        if other.feature(spec.name) is None:
            out.anomalies.append(
                _anom(
                    spec.name,
                    missing_type,
                    f"{which} control data missing",
                    f"The {which} comparator requires control statistics "
                    "but none were provided for this feature.",
                    ds.slice_key,
                    severity=Severity.ERROR,
                )
            )
            continue
        ofs = other.feature(spec.name)
        sides = "current and previous" if which == "drift" else "training and serving"
        if comparator.infinity_norm_threshold is not None:
            val, max_label = _linf(fs, ofs)
            if val is not None:
                out.drift_skew_info.append(
                    DriftSkewMeasurement(
                        spec.name, "L_INFTY", val, comparator.infinity_norm_threshold
                    )
                )
                if val > comparator.infinity_norm_threshold:
                    # Wording parity with the reference golden
                    # (feature_util.cc L-infty message; validation_api_test.py
                    # _annotated_enum_anomaly_info / _bar_anomaly_info).
                    out.anomalies.append(
                        _anom(
                            spec.name,
                            AnomalyType.COMPARATOR_L_INFTY_HIGH,
                            f"High Linfty distance between {sides}",
                            f"The Linfty distance between {sides} is {val:.6g} "
                            f"(up to six significant digits), above the threshold "
                            f"{comparator.infinity_norm_threshold}. The feature value "
                            f"with maximum difference is: {max_label}",
                            ds.slice_key,
                            measurement=val,
                            threshold=comparator.infinity_norm_threshold,
                        )
                    )
        if comparator.jensen_shannon_divergence_threshold is not None:
            val = _jsd(fs, ofs, comparator.jensen_shannon_source)
            if val is not None:
                out.drift_skew_info.append(
                    DriftSkewMeasurement(
                        spec.name,
                        "JENSEN_SHANNON_DIVERGENCE",
                        val,
                        comparator.jensen_shannon_divergence_threshold,
                    )
                )
                if val > comparator.jensen_shannon_divergence_threshold:
                    out.anomalies.append(
                        _anom(
                            spec.name,
                            AnomalyType.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH,
                            f"High approximate Jensen-Shannon divergence between {sides}",
                            f"The approximate Jensen-Shannon divergence between {sides} "
                            f"is {val:.6g} (up to six significant digits), above the "
                            f"threshold {comparator.jensen_shannon_divergence_threshold:.6g}.",
                            ds.slice_key,
                            measurement=val,
                            threshold=comparator.jensen_shannon_divergence_threshold,
                        )
                    )
        if comparator.normalized_abs_difference_threshold is not None:
            val, nad_label = _nad(fs, ofs)
            if val is not None:
                out.drift_skew_info.append(
                    DriftSkewMeasurement(
                        spec.name,
                        "NORMALIZED_ABSOLUTE_DIFFERENCE",
                        val,
                        comparator.normalized_abs_difference_threshold,
                    )
                )
                if val > comparator.normalized_abs_difference_threshold:
                    out.anomalies.append(
                        _anom(
                            spec.name,
                            AnomalyType.COMPARATOR_NORMALIZED_ABSOLUTE_DIFFERENCE_HIGH,
                            f"High normalized absolute difference between {sides}",
                            f"The normalized absolute difference between {sides} is "
                            f"{val:.6g} (up to six significant digits), above the "
                            f"threshold {comparator.normalized_abs_difference_threshold:.6g}. "
                            f"The feature value with maximum difference is: {nad_label}",
                            ds.slice_key,
                            measurement=val,
                            threshold=comparator.normalized_abs_difference_threshold,
                        )
                    )


def _drift_counts(st):
    """Value-count map for drift metrics: weighted when the run carried a
    weight column (the reference's by_weight view), else unweighted."""
    if st.weighted_rank_histogram:
        return {b.label: b.sample_count for b in st.weighted_rank_histogram}
    return st.value_counts()


def _linf(fs, ofs) -> tuple[Optional[float], Optional[str]]:
    if fs.string is None or ofs.string is None:
        return None, None
    # weighted maps only when BOTH sides carry them (mixed runs fall back to
    # unweighted so the comparison stays apples-to-apples)
    if fs.string.weighted_rank_histogram and ofs.string.weighted_rank_histogram:
        a, b = _drift_counts(fs.string), _drift_counts(ofs.string)
    else:
        a, b = fs.string.value_counts(), ofs.string.value_counts()
    label, val = drift_metrics.linfty_distance(a, b)
    return val, label


def _jsd(fs, ofs, source: str = "STANDARD") -> Optional[float]:
    """``source`` selects the histogram type for numeric JSD — STANDARD
    (equi-width; outlier-sensitive) or QUANTILES — reference
    HistogramSelection (statistics_view.cc:489-509, metrics.cc:418-435)."""
    if fs.string is not None and ofs.string is not None:
        return drift_metrics.jensen_shannon_divergence_counts(
            fs.string.value_counts(), ofs.string.value_counts()
        )
    if fs.numeric is not None and ofs.numeric is not None:
        h1 = fs.numeric.histogram(source)
        h2 = ofs.numeric.histogram(source)
        if h1 is None or h2 is None:
            return None
        return drift_metrics.jensen_shannon_divergence_histograms(h1, h2)
    return None


def _nad(fs, ofs):
    """(value, max-difference label) — NormalizedAbsoluteDifference returns
    both (feature_util.cc:330-345)."""
    if fs.string is None or ofs.string is None:
        return None, None
    label, val = drift_metrics.normalized_absolute_difference(
        fs.string.value_counts(), ofs.string.value_counts()
    )
    return val, label


def _check_dataset_constraints(ds, schema, prev, prev_version, out):
    """Port of ``dataset_constraints_util.cc:47-156``."""
    dc = schema.dataset_constraints
    if dc is None:
        return
    n = ds.num_examples
    if dc.min_examples_count is not None and n < dc.min_examples_count:
        out.anomalies.append(
            _anom(
                "",
                AnomalyType.DATASET_LOW_NUM_EXAMPLES,
                "Low num examples in dataset.",
                f"The dataset has {n} examples, which is fewer than expected.",
                ds.slice_key,
                measurement=float(n),
                threshold=float(dc.min_examples_count),
            )
        )
    if dc.max_examples_count is not None and n > dc.max_examples_count:
        out.anomalies.append(
            _anom(
                "",
                AnomalyType.DATASET_HIGH_NUM_EXAMPLES,
                "High num examples in dataset.",
                f"The dataset has {n} examples, which is more than expected.",
                ds.slice_key,
                measurement=float(n),
                threshold=float(dc.max_examples_count),
            )
        )
    for comp, other, control_name in (
        (dc.num_examples_drift_comparator, prev, "previous span"),
        (dc.num_examples_version_comparator, prev_version, "previous version"),
    ):
        if comp is None or other is None or other.num_examples == 0:
            continue
        ratio = n / other.num_examples
        if comp.min_fraction_threshold is not None and ratio < comp.min_fraction_threshold:
            out.anomalies.append(
                _anom(
                    "",
                    AnomalyType.COMPARATOR_LOW_NUM_EXAMPLES,
                    f"Low num examples in current dataset versus the {control_name}.",
                    f"The ratio of num examples in the current dataset versus the "
                    f"{control_name} is {ratio:.6g} (up to six significant digits), "
                    f"which is below the threshold {_fmt_num(comp.min_fraction_threshold)}.",
                    ds.slice_key,
                    measurement=ratio,
                    threshold=comp.min_fraction_threshold,
                )
            )
        if comp.max_fraction_threshold is not None and ratio > comp.max_fraction_threshold:
            out.anomalies.append(
                _anom(
                    "",
                    AnomalyType.COMPARATOR_HIGH_NUM_EXAMPLES,
                    f"High num examples in current dataset versus the {control_name}.",
                    f"The ratio of num examples in the current dataset versus the "
                    f"{control_name} is {ratio:.6g} (up to six significant digits), "
                    f"which is above the threshold {_fmt_num(comp.max_fraction_threshold)}.",
                    ds.slice_key,
                    measurement=ratio,
                    threshold=comp.max_fraction_threshold,
                )
            )


def _fmt_num(v: float) -> str:
    if math.isfinite(v) and v == math.floor(v):
        return str(int(v))
    return f"{v:.6g}"
