"""Schema inference & update from a statistics artifact.

Behavioral port of the reference's inference path
(``anomalies/feature_statistics_validator.cc:47-99``, ``schema.cc:374-433``,
``feature_util.cc:513-541``): presence bounds from observed missingness,
value counts from observed valency, string domains for low-cardinality
categorical features (enum threshold default 400), bool-domain detection for
{0,1} ints, semantic domains from custom stats.
"""

from __future__ import annotations

from typing import Optional

from data_validation_spark.schema import (
    BoolDomain,
    FeatureSpec,
    FeatureType,
    ImageDomain,
    IntDomain,
    Presence,
    Schema,
    StringDomain,
    ValueCount,
)
from data_validation_spark.stats.result import DatasetStatsList, FeatureStats
from data_validation_spark.validate.rules import validate_statistics

ENUM_THRESHOLD = 400  # reference default for inferred string domains

_STATS_TO_SCHEMA_TYPE = {
    "INT": FeatureType.INT,
    "FLOAT": FeatureType.FLOAT,
    "STRING": FeatureType.BYTES,
    "BYTES": FeatureType.BYTES,
    "STRUCT": FeatureType.STRUCT,
}


def infer_schema(
    statistics: DatasetStatsList,
    infer_feature_shape: bool = False,
    max_string_domain_size: int = ENUM_THRESHOLD,
) -> Schema:
    ds = statistics.default_slice()
    schema = Schema()
    if ds is None:
        return schema
    for name, fs in sorted(ds.features.items()):
        schema.feature.append(
            _infer_feature(fs, ds.num_examples, infer_feature_shape, max_string_domain_size)
        )
    return schema


def _infer_feature(
    fs: FeatureStats, num_examples: int, infer_shape: bool, max_domain: int
) -> FeatureSpec:
    spec = FeatureSpec(name=fs.name)
    spec.type = _STATS_TO_SCHEMA_TYPE.get(fs.type, FeatureType.BYTES)
    c = fs.common
    # feature_util.cc:513-533 (InitPresenceAndShape): min_count 1 iff at
    # least one present example, else 0 — and nothing else is inferred for a
    # never-present feature; min_fraction 1.0 only with zero missing.
    if c.num_non_missing < 1:
        spec.presence = Presence(min_count=0)
        return spec
    if c.num_missing == 0:
        spec.presence = Presence(min_count=1, min_fraction=1.0)
    else:
        spec.presence = Presence(min_count=1)
    if c.num_non_missing > 0:
        # Per-level (min, max) valency + per-level missing counts
        # (feature_util.cc:75-134 InitValueCount / InitFixedShape via
        # GetMinMaxNumValues / GetNumMissingNested).
        if c.presence_and_valency:
            mmv = [
                (pv.min_num_values, pv.max_num_values) for pv in c.presence_and_valency
            ]
            missings, prev_elems = [], num_examples
            for pv in c.presence_and_valency:
                missings.append(max(prev_elems - pv.num_non_missing, 0))
                prev_elems = pv.tot_num_values
        else:
            mmv = [(c.min_num_values, c.max_num_values)]
            missings = [c.num_missing]
        if (
            infer_shape
            and all(m == 0 for m in missings)
            and all(lo == hi and lo > 0 for lo, hi in mmv)
        ):
            # fixed shape only when every nest level is fully present with
            # constant positive valency; one dim per level
            from data_validation_spark.schema import FixedShape

            spec.shape = FixedShape(dim=[lo for lo, _ in mmv])
        elif len(mmv) > 1:
            # nested: one value_count per level (empty entry when min is 0)
            spec.value_counts = [_init_value_count(lo, hi) for lo, hi in mmv]
        elif mmv[0][0] > 0:
            spec.value_count = _init_value_count(*mmv[0])
    # Bool domain for {0,1} ints (bool_domain_util semantics).
    if fs.type == "INT" and fs.numeric is not None and fs.string is None:
        n = fs.numeric
        if n.min >= 0 and n.max <= 1 and fs.custom.get("source_type") == "BOOLEAN":
            spec.bool_domain = BoolDomain()
    # Semantic domains from custom stats FIRST (custom_domain_util parity):
    # any generator-emitted domain_info (image/NL/bool/time/url/mid) becomes
    # the feature's semantic domain at inference time, and a semantic domain
    # suppresses string-domain inference (the reference's domain dispatch
    # gives semantic domains precedence; domain_info itself never overwrites
    # a domain that already exists — schema_test.cc UpdateSchemaCustomDomains).
    _apply_domain_info(spec, fs)
    # String domain for low-cardinality string features without a semantic
    # domain.
    if fs.type == "STRING" and fs.string is not None and not _spec_has_domain(spec):
        u = fs.string.unique
        if 0 < u <= max_domain and fs.string.rank_histogram:
            values = sorted(b.label for b in fs.string.rank_histogram)
            spec.string_domain = StringDomain(value=values)
    if "image_format_histogram" in fs.custom:
        hist = fs.custom["image_format_histogram"]
        total = sum(hist.values())
        unknown = hist.get("UNKNOWN", 0)
        if total >= 100 and (total - unknown) / total >= 0.8:
            spec.image_domain = ImageDomain()
    return spec


def _init_value_count(lo: int, hi: int) -> ValueCount:
    """feature_util.cc:81-93: min==max → exact (min, max) so same-valency
    required features parse as dense tensors; varying → only min=1; min 0 →
    empty value_count (used for nested levels)."""
    if lo <= 0:
        return ValueCount()
    if lo == hi:
        return ValueCount(min=lo, max=hi)
    return ValueCount(min=1)


def _spec_has_domain(spec: FeatureSpec) -> bool:
    from data_validation_spark.validate.rules import _has_domain

    return _has_domain(spec)


def _apply_domain_info(spec: FeatureSpec, fs: FeatureStats) -> None:
    """Attach the semantic domain named by the ``domain_info`` custom stat
    (BestEffortUpdateCustomDomain role, ``custom_domain_util.cc:44-90`` +
    schema_test.cc:430-560 UpdateSchemaCustomDomains: a feature that already
    carries ANY domain keeps it — domain_info never overwrites)."""
    if _spec_has_domain(spec):
        return
    info = str(fs.custom.get("domain_info") or "")
    if "url_domain" in info:
        from data_validation_spark.schema import URLDomain

        spec.url_domain = URLDomain()
    elif "mid_domain" in info:
        from data_validation_spark.schema import MIDDomain

        spec.mid_domain = MIDDomain()
    elif "image_domain" in info and spec.image_domain is None:
        spec.image_domain = ImageDomain()
    elif "natural_language_domain" in info and spec.natural_language_domain is None:
        from data_validation_spark.schema import NaturalLanguageDomain

        spec.natural_language_domain = NaturalLanguageDomain()
    elif "bool_domain" in info and spec.bool_domain is None:
        spec.bool_domain = BoolDomain()
    elif "time_domain" in info and spec.time_domain is None:
        import re

        from data_validation_spark.schema import TimeDomain

        m = re.search(r"string_format: '([^']*)'", info)
        if m:
            spec.time_domain = TimeDomain(string_format=m.group(1))
        else:
            m = re.search(r"integer_format: (\w+)", info)
            spec.time_domain = TimeDomain(integer_format=m.group(1) if m else None)


def _relax_token_constraints(spec: FeatureSpec, fs: FeatureStats) -> None:
    """Relax each violated token constraint to its observed statistic (the
    reference's constraint->set_* fix semantics)."""
    nl = fs.custom.get("nl_statistics") or {}
    token_stats = nl.get("token_statistics", {})
    for tc in spec.natural_language_domain.token_constraints:
        ts = token_stats.get(tc.value)
        if ts is None:
            continue
        frac = ts.get("fraction_of_sequences", 0.0)
        if tc.min_fraction_of_sequences is not None and frac < tc.min_fraction_of_sequences:
            tc.min_fraction_of_sequences = frac
        if tc.max_fraction_of_sequences is not None and frac > tc.max_fraction_of_sequences:
            tc.max_fraction_of_sequences = frac
        mn = ts.get("per_sequence_min_frequency", 0)
        if tc.min_per_sequence is not None and mn < tc.min_per_sequence:
            tc.min_per_sequence = mn
        mx = ts.get("per_sequence_max_frequency", 0)
        if tc.max_per_sequence is not None and mx > tc.max_per_sequence:
            tc.max_per_sequence = mx


def update_schema(schema: Schema, statistics: DatasetStatsList) -> Schema:
    """Return a copy of ``schema`` relaxed so ``statistics`` validates cleanly —
    the reference's fix-proposal semantics (each anomaly implies a schema edit).
    """
    new = schema.copy()
    ds = statistics.default_slice()
    if ds is None:
        return new
    anomalies = validate_statistics(statistics, new)
    inferred = infer_schema(statistics)
    for a in anomalies.anomalies:
        spec = new.get_feature(a.feature) if a.feature else None
        t = a.type.value
        if t == "SCHEMA_NEW_COLUMN":
            inf = inferred.get_feature(a.feature)
            if inf is not None and new.get_feature(a.feature) is None:
                new.feature.append(inf)
            continue
        if spec is None:
            continue
        fs = ds.feature(a.feature)
        if t in ("FEATURE_TYPE_LOW_NUMBER_PRESENT", "FEATURE_TYPE_LOW_FRACTION_PRESENT",
                 "FEATURE_TYPE_NOT_PRESENT", "SCHEMA_MISSING_COLUMN"):
            if spec.presence is not None and fs is not None:
                frac = fs.common.fraction_present
                spec.presence = Presence(
                    min_count=min(spec.presence.min_count, fs.common.num_non_missing),
                    min_fraction=min(spec.presence.min_fraction, frac),
                )
            elif spec.presence is not None:
                spec.presence = Presence(min_count=0, min_fraction=0.0)
        elif t == "UNEXPECTED_DATA_TYPE" and fs is not None:
            spec.type = _STATS_TO_SCHEMA_TYPE.get(fs.type, spec.type)
        elif t == "FEATURE_TYPE_LOW_NUMBER_VALUES" and fs is not None:
            mmv = fs.common.min_max_num_values()
            if spec.value_count is not None:
                spec.value_count.min = mmv[0][0] or None
            elif spec.value_counts is not None and len(spec.value_counts) == len(mmv):
                for vc, (lo, _) in zip(spec.value_counts, mmv):
                    if vc.min is not None and lo < vc.min:
                        vc.min = lo or None  # observed 0 → clear (reference)
        elif t == "FEATURE_TYPE_HIGH_NUMBER_VALUES" and fs is not None:
            mmv = fs.common.min_max_num_values()
            if spec.value_count is not None:
                spec.value_count.max = mmv[0][1]
            elif spec.value_counts is not None and len(spec.value_counts) == len(mmv):
                for vc, (_, hi) in zip(spec.value_counts, mmv):
                    if vc.max is not None and hi > vc.max:
                        vc.max = hi
        elif t == "VALUE_NESTEDNESS_MISMATCH" and fs is not None:
            # Reference fix (feature_util.cc InitValueCount after clearing):
            # replace the wrong-shape constraint with per-level value_counts.
            spec.value_count = None
            spec.value_counts = [
                ValueCount(min=lo or None, max=hi)
                for lo, hi in fs.common.min_max_num_values()
            ]
        elif t == "FEATURE_MISSING_TYPE":
            spec.type = FeatureType.BYTES
        elif t == "INVALID_SCHEMA_SPECIFICATION" and spec.presence is not None:
            if spec.presence.min_fraction < 0.0:
                spec.presence.min_fraction = 0.0
        elif t == "DOMAIN_INVALID_FOR_TYPE":
            # reference ClearDomain (schema.cc:829-830): drop only the
            # OFFENDING domain(s) so compatible domains keep validating.
            # Two emitters: the type-compatibility gate (re-derive the
            # offending set) and the IntDomain int64-castability check
            # (type-compatible → clear int_domain, int_domain_util.cc
            # clear_field semantics).
            from data_validation_spark.validate.rules import (
                _domain_type_mismatches,
            )

            bad = _domain_type_mismatches(spec)
            if bad:
                for dname in bad:
                    setattr(spec, dname, None)
            else:
                spec.int_domain = None
        elif t == "INVALID_DOMAIN_SPECIFICATION" and spec.bool_domain is not None:
            # UpdateBoolDomainSelf's suggested fix: clear false_value
            spec.bool_domain.false_value = ""
        elif t == "DERIVED_FEATURE_INVALID_SOURCE" and fs is not None:
            spec.validation_derived_source = fs.custom.get("validation_derived_source")
            spec.lifecycle_stage = "VALIDATION_DERIVED"
        elif t == "DERIVED_FEATURE_BAD_LIFECYCLE":
            spec.lifecycle_stage = "VALIDATION_DERIVED"
        elif t == "SEMANTIC_DOMAIN_UPDATE" and fs is not None:
            _apply_domain_info(spec, fs)
        elif t == "FEATURE_COVERAGE_TOO_LOW" and spec.natural_language_domain:
            spec.natural_language_domain.min_coverage = a.measurement
            spec.natural_language_domain.coverage_min = None
        elif (
            t == "FEATURE_COVERAGE_TOO_SHORT_AVG_TOKEN_LENGTH"
            and spec.natural_language_domain
        ):
            spec.natural_language_domain.min_avg_token_length = a.measurement
        elif t.startswith("SEQUENCE_VALUE_") and spec.natural_language_domain and fs is not None:
            _relax_token_constraints(spec, fs)
        elif t == "STATS_NOT_AVAILABLE":
            # Constraints unverifiable without NL stats — reference clears the
            # domain (natural_language_domain_util.cc:169-181).
            spec.natural_language_domain = None
        elif t == "INVALID_FEATURE_SHAPE" and fs is not None:
            spec.shape = None
            spec.value_count = ValueCount(
                min=fs.common.min_num_values, max=fs.common.max_num_values
            )
        elif t in ("INT_TYPE_SMALL_INT", "INT_TYPE_BIG_INT") and fs is not None:
            d = spec.int_domain or IntDomain()
            if fs.numeric:
                if d.min is not None:
                    d.min = min(d.min, int(fs.numeric.min))
                if d.max is not None:
                    d.max = max(d.max, int(fs.numeric.max))
            spec.int_domain = d
        elif t in ("FLOAT_TYPE_SMALL_FLOAT", "FLOAT_TYPE_BIG_FLOAT") and fs is not None:
            d = spec.float_domain
            if fs.numeric and d is not None:
                if d.min is not None:
                    d.min = min(d.min, fs.numeric.min)
                if d.max is not None:
                    d.max = max(d.max, fs.numeric.max)
        elif t == "FLOAT_TYPE_HAS_NAN" and spec.float_domain is not None:
            spec.float_domain.disallow_nan = False
        elif t == "FLOAT_TYPE_HAS_INF" and spec.float_domain is not None:
            spec.float_domain.disallow_inf = False
        elif t == "ENUM_TYPE_UNEXPECTED_STRING_VALUES" and fs is not None:
            dom = new.resolve_string_domain(spec)
            if dom is not None and fs.string is not None:
                observed = [b.label for b in fs.string.rank_histogram]
                existing = set(dom.value)
                dom.value.extend([v for v in observed if v not in existing])
        elif t in ("FEATURE_TYPE_LOW_UNIQUE", "FEATURE_TYPE_HIGH_UNIQUE") and fs is not None:
            if spec.unique_constraints is not None and fs.string is not None:
                u = fs.string.unique
                if spec.unique_constraints.min is not None:
                    spec.unique_constraints.min = min(spec.unique_constraints.min, u)
                if spec.unique_constraints.max is not None:
                    spec.unique_constraints.max = max(spec.unique_constraints.max, u)
        elif t in ("BOOL_TYPE_SMALL_INT", "BOOL_TYPE_BIG_INT", "BOOL_TYPE_UNEXPECTED_STRING",
                   "BOOL_TYPE_UNEXPECTED_FLOAT"):
            spec.bool_domain = None
            if fs is not None and fs.numeric is not None:
                spec.int_domain = None
    return new
