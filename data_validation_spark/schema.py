"""Constraint-schema spec — the engine's analogue of the TFMD ``Schema`` proto.

Field-level parity with the reference's schema consumption
(``tensorflow_data_validation/anomalies/schema.cc:81-115,1012-1195``), expressed
as plain dataclasses with JSON round-tripping. No protobuf dependency.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class FeatureType(str, Enum):
    INT = "INT"
    FLOAT = "FLOAT"
    BYTES = "BYTES"  # covers string + binary, as in the reference
    STRUCT = "STRUCT"


# LifecycleStageIsDeprecated (feature_util.cc:239-266): features in these
# stages are exempt from validation (UNKNOWN_STAGE / BETA / PRODUCTION /
# VALIDATION_DERIVED are not).
_DEPRECATED_STAGES = {"PLANNED", "ALPHA", "DEPRECATED", "DEBUG_ONLY", "DISABLED"}


@dataclass
class Presence:
    """Cf. reference presence constraints (``anomalies/feature_util.cc:618-663``)."""

    min_count: int = 0
    min_fraction: float = 0.0


@dataclass
class ValueCount:
    """Per-row valency bounds (``anomalies/feature_util.cc:136-215``)."""

    min: Optional[int] = None
    max: Optional[int] = None


@dataclass
class FixedShape:
    """Declared dense shape; any missing/variable valency violates it."""

    dim: list[int] = field(default_factory=list)

    @property
    def size(self) -> int:
        n = 1
        for d in self.dim:
            n *= d
        return n


@dataclass
class IntDomain:
    min: Optional[int] = None
    max: Optional[int] = None
    is_categorical: bool = False


@dataclass
class FloatDomain:
    min: Optional[float] = None
    max: Optional[float] = None
    disallow_nan: bool = False
    disallow_inf: bool = False
    is_categorical: bool = False


@dataclass
class StringDomain:
    name: str = ""
    value: list[str] = field(default_factory=list)
    # Fraction of value mass that must fall inside the domain.
    min_domain_mass: float = 1.0


@dataclass
class BoolDomain:
    name: str = ""
    true_value: str = ""
    false_value: str = ""


@dataclass
class ImageDomain:
    """Cf. ``anomalies/image_domain_util.cc:43-108``."""

    minimum_supported_image_fraction: Optional[float] = None
    max_image_byte_size: Optional[int] = None


@dataclass
class URLDomain:
    """Marker semantic domain (TFMD URLDomain — no constraints;
    set via domain_info, ``custom_domain_util.cc:44-90``)."""


@dataclass
class MIDDomain:
    """Marker semantic domain (TFMD MIDDomain, Knowledge-Graph MIDs)."""


@dataclass
class TokenConstraint:
    """Per-token sequence constraints (TFMD ``SequenceValueConstraints``,
    checked in ``natural_language_domain_util.cc:76-142``)."""

    value: Optional[str] = None  # the token (string form)
    min_fraction_of_sequences: Optional[float] = None
    max_fraction_of_sequences: Optional[float] = None
    min_per_sequence: Optional[int] = None
    max_per_sequence: Optional[int] = None


@dataclass
class NaturalLanguageDomain:
    coverage_min: Optional[float] = None  # legacy alias of min_coverage
    min_coverage: Optional[float] = None
    min_avg_token_length: Optional[float] = None
    token_constraints: list[TokenConstraint] = field(default_factory=list)
    # Name of the vocabulary for coverage/OOV checks, resolved to a file via
    # StatsOptions.vocab_paths (TFMD NaturalLanguageDomain.vocabulary;
    # natural_language_stats_generator.py:597-599).
    vocabulary: Optional[str] = None

    def effective_min_coverage(self) -> Optional[float]:
        return self.min_coverage if self.min_coverage is not None else self.coverage_min


@dataclass
class TimeDomain:
    string_format: Optional[str] = None
    integer_format: Optional[str] = None  # e.g. "UNIX_SECONDS"


@dataclass
class UniqueConstraints:
    """Bounds on distinct-value count (``anomalies/feature_util.cc:665-698``)."""

    min: Optional[int] = None
    max: Optional[int] = None


@dataclass
class ComparatorThreshold:
    infinity_norm_threshold: Optional[float] = None
    jensen_shannon_divergence_threshold: Optional[float] = None
    normalized_abs_difference_threshold: Optional[float] = None
    # HistogramSelection source for the JSD comparator (reference
    # jensen_shannon_divergence.source, statistics_view.cc:489-509):
    # "STANDARD" (equi-width, outlier-sensitive) or "QUANTILES".
    jensen_shannon_source: str = "STANDARD"


@dataclass
class DriftComparator(ComparatorThreshold):
    pass


@dataclass
class SkewComparator(ComparatorThreshold):
    pass


@dataclass
class DistributionConstraints:
    min_domain_mass: float = 1.0


@dataclass
class FeatureSpec:
    """One feature's constraints; mirrors the reference's ``Feature`` message."""

    name: str
    type: Optional[FeatureType] = None
    presence: Optional[Presence] = None
    value_count: Optional[ValueCount] = None
    shape: Optional[FixedShape] = None
    int_domain: Optional[IntDomain] = None
    float_domain: Optional[FloatDomain] = None
    string_domain: Optional[StringDomain] = None
    bool_domain: Optional[BoolDomain] = None
    image_domain: Optional[ImageDomain] = None
    natural_language_domain: Optional[NaturalLanguageDomain] = None
    time_domain: Optional[TimeDomain] = None
    url_domain: Optional[URLDomain] = None
    mid_domain: Optional[MIDDomain] = None
    domain: Optional[str] = None  # name of a shared StringDomain
    unique_constraints: Optional[UniqueConstraints] = None
    distribution_constraints: Optional[DistributionConstraints] = None
    drift_comparator: Optional[DriftComparator] = None
    skew_comparator: Optional[SkewComparator] = None
    in_environment: list[str] = field(default_factory=list)
    not_in_environment: list[str] = field(default_factory=list)
    # Per-nest-level valency bounds (``value_counts`` plural in the reference,
    # feature_util.cc:172-215): entry i constrains nest level i+1. Mutually
    # exclusive with ``value_count`` for nested>1 features.
    value_counts: Optional[list[ValueCount]] = None
    # When True, INT/FLOAT feature gets string-stats (top-k/uniques) treatment.
    is_categorical: bool = False
    deprecated: bool = False
    # Derived-feature bookkeeping (schema.cc:1171-1194): the source feature a
    # validation-derived feature was computed from, and its lifecycle stage
    # ("VALIDATION_DERIVED" expected when derived).
    validation_derived_source: Optional[str] = None
    lifecycle_stage: Optional[str] = None
    # Nested-struct children (TFMD StructDomain, schema.cc:154-156,629-682):
    # child specs address fields of a struct column; at validation time they
    # flatten to dotted paths ("parent.child"), matching the engine's stats
    # naming for StructType columns.
    struct_domain: Optional["StructDomain"] = None

    @property
    def is_deprecated(self) -> bool:
        """FeatureTypeIsDeprecated (feature_util.cc:239-276): the bool flag,
        or a lifecycle stage in the deprecated set — deprecated features are
        exempt from all validation."""
        if self.deprecated:
            return True
        if self.lifecycle_stage is not None:
            return self.lifecycle_stage in _DEPRECATED_STAGES
        return False

    def is_required(self) -> bool:
        p = self.presence
        return bool(p and (p.min_count > 0 or p.min_fraction > 0))


@dataclass
class StructDomain:
    """Nested-feature container (TFMD StructDomain): child constraints for a
    struct column's fields."""

    feature: list["FeatureSpec"] = field(default_factory=list)


@dataclass
class NumExamplesVersionComparator:
    min_fraction_threshold: Optional[float] = None
    max_fraction_threshold: Optional[float] = None


@dataclass
class DatasetConstraints:
    """Cf. ``anomalies/dataset_constraints_util.cc:47-156``."""

    min_examples_count: Optional[int] = None
    max_examples_count: Optional[int] = None
    num_examples_drift_comparator: Optional[NumExamplesVersionComparator] = None
    num_examples_version_comparator: Optional[NumExamplesVersionComparator] = None


@dataclass
class SparseFeature:
    """Logical sparse feature over (index..., value) physical columns
    (cf. reference sparse_feature checks, ``anomalies/schema.cc:1197-1292``).
    The reference allows MULTIPLE index features; ``index_features`` carries
    them, with ``index_feature`` kept as the single-index shorthand."""

    name: str
    index_feature: str = ""
    value_feature: str = ""
    index_features: Optional[list[str]] = None

    @property
    def all_index_features(self) -> list[str]:
        if self.index_features:
            return list(self.index_features)
        return [self.index_feature] if self.index_feature else []


@dataclass
class WeightedFeature:
    """Logical weighted feature over (value, weight) physical columns."""

    name: str
    feature: str = ""
    weight_feature: str = ""


@dataclass
class Schema:
    feature: list[FeatureSpec] = field(default_factory=list)
    string_domain: list[StringDomain] = field(default_factory=list)
    sparse_feature: list[SparseFeature] = field(default_factory=list)
    weighted_feature: list[WeightedFeature] = field(default_factory=list)
    dataset_constraints: Optional[DatasetConstraints] = None
    default_environment: list[str] = field(default_factory=list)

    # ---- accessors -------------------------------------------------------
    def get_feature(self, name: str) -> Optional[FeatureSpec]:
        for f in self.feature:
            if f.name == name:
                return f
        # Dotted path into struct_domain children ("parent.child"), the
        # engine's stats naming for StructType columns — longest-prefix walk
        # so literal dotted top-level names (flattened schemas) still win above.
        if "." in name:
            for f in self.feature:
                if f.struct_domain is not None and name.startswith(f.name + "."):
                    child = Schema(feature=f.struct_domain.feature).get_feature(
                        name[len(f.name) + 1 :]
                    )
                    if child is not None:
                        return child
        return None

    def feature_names(self) -> list[str]:
        return [f.name for f in self.feature]

    def resolve_string_domain(self, spec: FeatureSpec) -> Optional[StringDomain]:
        if spec.string_domain is not None:
            return spec.string_domain
        if spec.domain:
            for d in self.string_domain:
                if d.name == spec.domain:
                    return d
        return None

    def feature_in_environment(self, spec: FeatureSpec, environment: Optional[str]) -> bool:
        """Environment filtering, mirroring ``anomalies/schema.cc:697-714``:
        with an environment, in_environment wins, then not_in_environment,
        then membership of the environment in default_environment, else
        excluded; with no environment every feature is in scope."""
        if environment is None:
            return True
        if spec.in_environment and environment in spec.in_environment:
            return True
        if spec.not_in_environment and environment in spec.not_in_environment:
            return False
        return environment in self.default_environment

    # ---- JSON round trip -------------------------------------------------
    def to_json(self, indent: int | None = 2) -> str:
        return json.dumps(_asdict_drop_none(self), indent=indent)

    @classmethod
    def from_json(cls, text: str) -> "Schema":
        return schema_from_dict(json.loads(text))

    def copy(self) -> "Schema":
        return schema_from_dict(_asdict_drop_none(self))


def _asdict_drop_none(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if v is None or v == [] :
                continue
            out[f.name] = _asdict_drop_none(v)
        return out
    if isinstance(obj, Enum):
        return obj.value
    if isinstance(obj, list):
        return [_asdict_drop_none(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _asdict_drop_none(v) for k, v in obj.items()}
    return obj


def _from_dict(cls, d):
    if d is None:
        return None
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = _NESTED.get((cls, f.name))
        if t is not None:
            if isinstance(v, list):
                v = [_from_dict(t, x) for x in v]
            else:
                v = _from_dict(t, v)
        elif (cls, f.name) in _ENUMS:
            v = _ENUMS[(cls, f.name)](v)
        kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    (FeatureSpec, "presence"): Presence,
    (FeatureSpec, "value_count"): ValueCount,
    (FeatureSpec, "value_counts"): ValueCount,
    (FeatureSpec, "struct_domain"): StructDomain,
    (StructDomain, "feature"): FeatureSpec,
    (FeatureSpec, "shape"): FixedShape,
    (FeatureSpec, "int_domain"): IntDomain,
    (FeatureSpec, "float_domain"): FloatDomain,
    (FeatureSpec, "string_domain"): StringDomain,
    (FeatureSpec, "bool_domain"): BoolDomain,
    (FeatureSpec, "image_domain"): ImageDomain,
    (FeatureSpec, "natural_language_domain"): NaturalLanguageDomain,
    (NaturalLanguageDomain, "token_constraints"): TokenConstraint,
    (FeatureSpec, "time_domain"): TimeDomain,
    (FeatureSpec, "url_domain"): URLDomain,
    (FeatureSpec, "mid_domain"): MIDDomain,
    (FeatureSpec, "unique_constraints"): UniqueConstraints,
    (FeatureSpec, "distribution_constraints"): DistributionConstraints,
    (FeatureSpec, "drift_comparator"): DriftComparator,
    (FeatureSpec, "skew_comparator"): SkewComparator,
    (Schema, "feature"): FeatureSpec,
    (Schema, "string_domain"): StringDomain,
    (Schema, "sparse_feature"): SparseFeature,
    (Schema, "weighted_feature"): WeightedFeature,
    (Schema, "dataset_constraints"): DatasetConstraints,
    (DatasetConstraints, "num_examples_drift_comparator"): NumExamplesVersionComparator,
    (DatasetConstraints, "num_examples_version_comparator"): NumExamplesVersionComparator,
}

_ENUMS = {(FeatureSpec, "type"): FeatureType}


def schema_from_dict(d: dict) -> Schema:
    return _from_dict(Schema, d)
