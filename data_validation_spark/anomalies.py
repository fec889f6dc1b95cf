"""Anomaly model — TFDV ``Anomalies`` proto parity as plain dataclasses.

Reason-code inventory mirrors the reference's ``AnomalyInfo.Type`` usage across
``tensorflow_data_validation/anomalies/*.cc`` (see SURVEY.md §2.8).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional


class Severity(str, Enum):
    UNKNOWN = "UNKNOWN"
    WARNING = "WARNING"
    ERROR = "ERROR"


class AnomalyType(str, Enum):
    # Bool domain
    BOOL_TYPE_BIG_INT = "BOOL_TYPE_BIG_INT"
    BOOL_TYPE_SMALL_INT = "BOOL_TYPE_SMALL_INT"
    BOOL_TYPE_UNEXPECTED_FLOAT = "BOOL_TYPE_UNEXPECTED_FLOAT"
    BOOL_TYPE_UNEXPECTED_STRING = "BOOL_TYPE_UNEXPECTED_STRING"
    BOOL_TYPE_INVALID_CONFIG = "BOOL_TYPE_INVALID_CONFIG"
    # Comparators (drift / skew / num-examples)
    COMPARATOR_CONTROL_DATA_MISSING = "COMPARATOR_CONTROL_DATA_MISSING"
    COMPARATOR_TREATMENT_DATA_MISSING = "COMPARATOR_TREATMENT_DATA_MISSING"
    COMPARATOR_L_INFTY_HIGH = "COMPARATOR_L_INFTY_HIGH"
    COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH = "COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH"
    COMPARATOR_NORMALIZED_ABSOLUTE_DIFFERENCE_HIGH = (
        "COMPARATOR_NORMALIZED_ABSOLUTE_DIFFERENCE_HIGH"
    )
    COMPARATOR_LOW_NUM_EXAMPLES = "COMPARATOR_LOW_NUM_EXAMPLES"
    COMPARATOR_HIGH_NUM_EXAMPLES = "COMPARATOR_HIGH_NUM_EXAMPLES"
    # Dataset constraints
    DATASET_LOW_NUM_EXAMPLES = "DATASET_LOW_NUM_EXAMPLES"
    DATASET_HIGH_NUM_EXAMPLES = "DATASET_HIGH_NUM_EXAMPLES"
    # Enum / string domain
    ENUM_TYPE_INVALID_UTF8 = "ENUM_TYPE_INVALID_UTF8"
    ENUM_TYPE_UNEXPECTED_STRING_VALUES = "ENUM_TYPE_UNEXPECTED_STRING_VALUES"
    # Presence / type
    FEATURE_TYPE_LOW_FRACTION_PRESENT = "FEATURE_TYPE_LOW_FRACTION_PRESENT"
    FEATURE_TYPE_LOW_NUMBER_PRESENT = "FEATURE_TYPE_LOW_NUMBER_PRESENT"
    FEATURE_TYPE_NOT_PRESENT = "FEATURE_TYPE_NOT_PRESENT"
    FEATURE_TYPE_LOW_NUMBER_VALUES = "FEATURE_TYPE_LOW_NUMBER_VALUES"
    FEATURE_TYPE_HIGH_NUMBER_VALUES = "FEATURE_TYPE_HIGH_NUMBER_VALUES"
    FEATURE_TYPE_LOW_UNIQUE = "FEATURE_TYPE_LOW_UNIQUE"
    FEATURE_TYPE_HIGH_UNIQUE = "FEATURE_TYPE_HIGH_UNIQUE"
    FEATURE_TYPE_NO_UNIQUE = "FEATURE_TYPE_NO_UNIQUE"
    # Float domain
    FLOAT_TYPE_SMALL_FLOAT = "FLOAT_TYPE_SMALL_FLOAT"
    FLOAT_TYPE_BIG_FLOAT = "FLOAT_TYPE_BIG_FLOAT"
    FLOAT_TYPE_HAS_NAN = "FLOAT_TYPE_HAS_NAN"
    FLOAT_TYPE_HAS_INF = "FLOAT_TYPE_HAS_INF"
    FLOAT_TYPE_STRING_NOT_FLOAT = "FLOAT_TYPE_STRING_NOT_FLOAT"
    # Int domain
    INT_TYPE_SMALL_INT = "INT_TYPE_SMALL_INT"
    INT_TYPE_BIG_INT = "INT_TYPE_BIG_INT"
    INT_TYPE_NOT_INT_STRING = "INT_TYPE_NOT_INT_STRING"
    # Schema-level
    UNEXPECTED_DATA_TYPE = "UNEXPECTED_DATA_TYPE"
    SCHEMA_NEW_COLUMN = "SCHEMA_NEW_COLUMN"
    SCHEMA_MISSING_COLUMN = "SCHEMA_MISSING_COLUMN"
    SCHEMA_TRAINING_SERVING_SKEW = "SCHEMA_TRAINING_SERVING_SKEW"
    INVALID_FEATURE_SHAPE = "INVALID_FEATURE_SHAPE"
    INVALID_DOMAIN_SPECIFICATION = "INVALID_DOMAIN_SPECIFICATION"
    INVALID_SCHEMA_SPECIFICATION = "INVALID_SCHEMA_SPECIFICATION"
    DOMAIN_INVALID_FOR_TYPE = "DOMAIN_INVALID_FOR_TYPE"
    VALUE_NESTEDNESS_MISMATCH = "VALUE_NESTEDNESS_MISMATCH"
    FEATURE_MISSING_NAME = "FEATURE_MISSING_NAME"
    FEATURE_MISSING_TYPE = "FEATURE_MISSING_TYPE"
    SEMANTIC_DOMAIN_UPDATE = "SEMANTIC_DOMAIN_UPDATE"
    # Image domain
    LOW_SUPPORTED_IMAGE_FRACTION = "LOW_SUPPORTED_IMAGE_FRACTION"
    MAX_IMAGE_BYTE_SIZE_EXCEEDED = "MAX_IMAGE_BYTE_SIZE_EXCEEDED"
    # NL domain
    FEATURE_COVERAGE_TOO_LOW = "FEATURE_COVERAGE_TOO_LOW"
    FEATURE_COVERAGE_TOO_SHORT_AVG_TOKEN_LENGTH = (
        "FEATURE_COVERAGE_TOO_SHORT_AVG_TOKEN_LENGTH"
    )
    SEQUENCE_VALUE_TOO_SMALL_FRACTION = "SEQUENCE_VALUE_TOO_SMALL_FRACTION"
    SEQUENCE_VALUE_TOO_LARGE_FRACTION = "SEQUENCE_VALUE_TOO_LARGE_FRACTION"
    SEQUENCE_VALUE_TOO_FEW_OCCURRENCES = "SEQUENCE_VALUE_TOO_FEW_OCCURRENCES"
    SEQUENCE_VALUE_TOO_MANY_OCCURRENCES = "SEQUENCE_VALUE_TOO_MANY_OCCURRENCES"
    STATS_NOT_AVAILABLE = "STATS_NOT_AVAILABLE"
    # Sparse / weighted features
    SPARSE_FEATURE_MISSING_VALUE = "SPARSE_FEATURE_MISSING_VALUE"
    SPARSE_FEATURE_MISSING_INDEX = "SPARSE_FEATURE_MISSING_INDEX"
    SPARSE_FEATURE_LENGTH_MISMATCH = "SPARSE_FEATURE_LENGTH_MISMATCH"
    SPARSE_FEATURE_NAME_COLLISION = "SPARSE_FEATURE_NAME_COLLISION"
    WEIGHTED_FEATURE_MISSING_VALUE = "WEIGHTED_FEATURE_MISSING_VALUE"
    WEIGHTED_FEATURE_MISSING_WEIGHT = "WEIGHTED_FEATURE_MISSING_WEIGHT"
    WEIGHTED_FEATURE_LENGTH_MISMATCH = "WEIGHTED_FEATURE_LENGTH_MISMATCH"
    WEIGHTED_FEATURE_NAME_COLLISION = "WEIGHTED_FEATURE_NAME_COLLISION"
    # Derived features
    DERIVED_FEATURE_INVALID_SOURCE = "DERIVED_FEATURE_INVALID_SOURCE"
    DERIVED_FEATURE_BAD_LIFECYCLE = "DERIVED_FEATURE_BAD_LIFECYCLE"
    MULTIPLE_REASONS = "MULTIPLE_REASONS"
    # Row-level (this engine's extension; TFDV per-example path analogue)
    DUPLICATE_KEY = "DUPLICATE_KEY"
    REFERENTIAL_ORPHAN = "REFERENTIAL_ORPHAN"
    ROW_CONSTRAINT_VIOLATION = "ROW_CONSTRAINT_VIOLATION"
    PIXEL_INTEGRITY_VIOLATION = "PIXEL_INTEGRITY_VIOLATION"
    CAPTION_MISMATCH = "CAPTION_MISMATCH"
    DATA_MISSING = "DATA_MISSING"


# Anomaly types that only make sense on full-dataset statistics; stripped from
# per-example / row-level output, cf. reference validation_api.py:41-57.
GLOBAL_ONLY_ANOMALY_TYPES = frozenset(
    {
        AnomalyType.FEATURE_TYPE_LOW_FRACTION_PRESENT,
        AnomalyType.FEATURE_TYPE_LOW_NUMBER_PRESENT,
        AnomalyType.FEATURE_TYPE_LOW_UNIQUE,
        AnomalyType.FEATURE_TYPE_HIGH_UNIQUE,
        AnomalyType.FEATURE_TYPE_NO_UNIQUE,
        AnomalyType.COMPARATOR_L_INFTY_HIGH,
        AnomalyType.COMPARATOR_JENSEN_SHANNON_DIVERGENCE_HIGH,
        AnomalyType.COMPARATOR_NORMALIZED_ABSOLUTE_DIFFERENCE_HIGH,
        AnomalyType.COMPARATOR_LOW_NUM_EXAMPLES,
        AnomalyType.COMPARATOR_HIGH_NUM_EXAMPLES,
        AnomalyType.DATASET_LOW_NUM_EXAMPLES,
        AnomalyType.DATASET_HIGH_NUM_EXAMPLES,
        AnomalyType.LOW_SUPPORTED_IMAGE_FRACTION,
        # NL / coverage constraints need corpus-level statistics — a single
        # example can neither compute coverage nor fraction-of-sequences.
        AnomalyType.FEATURE_COVERAGE_TOO_LOW,
        AnomalyType.FEATURE_COVERAGE_TOO_SHORT_AVG_TOKEN_LENGTH,
        AnomalyType.SEQUENCE_VALUE_TOO_SMALL_FRACTION,
        AnomalyType.SEQUENCE_VALUE_TOO_LARGE_FRACTION,
        AnomalyType.SEQUENCE_VALUE_TOO_FEW_OCCURRENCES,
        AnomalyType.SEQUENCE_VALUE_TOO_MANY_OCCURRENCES,
        AnomalyType.STATS_NOT_AVAILABLE,
    }
)


@dataclass
class Anomaly:
    """One violation row: ``(slice, feature, type, severity, description, …)``."""

    feature: str
    type: AnomalyType
    severity: Severity = Severity.ERROR
    short_description: str = ""
    description: str = ""
    slice_key: str = "All Examples"
    measurement: Optional[float] = None
    threshold: Optional[float] = None

    def to_dict(self) -> dict:
        d = {
            "feature": self.feature,
            "type": self.type.value,
            "severity": self.severity.value,
            "short_description": self.short_description,
            "description": self.description,
            "slice_key": self.slice_key,
        }
        if self.measurement is not None:
            d["measurement"] = self.measurement
        if self.threshold is not None:
            d["threshold"] = self.threshold
        return d


@dataclass
class DriftSkewMeasurement:
    feature: str
    metric: str  # L_INFTY | JENSEN_SHANNON_DIVERGENCE | NORMALIZED_ABSOLUTE_DIFFERENCE
    value: float
    threshold: Optional[float] = None


@dataclass
class Anomalies:
    """Validation verdict: anomaly rows + drift measurements + roll-up."""

    anomalies: list[Anomaly] = field(default_factory=list)
    drift_skew_info: list[DriftSkewMeasurement] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return not any(a.severity == Severity.ERROR for a in self.anomalies)

    def types_for(self, feature: str) -> set[AnomalyType]:
        return {a.type for a in self.anomalies if a.feature == feature}

    def feature_anomaly_info(self) -> dict[str, dict]:
        """Per-feature roll-up matching the reference's ``AnomalyInfo`` map
        (``schema_anomalies.cc:80-111``): each feature gets its reason list,
        max severity, and a unified description. Multiple SCHEMA_NEW_COLUMN
        reasons collapse to one; >1 remaining reason unifies to the aggregate
        type MULTIPLE_REASONS with short description "Multiple errors"."""
        sev_rank = {Severity.UNKNOWN: 0, Severity.WARNING: 1, Severity.ERROR: 2}
        by_feature: dict[str, list[Anomaly]] = {}
        for a in self.anomalies:
            by_feature.setdefault(a.feature, []).append(a)
        out: dict[str, dict] = {}
        for feature, reasons in by_feature.items():
            # FilterDescriptions: all-new-column collapses to one reason.
            if all(r.type == AnomalyType.SCHEMA_NEW_COLUMN for r in reasons):
                reasons = reasons[:1]
            severity = max(reasons, key=lambda r: sev_rank[r.severity]).severity
            if len(reasons) == 1:
                agg_type = reasons[0].type
                short = reasons[0].short_description
                desc = reasons[0].description
            else:
                agg_type = AnomalyType.MULTIPLE_REASONS
                short = "Multiple errors"
                desc = " ".join(r.description for r in reasons if r.description)
            out[feature] = {
                "type": agg_type.value,
                "severity": severity.value,
                "short_description": short,
                "description": desc,
                "reasons": [
                    {
                        "type": r.type.value,
                        "short_description": r.short_description,
                        "description": r.description,
                    }
                    for r in reasons
                ],
            }
        return out

    def to_json(self, indent: int | None = 2) -> str:
        return json.dumps(
            {
                "passed": self.passed,
                "anomalies": [a.to_dict() for a in self.anomalies],
                "anomaly_info": self.feature_anomaly_info(),
                "drift_skew_info": [
                    {
                        "feature": m.feature,
                        "metric": m.metric,
                        "value": m.value,
                        "threshold": m.threshold,
                    }
                    for m in self.drift_skew_info
                ],
            },
            indent=indent,
        )

    @classmethod
    def from_json(cls, text: str) -> "Anomalies":
        """Inverse of ``to_json`` (reference anomalies_util.py:142-171
        load_anomalies_text/binary role). The roll-up map is derived state
        and recomputed on demand."""
        d = json.loads(text)
        out = cls()
        for a in d.get("anomalies", []):
            out.anomalies.append(
                Anomaly(
                    feature=a["feature"],
                    type=AnomalyType(a["type"]),
                    severity=Severity(a["severity"]),
                    short_description=a.get("short_description", ""),
                    description=a.get("description", ""),
                    slice_key=a.get("slice_key", "All Examples"),
                    measurement=a.get("measurement"),
                    threshold=a.get("threshold"),
                )
            )
        for m in d.get("drift_skew_info", []):
            out.drift_skew_info.append(
                DriftSkewMeasurement(
                    m["feature"], m["metric"], m["value"], m.get("threshold")
                )
            )
        return out

    def remove_anomaly_types(self, types: "set[AnomalyType]") -> "Anomalies":
        """Filtered copy without reasons of the given types — reference
        anomalies_util.remove_anomaly_types (:50-97). Features whose reasons
        all match are dropped entirely; the per-feature roll-up (aggregate
        type, unified description) is derived on demand so it self-updates."""
        return Anomalies(
            anomalies=[a for a in self.anomalies if a.type not in types],
            drift_skew_info=list(self.drift_skew_info),
        )
