"""Feature-value slicing — Spark-native port of the reference's
``slicing_util.get_feature_value_slicer`` (``tdv/utils/slicing_util.py:48-300``).

A slice spec names one or more features, each with an optional value set:

* ``SliceSpec({"age": None})`` — one slice per distinct age value.
* ``SliceSpec({"interests": ["dogs"]})`` — only the given values.
* ``SliceSpec({"fruits": None, "numbers": [1]})`` — the cross of both
  features (a row must have values for ALL features in the spec — the
  reference's inner-join semantics).

Multiple specs are independent slicers whose outputs union; the default
"All Examples" slice is always included. Multivalent (array) slice features
contribute one key per distinct element (the reference's per-row explode).

Slice keys match the reference format: ``<name>_<value>`` parts for the
spec's features, sorted by feature name, joined with ``_``.

Spark shape: everything is one expression — per spec, a per-row ARRAY of
slice keys built with ``transform``/``flatten`` cross products; the arrays
concatenate across specs plus the default key, and one ``explode`` feeds the
existing groupBy-slice_key aggregation. No joins, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


@dataclass
class SliceSpec:
    """One slicer: feature name → optional allowed-value list (None = all)."""

    features: dict[str, Optional[list]] = field(default_factory=dict)


def get_feature_value_slicer(features: dict) -> SliceSpec:
    """Build a slicer from a {feature_name: values-or-None} mapping —
    reference ``slicing_util.get_feature_value_slicer:48-120`` (exported as
    ``experimental_get_feature_value_slicer``): None slices on every distinct
    value; a list restricts to those values. The reference returns a
    record-batch function; here the same config becomes a
    :class:`SliceSpec` for ``StatsOptions.slice_specs``. Same input
    validation: values must be an iterable (not a bare scalar/string) of
    strings or integers."""
    out: dict[str, Optional[list]] = {}
    for name, values in features.items():
        if values is None:
            out[name] = None
            continue
        if isinstance(values, (str, bytes)) or not hasattr(values, "__iter__"):
            raise TypeError(
                "Feature values must be specified in an iterable, got %s for "
                "feature %s." % (type(values).__name__, name)
            )
        vals = list(values)
        for v in vals:
            if isinstance(v, bool) or not isinstance(v, (str, int)):
                raise NotImplementedError(
                    "Only string and int feature values are supported, got "
                    "%s for feature %s." % (type(v).__name__, name)
                )
        out[name] = vals
    return SliceSpec(features=out)


def _feature_part(df: DataFrame, name: str, values: Optional[list]) -> Column:
    """Array of ``name_<value>`` parts for one feature of one row; empty when
    the row has no (allowed) value for the feature."""
    dt = df.schema[name].dataType
    col = F.col(name)
    if isinstance(dt, T.ArrayType):
        vals = F.array_distinct(col)
        vals = F.filter(vals, lambda v: v.isNotNull())
    else:
        vals = F.when(col.isNotNull(), F.array(col)).otherwise(
            F.array().cast(f"array<{dt.simpleString()}>")
        )
    if values is not None:
        allowed = F.array(*[F.lit(v) for v in values])
        vals = F.filter(vals, lambda v: F.array_contains(allowed, v))
    return F.transform(
        vals, lambda v: F.concat(F.lit(f"{name}_"), v.cast("string"))
    )


def _spec_keys(df: DataFrame, spec: SliceSpec) -> Column:
    """Array of slice keys one spec yields for a row: the cross product of its
    per-feature parts (empty if any feature has no value — inner join).
    A spec feature absent from the data is skipped, not an error — the
    remaining features form the keys (reference
    slicing_util_test.py:95-121, one-feature-not-in-batch)."""
    keys: Optional[Column] = None
    for name in sorted(spec.features):
        if name not in df.columns:
            continue
        part = _feature_part(df, name, spec.features[name])
        if keys is None:
            keys = part
        else:
            keys = F.flatten(
                F.transform(
                    keys,
                    lambda k: F.transform(part, lambda v: F.concat(k, F.lit("_"), v)),
                )
            )
    return keys if keys is not None else F.array().cast("array<string>")


def slice_keys_column(
    df: DataFrame, specs: Sequence[SliceSpec], default_slice_key: str = "All Examples"
) -> Column:
    """Per-row array of every slice key the row belongs to (all specs + the
    default slice)."""
    arrays = [F.array(F.lit(default_slice_key))]
    arrays += [_spec_keys(df, spec) for spec in specs]
    return F.concat(*arrays) if len(arrays) > 1 else arrays[0]


def apply_slicing(
    df: DataFrame, specs: Sequence[SliceSpec], default_slice_key: str = "All Examples"
) -> DataFrame:
    """Explode the slice-key array into a ``__slice_key__`` column (a row is
    duplicated once per slice it belongs to — the reference's sliced
    record-batch semantics)."""
    keys = slice_keys_column(df, specs, default_slice_key)
    return df.withColumn("__slice_key__", F.explode(keys))
