"""Stats-artifact views, accessors, and text/binary/sharded IO — parity with
the reference's ``tensorflow_data_validation/utils/stats_util.py`` public
surface (``get_feature_stats:277``, ``get_custom_stats:310``,
``get_slice_stats:345``, ``DatasetListView:411``, ``DatasetView:457``,
``FeatureView:598``, ``CrossFeatureView:666``, ``write_stats_text:192``,
``load_stats_text:216``, ``load_stats_binary:234``,
``load_sharded_statistics:677``), re-expressed over our dataclass artifact
(:mod:`data_validation_spark.stats.result`).

Format notes: our artifact's text form is the JSON emitted by
``DatasetStatsList.to_json`` (the engine has no protobuf dependency); the
binary form is that JSON gzip-compressed behind a magic header, filling the
role of the reference's serialized-proto binary file.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
from dataclasses import replace
from typing import Iterable, Optional, Union

from data_validation_spark.paths import FeaturePath, normalize_feature_id
from data_validation_spark.stats.result import (
    BytesStats,
    CommonStats,
    CrossFeatureStats,
    DatasetStats,
    DatasetStatsList,
    FeatureStats,
    NumericStats,
    StringStats,
)

#: Slice key of the unsliced dataset (reference constants.DEFAULT_SLICE_KEY).
DEFAULT_SLICE_KEY = "All Examples"

_BINARY_MAGIC = b"DVSB1\n"

FeatureId = Union[str, FeaturePath, Iterable[str]]


# --------------------------------------------------------------- accessors --
def get_feature_stats(stats: DatasetStats, feature_path: FeatureId) -> FeatureStats:
    """Get one feature's statistics from a per-slice dataset statistics
    object (reference ``stats_util.get_feature_stats``).

    Raises TypeError on a non-DatasetStats input and ValueError when the
    feature is absent.
    """
    if not isinstance(stats, DatasetStats):
        raise TypeError(
            "statistics is of type %s, should be a DatasetStats artifact."
            % type(stats).__name__
        )
    key = normalize_feature_id(feature_path).to_path()
    fs = stats.features.get(key)
    if fs is None:
        raise ValueError(
            "Feature %s not found in the dataset statistics." % key
        )
    return fs


def get_custom_stats(feature_stats: FeatureStats, custom_stats_name: str):
    """Get a named custom statistic from a feature's statistics (reference
    ``stats_util.get_custom_stats``)."""
    if not isinstance(feature_stats, FeatureStats):
        raise TypeError(
            "feature_stats is of type %s, should be a FeatureStats artifact."
            % type(feature_stats).__name__
        )
    if custom_stats_name in feature_stats.custom:
        return feature_stats.custom[custom_stats_name]
    raise ValueError(
        "Custom statistics %s not found in the feature statistics."
        % custom_stats_name
    )


def get_slice_stats(stats: DatasetStatsList, slice_key: str) -> DatasetStatsList:
    """Extract one slice as a single-slice artifact (reference
    ``stats_util.get_slice_stats``); raises ValueError on an unknown key."""
    if not isinstance(stats, DatasetStatsList):
        raise TypeError(
            "statistics is of type %s, should be a DatasetStatsList artifact."
            % type(stats).__name__
        )
    for sl in stats.slices:
        if sl.slice_key == slice_key:
            return DatasetStatsList([sl])
    raise ValueError("Invalid slice key.")


# -------------------------------------------------------------------- views --
class FeatureView:
    """View of a single feature's statistics (reference ``FeatureView``)."""

    def __init__(self, stats: FeatureStats):
        self._statistics = stats

    def proto(self) -> FeatureStats:
        """The underlying artifact object (the reference returns the wrapped
        proto; we return the wrapped dataclass)."""
        return self._statistics

    def custom_statistic(self, name: str):
        """The named custom statistic, or None if absent (unlike
        :func:`get_custom_stats`, which raises)."""
        return self._statistics.custom.get(name)

    def numeric_statistics(self) -> Optional[NumericStats]:
        return self._statistics.numeric

    def string_statistics(self) -> Optional[StringStats]:
        return self._statistics.string

    def bytes_statistics(self) -> Optional[BytesStats]:
        return self._statistics.bytes

    def struct_statistics(self) -> Optional[CommonStats]:
        """For STRUCT features the reference's StructStatistics carries only
        common stats; we surface the CommonStats directly (None for
        non-STRUCT features)."""
        if self._statistics.type == "STRUCT":
            return self._statistics.common
        return None

    def common_statistics(self) -> Optional[CommonStats]:
        return self._statistics.common


class CrossFeatureView:
    """View of one cross-feature statistic (reference ``CrossFeatureView``)."""

    def __init__(self, stats: CrossFeatureStats):
        self._statistics = stats

    def proto(self) -> CrossFeatureStats:
        return self._statistics


class DatasetView:
    """View of statistics for one dataset slice (reference ``DatasetView``)."""

    def __init__(self, stats: DatasetStats):
        self._statistics = stats
        self._feature_map: dict[str, str] = {}
        self._cross_feature_map: dict[tuple[str, str], int] = {}
        self._initialized = False

    def _init_index(self) -> None:
        if self._initialized:
            return
        for name in self._statistics.features:
            # The artifact dict already guarantees key uniqueness; index by
            # the canonical dotted form so FeaturePath(["a","b"]) and the
            # flattened key "a.b" address the same feature.
            key = FeaturePath.from_string(name).to_path()
            if key in self._feature_map:
                raise ValueError("Duplicate feature %s" % key)
            self._feature_map[key] = name
        for j, cf in enumerate(self._statistics.cross_features):
            feature_id = (cf.path_x, cf.path_y)
            if feature_id in self._cross_feature_map:
                raise ValueError("Duplicate cross feature %s" % (feature_id,))
            self._cross_feature_map[feature_id] = j
        self._initialized = True

    def proto(self) -> DatasetStats:
        return self._statistics

    def get_feature(self, feature_id: FeatureId) -> Optional[FeatureView]:
        """Retrieve a feature if it exists, else None. Accepts a str (dotted
        form allowed), a FeaturePath, or an iterable of path steps."""
        key = normalize_feature_id(feature_id).to_path()
        self._init_index()
        name = self._feature_map.get(key)
        if name is None:
            return None
        return FeatureView(self._statistics.features[name])

    def get_cross_feature(
        self, x_path: FeatureId, y_path: FeatureId
    ) -> Optional[CrossFeatureView]:
        """Retrieve a cross-feature if it exists, or None."""
        self._init_index()
        feature_id = (
            normalize_feature_id(x_path).to_path(),
            normalize_feature_id(y_path).to_path(),
        )
        index = self._cross_feature_map.get(feature_id)
        if index is None:
            return None
        return CrossFeatureView(self._statistics.cross_features[index])

    def list_features(self) -> list[FeaturePath]:
        self._init_index()
        return [FeaturePath.from_string(k) for k in self._feature_map]

    def list_cross_features(self) -> list[tuple[FeaturePath, FeaturePath]]:
        self._init_index()
        return [
            (FeaturePath.from_string(x), FeaturePath.from_string(y))
            for (x, y) in self._cross_feature_map
        ]

    def get_derived_feature(
        self, deriver_name: str, source_paths: list
    ) -> Optional[FeatureView]:
        """Retrieve the derived feature matching a deriver name + its source
        paths; raises ValueError if more than one matches (reference
        ``DatasetView.get_derived_feature``)."""
        wanted = [normalize_feature_id(p).to_path() for p in source_paths]
        results = []
        for fs in self._statistics.features.values():
            src = fs.validation_derived_source
            if not src or src.get("deriver_name") != deriver_name:
                continue
            if list(src.get("source_paths", [])) != wanted:
                continue
            results.append(FeatureView(fs))
            if len(results) > 1:
                raise ValueError(
                    "Ambiguous result, %d features matched" % len(results)
                )
        return results[0] if results else None


class DatasetListView:
    """View of statistics over multiple slices (reference
    ``DatasetListView``)."""

    def __init__(self, stats: DatasetStatsList):
        self._statistics = stats
        self._slice_map: dict[str, DatasetView] = {}
        self._initialized = False

    def _init_index(self) -> None:
        if self._initialized:
            return
        for sl in self._statistics.slices:
            if sl.slice_key in self._slice_map:
                raise ValueError("Duplicate slice name %s" % sl.slice_key)
            self._slice_map[sl.slice_key] = DatasetView(sl)
        self._initialized = True

    def proto(self) -> DatasetStatsList:
        return self._statistics

    def get_slice(self, slice_key: str) -> Optional[DatasetView]:
        self._init_index()
        return self._slice_map.get(slice_key)

    def get_default_slice(self) -> Optional[DatasetView]:
        self._init_index()
        if len(self._slice_map) == 1:
            return next(iter(self._slice_map.values()))
        return self._slice_map.get(DEFAULT_SLICE_KEY)

    def get_default_slice_or_die(self) -> DatasetView:
        default_slice = self.get_default_slice()
        if default_slice is None:
            raise ValueError("Missing default slice")
        return default_slice

    def list_slices(self) -> list[str]:
        self._init_index()
        return list(self._slice_map.keys())


# ----------------------------------------------------------------------- IO --
def write_stats_text(stats: DatasetStatsList, output_path: str) -> None:
    """Write the artifact in text (JSON) form (reference
    ``write_stats_text``; our text format is JSON, not proto-text)."""
    if not isinstance(stats, DatasetStatsList):
        raise TypeError(
            "stats is of type %s, should be a DatasetStatsList artifact."
            % type(stats).__name__
        )
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        f.write(stats.to_json())


def load_stats_text(input_path: str) -> DatasetStatsList:
    with open(input_path) as f:
        return DatasetStatsList.from_json(f.read())


def write_stats_binary(stats: DatasetStatsList, output_path: str) -> None:
    """Binary artifact: gzip-compressed JSON behind a magic header — the
    compact single-file form (role of the reference's serialized-proto
    binary, ``WriteStatisticsToBinaryFile``)."""
    if not isinstance(stats, DatasetStatsList):
        raise TypeError(
            "stats is of type %s, should be a DatasetStatsList artifact."
            % type(stats).__name__
        )
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    payload = gzip.compress(stats.to_json(indent=None).encode("utf-8"))
    with open(output_path, "wb") as f:
        f.write(_BINARY_MAGIC)
        f.write(payload)


def load_stats_binary(input_path: str) -> DatasetStatsList:
    with open(input_path, "rb") as f:
        blob = f.read()
    if not blob.startswith(_BINARY_MAGIC):
        raise OSError(
            "%s is not a binary statistics artifact (bad magic)." % input_path
        )
    text = gzip.decompress(blob[len(_BINARY_MAGIC):]).decode("utf-8")
    return DatasetStatsList.from_json(text)


def load_statistics(input_path: str) -> DatasetStatsList:
    """Load an artifact from the binary, TFRecord, or text (JSON) form —
    reference ``load_statistics`` tries TFRecord then text; we sniff the
    binary magic, then a JSON first byte, then TFRecord framing."""
    if not os.path.exists(input_path):
        raise OSError(f"Invalid input path {input_path}.")
    with open(input_path, "rb") as f:
        head = f.read(max(len(_BINARY_MAGIC), 1))
    if head.startswith(_BINARY_MAGIC):
        return load_stats_binary(input_path)
    if head[:1] in (b"{", b"["):
        return load_stats_text(input_path)
    return load_stats_tfrecord(input_path)


def write_stats_tfrecord(stats: DatasetStatsList, output_path: str) -> None:
    """Write the artifact as a single-record TFRecord file (the role of the
    reference's ``WriteStatisticsToTFRecord`` — one serialized artifact
    record inside TFRecord framing; our record payload is the artifact
    JSON)."""
    from data_validation_spark.io.tfrecord import write_frames

    if not isinstance(stats, DatasetStatsList):
        raise TypeError(
            "stats is of type %s, should be a DatasetStatsList artifact."
            % type(stats).__name__
        )
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    write_frames(output_path, [stats.to_json(indent=None).encode("utf-8")])


def load_stats_tfrecord(input_path: str) -> DatasetStatsList:
    """Read a TFRecord statistics file written by
    :func:`write_stats_tfrecord`; multiple records merge (sharded
    TFRecord output)."""
    from data_validation_spark.io.artifacts import merge_stats
    from data_validation_spark.io.tfrecord import read_frames

    shards = [
        DatasetStatsList.from_json(rec.decode("utf-8"))
        for rec in read_frames(input_path)
    ]
    if not shards:
        raise ValueError("Empty TFRecord statistics file %s." % input_path)
    return shards[0] if len(shards) == 1 else merge_stats(shards)


def default_sharded_output_supported() -> bool:
    """Sharded stats output is always available here (no optional native
    dep, unlike the reference's parquet gate)."""
    return True


def default_sharded_output_suffix() -> str:
    """Suffix for sharded statistics files."""
    return "jsonl"


def write_sharded_statistics(
    shards: Iterable[DatasetStatsList], output_path_prefix: str
) -> list[str]:
    """Write one artifact file per shard as
    ``<prefix>-NNNNN-of-NNNNN.<suffix>`` (reference
    ``WriteStatisticsToRecordsAndBinaryFile`` sharded layout)."""
    shards = list(shards)
    n = len(shards)
    paths = []
    for i, sh in enumerate(shards):
        p = "%s-%05d-of-%05d.%s" % (
            output_path_prefix,
            i,
            n,
            default_sharded_output_suffix(),
        )
        write_stats_text(sh, p)
        paths.append(p)
    return paths


def load_sharded_statistics(
    input_path_prefix: Optional[str] = None,
    input_paths: Optional[Iterable[str]] = None,
) -> DatasetListView:
    """Read a sharded statistics artifact from disk as a merged
    DatasetListView (reference ``load_sharded_statistics``): provide exactly
    one of a path prefix (globbed as ``<prefix>*``) or an explicit path
    list; shards merge with the engine's exact/merge semantics
    (:func:`data_validation_spark.io.artifacts.merge_stats`)."""
    from data_validation_spark.io.artifacts import merge_stats

    if (input_path_prefix is None) == (input_paths is None):
        raise ValueError("Must provide one of input_path_prefix, input_paths.")
    if input_path_prefix is not None:
        input_paths = sorted(_glob.glob(input_path_prefix + "*"))
    input_paths = list(input_paths or [])
    if not input_paths:
        raise ValueError(
            "No input paths found paths=%s, pattern=%s"
            % (input_paths, input_path_prefix)
        )
    shards = [load_statistics(p) for p in input_paths]
    return DatasetListView(merge_stats(shards))


def write_statistics_to_records_and_binary(
    shards: Iterable[DatasetStatsList],
    binary_path: str,
    records_path_prefix: Optional[str] = None,
) -> None:
    """Reference ``WriteStatisticsToRecordsAndBinaryFile``: write the merged
    artifact to one binary file AND (optionally) the unmerged shards as
    sharded record files."""
    from data_validation_spark.io.artifacts import merge_stats

    shards = list(shards)
    if records_path_prefix is not None:
        write_sharded_statistics(shards, records_path_prefix)
    merged = shards[0] if len(shards) == 1 else merge_stats(shards)
    write_stats_binary(merged, binary_path)


# PTransform-style names (the reference exports Beam PTransforms; our Spark
# counterparts are plain callables with the same roles).
WriteStatisticsToBinaryFile = write_stats_binary
WriteStatisticsToTFRecord = write_stats_tfrecord
WriteStatisticsToRecordsAndBinaryFile = write_statistics_to_records_and_binary


# ------------------------------------------------- cross-feature attachment --
def attach_cross_feature_stats(
    stats: DatasetStatsList, rows: Iterable, slice_key: str = DEFAULT_SLICE_KEY
) -> DatasetStatsList:
    """Fold ``cross_feature_stats`` output rows
    (feature_x, feature_y, count, covariance, correlation — the DataFrame
    produced by :func:`data_validation_spark.stats.lift.cross_feature_stats`,
    ``.collect()``-ed, or any equivalent tuple iterable) into the named slice
    of an artifact, returning a new artifact."""
    out_slices = []
    for sl in stats.slices:
        if sl.slice_key != slice_key:
            out_slices.append(sl)
            continue
        cfs = list(sl.cross_features)
        for r in rows:
            fx, fy, count, cov, corr = (
                r["feature_x"] if not isinstance(r, tuple) else r[0],
                r["feature_y"] if not isinstance(r, tuple) else r[1],
                r["count"] if not isinstance(r, tuple) else r[2],
                r["covariance"] if not isinstance(r, tuple) else r[3],
                r["correlation"] if not isinstance(r, tuple) else r[4],
            )
            cfs.append(
                CrossFeatureStats(
                    path_x=fx,
                    path_y=fy,
                    count=int(count),
                    correlation=(None if corr is None else float(corr)),
                    covariance=(None if cov is None else float(cov)),
                )
            )
        out_slices.append(replace(sl, cross_features=cfs))
    return DatasetStatsList(out_slices)
