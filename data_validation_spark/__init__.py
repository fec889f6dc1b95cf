"""data_validation_spark — a PySpark-native statistics + schema-validation engine.

A from-scratch reimplementation of the capabilities of tensorflow/data-validation
(TFDV), re-architected for Apache Spark:

* **Statistics phase** (distributed): one fused pass over a DataFrame computes
  per-column statistics — counts, presence/valency, min/max/mean/stddev,
  approximate quantiles (t-digest sketches), top-k / unique counts
  (count-min + HyperLogLog sketches), string/bytes stats, and semantic-domain
  stats (image format histograms, natural-language heuristics, time formats).
  Built-in Catalyst aggregate expressions cover everything they can express
  (JVM-side, whole-stage codegen); mergeable sketch accumulators run as
  Arrow-vectorized ``mapInArrow`` partials merged tree-wise.

* **Validation phase** (driver-side): a declarative :class:`Schema` constraint
  spec is evaluated against the statistics artifact, emitting anomaly rows with
  TFDV-parity reason codes, plus drift/skew comparisons (Jensen-Shannon
  divergence, L-infinity) between statistics artifacts.

* **Row-level checks** (distributed): exact uniqueness via salted groupBy,
  referential integrity via broadcast/shuffle anti-joins, per-row value
  constraints emitting violation rows — the Spark-native analogue of TFDV's
  ``validate_examples_in_tfrecord`` / feature-skew paths.

Reference behavior studied from tensorflow/data-validation (see SURVEY.md);
all code here is original and Spark-first.
"""

__version__ = "0.1.0"

from data_validation_spark.schema import (  # noqa: F401
    Schema,
    FeatureSpec,
    IntDomain,
    FloatDomain,
    StringDomain,
    BoolDomain,
    ImageDomain,
    NaturalLanguageDomain,
    Presence,
    ValueCount,
    UniqueConstraints,
    DatasetConstraints,
    DriftComparator,
)
from data_validation_spark.anomalies import Anomaly, AnomalyType, Severity  # noqa: F401
from data_validation_spark.stats.result import (  # noqa: F401
    DatasetStats,
    FeatureStats,
    Histogram,
    HistogramBucket,
    RankBucket,
)
from data_validation_spark.stats.options import StatsOptions  # noqa: F401
