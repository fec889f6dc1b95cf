"""``ExampleWeightMap`` — per-feature example-weight resolution, parity with
the reference's ``utils/example_weight_map.py:26-56``: a global weight
feature plus optional per-feature overrides; ``get(path)`` returns the
override when present, else the global weight feature.

Engine note: this engine requires the global ``weight_feature`` to be set
whenever overrides are used (dataset-level weighted_num_examples and the
weighted sketch passes hang off the global weight). The reference permits an
override-only map; configure the global weight explicitly here.
"""

from __future__ import annotations

from typing import FrozenSet, Mapping, Optional


class ExampleWeightMap:
    """Maps a feature path (dotted string or FeaturePath) to its weight
    column."""

    def __init__(
        self,
        weight_feature: Optional[str] = None,
        per_feature_override: Optional[Mapping] = None,
    ):
        self._weight_feature = weight_feature
        self._per_feature_override = (
            {str(k): v for k, v in per_feature_override.items()}
            if per_feature_override
            else None
        )
        all_weight_features = []
        if self._per_feature_override is not None:
            all_weight_features.extend(self._per_feature_override.values())
        if self._weight_feature is not None:
            all_weight_features.append(self._weight_feature)
        self._all_weight_features = frozenset(all_weight_features)

    @property
    def weight_feature(self) -> Optional[str]:
        return self._weight_feature

    @property
    def has_overrides(self) -> bool:
        return bool(self._per_feature_override)

    def get(self, feature_path) -> Optional[str]:
        if self._per_feature_override is None:
            return self._weight_feature
        override = self._per_feature_override.get(str(feature_path))
        return self._weight_feature if override is None else override

    def all_weight_features(self) -> FrozenSet[str]:
        return self._all_weight_features

    def __repr__(self) -> str:
        return "ExampleWeightMap(weight_feature=%r, per_feature_override=%r)" % (
            self._weight_feature,
            self._per_feature_override,
        )
