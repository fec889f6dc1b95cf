"""``FeaturePath`` — the feature-addressing type exported at the reference's
top level (``tensorflow_data_validation/types.py`` re-exports tfx_bsl's
``path.FeaturePath``; used throughout ``utils/stats_util.py:277-560`` and
``utils/schema_util.py:27-120``).

Our stats artifact and schema flatten nested struct features to dotted path
strings ("parent.child"), so a FeaturePath's canonical string form is the
'.'-joined steps — the exact key used by the engine's stats naming.
"""

from __future__ import annotations

from typing import Iterable, Iterator


class FeaturePath:
    """An immutable path of feature-name steps addressing a (possibly nested)
    feature. Hashable and totally ordered by its step tuple."""

    __slots__ = ("_steps",)

    def __init__(self, steps: Iterable[str] = ()):
        steps = tuple(steps)
        for s in steps:
            if not isinstance(s, str):
                raise TypeError(
                    "FeaturePath steps must be strings, got %r" % (s,)
                )
        self._steps = steps

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_string(cls, path: str) -> "FeaturePath":
        """Parse a dotted path string ("parent.child") — the engine's
        flattened stats-key form. An empty string is the empty path."""
        if path == "":
            return cls(())
        return cls(path.split("."))

    # -- accessors -----------------------------------------------------------
    def steps(self) -> tuple[str, ...]:
        return self._steps

    def to_path(self) -> str:
        """Canonical dotted string — matches the engine's flattened stats
        feature names, so ``FeaturePath(["a", "b"]).to_path()`` indexes the
        same feature as the stats key ``"a.b"``."""
        return ".".join(self._steps)

    def parent(self) -> "FeaturePath":
        if not self._steps:
            raise ValueError("Root (empty) FeaturePath has no parent.")
        return FeaturePath(self._steps[:-1])

    def child(self, child_step: str) -> "FeaturePath":
        return FeaturePath(self._steps + (child_step,))

    # -- dunder --------------------------------------------------------------
    def __str__(self) -> str:
        return self.to_path()

    def __repr__(self) -> str:
        return "FeaturePath(%r)" % (list(self._steps),)

    def __len__(self) -> int:
        return len(self._steps)

    def __iter__(self) -> Iterator[str]:
        return iter(self._steps)

    def __bool__(self) -> bool:
        return bool(self._steps)

    def __eq__(self, other) -> bool:
        if isinstance(other, FeaturePath):
            return self._steps == other._steps
        return NotImplemented

    def __lt__(self, other) -> bool:
        if isinstance(other, FeaturePath):
            return self._steps < other._steps
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self._steps)


def normalize_feature_id(name_or_path_or_steps) -> FeaturePath:
    """Reference ``stats_util._normalize_feature_id``: a str becomes a
    length-one path UNLESS it contains '.', in which case it's parsed as the
    engine's dotted flattened form (our artifact keys nested features by
    dotted strings, so "a.b" must address the nested feature, not a top-level
    feature literally named "a.b")."""
    if isinstance(name_or_path_or_steps, FeaturePath):
        return name_or_path_or_steps
    if isinstance(name_or_path_or_steps, str):
        return FeaturePath.from_string(name_or_path_or_steps)
    return FeaturePath(name_or_path_or_steps)
