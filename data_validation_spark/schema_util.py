"""Schema accessors — parity with the reference's
``tensorflow_data_validation/utils/schema_util.py`` exports
(``get_feature:27``, ``get_domain:76``, ``set_domain:120``,
``generate_dummy_schema_with_paths:434``) over our dataclass schema.

The reference's ``domain_info`` is a proto oneof; our FeatureSpec carries one
optional field per domain kind, so setters here enforce the oneof invariant
by clearing the others.
"""

from __future__ import annotations

import logging
from typing import Union

from data_validation_spark.paths import FeaturePath, normalize_feature_id
from data_validation_spark.schema import (
    BoolDomain,
    FeatureSpec,
    FeatureType,
    FloatDomain,
    ImageDomain,
    IntDomain,
    MIDDomain,
    NaturalLanguageDomain,
    Schema,
    StringDomain,
    StructDomain,
    TimeDomain,
    URLDomain,
)

# domain_info "oneof": maps each accepted python type to its FeatureSpec
# field name (reference set_domain derives this from the proto descriptor).
_DOMAIN_FIELDS: dict[type, str] = {
    IntDomain: "int_domain",
    FloatDomain: "float_domain",
    StringDomain: "string_domain",
    BoolDomain: "bool_domain",
    ImageDomain: "image_domain",
    NaturalLanguageDomain: "natural_language_domain",
    TimeDomain: "time_domain",
    URLDomain: "url_domain",
    MIDDomain: "mid_domain",
    str: "domain",
}


def _require_schema(schema) -> None:
    if not isinstance(schema, Schema):
        raise TypeError(
            "schema is of type %s, should be a Schema." % type(schema).__name__
        )


def get_feature(
    schema: Schema, feature_path: Union[str, FeaturePath]
) -> FeatureSpec:
    """Get a feature spec from the schema, walking struct_domain children for
    multi-step paths; raises ValueError when absent (reference
    ``schema_util.get_feature``)."""
    _require_schema(schema)
    path = normalize_feature_id(feature_path)
    if not path:
        raise ValueError("Feature %s not found in the schema." % path)
    container = schema.feature
    for step in path.steps()[:-1]:
        f = _look_up(step, container)
        if f is None:
            raise ValueError("Feature %s not found in the schema." % path)
        if f.type != FeatureType.STRUCT or f.struct_domain is None:
            raise ValueError(
                "Step %s in feature %s does not refer to a valid STRUCT feature"
                % (step, path)
            )
        container = f.struct_domain.feature
    feature = _look_up(path.steps()[-1], container)
    if feature is None:
        raise ValueError("Feature %s not found in the schema." % path)
    return feature


def _look_up(name: str, container: list[FeatureSpec]):
    for f in container:
        if f.name == name:
            return f
    return None


def get_domain(schema: Schema, feature_path: Union[str, FeaturePath]):
    """The domain object set on a feature; a named global string domain
    resolves through ``schema.string_domain`` (reference
    ``schema_util.get_domain``). Raises ValueError when the feature has no
    domain, or names an unknown global domain."""
    _require_schema(schema)
    feature = get_feature(schema, feature_path)
    for d_type, field_name in _DOMAIN_FIELDS.items():
        if d_type is str:
            continue
        value = getattr(feature, field_name)
        if value is not None:
            return value
    if feature.domain:
        for domain in schema.string_domain:
            if domain.name == feature.domain:
                return domain
        raise ValueError(
            "Feature %s has an unsupported domain %s."
            % (feature_path, feature.domain)
        )
    raise ValueError(
        "Feature %s has no domain associated with it." % feature_path
    )


def set_domain(
    schema: Schema, feature_path: Union[str, FeaturePath], domain
) -> None:
    """Set (or overwrite) a feature's domain in place (reference
    ``schema_util.set_domain``): accepts any domain dataclass or the name of
    a global string domain already present in the schema; clears any other
    domain kind (oneof semantics); refuses STRUCT features."""
    _require_schema(schema)
    if not isinstance(domain, tuple(_DOMAIN_FIELDS)):
        raise TypeError(
            "domain is of type %s, should be one of the supported domain "
            "types." % type(domain).__name__
        )
    feature = get_feature(schema, feature_path)
    if feature.type == FeatureType.STRUCT:
        raise TypeError(
            "Could not set the domain of a STRUCT feature %s." % feature_path
        )
    had_domain = any(
        getattr(feature, fname) is not None if dt is not str else bool(feature.domain)
        for dt, fname in _DOMAIN_FIELDS.items()
    )
    if had_domain:
        logging.warning('Replacing existing domain of feature "%s".', feature_path)
    # Clear the oneof, then set the matching field.
    for fname in _DOMAIN_FIELDS.values():
        setattr(feature, fname, None)
    if isinstance(domain, str):
        if not any(g.name == domain for g in schema.string_domain):
            raise ValueError(f'Invalid global string domain "{domain}".')
        feature.domain = domain
    else:
        # Exact-type match first (BoolDomain etc. must not fall into a
        # superclass bucket); isinstance fallback mirrors the reference.
        fname = _DOMAIN_FIELDS.get(type(domain))
        if fname is None:
            for dt, candidate in _DOMAIN_FIELDS.items():
                if dt is not str and isinstance(domain, dt):
                    fname = candidate
                    break
        setattr(feature, fname, domain)


def generate_dummy_schema_with_paths(paths: list) -> Schema:
    """Generate a schema containing exactly the requested feature paths and
    nothing else, nesting multi-step paths as STRUCT features (reference
    ``schema_util.generate_dummy_schema_with_paths``)."""
    schema = Schema()
    tree: dict = {}
    for p in paths:
        node = tree
        for step in normalize_feature_id(p).steps():
            node = node.setdefault(step, {})

    def _add(container: list[FeatureSpec], name: str, children: dict) -> None:
        spec = FeatureSpec(name=name)
        if children:
            spec.type = FeatureType.STRUCT
            spec.struct_domain = StructDomain()
            for child_name, grandchildren in children.items():
                _add(spec.struct_domain.feature, child_name, grandchildren)
        container.append(spec)

    for name, children in tree.items():
        _add(schema.feature, name, children)
    return schema
