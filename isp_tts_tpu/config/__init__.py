from .loader import (
    load_recipe,
    load_yaml,
    merge_dicts,
    resolve_interpolations,
    disable_nodes,
    register_resolver,
)
from .registry import Registry, build_config, filter_to_fields, MISSING

__all__ = [
    "load_recipe",
    "load_yaml",
    "merge_dicts",
    "resolve_interpolations",
    "disable_nodes",
    "register_resolver",
    "Registry",
    "build_config",
    "filter_to_fields",
    "MISSING",
]
