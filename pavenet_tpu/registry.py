"""Registry with mm-style scope-prefixed type strings.

The reference framework resolves config ``type=`` strings through a chain of
parent registries so that ``'opera.VideoPoseV1'``, ``'mmdet.ResNet'`` and
``'mmcv.DetrTransformerEncoder'`` can coexist in one config
(see reference ``opera/models/builder.py:7`` and
``third_party/mmcv/mmcv/utils/registry.py``).  This rebuild keeps the exact
user-facing string surface but collapses the parent chain: a single registry
accepts any scope prefix and resolves on the final component, so existing
configs work unchanged.
"""
from __future__ import annotations

import inspect
from typing import Any, Dict, Optional

KNOWN_SCOPES = ("opera", "mmdet", "mmcv", "pavenet", "torch")


def split_scope_key(key: str):
    """Split 'scope.Key' into (scope, Key); scope is None if absent."""
    split_index = key.find(".")
    if split_index != -1 and key[:split_index] in KNOWN_SCOPES:
        return key[:split_index], key[split_index + 1:]
    return None, key


class Registry:
    """A string -> class/function map used to build objects from configs."""

    def __init__(self, name: str, parent: Optional["Registry"] = None):
        self._name = name
        self._module_dict: Dict[str, Any] = {}
        self._children: Dict[str, "Registry"] = {}
        self.parent = parent
        if parent is not None:
            parent._children[name] = self

    def __len__(self):
        return len(self._module_dict)

    def __contains__(self, key):
        return self.get(key) is not None

    def __repr__(self):
        return (f"Registry(name={self._name}, "
                f"items={list(self._module_dict)})")

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return self._module_dict

    def get(self, key: str):
        """Look up a registered class, ignoring any known scope prefix."""
        _, real_key = split_scope_key(key)
        if real_key in self._module_dict:
            return self._module_dict[real_key]
        if self.parent is not None:
            return self.parent.get(real_key)
        return None

    def _register(self, cls, name=None, force=False):
        if name is None:
            names = [cls.__name__]
        elif isinstance(name, str):
            names = [name]
        else:
            names = list(name)
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} is already registered in {self._name}")
            self._module_dict[n] = cls
        return cls

    def register_module(self, name=None, force=False, module=None):
        """Decorator (or direct call with ``module=``) to register a class."""
        if module is not None:
            return self._register(module, name=name, force=force)

        def _decorator(cls):
            return self._register(cls, name=name, force=force)

        return _decorator

    def build(self, cfg: dict, default_args: Optional[dict] = None):
        return build_from_cfg(cfg, self, default_args)


def build_from_cfg(cfg: dict, registry: Registry,
                   default_args: Optional[dict] = None):
    """Instantiate ``registry.get(cfg['type'])(**cfg_without_type)``."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(
                f"{obj_type} is not registered in the {registry.name} "
                f"registry; known: {sorted(registry.module_dict)}")
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {type(obj_type)}")
    return obj_cls(**args)


# Global registries (flat; scope prefixes in configs are accepted and ignored)
MODELS = Registry("models")
BACKBONES = MODELS
NECKS = MODELS
HEADS = MODELS
LOSSES = Registry("losses")
ATTENTION = Registry("attention")
TRANSFORMER = Registry("transformer")
TRANSFORMER_LAYER = TRANSFORMER
TRANSFORMER_LAYER_SEQUENCE = TRANSFORMER
POSITIONAL_ENCODING = Registry("positional_encoding")
MATCH_COSTS = Registry("match_costs")
ASSIGNERS = Registry("assigners")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
HOOKS = Registry("hooks")
