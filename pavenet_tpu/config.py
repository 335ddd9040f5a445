"""Python-file config system with ``_base_`` inheritance.

Re-implements the user-facing surface of the reference config loader
(``third_party/mmcv/mmcv/utils/config.py``): configs are python files whose
top-level variables form a dict, ``_base_`` lists parent configs that are
deep-merged (child wins), ``_delete_=True`` inside a dict drops the inherited
value, and ``merge_from_dict`` applies ``a.b.c=value`` CLI overrides.
"""
from __future__ import annotations

import copy
import importlib.util
import os
import sys
import tempfile
import types
from typing import Any, Dict, List, Optional

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"
RESERVED_KEYS = ("filename",)


class ConfigDict(dict):
    """dict with attribute access, used for all nested config mappings."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict(
            {copy.deepcopy(k, memo): copy.deepcopy(v, memo)
             for k, v in self.items()})


def _to_config_dict(obj):
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_config_dict(v) for v in obj)
    return obj


def _merge_a_into_b(a: dict, b: dict, allow_list_keys: bool = False) -> dict:
    """Deep-merge dict ``a`` (child / override) into ``b`` (base)."""
    b = copy.deepcopy(b)
    for k, v in a.items():
        if allow_list_keys and k.isdigit() and isinstance(b, list):
            k = int(k)
            if len(b) <= k:
                raise KeyError(f"index {k} exceeds list length {len(b)}")
            b[k] = _merge_a_into_b(v, b[k], allow_list_keys)
        elif isinstance(v, dict):
            if k in b and not v.pop(DELETE_KEY, False):
                if not isinstance(b[k], dict):
                    raise TypeError(
                        f"cannot merge dict into non-dict for key '{k}'; "
                        f"add `{DELETE_KEY}=True` to override")
                b[k] = _merge_a_into_b(v, b[k], allow_list_keys)
            else:
                b[k] = copy.deepcopy(v)
                if isinstance(b[k], dict):
                    b[k].pop(DELETE_KEY, None)
        else:
            b[k] = v
    return b


def _load_py_file(filename: str) -> Dict[str, Any]:
    filename = os.path.abspath(os.path.expanduser(filename))
    if not os.path.isfile(filename):
        raise FileNotFoundError(filename)
    spec = importlib.util.spec_from_file_location(
        "_pavenet_cfg_" + os.path.basename(filename).replace(".", "_"),
        filename)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        cfg_dict = {
            k: v for k, v in vars(mod).items()
            if not k.startswith("__") and not isinstance(
                v, (types.ModuleType, types.FunctionType, type))
        }
    finally:
        del sys.modules[spec.name]
    return copy.deepcopy(cfg_dict)


def _file2dict(filename: str) -> Dict[str, Any]:
    cfg_dict = _load_py_file(filename)
    base_files = cfg_dict.pop(BASE_KEY, [])
    if isinstance(base_files, str):
        base_files = [base_files]
    cfg_dir = os.path.dirname(os.path.abspath(os.path.expanduser(filename)))
    base_dict: Dict[str, Any] = {}
    for base in base_files:
        base_path = base if os.path.isabs(base) else os.path.join(
            cfg_dir, base)
        parent = _file2dict(base_path)
        dup = set(base_dict) & set(parent)
        if dup:
            raise KeyError(f"duplicate keys in _base_ configs: {dup}")
        base_dict.update(parent)
    return _merge_a_into_b(cfg_dict, base_dict)


class Config:
    """Config object wrapping a nested ConfigDict.

    Mirrors the reference API used by tools/train.py & tools/test.py:
    ``Config.fromfile``, attribute access, ``merge_from_dict``, ``dump``,
    ``pretty_text``, ``get``.
    """

    def __init__(self, cfg_dict: Optional[dict] = None,
                 filename: Optional[str] = None):
        cfg_dict = cfg_dict or {}
        for k in RESERVED_KEYS:
            if k in cfg_dict:
                raise KeyError(f"{k} is reserved")
        super().__setattr__("_cfg_dict", _to_config_dict(cfg_dict))
        super().__setattr__("_filename", filename)

    @staticmethod
    def fromfile(filename: str) -> "Config":
        return Config(_file2dict(filename), filename=filename)

    @staticmethod
    def fromstring(cfg_str: str) -> "Config":
        with tempfile.NamedTemporaryFile(
                "w", suffix=".py", delete=False) as f:
            f.write(cfg_str)
            path = f.name
        try:
            return Config.fromfile(path)
        finally:
            os.unlink(path)

    @property
    def filename(self):
        return self._filename

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __setattr__(self, name, value):
        self._cfg_dict[name] = _to_config_dict(value)

    def __getitem__(self, key):
        return self._cfg_dict[key]

    def __setitem__(self, key, value):
        self._cfg_dict[key] = _to_config_dict(value)

    def __contains__(self, key):
        return key in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def __len__(self):
        return len(self._cfg_dict)

    def __repr__(self):
        return f"Config (path: {self._filename}): {self._cfg_dict!r}"

    def get(self, key, default=None):
        return self._cfg_dict.get(key, default)

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def copy(self):
        return Config(copy.deepcopy(dict(self._cfg_dict)), self._filename)

    def to_dict(self):
        def _plain(o):
            if isinstance(o, dict):
                return {k: _plain(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return type(o)(_plain(v) for v in o)
            return o
        return _plain(dict(self._cfg_dict))

    def merge_from_dict(self, options: Dict[str, Any],
                        allow_list_keys: bool = True):
        """Apply ``{'a.b.c': v}``-style overrides (CLI ``--cfg-options``)."""
        option_cfg: Dict[str, Any] = {}
        for full_key, v in options.items():
            d = option_cfg
            keys = full_key.split(".")
            for sub in keys[:-1]:
                d = d.setdefault(sub, {})
            d[keys[-1]] = v
        merged = _merge_a_into_b(
            option_cfg, dict(self._cfg_dict), allow_list_keys=allow_list_keys)
        super().__setattr__("_cfg_dict", _to_config_dict(merged))

    @property
    def pretty_text(self) -> str:
        import pprint
        return pprint.pformat(self.to_dict(), width=100, sort_dicts=False)

    def dump(self, file: Optional[str] = None):
        text = "\n".join(
            f"{k} = {pformat_value(v)}" for k, v in self.to_dict().items())
        if file is None:
            return text
        with open(file, "w") as f:
            f.write(text + "\n")


def pformat_value(v) -> str:
    import pprint
    return pprint.pformat(v, width=100, sort_dicts=False)


class DictAction:
    """argparse action-compatible parser for KEY=VALUE config overrides."""

    @staticmethod
    def parse_value(val: str):
        for fn in (int, float):
            try:
                return fn(val)
            except ValueError:
                pass
        if val.lower() in ("true", "false"):
            return val.lower() == "true"
        if val == "None":
            return None
        if "," in val or (val.startswith("[") and val.endswith("]")) or (
                val.startswith("(") and val.endswith(")")):
            inner = val.strip("[]()")
            return [DictAction.parse_value(x) for x in inner.split(",") if x]
        return val

    @staticmethod
    def parse(pairs: List[str]) -> Dict[str, Any]:
        out = {}
        for pair in pairs:
            key, _, val = pair.partition("=")
            out[key] = DictAction.parse_value(val)
        return out


_VAR_PATTERN = None


def replace_cfg_vals(cfg: "Config") -> "Config":
    """Substitute ``"${key.path}"`` strings with config values (reference:
    ``mmdet/utils/replace_cfg_vals.py``).  A string that is exactly one
    ``${...}`` takes the referenced value verbatim (any type); embedded
    occurrences are str-interpolated.  A ``model_wrapper`` key, if present,
    replaces ``model`` (same as the reference)."""
    import re
    global _VAR_PATTERN
    if _VAR_PATTERN is None:
        _VAR_PATTERN = re.compile(r"\$\{[a-zA-Z\d_.]*\}")

    root = cfg._cfg_dict

    def get_value(key):
        node = root
        for k in key.split("."):
            node = node[k]
        return node

    def replace(value):
        if isinstance(value, dict):
            return type(value)(
                {k: replace(v) for k, v in value.items()})
        if isinstance(value, list):
            return [replace(v) for v in value]
        if isinstance(value, tuple):
            return tuple(replace(v) for v in value)
        if isinstance(value, str):
            keys = _VAR_PATTERN.findall(value)
            if not keys:
                return value
            if len(keys) == 1 and keys[0] == value:
                return get_value(keys[0][2:-1])
            for key in keys:
                sub = get_value(key[2:-1])
                if isinstance(sub, (dict, list, tuple)):
                    raise TypeError(
                        f"cannot str-interpolate {type(sub)} for {key}")
                value = value.replace(key, str(sub))
            return value
        return value

    new = Config(replace(root), filename=cfg.filename)
    if new.get("model_wrapper") is not None:
        new["model"] = new["model_wrapper"]
        del new._cfg_dict["model_wrapper"]
    return new


def update_data_root(cfg: "Config") -> None:
    """Rewrite dataset paths when env ``MMDET_DATASETS`` is set (reference:
    ``mmdet/utils/misc.py:45``): every string containing ``cfg.data_root``
    has that prefix replaced, in place."""
    dst = os.environ.get("MMDET_DATASETS")
    if not dst or "data_root" not in cfg:
        return
    src = cfg["data_root"]

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v)
            elif isinstance(v, str) and src in v:
                d[k] = v.replace(src, dst)
    walk(cfg._cfg_dict)
    cfg["data_root"] = dst
