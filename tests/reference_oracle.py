"""Import helpers for using the reference PyTorch modules as parity oracles.

Test-only: stubs the missing heavyweight deps (addict/yapf/torchvision and
the compiled ``mmcv._ext``) so the vendored mmcv/opera *python* modules load
on CPU.  Nothing from the reference is copied into the framework — these
imports exist purely to diff activations in tests.
"""
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__path__ = []
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                  is_package=True)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    class Dict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub("addict", Dict=Dict)
    _stub("yapf")
    _stub("yapf.yapflib")
    _stub("yapf.yapflib.yapf_api", FormatCode=lambda *a, **k: ("", True))

    class FakeExt(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)

            def _unavailable(*a, **k):
                raise RuntimeError("CUDA ext not available on CPU oracle")
            return _unavailable

    sys.modules.setdefault("mmcv._ext", FakeExt("mmcv._ext"))

    class _AsciiTable:
        def __init__(self, table_data, *a, **k):
            self.table_data = table_data
            self.table = "\n".join(
                " | ".join(str(c) for c in row) for row in table_data)

    _stub("terminaltables", AsciiTable=_AsciiTable)

    class _EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub("easydict", EasyDict=_EasyDict)
    shp = _stub("shapely")
    shp.geometry = _stub("shapely.geometry", Polygon=object, Point=object,
                         box=lambda *a, **k: None)
    _stub("tabulate", tabulate=lambda *a, **k: "")
    _stub("termcolor", colored=lambda s, *a, **k: s)
    _stub("motmetrics")
    import scipy.io as _sio  # noqa: F401  (scipy exists in env)
    try:
        import pycocotools  # noqa: F401
    except ImportError:
        import numpy as _np
        _stub("pycocotools")

        class _COCO:
            def __init__(self, *a, **k):
                self.dataset = {}
                self.anns, self.imgs, self.cats = {}, {}, {}

        _stub("pycocotools.coco", COCO=_COCO)
        _stub("pycocotools.cocoeval", COCOeval=object)
        _stub("pycocotools.mask",
              iou=lambda *a, **k: _np.zeros(0),
              encode=lambda *a, **k: None,
              decode=lambda *a, **k: None,
              area=lambda *a, **k: 0.0,
              toBbox=lambda *a, **k: _np.zeros(4),
              frPyObjects=lambda *a, **k: None,
              merge=lambda *a, **k: None)
    tv = _stub("torchvision", __version__="0.0")
    for sub in ("models", "ops", "transforms", "utils", "datasets"):
        setattr(tv, sub, _stub(f"torchvision.{sub}"))
    tvf = _stub("torchvision.transforms.functional",
                to_tensor=lambda x: x, normalize=lambda x, *a, **k: x)
    sys.modules["torchvision.transforms"].functional = tvf
    path = f"{REFERENCE_ROOT}/third_party/mmcv"
    if path not in sys.path:
        sys.path.insert(0, path)


def patch_cpu_fallbacks():
    """Make the mul-frames CPU fallback signature-tolerant everywhere.

    The reference's CPU branch passes the CUDA-signature args to the
    pytorch fallback (reference bug); patch every module namespace that
    imported the symbol.
    """
    import mmcv.ops.multi_scale_deform_attn as ref_msda
    orig = getattr(ref_msda, "_orig_msda_pytorch", None) or \
        ref_msda.multi_scale_deformable_attn_pytorch
    ref_msda._orig_msda_pytorch = orig

    def adaptive(value, spatial_shapes, *args):
        if len(args) == 2:
            locs, weights = args
        else:
            _, locs, weights = args[:3]
        return orig(value, spatial_shapes, locs, weights)

    modules = [ref_msda]
    for name in ("opera.models.utils.transformer",
                 "mmdet.models.utils.transformer",
                 "opera.models.dense_heads.soit_head",
                 "mmcv.ops"):
        if name in sys.modules:
            modules.append(sys.modules[name])
    for mod in modules:
        if hasattr(mod, "multi_scale_deformable_attn_pytorch"):
            mod.multi_scale_deformable_attn_pytorch = adaptive
    return adaptive


def load_mmcv_attention():
    """Returns the reference attention module namespace (CPU-usable)."""
    install_stubs()
    import mmcv.ops.multi_scale_deform_attn as ref_msda
    patch_cpu_fallbacks()
    return ref_msda
