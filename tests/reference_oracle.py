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
    mod = types.ModuleType(name)
    mod.__path__ = []
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
    tv = _stub("torchvision", __version__="0.0")
    for sub in ("models", "ops", "transforms", "utils", "datasets"):
        setattr(tv, sub, _stub(f"torchvision.{sub}"))
    path = f"{REFERENCE_ROOT}/third_party/mmcv"
    if path not in sys.path:
        sys.path.insert(0, path)


def load_mmcv_attention():
    """Returns the reference attention module namespace (CPU-usable)."""
    install_stubs()
    import mmcv.ops.multi_scale_deform_attn as ref_msda

    # the reference's CPU branch for the mul-frames classes calls the
    # pytorch fallback with the CUDA-function signature (reference bug,
    # SURVEY.md §7 'bug triage'); adapt the fallback so both call shapes
    # work for oracle purposes.
    orig = ref_msda.multi_scale_deformable_attn_pytorch

    def adaptive(value, spatial_shapes, *args):
        if len(args) == 2:
            locs, weights = args
        else:  # (level_start_index, locs, weights, im2col_step)
            _, locs, weights = args[:3]
        return orig(value, spatial_shapes, locs, weights)

    ref_msda.multi_scale_deformable_attn_pytorch = adaptive
    return ref_msda
