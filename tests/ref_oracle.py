"""Import reference modules from /root/reference as read-only test oracles.

The reference repo is the behavioral specification; its torch modules are
imported (never copied) to generate golden outputs for parity tests. A
synthetic package shell is used so module files import standalone without
executing the reference package __init__ (which needs torchvision/ftfy not
present in this image).
"""
import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _ensure_ftfy_stub():
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            import importlib.machinery

            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda t: t
            # a real ModuleSpec: transformers probes optional deps with
            # importlib.util.find_spec, which raises on __spec__ = None
            stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
            sys.modules["ftfy"] = stub


def ref_clip_module(name: str):
    """Import /root/reference/CLIP/clip/<name>.py under the 'refclip' shell."""
    _ensure_ftfy_stub()
    if "refclip" not in sys.modules:
        pkg = types.ModuleType("refclip")
        pkg.__path__ = [f"{REFERENCE_ROOT}/CLIP/clip"]
        sys.modules["refclip"] = pkg
    return importlib.import_module(f"refclip.{name}")


def ref_root_module(name: str):
    """Import a module from the reference repo root (e.g. unet3d)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"refroot_{name}", f"{REFERENCE_ROOT}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refroot_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def fake_text_feature(name: str, dim: int = 512):
    """Deterministic per-string pseudo CLIP text feature (shared by the
    reference ClipWrapper stub and our-side test inputs)."""
    import zlib

    import numpy as np

    seed = zlib.crc32(name.encode("utf-8")) & 0xFFFFFFFF
    return np.random.RandomState(seed).randn(dim).astype(np.float32)


def _ensure_torch_scatter_shim():
    """torch_scatter.scatter reproduced with torch.scatter_reduce.

    include_self=False gives torch_scatter's exact semantics: occupied
    segments reduce only over scattered values (a negative max stays
    negative), empty segments keep the zero-initialized output.
    """
    if "torch_scatter" in sys.modules:
        return
    import torch

    mod = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
        if dim < 0:
            dim += src.dim()
        if dim_size is None:
            dim_size = int(index.max()) + 1
        # broadcast index (leading dims match src) across trailing feature dims
        while index.dim() < src.dim():
            index = index.unsqueeze(-1)
        index = index.expand_as(src).long()
        out_shape = list(src.shape)
        out_shape[dim] = int(dim_size)
        result = src.new_zeros(out_shape)
        red = {"max": "amax", "min": "amin", "mean": "mean", "sum": "sum"}[reduce]
        result.scatter_reduce_(dim, index, src, reduce=red, include_self=False)
        return result

    mod.scatter = scatter
    sys.modules["torch_scatter"] = mod


def _ensure_torchtyping_stub():
    if "torchtyping" in sys.modules:
        return
    import torch

    mod = types.ModuleType("torchtyping")

    class TensorType:
        def __class_getitem__(cls, item):
            return torch.Tensor

    mod.TensorType = TensorType
    mod.patch_typeguard = lambda: None
    sys.modules["torchtyping"] = mod


def _ensure_clip_stub():
    """Stub CLIP.clip.ClipWrapper: net.py only calls
    get_clip_text_feature (net.py:594-602); serve deterministic features
    so SemanticAwareVOOL parity runs without the real CLIP weights."""
    if "CLIP.clip" in sys.modules:
        return
    import numpy as np

    pkg = types.ModuleType("CLIP")
    sub = types.ModuleType("CLIP.clip")

    class ClipWrapper:
        @staticmethod
        def get_clip_text_feature(names):
            return np.stack([fake_text_feature(str(n)) for n in names])

    sub.ClipWrapper = ClipWrapper
    pkg.clip = sub
    sys.modules["CLIP"] = pkg
    sys.modules["CLIP.clip"] = sub


def _ensure_torchvision_stub():
    """torchvision is absent; the reference ClipWrapper only needs its
    transform NAMES importable (ColorJitter etc. are never called when the
    oracle path runs with augmentations=0 and a patched preprocess)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class _StubTransform:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise RuntimeError("torchvision stub transform called in oracle")

    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
                 "ColorJitter"):
        setattr(tr, name, type(name, (_StubTransform,), {}))
    tv.transforms = tr
    tv.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec(
        "torchvision", loader=None
    )
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def ref_clip_wrapper_module():
    """Import the reference CLIP/clip/__init__.py (ClipWrapper + the
    composed get_clip_saliency_convolve pipeline) as package 'refclipw'."""
    if "refclipw" in sys.modules:
        return sys.modules["refclipw"]
    import importlib.util

    _ensure_ftfy_stub()
    _ensure_torchvision_stub()
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            import importlib.machinery
            import packaging
            import packaging.version  # clip_explainability uses .version

            stub = types.ModuleType("pkg_resources")
            stub.packaging = packaging
            stub.__spec__ = importlib.machinery.ModuleSpec(
                "pkg_resources", loader=None
            )
            sys.modules["pkg_resources"] = stub
    spec = importlib.util.spec_from_file_location(
        "refclipw",
        f"{REFERENCE_ROOT}/CLIP/clip/__init__.py",
        submodule_search_locations=[f"{REFERENCE_ROOT}/CLIP/clip"],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refclipw"] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_net_module():
    """Import /root/reference/net.py as an end-to-end value oracle.

    Shims the absent native/vendored deps (torch_scatter -> scatter_reduce,
    torchtyping stub, ClipWrapper text-feature stub) and registers the
    reference unet3d under its absolute-import name, then loads net.py
    read-only.
    """
    if "refnet" in sys.modules:
        return sys.modules["refnet"]
    import importlib.util

    _ensure_torch_scatter_shim()
    _ensure_torchtyping_stub()
    _ensure_clip_stub()
    if "unet3d" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "unet3d", f"{REFERENCE_ROOT}/unet3d.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["unet3d"] = mod
        spec.loader.exec_module(mod)
    spec = importlib.util.spec_from_file_location(
        "refnet", f"{REFERENCE_ROOT}/net.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refnet"] = mod
    spec.loader.exec_module(mod)
    return mod
