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
