"""Pin tests/mock_ai2thor.py against the ai2thor API surface the REFERENCE
actually consumes (generate_thor_data.py:695-1018), derived MECHANICALLY.

The real Unity binary is absent from this image, so the driver loop is only
ever executed against the mock. If the mock's event/metadata shape drifts
from what the reference (and therefore our driver, which mirrors it) reads,
that drift would surface in the field instead of in CI. This test walks the
reference file's AST and extracts:

- every attribute read off a THOR event (``event.frame``, ``.depth_frame``,
  ``.instance_segmentation_frame``, ``.color_to_object_id``, ``.metadata``,
  including reads directly off ``controller.step(...)``),
- every string-key path read under ``.metadata`` (``["agent"]["position"]``,
  ``["actionReturn"]``, ``["objects"]``, ...),
- every field read off an objects-info dict (``obj_info["objectType"]``,
  ``["salientMaterials"]``, ``["parentReceptacles"]``, ``["objectId"]``),
- the Controller ctor kwargs of the run_simulator call site (:705-722) and
  the Teleport step kwargs (:737-744),

then asserts the mock serves every one of them. Reference edits that start
consuming a new field fail here, not in the field.
"""
import ast

import numpy as np
import pytest

import mock_ai2thor

REFERENCE_DATAGEN = "/root/reference/generate_thor_data.py"


@pytest.fixture(scope="module")
def ref_tree():
    with open(REFERENCE_DATAGEN) as f:
        return ast.parse(f.read())


def _is_step_call(node) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "step"
    )


def _event_attrs(tree):
    """Attributes read off ``event`` or directly off ``controller.step(...)``."""
    attrs = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Attribute):
            continue
        base = node.value
        if isinstance(base, ast.Name) and base.id == "event":
            attrs.add(node.attr)
        elif _is_step_call(base):
            attrs.add(node.attr)
    return attrs


def _metadata_key_paths(tree):
    """String-key paths subscripted under any ``...metadata`` expression.

    ``event.metadata["agent"]["cameraHorizon"]`` -> ("agent", "cameraHorizon").
    Only constant string keys count (variable keys, e.g. per-color lookups,
    cannot be pinned statically).
    """
    paths = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Subscript):
            continue
        keys = []
        cur = node
        while isinstance(cur, ast.Subscript):
            if isinstance(cur.slice, ast.Constant) and isinstance(
                cur.slice.value, str
            ):
                keys.append(cur.slice.value)
            else:
                keys = None
                break
            cur = cur.value
        if not keys:
            continue
        if isinstance(cur, ast.Attribute) and cur.attr == "metadata":
            paths.add(tuple(reversed(keys)))
    return paths


def _objinfo_keys(tree):
    """String keys read off objects-info dicts (``obj_info[...]`` names)."""
    keys = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Subscript)
            and isinstance(node.value, ast.Name)
            and node.value.id in ("obj_info", "parent_obj_info")
            and isinstance(node.slice, ast.Constant)
            and isinstance(node.slice.value, str)
        ):
            keys.add(node.slice.value)
    return keys


def _controller_ctor_kwargs(tree):
    """Keyword names of the run_simulator Controller(...) call site (the
    one WITHOUT local_executable_path; the other site drives the external
    Unity exporter, not the datagen driver)."""
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "Controller"
        ):
            names = {kw.arg for kw in node.keywords if kw.arg}
            if "local_executable_path" not in names:
                return names
    raise AssertionError("run_simulator Controller ctor not found in reference")


def _teleport_kwargs(tree):
    for node in ast.walk(tree):
        if not _is_step_call(node):
            continue
        kw = {k.arg: k.value for k in node.keywords if k.arg}
        action = kw.get("action")
        if (
            isinstance(action, ast.Constant)
            and action.value == "Teleport"
        ):
            return {name for name in kw if name != "action"}
    raise AssertionError("Teleport step call not found in reference")


# ---------------------------------------------------------------------------


def _mock_event():
    ctrl_cls = mock_ai2thor.install()
    try:
        c = ctrl_cls(
            agentMode="default", visibilityDistance=1.5,
            scene="FloorPlan1", gridSize=0.05, snapToGrid=False,
            rotateStepDegrees=5, renderDepthImage=True,
            renderInstanceSegmentation=True, width=64, height=48,
            fieldOfView=90.0, platform=mock_ai2thor.CloudRendering,
        )
        # GetReachablePositions serves the union shape (incl. actionReturn)
        return c.step(action="GetReachablePositions")
    finally:
        mock_ai2thor.uninstall()


def test_extraction_found_the_known_surface(ref_tree):
    """Floor asserts so an AST-walk regression can't vacuously pass."""
    attrs = _event_attrs(ref_tree)
    assert {"frame", "depth_frame", "instance_segmentation_frame",
            "color_to_object_id", "metadata"} <= attrs
    paths = _metadata_key_paths(ref_tree)
    assert ("actionReturn",) in paths
    assert ("agent", "cameraHorizon") in paths
    assert ("objects",) in paths
    assert {"objectType", "salientMaterials", "parentReceptacles",
            "objectId"} <= _objinfo_keys(ref_tree)


def test_mock_event_serves_every_reference_attribute(ref_tree):
    ev = _mock_event()
    missing = {a for a in _event_attrs(ref_tree) if not hasattr(ev, a)}
    assert not missing, f"mock event lacks reference-consumed attrs: {missing}"


def test_mock_metadata_serves_every_reference_key_path(ref_tree):
    ev = _mock_event()
    missing = []
    for path in sorted(_metadata_key_paths(ref_tree)):
        cur = ev.metadata
        for key in path:
            if not isinstance(cur, dict) or key not in cur:
                missing.append(path)
                break
            cur = cur[key]
    assert not missing, f"mock metadata lacks key paths: {missing}"


def test_mock_objects_info_serves_every_reference_field(ref_tree):
    keys = _objinfo_keys(ref_tree)
    for obj in mock_ai2thor.OBJECTS_INFO:
        missing = keys - set(obj)
        assert not missing, (
            f"mock objects_info entry {obj.get('objectId')} lacks "
            f"reference-consumed fields: {missing}"
        )


def test_mock_controller_accepts_reference_ctor_and_teleport(ref_tree):
    ctor_names = _controller_ctor_kwargs(ref_tree)
    teleport_names = _teleport_kwargs(ref_tree)
    assert teleport_names == {"position", "rotation", "horizon", "standing"}
    ctrl_cls = mock_ai2thor.install()
    try:
        kwargs = {
            "agentMode": "default", "visibilityDistance": 1.5,
            "scene": "FloorPlan1", "gridSize": 0.05, "snapToGrid": False,
            "rotateStepDegrees": 5, "renderDepthImage": True,
            "renderInstanceSegmentation": True, "width": 64, "height": 48,
            "fieldOfView": 90.0, "platform": mock_ai2thor.CloudRendering,
        }
        # our driver passes exactly the reference's kwarg set; the mock
        # must accept all of them (it records them for ctor-parity tests)
        assert set(kwargs) == ctor_names
        c = ctrl_cls(**kwargs)
        ev = c.step(action="Teleport", position={"x": 0, "y": 0, "z": 0},
                    rotation={"x": 0, "y": 0, "z": 0}, horizon=0,
                    standing=True)
        assert isinstance(ev.depth_frame, np.ndarray)
        c.stop()
    finally:
        mock_ai2thor.uninstall()
