"""In-process mock of the ai2thor API surface the datagen driver consumes.

The real AI2-THOR Unity binary is absent from this image, so
``cli/generate_thor_data.run_simulator`` had never executed. This mock
reproduces the API shape the driver (and the reference's
generate_thor_data.py:695-814) relies on:

- ``ai2thor.controller.Controller(**kwargs)`` with the reference's ctor
  configuration (agentMode, scene, gridSize, render flags, camera dims,
  ``platform=CloudRendering``)
- ``controller.step(action=..., **kw)`` returning an event with ``.frame``
  (H, W, 3 uint8), ``.depth_frame`` (H, W float, meters, >10 on reflective
  surfaces), ``.instance_segmentation_frame`` (H, W, 3 uint8 color ids),
  ``.color_to_object_id`` ({(r,g,b): objectId}), and ``.metadata`` with
  ``agent.position/rotation/cameraHorizon``, ``objects`` info dicts, and
  ``actionReturn`` for GetReachablePositions
- ``controller.stop()``

Scripted behaviors exercise the driver's quality heuristics: the FIRST
Teleport lands on a wall-dominant view (>80% wall -> rejected), the second
is good; every depth frame carries a reflective strip (>10 m) that the
driver must inpaint; RandomizeMaterials returns a distinct frame.
"""
import sys
import types

import numpy as np

# objectIds as THOR reports them: structural objects are bare names,
# pickupable/receptacle objects are pipe-separated ids
WALL, FLOOR, MUG, TABLE = "Wall", "Floor", "Mug|+00.10|+00.90|-00.20", \
    "Table|+00.00|+00.00|+00.00"

OBJECTS_INFO = [
    {"objectId": MUG, "objectType": "Mug",
     "salientMaterials": ["Ceramic"], "parentReceptacles": [TABLE]},
    {"objectId": TABLE, "objectType": "Table",
     "salientMaterials": ["Wood"], "parentReceptacles": None},
]


class _Event:
    def __init__(self, frame, depth, instance, c2o, metadata):
        self.frame = frame
        self.depth_frame = depth
        self.instance_segmentation_frame = instance
        self.color_to_object_id = c2o
        self.metadata = metadata


class MockController:
    created = []  # ctor kwargs of every instantiation, for assertions
    instances = []  # the controllers themselves (teleports/stop records)

    def __init__(self, **kwargs):
        type(self).created.append(dict(kwargs))
        type(self).instances.append(self)
        self.scene = kwargs["scene"]
        self._h = kwargs["height"]
        self._w = kwargs["width"]
        self.teleports = 0
        self.randomize_calls = 0
        self.stopped = False

    def _metadata(self):
        return {
            "agent": {
                "position": {"x": 0.0, "y": 0.0, "z": 0.0},
                "rotation": {"x": 0.0, "y": 0.0, "z": 0.0},
                "cameraHorizon": 0.0,
            },
            "objects": [dict(o) for o in OBJECTS_INFO],
        }

    def _event(self, good, seed=0):
        h, w = self._h, self._w
        rs = np.random.RandomState(seed)
        frame = rs.randint(0, 255, (h, w, 3), np.uint8)
        depth = np.full((h, w), 3.0, np.float32)
        depth[:, : w // 8] = 0.7  # near band (out of the good range)
        depth[0, : w // 4] = 12.0  # Unity reflection-probe artifact strip
        inst = np.zeros((h, w, 3), np.uint8)
        if good:
            inst[: h // 4] = (1, 0, 0)
            inst[h // 4 : h // 2] = (2, 0, 0)
            inst[h // 2 : 3 * h // 4] = (3, 0, 0)
            inst[3 * h // 4 :] = (4, 0, 0)
        else:
            # wall-dominant view: driver must reject and re-teleport
            inst[:] = (1, 0, 0)
            inst[-h // 16 :] = (3, 0, 0)
        c2o = {
            (1, 0, 0): WALL, (2, 0, 0): FLOOR, (3, 0, 0): MUG,
            (4, 0, 0): TABLE,
        }
        return _Event(frame, depth, inst, c2o, self._metadata())

    def step(self, action=None, **kwargs):
        assert not self.stopped, "step() after stop()"
        if action == "GetReachablePositions":
            ev = self._event(True)
            ev.metadata["actionReturn"] = [
                {"x": 0.0, "y": 0.0, "z": 0.0},
                {"x": 0.05, "y": 0.0, "z": 0.0},
            ]
            return ev
        if action == "Teleport":
            assert set(kwargs) >= {"position", "rotation", "horizon",
                                   "standing"}
            self.teleports += 1
            return self._event(good=self.teleports >= 2)
        if action == "RandomizeMaterials":
            self.randomize_calls += 1
            return self._event(True, seed=self.randomize_calls)
        raise AssertionError(f"unexpected THOR action: {action!r}")

    def stop(self):
        self.stopped = True


class CloudRendering:
    pass


def install():
    """Register the mock as the importable ``ai2thor`` package. Returns
    MockController (with its ``created`` record reset)."""
    pkg = types.ModuleType("ai2thor")
    controller = types.ModuleType("ai2thor.controller")
    platform = types.ModuleType("ai2thor.platform")
    controller.Controller = MockController
    platform.CloudRendering = CloudRendering
    pkg.controller = controller
    pkg.platform = platform
    sys.modules["ai2thor"] = pkg
    sys.modules["ai2thor.controller"] = controller
    sys.modules["ai2thor.platform"] = platform
    MockController.created = []
    MockController.instances = []
    return MockController


def uninstall():
    for name in ("ai2thor", "ai2thor.controller", "ai2thor.platform"):
        sys.modules.pop(name, None)
