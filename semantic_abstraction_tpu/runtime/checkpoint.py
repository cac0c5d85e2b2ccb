"""Checkpoint save/restore with the reference's {net, optimizer, epochs}
semantics.

Reference: utils.py:547-556 (latest.pth each epoch), :603-613
(ckpt_{epoch}.pth every save_freq), :276-290 (resume restoring
net+optimizer+start_epoch). Here the whole TrainState pytree (params +
optax state + step) serializes via flax msgpack; writes are atomic
(tmp + rename) so a preempted save never corrupts latest.ckpt.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, state, epoch: int, extra: Optional[dict] = None):
    import pickle

    from flax import serialization

    payload = {
        "state": _to_numpy(state),
        "epochs": epoch,
        # flax msgpack restores by TEMPLATE structure, which can't know the
        # caller's extra keys — carry it as an opaque pickled-bytes leaf
        "extra": np.frombuffer(pickle.dumps(extra or {}), dtype=np.uint8),
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, state_template):
    """Restore (state, start_epoch, extra); the template supplies the
    pytree structure (like the reference's state_dict key matching)."""
    import pickle

    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    template = {
        "state": _to_numpy(state_template),
        "epochs": 0,
        "extra": np.zeros(0, np.uint8),
    }
    payload = serialization.from_bytes(template, data)
    state = jax.tree_util.tree_map(
        lambda t, v: jax.numpy.asarray(v), state_template, payload["state"]
    )
    extra = pickle.loads(payload["extra"].tobytes()) if len(payload["extra"]) else {}
    return state, int(payload["epochs"]), extra


def save_params_only(path: str, params):
    from flax import serialization

    with open(path + ".tmp", "wb") as f:
        f.write(serialization.to_bytes(_to_numpy(params)))
    os.replace(path + ".tmp", path)


def load_params_only(path: str, params_template):
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(_to_numpy(params_template), data)
    return jax.tree_util.tree_map(
        lambda t, v: jax.numpy.asarray(v), params_template, restored
    )


def load_net_checkpoint(path: str, state_template, task: str, approach: str):
    """Restore (state, start_epoch) from either checkpoint format:

    - ``.pth``/``.pt``: a reference torch checkpoint (the released
      models.tar.lz4 layout) — weights convert in place, optimizer state
      starts fresh (eval/visualize don't need one and torch has no
      matching pytree).
    - anything else: our flax-serialized TrainState.
    """
    if path.endswith((".pth", ".pt")):
        from ..models.convert import load_torch_net_checkpoint

        params, epoch = load_torch_net_checkpoint(path, task, approach)
        return state_template._replace(params=params), epoch
    state, epoch, _ = load_checkpoint(path, state_template)
    return state, epoch
