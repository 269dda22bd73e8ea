"""Run checkpoint / resume (SURVEY.md §5: the reference only has model
artifacts; this adds mid-run resume for sweeps and training).

Two formats:
  * **Orbax** for full train states (params + opt state + step) on meshes —
    async, sharding-aware;
  * **flat safetensors** for model weights (interops with the reference's
    artifacts and the C++ runtime reader).
"""
from __future__ import annotations

import json
import os

import numpy as np


def save_train_state(path: str, state: dict) -> str:
    """Orbax-StandardCheckpointer save of a train-state pytree."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, like: dict | None = None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))


class SweepProgress:
    """Resumable sweep bookkeeping: records completed (threshold, guid) pairs
    so an interrupted threshold grid restarts where it stopped."""

    def __init__(self, path: str):
        self.path = path
        self.done: dict[str, str] = {}
        if os.path.isfile(path):
            with open(path) as f:
                self.done = json.load(f)

    def is_done(self, key) -> bool:
        return str(key) in self.done

    def mark(self, key, guid: str):
        self.done[str(key)] = guid
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.done, f, indent=1)
        os.replace(tmp, self.path)
