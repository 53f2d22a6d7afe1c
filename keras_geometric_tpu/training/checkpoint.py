"""Checkpointing: orbax-backed sharded pytree save/restore.

The reference's only persistence is Keras ``get_config``/weights
serialization (tests/integration/test_model_integration.py:302-343). Here
the whole ``TrainState`` pytree (params + optimizer + step + rng) is
checkpointed with orbax — the TPU-native mechanism that writes sharded
arrays directly from device memory and restores onto any mesh — plus the
model's dataclass config alongside, so ``load`` fully reconstructs
(model, state).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "save_config", "load_config"]


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_checkpoint(path: str, state: Any, *, config: dict | None = None) -> None:
    """Write a TrainState (or any pytree) to ``path`` (a directory)."""
    ckptr, path = _ckpt(path)
    ckptr.save(path, state, force=True)
    if config is not None:
        save_config(os.path.join(path, "model_config.json"), config)


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a pytree; ``target`` (a matching pytree of arrays) restores
    dtypes/shardings exactly."""
    ckptr, path = _ckpt(path)
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


def save_config(path: str, config: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(config, f, indent=2, default=str)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
