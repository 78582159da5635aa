"""Checkpointing of the full train state, with actual resume.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict,
val_loss, best_score, counter}`` but never reloads optimizer state
(reference: callbacks/early_stopping.py:49-66; SURVEY §5.4).  Here the whole
train state — params, optimizer state, epoch, early-stop bookkeeping, PRNG
key — serializes via flax msgpack to one file, and ``load_checkpoint``
restores it for true resume.  Eval-only consumers read just the params.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from ..utils.logging import logger
from ..utils.seeding import create_directory_if_not_exists


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    epoch: int = 0,
    val_loss: float = float("inf"),
    best_score: Optional[float] = None,
    counter: int = 0,
    rng_key=None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    create_directory_if_not_exists(os.path.dirname(path) or ".")
    state = {
        "epoch": epoch,
        "val_loss": float(val_loss),
        "best_score": best_score,
        "counter": counter,
        "params": serialization.to_bytes(jax.device_get(params)),
        "opt_state": serialization.to_bytes(jax.device_get(opt_state)) if opt_state is not None else None,
        "rng_key": np.asarray(jax.random.key_data(rng_key)).tolist() if rng_key is not None else None,
        "extra": extra or {},
    }
    with open(path, "wb") as fh:
        pickle.dump(state, fh)
    return path


def save_checkpoint_orbax(directory: str, params, opt_state=None, **scalars) -> str:
    """Alternative backend: Orbax PyTree checkpoint (async-capable, sharded
    array-aware — preferred for very large states; the default pickle+msgpack
    path is simpler for this framework's ~MB train states)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    checkpointer = ocp.PyTreeCheckpointer()
    state = {"params": jax.device_get(params)}
    if opt_state is not None:
        state["opt_state"] = jax.device_get(opt_state)
    state["scalars"] = {k: v for k, v in scalars.items() if v is not None}
    checkpointer.save(directory, state, force=True)
    return directory


def load_checkpoint_orbax(directory: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(os.path.abspath(directory))


def load_checkpoint(path: str, params_template, opt_state_template=None) -> Dict[str, Any]:
    """Restore a checkpoint against pytree templates (shapes must match)."""
    with open(path, "rb") as fh:
        state = pickle.load(fh)
    out: Dict[str, Any] = {
        "epoch": state["epoch"],
        "val_loss": state["val_loss"],
        "best_score": state["best_score"],
        "counter": state["counter"],
        "extra": state.get("extra", {}),
    }
    out["params"] = serialization.from_bytes(jax.device_get(params_template), state["params"])
    if state.get("opt_state") is not None and opt_state_template is not None:
        out["opt_state"] = serialization.from_bytes(
            jax.device_get(opt_state_template), state["opt_state"]
        )
    if state.get("rng_key") is not None:
        out["rng_key"] = jax.random.wrap_key_data(
            np.asarray(state["rng_key"], np.uint32)
        )
    logger.info(f"Loaded checkpoint from {path} (epoch {out['epoch']}).")
    return out
