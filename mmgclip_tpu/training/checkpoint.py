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


def _host_leaf(x):
    """device_get that also survives multi-process shardings.

    ``jax.device_get`` raises on an array spanning non-addressable devices
    (expert-sharded params, ZeRO-sharded moments, or even replicated arrays
    on a >1-process mesh).  Those leaves are reassembled to their FULL
    global value via an across-process all-gather, so every host holds the
    complete state.  NOTE this makes checkpoint saving a COLLECTIVE on
    multi-process runs — every process must reach the save point (they do:
    the early-stopper decision derives from the replicated val loss)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.device_get(x)


def _host_tree(tree):
    return jax.tree_util.tree_map(_host_leaf, tree)


def _template_host(tree):
    """Host-side restore templates: non-addressable global leaves become
    zero arrays of the GLOBAL shape (flax ``from_bytes`` only reads
    structure + shape/dtype from the target; the caller re-places restored
    values onto their shardings via ``put_global``)."""

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.zeros(x.shape, x.dtype)
        return jax.device_get(x)

    return jax.tree_util.tree_map(leaf, tree)


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
        # the gathers run on EVERY process (collective); see _host_leaf
        "params": serialization.to_bytes(_host_tree(params)),
        "opt_state": serialization.to_bytes(_host_tree(opt_state)) if opt_state is not None else None,
        "rng_key": np.asarray(_host_leaf(jax.random.key_data(rng_key))).tolist() if rng_key is not None else None,
        "extra": extra or {},
    }
    if jax.process_count() == 1 or jax.process_index() == 0:
        with open(path, "wb") as fh:
            pickle.dump(state, fh)
    # single-writer contract on a pod: the export dir is expected to be
    # shared (NFS/GCS-fuse), and N processes truncating + pickling the same
    # file concurrently would corrupt it.  Process 0 writes; the others have
    # already done their part of the gather above.  The barrier makes the
    # contract sequential: when save_checkpoint returns anywhere, the file
    # is durably written — callers may immediately resume() on any host.
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"save_checkpoint:{os.path.basename(path)}")
    return path


def save_checkpoint_orbax(directory: str, params, opt_state=None, **scalars) -> str:
    """Alternative backend: Orbax PyTree checkpoint (async-capable, sharded
    array-aware — preferred for very large states; the default pickle+msgpack
    path is simpler for this framework's ~MB train states)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    checkpointer = ocp.PyTreeCheckpointer()
    state = {"params": _host_tree(params)}
    if opt_state is not None:
        state["opt_state"] = _host_tree(opt_state)
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
    out["params"] = serialization.from_bytes(_template_host(params_template), state["params"])
    if state.get("opt_state") is not None and opt_state_template is not None:
        out["opt_state"] = serialization.from_bytes(
            _template_host(opt_state_template), state["opt_state"]
        )
    if state.get("rng_key") is not None:
        out["rng_key"] = jax.random.wrap_key_data(
            np.asarray(state["rng_key"], np.uint32)
        )
    logger.info(f"Loaded checkpoint from {path} (epoch {out['epoch']}).")
    return out
