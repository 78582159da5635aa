"""Expert parallelism: shard MoE expert weights over an ``expert`` mesh axis.

No reference counterpart (the reference has no model parallelism, SURVEY
§2.4).  The MoE projection head (models/projections.py::MoEProjectionHead)
stacks its per-expert weights on a leading [E, ...] axis; expert parallelism
is purely a placement decision — put those leaves on the ``expert`` axis and
GSPMD lowers the dispatch/combine einsums to all_to_all over ICI.  The
sharded program is numerically identical to the replicated one
(tests/test_expert.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import EXPERT_AXIS, put_global

P = PartitionSpec


def moe_param_specs(params, n_experts: int, axis_name: str = EXPERT_AXIS):
    """PartitionSpecs for an MoE head's param tree: leaves with a leading
    [n_experts] axis shard over ``axis_name``; the router and any other
    leaves replicate.

    The router is excluded BY NAME, not only by shape — its [hidden, E]
    kernel would match the shape heuristic whenever hidden == n_experts
    and get pointlessly row-sharded (an all-gather per forward)."""

    def spec(path, leaf):
        last_key = getattr(path[-1], "key", None) if path else None
        if last_key == "router":
            return P()
        if leaf.ndim >= 1 and leaf.shape[0] == n_experts:
            return P(axis_name, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_moe_params(params, mesh: Mesh, n_experts: int, axis_name: str = EXPERT_AXIS):
    """Place an MoE param tree on the mesh with experts distributed.

    Placement rides ``put_global`` (pod-shaped: assembles global arrays on
    multi-process meshes, plain device_put otherwise — CLAUDE.md invariant)."""
    specs = moe_param_specs(params, n_experts, axis_name)
    return jax.tree_util.tree_map(
        lambda leaf, s: put_global(leaf, NamedSharding(mesh, s)), params, specs
    )
