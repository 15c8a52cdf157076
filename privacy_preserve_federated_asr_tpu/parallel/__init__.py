from .mesh import make_mesh, shard_leading_axis, replicated
from .fed import (
    NETWORKS,
    average_weights,
    fedavg_stacked,
    graft_network,
    network_mask,
    select_network,
)

__all__ = [
    "make_mesh",
    "shard_leading_axis",
    "replicated",
    "NETWORKS",
    "average_weights",
    "fedavg_stacked",
    "graft_network",
    "network_mask",
    "select_network",
]
