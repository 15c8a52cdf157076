from .mesh import make_mesh, make_multislice_mesh, shard_leading_axis, replicated
from .pp import make_pp_forward, make_pp_stack, validate_pp
from .sp import make_sp_forward, make_sp_stack
from .stacked import make_composed_forward
from .tp import tp_partition_spec, tp_shardings, validate_tp_divisibility
from .zero import (
    zero1_opt_shardings,
    zero1_partition_spec,
    zero1_state_shardings,
)
from .fed import (
    NETWORKS,
    average_weights,
    compressed_delta_fedavg,
    dp_fedavg_stacked,
    fedavg_stacked,
    graft_network,
    network_mask,
    secagg_payloads,
    secure_aggregate_fedavg,
    select_network,
    topk_delta_fedavg,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "compressed_delta_fedavg",
    "shard_leading_axis",
    "replicated",
    "make_pp_forward",
    "make_pp_stack",
    "validate_pp",
    "make_sp_forward",
    "make_sp_stack",
    "make_composed_forward",
    "tp_partition_spec",
    "tp_shardings",
    "validate_tp_divisibility",
    "zero1_opt_shardings",
    "zero1_partition_spec",
    "zero1_state_shardings",
    "NETWORKS",
    "average_weights",
    "dp_fedavg_stacked",
    "fedavg_stacked",
    "graft_network",
    "network_mask",
    "secagg_payloads",
    "secure_aggregate_fedavg",
    "select_network",
    "topk_delta_fedavg",
]
