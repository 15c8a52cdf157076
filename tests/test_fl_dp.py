"""Per-client data parallelism inside FL rounds: PROOF of sharding.

``test_engine_with_mesh_matches_no_mesh`` (tests/test_federated.py) proves
the meshed round is numerically right — but replication would trivially
pass it. This suite proves the ``data`` mesh axis does real work:

* round inputs are physically row-sharded: each of a client's ``data``
  devices holds B/data batch rows (``addressable_shards``), and
* the compiled round's hot loop carries a per-step gradient all-reduce
  whose replica groups are exactly the data-axis device rows (classic DP
  gradient sync), and
* on a slice-aware multislice layout the hot loop's all-reduces stay
  INSIDE a slice (ICI) while the round-end FedAvg mean is the cross-slice
  (DCN) collective — the ``parallel/mesh.py`` layout story, asserted on
  lowered HLO instead of just the mesh shape.

Reference anchor: this replaces the reference's filesystem-and-process
"distributed stack" (SURVEY.md §2.6; federated/src/federated_main.py:69-145)
with mesh collectives; the DP row of §2.6 is what the ``data`` axis
delivers.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.federated import (
    FederatedConfig,
    FederatedEngine,
)
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.parallel import (
    make_mesh,
    make_multislice_mesh,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}


def _mk_examples(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        text = ["HI", "YES", "NO WAY", "OK GO"][i % 4]
        arr = rng.normal(0, 1, size=3200).astype(np.float32)
        out.append(AsrExample(
            path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
            dementia_label=i % 2, input_values=arr,
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


def _engine(mesh, batch_size=2, stage=1):
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, final_dropout=0.0),
        stage=stage, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(42))
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
        batch_size=batch_size, time_multiple=3200, seed=0, warmup_steps=1,
        mesh=mesh)
    clients = {0: _mk_examples(4, seed=1), 1: _mk_examples(4, seed=2)}
    return FederatedEngine(cfg, fcfg, clients, _mk_examples(4, seed=3),
                           None, TOK, params)


def _lower_round(eng, stage=1):
    """Replicate run_rounds' placement for one round and return the
    OPTIMIZED (post-SPMD-partitioner) HLO text of the jitted round."""
    cids = eng.client_ids
    phases, specs, _ = eng._build_round(stage, 0, cids)
    rngs = jax.random.split(jax.random.PRNGKey(eng.fcfg.seed), len(cids))
    counts = jnp.asarray([4.0] * len(cids), jnp.float32)
    placed = eng._place_round_inputs(
        eng.global_params, phases, rngs, counts, specs)
    rf = eng._get_round_fn(stage, specs)
    return placed, rf.lower(*placed, None, None).compile().as_text()


def _parse_groups(spec: str, n_logical: int):
    """Replica groups -> list of frozensets of LOGICAL participant ids
    (positions in the mesh's row-major device order — confirmed by the
    data/client-axis group shapes below). Handles the literal
    ``{{0,1},{2,3}}`` form and both iota forms ``[G,S]<=[N]`` and
    ``[G,S]<=[a,b,..]T(perm)``."""
    if spec.startswith("{"):
        return [frozenset(int(x) for x in g.split(",") if x.strip())
                for g in re.findall(r"\{([\d,\s]*)\}", spec[1:-1])]
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?$", spec)
    assert m, f"unrecognized replica_groups: {spec}"
    n_groups, group_size = int(m.group(1)), int(m.group(2))
    dims = [int(x) for x in m.group(3).split(",")]
    ids = np.arange(int(np.prod(dims))).reshape(dims)
    if m.group(4):
        ids = ids.transpose([int(x) for x in m.group(4).split(",")])
    flat = ids.ravel()
    assert flat.size == n_groups * group_size == n_logical
    return [frozenset(flat[i * group_size:(i + 1) * group_size].tolist())
            for i in range(n_groups)]


def _collectives(hlo: str, n_logical: int):
    """Every collective in the optimized HLO: (kind, groups, bytes,
    op_name, in_hot_loop). ``in_hot_loop`` = emitted inside the local
    training scan (op_name carries ``while/body``) — per-STEP traffic,
    vs once-per-round traffic outside it."""
    out = []
    for line in hlo.splitlines():
        if "replica_groups=" not in line:
            continue
        m = re.search(r"= (?:\([^)]*\)|(\w+)\[([\d,]*)\][^ ]*) "
                      r"([\w\-]+)\(", line)
        kind = m.group(3) if m else "?"
        if m and m.group(1):
            nbytes = (_DTYPE_BYTES.get(m.group(1), 4)
                      * int(np.prod([int(x) for x in m.group(2).split(",")]
                                    if m.group(2) else [1])))
        else:  # tuple-shaped (variadic all-reduce): sum the member shapes
            nbytes = 0
            tup = re.search(r"= \(([^)]*)\)", line)
            for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", tup.group(1)):
                nbytes += (_DTYPE_BYTES.get(dt, 4)
                           * int(np.prod([int(x) for x in dims.split(",")]
                                         if dims else [1])))
        g = re.search(r"replica_groups=(\{\{.*?\}\}|\[[^\]]*\]"
                      r"(?:<=\[[^\]]*\](?:T\([^)]*\))?)?)", line)
        op = re.search(r'op_name="([^"]*)"', line)
        op_name = op.group(1) if op else ""
        out.append((kind, _parse_groups(g.group(1), n_logical), nbytes,
                    op_name, "while/body" in op_name))
    return out


def _axis_groups(mesh):
    """Logical-id groups of the mesh's data axis (rows) and client axis
    (columns), in the row-major logical order the partitioner uses."""
    n_client, n_data = mesh.devices.shape
    ids = np.arange(n_client * n_data).reshape(n_client, n_data)
    data_groups = {frozenset(row.tolist()) for row in ids}
    client_groups = {frozenset(col.tolist()) for col in ids.T}
    return data_groups, client_groups


# ------------------------------------------------------------- sharding


def test_round_inputs_actually_row_sharded():
    """Each device must hold B/data batch rows of its client's batches —
    the physical fact replication cannot fake."""
    mesh = make_mesh(client=2, data=2)
    eng = _engine(mesh)
    placed, _ = _lower_round(eng)
    _, batches, rngs, _ = placed
    leaves = jax.tree.leaves(batches[0])
    assert leaves, "staged sup phase produced no batch leaves"
    for leaf in leaves:
        # [K, steps, B, ...]: K split over client, B over data
        assert leaf.sharding.spec == ("client", None, "data"), leaf.sharding
        k, steps, b = leaf.shape[:3]
        shards = leaf.addressable_shards
        assert len(shards) == 4
        for s in shards:
            assert s.data.shape[:3] == (k // 2, steps, b // 2), s.data.shape
    # rngs ride the client axis
    assert rngs.sharding.spec[0] == "client"


def test_batch_size_must_divide_data_axis():
    mesh = make_mesh(client=2, data=2)
    eng = _engine(mesh, batch_size=3)
    with pytest.raises(ValueError, match="divisible"):
        _lower_round(eng)


# ------------------------------------------------------------------ HLO


def test_hot_loop_gradient_allreduce_over_data_axis():
    """The compiled round must carry a per-step all-reduce whose replica
    groups are exactly the data-axis rows — the DP gradient sync. A
    replicated (fake-DP) lowering has no data-axis all-reduce at all."""
    mesh = make_mesh(client=2, data=2)
    _, hlo = _lower_round(_engine(mesh))
    data_groups, client_groups = _axis_groups(mesh)
    colls = _collectives(hlo, 4)
    hot_ar = [c for c in colls if c[0] == "all-reduce" and c[4]]
    assert any(set(groups) == data_groups for _, groups, *_ in hot_ar), (
        "no data-axis gradient all-reduce in the training scan body:\n"
        + "\n".join(str((k, sorted(map(sorted, g)), b, o[:90]))
                    for k, g, b, o, _ in colls))
    # and none of the hot-loop all-reduces crosses clients
    for _, groups, _, op_name, _ in hot_ar:
        assert set(groups) != client_groups, (
            f"client-axis all-reduce inside the hot loop: {op_name}")


def test_fedavg_is_the_cross_client_collective():
    """The FedAvg mean must lower to a client-axis all-reduce OUTSIDE the
    hot loop — once per round, not per step."""
    mesh = make_mesh(client=2, data=2)
    _, hlo = _lower_round(_engine(mesh))
    _, client_groups = _axis_groups(mesh)
    colls = _collectives(hlo, 4)
    round_level = [c for c in colls if c[0] == "all-reduce" and not c[4]
                   and set(c[1]) == client_groups]
    assert round_level, "no round-level client-axis all-reduce (FedAvg?)"


def test_multislice_hot_loop_rides_ici():
    """VERDICT r2 #8: on the slice-aware 2-slice mesh the layout claim
    ("per-step traffic rides ICI; FedAvg is the only cross-slice traffic",
    parallel/mesh.py make_multislice_mesh) must hold in the lowered HLO,
    not just in the mesh shape.

    Asserted: (a) every hot-loop ALL-REDUCE (the recurring gradient
    payload) stays inside one slice; (b) a cross-slice all-reduce exists
    only at round level (the FedAvg mean); (c) NO hot-loop collective of
    any kind crosses a slice. (c) is what the engine's shard_map-manual
    ``client`` axis buys: plain vmap folds the client dim into conv
    feature groups and GSPMD then all-gathers those activations across
    clients — i.e. across slices — every step."""
    mesh = make_multislice_mesh(client=2, data=2, num_slices=2)
    # logical ids are row-major over mesh.devices: rows = slices here
    data_groups, client_groups = _axis_groups(mesh)
    slice_of = {}
    n_client, n_data = mesh.devices.shape
    ids = np.arange(n_client * n_data).reshape(n_client, n_data)
    for row in range(n_client):          # one client row per slice
        for l in ids[row]:
            slice_of[int(l)] = row

    def intra_slice(groups):
        return all(len({slice_of[i] for i in g}) == 1 for g in groups)

    _, hlo = _lower_round(_engine(mesh))
    colls = _collectives(hlo, 4)

    # (a) hot-loop all-reduces: all intra-slice (ICI)
    hot_ar = [c for c in colls if c[0] == "all-reduce" and c[4]]
    assert hot_ar, "no gradient all-reduce found in the hot loop"
    for _, groups, _, op_name, _ in hot_ar:
        assert intra_slice(groups), (
            f"cross-slice all-reduce in the hot loop: {op_name}")

    # (b) round-level cross-slice all-reduce = the FedAvg mean
    cross_round = [c for c in colls if not c[4] and not intra_slice(c[1])]
    assert any(c[0] == "all-reduce" and set(c[1]) == client_groups
               for c in cross_round), "FedAvg cross-slice reduce missing"

    # (c) nothing else in the hot loop crosses a slice — the full claim
    cross_hot = [c for c in colls if c[4] and not intra_slice(c[1])]
    assert not cross_hot, "\n".join(
        f"cross-slice hot-loop {k} ({b}B): {o[:100]}"
        for k, _, b, o, _ in cross_hot)
