"""TPU-native federated learning engine (the reference's L3 layer).

The reference simulates FL with one OS process per client
(``multiprocessing.Pool`` spawn, federated/src/federated_main.py:73-94),
hands weights around through the filesystem (``save_pretrained`` /
``from_pretrained`` round-trips, training.py:14-28) and averages
state_dicts in the parent (utils.py:240-249). Here an FL round is ONE
jitted XLA program:

  broadcast global params -> vmap(local training scan) over the ``client``
  mesh axis -> FedAvg (mean over the client axis = one ICI collective)
  -> graft the stage's sub-network into the global params.

Client-start-from-global is exact: in each reference stage only the
aggregated sub-network is trainable, every other part is frozen, so a
client's round-start params always equal the global params (the reference's
per-client filesystem state carries no extra information).

The 3-stage pipeline (stage{1,2,3}_training, federated_main.py:148-205):
each stage = centralized warm-start on the "public" split + FL rounds +
graft aggregated sub-network into the global model.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.collate import LengthBucketBatcher, pad_batch
from ..data.dataset import AsrExample
from ..data.tokenizer import CTCCharTokenizer
from ..models.config import DACSConfig
from ..models.dacs import DACSModel
from ..parallel.fed import fedavg_stacked, graft_network
from ..train.logging import JsonlLogger
from ..train.optim import make_optimizer
from ..train.steps import (
    DeviceBatch,
    HiddenBatch,
    backbone_forward_fn,
    gather_hidden,
    make_hidden_train_step,
    make_multitask_train_step,
    make_train_step,
)
from ..train.train_state import DACSTrainState
from ..train.trainer import Trainer, TrainerConfig
from .multitask import (
    attach_pseudo_labels,
    copy_first_head_to_lm_head,
    generate_pseudo_labels,
    init_lm_heads_from_lm_head,
    make_pseudo_forward,
)

# stage -> aggregated sub-network (reference: stage1 aggregates "ASR"
# [encoder, lm_head] pairs, stage2 "AD", stage3 "toggling_network")
STAGE_NETWORK = {0: "ASR", 1: "AD", 2: "toggling_network"}


def _gather_hidden_batch(h: jax.Array, fl: jax.Array, data: DeviceBatch,
                         idx: jax.Array) -> HiddenBatch:
    """Row-gather a HiddenBatch from cached encoder outputs (see
    _gather_batch for the idx == -1 padding semantics)."""
    return gather_hidden(h, fl, data.labels, data.label_lengths,
                         data.dementia_labels, idx, row_mask=data.sample_mask)


def _gather_batch(data: DeviceBatch, idx: jax.Array) -> DeviceBatch:
    """Materialize one training batch from device-resident per-client data
    by row indices; idx == -1 marks padding rows (zero lengths -> zero CTC
    frames -> zero loss, sample_mask 0 — identical semantics to the staged
    path's zero-padded rows)."""
    safe = jnp.clip(idx, 0, data.input_values.shape[0] - 1)
    mask = idx >= 0
    return DeviceBatch(
        input_values=data.input_values[safe],
        input_lengths=jnp.where(mask, data.input_lengths[safe], 0),
        labels=jnp.where(mask[:, None], data.labels[safe], -100),
        label_lengths=jnp.where(mask, data.label_lengths[safe], 0),
        dementia_labels=jnp.where(mask, data.dementia_labels[safe], 0),
        sample_mask=mask.astype(jnp.float32) * data.sample_mask[safe],
    )


@dataclass
class FederatedConfig:
    num_rounds: int = 10            # args.epochs
    num_clients: int = 2            # args.num_users
    frac: float = 1.0               # args.frac (client sampling fraction)
    local_ep: int = 5               # args.local_ep
    global_ep: int = 30             # args.global_ep (centralized warm-start)
    batch_size: int = 4
    eval_batch_size: int = 8
    seed: int = 0
    learning_rate: float | None = None   # None -> stage default
    warmup_steps: int = 1000
    weight_decay: float = 0.005
    compute_dtype: str = "float32"
    remat: bool = False
    time_multiple: int = 16000
    label_multiple: int = 32
    max_samples: int | None = None
    shuffle_window: int | None = None  # per-epoch batch-membership reshuffle
    log_file: str | None = None
    log_dir: str = "./saves/log"
    fedavg_weighted: bool = False   # reference uses an unweighted mean
    mesh: Any = None                # jax.sharding.Mesh with a "client" axis
    # ZeRO-1 inside the FL round (parallel/zero.py zero1_constrain; beyond
    # the reference): shard each client's fp32 Adam moments over the mesh's
    # "data" axis. Stage-0 federated rounds are the heaviest memory case —
    # per-client moments for the full backbone stacked under the client
    # vmap (PERF.md §5) — and the moments are 2x the param bytes per
    # client; sharding them is what lets K=4-8 large-model clients fit a
    # mesh whose per-client device group would otherwise hold K_local full
    # fp32 moment sets. Training math is unchanged (layout only); requires
    # fcfg.mesh with a "data" axis of size >= 2.
    zero1: bool = False
    # Tensor parallelism inside the FL round (parallel/tp.py; beyond the
    # reference): Megatron-shard each client's encoder matmuls (and their
    # Adam moments) over a "model" mesh axis — the scale path for
    # backbones whose per-client state exceeds one chip even with zero1.
    # Composes with zero1 (TP-sharded leaves keep the TP layout; the rest
    # shard over "data"). Requires fcfg.mesh with a "model" axis >= 2
    # (make_mesh(model=N)).
    tp: bool = False
    # Keep client datasets resident on device across rounds and send only
    # per-round batch-index permutations (client data is static: every round
    # runs local_ep whole-dataset epochs, so per-round staging re-uploads
    # identical bytes). None = auto: on for single-device runs under ~6 GB
    # of audio, off when a mesh is set (client-axis locality of the staged
    # path is kept there).
    resident_client_data: bool | None = None
    # 1 = supervised only; 0.5 = unsupervised (pseudo-labeled) phase then
    # supervised phase per round; 0 = unsupervised only
    # (reference: options.py --supervised_level, update.py update_weights)
    supervised_level: float = 1.0
    # Stage-1/2 rounds train heads on cached encoder outputs (the frozen
    # backbone is deterministic there). False disables; the budget guards
    # device memory (cache is skipped per source when it would exceed it).
    cache_encoder: bool | None = None
    cache_budget_bytes: int = 6 << 30
    # DP-FedAvg (parallel/fed.py dp_fedavg_stacked; beyond the reference):
    # clip each client's update delta to this L2 norm and add Gaussian
    # noise std = clip * noise_multiplier / K to the aggregate. None = off.
    # Unweighted aggregation only (uniform-contribution DP accounting).
    dp_clip_norm: float | None = None
    dp_noise_multiplier: float = 0.0
    # delta for the reported (epsilon, delta) guarantee (federated/privacy
    # RDP accountant); only read when DP-FedAvg is on. Rule of thumb:
    # delta << 1/K (one in K clients).
    dp_delta: float = 1e-5
    # Uplink compression (parallel/fed.py compressed_delta_fedavg; beyond
    # the reference): quantize each client's round delta to this many bits
    # (symmetric abs-max, stochastic rounding) before aggregation. None =
    # off. Mutually exclusive with DP-FedAvg (clip-then-quantize ordering
    # is an accounting decision the caller must make explicitly).
    compress_bits: int | None = None
    compress_stochastic_rounding: bool = True
    # Secure aggregation (parallel/fed.py secure_aggregate_fedavg; beyond
    # the reference): each client's round delta is L2-clipped to
    # ``secagg_clip_norm`` (the public fixed-point grid), quantized to
    # ``secagg_bits``-bit integers and pairwise-masked; the server only ever
    # sums masked int32 payloads — the masks cancel exactly. None = off.
    # Unweighted (uniform contributions), like DP-FedAvg.
    secagg_clip_norm: float | None = None
    secagg_bits: int = 20
    # Top-k sparsified FedAvg with error feedback (parallel/fed.py
    # topk_delta_fedavg; beyond the reference): per round each client
    # uploads only this fraction of its delta's coordinates (largest
    # magnitude); the untransmitted remainder accumulates in a per-client
    # residual and rides a later round. Residuals live on the engine per
    # stage and are checkpointed with rounds ("...-topk"). None = off.
    topk_fraction: float | None = None
    # FedProx (Li et al. 2020; beyond the reference): proximal pull
    # (mu/2)||w - w_round_start||^2 on each client's local objective —
    # damps client drift on non-IID speaker partitions. 0 = off (exact
    # reference FedAvg semantics).
    fedprox_mu: float = 0.0
    # Server optimizer (FedOpt, Reddi et al. 2021; beyond the reference):
    # treat the aggregated round delta as a pseudo-gradient and apply a
    # server-side optimizer step instead of plain assignment.
    # "none" = reference FedAvg; "momentum" = FedAvgM (SGD with
    # server_momentum); "adam" = FedAdam. Server state lives on the engine
    # per stage; with round_save_dir it is checkpointed alongside each
    # round ("...-server") so resume is exact.
    server_optimizer: str = "none"
    # None -> per-optimizer default: 1.0 for momentum (pure FedAvgM — the
    # whole delta applies), 1e-2 for adam (Adam normalizes the pseudo-
    # gradient to ~unit magnitude, so lr IS the per-round step size; 1.0
    # would step every weight by ~±1 and wreck the model)
    server_lr: float | None = None
    server_momentum: float = 0.9
    # Round-level checkpointing: save the global params after every
    # ``round_save_every``-th round under ``<round_save_dir>/round-N`` and
    # resume from the newest matching-stage checkpoint on the next
    # run_rounds call — the engine-native form of the reference's implicit
    # filesystem-round-robin resume (training.py:14-22's
    # "<out>_client{id}_round{r}" layout). Client sampling is a pure
    # function of the seed, so resumed rounds see the same client plan.
    round_save_dir: str | None = None
    round_save_every: int = 1
    round_save_limit: int = 2       # like the reference's save_total_limit

    def __post_init__(self):
        if self.server_optimizer not in ("none", "momentum", "adam"):
            raise ValueError(
                f"server_optimizer must be none|momentum|adam, got "
                f"{self.server_optimizer!r}")
        if self.compress_bits is not None and not 2 <= self.compress_bits <= 8:
            # fail here, not at first-round trace time (after minutes of
            # data staging / hidden-cache builds at production shapes)
            raise ValueError(
                f"compress_bits must be in [2, 8], got {self.compress_bits}")
        if self.compress_bits is not None and self.dp_clip_norm is not None:
            raise ValueError(
                "compress_bits and dp_clip_norm are mutually exclusive: "
                "quantize-before-clip vs clip-before-quantize changes the DP "
                "guarantee, so the combination must be an explicit choice "
                "(compose compressed_delta_fedavg/dp_fedavg_stacked directly)")
        modes = {"dp_clip_norm": self.dp_clip_norm,
                 "compress_bits": self.compress_bits,
                 "secagg_clip_norm": self.secagg_clip_norm,
                 "topk_fraction": self.topk_fraction}
        on = [k for k, v in modes.items() if v is not None]
        if len(on) > 1:
            raise ValueError(
                f"aggregation modes are mutually exclusive, got {on}; the "
                "mask/clip/quantize/sparsify ordering of a composition is a "
                "privacy-accounting decision — compose the parallel/fed.py "
                "primitives directly if you need one")
        if self.secagg_clip_norm is not None:
            if not 2 <= self.secagg_bits <= 24:
                raise ValueError(
                    f"secagg_bits must be in [2, 24], got {self.secagg_bits}")
            if self.fedavg_weighted:
                raise ValueError(
                    "secure aggregation is unweighted (per-client sample "
                    "counts are private); disable fedavg_weighted")
        if self.topk_fraction is not None and not 0.0 < self.topk_fraction <= 1.0:
            raise ValueError(
                f"topk_fraction must be in (0, 1], got {self.topk_fraction}")
        if self.zero1 and (
                self.mesh is None or int(self.mesh.shape.get("data", 1)) < 2):
            raise ValueError(
                "zero1 shards per-client Adam moments over the 'data' mesh "
                "axis: set fcfg.mesh to a Mesh with a 'data' axis of size "
                ">= 2 (e.g. ('client', 'data') = (K, N/K))")
        if self.tp and (
                self.mesh is None or int(self.mesh.shape.get("model", 1)) < 2):
            raise ValueError(
                "tp Megatron-shards each client's encoder matmuls over the "
                "'model' mesh axis: set fcfg.mesh to a Mesh with a 'model' "
                "axis of size >= 2 (make_mesh(client=K, data=D, model=M))")
        if self.dp_noise_multiplier and self.dp_clip_norm is None:
            # noise std is defined as clip * multiplier / K — without a clip
            # norm there is no DP at all; silently running plain FedAvg
            # under a "DP" flag would mislabel the run
            raise ValueError(
                "dp_noise_multiplier > 0 requires dp_clip_norm (the noise "
                "std is clip * multiplier / K); set --dp_clip_norm")


class FederatedEngine:
    def __init__(
        self,
        cfg: DACSConfig,
        fcfg: FederatedConfig,
        client_examples: dict[Any, Sequence[AsrExample]],
        public_examples: Sequence[AsrExample],
        eval_examples: Sequence[AsrExample] | None,
        tokenizer: CTCCharTokenizer,
        params: Any,
        client_unsup_examples: dict[Any, Sequence[AsrExample]] | None = None,
    ):
        if cfg.method != "dacs":
            # the reference's FL pipeline exists for the DACS model only
            # (federated/src/federated_main.py); variant methods are
            # centralized-trainer recipes (models/recipes.py)
            raise ValueError(
                f"the federated engine drives the DACS method only, got "
                f"method={cfg.method!r}")
        self.cfg = cfg
        self.fcfg = fcfg
        if fcfg.tp:
            from ..parallel.tp import validate_tp_divisibility

            validate_tp_divisibility(cfg.backbone,
                                     int(fcfg.mesh.shape["model"]))
        self.client_ids = sorted(client_examples.keys(), key=str)
        self.client_examples = client_examples
        # pseudo-labeled (teacher-transcribed) per-client data for the
        # unsupervised phase (reference: ADReSSo + Whisper transcripts)
        self.client_unsup_examples = client_unsup_examples or {}
        self.public_examples = public_examples
        self.eval_examples = eval_examples
        self.tokenizer = tokenizer
        self.global_params = params
        self.logger = JsonlLogger(fcfg.log_dir, fcfg.log_file)
        self._round_fns: dict = {}
        self._eval_trainers: dict[int, Trainer] = {}
        self._pseudo_fwd = None  # cached jitted stochastic-decode forward
        self._last_dead_step_frac = 0.0  # padding overhead of the last round
        self._resident_cache: dict = {}  # id(source) -> (data_all, batchers)
        # id(source) -> (h_all, fl_all) frozen-backbone encoder-output cache;
        # persists across run_rounds calls, cleared when stage-0 training
        # mutates the backbone
        self._round_hidden: dict = {}
        self._hidden_over_budget: set = set()  # sources too big to cache
        self._hidden_cache_fn = None  # persistent jitted backbone forward
        # stage -> FedOpt server-optimizer state (fcfg.server_optimizer)
        self._server_opt_states: dict[int, Any] = {}
        # stage -> [K_total, ...] per-client top-k error-feedback residuals
        # (fcfg.topk_fraction); per stage so one stage's untransmitted
        # coordinates never ride another stage's uplink
        self._topk_residuals: dict[int, Any] = {}
        # RDP accountant for DP-FedAvg rounds (federated/privacy.py);
        # stepped once per noised round, composes across stages within this
        # engine's lifetime, checkpointed as a '-dp.json' round sidecar
        from .privacy import DpAccountant
        self._dp_accountant = DpAccountant(delta=fcfg.dp_delta)
        # debug: when True, the round returns the final local-phase optax
        # state stacked over clients (tests assert the physical ZeRO-1
        # sharding of the Adam moments); off in production — the extra
        # output would materialize a full per-client moment buffer
        self._debug_keep_opt_state = False
        self._debug_opt_state = None

    # ------------------------------------------------------------------
    # data: per-client step streams with uniform static shapes
    # ------------------------------------------------------------------

    def _client_round_batches(self, cids, round_idx: int,
                              source: dict | None = None, pseudo: dict | None = None):
        """Build [K, steps, B, ...] stacked batches for one round.

        All sampled clients are padded to the same step count and the same
        (T, L) shapes so one compiled program serves the round; padding
        batches carry sample_mask=0 (zero loss, zero grads).

        Cost bound: the vmapped round executes ``K * max_c(steps_c)`` steps,
        so the dead-step fraction is ``1 - mean_c(steps_c) / max_c(steps_c)``
        — zero for balanced splits (the reference's ADReSS 27/27 and ADReSSo
        80/81 speaker partitions), and bounded by the client size skew in
        general. The fraction is recorded per round as ``dead_step_frac`` in
        the JSONL log; for strongly skewed populations cap ``max_samples``
        or sample similarly-sized client cohorts per round to bound it.

        ``pseudo`` (cid -> path -> N-best (text, ids, conf) list) marks the
        N-best multitask phase: examples get their 1-best pseudo labels for
        bucketing and the return value becomes a
        (DeviceBatch, labels_stack [K,steps,N,B,L], lengths [K,steps,N,B])
        tuple carrying every head's transcript set.
        """
        f = self.fcfg
        n_lms = self.cfg.num_lms
        source = self.client_examples if source is None else source
        per_client: list[tuple[Any, list]] = []
        t_max = l_max = 0
        for cid in cids:
            examples = source[cid]
            if pseudo is not None:
                examples = attach_pseudo_labels(examples, pseudo[cid])
            batcher = LengthBucketBatcher(
                examples, f.batch_size,
                time_multiple=f.time_multiple, label_multiple=f.label_multiple,
                seed=f.seed + round_idx, max_samples=f.max_samples,
                shuffle_window=f.shuffle_window)
            batches = []
            for ep in range(f.local_ep):
                batches.extend(batcher.epoch(epoch_seed=f.seed + 1000 * round_idx + ep))
            per_client.append((cid, batches))
            t_max = max(t_max, max(b.input_values.shape[1] for b in batches))
            l_max = max(l_max, max(b.labels.shape[1] for b in batches))
            if pseudo is not None:  # N-best sets can be longer than 1-best
                for b in batches:
                    for p in b.paths:
                        for _, ids, _ in pseudo[cid][p][:n_lms]:
                            l_max = max(l_max, len(ids))
        if pseudo is not None:
            l_max = -(-l_max // f.label_multiple) * f.label_multiple
        steps = max(len(bs) for _, bs in per_client)
        real = sum(len(bs) for _, bs in per_client)
        self._last_dead_step_frac = 1.0 - real / (steps * len(per_client))

        def pad_to(b, t, l):
            iv = np.zeros((b.input_values.shape[0], t), dtype=np.float32)
            iv[:, : b.input_values.shape[1]] = b.input_values
            lab = np.full((b.labels.shape[0], l), -100, dtype=np.int32)
            lab[:, : b.labels.shape[1]] = b.labels
            return dataclasses.replace(b, input_values=iv, labels=lab)

        def nbest_stack(b):
            bsz = b.labels.shape[0]
            stack = np.full((n_lms, bsz, l_max), -100, dtype=np.int32)
            lls = np.zeros((n_lms, bsz), dtype=np.int32)
            for j, path in enumerate(b.paths):
                for i, (_, ids, _) in enumerate(pseudo[cid][path][:n_lms]):
                    ids = ids[:l_max]
                    stack[i, j, : len(ids)] = ids
                    lls[i, j] = len(ids)
            return jnp.asarray(stack), jnp.asarray(lls)

        stacked_clients, stacked_nbest = [], []
        for cid, batches in per_client:
            dev = [DeviceBatch.from_host(pad_to(b, t_max, l_max)) for b in batches]
            nbest = [nbest_stack(b) for b in batches] if pseudo is not None else None
            while len(dev) < steps:  # pad with an all-masked batch
                dummy = jax.tree.map(np.zeros_like, dev[0])
                dev.append(dataclasses.replace(dummy, labels=jnp.full_like(dev[0].labels, -100)))
                if nbest is not None:
                    nbest.append((jnp.full_like(nbest[0][0], -100),
                                  jnp.zeros_like(nbest[0][1])))
            stacked_clients.append(DeviceBatch.stack(dev))
            if nbest is not None:
                stacked_nbest.append(jax.tree.map(lambda *xs: jnp.stack(xs), *nbest))
        batches_kd = DeviceBatch.stack(stacked_clients)  # leading axes [K, steps]
        if pseudo is None:
            return batches_kd
        stacks, lls = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked_nbest)
        return batches_kd, stacks, lls

    def _resident_enabled(self, source: dict) -> bool:
        f = self.fcfg
        if f.resident_client_data and f.mesh is not None:
            raise ValueError(
                "resident_client_data=True is not supported with a mesh "
                "(the staged path keeps client-axis data locality there); "
                "leave it None/False when fcfg.mesh is set")
        if f.mesh is not None:
            return False
        if f.resident_client_data is not None:
            return f.resident_client_data
        # auto: cap the footprint of the DENSE-PADDED [K, n_max, t_max]
        # resident array (can be far larger than the raw audio bytes when
        # client sizes or utterance lengths are skewed)
        def n_used(exs):
            return sum(1 for e in exs
                       if f.max_samples is None
                       or len(e.input_values) <= f.max_samples)

        lens = [len(e.input_values) for exs in source.values() for e in exs
                if f.max_samples is None or len(e.input_values) <= f.max_samples]
        if not lens:
            return False
        t_max = -(-max(lens) // f.time_multiple) * f.time_multiple
        n_max = max(n_used(exs) for exs in source.values())
        padded_bytes = 4 * len(source) * n_max * t_max
        return padded_bytes < 6e9

    def _ensure_resident(self, source: dict):
        """Upload every client's full (filtered, length-sorted) dataset once
        as stacked [K_total, N, ...] device arrays; later rounds send only
        int32 index permutations."""
        key = id(source)
        if key in self._resident_cache:
            return self._resident_cache[key]
        f = self.fcfg
        ids = sorted(source.keys(), key=str)
        batchers = {
            cid: LengthBucketBatcher(
                source[cid], f.batch_size, time_multiple=f.time_multiple,
                label_multiple=f.label_multiple, seed=f.seed,
                max_samples=f.max_samples, shuffle_window=f.shuffle_window)
            for cid in ids
        }
        all_exs = [e for b in batchers.values() for e in b.examples]
        mult = f.time_multiple

        def up(x, m):
            return -(-x // m) * m

        t_max = up(max(len(e.input_values) for e in all_exs), mult)
        l_max = up(max(len(e.labels) for e in all_exs), f.label_multiple)
        n_max = max(len(b.examples) for b in batchers.values())
        k = len(ids)
        iv = np.zeros((k, n_max, t_max), np.float32)
        il = np.zeros((k, n_max), np.int32)
        lab = np.full((k, n_max, l_max), -100, np.int32)
        ll = np.zeros((k, n_max), np.int32)
        dem = np.zeros((k, n_max), np.int32)
        sm = np.zeros((k, n_max), np.float32)
        for ki, cid in enumerate(ids):
            for j, e in enumerate(batchers[cid].examples):
                iv[ki, j, : len(e.input_values)] = e.input_values
                il[ki, j] = len(e.input_values)
                lab[ki, j, : len(e.labels)] = e.labels
                ll[ki, j] = len(e.labels)
                dem[ki, j] = e.dementia_label
                sm[ki, j] = 1.0
        data_all = DeviceBatch(
            input_values=jnp.asarray(iv), input_lengths=jnp.asarray(il),
            labels=jnp.asarray(lab), label_lengths=jnp.asarray(ll),
            dementia_labels=jnp.asarray(dem), sample_mask=jnp.asarray(sm))
        # the source dict itself is kept in the value so the id() key can
        # never be recycled by the allocator while the cache entry lives
        self._resident_cache[key] = (data_all, batchers, ids, source)
        return self._resident_cache[key]

    def _client_round_indices(self, cids, round_idx: int, source: dict):
        """Per-round batch compositions as [m, steps, B] indices into the
        resident data (same epoch seeds/order as the staged path)."""
        data_all, batchers, ids, _ = self._ensure_resident(source)
        f = self.fcfg
        per = []
        for cid in cids:
            groups: list[list[int]] = []
            for ep in range(f.local_ep):
                groups.extend(batchers[cid].epoch_indices(
                    epoch_seed=f.seed + 1000 * round_idx + ep))
            per.append(groups)
        steps = max(len(g) for g in per)
        real = sum(len(g) for g in per)
        self._last_dead_step_frac = 1.0 - real / (steps * len(per))
        arr = np.full((len(cids), steps, f.batch_size), -1, np.int32)
        for ki, groups in enumerate(per):
            for s, g in enumerate(groups):
                arr[ki, s] = g
        csel = np.asarray([ids.index(c) for c in cids], np.int32)
        return (data_all, jnp.asarray(csel), jnp.asarray(arr))

    def _hidden_cache_for(self, stage: int, source: dict):
        """Encoder outputs for every resident utterance of ``source``,
        computed ONCE with the current global params. Valid while the
        backbone is untouched — in stages 1/2 the encoder is frozen,
        deterministic (reference .eval() semantics) and not part of the
        aggregated sub-network, so backbone(x) is a training-invariant
        constant; the cache persists ACROSS run_rounds calls and is
        invalidated wherever stage-0 training mutates the backbone
        (:meth:`run_rounds`, :meth:`centralized_training`). ~95% of the
        step FLOPs move out of the round loop.

        Built chunk-by-chunk with a jitted backbone forward held on the
        engine — the jit wrapper must persist across builds, or every build
        pays remote compile-cache lookups per chunk shape (measured ~1 s
        each on the tunnel platform)."""
        key = id(source)
        hc = self._round_hidden.get(key)
        if hc is not None:
            return hc
        f = self.fcfg
        if f.cache_encoder is False or key in self._hidden_over_budget:
            return None
        data_all, _, _, _ = self._ensure_resident(source)
        k_total, n = data_all.input_values.shape[:2]
        chunk = max(min(f.eval_batch_size, n), 1)

        from ..models.backbone import feat_extract_output_lengths

        t_frames = feat_extract_output_lengths(
            self.cfg.backbone, data_all.input_values.shape[2])
        itemsize = 2 if f.compute_dtype == "bfloat16" else 4
        need = k_total * n * t_frames * self.cfg.hidden_size * itemsize
        if need > f.cache_budget_bytes:
            print(f"[engine] hidden cache ({need / 1e9:.1f} GB) over budget "
                  f"({f.cache_budget_bytes / 1e9:.1f} GB); stage-1/2 rounds "
                  "fall back to full forwards for this source")
            self._hidden_over_budget.add(key)
            return None

        if self._hidden_cache_fn is None:
            model = DACSModel(self.cfg, dtype=_dtype(f.compute_dtype),
                              remat=f.remat)
            self._hidden_cache_fn = jax.jit(backbone_forward_fn(model))
        h_rows, fl_rows = [], []
        for ki in range(k_total):
            hs, fls = [], []
            for i in range(0, n, chunk):
                j = min(i + chunk, n)
                s = j - chunk if j - i < chunk else i  # full-size tail window
                h, fl = self._hidden_cache_fn(
                    self.global_params,
                    data_all.input_values[ki, s : s + chunk],
                    data_all.input_lengths[ki, s : s + chunk])
                hs.append(h[i - s :])
                fls.append(fl[i - s :])
            h_rows.append(jnp.concatenate(hs, axis=0) if len(hs) > 1 else hs[0])
            fl_rows.append(jnp.concatenate(fls, axis=0) if len(fls) > 1 else fls[0])
        hc = (jnp.stack(h_rows), jnp.stack(fl_rows))
        self._round_hidden[key] = hc
        return hc

    def _round_pseudo_labels(self, cids, stage: int, round_idx: int) -> dict:
        """Per-client N-best pseudo transcripts from the CURRENT global model
        (the reference regenerates transcripts at every local update with the
        round-start weights, gen_Ntranscripts). One cached jitted forward
        serves every round."""
        if self._pseudo_fwd is None:
            self._pseudo_fwd = make_pseudo_forward(self.cfg.replace(num_lms=1))
        return {
            cid: generate_pseudo_labels(
                self.cfg.replace(stage=stage, num_lms=1), self.global_params,
                self.client_unsup_examples[cid], self.tokenizer,
                self.cfg.num_lms, batch_size=self.fcfg.batch_size,
                time_multiple=self.fcfg.time_multiple,
                seed=self.fcfg.seed + round_idx, forward_fn=self._pseudo_fwd)
            for cid in cids
        }

    # ------------------------------------------------------------------
    # the jitted round
    # ------------------------------------------------------------------

    def _get_round_fn(self, stage: int, phase_specs: tuple[tuple[str, int], ...]):
        """One jitted FL round over 1-2 local phases (unsupervised then
        supervised, per supervised_level); each phase gets a fresh optimizer
        like the reference's per-phase Trainer instances.

        ``phase_specs``: ((kind, steps), ...) with kind "sup" (labeled /
        1-best CTC) or "mt" (N-best multitask: lm_heads initialized from
        lm_head, trained head-i-on-transcript-set-i, head 0 copied back —
        reference ASRLocalUpdate_Multitask.update_weights_adapted :479-621).
        """
        keep_opt = self._debug_keep_opt_state
        key = (stage, phase_specs, keep_opt)
        if key in self._round_fns:
            return self._round_fns[key]
        f = self.fcfg
        # the plain (single-head) model: global params carry no lm_heads_*
        cfg = self.cfg.replace(stage=stage, num_lms=1)
        model = DACSModel(cfg, dtype=_dtype(f.compute_dtype), remat=f.remat)
        network = STAGE_NETWORK[stage]
        n_lms = self.cfg.num_lms
        base_shape = jax.eval_shape(lambda: self.global_params)
        mt_shape = jax.eval_shape(
            lambda: init_lm_heads_from_lm_head(self.global_params, n_lms))
        mt_cfg = cfg.replace(num_lms=n_lms)
        mt_model = (DACSModel(mt_cfg, dtype=_dtype(f.compute_dtype), remat=f.remat)
                    if any(k == "mt" for k, _ in phase_specs) else None)

        # sharding constraints inside the round (zero1 and/or tp): pin the
        # per-client Adam moments (and, under tp, the params' matmul
        # families) to their target layout at init and on every scan-carry
        # hop, so XLA keeps the shards live instead of materializing full
        # per-client state. tp takes precedence per leaf; zero1 covers the
        # rest (the standard Megatron + ZeRO composition).
        if f.zero1 or f.tp:
            from ..parallel.tp import _path_names, tp_partition_spec
            from ..parallel.zero import zero1_partition_spec

            data_n = int(f.mesh.shape.get("data", 1))

            def _spec(path, leaf):
                ndim = getattr(leaf, "ndim", 0)
                spec = (tp_partition_spec(_path_names(path), ndim)
                        if f.tp else P())
                if f.zero1 and all(a is None for a in spec):
                    spec = zero1_partition_spec(tuple(leaf.shape), data_n)
                return spec

            def _constrain(x, spec, _mesh=f.mesh):
                # Inside the shard_map(client-manual) body the constraint
                # must bind against the CONTEXT (partial-manual) mesh — a
                # concrete NamedSharding's all-Auto mesh leaks into
                # downstream aval shardings (e.g. the grad cotangent ->
                # optax zeros_like) and trips the context-mesh check. A
                # bare PartitionSpec resolves against the context mesh; in
                # the GSPMD-vmap fallback there is no context mesh, so the
                # NamedSharding form applies there.
                am = jax.sharding.get_abstract_mesh()
                if am is not None and getattr(am, "_any_axis_manual", False):
                    return jax.lax.with_sharding_constraint(x, spec)
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(_mesh, spec))

            def z1(tree):
                return jax.tree_util.tree_map_with_path(
                    lambda path, x: _constrain(x, _spec(path, x)), tree)

            def tp_params(tree):
                if not f.tp:
                    return tree
                return jax.tree_util.tree_map_with_path(
                    lambda path, x: _constrain(
                        x, tp_partition_spec(_path_names(path), x.ndim)),
                    tree)
        else:
            z1 = None
            tp_params = None

        def z1_wrap(step_fn):
            def stepped(st, batch, _step=step_fn):
                st, metrics = _step(st, batch)
                st = st.replace(opt_state=z1(st.opt_state))
                if f.tp:
                    st = st.replace(params=tp_params(st.params))
                return st, metrics
            return stepped

        txs, steps_fns = [], []
        for kind, steps in phase_specs:
            tx = make_optimizer(
                mt_shape if kind == "mt" else base_shape,
                stage=stage, learning_rate=f.learning_rate,
                weight_decay=f.weight_decay, warmup_steps=f.warmup_steps,
                total_steps=max(steps, 1), fedprox_mu=f.fedprox_mu,
            )
            txs.append(tx)
            if kind == "mt":
                step_fn = make_multitask_train_step(mt_model, tx, mt_cfg)
            elif kind == "res_h":
                step_fn = make_hidden_train_step(model, tx, cfg)
            else:
                step_fn = make_train_step(model, tx, cfg)
            steps_fns.append(z1_wrap(step_fn) if z1 is not None else step_fn)

        def local_train(params, phase_batches, rng):
            # FedProx anchor: the ROUND-START global params for every phase
            # (a later phase must not re-anchor on the previous phase's
            # output — the proximal pull damps drift from the broadcast
            # global). Optimizer init values only matter for the proximal
            # snapshot; Adam moments are zeros regardless.
            round_start = params
            losses = []
            last_opt = None
            for (kind, _), tx, train_step, batches in zip(
                    phase_specs, txs, steps_fns, phase_batches):
                rng, sub = jax.random.split(rng)
                p = (init_lm_heads_from_lm_head(params, n_lms)
                     if kind == "mt" else params)
                p_anchor = (init_lm_heads_from_lm_head(round_start, n_lms)
                            if kind == "mt" else round_start)
                if tp_params is not None:
                    p = tp_params(p)
                opt0 = tx.init(p_anchor)
                if z1 is not None:
                    opt0 = z1(opt0)
                state = DACSTrainState(
                    step=jnp.zeros((), jnp.int32), params=p,
                    opt_state=opt0, rng=sub)

                if kind == "res":
                    # device-resident data: scan over index rows, gather
                    # each batch on device
                    data_c, idx = batches

                    def body(st, idx_b, _step=train_step, _d=data_c):
                        st, metrics = _step(st, _gather_batch(_d, idx_b))
                        return st, metrics["loss"]

                    state, phase_losses = jax.lax.scan(body, state, idx)
                elif kind == "res_h":
                    # cached encoder outputs: head-only steps
                    (h_c, fl_c, data_c), idx = batches

                    def body(st, idx_b, _step=train_step, _h=h_c, _fl=fl_c,
                             _d=data_c):
                        st, metrics = _step(
                            st, _gather_hidden_batch(_h, _fl, _d, idx_b))
                        return st, metrics["loss"]

                    state, phase_losses = jax.lax.scan(body, state, idx)
                else:
                    def body(st, batch, _step=train_step):
                        st, metrics = _step(st, batch)
                        return st, metrics["loss"]

                    state, phase_losses = jax.lax.scan(body, state, batches)
                params = state.params
                last_opt = state.opt_state
                if kind == "mt":  # 1-best head becomes lm_head; scratch dropped
                    params = copy_first_head_to_lm_head(params)
                    params = {k: v for k, v in params.items()
                              if not k.startswith("lm_heads_")}
                losses.append(phase_losses)
            if keep_opt:  # debug: expose the final phase's optimizer state
                return params, jnp.concatenate(losses), last_opt
            return params, jnp.concatenate(losses)

        server_tx = self._server_tx(stage)

        def round_fn(global_params, stacked_phases, rngs, sample_counts,
                     server_opt_state, agg_state):
            k = rngs.shape[0]
            per_client = []
            for (kind, _), ph in zip(phase_specs, stacked_phases):
                if kind == "res":
                    # select the sampled clients' rows from the resident
                    # [K_total, ...] data (on-device gather, no transfer)
                    data_all, csel, idx = ph
                    per_client.append(
                        (jax.tree.map(lambda x: x[csel], data_all), idx))
                elif kind == "res_h":
                    h_all, fl_all, data_all, csel, idx = ph
                    per_client.append((
                        (h_all[csel], fl_all[csel],
                         jax.tree.map(lambda x: x[csel], data_all)), idx))
                else:
                    per_client.append(ph)
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), global_params)
            vmapped = jax.vmap(local_train)
            if f.mesh is not None:
                if k % f.mesh.shape["client"] == 0:
                    # Clients as truly independent SPMD programs: manual
                    # over the ``client`` axis, so NO cross-client
                    # collective can exist inside local training. (Plain
                    # vmap folds the client dim into conv feature groups,
                    # and GSPMD then all-gathers those activations across
                    # clients EVERY STEP — cross-SLICE traffic on a
                    # multislice layout.) The ``data`` axis stays auto, so
                    # XLA still inserts each client's per-step gradient
                    # all-reduce over its own data devices (ICI). The
                    # FedAvg mean below is then the only cross-client
                    # (cross-slice) collective of the round — asserted on
                    # lowered HLO in tests/test_fl_dp.py.
                    vmapped = jax.shard_map(
                        vmapped, mesh=f.mesh,
                        in_specs=P("client"), out_specs=P("client"),
                        axis_names={"client"}, check_vma=False)
                else:
                    # sampled-client count doesn't divide the client axis:
                    # fall back to GSPMD (pads internally); pin the client
                    # dim so the partitioner can't re-use the axis elsewhere
                    vmapped = jax.vmap(local_train, spmd_axis_name="client")
            out = vmapped(stacked, tuple(per_client), rngs)
            new_params, losses = out[0], out[1]
            debug_opt = out[2] if keep_opt else None
            if f.dp_clip_norm is not None:
                if f.fedavg_weighted:
                    raise ValueError("DP-FedAvg is unweighted (uniform-"
                                     "contribution accounting); disable "
                                     "fedavg_weighted")
                from ..parallel.fed import dp_fedavg_stacked

                # per-round noise key, deterministic in the round's rngs
                dp_rng = jax.random.fold_in(rngs[0], 0x5A11)
                avg = dp_fedavg_stacked(new_params, global_params,
                                        f.dp_clip_norm,
                                        f.dp_noise_multiplier, dp_rng)
            elif f.compress_bits is not None:
                from ..parallel.fed import compressed_delta_fedavg

                q_rng = (jax.random.fold_in(rngs[0], 0xC0)
                         if f.compress_stochastic_rounding else None)
                weights = sample_counts if f.fedavg_weighted else None
                avg = compressed_delta_fedavg(
                    new_params, global_params, bits=f.compress_bits,
                    rng=q_rng, weights=weights)
            elif f.secagg_clip_norm is not None:
                from ..parallel.fed import secure_aggregate_fedavg

                sa_rng = jax.random.fold_in(rngs[0], 0x5EC)
                avg = secure_aggregate_fedavg(
                    new_params, global_params, f.secagg_clip_norm, sa_rng,
                    bits=f.secagg_bits)
            elif f.topk_fraction is not None:
                from ..parallel.fed import select_network, topk_delta_fedavg

                # sparsify ONLY the stage's aggregated sub-network: graft
                # discards every other leaf of the aggregate, so spending
                # top-k budget (and error-feedback residual memory) on them
                # would be pure waste — and their residuals could accumulate
                # drift that is never applied
                weights = sample_counts if f.fedavg_weighted else None
                sub_avg, agg_state = topk_delta_fedavg(
                    select_network(new_params, network),
                    select_network(global_params, network),
                    f.topk_fraction, residuals=agg_state, weights=weights)
                avg = dict(global_params)
                avg.update(sub_avg)
            else:
                weights = sample_counts if f.fedavg_weighted else None
                avg = fedavg_stacked(new_params, weights)
            new_global = graft_network(global_params, avg, network)
            if server_tx is not None:
                # FedOpt: the round delta is a pseudo-gradient (negated —
                # optimizers descend) for the server optimizer
                import optax

                delta = jax.tree.map(
                    lambda c, g: c.astype(jnp.float32) - g.astype(jnp.float32),
                    new_global, global_params)
                updates, server_opt_state = server_tx.update(
                    jax.tree.map(jnp.negative, delta), server_opt_state)
                new_global = optax.apply_updates(global_params, updates)
            mean_losses = jnp.mean(losses, axis=1)
            if keep_opt:
                return (new_global, server_opt_state, agg_state, mean_losses,
                        debug_opt)
            return new_global, server_opt_state, agg_state, mean_losses

        jitted = jax.jit(round_fn)
        self._round_fns[key] = jitted
        return jitted

    def _server_tx(self, stage: int):
        """The FedOpt server optimizer (or None for reference FedAvg),
        masked to the stage's aggregated sub-network: only those leaves
        carry nonzero deltas (graft keeps the rest bit-identical), so the
        optimizer state (momenta) covers just that subtree — no full-tree
        fp32 moments in HBM or in round checkpoints."""
        import optax

        from ..parallel.fed import network_mask

        f = self.fcfg
        if f.server_optimizer == "none":
            return None
        if f.server_optimizer == "momentum":
            lr = 1.0 if f.server_lr is None else f.server_lr
            inner = optax.sgd(lr, momentum=f.server_momentum or None)
        else:
            lr = 1e-2 if f.server_lr is None else f.server_lr
            inner = optax.adam(lr)
        network = STAGE_NETWORK[stage]
        # masked-out leaves pass their update through unchanged — safe:
        # their pseudo-gradient is exactly zero
        return optax.masked(inner, lambda params: network_mask(params, network))

    def _init_server_state(self, stage: int):
        tx = self._server_tx(stage)
        return tx.init(jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), self.global_params))

    def _server_opt_state(self, stage: int):
        """Per-stage server optimizer state, initialized lazily (each stage
        aggregates a different sub-network, so momentum must not leak
        across stages)."""
        if self._server_tx(stage) is None:
            return None
        st = self._server_opt_states.get(stage)
        if st is None:
            st = self._init_server_state(stage)
            self._server_opt_states[stage] = st
        return st

    def _topk_residual_template(self, stage: int):
        """Zeros [K_total, ...] residual pytree covering ONLY the stage's
        aggregated sub-network (the one part of the aggregate graft keeps —
        residuals elsewhere would be memory + uplink spent on discarded
        leaves)."""
        from ..parallel.fed import select_network

        return jax.tree.map(
            lambda x: jnp.zeros((len(self.client_ids),) + x.shape,
                                jnp.float32),
            select_network(self.global_params, STAGE_NETWORK[stage]))

    def _topk_residuals_for(self, stage: int):
        """Per-stage error-feedback residuals, zeros-initialized lazily
        (one fp32 copy of the sub-network tree per client — the algorithm's
        actual memory cost; opt-in via topk_fraction)."""
        if self.fcfg.topk_fraction is None:
            return None
        res = self._topk_residuals.get(stage)
        if res is None:
            res = self._topk_residual_template(stage)
            self._topk_residuals[stage] = res
        return res

    def _place_round_inputs(self, params, batches, rngs, counts,
                            specs=None):
        """With a mesh: shard the client axis of batches/rngs over the
        ``client`` mesh axis, the per-client batch dim over the ``data``
        axis, and replicate params; jit infers the rest — the FedAvg mean
        lowers to one collective over the client axis, and each client's
        per-step gradient sync to one all-reduce over its ``data`` devices.

        Sharding the batch dim is what makes ``data`` real per-client data
        parallelism: each of a client's ``data`` devices computes the
        forward/backward for B/data rows and XLA all-reduces the gradients
        (classic DP inside the round program). Requires batch_size to
        divide evenly; tested row sharding + collective replica groups in
        tests/test_fl_dp.py.
        """
        mesh = self.fcfg.mesh
        if mesh is None:
            return params, batches, rngs, counts
        repl = NamedSharding(mesh, P())
        if int(rngs.shape[0]) % int(mesh.shape["client"]):
            # GSPMD fallback (m doesn't divide the client axis): an uneven
            # client dim cannot be device_put with a "client" sharding —
            # replicate the inputs and let the partitioner pad/slice inside
            # the program (the round fn's vmap carries
            # spmd_axis_name="client"). Padding cost is logged per round as
            # gspmd_client_pad_frac.
            return (jax.device_put(params, repl),
                    jax.tree.map(lambda x: jax.device_put(x, repl), batches),
                    jax.device_put(rngs, repl), jax.device_put(counts, repl))
        csh = NamedSharding(mesh, P("client"))
        data_n = int(mesh.shape.get("data", 1))
        if data_n > 1 and self.fcfg.batch_size % data_n:
            raise ValueError(
                f"batch_size ({self.fcfg.batch_size}) must be divisible by "
                f"the data mesh axis ({data_n}) so each client's batch rows "
                "shard evenly across its data devices")
        kinds = ([k for k, _ in specs] if specs is not None
                 else ["sup"] * len(batches))

        def put_phase(phase, kind):
            if data_n == 1:
                return jax.tree.map(lambda x: jax.device_put(x, csh), phase)
            if kind not in ("sup", "mt"):
                raise ValueError(
                    f"phase kind {kind!r} cannot run on a mesh (resident "
                    "paths are disabled when fcfg.mesh is set)")
            # DeviceBatch leaves are [K, steps, B, ...] -> B is dim 2
            bsh = NamedSharding(mesh, P("client", None, "data"))
            if kind == "mt":
                # (DeviceBatch, labels [K, steps, N, B, L], lens [K, steps,
                # N, B]) -> B is dim 3 on the N-best stacks
                db, stacks, lls = phase
                nsh = NamedSharding(mesh, P("client", None, None, "data"))
                return (jax.tree.map(lambda x: jax.device_put(x, bsh), db),
                        jax.device_put(stacks, nsh), jax.device_put(lls, nsh))
            return jax.tree.map(lambda x: jax.device_put(x, bsh), phase)

        params = jax.device_put(params, repl)
        batches = tuple(put_phase(ph, k) for ph, k in zip(batches, kinds))
        return params, batches, jax.device_put(rngs, csh), jax.device_put(counts, csh)

    # ------------------------------------------------------------------
    # host loops
    # ------------------------------------------------------------------

    def _build_round(self, stage: int, rnd: int, cids) -> tuple:
        """Host-side data build for one round: (phases, specs, dead_frac).
        Pure host work (bucketing, padding, stacking, H2D staging) — safe to
        run one round ahead unless a phase needs the current global params
        (round-time pseudo-labeling, num_lms > 1)."""
        sl = self.fcfg.supervised_level
        phases, specs, dead_fracs = [], [], []
        if sl < 1.0:  # unsupervised (pseudo-labeled) phase first
            if self.cfg.num_lms > 1:  # N-best multitask client update
                pseudo = self._round_pseudo_labels(cids, stage, rnd)
                data = self._client_round_batches(
                    cids, rnd, source=self.client_unsup_examples, pseudo=pseudo)
                phases.append(data)
                specs.append(("mt", data[0].input_values.shape[1]))
            else:  # plain CTC on teacher 1-best transcripts
                phase, spec = self._resident_or_staged_phase(
                    stage, self.client_unsup_examples, cids, rnd)
                phases.append(phase)
                specs.append(spec)
            dead_fracs.append(self._last_dead_step_frac)
        if sl > 0.0:  # supervised phase
            phase, spec = self._resident_or_staged_phase(
                stage, self.client_examples, cids, rnd)
            phases.append(phase)
            specs.append(spec)
            dead_fracs.append(self._last_dead_step_frac)
        # report the worst phase's padding overhead for the round
        return tuple(phases), tuple(specs), max(dead_fracs, default=0.0)

    def _resident_or_staged_phase(self, stage: int, source: dict, cids,
                                  rnd: int):
        """One supervised-style phase: cached-encoder (res_h) when a hidden
        cache exists for this source AND the stage's backbone is frozen
        (1/2), else resident indices, else staged."""
        if self._resident_enabled(source):
            data_all, csel, idx = self._client_round_indices(cids, rnd, source)
            hc = self._round_hidden.get(id(source)) if stage in (1, 2) else None
            if hc is not None:
                h_all, fl_all = hc
                return ((h_all, fl_all, data_all, csel, idx),
                        ("res_h", idx.shape[1]))
            return (data_all, csel, idx), ("res", idx.shape[1])
        data = self._client_round_batches(cids, rnd, source=source)
        return data, ("sup", data.input_values.shape[1])

    def _round_ckpts(self, stage: int):
        """Sorted (round, path) list of this stage's round checkpoints.
        Checkpoints are namespaced per stage (``stage{S}-round-{N}``) so a
        full-pipeline run's stages neither resume from nor garbage-collect
        each other's rounds."""
        import re
        from pathlib import Path

        d = Path(self.fcfg.round_save_dir)
        out = []
        # strict match: orbax leaves '<name>.orbax-checkpoint-tmp-<ts>'
        # debris behind on a crash mid-save — the all-digit timestamp must
        # not parse as a (huge, unfinished) round number
        pat = re.compile(rf"^stage{stage}-round-(\d+)$")
        for p in d.glob(f"stage{stage}-round-*"):
            m = pat.match(p.name)
            if m is not None:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def _maybe_save_round(self, stage: int, rnd: int) -> None:
        f = self.fcfg
        if f.round_save_dir is None or rnd % max(f.round_save_every, 1):
            return
        import shutil

        from ..train.checkpoint import save_params

        save_params(f"{f.round_save_dir}/stage{stage}-round-{rnd}",
                    self.global_params, {"stage": stage, "round": rnd})
        sstate = self._server_opt_states.get(stage)
        if sstate is not None:
            save_params(f"{f.round_save_dir}/stage{stage}-round-{rnd}-server",
                        jax.device_get(sstate))
        res = self._topk_residuals.get(stage)
        if res is not None:
            save_params(f"{f.round_save_dir}/stage{stage}-round-{rnd}-topk",
                        jax.device_get(res))
        if self._dp_active():
            import json
            from pathlib import Path

            Path(f"{f.round_save_dir}/stage{stage}-round-{rnd}-dp.json"
                 ).write_text(json.dumps(self._dp_accountant.state_dict()))
        ckpts = self._round_ckpts(stage)
        for _, p in ckpts[: max(0, len(ckpts) - f.round_save_limit)]:
            shutil.rmtree(p)
            for suffix in ("-server", "-topk"):
                sib = p.with_name(p.name + suffix)
                if sib.exists():
                    shutil.rmtree(sib)
            dp = p.with_name(p.name + "-dp.json")
            if dp.exists():
                dp.unlink()

    def _maybe_resume_rounds(self, stage: int) -> int:
        """Load this stage's newest round checkpoint (if configured);
        returns the number of rounds already completed."""
        f = self.fcfg
        if f.round_save_dir is None:
            return 0
        from ..train.checkpoint import load_params

        ckpts = self._round_ckpts(stage)
        if not ckpts:
            return 0
        rnd, p = ckpts[-1]
        self.global_params = load_params(str(p))
        if self._server_tx(stage) is not None:
            srv = p.with_name(p.name + "-server")
            if srv.exists():
                self._server_opt_states[stage] = load_params(
                    str(srv), template=self._init_server_state(stage))
            else:
                # resuming without the momentum makes the continued run
                # differ from the straight-through one — say so loudly
                print(f"[engine] round checkpoint {p.name} has no "
                      f"'-server' sibling; {self.fcfg.server_optimizer} "
                      "server state restarts from zero (resume is inexact)")
                self.logger.log({"fl_resume_server_state_missing": 1.0,
                                 "stage": stage})
        if f.topk_fraction is not None:
            tk = p.with_name(p.name + "-topk")
            if tk.exists():
                # load_params returns host numpy; the round loop scatters
                # into these with .at[pos].set, so they must be jax arrays
                self._topk_residuals[stage] = jax.tree.map(
                    jnp.asarray, load_params(
                        str(tk),
                        template=self._topk_residual_template(stage)))
            else:
                # re-initializing residuals to zero silently drops every
                # accumulated untransmitted coordinate — say so loudly,
                # mirroring the '-server' path
                print(f"[engine] round checkpoint {p.name} has no '-topk' "
                      "sibling; top-k error-feedback residuals restart "
                      "from zero (resume is inexact)")
                self.logger.log({"fl_resume_topk_residuals_missing": 1.0,
                                 "stage": stage})
        if self._dp_active():
            import json

            from .privacy import DpAccountant

            dp = p.with_name(p.name + "-dp.json")
            if dp.exists():
                self._dp_accountant = DpAccountant.from_state(
                    json.loads(dp.read_text()))
            else:
                # reconstruct this stage's spend exactly (q and sigma are
                # constant within a run) — but any OTHER stage's rounds from
                # a previous process are lost to the total; say so loudly
                self._dp_accountant.step(
                    self._dp_q(), f.dp_noise_multiplier, num_steps=rnd)
                print(f"[engine] round checkpoint {p.name} has no "
                      "'-dp.json' sidecar; the privacy accountant was "
                      f"rebuilt from this stage's {rnd} rounds only — "
                      "epsilon excludes rounds other stages ran before "
                      "the restart")
                self.logger.log({"fl_resume_dp_accountant_rebuilt": 1.0,
                                 "stage": stage})
        self.logger.log({"fl_resume_round": rnd, "stage": stage})
        return rnd

    def _dp_active(self) -> bool:
        f = self.fcfg
        return f.dp_clip_norm is not None and f.dp_noise_multiplier > 0.0

    def _dp_q(self) -> float:
        """Per-round client sampling rate m/K for the RDP accountant."""
        k_total = len(self.client_ids)
        return max(int(self.fcfg.frac * k_total), 1) / k_total

    def run_rounds(self, stage: int, num_rounds: int | None = None) -> Any:
        """FedAvg rounds (reference FL_training_rounds,
        federated_main.py:69-145). Host-side round building overlaps the
        previous round's device execution (prefetch_iter) whenever phases
        don't depend on the current global params — measured ~570 ms of the
        ~740 ms stage-2 round at production shapes is host build + staging."""
        from ..train.prefetch import prefetch_iter

        f = self.fcfg
        num_rounds = f.num_rounds if num_rounds is None else num_rounds
        rng = np.random.default_rng(f.seed)
        k_total = len(self.client_ids)
        m = max(int(f.frac * k_total), 1)
        plan = [
            (rnd, [self.client_ids[i]
                   for i in rng.choice(k_total, size=m, replace=False)])
            for rnd in range(num_rounds)
        ]
        sl = f.supervised_level
        sources = ([self.client_unsup_examples]
                   if sl < 1.0 and self.cfg.num_lms == 1 else []) + \
                  ([self.client_examples] if sl > 0.0 else [])
        # stages 1/2: frozen deterministic encoder -> precompute every
        # utterance's encoder output once; rounds train heads on the cache
        # (persists across run_rounds calls; stage-0 training clears it)
        if stage in (1, 2):
            for src in sources:
                if self._resident_enabled(src):
                    self._hidden_cache_for(stage, src)
        start_round = self._maybe_resume_rounds(stage)
        if start_round >= num_rounds:
            return self.global_params
        plan = plan[start_round:]
        built = ((rnd, cids, self._build_round(stage, rnd, cids))
                 for rnd, cids in plan)
        # overlap round building with execution only when (a) no phase needs
        # the current global params (num_lms == 1) and (b) every phase is
        # device-resident — prefetching STAGED rounds would keep up to 3
        # rounds of full client data live at once (index arrays are bytes)
        if self.cfg.num_lms == 1 and all(map(self._resident_enabled, sources)):
            built = prefetch_iter(built, depth=1)
        for rnd, cids, (phases, specs, dead_frac) in built:
            round_fn = self._get_round_fn(stage, specs)
            rngs = jax.random.split(jax.random.PRNGKey(f.seed + 7919 * rnd), m)
            counts = jnp.asarray(
                [len(self.client_examples[c]) for c in cids], dtype=jnp.float32)
            placed = self._place_round_inputs(
                self.global_params, phases, rngs, counts, specs)
            sstate = self._server_opt_state(stage)
            if sstate is not None and f.mesh is not None:
                sstate = jax.device_put(sstate, NamedSharding(f.mesh, P()))
            res_all = self._topk_residuals_for(stage)
            if res_all is None:
                agg_sel = pos = None
            else:
                # residuals are per client ID; the round sees the sampled
                # clients' rows in sample order, scattered back afterwards
                pos = jnp.asarray(
                    [self.client_ids.index(c) for c in cids], jnp.int32)
                agg_sel = jax.tree.map(lambda x: x[pos], res_all)
                if f.mesh is not None:
                    agg_sel = jax.device_put(
                        agg_sel, NamedSharding(f.mesh, P("client")))
            out = round_fn(*placed, sstate, agg_sel)
            if self._debug_keep_opt_state:
                (self.global_params, sstate, agg_sel, losses,
                 self._debug_opt_state) = out
            else:
                self.global_params, sstate, agg_sel, losses = out
            if sstate is not None:
                self._server_opt_states[stage] = sstate
            if res_all is not None:
                self._topk_residuals[stage] = jax.tree.map(
                    lambda r, s: r.at[pos].set(s.astype(jnp.float32)),
                    res_all, agg_sel)
            row = {
                "fl_round": rnd + 1, "stage": stage,
                "clients": ",".join(str(c) for c in cids),
                "dead_step_frac": round(dead_frac, 4),
                **{f"client{c}_loss": float(l) for c, l in zip(cids, losses)},
            }
            if self._dp_active():
                self._dp_accountant.step(m / k_total, f.dp_noise_multiplier)
                row["dp_epsilon"] = round(self._dp_accountant.epsilon(), 4)
                row["dp_delta"] = f.dp_delta
            if f.mesh is not None:
                # GSPMD-fallback padding cost: when the sampled-client count
                # doesn't divide the client axis, the partitioner pads the
                # client dim to the next multiple — those lanes run the full
                # local training on garbage and are dropped. Supported K
                # envelope: keep m a multiple of the client axis (frac=1.0
                # with num_clients % client_mesh == 0) for zero waste.
                c_ax = int(f.mesh.shape["client"])
                if m % c_ax:
                    padded = -(-m // c_ax) * c_ax
                    row["gspmd_client_pad_frac"] = round(1.0 - m / padded, 4)
            self.logger.log(row)
            if self.eval_examples is not None:
                ev = self.evaluate(stage)
                ev.update({"fl_round": rnd + 1, "stage": stage})
                self.logger.log(ev)
            self._maybe_save_round(stage, rnd + 1)
        if stage == 0:  # the rounds trained the backbone: hidden caches stale
            self._invalidate_hidden_caches()
        return self.global_params

    def _invalidate_hidden_caches(self) -> None:
        """Drop every frozen-backbone encoder-output cache (engine round
        caches AND the per-stage eval Trainers' hidden eval caches) — called
        after any stage-0 training, which is the only place the backbone
        mutates."""
        self._round_hidden.clear()
        for tr in self._eval_trainers.values():
            tr._hidden = None
            tr._hidden_eval = None

    def centralized_training(self, stage: int, num_epochs: int | None = None) -> Any:
        """Global warm-start on the public split (reference
        centralized_training -> ASRGlobalUpdate.update_weights)."""
        f = self.fcfg
        tr = Trainer(
            self.cfg.replace(stage=stage, num_lms=1), self.global_params,
            self.public_examples, self.eval_examples, self.tokenizer,
            TrainerConfig(
                num_epochs=f.global_ep if num_epochs is None else num_epochs,
                batch_size=f.batch_size, eval_batch_size=f.eval_batch_size,
                learning_rate=f.learning_rate, warmup_steps=f.warmup_steps,
                weight_decay=f.weight_decay, compute_dtype=f.compute_dtype,
                remat=f.remat, time_multiple=f.time_multiple,
                label_multiple=f.label_multiple, max_samples=f.max_samples,
                shuffle_window=f.shuffle_window, seed=f.seed, log_dir=f.log_dir,
                log_file=f.log_file and f"global_{f.log_file}",
            ),
        )
        state = tr.train()
        self.global_params = jax.device_get(state.params)
        if stage == 0:  # backbone trained: hidden caches stale
            self._invalidate_hidden_caches()
        return self.global_params

    def evaluate(self, stage: int) -> dict:
        # One Trainer (hence one jitted eval step) per stage, reused across
        # rounds — a fresh jit wrapper per round would retrace/recompile.
        tr = self._eval_trainers.get(stage)
        if tr is None:
            tr = Trainer(
                self.cfg.replace(stage=stage, num_lms=1), self.global_params, [],
                self.eval_examples, self.tokenizer,
                TrainerConfig(batch_size=self.fcfg.eval_batch_size,
                              eval_batch_size=self.fcfg.eval_batch_size,
                              time_multiple=self.fcfg.time_multiple,
                              label_multiple=self.fcfg.label_multiple),
            )
            self._eval_trainers[stage] = tr
        tr.state = dataclasses.replace(tr.state, params=self.global_params)
        return tr.evaluate()

    # ---- the 3-stage DACS FL pipeline ----

    def run_stage1(self) -> Any:
        """ASR fine-tune: centralized warm-start + FL rounds, aggregate ASR
        (reference stage1_training, federated_main.py:148-167)."""
        self.centralized_training(stage=0)
        return self.run_rounds(stage=0)

    def run_stage2(self) -> Any:
        """AD classifier (reference stage2_training :169-182)."""
        self.centralized_training(stage=1)
        return self.run_rounds(stage=1)

    def run_stage3(self) -> Any:
        """Toggling network (reference stage3_training :184-205)."""
        self.centralized_training(stage=2)
        return self.run_rounds(stage=2)

    def run_full_pipeline(self) -> Any:
        self.run_stage1()
        self.run_stage2()
        self.run_stage3()
        return self.global_params


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
