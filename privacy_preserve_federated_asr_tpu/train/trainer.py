"""Single-program trainer: one jitted train step serves every DACS recipe.

Replaces the reference's HF ``Trainer`` subclasses (``CustomTrainer``
federated/src/update.py:51-98, ``DementiaGRLTrainer``
centralized/trainer_data2vec.py:18-71): stage routing is config (loss terms
+ optimizer masks), not code forks. The hot loop is a donated, jitted
``value_and_grad`` over the full DACS graph; batches come from the
length-bucketed batcher so XLA compiles a handful of static shapes.
"""

from __future__ import annotations

import dataclasses
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collate import LengthBucketBatcher
from ..data.dataset import AsrExample
from ..data.tokenizer import CTCCharTokenizer
from ..models.config import DACSConfig
from ..models.dacs import DACSModel
from .checkpoint import CheckpointManager
from .logging import JsonlLogger, StepTimer, record_result
from .metrics import wer
from .optim import make_optimizer
from .prefetch import prefetch_device_batches
from .steps import (
    HiddenBatch,
    backbone_forward_fn,
    frontend_forward_fn,
    gather_features,
    gather_hidden,
    make_eval_step,
    make_feature_train_step,
    make_hidden_eval_step,
    make_hidden_train_step,
    make_train_step,
)
from .train_state import DACSTrainState, create_train_state

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


@dataclass
class TrainerConfig:
    num_epochs: int = 1
    batch_size: int = 8
    eval_batch_size: int = 8
    learning_rate: float | None = None      # None -> stage default (1e-5/1e-4/1e-3)
    warmup_steps: int = 1000
    weight_decay: float = 0.005
    max_grad_norm: float = 1.0
    eval_steps: int = 500
    logging_steps: int = 50
    save_steps: int = 500
    save_total_limit: int = 2
    seed: int = 0
    compute_dtype: str = "float32"
    remat: bool = False
    scan_layers: bool = False  # one compiled layer scanned over N (fast compile)
    dp: int = 1  # data-parallel chips: batch sharded over a "data" mesh axis
    zero1: bool = False  # ZeRO-1: shard Adam moments over the "data" axis
    #                      (parallel/zero.py; reduce-scatter grads into the
    #                      moment shards + all-gather updates, via GSPMD)
    grad_accum: int = 1  # micro-batches accumulated per optimizer update
    #                      (optax.MultiSteps; effective batch = batch_size
    #                      x grad_accum at batch_size activation memory)
    tp: int = 1  # tensor-parallel chips: encoder matmuls sharded over "model"
    pp: int = 1  # pipeline stages: encoder layer stack over a "pipe" axis
    pp_microbatches: int | None = None  # GPipe microbatches (default = pp)
    sp: int = 1  # sequence-parallel chips: stack activations' time axis
    #              sharded over a "seq" axis (long-T memory relief)
    time_multiple: int = 16000
    label_multiple: int = 32
    max_samples: int | None = None           # drop utterances longer than this
    shuffle_window: int | None = None        # per-epoch membership reshuffle
    prefetch: int = 2                        # device batches staged ahead (0 = off)
    # Frozen-backbone stages (1/2) can train heads on CACHED encoder outputs
    # (the backbone is frozen AND deterministic there — reference .eval()
    # semantics — so backbone(x) is a training-invariant constant per
    # utterance). None = auto (on for stage 1/2 when dp == 1).
    cache_encoder: bool | None = None
    # Stage 0 trains the encoder, but the conv FRONTEND is still frozen
    # (reference freeze_feature_encoder) and deterministic — its outputs are
    # cached the same way. None = auto (on for stage 0 when dp == tp == 1).
    cache_frontend: bool | None = None
    cache_budget_bytes: int = 8 << 30        # fall back to full forward if over
    log_file: str | None = None
    log_dir: str = "./saves/log"
    save_dir: str | None = None
    resume_from: str | None = None  # checkpoint dir (or "auto" = latest in save_dir)


class Trainer:
    def __init__(
        self,
        cfg: DACSConfig,
        params,
        train_examples: Sequence[AsrExample],
        eval_examples: Sequence[AsrExample] | None,
        tokenizer: CTCCharTokenizer,
        tcfg: TrainerConfig = TrainerConfig(),
    ):
        if tcfg.tp > 1:
            # GSPMD partitions the plain-XLA attention einsums over the
            # "model" axis automatically; the Pallas flash kernel is a
            # single opaque call it cannot slice — force the XLA impl
            # (pallas stays the single-chip/long-T path)
            from ..parallel.tp import validate_tp_divisibility

            validate_tp_divisibility(cfg.backbone, tcfg.tp)
            if cfg.backbone.attention_impl == "pallas":
                raise ValueError("tp > 1 requires attention_impl 'xla'/'auto' "
                                 "(the Pallas kernel is opaque to GSPMD)")
            if cfg.backbone.attention_impl == "auto":
                cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
                    cfg.backbone, attention_impl="xla"))
        if tcfg.pp > 1:
            # GPipe pipeline over a "pipe" mesh axis (parallel/pp.py): the
            # pipelined forward is wired for the DACS model's stacked
            # scan_layers layout. Composes with dp (mesh ("data", "pipe"):
            # batch rows GSPMD-sharded over "data", the pipe axis manual
            # inside the pipelined forward); tp x pp is not offered.
            from ..parallel.pp import validate_pp

            if cfg.method != "dacs":
                raise ValueError("pp > 1 is wired for the DACS model only "
                                 f"(method={cfg.method!r})")
            if not tcfg.scan_layers:
                raise ValueError("pp > 1 requires scan_layers=True (the "
                                 "stacked [L, ...] param layout the "
                                 "pipeline shards)")
            if tcfg.tp > 1:
                raise ValueError("tp x pp is not supported (Megatron "
                                 "sharding inside the manual pipe stage is "
                                 "a separate story); compose pp with dp")
            mb = tcfg.pp_microbatches or tcfg.pp
            validate_pp(cfg.backbone, tcfg.pp, tcfg.batch_size, mb)
            validate_pp(cfg.backbone, tcfg.pp, tcfg.eval_batch_size, mb)
            if tcfg.dp > 1 and (tcfg.batch_size // mb) % tcfg.dp:
                raise ValueError(
                    f"dp x pp: each microbatch ({tcfg.batch_size}/{mb} rows) "
                    f"must divide by dp={tcfg.dp} so its rows shard evenly")
        if tcfg.sp > 1:
            # Sequence parallelism over a "seq" mesh axis (parallel/sp.py):
            # stack activations' time axis GSPMD-sharded. Composes with dp
            # (mesh ("data", "seq")); sp x tp / sp x pp are not offered.
            if cfg.method != "dacs":
                raise ValueError("sp > 1 is wired for the DACS model only "
                                 f"(method={cfg.method!r})")
            if not tcfg.scan_layers:
                raise ValueError("sp > 1 requires scan_layers=True (the "
                                 "stacked [L, ...] param layout the "
                                 "sequence-parallel stack scans)")
            if tcfg.tp > 1 or tcfg.pp > 1:
                raise ValueError("sp composes with dp only "
                                 f"(got tp={tcfg.tp}, pp={tcfg.pp})")
            if cfg.backbone.attention_impl == "pallas":
                raise ValueError("sp > 1 requires attention_impl 'xla'/'auto'"
                                 " (the Pallas kernel is opaque to GSPMD)")
            if cfg.backbone.attention_impl == "auto":
                cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
                    cfg.backbone, attention_impl="xla"))
        if tcfg.zero1:
            # ZeRO-1 (parallel/zero.py): Adam moments sharded over "data".
            # Needs dp > 1 (the shards live on the data axis) and plain-dp
            # GSPMD (under tp the moments are already Megatron-sharded over
            # "model"; pp/sp manage state placement themselves).
            if tcfg.dp < 2 or tcfg.tp > 1 or tcfg.pp > 1 or tcfg.sp > 1:
                raise ValueError(
                    "zero1 shards optimizer state over the 'data' axis: it "
                    f"requires dp >= 2 and tp == pp == sp == 1 (got dp="
                    f"{tcfg.dp}, tp={tcfg.tp}, pp={tcfg.pp}, sp={tcfg.sp})")
        if tcfg.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {tcfg.grad_accum}")
        from ..models.recipes import get_recipe, validate_stage

        validate_stage(cfg)
        if cfg.backbone.dense_impl not in ("fp", "int8_train") \
                or tcfg.compute_dtype not in _DTYPES:
            # the inference-only "int8" impl has no gradient rule; training
            # quantization goes through "int8_train" (custom-VJP SwitchBack
            # gradients, ops/quant.py)
            raise ValueError(
                f"dense_impl={cfg.backbone.dense_impl!r} / compute_dtype="
                f"{tcfg.compute_dtype!r}: training requires dense_impl "
                "'fp' or 'int8_train' with compute_dtype "
                "'float32'/'bfloat16'")
        self.cfg = cfg
        self.tcfg = tcfg
        self.tokenizer = tokenizer
        self.recipe = get_recipe(cfg.method)
        self.model = self.recipe.make_model(
            cfg, dtype=_DTYPES[tcfg.compute_dtype],
            remat=tcfg.remat, scan_layers=tcfg.scan_layers)
        if tcfg.scan_layers:
            # ported / per-layer checkpoints carry layers_{i}; the scan model
            # wants the stacked layout (same math — tests/test_backbone.py)
            from ..models.port import stack_scan_layers

            if "layers_0" in params["backbone"]["encoder"]:
                params = dict(params)
                params["backbone"] = stack_scan_layers(
                    params["backbone"], cfg.backbone.num_hidden_layers)
        self.logger = JsonlLogger(tcfg.log_dir, tcfg.log_file)
        self.ckpt = (CheckpointManager(tcfg.save_dir, tcfg.save_total_limit)
                     if tcfg.save_dir else None)

        self.train_batcher = LengthBucketBatcher(
            train_examples, tcfg.batch_size, time_multiple=tcfg.time_multiple,
            label_multiple=tcfg.label_multiple, seed=tcfg.seed,
            max_samples=tcfg.max_samples, shuffle_window=tcfg.shuffle_window,
        )
        self.eval_batcher = (
            LengthBucketBatcher(
                eval_examples, tcfg.eval_batch_size, time_multiple=tcfg.time_multiple,
                label_multiple=tcfg.label_multiple, seed=tcfg.seed)
            if eval_examples else None
        )
        # the lr schedule counts OPTIMIZER updates: with grad_accum > 1 the
        # inner transformation steps once per k micro-batches
        total_steps = max(
            len(self.train_batcher) * tcfg.num_epochs // max(tcfg.grad_accum, 1),
            1)
        self.tx = make_optimizer(
            jax.tree.map(lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.float32), params),
            stage=cfg.stage,
            learning_rate=tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            max_grad_norm=tcfg.max_grad_norm,
            warmup_steps=tcfg.warmup_steps,
            total_steps=total_steps,
            trainable_pred=self.recipe.trainable(cfg.stage),
        )
        if tcfg.grad_accum > 1:
            # Gradient accumulation: k micro-batches per optimizer update
            # (the lr schedule above already counts optimizer updates —
            # MultiSteps only steps the inner transformation every k-th
            # call, so its count matches). Micro-gradients are SUMMED, not
            # averaged: the CTC objective is a sum over batch rows
            # (ctc_loss_reduction="sum", HF parity), so summing makes
            # k micro-batches of B rows equal ONE batch of k x B rows
            # exactly (up to the clip, which sees the same total gradient).
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=tcfg.grad_accum,
                                       use_grad_mean=False)
            # NOTE (cadence semantics): state.step counts MICRO-steps, so
            # logging_steps / eval_steps / save_steps fire per micro-batch
            # (save_steps=500 at k=2 means 250 optimizer updates) and
            # checkpoints may land mid-accumulation — exact resume still
            # holds because MultiSteps' acc_grads ride in the saved state.
            micro_total = len(self.train_batcher) * tcfg.num_epochs
            if micro_total % tcfg.grad_accum != 0:
                warnings.warn(
                    f"train length ({micro_total} micro-steps) is not a "
                    f"multiple of grad_accum={tcfg.grad_accum}: the final "
                    f"{micro_total % tcfg.grad_accum} accumulated "
                    "micro-gradients never fire an optimizer update and are "
                    "dropped at the end of train()", stacklevel=2)
        self.state = create_train_state(params, self.tx, jax.random.PRNGKey(tcfg.seed))
        if tcfg.resume_from:
            self._resume(tcfg.resume_from)
        self._batch_sharding = None
        self._zero1_sh = None
        if (tcfg.dp > 1 or tcfg.tp > 1) and tcfg.pp == 1 and tcfg.sp == 1:
            # GSPMD parallelism over a ("data", "model") mesh:
            #   dp — batch dim sharded over "data", jit inserts the gradient
            #        all-reduce (SURVEY.md §2.6: replaces torch
            #        DataParallel / Lightning DDP);
            #   tp — encoder matmuls Megatron-sharded over "model"
            #        (parallel/tp.py), params+Adam moments sharded the same
            #        way, one all-reduce per attention/FFN block.
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from ..parallel.tp import tp_shardings

            if tcfg.batch_size % tcfg.dp or tcfg.eval_batch_size % tcfg.dp:
                raise ValueError(
                    f"batch sizes ({tcfg.batch_size}/{tcfg.eval_batch_size}) "
                    f"must be divisible by dp={tcfg.dp}")
            devices = jax.devices()
            n = tcfg.dp * tcfg.tp
            if len(devices) < n:
                raise ValueError(
                    f"dp={tcfg.dp} x tp={tcfg.tp} needs {n} devices, "
                    f"have {len(devices)}")
            mesh = Mesh(np.array(devices[:n]).reshape(tcfg.dp, tcfg.tp),
                        ("data", "model"))
            self._batch_sharding = NamedSharding(mesh, P("data"))
            if tcfg.tp > 1:
                # non-encoder leaves (and step/rng/Adam count) come back
                # replicated from tp_shardings
                self.state = jax.device_put(
                    self.state, tp_shardings(mesh, self.state))
            elif tcfg.zero1:
                # ZeRO-1: params replicated, Adam moments sharded over
                # "data" (parallel/zero.py) — GSPMD turns the dp gradient
                # all-reduce into reduce-scatter + update all-gather
                from ..parallel.zero import zero1_state_shardings

                sh = zero1_state_shardings(mesh, self.state)
                self._zero1_sh = sh
                self.state = jax.device_put(self.state, sh)
            else:
                self.state = jax.device_put(self.state, NamedSharding(mesh, P()))
        forward_fn = None
        if tcfg.pp > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from ..parallel.pp import make_pp_forward

            devices = jax.devices()
            n = tcfg.dp * tcfg.pp
            if len(devices) < n:
                raise ValueError(f"dp={tcfg.dp} x pp={tcfg.pp} needs {n} "
                                 f"devices, have {len(devices)}")
            if tcfg.dp > 1:
                # dp x pp: batch rows GSPMD-sharded over "data"; the pipe
                # axis is manual inside the pipelined forward's shard_map
                mesh = Mesh(np.array(devices[:n]).reshape(tcfg.dp, tcfg.pp),
                            ("data", "pipe"))
                self._batch_sharding = NamedSharding(mesh, P("data"))
            else:
                mesh = Mesh(np.array(devices[:n]), ("pipe",))
                self._batch_sharding = NamedSharding(mesh, P())
            # params/opt state replicated on every stage; the stacked layer
            # leaves are re-sharded over "pipe" inside the pipelined
            # forward's shard_map
            self.state = jax.device_put(self.state, NamedSharding(mesh, P()))
            forward_fn = make_pp_forward(
                self.model, mesh,
                num_microbatches=tcfg.pp_microbatches or tcfg.pp,
                remat=tcfg.remat)
        if tcfg.sp > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from ..parallel.sp import make_sp_forward

            devices = jax.devices()
            n = tcfg.dp * tcfg.sp
            if len(devices) < n:
                raise ValueError(f"dp={tcfg.dp} x sp={tcfg.sp} needs {n} "
                                 f"devices, have {len(devices)}")
            if tcfg.batch_size % tcfg.dp or tcfg.eval_batch_size % tcfg.dp:
                raise ValueError(
                    f"batch sizes ({tcfg.batch_size}/{tcfg.eval_batch_size}) "
                    f"must be divisible by dp={tcfg.dp}")
            # batch rows shard over "data" exactly like plain dp; the "seq"
            # axis only shards stack-internal activations (remat=True keeps
            # the relieved activations from being saved anyway)
            mesh = Mesh(np.array(devices[:n]).reshape(tcfg.dp, tcfg.sp),
                        ("data", "seq"))
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self.state = jax.device_put(self.state, NamedSharding(mesh, P()))
            forward_fn = make_sp_forward(self.model, mesh, remat=tcfg.remat)
        train_step = make_train_step(self.model, self.tx, cfg,
                                     forward_fn=forward_fn)
        if self._zero1_sh is not None:
            inner_step, state_sh = train_step, self._zero1_sh

            def train_step(state, batch):
                new_state, metrics = inner_step(state, batch)
                # pin the updated state to the ZeRO layout: moments stay
                # sharded across steps, params/step/rng stay replicated
                # (otherwise GSPMD is free to gather the moments back — or
                # to leave the params sharded, which evaluation and the
                # checkpoint paths do not expect)
                return jax.tree.map(jax.lax.with_sharding_constraint,
                                    new_state, state_sh), metrics
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        eval_step = make_eval_step(self.model, cfg, forward_fn=forward_fn)
        self._eval_step = jax.jit(lambda state, batch: eval_step(state.params, batch))
        self._eval_cache = None  # staged eval batches (eval set is static)

        if tcfg.cache_encoder and self.recipe.backbone_trains(cfg.stage):
            raise ValueError("cache_encoder requires a frozen backbone; "
                             f"method={cfg.method!r} stage {cfg.stage} "
                             "trains the encoder")
        if ((tcfg.cache_encoder or tcfg.cache_frontend)
                and not self.recipe.supports_cache):
            raise ValueError("frozen-forward caching is wired for the DACS "
                             f"model only (method={cfg.method!r})")
        single_device = (tcfg.dp == 1 and tcfg.tp == 1 and tcfg.pp == 1
                         and tcfg.sp == 1 and self.recipe.supports_cache)
        self._cache_encoder = (
            not self.recipe.backbone_trains(cfg.stage) and single_device
            if tcfg.cache_encoder is None
            else tcfg.cache_encoder and single_device)
        self._hidden = None       # train-set encoder-output cache arrays
        self._hidden_eval = None  # [(host Batch, HiddenBatch)] for evaluate()
        if self._cache_encoder:
            hstep = make_hidden_train_step(self.model, self.tx, cfg)
            self._hidden_step = jax.jit(
                lambda state, h, fl, lab, ll, dem, idx: hstep(
                    state, gather_hidden(h, fl, lab, ll, dem, idx)),
                donate_argnums=(0,))
            hes = make_hidden_eval_step(self.model, cfg)
            self._hidden_eval_step = jax.jit(
                lambda state, hb: hes(state.params, hb))
            self._encoder_fwd = jax.jit(backbone_forward_fn(self.model))
        # the frontend cache's "same value at any batch padding" invariant
        # needs every frontend op to be per-frame: true for "layer"
        # feat_extract_norm (causal conv windows + per-frame LN), FALSE for
        # "group" (wav2vec2-base, sew-d): GroupNorm in conv layer 0
        # normalizes each channel over the whole padded time axis, so its
        # output depends on the batch's total padded length
        frontend_cacheable = cfg.backbone.feat_extract_norm == "layer"
        if tcfg.cache_frontend and not frontend_cacheable:
            raise ValueError(
                "cache_frontend requires a padding-invariant conv frontend "
                "(feat_extract_norm='layer'); "
                f"{cfg.backbone.model_type!r} uses GroupNorm over the time "
                "axis, whose output depends on batch padding")
        self._cache_frontend = (
            cfg.stage == 0 and single_device and frontend_cacheable
            if tcfg.cache_frontend is None
            else tcfg.cache_frontend and single_device)
        if self._cache_encoder:
            self._cache_frontend = False  # the deeper cache subsumes it
        self._features = None  # train-set conv-frontend cache arrays
        if self._cache_frontend:
            fstep = make_feature_train_step(self.model, self.tx, cfg)

            def _fs(state, f, fl, lab, ll, dem, idx, t_b: int):
                fb = gather_features(f, fl, lab, ll, dem, idx)
                # crop the gathered rows to the batch's bucket length so the
                # encoder runs at full-forward shapes (static under jit)
                fb = dataclasses.replace(fb, features=fb.features[:, :t_b])
                return fstep(state, fb)

            self._feature_step = jax.jit(_fs, donate_argnums=(0,),
                                         static_argnums=(7,))
            self._frontend_fwd = jax.jit(frontend_forward_fn(self.model))

    # ---- frozen-encoder output caching (stages 1/2) ----

    def _build_train_cache(self):
        """Encoder outputs for every train utterance, computed once: the
        backbone is frozen and deterministic in stages 1/2, so this is a
        training-invariant constant (the federated engine does the same per
        run_rounds; here it holds for the whole train() call). Returns None
        when the cache would exceed cache_budget_bytes."""
        return self._build_cache(self._encoder_fwd, self.cfg.hidden_size,
                                 "cache_encoder")

    def _build_frontend_cache(self):
        """Conv-frontend outputs for every train utterance, computed once
        (stage-0 fast path): the feature extractor is frozen in every recipe
        and has no dropout, so this is a training-invariant constant.

        Built with every build batch's AUDIO padded to the global max: with
        feat_extract_norm="layer" (enforced in __init__) every frontend op
        is per-frame — conv frame i reads samples [i*s, i*s+k), LayerNorm
        normalizes over channels only — so the row holds, at every frame
        index, exactly what a full forward at ANY batch padding >= that
        frame would compute; the train loop can slice rows to each batch's
        own bucket length (see _train_batches) and reproduce the
        full-forward path exactly. ("group" frontends are rejected: their
        GroupNorm reduces over the time axis, breaking the invariant.)
        Returns None when the cache would exceed cache_budget_bytes."""
        return self._build_cache(self._frontend_fwd,
                                 self.cfg.backbone.conv_dim[-1],
                                 "cache_frontend", uniform_audio_pad=True)

    def _build_cache(self, fwd, width: int, tag: str,
                     uniform_audio_pad: bool = False):
        """Per-utterance [n+1, T', width] cache of a frozen deterministic
        forward (row n = scratch for batch-padding rows)."""
        from ..data.collate import _round_up
        from ..models.backbone import feat_extract_output_lengths

        bat = self.train_batcher
        exs = bat.examples
        n = len(exs)
        if n == 0:
            return None
        t_pad = _round_up(max(len(e.input_values) for e in exs), bat.time_multiple)
        t_frames = feat_extract_output_lengths(self.cfg.backbone, t_pad)
        dt = _DTYPES[self.tcfg.compute_dtype]
        if (n + 1) * t_frames * width * jnp.dtype(dt).itemsize > self.tcfg.cache_budget_bytes:
            print(f"[{tag}] train cache ({n}x{t_frames}x{width} {dt}) over "
                  "budget; falling back to full forward per step")
            return None
        cache = jnp.zeros((n + 1, t_frames, width), dt)
        fl_host = np.zeros((n + 1,), np.int32)
        l_max = _round_up(max(len(e.labels) for e in exs), bat.label_multiple)
        labels = np.full((n + 1, l_max), -100, np.int32)
        ll = np.zeros((n + 1,), np.int32)
        dem = np.zeros((n + 1,), np.int32)
        for i, e in enumerate(exs):
            labels[i, : len(e.labels)] = e.labels
            ll[i] = len(e.labels)
            dem[i] = e.dementia_label

        scatter = jax.jit(
            lambda c, h, rows: c.at[rows, : h.shape[1]].set(h),
            donate_argnums=(0,))
        for g, b in zip(bat.epoch_indices(0), bat.epoch(0)):
            iv = b.input_values
            if uniform_audio_pad and iv.shape[1] < t_pad:
                iv = np.pad(iv, ((0, 0), (0, t_pad - iv.shape[1])))
            h, fl = fwd(
                self.state.params, jnp.asarray(iv),
                jnp.asarray(b.input_lengths))
            idx = np.asarray(g)
            rows = jnp.asarray(np.where(idx >= 0, idx, n))
            cache = scatter(cache, h, rows)
            real = idx >= 0
            fl_host[idx[real]] = np.asarray(fl)[real]
        return (cache, jnp.asarray(fl_host), jnp.asarray(labels),
                jnp.asarray(ll), jnp.asarray(dem))

    def _build_eval_cache_hidden(self):
        """(host Batch, HiddenBatch) pairs for the static eval set — eval
        becomes head-only once the encoder outputs are cached."""
        out = []
        for b in self.eval_batcher.epoch(epoch_seed=0):
            h, fl = self._encoder_fwd(
                self.state.params, jnp.asarray(b.input_values),
                jnp.asarray(b.input_lengths))
            out.append((b, HiddenBatch(
                hidden_states=h, frame_lengths=fl,
                labels=jnp.asarray(b.labels),
                label_lengths=jnp.asarray(b.label_lengths),
                dementia_labels=jnp.asarray(b.dementia_labels),
                sample_mask=jnp.asarray(b.sample_mask))))
        return out

    # ---- host loops ----

    def _resume(self, where: str) -> None:
        """Resume full train state (params + optimizer moments + step + rng)
        from a checkpoint (the reference's ``trainer.train(checkpoint)``,
        options.py --checkpoint)."""
        import dataclasses as _dc

        from .checkpoint import load_params

        template = self._state_tree()
        if where == "auto":
            assert self.ckpt is not None, "resume_from='auto' needs save_dir"
            step = self.ckpt.latest_step()
            if step is None:
                return
            tree = self.ckpt.restore(step, template=template)
        else:
            try:
                tree = CheckpointManager(
                    str(Path(where).parent)).restore(Path(where).name,
                                                     template=template)
            except Exception as e:
                # params-only export (a "final" dir), or a full checkpoint
                # whose opt_state layout no longer matches (e.g. saved
                # before an optimizer-structure change) — say so: optimizer
                # moments / step / rng restart from scratch in that case
                print(f"[resume] full-state restore failed ({type(e).__name__}); "
                      f"falling back to params-only load from {where} — "
                      "optimizer state, step count and rng are reinitialized")
                tree = load_params(where)
        if isinstance(tree, dict) and "opt_state" in tree:  # full state
            self.state = DACSTrainState(
                step=jnp.asarray(tree["step"]), params=tree["params"],
                opt_state=tree["opt_state"], rng=jnp.asarray(tree["rng"]))
        else:  # params-only export (e.g. a "final" dir)
            self.state = _dc.replace(self.state, params=tree)
        print(f"[resume] restored train state from {where} "
              f"(step {int(self.state.step)})")

    def _state_tree(self):
        return jax.device_get({
            "step": self.state.step, "params": self.state.params,
            "opt_state": self.state.opt_state, "rng": self.state.rng})

    def evaluate(self) -> dict:
        assert self.eval_batcher is not None
        if self._cache_encoder:
            if self._hidden_eval is None:
                self._hidden_eval = self._build_eval_cache_hidden()
            batches, step = self._hidden_eval, self._hidden_eval_step
        else:
            if self._eval_cache is None:
                # the eval set and its batching (epoch_seed=0) are static:
                # stage to device once, reuse every evaluation (in FL, every
                # round)
                self._eval_cache = list(prefetch_device_batches(
                    self.eval_batcher.epoch(epoch_seed=0), self.tcfg.prefetch,
                    self._batch_sharding))
            batches, step = self._eval_cache, self._eval_step
        refs, hyps, losses = [], [], []
        ad_correct = ad_total = 0
        for b, db in batches:
            loss, pred_ids, ad_pred = step(self.state, db)
            pred_ids = np.asarray(pred_ids)
            ad_pred = np.asarray(ad_pred)
            losses.append(float(loss))
            for i in range(len(b.paths)):  # only real rows have paths
                label_ids = b.labels[i][b.labels[i] >= 0]
                refs.append(self.tokenizer.decode(label_ids, group_tokens=False))
                hyps.append(self.tokenizer.decode(pred_ids[i]))
                ad_correct += int(ad_pred[i] == b.dementia_labels[i])
                ad_total += 1
        return {
            "eval_loss": float(np.mean(losses)),
            "eval_wer": wer(refs, hyps),
            "eval_ad_acc": ad_correct / max(ad_total, 1),
        }

    def _train_batches(self, epoch: int):
        """Yield (n_real_utts, step_fn_args) per batch — either full-forward
        device batches or cached-encoder index gathers."""
        t = self.tcfg
        if self._cache_encoder:
            if self._hidden is None:
                self._hidden = self._build_train_cache() or False  # False = over budget
            if self._hidden:
                h, fl, lab, ll, dem = self._hidden
                for g in self.train_batcher.epoch_indices(t.seed + epoch):
                    idx = np.asarray(g, np.int32)
                    yield int((idx >= 0).sum()), (
                        self._hidden_step, (h, fl, lab, ll, dem, jnp.asarray(idx)))
                return
        if self._cache_frontend:
            if self._features is None:
                self._features = self._build_frontend_cache() or False
            if self._features:
                from ..data.collate import _round_up
                from ..models.backbone import feat_extract_output_lengths

                f, fl, lab, ll, dem = self._features
                exs = self.train_batcher.examples
                for g in self.train_batcher.epoch_indices(t.seed + epoch):
                    idx = np.asarray(g, np.int32)
                    # run the step at this batch's own bucket length: the
                    # pos-conv stack is NOT padding-invariant (its deeper
                    # layers see the nonzero layer-1 outputs past the valid
                    # region), so the encoder must see the same shapes as
                    # the full-forward path / evaluation
                    t_b = feat_extract_output_lengths(
                        self.cfg.backbone,
                        _round_up(max(len(exs[i].input_values)
                                      for i in idx if i >= 0),
                                  self.train_batcher.time_multiple))
                    yield int((idx >= 0).sum()), (
                        self._feature_step,
                        (f, fl, lab, ll, dem, jnp.asarray(idx), int(t_b)))
                return
        for b, db in prefetch_device_batches(
                self.train_batcher.epoch(epoch_seed=t.seed + epoch),
                t.prefetch, self._batch_sharding):
            yield int(b.sample_mask.sum()), (self._train_step, (db,))

    def train(self) -> DACSTrainState:
        t = self.tcfg
        timer = StepTimer()
        step = int(self.state.step)
        for epoch in range(t.num_epochs):
            for n_real, (step_fn, fn_args) in self._train_batches(epoch):
                self.state, metrics = step_fn(self.state, *fn_args)
                step += 1
                timer.update(n_real)
                if step % t.logging_steps == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host.update({"step": step, "epoch": epoch + 1})
                    self.logger.log(host)
                if self.eval_batcher is not None and step % t.eval_steps == 0:
                    ev = self.evaluate()
                    ev["step"] = step
                    ev["epoch"] = epoch + 1
                    self.logger.log(ev)
                if self.ckpt is not None and step % t.save_steps == 0:
                    # full train state (params + moments + rng) -> exact resume
                    self.ckpt.save(self._state_tree(), step,
                                   metadata={"stage": self.cfg.stage})
        summary = timer.summary()
        summary["step"] = step
        self.logger.log(summary)
        if self.ckpt is not None:
            final = jax.device_get(self.state.params)
            if self.tcfg.scan_layers:
                # export in the portable per-layer layout so extraction /
                # evaluation (unrolled models) consume it directly
                from ..models.port import unstack_scan_layers

                if "layers_scan" in final["backbone"]["encoder"]:
                    final = dict(final)
                    final["backbone"] = unstack_scan_layers(final["backbone"])
            self.ckpt.save_final(final, metadata={"stage": self.cfg.stage})
        if t.save_dir is not None:
            # third sink: TensorBoard scalars, reference record_result
            # (federated/src/update.py:398-411)
            record_result(self.logger.history, t.save_dir)
        return self.state
