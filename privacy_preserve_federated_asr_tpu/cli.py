"""Command-line interface — the reference's script surface as subcommands.

Reference script -> subcommand map:
  centralized/finetune_ASRs.py, trainer_data2vec_2st.py  -> ``train``
  federated/src/federated_main.py (options.py flags)     -> ``federated``
  centralized/eval_toggle_GS.py & friends                -> ``extract``
  centralized/detail_wer.py                              -> ``detail-wer``
  centralized/pred_AD_svm.py                             -> ``svm``
  centralized/feat_scoring.py                            -> ``feat-scoring``

Flag names follow federated/src/options.py (--STAGE, --AD_loss, --GS_TAU,
--W_LOSS, --TOGGLE_RATIO, --LAMBDA, --epochs, --num_users, --frac,
--local_ep, --global_ep, ...) so reference users can carry their invocation
lines over.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

BACKBONES = {
    "data2vec": "data2vec_audio_large",
    "data2vec-base": "data2vec_audio_base",
    "wav2vec2": "wav2vec2_large_960h_lv60",
    "wav2vec2-base": "wav2vec2_base_960h",
    "hubert": "hubert_large_ls960",
    "sewd": "sew_d_mid",
    "unispeech": "unispeech_sat_large",
    "tiny": "tiny_for_tests",  # smoke tests
}


def _backbone_cfg(name: str):
    from .models import BackboneConfig

    return getattr(BackboneConfig, BACKBONES[name])()


def _dacs_cfg(args):
    import dataclasses

    from .models import DACSConfig

    backbone = _backbone_cfg(args.model_type)
    if getattr(args, "int8", False):
        backbone = dataclasses.replace(backbone, dense_impl="int8_train")
    return DACSConfig(
        backbone=backbone,
        method=getattr(args, "method", "dacs"),
        stage=args.STAGE,
        lambda_grl=args.LAMBDA,
        gs_tau=args.GS_TAU,
        toggle_ratio=args.TOGGLE_RATIO,
        ad_loss=args.AD_loss,
        w_loss=tuple(args.W_LOSS) if args.W_LOSS else (0.1, 0.9),
        num_lms=args.num_lms,
        grl_reverse=bool(getattr(args, "GRL", False)),
    )


def load_params(cfg, model_in: str | None, seed: int = 0):
    """Load initial params: an orbax export from this framework, an HF torch
    checkpoint directory/file (ported), or random init."""
    import jax

    from .train.train_state import init_dacs_params

    params = init_dacs_params(cfg, jax.random.PRNGKey(seed))
    if not model_in:
        print("[init] random init (no --model_in given)")
        return params
    p = Path(model_in)
    if (p / "_CHECKPOINT_METADATA").exists() or (p / "manifest.ocdbt").exists() \
            or (p / "metadata.json").exists():
        from .train.checkpoint import load_params as orbax_load

        print(f"[init] orbax params from {p}")
        return orbax_load(str(p))
    # torch checkpoint (file or HF-style dir)
    from .models.port import port_dacs_heads, port_hf_state_dict

    bin_path = p
    if p.is_dir():
        for cand in ("pytorch_model.bin", "model.safetensors"):
            if (p / cand).exists():
                bin_path = p / cand
                break
    print(f"[init] porting torch checkpoint {bin_path}")
    if str(bin_path).endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(str(bin_path))
    else:
        import torch

        sd = torch.load(str(bin_path), map_location="cpu", weights_only=True)
    params["backbone"] = port_hf_state_dict(sd, cfg.backbone)
    _graft_matching_heads(params, port_dacs_heads(sd))
    return params


def _graft_matching_heads(params: dict, ported: dict) -> dict:
    """Graft ported head subtrees into ``params`` in place — only heads this
    method's model actually has, and only at matching shapes (variant
    recipes share the backbone but carry different heads — e.g.
    single-toggle's arbitrator is D->2D while a DACS checkpoint's is D->4D;
    a key-only match would graft a wrong-shaped kernel that explodes inside
    jit)."""
    import jax

    shapes = lambda t: jax.tree.map(lambda a: tuple(a.shape), t)
    for k, v in ported.items():
        if k not in params:
            continue
        if shapes(v) == shapes(params[k]):
            params[k] = v
        else:
            # loud skip: a silently-dropped head leaves its random init in
            # place and the run emits garbage with exit code 0
            print(f"[load] WARNING: checkpoint head '{k}' shape "
                  f"{shapes(v)} != model's {shapes(params[k])} — "
                  f"skipped (wrong --method or vocab for this checkpoint?)")
    return params


def _load_examples(args, csv_path, with_transcript=True):
    from .data.dataset import csv_to_examples, load_spk2label, prepare_examples
    from .data.tokenizer import CTCCharTokenizer

    tok = CTCCharTokenizer()
    spk2label = load_spk2label(args.spk2label) if args.spk2label else {}
    exs = csv_to_examples(args.audio_dir, csv_path, spk2label,
                          with_transcript=with_transcript,
                          cache_dir=args.dataset_cache)
    return prepare_examples(exs, tok), tok


def _add_common(p):
    p.add_argument("--model_type", default="data2vec", choices=sorted(BACKBONES))
    p.add_argument("--method", default="dacs",
                   choices=["dacs", "toggle_more", "grl", "single_toggle",
                            "fsm"],
                   help="method family (reference: trainer_data2vec_2st.py / "
                        "functions/OtherMdls_Toggle_more.py / "
                        "trainer_data2vec.py GRL / trainer_data2vec_toggle.py "
                        "/ trainer_data2vec_5st.py)")
    p.add_argument("-GRL", "--GRL", action="store_true", default=False,
                   help="method=grl: gradient-reversed AD CE (reference "
                        "trainer_data2vec.py:106 --GRL / REVERSE flag, "
                        "default off there too); omit for the plain "
                        "multi-task AD CE baseline")
    p.add_argument("-model_in", "--model_in_path", default=None)
    p.add_argument("-model_out", "--model_out_path", default="./saves/model")
    p.add_argument("-log", "--log_path", default="train.txt")
    p.add_argument("-st", "--STAGE", type=int, default=0)
    p.add_argument("-lam", "--LAMBDA", type=float, default=0.5)
    p.add_argument("-gs_tau", "--GS_TAU", type=float, default=1.0)
    p.add_argument("-toggle_rt", "--TOGGLE_RATIO", type=float, default=0.0)
    p.add_argument("-ad_loss", "--AD_loss", default="cel")
    p.add_argument("-w_loss", "--W_LOSS", type=float, nargs="+", default=None)
    p.add_argument("--num_lms", type=int, default=1)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("-lr", "--learning_rate", type=float, default=None)
    p.add_argument("--eval_steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "int8"],
                   help="int8 (dynamic-W8A8 quantized matmuls, ops/quant.py)"
                        " applies to the inference surfaces only "
                        "(extract/serve); training is fp32/bf16")
    p.add_argument("--int8", action="store_true",
                   help="int8-quantized TRAINING matmuls (dense_impl="
                        "'int8_train': W8A8 forward + SwitchBack custom-VJP "
                        "gradients on the MXU's double-rate s8 path) — "
                        "opt-in, a semantics change vs the reference")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--scan_layers", action="store_true",
                   help="compile one encoder layer scanned over N "
                        "(~num_layers x faster first compile, same math)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel chips: batch sharded over a 'data' "
                        "mesh axis, params replicated (GSPMD all-reduce)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1 with --dp: shard the fp32 Adam moments "
                        "over the 'data' axis (parallel/zero.py) — "
                        "reduce-scatter grads + all-gather updates; frees "
                        "~2x param bytes of HBM per chip")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch gradients SUMMED per optimizer update "
                        "(optax.MultiSteps, use_grad_mean=False — exact "
                        "k x batch_size equivalence under the sum-reduction "
                        "CTC loss) at batch_size activation memory; note "
                        "logging/eval/save cadences and checkpoint step "
                        "numbers stay in micro-steps")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel chips: encoder matmuls "
                        "Megatron-sharded over a 'model' mesh axis "
                        "(parallel/tp.py; for backbones beyond one chip)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages: encoder layer stack GPipe-"
                        "pipelined over a 'pipe' mesh axis (parallel/pp.py; "
                        "needs --scan_layers; for backbones too deep for "
                        "one chip)")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="GPipe microbatches per batch (default = --pp; "
                        "more microbatches = smaller pipeline bubble)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel chips: stack activations' time "
                        "axis sharded over a 'seq' mesh axis "
                        "(parallel/sp.py; needs --scan_layers; for long-T "
                        "inputs whose activations exceed one chip)")
    # the reference's path.sh exports DACS_dataRoot/DACS_codeRoot and
    # scripts read them at import (federated/src/utils.py:22-23,53) —
    # honored here as CLI defaults
    dacs_data = os.environ.get("DACS_dataRoot", "./data")
    dacs_code = os.environ.get("DACS_codeRoot", ".")
    p.add_argument("--audio_dir", default=f"{dacs_data}/clips")
    p.add_argument("--train_csv", default=f"{dacs_data}/mid_csv/train.csv")
    p.add_argument("--test_csv", default=f"{dacs_data}/mid_csv/test.csv")
    p.add_argument("--spk2label", default=f"{dacs_code}/meta-data/test_dic.npy")
    p.add_argument("--dataset_cache", default="./dataset_cache")
    p.add_argument("-ckpt", "--checkpoint", default=None)
    p.add_argument("--no_fast_rng", action="store_true",
                   help="keep the threefry PRNG (slower dropout mask gen)")
    p.add_argument("--no_cache_encoder", action="store_true",
                   help="disable the frozen-backbone encoder-output cache "
                        "(stages 1/2 default to training heads on cached "
                        "encoder outputs — same numerics class, ~10x faster)")
    p.add_argument("--no_cache_frontend", action="store_true",
                   help="disable the frozen conv-frontend output cache "
                        "(stage 0 defaults to training on cached conv "
                        "features — identical numerics, skips the conv fwd)")


def _maybe_fast_rng(args):
    if not getattr(args, "no_fast_rng", False):
        from .utils import enable_tpu_fast_rng

        enable_tpu_fast_rng()


def cmd_train(args):
    from .train.trainer import Trainer, TrainerConfig

    _maybe_fast_rng(args)

    cfg = _dacs_cfg(args)
    train_exs, tok = _load_examples(args, args.train_csv)
    test_exs, _ = _load_examples(args, args.test_csv)
    params = load_params(cfg, args.model_in_path, args.seed)
    tr = Trainer(cfg, params, train_exs, test_exs, tok, TrainerConfig(
        num_epochs=args.epochs, batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size, learning_rate=args.learning_rate,
        eval_steps=args.eval_steps, seed=args.seed,
        compute_dtype=args.compute_dtype, remat=args.remat,
        scan_layers=args.scan_layers, dp=args.dp, tp=args.tp,
        pp=args.pp, pp_microbatches=args.pp_microbatches, sp=args.sp,
        zero1=args.zero1, grad_accum=args.grad_accum,
        cache_encoder=False if args.no_cache_encoder else None,
        cache_frontend=False if args.no_cache_frontend else None,
        log_file=args.log_path, save_dir=args.model_out_path,
        resume_from=args.checkpoint))
    tr.train()
    print(json.dumps(tr.evaluate()))


def cmd_federated(args):
    import jax

    _maybe_fast_rng(args)
    if args.scan_layers or args.dp > 1 or args.tp > 1:
        print("[federated] note: --scan_layers/--dp/--tp apply to `train`/`sweep` "
              "only; FL parallelism is the engine's (client, data) mesh "
              "(FederatedConfig.mesh)")

    from .data.splits import CLIENT_SPLITS_ADRESS, filter_by_speakers
    from .federated import FederatedConfig, FederatedEngine
    from .train.checkpoint import save_params

    mesh = None
    if args.client_mesh > 1 or args.data_mesh > 1 or args.model_mesh > 1:
        from .parallel import make_mesh, make_multislice_mesh

        if args.num_slices:
            if args.model_mesh > 1:
                raise SystemExit(
                    "--model_mesh is not supported with --num_slices "
                    "(TP collectives must ride ICI; lay TP out per slice)")
            mesh = make_multislice_mesh(client=args.client_mesh,
                                        data=args.data_mesh,
                                        num_slices=args.num_slices)
        else:
            mesh = make_mesh(client=args.client_mesh, data=args.data_mesh,
                             model=args.model_mesh)
        print(f"[federated] device mesh: client={args.client_mesh} x "
              f"data={args.data_mesh}"
              + (f" x model={args.model_mesh}" if args.model_mesh > 1 else "")
              + (f" over {args.num_slices} slices" if args.num_slices else ""))

    cfg = _dacs_cfg(args)
    train_exs, tok = _load_examples(args, args.train_csv)
    test_exs, _ = _load_examples(args, args.test_csv)
    # global params are always single-head; lm_heads_* (num_lms > 1) are
    # per-client scratch created inside the multitask round
    params = load_params(cfg.replace(num_lms=1), args.model_in_path, args.seed)

    clients = {cid: filter_by_speakers(train_exs, CLIENT_SPLITS_ADRESS.get(cid, ()))
               for cid in range(args.num_users)}
    # unsupervised (unlabeled / teacher-transcribed) per-client data for
    # supervised_level < 1 (reference: ADReSSo, federated_main.py:279-296)
    unsup_clients = None
    if args.supervised_level < 1.0:
        assert args.unsup_train_csv, "--supervised_level < 1 needs --unsup_train_csv"
        from .data.splits import CLIENT_SPLITS_ADRESSO

        unsup_exs, _ = _load_examples(args, args.unsup_train_csv)
        unsup_clients = {
            cid: filter_by_speakers(unsup_exs, CLIENT_SPLITS_ADRESSO.get(cid, ()))
            for cid in range(args.num_users)}
        if any(len(v) == 0 for v in unsup_clients.values()):
            speakers = sorted({e.path.split("_")[0] for e in unsup_exs})
            unsup_clients = {
                cid: filter_by_speakers(unsup_exs, speakers[cid::args.num_users])
                for cid in range(args.num_users)}
    public = filter_by_speakers(train_exs, CLIENT_SPLITS_ADRESS["public"])
    if any(len(v) == 0 for v in clients.values()) or len(public) == 0:
        # dataset doesn't use the ADReSS speaker ids: partition the
        # available speakers round-robin instead (public = all)
        print("[federated] ADReSS speaker splits empty for this dataset; "
              "partitioning speakers round-robin across clients")
        speakers = sorted({e.path.split("_")[0] for e in train_exs})
        clients = {
            cid: filter_by_speakers(train_exs, speakers[cid::args.num_users])
            for cid in range(args.num_users)
        }
        public = train_exs
    fcfg = FederatedConfig(
        num_rounds=args.epochs, num_clients=args.num_users, frac=args.frac,
        local_ep=args.local_ep, global_ep=args.global_ep,
        batch_size=args.train_batch_size, eval_batch_size=args.eval_batch_size,
        seed=args.seed, learning_rate=args.learning_rate,
        compute_dtype=args.compute_dtype, remat=args.remat,
        log_file=args.log_path, supervised_level=args.supervised_level,
        cache_encoder=False if args.no_cache_encoder else None,
        dp_clip_norm=args.dp_clip_norm,
        dp_noise_multiplier=args.dp_noise_multiplier,
        dp_delta=args.dp_delta,
        compress_bits=args.compress_bits,
        secagg_clip_norm=args.secagg_clip_norm,
        secagg_bits=args.secagg_bits,
        topk_fraction=args.topk_fraction,
        fedprox_mu=args.fedprox_mu,
        server_optimizer=args.server_optimizer,
        server_lr=args.server_lr, server_momentum=args.server_momentum,
        round_save_dir=args.round_save_dir, mesh=mesh,
        zero1=args.fl_zero1, tp=args.model_mesh > 1)
    eng = FederatedEngine(cfg, fcfg, clients, public, test_exs, tok, params,
                          client_unsup_examples=unsup_clients)

    out = Path(args.model_out_path)
    if args.FL_STAGE in (1, 0):
        eng.run_stage1()
        save_params(str(out) + "_FLASR_global/final", eng.global_params,
                    {"fl_stage": 1})
    if args.FL_STAGE in (2, 0):
        eng.run_stage2()
        save_params(str(out) + "_FLAD_global/final", eng.global_params,
                    {"fl_stage": 2})
    if args.FL_STAGE in (3, 0):
        eng.run_stage3()
        save_params(str(out) + "_final_global/final", eng.global_params,
                    {"fl_stage": 3})
    print(json.dumps(eng.evaluate(stage=min(max(args.FL_STAGE - 1, 0), 2))))


def _fit_shallow_fusion_lm(args, tok, cfg):
    """Char-bigram LM for beam-search shallow fusion, fitted on the
    transcripts CSV — shared by cmd_extract and cmd_serve. None when beam
    decoding or the LM CSV is not requested."""
    if not (args.beam_size > 0 and args.lm_train_csv):
        return None
    import csv as _csv

    from .ops.beam import CharBigramLM

    with open(args.lm_train_csv, newline="") as f:
        seqs = [tok.encode(row["sentence"].upper())
                for row in _csv.DictReader(f) if row.get("sentence")]
    return CharBigramLM(cfg.backbone.vocab_size).fit(seqs)


def cmd_extract(args):
    from .evaluation import extract_embeddings, rows_to_pickle, write_results_csv

    cfg = _dacs_cfg(args)
    params = load_params(cfg, args.model_in_path, args.seed)
    out_dir = Path(args.csv_out_dir)
    mesh = None
    if args.dp > 1:  # reference: torch DataParallel eval (--GPU_batchsize)
        from .parallel import make_mesh

        mesh = make_mesh(client=1, data=args.dp)
    lm_fn = None
    for split, csv_path in (("", args.test_csv), ("_train", args.train_csv)):
        exs, tok = _load_examples(args, csv_path)
        if lm_fn is None:
            lm_fn = _fit_shallow_fusion_lm(args, tok, cfg)
        rows = extract_embeddings(cfg, params, exs, tok,
                                  batch_size=args.eval_batch_size,
                                  compute_dtype=args.compute_dtype,
                                  beam_size=args.beam_size, lm_fn=lm_fn,
                                  lm_alpha=args.lm_alpha,
                                  lm_beta=args.lm_beta, mesh=mesh)
        rows_to_pickle(rows, str(out_dir / f"{args.csv_name}{split}.pkl"))
        if split == "":  # the reference writes Result.csv for the test set
            write_results_csv(rows, str(out_dir))
        print(f"[extract] wrote {len(rows)} rows -> {out_dir}/{args.csv_name}{split}.pkl")


def cmd_serve(args):
    from .data.tokenizer import CTCCharTokenizer
    from .serving import InferenceEngine, ServingConfig, serve_forever

    _maybe_fast_rng(args)
    cfg = _dacs_cfg(args)
    params = load_params(cfg, args.model_in_path, args.seed)
    tok = CTCCharTokenizer()
    lm_fn = _fit_shallow_fusion_lm(args, tok, cfg)
    engine = InferenceEngine(
        cfg, params, tok,
        ServingConfig(batch_size=args.eval_batch_size,
                      max_seconds=args.max_seconds,
                      batch_window_ms=args.batch_window_ms,
                      compute_dtype=args.compute_dtype,
                      beam_size=args.beam_size, lm_alpha=args.lm_alpha,
                      lm_beta=args.lm_beta, transport=args.transport),
        lm_fn=lm_fn)
    serve_forever(engine, host=args.host, port=args.port,
                  warmup=not args.no_warmup, use_hub=not args.no_hub)


def cmd_stream_client(args):
    """Reference streaming client for the HTTP server: chunk a WAV (or
    synthetic audio) and feed it to ``/stream/*`` with the binary PCM
    transport (PERF.md §6 — 3.4x fleet throughput vs JSON), printing each
    partial and the final result as JSON lines."""
    import urllib.request

    import numpy as np

    from .data.audio import load_audio

    if args.audio:
        wave = load_audio(args.audio, target_sr=16000,
                          normalize=False).astype(np.float32)
    else:  # synthetic smoke input
        wave = np.random.default_rng(args.seed).normal(
            0, 0.3, size=int(args.synthetic_seconds * 16000)).astype(np.float32)
    chunk = max(int(args.chunk_seconds * 16000), 1)
    base = f"http://{args.host}:{args.port}"

    def post(path, body=b"{}", binary=False):
        req = urllib.request.Request(
            base + path, data=body,
            headers={"Content-Type": "application/octet-stream" if binary
                     else "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=args.timeout) as r:
            return json.loads(r.read())

    sid = post("/stream/start")["session"]
    for i in range(0, len(wave), chunk):
        piece = wave[i : i + chunk]
        if args.json_transport:
            body, binary = json.dumps({"audio": piece.tolist()}).encode(), False
        else:
            body, binary = piece.astype("<f4").tobytes(), True
        r = post(f"/stream/{sid}", body, binary=binary)
        print(json.dumps({"partial": r["transcript"],
                          "final_frames": r["final_frames"],
                          "total_frames": r["total_frames"]}), flush=True)
    print(json.dumps(post(f"/stream/{sid}/finish")), flush=True)


def cmd_stream_report(args):
    """Measure streaming finalization stability on real audio so the
    deployment can choose ``right_context_seconds`` from data (the flip
    rate of early-finalized frames vs the full-context decode)."""
    from .data.tokenizer import CTCCharTokenizer
    from .serving import InferenceEngine, ServingConfig, measure_finalization_flips

    _maybe_fast_rng(args)
    cfg = _dacs_cfg(args)
    params = load_params(cfg, args.model_in_path, args.seed)
    exs, tok = _load_examples(args, args.test_csv)
    if args.max_utts:
        exs = exs[: args.max_utts]
    engine = InferenceEngine(
        cfg, params, CTCCharTokenizer(),
        ServingConfig(batch_size=args.eval_batch_size,
                      max_seconds=args.max_seconds,
                      compute_dtype=args.compute_dtype))
    rows = measure_finalization_flips(
        engine, [e.array for e in exs],
        right_context_grid=tuple(args.right_context_grid),
        hop_seconds=args.hop_seconds)
    for r in rows:
        print(json.dumps(r))


def cmd_detail_wer(args):
    from .evaluation import detailed_wer_report

    with open(args.pkl, "rb") as f:
        df = pickle.load(f)
    rows = df.to_dict("records")
    id2mmse = None
    if args.id2mmse:
        id2mmse = np.load(args.id2mmse, allow_pickle=True).tolist()
    rep = detailed_wer_report(rows, level=args.type, id2mmse=id2mmse,
                              out_dir=args.out_dir)
    print(json.dumps(rep, indent=2))


def cmd_svm(args):
    from .data.dataset import load_spk2label
    from .evaluation import predict_ad_svm

    with open(args.train_pkl, "rb") as f:
        train_rows = pickle.load(f).to_dict("records")
    with open(args.test_pkl, "rb") as f:
        test_rows = pickle.load(f).to_dict("records")
    text_train = text_test = None
    if args.text_train_pkl:
        import pandas as pd

        t1 = pd.read_pickle(args.text_train_pkl)
        t2 = pd.read_pickle(args.text_test_pkl)
        text_train = dict(zip(t1["session"], t1["Embedding"]))
        text_test = dict(zip(t2["session"], t2["Embedding"]))
    m = predict_ad_svm(
        train_rows, test_rows, load_spk2label(args.spk2label),
        pooling=args.squeeze, masked=args.masked, mode=args.mode,
        text_embeddings_train=text_train, text_embeddings_test=text_test,
        par_only=not args.INV, results_csv=args.results_csv, title=args.title)
    print(json.dumps(m))


def _load_bert_assets(args):
    """Ported HF BERT checkpoint (--bert_checkpoint + --vocab) ->
    (flax params, BertConfigT, WordPieceTokenizer)."""
    import torch

    from .text.bert import BertConfigT, WordPieceTokenizer, port_hf_bert

    sd = torch.load(args.bert_checkpoint, map_location="cpu", weights_only=True)
    n_layers = max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")) + 1
    hidden = sd["embeddings.word_embeddings.weight"].shape[1]
    # geometry not derivable from the state dict: prefer the HF config.json
    # sitting next to the checkpoint, else the standard head_dim=64 rule
    heads, cfg_json = None, Path(args.bert_checkpoint).parent / "config.json"
    if cfg_json.exists():
        with open(cfg_json) as f:
            hf_cfg = json.load(f)
        heads = hf_cfg.get("num_attention_heads")
    if heads is None:
        heads = (hidden // 64 if hidden % 64 == 0 and hidden >= 64
                 else max(h for h in (8, 4, 2, 1) if hidden % h == 0))
    bcfg = BertConfigT(
        vocab_size=sd["embeddings.word_embeddings.weight"].shape[0],
        hidden_size=hidden,
        num_hidden_layers=n_layers,
        num_attention_heads=heads,
        intermediate_size=sd["encoder.layer.0.intermediate.dense.weight"].shape[0],
        max_position_embeddings=sd["embeddings.position_embeddings.weight"].shape[0])
    params = port_hf_bert(sd, bcfg)
    tok = WordPieceTokenizer.from_vocab_file(args.vocab)
    return params, bcfg, tok


def _build_bert_embed(args):
    """Ported HF BERT checkpoint -> a texts -> [B, hidden]
    pooled-embedding callable (+ its width)."""
    from .text.bert import BertEncoder
    from .text.classifier import embed_sessions

    params, bcfg, tok = _load_bert_assets(args)
    enc = BertEncoder(bcfg)

    def embed(texts):
        return embed_sessions(
            lambda ids, mask: enc.apply({"params": params}, ids, mask)[1],
            tok, texts)

    return embed, bcfg.hidden_size


def cmd_text(args):
    """Text-branch AD classification over session documents assembled from
    an extraction pkl (reference 0207_DM_* experiment scripts).

    Embeddings: a ported HF BERT checkpoint (--bert_checkpoint + --vocab),
    or a hash-based bag-of-words fallback so the pipeline runs standalone.
    """
    import numpy as np

    from .text import assemble_sessions
    from .text.classifier import TextClassifierConfig, TextTrainer, TextTrainerConfig

    def load_rows(pkl):
        with open(pkl, "rb") as f:
            df = pickle.load(f)
        rows = df.to_dict("records")
        for r in rows:
            r.setdefault("text", r.get("pred_str"))
        return rows

    train_rows, test_rows = load_rows(args.train_pkl), load_rows(args.test_pkl)

    if args.experiment:  # named 0207_DM_* registry experiment
        from .text.classifier import TextTrainerConfig as _TTC
        from .text.experiments import EXPERIMENTS, run_experiment

        backends, ft_kw = None, {}
        if args.finetune:
            from .text.finetune import FinetuneTrainerConfig

            ft_kw = {"finetune": True, "ftcfg": FinetuneTrainerConfig(
                num_epochs=args.epochs, batch_size=args.train_batch_size,
                learning_rate=args.learning_rate or 2e-5,
                lr_schedule=args.lr_schedule, seed=args.seed,
                max_length=args.max_length, dp=args.dp)}
            if args.bert_checkpoint:
                # fine-tune INTO the ported checkpoint (the reference
                # setup: pretrained encoder + AdamW over everything)
                params, bcfg, tok = _load_bert_assets(args)
                ft_kw.update(bert_cfg=bcfg, tokenizer=tok,
                             encoder_params=params)
        elif args.bert_checkpoint:
            # frozen fast path: the ported checkpoint serves every TEXT
            # backend in the spec as a fixed embedder
            from .text.experiments import TEXT_BACKENDS

            embed, _ = _build_bert_embed(args)
            spec = EXPERIMENTS[args.experiment]
            backends = {i.backend: embed for i in spec.inputs
                        if i.backend in TEXT_BACKENDS}
        out = run_experiment(
            args.experiment, train_rows, test_rows, backends=backends,
            audio_root=args.audio_root,
            tcfg=_TTC(num_epochs=args.epochs,
                      batch_size=args.train_batch_size,
                      learning_rate=args.learning_rate or 1e-3,
                      lr_schedule=args.lr_schedule, seed=args.seed),
            seeds=tuple(range(args.seed, args.seed + 3)), **ft_kw)
        print(json.dumps({"experiment": args.experiment, **out}))
        return

    text_key = args.use_text  # 'text' (ground truth) or 'pred_str' (ASR)
    docs_train = assemble_sessions(train_rows, text_key=text_key)
    docs_test = assemble_sessions(test_rows, text_key=text_key)

    def labels_of(rows):
        out = {}
        for r in rows:
            out[r["path"].split("_")[0]] = int(r["dementia_labels"])
        return out

    y_train_map, y_test_map = labels_of(train_rows), labels_of(test_rows)

    sessions_train_ft = sorted(docs_train)
    sessions_test_ft = sorted(docs_test)
    if args.finetune:
        # end-to-end: the encoder trains inside the graph (reference
        # SingleForwardModel; AdamW over all params)
        import numpy as _np

        from .text.bert import BertConfigT, WordPieceTokenizer
        from .text.finetune import (
            FinetuneConfig,
            FinetuneTextTrainer,
            FinetuneTrainerConfig,
        )

        enc_params = None
        if args.bert_checkpoint:
            enc_params, bcfg, tok = _load_bert_assets(args)
        else:
            corpus = [docs_train[s] for s in sessions_train_ft]
            tok = WordPieceTokenizer.from_corpus(corpus)
            bcfg = BertConfigT(
                vocab_size=max(len(tok.vocab), 8), hidden_size=128,
                num_hidden_layers=4, num_attention_heads=4,
                intermediate_size=256,
                max_position_embeddings=args.max_length)
        tr = FinetuneTextTrainer(
            FinetuneConfig(bert=bcfg), tok,
            FinetuneTrainerConfig(
                num_epochs=args.epochs, batch_size=args.train_batch_size,
                learning_rate=args.learning_rate or 2e-5,
                lr_schedule=args.lr_schedule, seed=args.seed,
                max_length=args.max_length, dp=args.dp))
        xtr = [docs_train[s] for s in sessions_train_ft]
        xte = [docs_test[s] for s in sessions_test_ft]
        ytr = _np.asarray([y_train_map[s] for s in sessions_train_ft],
                          dtype=_np.int32)
        yte = _np.asarray([y_test_map[s] for s in sessions_test_ft],
                          dtype=_np.int32)
        tr.fit([xtr], ytr, val_texts_per_input=[xte], val_labels=yte,
               encoder_params=enc_params)
        out = {f"test_{k}": v for k, v in tr.evaluate([xte], yte).items()}
        print(json.dumps({**out, "mode": "finetune"}))
        return

    if args.bert_checkpoint:
        embed, dim = _build_bert_embed(args)
    else:
        dim = 256

        def embed(texts):  # hashing bag-of-words fallback
            out = np.zeros((len(texts), dim), dtype=np.float32)
            for i, t in enumerate(texts):
                for w in t.lower().split():
                    out[i, hash(w) % dim] += 1.0
                n = np.linalg.norm(out[i])
                if n > 0:
                    out[i] /= n
            return out

    sessions_train = sorted(docs_train)
    sessions_test = sorted(docs_test)
    x_train = embed([docs_train[s] for s in sessions_train])
    x_test = embed([docs_test[s] for s in sessions_test])
    y_train = np.asarray([y_train_map[s] for s in sessions_train], dtype=np.int32)
    y_test = np.asarray([y_test_map[s] for s in sessions_test], dtype=np.int32)

    tr = TextTrainer(
        TextClassifierConfig(embed_dim=x_train.shape[1], hidden_dim=args.hidden_dim),
        TextTrainerConfig(num_epochs=args.epochs, batch_size=args.train_batch_size,
                          learning_rate=args.learning_rate or 1e-3,
                          lr_schedule=args.lr_schedule, seed=args.seed))
    tr.fit(x_train, y_train, x_test, y_test)
    print(json.dumps({"test_" + k: v for k, v in tr.evaluate(x_test, y_test).items()}))


def cmd_sweep(args):
    """Replay the reference's run_*.sh sweep grids as one command
    (run_dementia_BERTparamsTuning.sh, run_dementia_SVM.sh,
    run_HyperparameterTune.sh — see sweep.py for the full mapping)."""
    from .sweep import (
        ASR_PRESETS,
        SVM_PRESETS,
        TEXT_PRESETS,
        parse_grid,
        sweep_asr,
        sweep_svm,
        sweep_text,
    )

    presets = {"asr": ASR_PRESETS, "text": TEXT_PRESETS, "svm": SVM_PRESETS}[args.target]
    grid = presets[args.preset]() if args.preset else {}
    grid.update(parse_grid(args.grid))  # explicit --grid axes override presets
    if not grid:
        raise SystemExit(f"sweep {args.target}: give --preset "
                         f"({', '.join(sorted(presets))}) and/or --grid key=v1,v2")

    def load_rows(pkl):
        with open(pkl, "rb") as f:
            rows = pickle.load(f).to_dict("records")
        for r in rows:
            r.setdefault("text", r.get("pred_str"))
        return rows

    if args.target == "text":
        sweep_text(grid, load_rows(args.train_pkl), load_rows(args.test_pkl),
                   results_csv=args.results_csv, seed=args.seed)
    elif args.target == "svm":
        from .data.dataset import load_spk2label

        sweep_svm(grid, load_rows(args.train_pkl), load_rows(args.test_pkl),
                  load_spk2label(args.spk2label), results_csv=args.results_csv)
    else:  # asr
        from .train.trainer import TrainerConfig

        _maybe_fast_rng(args)
        cfg = _dacs_cfg(args)
        train_exs, tok = _load_examples(args, args.train_csv)
        test_exs, _ = _load_examples(args, args.test_csv)
        params = load_params(cfg, args.model_in_path, args.seed)
        tcfg = TrainerConfig(
            num_epochs=args.epochs, batch_size=args.train_batch_size,
            eval_batch_size=args.eval_batch_size, seed=args.seed,
            compute_dtype=args.compute_dtype, log_file=args.log_path,
            scan_layers=args.scan_layers, dp=args.dp, tp=args.tp)
        sweep_asr(grid, cfg, tcfg, params, train_exs, test_exs, tok,
                  results_csv=args.results_csv)


def cmd_feat_scoring(args):
    from .evaluation import mask_node_statistics, per_utt_on_rates

    with open(args.pkl, "rb") as f:
        rows = pickle.load(f).to_dict("records")
    stats = mask_node_statistics(rows)
    rates = per_utt_on_rates(rows)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "node_stats.npz", **stats)
    np.savez(out / "utt_on_rates.npz", **rates)
    print(json.dumps({k: float(np.mean(v)) for k, v in {**stats, **rates}.items()}))


def cmd_dp_budget(args):
    """Plan a DP-FedAvg run's privacy budget before spending any compute:
    epsilon after each stage's rounds for the given sampling fraction and
    noise multiplier (federated/privacy.py RDP accountant — the same math
    the engine logs as dp_epsilon during a run)."""
    from .federated.privacy import DpAccountant, noise_for_epsilon

    if (args.noise_multiplier is None) == (args.target_epsilon is None):
        raise SystemExit("dp-budget: give exactly one of --noise_multiplier "
                         "(forward) or --target_epsilon (inverse)")
    k = args.num_users
    q = max(int(args.frac * k), 1) / k
    if args.target_epsilon is not None:
        z = noise_for_epsilon(args.rounds, q, args.target_epsilon, args.delta)
        print(json.dumps({
            "num_users": k, "frac": args.frac, "q": round(q, 6),
            "rounds": args.rounds, "delta": args.delta,
            "target_epsilon": args.target_epsilon,
            "noise_multiplier": round(z, 4),
        }))
        return
    acc = DpAccountant(delta=args.delta)
    trace = []
    for rnd in range(1, args.rounds + 1):
        acc.step(q, args.noise_multiplier)
        if rnd % max(args.report_every, 1) == 0 or rnd == args.rounds:
            trace.append({"round": rnd, "epsilon": round(acc.epsilon(), 4)})
    print(json.dumps({
        "num_users": k, "frac": args.frac, "q": round(q, 6),
        "noise_multiplier": args.noise_multiplier, "delta": args.delta,
        "rounds": args.rounds, "epsilon": round(acc.epsilon(), 4),
        "trace": trace,
    }))


def cmd_pkl2csv(args):
    """Extraction pkl -> CSV with the text columns (reference:
    centralized/utils/PKL2csv.py — path/text/dementia_labels/pred_str
    [+Summary] kept, arrays dropped)."""
    import pandas as pd

    with open(args.pkl, "rb") as f:
        df = pd.DataFrame(pickle.load(f))
    cols = [c for c in ("path", "text", "dementia_labels", "pred_str", "Summary")
            if c in df.columns]
    out = args.out or str(Path(args.pkl).with_suffix(".csv"))
    df[cols].to_csv(out, index=False)
    print(json.dumps({"rows": len(df), "columns": cols, "csv": out}))


def cmd_transcribe(args):
    """Batch-transcribe WAV files (a file or a directory) without the CSV
    pipeline: audio -> InferenceEngine -> transcript + AD prediction per
    file. Supports the serving knobs (--compute_dtype int8, --beam_size)."""
    from .data.audio import load_audio
    from .data.tokenizer import CTCCharTokenizer
    from .serving import InferenceEngine, ServingConfig

    _maybe_fast_rng(args)
    cfg = _dacs_cfg(args)
    params = load_params(cfg, args.model_in_path, args.seed)
    tok = CTCCharTokenizer()
    src = Path(args.audio)
    paths = sorted(src.glob("**/*.wav")) if src.is_dir() else [src]
    if not paths:
        raise SystemExit(f"no .wav files under {src}")
    engine = InferenceEngine(
        cfg, params, tok,
        ServingConfig(batch_size=args.eval_batch_size,
                      max_seconds=args.max_seconds,
                      compute_dtype=args.compute_dtype,
                      beam_size=args.beam_size))
    waves = [load_audio(str(p)) for p in paths]
    results = engine.infer_batch(waves)
    rows = [{"path": str(p), "transcript": r.transcript,
             "ad_pred": r.ad_pred, "ad_prob": round(r.ad_prob, 4)}
            for p, r in zip(paths, results)]
    if args.out:
        import csv as _csv

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        with open(args.out, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=["path", "transcript",
                                               "ad_pred", "ad_prob"])
            w.writeheader()
            w.writerows(rows)
    for row in rows:
        print(json.dumps(row))


def cmd_teacher(args):
    """Offline teacher-transcription pass (the reference's
    ``TeacherStudentLearning`` + transcript.json merge,
    federated/src/federated_main.py:29-68,283-298): transcribe an
    unlabeled CSV's clips and write (a) a transcript JSON (path -> text)
    and (b) a labeled CSV ready for ``federated --unsup_train_csv``.

    Teachers: ``--whisper_hf <dir>`` ports an HF
    WhisperForConditionalGeneration checkpoint (long-form windows +
    temperature-fallback re-decode, models/whisper.py); the default uses
    this framework's own fine-tuned CTC model (``-model_in``) as a
    self-training teacher."""
    import csv as _csv

    exs, tok = _load_examples(args, args.train_csv, with_transcript=False)
    if args.whisper_hf:
        import torch
        from transformers import WhisperTokenizer

        from .data.teacher import WhisperTeacher
        from .models.whisper import WhisperConfigT, port_hf_whisper

        d = Path(args.whisper_hf)
        with open(d / "config.json") as f:
            wcfg = WhisperConfigT.from_hf_config(json.load(f))
        sd = torch.load(d / "pytorch_model.bin", map_location="cpu",
                        weights_only=True)
        wtok = WhisperTokenizer.from_pretrained(str(d))
        teacher = WhisperTeacher(
            wcfg, port_hf_whisper(sd, wcfg),
            lambda ids: wtok.decode(ids, skip_special_tokens=True),
            timestamps=args.timestamps)
        trs = teacher.transcribe(exs, batch_size=args.eval_batch_size)
    else:
        from .data.teacher import transcribe_with_ctc_model

        cfg = _dacs_cfg(args)
        params = load_params(cfg, args.model_in_path, args.seed)
        trs = transcribe_with_ctc_model(cfg, params, exs, tok,
                                        batch_size=args.eval_batch_size)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out.with_suffix(".json"), "w") as f:
        json.dump(trs, f, indent=1)
    # labeled CSV: same shape as the training CSVs (csv2dataset consumes
    # path,sentence); empty transcripts drop, as the reference's
    # FilterAvailAudios does
    kept = 0
    with open(out, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["path", "sentence"])
        w.writeheader()
        for e in exs:
            text = (trs.get(e.path) or "").upper().strip()
            if text:
                w.writerow({"path": e.path, "sentence": text})
                kept += 1
    print(json.dumps({"transcribed": len(trs), "kept": kept,
                      "csv": str(out), "json": str(out.with_suffix('.json'))}))


def cmd_export_hf(args):
    """Export trained params to an HF torch state_dict (pytorch_model.bin
    layout) so reference-style torch pipelines can load them
    (models/export.py; reverse of the from_pretrained port)."""
    import torch

    from .models.export import export_for_ctc_state_dict

    cfg = _dacs_cfg(args)
    params = load_params(cfg, args.model_in_path, args.seed)
    sd = export_for_ctc_state_dict(params, cfg.backbone,
                                   weight_norm_style=args.weight_norm_style)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, out)
    print(json.dumps({"keys": len(sd), "out": str(out)}))


def build_parser() -> argparse.ArgumentParser:
    """The full CLI parser (separated from :func:`main` so runbooks'
    command lines can be parse-validated without executing anything —
    tests/test_cli.py::test_reproduce_wer_runbook_parses)."""
    parser = argparse.ArgumentParser(prog="privacy_preserve_federated_asr_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="centralized training (any stage/recipe)")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=30)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("federated", help="federated 3-stage pipeline")
    _add_common(p)
    p.add_argument("-fl_st", "--FL_STAGE", type=int, default=0,
                   help="1/2/3, or 0 = full pipeline")
    p.add_argument("--epochs", type=int, default=10, help="FL rounds")
    p.add_argument("--num_users", type=int, default=2)
    p.add_argument("--frac", type=float, default=1.0)
    p.add_argument("--local_ep", type=int, default=5)
    p.add_argument("--global_ep", type=int, default=30)
    p.add_argument("-sl", "--supervised_level", type=float, default=1.0)
    p.add_argument("--unsup_train_csv", default=None,
                   help="unlabeled/teacher-transcribed client data "
                        "(reference: ADReSSo) for supervised_level < 1")
    p.add_argument("--dp_clip_norm", type=float, default=None,
                   help="DP-FedAvg: clip client update deltas to this L2 "
                        "norm (off when unset; beyond the reference)")
    p.add_argument("--client_mesh", type=int, default=1,
                   help="shard the FL client axis over this many devices "
                        "(requires client_mesh x data_mesh devices); 1 = "
                        "single-device engine")
    p.add_argument("--data_mesh", type=int, default=1,
                   help="per-client data-parallel devices (the 'data' mesh "
                        "axis): each client's batch rows are sharded over "
                        "this many devices with a per-step gradient "
                        "all-reduce (batch_size must divide evenly; "
                        "sharding + collective layout asserted in "
                        "tests/test_fl_dp.py)")
    p.add_argument("--num_slices", type=int, default=0,
                   help="lay the mesh out slice-aware (make_multislice_mesh)"
                        ": clients spread across this many ICI slices, "
                        "FedAvg the only DCN traffic; 0 = flat mesh")
    p.add_argument("--fl_zero1", action="store_true",
                   help="ZeRO-1 inside the FL round: shard each client's "
                        "fp32 Adam moments over the 'data' mesh axis "
                        "(requires --data_mesh >= 2); the memory lever for "
                        "K=4-8 large-model clients per mesh — stage-0 "
                        "rounds stack full per-client moments otherwise")
    p.add_argument("--model_mesh", type=int, default=1,
                   help="tensor-parallel devices per client (the 'model' "
                        "mesh axis): Megatron-shard each client's encoder "
                        "matmuls + their Adam moments inside the round "
                        "(parallel/tp.py; composes with --fl_zero1 — TP "
                        "leaves keep the TP layout, the rest shards over "
                        "'data')")
    p.add_argument("--fedprox_mu", type=float, default=0.0,
                   help="FedProx proximal coefficient on the local "
                        "objective (0 = reference FedAvg semantics)")
    p.add_argument("--server_optimizer", default="none",
                   choices=["none", "momentum", "adam"],
                   help="FedOpt server optimizer applied to the aggregated "
                        "round delta (none = reference FedAvg)")
    p.add_argument("--server_lr", type=float, default=None,
                   help="server step size; default 1.0 for momentum "
                        "(pure FedAvgM), 1e-2 for adam (Adam normalizes "
                        "the pseudo-gradient, so lr is the step size)")
    p.add_argument("--server_momentum", type=float, default=0.9)
    p.add_argument("--compress_bits", type=int, default=None,
                   help="uplink compression: quantize each client's round "
                        "delta to this many bits (symmetric abs-max, "
                        "stochastic rounding) before FedAvg; exclusive "
                        "with --dp_clip_norm")
    p.add_argument("--dp_noise_multiplier", type=float, default=0.0,
                   help="DP-FedAvg: Gaussian noise std = clip * this / K")
    p.add_argument("--dp_delta", type=float, default=1e-5,
                   help="delta for the reported (epsilon, delta) guarantee "
                        "(federated/privacy.py RDP accountant; the round "
                        "log carries a running dp_epsilon column)")
    p.add_argument("--secagg_clip_norm", type=float, default=None,
                   help="secure aggregation (Bonawitz et al. 2017): L2-clip "
                        "each client's round delta to this norm, quantize "
                        "to the public fixed-point grid and pairwise-mask; "
                        "the server only sums masked int32 payloads. "
                        "Exclusive with the other aggregation modes")
    p.add_argument("--secagg_bits", type=int, default=20,
                   help="secure-aggregation fixed-point width (2-24; needs "
                        "K * 2^(bits-1) < 2^31 of int32 headroom)")
    p.add_argument("--topk_fraction", type=float, default=None,
                   help="top-k sparsified FedAvg with error feedback (Lin "
                        "et al. 2018): each client uploads only this "
                        "fraction of its delta's largest-magnitude "
                        "coordinates; the rest accumulates in a per-client "
                        "residual and rides a later round. Exclusive with "
                        "the other aggregation modes")
    p.add_argument("--round_save_dir", default=None,
                   help="save the global params after every round and "
                        "resume from the newest checkpoint on restart "
                        "(engine-native form of the reference's "
                        "filesystem-round resume, training.py:14-22)")
    p.set_defaults(fn=cmd_federated)

    p = sub.add_parser("extract", help="dump embeddings/masks/transcripts")
    _add_common(p)
    p.add_argument("-csv", "--csv_name", default="extract")
    p.add_argument("--csv_out_dir", default="./saves/results")
    p.add_argument("--beam_size", type=int, default=0,
                   help="0 = greedy (reference parity); >0 = CTC prefix "
                        "beam search for pred_str (ops/beam.py)")
    p.add_argument("--lm_train_csv", default=None,
                   help="fit a char-bigram shallow-fusion LM on this train "
                        "CSV's transcripts (needs --beam_size > 0)")
    p.add_argument("--lm_alpha", type=float, default=0.3)
    p.add_argument("--lm_beta", type=float, default=0.0)
    # reference extraction runs fp32 (no .half() in the eval scripts);
    # opt into bf16 explicitly for speed
    p.set_defaults(fn=cmd_extract, compute_dtype="float32")

    p = sub.add_parser("serve", help="batched jitted ASR+AD inference server")
    _add_common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--max_seconds", type=float, default=30.0)
    p.add_argument("--batch_window_ms", type=float, default=10.0)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip precompiling every time-bucket program")
    p.add_argument("--beam_size", type=int, default=0,
                   help="0 = greedy (reference parity); >0 = CTC prefix "
                        "beam search (ops/beam.py)")
    p.add_argument("--lm_train_csv", default=None,
                   help="fit a char-bigram shallow-fusion LM on this "
                        "train CSV's transcripts (needs --beam_size > 0)")
    p.add_argument("--lm_alpha", type=float, default=0.3)
    p.add_argument("--lm_beta", type=float, default=0.0)
    p.add_argument("--transport", default="float32",
                   choices=["float32", "int16"],
                   help="host->device waveform encoding; int16 halves the "
                        "batch upload bytes (dequant + normalization move "
                        "on-device; PERF.md §6)")
    p.add_argument("--no_hub", action="store_true",
                   help="standalone streaming sessions instead of the "
                        "shared StreamingHub: better per-feed tail latency "
                        "when the chip is idle; the hub minimizes DEVICE "
                        "passes under contention (PERF.md §6 httpload)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "stream-client",
        help="stream a WAV to a running `serve` instance over the binary "
             "PCM transport, printing partials")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--audio", default=None,
                   help="WAV path (any rate; resampled to 16 kHz); "
                        "omitted = synthetic noise smoke input")
    p.add_argument("--chunk_seconds", type=float, default=0.5)
    p.add_argument("--synthetic_seconds", type=float, default=3.0)
    p.add_argument("--json_transport", action="store_true",
                   help="use the JSON float-list body instead of binary "
                        "PCM (debugging; ~3x slower under load)")
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_stream_client)

    p = sub.add_parser(
        "stream-report",
        help="measure streaming finalization flip rate per right-context "
             "setting on the test CSV's audio (pick the latency knob from "
             "data, serving/streaming.py measure_finalization_flips)")
    _add_common(p)
    p.add_argument("--max_seconds", type=float, default=30.0)
    p.add_argument("--max_utts", type=int, default=0,
                   help="cap the measured utterances (0 = all)")
    p.add_argument("--hop_seconds", type=float, default=0.5)
    p.add_argument("--right_context_grid", type=float, nargs="+",
                   default=[0.25, 0.5, 1.0, 2.0, 4.0])
    p.set_defaults(fn=cmd_stream_report)

    p = sub.add_parser("detail-wer", help="grouped WER report")
    p.add_argument("--pkl", required=True)
    p.add_argument("-t", "--type", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--id2mmse", default=None)
    p.add_argument("--out_dir", default=None)
    p.set_defaults(fn=cmd_detail_wer)

    p = sub.add_parser("svm", help="SVM AD prediction with speaker vote")
    p.add_argument("--train_pkl", required=True)
    p.add_argument("--test_pkl", required=True)
    p.add_argument("--spk2label", default="./meta-data/test_dic.npy")
    p.add_argument("-sq", "--squeeze", default="min",
                   choices=["mean", "min", "max", "median"])
    p.add_argument("--mode", default="audio", choices=["audio", "text", "fusion"])
    p.add_argument("--masked", action="store_true")
    p.add_argument("-INV", "--INV", action="store_true")
    p.add_argument("--text_train_pkl", default=None)
    p.add_argument("--text_test_pkl", default=None)
    p.add_argument("--results_csv", default="./saves/results/SVM/results.csv")
    p.add_argument("--title", default="dacs_tpu")
    p.set_defaults(fn=cmd_svm)

    p = sub.add_parser("text", help="text-branch AD classifier over session docs")
    p.add_argument("--train_pkl", required=True)
    p.add_argument("--test_pkl", required=True)
    p.add_argument("--use_text", default="text", choices=["text", "pred_str"])
    p.add_argument("--experiment", default=None,
                   help="named 0207_DM_* experiment from the registry "
                        "(text/experiments.py); overrides the plain path")
    p.add_argument("--bert_checkpoint", default=None)
    p.add_argument("--vocab", default=None)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("-lr", "--learning_rate", type=float, default=None)
    p.add_argument("--lr_schedule", default="lin", choices=["exp", "lin", "cos"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--finetune", action="store_true",
                   help="train the BERT encoder INSIDE the graph (AdamW "
                        "over ALL params — the reference SingleForwardModel "
                        "setup, Dementia_challenge_models.py:312) instead "
                        "of the frozen-embedding head fast path")
    p.add_argument("--max_length", type=int, default=128,
                   help="finetune: static token length per example")
    p.add_argument("--dp", type=int, default=1,
                   help="finetune: shard the batch over this many devices "
                        "(Lightning-DDP parity)")
    p.add_argument("--audio_root", default=None,
                   help="resolve audio InputSpecs (en/gr/multi/wv) against "
                        "this directory and embed real waveforms through "
                        "the SSL conv frontend (no hash fallback)")
    p.set_defaults(fn=cmd_text)

    p = sub.add_parser("teacher",
                       help="offline teacher transcription: label an "
                            "unlabeled CSV (the reference's whisper "
                            "TeacherStudentLearning pass)")
    _add_common(p)
    p.add_argument("--out", required=True,
                   help="output CSV path (path,sentence — feed to "
                        "`federated --unsup_train_csv`); a transcript "
                        "JSON sidecar is written next to it")
    p.add_argument("--whisper_hf", default=None,
                   help="HF WhisperForConditionalGeneration checkpoint dir "
                        "(config.json + pytorch_model.bin + tokenizer); "
                        "default teacher is this framework's CTC model "
                        "from -model_in (self-training)")
    p.add_argument("--timestamps", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="whisper-teacher only: decode with timestamp "
                        "tokens and advance windows by the last predicted "
                        "segment boundary — upstream whisper.transcribe's "
                        "default long-form semantics, so ON by default "
                        "here; --no-timestamps restores fixed 30 s hops")
    p.set_defaults(fn=cmd_teacher)

    p = sub.add_parser("transcribe",
                       help="batch-transcribe WAV file(s) without the CSV "
                            "pipeline (ASR transcript + AD prediction)")
    _add_common(p)
    p.add_argument("--audio", required=True,
                   help="a .wav file or a directory (searched recursively)")
    p.add_argument("--out", default=None, help="optional output CSV")
    p.add_argument("--max_seconds", type=float, default=30.0)
    p.add_argument("--beam_size", type=int, default=0)
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("export-hf",
                       help="trained params -> HF torch state_dict "
                            "(pytorch_model.bin) for reference-world use")
    _add_common(p)
    p.add_argument("--out", default="./saves/export/pytorch_model.bin")
    p.add_argument("--weight_norm_style", default="parametrizations",
                   choices=["parametrizations", "legacy"],
                   help="pos-conv weight-norm key layout (torch>=2 modules "
                        "use parametrizations.*; older checkpoints "
                        "weight_g/weight_v)")
    p.set_defaults(fn=cmd_export_hf)

    p = sub.add_parser("pkl2csv", help="extraction pkl -> text-columns CSV")
    p.add_argument("--pkl", required=True)
    p.add_argument("--out", default=None, help="default: <pkl>.csv")
    p.set_defaults(fn=cmd_pkl2csv)

    p = sub.add_parser("sweep", help="replay the reference run_*.sh sweep grids")
    sweep_sub = p.add_subparsers(dest="target", required=True)
    sp = sweep_sub.add_parser("asr", help="ASR/DACS hyperparameter grid "
                              "(run_HyperparameterTune.sh)")
    _add_common(sp)
    sp.add_argument("--epochs", type=int, default=5)
    sp.add_argument("--preset", default=None, choices=["hyperparameter-tune"])
    sp.add_argument("--grid", nargs="*", default=[], metavar="key=v1,v2",
                    help="DACSConfig/TrainerConfig axes, e.g. gs_tau=0.5,1.0")
    sp.add_argument("--results_csv", default="./saves/results/sweep/asr_results.csv")
    sp.set_defaults(fn=cmd_sweep, target="asr")
    for name, choices, hlp in (
        ("text", ["bert", "bert-regression", "bert-params-tuning"],
         "text-branch grids (run_dementia_BERT*.sh)"),
        ("svm", ["dementia-svm"], "SVM grids (run_dementia_SVM.sh)"),
    ):
        sp = sweep_sub.add_parser(name, help=hlp)
        sp.add_argument("--train_pkl", required=True)
        sp.add_argument("--test_pkl", required=True)
        sp.add_argument("--preset", default=None, choices=choices)
        sp.add_argument("--grid", nargs="*", default=[], metavar="key=v1,v2")
        sp.add_argument("--spk2label", default="./meta-data/test_dic.npy")
        sp.add_argument("--results_csv",
                        default=f"./saves/results/sweep/{name}_results.csv")
        sp.add_argument("--seed", type=int, default=0)
        sp.set_defaults(fn=cmd_sweep, target=name)

    p = sub.add_parser("feat-scoring", help="mask statistics")
    p.add_argument("--pkl", required=True)
    p.add_argument("--out_dir", default="./saves/results/FSM_info")
    p.set_defaults(fn=cmd_feat_scoring)

    p = sub.add_parser("dp-budget",
                       help="plan DP-FedAvg (epsilon, delta) before a run "
                            "(RDP accountant, no compute)")
    p.add_argument("--rounds", type=int, required=True,
                   help="total noised FedAvg rounds (sum over stages)")
    p.add_argument("--num_users", type=int, default=54)
    p.add_argument("--frac", type=float, default=1.0)
    p.add_argument("--noise_multiplier", type=float, default=None,
                   help="forward mode: epsilon for this noise level")
    p.add_argument("--target_epsilon", type=float, default=None,
                   help="inverse mode: smallest noise multiplier reaching "
                        "this epsilon (exclusive with --noise_multiplier)")
    p.add_argument("--delta", type=float, default=1e-5)
    p.add_argument("--report_every", type=int, default=1,
                   help="trace granularity in rounds")
    p.set_defaults(fn=cmd_dp_budget)
    return parser


def _enable_persistent_compile_cache():
    """Persistent XLA compile cache for every CLI entry: on remote-compile
    TPU setups a cache-miss flagship program costs minutes; repeat
    invocations (pipeline stages, sweep points, restarts) hit the disk
    cache instead. No-op if the embedding process already configured one
    (e.g. the test conftest's CPU cache)."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _enable_persistent_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
