"""Perf lab: sequential timing of train-step variants on the real TPU.

Run from the repo root (one process at a time on this box):
    python scripts/perf_lab.py batch        # batch scaling
    python scripts/perf_lab.py attn         # attention impl microbench
Prints one JSON line per config as it completes.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def time_fn(fn, args, warmup=3, iters=10, flush=lambda out: None):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    flush(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    flush(out)
    return (time.perf_counter() - t0) / iters


def bench_train_step(batch_size, seconds=5.0, attention_impl="auto",
                     label_len=48, stage=0, dense_impl="fp"):
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import DeviceBatch, make_train_step
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state, init_dacs_params)

    samples = int(16000 * seconds)
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(
            final_dropout=0.0, attention_impl=attention_impl,
            dense_impl=dense_impl),
        stage=stage, ad_loss="recall")
    model = DACSModel(cfg, dtype=jnp.bfloat16, remat=False)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    tx = make_optimizer(jax.eval_shape(lambda: params), stage=stage,
                        warmup_steps=100, total_steps=10_000)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    lengths = rng.integers(int(0.7 * samples), samples, size=batch_size)
    lengths[0] = samples
    iv = rng.normal(0, 1, size=(batch_size, samples)).astype(np.float32)
    for i, ln in enumerate(lengths):
        iv[i, ln:] = 0.0
    batch = DeviceBatch(
        input_values=jnp.asarray(iv),
        input_lengths=jnp.asarray(lengths, dtype=jnp.int32),
        labels=jnp.asarray(rng.integers(4, 32, (batch_size, label_len)),
                           dtype=jnp.int32),
        label_lengths=jnp.full((batch_size,), label_len, dtype=jnp.int32),
        dementia_labels=jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32),
        sample_mask=jnp.ones((batch_size,), jnp.float32))

    holder = {"state": state}

    def run(b):
        holder["state"], m = step(holder["state"], b)
        return m

    dt = time_fn(run, (batch,), flush=lambda m: float(m["loss"]))
    return {"config": f"train B={batch_size} T={seconds}s attn={attention_impl}"
                      f" st={stage} dense={dense_impl}",
            "step_ms": round(dt * 1000, 2),
            "utt_per_sec": round(batch_size / dt, 1)}


def bench_hidden_step(batch_size=16, seconds=5.0, label_len=48, stage=2):
    """Head-only train step over CACHED encoder outputs (stages 1/2 train on
    these by default: Trainer cache_encoder / engine res_h rounds), plus the
    one-time cache-build (backbone forward) rate that amortizes over epochs."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.models.backbone import (
        feat_extract_output_lengths)
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import (
        HiddenBatch, make_hidden_train_step)
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state, init_dacs_params)

    samples = int(16000 * seconds)
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    model = DACSModel(cfg, dtype=jnp.bfloat16, remat=False)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    tx = make_optimizer(jax.eval_shape(lambda: params), stage=stage,
                        warmup_steps=100, total_steps=10_000)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_hidden_train_step(model, tx, cfg), donate_argnums=(0,))

    t_frames = feat_extract_output_lengths(cfg.backbone, samples)
    d = cfg.hidden_size
    rng = np.random.default_rng(0)
    batch = HiddenBatch(
        hidden_states=jnp.asarray(
            rng.normal(0, 1, (batch_size, t_frames, d)).astype(np.float32),
            jnp.bfloat16),
        frame_lengths=jnp.full((batch_size,), t_frames, jnp.int32),
        labels=jnp.asarray(rng.integers(4, 32, (batch_size, label_len)),
                           dtype=jnp.int32),
        label_lengths=jnp.full((batch_size,), label_len, jnp.int32),
        dementia_labels=jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32),
        sample_mask=jnp.ones((batch_size,), jnp.float32))

    holder = {"state": state}

    def run(b):
        holder["state"], m = step(holder["state"], b)
        return m

    dt = time_fn(run, (batch,), flush=lambda m: float(m["loss"]))
    return {"config": f"hidden-step B={batch_size} T={seconds}s st={stage}",
            "step_ms": round(dt * 1000, 2),
            "utt_per_sec": round(batch_size / dt, 1)}


def bench_feature_step(batch_size=16, seconds=5.0, label_len=48, stage=0):
    """Stage-0 train step over CACHED conv-frontend outputs (the Trainer's
    default stage-0 path, cache_frontend): encoder + heads fwd/bwd with the
    frozen conv feature extractor's forward skipped."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.models.backbone import (
        feat_extract_output_lengths)
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import (
        FeatureBatch, make_feature_train_step)
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state, init_dacs_params)

    samples = int(16000 * seconds)
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    model = DACSModel(cfg, dtype=jnp.bfloat16, remat=False)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    tx = make_optimizer(jax.eval_shape(lambda: params), stage=stage,
                        warmup_steps=100, total_steps=10_000)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_feature_train_step(model, tx, cfg), donate_argnums=(0,))

    t_frames = feat_extract_output_lengths(cfg.backbone, samples)
    c = cfg.backbone.conv_dim[-1]
    rng = np.random.default_rng(0)
    batch = FeatureBatch(
        features=jnp.asarray(
            rng.normal(0, 1, (batch_size, t_frames, c)).astype(np.float32),
            jnp.bfloat16),
        frame_lengths=jnp.full((batch_size,), t_frames, jnp.int32),
        labels=jnp.asarray(rng.integers(4, 32, (batch_size, label_len)),
                           dtype=jnp.int32),
        label_lengths=jnp.full((batch_size,), label_len, jnp.int32),
        dementia_labels=jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32),
        sample_mask=jnp.ones((batch_size,), jnp.float32))

    holder = {"state": state}

    def run(b):
        holder["state"], m = step(holder["state"], b)
        return m

    dt = time_fn(run, (batch,), flush=lambda m: float(m["loss"]))
    return {"config": f"feature-step B={batch_size} T={seconds}s st={stage}",
            "step_ms": round(dt * 1000, 2),
            "utt_per_sec": round(batch_size / dt, 1)}


def bench_serving(batch_size=8, seconds=5.0, stage=2, compute_dtype="bfloat16",
                  transport="float32"):
    """End-to-end serving path on the flagship model: single-request latency
    and saturated batched throughput through InferenceEngine.infer_batch
    (includes host-side padding, normalization and greedy decode).
    compute_dtype "int8" measures the dynamic-W8A8 path (ops/quant.py);
    transport "int16" the half-width host->device waveform encoding."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine, ServingConfig)
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    samples = int(16000 * seconds)
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    eng = InferenceEngine(cfg, params, None, ServingConfig(
        batch_size=batch_size, max_seconds=seconds,
        compute_dtype=compute_dtype, transport=transport))
    rng = np.random.default_rng(0)
    waves = [rng.normal(0, 0.3, size=samples).astype(np.float32)
             for _ in range(batch_size)]
    eng.warmup([samples])

    dt1 = time_fn(lambda w: eng.infer_batch([w]), (waves[0],),
                  flush=lambda rs: rs[0].ad_prob)
    dtb = time_fn(lambda: eng.infer_batch(waves), (),
                  flush=lambda rs: rs[-1].ad_prob)
    print(json.dumps({
        "config": (f"serve B={batch_size} T={seconds}s st={stage} "
                   f"{compute_dtype} tx={transport}"),
        "single_latency_ms": round(dt1 * 1e3, 1),
        "batch_ms": round(dtb * 1e3, 1),
        "throughput_utt_per_sec": round(batch_size / dtb, 1)}), flush=True)


def bench_transport_ab(batch_size=8, seconds=5.0, stage=2,
                       compute_dtype="bfloat16", trials=3):
    """Interleaved float32-vs-int16 transport A/B in ONE session: the tunnel
    transport variance dominates serving latency (PERF.md §6), so only
    same-window comparisons are meaningful. Both engines share params and
    alternate batch timings trial by trial."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine, ServingConfig)
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    samples = int(16000 * seconds)
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    engines = {}
    for tx in ("float32", "int16"):
        engines[tx] = InferenceEngine(cfg, params, None, ServingConfig(
            batch_size=batch_size, max_seconds=seconds,
            compute_dtype=compute_dtype, transport=tx))
        engines[tx].warmup([samples])
    rng = np.random.default_rng(0)
    waves = [rng.normal(0, 0.3, size=samples).astype(np.float32)
             for _ in range(batch_size)]
    results = {tx: [] for tx in engines}
    for _ in range(trials):
        for tx, eng in engines.items():
            dtb = time_fn(lambda e=eng: e.infer_batch(waves), (),
                          flush=lambda rs: rs[-1].ad_prob)
            results[tx].append(round(dtb * 1e3, 1))
    for tx, ms in results.items():
        med = sorted(ms)[len(ms) // 2]
        print(json.dumps({
            "config": (f"serve-transport B={batch_size} T={seconds}s "
                       f"st={stage} {compute_dtype} tx={tx}"),
            "batch_ms_trials": ms, "batch_ms_median": med,
            "throughput_utt_per_sec": round(batch_size / (med / 1e3), 1)}),
            flush=True)


def bench_stream_ab(total_seconds=10.0, chunk_seconds=0.5, stage=2,
                    compute_dtype="bfloat16", trials=3):
    """Interleaved streaming A/B on the flagship model: legacy window
    re-upload vs the device-resident buffer (StreamingConfig.resident),
    each under float32 and int16 chunk transport. One utterance of
    ``total_seconds`` streamed in ``chunk_seconds`` chunks with
    min_hop == chunk (every feed runs a device pass); reports whole-stream
    wall time and mean per-pass latency. Same-session interleaving, as with
    ``transport`` (the tunnel variance dominates)."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine, ServingConfig, StreamingConfig, StreamingSession)
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    chunk = int(chunk_seconds * 16000)
    audio = np.random.default_rng(0).normal(
        0, 0.3, size=int(total_seconds * 16000)).astype(np.float32)
    engines = {}
    for tx in ("float32", "int16"):
        # batch_size=1 (per-session latency — the legacy path uploads the
        # whole (batch, t) window per pass, so a fair A/B gives it one
        # row); 3 s time buckets bound the program count on the remote
        # compile service (2 buckets x 2 paths x 2 transports)
        eng = InferenceEngine(cfg, params, None, ServingConfig(
            batch_size=1, time_multiple=48000, max_seconds=total_seconds,
            compute_dtype=compute_dtype, transport=tx))
        eng.warmup()
        eng.warmup_streaming(chunk_samples=chunk)
        engines[tx] = eng

    def run_stream(eng, resident):
        s = StreamingSession(eng, StreamingConfig(
            right_context_seconds=0.4, min_hop_seconds=chunk_seconds,
            resident=resident))
        t0 = time.perf_counter()
        for i in range(0, len(audio), chunk):
            s.feed(audio[i : i + chunk])
        r = s.finish()
        return time.perf_counter() - t0, r

    configs = [(tx, res) for tx in engines for res in (False, True)]
    results = {c: [] for c in configs}
    n_passes = len(audio) // chunk + 1  # feeds + finish
    for _ in range(trials):
        for tx, res in configs:
            dt, _ = run_stream(engines[tx], res)
            results[(tx, res)].append(round(dt * 1e3, 1))
    for (tx, res), ms in results.items():
        med = sorted(ms)[len(ms) // 2]
        print(json.dumps({
            "config": (f"stream {total_seconds}s/{chunk_seconds}s-chunks "
                       f"st={stage} {compute_dtype} tx={tx} "
                       f"resident={res}"),
            "stream_ms_trials": ms, "stream_ms_median": med,
            "per_pass_ms": round(med / n_passes, 1)}), flush=True)


def bench_hub_ab(n_sessions=8, total_seconds=6.0, chunk_seconds=0.5,
                 stage=2, compute_dtype="bfloat16", trials=3):
    """N concurrent streams: StreamingHub (one batched pass per hop for
    the fleet) vs N standalone resident sessions (2 RPCs each per hop).
    Same engine/params, interleaved trials; reports whole-fleet wall time
    and the per-hop cost."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine, ServingConfig, StreamingConfig, StreamingHub,
        StreamingSession)
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    chunk = int(chunk_seconds * 16000)
    rng = np.random.default_rng(0)
    audios = [rng.normal(0, 0.3, size=int(total_seconds * 16000))
              .astype(np.float32) for _ in range(n_sessions)]
    eng = InferenceEngine(cfg, params, None, ServingConfig(
        batch_size=n_sessions, time_multiple=48000, max_seconds=total_seconds,
        compute_dtype=compute_dtype))
    eng.warmup_streaming(chunk_samples=chunk, hub=True)
    scfg = StreamingConfig(right_context_seconds=0.4,
                           min_hop_seconds=chunk_seconds)
    n_hops = len(audios[0]) // chunk + 1

    def run_hub():
        hub = StreamingHub(eng, scfg)
        ss = [hub.open() for _ in audios]
        t0 = time.perf_counter()
        for i in range(0, len(audios[0]), chunk):
            for k, s in enumerate(ss):
                # lockstep feeds coalesce: the fleet's hop runs as ONE
                # batched pass (triggered by the last member's feed)
                s.feed(audios[k][i : i + chunk])
        for s in ss:
            s.finish()
        return time.perf_counter() - t0

    def run_solo():
        ss = [StreamingSession(eng, scfg) for _ in audios]
        t0 = time.perf_counter()
        for i in range(0, len(audios[0]), chunk):
            for k, s in enumerate(ss):
                s.feed(audios[k][i : i + chunk])
        for s in ss:
            s.finish()
        return time.perf_counter() - t0

    results = {"hub": [], "solo": []}
    for _ in range(trials):
        results["hub"].append(round(run_hub() * 1e3, 1))
        results["solo"].append(round(run_solo() * 1e3, 1))
    for name, ms in results.items():
        med = sorted(ms)[len(ms) // 2]
        print(json.dumps({
            "config": (f"hub-ab {name} N={n_sessions} {total_seconds}s/"
                       f"{chunk_seconds}s-chunks st={stage} {compute_dtype}"),
            "fleet_ms_trials": ms, "fleet_ms_median": med,
            "per_hop_ms": round(med / n_hops, 1)}), flush=True)


def bench_http_load(n_clients=8, total_seconds=3.0, chunk_seconds=0.5,
                    stage=2, compute_dtype="bfloat16", binary=False):
    """N genuinely concurrent HTTP clients streaming against the real
    front-end (serving/server.py), hub vs standalone-only: per-feed
    latency percentiles and fleet wall time. The hub serializes members
    on one lock by design (a hub step advances everyone), so the p95 of
    an individual feed under load is the honest cost of that design —
    previously unmeasured (VERDICT r4 weak #4)."""
    import threading
    import urllib.request

    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine, ServingConfig, StreamingConfig, make_server)
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    chunk = int(chunk_seconds * 16000)
    rng = np.random.default_rng(0)
    audios = [rng.normal(0, 0.3, size=int(total_seconds * 16000))
              .astype(np.float32) for _ in range(n_clients)]
    eng = InferenceEngine(cfg, params, None, ServingConfig(
        batch_size=n_clients, time_multiple=48000,
        max_seconds=total_seconds, compute_dtype=compute_dtype))
    eng.warmup_streaming(chunk_samples=chunk, hub=True)
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.4,
                           min_hop_seconds=chunk_seconds)

    def run(use_hub: bool):
        srv = make_server(eng, host="127.0.0.1", port=0, stream_cfg=scfg,
                          use_hub=use_hub)
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        lat: list[float] = []
        lat_lock = threading.Lock()

        ctype = ("application/octet-stream" if binary
                 else "application/json")

        def post(path, body=b"{}", raw=False):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body,
                headers={"Content-Type": ctype if raw
                         else "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        def client(k):
            sid = post("/stream/start")["session"]
            for i in range(0, len(audios[k]), chunk):
                piece = audios[k][i : i + chunk]
                body = (piece.astype("<f4").tobytes() if binary else
                        json.dumps({"audio": piece.tolist()}).encode())
                t0 = time.perf_counter()
                post(f"/stream/{sid}", body, raw=True)
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)
            post(f"/stream/{sid}/finish")

        try:
            t0 = time.perf_counter()
            ths = [threading.Thread(target=client, args=(k,))
                   for k in range(n_clients)]
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            fleet_s = time.perf_counter() - t0
        finally:
            srv.shutdown()
            srv.server_close()
        ms = np.sort(np.asarray(lat)) * 1e3
        return {"fleet_ms": round(fleet_s * 1e3, 1),
                "feed_p50_ms": round(float(np.percentile(ms, 50)), 1),
                "feed_p95_ms": round(float(np.percentile(ms, 95)), 1),
                "feed_max_ms": round(float(ms[-1]), 1),
                "n_feeds": len(ms)}

    for use_hub in (True, False):
        run(use_hub)   # warm (first pass pays residual compiles/caches)
        out = run(use_hub)
        print(json.dumps({
            "config": (f"httpload N={n_clients} {total_seconds}s/"
                       f"{chunk_seconds}s-chunks st={stage} {compute_dtype} "
                       f"hub={use_hub} binary={binary}"), **out}),
            flush=True)
    eng.stop()


def bench_attention(t, impl, block=128, b=16, h=16, d=64, rate=0.0):
    from privacy_preserve_federated_asr_tpu.ops.attention import multihead_attention

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))
    mask = jnp.ones((b, t), jnp.int32)
    key = jax.random.PRNGKey(0)

    def loss(q, k, v):
        y = multihead_attention(q, k, v, mask, impl=impl, block=block,
                                dropout_rate=rate,
                                dropout_rng=key if rate > 0 else None)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dt = time_fn(g, (q, k, v), flush=lambda out: float(out[0][0, 0, 0, 0]))
    return {"config": f"attn T={t} impl={impl} blk={block} rate={rate}",
            "ms": round(dt * 1000, 3)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "batch"
    if mode == "batch":
        for bs in (16, 32, 64):
            print(json.dumps(bench_train_step(bs)), flush=True)
    elif mode == "attn":
        for t in (256, 512, 1024):
            for impl, block in (("xla", 0), ("pallas", 128), ("pallas", 256),
                                ("pallas", 512)):
                if impl == "pallas" and block > t:
                    continue
                print(json.dumps(bench_attention(t, impl, block or 128)),
                      flush=True)
        print(json.dumps(bench_attention(256, "pallas", 128, rate=0.1)), flush=True)
    elif mode == "decomp":
        bench_decomp()
    elif mode == "mm":
        bench_matmul_ceiling()
    elif mode == "stack":
        bench_layer_stack()
    elif mode == "flround":
        bench_fl_round(stage=int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif mode == "flmem":
        bench_fl_memory()
    elif mode == "hidden":
        print(json.dumps(bench_hidden_step(
            stage=int(sys.argv[2]) if len(sys.argv) > 2 else 2)), flush=True)
    elif mode == "feature":
        print(json.dumps(bench_feature_step(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 16)),
            flush=True)
    elif mode == "serve":
        bench_serving(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
            compute_dtype=sys.argv[3] if len(sys.argv) > 3 else "bfloat16",
            transport=sys.argv[4] if len(sys.argv) > 4 else "float32")
    elif mode == "transport":
        bench_transport_ab(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
            compute_dtype=sys.argv[3] if len(sys.argv) > 3 else "bfloat16")
    elif mode == "hub":
        bench_hub_ab(
            n_sessions=int(sys.argv[2]) if len(sys.argv) > 2 else 8,
            total_seconds=float(sys.argv[3]) if len(sys.argv) > 3 else 6.0,
            compute_dtype=sys.argv[4] if len(sys.argv) > 4 else "bfloat16")
    elif mode == "stream":
        bench_stream_ab(
            total_seconds=float(sys.argv[2]) if len(sys.argv) > 2 else 10.0,
            chunk_seconds=float(sys.argv[3]) if len(sys.argv) > 3 else 0.5,
            compute_dtype=sys.argv[4] if len(sys.argv) > 4 else "bfloat16")
    elif mode == "httpload":
        # `binary` may appear at any position: strip it before the
        # positional [n_clients] [total_seconds] [dtype] parse
        rest = [a for a in sys.argv[2:] if a != "binary"]
        bench_http_load(
            n_clients=int(rest[0]) if len(rest) > 0 else 8,
            total_seconds=float(rest[1]) if len(rest) > 1 else 3.0,
            compute_dtype=rest[2] if len(rest) > 2 else "bfloat16",
            binary="binary" in sys.argv)
    elif mode == "posconv":
        bench_posconv()
    elif mode == "int8mm":
        bench_int8_matmul_ceiling()
    elif mode == "int8train":
        # fp vs SwitchBack-int8 train step A/B at the bench shapes
        bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        for impl in ("fp", "int8_train"):
            print(json.dumps(bench_train_step(bs, dense_impl=impl)),
                  flush=True)
    elif mode == "one":
        print(json.dumps(bench_train_step(
            int(sys.argv[2]),
            attention_impl=sys.argv[3] if len(sys.argv) > 3 else "auto",
            stage=int(sys.argv[4]) if len(sys.argv) > 4 else 0)),
            flush=True)




def bench_matmul_ceiling():
    """Achievable bf16 matmul TFLOP/s on this chip at the model's shapes —
    the roofline every other number is judged against. A 16-matmul chain
    keeps the MXU busy without per-dispatch overhead dominating."""
    rng = np.random.default_rng(0)
    for (m, k, n) in [(4096, 1024, 4096), (3984, 1024, 4096),
                      (4096, 4096, 1024), (3984, 1024, 1024),
                      (8192, 1024, 4096), (3984, 1024, 3072)]:
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 0.02, (n, k)), jnp.bfloat16)

        def chain(x, w1, w2):
            h = x
            for _ in range(8):
                h = (h @ w1) @ w2  # back to [m, k] each pair
            return h.sum()

        f = jax.jit(chain)
        dt = time_fn(f, (x, w1, w2), flush=float)
        fl = 8 * 2 * (2 * m * k * n)
        print(json.dumps({"config": f"mm {m}x{k}x{n} chain16",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)


def bench_int8_matmul_ceiling():
    """s8xs8->s32 MXU chain at the model's shapes, next to bf16 — measures
    whether this chip's int8 path actually delivers the 2x datasheet rate
    (and what the dynamic-quantize rescale overhead costs) before betting
    the int8_train step on it."""
    from privacy_preserve_federated_asr_tpu.ops.quant import (
        int8_dense_dot_general, quantize_symmetric)
    from jax import lax

    rng = np.random.default_rng(0)
    for (m, k, n) in [(3984, 1024, 4096), (3984, 4096, 1024),
                      (3984, 1024, 1024), (8192, 1024, 4096)]:
        fl = 8 * 2 * (2 * m * k * n)
        # (a) pure s8 chain, pre-quantized weights, s32 accumulate: the
        # hardware ceiling with no quantize work in the loop
        xq, _ = quantize_symmetric(
            jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32), axis=-1)
        w1q, _ = quantize_symmetric(
            jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.float32), axis=0)
        w2q, _ = quantize_symmetric(
            jnp.asarray(rng.normal(0, 0.02, (n, k)), jnp.float32), axis=0)

        def chain_s8(x, w1, w2):
            h = x
            for _ in range(8):
                a = lax.dot_general(h, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                a = (a >> 7).astype(jnp.int8)     # cheap requantize
                b = lax.dot_general(a, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                h = (b >> 7).astype(jnp.int8)
            return h.sum()

        dt = time_fn(jax.jit(chain_s8), (xq, w1q, w2q), flush=float)
        print(json.dumps({"config": f"int8mm {m}x{k}x{n} s8-chain16",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)
        # (b) the real op: dynamic W8A8 incl. per-call quantize + rescale
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 0.02, (n, k)), jnp.bfloat16)

        def chain_dyn(x, w1, w2):
            h = x
            for _ in range(8):
                h = int8_dense_dot_general(
                    h, w1, (((1,), (0,)), ((), ())))
                h = int8_dense_dot_general(
                    h, w2, (((1,), (0,)), ((), ())))
            return h.sum()

        dt = time_fn(jax.jit(chain_dyn), (x, w1, w2), flush=float)
        print(json.dumps({"config": f"int8mm {m}x{k}x{n} dynW8A8-chain16",
                          "ms": round(dt * 1e3, 3),
                          "tflops": round(fl / dt / 1e12, 1)}), flush=True)


def bench_layer_stack(b=16, t=249):
    """24-layer encoder stack fwd and fwd+bwd TFLOP/s at bench shapes.
    NB: single-layer programs are dominated by the ~1.1-1.5 ms per-program
    dispatch floor of the remote platform; only multi-layer programs give
    honest per-layer numbers (PERF.md §1)."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig
    from privacy_preserve_federated_asr_tpu.models.backbone import EncoderLayer

    cfg = BackboneConfig.data2vec_audio_large()
    d = cfg.hidden_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, t, d)), jnp.bfloat16)
    key_mask = jnp.ones((b, t), jnp.int32)
    layer = EncoderLayer(cfg, jnp.bfloat16)
    params = layer.init({"params": jax.random.PRNGKey(0)}, x, None, True,
                        key_mask)["params"]
    fl = 24 * (2 * b * t * 12 * d * d)

    def stack(p, x):
        h = x
        for _ in range(24):
            h = layer.apply({"params": p}, h, None, True, key_mask)
        return h

    fwd = jax.jit(lambda p, x: stack(p, x).sum())
    dt = time_fn(fwd, (params, x), flush=float)
    print(json.dumps({"config": f"stack24 fwd B={b} T={t}",
                      "ms": round(dt * 1e3, 2),
                      "tflops": round(fl / dt / 1e12, 1)}), flush=True)
    bwd = jax.jit(lambda p, x: jax.grad(lambda xx: stack(p, xx).sum())(x))
    dt = time_fn(bwd, (params, x),
                 flush=lambda g: float(g[0, 0, 0]))
    print(json.dumps({"config": f"stack24 fwd+bwd B={b} T={t}",
                      "ms": round(dt * 1e3, 2),
                      "tflops": round(3 * fl / dt / 1e12, 1)}), flush=True)


def bench_fl_round(stage=2, n_clients=2, utts_per_client=32, batch=8,
                   seconds=5.0):
    """One full jitted FL round (vmap over clients x local scan + FedAvg +
    graft) on the flagship data2vec-large model — the federated hot loop
    at production shapes, on one chip."""
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
    from privacy_preserve_federated_asr_tpu.federated import (
        FederatedConfig, FederatedEngine)
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    samples = int(16000 * seconds)
    tok = CTCCharTokenizer()
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=stage, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)

    def mk_examples(n, seed):
        r = np.random.default_rng(seed)
        out = []
        for i in range(n):
            arr = r.normal(0, 0.5, size=samples).astype(np.float32)
            text = "THE BOY IS STEALING COOKIES FROM THE JAR"[: 8 + i % 24]
            out.append(AsrExample(
                path=f"S{seed}{i:03d}_PAR_0_0.wav", array=arr, text=text,
                dementia_label=i % 2, input_values=arr,
                labels=np.asarray(tok.encode(text), dtype=np.int32)))
        return out

    fcfg = FederatedConfig(
        num_rounds=1, num_clients=n_clients, frac=1.0, local_ep=1,
        batch_size=batch, time_multiple=samples, warmup_steps=1,
        compute_dtype="bfloat16")
    eng = FederatedEngine(
        cfg, fcfg,
        {i: mk_examples(utts_per_client, seed=i) for i in range(n_clients)},
        None, None, tok, params)

    t0 = time.perf_counter()
    eng.run_rounds(stage=stage, num_rounds=1)  # compile + run
    compile_and_first = time.perf_counter() - t0
    n_timed = 4
    t0 = time.perf_counter()
    # ONE multi-round call: cross-round build/execute overlap only engages
    # within a run_rounds invocation
    eng.run_rounds(stage=stage, num_rounds=n_timed)
    dt = (time.perf_counter() - t0) / n_timed
    utts = n_clients * utts_per_client
    print(json.dumps({
        "config": f"flround st={stage} K={n_clients} "
                  f"{utts_per_client}utt x {seconds}s B={batch}",
        "first_round_incl_compile_s": round(compile_and_first, 1),
        "round_ms": round(dt * 1e3, 1),
        "utt_per_sec": round(utts / dt, 1)}), flush=True)


def bench_fl_memory(data_axes=(1, 2, 4), ks=(2, 4, 8)):
    """The federated stage-0 K envelope, from real param shapes: HBM bytes
    of the stacked per-client state inside one round — bf16 broadcast
    params + per-client fp32 Adam moments (2x fp32 trainable bytes, the
    dominant term PERF.md §5 flags) — per client-group device, with and
    without ZeRO-1 (FederatedConfig.zero1: moments sharded over the 'data'
    axis, parallel/zero.py). Analytic on purpose: this box has ONE chip, so
    multi-device residency can't be measured here, but the byte math is
    exact given the shapes. Assumes mesh client axis == K (one client per
    group); with K_local = K/client_axis clients vmapped per group,
    multiply the per-device numbers by K_local. K envelope rule of thumb:
    fits when state_gb_per_device + ~4 GB activations/caches < 16 GB
    (v5e)."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=0, ad_loss="recall")
    params = jax.eval_shape(
        lambda: init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # stage 0 trains the ASR sub-network (backbone + lm_head) — in
    # data2vec-large that is ~99.9% of the params; count it exactly
    n_train = sum(
        int(np.prod(x.shape))
        for k, sub in params.items() if k in ("backbone", "lm_head")
        for x in jax.tree.leaves(sub))
    for k in ks:
        for dn in data_axes:
            # mesh (client=K, data=dn): each device group holds ONE
            # client's params (bf16 broadcast) + its fp32 Adam mu+nu,
            # moments /dn under zero1
            param_b = 2 * n_params            # bf16 compute copy
            mom_b = 2 * 4 * n_train           # fp32 mu + nu
            plain = param_b + mom_b
            z1 = param_b + mom_b / dn
            print(json.dumps({
                "config": f"flmem st=0 K={k} data={dn} "
                          f"({n_params / 1e6:.0f}M params)",
                "state_gb_per_device_plain": round(plain / 1e9, 2),
                "state_gb_per_device_zero1": round(z1 / 1e9, 2),
                "zero1_saving_gb": round((plain - z1) / 1e9, 2),
                "devices": k * dn}), flush=True)


def bench_posconv(b=16, t=249):
    """Positional conv embedding stack at bench shapes."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig
    from privacy_preserve_federated_asr_tpu.models.backbone import (
        PositionalConvEmbedding)

    cfg = BackboneConfig.data2vec_audio_large()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, t, cfg.hidden_size)), jnp.bfloat16)
    pc = PositionalConvEmbedding(cfg, jnp.bfloat16)
    pp = pc.init(jax.random.PRNGKey(0), x)["params"]
    fwd = jax.jit(lambda p, x: pc.apply({"params": p}, x).sum())
    dt = time_fn(fwd, (pp, x), flush=float)
    print(json.dumps({"config": f"posconv fwd B={b} T={t}",
                      "ms": round(dt * 1e3, 3)}), flush=True)
    bwd = jax.jit(lambda p, x: jax.grad(
        lambda p: pc.apply({"params": p}, x).sum())(p))
    dt = time_fn(bwd, (pp, x),
                 flush=lambda g: float(jax.tree.leaves(g)[0].ravel()[0]))
    print(json.dumps({"config": f"posconv fwd+bwd(params) B={b} T={t}",
                      "ms": round(dt * 1e3, 3)}), flush=True)


def bench_decomp():
    """Where do the 102ms go? Time each stage of the flagship train step."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.models.backbone import (
        FeatureEncoder, feat_extract_output_lengths)
    from privacy_preserve_federated_asr_tpu.models.objectives import dacs_loss
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import DeviceBatch, make_train_step
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state, init_dacs_params)

    B, SAMPLES, LABEL_LEN = 16, 80000, 48
    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=0, ad_loss="recall")
    model = DACSModel(cfg, dtype=jnp.bfloat16, remat=False)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    tx = make_optimizer(jax.eval_shape(lambda: params), stage=0,
                        warmup_steps=100, total_steps=10_000)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    lengths = rng.integers(int(0.7 * SAMPLES), SAMPLES, size=B)
    lengths[0] = SAMPLES
    iv = rng.normal(0, 1, size=(B, SAMPLES)).astype(np.float32)
    batch = DeviceBatch(
        input_values=jnp.asarray(iv),
        input_lengths=jnp.asarray(lengths, dtype=jnp.int32),
        labels=jnp.asarray(rng.integers(4, 32, (B, LABEL_LEN)), jnp.int32),
        label_lengths=jnp.full((B,), LABEL_LEN, jnp.int32),
        dementia_labels=jnp.asarray(rng.integers(0, 2, B), jnp.int32),
        sample_mask=jnp.ones((B,), jnp.float32))
    res = {}

    # 1. full train step
    step = jax.jit(make_train_step(model, tx, cfg))
    holder = {"s": state}
    def run_full(b):
        holder["s"], m = step(holder["s"], b)
        return m["loss"]
    res["full_step"] = time_fn(run_full, (batch,), flush=float) * 1e3

    # 2. forward + loss only (no grad)
    def fwd_loss(params, b, rng):
        out = model.apply({"params": params}, b.input_values, b.input_lengths,
                          deterministic=False, rngs={"gumbel": rng, "dropout": rng})
        loss, _ = dacs_loss(out, b.labels, b.label_lengths, b.dementia_labels,
                            cfg, params["similar_fc"]["kernel"], b.sample_mask,
                            aux_metrics=False)
        return loss
    jf = jax.jit(fwd_loss)
    key = jax.random.PRNGKey(2)
    res["fwd_loss"] = time_fn(jf, (state.params, batch, key), flush=float) * 1e3

    # 3. value_and_grad without optimizer. NB: the grads must stay live in
    # the jitted output or XLA dead-code-eliminates the entire backward
    # (returning only the loss measured == fwd_loss).
    def vg(p, b, r):
        loss, grads = jax.value_and_grad(fwd_loss)(p, b, r)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads))
    jg = jax.jit(vg)
    res["fwd_bwd"] = time_fn(jg, (state.params, batch, key), flush=float) * 1e3

    # 4. frozen conv feature extractor forward alone
    fe = FeatureEncoder(cfg.backbone, jnp.bfloat16)
    fe_params = params["backbone"]["feature_extractor"]
    jfe = jax.jit(lambda p, x: fe.apply({"params": p}, x).sum())
    res["feature_extractor_fwd"] = time_fn(
        jfe, (fe_params, batch.input_values), flush=float) * 1e3

    # 5. optimizer update alone (grads = params-shaped ones)
    grads = jax.tree.map(jnp.ones_like, state.params)
    jopt = jax.jit(lambda g, s: tx.update(g, s.opt_state, s.params)[0])
    res["optimizer_update"] = time_fn(
        jopt, (grads, state), flush=lambda u: float(
            jax.tree.leaves(u)[0].reshape(-1)[0])) * 1e3

    for k, v in res.items():
        print(json.dumps({"component": k, "ms": round(v, 2)}), flush=True)


if __name__ == "__main__":
    main()
