"""Headline benchmark: DACS stage-1 (ASR fine-tune) training throughput on
the flagship data2vec-audio-large model, in utterances/sec/chip.

Measures the framework's default stage-0 training path (Trainer
cache_frontend): the frozen, dropout-free conv feature extractor runs ONCE
per utterance at cache-build time (done in setup here, as in
Trainer._build_frontend_cache), and the timed step is the real per-step
program — gather from the cache + feature-projection/encoder/heads
forward-backward + AdamW update (steps.make_feature_train_step, numerics
equivalence-tested against the full forward in tests/test_trainer.py).

Baseline (BASELINE.md): the reference trains the same recipe at ~3.135
samples/s on one GPU (fp16, batch 1, gradient checkpointing) — HF Trainer
``train_samples_per_second`` from the committed FL logs. ``vs_baseline`` is
the speedup over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The
line additionally carries ``fl_round_stage0`` / ``fl_round_stage2``
sub-objects — one timed stage-0 device-resident federated engine round and
one stage-2 cached-encoder round at small fixed shapes (same median/trial
discipline) — so the artifact of record regression-tracks the federated
path, not just the centralized step (VERDICT r3 #3).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_UTT_PER_SEC = 3.135
BATCH = 16
SECONDS_PER_UTT = 5.0          # ADReSS-like average utterance length
SAMPLES = int(16000 * SECONDS_PER_UTT)
LABEL_LEN = 48
WARMUP_STEPS = 5
MEASURE_STEPS = 20             # per trial
TRIALS = 3                     # median of >= 3 trials is the headline
MAX_TRIALS = 6                 # extra trials when the spread says "noisy"
SPREAD_RETRY = 0.10            # rel. spread above this -> run another trial


def _arm_watchdog(seconds: float) -> None:
    """Hard exit if the bench wedges (e.g. the remote-compile tunnel hangs,
    observed 2026-08-18) — a stuck bench must not stall the driver."""
    import os
    import sys
    import threading

    def boom():
        print(f"bench watchdog: no result after {seconds:.0f}s, aborting",
              file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()


def _wait_for_backend() -> None:
    """Probe TPU backend health in a SUBPROCESS, retrying for a bounded
    window (BENCH_INIT_WAIT_S, default 15 min). The tunnel to the chip
    flaps (observed down for stretches of 2026-08-18, backend init raising
    UNAVAILABLE); a failed in-process init is cached by jax for the life of
    the process, so the probe must be out-of-process. If the window
    expires, proceed anyway — the real run produces the genuine error."""
    import os
    import subprocess
    import sys
    import time as _t

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    deadline = _t.monotonic() + float(os.environ.get("BENCH_INIT_WAIT_S", "900"))
    probe = "import jax; jax.devices()"
    while True:
        try:
            ok = subprocess.run([sys.executable, "-c", probe],
                                capture_output=True,
                                timeout=300).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if _t.monotonic() >= deadline:
            print("bench: TPU backend still unavailable after the init "
                  "window; attempting the run anyway", file=sys.stderr,
                  flush=True)
            return
        _t.sleep(30)


def _fl_round_metrics(stage: int, *, n_clients=2, utts_per_client=16,
                      batch=8, seconds=5.0, trials=3) -> dict:
    """Median round time of the jitted federated engine round (vmap over
    clients + FedAvg + graft) on the flagship model at small fixed shapes.
    stage=0 runs the device-resident full-backbone path; stage=2 runs the
    cached-encoder (res_h) head-only path — the two engine fast paths
    PERF.md §5 measures. Shapes are fixed so the numbers are comparable
    across rounds/commits."""
    import jax
    import numpy as np

    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
    from privacy_preserve_federated_asr_tpu.federated import (
        FederatedConfig,
        FederatedEngine,
    )
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

    eng.run_rounds(stage=stage, num_rounds=1)  # compile + warm caches
    rounds_per_trial = 2
    rates, times = [], []

    def one_trial():
        t0 = time.perf_counter()
        eng.run_rounds(stage=stage, num_rounds=rounds_per_trial)
        dt = (time.perf_counter() - t0) / rounds_per_trial
        times.append(dt)
        rates.append(n_clients * utts_per_client / dt)

    for _ in range(trials):
        one_trial()
    # same tunnel-flap discipline as the headline: re-trial while the
    # relative spread is wide, up to 6 trials (median of more samples)
    while (max(rates) - min(rates)) / np.median(rates) > 0.15 and len(rates) < 6:
        one_trial()
    return {
        "round_ms": round(float(np.median(times)) * 1e3, 1),
        "utt_per_sec": round(float(np.median(rates)), 1),
        "trials_utt_per_sec": [round(r, 1) for r in rates],
        "shape": f"K={n_clients} {utts_per_client}utt x {seconds}s B={batch}",
    }


def _serving_metrics() -> dict:
    """Serving-ladder rows for the artifact of record (VERDICT r4 item
    #3): the measured wins in PERF.md §6 — batched serving, device-
    resident streaming, the StreamingHub's one-batched-pass-per-hop —
    previously lived only in one-off perf_lab prose; a regression in
    serving/engine.py or serving/streaming.py performance was invisible.
    Small fixed shapes, median of >= 3 trials with the same spread-retry
    discipline as the headline. ONE engine (batch_size=8, 3 s buckets)
    serves all three rows to bound the program count on the remote
    compile service."""
    import jax

    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine,
        ServingConfig,
        StreamingConfig,
        StreamingHub,
        StreamingSession,
    )
    from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(final_dropout=0.0),
        stage=2, ad_loss="recall")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    eng = InferenceEngine(cfg, params, None, ServingConfig(
        batch_size=8, time_multiple=48000, max_seconds=5.0,
        compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    waves = [rng.normal(0, 0.3, size=80000).astype(np.float32)
             for _ in range(8)]
    chunk = 8000  # 0.5 s
    audios = [rng.normal(0, 0.3, size=48000).astype(np.float32)
              for _ in range(8)]
    scfg = StreamingConfig(right_context_seconds=0.4, min_hop_seconds=0.5)
    eng.warmup([80000])
    eng.warmup_streaming(chunk_samples=chunk, hub=True)

    def median_ms(run, n_units=1, trials=3, max_trials=6, spread_max=0.15):
        run()  # warm
        vals = [run() for _ in range(trials)]
        while ((max(vals) - min(vals)) / float(np.median(vals)) > spread_max
               and len(vals) < max_trials):
            vals.append(run())
        return round(float(np.median(vals)) * 1e3 / n_units, 2), [
            round(v * 1e3, 1) for v in vals]

    def run_batch():
        t0 = time.perf_counter()
        rs = eng.infer_batch(waves)
        _ = rs[-1].ad_prob
        return time.perf_counter() - t0

    n_hops = len(audios[0]) // chunk + 1

    def run_stream():
        s = StreamingSession(eng, scfg)
        t0 = time.perf_counter()
        for i in range(0, len(audios[0]), chunk):
            s.feed(audios[0][i : i + chunk])
        s.finish()
        return time.perf_counter() - t0

    def run_hub():
        hub = StreamingHub(eng, scfg)
        ss = [hub.open() for _ in audios]
        t0 = time.perf_counter()
        for i in range(0, len(audios[0]), chunk):
            for k, s in enumerate(ss):
                s.feed(audios[k][i : i + chunk])
        for s in ss:
            s.finish()
        return time.perf_counter() - t0

    batch_ms, batch_trials = median_ms(run_batch)
    stream_ms, stream_trials = median_ms(run_stream, n_units=n_hops)
    hub_ms, hub_trials = median_ms(run_hub, n_units=n_hops)
    return {"serving": {
        "serving_batch8_ms": batch_ms,
        "serving_batch8_trials_ms": batch_trials,
        "stream_pass_ms": stream_ms,
        "stream_total_trials_ms": stream_trials,
        "hub_fleet_hop_ms": hub_ms,
        "hub_fleet_total_trials_ms": hub_trials,
        "shape": ("serve B=8x5s bf16 st=2; stream 3s/0.5s-chunks resident; "
                  f"hub N=8 ({n_hops} hops)"),
    }}


def _serve_only_main() -> None:
    import os

    _arm_watchdog(float(os.environ.get("BENCH_SERVE_TIMEOUT_S", "1500")) - 30.0)
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        rows = _serving_metrics()
    except Exception as e:  # noqa: BLE001 - report, don't die
        rows = {"serving": {"error": f"{type(e).__name__}: {e}"[:200]}}
    print(json.dumps(rows), flush=True)


def _aux_subprocess(flag: str, keys: tuple, timeout_env: str,
                    default_s: str) -> dict:
    """Run an aux metrics pass in a SUBPROCESS with its own time budget,
    BEFORE this process touches the TPU. Isolation matters twice: (a) a
    wedged run (tunnel hang) degrades to an "error" field instead of
    eating the headline's watchdog; (b) the axon tunnel serves one
    registered process at a time, so children run before the parent
    initializes its TPU client."""
    import os
    import subprocess
    import sys

    timeout = float(os.environ.get(timeout_env, default_s))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {k: {"error": f"timeout after {timeout:.0f}s"} for k in keys}
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return {k: {"error": f"rc={proc.returncode}: {' | '.join(tail)}"[:200]}
            for k in keys}


def _fl_rows_subprocess() -> dict:
    return _aux_subprocess("--fl-only", ("fl_round_stage0", "fl_round_stage2"),
                           "BENCH_FL_TIMEOUT_S", "1500")


def _serving_rows_subprocess() -> dict:
    return _aux_subprocess("--serve-only", ("serving",),
                           "BENCH_SERVE_TIMEOUT_S", "1500")


def _fl_only_main() -> None:
    import os

    _arm_watchdog(float(os.environ.get("BENCH_FL_TIMEOUT_S", "1500")) - 30.0)
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rows = {}
    for st, key in ((0, "fl_round_stage0"), (2, "fl_round_stage2")):
        try:
            rows[key] = _fl_round_metrics(st)
        except Exception as e:  # noqa: BLE001 - report, don't die
            rows[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(rows), flush=True)


def main() -> None:
    import os

    # budget covers: backend wait (<=900s) + FL subprocess (<=1500s) +
    # serving subprocess (<=1500s) + the headline's own compile/run
    _arm_watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "5400")))
    _wait_for_backend()
    fl_rows = _fl_rows_subprocess()
    serve_rows = _serving_rows_subprocess()
    import jax

    # RBG PRNG: threefry dropout-mask generation costs ~55 ms/step on this
    # model (measured); the hardware-backed RBG keeps full dropout semantics
    # at ~0 cost (101 -> 155 utt/s). Standard TPU recommendation.
    jax.config.update("jax_default_prng_impl", "rbg")
    # persistent compile cache: the remote-compile path costs minutes per
    # new program; repeat bench runs hit this cache
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import (
        frontend_forward_fn,
        gather_features,
        make_feature_train_step,
    )
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state,
        init_dacs_params,
    )

    cfg = DACSConfig(
        backbone=BackboneConfig.data2vec_audio_large().replace(
            # match the reference fine-tune setup (mask_time_prob=0 -> no
            # SpecAugment; dropouts as in the HF config)
            final_dropout=0.0,
        ),
        stage=0,
        ad_loss="recall",
    )
    model = DACSModel(cfg, dtype=jnp.bfloat16, remat=False)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    tx = make_optimizer(
        jax.eval_shape(lambda: params), stage=0, warmup_steps=100,
        total_steps=10_000,
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    fstep = make_feature_train_step(model, tx, cfg)
    train_step = jax.jit(
        lambda st, f, fl, lab, ll, dem, idx: fstep(
            st, gather_features(f, fl, lab, ll, dem, idx)),
        donate_argnums=(0,))

    rng = np.random.default_rng(0)
    lengths = rng.integers(int(0.7 * SAMPLES), SAMPLES, size=BATCH)
    lengths[0] = SAMPLES
    iv = rng.normal(0, 1, size=(BATCH, SAMPLES)).astype(np.float32)
    for i, ln in enumerate(lengths):
        iv[i, ln:] = 0.0
    labels = rng.integers(4, 32, size=(BATCH, LABEL_LEN)).astype(np.int32)

    # one-time conv-frontend cache build (Trainer._build_frontend_cache):
    # the frozen feature extractor runs once per utterance per training run
    feats, fl = jax.jit(frontend_forward_fn(model))(
        params, jnp.asarray(iv), jnp.asarray(lengths, dtype=jnp.int32))
    pad = lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])])  # scratch row
    cache = (pad(feats), pad(fl),
             pad(jnp.asarray(labels)),
             pad(jnp.full((BATCH,), LABEL_LEN, dtype=jnp.int32)),
             pad(jnp.asarray(rng.integers(0, 2, size=BATCH), dtype=jnp.int32)))
    idx = jnp.arange(BATCH, dtype=jnp.int32)

    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, *cache, idx)
    # force a host round-trip: on the experimental remote platform,
    # block_until_ready alone does not flush the execution queue
    float(metrics["loss"])

    # Median of >= TRIALS timed windows, each MEASURE_STEPS steps. One
    # window is not a measurement on this platform: the chip sits behind a
    # remote tunnel that flaps and stalls (observed 2026-08-18/19 — the
    # single-window r02 bench recorded 128.6 utt/s against a 155-167
    # steady-state), so a slow window must be outvoted, not averaged in.
    # If the relative spread across trials exceeds SPREAD_RETRY the window
    # set is judged degraded and extra trials run (up to MAX_TRIALS).
    def one_trial():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, metrics = train_step(state, *cache, idx)
        loss = float(metrics["loss"])   # sync: flushes the execution queue
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), loss
        return BATCH * MEASURE_STEPS / dt

    rates = [one_trial() for _ in range(TRIALS)]
    def spread(rs):
        return (max(rs) - min(rs)) / float(np.median(rs))
    while spread(rates) > SPREAD_RETRY and len(rates) < MAX_TRIALS:
        print(f"bench: trial spread {spread(rates):.1%} > {SPREAD_RETRY:.0%} "
              f"({[round(r, 1) for r in rates]}); running another trial",
              file=__import__("sys").stderr, flush=True)
        rates.append(one_trial())

    utt_per_sec = float(np.median(rates))
    print(json.dumps({
        "metric": "dacs_stage1_train_throughput_data2vec_large",
        "value": round(utt_per_sec, 3),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 3),
        "trials": [round(r, 3) for r in rates],
        "spread": round(spread(rates), 4),
        "steps_per_trial": MEASURE_STEPS,
        # kernel-level metric: device-resident batch, one-time frontend
        # cache build and host input pipeline excluded; end-to-end engine
        # rounds are the fl_round_* fields below (and PERF.md §5)
        "scope": "steady_state_train_step",
        **fl_rows,
        **serve_rows,
    }))


if __name__ == "__main__":
    import sys

    if "--fl-only" in sys.argv:
        _fl_only_main()
    elif "--serve-only" in sys.argv:
        _serve_only_main()
    else:
        main()
