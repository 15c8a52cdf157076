"""TPU-native batched inference engine (serving path).

The reference has NO serving layer — inference there is batch evaluation
only (SURVEY.md §1: "no serving layer"). This module adds the production
path the reference lacks, built on the same jitted forward the evaluator
uses (evaluation/extract.py):

* **Static shapes**: incoming audio is padded up to quantized time buckets
  (multiples of ``time_multiple``, capped at ``max_seconds``) and batches
  are padded to a fixed ``batch_size`` — the set of compiled programs is
  bounded by the bucket grid, and every program can be precompiled at
  startup (:meth:`InferenceEngine.warmup`) so no request ever pays a
  compile.
* **Micro-batching**: concurrent requests are coalesced into one device
  batch (up to ``batch_size``, waiting at most ``batch_window_ms``) by a
  single dispatcher thread — TPU throughput comes from batched matmuls,
  not per-request forwards.

Outputs per utterance: greedy CTC transcript, AD prediction via the
reference's frame-majority vote (federated/src/update.py:162-212
``map_to_result``: mean over timesteps of argmax > 0.5) plus the mean
AD-class probability over valid frames.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio import normalize_input_values
from ..data.tokenizer import CTCCharTokenizer
from ..models.config import DACSConfig
from ..models.recipes import get_recipe
from ..ops.decode import ad_vote, greedy_ids


@dataclass
class ServingConfig:
    batch_size: int = 8
    time_multiple: int = 16000       # bucket quantum (1 s @ 16 kHz)
    max_seconds: float = 30.0        # longest accepted utterance
    batch_window_ms: float = 10.0    # micro-batch coalescing window
    normalize: bool = True           # feature-extractor normalization
    # production inference precision: "float32" | "bfloat16" | "int8"
    # (bf16 + dynamic-W8A8 quantized Dense matmuls, ops/quant.py)
    compute_dtype: str = "bfloat16"
    # 0 = greedy (reference parity); >0 = CTC prefix beam search on the
    # host over the device log-posteriors (ops/beam.py), optionally with
    # shallow LM fusion via ``lm_fn`` passed to InferenceEngine
    beam_size: int = 0
    lm_alpha: float = 0.3
    lm_beta: float = 0.0
    # sample-count buckets to precompile at startup; () = every bucket of
    # the grid (ceil(max_seconds) programs)
    warmup_buckets: tuple[int, ...] = ()
    # host->device waveform encoding for the batch path. "int16" halves
    # the dominant serving cost (PERF.md §6: the B x T x 4-byte fp32 batch
    # upload rides PCIe / the tunnel): each utterance ships as abs-max-
    # scaled int16 + one fp32 scale, dequantized AND normalized on device.
    # With ``normalize`` on (the feature-extractor default) the per-row
    # scale cancels exactly in the zero-mean/unit-variance normalization,
    # so the only numeric effect is the ~3e-5 relative int16 rounding.
    transport: str = "float32"       # "float32" | "int16"


@dataclass
class InferenceResult:
    transcript: str
    ad_pred: int            # reference frame-majority vote
    ad_prob: float          # mean P(AD) over valid frames
    frames: int             # valid encoder frames
    samples: int            # input samples consumed


class InferenceEngine:
    """Jitted, bucketed, micro-batched forward over the method's model.

    ``infer_batch`` is the synchronous core; ``submit``/``infer`` go
    through the micro-batching dispatcher (start it with :meth:`start`).
    """

    def __init__(
        self,
        cfg: DACSConfig,
        params,
        tokenizer: CTCCharTokenizer | None = None,
        scfg: ServingConfig | None = None,
        lm_fn=None,
    ):
        scfg = scfg if scfg is not None else ServingConfig()
        self.cfg = cfg
        self.scfg = scfg
        self.tokenizer = tokenizer or CTCCharTokenizer()
        self.params = params
        # "int8" = bf16 + dynamic-W8A8 Dense matmuls (ops/quant.py) on the
        # MXU's double-rate s8 path — the serving-precision ladder
        cfg, dtype = cfg.resolve_compute(scfg.compute_dtype)
        self.cfg = cfg
        recipe = get_recipe(cfg.method)
        self.model = recipe.make_model(cfg, dtype=dtype)

        self._lm_fn = lm_fn
        beam = scfg.beam_size > 0

        def forward(p, input_values, input_lengths):
            out = self.model.apply(
                {"params": p}, input_values, input_lengths,
                deterministic=True, rngs={"gumbel": jax.random.PRNGKey(0)},
            )
            # serve the method's evaluation streams (models/recipes.py —
            # e.g. DACS stage 2: privacy-masked ASR + AD-masked classifier)
            logits, dlog = recipe.eval_streams(out, cfg)
            pred = greedy_ids(logits, out.frame_mask, cfg.backbone.pad_token_id)
            ad_pred = ad_vote(dlog, out.frame_mask)
            probs = jax.nn.softmax(dlog.astype(jnp.float32), axis=-1)[..., 1]
            fm = out.frame_mask.astype(jnp.float32)
            ad_prob = (probs * fm).sum(-1) / jnp.maximum(fm.sum(-1), 1.0)
            if beam:  # host-side beam decode needs the log-posteriors
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                return pred, ad_pred, ad_prob, out.frame_lengths, lp
            return pred, ad_pred, ad_prob, out.frame_lengths

        self._forward = jax.jit(forward)

        def _mask_normalize(x, il, t):
            """Masked zero-mean/unit-var normalization on device (the host
            twin is data/audio.py normalize_input_values) — shared by the
            int16 batch path and the resident-streaming forwards."""
            mask = (jnp.arange(t)[None, :] < il[:, None]).astype(jnp.float32)
            if self.scfg.normalize:
                cnt = jnp.maximum(il.astype(jnp.float32), 1.0)
                mean = (x * mask).sum(-1) / cnt
                var = (jnp.square(x - mean[:, None]) * mask).sum(-1) / cnt
                x = (x - mean[:, None]) / jnp.sqrt(var + 1e-7)[:, None]
            return x * mask

        if scfg.transport not in ("float32", "int16"):
            raise ValueError(f"unknown transport {scfg.transport!r}")
        if scfg.transport == "int16":
            # separate program: int16 payload + per-row scale in, dequant +
            # masked normalization on device
            def forward_i16(p, iv_i16, scales, input_lengths):
                x = iv_i16.astype(jnp.float32) * scales[:, None]
                return forward(
                    p, _mask_normalize(x, input_lengths, x.shape[1]),
                    input_lengths)

            self._forward_i16 = jax.jit(forward_i16)

        # ---- device-resident streaming programs (serving/streaming.py) ----
        # A streaming session keeps its audio window ON DEVICE and uploads
        # only the audio that arrived since the last pass: per-pass transport
        # shrinks from the whole (batch_size, t) padded window to one chunk
        # (PERF.md §6: the upload IS the dominant serving cost on this
        # platform). Appends are dynamic_update_slice writes at a traced
        # offset (one program per chunk bucket); the forward slices the
        # buffer and does the masked zero-mean/unit-var normalization on
        # device (the host twin is data/audio.py normalize_input_values).
        def append_f32(buf, chunk, offset):
            return jax.lax.dynamic_update_slice(buf, chunk, (offset,))

        def append_i16(buf, chunk_i16, scale, offset):
            return jax.lax.dynamic_update_slice(
                buf, chunk_i16.astype(jnp.float32) * scale, (offset,))

        self._append_f32 = jax.jit(append_f32)
        self._append_i16 = jax.jit(append_i16)

        # batched variants for StreamingHub: R concurrent sessions' chunk
        # uploads land in ONE program (vmapped dynamic_update_slice with
        # per-row offsets) and their passes share one batched forward —
        # 2 RPCs per hop for the whole fleet instead of 2 per session
        self._append_f32_b = jax.jit(jax.vmap(append_f32))
        self._append_i16_b = jax.jit(jax.vmap(append_i16))

        def forward_res(p, buf, n, t):
            x = jax.lax.slice(buf, (0,), (t,))[None, :]
            il = jnp.reshape(n, (1,)).astype(jnp.int32)
            return forward(p, _mask_normalize(x, il, t), il)

        self._forward_res = jax.jit(forward_res, static_argnums=(3,))

        def forward_res_b(p, bufs, ils, t):
            x = jax.lax.slice(bufs, (0, 0), (bufs.shape[0], t))
            ils = ils.astype(jnp.int32)
            return forward(p, _mask_normalize(x, ils, t), ils)

        self._forward_res_b = jax.jit(forward_res_b, static_argnums=(3,))
        self._queue: queue.Queue = queue.Queue()
        self._worker: threading.Thread | None = None
        self._stop = threading.Event()

    # ---- shape management ----

    # chunk uploads for resident streaming sessions are bucketed to
    # STREAM_CHUNK_QUANTUM samples (bounds the append-program count);
    # feeds larger than STREAM_CHUNK_MAX are split host-side so a bucketed
    # write never clamps against the buffer end
    STREAM_CHUNK_QUANTUM = 2048
    STREAM_CHUNK_MAX = 65536

    @property
    def max_samples(self) -> int:
        return int(self.scfg.max_seconds * 16000)

    def alloc_stream_buffer(self) -> jax.Array:
        """Fresh zeroed device window for a resident streaming session
        (padded by one max chunk so dynamic_update_slice never clamps)."""
        return jnp.zeros(
            (self.max_samples + self.STREAM_CHUNK_MAX,), jnp.float32)

    def append_stream(self, buf: jax.Array, audio: np.ndarray,
                      offset: int) -> jax.Array:
        """Upload ``audio`` into ``buf`` at sample ``offset`` and return the
        new buffer. Pieces are bucketed to STREAM_CHUNK_QUANTUM; with
        ``transport="int16"`` each piece ships as abs-max-scaled int16 + one
        fp32 scale and is dequantized on device (per-piece scales — finer
        than the batch path's per-row scale)."""
        q, cmax = self.STREAM_CHUNK_QUANTUM, self.STREAM_CHUNK_MAX
        audio = np.asarray(audio, np.float32).reshape(-1)
        for i in range(0, len(audio), cmax):
            piece = audio[i : i + cmax]
            b = -(-len(piece) // q) * q
            if self.scfg.transport == "int16":
                amax = float(np.max(np.abs(piece))) if len(piece) else 0.0
                sc = np.float32(amax / 32767.0 if amax > 0.0 else 0.0)
                pad = np.zeros((b,), np.int16)
                if amax > 0.0:
                    pad[: len(piece)] = np.clip(
                        np.rint(piece / sc), -32767, 32767).astype(np.int16)
                buf = self._append_i16(buf, pad, sc, np.int32(offset + i))
            else:
                pad = np.zeros((b,), np.float32)
                pad[: len(piece)] = piece
                buf = self._append_f32(buf, pad, np.int32(offset + i))
        return buf

    def alloc_stream_buffers(self, rows: int) -> jax.Array:
        """Stacked zeroed device windows for a :class:`StreamingHub`."""
        return jnp.zeros(
            (rows, self.max_samples + self.STREAM_CHUNK_MAX), jnp.float32)

    def reset_stream_row(self, bufs: jax.Array, row: int) -> jax.Array:
        """Zero one hub row so it can be reused (the append path relies on
        unwritten buffer regions being zero)."""
        if not hasattr(self, "_reset_row"):
            self._reset_row = jax.jit(
                lambda b, r: b.at[r].set(0.0))
        return self._reset_row(bufs, np.int32(row))

    def append_stream_batch(self, bufs: jax.Array, chunks: np.ndarray,
                            offsets: np.ndarray) -> jax.Array:
        """One batched frontier write for a hub: ``chunks[r]`` lands in
        ``bufs[r]`` at ``offsets[r]`` (vmapped dynamic_update_slice — every
        row ships, so give idle rows zero chunks at their frontier, which
        the zero-invariant makes a no-op). ``chunks`` columns must be
        <= STREAM_CHUNK_MAX (split larger uploads host-side); int16
        transport quantizes per row."""
        assert chunks.shape[1] <= self.STREAM_CHUNK_MAX
        offsets = np.asarray(offsets, np.int32)
        if self.scfg.transport == "int16":
            amax = np.max(np.abs(chunks), axis=1)
            sc = np.where(amax > 0.0, amax / 32767.0, 0.0).astype(np.float32)
            safe = np.where(sc > 0.0, sc, 1.0)
            q = np.clip(np.rint(chunks / safe[:, None]),
                        -32767, 32767).astype(np.int16)
            return self._append_i16_b(bufs, q, sc, offsets)
        return self._append_f32_b(bufs, chunks.astype(np.float32), offsets)

    def warmup_streaming(self, buckets: Sequence[int] | None = None,
                         chunk_samples: int = 8000,
                         hub: bool = False) -> int:
        """Precompile the resident-streaming programs: one forward per time
        bucket plus the append program for ``chunk_samples``-sized feeds;
        with ``hub`` also the StreamingHub's batched forward/append per
        bucket. Returns the number of forward programs compiled."""
        buckets = list(buckets) if buckets is not None else self._buckets()
        buf = self.alloc_stream_buffer()
        buf = self.append_stream(buf, np.zeros((chunk_samples,), np.float32), 0)
        for t in buckets:
            jax.block_until_ready(
                self._forward_res(self.params, buf, np.int32(t), t))
        if hub:
            q = self.STREAM_CHUNK_QUANTUM
            c = min(-(-max(chunk_samples, 1) // q) * q, self.STREAM_CHUNK_MAX)
            bufs = self.alloc_stream_buffers(self.scfg.batch_size)
            bufs = self.append_stream_batch(
                bufs, np.zeros((self.scfg.batch_size, c), np.float32),
                np.zeros((self.scfg.batch_size,), np.int32))
            ils = np.zeros((self.scfg.batch_size,), np.int32)
            for t in buckets:
                jax.block_until_ready(
                    self._forward_res_b(self.params, bufs, ils, t))
            return 2 * len(buckets)
        return len(buckets)

    def _bucket(self, n_samples: int) -> int:
        q = self.scfg.time_multiple
        return min(-(-max(n_samples, 1) // q) * q, self.max_samples)

    def _buckets(self) -> list[int]:
        if self.scfg.warmup_buckets:
            return sorted(set(self._bucket(b) for b in self.scfg.warmup_buckets))
        q = self.scfg.time_multiple
        grid = list(range(q, self.max_samples + 1, q))
        if not grid or grid[-1] != self.max_samples:
            # max_seconds not on the grid: the capped bucket is reachable
            # (any input > the last grid bucket lands there) — precompile it
            grid.append(self.max_samples)
        return grid

    def warmup(self, buckets: Sequence[int] | None = None) -> int:
        """Compile the forward for every bucket shape up front; returns the
        number of programs compiled."""
        buckets = list(buckets) if buckets is not None else self._buckets()
        for t in buckets:
            il = jnp.full((self.scfg.batch_size,), t, jnp.int32)
            if self.scfg.transport == "int16":
                iv = jnp.zeros((self.scfg.batch_size, t), jnp.int16)
                sc = jnp.ones((self.scfg.batch_size,), jnp.float32)
                jax.block_until_ready(
                    self._forward_i16(self.params, iv, sc, il))
            else:
                iv = jnp.zeros((self.scfg.batch_size, t), jnp.float32)
                jax.block_until_ready(self._forward(self.params, iv, il))
        return len(buckets)

    # ---- synchronous batched inference ----

    def infer_batch(self, arrays: Sequence[np.ndarray]) -> list[InferenceResult]:
        """Run one padded device batch over ``arrays`` (float waveforms at
        16 kHz). Arrays longer than ``max_seconds`` are truncated; the batch
        is split into chunks of ``batch_size``."""
        if not arrays:
            return []
        out: list[InferenceResult] = []
        bs = self.scfg.batch_size
        for i in range(0, len(arrays), bs):
            out.extend(self._infer_chunk(arrays[i : i + bs]))
        return out

    def _infer_chunk(self, arrays: Sequence[np.ndarray]) -> list[InferenceResult]:
        bs = self.scfg.batch_size
        i16 = self.scfg.transport == "int16"
        xs = []
        for a in arrays:
            a = np.asarray(a, np.float32).reshape(-1)[: self.max_samples]
            if self.scfg.normalize and not i16:  # int16: normalized on device
                a = normalize_input_values(a)
            xs.append(a)
        t = self._bucket(max(len(a) for a in xs))
        il = np.zeros((bs,), np.int32)
        if i16:
            iv = np.zeros((bs, t), np.int16)
            sc = np.ones((bs,), np.float32)
            for i, a in enumerate(xs):
                n = min(len(a), t)
                il[i] = n
                amax = float(np.max(np.abs(a[:n]))) if n else 0.0
                if amax > 0.0:
                    sc[i] = amax / 32767.0
                    iv[i, :n] = np.clip(
                        np.rint(a[:n] / sc[i]), -32767, 32767).astype(np.int16)
            got = jax.device_get(self._forward_i16(
                self.params, jnp.asarray(iv), jnp.asarray(sc),
                jnp.asarray(il)))
        else:
            iv = np.zeros((bs, t), np.float32)
            for i, a in enumerate(xs):
                n = min(len(a), t)
                iv[i, :n] = a[:n]
                il[i] = n
            got = jax.device_get(
                self._forward(self.params, jnp.asarray(iv), jnp.asarray(il)))
        pred, ad_pred, ad_prob, flen = got[:4]
        if self.scfg.beam_size > 0:
            from ..ops.beam import beam_search_batch

            beams = beam_search_batch(
                got[4][: len(xs)], flen[: len(xs)],
                beam_size=self.scfg.beam_size,
                blank_id=self.cfg.backbone.pad_token_id,
                lm_fn=self._lm_fn, lm_alpha=self.scfg.lm_alpha,
                lm_beta=self.scfg.lm_beta)
            # beam ids are already CTC-collapsed: decode without grouping
            # (legitimate repeated characters must survive)
            texts = [self.tokenizer.decode(b[0].ids, group_tokens=False)
                     for b in beams]
        else:
            texts = [self.tokenizer.decode(pred[i]) for i in range(len(xs))]
        return [
            InferenceResult(
                transcript=texts[i],
                ad_pred=int(ad_pred[i]),
                ad_prob=float(ad_prob[i]),
                frames=int(flen[i]),
                samples=int(il[i]),
            )
            for i in range(len(xs))
        ]

    # ---- micro-batching dispatcher ----

    def start(self) -> None:
        """Start the micro-batching dispatcher thread (idempotent)."""
        if self._worker is not None and self._worker.is_alive():
            return
        self._stop.clear()
        self._worker = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._queue.put(None)  # wake the dispatcher
            self._worker.join(timeout=5)
            self._worker = None
        # fail any request still queued rather than leaving its Future
        # pending forever
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("inference engine stopped"))

    def submit(self, array: np.ndarray) -> "Future[InferenceResult]":
        """Enqueue one utterance; resolves when its micro-batch runs."""
        fut: Future = Future()
        self._queue.put((array, fut))
        return fut

    def infer(self, array: np.ndarray, timeout: float | None = 60.0) -> InferenceResult:
        if self._worker is None or not self._worker.is_alive():
            return self.infer_batch([array])[0]
        return self.submit(array).result(timeout=timeout)

    def _dispatch_loop(self) -> None:
        window = self.scfg.batch_window_ms / 1e3
        bs = self.scfg.batch_size
        while not self._stop.is_set():
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if item is None:
                continue
            batch = [item]
            # coalesce what arrives before the deadline, up to batch_size —
            # the deadline is fixed from the FIRST item, so no request waits
            # more than batch_window_ms before its batch launches
            deadline = time.monotonic() + window
            while len(batch) < bs:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            arrays = [a for a, _ in batch]
            futures = [f for _, f in batch]
            try:
                results = self.infer_batch(arrays)
                for f, r in zip(futures, results):
                    f.set_result(r)
            except Exception as e:  # propagate to every waiter
                for f in futures:
                    if not f.done():
                        f.set_exception(e)
