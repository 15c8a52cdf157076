"""Whisper teacher model (encoder-decoder ASR), TPU-native.

The reference transcribes the unlabeled ADReSSo training clips offline with
``whisper.load_model('large-v2').transcribe(file, language='en')``
(reference: federated/src/federated_main.py:29-68 ``TeacherStudentLearning``).
This module is the TPU equivalent: a flax Whisper with

  * a JAX log-mel frontend (reflect-pad STFT -> slaney mel filterbank ->
    log10 -> whisper's max-8 clamp and /4 scaling), all static shapes,
  * a pre-norm transformer encoder over the 2-conv downsampled mel frames,
  * a decoder with KV-cache greedy decoding under ``lax.scan`` (one compiled
    program decodes the whole batch; no per-token Python),
  * :func:`port_hf_whisper` mapping an HF ``WhisperForConditionalGeneration``
    state_dict onto the param tree (any size: tiny ... large-v2).

Weights cannot be fetched in this container; correctness is locked by
random-init HF parity tests (tests/test_whisper.py) the same way the CTC
backbones are (models/port.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfigT:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 32
    num_heads: int = 20
    ffn_dim: int = 5120
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (multilingual vocab; large-v2 defaults)
    sot_token: int = 50258          # <|startoftranscript|>
    eot_token: int = 50257          # <|endoftext|>
    language_token: int = 50259     # <|en|>
    task_token: int = 50359         # <|transcribe|>
    no_timestamps_token: int = 50363
    prev_token: int = 50361         # <|startofprev|> (window conditioning)
    # first timestamp token id (<|0.00|>); None = no_timestamps_token + 1
    # (whisper's vocab layout). Timestamp token k encodes time
    # (k - timestamp_begin) * 0.02 s = one encoder frame (2 mel frames of
    # HOP samples) — see ``timestamp_stride_samples``.
    timestamp_begin_token: int | None = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def timestamp_begin(self) -> int:
        return (self.timestamp_begin_token
                if self.timestamp_begin_token is not None
                else self.no_timestamps_token + 1)

    @property
    def timestamp_stride_samples(self) -> int:
        """Waveform samples per timestamp unit (whisper's time_precision of
        0.02 s at 16 kHz: one encoder frame = 2 mel frames of HOP)."""
        return 2 * HOP

    @classmethod
    def large_v2(cls) -> "WhisperConfigT":
        return cls()

    @classmethod
    def tiny_for_tests(cls, vocab_size: int = 64) -> "WhisperConfigT":
        return cls(vocab_size=vocab_size, num_mel_bins=8, d_model=32,
                   encoder_layers=2, decoder_layers=2, num_heads=4, ffn_dim=64,
                   max_source_positions=64, max_target_positions=24,
                   sot_token=1, eot_token=0, language_token=2, task_token=3,
                   no_timestamps_token=4, prev_token=5)

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperConfigT":
        """Build from an HF ``WhisperConfig`` (object or dict) — the shape
        fields come from the config; the ``<|en|>``/``<|transcribe|>``/
        ``<|notimestamps|>`` prompt tokens follow whisper's multilingual
        vocab layout (eot + 1/ + 102/ + 106), matching the reference's
        ``language='en'`` transcription options
        (federated/src/federated_main.py:29-68)."""
        get = (hf.get if isinstance(hf, dict)
               else lambda k, d=None: getattr(hf, k, d))
        eot = int(get("eos_token_id", 50257))
        sot = int(get("decoder_start_token_id", eot + 1))
        return cls(
            vocab_size=int(get("vocab_size", 51865)),
            num_mel_bins=int(get("num_mel_bins", 80)),
            d_model=int(get("d_model", 1280)),
            encoder_layers=int(get("encoder_layers", 32)),
            decoder_layers=int(get("decoder_layers", 32)),
            num_heads=int(get("encoder_attention_heads", 20)),
            ffn_dim=int(get("encoder_ffn_dim", 5120)),
            max_source_positions=int(get("max_source_positions", 1500)),
            max_target_positions=int(get("max_target_positions", 448)),
            sot_token=sot, eot_token=eot,
            language_token=sot + 1,        # <|en|> is the first language id
            task_token=eot + 102,          # <|transcribe|>
            no_timestamps_token=eot + 106,  # <|notimestamps|>
            prev_token=eot + 104,          # <|startofprev|>
        )

    def forced_tokens(self, timestamps: bool = False) -> list[int]:
        """The reference's ``language='en'`` transcription prompt. With
        ``timestamps`` the ``<|notimestamps|>`` token is omitted (upstream
        ``whisper.transcribe``'s default ``without_timestamps=False``) and
        the decode applies the timestamp sampling rules."""
        toks = [self.sot_token, self.language_token, self.task_token]
        return toks if timestamps else toks + [self.no_timestamps_token]


# ---------------------------------------------------------------------------
# log-mel frontend (whisper.audio.log_mel_spectrogram semantics)

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000
CHUNK_SAMPLES = 30 * SAMPLE_RATE  # whisper's fixed 30 s window


def slaney_mel_filters(num_mel: int, n_fft: int = N_FFT,
                       sr: int = SAMPLE_RATE) -> np.ndarray:
    """Triangular slaney-scale/slaney-norm mel filterbank
    [num_freq_bins, num_mel] — the filterbank whisper ships precomputed."""
    fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        lin = 3.0 * f / 200.0
        log_step = np.log(6.4) / 27.0
        return np.where(f >= 1000.0, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / log_step, lin)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        log_step = np.log(6.4) / 27.0
        return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)), 200.0 * m / 3.0)

    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)             # [n_fft//2+1]
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), num_mel + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[None, :] - freqs[:, None]              # [F, num_mel+2]
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])             # slaney normalization
    return (fb * enorm[None, :]).astype(np.float32)


def log_mel_spectrogram(audio: jax.Array, num_mel: int) -> jax.Array:
    """[B, CHUNK_SAMPLES] waveform -> [B, 3000, num_mel] log-mel features.

    Matches whisper: hann(400), hop 160, center/reflect pad, power spectrum,
    mel, log10 clamp 1e-10, per-sample ``max(x, max-8)``, ``(x+4)/4``."""
    b, n = audio.shape
    x = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    # frame: [B, T, N_FFT] via native patch extraction (strided, no gather)
    patches = jax.lax.conv_general_dilated_patches(
        x[:, :, None], filter_shape=(N_FFT,), window_strides=(HOP,),
        padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(patches * window, axis=-1)
    power = (spec.real**2 + spec.imag**2)[:, :-1, :]       # drop last frame
    fb = jnp.asarray(slaney_mel_filters(num_mel))
    mel = power @ fb                                       # [B, T, num_mel]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, length: int = CHUNK_SAMPLES) -> np.ndarray:
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad)


def chunk_samples(cfg: WhisperConfigT) -> int:
    """The model's decode-window length in waveform samples: the encoder
    consumes ``max_source_positions`` frames after the 2x conv downsample,
    i.e. ``max_source_positions * 2`` mel frames of ``HOP`` samples each
    (30 s for the real models; cfg-proportional for test-size configs)."""
    return cfg.max_source_positions * 2 * HOP


# ---------------------------------------------------------------------------
# model


class _WhisperAttention(nn.Module):
    """HF WhisperAttention semantics: q scaled by head_dim**-0.5,
    k_proj has no bias. ``decode=True`` appends this step's K/V into a
    fixed-size cache (flax "cache" collection) for autoregressive decoding."""

    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, causal: bool = False, decode: bool = False,
                 cache_start=None):
        c = self.cfg
        h, hd = c.num_heads, c.head_dim
        b, t, _ = x.shape
        q = nn.Dense(c.d_model, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        src = x if kv is None else kv
        k = nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="k_proj")(src)
        v = nn.Dense(c.d_model, dtype=self.dtype, name="v_proj")(src)
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, -1, h, hd)
        v = v.reshape(b, -1, h, hd)

        if decode:
            assert kv is None and t == 1, "decode mode is single-step self-attn"
            L = c.max_target_positions
            ck = self.variable("cache", "k", jnp.zeros, (b, L, h, hd), self.dtype)
            cv = self.variable("cache", "v", jnp.zeros, (b, L, h, hd), self.dtype)
            ci = self.variable("cache", "index", lambda: jnp.zeros((), jnp.int32))
            i = ci.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, i, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, i, 0, 0))
            ci.value = i + 1
            k, v = ck.value, cv.value
            pos = jnp.arange(L)[None, :]
            mask = pos <= i  # [1, L]
            if cache_start is not None:
                # per-row left-padded prompt (decode_with_stats prompt_ids):
                # cache slots below the row's start hold padding KV — masked
                # out, so right-aligned prompts of different lengths are
                # exact (positions are assigned per row by the decoder)
                mask = mask & (pos >= cache_start[:, None])  # [B, L]
            bias = jnp.where(mask, 0.0, -1e9)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores + bias[:, None, None, :]  # [B or 1, h, q, L]
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            if causal:
                tk = k.shape[1]
                bias = jnp.where(
                    jnp.arange(tk)[None, :] <= jnp.arange(t)[:, None], 0.0, -1e9)
                scores = scores + bias[None, None, :, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c.d_model)
        return nn.Dense(c.d_model, dtype=self.dtype, name="out_proj")(ctx)


class _FFN(nn.Module):
    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.cfg.ffn_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.cfg.d_model, dtype=self.dtype, name="fc2")(x)


class _EncoderLayer(nn.Module):
    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")
        x = x + _WhisperAttention(self.cfg, self.dtype, name="self_attn")(
            ln(x).astype(self.dtype))
        ln2 = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")
        return x + _FFN(self.cfg, self.dtype, name="ffn")(ln2(x).astype(self.dtype))


class WhisperEncoder(nn.Module):
    """Mel features [B, T_mel, num_mel] -> encoder states [B, T_mel/2, D]."""

    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        c = self.cfg
        x = nn.Conv(c.d_model, kernel_size=(3,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv1")(mel.astype(self.dtype))
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.d_model, kernel_size=(3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = self.param("embed_positions",
                         nn.initializers.normal(0.02),
                         (c.max_source_positions, c.d_model))
        x = x + pos[None, : x.shape[1], :].astype(self.dtype)
        for i in range(c.encoder_layers):
            x = _EncoderLayer(c, self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x).astype(self.dtype)


class _DecoderLayer(nn.Module):
    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, decode: bool = False, cache_start=None):
        ln1 = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")
        x = x + _WhisperAttention(self.cfg, self.dtype, name="self_attn")(
            ln1(x).astype(self.dtype), causal=True, decode=decode,
            cache_start=cache_start)
        ln2 = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")
        x = x + _WhisperAttention(self.cfg, self.dtype, name="encoder_attn")(
            ln2(x).astype(self.dtype), kv=enc)
        ln3 = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")
        return x + _FFN(self.cfg, self.dtype, name="ffn")(ln3(x).astype(self.dtype))


class WhisperDecoder(nn.Module):
    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, enc: jax.Array,
                 pos_offset: jax.Array | int = 0, decode: bool = False,
                 cache_start=None):
        c = self.cfg
        emb = self.param("embed_tokens", nn.initializers.normal(0.02),
                         (c.vocab_size, c.d_model))
        pos = self.param("embed_positions", nn.initializers.normal(0.02),
                         (c.max_target_positions, c.d_model))
        emb = jnp.asarray(emb)  # ported params may be host numpy arrays
        pos = jnp.asarray(pos)
        t = tokens.shape[1]
        # pos_offset: scalar, or [B] for rows at different decode positions
        # (left-padded prompt conditioning — cache slot and position id
        # decouple there)
        off = jnp.reshape(jnp.asarray(pos_offset), (-1, 1))
        positions = jnp.clip(jnp.arange(t)[None, :] + off,
                             0, c.max_target_positions - 1)
        x = emb[tokens].astype(self.dtype) + pos[positions].astype(self.dtype)
        for i in range(c.decoder_layers):
            x = _DecoderLayer(c, self.dtype, name=f"layers_{i}")(
                x, enc, decode, cache_start=cache_start)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        # tied output projection (HF proj_out.weight == embed_tokens.weight)
        return x.astype(jnp.float32) @ emb.T.astype(jnp.float32)


class WhisperModel(nn.Module):
    cfg: WhisperConfigT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, self.dtype)
        self.decoder = WhisperDecoder(self.cfg, self.dtype)

    def __call__(self, mel, tokens):
        enc = self.encoder(mel)
        return self.decoder(tokens, enc)

    def encode(self, mel):
        return self.encoder(mel)

    def decode_step(self, tokens, enc, pos_offset, cache_start=None):
        return self.decoder(tokens, enc, pos_offset, decode=True,
                            cache_start=cache_start)


# ---------------------------------------------------------------------------
# decoding


def decode_with_stats(
    cfg: WhisperConfigT,
    params,
    mel: jax.Array,
    temperature: jax.Array | float = 0.0,
    rng: jax.Array | None = None,
    max_new_tokens: int | None = None,
    dtype: jnp.dtype = jnp.float32,
    prompt_ids: jax.Array | None = None,
    prompt_lens: jax.Array | None = None,
    timestamps: bool = False,
    max_initial_timestamp: float | None = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Batched transcription with decode statistics: [B, T_mel, M] ->
    (token ids [B, max_target_positions] eot-padded, avg_logprob [B]).

    One jittable program: encoder once, then ``lax.scan`` over single-token
    KV-cached decoder steps. ``temperature`` may be a traced scalar: 0 =
    greedy argmax; > 0 = categorical sampling of ``logits/temperature``
    (whisper's temperature-fallback re-decode,
    reference usage: federated/src/federated_main.py:29-68 calls
    ``whisper.transcribe`` whose DecodingOptions escalate temperature).
    ``avg_logprob`` matches whisper's accounting: the sum of the selected
    tokens' log-probs (eot step included) over ``len(tokens) + 1``.

    ``prompt_ids`` [B, P] + ``prompt_lens`` [B]: whisper's inter-window
    conditioning context (``<|startofprev|>`` + previous-window text
    tokens, whisper transcribe's condition_on_previous_text). Rows are
    RIGHT-aligned (left-padded with anything); padding cache slots are
    attention-masked per row and position ids start at 0 at each row's
    first real token, so variable-length prompts batch exactly. The
    decode statistics cover only the sampled tokens, as in whisper.

    ``timestamps`` (static) switches on whisper's timestamp decoding
    (upstream ``without_timestamps=False``, the ``whisper.transcribe``
    default the reference teacher inherits): the ``<|notimestamps|>``
    prompt token is dropped and upstream ``ApplyTimestampRules`` is applied
    at every step inside the scan — the first sampled token must be a
    timestamp (capped at ``max_initial_timestamp`` seconds), timestamps
    come in pairs (after a lone timestamp only a timestamp or EOT may
    follow; after a completed pair a text token must), they are
    monotonically non-decreasing, and whenever the total timestamp
    probability exceeds the best text token's, a timestamp is forced.
    Host-side seek/segment extraction over the returned ids is
    :func:`timestamp_seek`."""
    c = cfg
    model = WhisperModel(c, dtype)
    prompt = jnp.asarray(c.forced_tokens(timestamps), dtype=jnp.int32)
    n_prompt = int(prompt.shape[0])
    n_prev = 0 if prompt_ids is None else int(prompt_ids.shape[1])
    total = c.max_target_positions
    if max_new_tokens is None:
        max_new_tokens = total - n_prompt - n_prev
    max_new_tokens = min(max_new_tokens, total - n_prompt - n_prev)
    if max_new_tokens < 1:
        raise ValueError(
            f"no token budget left: max_target_positions={total} - "
            f"{n_prompt} forced - {n_prev} prompt slots < 1")
    b = mel.shape[0]
    temperature = jnp.asarray(temperature, jnp.float32)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    enc = model.apply({"params": params}, mel, method=WhisperModel.encode)

    # prime the cache with the forced prompt, one cached step per token
    # (shapes are static; n_prompt is tiny so the Python loop is fine)
    _, vars0 = model.apply(
        {"params": params}, jnp.zeros((b, 1), jnp.int32), enc, 0,
        method=WhisperModel.decode_step, mutable=["cache"])
    cache = vars0["cache"]
    # re-init: discard the probe step's cache write by zeroing indices/values
    cache = jax.tree.map(jnp.zeros_like, cache)

    if prompt_ids is None:
        start = None
        plen = jnp.zeros((b,), jnp.int32)
    else:
        plen = jnp.asarray(prompt_lens, jnp.int32)
        start = (n_prev - plen).astype(jnp.int32)  # first valid cache slot

        def prime(cache, tok_col):
            # tok_col: [B] prompt tokens at cache slot j; position id is
            # per-row (j - start, clipped — padding steps' outputs are
            # discarded and their KV slots masked)
            cache, j = cache
            posb = jnp.maximum(j - start, 0)
            _, vars_ = model.apply(
                {"params": params, "cache": cache}, tok_col[:, None], enc,
                posb, method=WhisperModel.decode_step, mutable=["cache"],
                cache_start=start)
            return (vars_["cache"], j + 1), None

        (cache, _), _ = jax.lax.scan(
            prime, (cache, jnp.zeros((), jnp.int32)),
            jnp.asarray(prompt_ids, jnp.int32).T)

    logits = None
    for i in range(n_prompt):
        tok = jnp.broadcast_to(prompt[i], (b, 1)).astype(jnp.int32)
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tok, enc, plen + i,
            method=WhisperModel.decode_step, mutable=["cache"],
            cache_start=start)
        cache = vars_["cache"]

    tb = c.timestamp_begin
    ids_row = jnp.arange(c.vocab_size)
    is_ts_tok = ids_row >= tb
    NEG = jnp.float32(-1e30)

    def ts_filter(lg, st, first_step: bool):
        """Upstream whisper ApplyTimestampRules (the exact rule set HF's
        ``WhisperTimeStampLogitsProcessor`` ports — oracle-parity-tested
        token-by-token in tests/test_whisper.py), vectorized per row.
        ``st`` = (prev_was_ts, prevprev_was_ts, last_ts_id), where
        prevprev counts as a timestamp while fewer than two tokens were
        sampled (upstream ``len(seq) < 2 or seq[-2] >= tb``) — so a
        segment-START timestamp must be followed by text, and only a
        segment-END timestamp (one that follows text) opens the
        ts-or-EOT continuation."""
        prev_ts, prevprev_ts, last_ts = st
        lg = lg.astype(jnp.float32)
        lg = jnp.where(ids_row[None, :] == c.no_timestamps_token, NEG, lg)
        after_pair = prev_ts & prevprev_ts   # pair closed: text must follow
        mid_pair = prev_ts & ~prevprev_ts    # segment end: no text next
        lg = jnp.where(after_pair[:, None] & is_ts_tok[None, :], NEG, lg)
        # upstream masks exactly scores[:, :eot] here — ids in (eot, tb)
        # (specials) stay selectable, matching HF's processor bit for bit
        lg = jnp.where(mid_pair[:, None]
                       & (ids_row < c.eot_token)[None, :], NEG, lg)
        # monotonic: suppress tb <= id < floor (closing a pair may repeat
        # the opening timestamp; a new segment must move strictly past it)
        floor = jnp.where(mid_pair, last_ts, last_ts + 1)
        lg = jnp.where((ids_row[None, :] >= tb)
                       & (ids_row[None, :] < floor[:, None]), NEG, lg)
        if first_step:
            lg = jnp.where(~is_ts_tok[None, :], NEG, lg)
            if max_initial_timestamp is not None:
                cap = tb + int(round(max_initial_timestamp * SAMPLE_RATE
                                     / c.timestamp_stride_samples))
                lg = jnp.where(ids_row[None, :] > cap, NEG, lg)
        # if the total timestamp probability beats every text token,
        # a timestamp must be sampled
        lp = jax.nn.log_softmax(lg, axis=-1)
        ts_lp = jax.scipy.special.logsumexp(lp[:, tb:], axis=-1)
        max_text = jnp.max(lp[:, :tb], axis=-1)
        force_ts = ts_lp > max_text
        return jnp.where(force_ts[:, None] & ~is_ts_tok[None, :], NEG, lg)

    def select(logits_last, key, st=None, first_step=False):
        """Greedy at temperature 0, categorical otherwise, plus the
        selected token's log-prob."""
        if timestamps:
            logits_last = ts_filter(logits_last, st, first_step)
        lp = jax.nn.log_softmax(logits_last.astype(jnp.float32), axis=-1)
        greedy = jnp.argmax(logits_last, axis=-1).astype(jnp.int32)
        scaled = logits_last.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
        sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
        nxt = jnp.where(temperature > 0.0, sampled, greedy)
        return nxt, jnp.take_along_axis(lp, nxt[:, None], axis=1)[:, 0]

    st0 = (jnp.zeros((b,), bool), jnp.zeros((b,), bool),
           jnp.full((b,), tb - 1, jnp.int32))
    first, lp_first = select(logits[:, -1, :], jax.random.fold_in(rng, 0),
                             st=st0, first_step=True)
    done0 = first == c.eot_token
    sum_lp0 = lp_first
    n_emit0 = jnp.ones((b,), jnp.float32)

    def next_state(st, nxt, done):
        prev_ts, prevprev_ts, last_ts = st
        is_ts = (nxt >= tb) & ~done
        return (is_ts, prev_ts, jnp.where(is_ts, nxt, last_ts))

    # after ONE sampled token the penultimate flag reads True (upstream's
    # len(seq) < 2 convention): the opening timestamp must be followed by
    # text, not by another timestamp
    st1 = (first >= tb, jnp.ones((b,), bool),
           jnp.where(first >= tb, first, tb - 1).astype(jnp.int32))

    def step(carry, i):
        cache, tok, done, sum_lp, n_emit, st = carry
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tok[:, None], enc,
            plen + n_prompt + i, method=WhisperModel.decode_step,
            mutable=["cache"], cache_start=start)
        cache = vars_["cache"]
        nxt, lp = select(logits[:, -1, :], jax.random.fold_in(rng, i + 1),
                         st=st)
        nxt = jnp.where(done, c.eot_token, nxt)
        sum_lp = sum_lp + jnp.where(done, 0.0, lp)
        n_emit = n_emit + jnp.where(done, 0.0, 1.0)
        st = next_state(st, nxt, done)
        done = done | (nxt == c.eot_token)
        return (cache, nxt, done, sum_lp, n_emit, st), tok

    (_, last, _, sum_lp, n_emit, _), toks = jax.lax.scan(
        step, (cache, first, done0, sum_lp0, n_emit0, st1),
        jnp.arange(max_new_tokens - 1))
    out = jnp.concatenate([toks.transpose(1, 0), last[:, None]], axis=1)
    pad = total - n_prompt - n_prev - out.shape[1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, pad)), constant_values=c.eot_token)
    # whisper: avg = sum over sampled tokens (incl. eot) / (len(tokens)+1);
    # n_emit counts the eot step, so n_emit == len(tokens)+1 whenever eot
    # was reached (the off-by-one when the token budget runs out first is
    # negligible at max_target_positions length)
    return out, sum_lp / n_emit


def greedy_decode(
    cfg: WhisperConfigT,
    params,
    mel: jax.Array,
    max_new_tokens: int | None = None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Batched greedy transcription: [B, T_mel, M] -> token ids
    [B, max_target_positions] (eot-padded)."""
    out, _ = decode_with_stats(cfg, params, mel, temperature=0.0,
                               max_new_tokens=max_new_tokens, dtype=dtype)
    return out


def timestamp_text_ids(cfg: WhisperConfigT, ids) -> list[int]:
    """Sampled TEXT tokens of a timestamp-mode decode: stop at the first
    EOT, drop timestamp tokens and specials (upstream keeps only ids below
    EOT; the explicit special set generalizes to test vocab layouts whose
    specials sit below the timestamp range). Shared by the stitched
    transcript, the conditioning prompt, and the quality-gate text."""
    tb = cfg.timestamp_begin
    specials = set(cfg.forced_tokens(False)) | {cfg.eot_token, cfg.prev_token}
    out = []
    for t in ids:
        t = int(t)
        if t == cfg.eot_token:
            break
        if t < tb and t not in specials:
            out.append(t)
    return out


def timestamp_seek(cfg: WhisperConfigT, ids) -> tuple[int, list[int]]:
    """Upstream ``whisper.transcribe``'s seek rule over one window's decoded
    ids (with ``timestamps=True``): returns ``(advance_samples, text_ids)``.

    If the window ends with complete segments (there is at least one
    CONSECUTIVE timestamp pair — a segment end abutting the next segment
    start), seek advances to the last such boundary's predicted time;
    otherwise (one unterminated segment) it advances the whole window.
    A zero/negative predicted advance falls back to the whole window so a
    degenerate decode can never stall the transcription loop.
    ``text_ids`` are the sampled tokens with timestamps and specials
    stripped — what the stitched transcript and the next window's
    conditioning prompt use (upstream keeps only ids below EOT)."""
    tb = cfg.timestamp_begin
    toks: list[int] = []
    for t in ids:
        t = int(t)
        if t == cfg.eot_token:
            break
        toks.append(t)

    window = cfg.max_source_positions * cfg.timestamp_stride_samples
    is_ts = [t >= tb for t in toks]
    pair_ends = [i + 1 for i in range(len(toks) - 1)
                 if is_ts[i] and is_ts[i + 1]]
    if not pair_ends:
        return window, timestamp_text_ids(cfg, toks)
    last = pair_ends[-1]
    advance = (toks[last - 1] - tb) * cfg.timestamp_stride_samples
    if advance <= 0:
        return window, timestamp_text_ids(cfg, toks)
    # tokens past the boundary describe audio the NEXT window re-decodes
    return advance, timestamp_text_ids(cfg, toks[: last + 1])


def compression_ratio(text: str) -> float:
    """whisper.utils.compression_ratio: length of the UTF-8 text over its
    zlib-compressed length — degenerate repetition looks very compressible."""
    import zlib

    data = text.encode("utf-8")
    return len(data) / max(len(zlib.compress(data)), 1)


# ---------------------------------------------------------------------------
# HF porting


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def port_hf_whisper(sd, cfg: WhisperConfigT) -> dict:
    """HF ``WhisperForConditionalGeneration.state_dict()`` -> param tree.

    Linear weights transpose [out,in]->[in,out]; conv weights
    [out,in,k]->[k,in,out]; proj_out is tied to embed_tokens so only the
    embedding is ported."""

    def np_(k):
        return np.asarray(sd[k], dtype=np.float32)

    def attn(prefix):
        p = {
            "q_proj": {"kernel": _t(np_(f"{prefix}.q_proj.weight")),
                       "bias": np_(f"{prefix}.q_proj.bias")},
            "k_proj": {"kernel": _t(np_(f"{prefix}.k_proj.weight"))},
            "v_proj": {"kernel": _t(np_(f"{prefix}.v_proj.weight")),
                       "bias": np_(f"{prefix}.v_proj.bias")},
            "out_proj": {"kernel": _t(np_(f"{prefix}.out_proj.weight")),
                         "bias": np_(f"{prefix}.out_proj.bias")},
        }
        return p

    def ln(prefix):
        return {"scale": np_(f"{prefix}.weight"), "bias": np_(f"{prefix}.bias")}

    def ffn(prefix):
        return {"fc1": {"kernel": _t(np_(f"{prefix}.fc1.weight")),
                        "bias": np_(f"{prefix}.fc1.bias")},
                "fc2": {"kernel": _t(np_(f"{prefix}.fc2.weight")),
                        "bias": np_(f"{prefix}.fc2.bias")}}

    enc = {
        "conv1": {"kernel": np.transpose(np_("model.encoder.conv1.weight"), (2, 1, 0)),
                  "bias": np_("model.encoder.conv1.bias")},
        "conv2": {"kernel": np.transpose(np_("model.encoder.conv2.weight"), (2, 1, 0)),
                  "bias": np_("model.encoder.conv2.bias")},
        "embed_positions": np_("model.encoder.embed_positions.weight"),
        "layer_norm": ln("model.encoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        pre = f"model.encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "self_attn": attn(f"{pre}.self_attn"),
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "ffn": ffn(pre),
        }
    dec = {
        "embed_tokens": np_("model.decoder.embed_tokens.weight"),
        "embed_positions": np_("model.decoder.embed_positions.weight"),
        "layer_norm": ln("model.decoder.layer_norm"),
    }
    for i in range(cfg.decoder_layers):
        pre = f"model.decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn": attn(f"{pre}.self_attn"),
            "self_attn_layer_norm": ln(f"{pre}.self_attn_layer_norm"),
            "encoder_attn": attn(f"{pre}.encoder_attn"),
            "encoder_attn_layer_norm": ln(f"{pre}.encoder_attn_layer_norm"),
            "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            "ffn": ffn(pre),
        }
    return {"encoder": enc, "decoder": dec}


def config_from_hf(hf_cfg) -> WhisperConfigT:
    """Map an HF WhisperConfig to WhisperConfigT (token ids from the HF
    generation defaults when present)."""
    kw = dict(
        vocab_size=hf_cfg.vocab_size, num_mel_bins=hf_cfg.num_mel_bins,
        d_model=hf_cfg.d_model, encoder_layers=hf_cfg.encoder_layers,
        decoder_layers=hf_cfg.decoder_layers,
        num_heads=hf_cfg.encoder_attention_heads,
        ffn_dim=hf_cfg.encoder_ffn_dim,
        max_source_positions=hf_cfg.max_source_positions,
        max_target_positions=hf_cfg.max_target_positions,
    )
    if getattr(hf_cfg, "decoder_start_token_id", None) is not None:
        kw["sot_token"] = hf_cfg.decoder_start_token_id
    if getattr(hf_cfg, "eos_token_id", None) is not None:
        kw["eot_token"] = hf_cfg.eos_token_id
    return WhisperConfigT(**kw)
