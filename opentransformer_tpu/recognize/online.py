"""Frame-synchronous online (incremental) encoding and recognition.

The reference is strictly batch/offline — its encoder ``inference()`` paths
are dead code (``otrans/encoder/conformer.py:165-183`` commented out;
``model/ctc.py:98-121`` crashes, SURVEY §8.4). This module provides the
missing true-online front door on top of the chunked-attention encoder
(``TransformerEncoder.encode_step``): features arrive in fixed-size chunks,
the conv frontend is computed incrementally (one-chunk lookahead — its
receptive field extends ``excess`` frames past each hop boundary), and every
encoder layer keeps a shifting KV cache of its last ``left_chunks`` blocks.
Streamed outputs are **bit-exact** with the batch chunked encode, so a model
trained offline with ``chunk_size``/``left_chunks`` serves online unchanged.

TPU notes: the per-chunk step is ONE jitted function of static shapes
(frontend window → encoder chunk step); per-step cost is O(chunk · left)
attention — constant latency per chunk regardless of stream length.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BLK


def _frontend_geometry(frontend_cfg: dict) -> tuple[int, int]:
    """(hop, excess): one frontend output consumes ``hop`` new raw frames and
    its receptive field reaches ``excess`` frames past the hop boundary."""
    ks = frontend_cfg.get("kernel_size", [[3, 3], [3, 3]])
    st = frontend_cfg.get("stride", [2, 2])
    k1, k2 = int(ks[0][0]), int(ks[1][0])
    s1, s2 = int(st[0]), int(st[1])
    hop = s1 * s2
    rf = (k2 - 1) * s1 + k1  # raw frames covered by one output
    return hop, rf - hop


class StreamingEncoderSession:
    """Incremental encoder for one (batched, equal-length) feature stream.

    Feed raw feature chunks of exactly ``chunk_size * hop`` frames; each feed
    after the first emits ``chunk_size`` encoder frames (one-chunk algorithmic
    latency from the frontend lookahead). ``finish()`` flushes the tail.

    Restrictions: conv frontend + transformer encoder with absolute PE and a
    chunked-attention config (``chunk_size > 0``, ``left_chunks >= 0``).
    """

    def __init__(self, model, params, batch: int = 1):
        enc_cfg = model.encoder_cfg
        self.chunk = int(enc_cfg.get("chunk_size", 0))
        left_chunks = int(enc_cfg.get("left_chunks", -1))
        if self.chunk <= 0 or left_chunks < 0:
            raise ValueError("streaming needs encoder chunk_size > 0 and left_chunks >= 0")
        if model.frontend_type != "conv":
            raise NotImplementedError("streaming supports the conv frontend")
        self.model, self.params, self.batch = model, params, batch
        self.hop, self.excess = _frontend_geometry(model.frontend_cfg)
        self.raw_chunk = self.chunk * self.hop  # raw frames per feed
        self.left = left_chunks * self.chunk

        def _encode_chunk(mdl, window, cache, start, cache_len, chunk_mask):
            x, _ = mdl.frontend(window, jnp.ones(window.shape[:2], bool))
            x = x[:, : self.chunk]
            return mdl.encoder.encode_step(x, cache, start, cache_len, chunk_mask)

        def step(params, window, cache, start, cache_len, chunk_mask):
            return model.apply(params, window, cache, start, cache_len,
                               chunk_mask, method=_encode_chunk)

        self._step = jax.jit(step)
        self._init_cache = lambda: model.apply(
            params, batch, method=lambda m, b: m.encoder.init_stream_cache(b))
        self.reset()

    def reset(self) -> None:
        """Start a fresh stream, reusing the compiled step functions."""
        self.cache = self._init_cache()
        self._prev: Optional[np.ndarray] = None
        self._finished = False
        self._raw_seen = 0     # raw frames in fully-fed chunks
        self._emitted = 0      # encoder frames emitted
        self._outputs: list[jnp.ndarray] = []

    def _emit(self, window: jnp.ndarray, n_valid: int) -> list[jnp.ndarray]:
        """Encoder-step over the frontend outputs of ``window``; the first
        ``n_valid`` outputs are real, the rest pad. Appends to _outputs."""
        new = []
        for s in range(-(-n_valid // self.chunk)):
            lo = s * self.chunk
            valid = min(self.chunk, n_valid - lo)
            w = window[:, lo * self.hop: lo * self.hop + self.raw_chunk + self.excess]
            mask = jnp.broadcast_to(
                jnp.arange(self.chunk)[None] < valid, (self.batch, self.chunk))
            y, self.cache = self._step(
                self.params, w, self.cache,
                jnp.asarray(self._emitted, jnp.int32),
                jnp.asarray(min(self.left, self._emitted), jnp.int32), mask,
            )
            self._emitted += valid
            new.append(y[:, :valid])
        self._outputs.extend(new)
        return new

    def feed(self, raw: np.ndarray) -> list[jnp.ndarray]:
        """Feed f32[B, chunk·hop, F]; returns newly emitted encoder chunks
        (empty on the first feed — frontend lookahead)."""
        if self._finished:
            raise RuntimeError("session already finished")
        raw = np.asarray(raw, np.float32)
        if raw.shape[0] != self.batch or raw.shape[1] != self.raw_chunk:
            raise ValueError(
                f"expected [B={self.batch}, {self.raw_chunk}, F] chunk, got {raw.shape}")
        new = []
        if self._prev is not None:
            window = jnp.asarray(
                np.concatenate([self._prev, raw[:, : self.excess]], axis=1))
            new = self._emit(window, self.chunk)
            self._raw_seen += self.raw_chunk
        self._prev = raw
        return new

    def flush(self, tail: Optional[np.ndarray] = None) -> list[jnp.ndarray]:
        """Emit the remaining tail chunks (optional final partial chunk,
        < chunk·hop frames) and close the session. Returns only the NEWLY
        emitted encoder chunks."""
        if self._finished:
            raise RuntimeError("session already finished")
        self._finished = True
        parts = []
        if self._prev is not None:
            parts.append(self._prev)
        if tail is not None and np.asarray(tail).shape[1] > 0:
            tail = np.asarray(tail, np.float32)
            if tail.shape[1] >= self.raw_chunk:
                raise ValueError("tail must be shorter than one chunk; use feed()")
            parts.append(tail)
        if not parts:
            return []
        raw = np.concatenate(parts, axis=1)
        n_raw_total = self._raw_seen + raw.shape[1]
        from ..models.frontend import ConvFrontEnd

        fc = self.model.frontend_cfg
        t_total = ConvFrontEnd.output_length(
            n_raw_total, fc.get("kernel_size", ((3, 3), (3, 3))),
            fc.get("stride", (2, 2)))
        remaining = t_total - self._emitted
        if remaining <= 0:
            return []
        # zero-pad so every block sees a full fixed-size window
        need = (-(-remaining // self.chunk)) * self.raw_chunk + self.excess
        if need > raw.shape[1]:
            raw = np.concatenate(
                [raw, np.zeros((self.batch, need - raw.shape[1], raw.shape[2]),
                               np.float32)], axis=1)
        return self._emit(jnp.asarray(raw), remaining)

    def finish(self, tail: Optional[np.ndarray] = None) -> tuple[jnp.ndarray, int]:
        """Flush and return the full stitched (memory [B, T', D], T')."""
        self.flush(tail)
        if not self._outputs:
            d = int(self.model.encoder_cfg.get("d_model", 256))
            return jnp.zeros((self.batch, 0, d)), 0
        return jnp.concatenate(self._outputs, axis=1), self._emitted


class _StreamingRecognizer:
    """Chunk-fed recognition driver shared by the online recognizers:
    ``feed``/``finish`` route emitted encoder chunks into the subclass's
    ``_consume`` which appends to ``self.tokens``."""

    def __init__(self, model, params, batch: int = 1, idx2unit=None):
        self.session = StreamingEncoderSession(model, params, batch)
        self.model, self.params = model, params
        self.idx2unit = idx2unit
        self.batch = batch
        self.tokens: list[list[int]] = [[] for _ in range(batch)]

    def reset(self) -> None:
        """Start a fresh stream (compiled steps are reused)."""
        self.session.reset()
        self.tokens = [[] for _ in range(self.batch)]

    def _consume(self, chunks) -> None:
        raise NotImplementedError

    def feed(self, raw: np.ndarray) -> list[list[int]]:
        """Feed a raw feature chunk; returns the running token ids per stream."""
        self._consume(self.session.feed(raw))
        return [list(t) for t in self.tokens]

    def text_of(self, ids) -> str:
        """Token ids → text through idx2unit (str ids when no map given)."""
        if self.idx2unit is None:
            return " ".join(map(str, ids))
        return " ".join(self.idx2unit.get(i, "<UNK>") for i in ids)

    def finish(self, tail: Optional[np.ndarray] = None) -> list[str]:
        """Flush; returns final transcripts (ids joined via idx2unit if given)."""
        self._consume(self.session.flush(tail))
        return [self.text_of(t) for t in self.tokens]


class StreamingCTCRecognizer(_StreamingRecognizer):
    """Frame-synchronous CTC recognition: greedy best-path tokens emitted as
    chunks arrive (real-time counterpart of ``CTCRecognizer``; same collapse
    rule, blank=PAD=0)."""

    def __init__(self, model, params, batch: int = 1, idx2unit=None):
        if getattr(model, "lookahead_steps", 0):
            raise NotImplementedError(
                "streaming CTC requires lookahead_steps=0 (the look-ahead conv "
                "mixes future frames across chunk boundaries)")
        super().__init__(model, params, batch, idx2unit)
        self._last = np.zeros(batch, np.int64)  # last frame id per stream (BLK init)

        def project(params, memory):
            # fused projection top-1 (no [B, c, V] materialization)
            return model.apply(
                params, memory,
                method=lambda m, mem: m.assistor.project_topk(mem, 1)[1][:, :, 0])

        self._project = jax.jit(project)

    def reset(self) -> None:
        super().reset()
        self._last = np.zeros(self.batch, np.int64)

    def _consume(self, chunks) -> None:
        for y in chunks:
            if y.shape[1] == 0:
                continue
            ids = np.asarray(self._project(self.params, y))  # [B, c]
            for b in range(ids.shape[0]):
                for t in range(ids.shape[1]):
                    i = int(ids[b, t])
                    if i != BLK and i != self._last[b]:
                        self.tokens[b].append(i)
                    self._last[b] = i


class StreamingTransducerRecognizer(_StreamingRecognizer):
    """Frame-synchronous RNNT recognition: the transducer's greedy lattice
    walk resumes chunk-by-chunk — prediction-network state and hidden carry
    across chunks, so the streamed hypothesis equals the offline
    ``greedy_decode`` whenever the global ``max_symbols`` cap doesn't bind
    (the per-chunk token buffer is sized chunk·max_per_frame, so nothing is
    ever silently dropped within a chunk)."""

    def __init__(self, model, params, batch: int = 1, idx2unit=None,
                 max_symbols: int = 10_000, max_per_frame: int = 8):
        super().__init__(model, params, batch, idx2unit)
        self.max_symbols = int(max_symbols)
        buf = self.session.chunk * int(max_per_frame)

        def init_state(params, b):
            return model.apply(params, b, method="init_decode_state")

        def chunk_greedy(params, memory, frame_len, state, hidden):
            return model.apply(params, memory, frame_len, state, hidden,
                               buf, max_per_frame, method="greedy_frames")

        self._init_decode = jax.jit(init_state, static_argnums=1)
        self._state, self._hidden = self._init_decode(params, batch)
        self._chunk_greedy = jax.jit(chunk_greedy)

    def reset(self) -> None:
        super().reset()
        self._state, self._hidden = self._init_decode(self.params, self.batch)

    def _consume(self, chunks) -> None:
        for y in chunks:
            c = y.shape[1]
            if c == 0:
                continue
            frame_len = jnp.full((y.shape[0],), c, jnp.int32)
            toks, n, self._state, self._hidden = self._chunk_greedy(
                self.params, y, frame_len, self._state, self._hidden)
            toks, n = np.asarray(toks), np.asarray(n)
            for b in range(toks.shape[0]):
                room = self.max_symbols - len(self.tokens[b])
                self.tokens[b].extend(toks[b, : min(n[b], room)].tolist())


class StreamingAttentionRecognizer(_StreamingRecognizer):
    """Incremental attention-decoder (speech2text) recognition.

    Attention decoders are label-synchronous — earlier output can legally
    change when more acoustic evidence arrives — so streamed PARTIAL
    transcripts come from re-running the jitted KV-cached beam search over
    the encoder memory accumulated so far, and the FINAL transcript equals
    the offline beam search over the same chunked-encoder memory exactly
    (the streamed encoder is bit-exact with the batch chunked encode, and
    bucket padding is masked out of the attention).

    The growing memory is padded to multiples of ``mem_bucket`` encoder
    frames, so the number of distinct compiled beam programs is bounded by
    utterance length / bucket — independent of chunk count. ``partial_every``
    rate-limits the re-decodes (every Nth feed); ``finish()`` always decodes.
    """

    def __init__(self, model, params, batch: int = 1, idx2unit=None,
                 beam_width: int = 5, max_len: int = 100, penalty: float = 0.6,
                 lamda: float = 5.0, mem_bucket: int = 64, partial_every: int = 1,
                 eos_id: Optional[int] = None):
        super().__init__(model, params, batch, idx2unit)
        self.beam_width, self.max_len = int(beam_width), int(max_len)
        self.penalty, self.lamda = float(penalty), float(lamda)
        self.mem_bucket = max(1, int(mem_bucket))
        self.partial_every = max(1, int(partial_every))
        from ..utils import GrowingBuffer

        self._mem = GrowingBuffer(axis=1)  # accumulated [B, T', D]
        self._feeds = 0

        from .base import make_memory_search
        self._search = make_memory_search(
            model, self.beam_width, self.max_len, self.penalty, self.lamda,
            eos_id=eos_id)

    def reset(self) -> None:
        from ..utils import GrowingBuffer

        super().reset()
        self._mem = GrowingBuffer(axis=1)
        self._feeds = 0

    def _redecode(self) -> None:
        cur = self._mem.view()  # O(1): no per-chunk re-concatenation
        if cur is None or cur.shape[1] == 0:
            return
        t = cur.shape[1]
        t_pad = -(-t // self.mem_bucket) * self.mem_bucket
        mem = np.zeros((self.batch, t_pad, cur.shape[2]), cur.dtype)
        mem[:, :t] = cur
        mask = np.zeros((self.batch, t_pad), bool)
        mask[:, :t] = True
        hyp = self._search(self.params, jnp.asarray(mem), jnp.asarray(mask))
        toks, lens = np.asarray(hyp.tokens), np.asarray(hyp.lengths)
        # best hypothesis, BOS stripped (lengths count BOS, exclude EOS)
        self.tokens = [
            toks[b, 0, 1:int(lens[b, 0])].tolist() for b in range(self.batch)]

    def _consume(self, chunks) -> None:
        added = False
        for y in chunks:
            if y.shape[1] == 0:
                continue
            self._mem.append(np.asarray(y))
            added = True
        if added:
            self._feeds += 1
            if self._feeds % self.partial_every == 0:
                self._redecode()

    def finish(self, tail: Optional[np.ndarray] = None) -> list[str]:
        self._consume(self.session.flush(tail))
        self._redecode()  # FINAL always reflects the complete memory
        return [self.text_of(t) for t in self.tokens]


class OnlineRecognizerAdapter:
    """eval.py-compatible front for the streaming recognizers: decodes each
    utterance by feeding its features chunk by chunk (simulated real-time
    arrival), so corpus CER/RTF of the ONLINE path is measurable through the
    standard decode CLI (`eval.py --online`)."""

    def __init__(self, model_type: str, model, params, idx2unit=None,
                 max_per_frame: int = 8, beam_width: int = 5,
                 max_len: int = 100, penalty: float = 0.6, lamda: float = 5.0):
        if model_type == "ctc":
            self._rec = StreamingCTCRecognizer(model, params, batch=1, idx2unit=idx2unit)
        elif model_type == "transducer":
            self._rec = StreamingTransducerRecognizer(
                model, params, batch=1, idx2unit=idx2unit, max_per_frame=max_per_frame)
        elif model_type == "speech2text":
            self._rec = StreamingAttentionRecognizer(
                model, params, batch=1, idx2unit=idx2unit, beam_width=beam_width,
                max_len=max_len, penalty=penalty, lamda=lamda)
        else:
            raise NotImplementedError(
                f"--online supports ctc, transducer and speech2text models "
                f"(got {model_type!r})")

    def recognize(self, feats, feat_mask):
        feats = np.asarray(feats)
        lens = np.asarray(feat_mask).sum(axis=1).astype(int)
        rc = self._rec.session.raw_chunk
        texts = []
        for i in range(feats.shape[0]):
            self._rec.reset()
            x = feats[i: i + 1, : lens[i]]
            n_full = x.shape[1] // rc
            for s in range(n_full):
                self._rec.feed(x[:, s * rc:(s + 1) * rc])
            hyp = self._rec.finish(x[:, n_full * rc:])[0]
            texts.append([hyp])
        return texts, np.zeros((feats.shape[0], 1), np.float32)
