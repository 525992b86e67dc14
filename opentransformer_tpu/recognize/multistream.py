"""Batched multi-stream frame-synchronous recognition (CTC + transducer).

The single-stream recognizers (recognize/online.py) advance ONE stream per
jitted step; a serving daemon with N concurrent streams would pay N device
dispatches per tick. This module advances up to N independent streams in
ONE jitted step: every stream owns a row of the batched encoder KV cache,
with per-row stream positions (i32[B] ``start``/``cache_len`` — the ragged
cache-index machinery from models/modules.py) so streams at different
depths coexist in one batch. Rows that have no pending chunk this tick
keep their cache via a per-row ``advance`` mask; freshly claimed slots
need no cache zeroing because ``cache_len = 0`` masks stale contents.

The per-tick step fuses frontend → encoder chunk step → decoder head
(CTC projection+argmax, or the transducer's resumable ``greedy_frames``
lattice walk with per-row frame counts), so the device cost of a tick is
ONE dispatch regardless of how many streams advance. Per-stream extras
(CTC's last-id collapse; the transducer's prediction-network state, reset
per row via a ``fresh`` mask until a slot's first advancing tick) ride
along.

Beyond-reference capability: the reference has no serving runtime at all
(its entry points are offline decode scripts, reference eval.py:20-202).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BLK
from .online import _frontend_geometry

__all__ = ["MultiStreamAttention", "MultiStreamCTC", "MultiStreamTransducer"]


def _row_where(flags, new, old):
    """Per-row select with broadcast over arbitrary trailing dims."""
    f = flags.reshape((-1,) + (1,) * (new.ndim - 1))
    return jnp.where(f, new, old)


class _Slot:
    """Host-side state of one stream slot."""

    __slots__ = ("active", "frames", "n_frames", "consumed", "dropped",
                 "emitted", "last_id", "tokens", "finishing", "flush_total",
                 "on_partial", "on_final", "utt_id")

    def __init__(self):
        self.active = False

    def reset(self, utt_id, on_partial, on_final):
        self.active = True
        self.frames: list[np.ndarray] = []   # buffered raw feature frames
        self.n_frames = 0                    # total frames pushed (incl. consumed)
        self.consumed = 0                    # raw frames consumed by emitted windows
        self.dropped = 0                     # consumed frames discarded from `frames`
        self.emitted = 0                     # encoder frames emitted
        self.last_id = BLK
        self.tokens: list[int] = []
        self.finishing = False
        self.flush_total: Optional[int] = None  # target encoder frames at EOS
        self.on_partial = on_partial
        self.on_final = on_final
        self.utt_id = utt_id


class _MultiStreamBase:
    """N-slot multi-stream frame-synchronous server core.

    Usage: ``open_stream`` claims a slot, ``push(slot, feats)`` buffers raw
    feature frames, ``close(slot)`` marks end-of-stream; a driver (own
    thread or the embedding server's) calls ``tick()`` whenever
    ``ready()`` — each tick advances every slot that has a full chunk
    pending (or a flush in progress) with one jitted step, invoking
    ``on_partial(text)`` on hypothesis growth and ``on_final(text)`` when a
    closed stream drains.

    Restrictions are those of the streaming encoder session: conv
    frontend, chunked attention (``chunk_size > 0``, ``left_chunks >= 0``);
    plus any model-specific ones (see subclasses).
    """

    def __init__(self, model, params, n_streams: int = 4, idx2unit=None):
        enc_cfg = model.encoder_cfg
        self.chunk = int(enc_cfg.get("chunk_size", 0))
        left_chunks = int(enc_cfg.get("left_chunks", -1))
        if self.chunk <= 0 or left_chunks < 0:
            raise ValueError("streaming needs encoder chunk_size > 0 and left_chunks >= 0")
        if model.frontend_type != "conv":
            raise NotImplementedError("streaming supports the conv frontend")
        self.model, self.params = model, params
        self.idx2unit = idx2unit
        self.n_streams = int(n_streams)
        self.hop, self.excess = _frontend_geometry(model.frontend_cfg)
        self.raw_chunk = self.chunk * self.hop
        self.window = self.raw_chunk + self.excess
        self.left = left_chunks * self.chunk
        self.n_feat = int(model.frontend_cfg.get("input_size", 40))

        self.cache = model.apply(
            params, self.n_streams,
            method=lambda m, b: m.encoder.init_stream_cache(b))
        self._step = self._build_step()
        self._slots = [_Slot() for _ in range(self.n_streams)]
        self._free: list[int] = list(range(self.n_streams))
        self._fresh = np.zeros((self.n_streams,), bool)
        self._lock = threading.Lock()        # guards slot/host state
        self._tick_lock = threading.Lock()   # serializes device steps
        self.ticks = 0          # jitted dispatches issued (1 per tick)
        self.chunks_advanced = 0  # stream-chunks processed across all ticks

    # --------------------------------------------------------------- hooks
    #: frame-synchronous subclasses APPEND _collect's tokens; label-
    #: synchronous ones (attention re-decode) REPLACE the hypothesis
    REPLACE_TOKENS = False

    def _build_step(self):
        """Return the jitted fused tick step (subclass)."""
        raise NotImplementedError

    def _advance_rows(self, window, start, cache_len, chunk_mask, advance,
                      fresh, fin_now):
        """Run the step, update device state, return host-side outputs.
        ``fin_now`` bool[B]: rows whose stream completes with this tick
        (computed under the slot lock, so label-synchronous subclasses can
        guarantee a final decode covers the last chunk)."""
        raise NotImplementedError

    def _collect(self, out, row: int, valid: int, slot: _Slot):
        """Tokens for one advanced row from the step outputs: the newly
        emitted ids (appended), or with REPLACE_TOKENS the full hypothesis
        so far / None for "no decode this tick"."""
        raise NotImplementedError

    # ------------------------------------------------------------- lifecycle
    def open_stream(self, utt_id: str,
                    on_partial: Callable[[str], None],
                    on_final: Callable[[str], None],
                    timeout: Optional[float] = None) -> Optional[int]:
        """Claim a slot (blocks until one frees, or returns None on timeout)."""
        import time as _time

        end = None if timeout is None else _time.monotonic() + timeout
        while True:
            with self._lock:
                if self._free:
                    i = self._free.pop(0)
                    self._slots[i].reset(utt_id, on_partial, on_final)
                    self._fresh[i] = True
                    return i
            if end is not None and _time.monotonic() >= end:
                return None
            _time.sleep(0.002)

    def push(self, slot: int, feats: np.ndarray) -> None:
        """Buffer raw feature frames f32[T, F] for a stream."""
        s = self._slots[slot]
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self.n_feat:
            raise ValueError(f"expected [T, {self.n_feat}] frames, got {feats.shape}")
        with self._lock:
            if not s.active or s.finishing:
                raise RuntimeError("push on inactive/closed stream")
            s.frames.append(feats)
            s.n_frames += feats.shape[0]

    def close(self, slot: int) -> None:
        """Mark end-of-stream; the slot drains over subsequent ticks. A
        stream too short to produce any encoder frame finalizes here."""
        from ..models.frontend import ConvFrontEnd

        s = self._slots[slot]
        finalize = False
        with self._lock:
            s.finishing = True
            fc = self.model.frontend_cfg
            s.flush_total = ConvFrontEnd.output_length(
                s.n_frames, fc.get("kernel_size", ((3, 3), (3, 3))),
                fc.get("stride", (2, 2)))
            # zero-pad so every remaining window is full-size
            remaining = s.flush_total - s.emitted
            if remaining > 0:
                need = (s.consumed + (-(-remaining // self.chunk)) * self.raw_chunk
                        + self.excess)
                if need > s.n_frames:
                    s.frames.append(
                        np.zeros((need - s.n_frames, self.n_feat), np.float32))
                    s.n_frames = need
            else:
                s.active = False
                finalize = True
        if finalize:
            s.on_final(self.text_of(s.tokens))
            with self._lock:
                self._free.append(slot)

    # ------------------------------------------------------------------ tick
    def _pending(self, s: _Slot) -> int:
        """Valid encoder frames the slot's next window would emit (0 = idle)."""
        if not s.active:
            return 0
        if s.finishing:
            remaining = s.flush_total - s.emitted
            if remaining <= 0:
                return 0
            if s.n_frames >= s.consumed + self.window:
                return min(self.chunk, remaining)
            return 0
        return self.chunk if s.n_frames >= s.consumed + self.window else 0

    def ready(self) -> bool:
        with self._lock:
            return any(self._pending(s) for s in self._slots)

    def text_of(self, ids) -> str:
        if self.idx2unit is None:
            return " ".join(map(str, ids))
        return " ".join(self.idx2unit.get(i, "<UNK>") for i in ids)

    def tick(self) -> int:
        """Advance every slot with a pending chunk; returns #slots advanced.
        Safe to call from multiple threads (ticks serialize on a lock)."""
        with self._tick_lock:
            return self._tick_inner()

    def _tick_inner(self) -> int:
        with self._lock:
            plan = []  # (slot_index, valid)
            window = np.zeros((self.n_streams, self.window, self.n_feat), np.float32)
            start = np.zeros((self.n_streams,), np.int32)
            cache_len = np.zeros((self.n_streams,), np.int32)
            chunk_mask = np.zeros((self.n_streams, self.chunk), bool)
            advance = np.zeros((self.n_streams,), bool)
            fin_now = np.zeros((self.n_streams,), bool)
            fresh = self._fresh.copy()
            for i, s in enumerate(self._slots):
                v = self._pending(s)
                if v == 0:
                    continue
                fin_now[i] = bool(s.finishing and s.emitted + v >= s.flush_total)
                if len(s.frames) > 1 or s.consumed - s.dropped >= self.raw_chunk:
                    # consolidate lazily AND discard the consumed prefix so
                    # long-lived streams stay O(pending), not O(stream)
                    buf = (np.concatenate(s.frames, axis=0)
                           if len(s.frames) > 1 else s.frames[0])
                    cut = s.consumed - s.dropped
                    s.frames = [buf[cut:]]
                    s.dropped = s.consumed
                buf = s.frames[0]
                lo = s.consumed - s.dropped
                window[i] = buf[lo: lo + self.window]
                start[i] = s.emitted
                cache_len[i] = min(self.left, s.emitted)
                chunk_mask[i, :v] = True
                advance[i] = True
                plan.append((i, v))
            if not plan:
                return 0

        out = self._advance_rows(window, start, cache_len, chunk_mask,
                                 advance, fresh, fin_now)
        self.ticks += 1
        self.chunks_advanced += len(plan)

        finals = []
        partials = []
        with self._lock:
            for i, v in plan:
                s = self._slots[i]
                self._fresh[i] = False
                s.consumed += self.raw_chunk
                s.emitted += v
                new_toks = self._collect(out, i, v, s)
                if self.REPLACE_TOKENS:
                    changed = new_toks is not None and list(new_toks) != s.tokens
                    if changed:
                        s.tokens = list(new_toks)
                else:
                    changed = bool(new_toks)
                    if new_toks:
                        s.tokens.extend(new_toks)
                if s.finishing and s.emitted >= s.flush_total:
                    s.active = False
                    finals.append((i, s))
                elif changed:
                    partials.append(s)
        # callbacks outside the lock (they may write to sockets)
        for s in partials:
            s.on_partial(self.text_of(s.tokens))
        for i, s in finals:
            s.on_final(self.text_of(s.tokens))
            with self._lock:
                self._free.append(i)
        return len(plan)

    # ---------------------------------------------------------- convenience
    def run_stream(self, feats: np.ndarray,
                   on_partial: Callable[[str], None]) -> str:
        """Feed one whole utterance through a slot and drive ticks until it
        finishes (drop-in for StreamingSessionPool.run_stream). Concurrent
        callers cooperate: ticks serialize, and each tick advances every
        caller's stream at once."""
        import time as _time

        result = {}

        def on_final(text):
            result["text"] = text

        slot = self.open_stream("u", on_partial, on_final)
        self.push(slot, feats)
        self.close(slot)
        while "text" not in result:
            if not self.ready() or self.tick() == 0:
                _time.sleep(0.001)
        return result["text"]


class MultiStreamCTC(_MultiStreamBase):
    """Multi-stream greedy CTC: the fused tick step ends in a projection +
    argmax; ids collapse host-side per stream (same rule as CTCRecognizer,
    blank=PAD=0)."""

    def __init__(self, model, params, n_streams: int = 4, idx2unit=None):
        if getattr(model, "lookahead_steps", 0):
            raise NotImplementedError(
                "multi-stream CTC requires lookahead_steps=0 (the look-ahead "
                "conv mixes future frames across chunk boundaries)")
        super().__init__(model, params, n_streams, idx2unit)

    def _build_step(self):
        model, chunk = self.model, self.chunk

        def step(params, window, cache, start, cache_len, chunk_mask, advance):
            def _f(mdl, window, cache, start, cache_len, chunk_mask):
                x, _ = mdl.frontend(window, jnp.ones(window.shape[:2], bool))
                x = x[:, :chunk]
                y, new_cache = mdl.encoder.encode_step(
                    x, cache, start, cache_len, chunk_mask)
                # fused projection top-1 (no [B, C, V] materialization)
                ids = mdl.assistor.project_topk(y, 1)[1][:, :, 0]  # [B, C]
                return ids, new_cache

            ids, new_cache = model.apply(
                params, window, cache, start, cache_len, chunk_mask, method=_f)
            new_cache = jax.tree_util.tree_map(
                lambda n, o: _row_where(advance, n, o), new_cache, cache)
            return ids, new_cache

        return jax.jit(step)

    def _advance_rows(self, window, start, cache_len, chunk_mask, advance,
                      fresh, fin_now):
        ids, self.cache = self._step(
            self.params, jnp.asarray(window), self.cache,
            jnp.asarray(start), jnp.asarray(cache_len),
            jnp.asarray(chunk_mask), jnp.asarray(advance))
        return np.asarray(ids)

    def _collect(self, ids, row, valid, s):
        new = []
        for t in range(valid):
            tok = int(ids[row, t])
            if tok != BLK and tok != s.last_id:
                new.append(tok)
            s.last_id = tok
        return new


class MultiStreamTransducer(_MultiStreamBase):
    """Multi-stream greedy RNNT: the fused tick step runs the resumable
    ``greedy_frames`` lattice walk with per-row frame counts (idle rows get
    frame_len 0 and stay untouched); prediction-network state and hidden
    carry on-device per row, reset through the ``fresh`` mask when a slot
    starts a new stream. Streamed hypotheses equal the single-stream
    StreamingTransducerRecognizer whenever its global max_symbols cap
    doesn't bind."""

    def __init__(self, model, params, n_streams: int = 4, idx2unit=None,
                 max_symbols: int = 10_000, max_per_frame: int = 8):
        self.max_symbols = int(max_symbols)
        self.max_per_frame = int(max_per_frame)
        super().__init__(model, params, n_streams, idx2unit)
        self._state, self._hidden = model.apply(
            params, self.n_streams, method="init_decode_state")

    def _build_step(self):
        model, chunk = self.model, self.chunk
        buf = self.chunk * self.max_per_frame
        max_per_frame = self.max_per_frame

        def step(params, window, cache, state, hidden, start, cache_len,
                 chunk_mask, advance, fresh):
            def _f(mdl, window, cache, state, hidden, start, cache_len,
                   chunk_mask, fresh):
                # fresh rows restart the prediction network (BOS state)
                s0, h0 = mdl.init_decode_state(window.shape[0])
                state = _row_where(fresh, s0, state)
                hidden = jax.tree_util.tree_map(
                    lambda n, o: _row_where(fresh, n, o), h0, hidden)
                x, _ = mdl.frontend(window, jnp.ones(window.shape[:2], bool))
                x = x[:, :chunk]
                y, new_cache = mdl.encoder.encode_step(
                    x, cache, start, cache_len, chunk_mask)
                frame_len = jnp.sum(chunk_mask, axis=1).astype(jnp.int32)
                toks, n, state, hidden = mdl.greedy_frames(
                    y, frame_len, state, hidden, buf, max_per_frame)
                return toks, n, new_cache, state, hidden

            toks, n, new_cache, state, hidden = model.apply(
                params, window, cache, state, hidden, start, cache_len,
                chunk_mask, fresh, method=_f)
            new_cache = jax.tree_util.tree_map(
                lambda nw, o: _row_where(advance, nw, o), new_cache, cache)
            return toks, n, new_cache, state, hidden

        return jax.jit(step)

    def _advance_rows(self, window, start, cache_len, chunk_mask, advance,
                      fresh, fin_now):
        toks, n, self.cache, self._state, self._hidden = self._step(
            self.params, jnp.asarray(window), self.cache, self._state,
            self._hidden, jnp.asarray(start), jnp.asarray(cache_len),
            jnp.asarray(chunk_mask), jnp.asarray(advance), jnp.asarray(fresh))
        return np.asarray(toks), np.asarray(n)

    def _collect(self, out, row, valid, s):
        toks, n = out
        room = self.max_symbols - len(s.tokens)
        return toks[row, : min(int(n[row]), room)].tolist()


class MultiStreamAttention(_MultiStreamBase):
    """Multi-stream attention-decoder (speech2text) serving.

    Label-synchronous: the tick's fused step advances every pending row's
    encoder in ONE dispatch (same ragged-cache batching as CTC); emitted
    memory chunks accumulate per row, and hypotheses come from a second
    batched dispatch — ONE jitted KV-cached beam search over all rows due a
    decode this tick (each row masked to its own memory length, the time
    axis padded to ``mem_bucket`` multiples so compiled programs stay
    bounded). ``partial_every`` throttles per-row PARTIAL re-decodes; a
    finishing row always decodes on its last tick, so the FINAL transcript
    equals the offline beam search over the full chunked-encoder memory
    (the single-stream parity is tested in
    ``StreamingAttentionRecognizer``; this class batches the same math).
    """

    REPLACE_TOKENS = True

    def __init__(self, model, params, n_streams: int = 4, idx2unit=None,
                 beam_width: int = 5, max_len: int = 100, penalty: float = 0.6,
                 lamda: float = 5.0, mem_bucket: int = 64,
                 partial_every: int = 1, eos_id: Optional[int] = None):
        self.beam_width, self.max_len = int(beam_width), int(max_len)
        self.penalty, self.lamda = float(penalty), float(lamda)
        self.mem_bucket = max(1, int(mem_bucket))
        self.partial_every = max(1, int(partial_every))
        super().__init__(model, params, n_streams, idx2unit)
        from ..utils import GrowingBuffer

        self._mem = [GrowingBuffer() for _ in range(self.n_streams)]
        self._since_decode = np.zeros((self.n_streams,), np.int64)
        self.decode_dispatches = 0

        from .base import make_memory_search
        self._search = make_memory_search(
            model, self.beam_width, self.max_len, self.penalty, self.lamda,
            eos_id=eos_id)

    def _build_step(self):
        model, chunk = self.model, self.chunk

        def step(params, window, cache, start, cache_len, chunk_mask, advance):
            def _f(mdl, window, cache, start, cache_len, chunk_mask):
                x, _ = mdl.frontend(window, jnp.ones(window.shape[:2], bool))
                x = x[:, :chunk]
                return mdl.encoder.encode_step(x, cache, start, cache_len, chunk_mask)

            y, new_cache = model.apply(
                params, window, cache, start, cache_len, chunk_mask, method=_f)
            new_cache = jax.tree_util.tree_map(
                lambda n, o: _row_where(advance, n, o), new_cache, cache)
            return y, new_cache

        return jax.jit(step)

    def _advance_rows(self, window, start, cache_len, chunk_mask, advance,
                      fresh, fin_now):
        y, self.cache = self._step(
            self.params, jnp.asarray(window), self.cache,
            jnp.asarray(start), jnp.asarray(cache_len),
            jnp.asarray(chunk_mask), jnp.asarray(advance))
        y = np.asarray(y)

        decode_rows = []
        for i in range(self.n_streams):
            if not advance[i]:
                continue
            if fresh[i]:
                from ..utils import GrowingBuffer

                self._mem[i] = GrowingBuffer()
                self._since_decode[i] = 0
            v = int(chunk_mask[i].sum())
            if v:
                self._mem[i].append(y[i, :v])
            self._since_decode[i] += 1
            if fin_now[i] or self._since_decode[i] >= self.partial_every:
                decode_rows.append(i)

        if not decode_rows:
            return {}

        # ONE batched beam dispatch: every row slot participates (fixed
        # batch shape); undecoded rows carry a 1-frame dummy memory and are
        # simply ignored on output.
        d = int(self.model.encoder_cfg.get("d_model", 256))
        t_max = max(self._mem[i].n for i in decode_rows)
        t_pad = -(-max(t_max, 1) // self.mem_bucket) * self.mem_bucket
        memory = np.zeros((self.n_streams, t_pad, d), y.dtype)
        mask = np.zeros((self.n_streams, t_pad), bool)
        mask[:, 0] = True  # dummy rows: 1 valid frame, result discarded
        for i in decode_rows:
            self._since_decode[i] = 0
            m = self._mem[i].view()  # O(1): no per-tick re-concatenation
            if m is None:
                continue  # no frames yet: keep the 1-frame dummy row
            memory[i, : m.shape[0]] = m
            mask[i] = False
            mask[i, : m.shape[0]] = True
        hyp = self._search(self.params, jnp.asarray(memory), jnp.asarray(mask))
        self.decode_dispatches += 1
        toks, lens = np.asarray(hyp.tokens), np.asarray(hyp.lengths)
        return {i: toks[i, 0, 1:int(lens[i, 0])].tolist() for i in decode_rows}

    def _collect(self, out, row, valid, s):
        return out.get(row)  # None = no decode this tick (hypothesis kept)
