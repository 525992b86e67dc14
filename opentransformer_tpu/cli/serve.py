"""Serving CLI — latency-bounded dynamic batching over a trained checkpoint.

Beyond-reference capability: the reference ships only offline decode scripts
(``eval.py``/``test.py``, reference ``eval.py:20-202``); production serving
needs a daemon that accepts requests as they arrive and trades a small
batching delay for TPU batch efficiency. This CLI:

  * accepts `utt_id wav_path` lines (wav.scp format) from a file, stdin
    (``-i -``), or a line-based TCP socket (``--port``),
  * extracts fbank features with the checkpoint's own data config (mel
    bins, extractor flavor, CMVN — same path as training),
  * groups pending requests into batches of up to ``--max-batch`` within a
    ``--batch-timeout-ms`` window,
  * pads every batch to a FIXED batch size and a small set of frame
    buckets, so each (batch, frames) shape compiles once and every later
    request hits a warm XLA executable (static shapes; no recompiles),
  * answers `utt_id<TAB>text` per request and reports latency percentiles
    and realtime factor on shutdown.
"""

from __future__ import annotations

import argparse
import logging
import os
import queue
import sys
import threading
import time

import jax.numpy as jnp
import numpy as np

from ..data import load_idx2unit_map
from ..models.registry import build_model
from ..ops.fbank import fbank_numpy, logfbank_psf
from ..ops.masks import length_to_mask
from ..recognize.base import build_recognizer

logger = logging.getLogger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve a trained model with dynamic batching")
    p.add_argument("-m", "--load_model", type=str, required=True,
                   help="checkpoint dir (model.epoch.N / model.average.*) or expdir")
    p.add_argument("-c", "--config", type=str, default=None)
    p.add_argument("-i", "--input", type=str, default=None,
                   help="wav.scp-format request source ('-' = stdin); omit with --port")
    p.add_argument("-o", "--output", type=str, default="-",
                   help="where to write 'utt_id<TAB>text' lines ('-' = stdout)")
    p.add_argument("--port", type=int, default=None,
                   help="serve line-based TCP on this port instead of -i")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=8,
                   help="requests per device batch (every batch pads to this)")
    p.add_argument("--batch-timeout-ms", type=float, default=30.0,
                   help="max wait to fill a batch before running it")
    p.add_argument("--bucket-frames", type=str, default="200,400,800,1600",
                   help="frame buckets; each request pads to the next bucket")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket shape before accepting requests")
    p.add_argument("--streaming", action="store_true",
                   help="frame-synchronous session mode (ctc/transducer): "
                        "each request decodes incrementally, emitting "
                        "PARTIAL hypotheses per chunk and a FINAL result")
    p.add_argument("--streams", type=int, default=2,
                   help="concurrent streaming slots; all advance in ONE "
                        "jitted step per tick (recognize/multistream.py)")
    p.add_argument("-mt", "--max_tokens_per_chunk", type=int, default=8,
                   help="transducer streaming: max emissions per frame")
    p.add_argument("-bw", "--beam_width", type=int, default=5)
    p.add_argument("-nb", "--nbest", type=int, default=1)
    p.add_argument("-pn", "--penalty", type=float, default=0.6)
    p.add_argument("-ld", "--lamda", type=float, default=5.0)
    p.add_argument("-ml", "--max_len", type=int, default=100)
    p.add_argument("-lm", "--load_language_model", type=str, default=None)
    p.add_argument("-lmw", "--lm_weight", type=float, default=0.1)
    p.add_argument("-p2w", "--piece2word", action="store_true")
    return p


class FeatureExtractor:
    """wav path → normalized fbank, mirroring AudioDataset's eval path
    (data/datasets.py:128-161; reference ``otrans/data/audio.py:97-142``)."""

    def __init__(self, data_cfg):
        self.num_mel_bins = int(data_cfg.get("num_mel_bins", 40))
        self.flavor = data_cfg.get("feature_extractor", "torchaudio")
        self.normalization = bool(data_cfg.get("normalization", False))
        self.global_mean = self.global_std = None
        if self.normalization and "global_cmvn" in data_cfg:
            base = data_cfg["global_cmvn"]
            self.global_mean = np.load(base + ".mean.npy")
            self.global_std = np.load(base + ".std.npy")

    def __call__(self, wav_path: str) -> np.ndarray:
        from ..data.datasets import _read_wav
        from ..ops.fbank import normalize_per_utterance

        sr, wav = _read_wav(wav_path)
        if self.flavor in ("psf", "python_speech_feature"):
            feat = logfbank_psf(wav, sample_freq=sr, num_mel_bins=self.num_mel_bins)
        else:
            feat = fbank_numpy(wav, sample_freq=sr, num_mel_bins=self.num_mel_bins)
        if self.normalization:
            if self.global_mean is not None:
                feat = (feat - self.global_mean) / self.global_std
            else:
                feat = normalize_per_utterance(feat)
        return feat.astype(np.float32)


class StreamingFbank:
    """Incremental kaldi-fbank over arriving PCM samples (snip-edges framing:
    frame t covers samples [t·160, t·160+400) at 16 kHz — new frames become
    final as soon as their window fills, so extraction is exact, not an
    approximation). CMVN online: global stats apply directly; a
    per-utterance-CMVN config uses **causal running CMVN** — frame t is
    normalized by the scalar mean/std of frames ≤ t (the online counterpart
    of ``ops/fbank.normalize_per_utterance``, which it approaches as the
    utterance grows; exact stats would need the whole utterance). The psf
    flavor extracts once at finish, so its per-utterance CMVN stays exact."""

    _noted = False

    def __init__(self, extractor: "FeatureExtractor", sample_rate: float):
        from ..ops.fbank import frame_params

        self.ex = extractor
        self.sr = float(sample_rate)
        self.ws, self.shift, _ = frame_params(self.sr, 25.0, 10.0)
        self.buf = np.zeros((0,), np.float32)
        self.frames_done = 0
        self._cmvn_n = 0
        self._cmvn_sum = 0.0
        self._cmvn_sumsq = 0.0
        if (extractor.normalization and extractor.global_mean is None
                and not StreamingFbank._noted):
            StreamingFbank._noted = True
            logger.info(
                "per-utterance CMVN config: PCM streams use causal running "
                "CMVN (frame t normalized by stats of frames <= t); set "
                "global_cmvn for exact streaming normalization")

    def _causal_cmvn(self, feat: np.ndarray) -> np.ndarray:
        """Scalar running mean/std over every element seen so far, applied
        causally — streamed features never depend on future audio."""
        k = feat.shape[1]
        csum = self._cmvn_sum + np.cumsum(feat.sum(axis=1, dtype=np.float64))
        csumsq = self._cmvn_sumsq + np.cumsum(
            (feat.astype(np.float64) ** 2).sum(axis=1))
        n = self._cmvn_n + k * np.arange(1, feat.shape[0] + 1)
        mean = csum / n
        std = np.maximum(np.sqrt(np.maximum(csumsq / n - mean ** 2, 0.0)), 1e-10)
        self._cmvn_sum = float(csum[-1])
        self._cmvn_sumsq = float(csumsq[-1])
        self._cmvn_n = int(n[-1])
        return ((feat - mean[:, None]) / std[:, None]).astype(np.float32)

    def _extract(self, final: bool = False) -> np.ndarray:
        n = len(self.buf)
        avail = 0 if n < self.ws else 1 + (n - self.ws) // self.shift
        if avail <= 0:
            return np.zeros((0, self.ex.num_mel_bins), np.float32)
        if self.ex.flavor in ("psf", "python_speech_feature"):
            if not final:
                return np.zeros((0, self.ex.num_mel_bins), np.float32)
            feat = logfbank_psf(self.buf, sample_freq=self.sr,
                                num_mel_bins=self.ex.num_mel_bins)
        else:
            # feed exactly the samples the new frames cover: snip-edges on
            # the slice reproduces frames [frames_done, frames_done+avail)
            need = (avail - 1) * self.shift + self.ws
            feat = fbank_numpy(self.buf[:need], sample_freq=self.sr,
                               num_mel_bins=self.ex.num_mel_bins)
            self.buf = self.buf[avail * self.shift:]
            self.frames_done += avail
        if self.ex.normalization:
            if self.ex.global_mean is not None:
                feat = (feat - self.ex.global_mean) / self.ex.global_std
            elif self.ex.flavor in ("psf", "python_speech_feature"):
                from ..ops.fbank import normalize_per_utterance
                feat = normalize_per_utterance(feat)  # whole utterance at finish
            elif feat.shape[0]:
                feat = self._causal_cmvn(feat)
        return feat.astype(np.float32)

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """[-1, 1]-scaled float samples → newly final fbank frames [T_new, F]
        (callers divide int16 PCM by 32768 first — the scale the model's
        global-CMVN stats were computed on; feeding raw int16 amplitudes
        would offset every log-fbank bin by ~2·log 32768)."""
        self.buf = np.concatenate([self.buf, np.asarray(samples, np.float32)])
        return self._extract()

    def finish(self) -> np.ndarray:
        return self._extract(final=True)


class _Request:
    __slots__ = ("utt_id", "feats", "reply", "t_in", "t_out")

    def __init__(self, utt_id: str, feats: np.ndarray, reply):
        self.utt_id = utt_id
        self.feats = feats
        self.reply = reply  # callable(utt_id, text)
        self.t_in = time.perf_counter()
        self.t_out = None


class DynamicBatcher:
    """Background thread: drain the request queue into fixed-shape batches.

    Every executed batch has shape [max_batch, bucket, F] — absent requests
    are padding rows (masked out and dropped from the results) — so the
    total number of XLA compilations is bounded by len(buckets).
    """

    def __init__(self, recognizer, buckets, max_batch=8, timeout_ms=30.0,
                 piece2word=False):
        self.recognizer = recognizer
        self.buckets = sorted(int(b) for b in buckets)
        self.max_batch = int(max_batch)
        self.timeout = float(timeout_ms) / 1000.0
        self.piece2word = piece2word
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self._warned_big: set[int] = set()
        self.latencies: list[float] = []
        self.audio_seconds = 0.0
        self.busy_seconds = 0.0
        self._stop = threading.Event()
        self._stopping = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()

    def submit(self, req: _Request):
        if self._stopping.is_set():
            # a handler that outlived the shutdown wait: answer empty
            # instead of enqueueing behind the stop sentinel (which would
            # never be processed, deadlocking the handler's done.acquire)
            req.reply(req.utt_id, "")
            return
        self.q.put(req)

    def drain_and_stop(self):
        self._stopping.set()
        self.q.join()
        self._stop.set()
        self.q.put(None)  # wake the loop
        self._thread.join()

    def warmup(self):
        """Compile every bucket shape with a dummy batch."""
        for bucket in self.buckets:
            feats = np.zeros((self.max_batch, bucket, self._nf), np.float32)
            mask = length_to_mask(jnp.asarray([bucket] * self.max_batch), bucket)
            t0 = time.perf_counter()
            self.recognizer.recognize(jnp.asarray(feats), mask)
            logger.info("warmup bucket %d: %.1fs", bucket, time.perf_counter() - t0)

    def set_n_feat(self, nf: int):
        self._nf = int(nf)

    # ------------------------------------------------------------------ loop
    def _loop(self):
        while not self._stop.is_set():
            req = self.q.get()
            if req is None:
                self.q.task_done()
                break
            group = [req]
            deadline = time.perf_counter() + self.timeout
            while len(group) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self.q.task_done()
                    self._stop.set()
                    break
                group.append(nxt)
            try:
                self._run(group)
            except Exception:
                logger.exception("batch failed; failing %d requests", len(group))
                for r in group:
                    r.reply(r.utt_id, "")
            finally:
                for _ in group:
                    self.q.task_done()

    def _run(self, group):
        from .eval import postprocess

        tmax = max(r.feats.shape[0] for r in group)
        bucket = next((b for b in self.buckets if b >= tmax), None)
        if bucket is None:
            # beyond the largest bucket: pad up to a bounded fresh shape
            # instead of silently dropping audio (a compile, not data loss);
            # round to a multiple of the LARGEST bucket so pathological
            # inputs can't mint one new compile per distinct length
            step = self.buckets[-1]
            bucket = ((tmax + step - 1) // step) * step
            if bucket not in self._warned_big:
                self._warned_big.add(bucket)
                logger.warning(
                    "request of %d frames exceeds the largest bucket %d; "
                    "padding to %d (compiles a new shape — consider adding "
                    "it to --bucket-frames)", tmax, self.buckets[-1], bucket)
        nf = group[0].feats.shape[1]
        feats = np.zeros((self.max_batch, bucket, nf), np.float32)
        lengths = np.zeros((self.max_batch,), np.int32)
        for i, r in enumerate(group):
            t = r.feats.shape[0]
            feats[i, :t] = r.feats
            lengths[i] = t
        lengths[len(group):] = 1  # padding rows: one valid frame, discarded
        mask = length_to_mask(jnp.asarray(lengths), bucket)
        t0 = time.perf_counter()
        texts, _ = self.recognizer.recognize(jnp.asarray(feats), mask)
        self.busy_seconds += time.perf_counter() - t0
        now = time.perf_counter()
        for i, r in enumerate(group):
            r.t_out = now
            self.latencies.append(now - r.t_in)
            self.audio_seconds += r.feats.shape[0] * 0.01
            r.reply(r.utt_id, postprocess(texts[i][0], self.piece2word))

    # ----------------------------------------------------------------- stats
    def stats(self) -> dict:
        lat = sorted(self.latencies)
        if not lat:
            return {"requests": 0}
        pct = lambda p: lat[min(int(len(lat) * p), len(lat) - 1)]  # noqa: E731
        return {
            "requests": len(lat),
            "latency_ms_p50": round(pct(0.50) * 1000, 1),
            "latency_ms_p90": round(pct(0.90) * 1000, 1),
            "latency_ms_p99": round(pct(0.99) * 1000, 1),
            "audio_seconds": round(self.audio_seconds, 2),
            "device_busy_seconds": round(self.busy_seconds, 2),
            "rtfx_served": round(self.audio_seconds / max(self.busy_seconds, 1e-9), 1),
        }


class MultiStreamFront:
    """Streaming front over ``recognize.multistream`` (CTC greedy or
    transducer greedy): N concurrent streams share ONE jitted step per tick
    (per-row ragged cache positions), instead of one dispatch per stream
    per chunk. A background tick thread drives the batch whenever any
    stream has a pending chunk; ``run_stream``/``open_stream`` mirror the
    session-pool API so both transports work unchanged."""

    def __init__(self, model, params, n_streams: int = 2, idx2unit=None,
                 piece2word: bool = False, model_type: str = "ctc",
                 max_per_frame: int = 8, beam_args: dict | None = None):
        from ..recognize.multistream import (
            MultiStreamAttention,
            MultiStreamCTC,
            MultiStreamTransducer,
        )

        if model_type == "transducer":
            self.ms = MultiStreamTransducer(
                model, params, n_streams=n_streams, idx2unit=idx2unit,
                max_per_frame=max_per_frame)
        elif model_type == "speech2text":
            self.ms = MultiStreamAttention(
                model, params, n_streams=n_streams, idx2unit=idx2unit,
                **(beam_args or {}))
        else:
            self.ms = MultiStreamCTC(model, params, n_streams=n_streams,
                                     idx2unit=idx2unit)
        self.piece2word = piece2word
        self.n_sessions = n_streams
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._drive, daemon=True)
        self._thread.start()

    def _drive(self):
        while not self._stop.is_set():
            try:
                advanced = self.ms.ready() and self.ms.tick()
            except Exception:
                # a dead tick thread would silently wedge every stream on
                # done.wait(); log, back off, and keep driving
                logger.exception("multi-stream tick failed; retrying")
                advanced = False
                time.sleep(0.25)
            if not advanced:
                time.sleep(0.002)

    def _post(self, text: str) -> str:
        from .eval import postprocess

        return postprocess(text, self.piece2word)

    def warmup(self, n_feat: int):
        t0 = time.perf_counter()
        self.run_stream(np.zeros((8 * self.ms.raw_chunk, n_feat), np.float32),
                        lambda _: None)
        logger.info("multi-stream warmup: %.1fs (1 fused step/tick, %d slots)",
                    time.perf_counter() - t0, self.n_sessions)

    def run_stream(self, feats: np.ndarray, on_partial) -> str:
        done = threading.Event()
        result = {}

        def on_final(text):
            result["text"] = text
            done.set()

        slot = self.ms.open_stream(
            "u", lambda t: on_partial(self._post(t)), on_final)
        self.ms.push(slot, feats)
        self.ms.close(slot)
        done.wait()
        return self._post(result["text"])

    # incremental API for the PCM transport
    def open_stream(self, utt_id, on_partial, on_final):
        return self.ms.open_stream(
            utt_id, lambda t: on_partial(self._post(t)),
            lambda t: on_final(self._post(t)))

    def push(self, slot, feats):
        self.ms.push(slot, feats)

    def close(self, slot):
        self.ms.close(slot)

    def stop(self):
        self._stop.set()
        self._thread.join()


def _build(args):
    """Load checkpoint + config, build recognizer/extractor/batcher."""
    from .eval import load_model_and_lm

    model, params, cfg, lm, lm_params = load_model_and_lm(
        args.load_model, args.config, args.load_language_model
    )
    idx2unit = load_idx2unit_map(cfg["data"]["vocab"])
    if getattr(args, "streaming", False):
        mtype = cfg["model"]["type"]
        if mtype not in ("ctc", "transducer", "speech2text"):
            raise SystemExit(f"--streaming does not support {mtype!r} models")
        # batched: N streams advance in ONE jitted step per tick (attention
        # models add one batched beam re-decode dispatch per tick)
        front = MultiStreamFront(
            model, params, n_streams=args.streams, idx2unit=idx2unit,
            piece2word=args.piece2word, model_type=mtype,
            max_per_frame=args.max_tokens_per_chunk,
            beam_args={"beam_width": args.beam_width, "max_len": args.max_len,
                       "penalty": args.penalty, "lamda": args.lamda})
        return front, FeatureExtractor(cfg["data"])
    recog_args = {
        "beam_width": args.beam_width, "nbest": args.nbest,
        "penalty": args.penalty, "lamda": args.lamda, "max_len": args.max_len,
        "lm_weight": args.lm_weight,
    }
    recognizer = build_recognizer(
        cfg["model"]["type"], model, params, lm=lm, lm_params=lm_params,
        args=recog_args, idx2unit=idx2unit,
    )
    extractor = FeatureExtractor(cfg["data"])
    buckets = [int(b) for b in str(args.bucket_frames).split(",") if b]
    batcher = DynamicBatcher(
        recognizer, buckets, max_batch=args.max_batch,
        timeout_ms=args.batch_timeout_ms, piece2word=args.piece2word,
    )
    batcher.set_n_feat(extractor.num_mel_bins)
    return batcher, extractor


def _serve_stream(args, batcher: DynamicBatcher, extractor: FeatureExtractor) -> int:
    src = sys.stdin if args.input == "-" else open(args.input, "r", encoding="utf-8")
    out = sys.stdout if args.output == "-" else open(args.output, "w", encoding="utf-8")
    out_lock = threading.Lock()

    def reply(utt_id, text):
        with out_lock:
            out.write(f"{utt_id}\t{text}\n")
            out.flush()

    n = 0
    for line in src:
        parts = line.strip().split(maxsplit=1)
        if len(parts) != 2:
            continue
        utt_id, path = parts
        try:
            feats = extractor(path)
        except Exception as e:
            logger.error("feature extraction failed for %s: %s", utt_id, e)
            reply(utt_id, "")
            continue
        batcher.submit(_Request(utt_id, feats, reply))
        n += 1
    batcher.drain_and_stop()
    if src is not sys.stdin:
        src.close()
    if out is not sys.stdout:
        out.close()
    logger.info("served %d requests: %s", n, batcher.stats())
    return 0


def _serve_tcp(args, batcher: DynamicBatcher, extractor: FeatureExtractor) -> int:
    import socketserver

    # in-flight handler tracking: drain_and_stop may only run after every
    # handler thread is past its final batcher.submit, else a request
    # enqueued after the stop sentinel would never be processed and its
    # handler would block forever on done.acquire()
    inflight = threading.Semaphore(0)
    inflight_n = [0]
    inflight_lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def setup(self):
            super().setup()
            with inflight_lock:
                inflight_n[0] += 1

        def finish(self):
            try:
                super().finish()
            finally:
                inflight.release()

        def handle(self):
            wlock = threading.Lock()

            def reply(utt_id, text):
                with wlock:
                    try:
                        self.wfile.write(f"{utt_id}\t{text}\n".encode())
                        self.wfile.flush()
                    except (BrokenPipeError, OSError):
                        pass

            pending = 0
            done = threading.Semaphore(0)

            def counted_reply(utt_id, text):
                reply(utt_id, text)
                done.release()

            for raw in self.rfile:
                parts = raw.decode().strip().split(maxsplit=1)
                if len(parts) != 2:
                    continue
                utt_id, path = parts
                try:
                    feats = extractor(path)
                except Exception as e:
                    logger.error("feature extraction failed for %s: %s", utt_id, e)
                    reply(utt_id, "")
                    continue
                batcher.submit(_Request(utt_id, feats, counted_reply))
                pending += 1
            for _ in range(pending):  # hold the connection until all answered
                done.acquire()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((args.host, args.port), Handler) as srv:
        logger.info("serving on %s:%d (max_batch=%d, timeout=%.0fms)",
                    args.host, args.port, batcher.max_batch, batcher.timeout * 1000)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
    # the server socket is closed (no NEW connections); wait for active
    # handlers to finish submitting before draining the batcher
    with inflight_lock:
        n = inflight_n[0]
    for _ in range(n):
        inflight.acquire(timeout=60)
    batcher.drain_and_stop()
    logger.info("shutdown: %s", batcher.stats())
    return 0


def _serve_stream_streaming(args, pool: MultiStreamFront,
                            extractor: FeatureExtractor) -> int:
    """Sequential streaming over a wav.scp source: per utterance, emit
    `utt<TAB>PARTIAL<TAB>text` lines as hypotheses evolve chunk by chunk,
    then `utt<TAB>FINAL<TAB>text`."""
    src = sys.stdin if args.input == "-" else open(args.input, "r", encoding="utf-8")
    out = sys.stdout if args.output == "-" else open(args.output, "w", encoding="utf-8")
    n = 0
    t0 = time.perf_counter()
    audio_s = 0.0
    for line in src:
        parts = line.strip().split(maxsplit=1)
        if len(parts) != 2:
            continue
        utt_id, path = parts
        try:
            feats = extractor(path)
        except Exception as e:
            logger.error("feature extraction failed for %s: %s", utt_id, e)
            out.write(f"{utt_id}\tFINAL\t\n")
            continue
        audio_s += feats.shape[0] * 0.01

        def on_partial(text, _u=utt_id):
            out.write(f"{_u}\tPARTIAL\t{text}\n")
            out.flush()

        final = pool.run_stream(feats, on_partial)
        out.write(f"{utt_id}\tFINAL\t{final}\n")
        out.flush()
        n += 1
    if src is not sys.stdin:
        src.close()
    if out is not sys.stdout:
        out.close()
    dt = time.perf_counter() - t0
    logger.info("streamed %d utterances (%.1fs audio) in %.1fs (%.1fx realtime)",
                n, audio_s, dt, audio_s / max(dt, 1e-9))
    return 0


def _handle_pcm_stream(handler, header: str, front, extractor) -> None:
    """Length-prefixed binary PCM over TCP — real audio transport (replaces
    wav-file simulation). One stream per connection:

      client → `PCM <utt_id> <sample_rate>\\n` then repeated frames of
               [u32-LE byte count N][N bytes int16-LE mono samples];
               N = 0 ends the stream.
      server → `utt_id\\tPARTIAL\\ttext\\n` lines as the hypothesis grows,
               then `utt_id\\tFINAL\\ttext\\n`.

    Features extract incrementally (StreamingFbank); the stream joins the
    multistream front's shared one-dispatch-per-tick batch. The slot is
    released in a ``finally`` — an abrupt client disconnect (RST, truncated
    frame) must not leak it, or ``--streams`` disconnects would exhaust the
    pool and block every later ``open_stream`` forever."""
    import struct

    parts = header.split()
    utt_id = parts[1] if len(parts) > 1 else "stream"
    sr = float(parts[2]) if len(parts) > 2 else 16000.0
    wlock = threading.Lock()

    def say(kind, text):
        with wlock:
            try:
                handler.wfile.write(f"{utt_id}\t{kind}\t{text}\n".encode())
                handler.wfile.flush()
            except (BrokenPipeError, OSError):
                pass

    def read_exact(n):
        data = b""
        while len(data) < n:
            more = handler.rfile.read(n - len(data))
            if not more:
                raise EOFError
            data += more
        return data

    sfe = StreamingFbank(extractor, sr)
    done = threading.Event()
    slot = front.open_stream(
        utt_id, lambda t: say("PARTIAL", t),
        lambda t: (say("FINAL", t), done.set()))
    try:
        while True:
            (n,) = struct.unpack("<I", read_exact(4))
            if n == 0:
                break
            samples = np.frombuffer(read_exact(n), "<i2").astype(np.float32) / 32768.0
            frames = sfe.feed(samples)
            if len(frames):
                front.push(slot, frames)
    except (EOFError, OSError, struct.error):
        pass  # client went away mid-stream: finalize whatever arrived
    finally:
        tail = sfe.finish()
        if len(tail):
            front.push(slot, tail)
        front.close(slot)
    done.wait(timeout=300.0)


def _serve_tcp_streaming(args, pool,
                         extractor: FeatureExtractor) -> int:
    """TCP streaming: a connection either speaks the binary PCM protocol
    (first line `PCM <utt_id> <rate>`, see ``_handle_pcm_stream``) or sends
    `utt_id wav_path` lines; either way the client receives PARTIAL lines
    then a FINAL line per stream."""
    import socketserver

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            first = self.rfile.readline()
            if not first:
                return
            text = first.decode(errors="replace").strip()
            if text.startswith("PCM"):
                try:
                    _handle_pcm_stream(self, text, pool, extractor)
                except Exception:
                    logger.exception("pcm stream failed")
                return
            import itertools

            for raw in itertools.chain([first], self.rfile):
                parts = raw.decode().strip().split(maxsplit=1)
                if len(parts) != 2:
                    continue
                utt_id, path = parts
                try:
                    feats = extractor(path)
                except Exception as e:
                    logger.error("feature extraction failed for %s: %s", utt_id, e)
                    self.wfile.write(f"{utt_id}\tFINAL\t\n".encode())
                    continue

                def on_partial(text, _u=utt_id):
                    try:
                        self.wfile.write(f"{_u}\tPARTIAL\t{text}\n".encode())
                        self.wfile.flush()
                    except (BrokenPipeError, OSError):
                        pass

                final = pool.run_stream(feats, on_partial)
                try:
                    self.wfile.write(f"{utt_id}\tFINAL\t{final}\n".encode())
                    self.wfile.flush()
                except (BrokenPipeError, OSError):
                    return

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((args.host, args.port), Handler) as srv:
        logger.info("streaming on %s:%d (%d sessions)", args.host, args.port,
                    args.streams)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
    return 0


def main(argv=None) -> int:
    from . import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s",
                        force=True)
    if args.port is None and args.input is None:
        raise SystemExit("pass -i <wav.scp|-> or --port N")
    front, extractor = _build(args)
    if args.streaming:
        if args.warmup:
            front.warmup(extractor.num_mel_bins)
        if args.port is not None:
            return _serve_tcp_streaming(args, front, extractor)
        return _serve_stream_streaming(args, front, extractor)
    if args.warmup:
        front.warmup()
    front.start()
    if args.port is not None:
        return _serve_tcp(args, front, extractor)
    return _serve_stream(args, front, extractor)


if __name__ == "__main__":
    sys.exit(main())
