"""RNN-Transducer (RNNT) model family: prediction + joint networks.

The reference only hints at a transducer sibling (checkpoint keys ``joint``
and ``look_ahead_conv`` loaded by ``eval.py:45-53``; transducer CLI flags at
``eval.py:223-226``; no model class in-repo). This is a full implementation:

  * ``TransducerPredictionNetwork`` — embedding → LSTM stack (label-history
    encoder; same LSTM layout as ``models/lm.RecurrentLanguageModel`` so
    per-gate kernels match torch fused-gate conversion if ever needed).
  * ``TransducerJointNetwork`` — enc-proj + pred-proj → tanh → vocab linear,
    the standard additive joiner.
  * ``TransducerModel`` — frontend → (chunked-attention-capable) encoder →
    RNNT loss (``ops/rnnt_loss.py``); frame-synchronous greedy decode as ONE
    ``lax.while_loop`` (batched, per-stream frame pointers).

TPU notes: the loss reads only the blank and target-label log-probs of the
[B, T, U+1, V] joint. Under ~2 GiB of logits the one-shot full joint wins
(a single fused broadcast-add + tanh + matmul chain, pure MXU); past that
the joint is evaluated in rematerialized T-blocks
(``TransducerJointNetwork.blank_emit_log_probs``: peak memory
O(B·t_block·U·V) in both passes, ~1.4x step time for O(T/t_block) less
memory). ``joint_t_block`` picks the strategy (-1 auto / 0 full / N
blocked). Greedy decode is O(T + U) joint evaluations per stream, all
inside jit with static shapes. Blank = PAD = 0 (vocab contract,
``data/__init__.py``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import BLK
from ..ops.masks import mask_to_length
from ..ops.rnnt_loss import rnnt_loss_from_blank_emit, rnnt_loss_mean
from .modules import TorchLinear
from .speech2text import _build_encoder, _build_frontend

Dtype = Any


class TransducerPredictionNetwork(nn.Module):
    vocab_size: int
    d_model: int = 256
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.d_model,
            embedding_init=nn.initializers.normal(1.0), dtype=self.dtype,
            name="embedding",
        )
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype),
                   return_carry=True, name=f"lstm_{i}")
            for i in range(self.num_layers)
        ]
        self.drop = nn.Dropout(self.dropout)

    def init_hidden(self, batch: int):
        return [
            (jnp.zeros((batch, self.d_model), self.dtype),
             jnp.zeros((batch, self.d_model), self.dtype))
            for _ in range(self.num_layers)
        ]

    def __call__(self, tokens, *, deterministic: bool = True):
        """tokens i32[B, U1] (BOS⧺labels) → states f32[B, U1, D]."""
        x = self.embedding(tokens)
        hidden = self.init_hidden(tokens.shape[0])
        for i, rnn in enumerate(self.rnns):
            _, x = rnn(x, initial_carry=hidden[i])
            if i + 1 < len(self.rnns):
                x = self.drop(x, deterministic=deterministic)
        return x

    def decode_step(self, token_t, hidden):
        """token_t i32[B] → (state f32[B, D], new hidden)."""
        x = self.embedding(token_t)[:, None, :]
        new_hidden = []
        for i, rnn in enumerate(self.rnns):
            carry, x = rnn(x, initial_carry=hidden[i])
            new_hidden.append(carry)
        return x[:, 0, :], new_hidden


class TransducerJointNetwork(nn.Module):
    vocab_size: int
    d_joint: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc_proj = TorchLinear(self.d_joint, dtype=self.dtype, name="enc_proj")
        self.pred_proj = TorchLinear(self.d_joint, dtype=self.dtype, name="pred_proj")
        self.output_layer = TorchLinear(self.vocab_size, dtype=self.dtype, name="output_layer")

    def __call__(self, enc, pred):
        """enc [B, T, De], pred [B, U1, Dp] → logits f32[B, T, U1, V]."""
        h = jnp.tanh(self.enc_proj(enc)[:, :, None, :] + self.pred_proj(pred)[:, None, :, :])
        return self.output_layer(h).astype(jnp.float32)

    def step(self, enc_t, pred_u):
        """enc_t [B, De], pred_u [B, Dp] → logits f32[B, V]."""
        h = jnp.tanh(self.enc_proj(enc_t) + self.pred_proj(pred_u))
        return self.output_layer(h).astype(jnp.float32)

    def step_argmax(self, enc_t, pred_u):
        """Argmax label of ``step`` without materializing the [B, V] logits
        (fused projection top-1, ``ops/project_topk``; XLA fallback off-TPU).
        Same smallest-index tie rule as ``jnp.argmax``; identical ids in f32
        (under bf16 the fused f32 accumulation can pick differently where
        ``step``'s bf16-rounded logits tie). Returns i32[B]."""
        from ..ops.project_topk import project_logp_topk

        h = jnp.tanh(self.enc_proj(enc_t) + self.pred_proj(pred_u))
        p = self.output_layer.variables["params"]["dense"]
        _, idx = project_logp_topk(h, p["kernel"].T, p["bias"], 1)
        return idx[:, 0]

    def blank_emit_log_probs(self, enc, pred, labels, blank: int = 0,
                             t_block: int = 16):
        """Memory-lean joint evaluation: only the lattice-visible log-probs.

        The RNNT loss reads exactly two slices of the [B, T, U+1, V] joint —
        log P(blank | t, u) and log P(label_u | t, u) — yet the naive path
        materializes (and backprops through) the whole V axis: at the
        flagship geometry (B=8, T=125, U=32, V=4233) that is ~0.5 GB of f32
        logits for ~0.25 MB of useful output. Here the T axis is processed
        in blocks of ``t_block``: each block computes its [B, TB, U+1, V]
        logits, reduces them to the two slices, and discards them;
        ``nn.remat`` recomputes the block in the backward pass, so peak
        memory is O(B·TB·U1·V) in both directions.

        enc [B, T, De], pred [B, U1, Dp], labels i32[B, U1-1] →
        (lp_blank f32[B, T, U1], emit f32[B, T, U1-1]).
        """
        eh = self.enc_proj(enc)                      # [B, T, J]
        ph = self.pred_proj(pred)                    # [B, U1, J]
        b, t, j = eh.shape
        n_blk = -(-t // t_block)
        t_pad = n_blk * t_block
        eh = jnp.pad(eh, ((0, 0), (0, t_pad - t), (0, 0)))
        eh_blocks = eh.reshape(b, n_blk, t_block, j).transpose(1, 0, 2, 3)

        def _block(mdl, carry, eh_blk, ph, labels):
            h = jnp.tanh(eh_blk[:, :, None, :] + ph[:, None, :, :])
            logits = mdl.output_layer(h).astype(jnp.float32)  # [B, TB, U1, V]
            lse = jax.nn.logsumexp(logits, axis=-1)
            lpb = logits[..., blank] - lse
            em = jnp.take_along_axis(
                logits[:, :, :-1, :], labels[:, None, :, None], axis=-1,
            )[..., 0] - lse[:, :, :-1]
            return carry, (lpb, em)

        scan = nn.scan(
            nn.remat(_block, prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        _, (lpb, em) = scan(self, None, eh_blocks, ph, labels)
        lpb = lpb.transpose(1, 0, 2, 3).reshape(b, t_pad, -1)[:, :t]
        em = em.transpose(1, 0, 2, 3).reshape(b, t_pad, -1)[:, :t]
        return lpb, em


class TransducerModel(nn.Module):
    """frontend → encoder → prediction/joint networks with RNNT loss."""

    frontend_type: str
    frontend_cfg: dict
    encoder_type: str
    encoder_cfg: dict
    vocab_size: int
    predictor_cfg: dict | None = None
    d_joint: int = 256
    moe_aux_weight: float = 0.01  # weight of the MoE load-balance loss
    # Joint evaluation strategy for the loss: -1 = auto (one-shot full joint
    # while the [B, T, U+1, V] logits stay under ~2 GiB — fastest, measured
    # 311 utts/s vs 190 blocked at B=32 flagship — else memory-lean
    # T-blocks); 0 = force full; N>0 = force T-blocks of N (the blocked
    # path trades ~1.4x step time for O(T/N) less peak memory).
    joint_t_block: int = -1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.frontend = _build_frontend(self.frontend_type, self.frontend_cfg, self.dtype)
        self.encoder = _build_encoder(self.encoder_type, self.encoder_cfg, self.dtype)
        pc = dict(self.predictor_cfg or {})
        pc.setdefault("d_model", self.encoder_cfg.get("d_model", 256))
        self.predictor = TransducerPredictionNetwork(
            vocab_size=self.vocab_size, dtype=self.dtype, name="predictor",
            **{k: v for k, v in pc.items()
               if k in ("d_model", "num_layers", "dropout")},
        )
        self.joint = TransducerJointNetwork(
            vocab_size=self.vocab_size, d_joint=self.d_joint, dtype=self.dtype,
            name="joint",
        )

    def encode(self, feats, feat_mask, *, deterministic: bool = True, train: bool = False,
               return_aux: bool = False):
        x, mask = self.frontend(
            feats.astype(self.dtype), feat_mask, deterministic=deterministic, train=train)
        enc_out = self.encoder(x, mask, deterministic=deterministic, **(
            {"train": train} if self.encoder_type == "conformer" else {}))
        if return_aux:
            return enc_out[0], enc_out[1], (enc_out[2] if len(enc_out) > 2 else None)
        return enc_out[0], enc_out[1]

    def __call__(self, feats, feat_mask, targets, targets_length, *,
                 deterministic: bool = True, train: bool = False):
        """Collate contract (BOS⧺y⧺EOS⧺PAD, targets_length = len(y)+1):
        prediction input = BOS⧺y…, labels = y with length len(y)."""
        memory, memory_mask, moe_aux = self.encode(
            feats, feat_mask, deterministic=deterministic, train=train, return_aux=True)
        pred_in = targets[:, :-1]
        pred = self.predictor(pred_in, deterministic=deterministic)
        frame_len = mask_to_length(memory_mask)
        t_block = self.joint_t_block
        if t_block < 0:  # auto: full joint until its logits exceed ~2 GiB
            b, t = memory.shape[0], memory.shape[1]
            logits_bytes = 4 * b * t * pred_in.shape[1] * self.vocab_size
            t_block = 0 if logits_bytes <= (2 << 30) else 32
        if t_block > 0:
            u_max = pred_in.shape[1] - 1
            lp_blank, emit = self.joint.blank_emit_log_probs(
                memory, pred, targets[:, 1:1 + u_max], blank=BLK,
                t_block=t_block)
            loss = jnp.mean(rnnt_loss_from_blank_emit(
                lp_blank, emit, frame_len, targets_length - 1))
        else:
            logits = self.joint(memory, pred)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            loss = rnnt_loss_mean(
                log_probs, targets[:, 1:], frame_len,
                targets_length - 1, blank=BLK)
        aux = {}
        if moe_aux is not None:
            aux["moe_aux"] = moe_aux
            loss = loss + self.moe_aux_weight * moe_aux
        return loss, aux

    def init_decode_state(self, batch: int):
        """(prediction state, hidden) primed with BOS — the carry for
        ``greedy_frames`` (offline decode and chunk-streaming share it)."""
        hidden = self.predictor.init_hidden(batch)
        state, hidden = self.predictor.decode_step(
            jnp.full((batch,), 1, jnp.int32), hidden)  # BOS = 1
        return state, hidden

    def greedy_frames(self, memory, frame_len, state, hidden,
                      max_symbols: int = 200, max_per_frame: int = 8):
        """Frame-synchronous greedy search over ``memory`` frames: at each
        lattice state, emit the argmax label and advance the prediction
        network, or consume a frame on blank. One ``lax.while_loop``; every
        stream runs until its frames are exhausted (symbol caps force blank).

        Returns (tokens i32[B, max_symbols] 0-padded, n i32[B], state, hidden)
        — the carried (state, hidden) make this resumable chunk-by-chunk.
        """
        b, t_max, _ = memory.shape

        def cond(st):
            t = st[0]
            return jnp.any(t < frame_len)

        def body(st):
            t, state, hidden, tokens, n, emitted_in_frame = st
            t_safe = jnp.minimum(t, t_max - 1)
            enc_t = jnp.take_along_axis(memory, t_safe[:, None, None], axis=1)[:, 0]
            best = self.joint.step_argmax(enc_t, state)  # fused: no [B, V]
            active = t < frame_len
            can_emit = jnp.logical_and(active, n < max_symbols)
            can_emit = jnp.logical_and(can_emit, emitted_in_frame < max_per_frame)
            emit = jnp.logical_and(best != BLK, can_emit)

            new_state, new_hidden = self.predictor.decode_step(best, hidden)
            state = jnp.where(emit[:, None], new_state, state)
            hidden = [
                (jnp.where(emit[:, None], nh[0], h[0]),
                 jnp.where(emit[:, None], nh[1], h[1]))
                for nh, h in zip(new_hidden, hidden)
            ]
            tokens = jax.lax.select(
                jnp.logical_and(
                    emit[:, None],
                    jnp.arange(tokens.shape[1])[None] == n[:, None]),
                jnp.broadcast_to(best[:, None], tokens.shape), tokens)
            n = jnp.where(emit, n + 1, n)
            t = jnp.where(jnp.logical_and(active, ~emit), t + 1, t)
            emitted_in_frame = jnp.where(emit, emitted_in_frame + 1, 0)
            return t, state, hidden, tokens, n, emitted_in_frame

        st0 = (jnp.zeros(b, jnp.int32), state, hidden,
               jnp.zeros((b, max_symbols), jnp.int32), jnp.zeros(b, jnp.int32),
               jnp.zeros(b, jnp.int32))
        _, state, hidden, tokens, n, _ = jax.lax.while_loop(cond, body, st0)
        return tokens, n, state, hidden

    def greedy_decode(self, feats, feat_mask, max_symbols: int = 200,
                      max_per_frame: int = 8):
        """Offline batched greedy search.

        Returns (tokens i32[B, max_symbols] 0-padded, n_tokens i32[B]).
        """
        memory, memory_mask = self.encode(feats, feat_mask)
        b = memory.shape[0]
        state, hidden = self.init_decode_state(b)
        tokens, n, _, _ = self.greedy_frames(
            memory, mask_to_length(memory_mask), state, hidden, max_symbols,
            max_per_frame)
        return tokens, n

    def beam_decode(self, feats, feat_mask, beam_width: int = 4,
                    max_symbols: int = 100, expansions: int = 2,
                    lm_init=None, lm_step=None, lm_weight: float = 0.0):
        """Time-synchronous RNNT beam search with bounded per-frame
        expansions (mAES-style): at every frame, each of K hypotheses is
        blank-finalized into the next-frame beam and (up to ``expansions``
        times) extended by its top non-blank labels; the next-frame beam is
        the global top-K over all finalized candidates, with equal label
        sequences logaddexp-merged (prefix merging) so duplicates never
        occupy beam slots. Fixed shapes throughout; one lax.scan over frames.

        Optional external-LM shallow fusion: ``lm_init``/``lm_step`` adapters
        (``recognize/base.make_lm_adapter``; stateful per-hypothesis, so
        RNN LMs — blank moves don't advance the LM, label expansions add
        ``lm_weight · log p_lm(label | prefix)`` and step the LM state).

        Returns (tokens i32[B, K, max_symbols], lengths i32[B, K],
        scores f32[B, K]) sorted best-first.
        """
        neg = -1.0e30
        memory, memory_mask = self.encode(feats, feat_mask)
        b, t_max, _ = memory.shape
        k = beam_width
        frame_len = mask_to_length(memory_mask)

        state0, hidden0 = self.init_decode_state(b)

        def tile(x):
            return jnp.repeat(x[:, None], k, axis=1)

        def beam_gather(tree, idx):
            # gather along the beam axis (axis 1) by idx [B, K]
            def g(x):
                ii = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
                return jnp.take_along_axis(x, ii, axis=1)
            return jax.tree_util.tree_map(g, tree)

        use_lm = lm_step is not None and lm_weight != 0.0
        beam = {
            "scores": jnp.full((b, k), neg).at[:, 0].set(0.0),
            "tokens": jnp.zeros((b, k, max_symbols), jnp.int32),
            "lens": jnp.zeros((b, k), jnp.int32),
            "state": tile(state0),                      # [B, K, D]
            "hidden": [(tile(h), tile(c)) for h, c in hidden0],
        }
        if use_lm:
            lm_lp0, lm_state0 = lm_step(jnp.full((b,), 1, jnp.int32), lm_init(b), 0)
            beam["lm_lp"] = tile(lm_lp0)                # [B, K, V] next-label dist
            beam["lm_state"] = jax.tree_util.tree_map(tile, lm_state0)

        def joint_logp(enc_t, beam_state):
            # enc_t [B, D]; beam_state [B, K, D] → log-probs [B, K, V]
            enc_bk = jnp.repeat(enc_t[:, None], k, axis=1).reshape(b * k, -1)
            logits = self.joint.step(enc_bk, beam_state.reshape(b * k, -1))
            return jax.nn.log_softmax(logits, axis=-1).reshape(b, k, -1)

        def frame_step(beam, inputs):
            enc_t, t = inputs
            active = beam
            done = {**beam, "scores": jnp.full((b, k), neg)}
            for e in range(expansions + 1):
                logp = joint_logp(enc_t, active["state"])
                # blank-finalize every active hyp into the done set (top-K
                # over the union keeps shapes fixed)
                blank_scores = active["scores"] + logp[..., BLK]
                cat = jax.tree_util.tree_map(
                    lambda d, a: jnp.concatenate([d, a], axis=1),
                    {kk: vv for kk, vv in done.items() if kk != "scores"},
                    {kk: vv for kk, vv in active.items() if kk != "scores"})
                cat_scores = jnp.concatenate([done["scores"], blank_scores], axis=1)
                # prefix merge over the 2K union: identical label sequences
                # (token buffers are 0-padded past lens, so whole-buffer
                # equality + equal length is exact) fold into the earliest
                # slot with logaddexp; later duplicates are disabled
                same = jnp.logical_and(
                    jnp.all(cat["tokens"][:, :, None, :] == cat["tokens"][:, None, :, :],
                            axis=-1),
                    cat["lens"][:, :, None] == cat["lens"][:, None, :])
                slot = jnp.arange(2 * k)
                is_dup = jnp.any(
                    jnp.logical_and(same, slot[None, :, None] < slot[None, None, :]),
                    axis=1)
                merged = jax.nn.logsumexp(
                    jnp.where(same, cat_scores[:, None, :], neg), axis=-1)
                cat_scores = jnp.where(is_dup, neg, merged)
                _, top = jax.lax.top_k(cat_scores, k)
                done = {"scores": jnp.take_along_axis(cat_scores, top, axis=1),
                        **beam_gather(cat, top)}
                if e == expansions:
                    break
                # expand: top-K non-blank continuations over K·V candidates
                nb = active["scores"][:, :, None] + logp
                if use_lm:
                    nb = nb + lm_weight * active["lm_lp"]
                nb = nb.at[..., BLK].set(neg)
                nb = jnp.where((active["lens"] < max_symbols)[:, :, None], nb, neg)
                v = nb.shape[-1]
                flat_scores, flat_idx = jax.lax.top_k(nb.reshape(b, k * v), k)
                parent = flat_idx // v
                label = (flat_idx % v).astype(jnp.int32)
                new = {"scores": flat_scores,
                       **beam_gather(
                           {kk: vv for kk, vv in active.items() if kk != "scores"},
                           parent)}
                pos = jnp.arange(max_symbols)[None, None, :] == new["lens"][:, :, None]
                new["tokens"] = jnp.where(pos, label[:, :, None], new["tokens"])
                new["lens"] = new["lens"] + 1
                ns, nh = self.predictor.decode_step(
                    label.reshape(b * k),
                    [(h.reshape(b * k, -1), c.reshape(b * k, -1))
                     for h, c in new["hidden"]])
                new["state"] = ns.reshape(b, k, -1)
                new["hidden"] = [(h.reshape(b, k, -1), c.reshape(b, k, -1))
                                 for h, c in nh]
                if use_lm:
                    flat_lm_state = jax.tree_util.tree_map(
                        lambda x: x.reshape((b * k,) + x.shape[2:]), new["lm_state"])
                    # per-hypothesis LM position: BOS sat at 0, labels at 1..
                    lm_lp, lm_state = lm_step(
                        label.reshape(b * k), flat_lm_state,
                        new["lens"].reshape(b * k))
                    new["lm_lp"] = lm_lp.reshape(b, k, -1)
                    new["lm_state"] = jax.tree_util.tree_map(
                        lambda x: x.reshape((b, k) + x.shape[1:]), lm_state)
                active = new

            # advance only streams that still have frames
            live = (t < frame_len)[:, None]

            def sel(old, upd):
                return jax.tree_util.tree_map(
                    lambda o, u: jnp.where(
                        live.reshape(live.shape + (1,) * (o.ndim - 2)), u, o),
                    old, upd)

            return sel(beam, done), None

        xs = (jnp.moveaxis(memory, 1, 0), jnp.arange(t_max))
        beam, _ = jax.lax.scan(frame_step, beam, xs)
        order = jnp.argsort(-beam["scores"], axis=1)
        return (jnp.take_along_axis(beam["tokens"], order[:, :, None], axis=1),
                jnp.take_along_axis(beam["lens"], order, axis=1),
                jnp.take_along_axis(beam["scores"], order, axis=1))
