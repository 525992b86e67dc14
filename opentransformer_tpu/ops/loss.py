"""Losses: label smoothing and CTC.

Label smoothing follows the reference semantics exactly
(``otrans/module/loss.py:12-50``): KL(log_softmax ‖ smoothed one-hot) with the
off-target mass ``smoothing / (vocab - 1)``, PAD positions dropped, and the
sum normalized by the number of non-PAD target tokens (``normalize_length``).

CTC uses ``optax.ctc_loss`` (blank id 0 matches the data contract BLK=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..data import PAD


def label_smoothing_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.1,
    pad_id: int = PAD,
    normalize_length: bool = True,
) -> jnp.ndarray:
    """Label-smoothed KL loss.

    Args:
      logits: f[B, U, V]
      targets: i[B, U] with PAD on ignored positions
      smoothing: label-smoothing mass spread over the other V-1 classes
      normalize_length: divide by #non-pad tokens (reference default) instead
        of batch size.

    Returns scalar loss (f32).
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    fill = smoothing / (vocab - 1)
    # KL(true ‖ pred) up to the constant entropy of the smoothed target:
    # the reference uses torch KLDivLoss(log_prob, true_dist) which includes
    # the true_dist*log(true_dist) term only through constants — gradient
    # equal; we match its reported value by computing sum(true * (log true - logp))
    # with 0*log0 := 0.
    true_dist = jnp.full(logits.shape, fill, dtype=jnp.float32)
    one_hot = jax.nn.one_hot(targets, vocab, dtype=jnp.float32)
    true_dist = true_dist * (1.0 - one_hot) + confidence * one_hot
    log_true = jnp.where(true_dist > 0, jnp.log(jnp.maximum(true_dist, 1e-20)), 0.0)
    kl = jnp.sum(true_dist * (log_true - logp), axis=-1)  # [B, U]

    token_mask = (targets != pad_id).astype(jnp.float32)
    total = jnp.sum(kl * token_mask)
    if normalize_length:
        denom = jnp.maximum(jnp.sum(token_mask), 1.0)
    else:
        denom = jnp.asarray(logits.shape[0], dtype=jnp.float32)
    return total / denom


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Mean-per-utterance CTC loss (matches torch.nn.CTCLoss 'mean' + zero_infinity).

    Args:
      logits: f[B, T, V] encoder-frame logits
      logit_lengths: i[B]
      labels: i[B, U] PAD-padded label sequences (no BOS/EOS)
      label_lengths: i[B]
    """
    b, t, _ = logits.shape
    u = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(u)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, labels, label_pad, blank_id=blank_id
    )  # [B]
    # zero_infinity semantics: invalid alignments (label longer than frames)
    # contribute 0, like the reference's nn.CTCLoss(zero_infinity=True).
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    # torch 'mean' reduction divides each sequence loss by its label length,
    # then averages over the batch.
    per_seq = per_seq / jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    return jnp.mean(per_seq)
