"""Transducer family: RNNT loss correctness (vs brute-force enumeration),
model training/decoding, and the CLI end-to-end path.

The reference only hints at transducers (checkpoint keys / CLI flags,
``eval.py:45-53,223-226``) — this family is fully realized here, so the
correctness bar is math: the DP loss must equal an exhaustive sum over
alignments on small lattices.
"""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from opentransformer_tpu.ops.rnnt_loss import rnnt_loss

from tests.test_ctc_e2e import FEAT_DIM, N_UNITS, make_ctc_corpus


def brute_force_rnnt(lp, label, t_len, u_len):
    """-log sum over all monotone alignments (emit label_u at frame f_u,
    nondecreasing; blank advances each frame incl. the last)."""
    total = -np.inf
    for frames in itertools.product(range(t_len), repeat=u_len):
        if any(frames[i] > frames[i + 1] for i in range(u_len - 1)):
            continue
        lpsum, u = 0.0, 0
        for t in range(t_len):
            while u < u_len and frames[u] == t:
                lpsum += lp[t, u, label[u]]
                u += 1
            lpsum += lp[t, u, 0]
        total = np.logaddexp(total, lpsum)
    return -total


def test_rnnt_loss_matches_brute_force():
    rng = np.random.default_rng(0)
    b, t, u, v = 3, 4, 3, 6
    logits = rng.normal(size=(b, t, u + 1, v)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    t_lens = np.array([4, 3, 2], np.int32)
    u_lens = np.array([3, 2, 1], np.int32)

    ours = np.asarray(rnnt_loss(lp, jnp.asarray(labels), jnp.asarray(t_lens),
                                jnp.asarray(u_lens)))
    ref = np.array([
        brute_force_rnnt(np.asarray(lp[i]), labels[i], t_lens[i], u_lens[i])
        for i in range(b)
    ])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    grad = jax.grad(lambda x: jnp.sum(rnnt_loss(
        jax.nn.log_softmax(x, -1), jnp.asarray(labels),
        jnp.asarray(t_lens), jnp.asarray(u_lens))))(jnp.asarray(logits))
    assert bool(jnp.all(jnp.isfinite(grad)))


def _tiny_cfg():
    return {
        "type": "transducer", "frontend_type": "conv",
        "frontend": {"input_size": FEAT_DIM, "output_size": 32, "mid_channel": 8,
                     "out_channel": 16, "kernel_size": [[3, 3], [3, 3]], "stride": [2, 2]},
        "encoder_type": "transformer",
        "encoder": {"d_model": 32, "n_heads": 2, "d_ff": 64, "n_blocks": 2,
                    "residual_dropout": 0.0},
        "vocab_size": 3 + N_UNITS,
        "predictor": {"num_layers": 1},
        "d_joint": 32,
    }


def test_transducer_overfits_one_batch():
    """A few hundred adam steps on one tiny batch must drive the RNNT loss
    down and make greedy decode reproduce the labels exactly."""
    import optax

    from opentransformer_tpu.models.registry import build_model

    model = build_model(_tiny_cfg())
    rng = np.random.default_rng(1)
    b, t, u = 4, 36, 3
    patterns = rng.normal(size=(N_UNITS, FEAT_DIM)).astype(np.float32) * 2.0
    labels = np.stack([rng.permutation(N_UNITS)[:u] for _ in range(b)]) + 3
    feats = np.stack([
        np.concatenate([np.tile(patterns[l - 3], (12, 1)) for l in row])
        for row in labels
    ]).astype(np.float32)
    mask = np.ones((b, t), bool)
    targets = np.zeros((b, u + 2), np.int64)
    targets[:, 0] = 1
    targets[:, 1:1 + u] = labels
    targets[:, 1 + u] = 1
    tlen = jnp.asarray([u + 1] * b)

    feats_j = jnp.asarray(feats)
    mask_j = jnp.asarray(mask)
    tgt_j = jnp.asarray(targets.astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats_j, mask_j, tgt_j, tlen)
    tx = optax.adam(3e-3)
    opt = tx.init(variables)

    @jax.jit
    def step(variables, opt):
        loss, grads = jax.value_and_grad(
            lambda v: model.apply(v, feats_j, mask_j, tgt_j, tlen)[0])(variables)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(variables, updates), opt, loss

    first = None
    for i in range(300):
        variables, opt, loss = step(variables, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2, (first, float(loss))

    tokens, n = model.apply(variables, feats_j, mask_j, method="greedy_decode")
    tokens, n = np.asarray(tokens), np.asarray(n)
    hyps = [tokens[i, : n[i]].tolist() for i in range(b)]
    assert hyps == [row.tolist() for row in labels], (hyps, labels)

    # beam search must recover the labels too, with scores sorted best-first
    btoks, blens, bscores = model.apply(
        variables, feats_j, mask_j, 4, 20, 2, method="beam_decode")
    btoks, blens, bscores = np.asarray(btoks), np.asarray(blens), np.asarray(bscores)
    beam_best = [btoks[i, 0, : blens[i, 0]].tolist() for i in range(b)]
    assert beam_best == [row.tolist() for row in labels], beam_best
    assert np.all(np.diff(bscores, axis=1) <= 1e-5)


@pytest.mark.slow
def test_transducer_cli_train_and_decode(tmp_path):
    """run.py trains a transducer config; eval.py decodes it greedily with
    CER asserted — the full user path for the new family."""
    from opentransformer_tpu.cli.eval import main as eval_main
    from opentransformer_tpu.cli.run import main as run_main

    root = str(tmp_path)
    make_ctc_corpus(root)
    cfg = {
        "data": {
            "dataset_type": "kaldi",
            "vocab": os.path.join(root, "vocab"),
            "batch_size": 8,
            "train": {"feat": [os.path.join(root, "feats.scp")],
                      "text": [os.path.join(root, "text")]},
            "test": {"feat": [os.path.join(root, "feats.scp")],
                     "text": [os.path.join(root, "text")]},
        },
        "model": _tiny_cfg(),
        "train": {"optimizer_type": "adam", "optimizer": {"lr": 3e-3},
                  "scheduler_type": "constant", "scheduler": {"lr": 3e-3},
                  "clip_grad": 5, "epochs": 40, "save_name": "rnnt"},
    }
    conf = os.path.join(root, "conf.yaml")
    with open(conf, "w") as f:
        yaml.safe_dump(cfg, f)
    expdir = os.path.join(root, "exp")
    assert run_main(["-c", conf, "-n", "1", "--expdir", expdir, "--log_interval", "100"]) == 0
    assert eval_main(["-m", expdir, "-d", "test", "-s", "greedy"]) == 0

    results = {}
    for d in os.listdir(expdir):
        if d.startswith("decode_test"):
            txt = open(os.path.join(expdir, d, "RESULT")).read()
            results[d] = float(txt.split("CER ")[1].split("%")[0])
    assert results, os.listdir(expdir)
    assert min(results.values()) < 20.0, results


@pytest.mark.parametrize("lm_type", ["rnn_lm", "transformer_lm"])
def test_transducer_beam_lm_fusion(lm_type):
    """External-LM shallow fusion in the RNNT beam: fused score == base +
    w · Σ log p_lm(label | prefix). The LM adds a per-sequence constant to
    every alignment path, so with an exhaustive beam (K = V hyps, max one
    symbol → nothing is ever pruned and path sums are complete) the identity
    holds exactly for every hypothesis. The transformer LM exercises the
    per-hypothesis (vector-index) cached decode path."""
    import jax
    import jax.numpy as jnp

    from opentransformer_tpu.models.registry import build_model
    from opentransformer_tpu.recognize.base import make_lm_adapter

    V = 3 + N_UNITS
    model = build_model(_tiny_cfg())
    rng = np.random.default_rng(4)
    b, t = 2, 36
    feats = jnp.asarray(rng.normal(size=(b, t, FEAT_DIM)), jnp.float32)
    mask = jnp.ones((b, t), bool)
    tgt = np.ones((b, 5), np.int64)
    params = model.init(jax.random.PRNGKey(0), feats, mask,
                        jnp.asarray(tgt.astype(np.int32)), jnp.asarray([4, 4]))

    lm_cfg = ({"type": "rnn_lm", "vocab_size": V, "num_layers": 1,
               "hidden_size": 16, "dropout": 0.0, "share_embedding": True,
               "smoothing": 0.1} if lm_type == "rnn_lm" else
              {"type": "transformer_lm", "vocab_size": V, "num_blocks": 1,
               "d_model": 16, "n_heads": 2, "d_ff": 24, "residual_dropout": 0.0,
               "share_embedding": True, "smoothing": 0.1})
    lm = build_model(lm_cfg)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([3]))
    lm_init, lm_step = make_lm_adapter(lm, lm_params, 20)

    K = V  # exhaustive beam over all length<=1 sequences: no pruning
    base = model.apply(params, feats, mask, K, 1, 1, method="beam_decode")
    w = 0.3
    fused = model.apply(params, feats, mask, K, 1, 1, lm_init, lm_step, w,
                        method="beam_decode")

    def lm_seq_logp(seq):
        state = lm_init(1)
        total, tok = 0.0, jnp.asarray([1], jnp.int32)  # BOS
        for i, s in enumerate(seq):
            lp, state = lm_step(tok, state, jnp.asarray(i, jnp.int32))
            total += float(lp[0, s])
            tok = jnp.asarray([s], jnp.int32)
        return total

    btoks, blens, bscores = map(np.asarray, base)
    ftoks, flens, fscores = map(np.asarray, fused)
    checked = 0
    for i in range(b):
        base_map = {tuple(btoks[i, j, : blens[i, j]]): bscores[i, j]
                    for j in range(btoks.shape[1])}
        for j in range(ftoks.shape[1]):
            seq = tuple(ftoks[i, j, : flens[i, j]])
            if seq in base_map:
                expect = base_map[seq] + w * lm_seq_logp(seq)
                np.testing.assert_allclose(fscores[i, j], expect, rtol=1e-4, atol=1e-4)
                checked += 1
    assert checked >= 2 * V - 2, checked  # every live hyp in both runs


def test_blocked_joint_matches_full_joint():
    """The memory-lean T-blocked joint (blank_emit_log_probs + nn.remat)
    must reproduce the one-shot [B, T, U+1, V] path exactly: same loss and
    same gradients, including when T is not a multiple of the block and
    frame/label lengths are ragged."""
    from opentransformer_tpu.models.registry import build_model

    cfg = _tiny_cfg()
    full = build_model({**cfg, "joint_t_block": 0})
    blocked = build_model({**cfg, "joint_t_block": 4})  # T=9 frames -> 3 blocks, pad 3

    rng = np.random.default_rng(7)
    b, t, u = 3, 36, 4  # conv frontend 2x2-stride -> 9 encoder frames
    feats = jnp.asarray(rng.normal(size=(b, t, FEAT_DIM)).astype(np.float32))
    mask = np.ones((b, t), bool)
    mask[1, 28:] = False  # ragged frame lengths
    mask = jnp.asarray(mask)
    targets = np.zeros((b, u + 2), np.int32)
    targets[:, 0] = 1
    targets[:, 1:1 + u] = rng.integers(3, 3 + N_UNITS, (b, u))
    targets[2, 3:] = 0
    targets[2, 3] = 1
    tlen = jnp.asarray([u + 1, u + 1, 3], jnp.int32)  # ragged label lengths
    targets = jnp.asarray(targets)

    variables = full.init(jax.random.PRNGKey(0), feats, mask, targets, tlen)

    def loss_fn(model):
        def f(v):
            return model.apply(v, feats, mask, targets, tlen)[0]
        return f

    l_full, g_full = jax.value_and_grad(loss_fn(full))(variables)
    l_blk, g_blk = jax.value_and_grad(loss_fn(blocked))(variables)
    np.testing.assert_allclose(float(l_full), float(l_blk), rtol=1e-6)
    flat_f, _ = jax.tree_util.tree_flatten(g_full)
    flat_b, _ = jax.tree_util.tree_flatten(g_blk)
    for a, bb in zip(flat_f, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-5, atol=2e-6)
