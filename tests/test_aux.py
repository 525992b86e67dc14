"""Aux subsystem tests: parameter census, dev evaluation + best tracking,
psf fbank variant, bf16 model build."""

import jax
import jax.numpy as jnp
import numpy as np

from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.ops.fbank import logfbank_psf
from opentransformer_tpu.train.trainer import Trainer, TrainState
from opentransformer_tpu.utils import count_parameters, format_parameter_census
from tests.test_models import small_model_cfg, make_batch
from tests.test_train import synth_batch


def test_parameter_census():
    model = build_model(small_model_cfg())
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    counts = count_parameters(params)
    assert {"frontend", "encoder", "decoder"} <= set(counts)
    assert counts["total"] == sum(v for k, v in counts.items() if k != "total")
    assert "total:" in format_parameter_census(params)


def test_dev_eval_and_best_tracking(tmp_path):
    from opentransformer_tpu.train.checkpoint import Checkpointer

    model = build_model(small_model_cfg())
    rng = np.random.default_rng(0)
    batches = [synth_batch(rng, b=4) for _ in range(2)]
    cfg = {"optimizer_type": "adam", "optimizer": {}, "scheduler_type": "constant",
           "scheduler": {"lr": 2e-3}, "epochs": 2}
    ck = Checkpointer(str(tmp_path / "exp"))
    trainer = Trainer(cfg, model, checkpointer=ck, dev_loader=batches, log_interval=10 ** 9)
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    loss0 = trainer.evaluate(state, batches)
    state = trainer.train(state, batches, jax.random.PRNGKey(1))
    loss1 = trainer.evaluate(state, batches)
    assert loss1 < loss0
    import os

    assert os.path.isdir(str(tmp_path / "exp" / "model.best"))


def test_psf_fbank_shape_and_htk_mel():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=16000).astype(np.float32) * 0.1
    feat = logfbank_psf(wav, num_mel_bins=26)
    # psf framing: ceil((16000-400)/160)+1 = 99 frames (not snip-edges 98)
    assert feat.shape == (99, 26)
    assert np.all(np.isfinite(feat))
    # tone localization under HTK mel
    t = np.arange(16000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    f = logfbank_psf(tone, num_mel_bins=26)
    peak = int(np.argmax(f.mean(axis=0)))
    htk = lambda hz: 2595 * np.log10(1 + hz / 700)
    centers = np.linspace(htk(0), htk(8000), 28)[1:-1]
    expect = int(np.argmin(np.abs(centers - htk(1000))))
    assert abs(peak - expect) <= 1


def test_bf16_model_build():
    model = build_model(small_model_cfg(), dtype=jnp.bfloat16)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    # params stay f32; loss is finite
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
    loss, _ = model.apply(params, feats, feat_mask, targets, targets_length)
    assert np.isfinite(float(loss))


def test_remat_encoder_grads():
    """remat: True must produce identical loss and finite grads."""
    cfg = small_model_cfg()
    model_plain = build_model(cfg)
    cfg2 = {**cfg, "encoder": {**cfg["encoder"], "remat": True}}
    model_remat = build_model(cfg2)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model_plain.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    l1, _ = model_plain.apply(params, feats, feat_mask, targets, targets_length)
    l2, _ = model_remat.apply(params, feats, feat_mask, targets, targets_length)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def loss_fn(model):
        def f(p):
            l, _ = model.apply(p, feats, feat_mask, targets, targets_length)
            return l
        return f

    g1 = jax.grad(loss_fn(model_plain))(params)
    g2 = jax.grad(loss_fn(model_remat))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_scan_layers_encoder():
    """scan_layers=True: stacked-params layout, same shapes, finite grads."""
    cfg = small_model_cfg()
    cfg["encoder"]["scan_layers"] = True
    model = build_model(cfg)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_mask, targets, targets_length)
    blocks = params["params"]["encoder"]["blocks"]
    leaf = jax.tree_util.tree_leaves(blocks)[0]
    assert leaf.shape[0] == cfg["encoder"]["n_blocks"]  # stacked leading dim

    def f(p):
        l, _ = model.apply(p, feats, feat_mask, targets, targets_length)
        return l

    g = jax.grad(f)(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


def test_scan_layout_conversion_matches():
    """Unstacked params converted to scan layout give identical outputs."""
    from opentransformer_tpu.compat import to_scan_layout

    cfg = small_model_cfg()
    model_plain = build_model(cfg)
    cfg2 = {**cfg, "encoder": {**cfg["encoder"], "scan_layers": True}}
    model_scan = build_model(cfg2)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model_plain.init(jax.random.PRNGKey(3), feats, feat_mask, targets, targets_length)
    l1, _ = model_plain.apply(params, feats, feat_mask, targets, targets_length)

    scan_params = jax.tree_util.tree_map(jnp.asarray, to_scan_layout(params, "encoder"))
    l2, _ = model_scan.apply(scan_params, feats, feat_mask, targets, targets_length)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_scan_decoder_parity():
    """scan_layers decoder: converted unstacked params give identical loss,
    and cached decode matches full forward."""
    from opentransformer_tpu.compat import to_scan_layout

    cfg = small_model_cfg()
    model_plain = build_model(cfg)
    cfg2 = {**cfg, "decoder": {**cfg["decoder"], "scan_layers": True}}
    model_scan = build_model(cfg2)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model_plain.init(jax.random.PRNGKey(5), feats, feat_mask, targets, targets_length)
    l1, _ = model_plain.apply(params, feats, feat_mask, targets, targets_length)

    scan_params = jax.tree_util.tree_map(jnp.asarray, to_scan_layout(params, "decoder"))
    l2, _ = model_scan.apply(scan_params, feats, feat_mask, targets, targets_length)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    # cached decode == full forward under scan
    memory, memory_mask = model_scan.apply(scan_params, feats, feat_mask, method="encode")
    u = 5
    tokens = targets[:, : u + 1]
    logits = model_scan.apply(scan_params, tokens, memory, memory_mask, method="decode_full")
    full_logp = jax.nn.log_softmax(logits, axis=-1)
    cache = model_scan.apply(scan_params, memory, u + 1, 1, method="init_cache")
    outs = []
    for i in range(u + 1):
        logp, cache = model_scan.apply(
            scan_params, tokens[:, i], cache, jnp.asarray(i), memory_mask, method="decode_step"
        )
        outs.append(logp)
    step_logp = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full_logp), np.asarray(step_logp), rtol=2e-4, atol=2e-4)


def test_scan_decoder_beam_search():
    """Beam search over a scan_layers decoder matches the unscanned decoder."""
    from opentransformer_tpu.compat import to_scan_layout
    from opentransformer_tpu.recognize.base import SpeechToTextRecognizer

    cfg = small_model_cfg()
    model_plain = build_model(cfg)
    cfg2 = {**cfg, "decoder": {**cfg["decoder"], "scan_layers": True}}
    model_scan = build_model(cfg2)
    feats, feat_mask, targets, targets_length = make_batch()
    params = model_plain.init(jax.random.PRNGKey(6), feats, feat_mask, targets, targets_length)
    scan_params = jax.tree_util.tree_map(jnp.asarray, to_scan_layout(params, "decoder"))

    hyp_plain = SpeechToTextRecognizer(model_plain, params, beam_width=3, max_len=8).recognize_arrays(feats, feat_mask)
    hyp_scan = SpeechToTextRecognizer(model_scan, scan_params, beam_width=3, max_len=8).recognize_arrays(feats, feat_mask)
    np.testing.assert_array_equal(np.asarray(hyp_plain.tokens), np.asarray(hyp_scan.tokens))
    np.testing.assert_allclose(np.asarray(hyp_plain.scores), np.asarray(hyp_scan.scores), rtol=2e-4, atol=2e-4)


def test_async_checkpoint_save(tmp_path):
    """Async save must snapshot on-device BEFORE returning: deleting the live
    buffers afterwards (what the trainer's donating update step does) must
    not corrupt the write; restore sees the values at save time."""
    import jax.numpy as jnp

    from opentransformer_tpu.train.checkpoint import Checkpointer
    from opentransformer_tpu.train.trainer import TrainState

    params = {"w": jnp.arange(8.0), "b": jnp.ones((3,))}
    opt = {"m": jnp.zeros((8,))}
    state = TrainState(params=params, opt_state=opt, nan_skips=jnp.zeros((), jnp.int32))

    ck = Checkpointer(str(tmp_path / "exp"), async_save=True)
    ck.save(3, state, extra={"global_step": 7})
    # simulate the next update donating the live buffers
    for leaf in jax.tree_util.tree_leaves((params, opt)):
        leaf.delete()
    got = ck.restore_latest()
    assert got is not None
    epoch, payload = got
    assert epoch == 3 and payload["extra"]["global_step"] == 7
    np.testing.assert_array_equal(payload["params"]["w"], np.arange(8.0))
    np.testing.assert_array_equal(payload["opt_state"]["m"], np.zeros((8,)))

    # errors surface on wait(): break the underlying writer for the next save
    import pytest

    ck._ckpt = None  # worker's self._ckpt.save raises AttributeError
    state2 = TrainState(params={"w": jnp.ones((2,))}, opt_state={},
                        nan_skips=jnp.zeros((), jnp.int32))
    ck.save(4, state2)
    with pytest.raises(AttributeError):
        ck.wait()


def test_growing_buffer_matches_concatenate():
    """GrowingBuffer.view() == incremental np.concatenate, both axes."""
    import numpy as np

    from opentransformer_tpu.utils import GrowingBuffer

    rng = np.random.default_rng(0)
    for axis, shape in ((0, lambda t: (t, 5)), (1, lambda t: (2, t, 3))):
        buf = GrowingBuffer(axis=axis)
        assert buf.view() is None
        chunks = [rng.normal(size=shape(int(t))).astype(np.float32)
                  for t in rng.integers(1, 40, 17)]
        for i, c in enumerate(chunks):
            buf.append(c)
            ref = np.concatenate(chunks[: i + 1], axis=axis)
            np.testing.assert_array_equal(buf.view(), ref)
