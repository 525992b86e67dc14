"""Device-resident corpus input pipeline (data/resident.py).

The resident path must be a pure transport change: the features the model
sees (gathered from HBM + on-device augmentation) must match the host
collate path exactly when augmentation is off, and training through the
Trainer must produce identical losses. The reference has no equivalent —
it streams every batch host→device (otrans/train/trainer.py:147)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import yaml

from test_e2e import make_corpus, make_config

from opentransformer_tpu.config import load_config
from opentransformer_tpu.data.loader import FeatureLoader
from opentransformer_tpu.data.resident import make_resident_preprocess
from opentransformer_tpu.models.registry import build_model
from opentransformer_tpu.train.trainer import (
    Trainer,
    default_speech_batch,
    resident_speech_batch,
)


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resident"))
    make_corpus(root, n_utts=24, seed=3)
    make_config(root, epochs=2)
    return root


def _load_cfg(root, **data_overrides):
    cfg = yaml.safe_load(open(os.path.join(root, "conf_speech2text.yaml")))
    cfg["data"].update(data_overrides)
    path = os.path.join(root, "conf_resident.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return load_config(path)


def _resident_setup(cfg, mesh=None):
    loader = FeatureLoader(cfg, "train", seed=7)
    assert loader.device_resident
    corpus, lens = loader.build_resident_corpus()
    preprocess, state = make_resident_preprocess(cfg["data"], corpus, lens,
                                                 mesh=mesh)
    return loader, preprocess, state


def test_resident_batch_matches_host_collate(corpus_root):
    cfg = _load_cfg(corpus_root, device_resident=True,
                    device_resident_dtype="float32")
    res_loader, preprocess, state = _resident_setup(cfg)
    host_loader = FeatureLoader(load_config(
        os.path.join(corpus_root, "conf_speech2text.yaml")), "train", seed=7)
    assert not host_loader.device_resident

    res_loader.set_epoch(1)
    host_loader.set_epoch(1)
    for (r_batch, h_batch), _ in zip(
            zip(iter(res_loader), iter(host_loader)), range(3)):
        r_utts, r_inputs, r_targets = r_batch
        h_utts, h_inputs, h_targets = h_batch
        assert r_utts == h_utts
        np.testing.assert_array_equal(r_targets["targets"], h_targets["targets"])
        np.testing.assert_array_equal(
            r_targets["targets_length"], h_targets["targets_length"])
        feats, mask, y, yl = preprocess(
            jnp.asarray(r_inputs["corpus_idx"]),
            jnp.asarray(r_targets["targets"]),
            jnp.asarray(r_targets["targets_length"]),
            rng=jax.random.PRNGKey(0), train=False, state=state)
        t_host = h_inputs["inputs"].shape[1]
        # resident pads to the corpus max; the host batch pad never exceeds it
        assert feats.shape[1] >= t_host
        np.testing.assert_allclose(
            np.asarray(feats)[:, :t_host], h_inputs["inputs"], rtol=0, atol=0)
        assert not np.asarray(feats)[:, t_host:].any()
        np.testing.assert_array_equal(
            np.asarray(mask)[:, :t_host], h_inputs["mask"])
        assert not np.asarray(mask)[:, t_host:].any()


def test_resident_augmentation_masked_and_fresh(corpus_root):
    # noise-only config: the train/eval delta IS the gaussian noise
    noise_cfg = _load_cfg(corpus_root, device_resident=True,
                          additive_noise_std=0.3,
                          device_resident_dtype="float32")
    loader, preprocess, _ = _resident_setup(noise_cfg)
    batch = next(iter(loader))
    _, inputs, targets = batch
    idx = jnp.asarray(inputs["corpus_idx"])
    y = jnp.asarray(targets["targets"])
    yl = jnp.asarray(targets["targets_length"])
    f1, mask, *_ = preprocess(idx, y, yl, rng=jax.random.PRNGKey(1), train=True)
    f2, *_ = preprocess(idx, y, yl, rng=jax.random.PRNGKey(2), train=True)
    clean, *_ = preprocess(idx, y, yl, rng=jax.random.PRNGKey(1), train=False)
    f1, f2, clean, mask = map(np.asarray, (f1, f2, clean, mask))
    # fresh noise per key; eval path is deterministic/clean
    assert not np.allclose(f1, f2)
    assert (f1 - clean)[mask].std() == pytest.approx(0.3, rel=0.1)
    assert (f1 - clean)[mask].mean() == pytest.approx(0.0, abs=0.02)
    # padding region stays exactly zero (noise is length-masked, matching
    # the host path that pads with zeros after noising valid frames)
    assert not f1[~mask].any() and not f2[~mask].any()

    # with SpecAugment stacked on top the padding invariant must still hold
    aug_cfg = _load_cfg(corpus_root, device_resident=True,
                        additive_noise_std=0.3, spec_augment=True,
                        device_resident_dtype="float32",
                        spec_augment_config={"freq_mask_num": 1,
                                             "time_mask_num": 1,
                                             "freq_mask_rate": 0.2,
                                             "time_mask_rate": 0.05})
    _, aug_preprocess, _ = _resident_setup(aug_cfg)
    a1, amask, *_ = aug_preprocess(idx, y, yl, rng=jax.random.PRNGKey(1),
                                   train=True)
    a1, amask = np.asarray(a1), np.asarray(amask)
    assert not a1[~amask].any()
    assert np.isfinite(a1).all()


def _run_steps(cfg, resident, mesh=None, steps=4, steps_per_exec=None):
    """Train `steps` optimizer updates through the Trainer; return losses."""
    model = build_model(cfg["model"], dtype=jnp.float32)
    if resident:
        loader, preprocess, state = _resident_setup(cfg, mesh=mesh)
        batch_fn = resident_speech_batch
        kw = {"preprocess_fn": preprocess,
              "preprocess_state": state,
              "eval_batch_fn": default_speech_batch,
              "eval_preprocess_fn": None}
    else:
        loader = FeatureLoader(cfg, "train", seed=7)
        batch_fn = default_speech_batch
        kw = {}
    train_cfg = dict(cfg["train"])
    if steps_per_exec:
        train_cfg["steps_per_exec"] = steps_per_exec
    trainer = Trainer(train_cfg, model, mesh=mesh, expdir="/tmp/resident_exp",
                      batch_fn=batch_fn, log_interval=1, **kw)
    loader.set_epoch(0)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(iter(loader)))
    losses = []
    orig = trainer._flush_pending

    def capture(pending, epoch, span_t0, final=False):
        # per-UPDATE losses: one pending entry may cover several scanned
        # updates ([n_updates, accum]) and host/resident runs may group
        # differently when host batch shapes vary
        for entry in jax.device_get(list(pending)):
            mat = np.atleast_2d(np.asarray(entry[0], np.float64))
            losses.extend(mat.mean(axis=1).tolist())
        return orig(pending, epoch, span_t0, final)

    trainer._flush_pending = capture
    batches = []
    for b in loader:
        batches.append(b)
        if len(batches) == steps:
            break
    state = trainer.train_one_epoch(0, state, batches, jax.random.PRNGKey(1))
    return losses[:steps], state


def test_resident_training_parity(corpus_root):
    """Same data, augmentation off → identical losses host vs resident."""
    host_cfg = _load_cfg(corpus_root)
    res_cfg = _load_cfg(corpus_root, device_resident=True,
                        device_resident_dtype="float32")
    host_losses, _ = _run_steps(host_cfg, resident=False)
    res_losses, _ = _run_steps(res_cfg, resident=True)
    assert len(host_losses) == len(res_losses) > 0
    np.testing.assert_allclose(host_losses, res_losses, rtol=2e-5)


def test_resident_training_parity_multi_step_scan(corpus_root):
    host_cfg = _load_cfg(corpus_root)
    res_cfg = _load_cfg(corpus_root, device_resident=True,
                        device_resident_dtype="float32")
    host_losses, _ = _run_steps(host_cfg, resident=False, steps_per_exec=2)
    res_losses, _ = _run_steps(res_cfg, resident=True, steps_per_exec=2)
    np.testing.assert_allclose(host_losses, res_losses, rtol=2e-5)


def test_resident_under_data_mesh(corpus_root):
    from opentransformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2)
    res_cfg = _load_cfg(corpus_root, device_resident=True,
                        device_resident_dtype="float32")
    host_cfg = _load_cfg(corpus_root)
    res_losses, _ = _run_steps(res_cfg, resident=True, mesh=mesh)
    host_losses, _ = _run_steps(host_cfg, resident=False, mesh=mesh)
    np.testing.assert_allclose(host_losses, res_losses, rtol=2e-5)


def test_resident_fallbacks(corpus_root):
    # multihost row-sharding: resident off, host path warning
    cfg = _load_cfg(corpus_root, device_resident=True)
    loader = FeatureLoader(cfg, "train", seed=7, num_shards=2, shard_id=0)
    assert not loader.device_resident
    # eval split: resident never applies
    ev = FeatureLoader(cfg, "test", is_eval=True, seed=7)
    assert not ev.device_resident
    batch = next(iter(ev))
    assert "inputs" in batch[1]


def test_resident_f16_storage_quantization(corpus_root):
    cfg = _load_cfg(corpus_root, device_resident=True)  # default float16
    loader, preprocess, state = _resident_setup(cfg)
    batch = next(iter(loader))
    _, inputs, targets = batch
    feats, *_ = preprocess(jnp.asarray(inputs["corpus_idx"]),
                           jnp.asarray(targets["targets"]),
                           jnp.asarray(targets["targets_length"]),
                           rng=jax.random.PRNGKey(0), train=False, state=state)
    assert feats.dtype == jnp.float32
    host = FeatureLoader(load_config(
        os.path.join(corpus_root, "conf_speech2text.yaml")), "train", seed=7)
    hb = next(iter(host))
    t = hb[1]["inputs"].shape[1]
    # f16 storage: |q(x) - x| <= eps * |x| with eps = 2^-10
    np.testing.assert_allclose(np.asarray(feats)[:, :t], hb[1]["inputs"],
                               rtol=2 ** -10, atol=2 ** -24)
