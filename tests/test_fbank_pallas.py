"""Pallas fbank kernel parity (runs in interpreter mode on CPU; the compiled
path is exercised on the real chip by the device smoke below when a TPU is
present)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opentransformer_tpu.ops.fbank import fbank_numpy, num_frames


def test_pallas_fbank_matches_numpy_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from opentransformer_tpu.ops.fbank_pallas import fbank_pallas

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16000) * 0.1).astype(np.float32)
    ref = fbank_numpy(wav)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fbank_pallas(jnp.asarray(wav)))[: num_frames(16000)]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-2)


def test_pallas_fbank_batch_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from opentransformer_tpu.ops.fbank_pallas import fbank_pallas_batch

    rng = np.random.default_rng(1)
    n1, n2 = 8000, 4800
    batch = np.zeros((2, n1), np.float32)
    batch[0] = rng.normal(size=n1) * 0.1
    batch[1, :n2] = rng.normal(size=n2) * 0.1
    with pltpu.force_tpu_interpret_mode():
        feats, lens = fbank_pallas_batch(jnp.asarray(batch), jnp.asarray([n1, n2]))
    feats = np.asarray(feats)
    assert int(lens[0]) == num_frames(n1) and int(lens[1]) == num_frames(n2)
    ref0 = fbank_numpy(batch[0])
    np.testing.assert_allclose(feats[0, : len(ref0)], ref0, rtol=5e-3, atol=5e-2)
