"""Native C++ CTC decoder tests: parity with the pure-python prefix search,
LM fusion behavior, batch threading."""

import os
import textwrap

import numpy as np
import pytest

from opentransformer_tpu.recognize.ctc_decode import ctc_prefix_beam_search

native = pytest.importorskip("opentransformer_tpu.recognize.native_ctc")


def random_logprobs(rng, t, v):
    x = rng.normal(size=(t, v)).astype(np.float32)
    x = x - np.log(np.sum(np.exp(x), axis=1, keepdims=True))
    return x


def test_native_matches_python_prefix_search():
    rng = np.random.default_rng(0)
    t, v = 12, 6
    lp = random_logprobs(rng, t, v)
    py = ctc_prefix_beam_search(lp, t, beam_width=8, blank=0, prune_k=v)
    tokens, lens, scores = native.ctc_beam_decode(
        lp[None], np.asarray([t], np.int32), beam_width=8, blank=0, prune_k=v, nbest=3
    )
    best_native = tuple(tokens[0, 0, : lens[0, 0]].tolist())
    assert best_native == py[0][0]
    np.testing.assert_allclose(scores[0, 0], py[0][1], rtol=1e-4, atol=1e-4)


def test_native_probability_math():
    # same 2-frame case as the python test: P('')=0.24, P('a')=0.76
    probs = np.log(np.array([[0.6, 0.4], [0.4, 0.6]], np.float32))
    tokens, lens, scores = native.ctc_beam_decode(
        probs[None], np.asarray([2], np.int32), beam_width=4, prune_k=2, nbest=2
    )
    assert lens[0, 0] == 1 and tokens[0, 0, 0] == 1
    np.testing.assert_allclose(np.exp(scores[0, 0]), 0.76, rtol=1e-5)
    assert lens[0, 1] == 0
    np.testing.assert_allclose(np.exp(scores[0, 1]), 0.24, rtol=1e-5)


def test_batch_decode_threads():
    rng = np.random.default_rng(1)
    b, t, v = 8, 20, 10
    lp = np.stack([random_logprobs(rng, t, v) for _ in range(b)])
    counts = np.asarray([t] * b, np.int32)
    tokens, lens, scores = native.ctc_beam_decode(lp, counts, beam_width=6, nbest=1, num_threads=4)
    # per-utterance must equal single decode
    for i in range(b):
        ti, li, si = native.ctc_beam_decode(lp[i : i + 1], counts[i : i + 1], beam_width=6, nbest=1)
        np.testing.assert_array_equal(tokens[i], ti[0])
        np.testing.assert_allclose(scores[i], si[0], rtol=1e-5)


def test_arpa_lm_fusion(tmp_path):
    """A biased bigram LM should flip an ambiguous acoustic decision."""
    arpa = textwrap.dedent("""\
        \\data\\
        ngram 1=4
        ngram 2=2

        \\1-grams:
        -0.5\ta\t-0.3
        -1.5\tb\t-0.3
        -0.6\tc\t-0.3
        -0.5\t<s>\t-0.3

        \\2-grams:
        -2.0\ta b
        -0.1\ta c

        \\end\\
    """)
    path = str(tmp_path / "lm.arpa")
    with open(path, "w") as f:
        f.write(arpa)
    vocab = ["<blank>", "<s/e>", "<unk>", "a", "b", "c"]
    lm = native.NgramLM(path, vocab)
    assert lm.order == 2

    # acoustics prefer 'a b' slightly over 'a c' (ids: a=3, b=4, c=5)
    lp = np.log(np.array([
        [0.04, 0.01, 0.01, 0.90, 0.02, 0.02],  # 'a'
        [0.04, 0.01, 0.01, 0.02, 0.49, 0.43],  # b barely beats c
    ], np.float32))
    no_lm_tokens, no_lm_lens, _ = native.ctc_beam_decode(
        lp[None], np.asarray([2], np.int32), beam_width=8, prune_k=6, nbest=1
    )
    assert no_lm_tokens[0, 0, : no_lm_lens[0, 0]].tolist() == [3, 4]

    lm_tokens, lm_lens, _ = native.ctc_beam_decode(
        lp[None], np.asarray([2], np.int32), beam_width=8, prune_k=6, nbest=1,
        alpha=1.0, beta=0.0, lm=lm,
    )
    # lm favors 'a c' (logp -0.1) over 'a b' (-2.0): decision flips
    assert lm_tokens[0, 0, : lm_lens[0, 0]].tolist() == [3, 5]


def test_native_edit_distance_matches_python():
    """native/levenshtein.cc vs the Python DP on fuzzed token sequences
    (the reference's editdistance pip dep was C++ too)."""
    import random

    from opentransformer_tpu.ops.levenshtein import (
        _edit_distance_py,
        _load_lib,
        edit_distance,
    )

    if not _load_lib():
        import pytest

        pytest.skip("native edit-distance lib unavailable")
    rng = random.Random(0)
    for _ in range(300):
        a = [rng.choice("abcdef") for _ in range(rng.randint(0, 25))]
        b = [rng.choice("abcdef") for _ in range(rng.randint(0, 25))]
        x, y = (a, b) if len(a) >= len(b) else (b, a)
        assert edit_distance(a, b) == _edit_distance_py(x, y)


def test_binary_lm_cache_roundtrip(tmp_path):
    """Loading an ARPA writes an .otbin cache; the cache loads to identical
    decode behavior, and a cache built with a different vocab is rejected
    (falls back to re-parsing the text)."""
    import os
    import textwrap

    arpa = textwrap.dedent("""\
        \\data\\
        ngram 1=4
        ngram 2=2

        \\1-grams:
        -0.5\ta\t-0.3
        -1.5\tb\t-0.3
        -0.6\tc\t-0.3
        -0.5\t<s>\t-0.3

        \\2-grams:
        -2.0\ta b
        -0.1\ta c

        \\end\\
    """)
    path = str(tmp_path / "lm.arpa")
    with open(path, "w") as f:
        f.write(arpa)
    vocab = ["<blank>", "<s/e>", "<unk>", "a", "b", "c"]

    lm_text = native.NgramLM(path, vocab)  # writes the cache
    cache = path + ".otbin"
    assert os.path.exists(cache)
    with open(cache, "rb") as f:
        assert f.read(4) == b"OTLM"

    lm_bin = native.NgramLM(path, vocab)  # now loads from the cache
    assert lm_bin.order == lm_text.order == 2

    lp = np.log(np.array([
        [0.04, 0.01, 0.01, 0.90, 0.02, 0.02],
        [0.04, 0.01, 0.01, 0.02, 0.49, 0.43],
    ], np.float32))
    outs = []
    for lm in (lm_text, lm_bin):
        tokens, lens, scores = native.ctc_beam_decode(
            lp[None], np.asarray([2], np.int32), beam_width=8, prune_k=6,
            nbest=2, alpha=1.0, beta=0.0, lm=lm,
        )
        outs.append((tokens.tolist(), lens.tolist(), scores.tolist()))
    assert outs[0] == outs[1]
    assert outs[0][0][0][0][: outs[0][1][0][0]] == [3, 5]  # LM flip preserved

    # different vocab ordering -> cache rejected, text re-parsed, same flip
    vocab2 = ["<blank>", "<s/e>", "<unk>", "c", "a", "b"]  # a=4, b=5, c=3
    lm2 = native.NgramLM(path, vocab2)
    lp2 = np.log(np.array([
        [0.04, 0.01, 0.01, 0.02, 0.90, 0.02],   # 'a' (id 4)
        [0.04, 0.01, 0.01, 0.43, 0.02, 0.49],   # b barely beats c
    ], np.float32))
    t2, l2, _ = native.ctc_beam_decode(
        lp2[None], np.asarray([2], np.int32), beam_width=8, prune_k=6,
        nbest=1, alpha=1.0, beta=0.0, lm=lm2,
    )
    assert t2[0, 0, : l2[0, 0]].tolist() == [4, 3]  # 'a c' in the new ids
