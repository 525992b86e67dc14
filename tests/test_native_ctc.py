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


# ---------------------------------------------------------------------------
# KenLM PROBING binary fixture: hand-assembled per the documented layout
# (lm/binary_format.cc, lm/vocab.cc, lm/search_hashed.hh) since kenlm itself
# is not installable here. The same trigram LM is written as ARPA text and as
# a .klm; decoding must be identical through both.
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _murmur64a(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A (util/murmur_hash.cc) — vocab word hashing."""
    m, r = 0xC6A4A7935BD1E995, 47
    h = (seed ^ (len(data) * m)) & _MASK64
    n8 = len(data) // 8 * 8
    for i in range(0, n8, 8):
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * m) & _MASK64
        k ^= k >> r
        k = (k * m) & _MASK64
        h = ((h ^ k) * m) & _MASK64
    rest = data[n8:]
    if rest:
        h = ((h ^ int.from_bytes(rest, "little")) * m) & _MASK64
    h ^= h >> r
    h = (h * m) & _MASK64
    h ^= h >> r
    return h


def _chain_hash(word_ids):
    """lm/search_hashed n-gram key: fold history onto the predicted word."""
    K1, K2 = 8978948897894561157, 17894857484156487943
    h = word_ids[-1]
    for w in reversed(word_ids[:-1]):
        h = ((h * K1) ^ ((1 + w) * K2)) & _MASK64
    return h


def _buckets(entries: int, multiplier: float = 1.5) -> int:
    return max(entries + 1, int(np.float32(multiplier) * np.float32(entries)))


def _probing_table(entries, entry_size: int, buckets: int) -> bytes:
    """Linear-probing hash table: u64 key then payload, empty key = 0."""
    buf = bytearray(entry_size * buckets)
    for key, payload in entries:
        i = key % buckets
        while int.from_bytes(buf[i * entry_size : i * entry_size + 8], "little") != 0:
            i = (i + 1) % buckets
        buf[i * entry_size : i * entry_size + 8] = key.to_bytes(8, "little")
        buf[i * entry_size + 8 : i * entry_size + 8 + len(payload)] = payload
    return bytes(buf)


# the shared trigram LM: (log10 prob, words..., log10 backoff)
_UNIGRAMS = [  # ARPA order; <unk> becomes kenlm word id 0
    (-2.0, "<unk>", 0.0),
    (-0.5, "<s>", -0.3),
    (-0.5, "a", -0.3),
    (-1.5, "b", -0.3),
    (-0.6, "c", -0.3),
]
_BIGRAMS = [(-2.0, ("a", "b"), -0.2), (-0.1, ("a", "c"), -0.1), (-0.4, ("c", "b"), 0.0)]
_TRIGRAMS = [(-0.2, ("a", "c", "b")), (-0.3, ("a", "b", "c"))]


def _write_fixture_arpa(path: str) -> None:
    with open(path, "w") as f:
        f.write("\\data\\\nngram 1=5\nngram 2=3\nngram 3=2\n\n\\1-grams:\n")
        for p, w, bo in _UNIGRAMS:
            f.write(f"{p}\t{w}\t{bo}\n")
        f.write("\n\\2-grams:\n")
        for p, ws, bo in _BIGRAMS:
            f.write(f"{p}\t{' '.join(ws)}\t{bo}\n")
        f.write("\n\\3-grams:\n")
        for p, ws in _TRIGRAMS:
            f.write(f"{p}\t{' '.join(ws)}\n")
        f.write("\n\\end\\\n")


def _write_fixture_klm(path: str) -> None:
    import struct

    order = 3
    counts = [5, 3, 2]
    # kenlm word ids: <unk> = 0 (never in the hash table), others in ARPA order
    ken_id = {"<unk>": 0}
    for _, w, _ in _UNIGRAMS:
        if w != "<unk>":
            ken_id[w] = len(ken_id)
    bound = len(ken_id)

    out = bytearray()
    magic = b"mmap lm http://kheafield.com/code format version 5\n\x00"
    assert len(magic) == 52
    out += magic
    out += struct.pack("<fffIIQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)  # Sanity refs
    out += struct.pack("<B3xfiB3xI", order, 1.5, 0, 1, 0)  # FixedWidthParameters
    out += struct.pack(f"<{order}Q", *counts)
    while len(out) % 8:
        out += b"\x00"

    out += struct.pack("<II", 1, bound)  # ProbingVocabularyHeader
    vocab_entries = [
        (_murmur64a(w.encode()), struct.pack("<I", i))
        for w, i in ken_id.items() if w != "<unk>"
    ]
    out += _probing_table(vocab_entries, 12, _buckets(counts[0]))

    uni = [(0.0, 0.0)] * (counts[0] + 1)
    for p, w, bo in _UNIGRAMS:
        uni[ken_id[w]] = (p, bo)
    for p, bo in uni:
        out += struct.pack("<ff", p, bo)

    bi_entries = [
        (_chain_hash([ken_id[w] for w in ws]), struct.pack("<ff", p, bo))
        for p, ws, bo in _BIGRAMS
    ]
    out += _probing_table(bi_entries, 16, _buckets(counts[1]))
    tri_entries = [
        (_chain_hash([ken_id[w] for w in ws]), struct.pack("<f", p))
        for p, ws in _TRIGRAMS
    ]
    out += _probing_table(tri_entries, 12, _buckets(counts[2]))

    for w in ken_id:  # insertion-ordered: id order, "<unk>" first
        out += w.encode() + b"\x00"
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_kenlm_binary_decodes_identically_to_arpa(tmp_path):
    """-ngram lm.klm (KenLM probing binary) must decode exactly like the
    same LM's ARPA text — unigram, middle (bigram), longest (trigram), and
    backoff paths all exercised via fuzzed acoustics."""
    arpa_path = str(tmp_path / "lm.arpa")
    klm_path = str(tmp_path / "lm.klm")
    _write_fixture_arpa(arpa_path)
    _write_fixture_klm(klm_path)

    vocab = ["<blank>", "<s/e>", "<unk>", "a", "b", "c"]
    lm_arpa = native.NgramLM(arpa_path, vocab, binary_cache=False)
    lm_klm = native.NgramLM(klm_path, vocab, binary_cache=False)
    assert lm_arpa.order == lm_klm.order == 3

    rng = np.random.default_rng(5)
    for trial in range(6):
        t = int(rng.integers(3, 12))
        lp = random_logprobs(rng, t, len(vocab))
        outs = []
        for lm in (lm_arpa, lm_klm):
            tokens, lens, scores = native.ctc_beam_decode(
                lp[None], np.asarray([t], np.int32), beam_width=8,
                prune_k=len(vocab), nbest=3, alpha=1.0, beta=0.5, lm=lm,
            )
            outs.append((tokens.tolist(), lens.tolist(), scores))
        assert outs[0][0] == outs[1][0], trial
        assert outs[0][1] == outs[1][1], trial
        np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-5, atol=1e-5)


def test_kenlm_binary_rejects_malformed(tmp_path):
    """Truncated or wrong-magic files must fail loudly, not load garbage."""
    klm_path = str(tmp_path / "lm.klm")
    _write_fixture_klm(klm_path)
    data = open(klm_path, "rb").read()

    trunc = str(tmp_path / "trunc.klm")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) - 6])  # drop part of the vocab strings
    vocab = ["<blank>", "<s/e>", "<unk>", "a", "b", "c"]
    with pytest.raises(ValueError, match="truncated|PROBING"):
        native.NgramLM(trunc, vocab, binary_cache=False)


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


# ---------------------------------------------------------------------------
# sparse (device-pruned candidate) entry point
# ---------------------------------------------------------------------------


def _dense_to_sparse(lp, n, blank=0):
    """Host reference for the device top-k: desc-sorted top-n per frame."""
    ids = np.argsort(-lp, axis=-1)[..., :n].astype(np.int32)
    vals = np.take_along_axis(lp, ids, axis=-1).astype(np.float32)
    return vals, ids, lp[..., blank].astype(np.float32)


def test_sparse_matches_dense():
    """ctc_beam_decode_sparse over top-n candidates == ctc_beam_decode with
    prune_k=n over the dense matrix (same labels, same force-added blank)."""
    rng = np.random.default_rng(7)
    b, t, v, n = 4, 18, 40, 12
    lp = np.stack([random_logprobs(rng, t, v) for _ in range(b)])
    counts = np.asarray([t, t - 3, t - 5, t], np.int32)
    dt, dl, ds = native.ctc_beam_decode(
        lp, counts, beam_width=6, prune_k=n, nbest=2)
    vals, ids, blp = _dense_to_sparse(lp, n)
    st, sl, ss = native.ctc_beam_decode_sparse(
        vals, ids, blp, counts, beam_width=6, nbest=2)
    np.testing.assert_array_equal(st, dt)
    np.testing.assert_array_equal(sl, dl)
    np.testing.assert_allclose(ss, ds, rtol=1e-6, atol=1e-6)


def test_sparse_blank_outside_candidates():
    """When blank misses the top-n, the supplied blank_lp must drive the
    blank transitions exactly as the dense path's force-appended blank."""
    rng = np.random.default_rng(11)
    t, v, n = 10, 20, 3
    lp = random_logprobs(rng, t, v)
    lp[:, 0] = np.log(1e-6)  # blank never in the top-3
    lp = lp - np.log(np.sum(np.exp(lp), axis=1, keepdims=True))
    counts = np.asarray([t], np.int32)
    dt, dl, ds = native.ctc_beam_decode(
        lp[None], counts, beam_width=5, prune_k=n, nbest=2)
    vals, ids, blp = _dense_to_sparse(lp[None], n)
    assert not (ids == 0).any()  # the edge is actually exercised
    st, sl, ss = native.ctc_beam_decode_sparse(
        vals, ids, blp, counts, beam_width=5, nbest=2)
    np.testing.assert_array_equal(st, dt)
    np.testing.assert_allclose(ss, ds, rtol=1e-6, atol=1e-6)


def test_sparse_lm_fusion_matches_dense(tmp_path):
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
    path = str(tmp_path / "lm_sparse.arpa")
    with open(path, "w") as f:
        f.write(arpa)
    vocab = ["<blank>", "<s/e>", "<unk>", "a", "b", "c"]
    lm = native.NgramLM(path, vocab)
    lp = np.log(np.array([
        [0.04, 0.01, 0.01, 0.90, 0.02, 0.02],
        [0.04, 0.01, 0.01, 0.02, 0.49, 0.43],
    ], np.float32))
    counts = np.asarray([2], np.int32)
    dt, dl, ds = native.ctc_beam_decode(
        lp[None], counts, beam_width=8, prune_k=6, nbest=1,
        alpha=1.0, beta=0.0, lm=lm)
    vals, ids, blp = _dense_to_sparse(lp[None], 6)
    st, sl, ss = native.ctc_beam_decode_sparse(
        vals, ids, blp, counts, beam_width=8, nbest=1,
        alpha=1.0, beta=0.0, lm=lm)
    np.testing.assert_array_equal(st, dt)
    np.testing.assert_allclose(ss, ds, rtol=1e-6, atol=1e-6)


def test_trie_binary_rejected_with_clear_error(tmp_path):
    """A KenLM binary whose model_type is not PROBING (e.g. TRIE) must raise
    a ValueError naming the unsupported layout, not FileNotFoundError."""
    import struct

    path = str(tmp_path / "lm_trie.klm")
    magic = b"mmap lm http://kheafield.com/code format version 5\n\0"
    body = magic
    body += struct.pack("<fff", 0.0, 1.0, -0.5)
    body += struct.pack("<II", 1, 0xFFFFFFFF)
    body += struct.pack("<Q", 1)
    # FixedWidthParameters: order=2, multiplier=1.5, model_type=2 (TRIE),
    # has_vocab=1, search_version=1
    body += struct.pack("<B3xfiB3xI", 2, 1.5, 2, 1, 1)
    with open(path, "wb") as f:
        f.write(body)
    with pytest.raises(ValueError, match="PROBING"):
        native.NgramLM(path, ["<blank>", "<s/e>", "<unk>", "a"])
