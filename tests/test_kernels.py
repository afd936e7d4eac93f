"""Kernel-level invariants: the vectorized numpy kernels must agree exactly
with the pure-Python reference-parity kernels (SURVEY.md §5.2)."""
import random

import numpy as np
import pytest

from wdd.kernels import (
    calculate_simhash,
    custom_hash_function,
    extract_text,
    minhash_signature,
    shingles,
    simhash64_batch,
)
from wdd.kernels.minhash import jaccard_estimate
from wdd.kernels.simhash import simhash_b64, pack_simhash_to_bytes

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
         "nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def _random_features(rng, n_tokens):
    toks = rng.sample(WORDS, min(n_tokens, len(WORDS)))
    return {t: rng.randint(1, 5) for t in toks}


def test_simhash64_batch_matches_pure_python():
    rng = random.Random(1234)
    batch = [_random_features(rng, rng.randint(1, 20)) for _ in range(64)]
    batch.append({})  # empty doc -> None (reference skips it, discover.py:158)
    vec = simhash64_batch(batch, hash_name="blake2b")
    for feats, got in zip(batch, vec):
        if not feats:
            assert got is None
            continue
        expected = calculate_simhash(feats, 64, custom_hash_function)
        # reinterpret unsigned reference value as signed int64
        expected_signed = expected - (1 << 64) if expected >= (1 << 63) else expected
        assert int(got) == expected_signed


def test_simhash64_batch_order_invariant():
    feats = {"one": 1, "two": 2, "three": 3}
    rev = dict(reversed(list(feats.items())))
    a = simhash64_batch([feats])
    b = simhash64_batch([rev])
    assert int(a[0]) == int(b[0])


def test_simhash_b64_roundtrip():
    h = calculate_simhash({"a": 1, "b": 2}, 64, custom_hash_function)
    enc = simhash_b64(h, 64)
    import base64
    assert base64.b64decode(enc) == pack_simhash_to_bytes(h, 64)
    assert len(base64.b64decode(enc)) == 8


def test_minhash_deterministic_and_sensitive():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1.replace("lazy", "sleepy")
    t3 = "completely different content about spark shuffles and joins " * 5
    s1a = minhash_signature(t1)
    s1b = minhash_signature(t1)
    assert np.array_equal(s1a, s1b)
    assert s1a.dtype == np.int32 and s1a.shape == (128,)
    # t1/t2 differ in 1 of 9 distinct words -> shingle Jaccard ~ 0.45
    assert jaccard_estimate(s1a, minhash_signature(t2)) > 0.3
    assert jaccard_estimate(s1a, minhash_signature(t3)) < 0.2


def test_minhash_estimates_true_jaccard():
    rng = random.Random(7)
    base = [rng.choice(WORDS) for _ in range(300)]
    edited = list(base)
    for i in range(0, 300, 25):  # ~4% token edits
        edited[i] = edited[i].upper()
    ta, tb = " ".join(base), " ".join(edited)
    sa, sb = set(shingles(ta)), set(shingles(tb))
    true_j = len(sa & sb) / len(sa | sb)
    est = jaccard_estimate(minhash_signature(ta), minhash_signature(tb))
    assert abs(est - true_j) < 0.15


def test_minhash_empty_doc_sentinel():
    sig = minhash_signature("")
    assert np.all(sig == (1 << 31) - 1)


def test_extract_text_bytes_and_errors():
    # ',' -> space makes a double space -> chunk split -> newline-joined
    assert extract_text(b"<p>Hello, World!</p>") == "hello\nworld"
    assert extract_text(b"\xff\xfe\x00bad") == ""
    assert extract_text(None) == ""


def test_simhash_parts_batch_matches_pure_python_all_widths():
    """The f-parametric parts kernel (the f=256 prod-config hot path) must
    reproduce calculate_simhash at every byte-aligned width, word by word,
    and its b64 packing must match simhash_b64 (reference discover.py:71-77,
    conf.yml.example:2 prod f=256)."""
    from wdd.kernels.simhash import parts_to_b64, simhash_parts_batch
    rng = random.Random(4321)
    batch = [_random_features(rng, rng.randint(0, 20)) for _ in range(32)]
    batch[0] = {}   # empty-features doc -> None (reference skips it)
    mask = (1 << 64) - 1

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    for f in (64, 128, 256, 512):
        got = simhash_parts_batch(batch, f, "blake2b")
        for feats, parts in zip(batch, got):
            if not feats:
                assert parts is None
                continue
            h = calculate_simhash(feats, f, custom_hash_function)
            assert parts == [signed((h >> (64 * j)) & mask)
                             for j in range(f // 64)]
            assert parts_to_b64(parts, f) == simhash_b64(h, f)


def test_simhash_parts_batch_md5_and_width_gt_digest():
    """md5 token hash (128-bit digest) at f=256: high bits must be zero,
    matching calculate_simhash's mask semantics."""
    from wdd.kernels.simhash import simhash_parts_batch
    feats = {"two": 2, "three": 3, "one": 1}
    h = calculate_simhash(feats, 256, None)   # default md5 hash
    got = simhash_parts_batch([feats], 256, "md5")[0]
    mask = (1 << 64) - 1
    assert got == [((h >> (64 * j)) & mask) - (1 << 64)
                   if (h >> (64 * j)) & mask >= (1 << 63)
                   else (h >> (64 * j)) & mask
                   for j in range(4)]
    assert got[2] == 0 and got[3] == 0   # md5 has only 128 bits
