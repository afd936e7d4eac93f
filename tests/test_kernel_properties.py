"""Hypothesis property tests for the hash kernels (SURVEY.md §5.5)."""
import string

import numpy as np
from hypothesis import given, settings, strategies as st

from wdd.kernels import (
    calculate_simhash,
    custom_hash_function,
    extract_html_features,
    extract_text,
    minhash_signature,
    simhash64_batch,
)
from wdd.kernels.simhash import pack_simhash_to_bytes

token = st.text(alphabet=string.ascii_lowercase + "äöü今日", min_size=1,
                max_size=12)
features = st.dictionaries(token, st.integers(1, 9), min_size=1, max_size=30)


@settings(max_examples=50, deadline=None)
@given(features)
def test_simhash_dict_order_invariance(feats):
    f2 = dict(reversed(list(feats.items())))
    assert calculate_simhash(feats, 64, custom_hash_function) == \
        calculate_simhash(f2, 64, custom_hash_function)


@settings(max_examples=50, deadline=None)
@given(features)
def test_simhash_weight_scaling_invariance(feats):
    """Doubling every weight cannot change any strict-majority vote."""
    scaled = {k: 2 * v for k, v in feats.items()}
    assert calculate_simhash(feats, 64, custom_hash_function) == \
        calculate_simhash(scaled, 64, custom_hash_function)


@settings(max_examples=30, deadline=None)
@given(features)
def test_simhash_batch_kernel_agrees(feats):
    got = int(simhash64_batch([feats])[0])
    ref = calculate_simhash(feats, 64, custom_hash_function)
    ref_signed = ref - (1 << 64) if ref >= (1 << 63) else ref
    assert got == ref_signed


@settings(max_examples=30, deadline=None)
@given(features, st.sampled_from([64, 128, 256]))
def test_pack_width(feats, f):
    h = calculate_simhash(feats, f, custom_hash_function)
    assert len(pack_simhash_to_bytes(h, f)) == f // 8
    assert h.bit_length() <= f


@settings(max_examples=30, deadline=None)
@given(st.lists(token, min_size=1, max_size=60))
def test_minhash_deterministic_and_bounded(words):
    t = " ".join(words)
    a, b = minhash_signature(t), minhash_signature(t)
    assert np.array_equal(a, b)
    assert a.shape == (128,)
    assert (a >= 0).all()


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=300))
def test_extract_never_raises_and_counts_match_text(html):
    feats = extract_html_features(html)
    text = extract_text(html)
    assert sum(feats.values()) == len(text.split())
    assert set(feats) == set(text.split())
