"""The NumPy-vectorized Jaro-Winkler batch matcher must be bit-equal
to the pure-Python scalar on every input — the pipeline's is_match
decisions (and the n_pairs_scored bench invariant) ride on it."""

from __future__ import annotations

import random
import string

from tempel_spark.functions.similarity import (
    _JW_VEC_MAXLEN,
    _jaro_winkler,
    _jw_batch_numpy,
    _make_jw_batch,
)


def test_numpy_jw_bit_equal_fuzz():
    rng = random.Random(1234)
    alpha = "abcde "  # tiny alphabet → frequent matches/transpositions
    xs, ys = [], []
    for _ in range(4000):
        lx = rng.randrange(0, 12)
        ly = rng.randrange(0, 12)
        xs.append("".join(rng.choice(alpha) for _ in range(lx)))
        ys.append("".join(rng.choice(alpha) for _ in range(ly)))
    # identical, prefix-shared, and unicode pairs
    xs += ["granite ember", "granite ember", "naïve café", "ß", ""]
    ys += ["granite ember", "granite embers", "naive cafe", "ss", ""]
    got = _jw_batch_numpy(xs, ys)
    want = [_jaro_winkler(x, y) for x, y in zip(xs, ys)]
    assert got == want  # bitwise float equality, not approx


def test_numpy_jw_longer_strings():
    rng = random.Random(99)
    xs, ys = [], []
    for _ in range(200):
        lx = rng.randrange(0, _JW_VEC_MAXLEN + 1)
        ly = rng.randrange(0, _JW_VEC_MAXLEN + 1)
        xs.append("".join(rng.choice(string.ascii_lowercase) for _ in range(lx)))
        ys.append("".join(rng.choice(string.ascii_lowercase) for _ in range(ly)))
    assert _jw_batch_numpy(xs, ys) == [
        _jaro_winkler(x, y) for x, y in zip(xs, ys)
    ]


def test_batch_picker_routes_long_strings_to_scalar():
    batch = _make_jw_batch()
    assert batch is not None  # numpy (or rapidfuzz) path must engage here
    long_s = "x" * (_JW_VEC_MAXLEN + 10)
    xs = ["abc", long_s, "abcd"]
    ys = ["abd", long_s[:-1] + "y", "acbd"]
    assert batch(xs, ys) == [_jaro_winkler(x, y) for x, y in zip(xs, ys)]
