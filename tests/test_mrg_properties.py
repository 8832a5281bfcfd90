"""Property-based tests (hypothesis) for the MRG / scramble algebra.

SURVEY §5.1: the reference's test model is property-based, not golden-based.
The fixed-seed checksums in test_sources.py anchor bit-exactness at the spec
seeds (2, 3); these properties prove the ALGEBRA the generator rests on holds
for arbitrary seeds and positions — pure NumPy / integer math, no Spark
session, so the whole file runs in seconds.

* skip-ahead is a monoid homomorphism: skip(a+b) == skip(a) then skip(b)
  (the matrix-power derivation in mrg.py:192-209 is only usable because of
  this — it's what lets any partition start its stream at any offset O(1));
* skip(n) equals n literal single steps (the power table matches the
  recurrence it was derived from, graph_generator.hpp splittable contract);
* bitreverse64 is an involution (scramble correctness rests on it);
* scramble_exact is a bijection on [0, 2^scale) for seed-derived keys (the
  vertex relabeling must lose no vertex — any collision would silently merge
  vertices and corrupt every downstream operator).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graph500_bfs_spark.sources.mrg import (
    bitreverse64,
    make_mrg_seed,
    mrg_next,
    mrg_skip,
    scramble_exact,
    scramble_vals,
)

seeds = st.integers(min_value=0, max_value=(1 << 64) - 1)
# positions up to beyond the 2^128-step stream-split offsets the generator
# actually uses (make_random_numbers skips by 2*2^128 + 2*position)
exponents = st.integers(min_value=0, max_value=1 << 130)


@settings(max_examples=25, deadline=None)
@given(seeds, seeds, exponents, exponents)
def test_skip_ahead_composes(s1, s2, a, b):
    z = make_mrg_seed(s1, s2)
    assert mrg_skip(z, a + b) == mrg_skip(mrg_skip(z, a), b)


@settings(max_examples=25, deadline=None)
@given(seeds, seeds, st.integers(min_value=0, max_value=200))
def test_skip_ahead_equals_iterated_steps(s1, s2, n):
    z = make_mrg_seed(s1, s2)
    stepped = z
    for _ in range(n):
        _, stepped = mrg_next(stepped)
    assert mrg_skip(z, n) == stepped


@settings(max_examples=25, deadline=None)
@given(st.lists(seeds, min_size=1, max_size=64))
def test_bitreverse64_is_an_involution(xs):
    x = np.array(xs, dtype=np.uint64)
    assert (bitreverse64(bitreverse64(x)) == x).all()


@settings(max_examples=15, deadline=None)
@given(seeds, seeds, st.integers(min_value=4, max_value=14))
def test_scramble_is_a_bijection_for_any_seed(s1, s2, scale):
    val0, val1 = scramble_vals(s1, s2)
    v = np.arange(1 << scale, dtype=np.int64)
    out = scramble_exact(v, scale, val0, val1)
    assert out.min() >= 0 and out.max() < (1 << scale)
    assert len(np.unique(out)) == len(v)
