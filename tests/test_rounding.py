"""The exact-decimal average rule (workloads/relational.py header):
``round(round(sum, d)/n, 6)`` must be summation-order independent for
exact-decimal inputs — the property that makes our rounded averages
hash-identical across engines with different accumulation orders.
A plain ``round(avg, 6)`` does NOT have this property (the sf0.1
q_gapfill divergence), which is why the rule exists.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

two_dec = st.integers(-10**7, 10**7).map(lambda c: c / 100.0)


@settings(max_examples=200, deadline=None)
@given(st.lists(two_dec, min_size=1, max_size=500), st.randoms())
def test_exact_decimal_average_is_order_independent(xs, rnd):
    def avg(vals):
        return round(round(sum(vals), 2) / len(vals), 6)

    shuffled = list(xs)
    rnd.shuffle(shuffled)
    reversed_ = list(reversed(xs))
    assert avg(xs) == avg(shuffled) == avg(reversed_)
    # pairwise-tree summation (Spark-like partial aggregation) agrees too
    def tree_sum(vals):
        if len(vals) == 1:
            return vals[0]
        mid = len(vals) // 2
        return tree_sum(vals[:mid]) + tree_sum(vals[mid:])

    assert round(round(tree_sum(xs), 2) / len(xs), 6) == avg(xs)
