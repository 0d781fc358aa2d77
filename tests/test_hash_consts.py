"""Property tests (hypothesis) on the pure-Python MinHash constant
generator: determinism, 30-bit bounds, odd multipliers — the ANSI
no-overflow guarantee rests on these."""

from __future__ import annotations

from hypothesis import given, strategies as st

from saurav_nayak_recipe_etl_project_spark.operators.dedup import _mix_consts


@given(st.integers(min_value=1, max_value=256))
def test_mix_consts_properties(n):
    consts = _mix_consts(n)
    assert consts == _mix_consts(n)              # deterministic
    assert len(consts) == n
    assert len(set(consts)) == n                 # all distinct
    for a, b in consts:
        assert 1 <= a < 2**30 and a % 2 == 1     # odd, 30-bit → no overflow
        assert 0 <= b < 2**30
        # worst-case mix value stays in signed-64 territory
        assert a * (2**32 - 1) + b < 2**63
