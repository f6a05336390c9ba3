"""Property tests for the batch event operators (beyond the oracle gate)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_pagerank_mass_and_order(spark):
    """Rank mass stays ≈ the fixed-point scale (integer-div loss only:
    each div drops < 1 unit per row) and every rank is positive; the
    uniform start means round-2 ranks order by weighted in-degree."""
    from mutable_spark.operators.events import _PR_SCALE, events_pagerank

    rows = events_pagerank(spark, SF_DIR).collect()
    total = sum(r.rank_q for r in rows)
    assert 0.98 * _PR_SCALE <= total <= _PR_SCALE
    assert all(r.rank_q > 0 for r in rows)
    assert len({r.event_type for r in rows}) == len(rows)
