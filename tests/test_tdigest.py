"""t-digest sketch: quantile accuracy, mergeability, KS/PSI estimates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacheck_spark.tdigest import (
    TDigest,
    column_tdigest,
    ks_from_digests,
    merge_digests,
    psi_from_digests,
    _compress,
)


def _digest_of(values, compression=100):
    v = np.asarray(values, dtype=float)
    m, w = _compress(v, np.ones_like(v), compression)
    return TDigest(m, w, compression)


def test_centroid_count_bounded():
    d = _digest_of(np.random.RandomState(1).normal(size=100_000))
    assert len(d.means) <= 110  # ~compression
    assert d.total_weight == pytest.approx(100_000)


def test_quantile_accuracy_uniform():
    rs = np.random.RandomState(7)
    vals = rs.uniform(0, 1, 50_000)
    d = _digest_of(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        exact = np.quantile(vals, q)
        assert d.quantile(q) == pytest.approx(exact, abs=0.01), q


def test_merge_matches_single_build():
    rs = np.random.RandomState(3)
    a = rs.normal(0, 1, 20_000)
    b = rs.normal(0, 1, 20_000)
    merged = merge_digests([_digest_of(a), _digest_of(b)])
    whole = _digest_of(np.concatenate([a, b]))
    for q in (0.1, 0.5, 0.9):
        assert merged.quantile(q) == pytest.approx(
            whole.quantile(q), abs=0.05
        )


def test_column_tdigest_spark(spark):
    df = spark.range(100_000).select(
        (F.col("id") % 1000).cast("double").alias("v")
    )
    d = column_tdigest(df, "v")
    assert d.total_weight == pytest.approx(100_000)
    assert d.quantile(0.5) == pytest.approx(499.5, abs=15)
    assert d.quantile(0.99) == pytest.approx(989.0, abs=15)


def test_column_tdigest_tree_merge_many_partitions(spark):
    """Above 2×TREE_FANIN scan partitions the executor-side pre-merge
    level kicks in: the driver-side digest list stays O(nparts/FANIN)
    and the quantiles match the single-level path's accuracy."""
    from datacheck_spark import tdigest as TD

    df = (
        spark.range(200_000)
        .select((F.col("id") % 1000).cast("double").alias("v"))
        .repartition(300)  # > 2 * TREE_FANIN → tree path
    )
    d = TD.column_tdigest(df, "v")
    assert d.total_weight == pytest.approx(200_000)
    for q, want in [(0.5, 499.5), (0.99, 989.0)]:
        assert d.quantile(q) == pytest.approx(want, abs=15)
    # the pre-merged collect is bounded: ≤ ceil(300/64) = 5 digest rows,
    # each ≤ ~2×compression centroids
    assert len(d.means) <= 2 * 100


def test_ks_psi_from_digests(spark):
    rs = np.random.RandomState(5)
    same_a = _digest_of(rs.normal(0, 1, 30_000))
    same_b = _digest_of(rs.normal(0, 1, 30_000))
    shifted = _digest_of(rs.normal(3, 1, 30_000))
    assert ks_from_digests(same_a, same_b) < 0.05
    assert ks_from_digests(same_a, shifted) > 0.8
    assert psi_from_digests(same_a, same_b) < 0.05
    assert psi_from_digests(same_a, shifted) > 1.0
