"""DDSketch (sketch/ddsketch.py): published relative-error bound,
merge associativity / order invariance, wire roundtrip, and the
determinism property the q95 value-level oracle relies on."""

import math

import numpy as np
import pytest

from facs_spark.sketch.ddsketch import DDSketch


def _exact_quantile(vals, q):
    """Datadog rank semantics: lower value at rank q*(n-1)."""
    s = np.sort(np.asarray(vals, dtype=np.float64))
    return float(s[int(math.floor(q * (len(s) - 1)))])


@pytest.mark.parametrize("alpha", [0.01, 0.02, 0.05])
def test_relative_error_bound(alpha):
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.lognormal(6.0, 1.5, 20_000),
        rng.integers(1, 50, 5_000).astype(np.float64),
    ])
    dd = DDSketch(alpha=alpha)
    dd.update_batch(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        est = dd.quantile(q)
        # the guarantee is value-wise vs SOME value within rank
        # neighborhood; for continuous data the Datadog-rank exact
        # quantile is the witness
        true = _exact_quantile(vals, q)
        assert abs(est - true) <= alpha * true + 1e-9, (q, est, true)


def test_merge_order_invariance_exact():
    """Unbounded DDSketch is exactly merge-order-invariant: any
    partitioning/merge tree yields the identical store — the property
    the q95 value-level oracle depends on."""
    rng = np.random.default_rng(11)
    vals = rng.integers(1, 100_000, 30_000).astype(np.float64)
    one = DDSketch(alpha=0.02)
    one.update_batch(vals)

    parts = np.array_split(vals, 7)
    sketches = []
    for p in parts:
        d = DDSketch(alpha=0.02)
        d.update_batch(p)
        sketches.append(d)
    # left fold
    left = sketches[0]
    for s in sketches[1:]:
        left = left.merge(s)
    # reversed fold
    right = sketches[-1]
    for s in reversed(sketches[:-1]):
        right = right.merge(s)
    assert left._store == right._store == one._store
    assert left.zero_count == one.zero_count
    for q in (0.1, 0.5, 0.9, 0.99):
        assert left.quantile(q) == one.quantile(q) == right.quantile(q)


def test_zero_and_negative_values():
    dd = DDSketch(alpha=0.01)
    dd.update_batch([0.0, -3.0, 5.0, 5.0, 5.0])
    assert dd.zero_count == 2
    assert dd.count == 5
    assert dd.quantile(0.0) == 0.0          # zero bucket below all
    est = dd.quantile(0.9)
    assert abs(est - 5.0) <= 0.01 * 5.0


def test_wire_roundtrip():
    rng = np.random.default_rng(3)
    dd = DDSketch(alpha=0.02)
    dd.update_batch(rng.integers(0, 10_000, 5_000).astype(np.float64))
    blob = dd.to_bytes()
    back = DDSketch.from_bytes(blob)
    assert back.alpha == dd.alpha
    assert back.zero_count == dd.zero_count
    assert back._store == dd._store
    from facs_spark.sketch import sketch_from_bytes
    assert isinstance(sketch_from_bytes(blob), DDSketch)


def test_bucket_math_matches_sql_formula():
    """The Spark kernel and the DuckDB oracle must agree on
    ceil(ln(x)/ln(gamma)): replay the SQL-side formula in DuckDB for
    a dense integer range and compare to the numpy kernel."""
    duckdb = pytest.importorskip("duckdb")
    alpha = 0.02
    g = (1.0 + alpha) / (1.0 - alpha)
    xs = np.arange(1, 20_001, dtype=np.float64)
    np_keys = np.ceil(np.log(xs) / math.log(g)).astype(np.int64)
    sql_keys = duckdb.sql(
        f"SELECT CAST(CEIL(LN(CAST(x AS DOUBLE)) / "
        f"LN((1.0 + {alpha}) / (1.0 - {alpha}))) AS BIGINT) AS k "
        f"FROM range(1, 20001) t(x) ORDER BY x"
    ).fetchnumpy()["k"]
    assert (np_keys == sql_keys).all()


def test_empty_and_alpha_guards():
    dd = DDSketch(alpha=0.02)
    assert math.isnan(dd.quantile(0.5))
    with pytest.raises(ValueError):
        DDSketch(alpha=0.0)
    with pytest.raises(ValueError):
        dd.merge(DDSketch(alpha=0.01))
