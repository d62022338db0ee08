"""Property-based spot checks (SURVEY §5.5): algebraic invariants that must
hold for ANY predicate/limit, run over the real fixtures.

Each hypothesis example costs a Spark job, so max_examples is kept small —
the point is randomized coverage of thresholds and limits, not volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

FAST = settings(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(t=st.floats(min_value=0, max_value=60, allow_nan=False))
@FAST
def test_filter_partition_law(smoke_db, t):
    """count(p) + count(NOT p) == count() for a non-null column."""
    li = smoke_db["lineitem"]
    lo = li.query(where=f"l_quantity <= {t}").count()
    hi = li.query(where=f"l_quantity > {t}").count()
    assert lo + hi == li.count


@given(n=st.integers(min_value=0, max_value=7000))
@FAST
def test_limit_bound(smoke_db, n):
    li = smoke_db["lineitem"]
    got = li.query(fields=["l_orderkey", "l_linenumber"], limit=n).count()
    assert got == min(n, li.count)


@given(t=st.floats(min_value=0, max_value=60, allow_nan=False))
@FAST
def test_union_of_split_is_identity(smoke_db, t):
    """split by predicate then UNION ALL == original (bag equality via
    row-hash checksum, order-independent)."""
    df = smoke_db["lineitem"].df().select("l_orderkey", "l_linenumber",
                                          "l_quantity")
    lo = df.filter(F.col("l_quantity") <= t)
    hi = df.filter(F.col("l_quantity") > t)
    back = lo.unionAll(hi)

    def checksum(d):
        # sum as decimal: bigint sum of ~6k xxhash64 values overflows
        # (ANSI mode raises instead of wrapping)
        row = (d.select(F.xxhash64(*d.columns).cast("decimal(38,0)")
                        .alias("h"))
                .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()[0])
        return (row["s"], row["n"])

    assert checksum(back) == checksum(df)


@given(n=st.integers(min_value=1, max_value=50))
@FAST
def test_topk_agrees_with_sort_prefix(smoke_db, n):
    """top_k(n) == first n rows of the fully sorted relation (total order
    via unique tiebreak)."""
    from datum_spark.operators import top_k

    o = smoke_db["orders"].df().select("o_orderkey", "o_totalprice")
    keys = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    got = [tuple(r) for r in top_k(o, keys, n).collect()]
    want = [tuple(r) for r in o.orderBy(*keys).collect()][:n]
    assert got == want


def test_write_read_roundtrip_random_rows(tmp_db):
    """Randomized write→read round trip through the type-coercion path."""
    import random

    rng = random.Random(7)
    tmp_db.create_table("rt", [{"name": "a", "type": "num"},
                               {"name": "b", "type": "text"},
                               {"name": "d", "type": "date"}])
    rows = []
    for i in range(50):
        rows.append({
            "a": rng.choice([None, rng.randint(-10**9, 10**9),
                             rng.uniform(-1e6, 1e6)]),
            "b": rng.choice([None, f"s{i}", "", "0", "naïve-ütf"]),
            "d": rng.choice([None, "2021-03-04T05:06:07"]),
        })
    tmp_db["rt"].write(rows)
    got = tmp_db["rt"].read(fields=["a", "b", "d"], sort="a")
    assert len(got) == 50
    # every non-null numeric survives as float; only None became NULL
    n_null_a = sum(1 for r in rows if r["a"] is None)
    assert sum(1 for r in got if r["a"] is None) == n_null_a
    n_empty_b = sum(1 for r in rows if r["b"] == "")
    assert sum(1 for r in got if r["b"] == "") == n_empty_b  # '' stays ''


# ---------------------------------------------------------------------------
# Pure-NumPy properties (no Spark job per example → generous max_examples)

@given(lon=st.floats(min_value=-179.5, max_value=179.5, allow_nan=False),
       lat=st.floats(min_value=-80.0, max_value=84.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_web_mercator_round_trip_property(lon, lat):
    from datum_spark.functions.projection import builtin_transform

    x, y = builtin_transform(4326, 3857)(lon, lat)
    lon2, lat2 = builtin_transform(3857, 4326)(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(lon=st.floats(min_value=-78.0, max_value=-72.0, allow_nan=False),
       lat=st.floats(min_value=0.5, max_value=84.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_utm_round_trip_property(lon, lat):
    """Zone 18 ± one neighboring zone width — the domain the TM series is
    specified for."""
    from datum_spark.functions.projection import builtin_transform

    x, y = builtin_transform(4326, 32618)(lon, lat)
    lon2, lat2 = builtin_transform(32618, 4326)(x, y)
    # series truncation reaches ~1e-8 deg (≈1 mm) at the zone edge
    assert abs(float(lon2) - lon) < 1e-7
    assert abs(float(lat2) - lat) < 1e-7


@given(lon=st.floats(min_value=-80.5, max_value=-74.7, allow_nan=False),
       lat=st.floats(min_value=39.72, max_value=42.5, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_pa_north_lcc_round_trip_property(lon, lat):
    from datum_spark.functions.projection import builtin_transform

    x, y = builtin_transform(4326, 2271)(lon, lat)
    lon2, lat2 = builtin_transform(2271, 4326)(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(frac=st.floats(min_value=0.01, max_value=0.99),
       keys=st.lists(st.integers(min_value=0, max_value=10**12),
                     min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_md5_split_monotone_membership(frac, keys):
    """The md5 keep-set at fraction f is a SUBSET of the keep-set at any
    f' > f (monotone in the threshold) — the property that lets mixing
    ratios be re-tuned without resampling churn.  Pure-python twin of the
    Spark expression (same md5(salt-key) bucket contract)."""
    import hashlib

    def bucket(k, salt="mix"):
        return int(hashlib.md5(f"{salt}-{k}".encode()).hexdigest()[:8], 16)

    hi = frac + (1 - frac) / 2
    kept_lo = {k for k in keys if bucket(k) < frac * (1 << 32)}
    kept_hi = {k for k in keys if bucket(k) < hi * (1 << 32)}
    assert kept_lo <= kept_hi


# ---------------------------------------------------------------------------
# Polygon ray cast vs an INDEPENDENT oracle (round 7)

def _convex_hull(pts):
    """Monotone-chain convex hull, CCW, no collinear points kept."""
    pts = sorted(set(pts))
    if len(pts) < 3:
        return pts

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(reversed(pts))
    return lower[:-1] + upper[:-1]


@given(data=st.data())
@FAST
def test_ray_cast_matches_halfplane_on_convex(spark, data):
    """st__pip (even-odd ray cast over WKT) must agree with the
    half-plane test — a structurally different formula: a point is
    inside a CCW convex polygon iff it is strictly left of EVERY edge.
    Integer coordinates make the cross products exact; exact-boundary
    points (some cross == 0) are excluded because the ray cast is
    deliberately half-open there."""
    from hypothesis import assume

    from datum_spark.functions.geometry_sql import (
        register_geometry_sql_functions,
    )

    corners = data.draw(st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=3, max_size=12, unique=True))
    hull = _convex_hull(corners)
    assume(len(hull) >= 3)
    probes = data.draw(st.lists(
        st.tuples(st.integers(-100, 1100), st.integers(-100, 1100)),
        min_size=5, max_size=25))

    edges = list(zip(hull, hull[1:] + hull[:1]))

    def want(p):
        crosses = [(bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax)
                   for (ax, ay), (bx, by) in edges]
        if any(c == 0 for c in crosses):
            return None                      # exact boundary line: skip
        return all(c > 0 for c in crosses)

    cases = [(float(x), float(y), want((x, y))) for x, y in probes]
    cases = [c for c in cases if c[2] is not None]
    assume(cases)

    register_geometry_sql_functions(spark)
    wkt = ("POLYGON ((" + ", ".join(f"{x} {y}" for x, y in hull)
           + f", {hull[0][0]} {hull[0][1]}))")
    df = spark.createDataFrame(cases, "px double, py double, want boolean")
    rows = df.selectExpr(f"st__pip(px, py, '{wkt}') AS got",
                         "want", "px", "py").collect()
    bad = [(r["px"], r["py"], r["got"], r["want"])
           for r in rows if r["got"] != r["want"]]
    assert not bad, (wkt, bad)


@given(data=st.data())
@FAST
def test_area_perimeter_match_python_shoelace(spark, data):
    """st_area/st_perimeter vs an independent Python shoelace/segment
    sum over random integer hulls, with a hole punched by the hull
    scaled 1/4 toward its centroid (area subtracts, perimeter adds)."""
    from hypothesis import assume

    from datum_spark.functions.geometry_sql import (
        register_geometry_sql_functions,
    )

    corners = data.draw(st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=4, max_size=10, unique=True))
    hull = _convex_hull(corners)
    assume(len(hull) >= 3)
    cx = sum(x for x, _ in hull) / len(hull)
    cy = sum(y for _, y in hull) / len(hull)
    hole = [(round(cx + (x - cx) / 4, 6), round(cy + (y - cy) / 4, 6))
            for x, y in hull]

    def shoelace(ring):
        s = 0.0
        for (ax, ay), (bx, by) in zip(ring, ring[1:] + ring[:1]):
            s += ax * by - bx * ay
        return abs(s) / 2

    def perim(ring):
        return sum(((bx - ax) ** 2 + (by - ay) ** 2) ** 0.5
                   for (ax, ay), (bx, by) in zip(ring, ring[1:] + ring[:1]))

    def ring_txt(ring):
        return ", ".join(f"{x} {y}" for x, y in ring + [ring[0]])

    wkt = f"POLYGON (({ring_txt(hull)}), ({ring_txt(hole)}))"
    want_area = shoelace(hull) - shoelace(hole)
    want_perim = perim(hull) + perim(hole)

    register_geometry_sql_functions(spark)
    [r] = spark.sql(f"SELECT st_area('{wkt}') AS a, "
                    f"st_perimeter('{wkt}') AS p").collect()
    assert abs(r["a"] - want_area) < 1e-6 * max(want_area, 1)
    assert abs(r["p"] - want_perim) < 1e-6 * max(want_perim, 1)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_kmv_merge_law_random_sets(spark, seed):
    """bottom-k(A ∪ B) from the two sketches alone — the semilattice
    law behind kmv_merge and the streaming kmv_sink, on random sets."""
    import random

    from pyspark.sql import functions as F  # noqa: F401
    from datum_spark.operators.sketches import kmv_build, kmv_merge

    rng = random.Random(seed)
    a = {f"e{rng.randrange(400)}" for _ in range(rng.randrange(1, 150))}
    b = {f"e{rng.randrange(400)}" for _ in range(rng.randrange(1, 150))}
    k = rng.choice([4, 16, 64])
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b]
        + [("u", v) for v in a | b], "g string, v string")
    sk = {r["g"]: r["kmv"] for r in kmv_build(df, "v", ["g"], k=k).collect()}
    merged = (spark.createDataFrame([(sk["a"], sk["b"])],
                                    "x array<bigint>, y array<bigint>")
              .select(kmv_merge(F.col("x"), F.col("y"), k).alias("m"))
              .first()["m"])
    assert merged == sk["u"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_dbscan_random_equals_bruteforce(spark, seed):
    import random

    from datum_spark.operators.spatial import dbscan
    from tests.test_sketches_spatial_r8 import _brute_dbscan

    rng = random.Random(seed)
    n = rng.randrange(10, 60)
    pts = {i: (round(rng.uniform(0, 10), 3), round(rng.uniform(0, 10), 3))
           for i in range(n)}
    eps = rng.choice([0.8, 1.5, 2.5])
    min_pts = rng.choice([2, 3, 4])
    expect = _brute_dbscan(pts, eps, min_pts)
    df = spark.createDataFrame([(i, x, y) for i, (x, y) in pts.items()],
                               "id bigint, x double, y double")
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in dbscan(df, "id", "x", "y", eps, min_pts).collect()}
    assert got == expect


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_ewma_random_series_matches_pandas(spark, seed):
    """r13 property: the EWMA fold equals pandas ewm(adjust=False) on
    random multi-key series with random lengths and alphas."""
    import random

    import numpy as np
    import pandas as pd

    from datum_spark.operators.timeseries import ewma_summary

    rng = random.Random(seed)
    alpha = rng.choice([0.1, 0.3, 0.5, 0.9])
    rows = []
    for uid in range(rng.randrange(1, 4)):
        n = rng.randrange(1, 30)
        for i in range(n):
            rows.append((uid,
                         pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), i,
                         round(rng.uniform(-100, 100), 3)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "eid", "v"])
    out = (ewma_summary(spark.createDataFrame(pdf), "k", "ts", "v",
                        alpha=alpha, tie_col="eid")
           .toPandas().set_index("k"))
    for uid, grp in pdf.groupby("k"):
        s = grp.sort_values(["ts", "eid"]).v
        e = s.ewm(alpha=alpha, adjust=False).mean()
        assert out.loc[uid, "ewma_last"] == pytest.approx(
            e.iloc[-1], abs=1e-6)
        if len(s) > 1:
            mae = float(np.abs(s.values[1:] - e.values[:-1]).mean())
            assert out.loc[uid, "mae_1step"] == pytest.approx(
                mae, abs=1e-6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_mannwhitney_random_matches_reference(spark, seed):
    """r13 property: MW U/z equal the midrank reference on random tied
    data, and U_a + U_b == n_a*n_b (the rank-sum identity)."""
    import random

    import numpy as np
    import pandas as pd

    from datum_spark.operators.twosample import mann_whitney_u

    rng = random.Random(seed)
    na, nb = rng.randrange(2, 40), rng.randrange(2, 40)
    vals = [round(rng.uniform(0, 5), 1) for _ in range(na + nb)]
    pdf = pd.DataFrame({"g": ["a"] * na + ["b"] * nb, "v": vals})
    df = spark.createDataFrame(pdf)
    ra = mann_whitney_u(df, "g", "v", "a").collect()[0]
    rb = mann_whitney_u(df, "g", "v", "b").collect()[0]
    ranks = pdf.v.rank(method="average")
    U = float(ranks[:na].sum() - na * (na + 1) / 2)
    assert ra.u_stat == pytest.approx(U, abs=1e-9)
    assert ra.u_stat + rb.u_stat == pytest.approx(na * nb, abs=1e-9)
    if ra.z_stat is not None and rb.z_stat is not None:
        assert ra.z_stat == pytest.approx(-rb.z_stat, abs=2e-6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_ks_random_matches_numpy_ecdf(spark, seed):
    """r13 property: KS D equals the numpy ECDF sup-diff on random
    tied data; D in [0, 1]; identical samples give D = 0."""
    import random

    import numpy as np
    import pandas as pd

    from datum_spark.operators.twosample import ks_2sample

    rng = random.Random(seed)
    na, nb = rng.randrange(2, 40), rng.randrange(2, 40)
    A = np.array([round(rng.uniform(0, 3), 1) for _ in range(na)])
    B = np.array([round(rng.uniform(0, 3), 1) for _ in range(nb)])
    pdf = pd.DataFrame({"g": ["a"] * na + ["b"] * nb,
                        "v": np.concatenate([A, B])})
    r = ks_2sample(spark.createDataFrame(pdf), "g", "v", "a").collect()[0]
    allv = np.unique(pdf.v)
    ea = np.searchsorted(np.sort(A), allv, side="right") / na
    eb = np.searchsorted(np.sort(B), allv, side="right") / nb
    D = float(np.abs(ea - eb).max())
    assert r.d_stat == pytest.approx(D, abs=1e-6)
    assert 0.0 <= r.d_stat <= 1.0
