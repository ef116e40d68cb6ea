"""Independent brute-force python cross-check for dbscan_clusters
(queries/spatial.py): exact role + cluster assignment at sf0.001."""

import hashlib

import pytest

from etl_mp_transactions_spark.queries.spatial import (
    COORD_MAX,
    DB_EPS_BASE,
    DB_EPS_CAP,
    DB_MINNBR,
)
from etl_mp_transactions_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def _coord(cid, salt):
    return int(hashlib.md5(f"{cid}{salt}".encode()).hexdigest()[:8], 16) % COORD_MAX


def test_dbscan_vs_bruteforce(spark, sf_dir, q):
    pdf = q["dbscan_clusters"](spark, sf_dir).toPandas()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    ids = sorted(int(c) for c in cust["c_custkey"])
    pts = {i: (_coord(i, ":x"), _coord(i, ":y")) for i in ids}
    n = len(ids)
    eps = min(DB_EPS_CAP, round(DB_EPS_BASE * (1500.0 / n) ** 0.5))
    nbrs = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if j <= i:
                continue
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dx + dy * dy <= eps * eps:
                nbrs[i].add(j)
                nbrs[j].add(i)
    core = {i for i in ids if len(nbrs[i]) >= DB_MINNBR}
    # transitive closure over core-core edges
    cluster = {}
    for c in core:
        if c in cluster:
            continue
        stack, comp = [c], []
        seen = {c}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in nbrs[v]:
                if u in core and u not in seen:
                    seen.add(u)
                    stack.append(u)
        lbl = min(comp)
        for v in comp:
            cluster[v] = lbl
    expect = {}
    for i in ids:
        if i in core:
            expect[i] = ("core", cluster[i], len(nbrs[i]))
        else:
            cn = [cluster[u] for u in nbrs[i] if u in core]
            if cn:
                expect[i] = ("border", min(cn), len(nbrs[i]))
            else:
                expect[i] = ("noise", -1, len(nbrs[i]))
    got = {
        int(r.id): (r.role, int(r.cluster), int(r.n_nbrs))
        for r in pdf.itertuples()
    }
    assert got == expect


def test_dbscan_role_cluster_consistency(spark, sf_dir, q):
    pdf = q["dbscan_clusters"](spark, sf_dir).toPandas()
    assert (pdf.loc[pdf["role"] == "noise", "cluster"] == -1).all()
    assert (pdf.loc[pdf["role"] != "noise", "cluster"] >= 0).all()
    # every cluster label is the id of a core member of that cluster
    cores = pdf[pdf["role"] == "core"]
    for lbl in set(pdf.loc[pdf["cluster"] >= 0, "cluster"]):
        assert ((cores["id"] == lbl) & (cores["cluster"] == lbl)).any()


def test_point_in_polygon_vs_matplotlib_free_check(spark, sf_dir, q):
    """Cross-check the convex containment against a python winding
    re-derivation on the same integer points."""
    from etl_mp_transactions_spark.queries.spatial import PIP_POLY

    pdf = q["point_in_polygon_join"](spark, sf_dir).toPandas()
    n = len(PIP_POLY)
    for r in pdf.itertuples():
        ok = True
        for i in range(n):
            x1, y1 = PIP_POLY[i]
            x2, y2 = PIP_POLY[(i + 1) % n]
            if (x2 - x1) * (r.y - y1) - (y2 - y1) * (r.x - x1) < 0:
                ok = False
                break
        assert r.inside == int(ok)
    # polygon vertices themselves are on the boundary => inside
    xs = [p[0] for p in PIP_POLY]
    ys = [p[1] for p in PIP_POLY]
    assert (pdf["x"] >= min(xs)).all() and (pdf["y"] <= max(ys)).all()
