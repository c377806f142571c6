"""Cross-engine golden CSV parity — the analog of the reference's
webshop_spec.rb:46-54 row-for-row fixture comparison, with DuckDB
(instead of a checked-in file) producing the expected rows *including
the hierarchical row order* the reference's goldens encode."""

import csv
import io

import pytest

from mondrian_rest_spark import tpch
from mondrian_rest_spark.api import create_app


@pytest.fixture(scope="module")
def client(spark, sf_dir):
    app = create_app(tpch.CATALOG, sf_dir, spark=spark)
    app.config["TESTING"] = True
    return app.test_client()


def _cells(text):
    rows = list(csv.reader(io.StringIO(text)))
    out = []
    for r in rows[1:]:
        out.append(tuple(
            float(c) if c not in ("", None) and _numeric(c) else (c or None)
            for c in r))
    return rows[0], out


def _numeric(c):
    try:
        float(c)
        return True
    except ValueError:
        return False


def test_dense_csv_matches_duckdb_golden(client, duck):
    """Dense axes (the reference default, webshop_1.csv): every member
    combination present, empty cells blank, hierarchical row order."""
    r = client.get("/cubes/Orders/aggregate.csv", query_string=[
        ("measures[]", "Total Price"), ("measures[]", "Order Count"),
        ("drilldown[]", "Customer.Region"), ("drilldown[]", "Order Status"),
        ("nonempty", "false")])
    header, got = _cells(r.get_data(as_text=True))
    assert header == ["ID Region", "Region", "ID Order Status",
                      "Total Price", "Order Count"]
    exp = duck.execute("""
        WITH regions AS (
          SELECT DISTINCT r_regionkey AS k, r_name AS nm
          FROM customer JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey),
        sts AS (SELECT DISTINCT o_orderstatus AS st FROM orders),
        agg AS (
          SELECT r_regionkey AS k, o_orderstatus AS st,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS tp,
                 COUNT(o_orderkey) AS oc
          FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2)
        SELECT r.k, r.nm, s.st, a.tp, a.oc
        FROM regions r CROSS JOIN sts s
        LEFT JOIN agg a ON a.k = r.k AND a.st = s.st
        ORDER BY r.k, s.st""").fetchall()
    exp = [tuple(float(v) if isinstance(v, (int, float)) and not isinstance(v, bool)
                 else v for v in row) for row in exp]
    assert got == exp


def test_nonempty_csv_matches_duckdb_golden(client, duck):
    """nonempty=true (webshop_1_sparse.csv analog): only combinations
    with facts, same hierarchical order."""
    r = client.get("/cubes/Sales/aggregate.csv", query_string=[
        ("measures[]", "Revenue"),
        ("drilldown[]", "Customer.Nation"), ("drilldown[]", "Return Flag"),
        ("nonempty", "true")])
    header, got = _cells(r.get_data(as_text=True))
    assert header == ["ID Nation", "Nation", "ID Return Flag", "Revenue"]
    exp = duck.execute("""
        SELECT n_nationkey, n_name, l_returnflag,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3 ORDER BY 1, 3""").fetchall()
    exp = [tuple(float(v) if isinstance(v, (int, float)) and not isinstance(v, bool)
                 else v for v in row) for row in exp]
    assert got == exp
