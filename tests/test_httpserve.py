"""E2E test for the EP3 HTTP layer: real sockets, real Spark jobs —
routes and response contracts mirror reference api/app.py:18-188 and
api/sql_api.py:20-76."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from anomaly_detector_faironchain_spark.plans import httpserve

RESULT_COLS = (
    "address string, is_infra int, in_degree long, out_degree long, "
    "in_transfer_count long, out_transfer_count long, "
    "total_input_amount double, total_output_amount double, "
    "has_self_loop int, two_node_loop_count long, "
    "triangle_loop_count long, egonet_density double, "
    "H1_flag int, H1_description string, H2_flag int, H2_description string, "
    "H3_flag int, H3_description string, H4_flag int, H4_description string, "
    "H5_flag int, H5_description string, H6_flag int, H6_description string, "
    "rule_score_100 float, mahalanobis_distance_stats_score_100 float, "
    "iforest_stats_score_100 float, final_score_0_100 float, "
    "final_score_top_percent_display string"
)


def _result_rows():
    h1 = [1, "H1: desc", 0, "", 0, "", 0, "", 1, "H5: desc", 0, ""]
    h0 = [0, ""] * 6
    return [
        tuple(["0xAbC1", 0, 7, 2, 11, 3, 2.5e18, 1.2e18, 1, 2, 0, 0.25]
              + h1 + [33.33, 91.2345, 88.5, 71.0, "0.50%"]),
        tuple(["0xDeF2", 0, 1, 1, 1, 1, 1.0e18, 1.0e18, 0, 0, 0, 0.0]
              + h0 + [10.0, 20.0, 30.0, 42.5, "5.00%"]),
        tuple(["0xinfra", 1, 0, 0, 0, 0, 0.0, 0.0, 0, 0, 0, 0.0]
              + h0 + [None, None, None, None, None]),
    ]


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("results")
    path = httpserve.month_parquet_path(str(root), "ethereum", 2023, 1)
    df = spark.createDataFrame(_result_rows(), RESULT_COLS)
    df.coalesce(1).write.parquet(path)
    srv = httpserve.serve(spark, str(root), port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return r.status, r.headers.get("Content-Type"), r.read().decode()


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get("Content-Type"), r.read().decode()


def test_v1_top_over_socket(server):
    status, ctype, body = _get(
        f"{server}/v1/top?chain=ethereum&year=2023&month=1&n=2")
    assert status == 200 and ctype == "application/json"
    rows = json.loads(body)
    assert rows == [
        {"ranking": 1, "address": "0xAbC1", "final_score_0_100": 71.0},
        {"ranking": 2, "address": "0xDeF2", "final_score_0_100": 42.5},
    ]


def test_v1_top_param_errors(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/v1/top?chain=ethereum&year=bogus&month=1")
    assert e.value.code == 400
    assert json.loads(e.value.read())["error"] == \
        "missing or invalid chain/year/month"
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/v1/top?chain=ethereum&year=2023&month=2")
    assert e.value.code == 404
    body = json.loads(e.value.read())
    assert "parquet not found" in body["error"] and "path" in body


def test_v1_address_over_socket(server):
    status, _, body = _get(
        f"{server}/v1/address?chain=ethereum&year=2023&month=1&addr=0xABC1")
    assert status == 200
    resp = json.loads(body)
    assert resp["meta"]["period"] == "2023-01"
    assert resp["features"]["amounts"]["total_input_amount_eth"] == "2.500000"
    assert resp["explanations"]["rule_ids"] == ["H1", "H5"]
    # infra null-out
    _, _, body = _get(
        f"{server}/v1/address?chain=ethereum&year=2023&month=1&addr=0xINFRA")
    resp = json.loads(body)
    assert resp["features"]["is_infra"] is True and resp["scores"] is None
    # unknown address → empty list, 200 (reference app.py:111)
    _, _, body = _get(
        f"{server}/v1/address?chain=ethereum&year=2023&month=1&addr=0xnope")
    assert json.loads(body) == []


def test_v1_sql_json_csv_and_guards(server):
    base = {"chain": "ethereum", "year": 2023, "month": 1}
    status, _, body = _post(f"{server}/v1/sql", {
        **base,
        "sql": "SELECT address, final_score_0_100 FROM t "
               "WHERE is_infra = 0 ORDER BY final_score_0_100 DESC",
    })
    assert status == 200
    rows = json.loads(body)
    assert [r["address"] for r in rows] == ["0xAbC1", "0xDeF2"]

    status, ctype, body = _post(f"{server}/v1/sql?format=csv", {
        **base, "sql": "SELECT address FROM t ORDER BY address",
    })
    assert status == 200 and ctype == "text/csv"
    assert body.splitlines()[0] == "address"

    for bad_sql, msg in [
        ("DROP TABLE t", "only SELECT queries are allowed"),
        ("SELECT * FROM t; DROP TABLE t", "forbidden keyword detected"),
        ("SELECT reflect('java.lang.System','getenv') FROM t",
         "forbidden keyword detected"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/v1/sql", {**base, "sql": bad_sql})
        assert e.value.code == 400
        assert json.loads(e.value.read())["error"] == msg

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/v1/sql", {"chain": "ethereum", "sql": "SELECT 1"})
    assert e.value.code == 400
    assert "missing required fields" in json.loads(e.value.read())["error"]


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/v1/nope")
    assert e.value.code == 404
