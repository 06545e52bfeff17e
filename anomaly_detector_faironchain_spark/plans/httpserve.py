"""Thin HTTP serving layer over the EP3 endpoint logic in plans/sqlapi.py
— the stdlib re-expression of the reference Flask app
(reference: api/app.py:18-188, api/sql_api.py:20-76, api/utils.py:17-32).

Routes and response contracts match the reference exactly:

  GET  /v1/top?chain=&year=&month=&n=100
      → [{"ranking", "address", "final_score_0_100"}] (score 1dp)
  GET  /v1/address?chain=&year=&month=&addr=0x...
      → nested meta/features/scores/explanations dict; [] when absent;
        the infra null-out special case
  POST /v1/sql[?format=csv]   body {"chain","year","month","sql"}
      → guarded single-SELECT against view `t` (sqlapi.guard_sql — the
        reference DuckDB keyword list plus Spark escape hatches);
        records JSON (double_precision=6) or CSV

Serving discipline at scale: every route collects at most a bounded
number of rows to the driver — /v1/top is a distributed TakeOrdered of n
rows, /v1/address a pushed-down equality filter + limit(1), /v1/sql is
capped at ``max_sql_rows`` via limit() BEFORE collect. The Spark session
itself stays warm across requests (each request is a tiny job against a
cached monthly result table).

stdlib http.server is intentional: the sandbox has no Flask, and a
serving layer this thin gains nothing from a framework. ThreadingHTTPServer
+ Spark's thread-safe session means concurrent requests become concurrent
Spark jobs (FAIR-schedulable).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession

from anomaly_detector_faironchain_spark.plans import sqlapi


def month_parquet_path(data_root: str, chain: str, year: int, month: int) -> str:
    """Monthly analysis-result layout (reference api/utils.py:17-32):
    {root}/{chain}/{YYYY}/{MM}/{chain}__analysis_result__{Y}_{MM}.parquet"""
    return os.path.join(
        data_root, chain, f"{year:04d}", f"{month:02d}",
        f"{chain}__analysis_result__{year}_{month:02d}.parquet",
    )


class ResultStore:
    """Resolves (chain, year, month) → cached result DataFrame."""

    def __init__(self, spark: SparkSession, data_root: str):
        self.spark = spark
        self.data_root = data_root
        self._cache: dict[str, DataFrame] = {}
        self._lock = threading.Lock()

    def resolve(self, chain: str, year: int, month: int) -> tuple[DataFrame | None, str]:
        path = month_parquet_path(self.data_root, chain, year, month)
        with self._lock:
            if path in self._cache:
                return self._cache[path], path
        if not os.path.exists(path):
            return None, path
        df = self.spark.read.parquet(path).cache()
        with self._lock:
            self._cache[path] = df
        return df, path


def _records_json(pdf) -> str:
    """pandas records JSON with the reference's double_precision=6."""
    return pdf.to_json(orient="records", double_precision=6)


def make_handler(store: ResultStore, max_sql_rows: int = 10_000):
    class Handler(BaseHTTPRequestHandler):
        # silence per-request stderr logging (tests hit this in-loop)
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, body: str,
                  ctype: str = "application/json") -> None:
            raw = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj))

        def _month_params(self, q: dict):
            """chain/year/month triple, or None after sending the
            reference's 400 (app.py:26-31)."""
            try:
                chain = q["chain"][0]
                year = int(q["year"][0])
                month = int(q["month"][0])
                return chain, year, month
            except (KeyError, IndexError, ValueError):
                self._send_json(
                    400, {"error": "missing or invalid chain/year/month"})
                return None

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
            url = urlparse(self.path)
            q = parse_qs(url.query)
            if url.path == "/v1/top":
                params = self._month_params(q)
                if params is None:
                    return
                chain, year, month = params
                df, path = store.resolve(chain, year, month)
                if df is None:
                    self._send_json(404, {
                        "error": f"parquet not found for {chain} "
                                 f"{year}-{month:02d}",
                        "path": path,
                    })
                    return
                try:
                    n = int(q.get("n", ["100"])[0])
                except ValueError:
                    self._send_json(400, {"error": "invalid n"})
                    return
                self._send(200, json.dumps(sqlapi.top_addresses(df, n)))
                return
            if url.path == "/v1/address":
                params = self._month_params(q)
                if params is None:
                    return
                chain, year, month = params
                addr = q.get("addr", [""])[0]
                df, path = store.resolve(chain, year, month)
                if df is None:
                    self._send_json(404, {
                        "error": f"parquet not found for {chain} "
                                 f"{year}-{month:02d}",
                        "path": path,
                    })
                    return
                prof = sqlapi.address_profile(
                    df, addr, chain=chain, period=f"{year:04d}-{month:02d}")
                # reference returns an empty JSON list for unknown addr
                self._send(200, json.dumps(prof if prof is not None else []))
                return
            self._send_json(404, {"error": "unknown route"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/v1/sql":
                self._send_json(404, {"error": "unknown route"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                data = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                data = {}
            required = ("chain", "year", "month", "sql")
            missing = [k for k in required if data.get(k) in (None, "")]
            if missing:
                self._send_json(400, {
                    "error": f"missing required fields: {', '.join(missing)}"})
                return
            try:
                chain = str(data["chain"]).lower().strip()
                year, month = int(data["year"]), int(data["month"])
            except (TypeError, ValueError):
                self._send_json(
                    400, {"error": "missing or invalid chain/year/month"})
                return
            df, path = store.resolve(chain, year, month)
            if df is None:
                self._send_json(404, {
                    "error": f"parquet not found for {chain} "
                             f"{year}-{month:02d}",
                    "path": path,
                })
                return
            fmt = parse_qs(url.query).get("format", ["json"])[0].lower()
            try:
                out = sqlapi.run_sql(store.spark, df, str(data["sql"]))
                pdf = out.limit(max_sql_rows).toPandas()
            except sqlapi.SqlGuardError as e:
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — Catalyst analysis errors
                self._send_json(400, {"error": str(e)})
                return
            if fmt == "csv":
                self._send(200, pdf.to_csv(index=False), ctype="text/csv")
            else:
                self._send(200, _records_json(pdf))

    return Handler


def serve(spark: SparkSession, data_root: str, host: str = "127.0.0.1",
          port: int = 8000, max_sql_rows: int = 10_000) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; callers run
    ``serve_forever()`` (cli) or drive it from a thread (tests).
    port=0 binds an ephemeral port (server.server_address[1])."""
    store = ResultStore(spark, data_root)
    return ThreadingHTTPServer((host, port), make_handler(store, max_sql_rows))
