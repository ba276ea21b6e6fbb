"""ADS serving shim: the reference's publisher REST surface, stdlib-only.

The reference serves its ADS layer through Spring REST controllers
(``gmall-publisher-2022/.../controller/*.java`` — 6 controllers, paths
under ``/gmall/realtime/``) that wrap MyBatis mapper rows in the Sugar
dashboard envelope ``{"status": 0, "msg": "", "data": ...}``
(``TradeController.java:23-35`` builds it by hand). The mapper queries
themselves are already catalog entries (``plans/ads.py``,
``plans/relational.py``); this module closes the HTTP gap with a
zero-dependency ``http.server`` shim that routes the same paths to the
same catalog queries and emits the same envelope.

Design notes:

- **The engine stays the product.** The shim holds no query logic —
  every endpoint resolves to a registered catalog query (so it is
  oracle-checked by the driver gate) plus a row→payload shaper that
  mirrors the controller's output shape (name/value pairs for Sugar
  maps and word clouds, a scalar for ``/trade/total``, records
  otherwise).
- **Serving reads, not computes, at scale.** Results are collected
  once per path and cached; on a real deployment the queries would be
  served from the ADS sink tables (``partitioned_table_sink`` /
  ``upsert_sink`` output) that streaming jobs maintain, exactly like
  the reference reads ClickHouse DWS tables rather than re-running
  Flink per HTTP request. The per-request compute here mirrors the
  test fixtures being static parquet.
- The reference's ``?date=`` parameter selects the dashboard day
  (``DateUtil.now()`` default); the catalog queries embed their date
  predicates (the fixtures are a fixed TPC-H-ish snapshot), so the
  shim accepts and ignores it rather than faking a time axis.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse

from pyspark.sql import SparkSession

from flink_spark.registry import all_queries, release_persisted


def _records(rows) -> list[dict]:
    return [r.asDict(recursive=True) for r in rows]


def _name_value(name_col: str, value_col: str):
    """Sugar map/word-cloud shape: ``[{"name": ..., "value": ...}]``."""

    def shape(rows):
        return [{"name": r[name_col], "value": r[value_col]} for r in rows]

    return shape


def _scalar_sum(col: str):
    """Single-number endpoints (``TradeController./total``)."""

    def shape(rows):
        return sum(r[col] for r in rows)

    return shape


# path → (catalog query name, payload shaper). Paths are the
# reference's controller routes verbatim (file:line cited per row).
ENDPOINTS: dict[str, tuple[str, object]] = {
    # TradeController.java:22-35 (/total: one number, the day's GMV)
    "/gmall/realtime/trade/total": ("ads_province_stats", _scalar_sum("order_amount")),
    # TradeController.java:83-117 provinceOrderCt → Sugar map
    "/gmall/realtime/trade/provinceOrderCt": (
        "ads_province_stats", _name_value("province_name", "order_count")),
    # TradeController.java:119-153 provinceOrderAmount → Sugar map
    "/gmall/realtime/trade/provinceOrderAmount": (
        "ads_province_stats", _name_value("province_name", "order_amount")),
    # CommodityStatsController.java:27-57 trademark GMV top-k bar
    "/gmall/realtime/commodity/trademark": (
        "ads_gmv_topk_brand", _name_value("brand", "order_amount")),
    # CommodityStatsController.java:161-241 category stats table
    "/gmall/realtime/commodity/category": ("ads_category_fullouter", _records),
    # ActivityStatsController.java:20+ reduction-rate stats
    "/gmall/realtime/activity/stats": ("ads_subsidy_rate", _records),
    # CouponStatsController.java:20+ same envelope, coupon leg
    "/gmall/realtime/coupon/stats": ("ads_subsidy_rate", _records),
    # TrafficController.java:254-289 keywords word cloud
    "/gmall/realtime/traffic/keywords": (
        "ads_keyword_score", _name_value("keyword", "keyword_score")),
    # TrafficController.java:291-411 visitor new/returning split
    "/gmall/realtime/traffic/visitorPerType": ("s_new_vs_returning", _records),
    # TrafficController.java:29-72 uvCt dailies
    "/gmall/realtime/traffic/uvCt": ("s_daily_unique_users", _records),
    # UserStatsController.java:22-65 uvPerPage funnel
    "/gmall/realtime/user/uvPerPage": (
        "ads_funnel_union", _name_value("page_id", "uv_ct")),
    # UserStatsController.java:67-110 userChangeCt
    "/gmall/realtime/user/userChangeCt": ("ads_conditional_score", _records),
}


def make_handler(spark: SparkSession, sf_dir: str):
    """Build a request-handler class bound to one session + dataset."""
    catalog = all_queries()
    cache: dict[str, object] = {}
    lock = threading.Lock()

    def payload(path: str):
        with lock:                      # serialize Spark work + cache fill
            if path not in cache:
                name, shape = ENDPOINTS[path]
                rows = catalog[name].fn(spark, sf_dir).collect()
                release_persisted()
                cache[path] = shape(rows)
        return cache[path]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            path = urlparse(self.path).path
            if path not in ENDPOINTS:
                body = json.dumps(
                    {"status": 1, "msg": f"no such endpoint: {path}",
                     "data": None}).encode()
                self.send_response(404)
            else:
                body = json.dumps(
                    {"status": 0, "msg": "", "data": payload(path)},
                    default=str).encode()
                self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):      # keep pytest output clean
            pass

    return Handler


def serve(spark: SparkSession, sf_dir: str, port: int = 0) -> ThreadingHTTPServer:
    """Start the shim on ``port`` (0 = ephemeral); caller owns shutdown."""
    return ThreadingHTTPServer(("127.0.0.1", port), make_handler(spark, sf_dir))
