"""ADS serving shim: real HTTP round-trips against the catalog.

Starts the stdlib server on an ephemeral port with the shared session
and asserts the Sugar envelope (``{"status": 0, "msg": "", "data"}``,
``TradeController.java:23-35``) carries exactly the values the catalog
query returns directly.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from flink_spark.registry import all_queries, release_persisted
from flink_spark.serving import ENDPOINTS, serve

from conftest import SF_DIR


@pytest.fixture(scope="module")
def server(spark):
    srv = serve(spark, SF_DIR, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_all_endpoints_resolve_to_catalog_queries():
    catalog = all_queries()
    for path, (name, _) in ENDPOINTS.items():
        assert name in catalog, f"{path} -> unregistered query {name}"
        assert path.startswith("/gmall/realtime/")


def test_province_map_endpoint_matches_query(spark, server):
    status, body = _get(server, "/gmall/realtime/trade/provinceOrderCt")
    assert status == 200
    assert body["status"] == 0 and body["msg"] == ""
    direct = {
        r.province_name: r.order_count
        for r in all_queries()["ads_province_stats"].fn(spark, SF_DIR).collect()
    }
    release_persisted()
    assert {d["name"]: d["value"] for d in body["data"]} == direct
    assert len(body["data"]) > 0


def test_scalar_total_endpoint(spark, server):
    status, body = _get(server, "/gmall/realtime/trade/total")
    assert status == 200
    rows = all_queries()["ads_province_stats"].fn(spark, SF_DIR).collect()
    release_persisted()
    assert body["data"] == pytest.approx(sum(r.order_amount for r in rows))


def test_funnel_endpoint_shape(server):
    status, body = _get(server, "/gmall/realtime/user/uvPerPage")
    assert status == 200
    stages = [d["name"] for d in body["data"]]
    assert stages == ["home", "good_detail", "cart", "trade", "payment"]


def test_unknown_path_404_envelope(server):
    try:
        urllib.request.urlopen(server + "/gmall/realtime/nope", timeout=60)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as err:
        assert err.code == 404
        body = json.loads(err.read())
        assert body["status"] == 1 and "no such endpoint" in body["msg"]


def test_cache_serves_second_request(server):
    for _ in range(2):  # second hit must come from the cache path
        status, body = _get(server, "/gmall/realtime/traffic/keywords")
        assert status == 200 and len(body["data"]) > 0
