"""Serving layer: the four chart endpoints' JSON contracts
(reference api/data_service.py + server.py)."""

import json

from defi_etl_platform_sqlglot_implementation__spark.serving.data_service import DataService
from defi_etl_platform_sqlglot_implementation__spark.serving.server import wsgi_app


class TestVarEndpoint:
    def test_shape_and_invariants(self, spark):
        d = DataService(spark).get_var_data()
        assert len(d["labels"]) == 90
        assert len(d["prices"]) == 90
        assert d["var_series"][:30] == [None] * 30
        assert all(v is not None for v in d["var_series"][30:])
        assert d["summary"]["cvar_95"] >= d["summary"]["var_95"] > 0
        assert d["summary"]["returns_used"] == 90
        assert len(d["stress_test"]) == 4
        pnls = [r["pnl_usd"] for r in d["stress_test"]]
        assert max(pnls) == -100_000.0  # -10% of 1M


class TestIlEndpoint:
    def test_shape_and_key_points(self, spark):
        d = DataService(spark).get_il_data()
        assert len(d["labels"]) == 99
        assert d["labels"][0] == "0.1x"
        assert set(d["key_points"]) == {"0.5x", "1.0x", "2.0x", "3.0x", "5.0x"}
        assert abs(d["key_points"]["1.0x"]["il_pct"]) < 1e-9
        assert abs(d["key_points"]["2.0x"]["il_pct"] - (-5.72)) < 0.01
        assert d["config"]["protocol"] == "Uniswap V2 (x*y=k)"


class TestMevEndpoint:
    def test_shape_and_ranges(self, spark):
        d = DataService(spark).get_mev_data()
        assert 0 < len(d["blocks"]) <= 48
        assert all(0 <= s <= 100 for s in d["scores"])
        assert len(d["colors"]) == len(d["blocks"])
        assert all(c.startswith("rgba(") for c in d["colors"])
        assert d["summary"]["blocks_analyzed"] == len(d["blocks"])
        assert d["summary"]["max_score"] >= d["summary"]["avg_score"]


class TestTransfersEndpoint:
    def test_shape_and_totals(self, spark):
        d = DataService(spark).get_transfer_data()
        s = d["summary"]
        assert s["total_transfers"] == 200
        assert s["erc20_transfers"] + s["erc721_transfers"] == 200
        assert 1 <= len(d["top_contracts"]) <= 4
        assert len(d["labels"]) == len(d["erc20_vol"]) == len(d["erc721_cnt"])
        vols = [t["volume_eth"] for t in d["top_contracts"]]
        assert vols == sorted(vols, reverse=True)


class TestWsgiEdge:
    def test_routes_serve_json(self, spark):
        app = wsgi_app(spark)
        captured = {}

        def start_response(status, headers):
            captured["status"] = status

        body = b"".join(app({"PATH_INFO": "/api/il"}, start_response))
        assert captured["status"] == "200 OK"
        payload = json.loads(body)
        assert "il_pct" in payload

        body = b"".join(app({"PATH_INFO": "/nope"}, start_response))
        assert captured["status"] == "404 Not Found"
