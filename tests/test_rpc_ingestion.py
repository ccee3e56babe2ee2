"""Executable RPC-ingestion twin test: a stdlib http.server plays a
JSON-RPC EVM node (eth_blockNumber / eth_getBlockByNumber /
eth_getTransactionReceipt) with injectable failures; the client must
retry with the reference backoff schedule, normalize blocks into the
reference envelope shapes, and land them in the bronze frame where the
production decoders pick them up."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from defi_etl_platform_sqlglot_implementation__spark.functions.keccak import (
    ERC20_TRANSFER_TOPIC,
)
from defi_etl_platform_sqlglot_implementation__spark.sources.rpc import (
    TOPIC_LOGS,
    TOPIC_TOKEN_TRANSFERS,
    JsonRpcClient,
    RpcError,
    block_to_events,
    ingest_block_range,
    route_topic,
)

E18 = 10 ** 18


def _tx(n, i):
    return {
        "hash": f"0x{'ab' * 31}{n:02x}{i:02x}"[:66],
        "from": "0x" + "11" * 20,
        "to": "0x" + "22" * 20,
        "value": hex(3 * E18),
        "gas": hex(21000),
        "gasPrice": hex(30 * 10 ** 9),
        "nonce": hex(i),
        "input": "0xa9059cbb" + "00" * 28,
    }


def _chain():
    b1_tx = _tx(1, 0)
    b2_tx = _tx(2, 0)
    blocks = {
        1: {"number": hex(1), "timestamp": hex(1_700_000_000),
            "hash": "0x" + "01" * 32, "parentHash": "0x" + "00" * 32,
            "miner": "0x" + "33" * 20, "gasUsed": hex(21000),
            "gasLimit": hex(30_000_000), "baseFeePerGas": hex(7),
            "transactions": [b1_tx]},
        2: {"number": hex(2), "timestamp": hex(1_700_000_012),
            "hash": "0x" + "02" * 32, "parentHash": "0x" + "01" * 32,
            "miner": "0x" + "33" * 20, "gasUsed": hex(21000),
            "gasLimit": hex(30_000_000), "baseFeePerGas": None,
            "transactions": [b2_tx]},
    }
    receipts = {
        b1_tx["hash"]: {"logs": [
            {"transactionHash": b1_tx["hash"], "logIndex": hex(0),
             "address": "0x" + "44" * 20,
             "topics": [ERC20_TRANSFER_TOPIC,
                        "0x" + "00" * 12 + "11" * 20,
                        "0x" + "00" * 12 + "22" * 20],
             "data": "0x" + format(5 * E18, "064x")},
            {"transactionHash": b1_tx["hash"], "logIndex": hex(1),
             "address": "0x" + "55" * 20,
             "topics": ["0x" + "99" * 32],
             "data": "0x01"},
        ]},
        b2_tx["hash"]: {"logs": []},
    }
    return blocks, receipts


class _FakeNode(BaseHTTPRequestHandler):
    blocks: dict
    receipts: dict
    fail_next: list  # mutable counter box: [n] -> fail the next n requests

    def do_POST(self):  # noqa: N802 (http.server API)
        if self.fail_next[0] > 0:
            self.fail_next[0] -= 1
            self.send_response(500)
            self.end_headers()
            return
        req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        method, params = req["method"], req["params"]
        if method == "eth_blockNumber":
            result = hex(max(self.blocks))
        elif method == "eth_getBlockByNumber":
            result = self.blocks[int(params[0], 16)]
        elif method == "eth_getTransactionReceipt":
            result = self.receipts[params[0]]
        else:
            body = json.dumps({"jsonrpc": "2.0", "id": req["id"],
                               "error": {"code": -32601,
                                         "message": "method not found"}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        body = json.dumps({"jsonrpc": "2.0", "id": req["id"],
                           "result": result}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture()
def node():
    blocks, receipts = _chain()
    handler = type("Node", (_FakeNode,), {
        "blocks": blocks, "receipts": receipts, "fail_next": [0]})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", handler
    finally:
        srv.shutdown()


def test_retry_backoff_schedule(node):
    url, handler = node
    sleeps = []
    client = JsonRpcClient(url, sleep=sleeps.append)
    handler.fail_next[0] = 2  # two 500s, then healthy
    assert client.block_number() == 2
    assert sleeps == [1.0, 2.0]          # wait_exponential(min=1) twin
    assert client.n_retries == 2

    handler.fail_next[0] = 99            # never recovers within 5 attempts
    with pytest.raises(RpcError):
        client.block_number()


def test_envelopes_match_reference_shapes(node):
    url, _ = node
    client = JsonRpcClient(url)
    block = client.get_block(1)
    receipts = {tx["hash"]: client.get_receipt(tx["hash"])
                for tx in block["transactions"]}
    msgs = [json.loads(m)
            for m in block_to_events(block, receipts, ingested_at=1.5)]
    by_type = {}
    for m in msgs:
        by_type.setdefault(m["event_type"], []).append(m)
    assert sorted(by_type) == ["block", "token_transfer", "transaction"] or \
        sorted(by_type) == ["block", "log", "token_transfer", "transaction"]
    blk = by_type["block"][0]
    assert blk["payload"]["tx_count"] == 1
    assert blk["payload"]["gas_used"] == 21000
    tx = by_type["transaction"][0]
    assert tx["payload"]["value_wei"] == str(3 * E18)
    assert tx["payload"]["input"].startswith("0xa9059cbb")
    tt = by_type["token_transfer"][0]
    assert tt["payload"]["topics"][0] == ERC20_TRANSFER_TOPIC
    assert route_topic("token_transfer") == TOPIC_TOKEN_TRANSFERS
    assert route_topic("log") == TOPIC_LOGS
    lg = by_type["log"][0]
    assert lg["payload"]["log_index"] == 1


def test_ingest_block_range_reaches_decoders(spark, node):
    url, _ = node
    client = JsonRpcClient(url)
    events = ingest_block_range(spark, client, 1, 2, ingested_at=2.0)
    counts = {r["event_type"]: r["n"] for r in
              events.groupBy("event_type").agg(
                  __import__("pyspark.sql.functions", fromlist=["count"])
                  .count("*").alias("n")).collect()}
    assert counts == {"block": 2, "transaction": 2,
                      "token_transfer": 1, "log": 1}
    # the planted ERC-20 transfer decodes through the PRODUCTION decoder
    from defi_etl_platform_sqlglot_implementation__spark.operators.transfers import (
        decode_transfers,
    )

    transfers = decode_transfers(events).collect()
    assert len(transfers) == 1
    assert transfers[0].standard == "ERC-20"
    assert transfers[0].amount == float(5 * E18)
    assert transfers[0].block_number == 1


def test_protocol_errors_do_not_retry(node):
    """A deterministic JSON-RPC error response must surface immediately —
    only transport failures burn the backoff schedule."""
    from defi_etl_platform_sqlglot_implementation__spark.sources.rpc import (
        RpcProtocolError,
    )

    url, _ = node
    sleeps = []
    client = JsonRpcClient(url, sleep=sleeps.append)
    with pytest.raises(RpcProtocolError):
        client.call("eth_bogusMethod", [])  # node answers JSON-RPC -32601
    assert sleeps == []          # zero backoff burned
    assert client.n_retries == 0
