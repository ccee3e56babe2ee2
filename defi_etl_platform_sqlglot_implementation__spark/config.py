"""YAML deployment config, mirroring the reference's config surface.

The reference ships ``config/config.example.yaml`` (reference
config/config.example.yaml:1-22: network name / chain id / RPC URL /
poll interval, Kafka bootstrap + the four topic names, the ETL target
dialect, a warehouse DB URL) but never actually loads it — every
reference component takes constructor arguments. This engine keeps the
constructor-argument style for the same components (JsonRpcClient,
kafka_source/kafka_sink, transpile) and adds the loader a user porting
the reference's deployment would look for: :func:`load_config` reads the
YAML into typed, validated dataclasses whose adapter methods hand the
values to the right Spark-side parameter.

Validation is LOUD: unknown keys inside a known section raise (catching
``pol_interval_seconds``-style typos silently defaulting), as do an
unsupported target dialect or a non-positive poll interval.

PyYAML is import-gated per the environment contract; a minimal
indentation-based parser (sufficient for the reference schema — nested
string/number maps, comments, quoted scalars) takes over when the
library is absent, so the loader works in stripped containers too.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

# reference kafka_producer.py:24-27 topic constants = our defaults
_DEFAULT_TOPICS = {
    "blocks": "blockchain.blocks.raw",
    "transactions": "blockchain.transactions.raw",
    "logs": "blockchain.logs.raw",
    "token_transfers": "blockchain.token_transfers.raw",
}


class ConfigError(ValueError):
    """Raised for malformed, unknown, or out-of-contract config values."""


# ---------------------------------------------------------------------------
# minimal YAML subset parser (fallback when PyYAML is absent)
# ---------------------------------------------------------------------------

def _coerce_scalar(s: str) -> Any:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "~", ""):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _strip_comment(line: str) -> str:
    """Drop a trailing ``# ...`` comment that is not inside quotes."""
    out = []
    quote = None
    for ch in line:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            out.append(ch)
        elif ch == "#":
            break
        else:
            out.append(ch)
    return "".join(out).rstrip()


def _parse_minimal_yaml(text: str) -> dict:
    """Indentation-nested ``key: value`` maps — the subset the reference
    example uses. No sequences, anchors, or multi-line scalars."""
    root: dict = {}
    # (indent, mapping) stack; parents of the current line's container
    stack: list[tuple[int, dict]] = [(-1, root)]
    for raw in text.splitlines():
        line = _strip_comment(raw)
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip(" "))
        key, sep, value = line.strip().partition(":")
        if not sep:
            raise ConfigError(f"cannot parse config line: {raw!r}")
        while stack and indent <= stack[-1][0]:
            stack.pop()
        if not stack:
            raise ConfigError(f"bad indentation at: {raw!r}")
        container = stack[-1][1]
        if value.strip() == "":
            child: dict = {}
            container[key.strip()] = child
            stack.append((indent, child))
        else:
            container[key.strip()] = _coerce_scalar(value)
    return root


def _load_yaml_text(text: str) -> dict:
    # the reference example file starts with stray markdown backticks
    # ("``# config/config.example.yaml") — tolerate that exact artifact
    text = text.lstrip("`")
    try:
        import yaml  # type: ignore
    except ImportError:
        return _parse_minimal_yaml(text)
    data = yaml.safe_load(text)
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ConfigError("config root must be a mapping")
    return data


# ---------------------------------------------------------------------------
# typed config
# ---------------------------------------------------------------------------

def _take(section: dict, name: str, known: dict[str, Any]) -> dict:
    """Validate ``section`` against the known-key/default map, LOUDLY
    rejecting unknown keys (typos must not silently fall back to
    defaults). Returns the merged values."""
    if section is None:
        # a bare `section:` line: PyYAML yields None where the minimal
        # parser yields {} — normalize so the same file loads identically
        # (all defaults) regardless of which parser happened to run
        section = {}
    if not isinstance(section, dict):
        raise ConfigError(f"config section {name!r} must be a mapping")
    unknown = set(section) - set(known)
    if unknown:
        raise ConfigError(
            f"unknown key(s) {sorted(unknown)} in config section {name!r}; "
            f"known keys: {sorted(known)}")
    return {**known, **section}


@dataclass(frozen=True)
class NetworkConfig:
    name: str = "ethereum-mainnet"
    chain_id: int = 1
    rpc_url: str = ""
    poll_interval_seconds: float = 2.0


@dataclass(frozen=True)
class KafkaConfig:
    bootstrap_servers: str = "localhost:9092"
    topics: dict = field(default_factory=lambda: dict(_DEFAULT_TOPICS))

    def subscribe_pattern(self) -> str:
        """Regex matching exactly the configured topics — the
        ``subscribePattern`` for ``pipeline.kafka_source``."""
        return "|".join(re.escape(t) for t in sorted(self.topics.values()))


@dataclass(frozen=True)
class EtlConfig:
    target_dialect: str = "postgres"


@dataclass(frozen=True)
class DatabaseConfig:
    url: str = ""


@dataclass(frozen=True)
class AppConfig:
    network: NetworkConfig = field(default_factory=NetworkConfig)
    kafka: KafkaConfig = field(default_factory=KafkaConfig)
    etl: EtlConfig = field(default_factory=EtlConfig)
    database: DatabaseConfig = field(default_factory=DatabaseConfig)

    # -- adapters onto the engine's parameter surfaces ------------------

    def rpc_client(self, **kw):
        """reference rpc_url + retry policy -> sources.rpc.JsonRpcClient."""
        from .sources.rpc import JsonRpcClient

        return JsonRpcClient(self.network.rpc_url, **kw)

    def kafka_reader(self, spark, **kw):
        """bootstrap_servers + configured topics -> streaming source."""
        from .streaming.pipeline import kafka_source

        kw.setdefault("subscribe_pattern", self.kafka.subscribe_pattern())
        return kafka_source(spark, self.kafka.bootstrap_servers, **kw)

    def kafka_writer(self, df, checkpoint_dir: str, **kw):
        """bootstrap_servers + poll cadence -> streaming sink (the
        reference's poll_interval_seconds becomes the processingTime
        trigger, the same mapping pipeline.kafka_sink documents)."""
        from .streaming.pipeline import kafka_sink

        kw.setdefault("trigger_seconds", self.network.poll_interval_seconds)
        return kafka_sink(df, self.kafka.bootstrap_servers,
                          checkpoint_dir, **kw)

    def transpile(self, sql: str) -> str:
        """Canonical Spark-dialect SQL -> the configured warehouse
        dialect (plans.transpiler; the reference's target_dialect knob,
        etl_pipeline.py:299-327)."""
        from .plans.transpiler import transpile

        return transpile(sql, self.etl.target_dialect)


def load_config(path: str | Path) -> AppConfig:
    """Read + validate a reference-shaped YAML config file."""
    data = _load_yaml_text(Path(path).read_text())
    if not isinstance(data, dict):
        raise ConfigError("config root must be a mapping")
    unknown = set(data) - {"network", "kafka", "etl", "database"}
    if unknown:
        raise ConfigError(f"unknown config section(s): {sorted(unknown)}")

    net = _take(data.get("network", {}), "network", {
        "name": "ethereum-mainnet", "chain_id": 1, "rpc_url": "",
        "poll_interval_seconds": 2.0})
    if not isinstance(net["chain_id"], int):
        raise ConfigError("network.chain_id must be an integer")
    if not isinstance(net["poll_interval_seconds"], (int, float)) \
            or net["poll_interval_seconds"] <= 0:
        raise ConfigError("network.poll_interval_seconds must be > 0")

    kaf = _take(data.get("kafka", {}), "kafka", {
        "bootstrap_servers": "localhost:9092",
        "topics": dict(_DEFAULT_TOPICS)})
    topics = _take(kaf["topics"], "kafka.topics", dict(_DEFAULT_TOPICS))
    if not all(isinstance(v, str) and v for v in topics.values()):
        raise ConfigError("kafka.topics values must be non-empty strings")

    etl = _take(data.get("etl", {}), "etl", {"target_dialect": "postgres"})
    from .plans.transpiler import DIALECTS

    if etl["target_dialect"] not in DIALECTS:
        raise ConfigError(
            f"etl.target_dialect {etl['target_dialect']!r} not supported; "
            f"choose one of {sorted(DIALECTS)}")

    db = _take(data.get("database", {}), "database", {"url": ""})

    return AppConfig(
        network=NetworkConfig(
            name=str(net["name"]), chain_id=net["chain_id"],
            rpc_url=str(net["rpc_url"]),
            poll_interval_seconds=float(net["poll_interval_seconds"])),
        kafka=KafkaConfig(bootstrap_servers=str(kaf["bootstrap_servers"]),
                          topics=topics),
        etl=EtlConfig(target_dialect=etl["target_dialect"]),
        database=DatabaseConfig(url=str(db["url"])),
    )
