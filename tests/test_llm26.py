"""Wave 26: ingest-transitivity gap, per-source PII inventory."""

from __future__ import annotations

import itertools
import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark import registry_llm26  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _half_away(v):
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _shingles(text):
    toks = text.split(" ")
    n = len(toks)
    return {" ".join(toks[i - 1:i + 2]) for i in range(1, max(1, n - 2) + 1)}


class TestIngestTransitivityGap:
    def test_replay_on_corpus(self, spark):
        docs = {r.doc_id: r.text
                for r in spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text").collect()}
        sh = {d: _shingles(t) for d, t in docs.items()}
        edges = []
        for a, b in itertools.combinations(sorted(docs), 2):
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union and inter / union >= 0.5:
                edges.append((a, b))
        # union-find for CC labels
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for e in edges for x in e}
        cc_flagged = {x for x in nodes if find(x) != x}
        arrival_flagged = {b for _, b in edges}
        gap = cc_flagged - arrival_flagged
        row = QUERIES["ingest_transitivity_gap"](spark, SF).collect()
        assert len(row) == 1
        r = row[0]
        assert (r.n_cc_flagged, r.n_arrival_flagged, r.n_gap) == (
            len(cc_flagged), len(arrival_flagged), len(gap))
        want_bp = (_half_away(1e4 * len(gap) / len(cc_flagged))
                   if cc_flagged else 0)
        assert r.gap_bp == want_bp

    def test_gap_is_positive_on_a_path_graph(self, spark):
        """Edges (3,9), (5,9): CC flags 5 and 9 (canonical 3), but the
        arrival reduction only flags 9 — the metric must see doc 5."""
        from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame([(3, 9), (5, 9)], ["d1", "d2"])
        cc = connected_components(pairs).withColumnRenamed("node", "doc_id")
        cc_flagged = {r.doc_id for r in
                      cc.filter(F.col("cluster_id") != F.col("doc_id"))
                      .collect()}
        arrival = {r.d2 for r in pairs.select("d2").distinct().collect()}
        assert cc_flagged == {5, 9}
        assert arrival == {9}
        assert cc_flagged - arrival == {5}          # the gap is real


class TestPiiInventory:
    EMAIL = re.compile(r"[a-z0-9._]+@[a-z0-9.]+[a-z]")
    PHONE = re.compile(r"[0-9]{3}-[0-9]{4}")
    IPV4 = re.compile(r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")
    CARD = re.compile(r"[0-9]{16}")

    @staticmethod
    def _luhn_sum(s):
        total = 0
        for i, ch in enumerate(s, start=1):       # i = 1-based from left
            d = int(ch)
            if (len(s) - i + 1) % 2 == 0:         # even pos from right
                d = 2 * d - 9 if d >= 5 else 2 * d
            total += d
        return total

    def _plant(self, doc_id, text):
        c15 = ("4" + str(doc_id % 10**7).rjust(7, "0")
               + str((doc_id * 7) % 10**7).rjust(7, "0"))
        valid = (10 - self._luhn_sum(c15 + "0") % 10) % 10
        check = valid if doc_id % 2 == 0 else (valid + 1) % 10
        card = c15 + str(check)
        raw = (f"contact user{doc_id}@example.com "
               + (f"cc admin{doc_id}@corp.net " if doc_id % 3 == 0 else "")
               + f"or call 555-{doc_id % 10000:04d}"
               + f" ip 10.{doc_id % 256}.{doc_id * 3 % 256}"
               + f".{doc_id * 5 % 256} card {card}")
        return raw, card

    def test_pure_python_replay(self, spark):
        rows = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text", "source").collect()
        agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
        for r in rows:
            raw, card = self._plant(r.doc_id, r.text)
            a = agg[r.source]
            a[0] += 1
            a[1] += len(self.EMAIL.findall(raw))
            a[2] += len(self.PHONE.findall(raw))
            a[3] += len(self.IPV4.findall(raw))
            a[4] += len(self.CARD.findall(raw))
            a[5] += 1 if self._luhn_sum(card) % 10 == 0 else 0
            a[6] += len([x for x in r.text.split(" ") if x])
        expected = {}
        for src, a in agg.items():
            items = a[1] + a[2] + a[3] + a[4]
            expected[src] = (a[0], a[1], a[2], a[3], a[4], a[5],
                             _half_away(1e7 * items / a[6]))
        got = {r.source: (r.n_docs, r.n_emails, r.n_phones, r.n_ipv4,
                          r.n_cards, r.n_cards_luhn_valid,
                          r.pii_per_kilotoken_bp)
               for r in QUERIES["pii_inventory"](spark, SF).collect()}
        assert got == expected

    def test_luhn_splits_exactly_even_ids(self, spark):
        rows = QUERIES["pii_inventory"](spark, SF).collect()
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "source").collect()
        even_by_src = defaultdict(int)
        for r in docs:
            if r.doc_id % 2 == 0:
                even_by_src[r.source] += 1
        for r in rows:
            assert r.n_cards == r.n_docs            # one card per doc
            assert r.n_cards_luhn_valid == even_by_src[r.source]
            assert r.n_emails >= r.n_docs            # 1 or 2 per doc
            assert r.n_phones == r.n_docs
            assert r.n_ipv4 == r.n_docs
