"""Wave 38: covariance power iteration + quality-filter Venn."""

from __future__ import annotations

import numpy as np
import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark import registry_llm5  # noqa: F401 — fills QUERIES (gopher)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm27  # noqa: F401 — fills QUERIES (ccnet)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm35  # noqa: F401 — fills QUERIES (blocklist)
from defi_etl_platform_sqlglot_implementation__spark import registry_llm37  # noqa: F401 — fills QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry import QUERIES
from defi_etl_platform_sqlglot_implementation__spark.registry_llm37 import (
    _PI_STEPS,
    _V_SCALE,
)

SF = "/root/testdata/sf0.001"


def _py_power_iteration(q_int, steps=_PI_STEPS, scale=_V_SCALE):
    """The exact integer fold both engines implement, in pure Python."""
    n, d = q_int.shape
    si = q_int.sum(axis=0)
    C = n * (q_int.T @ q_int) - np.outer(si, si)
    v = np.array([scale] * d, dtype=object)
    out = []
    for _ in range(steps):
        w = C @ v
        m = max(max(abs(int(x)) for x in w), 1)
        v = np.array([(1 if int(x) >= 0 else -1)
                      * ((abs(int(x)) * scale) // m) for x in w],
                     dtype=object)
        out.append([int(x) for x in v])
    return out


def _planted_q(vec_ids, d=64):
    """The _PERTURB sub-population in pure Python — replays the gate's
    deterministic construction."""
    from defi_etl_platform_sqlglot_implementation__spark.registry_llm37 import (
        _PLANT_AMP, _PLANT_MOD, _PLANT_SIGN_MOD)
    rows = []
    for vid in vec_ids:
        if vid % _PLANT_MOD == 0:
            c = 2 if vid % _PLANT_SIGN_MOD == 0 else -2
            rows.append([c * (1 + (j % 3)) * _PLANT_AMP for j in range(d)])
    return rows


class TestCovariancePowerIteration:
    def test_exact_integer_replay(self, spark):
        df = pd.read_parquet(f"{SF}/embeddings.parquet")
        X = np.array([np.array(e, dtype=np.float64) for e in df.embedding])
        q_int = np.vectorize(int)(np.round(X * 1000).astype(object))
        all_rows = QUERIES["covariance_power_iteration"](spark, SF).collect()
        for pop, q in (
            ("corpus", q_int),
            ("perturbed", np.array(
                list(q_int) + _planted_q(df.vec_id.tolist()),
                dtype=object)),
        ):
            exp = _py_power_iteration(q)
            got = sorted((r for r in all_rows if r.population == pop),
                         key=lambda r: r.dim)
            assert [r.v1 for r in got] == exp[0], pop
            assert [r.v2 for r in got] == exp[1], pop
            assert [r.v3 for r in got] == exp[2], pop
            for r in got:
                assert -_V_SCALE <= r.v1 <= _V_SCALE
            assert max(abs(r.v3) for r in got) == _V_SCALE  # renormalized

    def test_perturbed_population_aligns_to_planted_direction(self, spark):
        """VERDICT r9 #3 done criterion: the GATE's perturbed population
        demonstrates 3-step convergence — |cos| > 0.9 (8100 bp cos²)
        against the planted direction, measured INSIDE the gate output —
        while the flat corpus population stays visibly below it (the gap
        between the two rows is the evidence)."""
        rows = QUERIES["covariance_power_iteration"](spark, SF).collect()
        by_pop = {}
        for r in rows:
            by_pop.setdefault(r.population, set()).add(r.align_cos2_bp)
        # align is population-constant
        assert all(len(v) == 1 for v in by_pop.values())
        pert = by_pop["perturbed"].pop()
        corp = by_pop["corpus"].pop()
        assert pert > 8100          # |cos| > 0.9 — converged to the plant
        assert pert > corp          # the spectral-gap signature
        # replay the integer rational from the returned v3
        v3 = {r.dim: r.v3 for r in rows if r.population == "perturbed"}
        dot = sum(v * (1 + i % 3) for i, v in v3.items())
        n3 = sum(v * v for v in v3.values())
        nd = sum((1 + i % 3) ** 2 for i in v3)
        assert pert == (dot * dot * 10000) // (n3 * nd)

    def test_converges_under_spectral_gap(self):
        """On an ANISOTROPIC population (planted dominant direction) the
        same 3-step integer fold aligns with the top eigenvector — the
        operator finds the component when a gap exists (the driver
        corpus is flat-spectrum, documented in the gate)."""
        rng = np.random.RandomState(7)
        d, n = 16, 400
        direction = rng.randn(d)
        direction /= np.linalg.norm(direction)
        X = (rng.randn(n, 1) * 5.0) @ direction[None, :] \
            + 0.3 * rng.randn(n, d)
        q_int = np.vectorize(int)(np.round(X * 1000).astype(object))
        v3 = np.array(_py_power_iteration(q_int)[-1], dtype=np.float64)
        v3 /= np.linalg.norm(v3)
        assert abs(float(v3 @ direction)) > 0.99


class TestQualityFilterVenn:
    def test_marginals_agree_with_standalone_gates(self, spark):
        venn = QUERIES["quality_filter_venn"](spark, SF).toPandas()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        assert venn.n_docs.sum() == len(docs)
        # gopher marginal
        gopher = QUERIES["gopher_quality_flags"](spark, SF).toPandas()
        assert venn[venn.gopher_reject == 1].n_docs.sum() \
            == (gopher.keep == 0).sum()
        # blocklist marginal
        bl = QUERIES["blocklist_screening_report"](spark, SF).toPandas()
        assert venn[venn.blocklist_hit == 1].n_docs.sum() \
            == bl.n_any_hit.sum()
        # ccnet tail marginal
        cc = QUERIES["ccnet_perplexity_buckets"](spark, SF).toPandas()
        assert venn[venn.ccnet_tail == 1].n_docs.sum() \
            == cc[cc.bucket == 3].n_docs.sum()

    def test_share_arithmetic(self, spark):
        venn = QUERIES["quality_filter_venn"](spark, SF).toPandas()
        total = venn.n_docs.sum()
        for r in venn.itertuples(index=False):
            assert r.share_bp == round(1e4 * r.n_docs / total)
            assert r.gopher_reject in (0, 1)
            assert r.blocklist_hit in (0, 1)
            assert r.ccnet_tail in (0, 1)
