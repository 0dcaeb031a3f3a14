"""Black-box invariants of the fifth-wave analytics queries.

The oracle differential (tools/check_oracle.py) proves Spark == DuckDB;
these prove both are RIGHT: conservation identities, monotonicity, and
range bounds that hold for the underlying math regardless of data."""

import math

import pytest

from delfos_etl_pipeline_spark.queries import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return QUERIES[name](spark, sf_dir).collect()

    return run


def test_growth_accounting_conserves(q):
    rows = sorted(q("growth_accounting_weekly"), key=lambda r: r["wk"])
    prev_active = 0
    for r in rows:
        assert (
            r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        ), r
        assert r["n_churned_from_prev"] == prev_active - r["n_retained"], r
        prev_active = r["n_active"]


def test_kaplan_meier_monotone(q):
    rows = sorted(q("survival_kaplan_meier"), key=lambda r: r["t"])
    last_s, last_n = 1.0 + 1e-12, None
    for r in rows:
        # survival reaches exactly 0.0 iff the last at-risk subject
        # has the event (n == d at the final time) — legitimate
        assert 0.0 <= r["survival"] <= last_s, r
        assert r["d"] >= 1 and r["n_at_risk"] >= r["d"], r
        if last_n is not None:
            assert r["n_at_risk"] <= last_n, r
        last_s, last_n = r["survival"], r["n_at_risk"]


def test_attribution_credits_conserve(q):
    rows = q("attribution_position_based")
    total = sum(r["credit"] for r in rows)
    # each completed journey with >=1 touch distributes exactly 1.0
    # (up to the <=1e-6-per-touch ppm floor), so the grand total is an
    # integer up to rounding slack
    assert abs(total - round(total)) < 0.01, total
    assert all(r["credit"] > 0 and r["n_touches"] > 0 for r in rows)


def test_markov_rows_normalize(q):
    rows = q("markov_event_transitions")
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, prev


def test_ohlc_bounds(q):
    for r in q("ohlc_daily"):
        assert r["low"] <= r["open"] <= r["high"], r
        assert r["low"] <= r["close"] <= r["high"], r
        assert r["n_trades"] >= 1


def test_holt_forecast_recurrence(q):
    rows = q("forecast_holt_linear")
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    for rs in series.values():
        rs.sort(key=lambda r: r["di"])
        assert rs[0]["forecast"] is None
        for prev, cur in zip(rs, rs[1:]):
            # forecast_t rounds the unrounded l+b; outputs round l and b
            # separately, so allow 2 ulps of the 1e-9 grid
            assert cur["forecast"] == pytest.approx(
                prev["level"] + prev["trend"], abs=3e-9
            ), (prev, cur)


def test_theil_sen_pair_count(q):
    for r in q("trend_theil_sen"):
        # C(n_days, 2) pairs with n_days <= 31
        assert 1 <= r["n_pairs"] <= 31 * 30 // 2


def test_abc_shares_partition(q):
    rows = q("abc_pareto_parts")
    assert {r["abc_class"] for r in rows} <= {"A", "B", "C"}
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-5
    share = {r["abc_class"]: r["revenue_share"] for r in rows}
    if "A" in share:
        assert share["A"] >= share.get("B", 0.0) >= share.get("C", 0.0)


def test_fuzzy_deltas_are_single_digit_shifts(q):
    valid = {d * 10**p for d in range(1, 10) for p in range(9)}
    for r in q("er_fuzzy_blocked"):
        assert r["key_delta"] in valid, r


def test_referential_edges_complete(q):
    rows = q("dq_referential_orphans")
    assert len(rows) == 7
    for r in rows:
        assert r["n_child"] > 0 and 0 <= r["n_orphans"] <= r["n_child"], r


def test_silhouette_range(q):
    for r in q("emb_silhouette_centroid"):
        assert -1.0 <= r["silhouette"] <= 1.0, r


def test_class_balance_exact(q):
    rows = q("sample_class_balance")
    counts = {}
    for r in rows:
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    assert len(set(counts.values())) == 1, counts


def test_recall_evals_bounded(q):
    (lsh,) = q("dedup_lsh_recall_eval")
    assert 0 <= lsh["n_hit"] <= lsh["n_true"]
    assert 0.0 <= lsh["recall"] <= 1.0
    (ivf,) = q("sim_ivf_recall_eval")
    assert 0 <= ivf["n_hit"] <= ivf["k"] == 10
    assert 0.0 <= ivf["recall_at_10"] <= 1.0


def test_simpson_diversity_range(q):
    for r in q("text_simpson_diversity"):
        assert 0.0 <= r["simpson_repeat"] <= 1.0, r
        assert abs(r["simpson_repeat"] + r["diversity"] - 1.0) <= 2e-6, r
        assert 1 <= r["n_distinct"] <= r["n"]


def test_seqpat_support_bounds(q, spark, sf_dir):
    from delfos_etl_pipeline_spark.sources.parquet import load_table

    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    rows = q("seqpat_followed_by")
    for r in rows:
        assert 1 <= r["support"] <= n_users, r
        assert r["t_first"] != r["t_then"]


def test_recsys_rank_and_range(q):
    rows = q("recsys_item_cosine")
    for r in rows:
        assert 1 <= r["rk"] <= 3 and r["c_pair"] >= 2, r
        assert 0.0 < r["cosine"] <= 1.0, r
