"""Smoke the end-to-end curation example (examples/training_data_pipeline)."""

import sys

from tests.conftest import REPO, SF_DIR

sys.path.insert(0, f"{REPO}/examples")


def test_curation_pipeline_end_to_end(spark, scratch):
    from training_data_pipeline import curate

    stats = curate(spark, SF_DIR, scratch, tokens_per_bin=512)
    assert stats["input_docs"] == 500
    assert 0 < stats["after_gate"] <= stats["input_docs"]
    assert stats["after_fuzzy_dedup"] <= stats["after_exact_dedup"]
    assert stats["after_decontam"] <= stats["after_fuzzy_dedup"]
    assert 0 < stats["after_mix"] <= stats["after_decontam"]
    assert stats["curated"] == stats["after_mix"]
    assert stats["bins"] >= 1
    # deterministic: same input → same counts on a rerun
    assert curate(spark, SF_DIR, scratch, tokens_per_bin=512) == stats


def test_ann_search_example(spark, scratch):
    from ann_search import build_and_probe

    stats = build_and_probe(spark, SF_DIR, scratch, n_cells=8, n_probe=2, k=3)
    assert stats["corpus_vectors"] == 500
    assert stats["partition_dirs"] == 8
    assert stats["hits"] == stats["queries"] * 3
    assert stats["pruned_scan"]


def test_product_analytics_example(spark, scratch):
    from product_analytics import build_mart

    stats = build_mart(spark, SF_DIR, scratch)
    assert stats["events"] == 1000
    assert stats["zordered_events"] == 1000  # layout preserves every row
    assert stats["funnel"]["signup"] >= stats["funnel"]["click"] >= stats[
        "funnel"
    ]["purchase"]
    assert stats["cohort_cells"] >= 1
    assert stats["rollup_rows"] > 0
    # deterministic end to end
    assert build_mart(spark, SF_DIR, scratch) == stats


def test_governed_warehouse_example(spark, scratch):
    import governed_warehouse as gw

    counts = gw.build_mart(spark, "/root/testdata/sf0.001", scratch)
    assert counts["user_state_history"] > 0
    assert counts["public_release"] == 5  # one noisy row per event type
    assert counts["nation_rank"] == 25
    # ACID landing: both batches present, version 1 = batch-1 rows only
    assert (
        0 < counts["events_acid_v1"] < counts["events_acid"]
    )
    assert all(n > 0 for n in counts.values())


def test_metrics_observability_example(spark):
    from metrics_observability import daily_close

    stats = daily_close(spark, SF_DIR)
    assert stats["grid_rows"] > 0
    assert 0 < stats["synthesized_rows"] < stats["grid_rows"]
    assert stats["weeks"] >= 1
    assert stats["p90_p50_spread_max"] > 0
    assert stats["errors_total"] > 0
    assert 0 <= stats["errors_isolated"] <= stats["errors_total"]
    # deterministic close: identical on rerun
    assert daily_close(spark, SF_DIR) == stats


def test_media_pipeline_end_to_end(spark, scratch):
    from media_pipeline import curate_media

    stats = curate_media(spark, SF_DIR, scratch)
    assert stats["input_docs"] == 500
    assert stats["decoded"] == 500
    assert stats["curated"] + stats["quarantined"] == 500
    assert stats["quarantined"] > 0  # 1-wide/1-tall fixtures exist
    assert stats["formats"] == ["bmp", "jpeg", "png"]
    assert stats["partition_dirs"] == [
        "format=bmp", "format=jpeg", "format=png"
    ]
    # deterministic across reruns
    assert curate_media(spark, SF_DIR, scratch) == stats


def test_statistical_quality_gate_example(spark):
    from statistical_quality_gate import weekly_review

    stats = weekly_review(spark, SF_DIR)
    assert stats["sources_screened"] == 20
    assert 0 < stats["worst_drift_ks"] <= 1
    assert stats["chi2_total"] >= 0
    assert 0 <= stats["auc_deviation"] <= 0.5
    assert stats["widest_ci_width"] > 0
    assert 0 < stats["bottom_half_min_share"] < 1
    assert stats["frequent_terms"] == 30
    assert stats["trend_days"] > 0
    assert 0 < stats["building_p_two"] <= 1
    # deterministic end to end (the bootstrap CI included)
    assert weekly_review(spark, SF_DIR) == stats


def test_cost_based_tuning_example(spark, scratch):
    from cost_based_tuning import tune

    stats = tune(spark, SF_DIR, scratch)
    # the star order reproduces the selectivity ranking from stats alone
    assert stats["star_order"] == ["dim_part", "dim_supp", "dim_ord"]
    assert stats["two_way_broadcast"] is True  # tiny dim at sf0.001
    assert stats["exchange_partitions"] >= 1
    # the incremental append kept stats current without a re-scan
    assert stats["rows_after"] == stats["rows_before"] + 500
    assert stats["pk_ndv_after"] > stats["pk_ndv_before"]
    assert stats["stats_stale_after_append"] is False
    assert stats["keys_flagged_lower_bound"] is True
    # the planned rewrites are semantically invisible
    assert stats["planned_rows"] == stats["plain_rows"]
