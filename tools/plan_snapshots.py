"""Regenerate PLANS.md — formatted physical plans for the headline queries.

Plan shape is the stable scale signal (wall-clock samples wobble; the
exchange/join/aggregate structure is what survives a 100x scale-up), so the
headline plans are checked in for review. Regenerate after any operator
change: python tools/plan_snapshots.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.plans.inspect import formatted_plan
from lakehouse_architecture_spark.queries.registry import ALL_QUERIES
from lakehouse_architecture_spark.session import SessionFactory

QUERIES = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q18_large_orders",
    "q21_sole_late",
    "q_asof_join",
    "q_minhash_lsh",
    "q_simhash",
    "q_ngram_jaccard",
    "q_dup_spans",
    "q_embedding_knn",
    "q_semdedup",
    "q_dsir_score",
    "q_sessionize",
    "q_funnel",
    "q_corpus_curation",
    "q_equidepth_bins",
    "q_pmi_collocations",
    "q_source_overlap",
    "q_ks_drift",
    "q_vocab_coverage",
    "q_dq_summary",
    "q_pq_knn",
    "q_triangles",
    "q_kaplan_meier",
    "q_multi_touch",
    "q_ab_test",
    # round-4 representatives
    "q_gini",
    "q_global_rank",
    "q_catalog_pruned",
    "q_interval_join",
    "q_std_scale",
    "q_cooccur_cosine",
    "q_pareto_8020",
    "q_degree_dist",
    "q_levenshtein_block",
    "q_sax",
    # round 10: the r9-reshaped embedding/correlation family is now
    # bench-tracked (VERDICT r9 #1) — snapshot its plans so a shape
    # regression (e.g. moments reverting to per-batch dim² shuffle rows)
    # shows up as a PLANS.md diff, not just a bench drift
    "q_emb_cov",
    "q_corr_matrix",
    # q_pca_whiten retired from the registry (round 14, VERDICT r13 #5)
    "q_whiten_invariants",
    # round 11: the new bench-tracked OPH signature path plus the closure
    # family's representative — their shapes (one shingle aggregate feeding
    # a cached signature relation; log-round self-joins) are the scale
    # contract
    "q_oph_minhash",
    "q_adamic_adar",
    "q_bootstrap_ci",
    "q_weighted_median",
    "q_ngram_novelty",
    # round 12 (VERDICT r11 #6): the rest of the round-11 block, so the
    # snapshot guard can prove every one of its shapes stable — plus the
    # two round-12 additions (capped AA, grouped bootstrap)
    "q_seasonal_decompose",
    "q_tree_closure",
    "q_ri_orphans",
    "q_theil_sen",
    "q_mann_kendall",
    "q_psi_drift",
    "q_negative_sample",
    "q_neyman_alloc",
    "q_rendezvous_shards",
    "q_evt_maxima",
    "q_partition_pruned_xform",
    "q_adamic_adar_capped",
    "q_bootstrap_grouped",
    # round-12 depth block
    "q_kcore",
    "q_diff_audit",
    "q_cuped",
    "q_diff_in_diff",
    "q_calibration",
    "q_nelson_aalen",
    "q_compaction",
    "q_shapley_attr",
    # round-12 closing block
    "q_spearman",
    "q_burstiness",
    "q_entropy_rate",
    "q_woe_iv",
    "q_funnel_ttc",
    # round-13 block: the nonparametric/association tail, experiment
    # pre-flight checks, and concentration measures — each shape is a
    # corpus pass collapsing to a bounded-cardinality derivative (distinct
    # values, r×c cells, |groups|/deciles) with decimal folds on top
    "q_kendall_tau",
    "q_mann_whitney",
    "q_ks_exact",
    "q_cramers_v",
    "q_hhi",
    "q_jsd_sources",
    "q_next_event",
    "q_smd_balance",
    "q_srm_check",
    "q_theil_index",
    "q_lorenz",
    "q_cohens_kappa",
    # round-14 block: distribution distances, labeler QA beyond kappa,
    # experiment power legs, tail/vocabulary calibration — same
    # bounded-derivative discipline; q_wasserstein adds the bucket-local
    # successor handoff to the rank family's shape
    "q_wasserstein",
    "q_ks_pvalue",
    "q_gwet_ac1",
    "q_bhattacharyya",
    "q_chao1",
    "q_log_odds",
    "q_tost",
    "q_power_mde",
    "q_hill_tail",
    "q_ewma_daily",
]

HEADER = """# Headline query plans (generated — do not hand-edit)

`tools/plan_snapshots.py` output at sf0.001, engine session confs.
What to look for, per the design rules: dimension sides behind
`BroadcastExchange`; filters in `PushedFilters`; aggregates as paired
partial/final `HashAggregate` (map-side combine); no `CartesianProduct`;
`Exchange` nodes only on intended keys.

`InMemoryRelation` wrapping a small aggregate = a
`materialize.materialize_small` intermediate (round 7: persist
MEMORY_AND_DISK by default — exact_quantiles' counts/brackets,
triangle_stats' edge/degree/orient tables): its lineage populates the
cache at most ONCE and every reference reads cached rows — the
cluster-safe successor to round 6's lazy localCheckpoint (which printed
as `Scan ExistingRDD`; that shape still appears where lineage truncation
is the point — iterative loops, sampled centroids — via
`materialize.truncate_lineage`). Multi-referenced subtrees no longer
re-scan their inputs per reference (tools/scan_audit.py is the
regression check).
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SessionFactory(app_name="plan_snapshots").get_or_create()
    out = [HEADER]
    for name in QUERIES:
        df = ALL_QUERIES[name].build(spark, sf_dir)
        plan = formatted_plan(df)
        # keep the tree, drop the verbose per-node details section — the
        # shape is the signal and the details churn with expr ids
        tree = plan.split("\n\n")[0]
        out.append(f"## {name}\n\n```\n{tree}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(QUERIES)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
