"""Generate PLANS.md: per-headline-query physical-plan characteristics.

The numbers the 100-TB review actually asks about — how many
exchanges (shuffles), which joins broadcast vs sort-merge, any Python
in the plan, whole-stage-codegen coverage, pushed filters — extracted
from `.explain("formatted")` for every bench headline query plus the
round's notable additions.

Usage: python tools/plan_report.py [sf_dir]   (default sf0.001 — plan
shapes don't depend on SF; AQE runtime re-plans are noted separately)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg_etl_spark.plans import physical_plan  # noqa: E402
from kg_etl_spark.queries import QUERIES  # noqa: E402
from kg_etl_spark.session import get_spark  # noqa: E402

REPORT_QUERIES = [
    "pricing_summary", "multi_hop_revenue", "topk_per_group", "zscore_bucket",
    "blocked_spatial_pairs", "nearest_supplier", "spatial_components",
    "er_canonical", "exact_dedup", "ngram_jaccard_dedup", "minhash_lsh_dedup",
    "embedding_topk", "embedding_neardup", "media_features", "sessionize",
    "line_dedup", "pack_sequences", "quantize_embeddings", "blamed_suppliers",
    "nation_pair_trade", "product_profit", "idle_rich_customers",
    "chunk_documents", "shard_manifest", "dataset_mixture", "ngram_contamination",
    "incremental_rollup", "morton_cells", "dataset_card", "filter_funnel",
    "training_pipeline_e2e", "training_pipeline_tokenized_e2e",
    "expectations_lineitem", "promo_revenue_share",
    "disjunctive_revenue", "priority_shipping_buckets", "forecast_revenue",
    "returned_item_customers", "negative_samples", "geohash_cells", "sql_window_rank",
    "bloom_contamination", "unigram_surprisal", "semantic_dedup",
    "cheapest_supplier_per_part", "market_share", "important_parts",
    "custdist", "supplier_part_counts", "overstock_suppliers",
    "curriculum_manifest", "grouped_numeric_profile", "dsir_weights",
    "gopher_quality", "c4_line_filter", "dup_span_flags", "source_cap",
    "surprisal_buckets", "hybrid_rrf_search",
    "cms_heavy_hitters", "hll_distinct_users", "jl_projection",
    "bpe_encode_chars", "k_anonymity", "k_anonymity_suppress",
    "html_strip_urls", "dedup_eval", "incremental_dedup",
    "temperature_mixture", "quarantine_split", "psi_drift",
    "snapshot_diff", "clustering_coefficient", "hll_overlap",
    "variant_props_stats", "time_weighted_avg", "last_touch_attribution",
    "changepoint_scores", "mmr_relevance_boundary",
    "copurchase_pairs", "association_rules", "personalized_pagerank",
    "dbscan_lite", "lang_mix_divergence", "revenue_concentration",
    "forget_cascade", "weekday_seasonal_anomaly", "bigram_surprisal",
    "minhash_incremental_recall", "weighted_sssp", "token_pmi",
    "chi_square_priority_status", "holt_forecast",
    "quantile_normalize_chars", "pareto_orders", "harmonic_centrality",
    "ngram_jaccard_prefix", "cms_join_size", "cdc_apply_balance",
    "ols_trend", "monge_elkan_links", "scd2_point_in_time",
    "pq_ann_topk", "kcenter_select", "interval_overlap", "delta_join_view",
    "epoch_shuffle", "qdigest_exact_state", "qdigest_quantile_bound",
    "feature_propagation",
    "window_distribution", "priority_intersect", "activity_streaks",
    "grouping_sets_profile", "modal_segment_per_nation",
    "linear_interpolate", "char_entropy", "scc_planted_recall",
    "rolling_correlation", "topk_with_ties", "cumulative_distinct_users",
    "hierarchy_rollup", "walk_corpus", "woe_binning", "target_encode_loo",
    "sequence_pattern_match", "kaplan_meier_retention",
    "mis_planted_recall", "isotonic_planted_recall", "l_diversity_audit",
    "dp_noisy_counts", "merge_upsert_delete",
    "distribution_moments", "ks_two_sample", "welch_t_test", "ewma_final",
    "benford_audit", "stock_running_floor",
    "ab_test_proportions", "autocorrelation", "temporal_reachability",
    "sql_correlated_scalars",
    "revenue_gini", "rfm_segments", "cohort_ltv", "lorenz_curve",
    "node2vec_corpus", "multi_touch_attribution", "markov_stationary",
    "fellegi_sunter_em", "betweenness_sampled", "hits_scores",
    "pca_power_top",
    "ktruss_planted_recall", "modularity_nations", "salted_status_join",
    "item_cosine", "readability_scores",
    # round 5: classical-ML family + spectral bisection
    "naive_bayes_segment", "decision_stump", "conformal_spend_bound",
    "spectral_split_users", "absorbing_steps", "huber_location",
    "apriori_triples", "degree_assortativity", "four_cycle_count", "ols2_spend",
    "roc_auc_price", "cohens_kappa", "mutual_info_features", "theil_sen_trend",
    "user_link_prediction", "louvain_move_scan", "sequential_patterns",
    "propensity_matching", "cluster_quality_db", "brier_reliability",
    "winnowing_dedup", "winnowing_identical_recall", "matryoshka_recall",
    "spearman_balance_spend", "kruskal_wallis_spend", "exact_global_quantiles",
    "walk_skipgram_pmi", "span_corruption_plan", "sage_sampling_plan",
    "loo_group_influence", "forecast_backtest", "interarrival_stats",
    "gnn_prep_manifest", "negative_edge_samples", "bootstrap_ci_mean",
    "cmh_odds_ratio", "cuped_adjustment", "simpsons_audit",
    # round 6: adjacent-device consumers + new analytics
    "global_type_transitions", "containment_dedup", "bh_fdr_nations",
    "cv_fold_metrics", "mann_kendall_trend", "ipw_ate",
    "weighted_priority_sample", "nelson_aalen_hazard",
    "diff_in_differences", "source_js_divergence", "cusum_drift",
    "lateness_audit", "edge_jaccard_features", "snm_links",
    # round 7: corpus diagnostics
    "event_gap_quantiles", "heavy_key_profile", "equidepth_histogram",
    "zipf_tail_fit", "type_burstiness",
    # round 8: substring-dedup excision + dup-cluster canonicalization
    "remove_dup_spans", "doc_dup_groups",
    # round 9: longest-duplicated-run curation profile, adjacent-bigram
    # PMI collocations, span-DF histogram
    "dup_span_profile", "pmi_collocations", "span_df_histogram",
    # round 10: CDC chunking, split leakage, LM eval, Heaps' curve, MW-U
    "cdc_chunk_stats", "split_leakage_audit", "split_lm_eval",
    "vocab_growth_curve", "mann_whitney_u", "sprt_conversion",
    "trimmed_mean_segment", "rdd_effect", "markov_top1_accuracy",
    "filter_yield_curve", "dup_span_source_attribution",
    "unigram_lm_char_boundary",
    "t_closeness_audit",
    "anova_oneway_balance", "brown_forsythe_balance", "kendall_tau_daily",
    "friedman_priority_months", "token_budget_unimax",
    "dedup_threshold_curve", "cramers_v_segment_nation",
    "ngram_novelty_curve", "dup_cluster_size_histogram",
    "source_overlap_matrix", "log_rank_test",
    "anderson_darling_two_sample", "holm_bonferroni_nations",
    "durbin_watson_daily",
]


def _nodes(plan: str, op: str) -> int:
    """Count distinct plan nodes of an operator: formatted explain
    prints each node once in the tree ('Op (7)') and once in the detail
    section ('(7) Op'); counting unique ids avoids double-counting."""
    return len(set(re.findall(r"\((\d+)\) " + op, plan)))


def summarize(plan: str) -> dict[str, object]:
    py = sum(
        _nodes(plan, op)
        for op in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                   "MapInPandas", "FlatMapGroupsInPandasWithState")
    )
    return {
        "exchanges": _nodes(plan, "Exchange"),
        "bhj": _nodes(plan, "BroadcastHashJoin"),
        "smj": _nodes(plan, "SortMergeJoin"),
        "python": py,
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        # per-scan: any scan with a non-empty pushed-filter list counts
        # (a dim scan's empty list must not mask the fact scan's pushdown)
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
        "cartesian": "YES" if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) else "-",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_report")
    lines = [
        "# PLANS — physical-plan characteristics per headline query",
        "",
        f"Generated by `tools/plan_report.py` at `{sf_dir}` "
        "(plan *shapes*; AQE further coalesces partitions and converts "
        "eligible sort-merge joins to broadcast at runtime).",
        "",
        "Columns: shuffles = `Exchange` nodes; BHJ/SMJ = broadcast-hash vs "
        "sort-merge joins; py = Python/Pandas eval nodes (vectorized UDFs "
        "only, never row-at-a-time); wscg = distinct WholeStageCodegen "
        "subtrees as printed in the STATIC formatted plan (AQE-replanned "
        "subtrees often print no codegen ids until runtime, so 0 here does "
        "not mean interpreted execution); pushed = parquet-pushed filters "
        "present; cart = cartesian or nested-loop joins.",
        "",
        "`cart = YES` appears exactly where it is the intended plan: "
        "`embedding_topk` broadcasts the tiny query set against the corpus "
        "(the corpus never shuffles), `idle_rich_customers` joins a "
        "1-row broadcast scalar threshold, `negative_samples` joins "
        "the small broadcast anchor set non-equi against candidates, "
        "`hybrid_rrf_search` inherits BM25's 1-row corpus-stat broadcast, "
        "`hll_overlap` combines three 1-row sketch estimates, "
        "`association_rules` joins the 1-row total-orders scalar, "
        "`mmr_relevance_boundary` broadcasts the tiny query set like "
        "`embedding_topk`, `forget_cascade` crosses its three "
        "1-row count aggregates into the 3-row audit, and "
        "`chi_square_priority_status` crosses the 1-row (n, dof) "
        "aggregate into the |A|×|B|-cell grid, `cms_join_size` "
        "crosses its 1-row exact-count twin into the 1-row estimate, "
        "`woe_binning` crosses the 1-row (tp, tn) totals into the "
        "10-row bin table, and `kaplan_meier_retention` crosses the "
        "1-row max-day censoring threshold into the per-user frame, "
        "as do the statistics/audit 1-row total crosses "
        "(`ks_two_sample`, `welch_t_test`, `benford_audit`), and "
        "`hits_scores` crosses its 1-row exact hub/auth totals into "
        "the per-node share projection, `mutual_info_features` crosses "
        "each feature's 1-row total into its ≤50-cell contingency "
        "table, `louvain_move_scan` crosses the 1-row 2m scalar "
        "into the per-node move frame, `matryoshka_recall` broadcasts "
        "its tiny query set twice like `embedding_topk`, and "
        "`kruskal_wallis_spend` crosses the 1-row tie-term scalar, as do "
        "the newer 1-row scalar crosses (`loo_group_influence`, "
        "`exact_global_quantiles`, `heavy_key_profile`'s 1-row "
        "total-count share attach, `pmi_collocations`'s 1-row "
        "unigram/bigram totals cross, `split_lm_eval`'s 1-row "
        "train-LM constants cross, `vocab_growth_curve`'s 1-row "
        "max-doc-id cross, `sprt_conversion`'s 1-row "
        "crossing-aggregate cross, and `rdd_effect`'s 1-row "
        "right-side-fit cross). "
        "Every pair-generating operator (blocking/LSH/ER) is plan-asserted "
        "cartesian-free in `tests/test_plans.py`.",
        "",
        "**The scale-device constant, pinned (round 7, quiet box: "
        "start load 1.52 / end 1.42, min of 3, control query "
        "`gopher_quality` at its baseline 0.22 s):** consumers of the "
        "r6 adjacent/rank devices carry a fixed per-invocation cost at "
        "sf0.1 — the bounds/skew-probe aggregates plus one extra "
        "broadcast-side job vs the single-stage plain window they "
        "replaced (the window form is a single-task n/|groups| sort at "
        "scale; the device is 2–5× faster at 50M rows, "
        "tools/stress_adjacent.py). Pinned: `theil_sen_trend` 0.85 s "
        "(r5 plain-window 0.33; 0.60–0.64 s after cutting the "
        "pair-frame recompute), `hits_scores` 1.68 s (r5 0.88; "
        "1.34–1.39 s after the round-7 struct-key form, measured "
        "under 1.2–1.4× control inflation, so the true value is "
        "lower), `louvain_move_scan` 1.28 s (r5 0.71; 0.88–1.11 s "
        "post-fix under the same inflation), `spectral_split_users` "
        "3.05 s (r5 2.52, within the 1.2× bar). A same-process A/B "
        "of the device itself at sf0.1 (transition-edge derivation, "
        "min of 3): r6 string-key 0.78 s vs round-7 struct-key "
        "0.69 s — the hardening did not add a constant. The residual "
        "~0.3–0.8 s per query is job-scheduling constant (3–6 jobs vs "
        "1), not data volume — it is flat in n while the single-task "
        "sort it replaces grows linearly.",
        "",
        "**Round-8 bench environment + the r7 watch items closed:** "
        "this round's box runs ~1.2–1.7× slower per-core than r7's "
        "(map-side controls at load-gate-passed runs: `gopher_quality` "
        "0.26–0.32 vs 0.217, `exact_dedup` 0.23–0.26 vs 0.189, "
        "`char_entropy` 0.18–0.25 vs 0.146, and run-to-run swings up "
        "to 2× on 50M probes) — deflate cross-round ratios by the "
        "control ratio before reading them. The five r7 ≥1.25× watch "
        "items on the round's best full bench, RAW vs r7 (no deflation "
        "needed): `nearest_supplier` 0.93, `spatial_components` 1.13, "
        "`roc_auc_price` 0.98, `walk_corpus` 0.59, "
        "`ngram_jaccard_dedup` 1.03 — all inside the 1.2× bar even "
        "undeflated, confirming the r7 numbers were co-tenant noise. "
        "Round-8 final bench: 66 queries 67.5 s; the 64 in common with "
        "r7 sum 63.6 vs 62.9 s RAW on the ~1.4× slower box — i.e. "
        "clearly faster control-deflated, driven by the graph family "
        "(best raw ratios: `edge_jaccard_features` 0.42, "
        "`spectral_split_users` 0.49, `louvain_move_scan` 0.52, "
        "`hits_scores` 0.54, `node2vec_corpus` 0.56); the worst raw "
        "ratios are all sub-0.4 s map-side queries that price the box "
        "itself (`hll_distinct_users` 1.97, `sessionize` 1.91, "
        "`char_entropy` 1.74 ≈ the control inflation).",
        "",
        "**Round-9 bench environment (burst noise):** three same-day full benches on load-gate-passed starts totalled 93.2 / 126.5 / 107.1 / 143.6 s (66 r8-common queries: 90.4 / 118.9 / 103.4 / 139.9 vs r8's 74.5) with DIFFERENT worst rows each time (`containment_dedup` 13.5 s then 2.0 s in an interleaved A/B minutes later; `bootstrap_ci_mean` 9.2 / 5.9 s in benches vs 2.1 s in the A/B; `edge_jaccard_features` 8.5x then 3.5x; the fourth run's whole rank-device cluster — `walk_corpus` 11.4 s, `surprisal_buckets` 10.3 s, `rfm_segments` 10.6 s — re-measured 1.5 / 1.8 / 2.0 s in the A/B minutes later) and the sub-0.4 s map-side controls themselves swinging 0.25-0.63 s BETWEEN runs — i.e. the box's co-tenant noise now arrives as randomly-placed multi-second stall bursts that a short control usually dodges under min-of-2 while every >=1 s query eats one. Every suspected code regression was adjudicated with the interleaved A/B protocol instead (all cleared except `doc_dup_groups`, which was real and is fixed via the size-adaptive pair generator — see its ledger entry); `bench.py` now carries a fourth, ~2 s control (`minhash_lsh_dedup`, code untouched since r6) so the deflation block prices burst stalls too, and defaults the bench JVM to 32g: at 69 headline queries the 16g heap ran hot enough that full-GC pauses amplified the bursts into the 8-10x outliers — a 32g run on the same box minutes apart removed the catastrophic tail (common-set 90.1 s, deflated ~par with r8). Read r9 bench rows against the controls block, not raw.",
        "",
        "**Round-9 watch items closed (quiet box, load 1.5–2.0, "
        "interleaved min-of-3, `tools/ab_queries.py` + a device-only "
        "probe):** the three r8 raw regressions are box, not code. "
        "(1) `spearman_balance_spend` — the r8 verdict's one "
        "deflated->1.3× row on changed code. Device-only same-process "
        "A/B (the r7-form `global_cumsum` — direct `_key_stats`, no "
        "memo, direct `_offset_lookup` — monkeypatched into the query "
        "vs the shipped r8 form, min-of-3, rho bit-identical both "
        "ways): r8 form 1.93 s vs r7 form 1.77 s — a +0.16 s (9%) "
        "constant from the memo-insert/`_shift_columns` wrappers, far "
        "inside run noise and nothing like the raw 2.0× cross-round "
        "delta; with the in-process control at 1.66× its r7 value "
        "(`gopher_quality` 0.36 vs 0.217 s) the full query deflates "
        "to ~1.16×. No tie-probe aggregates run in the cumsum path at "
        "all (the cumsum contract assumes unique order keys, so "
        "`_tie_stats` is never invoked) — there is nothing to gate. "
        "(2) `hybrid_rrf_search` 1.547 s and (3) `bootstrap_ci_mean` "
        "2.127 s in the same interleaved run: deflated by the "
        "same-run control median (1.46× vs r7) they sit at 1.27× and "
        "1.04× — matching the judge's own A/B verdict of ≈1×; both "
        "queries' code is unchanged since r7. All three leave the "
        "watch list.",
        "",
        "**Round-10 adjudications:** (1) `doc_dup_groups` watch item "
        "CLOSED on the final shipped code — interleaved min-of-3 "
        "same-process A/B at sf0.1 (quiet box, load 1.35→1.38, "
        "controls at baseline: `gopher_quality` 0.278, `exact_dedup` "
        "0.170, `char_entropy` 0.159): **r10 adaptive form 1.397 s vs "
        "r8 plain form 1.356 s (1.03×)** — the wrapper constant is "
        "~40 ms now that the dispatch count-star is memoized per "
        "source frame (one probe per session instead of one per "
        "invocation; the r9 official row's 2.171 s carried both a "
        "burst and the then-unmemoized probe; this round's official "
        "bench row is 1.856 s, r8-par). (2) The 13 broadcast-hint "
        "removals (see SCALE.md round 10) are plan-verified at "
        "sf0.1: `pmi_collocations`, `doc_keywords`, "
        "`small_quantity_revenue`, `association_rules`, "
        "`apriori_triples`, `k_anonymity_suppress` keep "
        "BroadcastHashJoin from the planner's own size estimates "
        "(hints bought nothing); `overstock_suppliers`, "
        "`supplier_link_prediction`, `revenue_concentration` print "
        "static SMJ on their aggregate-derived sides, which AQE "
        "converts back to broadcast at runtime when the built side is "
        "actually small — bench rows all at r9 par or better "
        "(`pmi_collocations` 1.033 vs 1.09, `apriori_triples` 2.931 "
        "vs 2.92). (3) Quiet-box pins for the new r10 >=1 s rows "
        "(interleaved min-of-3 in a STANDALONE session — i.e. without "
        "the bench session's shared-scan amortization, so these are "
        "upper bounds on bench rows; controls 0.302/0.306/0.203): "
        "`dup_span_source_attribution` 2.49 s, `split_leakage_audit` "
        "2.46 s, `sprt_conversion` 2.09 s, `unigram_lm_char_boundary` "
        "1.69 s — read future cross-round deltas on these rows "
        "against this baseline before suspecting code.",
        "",
        "**Round-11 watch items closed (r10 verdict directive #2; "
        "`tools/ab_r8_forms.py` — the r8 rankdev module loaded "
        "straight from git and monkeypatched into the query, "
        "interleaved same-process min-of-N, results bit-compared "
        "first):** both r10 watch rows are box, not code. "
        "(1) `theil_sen_trend` — the suspected rank-device NULL-guard "
        "constant DOES NOT EXIST for guard-free data: with no "
        "constant-plus-NULL cascade level, `_tie_subcell_expr([], "
        "tbe, bnds)` collapses to exactly the r8 `_boundary_expr` "
        "(the guard loop adds nothing), the probe aggregate differs "
        "by one `F.count(tbd)` column in an already-collected job, "
        "and both forms run the identical 10 jobs at sf0.1. The "
        "timing evidence agrees once ordering bias is removed: a "
        "FIXED-order A/B (current always first each round) showed "
        "current 1.127 s vs r8 0.743 s, but ALTERNATING the order on "
        "a quiet box (load 0.80, min-of-6) flipped the sign — "
        "current 1.234 s vs r8 1.519 s — i.e. whichever form runs "
        "second in a round inherits the GC/JIT state the first paid "
        "for, a ±0.3–0.4 s artifact at this query's size. "
        "`ab_r8_forms.py` now alternates per round. Verdict: par; "
        "the 1.35× official-row delta (0.23 s absolute) is burst "
        "regime. (2) `betweenness_sampled` — query + centrality "
        "kernel untouched since r8 (git-verified; the r9 adjacent.py "
        "diff only re-keys a plan memo), so the 2.67→2.96→3.23 s "
        "official creep had no code to blame: standalone quiet-box "
        "min-of-3 3.412 s with the controls at 1.1–1.4× their r10 "
        "standalone pins (0.368/0.282/0.226 vs 0.302/0.306/0.203) "
        "deflates to ~r8 par, and standalone sessions are upper "
        "bounds on bench rows (no shared-scan amortization). Pinned "
        "as the row's standalone baseline; both leave the watch "
        "list.",
        "",
        "**Session-shared derivations (round 8):** the distinct "
        "transition-edge frame is a pure function of the memoized "
        "event scan, so `transition_edges_cut` / "
        "`undirected_transition_edges_cut` now memoize per (session, "
        "frame) in the shared device memo — the ~20 graph queries of "
        "a session materialize the edge set ONCE instead of re-paying "
        "the stream-lead device + distinct shuffle each "
        "(full-bench total on the same box: 111.8 s → 73.8 s; "
        "`louvain_move_scan` 1.44 → 0.38, `node2vec_corpus` 4.23 → "
        "1.22, `hits_scores` 1.74 → 0.81). Because a localCheckpoint "
        "stores truncated-lineage blocks, the shared cut registers its "
        "block ids (cutpoint.shared_lineage_cut) and bench.py's "
        "inter-query flush skips exactly those — an evicted shared "
        "cut would otherwise be unrecomputable. Per-query timings "
        "after the first consumer therefore EXCLUDE the edge "
        "derivation, the same session-amortization contract as the "
        "device stats memo.",
        "",
        "| query | shuffles | BHJ | SMJ | py | wscg | pushed | cart |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in REPORT_QUERIES:
        try:
            s = summarize(physical_plan(QUERIES[name](spark, sf_dir)))
            lines.append(
                f"| {name} | {s['exchanges']} | {s['bhj']} | {s['smj']} | "
                f"{s['python']} | {s['codegen']} | {s['pushed']} | {s['cartesian']} |"
            )
        except Exception as exc:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {exc} | | | | | | |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(REPORT_QUERIES)} queries)")


if __name__ == "__main__":
    main()
