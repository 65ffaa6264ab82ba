"""Plan audit: print `explain("formatted")` for registry queries and
flag scale smells — cartesian/nested-loop joins, un-pruned scans, and
row-at-a-time Python evals in the hot path.

Usage:
    python tools/explain_audit.py [names...]          # audit (default: bench HEADLINE set)
    python tools/explain_audit.py --full [names...]   # also dump the formatted plans
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from logistics_data_pipeline_spark import registry  # noqa: E402
from logistics_data_pipeline_spark.session import get_spark  # noqa: E402

SMELLS = {
    "CartesianProduct": "cartesian product",
    "BroadcastNestedLoopJoin": "nested-loop join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}

# Reviewed plans where a marker is the DESIGNED strategy, not a smell:
ALLOWED = {
    # dims(d rows) x js(n_bits rows) hyperplane-matrix build — a
    # literal-sized (64x64) cross join producing the broadcast plane
    # frame; corpus-sized frames never touch it
    "emb_neardup_lsh": {"nested-loop join"},
    # same dims x js SRP plane build as emb_neardup_lsh (shared
    # srp_buckets helper) — literal-sized, broadcast-bound
    "emb_semantic_decontamination_governed": {"nested-loop join"},
    # inherits the same SRP plane cross join through its semantic leg
    "docs_decontamination_panel": {"nested-loop join"},
    # single-row scalar aggregates cross-joined into the report row
    "dq_checks": {"nested-loop join"},
    # 1-row scalar aggregate broadcast on a dummy equality key: Catalyst
    # folds lit==lit to TRUE, so the plan prints as a BNLJ — but the
    # build side is exactly one row (a map-side constant append)
    "orders_customer_rfm": {"nested-loop join"},  # corpus max order date
    "docs_bigram_logprob": {"nested-loop join"},  # vocabulary size V
    "events_heavy_hitters": {"nested-loop join"},  # total event count
    "docs_dedup_cluster_stats": {"nested-loop join"},  # corpus doc count
    "events_hll_rollup": {"nested-loop join"},  # 1-row global exact-distinct
    "events_key_skew_stats": {"nested-loop join"},  # 1-row top-k share join
    "orders_market_basket": {"nested-loop join"},  # 1-row basket count
    "docs_tfidf_top_terms": {"nested-loop join"},  # 1-row corpus size
    "tpch_q11_important_parts": {"nested-loop join"},  # 1-row nation total
    "docs_bpe_merge_step": {"nested-loop join"},  # 1-row winning merge pair
    # inherits emb_knn_bruteforce's broadcast-queries scan (the point)
    "emb_ann_recall_panel": {"nested-loop join"},
    "docs_tfidf_cosine_pairs": {"nested-loop join"},  # 1-row corpus size
    "events_bloom_panel": {"nested-loop join"},  # four 1-row scalar legs
    "docs_shingle_df_stats": {"nested-loop join"},  # 1-row pair total
    "emb_cell_balance": {"nested-loop join"},  # 1-row total/cells scalar
    # |types|x|types| pair join over the 5-row moment table (theta <)
    "events_type_effect_sizes": {"nested-loop join"},
    # per-round broadcast of the 1-row node count into the rank update
    "orders_item_pagerank": {"nested-loop join"},
    # 1-row scalars (norm per step, sign, Rayleigh lambda, trace)
    # cross-joined into the 64-row eigenvector frame
    "emb_power_iteration": {"nested-loop join"},
    # same scalar pattern per deflated component (λ, sign, trace)
    "emb_pca_deflation": {"nested-loop join"},
    # 1-row moment scalars (n, d, trace, eta) + closed-form MSE terms
    # cross-joined into the d-row weight frame per GD step
    "emb_linear_probe": {"nested-loop join"},
    # 1-row release-total scalar joined into the QI-group table
    "events_k_anonymity": {"nested-loop join"},
    # 1-row corpus-max censor date; both KM running windows are over
    # the |distinct days|-row product-limit table (bounded input)
    "orders_kaplan_meier": {"nested-loop join", "unpartitioned window"},
    # 1-row global min/max scalars broadcast into the grid projection;
    # the NTILE global sort is the diagnostic's point — it mirrors the
    # range exchange write_zordered pays on the real write path (at
    # scale the write IS the layout; this key audits it per partition)
    "events_zorder_extents": {"nested-loop join", "unpartitioned window"},
    # 1-row midpoint-epoch scalar broadcast into the pre/post split
    "events_cuped": {"nested-loop join"},
    # two 1-row corpus rollups (totals x stored-bytes) cross-joined
    "docs_cdc_chunk_dedup": {"nested-loop join"},
    # |types|-row (≤5) dim ranking + 1-row max-type scalar for the
    # deliberate fallback hole; the event stream itself is map-side
    "stream_enrich_join": {"nested-loop join", "unpartitioned window"},
    # ROW_NUMBER over the K=16-row daily tail; 1-row level/trend scalar
    # crossed with the 7-row horizon grid
    "events_holt_forecast": {"nested-loop join", "unpartitioned window"},
    # ROW_NUMBER over the K=16-row monthly tail (holt's shape); 1-row
    # trend/SES scalars crossed with the 12-row horizon grid
    "orders_theta_forecast": {"nested-loop join", "unpartitioned window"},
    # ROW_NUMBER over the K=24-row monthly tail; 1-row 14-sum state
    # row exploded into the 12-row horizon grid
    "orders_holt_winters": {"nested-loop join", "unpartitioned window"},
    # 1-row [min,max] range scalar broadcast into the binning pass
    "kpi_weight_histogram": {"nested-loop join"},
    # 1-row corpus day-span scalar broadcast into the per-part policy
    "part_eoq_policy": {"nested-loop join"},
    # 1-row total scalar crossed into the <=16-row pattern cell table
    "docs_gopher_ablation": {"nested-loop join"},
    # the sweep window runs over the |distinct days| delta frame (the
    # raw facts pre-aggregate first); 1-row durations x sweep scalars
    "orders_wip_sweep": {"nested-loop join", "unpartitioned window"},
    # 1-row scalars (midpoint epoch, quartile bounds, total) broadcast
    # around the customer panel; the 24-row grid join is literal-sized
    "orders_segment_migration": {"nested-loop join"},
    # ROW_NUMBER over the 21-row daily tail; 5-fit x 5-actual joins are
    # literal-sized
    "events_holt_backtest": {"nested-loop join", "unpartitioned window"},
    # 1-row min/max/count scalar broadcast into the kernel expansion
    # and the 64-row grid completion
    "events_kde_density": {"nested-loop join"},
    # 4-row cutoff grid theta-joined to the TakeOrdered 4096-row vocab
    # head; rank window over that bounded head; 1-row total cross
    "docs_vocab_coverage": {"nested-loop join", "unpartitioned window"},
    # 1-row score min/max scalar broadcast into the binning + 10-row grid
    "docs_classifier_calibration": {"nested-loop join"},
    # 1-row token total crossed into the <=10-row count-of-counts table
    "docs_good_turing": {"nested-loop join"},
    # 1-row corpus doc count crossed into the vocab moment table
    "docs_term_burstiness": {"nested-loop join"},
    # 1-row grand moment panel crossed into the |types| rows
    "events_james_stein": {"nested-loop join"},
    # 1-row threshold scalar crossed into the TakeOrdered top-k rows
    "events_tail_index": {"nested-loop join"},
    # 1-row union total crossed into the 3-category grid
    "docs_lexsem_agreement": {"nested-loop join"},
    # ECDF fronts run over the DISTINCT-VALUE table (bounded by the
    # 2-dp metric domain, not corpus size — the ABC catalog argument);
    # 1-row arm totals broadcast
    "events_ks_test": {"nested-loop join", "unpartitioned window"},
    # mean/denominator 1-row scalars + the 14-row lag grid over the
    # calendar-sized daily frame; peak flag is a 14-row window
    "events_daily_acf": {"nested-loop join", "unpartitioned window"},
    # ROW_NUMBER over the 26-row daily tail; 1-row forward-fit x
    # 1-row residual-quantile cross
    "events_conformal_forecast": {"nested-loop join", "unpartitioned window"},
    # 1-row grand-moment scalars joined into the ≤5-row group frame
    "lineitem_leadtime_anova": {"nested-loop join"},
    # 1-row midpoint-cutoff scalar appended to every line
    "orders_promo_did": {"nested-loop join"},
    # 1-row grand total; running share over the CATALOG-sized part dim
    # (not the fact) — single task is right below ~1e8 SKUs, see docstring
    "orders_abc_analysis": {"nested-loop join", "unpartitioned window"},
    # 1-row total share; prefix window over the corpus/8192 bucket maxima
    # (config-bounded input, same reasoning as docs_zipf_fit)
    "events_lateness_panel": {"nested-loop join", "unpartitioned window"},
    # tiny broadcast query side vs corpus scan — BNLJ is the point
    "emb_knn_bruteforce": {"nested-loop join"},
    # inherits knn_bruteforce's broadcast-queries scan
    "emb_label_purity": {"nested-loop join"},
    "emb_mips_topk": {"nested-loop join"},
    "emb_incremental_topk": {"nested-loop join"},
    "emb_triplet_mining": {"nested-loop join"},
    # distinct-langs × distinct-sources grid cross (both sides are
    # config-sized distinct lists; the zero-cell completion needs it)
    "docs_lang_source_chi2": {"nested-loop join"},
    # rank window over the TakeOrdered vocab head: input is capped at
    # ZIPF_FIT_RANKS (200) rows before the window, so one task is right
    "docs_zipf_fit": {"unpartitioned window"},
    # running-total window over the ~30-row power-of-two bucket table
    "docs_length_histogram": {"unpartitioned window"},
    # running sums over the ~20-row pow-2 prefix-bin table
    "docs_heaps_fit": {"unpartitioned window"},
    # 1-row pair total + cumulative share over the <=21-bin histogram
    "emb_cosine_histogram": {"nested-loop join", "unpartitioned window"},
    # full-width re-insert: the anti-join output IS every column
    "ingest_dedup_antijoin": {"wide scan"},
    "monitor_recent_events": {"wide scan"},
    "bronze_events": {"wide scan"},
    "stg_events": {"wide scan"},
    "valid_events": {"wide scan"},
    "invalid_events": {"wide scan"},
    "fact_event": {"wide scan"},
    "events_signup_funnel": {"nested-loop join"},  # three 1-row aggs cross-joined
    # inherits docs_bigram_logprob's 1-row vocab-size scalar; global
    # NTILE over one row per doc (doc-count rows, the panel's one
    # all-to-one step — see docstring)
    "docs_perplexity_buckets": {"nested-loop join", "unpartitioned window"},
    # 1-row pair-total share join into the |sources|^2 matrix
    "docs_source_overlap": {"nested-loop join"},
    # two 1-row scalars (corpus N, avg doclen); rank window over the
    # TakeOrdered 18-row df head (never vocab-sized input)
    "docs_bm25_scores": {"nested-loop join", "unpartitioned window"},
    # 1-row triangle-count x 1-row wedge-count final cross
    "orders_graph_triangles": {"nested-loop join"},
    # inherits docs_bm25_scores' two 1-row scalars + TakeOrdered-capped
    # 200-row rank windows per fused list
    "docs_rrf_fusion": {"nested-loop join", "unpartitioned window"},
    # 1-row max-timestamp scalar broadcast into the window classifier
    "events_type_value_drift": {"nested-loop join"},
    # four (purged x surviving) 1-row scalar cross joins, one per artifact
    "docs_delete_propagation": {"nested-loop join"},
    # 1-row min-month scalar broadcast into the month re-index
    "orders_revenue_trend": {"nested-loop join"},
    # 1-row corpus token total for shares
    "docs_tokenizer_fertility": {"nested-loop join"},
    # five (pair-count x docs-touched) 1-row scalar crosses, one per threshold
    "docs_dedup_threshold_sweep": {"nested-loop join"},
    # 1-row max-orderdate as-of scalar broadcast into the age bucketing
    "orders_backlog_aging": {"nested-loop join"},
    "tpch_q1_pricing_summary": {"wide scan"},  # q1 aggregates 7 lineitem cols
    # 1-row total-order-count scalar for the per-digit shares
    "orders_benford_digits": {"nested-loop join"},
    # running max over the DISTINCT-PRICE aggregate (catalog-bounded,
    # ≪ |part|); the documented two-phase swap-in mirrors exact_row_number
    "part_pareto_front": {"unpartitioned window"},
    # seed-labeling row_number over the TakeOrdered 16-row md5 sample
    # (config-sized input — see _seed_rows in llm/similarity.py)
    "emb_kmeans_cells": {"unpartitioned window"},
    "emb_pq_codes": {"unpartitioned window"},
    # inherit kmeans_cells_exact's 16-row seed window through the shared
    # (persisted) kc_cells assignment lineage
    "emb_semdedup": {"unpartitioned window"},
    "emb_cluster_balanced_sample": {"unpartitioned window"},
    "emb_knn_ivf_exact": {"unpartitioned window"},
    # kc_exact_centroids' 16-row seed window on the OLD-corpus train,
    # plus the 1-row total/cells scalar broadcast into the load panel
    "emb_ivf_delta_assign": {"unpartitioned window", "nested-loop join"},
    # 1-row corpus token-total broadcast into the 256-bucket ratio table
    "docs_dsir_weights": {"nested-loop join"},
    # per-round broadcast of the 1-row normalization totals (node count,
    # sum of raw authority/hub mass) into each score update
    "orders_graph_hits": {"nested-loop join"},
    # broadcast 1-row query vector vs corpus scan (the knn_bruteforce
    # shape) + the pool×pool (i != j) pair matrix over the 100-row
    # candidate pool — both sides config-bounded before the non-equi join
    "emb_mmr_select": {"nested-loop join"},
    # 1-row bigram-type-count scalar joined into the KN continuation term
    "docs_kneser_ney_bigram": {"nested-loop join"},
    # distinct-langs × distinct-langs grid cross (config-sized, the
    # zero-cell completion — same reasoning as docs_lang_source_chi2)
    "docs_crosslingual_neardup": {"nested-loop join"},
    # two 1-row aggregate legs (distinct-user counts × event moments)
    # cross-joined into the single report row
    "events_ab_test_srm": {"nested-loop join"},
    # 1-row week-count + revenue-total scalars; ABC running share over
    # the catalog-sized part table (same bound as orders_abc_analysis)
    "part_abc_xyz": {"nested-loop join", "unpartitioned window"},
    # 1-row train-vocab-size scalar broadcast into the eval scorer
    # (same shape as docs_bigram_logprob)
    "docs_holdout_perplexity": {"nested-loop join"},
    # 1-row grand-average scalar joined into the 12-row month table
    "orders_seasonal_index": {"nested-loop join"},
    # broadcast anchor sample vs corpus scan (the knn_bruteforce shape)
    "emb_intrinsic_dim": {"nested-loop join"},
    # ring-init grid: corpus ranks × the k-row (config-sized) js frame,
    # plus exact_row_number's broadcast offset join — both bounded by
    # the index config / shuffle width, never by corpus pairs
    "emb_nn_descent_graph": {"nested-loop join"},
}


def audit(name: str, df, full: bool) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = [label for marker, label in SMELLS.items() if marker in plan]
    # un-pruned scan: a FileScan reading every column of a wide table
    # (the bracketed output list is never truncated, unlike ReadSchema)
    for cols in re.findall(r"FileScan parquet \[([^\]]*)\]", plan):
        n = len([c for c in cols.split(",") if c.strip()])
        if n >= 6:
            flags.append("wide scan")
            break
    # unpartitioned window: WindowExec with an empty partitionSpec runs
    # the whole input through ONE task — a total sort at scale. The node
    # prints as `Window [fns], [partSpec], [orderSpec]` but OMITS empty
    # specs, so an unpartitioned ordered window shows exactly two
    # bracket groups with sort directions in the last one.
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = re.findall(r"\[[^\[\]]*\]", m.group(1))
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[-1]):
            flags.append("unpartitioned window")
            break
    allowed = ALLOWED.get(name, set())
    flags = [f for f in flags if f not in allowed]
    exchanges = plan.count("Exchange")
    print(f"{name:38s} exchanges={exchanges:2d} "
          + (f"SMELLS: {', '.join(flags)}" if flags else "clean"))
    if full:
        df.explain("formatted")
    return flags


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("explain-audit")
    qs = registry.queries()
    names = args or [n for n in HEADLINE if n in qs]
    flagged = 0
    for name in names:
        try:
            flagged += bool(audit(name, qs[name](spark, sf_dir), full))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:38s} ERROR building plan: {exc}")
            flagged += 1
    print(f"\n{len(names) - flagged}/{len(names)} clean")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
