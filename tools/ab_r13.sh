#!/bin/bash
# Round-13 item 1: in-session A/B of the r11 tree (9ff5c5f) vs HEAD over the
# 15 worst UNTOUCHED r12 regressors, to attribute the 20% suite-wide bench
# inflation (host vs tree). Interleaved A,B,A,B invocations; identical warm
# list (the r11 bench set, present in both trees); per-key minimums decide.
set -u
KEYS="stream_hopping_counts stream_dedup_watermark stream_enrich_join stream_click_attribution stream_sessionize_closed part_price_elasticity part_newsvendor_stock tpch_q21_waiting_suppliers dbt_schema_tests emb_kmeanspp_init docs_gopher_repetition emb_semdedup emb_cosine_histogram docs_bbit_minhash docs_dup_span_removal"
WARM="sh3,cov_mat,jac_scores,con_scores,sim_sig,mh_sig,components,copurchase_edges,kc_cells,pq_codes,winnow_fp,emb_pairs,sh5,srp_sigs,knn_ivf,knn_ivfpq,nsw_graph"
OUT=/root/repo/AB_r13
mkdir -p "$OUT"
for pass in 1 2; do
  for side in r11 head; do
    dir=/root/repo; [ "$side" = r11 ] && dir=/root/r11tree
    echo "=== pass $pass side $side load=$(cut -d' ' -f1 /proc/loadavg) $(date +%T) ===" >> "$OUT/ab.log"
    (cd "$dir" && python tools/key_bench.py --runs 3 --warm "$WARM" $KEYS) \
      > "$OUT/${side}_p${pass}.json" 2>> "$OUT/ab.log"
  done
done
echo "AB DONE $(date +%T)" >> "$OUT/ab.log"
