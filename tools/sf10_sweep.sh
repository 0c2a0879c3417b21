#!/bin/bash
# Second-decade scaling sweep: the 25-slowest + every >3x-flagged query
# (BENCH_SF1.md) + the round-8 additions, benched at sf1 (10x) and sf10
# (100x) with the same estimator (min of 2), then the CPU-bound
# Levenshtein verify separately (1 run — its second pass adds ~2x the
# sweep's wall clock for no extra information).
set -e
cd /root/repo
SUBSET="ann_cluster_recall ann_mllib_lsh_recall c2_corpus_pipeline \
d_containment d_dup_groups d_embedding_neardup d_minhash_cap_recall \
d_minhash_lsh d_simhash d_simhash128 d_token_jaccard c3_bucketed_lookup \
o8_global_topk_strategy e_means_coverage \
e_multik_metrics e_ndcg_mrr_ap f_zorder g1_pagerank j11c_band_topk \
j13_bloom_join o7_global_rownumber p_quantile_bin r9_diversity \
r10_novelty r11_spearman r12_cooccurrence r13_int8_recall \
t_bigram_logprob t_repetition t_tfidf w2_time_split w9_anomaly \
w9b_mad_anomaly x6_group_cap x7_sketch_accuracy x9_pack_sequences \
x12_decontaminate x13_weighted_sample x16_dedup_resolve x18_fk_orphans \
x22_skew_distinct"

run() { # run <sfdir> <out-tag> <runs> [names...]
  local dir="$1" tag="$2" runs="$3"; shift 3
  echo "=== bench $tag ($dir, runs=$runs) ==="
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_BENCH_RUNS="$runs" \
    tools/runjava.sh graft.Bench "$dir" $@ 2>/dev/null | tail -1
  cp target/bench_full.json "target/bench_$tag.json"
}

run /root/repo/target/sf1  sub_sf1  2 $SUBSET
run /root/repo/target/sf10 sub_sf10 2 $SUBSET
run /root/repo/target/sf1  lev_sf1  1 d_lev_neardup
run /root/repo/target/sf10 lev_sf10 1 d_lev_neardup
echo SWEEP_DONE
