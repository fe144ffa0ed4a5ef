#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r09.md per-entry audit table: r8 driver
bench warm/cold vs this round's official bench, annotated with what was
done (or deliberately not done) per entry. Usage:
  python3 tools/audit_table.py <r8_bench.json> <r9_bench.json>
"""
import json, sys

r8 = json.load(open(sys.argv[1]))
r9 = json.load(open(sys.argv[2]))

# what happened to each entry this round (section refs = OPTIMIZATION_r09.md)
CHANGED = {
    "q19_canonicalize_cc": "§1 CC driver cutover",
    "q30_tree_depth": "§1 BFS driver cutover",
    "q34_dup_clusters": "§1 CC cutover; §8 residual characterized",
    "q42_cc_chain": "§1 CC driver cutover",
    "kg_entity_canonical": "§1 CC cutover + §9 engine",
    "q44_langid_bigram": "§2 narrow rewrite (0 joins/windows)",
    "kg_ttl_ingest": "§3 shuffle-free doc rendering + §9",
    "q45_stream_window": "§4 data-sized state width",
    "kg_checkpoint_resume": "§5 overlapped bucket jobs + §9",
    "q48_pagerank": "§6 driver evaluation",
}
ENGINE = "§9 engine hot path (md5hex + Re fast path)"
ENGINE_ENTRIES = {
    "kg_pipeline_analyze", "kg_pipeline_parse", "kg_pipeline_link",
    "kg_pipeline_link_salted", "kg_conll_export", "kg_sorted_ntriples",
    "kg_eval_possynt", "kg_select_conllu", "kg_select_sentences",
    "kg_ttl_text", "kg_conll_text", "kg_context_antecedent",
    "kg_conllu_plus", "kg_tsv_fidelity", "kg_srl_args",
    "kg_context_cataphora", "kg_xmltsv_powla", "kg_xmltsv_emptyword",
    "kg_count_xml", "kg_brackets_roundtrip", "kg_brackets_spanuri",
    "kg_segments", "kg_tenten", "kg_file_ingest", "kg_manager_analyze",
    "kg_stream_analyze", "kg_stream_assemble",
}
LEFT = {
    "q01_pricing_summary": "optimal: 2-phase COUNT DISTINCT (r8 audit); cold no. is 1st-entry JVM warmup",
    "q02_revenue_by_nation": "broadcast nation join already in place",
    "q03_part_type_topk": "broadcast part join + partial agg",
    "q04_customers_no_orders": "anti-join, AQE broadcast",
    "q05_suppliers_with_sales": "semi-join, AQE broadcast",
    "q06_cust_order_stats": "outer join + agg; decimal discipline",
    "q07_top_orders_per_cust": "1 window shuffle = minimum for top-k/group",
    "q08_distinct_status": "1 shuffle distinct",
    "q09_union_parties": "union + map-side partial agg",
    "q10_top_orders": "TakeOrdered, no full sort",
    "q11_ordered_groupconcat": "ObjectHashAgg kept hashing (r6 conf)",
    "q12_running_sum": "1 window shuffle = minimum",
    "q13_sessionize": "window + agg share the user_id exchange (pin ≤2)",
    "q14_tokenize": "narrow explode",
    "q15_conll_triples": "union sides reuse one exchange (pin)",
    "q16_detokenize": "single agg; r8 negative result on repartition",
    "q17_possynt": "narrow",
    "q18_entity_link": "broadcast gazetteer (pin 2/1)",
    "q20_dedup_exact": "hash-group + sort; map-side partials",
    "q21_minhash_sigs": "narrow shingle pipeline (pin 1/0)",
    "q22_lsh_jaccard": "r6 narrow chain; count-action is pruned (see §8)",
    "q43_lsh_r2": "same chain, 4x2 banding",
    "q23_simhash": "one agg + window",
    "q37_simhash_hamming": "§7 explode rebanding rejected (negative result)",
    "q24_langid": "one agg",
    "q25_quality": "one agg (2-phase for countDistinct)",
    "q26_tokcount": "narrow",
    "q27_fingerprint": "narrow",
    "q32_embed_neardup": "bucket join + cap; decimal cosine is the contract",
    "q33_cdc_chunks": "window + agg; no joins",
    "q28_ann_topk": "per-partition top-k, no all-pairs",
    "q29_ann_lsh_buckets": "narrow bucketing",
    "q31_ann_ivf": "bounded centroid broadcast, zero-shuffle assignment",
    "q38_ann_ivf_multiprobe": "same, nprobe=2",
    "mm_media_meta": "batched mapPartitions",
    "mm_frame_dups": "batched mapPartitions + group",
    "q35_quality_sample": "md5-threshold sampling, shuffle-free beyond q24's agg",
    "q36_shard_packing": "bucketed windows — no global window",
    "q39_redact": "narrow regex map",
    "q40_repetition": "one agg (pin 2/0)",
    "q41_decontaminate": "broadcast n-gram probe (pin 4/2)",
    "q46_url_canonical": "canonical-group agg (pin 2/0)",
    "q47_ngram_boilerplate": "map-side-combinable count (pin 2/0)",
}

qs8c, qs8w = r8["queries"], r8["queries_warm"]
qs9c, qs9w = r9["queries"], r9["queries_warm"]
rows = []
for k in qs8w:
    act = CHANGED.get(k) or (ENGINE if k in ENGINE_ENTRIES else f"left: {LEFT.get(k, '?')}")
    rows.append((k, qs8w[k], qs9w.get(k, -1), qs8c[k], qs9c.get(k, -1), act))
rows.sort(key=lambda r: -r[1])
print("| entry | r8 warm | r9 warm | r8 cold | r9 cold | action |")
print("|---|---|---|---|---|---|")
for k, w8, w9, c8, c9, act in rows:
    print(f"| {k} | {w8:.2f} | {w9:.2f} | {c8:.2f} | {c9:.2f} | {act} |")
print()
print(f"totals: r8 cold {r8['value']:.1f} warm {r8['total_warm']:.1f}  ->  "
      f"r9 cold {r9['value']:.1f} warm {r9['total_warm']:.1f}")
