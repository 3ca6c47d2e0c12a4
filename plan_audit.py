"""Plan audit: record optimizer evidence for representative queries.

Writes PLAN_AUDIT.md with, per query: the physical-plan node counts that
matter at scale (exchanges = shuffles, broadcast joins, Arrow UDF
stages, whole-stage-codegen spans) plus whether the parquet scans carry
pushed filters. Run it after plan-shape changes; the committed output
is the evidence trail that the declarative plans still compile to the
intended physical strategies.

Usage: python3 plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_big_data_blog_dmscdc_walkthrough_spark.session import get_spark

AUDITED = [
    # (name, why this one)
    ("q1_pricing_summary", "scan-heavy agg: pushdown + one shuffle"),
    ("q5_local_supplier_volume", "star join: dims must broadcast"),
    ("q_events_filter_scan", "selective scan: PushedFilters must appear"),
    ("cdc_merge", "merge: impacted-only shuffle"),
    ("dedup_minhash_lsh", "Arrow UDF stages: exactly one signature chain"),
    ("dedup_simhash", "composite-block banding: one signature pass, packed keys"),
    ("dedup_clusters", "edge-gen + CC: local-solve path, one node-set pass"),
    ("corpus_decontaminate", "eval side must broadcast; corpus map-side"),
    ("ann_batch_topk", "bucket equi-join, never |corpus|x|queries|"),
    ("dedup_keep_best", "CC + quality + rank composite: no extra scans vs parts"),
    ("dedup_semantic", "centroid assign map-only; prune is one grouped Arrow stage"),
    ("dedup_substring", "fused single-task report under the gate; distributed: one hash-keyed shuffle"),
    ("text_quality_classifier", "map-only Arrow pass: zero exchanges"),
    ("ann_pq_topk", "encode+ADC map-only; only the top-k reduce shuffles"),
    ("cdc_scd2", "one union + one PK window shuffle (merge footprint)"),
    ("cdc_snapshot_diff", "impacted-vs-survivors outer join (batch-sized, r15); no pairwise compare"),
    ("text_surprisal", "one word-count shuffle + token-keyed join; total broadcast"),
    ("q_lineitem_bloom_semi", "bitmap probe map-side; join sees thinned input"),
    ("cdc_incremental_agg", "delta from merge_parts frames (r15); one group-key outer join"),
    ("q_events_funnel", "one user-keyed window pass + per-user agg (r15); no events joins"),
    ("q_events_retention", "two user aggs + one join; distinct on bounded out"),
    ("emb_hard_negatives", "anchors broadcast; corpus map-only; bounded window"),
    ("lake_expectations", "one table pass; key-shaped joins only"),
    ("q_events_gapfill", "map-side calendar explode; one per-key window"),
    ("q_part_fuzzy_match", "distinct value domains; trigram-blocked match"),
    ("text_paragraph_dedup", "two key-shaped shuffles, never pairwise"),
    ("emb_random_projection", "map-only fixed folds: zero exchanges"),
    ("q_events_user_anomaly", "one user-key window shuffle"),
    ("emb_knn_label_propagation", "norms per side; bounded query set crosses"),
    ("corpus_source_top_terms", "second shuffle vocab-sized, not corpus-sized"),
    ("dedup_ngram_jaccard", "adaptive: direct join at audit SF; index count join at scale"),
    ("emb_knn_propagate_all", "banded LSH joins; nothing crosses corpus x corpus"),
    ("emb_label_outliers", "centroid agg bounded; broadcast back; one window"),
    ("corpus_split_leakage", "LSH pair set + two linear doc-keyed joins"),
    ("q_basket_affinity", "order-key self-join: per-basket fan-out; marginals after min-support"),
    ("q_events_decay_score", "anchor broadcast; map-only terms; one user-key agg"),
    ("q_events_attribution", "one user-key window pass; no self-join"),
    ("sample_weighted", "map-only ES keys; per-stratum bounded window"),
    ("dedup_containment", "index count join (jaccard twin); both directions from one agg"),
    ("q_customer_feature_matrix", "all windows CASEs in ONE customer agg; anchor broadcast"),
    ("q_part_fuzzy_levenshtein", "length-bucket EQUI-join (±k replication); no NLJ"),
    ("eval_centroid_classifier", "centroids broadcast; shuffle is |test|x|labels| partial sums"),
    ("corpus_quality_filter", "map-side scoring; |sources| boundary agg broadcast back"),
    # round-11 additions (#132-#143)
    ("q_customer_gini", "one customer agg; bounded-segment sort window; |segments| reduce"),
    ("q_events_conversion_latency", "two user aggs + bounded user join; per-cohort window"),
    ("q_events_wilson", "(channel,user) agg + user purchase agg; |channels| reduce"),
    ("corpus_vocab_overlap", "distinct vocab first; term-keyed self-join, never corpus-sized"),
    ("corpus_fertility", "map-only scoring; one |langs|-row aggregate"),
    ("dedup_cluster_sizes", "shared CC pipeline once; two bounded aggs"),
    ("eval_ann_mrr", "bounded queries broadcast; corpus map-scan; NQ-partition window"),
    ("emb_covariance", "NO explode: pair products as agg columns, one global agg"),
    ("lake_integrity", "column-pruned anti joins; 1-row aggs per FK edge"),
    ("q_events_session_paths", "two user-keyed windows; path-vocab count + bounded topk"),
    ("q_orders_histogram", "broadcast min/max anchor; <=bins-row count"),
    # round-11 additions (#144-#152)
    ("lake_key_profile", "counts-of-counts p99: nothing key-scale sorted on one task (r12)"),
    ("q_orders_percentile", "segment-partitioned rank window; no self-join"),
    ("q_orders_mad_outliers", "two grouped exact medians + broadcast-anchored count"),
    ("q_events_funnel_windowed", "one user-keyed window pass + per-user agg (r15); steps from one global agg"),
    ("q_events_peak_concurrency", "two-level sweep: (day,chunk) windows + broadcast offsets (r12)"),
    ("q_orders_mom_growth", "window AFTER agg: |months|-row single-partition sort only"),
    ("dedup_tf_cosine", "prefix joins prefix + PPJoin+ suffix bound (r12); exact re-score pair-keyed"),
    ("text_heavy_hitters", "one Arrow screen carrying the total (r12: 2 scans); broadcast-gated recount"),
    ("dedup_bag_of_words", "one hash-partition shuffle on the sorted-multiset key"),
    # round-11 additions (#153-#157)
    ("q_orders_histogram_eqdepth", "decile boundaries broadcast; <=buckets-row agg"),
    ("q_orders_drift_tvd", "one scan, |dims x cats| agg; integer TVD numerator"),
    ("q_events_rolling_distinct", "bounded 7x explode; one grouped exact distinct"),
    ("q_part_triangles", "degree-ordered wedges; one closing semi-join"),
    # round-12 additions (#159-#165)
    ("q_events_daily_anomaly", "row-keyed day agg; RANGE windows over tiny (type,day) frame"),
    ("q_part_neighbors", "shared min-support pair frame; marginals by key; per-anchor topk window"),
    ("q_events_trigrams", "session windows + two LEADs; vocab-cubed count, bounded topk"),
    ("eval_auc_length", "counts-of-counts U: length spine broadcast; linear in sources"),
    ("corpus_burstiness", "(doc,term) agg -> per-term reduce; distributed TakeOrdered topk (r13)"),
    ("eval_lang_kappa", "|labels|^2 confusion agg; everything after is label-scale"),
    ("dedup_unicode", "one Arrow NFC pass; one hash-partition shuffle on the canonical key"),
    # round-13 additions (#168-#174)
    ("corpus_repetition_indices", "(source,term) agg -> |sources| reduce; DECIMAL exact"),
    ("corpus_zipf_spine", "counts-of-counts spine; window over bounded distinct-freq frame"),
    ("corpus_chi2_keywords", "doc-freq agg; |sources| broadcast; WindowGroupLimit topk"),
    ("corpus_ingest_novelty", "trigram-keyed distinct + min-batch reduce; scalar max broadcast"),
    ("q_copurchase_assortativity", "shared edge frame; degree joins node-keyed; 1-row reduce"),
    ("q_orders_benford", "one scan, 9-row agg, broadcast total"),
    ("corpus_source_tvd", "term-keyed self-join <=|sources|^2 fan-out; |pairs| reduce"),
    ("q_customer_cadence", "one per-customer LAG window; one aggregation"),
    # round-14 additions (#184-#190)
    ("q_orders_autocorr", "day-keyed agg; LAG + reduce over tiny (priority,day) frame"),
    ("q_events_bot_burst", "user-keyed RANGE window + user-keyed agg: one key, AQE-coalesced"),
    ("q_supplier_reliability", "orderkey equi-join; supplier agg map-side partials"),
    ("corpus_source_balance", "two keyed aggs; second over |source x lang| rows"),
    ("corpus_doclen_histogram", "map-side bucket expr; one (source,bucket) agg"),
    ("emb_centroid_distances", "one corpus-keyed centroid agg; K-row broadcast pair join"),
    ("q_part_kcore", "shared edge frame; per-round degree agg + semi-joins, node-keyed"),
    # q_part_pagerank is NOT audited here: the returned frame's static
    # plan re-displays all five persisted rounds multiplied (~28k
    # phantom exchange nodes for what executes as one node-keyed
    # shuffle per round) — the per-round shape is documented in
    # operators/graph.py:pagerank and evidenced by the near-flat
    # sf1->sf10 wall curve in the BENCH_LOCAL sidecars.
]


def audit(spark, name, fn, sf_dir) -> dict:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "arrow_stages": len(re.findall(r"ArrowEvalPython", plan)),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        "scans": len(re.findall(r"Scan parquet", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    import __spark_entry__ as entry_mod
    from aws_big_data_blog_dmscdc_walkthrough_spark.operators import dedup

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**entry_mod.queries(), **entry_mod.secondary_queries()}
    lines = [
        "# PLAN AUDIT — physical-plan evidence (generated by plan_audit.py)",
        "",
        f"Scale dir: `{sf_dir}`. Counts from `explain('formatted')`.",
        "",
        "| query | why audited | shuffles | bcast joins | SMJ | Arrow stages | codegen spans | pushed filters | scans |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, why in AUDITED:
        dedup.release_persisted()
        a = audit(spark, name, queries[name], sf_dir)
        lines.append(
            f"| {name} | {why} | {a['exchanges']} | {a['broadcast_joins']} | "
            f"{a['sort_merge_joins']} | {a['arrow_stages']} | {a['codegen_spans']} | "
            f"{'yes' if a['pushed_filters'] else 'no'} | {a['scans']} |"
        )
    lines += [
        "",
        "Reading guide: `shuffles` counts Exchange nodes (includes the",
        "broadcast exchanges feeding bcast joins); `SMJ` > 0 flags a join",
        "that fell back to sort-merge — expected only where both sides are",
        "large; `Arrow stages` are Python UDF boundaries; `pushed filters`",
        "confirms predicate pushdown reached the parquet scan. Counts are",
        "STATIC-plan counts: a persisted frame referenced from several",
        "branches re-displays its full sub-plan at every reference, so",
        "Arrow/scan counts overstate runtime work for cached plans (the",
        "cache executes the sub-plan once; eager materialization in",
        "operators/dedup.py pins exactly one evaluation). Codegen ids are",
        "assigned at execution time — a pre-execution AQE plan legitimately",
        "shows 0 spans even for fully codegen'd stages.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLAN_AUDIT.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
