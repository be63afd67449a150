"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The plan *shape* is the scale argument — this artifact makes it reviewable
without running Spark. tests/test_plans.py asserts the load-bearing
properties; this file shows them.

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHOWN = [
    ("knn_topk_cosine", "exact top-k: scan -> HOF cosine -> TakeOrderedAndProject (no index shuffle)"),
    ("knn_batched", "batched top-k: broadcast query side, window rank per query"),
    ("ann_lsh_topk", "LSH ANN: signature map -> broadcast bucket probe -> pruned exact top-k"),
    ("dedup_exact", "exact dedup: map-side md5, narrow shuffle on the hash"),
    ("dedup_embedding_lsh", "embedding near-dup at scale: band-key equi-join candidates, no cartesian product"),
    ("point_fetch", "point fetch: IN-filter pushed to parquet, embedding column pruned"),
    ("rel_nation_revenue", "3-way join: fact-fact shuffle join + broadcast dims"),
    ("events_asof_purchase", "as-of join: union + single window, no join blow-up"),
    ("events_range_join", "range join: equi-join on (key, time bucket) + exact filter"),
    ("rel_pricing_summary", "filtered aggregate: pushed predicate, partial+final HashAggregate"),
    ("text_search_bm25", "BM25: term-filtered postings, broadcast corpus stats, top-k cut"),
    ("knn_topk_filtered", "metadata-filtered kNN: label predicate pushed to the scan BEFORE scoring"),
    ("knn_topk_per_label", "grouped kNN: map-side scoring, ONE shuffle by label, per-partition rank"),
    ("pack_sequences_blocks", "sequence packing: two-phase distributed prefix sum, no single-partition window"),
    ("text_line_dedup", "line dedup: md5-keyed recurrence count + hash join, text never sorts"),
    ("text_maxsim_topk", "MaxSim: token-vocab broadcast, per-doc max/sum aggregate, top-k cut"),
    ("rel_bloom_pruned_join", "bloom join: one fact pass, projected probe flag + broadcast true-flag"),
    ("text_chunk_overlap", "RAG chunking: map-only tokenize -> explode window starts -> slice; zero shuffles"),
    ("text_phrase_search", "phrase search: postings filtered to query tokens BEFORE the shuffle, broadcast query table, (doc, anchor) aggregate"),
    ("pack_shard_assign", "shard assignment: hash permutation + two-phase prefix sum, per-shard aggregate"),
    ("events_markov_transitions", "Markov transitions: ONE user-keyed window shuffle, |types|^2 aggregate + tiny per-src window"),
    ("multimodal_phash_near_dup", "binary near-dup: banded equi-join candidates (no all-pairs), XOR+popcount verify on carried signatures"),
    ("text_rake_keywords", "RAKE: gaps-and-islands window + doc-keyed joins, every exchange on the doc hash"),
    ("_curate_base", "curate capstone PRE-CHECKPOINT graph: text hashed map-side, skinny (id, lang, hash) shuffles only (the registered query's own explain is truncated at its localCheckpoint — this is the part the checkpoint hides)"),
    ("pipeline_pretraining_shards", "capstone composition: map-side hash/token projection joined skinny, grouped prefix-sum calibration, shard cuts"),
    ("multimodal_real_decode", "real pixel decode: mapInPandas synth -> mapInPandas decode, zero shuffles end to end"),
    ("cluster_kmeans_step", "Lloyd iteration: broadcast seed centroids, map-only integer argmin assign, ONE centroid-keyed update aggregate"),
    ("multimodal_decode_phash_near_dup", "decoder->hash->join in one plan: mapInPandas P5 synth + decode, integer bucket pool, banded Hamming equi-join (no all-pairs)"),
    ("streaming_pipeline_capstone", "streaming capstone SERVING TAIL (the per-batch ingest/dedup/append graph runs inside foreachBatch): broadcast queries, window rank over the stream-built index"),
    ("ann_ivf_portable_build_probe", "portable IVF probe: cell IN-filter prunes the member join, TakeOrderedAndProject top-k (build = iters x map-assign + k*d aggregate, upstream of this plan)"),
    ("ann_ivf_portable_nprobe_sweep", "analytic nprobe sweep: per-level cell-pruned member joins + TakeOrderedAndProject, union of three k-row recall frames"),
    ("dedup_canonical_unscored", "left-join election: skinny id join, one cluster-keyed window, NULLS-LAST score rank"),
    ("dedup_winnow_pairs", "winnow substring pairs: doc-partitioned min-windows -> fp_hash inverted-index equi-join (no cartesian) -> pair aggregate"),
    ("dedup_winnow_cut", "ExactSubstr cut: span islands -> per-doc interval arrays (collect_list) -> HOF positional filter; no position-level join"),
    ("dedup_bloom_decontaminate", "Bloom decontamination: corpus side is scan -> shingle dedup -> ONE Arrow pandas membership UDF -> per-doc aggregate; no join"),
    ("ann_sq8_topk", "SQ8 integer ADC: codes-only scan, zip_with int64 dot, TakeOrderedAndProject k-heap; zero Python"),
    ("text_bpe_fertility", "BPE apply: merge chain as literal replaces inside one transform lambda -- map-only projection, no shuffle"),
    ("ann_ivf_sq8_topk", "IVF-SQ8 composite: PartitionFilters on centroid (probed cells only) -> integer ADC over 4x-compressed codes; float vectors never scanned"),
    ("text_bpe_encode_arrow", "BPE encode at merge-table scale: shared tokenization expression -> ONE ArrowEvalPython segmentation -> map-only hash; no shuffle"),
    ("ann_ivf_sq8_rerank_topk", "composed serving stack: PartitionFilters-pruned codes scan -> int ADC shortlist -> BroadcastHashJoin pages the shortlist floats in; the float table never hash-repartitions"),
    ("ann_ivf_sq8_batched_topk", "batched probe: ONE codes scan (pruned to the union of probed cells) x broadcast (query, cell) map + weight LUTs, query_id-keyed window rank"),
    ("ann_ivfpq_batched_topk", "batched IVF-PQ probe: ONE 8-byte-codes scan (pruned to the probed-cell union) x broadcast probe map + per-query flattened ADC LUTs, query_id-keyed window rank"),
    ("dedup_semdedup_kmeans", "SemDeDup: centroid-keyed WITHIN-CLUSTER pair join (equi-join, no cartesian), broadcast centroid table for cent_sim, EXISTS-style dominated-row semi-join"),
    ("ann_ivf_sq8_index_ingest", "frozen-quantizer ingest roundtrip: base+batch codes layouts UNION with per-root PartitionFilters, integer ADC shortlist, broadcast re-rank of the augmented floats"),
    ("events_zorder_layout", "Z-order layout planning: range-partition on the Morton key, per-partition row_number + closed-form ntile (two-phase scan; the old global-window SinglePartition exchange is gone)"),
    ("ann_ivfpq_index_ingest", "persisted IVF-PQ (memory-bound tier) ingest roundtrip: base+batch 16-byte-code layouts UNION with per-root PartitionFilters, integer LUT-ADC shortlist, broadcast exact re-rank"),
    ("ann_ivf_sq8_index_mutate", "mutation verbs (upsert/delete): seq'd layout union with per-root PartitionFilters, tombstone mask as ONE BroadcastHashJoin LeftAnti pushed below the union, masked co-located floats re-rank"),
    ("ann_ivf_sq8_filtered_topk", "metadata-filtered serving: label predicate pushed to the metadata scan, allowed ids broadcast LeftSemi into the pruned codes scan BEFORE the ADC shortlist"),
    ("ann_ivf_sq8_time_travel", "snapshot serving (load(as_of=N)): the plan unions ONLY roots committed <= the bound (newer commit dirs contribute no scan), per-root PartitionFilters intact, tombstone mask broadcast"),
    ("ann_ivf_sq8_snapshot_retention", "retained pre-fold snapshot (load(as_of=(epoch, seq)) THROUGH a fold): one pruned scan per resolved cell-source group (live base + consulted _retained folds), retained commit roots bounded by seq, the newer epoch's live commit log contributes NO scan, tombstone mask broadcast"),
    ("dedup_minhash_index_time_travel", "dedup verdict-set replay at a retained commit: bounded signatures self-join on (band, band_key) — inverted index, no cartesian — then exact-Jaccard verify joins on the bounded shingle store"),
    ("ann_graph_beam_topk", "graph-ANN beam search (driver-state serving path): the traversal runs EAGERLY — per hop one edge read pruned to the frontier's buckets (PartitionFilters on the partitionBy(src_bucket) layout, plan-pinned in tests/test_graph.py) and one IN-list vector read for new candidates — so the returned frame is the materialized bounded result below, not a lazy plan; per-hop read cost measured flat (0.98x) under a 10x corpus (BASELINE round 17)"),
]


def main() -> None:
    from whatsapp_vectordb_spark.harness import QUERIES
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    sf_dir = "/root/testdata/sf0.01"

    out = [
        "# PLANS — physical plans of the headline queries (sf0.01)",
        "",
        "Generated by `tools/dump_plans.py`; properties asserted in",
        "`tests/test_plans.py`. Regenerate after plan-affecting changes.",
        "",
    ]
    import whatsapp_vectordb_spark.harness as harness

    for name, caption in SHOWN:
        # names outside the registry (e.g. _curate_base) resolve to plain
        # harness functions with the same (spark, sf_dir) signature
        fn = QUERIES.get(name) or getattr(harness, name)
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(em)
        out += [f"## {name}", "", caption, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWN)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
