#!/usr/bin/env python
"""Multi-point scale curve (VERDICT r3 item 6, extended r5): time the
heaviest workload queries at sf0.1 and sf1 (tools/make_scale.py
output) — and optionally a third sf10 point for the heaviest subset —
and write SCALE_CURVE.json, which bench.py folds into BENCH_DETAIL.json.

Protocol matches bench.py: noop sink (full plan executes, nothing
collected), sf0.001 codegen warmup per query, best-of-N timing,
cache.unpersist_all() between reps. With 10x rows on the same 32
cores, linear behavior is ratio <= ~10 (sub-10 when a fixed cost —
streaming machinery, session setup, codegen — dominates the small
point); a ratio well above 10 means super-linear work (a pair
explosion, an unbounded window, a driver collect) and fails the audit.

A flaky rep records a per-query failure sentinel instead of aborting
the whole audit (r4 ADVICE): the query's entry carries an "error" key
and the remaining queries still run, so SCALE_CURVE.json is always
written.

Usage: python tools/bench_scale.py [--big /root/repo/var/sf1]
                                   [--huge /root/repo/var/sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 10 heaviest queries from BENCH_r03 plus two core relational
# representatives (scan-bound agg, 3-way broadcast join)
QUERIES_TO_RUN = [
    "stream_running_totals", "pipeline_stats", "pipeline_curate",
    "decontaminate_fuzzy", "dedup_minhash_lsh", "stream_dedup",
    "window_ntile", "kmeans_cluster_sizes", "embedding_neardup_lsh",
    "stream_interval_join",
    "agg_q1", "join_three", "ann_lsh_topk",
    # round-7 additions: the incremental-ingest and cross-doc
    # boilerplate paths must hold their delta/incidence-proportional
    # cost claims through the decades
    "dedup_incremental", "cross_doc_line_dedup", "semantic_dedup",
    "dataset_diff",
    # vocab-bound by design (Heaps' law): the curve should be ~flat
    "bpe_train_merges",
    # r7 second wave: bloom probe must stay map-side-proportional,
    # encode is vocab-bound + one token-stream join, the shuffle
    # layout is the two-pass rank, the classifier is
    # iteration-job-bound (expected ~flat)
    "decontaminate_bloom", "bpe_encode_corpus",
    "global_shuffle_layout", "quality_classifier_weights",
    "quality_classifier_filter",
    # incidence-proportional by design (positions of repeated grams)
    "repeated_span_dedup",
    # groups^2-bounded self-join fan-out on the shingle hash
    "source_similarity_matrix",
    # one corpus-sized partial agg each; k-row rollups after
    "event_rate_anomalies", "corpus_datacard",
    # streaming drain into the exactly-once file sink
    "stream_curate_sink",
    # offline fit + stateless in-stream scoring
    "stream_quality_score",
    # r8: Bloom-screened ingest (stateless probe, suspect-sized sink)
    "stream_decontaminate",
    # one-pass moment accumulation: linear scan, k-row barrier
    "embedding_pca_spectrum",
    # r8 second wave: PSI is two scans + k-row histograms (expected
    # ~scan-bound); the three shingle/token-stream operators are
    # distinct-shingle-volume-bound (one reduction, hash-keyed aggs)
    "dataset_drift_psi", "pmi_collocations",
    "doc_duplication_score", "contamination_severity",
    # bounded per-doc window selection: ~2/(w+1) of the gram stream
    "winnow_fingerprints",
    # one corpus-sized (source, token) agg; vocabulary-sized after
    "source_term_divergence",
    # streaming drift monitor: stateless binning, keyspace-bound state
    "stream_drift_psi",
    # word-bigram stupid-backoff LM: transition stream joins the
    # (non-broadcast-by-fiat) bigram table once
    "wordlm_quality",
    # MOSS pair overlap over the thinned winnow index
    "winnow_overlap_pairs",
    # vocabulary churn: two token counts + a vocab-sized outer join
    "vocabulary_diff",
    # power-law fit: one (group, term) count, then k-row OLS
    "zipf_slope_audit",
    # hash-keyed candidate join, volume ∝ shared-shingle incidence
    "containment_pairs",
    # two slot-mean folds, (groups x dim)-row tail
    "embedding_centroid_drift",
    # r8 third wave: DSIR is two gram-stream passes + a 512-row
    # broadcast; the near-dup leakage audit rides the MinHash chain +
    # two id joins; fertility is the Heaps-law encode + k-key rollup;
    # the stream scorer drains codegen micro-batches via foreachBatch
    "dsir_select", "split_leakage_neardup", "tokenizer_fertility",
    "stream_dsir_score",
    # scan + group-limit top-k: expected scan-bound
    "weighted_sample_tokens",
    # one projection + k-key group-by: expected scan-bound
    "lang_mismatch_audit",
    # real stdlib codec roundtrips: Arrow-batched synth + parse, cost
    # ∝ blob bytes (first decade only — the sf10 blob synthesis is
    # harness cost, not engine cost)
    "multimodal_image_real", "multimodal_audio_real",
    "multimodal_video_real",
    # scan-bound rows completing the third decade (r8 review: HUGE
    # membership alone never runs — the run set is this list)
    "split_leakage_audit", "group_percentile_clip", "temperature_mix",
    # streaming weighted reservoir: k-row state per batch, merge-exact
    "stream_weighted_sample",
    # one projection + the packing cumsum, k-row output
    "context_length_plan",
    # fingerprint group-by (normalized) and the minhash-chain rollup
    "dedup_normalized", "neardup_rate_by_source",
    # two-level SemDeDup: k ∝ n cells via the coarse→fine scan
    "semantic_dedup_2level",
    # Lee et al. ACTION step: cut + reassemble (incidence-bound rebuild)
    "cut_repeated_spans",
    # leakage repair: CC labels + two id-keyed joins + k-row aggs
    "split_repair_neardup",
    # int8-quantized knn: codegen quantize + fold dots, one scan
    "ann_quantized_topk",
    # r9 (VERDICT r8 items 4/5): the CC family — pointer-jumping label
    # rounds + checkpoint cadence are exactly the machinery that only
    # misbehaves at scale — and the composed pool→SemDeDup pipeline
    "dedup_clusters", "embedding_neardup_clusters",
    "semantic_dedup_pooled",
    # r11 debuts: star-edge clustering (per-bucket min + one hash
    # join), occupancy telemetry (joinless rollup), incremental CC
    # (delta-contracted graph + broadcast remap), and the perceptual
    # image-hash family (Arrow decode+hash, banded Hamming pairing);
    # editdist_neardup joins the measured curve proper now that
    # PassJoin candidates are ∝ true matches (r10 fixed the block²
    # blowup that kept it out)
    "dedup_star_clusters", "dedup_band_occupancy",
    "dedup_incremental_cc", "image_phash", "image_phash_neardup",
    "editdist_neardup",
]

# third-decade subset: the heaviest curve queries — sf10 is ~60M
# lineitem rows, so keep the set small enough to finish in-round
HUGE_QUERIES = [
    "embedding_neardup_lsh", "stream_running_totals", "stream_dedup",
    "pipeline_stats", "dedup_minhash_lsh",
    # r8 (VERDICT r7 items 3/6): the end-to-end curation flagship and
    # the cross-set MinHash path join the third decade, plus
    # window_ntile's two-pass rank (highest remaining first-decade
    # ratio) and the two approximation audits at the scale where
    # their caps bind
    "pipeline_curate", "decontaminate_fuzzy", "window_ntile",
    "ann_recall", "dedup_minhash_estimate",
    "dedup_incremental", "cross_doc_line_dedup", "semantic_dedup",
    "bpe_train_merges",
    "decontaminate_bloom", "bpe_encode_corpus", "global_shuffle_layout",
    "repeated_span_dedup", "embedding_pca_spectrum",
    "source_similarity_matrix", "corpus_datacard",
    "quality_classifier_weights", "quality_classifier_filter",
    "event_rate_anomalies", "stream_curate_sink",
    "stream_quality_score", "stream_decontaminate",
    "dataset_drift_psi", "pmi_collocations",
    "doc_duplication_score", "contamination_severity",
    # bounded per-doc window selection: ~2/(w+1) of the gram stream
    "winnow_fingerprints",
    # one corpus-sized (source, token) agg; vocabulary-sized after
    "source_term_divergence",
    # streaming drift monitor: stateless binning, keyspace-bound state
    "stream_drift_psi",
    # word-bigram stupid-backoff LM: transition stream joins the
    # (non-broadcast-by-fiat) bigram table once
    "wordlm_quality",
    # MOSS pair overlap over the thinned winnow index
    "winnow_overlap_pairs",
    # vocabulary churn: two token counts + a vocab-sized outer join
    "vocabulary_diff",
    # power-law fit: one (group, term) count, then k-row OLS
    "zipf_slope_audit",
    # hash-keyed candidate join, volume ∝ shared-shingle incidence
    "containment_pairs",
    # two slot-mean folds, (groups x dim)-row tail
    "embedding_centroid_drift",
    # r8 third wave (see QUERIES_TO_RUN note)
    "dsir_select", "split_leakage_neardup", "tokenizer_fertility",
    "stream_dsir_score",
    # r8 curve completion: every remaining QUERIES_TO_RUN row joins
    # the third decade (the sf10 corpus is cheap to keep resident now
    # that every heavy family has a measured point; scan-bound rows
    # cost seconds and close the "derived, not measured" gap)
    "agg_q1", "join_three", "ann_lsh_topk", "dataset_diff",
    "kmeans_cluster_sizes", "stream_interval_join",
    "weighted_sample_tokens", "lang_mismatch_audit",
    "split_leakage_audit", "group_percentile_clip", "temperature_mix",
    "stream_weighted_sample", "context_length_plan",
    "dedup_normalized", "neardup_rate_by_source",
    # r8 fifth wave: two-level SemDeDup (k ∝ n via coarse→fine scan)
    "semantic_dedup_2level",
    # Lee et al. ACTION step over the repeated-span machinery
    "cut_repeated_spans",
    # int8-code scan: persisted code table + fold dots, one corpus pass
    "ann_quantized_topk",
    # chunk->doc pooling: one doc-keyed exchange + ordered fold
    "embedding_pool_chunks",
    # its float baseline (same scan shape, 4x the bytes)
    "knn_cosine",
    # leakage repair (CC fixed cost; edge set bounded by design)
    "split_repair_neardup",
    # r9 (VERDICT r8 items 4/5): third-decade rows for the iterative
    # CC family and the composed pool→SemDeDup pipeline
    "dedup_clusters", "embedding_neardup_clusters",
    "semantic_dedup_pooled",
    # r9 debuts: posting-table lexical retrieval + the fused hybrid;
    # fixed-k greedy rounds (kcenter/mmr); score-cardinality-bounded
    # rollups (AUC, calibration, in-stream AUC); char-stream entropy;
    # anchor-broadcast hard negatives; vocab-bounded coverage
    "bm25_topk", "char_entropy_quality", "kcenter_coreset",
    "classifier_auc", "vocab_coverage_curve", "hard_negative_mining",
    "mmr_rerank", "score_calibration", "stream_score_auc",
    "hybrid_rank_fusion",
    # r11: editdist_neardup's r9 exclusion (length-blocked candidates
    # ~1.4e9 pairs at sf10) is obsolete — PassJoin candidates are
    # ∝ true matches (sf10 measured 33.2s in its debut round); the
    # r11 debuts join all three decades alongside it
    "editdist_neardup",
    "dedup_star_clusters", "dedup_band_occupancy",
    "dedup_incremental_cc", "image_phash", "image_phash_neardup",
]


def time_query(spark, fn, sf_dir: str, warm_dir: str, reps: int,
               cache) -> tuple[float | None, str | None]:
    """Best-of-`reps` noop-sink wall time, or (None, error) if every
    rep failed. One flaky rep no longer aborts the audit (r4 ADVICE):
    each rep is individually guarded and caches are unpersisted even
    on the failure path."""
    try:
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    cache.unpersist_all()
    best, last_err = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        except Exception as e:
            last_err = f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=2, file=sys.stderr)
        finally:
            cache.unpersist_all()
    return best, (None if best is not None else last_err)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/root/repo/var/sf1")
    ap.add_argument("--huge", default=None,
                    help="optional sf10 dir for a third curve point "
                         "on the HUGE_QUERIES subset")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    if not os.path.isdir(args.big):
        print(f"missing {args.big}; run tools/make_scale.py first",
              file=sys.stderr)
        sys.exit(1)

    from rivulus_spark import cache, get_spark
    from rivulus_spark.workload import QUERIES

    spark = get_spark("rivulus-scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"

    names = args.queries or QUERIES_TO_RUN
    curve: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        t_small, err_s = time_query(spark, fn, args.small, warm_dir,
                                    args.reps, cache)
        t_big, err_b = time_query(spark, fn, args.big, warm_dir,
                                  args.reps, cache)
        entry: dict = {}
        if t_small is not None:
            entry["sf0.1_sec"] = round(t_small, 3)
        if t_big is not None:
            entry["sf1_sec"] = round(t_big, 3)
        if t_small and t_big:
            entry["ratio"] = round(t_big / t_small, 2)
        err = err_s or err_b
        if err:
            entry["error"] = err
        if (args.huge and os.path.isdir(args.huge)
                and name in HUGE_QUERIES):
            t_huge, err_h = time_query(spark, fn, args.huge, warm_dir,
                                       args.reps, cache)
            if t_huge is not None:
                entry["sf10_sec"] = round(t_huge, 3)
                if t_big:
                    entry["ratio_sf10_sf1"] = round(t_huge / t_big, 2)
            elif err_h:
                entry["error_sf10"] = err_h
        curve[name] = entry
        print(f"{name}: {entry}", file=sys.stderr)

    out = {
        "data_ratio": 10,
        "note": ("best-of-%d noop-sink timings; ratio <= ~10 is linear "
                 "on fixed cores, << 10 means fixed costs dominate the "
                 "small point; sf10 entries are a third decade on the "
                 "heaviest subset" % args.reps),
        "queries": curve,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_CURVE.json")
    # merge over a prior curve so a partial re-run (e.g. --queries or
    # the sf10 subset) refreshes its rows without dropping the rest
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior_doc = json.load(f)
            # the hand-written analysis block documents WHY each ratio
            # is what it is — a partial re-run must not drop it
            if "analysis" in prior_doc:
                out["analysis"] = prior_doc["analysis"]
            prior = prior_doc.get("queries", {})
            for k, v in prior.items():
                if k not in curve:
                    out["queries"][k] = v
                elif "sf10_sec" in v and "sf10_sec" not in curve[k]:
                    curve[k].update({kk: vv for kk, vv in v.items()
                                     if kk.startswith("sf10")
                                     or kk == "ratio_sf10_sf1"})
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"scale_curve": path}))
    spark.stop()


if __name__ == "__main__":
    main()
