#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plan of each headline
workload query at sf0.001, annotated with the scale properties to look
for (pushed filters, read schemas, broadcast vs shuffle joins,
partial aggregation, codegen spans). Run after plan-affecting changes:

    python tools/plan_report.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = {
    "filter_compare": "predicate pushdown into the parquet scan",
    "select_project": "column pruning (ReadSchema carries 3 columns)",
    "agg_q1": "partial (map-side) then final HashAggregate around one exchange",
    "agg_q5": "6-table join: dimensions broadcast, facts shuffle once",
    "limit_topk": "TakeOrderedAndProject — per-partition heap, no global sort",
    "join_inner": "BroadcastHashJoin on the dimension side",
    "sql_entry_q6": "SQL entry point; all three predicates pushed",
    "range_join_events": "banded range join executes as a hash equi-join",
    "asof_join_events": "as-of via union + carry-forward window: one shuffle",
    "dedup_minhash_lsh": "LSH banding: candidates from an equi-join on band hash",
    "dedup_simhash_pairs": "pigeonhole-banded SimHash pairs (no cross join)",
    "ann_ivf_topk": ("IVF probing: cell assignment is a MapInPandas numpy "
                     "sweep over a broadcast centroid matrix (map-side, no "
                     "shuffle of the corpus, no interpreted folds); the "
                     "candidate join is an equi-join on cell id"),
    "embedding_neardup": ("blocked matmul: packed blocks persisted once, "
                          "map-side explode into block-pair ids, ONE "
                          "shuffle-hash equi-join on pair_id — no "
                          "BroadcastExchange, no nested loop; one numpy "
                          "matmul per pair inside MapInPandas"),
    "heavy_hitters": "exact top-k as TakeOrderedAndProject over partial counts",
    "embedding_neardup_lsh": ("hyperplane-LSH banding: candidates from a "
                              "shuffle-hash equi-join on (band_idx, "
                              "band_value); exact verify joins only "
                              "candidate ids — vector table broadcast "
                              "under the 256MB gate, shuffle-hash above "
                              "it, never a vector-carrying sort"),
    "editdist_neardup": ("PassJoin pigeonhole segments: candidates from a "
                         "shuffle-hash equi-join on (indexed_len, seg_idx, "
                         "substring_hash); thresholded levenshtein verify "
                         "on id-joined candidate pairs only"),
    "stratified_sample": ("content-hash sampling is a pure projection: "
                          "filter reaches the scan, no shuffle anywhere"),
    "argmax_per_group": "max_by argmax — partially aggregatable, no window sort",
    "pipeline_curate": "whole curation pipeline as one Catalyst plan",
    "decontaminate": ("shingle-hash equi-join: shuffle carries 16-byte "
                      "(hash, id) rows, never text; AQE broadcasts the "
                      "small eval side at runtime"),
    "sequence_packing": ("one hash exchange on the stream key, then a "
                         "sequential per-stream running-sum window and a "
                         "partial-aggregated groupBy"),
    "tfidf_terms": ("corpus-df table joined back on term, per-doc top-k "
                    "as a window group-limit; only (doc, term, count) "
                    "rows shuffle"),
    "embedding_quantize": ("closed-form reconstruction error: one parquet "
                           "scan, pure codegen projection — zero "
                           "exchanges, zero joins, zero Python"),
    "dedup_survivors": ("clusters -> survivors: left join to the tiny "
                        "label table + one window rank keyed on cluster; "
                        "CC rounds are localCheckpoint-truncated so the "
                        "consuming plan is O(1)"),
    "ngram_topk": ("explode -> partial-agg collapses each partition to "
                   "its distinct n-grams; rank window sees only the "
                   "aggregated table"),
    "pii_scrub": ("PII detect+redact is a pure codegen regex projection: "
                  "no shuffle, no Python; only digests leave the scan"),
    "gopher_quality": ("quality-rule flags derived from shared integer "
                       "counts in one codegen projection over the scan"),
    "partitioned_sink_roundtrip": ("read side of the hive-partitioned "
                                   "sink: lang IN (...) prunes directories "
                                   "via PartitionFilters before any row "
                                   "group is opened"),
    "train_eval_split": ("content-hash split assignment is a projection; "
                         "the only exchange is the final 3-row rollup"),
    "ann_recall": ("recall audit joins exact and LSH top-k on (q_id, "
                   "n_id) id pairs — vectors never reach the join"),
    "pipeline_curate_v2": ("Gopher gate -> PII scrub -> exact dedup -> "
                           "split assign -> per-cell quota as one plan; "
                           "shuffles carry fingerprints/ids/counts, the "
                           "scrubbed text column is pruned before any "
                           "exchange"),
    "events_resample": ("dense (user, day) grid: broadcast date spine "
                        "cross join + left join of the sparse partial-"
                        "aggregated counts — raw events shuffle only as "
                        "(key, day) aggregate rows"),
    "charlm_quality": ("alphabet²-bounded bigram model broadcast into a "
                       "map-side scoring join; training is one partial-"
                       "aggregated explode"),
    "encode_docs": ("bounded vocab broadcast into a map-side id lookup; "
                    "per-doc sequences reassemble inside the aggregate"),
    "source_quota": ("per-stratum group-limit: hot strata discard "
                     "overflow map-side, no global sort"),
    "decontaminate_fuzzy": ("cross-set MinHash+LSH: signatures on the "
                            "union, banded candidates, exact verify — "
                            "cost tracks near-dups, never "
                            "|train| x |eval|"),
    "lexicon_filter": ("one regex alternation in codegen: scan + "
                       "project, no shuffle"),
    "c4_line_filter": ("line repair as a pure array expression over "
                       "the scan"),
    "stream_interval_join": ("batch form of the watermark-bounded "
                             "stream-stream join: both sides shuffle "
                             "on the equi-key, band condition post-"
                             "filters"),
    "window_ntile": ("two-pass distributed rank: range-bucket on "
                     "approximate quantiles, broadcast prefix-sum "
                     "offsets, within-bucket row_number — every Window "
                     "is partitioned by bucket, nothing single-"
                     "partitions the data"),
    "bucketed_join_agg": ("both sides bucketed on the join key with "
                          "equal counts: the sort-merge join reads "
                          "co-located buckets with ZERO exchanges; the "
                          "only shuffle left is the final group-by"),
    "kmeans_assign_sizes": ("fixed-centroid assignment: one MapInPandas "
                            "numpy sweep over the broadcast centroid "
                            "matrix + a k-row aggregate"),
    "orc_sink_roundtrip": ("ORC read-back: n_chars filter pushed into "
                           "the ORC scan exactly as for parquet"),
    "length_histogram": ("fixed-width binning is a map-side projection; "
                         "at most n_bins rows cross the shuffle"),
    "percentile_clip": ("1-row exact-percentile aggregate broadcast "
                        "back as a band filter: the corpus is scanned, "
                        "never shuffled"),
    "csv_sink_roundtrip": ("CSV read-back through the source contract: "
                           "null token round-trips; aggregate is "
                           "partial-then-final"),
    "schema_evolution_roundtrip": ("mergeSchema scan over an evolved "
                                   "dataset: late column null-filled "
                                   "for old batches, aggregate "
                                   "partial-then-final"),
    "shard_export_manifest": ("stable pmod shard assignment read back "
                              "hive-partitioned; manifest is a bounded "
                              "per-shard aggregate"),
    "vocab_topk": ("rank-then-filter vocabulary: "
                   "TakeOrderedAndProject(limit=max_size) below the "
                   "rank window — the distinct-token table never "
                   "single-partitions"),
    "dedup_incremental": ("daily-ingest dedup: the delta is signed in one "
                          "map-only Arrow pass; corpus candidates come "
                          "from ONE equi-join of delta band rows against "
                          "the (id, bh) band index; exact verification "
                          "explodes shingles only for candidate-matched "
                          "docs (semi-join below the explode)"),
    "cross_doc_line_dedup": ("corpus boilerplate lines: distinct-doc "
                             "count over md5 line hashes with map-side "
                             "partials; only AFFECTED docs are "
                             "reassembled (semi-join gate) — untouched "
                             "docs project through unshuffled"),
    "semantic_dedup": ("SemDeDup: broadcast centroid assignment (one "
                       "Arrow pass), within-cell pairs from ONE "
                       "equi-join on cell id, exact cosine as a "
                       "grouped numpy sweep per cell — candidate "
                       "volume linear in corpus by construction"),
    "semantic_dedup_2level": ("SemDeDup at k ∝ n: ONE coarse→fine "
                              "mapInPandas assignment pass (n·2√k dot "
                              "products, fine→coarse map built "
                              "driver-side on ≤k rows), then the same "
                              "within-cell equi-join pair sweep — no "
                              "corpus×centroid join anywhere"),
    "cut_repeated_spans": ("Lee et al. action step: one (h)-keyed "
                           "window computes repeat count AND canonical "
                           "rank (no second gram scan); cut coverage "
                           "is an interval sweep per doc; ONLY "
                           "affected docs (semi-join) are reassembled "
                           "— untouched docs project through"),
    "split_repair_neardup": ("leakage repair: cluster labels joined "
                             "id-keyed, leaky clusters from one "
                             "distinct-split aggregate, quarantine is "
                             "a codegen CASE — summaries are k-row "
                             "aggs, nothing corpus²"),
    "embedding_pool_chunks": ("chunk→doc pooling: ONE doc-keyed "
                              "exchange carrying each chunk vector "
                              "once, ordered zip_with fold (n·dim "
                              "adds total), no Python — the naive "
                              "per-dimension avg would explode n·dim "
                              "rows and be float-order "
                              "nondeterministic"),
    "ann_quantized_topk": ("int8-code scoring: quantization is one "
                           "codegen zip_with per row into a PERSISTED "
                           "code table (projection collapse would "
                           "otherwise re-quantize per query through "
                           "the join), broadcast queries, fold dots, "
                           "group-limit top-k — one corpus scan at "
                           "1/4 the float32 bytes"),
    "dataset_diff": ("snapshot diff: 16-byte MD5 fingerprints "
                     "full-outer-joined on id — text columns pruned "
                     "before the exchange, classification is a "
                     "codegen CASE over null-sides"),
    "temperature_mix": ("temperature-weighted allocation: k-row "
                        "stratum table aggregates map-side, weights "
                        "computed driver-free in a k-row window, "
                        "broadcast back into the per-stratum "
                        "group-limit"),
    "group_percentile_clip": ("per-group calibration: approx "
                              "percentiles partial-aggregate per "
                              "group, k-row bounds table broadcasts "
                              "back — raw rows never shuffle"),
    "bpe_train_merges": ("tokenizer fit: ONE corpus pass collapses "
                         "to the word table; every merge round is "
                         "vocab-sized JVM-only (pair explode → "
                         "partial agg → TakeOrdered(1); codegen "
                         "fold applies the merge) — final result "
                         "is the k-row merge table"),
    "decontaminate_bloom": ("bloom-prefiltered decontamination: the "
                            "probe is a map-side Arrow MapInPandas "
                            "bit-gather (positions hashed JVM-side), "
                            "so the verify equi-join shuffles only "
                            "the ~1% survivor remnant, never the "
                            "corpus shingle stream"),
    "bpe_encode_corpus": ("tokenizer apply: merges fold over the "
                          "DISTINCT-word table (Heaps-law small), "
                          "then the token stream hash-joins the "
                          "(word, n_pieces) lookup — all JVM, no "
                          "per-token merge work"),
    "global_shuffle_layout": ("deterministic epoch shuffle: global "
                              "position via the two-pass distributed "
                              "rank on the digest's numeric prefix "
                              "(size-gated single window only under "
                              "the 64 MB input gate); shard/pos are "
                              "row-local arithmetic"),
    "quality_classifier_filter": ("model-in-the-loop filter: scoring "
                                  "is a pure codegen projection with "
                                  "trained weights as literals; the "
                                  "only shuffle is the k-row "
                                  "per-source keep-count agg"),
    "repeated_span_dedup": ("substring dedup: repeat detection is a "
                            "partial-agg count on the 60-bit gram "
                            "hash; the island-merge windows are "
                            "doc-partitioned and run over only the "
                            "repeated positions"),
    "source_similarity_matrix": ("source-overlap audit: distinct "
                                 "(source, hash) rows partial-agg "
                                 "before the 24-byte shuffle; the "
                                 "intersection self-join fans out "
                                 "at most groups^2 per shingle"),
    "stream_quality_score": ("offline model, online scoring: the "
                             "drained projection carries the trained "
                             "weights as literals — stateless, "
                             "shuffle-free per batch; the plan shown "
                             "is the post-drain keep-count rollup"),
    "stream_curate_sink": ("streaming ingest landing: the plan shown "
                           "is the read-back over the hive-"
                           "partitioned exactly-once sink; the gate+"
                           "scrub ran as per-batch codegen "
                           "projections inside the drain"),
    "event_rate_anomalies": ("volume telemetry: one partial-agg "
                             "(type, hour) rollup; stats + filter "
                             "run on the tiny hourly table"),
    "corpus_datacard": ("release datasheet: per-doc metrics fold "
                        "into two corpus-sized partial aggregates; "
                        "dup share joins the 16-byte fingerprint "
                        "counts back on the k-row group table"),
    "embedding_pca_spectrum": ("one-pass covariance: numpy X^T X per "
                               "Arrow batch, packed moment arrays "
                               "reduced by a slot-keyed sum — only "
                               "the 2145-double moment vector reaches "
                               "the driver eigendecomposition"),
    "dataset_drift_psi": ("PSI drift audit: two scans fold to k-row "
                          "(source, bin) histograms via exact integer "
                          "bit-length binning; the outer join and the "
                          "total windows run on bin-count-sized tables"),
    "doc_duplication_score": ("per-doc dup fraction: ONE distinct "
                              "(id, hash) shingle reduction feeds the "
                              "corpus frequency table and the per-doc "
                              "re-aggregation — 16-byte shuffle rows "
                              "regardless of how duplicated the corpus "
                              "is"),
    "contamination_severity": ("leaked-shingle fraction: the persisted "
                               "(t_id, h) reduction feeds the per-doc "
                               "denominator and the eval semi-join "
                               "numerator; AQE broadcasts the distinct "
                               "eval shingle set"),
    "pmi_collocations": ("collocation mining: one token stream feeds "
                         "unigram and lead-window bigram counts, "
                         "totals ride as 1-row broadcast crossJoins, "
                         "the rank window lowers to "
                         "TakeOrderedAndProject"),
    "winnow_fingerprints": ("MOSS winnowing: rightmost-minimal gram "
                            "per window from ONE bounded w-row window "
                            "min over a packed (h32, pos) key — "
                            "per-doc windows only, no joins, no "
                            "corpus-wide state"),
    "source_term_divergence": ("JS content divergence: one map-side-"
                               "combined (source, token) agg is the "
                               "only corpus-sized stage; the top-v "
                               "cut, bucket remap, and source x bucket "
                               "grid are vocabulary-sized with exact "
                               "integer window sums"),
    "wordlm_quality": ("stupid-backoff word LM: the transition stream "
                       "hash-joins the trained bigram table (AQE "
                       "broadcasts only while it fits — web-scale "
                       "bigram tables don't); totals ride as a 1-row "
                       "broadcast crossJoin"),
    "winnow_overlap_pairs": ("MOSS pair overlap: ONE equi-join on the "
                             "fingerprint hash over the 2/(w+1)-thinned "
                             "winnow index; map-side pair-count "
                             "partials, min_shared cuts the single-hit "
                             "tail"),
    "vocabulary_diff": ("term churn: two map-side-combined token "
                        "counts, one vocabulary-sized outer join, "
                        "integer-exact status classification"),
    "zipf_slope_audit": ("power-law fit: one (source, term) count, "
                         "partitioned group-limit rank, five "
                         "aggregates per k-row group"),
    "containment_pairs": ("asymmetric containment: hash-keyed "
                          "candidate equi-join (volume ∝ shared-"
                          "shingle incidence), two k-row size joins, "
                          "directed union"),
    "embedding_centroid_drift": ("centroid drift: two posexplode "
                                 "slot-mean folds (map-side partials), "
                                 "(label, slot) join, dim-row cosine "
                                 "reduction per label"),
    "dsir_select": ("DSIR: ONE conditional histogram over the target-"
                    "flagged gram stream (512-key map-side agg), lam "
                    "table broadcast onto the weighting pass, exact-"
                    "integer per-doc sum, group-limit top-k"),
    "split_leakage_neardup": ("near-dup split leakage: the adaptive "
                              "MinHash chain's verified pair table + "
                              "two id-keyed joins against the split "
                              "projection; C(3,2)-key rollup"),
    "tokenizer_fertility": ("fertility: Heaps-law BPE encode (merges "
                            "fold over the distinct-word table, token "
                            "stream joins the piece lookup) + one "
                            "metadata join + 5-key rollup of integer "
                            "sums"),
    "weighted_sample_tokens": ("A-Res weighted sample: pure projection "
                               "(content-hash uniform, ln(u)/w key) + "
                               "TakeOrderedAndProject below the rank "
                               "window — no global sort"),
    "lang_mismatch_audit": ("label-vs-detector audit: one codegen "
                            "projection (8 array_contains probes, no "
                            "CodegenFallback collection exprs) + "
                            "k-key map-side-combined group-by"),
    "stream_weighted_sample": ("streaming weighted reservoir: per-"
                               "micro-batch group-limit top-k partials "
                               "(k-row state) + ONE final re-rank — "
                               "merge-exact A-Res, row-identical to "
                               "the batch sampler"),
    "context_length_plan": ("ctx planning: one token-count projection "
                            "+ the packing cumsum reused across "
                            "candidates via a 3-literal explode; "
                            "k-row output"),
    "multimodal_video_real": ("real AVI demux: Arrow-batched synth + "
                              "stdlib RIFF walk, frame fan-out ∝ "
                              "sampled frames; closed-form per-frame "
                              "MD5 oracle"),
}

SF = "/root/testdata/sf0.001"


def main() -> None:
    from rivulus_spark import get_spark
    from rivulus_spark.workload import QUERIES

    spark = get_spark("plan-report")
    out = [
        "# PLANS — physical plans of headline queries",
        "",
        "Generated by `tools/plan_report.py` (sf0.001 inputs; plan shape",
        "is scale-independent, AQE may further split/coalesce at runtime).",
        "Each section notes the property that makes the plan viable at",
        "100 TB, then the `explain(formatted)` output to check it against.",
        "",
    ]
    for name, why in HEADLINE.items():
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        out += [f"## {name}", "", f"**Scale property:** {why}", "",
                "```", buf.getvalue().rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
