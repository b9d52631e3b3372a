"""Regenerate PLANS.md: formatted physical plans of representative queries
with commentary. Usage: python tools/gen_plans.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparsity_spark.session import get_spark

PICKS = {
    "a1_onehot_groupby_sum": (
        "Flagship: events scan → zero-shuffle one-hot projection → ONE "
        "partial+final HashAggregate. The scan reads only the 4 needed "
        "columns; no Python anywhere."
    ),
    "q1_pricing_summary": (
        "TPC-H Q1: predicate pushed to the parquet footer (PushedFilters), "
        "column-pruned ReadSchema, partial aggregation before the single "
        "key shuffle."
    ),
    "q5_regional_revenue": (
        "Multi-join star query: the fact table shuffles once; every "
        "dimension arrives as a BroadcastHashJoin — no dimension shuffle "
        "at any scale."
    ),
    "dedup_simhash_pairs": (
        "Pigeonhole near-dup pairs: fingerprint is a pure projection (no "
        "aggregate), candidates come from an equi-join on 16-bit chunk "
        "keys — no CartesianProduct node exists."
    ),
    "dedup_lsh_pairs": (
        "MinHash-LSH: one HashAggregate computes all 16 minima; band keys "
        "derive from it without re-shuffling; the self-join keys on "
        "(band, band_key) so work tracks collisions."
    ),
    "pipe_decontaminate": (
        "Decontamination: benchmark side broadcast (small), training side "
        "never shuffled before its final per-doc aggregate; fanout capped "
        "upstream."
    ),
    "ann_pq_adc_topk": (
        "PQ ADC search (r4): the corpus code table equi-joins a BROADCAST "
        "per-query lookup table on (subspace, code) — raw corpus vectors "
        "never read at query time; one partial+final HashAggregate sums "
        "the m partial distances per (query, doc)."
    ),
    "dedup_substring_spans": (
        "Substring-level dedup (r4, reworked r5): ONE n-gram explode with "
        "the double-polynomial gram hash (8-byte long keys), repeated "
        "grams marked by an unordered count window keyed on the hash (no "
        "second explode, no join-back), span merging is a per-doc window "
        "— no cartesian anywhere."
    ),
    "dedup_semdedup": (
        "SemDeDup (r4, kernelized r5): zero-shuffle Arrow centroid "
        "assignment (no k-way row fanout), then ONE cid-keyed "
        "applyInPandas prune kernel — the within-cluster quadratic is a "
        "blocked matmul inside the kernel, never materialized pair rows; "
        "one shuffle total, no CartesianProduct node."
    ),
    "dedup_incremental_lsh": (
        "Incremental dedup (r4): the new batch's band keys come from ONE "
        "HashAggregate; the screening join against the corpus band store "
        "is a plain (band, band_key) equi-join — batch-vs-store work "
        "tracks collisions, and a bucketed store would shuffle nothing."
    ),
    "dedup_band_store_screen": (
        "r5: the SAME screen through the PERSISTED bucketed band store — "
        "the corpus side is a bare `Bucketed: true` scan with NO Exchange; "
        "only the batch side shuffles, into the store's bucket count "
        "(plan-asserted: exactly one fewer hashpartitioning exchange than "
        "a plain-parquet twin)."
    ),
    "multimodal_phash_pairs": (
        "r5: media dHash near-dup — the fingerprint is a pure projection "
        "(hex/md5/substring arithmetic only), pairs go through the same "
        "lossless pigeonhole chunk equi-join as text simhash; never a "
        "CartesianProduct."
    ),
    "pipe_contamination_fraction": (
        "Graded contamination (r4): ONE corpus tokenize pass — training "
        "shingles LEFT-join the BROADCAST benchmark set with a hit marker "
        "and a single aggregate counts grams and hits together (the "
        "two-pass totals-join first cut was reviewed away)."
    ),
    "t3_rollup_incremental": (
        "Rollup maintenance (r4): delta-only rollup unioned with the "
        "existing table, ONE partial+final hash re-aggregate — a "
        "full-outer join cannot broadcast, so union+agg is the shape "
        "that never shuffles the big side twice."
    ),
    "stats_profile_columns": (
        "Profiling (r4): every per-column metric of the health check rides "
        "in ONE aggregate pass (expand ×C for exact distincts), then "
        "pivots to long format via an explode of a literal struct array — "
        "no second scan, no driver loop."
    ),
    "text_bpe_encode_deep": (
        "Deep BPE encode (r9): the 64-merge kernel path — corpus explode "
        "and the final per-doc aggregate JVM-side, the Arrow kernel runs "
        "only on the DISTINCT-word table (vocab-sized), and its output "
        "broadcast-joins back; expression depth is constant regardless of "
        "merge count (the unrolled-fold form is capped at 8 merges)."
    ),
    "graph_triangles_capped": (
        "Skew-safe triangles (r9): degree filter (one aggregate + two "
        "semi-joins) BEFORE the wedge self-join, so wedge volume is "
        "n·cap² at any skew; the enumeration stays two equi-joins + one "
        "leftsemi close — never a cartesian."
    ),
    "s5_events_coo_scaled": (
        "Bucketed COO numbering (r9): the zipWithIndex shape — value-range "
        "buckets, per-bucket parallel row_number windows, a "
        "partition-count-sized offset broadcast; the only SinglePartition "
        "exchange is the lexicon-sized dictionary's."
    ),
    "emb_pca_project": (
        "PCA projection (r9): after the one-pass Gram + driver power "
        "iteration, the projection is a bare Scan → Project — the "
        "component rides as a literal array inside a zip_with fold, zero "
        "exchanges, whole-stage codegen; 100 TB projects at scan speed."
    ),
    "graph_lpa_communities": (
        "LPA (r9): the edge build shuffles once into the persisted "
        "adjacency; each round is one node-sized join + two hash "
        "aggregates keyed by node — no window operator, no wedge "
        "blowup, edge-linear at any skew."
    ),
    "graph_link_prediction": (
        "Link prediction (r9): wedges come from ONE shared-neighbor "
        "equi-join over the degree-capped edge set (volume <= n*cap^2), "
        "existing edges leave via an equi-anti-join, degrees attach as "
        "node-sized joins — no cartesian, no window."
    ),
    "text_pmi_bigrams": (
        "PMI collocations (r9): two partial+final HashAggregates over the "
        "exploded token stream (map-side combine visible), then "
        "vocabulary-keyed count joins; the persisted unigram table feeds "
        "both join sides, one tokenize pass total."
    ),
    "ann_sq8_topk": (
        "Int8 SQ scan (r9): query codes BROADCAST against the "
        "partition-parallel corpus, the integer code dot inlines into "
        "whole-stage codegen (no Python anywhere), per-query rank window "
        "pushes partial top-k map-side."
    ),
    "dedup_containment_pairs": (
        "Asymmetric containment (r10 prefix rewrite, r11 cost rework): "
        "rarest-first smaller-side prefix probe + the lossless PPJoin "
        "minimum-match filter (single-shared-prefix-gram pairs drop "
        "before verify), gram projection persisted so the corpus is "
        "shingled ONCE, pair-sized candidates eagerly checkpointed, "
        "verify = array_intersect on the cached arrays. The plan below "
        "is the checkpointed pair-sized RESULT (the operator "
        "materializes eagerly by design); the candidate pipeline's lazy "
        "shape — no cartesian, prefix slice present — is asserted in "
        "tests/test_plans.py on the _containment_candidates seam."
    ),
    "pipe_curate_containment": (
        "Curation with the containment collapse (r11): quality gate and "
        "URL/domain derivation fuse map-side; exact dedup is one hash "
        "agg; the containment components collapse via pointer-jumping "
        "on pair-sized edges; the only windows are the per-domain cap "
        "and final rollup. The containment stage materializes pair-sized "
        "state eagerly (see dedup_containment_pairs)."
    ),
    "pipe_decontaminate_fuzzy": (
        "Whole-document fuzzy decontamination (r11): BOTH the bipartite "
        "band-candidate join and the gram-array verification join "
        "broadcast the benchmark side — the training corpus is never "
        "shuffled for candidate generation (no SortMergeJoin in the "
        "plan, test-asserted); exact Jaccard verification keeps "
        "precision 1.0."
    ),
    "ann_ivfpq_delete_topk": (
        "ANN search under deletions (r11): the tombstone anti-join is a "
        "BROADCAST LeftAnti over the bucketed code scan — the probed "
        "centroid-id filter still pushes below it, so "
        "SelectedBucketsCount stays probe-sized (test-asserted) and "
        "deletion costs nothing at query time beyond the "
        "deletion-sized broadcast."
    ),
    "dedup_containment_screen": (
        "Incremental containment screen (r10): the batch's prefix grams "
        "probe the gram-BUCKETED posting store (corpus side shuffle-free "
        "— Bucketed: true in the scan) and candidates verify against the "
        "id-bucketed gram arrays; the corpus never rescans or reshuffles."
    ),
    "graph_lpa_modularity": (
        "LPA + Newman modularity (r10): the community accounting reads "
        "the session's bucketed shared edge table, runs two node-sized "
        "label joins + three hash aggregates, and finishes in PURE BIGINT "
        "micro arithmetic (q_c_micro) — no double anywhere, so no "
        "engine-dependent rounding surface."
    ),
    "stats_count_store_topk": (
        "Count store (r9): the increments land as bucketed appends; the "
        "top-k read is two hash aggregates over the (batches x keys)-"
        "sized store — the corpus is never rescanned."
    ),
    "t6_ohlc_resample": (
        "OHLC (r9): ONE partial+final HashAggregate over date_trunc "
        "buckets — min_by/max_by combine map-side like any agg, so the "
        "plan is a plain single-shuffle groupBy at any scale."
    ),
    "pipe_decontaminate_bloom": (
        "Bloom-prefilter decontamination (r11): the k-probe bitmap test "
        "is a codegen Filter on the TRAIN side BELOW the exact gram join "
        "(xxhash64 expressions, zero Python) — at 100 TB only the "
        "prefilter's survivors reach the join, the regime where the "
        "benchmark gram set is too big to broadcast raw."
    ),
    "pipe_snapshot_diff": (
        "Release diff (r11): both snapshots project to (id, md5) BEFORE "
        "the full-outer SortMergeJoin — document text never shuffles, "
        "only 32-byte hashes; the status CASE is a post-join projection "
        "and unchanged docs are filtered, so the output is diff-sized."
    ),
    "dedup_canonical_quality": (
        "Canonical selection by quality (r11): cluster labels join the "
        "scored corpus (one skinny row per doc each side) and ONE "
        "partial+final max(struct(score, -id)) hash aggregate elects "
        "each cluster's canonical — no corpus-wide window, no pair "
        "fanout."
    ),
    "pipe_shuffle_shards": (
        "Deterministic epoch shuffle (r11): hashpartitioning(shard) is "
        "the ONLY exchange — the ranking window is partitioned by shard, "
        "so no range-partitioned global sort exists at any scale "
        "(plan-asserted); each shard sorts independently, exactly the "
        "shard-writer layout."
    ),
    "text_boilerplate_fraction": (
        "Cross-doc boilerplate fraction (r11): one explode of the "
        "distinct-gram projection, ONE partial+final HashAggregate for "
        "gram df (map-side combine visible), a gram-keyed join back "
        "(AQE skew-split owns the mega-common gram), one per-doc "
        "aggregate — no window over the corpus, no Python anywhere."
    ),
    "pipe_source_dup_profile": (
        "Per-source dup profile (r11): one md5 hash aggregate for exact "
        "keepers, two skinny id-keyed joins (keeper + cluster label), "
        "one per-source partial+final aggregate — work is corpus-row-"
        "sized; the clustering pass is shared input, never recomputed "
        "here."
    ),
    "pipe_decontaminate_fuzzy_store": (
        "Fuzzy decontamination against the persisted benchmark store "
        "(r11): the store side of BOTH the band-candidate join and the "
        "gram-verify join reads Bucketed: true (plan-asserted) — the "
        "eval-suite lake is computed once at write time and never "
        "recomputed or reshuffled per training release; retirement is a "
        "deletion-sized broadcast anti-join over the same scans."
    ),
}

HEADER = """# PLANS — physical-plan audit of representative queries

Generated from `.explain("formatted")` at sf0.001 (plan shape is
scale-independent; AQE re-plans sizes at runtime). Each plan is the one we
WANT at 100 TB — pushdown + pruning at the scan, partial aggregation before
any shuffle, broadcasts for small sides, no Python in hot paths. Regenerate
with `python tools/gen_plans.py`.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gen_plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from sparsity_spark.queries import QUERIES

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [HEADER]
    # iterative operators (label propagation, multi-stage stores) carry
    # megabyte-deep lineage trees; the audit-relevant shape is the top of
    # the tree, so cap each dump — a truncated plan is readable, a 3 MB
    # one is not
    max_lines = 200
    for name, note in PICKS.items():
        df = QUERIES[name](spark, sf_dir)
        tree = df._jdf.queryExecution().explainString(mode).split("\n\n")[0]
        lines = tree.split("\n")
        if len(lines) > max_lines:
            tree = "\n".join(lines[:max_lines]) + (
                f"\n... [{len(lines) - max_lines} more lines truncated —"
                " iterative-lineage tail]"
            )
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
