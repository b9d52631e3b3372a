"""A guided tour of sparsity_spark — run with: python examples/tour.py

Covers the reference-parity surface (frames, one-hot, group-by, joins,
slicing) and the north-star extensions (dedup, ANN, text, temporal,
pipeline) against the sf0.001 testdata.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from sparsity_spark import from_pandas, read_events, sparse_one_hot
from sparsity_spark.data import load_table
from sparsity_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("tour", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("\n== 1. SparseFrame from pandas (labels, implicit zeros) ==")
    sf = from_pandas(spark, pd.DataFrame(np.identity(4) * 3, index=list("abcd")))
    print(sf.todense())

    print("\n== 2. Event-log ingest → one-hot → groupby_sum (the flagship) ==")
    events = load_table(spark, SF, "events")
    frame = read_events(events, "event_type")
    per_user = frame.groupby_sum(by="user_id")
    print(per_user.todense().head(5))

    print("\n== 3. loc / iloc / projection ==")
    print(sf.loc[["a", "c"]].todense())
    print(sf.iloc[1:3].todense())

    print("\n== 4. join / add / vstack algebra ==")
    doubled = per_user.add(per_user)
    print("sum doubles:", doubled.sum(), "==", 2 * per_user.sum())

    print("\n== 5. dedup & similarity ==")
    from sparsity_spark.operators.dedup import exact_dedup, lsh_candidate_pairs
    from sparsity_spark.operators.similarity import cosine_topk

    docs = load_table(spark, SF, "documents")
    print("exact dup groups:", exact_dedup(docs).filter("n_docs > 1").count())
    print("LSH candidate pairs:", lsh_candidate_pairs(docs).count())
    emb = load_table(spark, SF, "embeddings")
    from pyspark.sql import functions as F

    print(cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3).show(6, False))

    print("\n== 6. temporal: sessionize + as-of ==")
    from sparsity_spark.operators.temporal import session_stats

    print(session_stats(events).orderBy(F.desc("n_events")).show(3, False))

    print("\n== 7. training-data pipeline: split / chunk / tfidf ==")
    from sparsity_spark.operators.pipeline import chunk_documents, split_assign
    from sparsity_spark.operators.text import tfidf_frame

    print(split_assign(docs, "doc_id").groupBy("split").count().show())
    print("chunks:", chunk_documents(docs).count())
    tfidf = tfidf_frame(docs)
    print("tfidf frame:", tfidf.data.count(), "cells,", len(tfidf.columns), "terms")

    print("\n== 8. quantize / upsert / gap-fill / repetition / multimodal ==")
    from sparsity_spark.operators.multimodal import as_binary_assets, frame_sample
    from sparsity_spark.operators.pipeline import merge_upsert
    from sparsity_spark.operators.similarity import quantize_embeddings
    from sparsity_spark.operators.temporal import gap_fill_daily_counts
    from sparsity_spark.operators.text import repetition_stats

    print("int8 codes:", quantize_embeddings(emb).count())
    cust = load_table(spark, SF, "customer")
    upd = cust.limit(5).withColumn("c_mktsegment", F.lit("UPDATED"))
    merged = merge_upsert(cust, upd, key_cols=["c_custkey"])
    print("upserted rows:", merged.filter("c_mktsegment = 'UPDATED'").count())
    print("gap-filled grid:", gap_fill_daily_counts(events).count())
    print(repetition_stats(docs).show(3, False))
    print("sampled frames:", frame_sample(as_binary_assets(docs), fake=True).count())

    print("\n== 9. analytics: funnel / retention / engagement ==")
    from sparsity_spark.operators.temporal import (
        cohort_retention,
        daily_engagement,
        funnel_steps,
    )

    print(funnel_steps(events, ["view", "click", "purchase"]).show())
    print("retention cells:", cohort_retention(events).count())
    print(daily_engagement(events).orderBy("day").show(3, False))

    print("\n== 10. curation: decontaminate / stratify / feature-hash / PQ ==")
    from sparsity_spark.operators.pipeline import decontaminate, stratified_sample
    from sparsity_spark.operators.similarity import pq_encode
    from sparsity_spark.reshape import feature_hash

    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    print("contaminated docs:", decontaminate(train, bench).count())
    print("stratified sample:", stratified_sample(docs, "doc_id", "lang", {"en": 25}, 90).count())
    fh = feature_hash(events, ["event_type"], "user_id", num_features=16)
    print("hashed features:", fh.data.count(), "cells,", len(fh.columns), "buckets")
    print("pq codes:", pq_encode(emb).count())

    print("\n== 11. round 3: k-means IVF training / sketches / mixture / model filter ==")
    from sparsity_spark.operators.pipeline import temperature_mix
    from sparsity_spark.operators.similarity import ivf_topk, kmeans_fit
    from sparsity_spark.operators.sketches import kmv_estimate, kmv_jaccard, kmv_sketch
    from sparsity_spark.operators.text import model_quality_score

    cents = kmeans_fit(emb, k=8, iters=2)
    print("trained centroids:", cents.count())
    print("ivf neighbors via trained centroids:", ivf_topk(emb, emb.limit(3), cents, k=2).count())
    sk = kmv_sketch(events, "user_id", k=64)
    print("kmv distinct-user estimate:", kmv_estimate(sk, k=64).collect()[0]["distinct_estimate"])
    clickers = kmv_sketch(events.filter("event_type = 'click'"), "user_id", k=64)
    buyers = kmv_sketch(events.filter("event_type = 'purchase'"), "user_id", k=64)
    print("clicker/buyer jaccard:", kmv_jaccard(clickers, buyers, k=64).collect()[0]["jaccard_estimate"])
    print("temperature-mixed docs:", temperature_mix(docs, "doc_id", "lang", 2.0, 0.5).count())
    model_quality_score(docs).orderBy(F.desc("model_quality")).show(3, False)

    print("\n== 12. binary TrailDB containers + PQ ADC search (r4) ==")
    import tempfile

    from sparsity_spark.operators.similarity import pq_adc_topk
    from sparsity_spark.traildb import traildb_event_table, write_tdb

    tdb = tempfile.mkdtemp(prefix="tour_tdb_") + "/demo.tdb"
    write_tdb(
        tdb,
        [
            ("0" * 31 + "1", [(1000, {"action": "open"}), (1060, {"action": "save"})]),
            ("0" * 31 + "2", [(2000, {"action": "open"})]),
        ],
    )
    print("decoded .tdb events:", traildb_event_table(spark, tdb).count())
    print("pq-adc neighbors:", pq_adc_topk(emb, emb.filter(F.col("vec_id") < 2), topk=3).count())

    print("\n== 13. curation at scale: SemDeDup / incremental dedup / hard negatives / profiling (r4) ==")
    from sparsity_spark.operators.dedup import band_keys, incremental_lsh_dedup, semdedup_prune
    from sparsity_spark.operators.pipeline import grouped_quantiles, profile_columns
    from sparsity_spark.operators.similarity import hard_negatives

    sd = semdedup_prune(emb, k=8, iters=2, threshold=0.3)
    print("semdedup pruned:", sd.filter("NOT keep").count(), "of", sd.count())
    store = band_keys(docs.filter("doc_id % 10 != 0"))
    inc = incremental_lsh_dedup(docs.filter("doc_id % 10 = 0"), store)
    print("incremental screening: new-batch dups vs stored corpus:", inc.filter("NOT keep").count())
    print("hard negatives:", hard_negatives(emb, emb.limit(3), k=3).count())
    profile_columns(docs, ["n_chars"]).show(1, False)
    print("per-source length quantiles:", grouped_quantiles(docs, "source", "n_chars").count())

    print("\n== 14. outliers / sequences / graded contamination / rollup maintenance (r4b) ==")
    from sparsity_spark.operators.pipeline import contamination_fraction
    from sparsity_spark.operators.similarity import embedding_outliers
    from sparsity_spark.operators.temporal import (
        _rollup_raw,
        incremental_rollup_merge,
        user_event_sequences,
    )

    outl = embedding_outliers(emb, k=8, iters=2)
    print("embedding outliers flagged:", outl.filter("is_outlier").count(), "of", outl.count())
    seqs = user_event_sequences(events, max_len=10)
    seqs.select("user_id", "n_events", "label").show(3, False)
    frac = contamination_fraction(train, bench)  # section 10's split
    print("contamination > 50%:", frac.filter("contamination > 0.5").count(), "training docs")
    maintained = incremental_rollup_merge(
        _rollup_raw(events.filter("event_id % 10 != 0")),
        events.filter("event_id % 10 = 0"),
    )
    print("maintained rollup buckets:", maintained.count())

    print("\n== 15. round-5: persisted dedup stores, media near-dup, LM filter ==")
    from sparsity_spark.operators.dedup import (
        append_band_store,
        append_hash_store,
        semantic_member_store,
        semantic_screen,
        write_band_store,
        write_hash_store,
    )
    from sparsity_spark.operators.multimodal import as_binary_assets, phash_pairs
    from sparsity_spark.operators.similarity import kmeans_fit
    from sparsity_spark.operators.text import lm_perplexity_score, word_bigram_lm

    corpus, batch = docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0")
    write_band_store(corpus, "tour_bands", num_buckets=8)   # bucketed BY (band, band_key)
    d = append_band_store(batch, "tour_bands")              # screen + intra-batch + append
    print("band-store increment: kept", d.filter("keep").count(), "of", d.count())
    write_hash_store(corpus, "tour_hashes", num_buckets=8)  # exact md5 ledger
    dh = append_hash_store(batch, "tour_hashes")
    print("hash-ledger increment: kept", dh.filter("keep").count(), "of", dh.count())
    cents = kmeans_fit(emb.filter("vec_id % 10 != 0"), k=8, iters=2)
    sem_store = semantic_member_store(emb.filter("vec_id % 10 != 0"), cents)
    kept = semantic_screen(emb.filter("vec_id % 10 = 0"), sem_store, cents, threshold=0.3)
    print("semantic screen survivors:", kept.count())
    pp = phash_pairs(as_binary_assets(docs.select("doc_id", "text")), max_hamming=3)
    print("perceptual (dHash) near-dup pairs:", pp.count())
    model = word_bigram_lm(corpus)
    lm = lm_perplexity_score(batch, model)
    print("LM quality filter: docs below -7 avg logp:", lm.filter("avg_logp < -7").count())

    spark.stop()
    print("\nTOUR COMPLETE")


if __name__ == "__main__":
    main()
