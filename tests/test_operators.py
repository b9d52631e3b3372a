"""Unit tests for the north-star operators: dedup, similarity, text,
multimodal — constructed fixtures with known answers."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparsity_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
        (2, "the quick brown fox jumps over the lazy cat", "en", "s1", 44),  # near-dup of 1
        (3, "completely different words appear here today friends", "en", "s2", 52),
        (4, "the quick brown fox jumps over the lazy dog", "en", "s3", 44),  # exact dup of 1
        (5, "der hund und die katze sind nicht da heute", "de", "s1", 42),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).toPandas()
    assert len(out) == 4  # 5 docs, one exact pair
    dup = out[out.n_docs == 2]
    assert len(dup) == 1 and dup.iloc[0].keep_id == 1


def test_minhash_lsh_finds_neardup(spark, docs):
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=16, bands=8).toPandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].to_numpy()}
    assert (1, 4) in got  # exact dup always collides
    assert (1, 2) in got or (2, 4) in got  # near-dup likely shares a band
    assert (3, 5) not in got


def test_simhash_hamming(spark, docs):
    sims = dedup.simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert sims[1] == sims[4]  # identical text → identical fingerprint
    ham_near = bin(int(sims[1]) ^ int(sims[2])).count("1")
    ham_far = bin(int(sims[1]) ^ int(sims[3])).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, block_cols=["lang"]).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.itertuples()}
    assert got[(1, 4)] == 1.0
    assert 0.5 <= got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.rand(30, 8).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(30), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") < 3), k=4).toPandas()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = norm @ norm.T
    for q in range(3):
        order = [(round(float(cos[q, j]), 4), j) for j in range(30) if j != q]
        expect = [j for _, j in sorted(order, key=lambda t: (-t[0], t[1]))[:4]]
        got = out[out.query_id == q].sort_values(["cosine", "neighbor_id"], ascending=[False, True])
        assert list(got.neighbor_id) == expect


def test_ivf_topk_stays_in_bucket(spark):
    rng = np.random.RandomState(1)
    vecs = rng.rand(40, 8).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    cents = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = similarity.ivf_topk(df, df.filter(F.col("vec_id") < 2), cents, k=3).toPandas()
    assigned = similarity.ivf_assign(df, cents).select("vec_id", "centroid_id").toPandas()
    bucket = assigned.set_index("vec_id")["centroid_id"]
    for r in out.itertuples():
        assert bucket[r.query_id] == r.centroid_id == bucket[r.neighbor_id]


def test_token_stats_and_quality(spark, docs):
    ts = text.token_stats(docs).toPandas().set_index("doc_id")
    assert ts.loc[1, "ws_tokens"] == 9
    assert ts.loc[1, "distinct_tokens"] == 8  # 'the' twice
    q = text.quality_score(docs).toPandas().set_index("doc_id")
    assert q.loc[1, "stopword_ratio"] == pytest.approx(2 / 9, abs=1e-6)
    assert 0 < q.loc[1, "quality"] <= 1


def test_lang_id(spark, docs):
    out = text.lang_id(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "pred_lang"] == "en"
    assert out.loc[5, "pred_lang"] == "de"
    assert out.loc[3, "pred_lang"] == "und"  # no markers at all


def test_fingerprint_bag_invariance(spark):
    rows = [(1, "b a c"), (2, "c b a"), (3, "a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.fingerprint(df).toPandas().set_index("doc_id")
    assert out.loc[1, "bag_md5"] == out.loc[2, "bag_md5"]  # order-insensitive
    assert out.loc[1, "bag_md5"] != out.loc[3, "bag_md5"]
    assert out.loc[1, "content_md5"] != out.loc[2, "content_md5"]


def test_multimodal_fake_features(spark, docs):
    assets = multimodal.as_binary_assets(docs)
    feats = multimodal.extract_features(assets, fake=True).toPandas().set_index("doc_id")
    assert len(feats) == 5
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats.feature)
    # deterministic: same payload → same features (docs 1 and 4 share text)
    np.testing.assert_allclose(list(feats.loc[1, "feature"]), list(feats.loc[4, "feature"]))
    assert feats.loc[1, "n_bytes"] == len("the quick brown fox jumps over the lazy dog")


def test_multimodal_stub_raises(spark, docs):
    # image/jpeg: a genuinely un-decodable type (PNG became a real codec
    # in r7, so the seam test uses a format the container truly lacks)
    assets = multimodal.as_binary_assets(docs, media_type="image/jpeg")
    with pytest.raises(Exception, match="no codec|NotImplementedError|PythonException"):
        multimodal.extract_features(assets, fake=False).collect()


def test_rp_lsh_similar_vectors_collide(spark):
    rng = np.random.RandomState(4)
    base = rng.rand(64).astype("float32")
    rows = [
        (0, list(base)),
        (1, list(base + rng.rand(64).astype("float32") * 0.01)),  # near-identical
        (2, list(-base)),  # antipodal: all sign bits flip
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    df = spark.createDataFrame(pdf)
    out = similarity.random_projection_buckets(df, num_planes=8, dim=64).toPandas().set_index("vec_id")
    assert out.loc[0, "bucket"] == out.loc[1, "bucket"]
    assert out.loc[0, "bucket"] != out.loc[2, "bucket"]
    pairs = similarity.rp_lsh_candidate_pairs(df, num_planes=8, dim=64).toPandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(0, 1)}


def test_duplicate_clusters_chain_and_singleton(spark):
    # chain 1-2-3-4-5 forces multi-round propagation; 7-8 a second
    # component; 6 appears in no pair and must survive as its own cluster
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    out = (
        dedup.duplicate_clusters(pairs, ids)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 7}


def test_canonical_pick_policies(spark):
    """Quality-argmax canonical selection: highest score wins, ties break
    toward the lowest id, an all-NULL-score cluster still elects its min
    id (with NULL canonical_score), singletons pick themselves."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (30, 30), (31, 30)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.9),       # argmax 0.9, tie -> id 2
            (10, None), (11, None),              # unscorable cluster -> min id
            (20, 0.5),                           # singleton
            (30, None), (31, 0.1),               # NULL ranks below real score
        ],
        "doc_id long, quality double",
    )
    out = {
        r["cluster_id"]: (r["canonical_id"], r["canonical_score"], r["n_members"])
        for r in dedup.canonical_pick(labels, scores).collect()
    }
    assert out == {
        1: (2, 0.9, 3),
        10: (10, None, 2),
        20: (20, 0.5, 1),
        30: (31, 0.1, 2),
    }


def test_grouped_centroids_match_numpy(spark, sf_dir):
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import grouped_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    got = grouped_centroids(emb).toPandas().sort_values(["label", "dim"]).reset_index(drop=True)
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        want = np.round(np.mean(np.stack(grp["embedding"].to_numpy()), axis=0), 4)
        sub = got[got["label"] == label]["mean_val"].to_numpy()
        assert np.allclose(sub, want, atol=1e-4), label


def test_heavy_hitters_match_pandas(spark, docs):
    got = text.heavy_hitters(docs, k=5).toPandas()
    pdf = docs.toPandas()
    df_counts = {}
    for _, row in pdf.iterrows():
        for tok in set(row["text"].split(" ")):
            df_counts[tok] = df_counts.get(tok, 0) + 1
    want = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["token"], got["df"])) == want


def test_c4_clean_line_rules_and_doc_gate(spark):
    """r8 C4 cleaning: every line rule and doc gate exercised one at a
    time — terminal punctuation, min word count, javascript mention,
    lorem ipsum / brace doc kills, and the min-surviving-lines gate."""
    from sparsity_spark.operators.text import c4_clean

    rows = [
        # all-good two-liner: kept, nothing dropped
        (1, 'this line is fine.\nand "so is this one!"'),
        # punctuationless + short + javascript lines dropped; 2 survive
        (2, "good first sentence here.\nno terminal punct\ntoo short.\n"
            "Enable JavaScript now.\nanother good line stays in?"),
        # only ONE surviving line -> doc gate fails but cleaning still runs
        (3, "only this one survives.\nnope\nalso nope"),
        # lorem ipsum kills the doc even with enough good lines
        (4, "perfectly good line here.\nlorem ipsum dolor sit amet.\nmore good text."),
        # brace kills the doc
        (5, "var config = { a: 1 };\nthis good line is wasted.\nso is this one."),
    ]
    got = (
        c4_clean(spark.createDataFrame(rows, "doc_id long, text string"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "clean_text"] == rows[0][1]
    assert got.loc[1, "kept"] and got.loc[1, "n_lines_dropped"] == 0
    assert got.loc[2, "clean_text"] == (
        "good first sentence here.\nanother good line stays in?"
    )
    assert got.loc[2, "kept"] and got.loc[2, "n_lines_dropped"] == 3
    assert got.loc[3, "n_lines_kept"] == 1 and not got.loc[3, "kept"]
    assert got.loc[4, "n_lines_kept"] == 3 and not got.loc[4, "kept"]
    assert not got.loc[5, "kept"]
    # threshold knobs are honored
    relaxed = (
        c4_clean(
            spark.createDataFrame(rows[2:3], "doc_id long, text string"),
            min_lines=1,
        )
        .collect()[0]
    )
    assert relaxed["kept"]


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x"), (3, "a b a b a")], "doc_id long, text string"
    )
    got = text.repetition_stats(df).toPandas().set_index("doc_id")
    assert abs(got.loc[1, "dup_token_ratio"] - (1 - 2 / 3)) < 1e-6
    assert got.loc[1, "dup_2gram_ratio"] == 0.0
    assert abs(got.loc[1, "top_token_frac"] - 2 / 3) < 1e-6
    assert got.loc[2, "dup_token_ratio"] == 0.0
    assert got.loc[2, "dup_2gram_ratio"] == 0.0
    assert got.loc[2, "top_token_frac"] == 1.0
    assert abs(got.loc[3, "dup_token_ratio"] - 0.6) < 1e-6
    assert abs(got.loc[3, "dup_2gram_ratio"] - 0.5) < 1e-6
    assert abs(got.loc[3, "top_token_frac"] - 0.6) < 1e-6


def test_frame_sample_stride_and_stub(spark, docs):
    import math

    assets = multimodal.as_binary_assets(docs)
    got = multimodal.frame_sample(assets, every_k=2, fake=True).toPandas()
    pdf = docs.toPandas()
    for _, row in pdf.iterrows():
        n_frames = math.ceil(len(row["text"].encode()) / 64)
        want_idx = list(range(0, n_frames, 2))
        sub = got[got["doc_id"] == row["doc_id"]].sort_values("frame_idx")
        assert list(sub["frame_idx"]) == want_idx, row["doc_id"]
    # the real-codec path must surface the NotImplementedError contract
    with pytest.raises(Exception, match="no codec"):
        multimodal.frame_sample(assets, every_k=2, fake=False).collect()


def test_quantize_embeddings_roundtrip_error(spark, sf_dir):
    import numpy as np

    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    q = quantize_embeddings(emb).toPandas()
    assert q["code"].abs().max() <= 127
    orig = emb.toPandas()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for _, r in orig.iterrows()}
    for vec_id, grp in q.groupby("vec_id"):
        grp = grp.sort_values("dim")
        scale = grp["scale"].iloc[0]
        deq = grp["code"].to_numpy() * scale / 127.0
        # half-step quantization error bound (+ rounding slack on scale)
        assert np.abs(deq - vecs[vec_id]).max() <= scale / 254.0 + 1e-4


def test_merge_upsert_semantics(spark):
    from sparsity_spark.operators.pipeline import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B!", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    got = (
        merge_upsert(base, updates, key_cols=["k"])
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["k"]) == [1, 2, 3, 4]
    assert list(got["name"]) == ["a", "B!", "c", "d"]   # update wins, insert lands
    assert list(got["v"]) == [10.0, 99.0, 30.0, 40.0]


def test_resize_images_contract(spark, docs):
    import hashlib

    assets = multimodal.as_binary_assets(docs)
    got = multimodal.resize_images(assets, width=32, height=8, fake=True).toPandas()
    assert (got["width"] == 32).all() and (got["height"] == 8).all()
    assert (got["out_bytes"] == 3 * 32 * 8).all()
    pdf = docs.toPandas().set_index("doc_id")
    for _, row in got.iterrows():
        want = hashlib.md5(pdf.loc[row["doc_id"], "text"].encode() + b":32x8").hexdigest()
        assert row["thumb_md5"] == want
    with pytest.raises(Exception, match="no codec"):
        multimodal.resize_images(assets, fake=False).collect()


def test_pq_encode_matches_numpy(spark):
    vecs = [
        (i, [float(((i * 31 + d) % 17) / 17.0 * 2 - 1) for d in range(64)])
        for i in range(12)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = (
        similarity.pq_encode(df)
        .toPandas()
        .set_index(["vec_id", "subspace"])["code"]
        .to_dict()
    )
    book = np.array(similarity.pq_codebook(4, 16, 16))  # (m, k, sub)
    for i, v in vecs:
        x = np.array(v, dtype=np.float32).astype(np.float64)  # float storage, double math
        for s in range(4):
            xs = x[s * 16 : (s + 1) * 16]
            d2 = np.round(((xs - book[s]) ** 2).sum(axis=1), 6)
            expect = int(np.argmin(d2))  # np.argmin ties → lowest index, same rule
            assert got[(i, s)] == expect, (i, s)


def test_ivf_probe2_superset_of_probe1(spark, sf_dir):
    from sparsity_spark.data import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    q = emb.filter(F.col("vec_id") < 6)
    p1 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, q, cents, k=1000).collect()
    }
    p2 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, q, cents, k=1000, nprobe=2).collect()
    }
    assert p1 <= p2  # probing a second bucket only adds candidates
    assert len(p2) > len(p1)  # and the second bucket is not empty


def test_redact_pii_replacements_and_counts(spark):
    rows = [
        (1, "mail a.b-c%x@mail.example.org now", 1, 0, 0, 0),
        (2, "call +1-555-123-4567 or 020 7946 0958", 1 - 1, 2, 0, 0),
        (3, "ssn 123-45-6789 ip 192.168.0.1", 0, 0, 1, 1),
        (4, "nothing to hide here", 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    for doc_id, _, ne, np_, ns, nip in rows:
        r = out[doc_id]
        assert (r["n_email"], r["n_phone"], r["n_ssn"], r["n_ipv4"]) == (ne, np_, ns, nip), doc_id
    assert out[1]["redacted_text"] == "mail <EMAIL> now"
    assert out[3]["redacted_text"] == "ssn <SSN> ip <IPV4>"
    assert "555" not in out[2]["redacted_text"]
    assert out[4]["redacted_text"] == "nothing to hide here"


def test_cap_per_domain_bound_and_order(spark):
    from sparsity_spark.operators.pipeline import cap_per_domain

    rows = [(i, f"https://www.site{i % 2}.org/p/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = cap_per_domain(df, "url", max_docs=3, order_col="doc_id").toPandas()
    assert set(out.domain) == {"site0.org", "site1.org"}
    # exactly the 3 LOWEST doc_ids survive per domain (deterministic, not a sample)
    assert sorted(out[out.domain == "site0.org"].doc_id) == [0, 2, 4]
    assert sorted(out[out.domain == "site1.org"].doc_id) == [1, 3, 5]


def test_url_parts_decomposition(spark):
    from sparsity_spark.operators.pipeline import url_parts

    df = spark.createDataFrame(
        [(1, "https://a.b.example.com/x/y?q=1")], "id long, url string"
    )
    p = url_parts("url")
    row = df.select(
        p["scheme"].alias("s"), p["host"].alias("h"), p["domain"].alias("d"), p["path"].alias("p")
    ).collect()[0]
    assert (row["s"], row["h"], row["d"], row["p"]) == (
        "https", "a.b.example.com", "example.com", "/x/y"
    )


# --- weighted sampling / entropy / anomaly operators -----------------------


def test_weighted_sample_deterministic_and_weighted(spark):
    import hashlib
    import math

    from sparsity_spark.operators.pipeline import weighted_sample

    rows = [(i, f"document number {i}", 10 + 90 * (i % 7 == 0)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, wt long")

    got = weighted_sample(df, "wt", 20, "text", "doc_id").toPandas()
    assert len(got) == 20
    # exact replay of the A-Res keys driver-side
    def key(i, text, wt):
        h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
        return -math.log((h + 1) / 4294967297.0) / wt

    expect = sorted(rows, key=lambda r: (key(*r), r[0]))[:20]
    assert sorted(got.doc_id) == sorted(r[0] for r in expect)
    # a second run returns the identical sample (no RNG anywhere)
    again = weighted_sample(df, "wt", 20, "text", "doc_id").toPandas()
    assert sorted(got.doc_id) == sorted(again.doc_id)
    # heavy rows (9x weight, 1/7 of the pool) dominate the sample
    assert (got.doc_id % 7 == 0).mean() > 0.5


def test_group_entropy_known_values(spark):
    import math

    from sparsity_spark.operators.pipeline import group_entropy

    rows = (
        [("u", c) for c in ["a", "b", "c", "d"]]  # uniform over 4 -> ln(4)
        + [("v", "a")] * 5  # single category -> 0
        + [("w", "a")] * 3
        + [("w", "b")]  # 3:1 mix
    )
    out = {
        r["k"]: r
        for r in group_entropy(
            spark.createDataFrame(rows, "k string, cat string"), "k", "cat"
        ).collect()
    }
    assert out["u"]["entropy"] == round(math.log(4), 4) and out["u"]["n"] == 4
    assert out["v"]["entropy"] == 0.0 and out["v"]["n"] == 5
    expect_w = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out["w"]["entropy"] == round(expect_w, 4)


def test_daily_anomalies_flags_spike_only(spark):
    import datetime as dt

    from sparsity_spark.operators.temporal import daily_anomalies

    rows = []
    eid = 0
    # user 1: 10 steady days of 5 events, one day of 50 -> spike flagged
    for d in range(11):
        for _ in range(50 if d == 10 else 5):
            rows.append((eid, 1, dt.datetime(2024, 1, 1 + d, 12, 0, 0)))
            eid += 1
    # user 2: constant 5/day (sd=0) -> never flagged
    for d in range(11):
        for _ in range(5):
            rows.append((eid, 2, dt.datetime(2024, 1, 1 + d, 12, 0, 0)))
            eid += 1
    # user 3: only 2 active days -> below min_days, excluded
    for d in range(2):
        rows.append((eid, 3, dt.datetime(2024, 1, 1 + d, 12, 0, 0)))
        eid += 1

    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = daily_anomalies(ev, "user_id", "ts", min_days=5, z_threshold=2.0).collect()
    assert [(r["user_id"], r["day"], r["n"]) for r in got] == [(1, "2024-01-11", 50)]
    assert got[0]["z"] > 3.0


def test_kmeans_fit_recovers_separated_clusters(spark):
    """Two well-separated blobs, k=2: Lloyd must converge to the blob means
    (matching a numpy reference run of the same deterministic algorithm)."""
    rng = np.random.RandomState(11)
    blob_a = rng.randn(30, 4) * 0.05 + np.array([1.0, 1.0, 1.0, 1.0])
    blob_b = rng.randn(30, 4) * 0.05 + np.array([-1.0, -1.0, -1.0, -1.0])
    pts = np.vstack([blob_a, blob_b])
    pdf = pd.DataFrame(
        {"vec_id": range(len(pts)), "embedding": [list(map(float, p)) for p in pts]}
    )
    emb = spark.createDataFrame(pdf)
    cents = similarity.kmeans_fit(emb, k=2, iters=3).toPandas().sort_values("centroid_id")
    got = np.array([np.array(c) for c in cents["embedding"]])
    # one centroid per blob, each within noise distance of the blob mean
    means = np.array([blob_a.mean(axis=0), blob_b.mean(axis=0)])
    d = np.linalg.norm(got[:, None, :] - means[None, :, :], axis=2)
    assert sorted(d.argmin(axis=1).tolist()) == [0, 1]  # both blobs claimed
    assert d.min(axis=1).max() < 0.1


def test_kmeans_empty_cluster_drops(spark):
    """k larger than the number of distinct points: surplus centroids lose
    all members and drop out, classic Lloyd semantics."""
    pts = [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0]]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1, 2], "embedding": pts})
    )
    cents = similarity.kmeans_fit(emb, k=3, iters=2).toPandas()
    assert len(cents) <= 3
    got = {tuple(np.round(c, 6)) for c in cents["embedding"]}
    assert (10.0, 10.0) in got and (0.0, 0.0) in got


def test_model_quality_score_orders_sensibly(spark):
    from sparsity_spark.operators.text import model_quality_score

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the cat sat on the mat and it is a good day in the sun",
                "zzzz 123 @@@@ ???? 999",
            ],
        }
    )
    out = (
        model_quality_score(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")["model_quality"]
    )
    assert 0.0 < out[2] < out[1] < 1.0  # fluent English beats junk


def test_kmv_sketch_merge_and_accuracy(spark):
    from sparsity_spark.operators.sketches import kmv_estimate, kmv_sketch, kmv_union

    n = 5000
    df = spark.range(n).withColumnRenamed("id", "v")
    sk = kmv_sketch(df, "v", k=256)
    est = kmv_estimate(sk, k=256).collect()[0]["distinct_estimate"]
    assert abs(est - n) / n < 0.15  # k=256 → ~6% stderr; generous bound

    # mergeability: union of two half-sketches == sketch of the union
    lo = kmv_sketch(df.filter("v < 2500"), "v", k=256)
    hi = kmv_sketch(df.filter("v >= 2500"), "v", k=256)
    merged = kmv_union(lo, hi, k=256).toPandas()
    direct = kmv_sketch(df, "v", k=256).toPandas()
    assert list(merged.h) == list(direct.h)

    # below-k sets are exact
    small = kmv_sketch(spark.range(10).withColumnRenamed("id", "v"), "v", k=64)
    assert kmv_estimate(small, k=64).collect()[0]["distinct_estimate"] == 10.0


def test_cms_upper_bound_merge_and_accuracy(spark):
    """r7 count-min: estimates are upper bounds on true frequency, tight
    for heavy hitters when width ≫ distinct values; merging half-sketches
    cell-wise equals the whole-corpus sketch exactly."""
    from sparsity_spark.operators.sketches import cms_estimate, cms_merge, cms_sketch

    # skewed stream: value v appears (50 - v) times for v in 0..49
    rows = [(v,) for v in range(50) for _ in range(50 - v)]
    df = spark.createDataFrame(rows, "v long")
    sk = cms_sketch(df, "v", width=512, depth=3)
    probes = spark.range(60).withColumnRenamed("id", "v")  # incl. absent keys
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(sk, probes, "v", width=512, depth=3).collect()
    }
    true = {v: 50 - v for v in range(50)}
    for v in range(60):
        t = true.get(v, 0)
        assert est[v] >= t, (v, est[v], t)  # never underestimates
        assert est[v] - t <= len(rows) * 2 / 512 + 1  # CMS error bound (+1 slack)
    # 50 distinct into width 512: the top value is exact w.h.p.
    assert est[0] == 50

    half1 = cms_sketch(df.filter("v < 25"), "v", width=512, depth=3)
    half2 = cms_sketch(df.filter("v >= 25"), "v", width=512, depth=3)
    merged = cms_merge(half1, half2).toPandas().sort_values(["d", "bucket"]).reset_index(drop=True)
    whole = sk.toPandas().sort_values(["d", "bucket"]).reset_index(drop=True)
    assert merged.equals(whole)


def test_kmv_jaccard_tracks_true_overlap(spark):
    from sparsity_spark.operators.sketches import kmv_jaccard, kmv_sketch

    a = spark.range(0, 3000).withColumnRenamed("id", "v")       # 0..2999
    b = spark.range(1500, 4500).withColumnRenamed("id", "v")    # 1500..4499
    # true J = 1500 / 4500 = 0.3333
    ska = kmv_sketch(a, "v", k=256)
    skb = kmv_sketch(b, "v", k=256)
    est = kmv_jaccard(ska, skb, k=256).collect()[0]["jaccard_estimate"]
    assert abs(est - 1 / 3) < 0.1


def test_kmv_prefilter_is_lossless(spark):
    from sparsity_spark.operators.sketches import kmv_sketch

    df = spark.range(50_000).withColumnRenamed("id", "v")
    fast = kmv_sketch(df, "v", k=128, prefilter_fraction=0.3).toPandas()
    naive = kmv_sketch(df, "v", k=128, prefilter_fraction=None).toPandas()
    assert list(fast.h) == list(naive.h)


def test_kmv_prefilter_adversarial_sorted_layout(spark):
    """ADVICE r3: input pre-sorted DESCENDING by hash value defeated the
    old limit()-based sample; the uniform Bernoulli sample must produce
    the identical sketch on any layout."""
    from sparsity_spark.operators.sketches import _h60, kmv_sketch

    import pyspark.sql.functions as F

    df = (
        spark.range(50_000)
        .withColumnRenamed("id", "v")
        .orderBy(_h60(F.col("v")).desc())
    )
    fast = kmv_sketch(df, "v", k=128, prefilter_fraction=0.3).toPandas()
    naive = kmv_sketch(df, "v", k=128, prefilter_fraction=None).toPandas()
    assert list(fast.h) == list(naive.h)


def test_load_binary_files_roundtrip(spark, tmp_path):
    """binaryFile ingestion: raw files on disk surface as binary assets with
    byte-exact content and the same meta schema as table-borne payloads."""
    import os

    from sparsity_spark.operators.multimodal import extract_features, load_binary_files

    d = str(tmp_path / "media")
    os.makedirs(d)
    payloads = {"a.img": b"\x89fakeimg" * 40, "b.img": b"\x00\x01\x02" * 10, "skip.txt": b"nope"}
    for name, data in payloads.items():
        with open(f"{d}/{name}", "wb") as f:
            f.write(data)

    assets = load_binary_files(spark, d, glob="*.img", media_type="image/fake")
    got = {os.path.basename(r["asset_id"]): r for r in assets.collect()}
    assert set(got) == {"a.img", "b.img"}  # glob pruned the .txt
    assert bytes(got["a.img"]["content"]) == payloads["a.img"]
    assert got["b.img"]["meta"]["n_bytes"] == 30
    assert got["b.img"]["meta"]["media_type"] == "image/fake"
    # plugs into the existing Arrow feature pipeline unchanged (the
    # extractor's contract keys assets by a long id — hash the path)
    keyed = assets.withColumn("doc_id", F.xxhash64("asset_id")).drop("asset_id")
    feats = extract_features(keyed, fake=True)
    assert feats.count() == 2


def test_ann_recall_vs_bruteforce(spark):
    """VERDICT r3 #6: quantify IVF recall@k against the exact brute-force
    top-k on the real sf0.01 embeddings so bucket/centroid changes can't
    silently destroy recall. nprobe=2 must clear 0.7 and beat nprobe=1;
    RP-LSH bucket candidates must cover a solid share of true neighbors."""
    import pyspark.sql.functions as F

    from sparsity_spark.data import load_table
    from sparsity_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    k = 5

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=k).collect()
    }
    assert len(truth) == 20 * k

    cents = similarity.kmeans_fit(emb, k=8, iters=2)

    def ivf_recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(emb, queries, cents, k=k, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2, r3 = ivf_recall(1), ivf_recall(2), ivf_recall(3)
    # floors re-measured under the r5 hash-sampled init (VERDICT r4 #6):
    # nprobe 1..4 = 0.23 / 0.46 / 0.65 / 0.72 on this near-uniform corpus
    assert r2 >= 0.35, f"IVF nprobe=2 recall@{k} = {r2}"
    assert r3 >= 0.55, f"IVF nprobe=3 recall@{k} = {r3}"
    assert r1 <= r2 <= r3, (r1, r2, r3)

    # RP-LSH: exact 8-bit bucket agreement is strict on this near-uniform
    # synthetic data (absolute recall ~3%), so pin the LIFT over chance:
    # true neighbors collide several times more often than random pairs do
    # (measured ~6.5x here)
    pairs = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in similarity.rp_lsh_candidate_pairs(emb, num_planes=8).collect()
    }
    n_vecs = emb.count()
    chance = len(pairs) / (n_vecs * (n_vecs - 1) / 2)
    truth_pairs = {(min(q, n), max(q, n)) for q, n in truth}
    lsh_recall = len(truth_pairs & pairs) / len(truth_pairs)
    assert lsh_recall >= 3 * chance, (lsh_recall, chance)


def test_pq_adc_topk_matches_numpy(spark):
    """ADC distances equal the numpy LUT computation exactly (same round-6
    discipline), and ADC recall vs exact L2 top-k is meaningfully high on
    the real embeddings (compressed 64 floats -> 4 codes, so it's lossy)."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import pq_adc_topk, pq_sampled_codebook

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = pq_adc_topk(emb, queries, topk=5).toPandas()

    pdf = emb.toPandas()
    X = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype("float64")
    ids = pdf["vec_id"].to_numpy()
    m, k, dim = 4, 16, 64
    sub = dim // m
    # data-sampled codebook: subspaces of the k lowest-id vectors
    order = np.argsort(ids)[:k]
    C = np.stack([[X[i, s * sub : (s + 1) * sub] for i in order] for s in range(m)])
    # codes: per vec per subspace, argmin of round6 distances (ties->lowest)
    codes = np.empty((len(X), m), dtype=int)
    for s in range(m):
        d2 = (((X[:, s * sub : (s + 1) * sub])[:, None, :] - C[s][None]) ** 2).sum(2).round(6)
        codes[:, s] = d2.argmin(1)
    id2row = {int(v): i for i, v in enumerate(ids)}
    for q in range(10):
        qv = X[id2row[q]]
        lut = np.empty((m, k))
        for s in range(m):
            lut[s] = (((qv[s * sub : (s + 1) * sub])[None, :] - C[s]) ** 2).sum(1).round(6)
        adc = np.array([round(sum(lut[s, codes[i, s]] for s in range(m)), 6) for i in range(len(X))])
        order = sorted((adc[i], int(ids[i])) for i in range(len(X)) if int(ids[i]) != q)[:5]
        got = out[out.query_id == q].sort_values(["adc_d2", "neighbor_id"])
        assert [int(x) for x in got.neighbor_id] == [j for _, j in order], q
        np.testing.assert_allclose(got.adc_d2.to_numpy(), [d for d, _ in order], atol=1e-9)

    # recall vs exact L2 top-5 (quantify the compression loss; pin a floor)
    hits = 0
    for q in range(10):
        qv = X[id2row[q]]
        l2 = ((X - qv) ** 2).sum(1)
        exact = [int(ids[i]) for i in np.argsort(l2) if int(ids[i]) != q][:5]
        got5 = set(out[out.query_id == q].neighbor_id.astype(int))
        hits += len(got5 & set(exact))
    recall = hits / 50
    assert recall >= 0.2, recall  # lossy 64->4 compression; catches collapse


def test_substring_dup_spans_fixture(spark):
    """Lee-et-al-style substring dedup on a constructed corpus: a passage
    shared by two docs is flagged in both, within-doc repetition is
    flagged, unique text is not; overlapping hits merge into one span."""
    shared = " ".join(f"s{i}" for i in range(25))  # 25 tokens > n=20
    uniq_a = " ".join(f"a{i}" for i in range(30))
    uniq_b = " ".join(f"b{i}" for i in range(30))
    rep = " ".join(f"r{i % 20}" for i in range(40))  # 20-token block twice
    docs = spark.createDataFrame(
        [
            (1, uniq_a + " " + shared),
            (2, shared + " " + uniq_b),
            (3, rep),
            (4, " ".join(f"c{i}" for i in range(60))),  # fully unique
        ],
        "doc_id long, text string",
    )
    out = (
        dedup.substring_dup_spans(docs, n=20)
        .toPandas()
        .set_index("doc_id")
        .to_dict("index")
    )
    assert 4 not in out  # unique doc untouched
    assert set(out) == {1, 2, 3}
    # shared 25-token passage -> 6 overlapping 20-gram hits -> ONE span of
    # exactly 25 covered tokens in each doc
    for d in (1, 2):
        assert out[d]["n_spans"] == 1
        assert out[d]["n_dup_grams"] == 6
        assert out[d]["dup_tokens"] == 25
    # the periodic doc repeats its 20-gram everywhere -> one full-doc span
    assert out[3]["n_spans"] == 1
    assert out[3]["dup_tokens"] == 40


def test_semdedup_prunes_within_cluster_dups(spark):
    """Two separated blobs; one blob holds an exact-duplicate pair and one
    near-duplicate pair, the other is spread out. SemDeDup must keep the
    lowest id of each duplicate pair and never prune across clusters."""
    base_a = np.array([1.0, 1.0, 0.0, 0.0])
    base_b = np.array([-1.0, 0.0, 1.0, 0.0])
    # ids 0 and 1 are the deterministic k=2 init seeds — one per blob
    pts = [
        base_a,                      # 0: kept (lowest id of dup group)
        base_b,                      # 1: kept (other blob's seed)
        base_a,                      # 2: pruned (exact dup of 0)
        base_a * 1.01,               # 3: pruned (cosine 1.0 with 0)
        base_a + np.array([0.0, -0.9, 0.9, 0.0]),  # 4: blob A, dissimilar
        base_b + np.array([0.0, 0.9, -0.5, 0.9]),  # 5: blob B, dissimilar
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(pts)), "embedding": [list(map(float, p)) for p in pts]}
        )
    )
    out = (
        dedup.semdedup_prune(emb, k=2, iters=3, threshold=0.95)
        .toPandas()
        .sort_values("vec_id")
    )
    assert out["keep"].tolist() == [True, True, False, False, True, True]
    # the two blobs landed in different clusters
    cids = out.set_index("vec_id")["cid"]
    assert cids[0] == cids[2] == cids[3] == cids[4]
    assert cids[1] == cids[5]
    assert cids[0] != cids[1]


def test_assign_centroids_matches_kmeans_assignment(spark):
    """assign_centroids (Arrow kernel) must agree with a numpy argmin over
    the same centroids, ties to the lowest centroid id."""
    rng = np.random.RandomState(5)
    pts = rng.randn(50, 8)
    cents_np = rng.randn(4, 8)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(pts)), "embedding": [list(map(float, p)) for p in pts]}
        )
    )
    cents = spark.createDataFrame(
        pd.DataFrame(
            {
                "centroid_id": range(4),
                "embedding": [list(map(float, c)) for c in cents_np],
            }
        )
    )
    got = (
        similarity.assign_centroids(emb, cents)
        .toPandas()
        .sort_values("vec_id")["cid"]
        .to_numpy()
    )
    d2 = ((pts[:, None, :] - cents_np[None, :, :]) ** 2).sum(axis=2)
    assert (got == d2.argmin(axis=1)).all()


def test_incremental_lsh_dedup_screens_against_store(spark):
    """A new batch holding one exact twin of a stored corpus doc and one
    fresh doc: the twin collides with the store (keep=False), the fresh
    doc passes (keep=True). The corpus side is only its band table."""
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "the quick brown fox jumps over the lazy dog today",
                    "an entirely different document about spark shuffles here",
                ],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100, 101],
                "text": [
                    "the quick brown fox jumps over the lazy dog today",  # twin of 1
                    "completely novel content with no overlap whatsoever at all",
                ],
            }
        )
    )
    store = dedup.band_keys(corpus)
    out = (
        dedup.incremental_lsh_dedup(new, store)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert not out.loc[100, "keep"] and out.loc[100, "n_corpus_collisions"] == 1
    assert out.loc[101, "keep"] and out.loc[101, "n_corpus_collisions"] == 0


def test_hard_negatives_band_and_rank(spark):
    """Negatives must exclude both near-dups (cosine >= hi) and
    uninformative vectors (cosine < lo), ranked desc within the band."""
    base = np.array([1.0, 0.0, 0.0, 0.0])
    rows = [
        (0, list(base)),                                # query
        (1, list(base * 2)),                            # cosine 1.0: near-dup, excluded
        (2, [0.8, 0.6, 0.0, 0.0]),                      # cosine 0.8: at hi, excluded
        (3, [0.6, 0.8, 0.0, 0.0]),                      # cosine 0.6: in band
        (4, [0.3, 0.954, 0.0, 0.0]),                    # cosine 0.3: in band
        (5, [0.0, 1.0, 0.0, 0.0]),                      # cosine 0.0: below lo, excluded
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    out = similarity.hard_negatives(
        emb, emb.filter(F.col("vec_id") == 0), k=5, lo=0.1, hi=0.8
    ).toPandas()
    assert list(out["neighbor_id"]) == [3, 4]  # desc cosine within band
    assert (out["cosine"] < 0.8).all() and (out["cosine"] >= 0.1).all()


def test_embedding_outliers_flags_planted_straggler(spark):
    """A tight blob plus one far straggler assigned to the same centroid:
    only the straggler's z-score crosses the threshold. A second
    singleton-cluster point (std 0) must never flag."""
    rng = np.random.RandomState(9)
    blob = rng.randn(20, 4) * 0.05 + np.array([1.0, 1.0, 1.0, 1.0])
    pts = list(blob) + [np.array([3.0, 3.0, 3.0, 3.0])]  # straggler near blob A
    pts += [np.array([-50.0, -50.0, -50.0, -50.0])]      # lone far point -> own cluster
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(pts)), "embedding": [list(map(float, p)) for p in pts]}
        )
    )
    out = (
        similarity.embedding_outliers(emb, k=2, iters=3, z_threshold=2.0)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    straggler, lone = len(pts) - 2, len(pts) - 1
    assert bool(out.loc[straggler, "is_outlier"])
    assert not bool(out.loc[lone, "is_outlier"])  # singleton cluster: z forced 0
    assert not out.drop([straggler, lone])["is_outlier"].any()


def test_normalized_exact_dedup_groups_variants(spark):
    rows = [
        (1, "Hello, World!"),
        (2, "hello   world"),
        (3, "HELLO WORLD."),
        (4, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.normalized_exact_dedup(df).toPandas()
    assert len(out) == 2
    grp = out[out.n_docs == 3]
    assert len(grp) == 1 and grp.iloc[0].keep_id == 1


def test_ivf_pq_topk_respects_buckets_and_adc(spark, sf_dir):
    """IVF-PQ results must (a) only contain neighbors from the query's
    probe bucket and (b) agree with unrestricted ADC scoring wherever the
    unrestricted winner lives in that bucket."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_topk,
        pq_adc_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_pq_topk(emb, queries, cents, topk=3).toPandas()
    bucket = (
        ivf_assign(emb, cents)
        .select("vec_id", "centroid_id")
        .toPandas()
        .set_index("vec_id")["centroid_id"]
    )
    for r in got.itertuples():
        assert bucket[r.query_id] == bucket[r.neighbor_id]
    # cross-check the scores against unrestricted ADC for in-bucket pairs
    full = pq_adc_topk(emb, queries, topk=50).toPandas()
    full_scores = {(r.query_id, r.neighbor_id): r.adc_d2 for r in full.itertuples()}
    hits = 0
    for r in got.itertuples():
        if (r.query_id, r.neighbor_id) in full_scores:
            assert abs(full_scores[(r.query_id, r.neighbor_id)] - r.adc_d2) < 1e-9
            hits += 1
    assert hits > 0


def test_ivf_pq_probe2_superset_and_score_stability(spark, sf_dir):
    """nprobe=2 must (a) search a superset of nprobe=1's candidate space —
    every probe-1 result pair reappears with the IDENTICAL ADC score —
    and (b) never emit duplicate (query, neighbor) rows (a probe-join
    regression would double the summed distances)."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    # topk larger than any bucket population: results are the FULL
    # candidate sets, so the superset property is well-defined
    p1 = ivf_pq_topk(emb, queries, cents, topk=100000).toPandas()
    p2 = ivf_pq_topk(emb, queries, cents, topk=100000, nprobe=2).toPandas()
    assert not p2.duplicated(["query_id", "neighbor_id"]).any()
    s1 = {(r.query_id, r.neighbor_id): r.adc_d2 for r in p1.itertuples()}
    s2 = {(r.query_id, r.neighbor_id): r.adc_d2 for r in p2.itertuples()}
    # probe-2 candidate space contains probe-1's; scores identical where shared
    assert set(s1) <= set(s2)
    for k in s1:
        assert abs(s1[k] - s2[k]) < 1e-9


def test_remove_dup_spans_surgery(spark):
    """The shared passage vanishes from BOTH docs carrying it, unique text
    survives byte-identical, and span-free docs pass through untouched."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "shared passage alpha beta gamma delta END unique tail one two three",
                    "prefix words here shared passage alpha beta gamma delta END more stuff",
                    "totally different content with no repeats at all whatsoever ok",
                ],
            }
        )
    )
    out = (
        dedup.remove_dup_spans(docs, n=5).toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "clean_text"] == "unique tail one two three"
    assert out.loc[2, "clean_text"] == "prefix words here more stuff"
    assert out.loc[1, "n_removed"] == out.loc[2, "n_removed"] == 7
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "clean_text"].startswith("totally different")
    # statistics and removal agree on the island definition
    stats = (
        dedup.substring_dup_spans(docs, n=5).toPandas().set_index("doc_id")
    )
    assert stats.loc[1, "dup_tokens"] == out.loc[1, "n_removed"]


def test_ivfpq_recall_floor(spark):
    """VERDICT r4 #2: quantify the full IVF-PQ stack's recall@k against
    exact brute force on the real sf0.01 embeddings, and pin floors so
    codebook/routing changes can't silently destroy it. The synthetic
    corpus is near-uniform (no cluster structure for PQ to exploit), so
    absolute recall is modest by construction — the floors pin the LIFT
    over chance (~1% for top-5 of 500) and the nprobe monotonicity that
    makes the recall/cost knob trustworthy. Measured sweep: SCALE.md."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    k = 5
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=k).collect()
    }
    cents = similarity.kmeans_fit(emb, k=8, iters=2)

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_pq_topk(
                emb, queries, cents, m=4, k_code=16, dim=64, topk=k, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    n_corpus = emb.count()
    chance = k / (n_corpus - 1)
    r1, r3 = recall(1), recall(3)
    assert r3 >= 8 * chance, f"IVF-PQ nprobe=3 recall {r3} < 8x chance {chance}"
    assert r3 >= 0.12, f"IVF-PQ nprobe=3 recall@{k} = {r3} (measured 0.22)"
    assert r1 <= r3 + 1e-9, f"nprobe must not reduce recall: {r1} > {r3}"


def test_kmeans_hash_init_survives_id_correlated_data(spark):
    """VERDICT r4 #6: ids correlated with cluster membership (the ingest-
    time pattern: source A got ids 0..n, source B n..2n) must NOT collapse
    the init — the md5-hash-sampled init picks from both regions where
    first-k-by-id picked only source A's. Both true clusters must be
    recovered (one centroid near each true center)."""
    import numpy as np
    import pandas as pd

    from sparsity_spark.operators.similarity import kmeans_fit

    rng = np.random.RandomState(7)
    a = rng.normal(loc=-5.0, scale=0.1, size=(50, 8))
    b = rng.normal(loc=+5.0, scale=0.1, size=(50, 8))
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(100)),  # ids 0..49 = cluster A, 50..99 = B
            "embedding": [list(map(float, v)) for v in np.vstack([a, b])],
        }
    )
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=2, iters=3)
    got = [np.mean(r["embedding"]) for r in cents.collect()]
    assert len(got) == 2
    signs = sorted(np.sign(got))
    assert signs == [-1.0, 1.0], f"init collapsed into one region: means {got}"


def test_phash_pair_semantics(spark):
    """dHash media near-dup (VERDICT r4 #7): a byte-identical re-upload is
    hamming 0, a same-length single-character edit stays within the
    hamming budget (locality of the fake decode), and an unrelated
    payload of the same length produces NO pair — while exact byte dedup
    only sees the first case."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base),
        (2, base),                       # exact twin
        (3, base[:-1] + "X"),            # last-char edit, same length
        (4, "z" * len(base)),            # unrelated, same length
    ]
    assets = multimodal.as_binary_assets(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_pairs(assets, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    # a one-character edit perturbs only the final pixel segment: the pair
    # must survive the hamming budget (its distance may round to 0 — the
    # changed pixel flips at most one gradient sign)
    assert pairs[(1, 3)] <= 3 and pairs[(2, 3)] <= 3
    assert not any(4 in p for p in pairs)
    # exact byte dedup groups only the byte-identical twins
    groups = multimodal.binary_exact_dedup(assets).filter("n_assets > 1").collect()
    assert len(groups) == 1 and groups[0]["n_assets"] == 2


def test_phash_tiny_assets_excluded_not_hot_bucketed(spark):
    """Payloads too small for the 65-segment fake decode must fingerprint
    NULL and be EXCLUDED — not all hash to one constant and pair
    quadratically in a single hot bucket."""
    rows = [(i, "x") for i in range(1, 21)] + [
        (100, "the quick brown fox jumps over the lazy dog " * 8),
        (101, "the quick brown fox jumps over the lazy dog " * 8),
    ]
    assets = multimodal.as_binary_assets(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    hashes = assets.select("doc_id", multimodal.dhash_expr().alias("dhash"))
    assert hashes.filter("dhash IS NULL").count() == 20
    pairs = multimodal.phash_pairs(assets).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(100, 101)}


def test_lm_perplexity_orders_fluent_above_junk(spark):
    """Text matching the reference's bigram statistics must score a higher
    avg_logp than token salad over the same vocabulary; unseen bigrams
    floor at -10."""
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(5)],
        "doc_id long, text string",
    )
    model = text.word_bigram_lm(ref)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),        # reference-like bigrams
            (2, "rug the on mat cat sat the"),    # same words, unseen order
        ],
        "doc_id long, text string",
    )
    out = text.lm_perplexity_score(docs, model).toPandas().set_index("doc_id")
    assert out.loc[1, "avg_logp"] > out.loc[2, "avg_logp"]
    assert out.loc[2, "avg_logp"] >= -10.0
    # cardinality guard fires loudly
    with pytest.raises(ValueError, match="bigrams"):
        text.word_bigram_lm(ref, max_vocab_bigrams=3)


def test_assign_centroids_string_ids(spark):
    """ADVICE r4: the Arrow kernels must carry NON-long id columns (string
    doc ids) through assignment and the semantic screen end to end."""
    import numpy as np
    import pandas as pd

    from sparsity_spark.operators.dedup import semantic_member_store, semantic_screen
    from sparsity_spark.operators.similarity import assign_centroids

    rng = np.random.RandomState(3)
    vecs = [list(map(float, v)) for v in rng.rand(12, 4)]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [f"doc-{i}" for i in range(12)], "embedding": vecs}),
        "vec_id string, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, vecs[0]), (1, vecs[6])], "centroid_id long, embedding array<double>"
    )
    out = assign_centroids(emb, cents)
    assert out.schema["vec_id"].dataType.simpleString() == "string"
    assert out.count() == 12
    store = semantic_member_store(emb, cents)
    batch = spark.createDataFrame(
        pd.DataFrame({"vec_id": ["new-1"], "embedding": [vecs[0]]}),
        "vec_id string, embedding array<double>",
    )
    # an exact twin of a corpus vector must be screened out
    assert semantic_screen(batch, store, cents, threshold=0.99).count() == 0


def test_bm25_rank_orders_by_relevance(spark):
    """A doc dense in the rare query term outranks one with a single hit;
    docs with no hits are absent; rare terms outweigh common ones."""
    rows = [
        (1, "zebra zebra zebra filler filler"),
        (2, "zebra filler filler filler filler"),
        (3, "filler filler filler filler filler"),
        (4, "common common common common common"),
        (5, "common zebra filler filler filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in text.bm25_rank(docs, ["zebra", "common"]).collect()}
    assert 3 not in got
    assert got[1] > got[2] > 0          # tf saturation still increases
    # 'zebra' (df=3) carries more idf than 'common' (df=2)? both rare here;
    # a doc with BOTH terms beats a doc with one hit of either
    assert got[5] > got[2]
    top1 = text.bm25_rank(docs, ["zebra", "common"], top_n=1).collect()
    assert len(top1) == 1


def test_dsir_importance_prefers_target_like_docs(spark):
    """Raw docs resembling the target domain get higher importance than
    docs unlike it — the selection signal DSIR samples by."""
    target = spark.createDataFrame(
        [(i, "der hund läuft schnell durch den wald") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "der hund läuft schnell durch den wald"),  # target-like
            (2, "the cat sat on the mat all day long"),    # not target-like
            (3, "der hund läuft schnell durch den wald"),
            (4, "completely different tokens here again ok"),
        ],
        "doc_id long, text string",
    )
    out = text.dsir_importance(raw, target).toPandas().set_index("doc_id")
    assert out.loc[1, "importance"] > out.loc[2, "importance"]
    assert out.loc[3, "importance"] > out.loc[4, "importance"]
    # composes with the deterministic weighted sampler
    from sparsity_spark.operators.pipeline import weighted_sample
    import pyspark.sql.functions as F

    weighted = raw.join(
        out.reset_index().pipe(lambda p: spark.createDataFrame(p[["doc_id", "importance"]])),
        on="doc_id",
    ).withColumn("w", F.exp(F.col("importance")))
    picked = weighted_sample(weighted, "w", k=2, content_col="text", id_col="doc_id")
    assert picked.count() == 2


def test_dhash_kernel_expr_parity(spark, docs):
    """The Arrow-kernel fingerprint must equal the streaming-legal
    expression form bit for bit (the minhash expr/aggregate discipline)."""
    assets = multimodal.as_binary_assets(docs)
    via_expr = {
        r["doc_id"]: r["d"]
        for r in assets.select("doc_id", multimodal.dhash_expr().alias("d")).collect()
    }
    via_kernel = {
        r["doc_id"]: r["dhash"]
        for r in multimodal.dhash_fingerprints(assets).collect()
    }
    assert via_expr == via_kernel


def test_ivfpq_trained_codebook_recall_floor(spark):
    """VERDICT r5 #3: the production-config IVF-PQ (m=16 subspaces x 256
    codewords = PQ16x8, FAISS's standard byte-code config, with the
    Lloyd-trained codebook) must reach recall@10 >= 0.4 at nprobe=3 on the
    sf0.01 embeddings (measured 0.55; sampled codebook at the same config
    measures 0.495, the old m=4/k=16 default 0.225 — full sweep in
    SCALE.md). Also pins trained >= sampled at this config."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    k = 10
    truth = {}
    for r in similarity.cosine_topk(emb, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cents = similarity.kmeans_fit(emb, k=8, iters=2)

    def recall(book):
        got = {}
        rows = similarity.ivf_pq_topk(
            emb, queries, cents, m=16, k_code=256, dim=64, topk=k, nprobe=3,
            codebook=book,
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    trained = recall(similarity.pq_trained_codebook(emb, m=16, k=256, dim=64, iters=2))
    assert trained >= 0.4, f"trained PQ16x8 recall@10 = {trained} (measured 0.55)"
    sampled = recall(None)
    assert trained >= sampled - 1e-9, (
        f"training must not hurt recall: trained={trained} sampled={sampled}"
    )


def test_ppm_decode_roundtrip_and_real_dhash_perceptual(spark):
    """VERDICT r5 #6: the REAL PPM decoder + real-pixel dHash behave
    perceptually — a lightly-noised image lands within max_hamming of its
    original while a structurally different image does not — and the
    Arrow kernel's inline parser is bit-identical to decode_ppm."""
    import numpy as np

    from sparsity_spark.operators.multimodal import (
        decode_ppm,
        dhash_real_fingerprints,
        phash_pairs_real,
        ppm_encode,
    )

    rng = np.random.RandomState(7)
    # a structured image: horizontal gradient + blocks (stable gradients)
    base = np.zeros((32, 36, 3), dtype=np.uint8)
    base[:, :, 0] = np.linspace(0, 255, 36, dtype=np.uint8)[None, :]
    base[:16, :, 1] = 200
    base[16:, :, 2] = 150
    # decode(encode(img)) == img, comments survive the header parse
    assert (decode_ppm(ppm_encode(base)) == base).all()
    with_comment = b"P6\n# a comment\n36 32\n255\n" + base.tobytes()
    assert (decode_ppm(with_comment) == base).all()

    noised = base.astype(np.int16) + rng.randint(-4, 5, base.shape)
    noised = np.clip(noised, 0, 255).astype(np.uint8)
    different = np.transpose(base[:, :32][:32, :], (1, 0, 2)).copy()  # rotated
    assets = spark.createDataFrame(
        [
            (1, bytearray(ppm_encode(base))),
            (2, bytearray(ppm_encode(noised))),
            (3, bytearray(ppm_encode(different))),
            (4, bytearray(b"\x00gibberish-not-a-ppm")),
        ],
        "doc_id long, content binary",
    )
    fps = {r["doc_id"]: r["dhash"] for r in dhash_real_fingerprints(assets).collect()}
    assert fps[4] is None  # undecodable -> NULL, no crash

    def ham(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert ham(fps[1], fps[2]) <= 3, f"noise moved dhash {ham(fps[1], fps[2])} bits"
    assert ham(fps[1], fps[3]) > 3, "a different image must not collide"
    # and the pair search finds exactly the noised pair
    pairs = {
        (r["id_a"], r["id_b"]) for r in phash_pairs_real(assets, max_hamming=3).collect()
    }
    assert pairs == {(1, 2)}


def test_wav_decode_roundtrip_and_audio_fingerprint_perceptual(spark):
    """The REAL WAV decoder + frame-energy fingerprint behave
    perceptually — lightly-noised audio lands within max_hamming of its
    original while a different signal does not — and the Arrow kernel's
    inline RIFF parser agrees with decode_wav (same fingerprint via
    either parse path)."""
    import numpy as np

    from sparsity_spark.operators.multimodal import (
        audio_fingerprints,
        audio_pairs,
        decode_stub,
        decode_wav,
        wav_encode,
    )

    rng = np.random.RandomState(11)
    n = 650
    t = np.arange(n)
    # a structured signal: loudness envelope ramps across frames
    base = (
        np.sin(t / 5.0) * np.linspace(500, 20000, n) * np.sin(t / 91.0)
    ).astype(np.int16)
    # decode(encode(s)) == s; sample rate survives; decode_stub routes RIFF
    dec, rate = decode_wav(wav_encode(base, rate=8000))
    assert rate == 8000 and (dec == base).all()
    assert (decode_stub(wav_encode(base), "audio/wav")[0] == base).all()
    # an extra odd-sized chunk before data exercises word alignment
    raw = wav_encode(base)
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    padded = raw[:12] + extra + raw[12:]
    padded = b"RIFF" + (len(padded) - 8).to_bytes(4, "little") + padded[8:]
    assert (decode_wav(padded)[0] == base).all()
    # stereo payloads come back as (frames, 2)
    stereo = np.stack([base, -base], axis=1)
    fmt_stereo = wav_encode(base)  # rebuild with 2 channels manually
    import struct
    s2 = bytearray(wav_encode(stereo.reshape(-1)))
    s2[22:24] = (2).to_bytes(2, "little")
    got = decode_wav(bytes(s2))[0]
    assert got.shape == (n, 2) and (got[:, 0] == base).all()

    noised = np.clip(
        base.astype(np.int32) + rng.randint(-30, 31, n), -32768, 32767
    ).astype(np.int16)
    different = base[::-1].copy()  # reversed envelope: gradients flip
    assets = spark.createDataFrame(
        [
            (1, bytearray(wav_encode(base))),
            (2, bytearray(wav_encode(noised))),
            (3, bytearray(wav_encode(different))),
            (4, bytearray(b"\x00not-a-riff-payload")),
            (5, None),
        ],
        "doc_id long, content binary",
    )
    fps = {r["doc_id"]: r["afp"] for r in audio_fingerprints(assets).collect()}
    assert fps[4] is None and fps[5] is None  # undecodable/NULL -> NULL

    def ham(a, b):
        return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert ham(fps[1], fps[2]) <= 3, f"noise moved afp {ham(fps[1], fps[2])} bits"
    assert ham(fps[1], fps[3]) > 3, "a different signal must not collide"
    # kernel parity: recompute fingerprint through decode_wav directly
    s = decode_wav(wav_encode(base))[0].astype(np.int64)
    e = [int((s[(f * n) // 65 : ((f + 1) * n) // 65] ** 2).sum()) for f in range(65)]
    want = 0
    for k in range(64):
        if e[k] > e[k + 1]:
            want += (1 << k) if k < 63 else -(1 << 63)
    assert fps[1] == want
    # and the pair search finds exactly the noised pair (pigeonhole, no N^2)
    pairs = {(r["id_a"], r["id_b"]) for r in audio_pairs(assets, max_hamming=3).collect()}
    assert pairs == {(1, 2)}


def _binary_asset_df(spark, rows, media_type, chunk_count=None):
    """(id, payload bytes) rows -> the binary-asset shape the multimodal
    kernels expect: (doc_id, content, meta struct)."""
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows], "content": [bytearray(r[1]) for r in rows]})
    df = spark.createDataFrame(pdf, "doc_id long, content binary")
    n_bytes = F.octet_length("content")
    cc = F.lit(chunk_count).cast("int") if chunk_count else F.ceil(n_bytes / F.lit(64)).cast("int")
    return df.select(
        "doc_id",
        "content",
        F.struct(
            F.lit(media_type).alias("media_type"),
            n_bytes.alias("n_bytes"),
            cc.alias("chunk_count"),
        ).alias("meta"),
    )


def _mk_ppm(doc_id, w=36, h=16):
    from sparsity_spark.operators.multimodal import ppm_encode

    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    r = (doc_id * 31 + xs * 7 + ys * 13) % 256
    g = (doc_id * 17 + xs * 3 + ys * 11) % 256
    b = (doc_id * 23 + xs * 5 + ys * 19) % 256
    return ppm_encode(np.stack([np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)),
                                np.broadcast_to(b, (h, w))], axis=2))


def test_extract_features_real_ppm_parity(spark):
    """VERDICT r6 #3: PPM payloads get REAL features through the generic
    extract_features plumbing — parity against the reference decode_ppm +
    an independent numpy recompute of the block-mean luma grid."""
    from sparsity_spark.operators.multimodal import FEATURE_DIM, decode_ppm, extract_features

    g = int(FEATURE_DIM ** 0.5)
    payloads = [(i, _mk_ppm(i)) for i in range(6)]
    assets = _binary_asset_df(spark, payloads, "image/x-portable-pixmap")
    got = extract_features(assets, fake=False).toPandas().set_index("doc_id")
    for i, raw in payloads:
        img = decode_ppm(raw).astype(np.int64)
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
        h, w = luma.shape
        want = []
        for by in range(g):
            for bx in range(g):
                blk = luma[(by * h) // g:((by + 1) * h) // g, (bx * w) // g:((bx + 1) * w) // g]
                want.append((int(blk.sum()) // blk.size) / 255.0)
        assert list(got.loc[i, "feature"]) == want
        assert got.loc[i, "n_bytes"] == len(raw)


def test_extract_features_real_wav_parity(spark):
    """WAV payloads get REAL frame-energy features — parity against
    decode_wav + an exact integer recompute."""
    from sparsity_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_wav,
        extract_features,
        wav_encode,
    )

    rows = []
    for i in range(4):
        s = ((np.arange(650, dtype=np.int64) ** 2 * 7 + i * 31) % 65536) - 32768
        rows.append((i, wav_encode(s.astype("<i2"))))
    assets = _binary_asset_df(spark, rows, "audio/wav")
    got = extract_features(assets, fake=False).toPandas().set_index("doc_id")
    for i, raw in rows:
        s, _ = decode_wav(raw)
        s = np.asarray(s, dtype=np.int64)
        n = len(s)
        f = (np.arange(n) * FEATURE_DIM) // n
        e = np.zeros(FEATURE_DIM, dtype=np.int64)
        np.add.at(e, f, s * s)
        assert list(got.loc[i, "feature"]) == [float(x) for x in e]


def test_resize_images_real_ppm(spark):
    """resize_images on P6 payloads produces a REAL thumbnail: md5 of the
    re-encoded block-mean P6, with true out_bytes; undersized images null."""
    import hashlib

    from sparsity_spark.operators.multimodal import decode_ppm, ppm_encode, resize_images

    W, H = 9, 4
    rows = [(i, _mk_ppm(i)) for i in range(4)] + [(99, _mk_ppm(99, w=4, h=2))]
    assets = _binary_asset_df(spark, rows, "image/x-portable-pixmap")
    got = resize_images(assets, width=W, height=H, fake=False).toPandas().set_index("doc_id")
    for i, raw in rows[:4]:
        img = decode_ppm(raw).astype(np.int64)
        h, w = img.shape[:2]
        t = np.empty((H, W, 3), dtype=np.uint8)
        for by in range(H):
            for bx in range(W):
                blk = img[(by * h) // H:((by + 1) * h) // H, (bx * w) // W:((bx + 1) * w) // W]
                t[by, bx] = blk.sum(axis=(0, 1)) // (blk.shape[0] * blk.shape[1])
        payload = ppm_encode(t)
        assert got.loc[i, "thumb_md5"] == hashlib.md5(payload).hexdigest()
        assert got.loc[i, "out_bytes"] == len(payload)
    assert pd.isna(got.loc[99, "thumb_md5"])  # smaller than target -> NULL


def test_frame_sample_real_wav_and_ppm(spark):
    """frame_sample real paths: WAV frames hash equal int16 sample slices
    (recomputed through decode_wav); a PPM still hashes its pixel grid for
    every sampled index."""
    import hashlib

    from sparsity_spark.operators.multimodal import decode_wav, frame_sample

    s = ((np.arange(640, dtype=np.int64) * 13 + 5) % 65536) - 32768
    from sparsity_spark.operators.multimodal import wav_encode

    wav = wav_encode(s.astype("<i2"))
    ppm = _mk_ppm(7)
    assets = _binary_asset_df(spark, [(1, wav), (2, ppm)], "audio/wav", chunk_count=8)
    got = frame_sample(assets, every_k=2, fake=False).toPandas()
    dec, _ = decode_wav(wav)
    dec = np.asarray(dec).reshape(-1)
    n = len(dec)
    for _, row in got[got.doc_id == 1].iterrows():
        f = int(row["frame_idx"])
        lo, hi = (f * n) // 8, ((f + 1) * n) // 8
        want = hashlib.md5(dec[lo:hi].astype("<i2").tobytes()).hexdigest()
        assert row["frame_md5"] == want
    from sparsity_spark.operators.multimodal import decode_ppm

    still = hashlib.md5(decode_ppm(ppm).tobytes()).hexdigest()
    assert (got[got.doc_id == 2]["frame_md5"] == still).all()


def test_dhash_real_kernel_matches_decode_ppm(spark):
    """r6 ADVICE: the dhash_real_fingerprints inline P6 parser must agree
    with the reference decode_ppm — recompute each fingerprint from
    decode_ppm's pixel grid and compare bit for bit."""
    from sparsity_spark.operators.multimodal import decode_ppm, dhash_real_fingerprints

    rows = [(i, _mk_ppm(i)) for i in range(8)]
    assets = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "content": [bytearray(r[1]) for r in rows]}),
        "doc_id long, content binary",
    )
    got = dhash_real_fingerprints(assets).toPandas().set_index("doc_id")
    for i, raw in rows:
        img = decode_ppm(raw).astype(np.int64)
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
        h, w = luma.shape
        m = np.empty((8, 9))
        for by in range(8):
            for bx in range(9):
                m[by, bx] = luma[(by * h) // 8:((by + 1) * h) // 8,
                                 (bx * w) // 9:((bx + 1) * w) // 9].mean()
        out = 0
        for y in range(8):
            for x in range(8):
                if m[y, x] > m[y, x + 1]:
                    k = y * 8 + x
                    out += (1 << k) if k < 63 else -(1 << 63)
        assert int(got.loc[i, "dhash"]) == out


def _mk_png_arr(doc_id, w=24, h=20):
    """Deterministic pixels matching the multimodal_png_real fixture:
    grayscale / RGB / RGBA cycling by doc_id % 3."""
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    if doc_id % 3 == 0:
        return np.broadcast_to((doc_id * 19 + xs * 7 + ys * 5) % 256, (h, w)).astype(np.uint8)
    r = (doc_id * 37 + xs * 11 + ys * 3) % 256
    g = (doc_id * 13 + xs * 5 + ys * 17) % 256
    b = (doc_id * 29 + xs * 7 + ys * 23) % 256
    chans = [np.broadcast_to(c, (h, w)) for c in (r, g, b)]
    if doc_id % 3 == 2:
        chans.append(np.broadcast_to((doc_id + xs + ys) % 256, (h, w)))
    return np.stack(chans, axis=2).astype(np.uint8)


def test_png_codec_roundtrip_all_filters_and_color_types():
    """r7: decode(encode(img)) == img for gray/RGB/RGBA across every
    scanline filter (fixed 0-4 and the cycling mode); CRC corruption and
    truncation raise ValueError, never return a wrong array; and the
    inline kernel encoder/parser are bit-identical to the references."""
    from sparsity_spark.operators.multimodal import (
        _INLINE_CODEC_SRC,
        decode_png,
        decode_stub,
        png_encode,
    )

    rng = np.random.RandomState(17)
    ns = {"np": np}
    exec(_INLINE_CODEC_SRC, ns)
    for c in (1, 3, 4):
        for fm in (0, 1, 2, 3, 4, "cycle"):
            a = rng.randint(0, 256, size=(11, 13, c)).astype(np.uint8)
            p = png_encode(a, fm)
            assert (decode_png(p) == a).all(), (c, fm)
            # inline kernel parity: same bytes out, same pixels back
            assert ns["encode_png"](a, fm) == p
            assert (ns["parse_png"](p) == a).all()
    a = rng.randint(0, 256, size=(8, 9, 3)).astype(np.uint8)
    p = png_encode(a, "cycle")
    assert (decode_stub(p, "image/png") == a).all()
    # flip one byte inside the IDAT body -> CRC mismatch, ValueError
    bad = bytearray(p)
    bad[8 + 25 + 12] ^= 0xFF  # first IDAT payload byte (after sig+IHDR chunk+len+type)
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(p[: len(p) // 2])
    # gray normalizes to replicated RGB, RGBA drops alpha
    g = rng.randint(0, 256, size=(6, 7)).astype(np.uint8)
    img = ns["parse_image"](png_encode(g, 1))
    assert img.shape == (6, 7, 3) and (img[:, :, 0] == g).all() and (img[:, :, 2] == g).all()
    rgba = rng.randint(0, 256, size=(6, 7, 4)).astype(np.uint8)
    assert (ns["parse_image"](png_encode(rgba, 4)) == rgba[:, :, :3]).all()


def test_png_real_pipeline_features_resize_dhash_framesample(spark):
    """r7: PNG payloads flow through EVERY generic multimodal operator for
    real — extract_features parity vs decode_png, resize_images thumbnails
    re-encoded as filter-0 PNG, dhash fingerprints recomputed from the
    reference decoder, frame_sample hashing the normalized RGB grid."""
    import hashlib

    from sparsity_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_png,
        dhash_real_fingerprints,
        extract_features,
        frame_sample,
        image_to_rgb,
        png_encode,
        resize_images,
    )

    g = int(FEATURE_DIM**0.5)
    rows = [(i, png_encode(_mk_png_arr(i), "cycle")) for i in range(6)]
    assets = _binary_asset_df(spark, rows, "image/png")

    got = extract_features(assets, fake=False).toPandas().set_index("doc_id")
    for i, raw in rows:
        img = image_to_rgb(decode_png(raw)).astype(np.int64)
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
        h, w = luma.shape
        want = []
        for by in range(g):
            for bx in range(g):
                blk = luma[(by * h) // g : ((by + 1) * h) // g,
                           (bx * w) // g : ((bx + 1) * w) // g]
                want.append((int(blk.sum()) // blk.size) / 255.0)
        assert list(got.loc[i, "feature"]) == want

    W, H = 8, 5
    thumbs = resize_images(assets, width=W, height=H, fake=False).toPandas().set_index("doc_id")
    for i, raw in rows:
        img = image_to_rgb(decode_png(raw)).astype(np.int64)
        h, w = img.shape[:2]
        t = np.empty((H, W, 3), dtype=np.uint8)
        for by in range(H):
            for bx in range(W):
                blk = img[(by * h) // H : ((by + 1) * h) // H,
                          (bx * w) // W : ((bx + 1) * w) // W]
                t[by, bx] = blk.sum(axis=(0, 1)) // (blk.shape[0] * blk.shape[1])
        payload = png_encode(t, 0)
        assert thumbs.loc[i, "thumb_md5"] == hashlib.md5(payload).hexdigest()
        assert thumbs.loc[i, "out_bytes"] == len(payload)

    big = [(i, png_encode(_mk_png_arr(i, w=36, h=16), "cycle")) for i in range(6)]
    fps = dhash_real_fingerprints(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in big],
                          "content": [bytearray(r[1]) for r in big]}),
            "doc_id long, content binary",
        )
    ).toPandas().set_index("doc_id")
    for i, raw in big:
        img = image_to_rgb(decode_png(raw)).astype(np.int64)
        luma = (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
        h, w = luma.shape
        m = np.empty((8, 9))
        for by in range(8):
            for bx in range(9):
                m[by, bx] = luma[(by * h) // 8 : ((by + 1) * h) // 8,
                                 (bx * w) // 9 : ((bx + 1) * w) // 9].mean()
        out = 0
        for y in range(8):
            for x in range(8):
                if m[y, x] > m[y, x + 1]:
                    k = y * 8 + x
                    out += (1 << k) if k < 63 else -(1 << 63)
        assert int(fps.loc[i, "dhash"]) == out

    frames = frame_sample(assets.limit(2), every_k=1, fake=False).toPandas()
    for _, row in frames.iterrows():
        raw = dict(rows)[int(row["doc_id"])]
        still = hashlib.md5(image_to_rgb(decode_png(raw)).tobytes()).hexdigest()
        assert row["frame_md5"] == still


def test_ivfpq_refine_recall_floor_clustered(spark):
    """VERDICT r6 #9: on CLUSTERED embeddings (the 32-Gaussian fixture from
    tools/recall_study.py) plain IVF-PQ recall is quantizer-capped (~0.41,
    flat across nprobe — routing is perfect, the codes can't rank within a
    tight cluster); residual encoding + the exact-cosine refine stage must
    clear recall@10 >= 0.75 at nprobe=1/shortlist=4 (measured 0.885, above
    the 0.835 exact-L2 ceiling because refine ranks in the truth metric)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from recall_study import clustered_fixture

    from sparsity_spark.operators import similarity

    emb = clustered_fixture(spark).localCheckpoint(eager=True)
    queries = emb.filter(emb.vec_id < 20)
    k = 10
    truth = {}
    for r in similarity.cosine_topk(emb, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cents = similarity.kmeans_fit(emb, k=16, iters=2)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    refined = recall(
        similarity.ivf_pq_refine_topk(
            emb, queries, cents, m=16, k_code=256, topk=k, nprobe=1,
            shortlist=4, residual=True,
        ).collect()
    )
    assert refined >= 0.75, f"refined recall@10 = {refined} (measured 0.885)"
    plain = recall(
        similarity.ivf_pq_topk(
            emb, queries, cents, m=16, k_code=256, topk=k, nprobe=1
        ).collect()
    )
    assert refined > plain + 0.1, (
        f"refine must materially beat plain ADC on clustered data: "
        f"refined={refined} plain={plain}"
    )


def test_adpcm_codec_roundtrip_parity_and_block_anchor(spark):
    """r7 IMA ADPCM: lossy 4:1 compression whose decode is a pure integer
    function — SNR bound on a smooth signal, every block's first sample
    exact (stored verbatim in the header), deterministic across runs,
    inline kernel encoder/decoder bit-identical to the references, and
    audio fingerprints flow through the SAME generic kernels as PCM."""
    import numpy as np

    from sparsity_spark.operators.multimodal import (
        _INLINE_CODEC_SRC,
        adpcm_wav_encode,
        audio_fingerprints,
        decode_stub,
        decode_wav,
    )

    t = np.arange(1400)
    s = (np.sin(t / 7.0) * 9000 + np.sin(t / 31.0) * 12000).astype(np.int16)
    p = adpcm_wav_encode(s, rate=8000)
    dec, rate = decode_wav(p)
    assert rate == 8000 and len(dec) == len(s)
    err = dec.astype(np.int64) - s.astype(np.int64)
    snr = 10 * np.log10((s.astype(np.int64) ** 2).mean() / max((err**2).mean(), 1))
    assert snr > 20, snr
    spb = (256 - 4) * 2 + 1
    for b in range(0, len(s), spb):
        assert dec[b] == s[b], b
    assert len(p) < len(s) * 2 / 3  # genuinely compressed vs 16-bit PCM

    ns = {"np": np}
    exec(_INLINE_CODEC_SRC, ns)
    assert ns["encode_adpcm_wav"](s, rate=8000) == p
    assert (np.asarray(ns["parse_wav"](p)) == dec).all()
    assert (decode_stub(p, "audio/wav")[0] == dec).all()

    # the generic fingerprint kernel accepts ADPCM WAVs transparently
    assets = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(b"\x00junk"))],
        "doc_id long, content binary",
    )
    fps = {r["doc_id"]: r["afp"] for r in audio_fingerprints(assets).collect()}
    assert fps[1] is not None and fps[2] is None


def test_rrf_fuse_hand_checked_and_partitioned(spark):
    """r7 reciprocal-rank fusion: exact hand-computed scores (integer-nano
    contributions), agreement beats single-list presence, and the
    partitioned form fuses per query independently."""
    from sparsity_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "doc_id long, score double"
    )
    sem = spark.createDataFrame(
        [(2, 0.9), (9, 0.8)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([lex, sem], k=60).collect()
    }

    def rrf(*ranks):
        return round(sum(round(1e9 / (60 + r)) for r in ranks) / 1e9, 6)

    assert got == {
        1: (rrf(1), 1),
        2: (rrf(2, 1), 2),   # in both lists: rank 2 lexical, rank 1 semantic
        3: (rrf(3), 1),
        9: (rrf(2), 1),
    }
    assert got[2][0] > got[1][0]  # agreement outranks a single top hit

    # per-query fusion: ranks must be assigned within each query_id
    lex_q = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 1, 5.0), ("b", 2, 6.0)],
        "query_id string, doc_id long, score double",
    )
    sem_q = spark.createDataFrame(
        [("a", 1, 0.5)], "query_id string, doc_id long, score double"
    )
    gq = {
        (r["query_id"], r["doc_id"]): r["rrf_score"]
        for r in rrf_fuse([lex_q, sem_q], by=["query_id"], k=60).collect()
    }
    assert gq[("a", 1)] == rrf(1, 1)
    assert gq[("b", 2)] == rrf(1)
    assert gq[("b", 1)] == rrf(2)
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_adpcm_batch_encoder_byte_parity():
    """r7: the vectorized-across-streams ADPCM encoder must be
    byte-identical to the per-stream reference across block boundaries,
    odd lengths, and single-sample streams — inline kernel copy included."""
    import numpy as np

    from sparsity_spark.operators.multimodal import (
        _INLINE_CODEC_SRC,
        adpcm_wav_encode,
        adpcm_wav_encode_batch,
    )

    ns = {"np": np}
    exec(_INLINE_CODEC_SRC, ns)
    rng = np.random.RandomState(3)
    for n in (1, 5, 505, 506, 650, 1400):
        mat = rng.randint(-32768, 32768, size=(5, n)).astype(np.int16)
        batch = adpcm_wav_encode_batch(mat, rate=16000)
        inline = ns["encode_adpcm_wav_batch"](mat, rate=16000)
        for d in range(5):
            ref = adpcm_wav_encode(mat[d], rate=16000)
            assert batch[d] == ref == inline[d], (n, d)


def test_y4m_codec_roundtrip_and_inline_parity():
    """r7: decode(encode(frames)) == frames for C444 and Cmono; the inline
    kernel encoder/parser are bit-identical to the references; header
    extension tags and per-frame parameters are skipped; malformed streams
    raise ValueError, never return a wrong array."""
    from sparsity_spark.operators.multimodal import (
        _INLINE_CODEC_SRC,
        decode_stub,
        decode_y4m,
        y4m_encode,
    )

    rng = np.random.RandomState(23)
    ns = {"np": np}
    exec(_INLINE_CODEC_SRC, ns)
    fr = rng.randint(0, 256, size=(5, 9, 14, 3)).astype(np.uint8)
    p = y4m_encode(fr, fps=(30, 1))
    assert (decode_y4m(p) == fr).all()
    assert ns["encode_y4m"](fr, (30, 1)) == p
    assert (ns["parse_y4m"](p) == fr).all()
    assert (decode_stub(p, "video/x-yuv4mpeg") == fr).all()
    mono = rng.randint(0, 256, size=(3, 6, 8)).astype(np.uint8)
    pm = y4m_encode(mono)
    assert (decode_y4m(pm) == mono).all()
    assert decode_y4m(pm).ndim == 3
    # X extension tag, odd frame rate, interlace tag, per-frame params
    hdr = b"YUV4MPEG2 W14 H9 F30000:1001 It A4:3 C444 XYSCSS=444\n"
    body = b"".join(b"FRAME Ip\n" + np.moveaxis(f, 2, 0).tobytes() for f in fr)
    assert (decode_y4m(hdr + body) == fr).all()
    # malformations: truncated frame, bad marker, unterminated header,
    # unsupported (subsampled) colorspace, unknown tag, zero frames, no W/H
    for bad in (
        p[:-1],
        p.replace(b"FRAME", b"FRAMX", 1),
        b"YUV4MPEG2 W4 H4 C444",
        b"YUV4MPEG2 W4 H4 C420jpeg\nFRAME\n" + b"\x00" * 24,
        b"YUV4MPEG2 W4 H4\nFRAME\n" + b"\x00" * 24,  # default C420 unsupported
        b"YUV4MPEG2 W4 H4 Q9 C444\nFRAME\n" + b"\x00" * 48,
        b"YUV4MPEG2 W4 H4 C444\n",
        b"YUV4MPEG2 H4 C444\nFRAME\n" + b"\x00" * 16,
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)
    with pytest.raises(ValueError):
        y4m_encode(np.zeros((0, 4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        y4m_encode(np.zeros((2, 4, 4, 2), dtype=np.uint8))


def _mk_y4m_frames(doc_id, t=6, h=12, w=16):
    """Deterministic frames matching the multimodal_y4m_frames fixture."""
    ts = np.arange(t, dtype=np.int64)[:, None, None]
    ys = np.arange(h, dtype=np.int64)[None, :, None]
    xs = np.arange(w, dtype=np.int64)[None, None, :]
    yv = (doc_id * 7 + ts * 29 + xs * 3 + ys * 11) % 256
    uv = (doc_id * 11 + ts * 17 + xs * 5 + ys * 7) % 256
    vv = (doc_id * 13 + ts * 23 + xs * 7 + ys * 3) % 256
    return np.stack(
        [np.broadcast_to(c, (t, h, w)) for c in (yv, uv, vv)], axis=3
    ).astype(np.uint8)


def test_y4m_real_pipeline_frames_features_framesample(spark):
    """r7: the full video pipeline on REAL decoded frames — frame_sample
    md5s recomputed through decode_y4m's planar bytes, video_frame_stats
    plane sums and extract_features temporal block means recomputed in
    numpy; out-of-range frame indices and corrupt payloads yield NULLs."""
    import hashlib

    from sparsity_spark.operators.multimodal import (
        decode_y4m,
        extract_features,
        frame_sample,
        video_frame_stats,
        y4m_encode,
    )

    rows = [(i, y4m_encode(_mk_y4m_frames(i))) for i in (3, 7)]
    rows.append((9, b"YUV4MPEG2 W16 H12 C444\nFRAME\n" + b"\x00" * 10))  # truncated
    assets = _binary_asset_df(spark, rows, "video/x-yuv4mpeg", chunk_count=8)

    got = frame_sample(assets, every_k=3, fake=False).toPandas()
    for doc_id, raw in rows[:2]:
        fr = decode_y4m(raw)
        sub = got[got.doc_id == doc_id].set_index("frame_idx")
        assert sorted(sub.index) == [0, 3, 6]
        for f in (0, 3):
            want = hashlib.md5(np.moveaxis(fr[f], 2, 0).tobytes()).hexdigest()
            assert sub.loc[f, "frame_md5"] == want
        assert pd.isna(sub.loc[6, "frame_md5"])  # chunk_count=8 > 6 real frames
    assert got[got.doc_id == 9]["frame_md5"].isna().all()

    stats = video_frame_stats(assets, every_k=2).toPandas()
    for doc_id, raw in rows[:2]:
        fr = decode_y4m(raw).astype(np.int64)
        sub = stats[stats.doc_id == doc_id].set_index("frame_idx")
        for f in (0, 2, 4):
            assert sub.loc[f, "y_sum"] == fr[f, :, :, 0].sum()
            assert sub.loc[f, "u_sum"] == fr[f, :, :, 1].sum()
            assert sub.loc[f, "v_sum"] == fr[f, :, :, 2].sum()
        assert sub.loc[6, ["y_sum", "u_sum", "v_sum"]].isna().all()
    assert stats[stats.doc_id == 9]["y_sum"].isna().all()

    feats = extract_features(assets, fake=False).toPandas().set_index("doc_id")
    for doc_id, raw in rows[:2]:
        fr = decode_y4m(raw).astype(np.int64)
        y = fr[:, :, :, 0]
        want = []
        for by in range(4):
            y0, y1 = (by * 12) // 4, ((by + 1) * 12) // 4
            for bx in range(4):
                x0, x1 = (bx * 16) // 4, ((bx + 1) * 16) // 4
                blk = y[:, y0:y1, x0:x1]
                want.append(float(int(blk.sum()) // blk.size) / 255.0)
        assert list(feats.loc[doc_id, "feature"]) == want
    assert feats.loc[9, "feature"] is None

    # mono streams: u/v sums are NULL, y matches
    mono = np.arange(4 * 5 * 6, dtype=np.uint8).reshape(4, 5, 6) % 251
    massets = _binary_asset_df(
        spark, [(1, y4m_encode(mono))], "video/x-yuv4mpeg", chunk_count=4
    )
    ms = video_frame_stats(massets, every_k=1).toPandas().set_index("frame_idx")
    for f in range(4):
        assert ms.loc[f, "y_sum"] == mono[f].astype(np.int64).sum()
        assert pd.isna(ms.loc[f, "u_sum"]) and pd.isna(ms.loc[f, "v_sum"])


def test_kmeans_parallel_init_covers_blobs_and_is_partition_invariant(spark):
    """r8 k-means||: weights sum to n (every point credited once); on
    well-separated blobs the oversampled candidate set touches every
    blob (the d² sampling property that uniform sampling lacks);
    repartitioning changes nothing (integer md5 draw, no RNG); an
    all-identical corpus degenerates to the seed candidate alone."""
    import numpy as np

    from sparsity_spark.operators.similarity import kmeans_parallel_init

    # 4 tight blobs at corners of a square, 25 points each
    rows = []
    for b, (cx, cy) in enumerate([(0, 0), (50, 0), (0, 50), (50, 50)]):
        for i in range(25):
            rows.append(
                (b * 25 + i, [cx + (i % 5) * 0.1, cy + (i // 5) * 0.1])
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_parallel_init(emb, l=4, rounds=3).toPandas()
    assert got["weight"].sum() == 100
    blobs_hit = {vid // 25 for vid in got["vec_id"]}
    assert blobs_hit == {0, 1, 2, 3}

    again = kmeans_parallel_init(emb.repartition(7), l=4, rounds=3).toPandas()
    a = got.sort_values("vec_id").reset_index(drop=True)
    b = again.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)

    same = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(30)], "vec_id long, embedding array<double>"
    )
    deg = kmeans_parallel_init(same, l=4, rounds=2).toPandas()
    assert len(deg) == 1 and deg["weight"].iloc[0] == 30


def test_kmeans_fit_explicit_init(spark):
    """r8: kmeans_fit(init=...) honors caller cids and starting points —
    one Lloyd step from per-blob seeds recovers each blob's round-6 mean
    under the caller's cid labels; duplicate cids raise."""
    import numpy as np
    import pytest as _pytest

    from sparsity_spark.operators.similarity import kmeans_fit

    a = [[float(i % 3), 0.0] for i in range(30)]
    b = [[100.0 + (i % 5), 1.0] for i in range(30)]
    rows = [(i, v) for i, v in enumerate(a + b)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(
        emb, k=2, iters=1, init=[(5, [0.0, 0.0]), (9, [100.0, 1.0])]
    ).collect()
    got = {r["centroid_id"]: r["embedding"] for r in cents}
    assert set(got) == {5, 9}
    np.testing.assert_allclose(got[5], np.array(a).mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(got[9], np.array(b).mean(axis=0), atol=1e-6)
    with _pytest.raises(ValueError):
        kmeans_fit(emb, k=2, init=[(1, [0.0, 0.0]), (1, [1.0, 1.0])])


def test_video_shot_mad_detects_cut(spark):
    """r8 shot boundaries: the exact luma-MAD signal equals a numpy
    recompute for both mono and C444 streams, the hard-cut pair is the
    unique maximum, and corrupt payloads contribute NO rows (a signal
    from a broken stream would be a wrong answer, not a degraded one)."""
    from sparsity_spark.operators.multimodal import video_shot_mad, y4m_encode

    # mono: flat segments with a jump between frames 2 and 3
    t = np.arange(6, dtype=np.int64)[:, None, None]
    y = np.arange(8, dtype=np.int64)[None, :, None]
    x = np.arange(10, dtype=np.int64)[None, None, :]
    mono = np.where(t < 3, (x + y) % 100 + t, 180 + (x * 2 + y) % 40 + t).astype(
        np.uint8
    )
    mono = np.broadcast_to(mono, (6, 8, 10))
    # C444: luma channel carries the cut, chroma is constant (must be ignored)
    lum = mono
    chroma = np.full_like(lum, 7)
    color = np.stack([lum, chroma, chroma], axis=3)

    rows = [(1, y4m_encode(mono)), (2, y4m_encode(color))]
    rows.append((9, b"YUV4MPEG2 W16 H12 Cmono\nFRAME\n" + b"\x00" * 4))  # truncated
    assets = _binary_asset_df(spark, rows, "video/x-yuv4mpeg", chunk_count=6)

    got = video_shot_mad(assets).toPandas()
    want = np.abs(np.diff(lum.astype(np.int64), axis=0)).reshape(5, -1).sum(axis=1)
    for doc_id in (1, 2):
        sub = got[got.doc_id == doc_id].set_index("frame_idx").sort_index()
        assert list(sub.index) == [1, 2, 3, 4, 5]
        assert list(sub["mad"]) == [int(v) for v in want]
        assert sub["mad"].idxmax() == 3  # the cut pair (frames 2→3)
        assert sub.loc[3, "mad"] > 4 * sub.drop(index=3)["mad"].max()
    assert (got.doc_id == 9).sum() == 0


def test_audio_spectral_bands_integer_dft(spark):
    """r8 spectral bands: exact parity with a numpy replay of the shared
    integer table; a pure k-th-bin tone concentrates its energy in bin k
    (the filterbank actually separates frequencies); trailing samples
    beyond the last full frame are dropped; corrupt payloads contribute
    no rows; frame sizes other than 8 raise."""
    import numpy as np
    import pytest as _pytest

    from sparsity_spark.operators.multimodal import (
        audio_spectral_bands,
        dft8_coeffs,
        wav_encode,
    )

    rng = np.arange(83, dtype=np.int64)  # 10 frames + 3 trailing samples
    noise = (((rng * rng) * 7 + rng * 13) % 4096 - 2048).astype(np.int16)
    # a pure bin-2 tone: period 4 at the 8-sample frame (cos(2π·2n/8))
    tone = (1000 * np.cos(2 * np.pi * 2 * rng[:80] / 8)).round().astype(np.int16)
    rows = [
        (1, bytearray(wav_encode(noise))),
        (2, bytearray(wav_encode(tone))),
        (9, bytearray(b"RIFF\x00\x00\x00\x00JUNK")),
    ]
    assets = spark.createDataFrame(rows, "doc_id long, content binary")
    got = audio_spectral_bands(assets).toPandas()

    C, S = dft8_coeffs()
    Cm, Sm = np.array(C, dtype=np.int64), np.array(S, dtype=np.int64)

    def replay(v):
        X = v.astype(np.int64)[: (len(v) // 8) * 8].reshape(-1, 8)
        re, im = X @ Cm.T, X @ Sm.T
        return (re * re + im * im).sum(axis=0)

    sub = got[got.doc_id == 1].set_index("bin").sort_index()
    assert list(sub["energy"]) == [int(e) for e in replay(noise)]
    t = got[got.doc_id == 2].set_index("bin").sort_index()
    assert list(t["energy"]) == [int(e) for e in replay(tone)]
    assert t["energy"].idxmax() == 2
    assert t.loc[2, "energy"] > 100 * t.drop(index=2)["energy"].max()
    assert (got.doc_id == 9).sum() == 0
    with _pytest.raises(ValueError):
        audio_spectral_bands(assets, frame=16)


def test_hll_registers_estimate_merge_idempotent(spark):
    """r7 HLL: registers match a python md5 reference bit for bit; the
    estimate lands within the ~1.04/√m error envelope; merging halves
    equals the whole-corpus sketch; REPLAYING an increment leaves the
    registers unchanged (idempotency — the at-least-once-safety property
    counter sketches lack); NULLs are ignored; sparse sets report exact
    zero_registers."""
    import hashlib

    from sparsity_spark.operators.sketches import hll_estimate, hll_merge, hll_sketch

    n = 5000
    df = spark.range(n).withColumnRenamed("id", "v")
    sk = hll_sketch(df, "v")
    got = {int(r["bucket"]): int(r["r"]) for r in sk.collect()}

    regs = {}
    for v in range(n):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        w = h // 256
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[h % 256] = max(regs.get(h % 256, 0), rho)
    assert got == regs

    row = hll_estimate(sk).collect()[0]
    assert abs(row["distinct_estimate"] - n) / n < 0.2  # 3σ ≈ 19.5% at m=256
    assert row["n_present"] + row["zero_registers"] == 256

    lo = hll_sketch(df.filter("v < 2500"), "v")
    hi = hll_sketch(df.filter("v >= 2500"), "v")
    merged = hll_merge(lo, hi).toPandas().sort_values("bucket").reset_index(drop=True)
    whole = sk.toPandas().sort_values("bucket").reset_index(drop=True)
    assert merged.equals(whole)
    # replay: folding the same half in again must be a no-op
    replayed = hll_merge(hll_merge(lo, hi), lo).toPandas().sort_values("bucket").reset_index(drop=True)
    assert replayed.equals(whole)

    # duplicates don't move registers; NULLs ignored; sparse set → zeros
    dup = spark.createDataFrame([(1,), (1,), (None,), (2,)], "v long")
    sk2 = hll_sketch(dup, "v").toPandas()
    assert len(sk2) == 2
    row2 = hll_estimate(hll_sketch(dup, "v")).collect()[0]
    assert row2["zero_registers"] == 254


def test_nb_classifier_learns_and_is_partition_invariant(spark):
    """r7 classifier: multinomial NB over hashed features separates a
    token-disjoint corpus perfectly; weights/scores are exact integer
    micro-log-odds, identical across partitionings (the engine-exactness
    claim the oracle relies on); the f=-1 prior row reflects the class
    balance; on a lexicon-labeled slice of the real fixture the model
    beats the majority baseline (it must generalize the rule through hash
    buckets, not copy it)."""
    import pandas as pd

    from sparsity_spark.operators.text import (
        hashed_token_features,
        lexicon_label,
        nb_score,
        nb_train,
    )

    rows = []
    for i in range(40):
        pos = i % 2 == 0
        vocab = ["alpha", "beta", "gamma"] if pos else ["zulu", "yankee", "xray"]
        text = " ".join(vocab[(i + j) % 3] for j in range(6))
        rows.append((i, text, 1 if pos else -1))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    docs = spark.createDataFrame(pdf)

    feats = hashed_token_features(docs, dim=64)
    labels = docs.select("doc_id", "y")
    w = nb_train(feats, labels, dim=64)
    wp = w.toPandas()
    assert len(wp) == 65  # 64 buckets + the f=-1 prior row
    assert int(wp[wp.f == -1]["w6"].iloc[0]) == 0  # balanced classes
    scored = nb_score(feats, w).toPandas().set_index("doc_id")
    joined = pdf.set_index("doc_id").join(scored)
    assert (joined["pred"] == joined["y"]).mean() == 1.0

    # partition invariance: different layout -> bit-identical weights
    w8 = (
        nb_train(hashed_token_features(docs.repartition(8), dim=64), labels, dim=64)
        .toPandas().sort_values("f").reset_index(drop=True)
    )
    assert w8.equals(wp.sort_values("f").reset_index(drop=True))

    # real fixture + lexicon labels: learned model beats majority
    sf = "/root/testdata/sf0.001"
    from sparsity_spark.data import load_table

    rdocs = load_table(spark, sf, "documents")
    rl = lexicon_label(
        rdocs,
        ["table", "row", "scan", "query", "filter"],
        ["stream", "window", "batch", "vector", "hash"],
    )
    rf = hashed_token_features(rdocs)
    rw = nb_train(rf, rl)
    got = nb_score(rf, rw).join(rl, "doc_id").toPandas()
    acc = (got["pred"] == got["y"]).mean()
    base = max((got["y"] == 1).mean(), (got["y"] == -1).mean())
    assert acc > base + 0.1, (acc, base)


def test_gif_codec_roundtrip_lzw_and_inline_parity():
    """r7: decode(encode(idx, pal)) == pal[idx] across interlace modes,
    palette sizes, LZW width growth (256-color random frame) and the
    4095-entry dictionary freeze (long repetitive stream); the inline
    kernel encoder/parser are bit-identical to the references; malformed
    streams raise ValueError, never wrong pixels."""
    from sparsity_spark.operators.multimodal import (
        _INLINE_CODEC_SRC,
        decode_gif,
        decode_stub,
        gif_encode,
    )

    rng = np.random.RandomState(41)
    ns = {"np": np}
    exec(_INLINE_CODEC_SRC, ns)
    pal8 = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, (4, 10, 20)).astype(np.uint8)
    for inter in (False, True):
        p = gif_encode(idx, pal8, interlace=inter)
        assert (decode_gif(p) == pal8[idx]).all()
        assert ns["encode_gif"](idx, pal8, inter) == p
        assert (ns["parse_gif"](p) == pal8[idx]).all()
    p = gif_encode(idx, pal8)
    assert (decode_stub(p, "image/gif") == pal8[idx]).all()

    # LZW code-width growth: a 256-color random frame fills the table fast
    pal256 = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    big = rng.randint(0, 256, (1, 60, 70)).astype(np.uint8)
    assert (decode_gif(gif_encode(big, pal256)) == pal256[big]).all()
    # dictionary freeze past 4095 entries: long repetitive stream
    rep = np.tile(np.arange(64, dtype=np.uint8).reshape(8, 8), (1, 40, 40))[:, :300, :300]
    assert (decode_gif(gif_encode(rep, pal256)) == pal256[rep]).all()

    # GIF89a extension blocks (e.g. graphics control) must be skipped
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    hdr_end = 13 + 3 * 8  # header + 8-color global table
    spliced = p[:hdr_end] + gce + p[hdr_end:]
    assert (decode_gif(spliced) == pal8[idx]).all()

    for bad in (
        p[:-1],                        # missing trailer
        p[:-2] + b"\x99\x3b",          # corrupt last sub-block terminator
        b"GIF89a" + p[6:20],           # truncated mid-header
        p.replace(b"\x2c", b"\x2d", 1),  # unknown block type
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError):
        gif_encode(idx, pal8[:1])  # palette too small
    with pytest.raises(ValueError):
        gif_encode(np.full((1, 2, 2), 9, dtype=np.uint8), pal8)  # index > palette


def test_gif_real_pipeline_frames_features_framesample(spark):
    """r7: the full GIF pipeline on REAL decoded frames — frame_sample
    md5s recomputed through decode_gif, gif_frame_stats channel sums and
    extract_features temporal luma block means recomputed in numpy;
    corrupt payloads and out-of-range indices yield NULLs."""
    import hashlib

    from sparsity_spark.operators.multimodal import (
        decode_gif,
        extract_features,
        frame_sample,
        gif_encode,
        gif_frame_stats,
    )

    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    rows = []
    for doc_id in (2, 5):
        idx = rng.randint(0, 16, (4, 12, 20)).astype(np.uint8)
        rows.append((doc_id, gif_encode(idx, pal, interlace=bool(doc_id % 2))))
    rows.append((9, rows[0][1][: len(rows[0][1]) // 2]))  # truncated
    assets = _binary_asset_df(spark, rows, "image/gif", chunk_count=6)

    got = frame_sample(assets, every_k=2, fake=False).toPandas()
    for doc_id, raw in rows[:2]:
        fr = decode_gif(raw)
        sub = got[got.doc_id == doc_id].set_index("frame_idx")
        assert sorted(sub.index) == [0, 2, 4]
        for f in (0, 2):
            assert sub.loc[f, "frame_md5"] == hashlib.md5(fr[f].tobytes()).hexdigest()
        assert pd.isna(sub.loc[4, "frame_md5"])  # chunk_count=6 > 4 real frames
    assert got[got.doc_id == 9]["frame_md5"].isna().all()

    stats = gif_frame_stats(assets, every_k=2).toPandas()
    for doc_id, raw in rows[:2]:
        fr = decode_gif(raw).astype(np.int64)
        sub = stats[stats.doc_id == doc_id].set_index("frame_idx")
        for f in (0, 2):
            assert sub.loc[f, "r_sum"] == fr[f, :, :, 0].sum()
            assert sub.loc[f, "g_sum"] == fr[f, :, :, 1].sum()
            assert sub.loc[f, "b_sum"] == fr[f, :, :, 2].sum()
    assert stats[stats.doc_id == 9]["r_sum"].isna().all()

    feats = extract_features(assets, fake=False).toPandas().set_index("doc_id")
    for doc_id, raw in rows[:2]:
        fr = decode_gif(raw).astype(np.int64)
        luma = (299 * fr[:, :, :, 0] + 587 * fr[:, :, :, 1] + 114 * fr[:, :, :, 2]) // 1000
        want = []
        for by in range(4):
            y0, y1 = (by * 12) // 4, ((by + 1) * 12) // 4
            for bx in range(4):
                x0, x1 = (bx * 20) // 4, ((bx + 1) * 20) // 4
                blk = luma[:, y0:y1, x0:x1]
                want.append(float(int(blk.sum()) // blk.size) / 255.0)
        assert list(feats.loc[doc_id, "feature"]) == want
    assert feats.loc[9, "feature"] is None


def test_edit_distance_pairs_lossless_vs_bruteforce(spark):
    """r7 FastSS: the deletion-neighborhood join + levenshtein verify must
    find EXACTLY the brute-force edit-distance ≤ 1 pairs — equality,
    insert/delete, and substitution all covered; distance-2 lookalikes
    that share variants (transpositions) are rejected by the verify."""
    import pandas as pd

    from sparsity_spark.operators.dedup import edit_distance_pairs

    names = [
        "alpha", "alpah",      # transposition: ed 2, shares variants -> rejected
        "alphas", "alph",      # insert (ed1 to alpha), delete (ed1 to alpha)
        "altha",               # substitution: ed1 to alpha
        "beta", "beta",        # exact duplicate (ed 0)
        "gamma", "delta",      # unrelated
        "", "x",               # empty and 1-char edge cases (ed 1)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(names)), "text": names})
    df = spark.createDataFrame(pdf)
    got = {
        (int(r["id_a"]), int(r["id_b"]), int(r["dist"]))
        for r in edit_distance_pairs(df).collect()
    }

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    want = {
        (i, j, lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want
    assert (0, 1, 2) not in got  # the transposition stayed out


def test_edit_distance_pairs_property_random(spark):
    """Randomized losslessness: on a corpus of short random strings over a
    tiny alphabet (dense near-dup structure), the operator equals brute
    force exactly."""
    import itertools
    import random

    import pandas as pd

    from sparsity_spark.operators.dedup import edit_distance_pairs

    rnd = random.Random(19)
    names = [
        "".join(rnd.choice("abc") for _ in range(rnd.randint(0, 5)))
        for _ in range(60)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(names)), "text": names})
    got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in edit_distance_pairs(spark.createDataFrame(pdf)).collect()
    }

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    want = {
        (i, j)
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 1
    }
    assert got == want


def test_hll_group_sketch_matches_per_group_build(spark):
    """r7 grouped HLL: the one-aggregate grouped register file must equal
    building an independent sketch per group, and per-group estimates
    track the true distinct counts within the m=256 error envelope."""
    import pandas as pd

    from sparsity_spark.operators.sketches import (
        hll_estimate,
        hll_group_estimate,
        hll_group_sketch,
        hll_sketch,
    )

    rows = []
    for g, n in (("a", 900), ("b", 90), ("c", 3)):
        rows += [(g, f"{g}_{i % n}") for i in range(n * 2)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["grp", "v"]))
    grouped = hll_group_sketch(df, ["grp"], "v")
    for g, n in (("a", 900), ("b", 90), ("c", 3)):
        sub = (
            grouped.filter(F.col("grp") == g).select("bucket", "r")
            .toPandas().sort_values("bucket").reset_index(drop=True)
        )
        solo = (
            hll_sketch(df.filter(F.col("grp") == g), "v")
            .toPandas().sort_values("bucket").reset_index(drop=True)
        )
        assert sub.equals(solo), g
    est = {r["grp"]: r for r in hll_group_estimate(grouped, ["grp"]).collect()}
    assert abs(est["a"]["distinct_estimate"] - 900) / 900 < 0.25
    assert est["c"]["n_present"] == 3  # 3 values -> at most 3 registers


def test_bpe_train_matches_textbook_reference(spark):
    """r7 BPE: the distributed trainer must produce exactly the merges and
    segmentations of a textbook python reference (Sennrich-style greedy
    pair merging over word frequencies, count-then-lexicographic
    tie-break), including the same-symbol-run case plain string replace
    gets wrong; bpe_encode token counts shrink monotonically with merges."""
    import pandas as pd

    from sparsity_spark.operators.text import bpe_encode, bpe_train

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaaa aa",  # same-symbol runs: the greedy-fold edge case
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    merges, seqs = bpe_train(docs, num_merges=4)

    # textbook reference
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    ref = {w: [*w, "</w>"] for w in wc}
    ref_merges = []
    for _ in range(4):
        pc = Counter()
        for w, toks in ref.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref_merges.append(best)
        a, b = best
        for w, toks in ref.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            ref[w] = out

    assert [(a, b) for _, a, b, _c in merges] == ref_merges
    got = {r["w"]: r["seq"] for r in seqs.collect()}
    assert got == {w: " ".join(t) for w, t in ref.items()}

    # encode: token counts match the reference segmentation; more merges
    # never increase the count
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        want = sum(len(ref[w]) for w in t.split(" ") if w)
        assert enc[i]["n_tokens"] == want
    enc0 = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, []).collect()}
    for i in enc:
        assert enc[i]["n_tokens"] <= enc0[i]


def test_quantile_sample_deterministic_and_mergeable(spark):
    """r7 quantile summary: the hash-threshold sample is a pure function
    of the key set (identical across partitionings), merges by union
    (disjoint key shards == one-shot build), and its interpolated
    quantiles track the true ones within Bernoulli-sample rank error."""
    import pandas as pd

    from sparsity_spark.operators.sketches import (
        quantile_sample,
        quantile_sample_estimate,
        quantile_sample_merge,
    )

    n = 20000
    pdf = pd.DataFrame({"k": range(n), "v": [float(i % 1000) for i in range(n)]})
    df = spark.createDataFrame(pdf)
    s = quantile_sample(df, "k", "v", rate_ppm=62500)
    samp = s.toPandas().sort_values("k").reset_index(drop=True)
    # partition invariance
    samp8 = (
        quantile_sample(df.repartition(8), "k", "v", rate_ppm=62500)
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert samp.equals(samp8)
    # sample size concentrates around n/16
    assert abs(len(samp) - n / 16) < 4 * (n / 16) ** 0.5
    # merge of disjoint shards == one-shot
    lo = quantile_sample(df.filter("k < 10000"), "k", "v", rate_ppm=62500)
    hi = quantile_sample(df.filter("k >= 10000"), "k", "v", rate_ppm=62500)
    merged = (
        quantile_sample_merge(lo, hi).toPandas().sort_values("k").reset_index(drop=True)
    )
    assert merged.equals(samp)
    # estimates track the true quantiles of the uniform 0..999 values
    est = {r["q"]: r["value_estimate"] for r in quantile_sample_estimate(s).collect()}
    for q in (0.25, 0.5, 0.75, 0.9):
        assert abs(est[q] - q * 999) < 40, (q, est[q])
    with pytest.raises(ValueError):
        quantile_sample(df, "k", "v", rate_ppm=0)


def test_bpe_train_local_and_kernel_encode_parity(spark):
    """r9 scale-path BPE: the driver-side trainer must produce EXACTLY the
    distributed trainer's merge list (same pair counts, same count-desc /
    pair-asc tie-break), and the Arrow vocab-kernel encode path (forced
    via max_expr_merges=0) must land on identical per-doc token counts to
    the fold-expression path — at every merge-list width including the
    same-symbol-run edge case."""
    import pandas as pd

    from sparsity_spark.operators.text import (
        bpe_encode,
        bpe_train,
        bpe_train_local,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaaa aa",
        "the cat sat on the mat",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for nm in (1, 4, 12):
        dist_merges, _ = bpe_train(docs, num_merges=nm)
        local_merges = bpe_train_local(docs, num_merges=nm)
        assert local_merges == dist_merges, nm
        expr = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_encode(docs, local_merges, max_expr_merges=99).collect()
        }
        kern = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_encode(docs, local_merges, max_expr_merges=0).collect()
        }
        assert expr == kern, nm


def test_bpe_encode_deep_merges_via_kernel(spark):
    """r9: a 64-merge tokenizer — far past any sane expression depth —
    encodes through the kernel seam and its counts match a from-scratch
    python replay of train+encode (the textbook greedy reference)."""
    import pandas as pd
    from collections import Counter

    from sparsity_spark.operators.text import bpe_encode, bpe_train_local

    texts = [
        f"alpha beta gamma delta epsilon {w}"
        for w in ("zeta eta theta", "iota kappa", "lambda mu nu xi", "omicron pi")
    ] * 3
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    merges = bpe_train_local(docs, num_merges=64)
    assert len(merges) > 8  # deep enough to force the kernel path
    got = {
        r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, merges).collect()
    }

    # python replay (same greedy fold, merges already trusted from the
    # parity test above)
    wc = Counter(w for t in texts for w in t.split(" ") if w and "|" not in w)
    seg = {}
    for w in wc:
        toks = [*w, "</w>"]
        for _, a, b, _c in merges:
            out, prev = [], None
            for x in toks:
                if prev is None:
                    prev = x
                elif prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            toks = out
        seg[w] = len(toks)
    want = {
        i: sum(seg[w] for w in t.split(" ") if w and "|" not in w)
        for i, t in enumerate(texts)
    }
    assert got == want


def test_audio_spectral_bands_overflow_raises_not_wraps(spark):
    """r9 overflow fix: a full-scale square wave whose true bin energy
    exceeds 2^63 must RAISE (the BIGINT column cannot carry it) instead
    of silently wrapping — and the same asset at a smaller coeff_scale
    must produce the exact arbitrary-precision energies (python-int
    replay), proving the chunked accumulation is exact past the naive
    ~256-frame int64 partial-sum bound the old docstring ignored."""
    import numpy as np
    import pytest as _pytest

    from sparsity_spark.operators.multimodal import (
        audio_spectral_bands,
        dft8_coeffs,
        wav_encode,
    )

    n = 8 * 2000  # 2000 frames of alternating full-scale samples
    sig = np.tile(np.array([32767, -32768] * 4, dtype=np.int16), n // 8)
    assets = spark.createDataFrame(
        [(1, bytearray(wav_encode(sig)))], "doc_id long, content binary"
    )
    with _pytest.raises(Exception, match="exceeds BIGINT"):
        audio_spectral_bands(assets).collect()

    got = {
        r["bin"]: r["energy"]
        for r in audio_spectral_bands(assets, coeff_scale=16).collect()
    }
    C, S = dft8_coeffs(16)
    X = sig.astype(object).reshape(-1, 8)  # object dtype: exact python ints
    want = {}
    for k in range(5):
        e = 0
        for row in X:
            re = sum(int(c) * int(v) for c, v in zip(C[k], row))
            im = sum(int(s) * int(v) for s, v in zip(S[k], row))
            e += re * re + im * im
        want[k] = e
    assert got == want
    # the fixture is long/loud enough that exactness here is meaningful:
    # 2000 frames is ~8x past the naive full-scale int64 frame-sum bound
    assert max(want.values()) > (1 << 50)


def test_ivfpq_refine_wide_nprobe_recall_floor_uniform(spark):
    """r9 recall push (VERDICT r8 #8): on the NEAR-UNIFORM sf0.01
    embeddings — where r6 diagnosed recall as routing-capped (0.55 at
    nprobe=3) — widening the probe set AND exact-cosine refining the
    residual-ADC shortlist clears the cap: measured 0.820 at
    nprobe=5/shortlist=4 and 0.985-1.000 at nprobe=8 (r9 sweep, SCALE.md).
    Floor pinned at 0.6 (r8's was 0.4 without refine); also pins
    refined > plain ADC at the same nprobe."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.orderBy("vec_id").limit(20)
    k = 10
    truth = {}
    for r in similarity.cosine_topk(emb, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cents = similarity.kmeans_fit(emb, k=8, iters=2)
    book = similarity.pq_trained_codebook(emb, m=16, k=256, dim=64, iters=2)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / sum(
            len(t) for t in truth.values()
        )

    refined = recall(
        similarity.ivf_pq_refine_topk(
            emb, queries, cents, m=16, k_code=256, dim=64, topk=k,
            nprobe=5, shortlist=4, residual=True, codebook=book,
        ).collect()
    )
    assert refined >= 0.6, f"refined recall@10 = {refined} (measured 0.820)"
    plain = recall(
        similarity.ivf_pq_topk(
            emb, queries, cents, m=16, k_code=256, dim=64, topk=k,
            nprobe=5, codebook=book,
        ).collect()
    )
    assert refined > plain, (refined, plain)


def test_bpe_merge_store_roundtrip_exact(spark):
    """r9 tokenizer store: write→read returns the EXACT merge list
    (ranks, strings, counts) and encode-from-store equals
    encode-from-memory; a second write fully replaces the first
    (version-wholesale semantics — stale rows from a longer previous
    tokenizer must not survive)."""
    import pandas as pd

    from sparsity_spark.operators.text import (
        bpe_encode,
        bpe_train_local,
        read_merge_store,
        write_merge_store,
    )

    texts = ["low low lower lowest", "new newer newest low", "aaaa aa a"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    merges = bpe_train_local(docs, num_merges=12)
    write_merge_store(spark, merges, "bpe_store_test")
    assert read_merge_store(spark, "bpe_store_test") == merges

    mem = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, merges).collect()}
    stored = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(docs, read_merge_store(spark, "bpe_store_test")).collect()
    }
    assert mem == stored

    shorter = bpe_train_local(docs, num_merges=3)
    write_merge_store(spark, shorter, "bpe_store_test")
    assert read_merge_store(spark, "bpe_store_test") == shorter  # no stale tail


def test_pca_power_component_aligns_with_numpy_eigvec(spark):
    """Integer power iteration must land on the true dominant direction:
    a synthetic cloud stretched 10:1 along a known axis, |cos| vs the
    float eigenvector > 0.99, and the projection must be exactly the
    integer dot product (replayed in python)."""
    rng = np.random.RandomState(7)
    d = 8
    axis = np.array([3.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0, 1.0])
    axis /= np.linalg.norm(axis)
    X = rng.randn(200, 1) * 0.9 * axis[None, :] + rng.randn(200, d) * 0.05
    pdf = pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
    )
    df = spark.createDataFrame(pdf)

    G = similarity.pca_gram_int(df)
    v = similarity.pca_power_component(G, iterations=5)
    vf = np.asarray(v, dtype=np.float64)
    evals, evecs = np.linalg.eigh(np.asarray(G, dtype=np.float64))
    top = evecs[:, np.argmax(evals)]
    cos = abs(vf @ top) / (np.linalg.norm(vf) * np.linalg.norm(top))
    assert cos > 0.99, cos

    # projection is the exact integer dot product of quantized inputs
    got = {
        r["vec_id"]: r["score_micro"]
        for r in similarity.pca_project_int(df, v).collect()
    }
    import math

    for i, row in enumerate(X):
        xq = [math.floor(float(x) * 1_000_000) for x in row]
        assert got[i] == sum(a * b for a, b in zip(xq, v))

    # gram partials are partitioning-invariant (pure integer sums)
    G2 = similarity.pca_gram_int(df.repartition(13))
    assert G2 == G


def test_pca_gram_overflow_guard_raises(spark):
    big = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(4), "embedding": [[4e9, 1.0]] * 4}
        )
    )
    # the executor-side ValueError surfaces wrapped in PythonException
    with pytest.raises(Exception, match="overflow"):
        similarity.pca_gram_int(big)  # max|x_q| ~ 4e15 -> first row trips


def test_corr_matrix_matches_numpy_on_quantized_values(spark):
    """The integer-moments correlation must equal numpy's corrcoef on the
    SAME quantized values (tolerance only from the 6-dp rounding), and
    perfectly correlated / anti-correlated engineered dims must land at
    exactly ±1."""
    rng = np.random.RandomState(3)
    base = rng.randn(120)
    X = np.stack(
        [base, 2.0 * base + 0.001, -base, rng.randn(120)], axis=1
    )
    pdf = pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
    )
    df = spark.createDataFrame(pdf)
    got = {(r["i"], r["j"]): r["corr6"] for r in similarity.corr_matrix(df).collect()}

    Xq = np.floor(X * 1_000_000)
    C = np.corrcoef(Xq.T)
    for (i, j), v in got.items():
        assert abs(v - C[i][j]) < 2e-6, (i, j, v, C[i][j])
    assert got[(0, 2)] == -1.0
    assert got[(0, 1)] > 0.999999

    # partitioning invariance: moments are integer sums
    got2 = {(r["i"], r["j"]): r["corr6"] for r in similarity.corr_matrix(df.repartition(7)).collect()}
    assert got2 == got


def test_grouped_pca_matches_per_group_single_pca(spark):
    """Per-group PCA must equal running the single-group pipeline on each
    group's slice independently — same moments, same iteration, same
    projection — and differ BETWEEN groups engineered with different
    dominant axes."""
    rng = np.random.RandomState(11)
    d = 6
    ax0 = np.array([1.0, 0, 0, 0, 0, 0])
    ax1 = np.array([0, 0, 0, 1.0, 0, 0])
    X0 = rng.randn(80, 1) * ax0[None, :] + rng.randn(80, d) * 0.03
    X1 = rng.randn(80, 1) * ax1[None, :] + rng.randn(80, d) * 0.03
    pdf = pd.DataFrame(
        {
            "vec_id": range(160),
            "label": [0] * 80 + [1] * 80,
            "embedding": [list(map(float, r)) for r in np.vstack([X0, X1])],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["vec_id"]: (r["label"], r["score_micro"])
        for r in similarity.grouped_pca_project(df, iterations=4).collect()
    }
    for g in (0, 1):
        sub = df.where(F.col("label") == g)
        single = {
            r["vec_id"]: r["score_micro"]
            for r in similarity.pca_top_component_project(sub, iterations=4).collect()
        }
        for vid, s in single.items():
            assert got[vid] == (g, s)

    # the two groups' components point along different axes
    moms = similarity.grouped_moments_int(df)
    v0 = similarity.pca_power_component(moms[0][0], iterations=4)
    v1 = similarity.pca_power_component(moms[1][0], iterations=4)
    assert abs(v0[0]) > 10 * abs(v0[3]) and abs(v1[3]) > 10 * abs(v1[0])


# --------------------------------------------------------------------------
# collocations / phrase_search (r9)
# --------------------------------------------------------------------------


def test_collocations_hand_checked_counts(spark):
    docs = spark.createDataFrame(
        [(0, "new york new york city"), (1, "york new york state")],
        "doc_id long, text string",
    )
    from sparsity_spark.operators.text import collocations

    got = {
        (r["w1"], r["w2"]): (
            r["pair_count"], r["w1_count"], r["w2_count"], r["pmi_ratio"]
        )
        for r in collocations(docs, min_count=2).collect()
    }
    # tokens: 9 total; new=3 york=4 city=1 state=1
    # bigrams: new york x3, york new x2, york city, york state
    assert set(got) == {("new", "york"), ("york", "new")}
    pc, c1, c2, ratio = got[("new", "york")]
    assert (pc, c1, c2) == (3, 3, 4)
    assert ratio == round((9.0 * 3) / (3.0 * 4), 6)
    assert got[("york", "new")][0] == 2


def test_collocations_empty_tokens_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "a  b a  b"), (1, "a b")], "doc_id long, text string"
    )
    from sparsity_spark.operators.text import collocations

    rows = collocations(docs, min_count=1).collect()
    # split on single space yields empty tokens at the double spaces; they
    # must count neither as unigrams nor as bigram members
    assert all(r["w1"] != "" and r["w2"] != "" for r in rows)
    got = {(r["w1"], r["w2"]): r["pair_count"] for r in rows}
    # adjacency ACROSS a dropped empty token is not a bigram: doc 0
    # contributes no (a,b) pairs, doc 1 contributes one
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_phrase_search_counts_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the cat sat"),
            (1, "cat the sat"),
            (2, "the cat"),
            (3, "sat cat the"),
        ],
        "doc_id long, text string",
    )
    from sparsity_spark.operators.text import phrase_search

    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "the cat sat").collect()
    }
    # doc 0 has two occurrences; docs 1/3 have the words but not the order;
    # doc 2 is a prefix only
    assert got == {0: 2}
    got2 = {
        r["doc_id"]: r["n_matches"] for r in phrase_search(docs, "the cat").collect()
    }
    assert got2 == {0: 2, 2: 1}


def test_phrase_search_single_word_and_empty(spark):
    docs = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    from sparsity_spark.operators.text import phrase_search

    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(docs, "a").collect()}
    assert got == {0: 2}
    import pytest as _p

    with _p.raises(ValueError):
        phrase_search(docs, " ")


def test_sq8_topk_exact_integer_scores(spark):
    import numpy as np

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.5, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    from sparsity_spark.operators.similarity import sq8_topk

    got = {
        (r["query_id"], r["neighbor_id"]): r["score_i8"]
        for r in sq8_topk(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    }

    def code(v):
        s = max(abs(x) for x in v)
        return [int(np.floor(x * 127.0 / s + 0.5)) for x in v]

    q = code([1.0, 0.0, 0.0])
    for nid, v in [(1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.0]),
                   (3, [-1.0, 0.0, 0.0]), (4, [0.5, 1.0, 0.0])]:
        expect = sum(a * b for a, b in zip(q, code(v)))
        assert got[(0, nid)] == expect
    # ranking: 1 (aligned) above 4 (diagonal) above 2 (orthogonal) above 3
    assert got[(0, 1)] > got[(0, 4)] > got[(0, 2)] > got[(0, 3)]


def test_sq8_topk_excludes_self_and_caps_k(spark):
    emb = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    from sparsity_spark.operators.similarity import sq8_topk

    rows = sq8_topk(emb, emb.filter(F.col("vec_id") < 2), k=3).collect()
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(per_q) == {0, 1} and all(len(v) == 3 for v in per_q.values())


def test_containment_join_superset_detected_jaccard_blind(spark):
    """A short doc fully inside a long doc: containment src->dst = 1.0
    while Jaccard is tiny — the asymmetric case the operator exists for."""
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    from sparsity_spark.operators.dedup import containment_join

    rows = {
        (r["src_id"], r["dst_id"]): (r["overlap"], r["src_size"], r["containment"])
        for r in containment_join(docs, threshold=0.9, k=3).collect()
    }
    # short's 3 shingles all appear in long; long's 63 shingles mostly not
    assert set(rows) == {(1, 2)}
    ov, sz, c = rows[(1, 2)]
    assert (ov, sz, c) == (3, 3, 1.0)


def test_containment_join_directional_thresholds(spark):
    # doc 1 = 6 words (4 shingles), doc 2 = first 5 words (3 shingles):
    # overlap 3 -> C(2->1) = 1.0 passes, C(1->2) = 0.75 fails at t=0.9
    w = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, w), (2, "a b c d e")], "doc_id long, text string"
    )
    from sparsity_spark.operators.dedup import containment_join

    got = {(r["src_id"], r["dst_id"]) for r in containment_join(docs, threshold=0.9).collect()}
    assert got == {(2, 1)}
    got2 = {(r["src_id"], r["dst_id"]) for r in containment_join(docs, threshold=0.7).collect()}
    assert got2 == {(1, 2), (2, 1)}


def test_containment_join_no_pairs_below_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "x y z q r"), (2, "m n o p s")], "doc_id long, text string"
    )
    from sparsity_spark.operators.dedup import containment_join

    assert containment_join(docs, threshold=0.5).count() == 0


def test_containment_boilerplate_gram_no_quadratic_pairs(spark):
    """The r9 scale-killer fixture (VERDICT r9 #3): every doc shares one
    boilerplate header, so the raw shared-gram join materialized ~n²/2
    collision rows for that gram alone. The prefix filter must produce
    ZERO candidates here — the header grams are max-df, sort last in
    every doc's rarest-first order, and never enter a prefix — while the
    end result stays exact (no qualifying pair exists: tails unique)."""
    import pyspark.sql.functions as F
    from sparsity_spark.operators.dedup import (
        _containment_candidates,
        containment_join,
        shingles_expr,
        words_expr,
    )

    n = 200
    header = "all rights reserved contact the webmaster"
    docs = spark.createDataFrame(
        [(i, f"{header} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(n)],
        "doc_id long, text string",
    )
    grams = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(shingles_expr(words_expr("text"), 3)).alias("g"),
    )
    # candidate VOLUME is the claim: zero pairs despite a df=n gram
    assert _containment_candidates(grams, 0.6).count() == 0
    assert containment_join(docs, threshold=0.6, k=3).count() == 0


def test_containment_min_match_filter_keeps_tiny_docs(spark):
    """r11 minimum-match filter edge: a doc so small its WHOLE gram set
    is the prefix (floor(t·|s| − ε) = 0) must survive on a single
    matched gram — the m >= 2 requirement only applies when grams
    outside the prefix exist to make up the difference."""
    from sparsity_spark.operators.dedup import containment_join

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in containment_join(docs, threshold=0.9, k=3).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_boilerplate_does_not_prune_true_superset(spark):
    """Losslessness under boilerplate: a genuine containment pair must
    still surface when every doc ALSO shares the high-df header — the
    contained doc's rare tail grams carry it through the prefix join."""
    header = "all rights reserved contact the webmaster"
    short = f"{header} alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    rows = [(1, short), (2, long_)] + [
        (i, f"{header} u{i}a u{i}b u{i}c u{i}d") for i in range(3, 60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from sparsity_spark.operators.dedup import containment_join

    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in containment_join(docs, threshold=0.9, k=3).collect()
    }
    assert got == {(1, 2): 1.0}


def test_mmr_skips_redundant_twin(spark):
    """Two near-identical high-relevance vectors: pure relevance ranks
    them 1-2; MMR at λ=50 must pick one, then prefer the diverse doc."""
    # per-vector max-scaling means relevance alone ties all three (each
    # has a full-scale first code); redundancy lives in the SECOND
    # dimension, which only the MMR penalty sees: v2 nearly duplicates
    # v1 there, v3 is orthogonal to both
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),   # query
            (1, [1.0, 1.0, 0.0]),   # first pick (id tie-break on rel)
            (2, [1.0, 0.9, 0.0]),   # near-twin of 1 off the query axis
            (3, [1.0, 0.0, 0.9]),   # diverse
        ],
        "vec_id long, embedding array<double>",
    )
    from sparsity_spark.operators.similarity import mmr_topk, sq8_topk

    rel_order = [
        r["neighbor_id"]
        for r in sq8_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    ]
    assert rel_order[:2] == [1, 2]
    mmr = [
        r["neighbor_id"]
        for r in mmr_topk(emb, emb.where(F.col("vec_id") == 0), k=3,
                          lambda_pct=50).orderBy("step").collect()
    ]
    assert mmr[0] == 1 and mmr[1] == 3 and set(mmr) == {1, 2, 3}


def test_mmr_lambda_zero_is_pure_relevance(spark):
    emb = spark.createDataFrame(
        [(i, [float(10 - i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    from sparsity_spark.operators.similarity import mmr_topk, sq8_topk

    mmr = [
        r["neighbor_id"]
        for r in mmr_topk(emb, emb.where(F.col("vec_id") == 0), k=3,
                          lambda_pct=0).orderBy("step").collect()
    ]
    rel = [
        r["neighbor_id"]
        for r in sq8_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    ]
    assert mmr == rel


def test_mmr_validates_inputs(spark):
    emb = spark.createDataFrame(
        [(0, [1.0]), (1, [0.5])], "vec_id long, embedding array<double>"
    )
    from sparsity_spark.operators.similarity import mmr_topk

    with pytest.raises(ValueError):
        mmr_topk(emb, emb, k=1)  # two query rows
    with pytest.raises(ValueError):
        mmr_topk(emb, emb.where(F.col("vec_id") == 0), lambda_pct=101)


def test_mmr_broadcast_path_matches_literal_path(spark, monkeypatch):
    """r10 advisor fix / r11 default flip: the selected codes ship via
    broadcast join by default (step-invariant codegen); the literal-tree
    path remains behind the budget knob. Both paths must make bitwise-
    identical picks — same exact integer dots, same argmax tie-break —
    so the budget is purely a planning-cost knob."""
    import sparsity_spark.operators.similarity as sim

    rng = [(i, [((i * 7 + j * 13) % 19 - 9) / 10.0 for j in range(24)])
           for i in range(30)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 0)
    bc = [tuple(r) for r in sim.mmr_topk(emb, q, k=4, lambda_pct=60).collect()]
    monkeypatch.setattr(sim, "_MMR_LITERAL_BUDGET", 4096)  # force literal path
    lit = [tuple(r) for r in sim.mmr_topk(emb, q, k=4, lambda_pct=60).collect()]
    assert lit == bc and len(lit) == 4


def test_containment_clusters_superset_survives(spark):
    """r10 collapse rule: within a containment component the LARGEST doc
    keeps (superset survives — the opposite of the near-twin keep-first
    rule), ties to the smaller id; singletons keep themselves."""
    from sparsity_spark.operators.dedup import containment_clusters

    short = "alpha beta gamma delta epsilon"
    mid = short + " zeta eta theta"
    long_ = mid + " " + " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, mid), (3, long_), (9, "totally unrelated words here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in containment_clusters(docs, threshold=0.6, k=3).collect()
    }
    # 1 ⊂ 2 ⊂ 3 chain -> one component rooted at min id 1; 3 (largest) keeps
    assert got[1] == (1, False) and got[2] == (1, False) and got[3] == (1, True)
    assert got[9] == (9, True)  # singleton keeps itself


def test_boilerplate_fraction_hand_computed(spark):
    """r11: cross-doc boilerplate — the gram 'a b c' appears in 3 docs
    (df=3, common at min_df=3); every other gram is rare. A doc below
    3 words has zero grams and a NULL fraction."""
    from sparsity_spark.operators.text import boilerplate_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c x1 y1"),   # grams: 'a b c','b c x1','c x1 y1' -> 1 common of 3
            (2, "a b c x2 y2"),
            (3, "a b c x3 y3"),
            (4, "p q r s"),       # grams: 'p q r','q r s' -> 0 common of 2
            (5, "too short"),     # < 3 words -> no grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_fraction(docs, min_df=3).collect()}
    for i in (1, 2, 3):
        assert got[i]["n_grams"] == 3
        assert got[i]["n_common"] == 1
        # (2*1*1e6 + 3) div 6 = 333333 -> 0.333333 (round-half-up micro)
        assert abs(got[i]["boilerplate"] - 0.333333) < 1e-9
    assert got[4]["n_grams"] == 2 and got[4]["n_common"] == 0
    assert got[4]["boilerplate"] == 0.0
    assert got[5]["n_grams"] == 0 and got[5]["boilerplate"] is None


def test_boilerplate_fraction_duplicate_grams_count_once(spark):
    """A gram repeated WITHIN one doc contributes one distinct gram and
    one df unit — within-doc repetition is repetition_stats' job."""
    from sparsity_spark.operators.text import boilerplate_fraction

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "a b c z z2 z3")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_fraction(docs, min_df=2).collect()}
    # doc 1 grams: 'a b c','b c a','c a b' (each x>1 occurrences, distinct=3)
    assert got[1]["n_grams"] == 3
    # only 'a b c' is shared with doc 2 -> df=2 -> common
    assert got[1]["n_common"] == 1
    assert got[2]["n_common"] == 1


def test_lsh_recall_audit_catches_exact_twin(spark):
    """r11: an identical pair has all 16 minhashes equal, so every band
    collides — the banding MUST catch it (recall 1.0 in the 0.9+
    bucket); n_caught can never exceed n_true_pairs."""
    from sparsity_spark.operators.dedup import lsh_recall_audit

    twin = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, twin), (2, twin), (3, other)], "doc_id long, text string"
    )
    rows = lsh_recall_audit(docs, base_threshold=0.6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["j_bucket"] == "0.9+"
    assert r["n_true_pairs"] == 1 and r["n_caught"] == 1
    assert r["recall"] == 1.0


def test_lsh_recall_audit_counts_missed_pairs(spark):
    """A true pair the banding misses still counts in n_true_pairs with
    hit=0 — the audit is grounded in the lossless PPJoin, not in the
    banding's own candidates."""
    from sparsity_spark.operators.dedup import lsh_candidate_pairs, lsh_recall_audit

    base = [f"w{i}" for i in range(20)]
    variant = base[:13] + [f"v{i}" for i in range(7)]  # J = 13/27 ≈ 0.48
    mid = base[:16] + [f"u{i}" for i in range(4)]      # J = 16/24 ≈ 0.67 on words
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(mid)), (3, " ".join(variant))],
        "doc_id long, text string",
    )
    audit = {r["j_bucket"]: r for r in lsh_recall_audit(docs, base_threshold=0.1).collect()}
    total_true = sum(r["n_true_pairs"] for r in audit.values())
    total_caught = sum(r["n_caught"] for r in audit.values())
    caught_by_lsh = lsh_candidate_pairs(docs).count()
    assert total_caught <= total_true
    # every LSH candidate that IS a true pair >= 0.1 is counted as caught
    assert total_caught <= caught_by_lsh + 1  # candidates below 0.1 don't count
    for r in audit.values():
        assert 0.0 <= r["recall"] <= 1.0


def test_encode_with_assignment_matches_join_window_path(spark, sf_dir):
    """r11 fusion parity: the one-pass Arrow encode+assign must be
    bit-identical to the pq_encode + ivf_assign + id-join shape it
    replaced — sequential-fold cosines, shortest-repr HALF_UP round-6,
    and the (cs desc, cid asc) tie-break all replicated batch-side."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.similarity import (
        _encode_with_assignment,
        ivf_assign,
        pq_encode,
        pq_sampled_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    book = pq_sampled_codebook(emb, 4, 16, 64)
    old = (
        pq_encode(emb, 4, 16, 64, codebook=book)
        .join(ivf_assign(emb, cents).select("vec_id", "centroid_id"), on="vec_id")
        .select("vec_id", "centroid_id", "subspace", "code")
    )
    new = _encode_with_assignment(
        emb, cents, book, 4, 16, 64, "vec_id", "embedding"
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))


def test_band_keys_from_grams_matches_text_path(spark, sf_dir):
    """r11 sharing parity: band keys derived from a pre-materialized
    distinct-gram table must be row-identical to band_keys from text —
    same md5 fingerprints, same universal-hash minima, same band md5s."""
    from sparsity_spark.data import load_table
    from sparsity_spark.operators.dedup import (
        band_keys,
        band_keys_from_grams,
        shingles_expr,
        words_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.array_distinct(shingles_expr(words_expr("text"), 3)).alias("g"),
    )
    a = sorted(map(tuple, band_keys(docs).collect()))
    b = sorted(map(tuple, band_keys_from_grams(grams).collect()))
    assert a == b
