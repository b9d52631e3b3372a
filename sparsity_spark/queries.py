"""Driver-contract query registry: Spark implementation + DuckDB oracle pairs.

Each entry exercises one operator row of SURVEY.md §2 (or a north-star
extension) end-to-end on the driver's testdata. Conventions that keep the
order-insensitive value-hash comparison honest:

* every computed column is aliased identically in Spark and SQL;
* float aggregates are rounded to 4 decimals on BOTH sides (double summation
  order differs between engines; 60k-row sums agree far beyond 1e-4);
* timestamps are emitted as formatted strings (testdata parquet is
  TIMESTAMP(NANOS): Spark reads micros via data.load_table, DuckDB reads
  nanos natively — raw values would hash-differ);
* every SIGN-CROSSING rounded double output (z-scores, correlations,
  pct-changes, cosines) carries ``+ 0.0`` after the oracle's ROUND
  (r10 audit, VERDICT r9 #2): DuckDB ROUND preserves IEEE ``-0.0`` while
  Spark's BigDecimal HALF_UP round has no signed zero, so a tiny
  negative that rounds to zero stringifies as ``-0.0`` vs ``0.0`` and
  reds the driver hash (the r9 graph_lpa_modularity failure class —
  that row is now pure integer micros). ``-0.0 + 0.0 = +0.0`` and every
  other value is unchanged, so the normalization is exact. Strictly
  non-negative outputs (revenues, ratios with positive thresholds,
  entropies) don't need it; internal CTE rounds don't either (-0.0 is
  arithmetic-transparent and only stringification diverges).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparsity_spark.data import load_table
from sparsity_spark.util import ensure_parallelism
from sparsity_spark.events import events_coo, read_events
from sparsity_spark.frame import COL, VAL, SparseFrame
from sparsity_spark.reshape import sparse_one_hot

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Session-scoped memo for the two shared graph edge builds (r10, VERDICT
# r9 #7): seven rows each rebuilt the SAME symmetric edge table —
# distinct(lineitem⋈orders) + self-join for co-purchase, the bipartite
# projection for cust↔supp — paying ~2-3 s apiece at sf0.1 before their
# actual iteration started. The FIRST use in a session drops and
# rewrites a bucketed-by-src table (the edge-store discipline — disk,
# not executor cache, because the bench's inter-query clearCache()
# hygiene would evict an in-memory handle); every later row reads the
# bucketed layout, already co-located on the per-iteration join key. A
# fresh session (each driver correctness run, each oracle replay)
# rebuilds from scratch — the memo is keyed by Spark application id, so
# results can never depend on a previous session's table.
_EDGE_MEMO: dict = {}


def _memo_edges(spark, sf_dir: str, kind: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    table = _EDGE_MEMO.get(key)
    if table is None:
        from sparsity_spark.operators.skew import write_bucketed

        token = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
        table = f"shared_edges_{kind}_{token}"
        write_bucketed(build(), table, ["src"], num_buckets=32)
        _EDGE_MEMO[key] = table
    return spark.table(table)


def _cust_supp_edges(spark, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier bipartite edges, shared by the
    pagerank / PPR / walk / skip-gram / BFS rows. Entity namespaces as
    DISJOINT INTEGER ranges (custkey·2 even, suppkey·2+1 odd) — string
    prefixes cost ~2× in the distinct/join shuffles at 1.17 M edges."""
    from sparsity_spark.operators.graph import symmetrize_edges

    def build():
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
        )
        return symmetrize_edges(pairs, "cust", "supp", as_string=False)

    return _memo_edges(spark, sf_dir, "cust_supp", build)


def _ranked_neighbors(spark, sf_dir: str) -> DataFrame:
    """Session-shared dst-ranked neighbor table (src, dst, rank, deg)
    over the cust↔supp edges — the walk family's lookup structure (r11):
    the three walk rows (uniform walks, biased walks, skip-gram) each
    re-ran the same per-src row_number + count windows over the 1.17 M
    shared edges before stepping; the ranking is a pure function of the
    distinct edge set (row_number over unique (src, dst) is
    deterministic), so it persists once per session like the edge
    stores, bucketed by src — the key every step's frontier join and
    the distance-1 flag probe use."""
    from pyspark.sql import Window

    def build():
        e = _cust_supp_edges(spark, sf_dir)
        return e.select(
            "src",
            "dst",
            (
                F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1
            ).alias("rank"),
            F.count("*").over(Window.partitionBy("src")).alias("deg"),
        )

    return _memo_edges(spark, sf_dir, "cust_supp_ranked", build)


def _co_purchase_edges(spark, sf_dir: str) -> DataFrame:
    """Symmetric customer co-purchase edges (same (partkey, rounded qty)
    bought by two customers), shared by the k-core / triangle / LPA /
    link-prediction rows."""
    from sparsity_spark.operators.graph import symmetrize_edges

    def build():
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        buy = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            F.col("l_partkey").alias("pk"),
            F.round("l_quantity").cast("long").alias("q"),
            F.col("o_custkey").alias("cust"),
        ).distinct()
        a = buy.select("pk", "q", F.col("cust").alias("s1"))
        b = buy.select("pk", "q", F.col("cust").alias("s2"))
        # upper triangle only (r11): s1 != s2 emitted BOTH orientations,
        # and symmetrize_edges re-adds the swap — the store held every
        # edge twice (719,684 rows vs 359,842 distinct at sf0.1), so
        # every consumer's defensive distinct shuffled 2× the bytes.
        # Every consumer dedups at entry (LPA/k-core/triangles/
        # modularity/link-pred/adamic-adar all open with distinct()), so
        # the stored SET — and every result — is unchanged.
        pairs = a.join(b, ["pk", "q"]).where(F.col("s1") < F.col("s2"))
        return symmetrize_edges(pairs, "s1", "s2", as_string=False)

    return _memo_edges(spark, sf_dir, "co_purchase", build)


# Session-scoped memo for the documents corpus's near-dup structure (r11
# — the shared-edge-table discipline applied to the dedup families):
# three rows (canonical election, leakage-safe split, per-source dup
# profile) each need LSH candidate pairs and/or the pointer-jumping
# closure over the SAME corpus; computing the closure runs a driver
# fixpoint loop, so rebuilding it per row triples the most expensive
# part. First use per (application, sf_dir) persists both as bucketed
# tables; results can never depend on a previous session (app-id key).
_DOC_DEDUP_MEMO: dict = {}


# Session-scoped memo for the semantic family's shared k-means model
# (r11 session 3 — the same discipline, applied to centroid training):
# three rows (semantic screen, member-store screen, member forget) each
# fit Lloyd k=8/iters=2 on the SAME 90% embeddings corpus — identical
# model, refit per row (~1.2 s each: init collect + 2 Arrow-partials
# collects). The fitted centroids are a driver-side list (k·d doubles,
# metadata-sized), so the memo stores the LIST and rebuilds the
# metadata-sized DataFrame per call; app-id key means a fresh session
# (every driver correctness run) always retrains from the parquet.
_CORPUS_KMEANS_MEMO: dict = {}


def _corpus_kmeans_shared(spark, sf_dir: str):
    """Centroids of kmeans_fit(embeddings % 10 != 0, k=8, iters=2) —
    fitted once per session, returned as a fresh metadata-sized
    DataFrame (bit-identical to a per-row refit: the fit is
    deterministic and the memo stores its exact output rows)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    rows = _CORPUS_KMEANS_MEMO.get(key)
    if rows is None:
        from sparsity_spark.operators.similarity import kmeans_fit

        emb = load_table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") % 10 != 0)
        rows = [
            (r["centroid_id"], list(r["embedding"]))
            for r in kmeans_fit(corpus, k=8, iters=2).collect()
        ]
        _CORPUS_KMEANS_MEMO[key] = rows
    return spark.createDataFrame(rows, "centroid_id long, embedding array<double>")


def _doc_dedup_shared(spark, sf_dir: str):
    """Returns (pairs_df, labels_df) for the documents corpus — LSH
    candidate pairs bucketed by id_a, cluster labels bucketed by
    doc_id, computed once per session."""
    key = (spark.sparkContext.applicationId, sf_dir)
    tables = _DOC_DEDUP_MEMO.get(key)
    if tables is None:
        from sparsity_spark.operators.dedup import (
            duplicate_clusters,
            lsh_candidate_pairs,
        )
        from sparsity_spark.operators.skew import write_bucketed

        token = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
        pt = f"shared_doc_pairs_{token}"
        lt = f"shared_doc_labels_{token}"
        docs = load_table(spark, sf_dir, "documents")
        pairs = lsh_candidate_pairs(docs).persist()
        labels = duplicate_clusters(pairs, docs)
        write_bucketed(pairs, pt, ["id_a"], num_buckets=8)
        write_bucketed(labels, lt, ["doc_id"], num_buckets=8)
        pairs.unpersist()
        tables = (pt, lt)
        _DOC_DEDUP_MEMO[key] = tables
    pt, lt = tables
    return spark.table(pt), spark.table(lt)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _user_counts_frame(spark: SparkSession, sf_dir: str) -> SparseFrame:
    """events → one-hot event_type → groupby_sum(user_id): the reference's
    signature pipeline (S3/R1/A1) as one lazy plan."""
    events = load_table(spark, sf_dir, "events")
    sf = read_events(events, "event_type", uuid_col="user_id", ts_col="ts", order_col="event_id")
    return sf.groupby_sum(by="user_id")


def _spend_frame(spark: SparkSession, sf_dir: str, only_mod3: bool = True) -> SparseFrame:
    events = load_table(spark, sf_dir, "events")
    if only_mod3:
        events = events.filter(F.col("user_id") % 3 == 0)
    cells = events.groupBy("user_id").agg(F.round(F.sum("value"), 4).alias(VAL)).select(
        "user_id", F.lit("spend").alias(COL), VAL
    )
    return SparseFrame(cells, ["user_id"], ["spend"])


# --------------------------------------------------------------------- #
# A1 / R1 / S3: the flagship pipeline                                   #
# --------------------------------------------------------------------- #


@query(
    "a1_onehot_groupby_sum",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def a1_onehot_groupby_sum(spark, sf_dir):
    """SURVEY §2.4 A1 + §2.7 R1 (reference sparse_frame.py:196-231, 567-601)."""
    return _user_counts_frame(spark, sf_dir).data


@query(
    "r1_one_hot_cells",
    """
    SELECT event_id, event_type AS col, 1.0 AS value FROM events
    """,
)
def r1_one_hot_cells(spark, sf_dir):
    """SURVEY §2.7 R1: one-hot as zero-shuffle long projection."""
    events = load_table(spark, sf_dir, "events")
    return sparse_one_hot(events, "event_type", EVENT_TYPES, index_col="event_id").data


@query(
    "s5_events_coo",
    """
    WITH d AS (
      SELECT event_type AS v, CAST(ROW_NUMBER() OVER (ORDER BY MIN(event_id)) - 1 AS INTEGER) AS col_id
      FROM events GROUP BY event_type
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY e.event_id) - 1 AS BIGINT) AS row_idx,
           d.col_id AS col_idx, e.user_id AS uuid
    FROM events e JOIN d ON e.event_type = d.v
    """,
)
def s5_events_coo(spark, sf_dir):
    """SURVEY §2.1 S5: TrailDB COO scan parity — scan-order row ids,
    first-seen dictionary column ids (reference traildb_coo.c:49-91)."""
    events = load_table(spark, sf_dir, "events")
    return events_coo(events, "event_type", order_col="event_id").select("row_idx", "col_idx", "uuid")


@query(
    "s5_events_coo_scaled",
    """
    WITH d AS (
      SELECT event_type AS v, CAST(ROW_NUMBER() OVER (ORDER BY MIN(event_id)) - 1 AS INTEGER) AS col_id
      FROM events GROUP BY event_type
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY e.event_id) - 1 AS BIGINT) AS row_idx,
           d.col_id AS col_idx, e.user_id AS uuid
    FROM events e JOIN d ON e.event_type = d.v
    """,
)
def s5_events_coo_scaled(spark, sf_dir):
    """S5's SCALE path as a driver row (r9 — VERDICT r8 #6): the same COO
    output as s5_events_coo but with the bucketed scan-order numbering
    FORCED (single_partition_max=0): deterministic value-range buckets on
    the order column, per-bucket parallel row_number, per-bucket offsets
    from a partition-count-sized driver aggregate — the zipWithIndex shape
    that holds at 100 TB, where the parity row's single-partition window
    cannot. Identical integers by construction (the bucket offsets replay
    the global order); the oracle is the same global-window SQL, so the
    equivalence is hash-checked, not assumed. The plan carries NO
    event-sized single-partition window (asserted in test_plans.py; the
    only SinglePartition exchange is the lexicon-sized dictionary's)."""
    events = load_table(spark, sf_dir, "events")
    return events_coo(
        events, "event_type", order_col="event_id", single_partition_max=0
    ).select("row_idx", "col_idx", "uuid")


# --------------------------------------------------------------------- #
# J1/J5/U1: joins, aligned add, vstack                                  #
# --------------------------------------------------------------------- #

_J1_LEFT_SQL = """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
"""
_J1_RIGHT_SQL = """
    SELECT user_id, 'spend' AS col, ROUND(SUM(value), 4) AS value
    FROM events WHERE user_id % 3 = 0 GROUP BY user_id
"""


@query("j1_join_outer", f"{_J1_LEFT_SQL} UNION ALL {_J1_RIGHT_SQL}")
def j1_join_outer(spark, sf_dir):
    """SURVEY §2.3 J1 (reference sparse_frame.py:233-288): outer index join
    concatenating column sets — in long format a pure unionByName, zero extra
    shuffle."""
    counts = _user_counts_frame(spark, sf_dir)
    spend = _spend_frame(spark, sf_dir)
    return counts.join(spend, axis=1, how="outer").data


@query(
    "j1_join_inner",
    f"""
    SELECT * FROM ({_J1_LEFT_SQL}) WHERE user_id % 3 = 0
    UNION ALL {_J1_RIGHT_SQL}
    """,
)
def j1_join_inner(spark, sf_dir):
    counts = _user_counts_frame(spark, sf_dir)
    spend = _spend_frame(spark, sf_dir)
    return counts.join(spend, axis=1, how="inner").data


@query(
    "j1_join_level",
    """
    WITH suppn AS (
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS DOUBLE) AS v
      FROM supplier GROUP BY 1
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           'bal' AS col, CAST(c_acctbal AS DOUBLE) AS value
    FROM customer
    UNION ALL
    SELECT CAST(c.c_custkey AS BIGINT), CAST(c.c_nationkey AS BIGINT),
           'suppliers', s.v
    FROM customer c JOIN suppn s ON s.nk = c.c_nationkey
    """,
)
def j1_join_level_q(spark, sf_dir):
    """join(level=) parity row (r9 — VERDICT r8 missing #1): a
    (custkey, nationkey)-keyed balance frame attaches a NATION-keyed
    supplier-count frame on its nationkey level — the reference's
    MultiIndex-level join signature (reference sparse_frame.py:233-241,
    whose own MultiIndex branch raises NotImplementedError — live here).
    Plan shape: the nation side is dimension-sized, so AQE broadcasts the
    level join and the customer-sized cell table never shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    lcells = cust.select(
        F.col("c_custkey"),
        F.col("c_nationkey"),
        F.lit("bal").alias(COL),
        F.col("c_acctbal").cast("double").alias(VAL),
    )
    left = SparseFrame(lcells, ["c_custkey", "c_nationkey"], ["bal"])
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").cast("double").alias(VAL))
    )
    rcells = supp.select(
        F.col("s_nationkey").alias("c_nationkey"),
        F.lit("suppliers").alias(COL),
        F.col(VAL),
    )
    right = SparseFrame(rcells, ["c_nationkey"], ["suppliers"])
    return left.join(right, axis=1, how="left", level="c_nationkey").data


@query(
    "j5_add_halves",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def j5_add_halves(spark, sf_dir):
    """SURVEY §2.3 J5 (reference sparse_frame.py:319-337): aligned elementwise
    add of even/odd event halves == total counts. Union + single hash
    re-aggregate replaces sentinel-row alignment."""
    events = load_table(spark, sf_dir, "events")
    halves = []
    for parity in (0, 1):
        sub = events.filter(F.col("event_id") % 2 == parity)
        sf = sparse_one_hot(sub, "event_type", EVENT_TYPES, index_col="user_id")
        halves.append(sf.groupby_sum(by="user_id"))
    return halves[0].add(halves[1], how="outer").data


@query(
    "u1_vstack_halves",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id, event_type
    UNION ALL
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id, event_type
    """,
)
def u1_vstack_halves(spark, sf_dir):
    """SURVEY §2.6 U1 (reference sparse_frame.py:496-507): vertical concat
    with identical column sets (duplicate row labels legal)."""
    events = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    lo = sparse_one_hot(events.filter(F.col("ts") < cut), "event_type", EVENT_TYPES, index_col="user_id").groupby_sum(by="user_id")
    hi = sparse_one_hot(events.filter(F.col("ts") >= cut), "event_type", EVENT_TYPES, index_col="user_id").groupby_sum(by="user_id")
    return lo.vstack(hi).data


# --------------------------------------------------------------------- #
# P*: projection / selection / dedup                                    #
# --------------------------------------------------------------------- #


@query(
    "p1_project",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events WHERE event_type IN ('view', 'click') GROUP BY user_id, event_type
    """,
)
def p1_project(spark, sf_dir):
    """SURVEY §2.2 P1 (reference sparse_frame.py:460-467): column projection
    by label — a Catalyst-pushable filter on the col column."""
    return _user_counts_frame(spark, sf_dir)[["view", "click"]].data


@query(
    "p4_loc_range",
    """
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           l_orderkey, l_linenumber,
           l_returnflag AS col, 1.0 AS value
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def p4_loc_range(spark, sf_dir):
    """SURVEY §2.2 P4 (reference indexing.py:3-11): stop-INCLUSIVE label
    slicing on a timestamp level — pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    sf = sparse_one_hot(
        li, "l_returnflag", ["A", "N", "R"], index_col=["l_shipdate", "l_orderkey", "l_linenumber"]
    )
    sliced = sf.loc_range(
        F.lit("1996-01-01 00:00:00").cast("timestamp"),
        F.lit("1996-12-31 00:00:00").cast("timestamp"),
        level=0,
    )
    return sliced.data.select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        "l_orderkey",
        "l_linenumber",
        COL,
        VAL,
    )


@query(
    "p5_dropna",
    """
    SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS priority, 'price' AS col,
           ROUND(SUM(o_totalprice), 4) AS value
    FROM orders GROUP BY 1 HAVING NULLIF(o_orderpriority, '3-MEDIUM') IS NOT NULL
    """,
)
def p5_dropna(spark, sf_dir):
    """SURVEY §2.2 P5 (reference sparse_frame.py:469-474): drop rows with a
    NULL row label."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.withColumn("priority", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")))
    cells = keyed.groupBy("priority").agg(F.round(F.sum("o_totalprice"), 4).alias(VAL)).select(
        "priority", F.lit("price").alias(COL), VAL
    )
    sf = SparseFrame(cells, ["priority"], ["price"])
    return sf.dropna().data


@query(
    "p6_dedup_first",
    """
    SELECT user_id, first_type AS col, 1.0 AS value FROM (
      SELECT user_id, event_type AS first_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def p6_dedup_first(spark, sf_dir):
    """SURVEY §2.2 P6 (reference sparse_frame.py:454-458): keep-FIRST per
    duplicated label — row_number window, order given by (ts, event_id)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias(COL), F.lit(1.0).alias(VAL))
    )
    return firsts


@query(
    "p7_rename",
    """
    SELECT user_id, upper(event_type) AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def p7_rename(spark, sf_dir):
    """SURVEY §2.2 P7 (reference sparse_frame.py:290-300)."""
    return _user_counts_frame(spark, sf_dir).rename(columns=str.upper).data


@query(
    "p8_assign",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    UNION ALL
    SELECT DISTINCT user_id, 'bias' AS col, 1.0 AS value FROM events
    """,
)
def p8_assign(spark, sf_dir):
    """SURVEY §2.2 P8 (reference sparse_frame.py:423-452): scalar-broadcast
    new column."""
    return _user_counts_frame(spark, sf_dir).assign(bias=1.0).data


@query(
    "p9_set_index",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def p9_set_index(spark, sf_dir):
    """SURVEY §2.2 P9 (reference sparse_frame.py:476-494): re-key a
    (user_id, ts)-keyed frame to user_id level, then aggregate."""
    events = load_table(spark, sf_dir, "events")
    sf = read_events(events, "event_type", uuid_col="user_id", ts_col="ts", order_col="event_id")
    rekeyed = sf.set_index(level=0)  # drop the ts level
    return rekeyed.groupby_sum(by="user_id").data


# --------------------------------------------------------------------- #
# A2-A6: scalar aggregates                                              #
# --------------------------------------------------------------------- #


@query(
    "a2_col_sums",
    """
    SELECT event_type AS col, ROUND(SUM(value), 4) AS value
    FROM events GROUP BY event_type
    """,
)
def a2_col_sums(spark, sf_dir):
    """SURVEY §2.4 A2 (reference sparse_frame.py:143-144): axis=0 sums of a
    value-weighted one-hot frame."""
    events = load_table(spark, sf_dir, "events")
    cells = events.select(
        "event_id", F.col("event_type").alias(COL), F.col("value").alias(VAL)
    )
    sf = SparseFrame(cells, ["event_id"], EVENT_TYPES)
    return sf.data.groupBy(COL).agg(F.round(F.sum(VAL), 4).alias(VAL))


@query(
    "a3_mean_dense_denominator",
    """
    SELECT col, ROUND(SUM(value) / (SELECT COUNT(DISTINCT user_id) FROM events), 6) AS mean_value
    FROM (
      SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY user_id, event_type
    ) GROUP BY col
    """,
)
def a3_mean_dense_denominator(spark, sf_dir):
    """SURVEY §2.4 A3 (reference sparse_frame.py:146-147): mean divides by
    N rows (dense denominator), NOT by nnz — the documented semantic trap."""
    frame = _user_counts_frame(spark, sf_dir)
    n = frame.index.count()
    return frame.data.groupBy(COL).agg(
        F.round(F.sum(VAL) / F.lit(float(n)), 6).alias("mean_value")
    )


@query(
    "s11_head",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS DOUBLE) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS view
    FROM events
    WHERE user_id IN (SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 5)
    GROUP BY user_id
    """,
)
def s11_head(spark, sf_dir):
    """SURVEY §2.1 S11 (reference sparse_frame.py:382-387): head(5) of the
    label-sorted user-counts frame — sort_index() pins the row order, so
    head is the 5 lowest user_ids, densified."""
    frame = _user_counts_frame(spark, sf_dir).sort_index()
    pdf = frame.head(5).reset_index()
    return spark.createDataFrame(pdf)


@query(
    "a4_std_dense_denominator",
    """
    WITH cells AS (
      SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY user_id, event_type
    ), n AS (SELECT COUNT(DISTINCT user_id) AS n FROM events)
    SELECT col,
           ROUND(SQRT(SUM(value * value) / n.n - POW(SUM(value) / n.n, 2)), 6) AS std_value
    FROM cells, n GROUP BY col, n.n
    """,
)
def a4_std_dense_denominator(spark, sf_dir):
    """SURVEY §2.4 A4 (reference sparse_frame.py:149-150): per-column std
    with the DENSE denominator — sqrt(E[x²] − E[x]²) over all N·K cells
    including implicit zeros. Runs SparseFrame.std(axis=0) itself (its
    driver-side Series output is the operator's contract) and re-frames it
    for the oracle compare."""
    frame = _user_counts_frame(spark, sf_dir)
    s = frame.std(0).round(6)
    pdf = s.rename("std_value").rename_axis("col").reset_index()
    return spark.createDataFrame(pdf)


@query(
    "a6_nnz",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS nnz FROM (
      SELECT user_id, event_type FROM events GROUP BY user_id, event_type
    )
    """,
)
def a6_nnz(spark, sf_dir):
    """SURVEY §2.4 A6 (reference sparse_frame.py:162-163): stored-cell count."""
    frame = _user_counts_frame(spark, sf_dir)
    return frame.data.filter(F.col(VAL) != 0.0).agg(F.count("*").alias("nnz"))


# --------------------------------------------------------------------- #
# O1/O2/S11: sort / top-k / limit                                       #
# --------------------------------------------------------------------- #


@query(
    "o2_topk_users",
    """
    SELECT user_id, ROUND(SUM(value), 4) AS spend
    FROM events GROUP BY user_id
    ORDER BY spend DESC, user_id LIMIT 10
    """,
)
def o2_topk_users(spark, sf_dir):
    """Top-k (SURVEY §2.5 extension): orderBy + limit, deterministic
    tie-break on the key; sorts the ROUNDED value so both engines rank
    identically."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("spend"))
        .orderBy(F.col("spend").desc(), F.col("user_id"))
        .limit(10)
    )


# --------------------------------------------------------------------- #
# Analytics showcase: TPC-H-shaped plans (scale posture)                #
# --------------------------------------------------------------------- #


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: predicate pushdown + single hash aggregate, all
    whole-stage-codegen built-ins."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → broadcast join fan-in →
    aggregate → top-k. customer is broadcast explicitly; orders/lineitem
    join shuffles on orderkey."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_regional_revenue",
    """
    SELECT r.r_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
             / 10000 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q5_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join — every dimension broadcast, fact table
    never shuffled until the final 5-group aggregate. r10: revenue sums
    EXACT integer 10⁻⁴-dollar units (price cents × discount percent —
    both columns are 2-dp money, recovered exactly by ROUND(x·100)) —
    the sf0.1 strict sweep caught the old double SUM flipping its 4th
    decimal with summation order once the total crossed 5·10⁹ (53-bit
    mantissa edge); an associative BIGINT sum cannot."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pct = F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    return joined.groupBy("r_name").agg(
        (F.sum(cents * pct).cast("double") / F.lit(10000)).alias("revenue")
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: LEFT SEMI join — EXISTS without row multiplication,
    so no distinct is needed before the aggregate. The semi join shuffles
    on orderkey once; the priority aggregate is 5 groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q22_customers_no_big_order",
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    GROUP BY c.c_mktsegment
    """,
)
def q22_customers_no_big_order(spark, sf_dir):
    """TPC-H Q22 shape: LEFT ANTI join (NOT EXISTS). The filtered orders
    side is small enough to broadcast after the totalprice predicate is
    pushed to the scan, so the anti join is shuffle-free on the fact side."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(F.broadcast(big.select("o_custkey")), c.c_custkey == big.o_custkey, "leftanti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with a join-side predicate, then a
    two-level aggregate (orders per customer, then the histogram of those
    counts). count("o_orderkey") counts non-nulls, so no-order customers
    land in the c_count=0 bucket — outer-join null semantics end-to-end.
    The first aggregate shuffles on custkey (the join already co-located
    that key); the histogram re-aggregates ~dozens of distinct counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q18_large_volume_orders",
    """
    SELECT o.o_orderkey, o.o_orderpriority,
           ROUND(o.o_totalprice, 4) AS total_price, s.sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING ROUND(SUM(l_quantity), 4) > 250) s
      ON o.o_orderkey = s.l_orderkey
    """,
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-HAVING subquery joined back to the fact.
    The quantity rollup shuffles lineitem once on orderkey; the >250 filter
    keeps a tiny fraction of orders, so the join back broadcasts the
    aggregated side instead of shuffling the orders scan."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 4).alias("total_price"),
        "sum_qty",
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_size, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: COUNT(DISTINCT) per group with a NOT IN exclusion
    list (no partsupp table in the testdata — lineitem is the part-supplier
    link). The exclusion list (suppliers in deficit) and the part dimension
    both broadcast; the only shuffle is the distinct-count aggregate."""
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    return (
        l.join(F.broadcast(excl), l.l_suppkey == excl.s_suppkey, "leftanti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q10_returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_mktsegment, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_mktsegment, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue. Fact-to-fact
    orders⋈lineitem shuffles once on orderkey; customer and nation are
    dimensions and broadcast; the top-20 is a TakeOrdered, never a global
    sort. c_custkey tiebreak keeps the limit deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_mktsegment", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark, sf_dir):
    """TPC-H Q12 shape (no l_shipmode in the testdata — l_linestatus is the
    bucket): conditional CASE aggregation after a fact-to-fact join. The
    shipdate predicate pushes to the lineitem scan; the CASE sums are
    map-side partial."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q14_promo_revenue_share",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-revenue ratio over one month. The part
    dimension broadcasts; the whole query is one scan + one broadcast join
    + a single-row aggregate."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size <= 25 AND l.l_quantity >= 40)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides. The
    part dimension broadcasts; Catalyst pushes the brand/size disjunction's
    common subtree to the part scan and the quantity bounds to the lineitem
    scan, so the join input is pre-filtered on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 20)
    ) | (
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 25) & (F.col("l_quantity") >= 40)
    )
    return joined.filter(cond).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )


@query(
    "q11_top_value_nations",
    """
    WITH nation_value AS (
      SELECT n.n_name, ROUND(SUM(l.l_extendedprice), 4) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, value
    FROM nation_value
    WHERE value > (SELECT SUM(value) * 0.04 FROM nation_value)
    """,
)
def q11_top_value_nations(spark, sf_dir):
    """TPC-H Q11 shape: groups filtered against a scalar of the SAME
    aggregate (share-of-total HAVING). The per-nation rollup is computed
    once and self-joined against its own global sum via crossJoin of a
    1-row aggregate — Spark broadcasts the scalar, no recompute of the base
    aggregate thanks to plan reuse."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nation_value = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("value"))
    )
    threshold = nation_value.agg((F.sum("value") * 0.04).alias("__thr__"))
    return (
        nation_value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thr__"))
        .select("n_name", "value")
    )


@query(
    "q21_sole_returned_supplier",
    """
    WITH sup_orders AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    returned AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    multi AS (
      SELECT l_orderkey FROM sup_orders GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_suppkey) >= 2
    )
    SELECT r.l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM returned r
    WHERE EXISTS (SELECT 1 FROM multi m WHERE m.l_orderkey = r.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM returned r2
                      WHERE r2.l_orderkey = r.l_orderkey
                        AND r2.l_suppkey <> r.l_suppkey)
    GROUP BY r.l_suppkey
    """,
)
def q21_sole_returned_supplier(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS and NOT EXISTS against the same fact —
    suppliers solely responsible for the returned lines of a multi-supplier
    order. Both membership tests are distinct-projected semi/anti joins on
    orderkey, so each is one shuffle of a deduplicated (order, supplier)
    set, never a row-multiplying join."""
    l = load_table(spark, sf_dir, "lineitem")
    sup_orders = l.select("l_orderkey", "l_suppkey").distinct()
    returned = (
        l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    )
    multi = (
        sup_orders.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns__"))
        .filter(F.col("__ns__") >= 2)
        .select("l_orderkey")
    )
    others = returned.select(
        F.col("l_orderkey"), F.col("l_suppkey").alias("__other__")
    )
    return (
        returned.join(multi, on="l_orderkey", how="leftsemi")
        .join(
            others,
            (returned.l_orderkey == others.l_orderkey)
            & (returned.l_suppkey != others.__other__),
            "leftanti",
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS thr
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.thr
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: each row compared against a scalar aggregate of its
    OWN group (below 20% of the part's average quantity). One aggregate
    pass builds the per-part thresholds, then a join-back — the correlated
    subquery decorrelated by hand, which is exactly what Catalyst would do.
    Exact across engines: quantity sums are integer-valued doubles, so the
    threshold arithmetic is bit-identical."""
    l = load_table(spark, sf_dir, "lineitem")
    thr = l.groupBy(F.col("l_partkey").alias("__pk__")).agg(
        (0.2 * F.avg("l_quantity")).alias("thr")
    )
    return (
        l.join(thr, l.l_partkey == thr.__pk__)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: rows equal to a scalar MAX of the same derived
    view (argmax without a sort). The revenue rollup computes once; its
    1-row max broadcasts back; the supplier dimension broadcasts. Equality
    is safe across engines because both compare the same ROUND(...,4)
    value."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__max__"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max__"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
       OR (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the nation dimension joined in TWO roles (customer's
    nation via orders→customer, supplier's nation via lineitem→supplier)
    with an OR over the role pair. One fact-to-fact shuffle
    (lineitem⋈orders); every dimension broadcasts, including both nation
    aliases; grouping adds the derived ship year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("__ck__"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("__sk__"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("cust_nation") == "NATION_11") & (F.col("supp_nation") == "NATION_20")
    ) | ((F.col("cust_nation") == "NATION_20") & (F.col("supp_nation") == "NATION_11"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("__ck__"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("__sk__"))
        .filter(pair)
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "w1_running_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_value
    FROM events
    """,
)
def w1_running_sum(spark, sf_dir):
    """Window-function extension (SURVEY §2.9 lists none in the reference):
    per-user running sum — deterministic frame, identical accumulation order
    in both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@query(
    "w2_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    WHERE value IS NOT NULL
    """,
)
def w2_moving_avg(spark, sf_dir):
    """Bounded window frame (4-row trailing average): the frame is fully
    determined by (ts, event_id) order, so both engines average the same
    rows. One shuffle on user_id; the sort is per-partition."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return events.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("moving_avg")
    )


@query(
    "w3_top_events_per_user",
    """
    SELECT user_id, event_id, ROUND(value, 4) AS value, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events WHERE value IS NOT NULL
    )
    WHERE rn <= 3
    """,
)
def w3_top_events_per_user(spark, sf_dir):
    """Top-N-per-group: row_number + filter. Catalyst turns the rn<=3
    predicate into a per-partition running limit (WindowGroupLimit), so the
    sort never materializes more than N rows per key past the shuffle.
    event_id breaks value ties deterministically for the oracle."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"), "rn")
    )


# --------------------------------------------------------------------- #
# North-star extensions: dedup / similarity / text / multimodal         #
# (BASELINE.json; SURVEY.md §7 Phase 4)                                 #
# --------------------------------------------------------------------- #

_SHINGLE_SQL = """
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
        ELSE CAST([] AS VARCHAR[]) END) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
"""

def _minhash_oracle() -> str:
    """Oracle for the universal-hash MinHash — built from the SAME (a, b)
    constants as the Spark implementation so values match bit-for-bit."""
    from sparsity_spark.operators.dedup import MINHASH_PRIME, minhash_params

    a, b = minhash_params(16)
    arms = " ".join(
        f"WHEN seed = {s} THEN ({a[s]} * h + {b[s]}) % {MINHASH_PRIME}" for s in range(16)
    )
    return f"""
    SELECT doc_id, CAST(seed AS INTEGER) AS seed,
           MIN(CASE {arms} END) AS minhash
    FROM (
      SELECT doc_id, CAST(('0x' || substring(md5(shingle), 1, 8)) AS BIGINT) AS h
      FROM ({_SHINGLE_SQL})
    ) sh, (SELECT unnest(range(0, 16)) AS seed) seeds
    GROUP BY doc_id, seed
    """


_MINHASH_SQL = _minhash_oracle()


@query(
    "dedup_exact",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
    )
    SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM d GROUP BY md5(text)
    """,
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup: one hash aggregate on content hash. The synthetic
    corpus has no exact duplicates, so every 50th doc is re-appended
    under a shifted id on BOTH engine sides — the oracle then checks
    real n_docs=2 groups with keep-lowest-id, not an all-singleton
    result."""
    from sparsity_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return exact_dedup(docs.select("doc_id", "text").unionByName(dup))


@query(
    "multimodal_binary_dedup",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 40 = 0
    )
    SELECT md5(text) AS content_md5,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           MIN(doc_id) AS keep_id,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM d GROUP BY 1
    """,
)
def multimodal_binary_dedup_q(spark, sf_dir):
    """Exact dedup over raw BINARY payload bytes (md5 of the blob) — the
    modality-agnostic dedup for image/audio/video assets; driven by
    UTF-8-wrapped documents (DuckDB's md5(text) hashes the identical byte
    sequence) with every 40th asset re-uploaded under a new id so real
    duplicate groups exist on both engine sides."""
    from sparsity_spark.operators.multimodal import as_binary_assets, binary_exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return binary_exact_dedup(
        as_binary_assets(docs.select("doc_id", "text").unionByName(dup))
    )


_PHASH_ORACLE = """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 40 = 0
      UNION ALL
      SELECT doc_id + 2000000,
             substring(text, 1, len(text) - 1) || 'x'
      FROM documents WHERE doc_id % 50 = 0
    ),
    b AS (
      SELECT doc_id, hex(encode(text)) AS hx, len(hex(encode(text))) AS L
      FROM d
    ),
    p AS (SELECT doc_id, CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(0 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(1 * L / 65) AS INT) - CAST(FLOOR(0 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p0,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(1 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(2 * L / 65) AS INT) - CAST(FLOOR(1 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p1,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(2 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(3 * L / 65) AS INT) - CAST(FLOOR(2 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p2,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(3 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(4 * L / 65) AS INT) - CAST(FLOOR(3 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p3,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(4 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(5 * L / 65) AS INT) - CAST(FLOOR(4 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p4,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(5 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(6 * L / 65) AS INT) - CAST(FLOOR(5 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p5,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(6 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(7 * L / 65) AS INT) - CAST(FLOOR(6 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p6,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(7 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(8 * L / 65) AS INT) - CAST(FLOOR(7 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p7,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(8 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(9 * L / 65) AS INT) - CAST(FLOOR(8 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p8,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(9 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(10 * L / 65) AS INT) - CAST(FLOOR(9 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p9,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(10 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(11 * L / 65) AS INT) - CAST(FLOOR(10 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p10,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(11 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(12 * L / 65) AS INT) - CAST(FLOOR(11 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p11,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(12 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(13 * L / 65) AS INT) - CAST(FLOOR(12 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p12,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(13 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(14 * L / 65) AS INT) - CAST(FLOOR(13 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p13,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(14 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(15 * L / 65) AS INT) - CAST(FLOOR(14 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p14,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(15 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(16 * L / 65) AS INT) - CAST(FLOOR(15 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p15,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(16 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(17 * L / 65) AS INT) - CAST(FLOOR(16 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p16,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(17 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(18 * L / 65) AS INT) - CAST(FLOOR(17 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p17,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(18 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(19 * L / 65) AS INT) - CAST(FLOOR(18 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p18,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(19 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(20 * L / 65) AS INT) - CAST(FLOOR(19 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p19,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(20 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(21 * L / 65) AS INT) - CAST(FLOOR(20 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p20,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(21 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(22 * L / 65) AS INT) - CAST(FLOOR(21 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p21,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(22 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(23 * L / 65) AS INT) - CAST(FLOOR(22 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p22,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(23 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(24 * L / 65) AS INT) - CAST(FLOOR(23 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p23,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(24 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(25 * L / 65) AS INT) - CAST(FLOOR(24 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p24,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(25 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(26 * L / 65) AS INT) - CAST(FLOOR(25 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p25,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(26 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(27 * L / 65) AS INT) - CAST(FLOOR(26 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p26,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(27 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(28 * L / 65) AS INT) - CAST(FLOOR(27 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p27,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(28 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(29 * L / 65) AS INT) - CAST(FLOOR(28 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p28,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(29 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(30 * L / 65) AS INT) - CAST(FLOOR(29 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p29,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(30 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(31 * L / 65) AS INT) - CAST(FLOOR(30 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p30,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(31 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(32 * L / 65) AS INT) - CAST(FLOOR(31 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p31,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(32 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(33 * L / 65) AS INT) - CAST(FLOOR(32 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p32,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(33 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(34 * L / 65) AS INT) - CAST(FLOOR(33 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p33,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(34 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(35 * L / 65) AS INT) - CAST(FLOOR(34 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p34,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(35 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(36 * L / 65) AS INT) - CAST(FLOOR(35 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p35,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(36 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(37 * L / 65) AS INT) - CAST(FLOOR(36 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p36,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(37 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(38 * L / 65) AS INT) - CAST(FLOOR(37 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p37,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(38 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(39 * L / 65) AS INT) - CAST(FLOOR(38 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p38,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(39 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(40 * L / 65) AS INT) - CAST(FLOOR(39 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p39,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(40 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(41 * L / 65) AS INT) - CAST(FLOOR(40 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p40,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(41 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(42 * L / 65) AS INT) - CAST(FLOOR(41 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p41,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(42 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(43 * L / 65) AS INT) - CAST(FLOOR(42 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p42,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(43 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(44 * L / 65) AS INT) - CAST(FLOOR(43 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p43,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(44 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(45 * L / 65) AS INT) - CAST(FLOOR(44 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p44,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(45 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(46 * L / 65) AS INT) - CAST(FLOOR(45 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p45,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(46 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(47 * L / 65) AS INT) - CAST(FLOOR(46 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p46,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(47 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(48 * L / 65) AS INT) - CAST(FLOOR(47 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p47,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(48 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(49 * L / 65) AS INT) - CAST(FLOOR(48 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p48,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(49 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(50 * L / 65) AS INT) - CAST(FLOOR(49 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p49,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(50 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(51 * L / 65) AS INT) - CAST(FLOOR(50 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p50,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(51 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(52 * L / 65) AS INT) - CAST(FLOOR(51 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p51,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(52 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(53 * L / 65) AS INT) - CAST(FLOOR(52 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p52,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(53 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(54 * L / 65) AS INT) - CAST(FLOOR(53 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p53,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(54 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(55 * L / 65) AS INT) - CAST(FLOOR(54 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p54,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(55 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(56 * L / 65) AS INT) - CAST(FLOOR(55 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p55,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(56 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(57 * L / 65) AS INT) - CAST(FLOOR(56 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p56,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(57 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(58 * L / 65) AS INT) - CAST(FLOOR(57 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p57,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(58 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(59 * L / 65) AS INT) - CAST(FLOOR(58 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p58,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(59 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(60 * L / 65) AS INT) - CAST(FLOOR(59 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p59,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(60 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(61 * L / 65) AS INT) - CAST(FLOOR(60 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p60,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(61 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(62 * L / 65) AS INT) - CAST(FLOOR(61 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p61,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(62 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(63 * L / 65) AS INT) - CAST(FLOOR(62 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p62,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(63 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(64 * L / 65) AS INT) - CAST(FLOOR(63 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p63,
             CAST(('0x' || substring(md5(substring(hx, CAST(FLOOR(64 * L / 65) AS INT) + 1, GREATEST(CAST(FLOOR(65 * L / 65) AS INT) - CAST(FLOOR(64 * L / 65) AS INT), 0))), 1, 8)) AS BIGINT) AS p64
          FROM b WHERE L >= 65),
    h AS (SELECT doc_id, CAST((CASE WHEN p0 > p1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p1 > p2 THEN CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p2 > p3 THEN CAST(4 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p3 > p4 THEN CAST(8 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p4 > p5 THEN CAST(16 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p5 > p6 THEN CAST(32 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p6 > p7 THEN CAST(64 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p7 > p8 THEN CAST(128 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p8 > p9 THEN CAST(256 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p9 > p10 THEN CAST(512 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p10 > p11 THEN CAST(1024 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p11 > p12 THEN CAST(2048 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p12 > p13 THEN CAST(4096 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p13 > p14 THEN CAST(8192 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p14 > p15 THEN CAST(16384 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p15 > p16 THEN CAST(32768 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p16 > p17 THEN CAST(65536 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p17 > p18 THEN CAST(131072 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p18 > p19 THEN CAST(262144 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p19 > p20 THEN CAST(524288 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p20 > p21 THEN CAST(1048576 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p21 > p22 THEN CAST(2097152 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p22 > p23 THEN CAST(4194304 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p23 > p24 THEN CAST(8388608 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p24 > p25 THEN CAST(16777216 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p25 > p26 THEN CAST(33554432 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p26 > p27 THEN CAST(67108864 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p27 > p28 THEN CAST(134217728 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p28 > p29 THEN CAST(268435456 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p29 > p30 THEN CAST(536870912 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p30 > p31 THEN CAST(1073741824 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p31 > p32 THEN CAST(2147483648 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p32 > p33 THEN CAST(4294967296 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p33 > p34 THEN CAST(8589934592 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p34 > p35 THEN CAST(17179869184 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p35 > p36 THEN CAST(34359738368 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p36 > p37 THEN CAST(68719476736 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p37 > p38 THEN CAST(137438953472 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p38 > p39 THEN CAST(274877906944 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p39 > p40 THEN CAST(549755813888 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p40 > p41 THEN CAST(1099511627776 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p41 > p42 THEN CAST(2199023255552 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p42 > p43 THEN CAST(4398046511104 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p43 > p44 THEN CAST(8796093022208 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p44 > p45 THEN CAST(17592186044416 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p45 > p46 THEN CAST(35184372088832 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p46 > p47 THEN CAST(70368744177664 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p47 > p48 THEN CAST(140737488355328 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p48 > p49 THEN CAST(281474976710656 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p49 > p50 THEN CAST(562949953421312 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p50 > p51 THEN CAST(1125899906842624 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p51 > p52 THEN CAST(2251799813685248 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p52 > p53 THEN CAST(4503599627370496 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p53 > p54 THEN CAST(9007199254740992 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p54 > p55 THEN CAST(18014398509481984 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p55 > p56 THEN CAST(36028797018963968 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p56 > p57 THEN CAST(72057594037927936 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p57 > p58 THEN CAST(144115188075855872 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p58 > p59 THEN CAST(288230376151711744 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p59 > p60 THEN CAST(576460752303423488 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p60 > p61 THEN CAST(1152921504606846976 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p61 > p62 THEN CAST(2305843009213693952 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p62 > p63 THEN CAST(4611686018427387904 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN p63 > p64 THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dh FROM p)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.dh, c.dh)) AS INT) AS hamming
    FROM h a JOIN h c ON a.doc_id < c.doc_id
    WHERE bit_count(xor(a.dh, c.dh)) <= 3
    """


@query("multimodal_phash_pairs", _PHASH_ORACLE)
def multimodal_phash_pairs_q(spark, sf_dir):
    """Perceptual near-dup pairs for binary media (VERDICT r4 #7): dHash
    fingerprints over the deterministic fake decode (65 payload segments
    as pixels, adjacent-gradient signs packed into 64 bits), then the
    lossless pigeonhole chunk blocking shared with text simhash. The
    oracle rebuilds the identical fingerprints pixel-by-pixel in SQL and
    verifies pairs with a naive all-pairs hamming join — proving the
    banded equi-join loses nothing. Every 40th doc is re-uploaded
    byte-identical (hamming 0) and every 50th with its LAST character
    changed — a same-length local edit that only perturbs the final
    pixel segments, exactly the near-miss a perceptual hash must catch
    and exact byte dedup cannot."""
    from sparsity_spark.operators.multimodal import as_binary_assets, phash_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact_twin = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near_twin = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, length(text) - 1)"), F.lit("x")
        ).alias("text"),
    )
    assets = as_binary_assets(docs.unionByName(exact_twin).unionByName(near_twin))
    return phash_pairs(assets, max_hamming=3)


@query(
    "multimodal_phash_clusters",
    f"""
    WITH RECURSIVE pr AS (SELECT id_a, id_b FROM ({_PHASH_ORACLE})),
    d_ids AS (
      SELECT doc_id FROM documents
      UNION ALL
      SELECT doc_id + 1000000 FROM documents WHERE doc_id % 40 = 0
      UNION ALL
      SELECT doc_id + 2000000 FROM documents WHERE doc_id % 50 = 0
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pr
      UNION SELECT id_b, id_a FROM pr
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM d_ids
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def multimodal_phash_clusters_q(spark, sf_dir):
    """Perceptual near-dup CLUSTERS (r9): the cross-module composition a
    media pipeline actually ships — dHash fingerprints over binary
    assets → pigeonhole hamming pairs → connected components → one
    canonical id per cluster (keep doc_id == cluster_id, drop the rest).
    Same twin fixture as multimodal_phash_pairs (byte-identical and
    last-byte-edited re-uploads), so real multi-member clusters exist on
    both engine sides; the oracle is the pairs SQL nested under a
    recursive transitive closure. Pairs are hamming-banded (never
    all-pairs), clustering is the pointer-jumping min-label loop —
    every stage's communication is collision- or node-sized."""
    from sparsity_spark.operators.dedup import duplicate_clusters
    from sparsity_spark.operators.multimodal import as_binary_assets, phash_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact_twin = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near_twin = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, length(text) - 1)"), F.lit("x")
        ).alias("text"),
    )
    all_docs = docs.unionByName(exact_twin).unionByName(near_twin)
    assets = as_binary_assets(all_docs)
    pairs = phash_pairs(assets, max_hamming=3)
    return duplicate_clusters(pairs, all_docs)


def _dhash_real_oracle(mod: int = 4, w: int = 36, h: int = 16) -> str:
    """dHash over REAL decoded PPM pixels, mirrored in SQL (VERDICT r5 #6):
    the Spark query builds a deterministic w×h P6 image per doc_id
    (channel formulas below), decodes it with the real PPM parser, and
    computes the 9×8 block-mean dHash; the oracle regenerates the SAME
    pixels from doc_id, aggregates the SAME integer luma into block means
    (equal 4×2 blocks — SUM/8.0 is exact in float64), and packs the same
    64 gradient bits. A value mismatch anywhere in parse → luma →
    resize → pack breaks the hash match."""
    assert w % 9 == 0 and h % 8 == 0
    terms = []
    for y in range(8):
        for x in range(8):
            k = y * 8 + x
            val = str(1 << k) if k < 63 else "-9223372036854775808"
            a, b = y * 9 + x + 1, y * 9 + x + 2
            terms.append(
                f"(CASE WHEN g[{a}] > g[{b}] THEN CAST({val} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
    packed = " + ".join(terms)
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 0),
    px AS (
      SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             (doc_id*31 + x*7 + y*13) % 256 AS r,
             (doc_id*17 + x*3 + y*11) % 256 AS gg,
             (doc_id*23 + x*5 + y*19) % 256 AS b
      FROM ids, LATERAL UNNEST(range({w})) tx(x), LATERAL UNNEST(range({h})) ty(y)
    ),
    lum AS (SELECT doc_id, x, y, (299*r + 587*gg + 114*b) // 1000 AS l FROM px),
    blk AS (
      SELECT doc_id, x // {w // 9} AS bx, y // {h // 8} AS by,
             SUM(l) / {(w // 9) * (h // 8)}.0 AS m
      FROM lum GROUP BY 1, 2, 3
    ),
    grid AS (SELECT doc_id, list(m ORDER BY by, bx) AS g FROM blk GROUP BY doc_id)
    SELECT doc_id, CAST({packed} AS BIGINT) AS dhash FROM grid
    """


@query("multimodal_dhash_real", _dhash_real_oracle())
def multimodal_dhash_real_q(spark, sf_dir):
    """dHash on REAL pixel grids through the REAL PPM decoder (VERDICT r5
    #6): a deterministic 36×16 binary-PPM image is generated per doc_id
    (integer channel formulas both engines can reproduce), the Spark side
    round-trips it through the actual P6 parser (header parse, raw RGB
    grid), integer BT.601 luma, 9×8 block-mean downsample, and gradient
    packing — the full perceptual pipeline on actual pixels, not the
    fake-decode segmentation. The oracle regenerates the same pixels in
    SQL and must land on the identical 64-bit fingerprint."""
    from sparsity_spark.operators.multimodal import dhash_real_fingerprints

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 0  # corpus-proportional fixture: the real
        # decode work scales with the data, so the sf1 tier measures the
        # decoder, not a fixed-200-doc constant (r7)
    ).distinct()

    def mk_ppm(batches):
        import numpy as np
        import pandas as pd

        W, H = 36, 16
        xs = np.arange(W, dtype=np.int64)[None, :]
        ys = np.arange(H, dtype=np.int64)[:, None]

        def ppm(doc_id):
            r = (doc_id * 31 + xs * 7 + ys * 13) % 256
            g = (doc_id * 17 + xs * 3 + ys * 11) % 256
            b = (doc_id * 23 + xs * 5 + ys * 19) % 256
            img = np.stack([r, g, b], axis=2).astype(np.uint8)
            return b"P6\n%d %d\n255\n" % (W, H) + img.tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [ppm(int(i)) for i in pdf["doc_id"]],
                }
            )

    assets = ensure_parallelism(ids).mapInPandas(mk_ppm, schema="doc_id long, content binary")
    return dhash_real_fingerprints(assets)


def _features_real_oracle(mod: int = 4, w: int = 36, h: int = 16, g: int = 4) -> str:
    """REAL image features through the generic extract_features plumbing,
    mirrored in SQL (VERDICT r6 #3): regenerate the deterministic pixels
    per doc_id (the _dhash_real_oracle formulas), integer BT.601 luma,
    g×g floor-boundary blocks, INTEGER mean, one division by 255.0 —
    every value an exact small rational, so the hash can never flip."""
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 0),
    px AS (
      SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             (doc_id*31 + x*7 + y*13) % 256 AS r,
             (doc_id*17 + x*3 + y*11) % 256 AS gg,
             (doc_id*23 + x*5 + y*19) % 256 AS b
      FROM ids, LATERAL UNNEST(range({w})) tx(x), LATERAL UNNEST(range({h})) ty(y)
    ),
    lum AS (SELECT doc_id, x, y, (299*r + 587*gg + 114*b) // 1000 AS l FROM px),
    blk AS (
      SELECT doc_id, (y*{g}) // {h} AS by, (x*{g}) // {w} AS bx,
             (SUM(l) // COUNT(*)) / 255.0 AS fval
      FROM lum GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(by*{g} + bx AS INTEGER) AS fi, fval FROM blk
    """


@query("multimodal_features_real", _features_real_oracle())
def multimodal_features_real_q(spark, sf_dir):
    """REAL feature extraction end to end (VERDICT r6 #3): the same
    deterministic 36×16 binary-PPM fixture as multimodal_dhash_real flows
    through the GENERIC extract_features plumbing (media-type dispatch →
    real P6 decode → g×g integer block-mean luma grid), exploded to
    (doc_id, fi, fval) long rows the oracle reproduces exactly — proving
    the decode_stub routing fix made feature extraction real, not just
    the dedicated dHash kernel."""
    from sparsity_spark.operators.multimodal import extract_features

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 0  # corpus-proportional fixture: the real
        # decode work scales with the data, so the sf1 tier measures the
        # decoder, not a fixed-200-doc constant (r7)
    ).distinct()

    def mk_ppm(batches):
        import numpy as np
        import pandas as pd

        W, H = 36, 16
        xs = np.arange(W, dtype=np.int64)[None, :]
        ys = np.arange(H, dtype=np.int64)[:, None]

        def ppm(doc_id):
            r = (doc_id * 31 + xs * 7 + ys * 13) % 256
            g = (doc_id * 17 + xs * 3 + ys * 11) % 256
            b = (doc_id * 23 + xs * 5 + ys * 19) % 256
            img = np.stack(
                [np.broadcast_to(c, (H, W)) for c in (r, g, b)], axis=2
            ).astype(np.uint8)
            return b"P6\n%d %d\n255\n" % (W, H) + img.tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [ppm(int(i)) for i in pdf["doc_id"]],
                }
            )

    raw = ensure_parallelism(ids).mapInPandas(mk_ppm, schema="doc_id long, content binary")
    assets = raw.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("media_type"),
            F.octet_length("content").alias("n_bytes"),
            F.lit(1).alias("chunk_count"),
        ).alias("meta"),
    )
    feats = extract_features(assets, fake=False)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("fi", "fval")
    )


def _png_real_oracle(mod: int = 4, w: int = 24, h: int = 20, g: int = 4) -> str:
    """REAL compressed-image decode end to end, mirrored in SQL (r7): the
    Spark query generates a deterministic w×h image per doc_id — cycling
    through grayscale / RGB / RGBA color types by doc_id%3 — encodes it
    as a REAL PNG (zlib deflate, per-scanline filter y%5 so every
    unfilter path None/Sub/Up/Average/Paeth is on the decode path),
    routes it through the generic extract_features plumbing (media-type
    dispatch → CRC-validated chunk walk → inflate → unfilter →
    gray-replicate/alpha-drop → integer BT.601 luma → g×g integer
    block-mean grid). The oracle regenerates the SAME pixels from doc_id
    (grayscale luma is the gray value itself since the BT.601 weights sum
    to 1000; RGBA's alpha is dropped before luma, so its luma equals the
    RGB case) — a mismatch anywhere in deflate → chunk walk → inflate →
    unfilter → color-normalize → luma → block means breaks the hash."""
    gray = "(doc_id*19 + x*7 + y*5) % 256"
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 1),
    px AS (
      SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             CASE WHEN doc_id % 3 = 0 THEN {gray}
                  ELSE (doc_id*37 + x*11 + y*3) % 256 END AS r,
             CASE WHEN doc_id % 3 = 0 THEN {gray}
                  ELSE (doc_id*13 + x*5 + y*17) % 256 END AS gg,
             CASE WHEN doc_id % 3 = 0 THEN {gray}
                  ELSE (doc_id*29 + x*7 + y*23) % 256 END AS b
      FROM ids, LATERAL UNNEST(range({w})) tx(x), LATERAL UNNEST(range({h})) ty(y)
    ),
    lum AS (SELECT doc_id, x, y, (299*r + 587*gg + 114*b) // 1000 AS l FROM px),
    blk AS (
      SELECT doc_id, (y*{g}) // {h} AS by, (x*{g}) // {w} AS bx,
             (SUM(l) // COUNT(*)) / 255.0 AS fval
      FROM lum GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(by*{g} + bx AS INTEGER) AS fi, fval FROM blk
    """


@query("multimodal_png_real", _png_real_oracle())
def multimodal_png_real_q(spark, sf_dir):
    """REAL PNG decode through the generic multimodal plumbing (r7 —
    closes the round-6 'compressed codecs' gap for the one compressed
    format Python can decode with its own stdlib): a deterministic 24×20
    image per doc_id, color type cycling gray/RGB/RGBA by doc_id%3, is
    deflate-compressed into a real PNG with the scanline filter cycling
    y%5 — so the decode path exercises zlib inflate plus ALL FIVE
    unfilter kernels, CRC validation, and the gray-replicate/alpha-drop
    normalization — then flows through extract_features' media-type
    dispatch to the same g×g integer block-mean luma grid as the PPM
    fixture. The oracle regenerates the pixels in SQL and must land on
    identical exact rationals."""
    from sparsity_spark.operators.multimodal import _INLINE_CODEC_SRC, extract_features

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 1  # corpus-proportional fixture, disjoint
        # from the PPM fixture's %4==0 slice
    ).distinct()

    def mk_png(batches, _src=_INLINE_CODEC_SRC):
        import numpy as np
        import pandas as pd

        ns = {"np": np}
        exec(_src, ns)
        encode_png = ns["encode_png"]
        W, H = 24, 20
        xs = np.arange(W, dtype=np.int64)[None, :]
        ys = np.arange(H, dtype=np.int64)[:, None]

        def png(doc_id):
            if doc_id % 3 == 0:
                img = ((doc_id * 19 + xs * 7 + ys * 5) % 256).astype(np.uint8)
                img = np.broadcast_to(img, (H, W))
            else:
                r = (doc_id * 37 + xs * 11 + ys * 3) % 256
                g = (doc_id * 13 + xs * 5 + ys * 17) % 256
                b = (doc_id * 29 + xs * 7 + ys * 23) % 256
                chans = [np.broadcast_to(c, (H, W)) for c in (r, g, b)]
                if doc_id % 3 == 2:
                    chans.append(
                        np.broadcast_to((doc_id + xs + ys) % 256, (H, W))
                    )
                img = np.stack(chans, axis=2).astype(np.uint8)
            return encode_png(img, "cycle")

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [png(int(i)) for i in pdf["doc_id"]],
                }
            )

    raw = ensure_parallelism(ids).mapInPandas(mk_png, schema="doc_id long, content binary")
    assets = raw.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.octet_length("content").alias("n_bytes"),
            F.lit(1).alias("chunk_count"),
        ).alias("meta"),
    )
    feats = extract_features(assets, fake=False)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("fi", "fval")
    )


def _audio_real_oracle(mod: int = 4, n: int = 650) -> str:
    """Frame-energy fingerprint over REAL decoded PCM, mirrored in SQL
    (the audio twin of `_dhash_real_oracle`): the Spark query generates a
    deterministic {n}-sample 16-bit waveform per doc_id (integer formula
    below), encodes it as a real RIFF/WAVE payload, decodes it with the
    real RIFF parser, and packs the 64 frame-energy gradient signs; the
    oracle regenerates the SAME samples from doc_id, sums the SAME exact
    integer energies per 65 equal frames, and packs the same bits. A
    mismatch anywhere in encode -> chunk walk -> int16 view -> framing ->
    energy -> pack breaks the hash match."""
    assert n % 65 == 0
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 0),
    s AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             ((doc_id*31 + i*i*7 + i*13) % 65536) - 32768 AS v
      FROM ids, LATERAL UNNEST(range({n})) t(i)
    ),
    fe AS (
      SELECT doc_id, i // {n // 65} AS f, SUM(v*v) AS energy
      FROM s GROUP BY 1, 2
    ),
    g AS (SELECT doc_id, list(energy ORDER BY f) AS e FROM fe GROUP BY doc_id)
    SELECT doc_id, CAST((CASE WHEN e[1] > e[2] THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[2] > e[3] THEN CAST(2 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[3] > e[4] THEN CAST(4 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[4] > e[5] THEN CAST(8 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[5] > e[6] THEN CAST(16 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[6] > e[7] THEN CAST(32 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[7] > e[8] THEN CAST(64 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[8] > e[9] THEN CAST(128 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[9] > e[10] THEN CAST(256 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[10] > e[11] THEN CAST(512 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[11] > e[12] THEN CAST(1024 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[12] > e[13] THEN CAST(2048 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[13] > e[14] THEN CAST(4096 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[14] > e[15] THEN CAST(8192 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[15] > e[16] THEN CAST(16384 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[16] > e[17] THEN CAST(32768 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[17] > e[18] THEN CAST(65536 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[18] > e[19] THEN CAST(131072 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[19] > e[20] THEN CAST(262144 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[20] > e[21] THEN CAST(524288 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[21] > e[22] THEN CAST(1048576 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[22] > e[23] THEN CAST(2097152 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[23] > e[24] THEN CAST(4194304 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[24] > e[25] THEN CAST(8388608 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[25] > e[26] THEN CAST(16777216 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[26] > e[27] THEN CAST(33554432 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[27] > e[28] THEN CAST(67108864 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[28] > e[29] THEN CAST(134217728 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[29] > e[30] THEN CAST(268435456 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[30] > e[31] THEN CAST(536870912 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[31] > e[32] THEN CAST(1073741824 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[32] > e[33] THEN CAST(2147483648 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[33] > e[34] THEN CAST(4294967296 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[34] > e[35] THEN CAST(8589934592 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[35] > e[36] THEN CAST(17179869184 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[36] > e[37] THEN CAST(34359738368 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[37] > e[38] THEN CAST(68719476736 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[38] > e[39] THEN CAST(137438953472 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[39] > e[40] THEN CAST(274877906944 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[40] > e[41] THEN CAST(549755813888 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[41] > e[42] THEN CAST(1099511627776 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[42] > e[43] THEN CAST(2199023255552 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[43] > e[44] THEN CAST(4398046511104 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[44] > e[45] THEN CAST(8796093022208 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[45] > e[46] THEN CAST(17592186044416 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[46] > e[47] THEN CAST(35184372088832 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[47] > e[48] THEN CAST(70368744177664 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[48] > e[49] THEN CAST(140737488355328 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[49] > e[50] THEN CAST(281474976710656 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[50] > e[51] THEN CAST(562949953421312 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[51] > e[52] THEN CAST(1125899906842624 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[52] > e[53] THEN CAST(2251799813685248 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[53] > e[54] THEN CAST(4503599627370496 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[54] > e[55] THEN CAST(9007199254740992 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[55] > e[56] THEN CAST(18014398509481984 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[56] > e[57] THEN CAST(36028797018963968 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[57] > e[58] THEN CAST(72057594037927936 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[58] > e[59] THEN CAST(144115188075855872 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[59] > e[60] THEN CAST(288230376151711744 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[60] > e[61] THEN CAST(576460752303423488 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[61] > e[62] THEN CAST(1152921504606846976 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[62] > e[63] THEN CAST(2305843009213693952 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[63] > e[64] THEN CAST(4611686018427387904 AS BIGINT) ELSE CAST(0 AS BIGINT) END) + (CASE WHEN e[64] > e[65] THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp FROM g
    """


@query("multimodal_audio_real", _audio_real_oracle())
def multimodal_audio_real_q(spark, sf_dir):
    """Acoustic fingerprints on REAL waveforms through the REAL RIFF/WAV
    decoder: a deterministic 650-sample 16-bit PCM signal is generated
    per doc_id (integer sample formula both engines reproduce), the
    Spark side round-trips it through the actual WAV codec (RIFF chunk
    walk, fmt validation, int16 data view), then 65-frame exact integer
    energies and 64 gradient-sign bits — the full acoustic near-dup
    pipeline on actual audio, not the fake-decode segmentation. The
    oracle regenerates the same samples in SQL and must land on the
    identical 64-bit fingerprint."""
    from sparsity_spark.operators.multimodal import audio_fingerprints

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 0  # corpus-proportional fixture: the real
        # decode work scales with the data, so the sf1 tier measures the
        # decoder, not a fixed-200-doc constant (r7)
    ).distinct()

    def mk_wav(batches):
        # self-contained closure (inline RIFF encoder, identical to
        # multimodal.wav_encode and parity-tested against it)
        import numpy as np
        import pandas as pd

        N = 650
        i = np.arange(N, dtype=np.int64)

        def enc(samples, rate=16000):
            data = np.asarray(samples, dtype="<i2").tobytes()
            fmt = (
                (1).to_bytes(2, "little")
                + (1).to_bytes(2, "little")
                + rate.to_bytes(4, "little")
                + (rate * 2).to_bytes(4, "little")
                + (2).to_bytes(2, "little")
                + (16).to_bytes(2, "little")
            )
            body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            body += b"data" + len(data).to_bytes(4, "little") + data
            return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

        def wav(doc_id):
            v = ((doc_id * 31 + i * i * 7 + i * 13) % 65536) - 32768
            return enc(v.astype("<i2"), rate=16000)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    assets = ensure_parallelism(ids).mapInPandas(mk_wav, schema="doc_id long, content binary")
    return audio_fingerprints(assets)


def _spectral_oracle(mod: int = 4, n: int = 650, scale: int = 512) -> str:
    """The integer DFT filterbank replayed in SQL: the same waveform
    formula, the same 5×8 integer coefficient table (VALUES literal
    emitted from the SAME python function the Spark kernel uses), the
    same frame windows, the same exact Σ(re²+im²) integers."""
    from sparsity_spark.operators.multimodal import dft8_coeffs

    C, S = dft8_coeffs(scale)
    rows = ", ".join(
        f"({k}, {nn}, {C[k][nn]}, {S[k][nn]})" for k in range(5) for nn in range(8)
    )
    nt = (n // 8) * 8
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 0),
    s AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             ((doc_id*31 + i*i*7 + i*13) % 65536) - 32768 AS v
      FROM ids, LATERAL UNNEST(range({n})) t(i)
    ),
    cf AS (SELECT * FROM (VALUES {rows}) AS t(k, nn, c, sn)),
    fr AS (
      SELECT s.doc_id, cf.k, s.i // 8 AS f,
             SUM(s.v * cf.c) AS re, SUM(s.v * cf.sn) AS im
      FROM s JOIN cf ON cf.nn = s.i % 8
      WHERE s.i < {nt}
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(k AS INTEGER) AS bin,
           CAST(SUM(re*re + im*im) AS BIGINT) AS energy
    FROM fr GROUP BY 1, 2
    """


@query("multimodal_spectral_bands", _spectral_oracle())
def multimodal_spectral_bands_q(spark, sf_dir):
    """Frequency-domain audio features over REAL decoded PCM (r8): the
    650-sample waveform fixture round-trips through the real RIFF/WAV
    codec, then every 8-sample window passes the integer-coefficient
    DFT filterbank and per-bin energies are summed — exact BIGINTs the
    oracle reproduces from the shared coefficient table, so a drift
    anywhere in decode → framing → matmul → energy flips the hash. One
    Arrow decode per asset, map-only (the audio sibling of the dhash
    real-pixel discipline, extended into the frequency domain)."""
    from sparsity_spark.operators.multimodal import audio_spectral_bands

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 0
    ).distinct()

    def mk_wav(batches):
        import numpy as np
        import pandas as pd

        N = 650
        i = np.arange(N, dtype=np.int64)

        def enc(samples, rate=16000):
            data = np.asarray(samples, dtype="<i2").tobytes()
            fmt = (
                (1).to_bytes(2, "little")
                + (1).to_bytes(2, "little")
                + rate.to_bytes(4, "little")
                + (rate * 2).to_bytes(4, "little")
                + (2).to_bytes(2, "little")
                + (16).to_bytes(2, "little")
            )
            body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            body += b"data" + len(data).to_bytes(4, "little") + data
            return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

        def wav(doc_id):
            v = ((doc_id * 31 + i * i * 7 + i * 13) % 65536) - 32768
            return enc(v.astype("<i2"), rate=16000)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    assets = ensure_parallelism(ids).mapInPandas(
        mk_wav, schema="doc_id long, content binary"
    )
    return audio_spectral_bands(assets)


def _adpcm_real_oracle(mod: int = 4, n: int = 650, spb: int = 505) -> str:
    """REAL compressed-audio decode, mirrored by a set-based RECURSIVE CTE
    (r7): the Spark query generates a deterministic n-sample waveform per
    doc_id, compresses it with the real IMA ADPCM encoder (4-bit adaptive
    quantizer, format tag 0x11), decodes the container back, and sums
    exact integer frame energies. The codec is lossy but every step is
    pure integer arithmetic, so the oracle replays the ENTIRE quantizer
    state machine in SQL — one recursion level per sample, all docs
    advancing together (set-based: depth n, width |docs|), with the
    89-entry step table as a list literal and the block re-anchor rule
    (sample i ≡ 0 mod samples_per_block is stored verbatim) inlined. A
    mismatch anywhere in quantize → dequantize → clamp → index-walk →
    block framing → fact-chunk truncation breaks the energy sums."""
    from sparsity_spark.operators.multimodal import IMA_STEP_TABLE

    steps = "[" + ", ".join(str(x) for x in IMA_STEP_TABLE) + "]"
    sig = "((doc_id*37 + (i+1)*(i+1)*11 + (i+1)*17) % 65536) - 32768"
    return f"""
    WITH RECURSIVE ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 2),
    st(doc_id, i, pred, idx) AS (
      SELECT doc_id, 0, ((doc_id*37) % 65536) - 32768, 0 FROM ids
      UNION ALL
      SELECT doc_id, i,
             CASE WHEN i % {spb} = 0 THEN s
                  ELSE GREATEST(-32768, LEAST(32767, pred + sgn * dq)) END,
             CASE WHEN i % {spb} = 0 THEN idx
                  ELSE GREATEST(0, LEAST(88, idx + adj)) END
      FROM (
        SELECT doc_id, i, pred, idx, s, sgn,
               (step // 8) + b0 * (step // 4) + b1 * (step // 2) + b2 * step AS dq,
               CASE b2*4 + b1*2 + b0
                 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8
                 ELSE -1 END AS adj
        FROM (
          SELECT *, CASE WHEN m1 >= step // 4 THEN 1 ELSE 0 END AS b0
          FROM (
            SELECT *, CASE WHEN m2 >= step // 2 THEN 1 ELSE 0 END AS b1,
                   m2 - (CASE WHEN m2 >= step // 2 THEN 1 ELSE 0 END) * (step // 2) AS m1
            FROM (
              SELECT *, CASE WHEN m >= step THEN 1 ELSE 0 END AS b2,
                     m - (CASE WHEN m >= step THEN 1 ELSE 0 END) * step AS m2
              FROM (
                SELECT doc_id, i + 1 AS i, pred, idx,
                       {sig} AS s,
                       CASE WHEN {sig} < pred THEN -1 ELSE 1 END AS sgn,
                       ABS({sig} - pred) AS m,
                       list_extract({steps}, idx + 1) AS step
                FROM st WHERE i < {n - 1}
              )
            )
          )
        )
      )
    )
    SELECT doc_id, CAST(i // 10 AS INTEGER) AS fi,
           CAST(SUM(CAST(pred AS BIGINT) * CAST(pred AS BIGINT)) AS BIGINT) AS energy
    FROM st GROUP BY 1, 2
    """


@query("multimodal_adpcm_real", _adpcm_real_oracle())
def multimodal_adpcm_real_q(spark, sf_dir):
    """REAL compressed-audio codec end to end (r7): per doc_id a
    deterministic 650-sample int16 waveform is IMA-ADPCM-compressed (4:1,
    the classic 4-bit adaptive quantizer in a format-0x11 WAV container
    with block headers and a fact chunk), decoded back through the real
    RIFF parser, and reduced to exact integer 10-sample frame energies.
    The oracle replays the full quantizer state machine as a set-based
    recursive CTE — the strongest form of the real-decode discipline:
    even a one-ulp drift in the step-table walk flips the hash."""
    from sparsity_spark.operators.multimodal import _INLINE_CODEC_SRC

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 4 == 2  # corpus-proportional, disjoint from the
        # PPM (%4==0), PNG (%4==1) and PCM-WAV fixtures
    ).distinct()

    def mk(batches, _src=_INLINE_CODEC_SRC):
        import numpy as np
        import pandas as pd

        ns = {"np": np}
        exec(_src, ns)
        # fixture construction (the encode) is the vectorized-across-docs
        # batch encoder — byte-identical to the per-doc encoder
        # (parity-pinned) but one numpy pass per sample instead of a
        # Python loop per doc; the DECODE under test stays the real
        # per-payload RIFF/ADPCM parser
        encode_batch, parse_wav = ns["encode_adpcm_wav_batch"], ns["parse_wav"]
        N = 650
        i = np.arange(N, dtype=np.int64)[None, :]

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                yield pd.DataFrame({"doc_id": [], "fi": [], "energy": []})
                continue
            mat = (
                (ids[:, None] * 37 + i * i * 11 + i * 17) % 65536 - 32768
            ).astype("<i2")
            payloads = encode_batch(mat)
            dec = np.stack(
                [np.asarray(parse_wav(p), dtype=np.int64) for p in payloads]
            )
            energy = (dec.reshape(len(ids), 65, 10) ** 2).sum(axis=2)
            out = pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, 65),
                    "fi": np.tile(np.arange(65, dtype=np.int32), len(ids)),
                    "energy": energy.reshape(-1),
                }
            )
            yield out

    return ensure_parallelism(ids).mapInPandas(mk, schema="doc_id long, fi int, energy long")


def _y4m_fixture_gen(_src=None):
    """Shared Y4M fixture generator (r7): a deterministic 6-frame 16×12
    C444 video per doc_id — integer channel formulas over (doc_id, t, x,
    y) both engines reproduce — encoded through the real YUV4MPEG2
    encoder. Returns a mapInPandas generator."""
    from sparsity_spark.operators.multimodal import _INLINE_CODEC_SRC

    src = _src or _INLINE_CODEC_SRC

    def mk(batches, _src=src):
        import numpy as np
        import pandas as pd

        ns = {"np": np}
        exec(_src, ns)
        encode_y4m = ns["encode_y4m"]
        T, H, W = 6, 12, 16
        t = np.arange(T, dtype=np.int64)[:, None, None]
        y = np.arange(H, dtype=np.int64)[None, :, None]
        x = np.arange(W, dtype=np.int64)[None, None, :]

        def vid(doc_id):
            yv = (doc_id * 7 + t * 29 + x * 3 + y * 11) % 256
            uv = (doc_id * 11 + t * 17 + x * 5 + y * 7) % 256
            vv = (doc_id * 13 + t * 23 + x * 7 + y * 3) % 256
            fr = np.stack(
                [np.broadcast_to(c, (T, H, W)) for c in (yv, uv, vv)], axis=3
            ).astype(np.uint8)
            return encode_y4m(fr)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [vid(int(d)) for d in pdf["doc_id"]],
                }
            )

    return mk


def _y4m_assets(spark, sf_dir, mod: int = 4, rem: int = 3):
    """doc_id %4==3 slice (disjoint from the PPM/PNG/ADPCM fixtures) →
    real Y4M payloads with typed metadata; chunk_count carries the REAL
    frame count the JVM-side stride explode samples from."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % mod == rem
    ).distinct()
    raw = ensure_parallelism(ids).mapInPandas(
        _y4m_fixture_gen(), schema="doc_id long, content binary"
    )
    return raw.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("video/x-yuv4mpeg").alias("media_type"),
            F.octet_length("content").alias("n_bytes"),
            F.lit(6).alias("chunk_count"),
        ).alias("meta"),
    )


def _y4m_frames_oracle(mod: int = 4, w: int = 16, h: int = 12) -> str:
    """REAL video decode end to end, mirrored in SQL (r7): the Spark side
    encodes the deterministic fixture as a real YUV4MPEG2 stream, decodes
    it frame by frame through the real parser (stream-header tags, FRAME
    markers, planar reshape), and emits EXACT integer per-plane sums for
    every sampled frame; the oracle regenerates the same pixels from
    (doc_id, t, x, y) and must land on identical integers — a mismatch
    anywhere in encode → header walk → frame slicing → plane order breaks
    the hash."""
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 3),
    px AS (
      SELECT doc_id, CAST(t AS INTEGER) AS frame_idx,
             (doc_id*7 + t*29 + x*3 + y*11) % 256 AS yv,
             (doc_id*11 + t*17 + x*5 + y*7) % 256 AS uv,
             (doc_id*13 + t*23 + x*7 + y*3) % 256 AS vv
      FROM ids,
           LATERAL UNNEST([0, 2, 4]) tt(t),
           LATERAL UNNEST(range({w})) tx(x),
           LATERAL UNNEST(range({h})) ty(y)
    )
    SELECT doc_id, frame_idx,
           CAST(SUM(yv) AS BIGINT) AS y_sum,
           CAST(SUM(uv) AS BIGINT) AS u_sum,
           CAST(SUM(vv) AS BIGINT) AS v_sum
    FROM px GROUP BY 1, 2
    """


@query("multimodal_y4m_frames", _y4m_frames_oracle())
def multimodal_y4m_frames_q(spark, sf_dir):
    """REAL video decode through the real YUV4MPEG2 parser (r7 — the
    video member of the real-codec family, next to PPM/PNG stills and
    PCM/ADPCM audio): a deterministic 6-frame 16×12 C444 video per doc_id
    is encoded as an actual Y4M stream, frames 0/2/4 are sampled by the
    JVM-side stride explode, and each sampled frame's decoded planes are
    reduced to exact integer sums the oracle reproduces from first
    principles."""
    from sparsity_spark.operators.multimodal import video_frame_stats

    return video_frame_stats(_y4m_assets(spark, sf_dir), every_k=2)


def _y4m_features_oracle(mod: int = 4, w: int = 16, h: int = 12, t: int = 6, g: int = 4) -> str:
    """Temporal-mean luma features over REAL decoded video, mirrored in
    SQL: Y IS the luma plane in YUV, so the g×g block means are exact
    integer sums over (frame, row, col) with ONE integer divide and one
    /255.0 — the image-feature rational discipline extended in time."""
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 3),
    px AS (
      SELECT doc_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
             (doc_id*7 + t*29 + x*3 + y*11) % 256 AS yv
      FROM ids,
           LATERAL UNNEST(range({t})) tt(t),
           LATERAL UNNEST(range({w})) tx(x),
           LATERAL UNNEST(range({h})) ty(y)
    ),
    blk AS (
      SELECT doc_id, (y*{g}) // {h} AS by, (x*{g}) // {w} AS bx,
             (SUM(yv) // COUNT(*)) / 255.0 AS fval
      FROM px GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(by*{g} + bx AS INTEGER) AS fi, fval FROM blk
    """


@query("multimodal_y4m_features", _y4m_features_oracle())
def multimodal_y4m_features_q(spark, sf_dir):
    """REAL video feature extraction through the GENERIC extract_features
    plumbing (r7): the Y4M fixture flows through the media-type dispatch
    → real stream decode → temporal-mean g×g block-luma grid, exploded to
    (doc_id, fi, fval) exact rationals the oracle reproduces — proving
    the video branch is routed end to end, not just the dedicated
    frame-stats kernel."""
    from sparsity_spark.operators.multimodal import extract_features

    feats = extract_features(_y4m_assets(spark, sf_dir), fake=False)
    return feats.select("doc_id", F.posexplode("feature").alias("fi", "fval"))


def _shot_y4m_assets(spark, sf_dir, mod: int = 3, rem: int = 1):
    """Shot-boundary fixture (r8): a deterministic 6-frame 16×12 Cmono
    video per doc_id (%3==1 slice) with a HARD CUT between frames 2 and
    3 — segment A drifts +1/frame over a (doc, x, y) base pattern capped
    at 192, segment B is a different pattern offset to 200+, so the luma
    MAD is exactly H·W=192 within a segment and ≥ 9·H·W across the cut.
    Integer formulas both engines reproduce, encoded through the real
    Y4M encoder (the mono colorspace branch, which the color fixture
    never exercises)."""
    from sparsity_spark.operators.multimodal import _INLINE_CODEC_SRC

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % mod == rem
    ).distinct()

    def mk(batches, _src=_INLINE_CODEC_SRC):
        import numpy as np
        import pandas as pd

        ns = {"np": np}
        exec(_src, ns)
        encode_y4m = ns["encode_y4m"]
        T, H, W = 6, 12, 16
        t = np.arange(T, dtype=np.int64)[:, None, None]
        y = np.arange(H, dtype=np.int64)[None, :, None]
        x = np.arange(W, dtype=np.int64)[None, None, :]

        def vid(doc_id):
            seg_a = (doc_id * 7 + x * 2 + y * 5) % 190 + t
            seg_b = 200 + (doc_id * 3 + x * 5 + y * 2) % 50 + (t - 3)
            yv = np.where(t < 3, seg_a, seg_b)
            return encode_y4m(np.broadcast_to(yv, (T, H, W)).astype(np.uint8))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [vid(int(d)) for d in pdf["doc_id"]],
                }
            )

    raw = ensure_parallelism(ids).mapInPandas(
        mk, schema="doc_id long, content binary"
    )
    return raw.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("video/x-yuv4mpeg").alias("media_type"),
            F.octet_length("content").alias("n_bytes"),
            F.lit(6).alias("chunk_count"),
        ).alias("meta"),
    )


def _shot_boundaries_oracle(mod: int = 3, w: int = 16, h: int = 12, thr: int = 1000) -> str:
    """The whole shot detector replayed in SQL: regenerate both segments'
    pixels from (doc_id, t, x, y), self-join consecutive frames, sum
    |ΔY| exactly, threshold. A defect anywhere in mono encode → stream
    parse → frame slicing → pairwise diff → cut rule breaks the hash."""
    return f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {mod} = 1),
    px AS (
      SELECT doc_id, t, x, y,
             CASE WHEN t < 3 THEN (doc_id*7 + x*2 + y*5) % 190 + t
                  ELSE 200 + (doc_id*3 + x*5 + y*2) % 50 + (t-3) END AS yv
      FROM ids,
           LATERAL UNNEST(range(6)) tt(t),
           LATERAL UNNEST(range({w})) tx(x),
           LATERAL UNNEST(range({h})) ty(y)
    ),
    d AS (
      SELECT a.doc_id, CAST(a.t AS INTEGER) AS frame_idx,
             CAST(SUM(ABS(a.yv - b.yv)) AS BIGINT) AS mad
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.t = a.t - 1 AND b.x = a.x AND b.y = a.y
      GROUP BY 1, 2
    )
    SELECT doc_id, frame_idx, mad, mad > {thr} AS is_cut FROM d
    """


@query("multimodal_shot_boundaries", _shot_boundaries_oracle())
def multimodal_shot_boundaries_q(spark, sf_dir):
    """Shot-boundary detection over REAL decoded video (r8): the mono
    Y4M fixture with a hard cut at frame 3 flows through the real stream
    parser, every consecutive frame pair's exact integer luma MAD is
    computed in ONE Arrow decode per asset (map-only, no shuffle), and
    the classical threshold rule flags the cut. The oracle replays
    pixels → pairwise |ΔY| sums → threshold from first principles, so
    the 5 pairs per video must land on identical integers AND the same
    boolean — within-segment pairs (mad = 192) prove the detector stays
    quiet, the cut pair proves it fires."""
    from sparsity_spark.operators.multimodal import video_shot_mad

    mad = video_shot_mad(_shot_y4m_assets(spark, sf_dir))
    return mad.withColumn("is_cut", F.col("mad") > 1000)


def _gif_assets(spark, sf_dir, mod: int = 4, rem: int = 1):
    """Deterministic 4-frame 20×10 animated-GIF fixture per doc_id
    (%4==1 slice): an 8-color palette and per-pixel indices from integer
    formulas both engines reproduce, LZW-encoded through the real GIF
    encoder — odd doc_ids take the interlaced path so both row orders are
    on the decode path. chunk_count carries the real frame count."""
    from sparsity_spark.operators.multimodal import _INLINE_CODEC_SRC

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % mod == rem
    ).distinct()

    def mk(batches, _src=_INLINE_CODEC_SRC):
        import numpy as np
        import pandas as pd

        ns = {"np": np}
        exec(_src, ns)
        encode_gif = ns["encode_gif"]
        T, H, W = 4, 12, 20
        pal = np.stack(
            [
                (17 * np.arange(8) + 3) % 256,
                (29 * np.arange(8) + 7) % 256,
                (41 * np.arange(8) + 11) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        t = np.arange(T, dtype=np.int64)[:, None, None]
        y = np.arange(H, dtype=np.int64)[None, :, None]
        x = np.arange(W, dtype=np.int64)[None, None, :]

        def gif(doc_id):
            idx = ((doc_id + 5 * t + 3 * y + x) % 8).astype(np.uint8)
            return encode_gif(
                np.broadcast_to(idx, (T, H, W)), pal, interlace=bool(doc_id % 2)
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": [gif(int(d)) for d in pdf["doc_id"]],
                }
            )

    raw = ensure_parallelism(ids).mapInPandas(mk, schema="doc_id long, content binary")
    return raw.select(
        "doc_id",
        "content",
        F.struct(
            F.lit("image/gif").alias("media_type"),
            F.octet_length("content").alias("n_bytes"),
            F.lit(4).alias("chunk_count"),
        ).alias("meta"),
    )


_GIF_PX_SQL = """
      SELECT doc_id, t, x, y,
             (17 * ((doc_id + 5*t + 3*y + x) % 8) + 3) % 256 AS r,
             (29 * ((doc_id + 5*t + 3*y + x) % 8) + 7) % 256 AS gg,
             (41 * ((doc_id + 5*t + 3*y + x) % 8) + 11) % 256 AS b
      FROM ids, LATERAL UNNEST({TS}) tt(t),
           LATERAL UNNEST(range(20)) tx(x), LATERAL UNNEST(range(12)) ty(y)
"""


@query(
    "multimodal_gif_frames",
    f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 1),
    px AS ({_GIF_PX_SQL.replace("{TS}", "[0, 2]")})
    SELECT doc_id, CAST(t AS INTEGER) AS frame_idx,
           CAST(SUM(r) AS BIGINT) AS r_sum,
           CAST(SUM(gg) AS BIGINT) AS g_sum,
           CAST(SUM(b) AS BIGINT) AS b_sum
    FROM px GROUP BY 1, 2
    """,
)
def multimodal_gif_frames_q(spark, sf_dir):
    """REAL LZW-compressed animated-GIF decode end to end (r7 — the third
    genuinely compressed codec after PNG/ADPCM): the deterministic
    palette-indexed fixture round-trips through the real GIF encoder and
    decoder (variable-width LZW with early change, sub-block walk, palette
    lookup, interlace on odd doc_ids), frames 0/2 are sampled by the
    JVM-side stride explode, and each decoded frame's exact integer RGB
    channel sums must equal the oracle's first-principles regeneration."""
    from sparsity_spark.operators.multimodal import gif_frame_stats

    return gif_frame_stats(_gif_assets(spark, sf_dir), every_k=2)


@query(
    "multimodal_gif_features",
    f"""
    WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 4 = 1),
    px AS ({_GIF_PX_SQL.replace("{TS}", "range(4)")}),
    lum AS (
      SELECT doc_id, x, y, t, (299*r + 587*gg + 114*b) // 1000 AS l FROM px
    ),
    blk AS (
      SELECT doc_id, (y*4) // 12 AS by, (x*4) // 20 AS bx,
             (SUM(l) // COUNT(*)) / 255.0 AS fval
      FROM lum GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(by*4 + bx AS INTEGER) AS fi, fval FROM blk
    """,
)
def multimodal_gif_features_q(spark, sf_dir):
    """REAL animated-GIF features through the GENERIC extract_features
    plumbing (r7): the LZW fixture flows through the media-type dispatch →
    real GIF decode → per-frame integer BT.601 luma → the temporal-mean
    g×g block grid shared with the Y4M video branch, exploded to exact
    rationals the oracle reproduces — proving the GIF branch is routed end
    to end, not just the dedicated frame-stats kernel."""
    from sparsity_spark.operators.multimodal import extract_features

    feats = extract_features(_gif_assets(spark, sf_dir), fake=False)
    return feats.select("doc_id", F.posexplode("feature").alias("fi", "fval"))


@query(
    "dedup_edit_distance_pairs",
    """
    WITH v AS (
      SELECT DISTINCT c_custkey AS id, c_name AS s,
             CASE WHEN i = length(c_name) THEN c_name
                  ELSE substr(c_name, 1, i) || substr(c_name, i+2) END AS var
      FROM customer, LATERAL UNNEST(range(length(c_name) + 1)) t(i)
      WHERE c_custkey % 4 = 0
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS INTEGER) AS dist
    FROM cand WHERE levenshtein(sa, sb) <= 1
    """,
)
def dedup_edit_distance_pairs_q(spark, sf_dir):
    """Edit-distance-1 pair search over customer names via FastSS deletion
    neighborhoods (r7): every name explodes to its ≤ L+1 single-deletion
    variants, candidates come from ONE bucketed equi-join on shared
    variants (never cartesian), and exact levenshtein verification keeps
    the result lossless — the short-string member of the near-dup family
    (record linkage on names/titles/codes). The oracle mirrors the full
    neighborhood → join → verify pipeline with the same classic
    edit-distance semantics."""
    from sparsity_spark.operators.dedup import edit_distance_pairs

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 4 == 0)  # density-bounded slice: the
        # sequential-keyspace fixture is an ed-1 CLIQUE generator (every
        # name has ~35 one-digit neighbors at sf0.1); a quarter slice
        # keeps the oracle discriminative without an output-bound bench
        # row — full-corpus density analysis in SCALE.md
        .select("c_custkey", "c_name")
    )
    return edit_distance_pairs(cust, id_col="c_custkey", str_col="c_name")


@query(
    "dedup_exact_normalized",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, replace(upper(text), ' ', '  ')
      FROM documents WHERE doc_id % 60 = 0
    )
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g'))) AS norm_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM d
    GROUP BY 1
    """,
)
def dedup_exact_normalized_q(spark, sf_dir):
    """Exact dedup on canonicalized text (lowercase, punctuation→space,
    collapsed whitespace): catches case/punctuation drift that raw
    md5(text) misses, same one-aggregate shape. Every 60th doc is
    re-appended UPPERCASED with doubled spacing on both engine sides, so
    the oracle checks groups the raw hash cannot see."""
    from sparsity_spark.operators.text import normalized_exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    variant = docs.filter(F.col("doc_id") % 60 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace(F.upper(F.col("text")), " ", "  ").alias("text"),
    )
    return normalized_exact_dedup(docs.select("doc_id", "text").unionByName(variant))


@query("dedup_minhash_signatures", _MINHASH_SQL)
def dedup_minhash_signatures_q(spark, sf_dir):
    """MinHash signatures (16 hashes over word 3-shingles) — all mins in a
    single aggregate, md5-based so the oracle reproduces them exactly."""
    from sparsity_spark.operators.dedup import minhash_signatures

    return minhash_signatures(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_lsh_pairs",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_lsh_pairs_q(spark, sf_dir):
    """MinHash-LSH candidate pairs: 4 bands × 4 rows, bucket self-join."""
    from sparsity_spark.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_incremental_lsh",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    nb AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
    cb AS (SELECT * FROM bands WHERE doc_id % 10 <> 0),
    hits AS (
      SELECT nb.doc_id, CAST(COUNT(DISTINCT cb.doc_id) AS BIGINT) AS n_corpus_collisions
      FROM nb JOIN cb ON nb.band = cb.band AND nb.band_key = cb.band_key
      GROUP BY nb.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_corpus_collisions, 0) AS n_corpus_collisions,
           (h.doc_id IS NULL) AS keep
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def dedup_incremental_lsh_q(spark, sf_dir):
    """Incremental near-dup screening: every 10th doc arrives as the 'new
    batch' and is deduped against the band TABLE of the other 90% — the
    production shape where the corpus text is never re-read. One band-key
    aggregate on the batch + one bucket equi-join against the store."""
    from sparsity_spark.operators.dedup import band_keys, incremental_lsh_dedup

    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return incremental_lsh_dedup(new_batch, band_keys(corpus))


@query(
    "dedup_band_store_screen",
    # identical semantics to dedup_incremental_lsh — the store is a LAYOUT
    # change (bucketed BY the join key), never a results change
    ORACLES["dedup_incremental_lsh"],
)
def dedup_band_store_screen_q(spark, sf_dir):
    """The same screen routed through the PERSISTED bucketed band store
    (write_band_store → band_store): the corpus side of the screening join
    reads bucket-aligned with NO shuffle (plan-asserted in
    tests/test_plans.py); results are bit-identical to the in-memory band
    table — which is exactly what this oracle row proves."""
    from sparsity_spark.operators.dedup import (
        band_store,
        incremental_lsh_dedup,
        write_band_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    write_band_store(corpus, "band_store_oracle_q", num_buckets=8)
    return incremental_lsh_dedup(new_batch, band_store(spark, "band_store_oracle_q"))


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters_q(spark, sf_dir):
    """Near-dup clusters: LSH candidate pairs → connected components →
    (doc_id, cluster_id = component min). Survivors are
    doc_id == cluster_id; the oracle is a recursive transitive closure."""
    from sparsity_spark.operators.dedup import duplicate_clusters, lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_clusters(lsh_candidate_pairs(docs), docs)


# the full-corpus transitive closure — shared by BOTH incremental-cluster
# rows: the fold must be indistinguishable from recomputing from scratch
_CLUSTER_CLOSURE_ORACLE = f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """


@query("dedup_incremental_clusters", _CLUSTER_CLOSURE_ORACLE)
def dedup_incremental_clusters_q(spark, sf_dir):
    """Incremental cluster maintenance (r9 — the missing capstone of the
    incremental dedup loop: the band store finds each batch's candidate
    PAIRS without rescanning the corpus, but cluster MEMBERSHIP was
    still a full recompute): the 90% corpus is clustered once and
    persisted (doc→cluster bucketed store + empty merge table); the 10%
    batch's pairs then FOLD in — every pair endpoint maps to its current
    cluster id, components run over the batch-sized pseudo-graph of
    {batch docs ∪ touched cluster ids}, new assignments append through
    the bucket spec, and cluster merges (a batch doc bridging two
    existing clusters) land in a compacted remap table applied at read.
    Because stored ids are component minima, the folded store must equal
    the from-scratch closure BIT FOR BIT — which is exactly what this
    oracle (the full-corpus recursive closure) checks. Corpus motion:
    zero rows.

    r11 (guide §2.3 "aggregate before you shuffle" / §1.2 "don't compute
    things you throw away"): the corpus is SHINGLED AND BANDED ONCE. The
    r10 form ran the full LSH pipeline twice — once over the 90% corpus
    for its pairs, once over the full table for the batch increment —
    but a doc's band keys don't depend on any other doc, so
    pairs(corpus) ≡ pairs(docs) filtered to corpus-only endpoints
    (identical band-key collisions either way). One banding pass + one
    self-join now feeds both pair sets from a pair-sized checkpoint;
    results are bit-identical and the same full-closure oracle gates
    them."""
    from sparsity_spark.operators.dedup import (
        duplicate_clusters,
        fold_cluster_store,
        lsh_candidate_pairs,
        resolve_cluster_store,
        write_cluster_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    all_pairs = lsh_candidate_pairs(docs).localCheckpoint(eager=True)
    corpus_pairs = all_pairs.where(
        (F.col("id_a") % 10 != 0) & (F.col("id_b") % 10 != 0)
    )
    corpus_labels = duplicate_clusters(corpus_pairs, corpus)
    write_cluster_store(corpus_labels, "cluster_store_oracle_q")
    # the batch's pair increment: every candidate pair touching a batch
    # doc (what an append_band_store screen of this batch emits)
    batch_pairs = all_pairs.where(
        (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
    )
    fold_cluster_store(
        batch.select("doc_id"), batch_pairs, "cluster_store_oracle_q"
    )
    return resolve_cluster_store(spark, "cluster_store_oracle_q")


# session memo for dedup_cluster_fold_only's one-time setup (the corpus
# clustering + store write + batch-pair screen); keyed by application id
# so a fresh session always rebuilds
_FOLD_SETUP_MEMO: dict = {}


@query("dedup_cluster_fold_only", _CLUSTER_CLOSURE_ORACLE)
def dedup_cluster_fold_only_q(spark, sf_dir):
    """The FOLD alone (r10, VERDICT r9 #5: the 38.5 s
    dedup_incremental_clusters bench row was ~all one-time setup —
    clustering the 90% corpus from scratch and writing the store — which
    buried the operator actually being sold, the batch-sized fold).
    One-time setup (memoized per session: corpus clustering, base store
    write, batch-pair screen persisted to parquet) is excluded from what
    a steady-state invocation executes; each invocation then copies the
    small base store to a scratch table (store-sized, the price of a
    repeatable measurement against an append-mutated table) and runs
    fold + resolve — the recurring per-batch cost of the incremental
    loop. Result is identical to dedup_incremental_clusters, so the same
    full-closure oracle gates it bit-for-bit."""
    from sparsity_spark.operators.dedup import (
        duplicate_clusters,
        fold_cluster_store,
        lsh_candidate_pairs,
        resolve_cluster_store,
        write_cluster_store,
    )
    from sparsity_spark.operators.skew import _drop_table_and_location

    base, pairs_t = "cluster_fold_base", "cluster_fold_base__pairs"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FOLD_SETUP_MEMO:
        docs = load_table(spark, sf_dir, "documents")
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        # one banding pass feeds both pair sets (r11 — the
        # dedup_incremental_clusters restructure; band keys are per-doc,
        # so corpus-only pairs of the full-table join equal the
        # corpus-only join bit for bit)
        all_pairs = lsh_candidate_pairs(docs).localCheckpoint(eager=True)
        corpus_labels = duplicate_clusters(
            all_pairs.where(
                (F.col("id_a") % 10 != 0) & (F.col("id_b") % 10 != 0)
            ),
            corpus,
        )
        write_cluster_store(corpus_labels, base)
        batch_pairs = all_pairs.where(
            (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
        )
        _drop_table_and_location(spark, pairs_t)
        batch_pairs.write.format("parquet").saveAsTable(pairs_t)
        _FOLD_SETUP_MEMO[key] = True
    # --- steady-state portion: scratch copy + fold + resolve ---
    scratch = "cluster_fold_scratch"
    from sparsity_spark.operators.skew import write_bucketed

    write_bucketed(spark.table(base), scratch, ["doc_id"], 16)
    _drop_table_and_location(spark, f"{scratch}__remap")
    spark.table(f"{base}__remap").write.format("parquet").saveAsTable(
        f"{scratch}__remap"
    )
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    fold_cluster_store(batch.select("doc_id"), spark.table(pairs_t), scratch)
    return resolve_cluster_store(spark, scratch)


def _simhash_oracle(bits: int = 32) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(bits)
    )
    terms = " + ".join(
        # bit 63's weight wraps to the two's-complement constant, matching
        # operators.dedup.simhash — arithmetic shift + &1 is sign-safe
        f"(CASE WHEN b{b} >= 0 THEN CAST({(1 << b) if b < 63 else -(1 << 63)} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    if bits <= 32:
        h_expr = "CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)"
    else:
        # (h1 - 2^31)·2^32 + h2: signed 64-bit, built without overflow
        h_expr = (
            "(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) - 2147483648)"
            " * 4294967296 + CAST(('0x' || substring(md5(tok), 9, 8)) AS BIGINT)"
        )
    return f"""
    WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, {h_expr} AS h FROM t),
    s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM s
    """


@query("dedup_simhash", _simhash_oracle(32))
def dedup_simhash_q(spark, sf_dir):
    """SimHash fingerprints: 32 bit-majorities as parallel agg expressions."""
    from sparsity_spark.operators.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_simhash_pairs",
    f"""
    WITH sim AS ({_simhash_oracle(64)})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs_q(spark, sf_dir):
    """Pigeonhole-blocked simhash near-dup pairs: the oracle is the naive
    O(N²) hamming join (fine at sf0.01); the Spark side must return the
    IDENTICAL pair set while only ever equi-joining on 4 exact 16-bit
    (chunk_index, chunk_value) keys per doc — lossless for
    max_hamming ≤ chunks-1, no CartesianProduct at any scale, random
    collisions suppressed by the 64-bit fingerprint (SCALE.md)."""
    from sparsity_spark.operators.dedup import simhash_pairs

    return simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


@query(
    "dedup_ngram_jaccard",
    """
    WITH g AS (
      SELECT doc_id, lang,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.grams, b.grams)) * 1.0
                 / len(list_distinct(a.grams || b.grams)), 6) AS jaccard
    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE ROUND(len(list_intersect(a.grams, b.grams)) * 1.0
                / len(list_distinct(a.grams || b.grams)), 6) >= 0.02
    """,
)
def dedup_ngram_jaccard_q(spark, sf_dir):
    """Exact n-gram Jaccard within language blocks."""
    from sparsity_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.02, block_cols=["lang"]
    )


@query(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) + 0.0 AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.3
    """,
)
def dedup_embedding_cosine_q(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label blocks."""
    from sparsity_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.3)


@query(
    "ann_bruteforce_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine
      FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_bruteforce_topk_q(spark, sf_dir):
    """Brute-force cosine top-5 for 10 query vectors: broadcast queries,
    one corpus pass, rounded-before-rank determinism."""
    from sparsity_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "ann_hard_negatives",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine
      FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored WHERE cosine >= 0.1 AND cosine < 0.8
    ) WHERE rn <= 5
    """,
)
def ann_hard_negatives_q(spark, sf_dir):
    """Hard-negative mining: per query the top-5 neighbors with cosine in
    [0.1, 0.8) — informative negatives just under the near-dup band (a
    near-dup used as a negative is a false label). Broadcast queries,
    round-before-band-and-rank determinism."""
    from sparsity_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=5, lo=0.1, hi=0.8)


@query(
    "ann_ivf_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    asg AS (
      SELECT vec_id, cid, v, nrm FROM (
        SELECT n.vec_id, cent.cid, n.v, n.nrm,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                          cent.cid) AS rn
        FROM n, cent
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT q.vec_id AS query_id, q.cid AS centroid_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine
      FROM asg q JOIN asg c ON q.cid = c.cid AND c.vec_id != q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, centroid_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def ann_ivf_topk_q(spark, sf_dir):
    """IVF-bucketed approximate top-k: assign to nearest of 8 centroids,
    search only the query's bucket — the 100 TB path."""
    from sparsity_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), centroids, k=3)


@query(
    "text_heavy_hitters",
    """
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY df DESC, token
    LIMIT 20
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """Exact top-k tokens by document frequency — the vocabulary-head view a
    pipeline uses for stopword/boilerplate discovery."""
    from sparsity_spark.operators.text import heavy_hitters

    return heavy_hitters(load_table(spark, sf_dir, "documents"), k=20)


@query(
    "emb_grouped_centroids",
    """
    SELECT label, CAST(i - 1 AS INTEGER) AS dim, ROUND(AVG(x), 4) + 0.0 AS mean_val
    FROM (
      SELECT label, embedding[i] AS x, i
      FROM (SELECT label, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
    )
    GROUP BY label, dim
    """,
)
def emb_grouped_centroids(spark, sf_dir):
    """Per-label centroid means in long (label, dim, mean_val) format:
    posexplode + one partial+final hash aggregate — array-native centroid
    (re)training with no UDF and no driver-side vectors."""
    from sparsity_spark.operators.similarity import grouped_centroids

    return grouped_centroids(load_table(spark, sf_dir, "embeddings"))


@query(
    "text_repetition",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    counts AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(w) AS tok FROM base)
      GROUP BY doc_id, tok
    ),
    tops AS (SELECT doc_id, MAX(c) AS top_cnt FROM counts GROUP BY doc_id),
    grams AS (
      SELECT doc_id, w,
             CASE WHEN len(w) >= 2
               THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
               ELSE CAST([] AS VARCHAR[]) END AS g
      FROM base
    )
    SELECT g.doc_id,
           ROUND(1.0 - len(list_distinct(g.w)) / len(g.w), 6) AS dup_token_ratio,
           ROUND(CASE WHEN len(g.g) > 0
                 THEN 1.0 - len(list_distinct(g.g)) / len(g.g) ELSE 0.0 END, 6)
             AS dup_2gram_ratio,
           ROUND(t.top_cnt / len(g.w), 6) AS top_token_frac
    FROM grams g JOIN tops t ON g.doc_id = t.doc_id
    """,
)
def text_repetition(spark, sf_dir):
    """Within-document repetition ratios (Gopher-style quality filters):
    one map-only projection, no shuffle."""
    from sparsity_spark.operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


@query(
    "emb_quantize_int8",
    """
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
           CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0 / s + 0.5) AS INTEGER) AS code,
           ROUND(s, 6) AS scale
    FROM (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    )
    """,
)
def emb_quantize_int8(spark, sf_dir):
    """Scalar int8 quantization of the embedding column — codes must match
    the oracle bit-for-bit (floor(x+1/2), not round: tie-breaking is the
    only engine-dependent step and floor removes it)."""
    from sparsity_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


def _pca_oracle(iters: int = 3, scale: int = 1_000_000, unit: int = 1_000_000) -> str:
    """Integer power-iteration PCA unrolled as HUGEINT CTEs: the same
    floor-quantization as emb_quantize (one shared IEEE multiply), the
    Gram as an exploded self-join (the oracle-side stand-in for the
    engine's one-pass XᵀX kernel), and each rescale as the sign-split
    truncating division both engines evaluate identically on
    non-negative operands."""
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS i,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT) AS x
      FROM (SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
    ),
    g AS (
      SELECT a.i AS gi, b.i AS gj, CAST(SUM(a.x * b.x) AS HUGEINT) AS val
      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2
    ),
    v0 AS (SELECT DISTINCT gi AS i, CAST({unit} AS HUGEINT) AS val FROM g)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""
    w{k} AS (
      SELECT g.gi AS i, SUM(g.val * v.val) AS w
      FROM g JOIN v{k-1} v ON v.i = g.gj GROUP BY 1),
    m{k} AS (SELECT MAX(ABS(w)) AS m FROM w{k}),
    v{k} AS (
      SELECT i, CASE WHEN w < 0 THEN -((-w * {unit}) // m)
                     ELSE (w * {unit}) // m END AS val
      FROM w{k}, m{k})"""
        )
    return ",".join(parts) + f"""
    SELECT e.vec_id, CAST(SUM(e.x * CAST(v.val AS BIGINT)) AS BIGINT) AS score_micro
    FROM e JOIN v{iters} v ON v.i = e.i
    GROUP BY 1
    """


@query("emb_pca_project", _pca_oracle(3))
def emb_pca_project_q(spark, sf_dir):
    """Distributed PCA (r9 — the embedding family's missing whitening /
    ordering primitive): every vector's projection onto the corpus's top
    principal direction, computed as integer Gram (ONE Arrow mapInPandas
    pass, d²-sized partials, the kmeans-partials shape) → driver power
    iteration in unbounded Python ints with HITS-style integer
    max-rescale → map-only zip_with projection at scan speed. Every step
    is exact integer arithmetic, so the oracle replays the entire
    pipeline — quantization, Gram, three iterations, rescales,
    projection — and any drift anywhere flips the hash. The score orders
    vectors along the corpus's dominant axis: curriculum sorting,
    OPQ-style rotation seeding, principal-axis outlier cuts."""
    from sparsity_spark.operators.similarity import pca_top_component_project

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top_component_project(emb, iterations=3)


def _grouped_pca_oracle(iters: int = 3, scale: int = 1_000_000, unit: int = 1_000_000) -> str:
    """Per-label power-iteration PCA: the single-component oracle with
    every CTE keyed by label — per-label Gram, per-label max-rescale,
    per-label projection join."""
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, CAST(label AS BIGINT) AS g, CAST(i - 1 AS INTEGER) AS i,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT) AS x
      FROM (SELECT vec_id, label, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
    ),
    gr AS (
      SELECT a.g, a.i AS gi, b.i AS gj, CAST(SUM(a.x * b.x) AS HUGEINT) AS val
      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2, 3
    ),
    v0 AS (SELECT DISTINCT g, gi AS i, CAST({unit} AS HUGEINT) AS val FROM gr)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""
    w{k} AS (
      SELECT gr.g, gr.gi AS i, SUM(gr.val * v.val) AS w
      FROM gr JOIN v{k-1} v ON v.g = gr.g AND v.i = gr.gj GROUP BY 1, 2),
    m{k} AS (SELECT g, MAX(ABS(w)) AS m FROM w{k} GROUP BY 1),
    v{k} AS (
      SELECT w.g, w.i, CASE WHEN w < 0 THEN -((-w * {unit}) // m)
                            ELSE (w * {unit}) // m END AS val
      FROM w{k} w JOIN m{k} USING (g))"""
        )
    return ",".join(parts) + f"""
    SELECT e.vec_id, e.g AS label,
           CAST(SUM(e.x * CAST(v.val AS BIGINT)) AS BIGINT) AS score_micro
    FROM e JOIN v{iters} v ON v.g = e.g AND v.i = e.i
    GROUP BY 1, 2
    """


@query("emb_grouped_pca_project", _grouped_pca_oracle(3))
def emb_grouped_pca_project_q(spark, sf_dir):
    """Per-group PCA (r9): each label's OWN principal direction from one
    grouped integer-moments pass (groups·d² partial rows — metadata),
    per-group driver power iterations, then every vector projects onto
    its group's axis via ONE broadcast join + the zip_with fold — the
    per-domain whitening/curriculum primitive (a shared global axis
    washes out when sources have different dominant directions). Every
    group's quantization, Gram, rescales, and projection replay as
    label-keyed CTEs."""
    from sparsity_spark.operators.similarity import grouped_pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    return grouped_pca_project(emb, group_col="label", iterations=3)


@query(
    "emb_corr_matrix",
    """
    WITH e AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS i,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM (SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
    ),
    mom AS (
      SELECT i, CAST(SUM(x) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
      FROM e GROUP BY i
    ),
    g AS (
      SELECT a.i AS gi, b.i AS gj, CAST(SUM(a.x * b.x) AS HUGEINT) AS gv
      FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2
    ),
    v AS (
      SELECT g.gi AS i, m.n * g.gv - m.s * m.s AS var, m.s, m.n
      FROM g JOIN mom m ON m.i = g.gi WHERE g.gi = g.gj
    )
    SELECT a.i, b.i AS j,
           ROUND(CAST(a.n * g.gv - a.s * b.s AS DOUBLE)
                 / sqrt(CAST(a.var AS DOUBLE) * CAST(b.var AS DOUBLE)), 6) + 0.0 AS corr6
    FROM g JOIN v a ON a.i = g.gi JOIN v b ON b.i = g.gj
    WHERE g.gi < g.gj AND a.var > 0 AND b.var > 0
    """,
)
def emb_corr_matrix_q(spark, sf_dir):
    """Dimension-correlation matrix (r9): Pearson corr between every
    embedding-dimension pair from ONE Arrow moments pass (integer Gram +
    sums + count — the pca kernel extended), the d²-sized matrix
    assembled driver-side with exact integer numerators and a single
    IEEE divide+sqrt rounded half-away-from-zero to 6 dp. The redundancy
    screen a feature pipeline runs before distance-heavy work; at 100 TB
    the corpus cost is exactly one scan. The oracle replays quantization,
    moments, and the float finish — drift anywhere flips the hash."""
    from sparsity_spark.operators.similarity import corr_matrix

    return corr_matrix(load_table(spark, sf_dir, "embeddings"))


@query(
    "pipe_merge_upsert",
    """
    WITH updates AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment,
             ROUND(c_acctbal + 1000, 4) AS c_acctbal, c_nationkey
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END
             AS c_mktsegment,
           ROUND(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END, 4)
             AS c_acctbal
    FROM customer b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
    """,
)
def pipe_merge_upsert(spark, sf_dir):
    """MERGE INTO shape: every 10th customer gets a whole-row update; the
    merged snapshot must equal the oracle's full-outer-join formulation."""
    from sparsity_spark.operators.pipeline import merge_upsert

    base = load_table(spark, sf_dir, "customer")
    updates = base.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.lit("UPDATED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + 1000, 4).alias("c_acctbal"),
        "c_nationkey",
    )
    merged = merge_upsert(base, updates, key_cols=["c_custkey"])
    return merged.select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 4).alias("c_acctbal")
    )


@query(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS re_tokens,
           CAST(len(list_distinct(w)) AS INTEGER) AS distinct_tokens,
           ROUND(len(list_distinct(w)) * 1.0 / len(w), 6) AS type_token_ratio,
           ROUND(list_sum(list_transform(w, t -> length(t))) * 1.0 / len(w), 6) AS avg_token_len
    FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    """,
)
def text_token_stats_q(spark, sf_dir):
    """Token counting: whitespace + regex segmentation, TTR, mean length."""
    from sparsity_spark.operators.text import token_stats

    return token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality",
    """
    WITH base AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n,
             CAST(length(text) AS BIGINT) AS tc,
             CAST(len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS BIGINT) AS sc,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS ac
      FROM base
    )
    SELECT doc_id, CAST(n AS INTEGER) AS n_tokens, CAST(tc AS INTEGER) AS n_chars,
           CASE WHEN n > 0 THEN CAST((2 * sc * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000 END AS stopword_ratio,
           CASE WHEN tc > 0 THEN CAST((2 * ac * 1000000 + tc) // (2 * tc) AS DOUBLE) / 1000000 END AS alpha_ratio,
           CASE WHEN tc > 0 THEN CAST((least(n, 100) * (1000000 + (2 * ac * 1000000 + tc) // (2 * tc)) + 100) // 200 AS DOUBLE) / 1000000 END AS quality
    FROM m
    """,
)
def text_quality_q(spark, sf_dir):
    """Quality scoring: C4/Gopher-style cheap filters as one projection.
    r10: every ratio and the composite are integer-exact half-up micros
    (pure BIGINT div on both engines — the sf0.1 strict sweep caught the
    old ROUND(double) finish landing on an exact …5·10⁻⁷ tie, where
    Spark's BigDecimal HALF_UP and DuckDB's float ROUND split)."""
    from sparsity_spark.operators.text import quality_score

    return quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "pipe_quality_percentile_gate",
    """
    WITH base AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             CAST(length(text) AS BIGINT) AS tc,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS ac
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
             CAST((least(n, 100) * (1000000 + (2 * ac * 1000000 + tc) // (2 * tc)) + 100) // 200 AS DOUBLE) / 1000000 AS quality
      FROM base WHERE tc > 0
    ),
    c AS (SELECT lang, quantile_cont(quality, 0.5) AS cut FROM s GROUP BY 1)
    SELECT s.doc_id, s.lang, s.quality, s.quality >= c.cut AS kept
    FROM s JOIN c USING (lang)
    """,
)
def pipe_quality_percentile_gate_q(spark, sf_dir):
    """Per-language quality median gate (r8 composition): every document
    scored by the cheap composite, then kept iff at/above ITS LANGUAGE'S
    exact median — the standard within-group curation cut that a single
    global threshold gets wrong (languages with shorter average docs
    would be wiped out). percentile ≡ quantile_cont, scores round-6
    quantized, q=0.5 cutoffs land on data points or midpoints — the kept
    flag is engine-exact by construction (analysis in percentile_gate's
    docstring)."""
    from sparsity_spark.operators.pipeline import percentile_gate
    from sparsity_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = (
        quality_score(docs)
        .select("doc_id", "quality")
        # empty texts score NULL quality; the oracle's WHERE tc > 0
        # drops them before the gate, so drop them here too (r11,
        # advisor finding — a latent row-count mismatch on any fixture
        # with an empty text, and a NULL would poison the median cut)
        .where(F.col("quality").isNotNull())
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return percentile_gate(scored, "lang", "quality", q=0.5)


def _lang_id_oracle() -> str:
    from sparsity_spark.operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_exprs = ", ".join(
        "CAST(len(list_filter(w, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"], t))) AS INTEGER) AS score_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    whens = " ".join(f"WHEN score_{l} = {greatest} THEN '{l}'" for l in langs)
    return f"""
    WITH s AS (
      SELECT doc_id, {score_exprs}
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
    SELECT doc_id,
           CASE WHEN {greatest} = 0 THEN 'und' {whens} END AS pred_lang,
           CAST({greatest} AS INTEGER) AS marker_hits
    FROM s
    """


@query("text_lang_id", _lang_id_oracle())
def text_lang_id_q(spark, sf_dir):
    """Lexicon language-ID heuristic, ties to alphabetically-first language."""
    from sparsity_spark.operators.text import lang_id

    return lang_id(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "pred_lang", "marker_hits"
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_md5,
           md5(substring(text, 1, 64) ||
               substring(text, greatest(length(text) - 63, 1), 64)) AS edge_md5,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def text_fingerprint_q(spark, sf_dir):
    """Document fingerprints: content, bag-of-tokens, head/tail edges."""
    from sparsity_spark.operators.text import fingerprint

    return fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) AS chunk_count,
           upper(substring(hex(encode(text)), 1, 16)) AS head_hex
    FROM documents
    """,
)
def multimodal_meta_q(spark, sf_dir):
    """Binary-asset plumbing: byte length, chunk accounting, head bytes."""
    from sparsity_spark.operators.multimodal import binary_meta

    return binary_meta(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_frames",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           md5(encode(text) || ':' || CAST(i AS VARCHAR)) AS frame_md5
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(ceil(octet_length(encode(text)) / 64.0) AS INTEGER) - 1, 4)) AS i
      FROM documents
    )
    """,
)
def multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing: JVM-side stride explode over metadata frame
    counts, Arrow-batched per-frame 'decode' (deterministic fake at the
    codec seam) — the oracle reproduces the fake byte-for-byte."""
    from sparsity_spark.operators.multimodal import as_binary_assets, frame_sample

    assets = as_binary_assets(load_table(spark, sf_dir, "documents"))
    return frame_sample(assets, every_k=4, fake=True)


@query(
    "multimodal_resize",
    """
    SELECT doc_id, 64 AS width, 64 AS height,
           md5(encode(text) || ':64x64') AS thumb_md5,
           CAST(3 * 64 * 64 AS BIGINT) AS out_bytes
    FROM documents
    """,
)
def multimodal_resize(spark, sf_dir):
    """Image-resize plumbing (Arrow-batched, codec stubbed): the oracle
    reproduces the deterministic fake byte-for-byte."""
    from sparsity_spark.operators.multimodal import as_binary_assets, resize_images

    assets = as_binary_assets(load_table(spark, sf_dir, "documents"))
    return resize_images(assets, width=64, height=64, fake=True)


@query(
    "t5_gap_fill_daily",
    """
    WITH days AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                         INTERVAL 1 DAY)) AS DATE) AS day
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    counts AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT u.user_id, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM users u
    CROSS JOIN days d
    LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = d.day
    """,
)
def t5_gap_fill_daily(spark, sf_dir):
    """Time-series gap fill: dense per-user daily grid with zero-filled
    days — generated calendar axis, |users|·|days| output, one counting
    pass over the events."""
    from sparsity_spark.operators.temporal import gap_fill_daily_counts

    return gap_fill_daily_counts(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------- #
# Coverage batch 2: scalar stats, concat, sort, positional, UDF, I/O    #
# --------------------------------------------------------------------- #


@query(
    "a5_minmax",
    """
    SELECT GREATEST(MAX(value), 0.0) AS max_value, LEAST(MIN(value), 0.0) AS min_value
    FROM events
    """,
)
def a5_minmax(spark, sf_dir):
    """SURVEY §2.4 A5 (reference sparse_frame.py:152-156): matrix max/min
    where implicit zeros participate — one lazy plan, no collect."""
    events = load_table(spark, sf_dir, "events")
    cells = events.select("event_id", F.col("event_type").alias(COL), F.col("value").alias(VAL))
    sf = SparseFrame(cells, ["event_id"], EVENT_TYPES)
    return sf.minmax_df()


@query(
    "j6_concat",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def j6_concat(spark, sf_dir):
    """SURVEY §2.3 J6 (reference sparse_frame.py:394-398): fold-concat of
    three user_id%3 slices along axis=0 reassembles the full frame."""
    events = load_table(spark, sf_dir, "events")
    parts = []
    for m in range(3):
        sub = events.filter(F.col("user_id") % 3 == m)
        parts.append(
            sparse_one_hot(sub, "event_type", EVENT_TYPES, index_col="user_id").groupby_sum(
                by="user_id"
            )
        )
    return SparseFrame.concat(parts, axis=0).data


@query(
    "o1_sort_index",
    """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS BIGINT) AS pos,
           user_id, ROUND(SUM(value), 4) AS total
    FROM events GROUP BY user_id
    """,
)
def o1_sort_index(spark, sf_dir):
    """SURVEY §2.5 O1 (reference sparse_frame.py:306-317): sort_index —
    emitted with explicit rank so sortedness is hash-visible. Rank comes
    from the distributed range-sort + partition-offset numbering
    (util.zip_with_position), not a single-task global window."""
    from sparsity_spark.util import zip_with_position

    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("user_id").agg(F.round(F.sum("value"), 4).alias("total"))
    return zip_with_position(totals, ["user_id"], "pos").select("pos", "user_id", "total")


@query(
    "p3_iloc_slice",
    """
    SELECT event_id, event_type AS col, 1.0 AS value FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS pos
      FROM events
    ) WHERE pos >= 100 AND pos < 110
    """,
)
def p3_iloc_slice(spark, sf_dir):
    """SURVEY §2.2 P2/P3 (reference indexing.py:13-21): positional slice —
    positions from the distributed numbering (util.zip_with_position), so
    even the demo query has no single-task global window."""
    from sparsity_spark.util import zip_with_position

    events = load_table(spark, sf_dir, "events")
    return (
        zip_with_position(events, ["event_id"], "pos")
        .filter((F.col("pos") >= 100) & (F.col("pos") < 110))
        .select("event_id", F.col("event_type").alias(COL), F.lit(1.0).alias(VAL))
    )


@query(
    "f1_map_partitions",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) * 2 AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def f1_map_partitions(spark, sf_dir):
    """SURVEY §2.11 F1 (reference dask/core.py:113-123): arbitrary pandas
    function per partition via Arrow-batched mapInPandas."""
    frame = _user_counts_frame(spark, sf_dir)
    val_col = VAL  # captured by value: the pickled closure must not
    # reference this module's globals (executors may not have it importable)

    def double(pdf):
        pdf = pdf.copy()
        pdf[val_col] = pdf[val_col] * 2
        return pdf

    return frame.map_partitions(double).data


@query(
    "s2_parquet_roundtrip",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def s2_parquet_roundtrip(spark, sf_dir):
    """SURVEY §2.1 S2/S7 (reference io.py:26-47, dask/io.py:51-86): persist a
    frame as range-partitioned parquet (sorted files ≙ divisions) and read it
    back — long-format round trip preserves everything."""
    import tempfile

    from sparsity_spark.io import read_parquet_frame, write_parquet_frame

    frame = _user_counts_frame(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="sparsity_rt_") + "/frame"
    write_parquet_frame(frame, path)
    back = read_parquet_frame(spark, path, key_cols=["user_id"])
    return back.data


@query(
    "s3_traildb_binary",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(floor(epoch(ts))) AS BIGINT) AS min_ts,
           CAST(MAX(floor(epoch(ts))) AS BIGINT) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def s3_traildb_binary(spark, sf_dir):
    """SURVEY §2.1 S3, binary-container form (reference _traildb.pyx:17-44
    + traildb_coo.c:12-115): events → SHARDED ``.tdb`` containers written
    by the DISTRIBUTED writer (each partition emits a complete tar
    container for its hash of the trail space; the driver sees only the
    manifest — VERDICT r5 #7 removed the fixture's corpus-sized collect)
    → pure-Python distributed decode → per-type rollup."""
    import tempfile

    from sparsity_spark.traildb import traildb_event_table, write_tdb_sharded

    events = load_table(spark, sf_dir, "events")
    src = events.select(
        F.col("user_id").alias("uuid"),
        F.floor(F.unix_micros("ts") / 1_000_000).cast("long").alias("ts"),
        "event_type",
        "event_id",
    )
    path = tempfile.mkdtemp(prefix="sparsity_tdb_") + "/events_tdb"
    write_tdb_sharded(
        src, path, field_cols=["event_type"], order_col="event_id", num_shards=8
    )
    back = traildb_event_table(spark, path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "s7_jsonl_roundtrip",
    """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_md5_sum
    FROM documents GROUP BY 1, 2
    """,
)
def s7_jsonl_roundtrip(spark, sf_dir):
    """JSONL source/sink round trip (r7): the documents table — including
    text with JSON-escapable content — is written as line-delimited JSON
    shards and read back with an EXPLICIT schema (no inference scan),
    then aggregated. The oracle reads the ORIGINAL parquet, so any
    escaping/encoding/row-splitting defect in the round trip breaks the
    per-group md5 content sums, not just counts. The json source is
    line-splittable, so this on-ramp fans out at lake scale."""
    import tempfile

    from sparsity_spark.io import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="sparsity_jsonl_") + "/docs"
    write_jsonl(docs.select("doc_id", "text", "lang", "source", "n_chars"), path)
    back = read_jsonl(
        spark,
        path,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
        ).alias("text_md5_sum"),
    )


@query(
    "s8_orc_roundtrip",
    """
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_md5_sum
    FROM documents GROUP BY 1, 2
    """,
)
def s8_orc_roundtrip(spark, sf_dir):
    """ORC source/sink round trip (r7): documents → native vectorized ORC
    writer → ORC reader → the same per-group md5 content sums as the
    JSONL row, against the oracle's read of the ORIGINAL parquet — the
    second columnar interchange format, with parquet-equivalent pushdown
    (stripe stats prune like footers)."""
    import tempfile

    from sparsity_spark.io import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="sparsity_orc_") + "/docs"
    write_orc(docs.select("doc_id", "text", "lang", "source", "n_chars"), path)
    back = read_orc(spark, path)
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
        ).alias("text_md5_sum"),
    )


@query(
    "src_csv_events",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def src_csv_events(spark, sf_dir):
    """CSV source (SURVEY §2.1 breadth beyond the reference's npz/traildb):
    events → CSV → schema-applied read (no inference pass) → the flagship
    one-hot aggregate. Lossless round trip ⇒ same result as the parquet
    path the oracle aggregates."""
    import tempfile

    from sparsity_spark.data import load_events_csv, write_events_text

    path = tempfile.mkdtemp(prefix="sparsity_csv_") + "/events"
    write_events_text(load_table(spark, sf_dir, "events"), path, fmt="csv")
    ev = load_events_csv(spark, path)
    sf = read_events(ev, "event_type", uuid_col="user_id", ts_col="ts", order_col="event_id")
    return sf.groupby_sum(by="user_id").data


@query(
    "src_orc_events",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def src_orc_events(spark, sf_dir):
    """ORC source/sink (columnar alternative to parquet, native in Spark —
    same predicate-pushdown/column-pruning machinery): events → ORC →
    read → flagship one-hot aggregate; lossless round trip ⇒ same result
    as the parquet path the oracle aggregates."""
    import tempfile

    path = tempfile.mkdtemp(prefix="sparsity_orc_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").orc(path)
    ev = spark.read.orc(path)
    sf = read_events(ev, "event_type", uuid_col="user_id", ts_col="ts", order_col="event_id")
    return sf.groupby_sum(by="user_id").data


@query(
    "src_json_events",
    """
    SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY user_id, event_type
    """,
)
def src_json_events(spark, sf_dir):
    """JSON-lines source, same lossless-round-trip contract as CSV."""
    import tempfile

    from sparsity_spark.data import load_events_json, write_events_text

    path = tempfile.mkdtemp(prefix="sparsity_json_") + "/events"
    write_events_text(load_table(spark, sf_dir, "events"), path, fmt="json")
    ev = load_events_json(spark, path)
    sf = read_events(ev, "event_type", uuid_col="user_id", ts_col="ts", order_col="event_id")
    return sf.groupby_sum(by="user_id").data


@query(
    "sink_partitioned_day",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY 1
    """,
)
def sink_partitioned_day(spark, sf_dir):
    """Day-partitioned parquet sink round trip: the date filter on the read
    side prunes to 7 of the day=... directories (PartitionFilters — asserted
    in test_plans), so the scan cost is proportional to the window, not the
    table."""
    import tempfile

    from sparsity_spark.data import load_events_partitioned, write_events_partitioned

    path = tempfile.mkdtemp(prefix="sparsity_part_") + "/events"
    write_events_partitioned(load_table(spark, sf_dir, "events"), path)
    ev = load_events_partitioned(spark, path)
    return (
        ev.filter(
            (F.col("day") >= "2024-01-08") & (F.col("day") < "2024-01-15")
        )
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "skew_salted_join",
    """
    SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def skew_salted_join(spark, sf_dir):
    """Explicitly salted fact⋈dim join (for the too-big-to-broadcast,
    too-hot-for-one-reducer regime): must produce exactly the plain join's
    aggregate."""
    from sparsity_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, on="user_id", num_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "skew_bloom_semijoin",
    """
    SELECT l.l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    )
    GROUP BY 1
    """,
)
def skew_bloom_semijoin_q(spark, sf_dir):
    """Bloom-prefiltered exact semi-join (r7): the build side (urgent
    big-ticket orders) collapses to a driver-held 16 KiB bitmap; the
    lineitem side is screened map-side by the pure-expression membership
    test (no exchange, no Python) before the precise left-semi join runs
    on the survivors. The oracle is the PLAIN semi-join — the bloom has
    no false negatives and the exact join removes its false positives, so
    any bitmap/probe defect that drops or leaks a row breaks the hash.
    Money math follows the integer-cents discipline (exact BIGINT sums,
    never a double summation boundary)."""
    from sparsity_spark.operators.skew import bloom_semijoin

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    matched = bloom_semijoin(li, orders, "l_orderkey", "o_orderkey")
    return matched.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )


@query(
    "skew_bloom_store_semijoin",
    """
    SELECT l.l_returnflag AS returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    )
    GROUP BY 1
    """,
)
def skew_bloom_store_semijoin_q(spark, sf_dir):
    """Persisted bloom store + maintenance loop (r8 — the membership
    member of the persisted-sketch family next to CMS counts and HLL
    distincts): the urgent big-ticket build side lands in the store in
    TWO increments (write even orderkeys, merge odd), the second
    increment is REPLAYED (byte-wise OR is idempotent — at-least-once
    safe), then lineitem is screened map-side by the store's bitmap and
    the exact semi-join removes false positives. The oracle is the plain
    semi-join: a dropped or leaked row anywhere in rows→bytes→probe→
    merge breaks the hash. Integer-cents money math throughout."""
    from sparsity_spark.operators.skew import (
        bloom_probe_expr,
        bloom_store_bytes,
        merge_bloom_store,
        write_bloom_store,
    )

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    tbl = "bloom_store_semijoin_q"
    write_bloom_store(urgent.filter(F.col("o_orderkey") % 2 == 0), tbl, "o_orderkey")
    odd = urgent.filter(F.col("o_orderkey") % 2 == 1)
    merge_bloom_store(odd, tbl, "o_orderkey")
    merge_bloom_store(odd, tbl, "o_orderkey")  # replay — must be a no-op
    bitmap = bloom_store_bytes(spark, tbl)
    pre = li.filter(bloom_probe_expr(F.col("l_orderkey"), bitmap))
    matched = pre.join(
        urgent.select("o_orderkey"), pre.l_orderkey == F.col("o_orderkey"), "leftsemi"
    )
    return matched.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents"),
    )


@query(
    "s6_from_pandas",
    """
    SELECT n_nationkey AS idx, 'n_regionkey' AS col, CAST(n_regionkey AS DOUBLE) AS value
    FROM nation WHERE n_regionkey != 0
    """,
)
def s6_from_pandas(spark, sf_dir):
    """SURVEY §2.1 S1/S6 (reference sparse_frame.py:47-100, dask/io.py:15-48):
    driver-side pandas ingest; zero cells become implicit (dropped), which
    the oracle must mirror."""
    from sparsity_spark.io import from_pandas

    nation = load_table(spark, sf_dir, "nation").toPandas()
    pdf = nation.set_index("n_nationkey")[["n_regionkey"]].astype("float64")
    pdf.index.name = "idx"
    sf = from_pandas(spark, pdf)
    return sf.data.select("idx", COL, VAL)


@query(
    "stream_windowed_counts",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark, sf_dir):
    """SURVEY §2.10 (the reference has NO streaming; this is the Structured
    Streaming extension): full streaming round trip — file-source readStream
    → watermarked tumbling-window aggregate → availableNow trigger → memory
    sink — must equal the batch groupBy the oracle computes."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import stream_events, streaming_one_hot_counts

    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    name = "swc_" + uuid.uuid4().hex[:8]
    q = (
        streaming_one_hot_counts(stream_events(spark, src), "1 day", "2 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT date_format(window_start, 'yyyy-MM-dd') AS day, col, value FROM {name}"
    )


@query(
    "stream_session_stats",
    # The stateful operator is a per-user running accumulator; after an
    # availableNow run has drained the source, the LATEST update per user
    # (max_by on n_events below) is exactly the batch per-user rollup —
    # so the final output IS SQL-expressible even though the cross-batch
    # state transitions are not.
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_session_stats(spark, sf_dir):
    """Custom stateful streaming operator round trip: per-user accumulator
    via applyInPandasWithState (update mode), availableNow trigger. The
    oracle checks the drained end-state (per-user count/sum); the
    cross-batch state transitions themselves are pinned by the batch-parity
    test in tests/test_streaming.py."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import stream_events, streaming_session_stats

    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    name = "sss_" + uuid.uuid4().hex[:8]
    q = (
        streaming_session_stats(stream_events(spark, src))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT user_id, max_by(n_events, n_events) AS n_events,"
        f" max_by(total_value, n_events) AS total_value FROM {name} GROUP BY user_id"
    )


@query(
    "stream_enriched_counts",
    """
    SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
           c.c_mktsegment AS segment,
           CAST(COUNT(*) AS DOUBLE) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_enriched_counts(spark, sf_dir):
    """Stream-static enrichment round trip: readStream facts × static
    customer dimension (broadcast per micro-batch) → windowed rollup per
    market segment → memory sink. Must equal the batch join+groupBy the
    oracle computes."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import stream_events, streaming_enriched_counts

    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    dim = load_table(spark, sf_dir, "customer")
    name = "sec_" + uuid.uuid4().hex[:8]
    q = (
        streaming_enriched_counts(stream_events(spark, src), dim)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT date_format(window_start, 'yyyy-MM-dd') AS day, segment,"
        f" n_events, total_value FROM {name}"
    )


# --------------------------------------------------------------------- #
# Temporal extensions: as-of join, range join, hypertable rollup        #
# --------------------------------------------------------------------- #


@query(
    "t1_asof_join",
    """
    SELECT v.event_id, v.user_id, p.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def t1_asof_join(spark, sf_dir):
    """As-of join (backward): each view event gets the most recent
    at-or-before purchase value per user. Union/sort/last_value technique —
    one shuffle+sort, no range predicate in any join."""
    from sparsity_spark.operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return asof_join(views, purchases, on="ts", by=["user_id"]).select(
        "event_id", "user_id", "asof_value"
    )


@query(
    "t2_range_join",
    """
    SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= CAST(3600 AS BIGINT) * 1000000
     AND a.event_id != b.event_id
    GROUP BY a.user_id
    """,
)
def t2_range_join(spark, sf_dir):
    """Range join: events of the same user within one hour — bucketized
    equi-join (bucket + neighbor-bucket fan-out) instead of a theta join."""
    from sparsity_spark.operators.temporal import range_join_pairs

    events = load_table(spark, sf_dir, "events")
    pairs = range_join_pairs(events, max_gap_seconds=3600)
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@query(
    "t3_time_rollup",
    """
    SELECT COALESCE(CAST(year AS VARCHAR), 'ALL') AS year,
           COALESCE(CAST(month AS VARCHAR), 'ALL') AS month,
           COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
           ROUND(SUM(value), 4) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day, value FROM events
    )
    GROUP BY ROLLUP(year, month, day)
    """,
)
def t3_time_rollup(spark, sf_dir):
    """Hypertable rollup: year/month/day grouping sets in one pass."""
    from sparsity_spark.operators.temporal import time_rollup

    return time_rollup(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------- #
# Set ops / transpose / selective-scan extensions                       #
# --------------------------------------------------------------------- #


@query(
    "stats_ab_conversion_z",
    """
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day, user_id AS u,
             user_id % 2 = 0 AS is_a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    per_user AS (
      SELECT day, u, is_a, MAX(conv) AS converted FROM base GROUP BY 1, 2, 3
    ),
    per_cohort AS (
      SELECT day, is_a, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS x
      FROM per_user GROUP BY 1, 2
    ),
    j AS (
      SELECT a.day, a.n AS n_a, b.n AS n_b, a.x AS conv_a, b.x AS conv_b
      FROM per_cohort a JOIN per_cohort b ON a.day = b.day
      WHERE a.is_a AND NOT b.is_a
        AND a.x + b.x > 0 AND a.x + b.x < a.n + b.n
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_a, n_b, conv_a, conv_b,
           ROUND(conv_a / n_a, 6) AS p_a,
           ROUND(conv_b / n_b, 6) AS p_b,
           ROUND((conv_a / n_a - conv_b / n_b)
                 / sqrt(((conv_a + conv_b) / (n_a + n_b))
                        * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0 AS z
    FROM j
    """,
)
def stats_ab_conversion_z_q(spark, sf_dir):
    """Daily two-proportion A/B z-scores (r9): parity cohorts, purchase
    conversion, exact BIGINT counts with a fixed IEEE finish (divides,
    multiplies, ONE correctly-rounded sqrt — no transcendental), round-6.
    Two hash aggregates + one day-keyed join of day-sized aggregates."""
    from sparsity_spark.operators.pipeline import ab_conversion_z

    return ab_conversion_z(load_table(spark, sf_dir, "events"))


@query(
    "t7_mad_outlier_days",
    """
    WITH daily AS (
      SELECT event_type AS key, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT key, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
    dev AS (
      SELECT d.key, d.day, d.n, m.med, ABS(d.n - m.med) AS adev
      FROM daily d JOIN med m ON m.key = d.key
    ),
    mad AS (SELECT key, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT v.key, v.day, v.n,
           ROUND(v.med, 6) AS med, ROUND(a.mad, 6) AS mad,
           ROUND(v.adev / a.mad, 6) AS score,
           ROUND(v.adev / a.mad, 6) >= 3.0 AS is_outlier
    FROM dev v JOIN mad a ON a.key = v.key
    WHERE a.mad > 0
    """,
)
def t7_mad_outlier_days_q(spark, sf_dir):
    """Robust daily volume outliers (r9): median/MAD per event_type — the
    mean/stddev z-score is dragged by the outliers it hunts; MAD is the
    robust scale. Exact interpolated percentiles (the percentile-gate
    parity), one IEEE divide rounded to 6 BEFORE thresholding, zero-MAD
    constant series excluded. One corpus pass; everything after is
    day-table-sized."""
    from sparsity_spark.operators.temporal import mad_outlier_days

    return mad_outlier_days(load_table(spark, sf_dir, "events"))


@query(
    "pipe_rfm_segments",
    """
    WITH base AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value AS v FROM events
    ),
    per_user AS (
      SELECT user_id, MAX(d) AS last_d, CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(v), 4) AS monetary
      FROM base GROUP BY 1
    ),
    mx AS (SELECT MAX(d) AS max_d FROM base),
    r AS (
      SELECT user_id, CAST(date_diff('day', last_d, mx.max_d) AS BIGINT) AS recency_days,
             frequency, monetary
      FROM per_user CROSS JOIN mx
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY recency_days, user_id) AS INTEGER) AS r_q,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS INTEGER) AS f_q,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER) AS m_q,
           CAST(NTILE(4) OVER (ORDER BY recency_days, user_id) AS VARCHAR)
             || CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
             || CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS VARCHAR) AS segment
    FROM r
    """,
)
def pipe_rfm_segments_q(spark, sf_dir):
    """RFM quartile segmentation (r9): exact integer recency/frequency and
    round-4 monetary, each ntile'd over a TOTAL order (metric, then
    user_id — the unique tie-break that makes every bucket edge
    engine-exact). One corpus aggregate; windows run over the user-sized
    table, with the pack_sequences loud-failure guard above 10^7
    entities."""
    from sparsity_spark.operators.pipeline import rfm_segments

    return rfm_segments(load_table(spark, sf_dir, "events"))


@query(
    "t6_ohlc_store",
    """
    SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
           arg_min(value, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def t6_ohlc_store_q(spark, sf_dir):
    """Maintained OHLC store (r9): the event stream split into three
    micro-batch increments folded via merge_ohlc_store — batch 1 folded
    TWICE so the replay screen fires in the serving path — then the
    merged view read back. The oracle is the ONE-SHOT OHLC over all
    events: mergeable partial state (order-id-anchored open/close,
    least/greatest/sum) must reproduce it exactly."""
    from sparsity_spark.operators.temporal import merge_ohlc_store, read_ohlc_store

    events = load_table(spark, sf_dir, "events")
    table = "ohlc_store_oracle_q"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    for b in range(3):
        merge_ohlc_store(
            events.where(F.col("event_id") % 3 == b), table, batch_id=b
        )
    merge_ohlc_store(  # replay — must fold nothing
        events.where(F.col("event_id") % 3 == 1), table, batch_id=1
    )
    return read_ohlc_store(spark, table)


@query(
    "t6_ohlc_resample",
    """
    SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
           arg_min(value, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def t6_ohlc_resample_q(spark, sf_dir):
    """OHLC hourly resampling (r9): open/close picked by the UNIQUE
    event_id (a ts-ordered first/last is nondeterministic when events
    share a timestamp — the sequence column makes both engines pick
    identical rows); high/low/count order-free. ONE partial+final hash
    aggregate — min_by/max_by combine map-side, so the plan is a plain
    single-shuffle groupBy at any scale."""
    from sparsity_spark.operators.temporal import ohlc_resample

    return ohlc_resample(load_table(spark, sf_dir, "events"))


@query(
    "u3_intersect_except",
    """
    WITH counts AS (
      SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY user_id, event_type
    ),
    spenders AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
    SELECT c.user_id, c.col, c.value, 'both' AS side FROM counts c
      WHERE c.user_id IN (SELECT user_id FROM spenders)
    UNION ALL
    SELECT c.user_id, c.col, c.value, 'only_left' AS side FROM counts c
      WHERE c.user_id NOT IN (SELECT user_id FROM spenders)
    """,
)
def u3_intersect_except(spark, sf_dir):
    """SURVEY §2.6 (absent in reference): INTERSECT/EXCEPT on the index via
    semi/anti joins — tagged union proves the two partitions are disjoint
    and complete."""
    counts = _user_counts_frame(spark, sf_dir)
    spend = _spend_frame(spark, sf_dir)
    both = counts.intersect_index(spend).data.withColumn("side", F.lit("both"))
    left_only = counts.except_index(spend).data.withColumn("side", F.lit("only_left"))
    return both.unionByName(left_only)


@query(
    "r3_transpose",
    """
    SELECT event_type AS etype, CAST(user_id AS VARCHAR) AS col,
           CAST(COUNT(*) AS DOUBLE) AS value
    FROM events GROUP BY event_type, user_id
    """,
)
def r3_transpose(spark, sf_dir):
    """SURVEY §2.7 (generic transpose absent in reference): in long format a
    single-key transpose is a zero-shuffle column swap."""
    frame = _user_counts_frame(spark, sf_dir)
    return frame.transpose(key_as_col="etype").data


@query(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pushdown showcase — every predicate reaches the
    scan, result is a single-row aggregate with no shuffle beyond final."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "s1_melt_numeric",
    """
    SELECT s_suppkey, col, value FROM (
      SELECT s_suppkey, 's_acctbal' AS col, CAST(s_acctbal AS DOUBLE) AS value FROM supplier
      UNION ALL
      SELECT s_suppkey, 's_nationkey' AS col, CAST(s_nationkey AS DOUBLE) AS value FROM supplier
    ) WHERE value IS NOT NULL AND value != 0.0
    """,
)
def s1_melt_numeric(spark, sf_dir):
    """SURVEY §2.1 S1 distributed ingest: melt numeric columns of an
    ordinary table into a SparseFrame via the built-in stack() expression —
    zero cells become implicit."""
    from sparsity_spark.io import melt_numeric

    supplier = load_table(spark, sf_dir, "supplier")
    sf = melt_numeric(supplier, ["s_suppkey"], ["s_acctbal", "s_nationkey"])
    return sf.data


@query(
    "skew_distinct_count",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def skew_distinct_count(spark, sf_dir):
    """Skew-safe exact distinct count: value-hash salting spreads any hot
    key across reducers; per-salt distinct counts are additive because the
    salt partitions the value space."""
    from sparsity_spark.operators.skew import distinct_count_skew_safe

    events = load_table(spark, sf_dir, "events")
    return distinct_count_skew_safe(events, ["event_type"], "user_id", num_salts=16)


@query(
    "t4_sessionize",
    """
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM s
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS duration_seconds,
           ROUND(SUM(value), 4) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def t4_sessionize(spark, sf_dir):
    """Event-time sessionization (30-min gap): lag + cumulative-sum session
    assignment, per-session rollup — the canonical clickstream operator for
    the reference's data domain."""
    from sparsity_spark.operators.temporal import session_stats

    events = load_table(spark, sf_dir, "events")
    return session_stats(events, gap_seconds=1800)


@query(
    "stats_percentiles",
    """
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    """,
)
def stats_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`); the approximate-sketch variant
    (approx_percentile/HLL) is exercised in tests with tolerance since
    sketches are not cross-engine reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


# --------------------------------------------------------------------- #
# Training-data pipeline primitives                                     #
# --------------------------------------------------------------------- #


@query(
    "pipe_split_counts",
    """
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        FROM documents
      )
    ) GROUP BY split
    """,
)
def pipe_split_counts(spark, sf_dir):
    """Reproducible train/val/test assignment by content hash — the same
    doc lands in the same split on any cluster, any engine, any retry."""
    from sparsity_spark.operators.pipeline import split_assign

    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs, "doc_id").groupBy("split").agg(F.count("*").alias("n"))


@query(
    "pipe_chunks",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST((s - 1) // 40 AS INTEGER) AS chunk_id,
           array_to_string(w[s:s+49], ' ') AS chunk_text,
           CAST(len(w[s:s+49]) AS INTEGER) AS n_tokens
    FROM base, unnest(range(1, greatest(len(w) - 10, 1) + 1, 40)) AS t(s)
    """,
)
def pipe_chunks(spark, sf_dir):
    """Document chunking: 50-token windows with 10-token overlap as a pure
    explode — the standard LLM preprocessing step, no UDF, no shuffle."""
    from sparsity_spark.operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=50, overlap=10)


@query(
    "pipe_pack_bins",
    """
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens, CAST(CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS VARCHAR) AS bin_id FROM c
    """,
)
def pipe_pack_bins(spark, sf_dir):
    """Sequence packing into 512-token bins via running-count assignment."""
    from sparsity_spark.operators.dedup import words_expr
    from sparsity_spark.operators.pipeline import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", F.size(words_expr("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(with_counts, budget=512)


@query(
    "pipe_pack_texts",
    """
    WITH t AS (
      SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, text, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ), b AS (
      SELECT doc_id, text, n_tokens,
             CAST(CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS VARCHAR) AS bin_id FROM c
    )
    SELECT bin_id,
           string_agg(text, ' <|eos|> ' ORDER BY doc_id) AS packed_text,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM b GROUP BY bin_id
    """,
)
def pipe_pack_texts(spark, sf_dir):
    """Materialized training sequences: 512-token bins concatenated in id
    order behind an EOS separator — one hash aggregate on the bin key,
    in-bin sort bounded by the token budget."""
    from sparsity_spark.operators.dedup import words_expr
    from sparsity_spark.operators.pipeline import materialize_bins, pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(words_expr("text")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, budget=512)
    return materialize_bins(packed)


@query(
    "text_tfidf",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS col FROM documents),
    tf AS (SELECT doc_id, col, COUNT(*) AS tf FROM toks GROUP BY doc_id, col),
    dfc AS (SELECT col, COUNT(*) AS df FROM tf GROUP BY col),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id, tf.col,
           ROUND(tf.tf * (ln((n.n + 1.0) / (dfc.df + 1)) + 1), 6) AS value
    FROM tf JOIN dfc ON tf.col = dfc.col CROSS JOIN n
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF document-term matrix as a native SparseFrame — the
    document-term matrix IS the engine's long/COO layout."""
    from sparsity_spark.operators.text import tfidf_frame

    return tfidf_frame(load_table(spark, sf_dir, "documents")).data


@query(
    "j7_multiply",
    """
    WITH counts AS (
      SELECT user_id, event_type AS col, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY user_id, event_type
    ),
    sums AS (
      SELECT user_id, event_type AS col, ROUND(SUM(value), 4) AS value
      FROM events GROUP BY user_id, event_type
    )
    SELECT c.user_id, c.col, ROUND(c.value * s.value, 4) AS value
    FROM counts c JOIN sums s ON c.user_id = s.user_id AND c.col = s.col
    """,
)
def j7_multiply(spark, sf_dir):
    """Elementwise multiply (arithmetic extension): sparse Hadamard product
    as one inner join — work scales with the smaller nnz."""
    events = load_table(spark, sf_dir, "events")
    counts = _user_counts_frame(spark, sf_dir)
    sum_cells = events.groupBy("user_id", F.col("event_type").alias(COL)).agg(
        F.round(F.sum("value"), 4).alias(VAL)
    )
    sums = SparseFrame(sum_cells, ["user_id"], EVENT_TYPES)
    prod = counts.multiply(sums)
    return prod.data.select("user_id", COL, F.round(F.col(VAL), 4).alias(VAL))


@query(
    "pipe_end_to_end",
    """
    WITH keep AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    quality AS (
      SELECT d.doc_id, d.text FROM documents d JOIN keep k ON d.doc_id = k.doc_id
      WHERE len(string_split(d.text, ' ')) >= 30
    ),
    assigned AS (
      SELECT doc_id, text,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT doc_id, text,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        FROM quality
      )
    ),
    chunks AS (
      SELECT a.split, a.doc_id
      FROM assigned a, unnest(range(1, greatest(len(string_split(a.text, ' ')) - 10, 1) + 1, 40)) AS t(s)
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks GROUP BY split
    """,
)
def pipe_end_to_end(spark, sf_dir):
    """The composed training-data pipeline as ONE lazy plan:
    exact-dedup (keep smallest id) → quality gate (≥30 tokens) →
    reproducible split assignment → chunking → per-split chunk counts.
    Every stage is an operator from this engine; Catalyst fuses the chain."""
    from sparsity_spark.operators.dedup import exact_dedup, words_expr
    from sparsity_spark.operators.pipeline import chunk_documents, split_assign

    docs = load_table(spark, sf_dir, "documents")
    keep = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    surviving = docs.join(keep, on="doc_id", how="leftsemi").filter(
        F.size(words_expr("text")) >= 30
    )
    assigned = split_assign(surviving, "doc_id")
    chunks = chunk_documents(assigned.select("doc_id", "text"), chunk_tokens=50, overlap=10)
    with_split = chunks.join(assigned.select("doc_id", "split"), on="doc_id")
    return with_split.groupBy("split").agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def _rp_lsh_oracle(num_planes: int = 8, dim: int = 64) -> str:
    """Oracle built from the SAME md5-derived hyperplanes as the Spark
    implementation (coefficients embedded as literals on both sides)."""
    from sparsity_spark.operators.similarity import projection_planes

    planes = projection_planes(num_planes, dim)
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in plane)}]::DOUBLE[]) >= 0"
        f" THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p, plane in enumerate(planes)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, {terms} AS bucket FROM e)
    SELECT a.bucket, a.vec_id AS id_a, c.vec_id AS id_b
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    """


@query("ann_rp_lsh_pairs", _rp_lsh_oracle())
def ann_rp_lsh_pairs(spark, sf_dir):
    """Signed-random-projection LSH candidate pairs: cosine-similar vectors
    collide in sign-bit buckets — the hyperplanes are md5-derived so the
    oracle reproduces every bucket bit-for-bit."""
    from sparsity_spark.operators.similarity import rp_lsh_candidate_pairs

    return rp_lsh_candidate_pairs(load_table(spark, sf_dir, "embeddings"))


@query(
    "q8_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_9'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of regional revenue per year — a
    conditional ratio over a seven-table star. The only shuffle is the
    lineitem⋈orders fact join; customer/region/supplier/part and both
    nation roles broadcast, and the region + part-type filters prune their
    dimensions before broadcasting."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(F.col("n_nationkey").alias("__ck__"), "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("__sk__"), F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("__ck__"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("__sk__"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.4 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern (the testdata has no partsupp table, so supply
    cost is proxied from p_retailprice — same join/agg topology). The name
    filter prunes part before its broadcast; lineitem⋈orders is the one
    shuffle join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.4 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


@query(
    "evt_funnel",
    """
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
           GROUP BY e.user_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_step1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_step2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_step3
    """,
)
def evt_funnel(spark, sf_dir):
    """Strict-order view→click→purchase funnel: per-step user counts where
    each step's first event must follow the previous step's first event.
    All stages shuffle on the same user key; microsecond-integer time
    comparison keeps nanosecond-precision oracles in agreement."""
    from sparsity_spark.operators.temporal import funnel_steps

    return funnel_steps(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@query(
    "evt_cohort_retention",
    """
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
                 CAST(date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS INTEGER)
                   AS period_off,
                 e.user_id
          FROM events e JOIN f ON e.user_id = f.user_id)
    SELECT cohort_day, period_off, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a GROUP BY cohort_day, period_off
    """,
)
def evt_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention grid keyed by each user's first-activity day.
    Output is |cohorts|×|weeks| regardless of event volume."""
    from sparsity_spark.operators.temporal import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"))


@query(
    "pipe_decontaminate",
    """
    WITH g AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    t AS (SELECT doc_id, unnest(grams) AS shingle FROM g WHERE doc_id % 20 <> 0),
    b0 AS (SELECT doc_id AS bench_id, unnest(grams) AS shingle FROM g WHERE doc_id % 20 = 0),
    bk AS (SELECT shingle FROM b0 GROUP BY shingle
           HAVING COUNT(DISTINCT bench_id) <= 20),
    b AS (SELECT b0.* FROM b0 JOIN bk ON b0.shingle = bk.shingle)
    SELECT t.doc_id, CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_shared_grams,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
    FROM t JOIN b ON t.shingle = b.shingle
    GROUP BY t.doc_id
    """,
)
def pipe_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs (19/20 hash split) sharing
    any discriminative word 3-gram with the held-out benchmark slice —
    shingles present in >20 benchmark docs are boilerplate, not evidence,
    and dropping them bounds the join fanout (the 10× sweep's superlinear
    risk). The benchmark shingle set broadcasts, so the training corpus is
    never shuffled before the per-doc aggregate."""
    from sparsity_spark.operators.pipeline import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        max_bench_df=20,
    )


@query(
    "t3_rollup_incremental",
    """
    SELECT COALESCE(CAST(year AS VARCHAR), 'ALL') AS year,
           COALESCE(CAST(month AS VARCHAR), 'ALL') AS month,
           COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
           ROUND(SUM(value), 4) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day, value FROM events
    )
    GROUP BY ROLLUP(year, month, day)
    """,
)
def t3_rollup_incremental_q(spark, sf_dir):
    """Materialized-rollup maintenance: merge the last batch (every 10th
    event) into the rollup of the other 90% WITHOUT rescanning history —
    the merged table must equal a from-scratch rollup of everything (the
    oracle IS the from-scratch SQL). Maintained totals stay unrounded;
    one round at serve time."""
    from sparsity_spark.operators.temporal import _rollup_raw, incremental_rollup_merge

    ev = load_table(spark, sf_dir, "events")
    existing = _rollup_raw(ev.filter(F.col("event_id") % 10 != 0))
    return incremental_rollup_merge(existing, ev.filter(F.col("event_id") % 10 == 0))


@query(
    "evt_user_sequences",
    """
    WITH s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             list(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    t AS (SELECT user_id, n_events,
                 seq[greatest(len(seq) - 19, 1):] AS tail FROM s)
    SELECT user_id, n_events,
           array_to_string(tail[1:len(tail) - 1], ' ') AS context,
           tail[-1] AS label
    FROM t
    """,
)
def evt_user_sequences_q(spark, sf_dir):
    """Sequence-model training examples: per user the last 20 events in
    deterministic (ts, event_id) order — context = all but the last,
    label = the last. ONE hash aggregate; array_sort orders inside the
    aggregated value (struct lexicographic order), so no window and no
    second shuffle."""
    from sparsity_spark.operators.temporal import user_event_sequences

    out = user_event_sequences(load_table(spark, sf_dir, "events"), max_len=20)
    return out.select(
        "user_id",
        "n_events",
        F.array_join("context", " ").alias("context"),
        "label",
    )


@query(
    "pipe_contamination_fraction",
    """
    WITH g AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    t AS (SELECT doc_id, unnest(grams) AS shingle FROM g WHERE doc_id % 20 <> 0),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM t GROUP BY doc_id),
    b AS (SELECT DISTINCT unnest(grams) AS shingle FROM g WHERE doc_id % 20 = 0),
    sh AS (
      SELECT t.doc_id, CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_shared_grams
      FROM t JOIN b ON t.shingle = b.shingle
      GROUP BY t.doc_id
    )
    SELECT tot.doc_id, tot.n_grams,
           COALESCE(sh.n_shared_grams, 0) AS n_shared_grams,
           ROUND(COALESCE(sh.n_shared_grams, 0) * 1.0 / tot.n_grams, 6) AS contamination
    FROM tot LEFT JOIN sh ON tot.doc_id = sh.doc_id
    """,
)
def pipe_contamination_fraction_q(spark, sf_dir):
    """Graded decontamination: per training doc, the fraction of its
    distinct 3-grams found anywhere in the held-out benchmark slice —
    the tunable threshold signal where pipe_decontaminate only flags.
    Benchmark shingle set broadcast; clean docs report 0.0."""
    from sparsity_spark.operators.pipeline import contamination_fraction

    docs = load_table(spark, sf_dir, "documents")
    return contamination_fraction(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
    )


@query(
    "stats_grouped_corr",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS covar_qty_price,
           ROUND(stddev_samp(l_quantity), 4) AS std_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_grouped_corr(spark, sf_dir):
    """Grouped bivariate statistics (Pearson correlation, sample covariance,
    sample stddev) — one partial+final hash aggregate, all moments combined
    map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
    )


@query(
    "w4_event_transitions",
    """
    WITH s AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def w4_event_transitions(spark, sf_dir):
    """First-order journey transitions (Markov counts): lead() over each
    user's event sequence, counted by (from, to) pair. One shuffle on the
    user key for the window, then a tiny 25-cell aggregate; ordering ties
    break on (µs-integer time, event_id) so any engine agrees."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    return (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "r4_pivot_event_counts",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def r4_pivot_event_counts(spark, sf_dir):
    """Generic pivot (the reference stops at one-hot): long events → wide
    per-user counts, expressed as conditional aggregates over pinned pivot
    values. Spark's `.pivot()` API plans TWO exchanges (a (key,value)
    pre-aggregate feeding pivotfirst); `count(when(...))` per column is ONE
    partial+final hash aggregate — test_plans pins the single-exchange
    shape."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in EVENT_TYPES
        ]
    )


@query(
    "a7_cube_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def a7_cube_revenue(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    pass — Spark expands the cube map-side, so partial aggregation still
    combines before the single shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


@query(
    "w5_spend_quartiles",
    """
    WITH spend AS (
      SELECT c.c_custkey, n.n_name AS nation,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS spend_cents
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c.c_custkey, n.n_name
    ),
    d AS (
      SELECT nation, spend_cents,
             CAST(ntile(4) OVER (PARTITION BY nation
                                 ORDER BY spend_cents, c_custkey) AS INTEGER) AS quartile
      FROM spend
    )
    SELECT nation, quartile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(spend_cents) / (100.0 * COUNT(*)), 4) AS avg_spend
    FROM d GROUP BY nation, quartile
    """,
)
def w5_spend_quartiles(spark, sf_dir):
    """Within-nation customer-spend quartiles via ntile: the window
    partitions on nation (parallel, never a global sort). Money math is
    INTEGER CENTS end to end (VERDICT r6 #2): each price rounds once to
    exact cents, per-customer spend is an exact BIGINT sum (order-free),
    the quartile ranks the integer (ties on custkey), and the average is
    ONE final double division rounded once — the hash can never flip on
    summation order, unlike the old ROUND(SUM(double),4) whose 4th
    decimal was a last-ulp boundary in the driver environment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("c_custkey"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_cents"
            )
        )
    )
    w = Window.partitionBy("nation").orderBy("spend_cents", "c_custkey")
    return (
        spend.select("nation", "spend_cents", F.ntile(4).over(w).alias("quartile"))
        .groupBy("nation", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend_cents") / (100.0 * F.count("*")), 4).alias(
                "avg_spend"
            ),
        )
    )


@query(
    "pipe_stratified_sample",
    """
    WITH b AS (
      SELECT lang,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
               AS bucket
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM b
    WHERE (lang = 'en' AND bucket < 25)
       OR (lang = 'zh' AND bucket < 60)
       OR (lang NOT IN ('en', 'zh') AND bucket < 90)
    GROUP BY lang
    """,
)
def pipe_stratified_sample(spark, sf_dir):
    """Training-mix rebalancing: downsample dominant English to 25%, keep
    60% of Chinese, 90% of everything else — reproducible content-hash
    selection, zero shuffle before the count."""
    from sparsity_spark.operators.pipeline import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs, "doc_id", "lang", {"en": 25, "zh": 60}, default_percent=90
    )
    return sampled.groupBy("lang").agg(F.count("*").alias("n"))


@query(
    "evt_daily_engagement",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    f AS (SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id)
    SELECT strftime(ud.d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS active,
           CAST(COUNT(CASE WHEN ud.d = f.d0 THEN 1 END) AS BIGINT) AS new_users,
           CAST(COUNT(p.user_id) AS BIGINT) AS returning
    FROM ud
    JOIN f ON ud.user_id = f.user_id
    LEFT JOIN ud p ON p.user_id = ud.user_id AND p.d = ud.d - 1
    GROUP BY ud.d
    """,
)
def evt_daily_engagement(spark, sf_dir):
    """Daily active/new/returning users from the distinct (user, day)
    activity set — the previous-day check is a shifted self left-join on
    the same key, never a per-user collect."""
    from sparsity_spark.operators.temporal import daily_engagement

    return daily_engagement(load_table(spark, sf_dir, "events"))


@query(
    "text_length_histogram",
    """
    SELECT CAST(len(w) // 50 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(len(w)) AS INTEGER) AS min_tokens,
           CAST(MAX(len(w)) AS INTEGER) AS max_tokens
    FROM (SELECT string_split(text, ' ') AS w FROM documents)
    GROUP BY 1
    """,
)
def text_length_histogram(spark, sf_dir):
    """Token-count histogram (fixed-width 50-token bins): the corpus length
    profile every curation pass starts from. Map-only tokenize + one tiny
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    return (
        docs.select(F.floor(n / 50).cast("int").alias("bucket"), n.alias("__n__"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("__n__").cast("int").alias("min_tokens"),
            F.max("__n__").cast("int").alias("max_tokens"),
        )
    )


@query(
    "text_source_quality",
    """
    WITH base AS (
      SELECT source, text, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT source,
             len(w) AS n_tokens,
             ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   * 1.0 / length(text), 6) AS alpha_ratio
      FROM base
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(least(n_tokens / 100.0, 1.0) * (0.5 + 0.5 * alpha_ratio)), 6)
             AS mean_quality,
           CAST(CASE WHEN ROUND(AVG(least(n_tokens / 100.0, 1.0) * (0.5 + 0.5 * alpha_ratio)), 6)
                          >= 0.5 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM m GROUP BY source
    """,
)
def text_source_quality(spark, sf_dir):
    """Source-level curation gate: mean composite quality per provenance
    source with a keep/drop flag — the aggregate that decides which crawls
    survive. One map-only scoring pass + one small aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    alpha_ratio = F.round(
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
        / F.length(F.col("text")),
        6,
    )
    q = F.least(n / F.lit(100.0), F.lit(1.0)) * (F.lit(0.5) + F.lit(0.5) * alpha_ratio)
    return (
        docs.select("source", q.alias("__q__"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("__q__"), 6).alias("mean_quality"),
            # 0.5 splits this corpus's sources 7/13 — both flag values are
            # oracle-exercised (0.4 passed everything). Round BEFORE the
            # compare: cross-engine float-summation drift near the
            # threshold must not flip the gate on one engine only
            F.when(F.round(F.avg("__q__"), 6) >= 0.5, 1).otherwise(0).cast("int").alias("keep"),
        )
    )


def _pq_oracle(m: int = 4, k: int = 16, dim: int = 64) -> str:
    from sparsity_spark.operators.similarity import pq_codebook

    sub = dim // m
    book = pq_codebook(m, k, sub)
    rows = ",\n      ".join(
        f"({s}, {j}, [{', '.join(repr(x) for x in book[s][j])}]::DOUBLE[])"
        for s in range(m)
        for j in range(k)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb(s, j, c) AS (VALUES
      {rows}),
    d AS (
      SELECT e.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb
    )
    SELECT vec_id, CAST(s AS INTEGER) AS subspace, CAST(j AS INTEGER) AS code
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
          FROM d)
    WHERE rn = 1
    """


@query(
    "dedup_substring_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             list_transform(string_split(text, ' '),
               x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 2147483647) AS th,
             list_transform(string_split(text, ' '),
               x -> CAST(('0x' || substring(md5(x), 9, 8)) AS BIGINT) % 2147483629) AS th2
      FROM documents
    ),
    g AS (
      -- same double polynomial gram hash as operators.dedup._gram_poly_keys:
      -- Horner folds (B1=1000003 mod 2147483647, B2=131071 mod 2147483629),
      -- each over its OWN per-token fingerprint (md5 hex 1-8 / 9-16) so the
      -- combined BIGINT genuinely carries ~62 bits
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             list_reduce(CAST([0] AS BIGINT[]) || th[i : i + 19],
                         (acc, h) -> (acc * 1000003 + h) % 2147483647) * 4294967296
           + list_reduce(CAST([0] AS BIGINT[]) || th2[i : i + 19],
                         (acc, h) -> (acc * 131071 + h) % 2147483629) AS gh
      FROM toks, LATERAL UNNEST(range(1, len(w) - 18)) AS t(i)
      WHERE len(w) >= 20
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) > 1),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN MAX(pos + 20) OVER w1 IS NULL
                    OR pos > MAX(pos + 20) OVER w1 THEN 1 ELSE 0 END AS ns
      FROM hits
      WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    spans AS (
      SELECT doc_id, pos,
             SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS span_id
      FROM marked
    ),
    per_span AS (
      SELECT doc_id, span_id, COUNT(*) AS grams_in_span,
             MAX(pos + 20) - MIN(pos) AS span_tokens
      FROM spans GROUP BY 1, 2
    )
    SELECT doc_id, CAST(SUM(grams_in_span) AS BIGINT) AS n_dup_grams,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
    FROM per_span GROUP BY doc_id
    """,
)
def dedup_substring_spans(spark, sf_dir):
    """Exact substring-level dedup (repeated 20-gram spans — the signal for
    cutting duplicated passages that document-level dedup can't see): one
    hash aggregate over exploded n-gram hashes finds repeats, positions
    join back, and a per-doc lag/cumsum window merges overlapping hits
    into spans."""
    from sparsity_spark.operators.dedup import substring_dup_spans

    return substring_dup_spans(load_table(spark, sf_dir, "documents"), n=20)


@query(
    "dedup_remove_spans",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             list_transform(string_split(text, ' '),
               x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 2147483647) AS th,
             list_transform(string_split(text, ' '),
               x -> CAST(('0x' || substring(md5(x), 9, 8)) AS BIGINT) % 2147483629) AS th2
      FROM documents
    ),
    g AS (
      -- same double polynomial gram hash as operators.dedup._gram_poly_keys:
      -- Horner folds (B1=1000003 mod 2147483647, B2=131071 mod 2147483629),
      -- each over its OWN per-token fingerprint (md5 hex 1-8 / 9-16) so the
      -- combined BIGINT genuinely carries ~62 bits
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             list_reduce(CAST([0] AS BIGINT[]) || th[i : i + 19],
                         (acc, h) -> (acc * 1000003 + h) % 2147483647) * 4294967296
           + list_reduce(CAST([0] AS BIGINT[]) || th2[i : i + 19],
                         (acc, h) -> (acc * 131071 + h) % 2147483629) AS gh
      FROM toks, LATERAL UNNEST(range(1, len(w) - 18)) AS t(i)
      WHERE len(w) >= 20
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) > 1),
    hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN MAX(pos + 20) OVER w1 IS NULL
                    OR pos > MAX(pos + 20) OVER w1 THEN 1 ELSE 0 END AS ns
      FROM hits
      WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    spans AS (
      SELECT doc_id, pos,
             SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS span_id
      FROM marked
    ),
    bounds AS (
      SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + 19 AS e
      FROM spans GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp FROM bounds GROUP BY doc_id
    ),
    rw AS (
      SELECT t.doc_id, t.w,
             list_filter(t.w, (x, i) ->
               len(list_filter(COALESCE(p.sp, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
                               q -> i >= q.s AND i <= q.e)) = 0) AS kept
      FROM toks t LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT doc_id,
           COALESCE(array_to_string(kept, ' '), '') AS clean_text,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(w) - len(kept) AS BIGINT) AS n_removed
    FROM rw
    """,
)
def dedup_remove_spans_q(spark, sf_dir):
    """Substring-level dedup as a transformation: every repeated 20-gram
    span is cut out of the text — the passage-removal half of the Lee et
    al. family (dedup_substring_spans is the statistics half; one shared
    island definition). The rewrite is a pure filter((token, idx))
    expression — text surgery stays JVM-side."""
    from sparsity_spark.operators.dedup import remove_dup_spans

    return remove_dup_spans(load_table(spark, sf_dir, "documents"), n=20)


def _pq_adc_oracle(m: int = 4, k: int = 16, dim: int = 64, topk: int = 5) -> str:
    # codebook derives from the TABLE (subspaces of the k lowest-id
    # vectors), so the oracle tracks pq_sampled_codebook on any sf
    sub = dim // m
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    subs(s) AS (SELECT UNNEST(range({m}))),
    cb AS (
      SELECT subs.s,
             CAST(ROW_NUMBER() OVER (PARTITION BY subs.s ORDER BY b.vec_id) - 1 AS BIGINT) AS j,
             list_transform(range(1, {sub + 1}), i -> b.v[subs.s*{sub} + i]) AS c
      FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k}) b, subs
    ),
    d AS (
      SELECT e.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb
    ),
    codes AS (
      SELECT vec_id, s, j AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
            FROM d)
      WHERE rn = 1
    ),
    lut AS (
      SELECT e.vec_id AS query_id, cb.s, cb.j AS code,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb WHERE e.vec_id < 10
    ),
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, ROUND(SUM(l.d2), 6) AS adc_d2
      FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
      WHERE c.vec_id != l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_d2
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rn FROM scored)
    WHERE rn <= {topk}
    """


def _ivf_pq_oracle(
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    topk: int = 5,
    nprobe: int = 1,
    corpus_filter: str = "",
) -> str:
    """IVF routing (cosine assignment to the 8 lowest-id centroids, the
    ann_ivf oracle construction) composed with the PQ/ADC scoring CTEs —
    the scored join additionally requires the doc's bucket to be one of
    the query's nprobe probe buckets. ``corpus_filter`` (e.g.
    ``"AND c.vec_id % 17 != 0"``) restricts the CORPUS side of the
    scored join only — codebook sampling and routing still see the full
    build-time corpus, matching the frozen-index deletion semantics."""
    sub = dim // m
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    r AS (
      SELECT n.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
               ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                        cent.cid) AS rn
      FROM n, cent
    ),
    asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    qa AS (SELECT vec_id AS query_id, cid FROM r WHERE rn <= {nprobe} AND vec_id < 10),
    subs(s) AS (SELECT UNNEST(range({m}))),
    cb AS (
      SELECT subs.s,
             CAST(ROW_NUMBER() OVER (PARTITION BY subs.s ORDER BY b.vec_id) - 1 AS BIGINT) AS j,
             list_transform(range(1, {sub + 1}), i -> b.v[subs.s*{sub} + i]) AS c
      FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k}) b, subs
    ),
    d AS (
      SELECT e.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb
    ),
    codes AS (
      SELECT vec_id, s, j AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
            FROM d)
      WHERE rn = 1
    ),
    lut AS (
      SELECT e.vec_id AS query_id, cb.s, cb.j AS code,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb WHERE e.vec_id < 10
    ),
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, ROUND(SUM(l.d2), 6) AS adc_d2
      FROM codes c
      JOIN asg a ON c.vec_id = a.vec_id
      JOIN qa ON qa.cid = a.cid
      JOIN lut l ON c.s = l.s AND c.code = l.code AND l.query_id = qa.query_id
      WHERE c.vec_id != l.query_id {corpus_filter}
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_d2
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rn FROM scored)
    WHERE rn <= {topk}
    """


def _pq_trained_cb_parts(
    m: int, k: int, dim: int, iters: int, train_n: int
) -> list[str]:
    """Unrolled per-subspace Lloyd codebook training as DuckDB CTEs ending
    in ``cb(s, j, c)`` — mirrors operators.similarity.pq_trained_codebook
    exactly: hash-sampled training rows (lowest md5(id), ties by id, LIMIT
    train_n), init = first k of that order per subspace, assignment by
    ROUND(list_distance, 6) ties -> lowest code, means ROUND(AVG, 6), and
    an EMPTY codeword keeps its previous vector (COALESCE on the left
    join — codebook width stays stable)."""
    sub = dim // m
    parts = [
        """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""",
        f"""tr AS (SELECT vec_id, v FROM e
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {train_n})""",
    ]
    for sp in range(m):
        lo, hi = sp * sub + 1, (sp + 1) * sub
        parts.append(f"s{sp}v AS (SELECT vec_id, v[{lo}:{hi}] AS e FROM tr)")
        parts.append(
            f"""s{sp}c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS j,
         e AS c
  FROM (SELECT * FROM s{sp}v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}))"""
        )
        for i in range(iters):
            parts.append(
                f"""s{sp}a{i + 1} AS (
  SELECT vec_id, e, j FROM (
    SELECT v.vec_id, v.e, c.j,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY ROUND(list_distance(v.e, c.c), 6), c.j) AS rn
    FROM s{sp}v v CROSS JOIN s{sp}c{i} c) t WHERE rn = 1)"""
            )
            parts.append(
                f"""s{sp}m{i + 1} AS (
  SELECT j, list(mu ORDER BY dim) AS c FROM (
    SELECT j, dim, ROUND(AVG(x), 6) AS mu
    FROM (SELECT j, UNNEST(e) AS x, UNNEST(range(len(e))) AS dim FROM s{sp}a{i + 1}) u
    GROUP BY j, dim) g
  GROUP BY j)"""
            )
            parts.append(
                f"""s{sp}c{i + 1} AS (
  SELECT p.j, COALESCE(mm.c, p.c) AS c
  FROM s{sp}c{i} p LEFT JOIN s{sp}m{i + 1} mm USING (j))"""
            )
    union = "\n      UNION ALL ".join(
        f"SELECT {sp} AS s, j, c FROM s{sp}c{iters}" for sp in range(m)
    )
    parts.append(f"cb AS ({union})")
    return parts


def _ivf_pq_trained_oracle(
    m: int = 8,
    k: int = 64,
    dim: int = 64,
    topk: int = 5,
    nprobe: int = 3,
    iters: int = 2,
    train_n: int = 65536,
) -> str:
    """The _ivf_pq_oracle composition with the TRAINED codebook CTEs in
    place of the sampled-first-k cb — routing, encode, LUT, and ranking
    tails identical."""
    sub = dim // m
    parts = _pq_trained_cb_parts(m, k, dim, iters, train_n)
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    r AS (
      SELECT n.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
               ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                        cent.cid) AS rn
      FROM n, cent
    ),
    asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    qa AS (SELECT vec_id AS query_id, cid FROM r WHERE rn <= {nprobe} AND vec_id < 10),
    d AS (
      SELECT e.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb
    ),
    codes AS (
      SELECT vec_id, s, j AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
            FROM d)
      WHERE rn = 1
    ),
    lut AS (
      SELECT e.vec_id AS query_id, cb.s, cb.j AS code,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb WHERE e.vec_id < 10
    ),
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, ROUND(SUM(l.d2), 6) AS adc_d2
      FROM codes c
      JOIN asg a ON c.vec_id = a.vec_id
      JOIN qa ON qa.cid = a.cid
      JOIN lut l ON c.s = l.s AND c.code = l.code AND l.query_id = qa.query_id
      WHERE c.vec_id != l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_d2
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_d2, neighbor_id) AS rn FROM scored)
    WHERE rn <= {topk}
    """
    )


@query("ann_ivfpq_trained_topk", _ivf_pq_trained_oracle())
def ann_ivfpq_trained_topk_q(spark, sf_dir):
    """IVF-PQ with the Lloyd-TRAINED per-subspace codebook (VERDICT r5 #3)
    at the m=8/k_code=64 tier: same routing and ADC tail as
    ann_ivfpq_topk, but the codebook is refined with 2 k-means iterations
    on the hash-sampled training set (pq_trained_codebook) — the
    production recall path (recall@10 0.285 -> 0.395 at this config on
    the sf0.01 fixture; full sweep in SCALE.md). The oracle unrolls the
    identical per-subspace Lloyd iterations in SQL."""
    from sparsity_spark.operators.similarity import ivf_pq_topk, pq_trained_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    book = pq_trained_codebook(emb, m=8, k=64, dim=64, iters=2)
    return ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        cents,
        m=8,
        k_code=64,
        topk=5,
        nprobe=3,
        codebook=book,
    )


@query("ann_ivfpq_topk", _ivf_pq_oracle())
def ann_ivfpq_topk_q(spark, sf_dir):
    """Full IVF-PQ search (the FAISS IVFPQ composition): queries route to
    their nearest IVF bucket and ONLY that bucket's members are
    ADC-scored through their PQ codes — IVF bounds who is scored, PQ
    bounds what is read per candidate. One broadcast of the per-query
    LUT × probe buckets; the big side sees one equi-join keyed
    (centroid_id, subspace, code)."""
    from sparsity_spark.operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10), cents)


@query(
    "ann_ivfpq_index_topk",
    # identical semantics to ann_ivfpq_topk — persisting the index is a
    # LAYOUT change (bucketed code table + codebook/centroid side tables),
    # never a results change
    ORACLES["ann_ivfpq_topk"],
)
def ann_ivfpq_index_topk_q(spark, sf_dir):
    """The same IVF-PQ search against a PERSISTED index
    (write_ivfpq_index → ivfpq_index_topk): the corpus exists only as its
    bucketed (centroid_id, subspace, code) table — the query-time scoring
    join reads it with NO index-side shuffle (plan-asserted); results are
    bit-identical to the in-memory composition, which this oracle row
    proves."""
    from sparsity_spark.operators.similarity import ivfpq_index_topk, write_ivfpq_index

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    write_ivfpq_index(emb, cents, "ivfpq_index_oracle_q", num_buckets=8)
    return ivfpq_index_topk(emb.filter(F.col("vec_id") < 10), "ivfpq_index_oracle_q")


@query(
    "ann_ivfpq_append_topk",
    # identical semantics to ann_ivfpq_topk: incremental maintenance is a
    # LAYOUT/lifecycle change, never a results change — half the corpus is
    # indexed up front and half arrives as an append increment, with the
    # codebook sampled from the full corpus (what a production rebuild
    # would have frozen) so the two-step build is bit-identical to the
    # one-shot build the oracle mirrors
    ORACLES["ann_ivfpq_topk"],
)
def ann_ivfpq_append_topk_q(spark, sf_dir):
    """IVF-PQ search after INCREMENTAL index maintenance
    (write_ivfpq_index on the even half -> append_ivfpq_index of the odd
    half -> ivfpq_index_topk): the increment encodes with the frozen
    codebook, routes with the frozen centroids, and appends THROUGH the
    bucket spec — so the queried index is bit-identical to a one-shot
    build and the store stays bucket-pruned. The ANN sibling of the
    dedup band/hash/member store maintenance discipline."""
    from sparsity_spark.operators.similarity import (
        append_ivfpq_index,
        ivfpq_index_topk,
        pq_sampled_codebook,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    book = pq_sampled_codebook(emb, 4, 16, 64)
    write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0),
        cents,
        "ivfpq_index_append_q",
        num_buckets=8,
        codebook=book,
    )
    append_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 1), "ivfpq_index_append_q")
    return ivfpq_index_topk(emb.filter(F.col("vec_id") < 10), "ivfpq_index_append_q")


def _twin_screen_oracle(m: int = 4, k: int = 16, dim: int = 64) -> str:
    """Code-identity twin-screen oracle: the _ivf_pq_oracle routing +
    sampled-codebook + codes CTEs, then per-vector signatures
    (cid, list(code ORDER BY s)) — keep = no even-half corpus row holds
    the same cell AND the row is the lowest id in its cell within the
    batch (the intra-batch keep-first arm)."""
    sub = dim // m
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    r AS (
      SELECT n.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
               ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                        cent.cid) AS rn
      FROM n, cent
    ),
    asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    subs(s) AS (SELECT UNNEST(range({m}))),
    cb AS (
      SELECT subs.s,
             CAST(ROW_NUMBER() OVER (PARTITION BY subs.s ORDER BY b.vec_id) - 1 AS BIGINT) AS j,
             list_transform(range(1, {sub + 1}), i -> b.v[subs.s*{sub} + i]) AS c
      FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k}) b, subs
    ),
    d AS (
      SELECT e.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (e.v[cb.s*{sub} + i] - cb.c[i])
                      * (e.v[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM e, cb
    ),
    codes AS (
      SELECT vec_id, s, j AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
            FROM d)
      WHERE rn = 1
    ),
    sig AS (
      SELECT c.vec_id, a.cid, list(c.code ORDER BY c.s) AS sg
      FROM codes c JOIN asg a USING (vec_id)
      GROUP BY c.vec_id, a.cid
    ),
    corpus_sig AS (SELECT DISTINCT cid, sg FROM sig WHERE vec_id % 2 = 0),
    batch AS (
      SELECT vec_id AS bid, vec_id AS src FROM e
      WHERE vec_id % 2 = 1 AND vec_id < 400
      UNION ALL
      SELECT vec_id + 1000000, vec_id FROM e
      WHERE vec_id % 2 = 0 AND vec_id < 40
    ),
    bsig AS (SELECT b.bid, s.cid, s.sg FROM batch b JOIN sig s ON s.vec_id = b.src),
    flagged AS (
      SELECT b.bid, b.cid, b.sg, cs.cid IS NOT NULL AS hit,
             ROW_NUMBER() OVER (PARTITION BY b.cid, b.sg ORDER BY b.bid) AS rn
      FROM bsig b LEFT JOIN corpus_sig cs ON b.cid = cs.cid AND b.sg = cs.sg
    )
    SELECT bid AS vec_id, ((NOT hit) AND rn = 1) AS keep FROM flagged
    """


@query("ann_index_twin_screen", _twin_screen_oracle())
def ann_index_twin_screen_q(spark, sf_dir):
    """Code-identity twin screen against the persisted IVF-PQ index (the
    batch form of the r7 streaming-screen fix): index the EVEN half of
    the corpus, then screen a batch of odd-half rows PLUS exact twins of
    40 indexed rows (re-keyed +1,000,000). A batch vector is dropped when
    its (centroid_id, code_0..code_{m-1}) signature already exists in the
    index — SDC distance 0, exact for twins under the frozen codebook,
    something no ADC threshold can express (ADC to a twin = its
    quantization error, > 0). The intra-batch arm keeps only the lowest
    id per signature within the batch itself. Index side read
    bucket-pruned to the batch's probed centroid buckets."""
    from sparsity_spark.operators.similarity import (
        ivfpq_twin_screen,
        pq_sampled_codebook,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    book = pq_sampled_codebook(emb, 4, 16, 64)
    write_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0),
        cents,
        "ivfpq_twin_screen_q",
        num_buckets=8,
        codebook=book,
    )
    batch = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 400)).select(
        "vec_id", "embedding"
    ).unionByName(
        emb.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 40)).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    return ivfpq_twin_screen(batch, "ivfpq_twin_screen_q", dim=64, intra_batch=True)


def _ivfpq_refine_oracle(
    m: int = 4, k: int = 16, dim: int = 64, topk: int = 5, shortlist: int = 4
) -> str:
    """RESIDUAL IVF-PQ + exact-cosine refine, mirrored in SQL: routing and
    sampled-codebook CTE discipline from _ivf_pq_oracle, but codes quantize
    ROUND(x − centroid, 6) residuals (the r7 clustered-recall fix), the
    ADC LUT is keyed (query, cid), and the topk×shortlist ADC shortlist is
    re-ranked by exact cosine over the raw vectors (round 6, ties →
    lowest neighbor id)."""
    sub = dim // m
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    r AS (
      SELECT n.vec_id, cent.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
               ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                        cent.cid) AS rn
      FROM n, cent
    ),
    asg AS (SELECT vec_id, cid FROM r WHERE rn = 1),
    res AS (
      SELECT e.vec_id, a.cid,
             list_transform(range(1, {dim + 1}),
                            i -> ROUND(e.v[i] - cent.cv[i], 6)) AS rv
      FROM e JOIN asg a ON e.vec_id = a.vec_id JOIN cent ON cent.cid = a.cid
    ),
    subs(s) AS (SELECT UNNEST(range({m}))),
    cb AS (
      SELECT subs.s,
             CAST(ROW_NUMBER() OVER (PARTITION BY subs.s ORDER BY b.vec_id) - 1 AS BIGINT) AS j,
             list_transform(range(1, {sub + 1}), i -> b.rv[subs.s*{sub} + i]) AS c
      FROM (SELECT * FROM res ORDER BY vec_id LIMIT {k}) b, subs
    ),
    d AS (
      SELECT res.vec_id, cb.s, cb.j,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (res.rv[cb.s*{sub} + i] - cb.c[i])
                      * (res.rv[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM res, cb
    ),
    codes AS (
      SELECT vec_id, s, j AS code
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rn
            FROM d)
      WHERE rn = 1
    ),
    lut AS (
      SELECT q.vec_id AS query_id, q.cid, cb.s, cb.j AS code,
             ROUND(list_sum(list_transform(range(1, {sub + 1}),
                   i -> (q.rv[cb.s*{sub} + i] - cb.c[i])
                      * (q.rv[cb.s*{sub} + i] - cb.c[i]))), 6) AS d2
      FROM res q, cb WHERE q.vec_id < 10
    ),
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, ROUND(SUM(l.d2), 6) AS adc_d2
      FROM codes c
      JOIN asg a ON c.vec_id = a.vec_id
      JOIN lut l ON c.s = l.s AND c.code = l.code AND l.cid = a.cid
      WHERE c.vec_id != l.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_d2, neighbor_id) AS rn FROM scored)
      WHERE rn <= {topk * shortlist}
    ),
    ref AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_dot_product(qn.v, nn.v) / (qn.nrm * nn.nrm), 6) + 0.0 AS cosine
      FROM short s
      JOIN n qn ON qn.vec_id = s.query_id
      JOIN n nn ON nn.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rn FROM ref)
    WHERE rn <= {topk}
    """


@query("ann_ivfpq_refine_topk", _ivfpq_refine_oracle())
def ann_ivfpq_refine_topk_q(spark, sf_dir):
    """RESIDUAL IVF-PQ with the exact-cosine REFINE stage (the r7 recall
    fix, tools/recall_study.py): codes quantize x − centroid(x) — on
    clustered embeddings raw-vector PQ re-encodes the cluster center and
    within-cluster ranking collapses (recall flat at 0.41 across nprobe);
    residual codes + a topk×4 shortlist re-ranked by exact cosine reach
    0.885 on the 32-Gaussian fixture, ABOVE the 0.835 exact-L2 ceiling
    because the refine ranks in the truth metric. The shortlist is
    broadcast; the corpus pays one extra column-pruned (id, vector)
    scan — no shuffle, no pairwise blowup."""
    from sparsity_spark.operators.similarity import ivf_pq_refine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_pq_refine_topk(
        emb, emb.filter(F.col("vec_id") < 10), cents,
        m=4, k_code=16, topk=5, nprobe=1, shortlist=4, residual=True,
    )


@query("ann_pq_adc_topk", _pq_adc_oracle())
def ann_pq_adc_topk(spark, sf_dir):
    """IVF-PQ's search half: asymmetric-distance top-k where the corpus is
    represented only by its PQ codes and each query scores docs through a
    broadcast (query × subspace × codeword) lookup table — raw corpus
    vectors never read at query time. Code table ⨝ broadcast LUT on
    (subspace, code), one partial+final hash aggregate per (query, doc)."""
    from sparsity_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < 10))


@query("emb_pq_codes", _pq_oracle())
def emb_pq_codes(spark, sf_dir):
    """Product-quantization codes (m=4 subspaces × k=16 codewords over
    64-dim vectors): the compact-code ANN representation, computed as one
    map-side expression with the md5-derived codebook embedded as literals
    — bit-exact reproducible in any engine."""
    from sparsity_spark.operators.similarity import pq_encode

    return pq_encode(load_table(spark, sf_dir, "embeddings"))


@query(
    "ann_ivf_probe2",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
    r AS (
      SELECT n.vec_id, cent.cid, n.v, n.nrm,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id
               ORDER BY ROUND(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn), 6) DESC,
                        cent.cid) AS rn
      FROM n, cent
    ),
    asg AS (SELECT vec_id, cid, v, nrm FROM r WHERE rn = 1),
    qa AS (SELECT vec_id, cid, v, nrm FROM r WHERE rn <= 2 AND vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine
      FROM qa q JOIN asg c ON q.cid = c.cid AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def ann_ivf_probe2(spark, sf_dir):
    """IVF with nprobe=2: queries search their two nearest buckets —
    double the candidates, better recall, corpus layout untouched."""
    from sparsity_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), centroids, k=3, nprobe=2
    ).select("query_id", "neighbor_id", "cosine")


@query(
    "q2_min_cost_supplier",
    """
    WITH pk AS (SELECT p_partkey FROM part WHERE p_size <= 5 AND p_type = 'ECONOMY'),
    ps AS (SELECT DISTINCT l.l_partkey, l.l_suppkey
           FROM lineitem l JOIN pk ON l.l_partkey = pk.p_partkey),
    cost AS (
      SELECT ps.l_partkey AS partkey, s.s_name, s.s_acctbal, n.n_name AS nation
      FROM ps
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    ),
    m AS (SELECT partkey, min(s_acctbal) AS min_bal FROM cost GROUP BY partkey)
    SELECT c.partkey, c.s_name, ROUND(c.s_acctbal, 4) AS acctbal, c.nation
    FROM cost c JOIN m ON c.partkey = m.partkey AND c.s_acctbal = m.min_bal
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part argmin supplier (no partsupp table — the
    observed part↔supplier pairs come from lineitem, cost from s_acctbal).
    The part filter prunes before everything; the distinct pair set and the
    min join-back both shuffle on partkey so the exchanges line up; the
    equality join-back keeps ties (as Q2 does)."""
    pk = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 5) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = (
        l.join(F.broadcast(pk), l.l_partkey == pk.p_partkey)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cost = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
        )
    )
    m = cost.groupBy("partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        cost.join(m, "partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("partkey", "s_name", F.round("s_acctbal", 4).alias("acctbal"), "nation")
    )


@query(
    "q20_volume_suppliers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    vol AS (SELECT l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem l JOIN red ON l.l_partkey = red.p_partkey
            GROUP BY l_suppkey)
    SELECT s.s_name, n.n_name AS nation, ROUND(v.qty, 4) AS red_qty
    FROM vol v
    JOIN supplier s ON v.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE v.qty > 1.1 * (SELECT AVG(qty) FROM vol)
    """,
)
def q20_volume_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers whose shipped volume of the filtered part
    set clears a scale-invariant threshold (1.1× the per-supplier mean — a
    broadcast scalar, like Q15's argmax). Quantities are integral doubles,
    so the sums and the threshold comparison are exact in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = (
        l.join(F.broadcast(red), l.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = vol.agg((F.lit(1.1) * F.avg("qty")).alias("__t__"))
    return (
        vol.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("__t__"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"), F.round("qty", 4).alias("red_qty"))
    )


@query(
    "r5_feature_hash",
    """
    WITH tok AS (
      SELECT user_id,
             'f' || CAST(CAST(('0x' || substring(md5('event_type=' || event_type), 1, 8))
                             AS BIGINT) % 16 AS VARCHAR) AS col,
             1.0 AS v
      FROM events
    )
    SELECT user_id, col, ROUND(SUM(v), 4) AS value
    FROM tok GROUP BY user_id, col
    """,
)
def r5_feature_hash(spark, sf_dir):
    """Hashing-trick encoder: event types md5-bucketed into a fixed 16-wide
    feature space, collisions summed — the unbounded-vocabulary companion
    to one-hot. Zero-shuffle projection + ONE hash aggregate."""
    from sparsity_spark.reshape import feature_hash

    events = load_table(spark, sf_dir, "events")
    sf = feature_hash(events, ["event_type"], "user_id", num_features=16)
    return sf.data.select("user_id", COL, F.round(VAL, 4).alias(VAL))


@query(
    "fn_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def fn_json_extract(spark, sf_dir):
    """JSON property extraction (get_json_object) aggregated per type —
    stays inside whole-stage codegen, no UDF."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object(F.col("props"), "$.k").cast("long")).alias("k_total"),
        F.count("*").alias("n"),
    )


@query(
    "w6_rolling_time_window",
    """
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           ROUND(SUM(value) OVER w, 4) AS val_1h
    FROM (SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN CAST(3600 AS BIGINT) * 1000000 PRECEDING
                           AND CURRENT ROW)
    """,
)
def w6_rolling_time_window(spark, sf_dir):
    """Trailing one-hour per-user rolling count/sum with a RANGE (time)
    frame — unlike w2's row frame, the frame width follows the clock, the
    shape rate-limiters and trailing-exposure metrics need. Ordering key is
    integer microseconds; RANGE peers (equal timestamps) are included by
    both engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1000000, 0)
    )
    return e.select(
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("val_1h"),
    )


@query(
    "stream_sliding_counts",
    """
    SELECT strftime(date_trunc('day', ts) - (o * INTERVAL 1 DAY), '%Y-%m-%d')
             AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, (VALUES (0), (1)) AS t(o)
    GROUP BY 1
    """,
)
def stream_sliding_counts(spark, sf_dir):
    """Sliding-window streaming round trip: 2-day windows sliding daily —
    every event feeds two overlapping windows; the full readStream →
    watermarked sliding aggregate → availableNow → memory-sink path must
    equal the batch double-count the oracle computes."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import stream_events, streaming_sliding_counts

    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    name = "ssc_" + uuid.uuid4().hex[:8]
    q = (
        streaming_sliding_counts(stream_events(spark, src), "2 days", "1 day")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT date_format(window_start, 'yyyy-MM-dd') AS window_start, n FROM {name}"
    )


@query(
    "sql_priority_revenue",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def sql_priority_revenue(spark, sf_dir):
    """The spark.sql entry point as a first-class surface: views registered
    once, then pure ANSI SQL — Catalyst produces the same plan the
    DataFrame API would (pushdown, broadcast, partial agg all intact)."""
    from sparsity_spark.data import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "a8_session_window",
    """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tus, ts, value, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       >= CAST(1800 AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def a8_session_window(spark, sf_dir):
    """Built-in session windows: F.session_window grows a per-key window
    while consecutive gaps stay under 30 min (strictly — a gap of exactly
    the duration closes it, hence the oracle's >=). The same incremental
    state machine Structured Streaming would run; here verified in batch
    against the lag+cumsum construction at microsecond precision."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )


@query(
    "text_redact_pii",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com ip 10.0.'
                  || (doc_id % 256) || '.' || ((doc_id // 7) % 256)
                  || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(text, '\+?[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}[- ]?[0-9]{0,4}')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INTEGER) AS n_ssn,
           CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER) AS n_ipv4,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\+?[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}[- ]?[0-9]{0,4}', '<PHONE>', 'g'),
                   '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
                 '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g'))
             AS redacted_md5
    FROM aug
    """,
)
def text_redact_pii(spark, sf_dir):
    """PII scrubbing demo: the synthetic corpus carries no PII, so the query
    first APPENDS deterministic pseudo-PII (an email, an IP, a phone number
    derived from doc_id) on BOTH engine sides, then runs the generic
    operator. Counts are per-kind regexp_count on the pre-redaction text;
    the redacted text round-trips as an md5 so the full byte-level
    replacement chain is what's compared. Map-only — no shuffle at any
    corpus size."""
    from sparsity_spark.operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256), F.lit("."), ((F.col("doc_id") / 7).cast("long") % 256),
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(aug).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ssn",
        "n_ipv4",
        F.md5("redacted_text").alias("redacted_md5"),
    )


@query(
    "web_domain_cap",
    r"""
    WITH urls AS (
      SELECT doc_id, n_chars,
             'https://www.' || source || (doc_id % 5) || '.org/p/' || doc_id AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, n_chars,
             regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                            '([^.]+\.[^.]+)$', 1) AS domain
      FROM urls
    ), ranked AS (
      SELECT doc_id, n_chars, domain,
             row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS r
      FROM parts
    )
    SELECT doc_id, domain, n_chars FROM ranked WHERE r <= 100
    """,
)
def web_domain_cap(spark, sf_dir):
    """Web-corpus domain capping: derive a deterministic URL per doc (both
    engine sides), parse the registrable domain (Spark parse_url HOST +
    substring_index vs the oracle's regex), keep at most 100 docs per
    domain by ascending doc_id. Plan: one domain-shuffle; the row_number
    filter rewrites to WindowGroupLimit so per-domain state is bounded at
    the cap — the anti-domination pass a crawl-scale corpus needs."""
    from sparsity_spark.operators.pipeline import cap_per_domain

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://www."), F.col("source"), (F.col("doc_id") % 5),
            F.lit(".org/p/"), F.col("doc_id"),
        ).alias("url"),
    )
    return cap_per_domain(urls, "url", 100, "doc_id").select("doc_id", "domain", "n_chars")


@query(
    "stream_attribution_join",
    """
    SELECT v.user_id,
           v.event_id AS l_event_id,
           p.event_id AS r_event_id,
           ROUND((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0, 6) AS lag_s,
           ROUND(v.value, 4) AS l_value,
           ROUND(p.value, 4) AS r_value
    FROM events v
    JOIN events p
      ON p.user_id = v.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(v.ts)
     AND epoch_us(p.ts) <= epoch_us(v.ts) + CAST(600 AS BIGINT) * 1000000
    """,
)
def stream_attribution_join(spark, sf_dir):
    """Stream-stream interval join round trip (view → purchase attribution
    within 10 min per user): two watermarked readStreams, event-time-bounded
    inner join, availableNow trigger, memory sink — must equal the batch
    self-join the oracle computes. The interval bound is what keeps join
    state finite on an unbounded stream."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import stream_events, streaming_attribution_join

    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/events"
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    views = stream_events(spark, src).filter(F.col("event_type") == "view")
    purchases = stream_events(spark, src).filter(F.col("event_type") == "purchase")
    name = "saj_" + uuid.uuid4().hex[:8]
    q = (
        streaming_attribution_join(views, purchases, within="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT user_id, l_event_id, r_event_id, ROUND(lag_s, 6) AS lag_s,"
        f" ROUND(l_value, 4) AS l_value, ROUND(r_value, 4) AS r_value FROM {name}"
    )


@query(
    "evt_daily_ewma",
    """
    WITH d AS (
      SELECT user_id, date_trunc('day', ts) AS day, SUM(value) AS v
      FROM events GROUP BY 1, 2
    ), i AS (
      SELECT user_id, day, v,
             row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS idx
      FROM d
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           ROUND(SUM(v * pow(0.7, -idx)) OVER w / SUM(pow(0.7, -idx)) OVER w, 4)
             AS ewma
    FROM i
    WINDOW w AS (PARTITION BY user_id ORDER BY idx ROWS UNBOUNDED PRECEDING)
    """,
)
def evt_daily_ewma(spark, sf_dir):
    """Per-user daily-value EWMA (α=0.3, pandas adjust=True semantics) as
    pure window expressions — the r^t factor cancels in the closed form, so
    the whole smoothing pass is one shuffle on user_id plus two cumulative
    sums. The trend-smoothing shape behind engagement/health metrics."""
    from sparsity_spark.operators.temporal import ewma

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum("value").alias("v"))
    return ewma(daily, "user_id", "day", "v", alpha=0.3).select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("ewma"), 4).alias("ewma"),
    )


@query(
    "stream_ewma",
    """
    WITH d AS (
      SELECT user_id, date_trunc('day', ts) AS day, SUM(value) AS v
      FROM events GROUP BY 1, 2
    ), i AS (
      SELECT user_id, day, v,
             row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS idx
      FROM d
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           ROUND(SUM(v * pow(0.7, -idx)) OVER w / SUM(pow(0.7, -idx)) OVER w, 4)
             AS ewma
    FROM i
    WINDOW w AS (PARTITION BY user_id ORDER BY idx ROWS UNBOUNDED PRECEDING)
    """,
)
def stream_ewma(spark, sf_dir):
    """Stateful streaming EWMA round trip (VERDICT r3 #8): daily per-user
    totals streamed through the applyInPandasWithState (num, den)
    recurrence — bounded state per key at any series length, unlike the
    closed-form window expression — must equal the batch closed form the
    oracle computes."""
    import tempfile
    import uuid

    from sparsity_spark.streaming import streaming_ewma

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("ts")
    ).agg(F.sum("value").alias("value"))
    src = tempfile.mkdtemp(prefix="sparsity_stream_") + "/daily"
    daily.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    name = "sewma_" + uuid.uuid4().hex[:8]
    q = (
        streaming_ewma(stream, watermark="3650 days", alpha=0.3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        f"SELECT user_id, date_format(ts, 'yyyy-MM-dd') AS day,"
        f" round(ewma, 4) AS ewma FROM {name}"
    )


def _zorder_oracle(bits: int = 10) -> str:
    terms = " | ".join(
        f"(((bu >> {i}) & 1) << {2 * i}) | (((bt >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    top = (1 << bits) - 1
    return f"""
    WITH bnds AS (
      SELECT min(user_id) AS mnu, max(user_id) AS mxu,
             min(epoch_us(ts)) AS mnt, max(epoch_us(ts)) AS mxt
      FROM events
    ), s AS (
      SELECT event_id,
             CASE WHEN mxu <= mnu THEN 0
                  ELSE ((user_id - mnu) * {top}) // (mxu - mnu) END AS bu,
             CASE WHEN mxt <= mnt THEN 0
                  ELSE ((epoch_us(ts) - mnt) * {top}) // (mxt - mnt) END AS bt
      FROM events, bnds
    )
    SELECT event_id, CAST({terms} AS BIGINT) AS zcode FROM s
    """


@query("io_zorder_code", _zorder_oracle(10))
def io_zorder_code(spark, sf_dir):
    """Morton (Z-order) codes over (user_id, event time): the
    multi-dimensional clustering key behind zorder_write's data-skipping
    layout — bit-exact against the oracle's interleave. One broadcast of a
    two-row stats agg; the code itself is pure shift/and/or codegen."""
    from sparsity_spark.io import zorder_code

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsus")
    )
    return zorder_code(e, ["user_id", "tsus"], bits=10).select("event_id", "zcode")


@query(
    "pipe_curate_e2e",
    """
    WITH q AS (
      SELECT doc_id, text, source, len(string_split(text, ' ')) AS n_tokens,
             ROUND(least(len(string_split(text, ' ')) / 100.0, 1.0)
                   * (0.5 + 0.5 * ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                                        * 1.0 / length(text), 6)), 6) AS quality
      FROM documents
    ), kept AS (
      SELECT * FROM q WHERE quality >= 0.4
    ), survivors AS (
      SELECT * FROM kept
      WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))
    ), urls AS (
      SELECT *, 'https://www.' || source || (doc_id % 5) || '.org/p/' || doc_id AS url
      FROM survivors
    ), capped AS (
      SELECT doc_id, n_tokens, quality,
             regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                            '([^.]+\\.[^.]+)$', 1) AS domain,
             row_number() OVER (
               PARTITION BY regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                                           '([^.]+\\.[^.]+)$', 1)
               ORDER BY doc_id) AS r
      FROM urls
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality), 4) AS avg_quality,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM capped WHERE r <= 100
    GROUP BY domain
    """,
)
def pipe_curate_e2e(spark, sf_dir):
    """End-to-end corpus curation — the flagship pipeline composition:
    quality gate (C4-style composite ≥ 0.4) → exact-dedup survivors
    (keep-first per content hash, computed AFTER the gate so the canonical
    copy is a surviving one) → per-domain cap (100 docs) → per-domain
    curation report (docs kept, mean quality, token budget).

    Every stage is one of the library's own operators; the whole chain is
    three shuffles (dedup hash-agg, domain window, final rollup) — the
    quality gate and URL derivation stay map-side fused. At 100 TB each
    stage's scale posture has already been proven in isolation; this entry
    proves they COMPOSE."""
    from sparsity_spark.operators.dedup import exact_dedup
    from sparsity_spark.operators.pipeline import cap_per_domain
    from sparsity_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality")
    kept = docs.join(q, "doc_id").filter(F.col("quality") >= 0.4)
    keepers = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    survivors = kept.join(keepers, "doc_id")
    urls = survivors.withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), (F.col("doc_id") % 5),
            F.lit(".org/p/"), F.col("doc_id"),
        ),
    )
    capped = cap_per_domain(urls, "url", 100, "doc_id")
    return capped.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "evt_anomaly_zscore",
    """
    WITH daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT user_id, day, n,
             AVG(n) OVER (PARTITION BY user_id) AS mu,
             stddev_pop(n) OVER (PARTITION BY user_id) AS sd,
             COUNT(*) OVER (PARTITION BY user_id) AS days
      FROM daily
    )
    SELECT user_id, day, CAST(n AS BIGINT) AS n, ROUND((n - mu) / sd, 4) AS z
    FROM s
    WHERE days >= 5 AND sd > 0 AND abs(ROUND((n - mu) / sd, 4)) >= 2.0
    """,
)
def evt_anomaly_zscore(spark, sf_dir):
    """Per-user daily-volume anomalies (|z| >= 2 vs the user's own daily
    mean/stddev) — the self-normalizing outlier detector: one hash
    aggregate + per-key window, no global model, no second shuffle of raw
    events. Bot/abuse detection shape for a 100 TB event log."""
    from sparsity_spark.operators.temporal import daily_anomalies

    events = load_table(spark, sf_dir, "events")
    return daily_anomalies(events, "user_id", "ts", min_days=5, z_threshold=2.0)


@query(
    "w7_month_over_month",
    """
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 4) + 0.0 AS pct_change
    FROM m
    """,
)
def w7_month_over_month(spark, sf_dir):
    """Month-over-month revenue growth: monthly rollup, then lag() period
    comparison. pct_change is computed from the ROUNDED monthly revenues on
    both sides, so engine summation-order differences cannot leak into the
    ratio. The unpartitioned window runs on ~80 month rows AFTER full
    aggregation — a driver-sized series, not a data-sized sort."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(F.lit(100.0) * (F.col("revenue") - prev) / prev, 4).alias("pct_change"),
    )


@query(
    "stats_user_entropy",
    """
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT user_id, c, SUM(c) OVER (PARTITION BY user_id) AS t FROM cnt
    ), ent AS (
      SELECT user_id, CAST(MAX(t) AS BIGINT) AS n,
             ROUND(-SUM((c * 1.0 / t) * ln(c * 1.0 / t)), 4) AS entropy
      FROM s GROUP BY user_id
    )
    SELECT user_id, n, entropy FROM ent
    WHERE n >= 20
    ORDER BY entropy DESC, user_id LIMIT 20
    """,
)
def stats_user_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type mix (behavioral-diversity
    quality signal): top-20 most-diverse users with >= 20 events.

    After the (user, type) hash aggregate everything is O(users x 5): the
    per-user total is a window over the aggregate (no re-shuffle of raw
    events) and the top-k is TakeOrderedAndProject on rounded entropy with
    an id tiebreak — deterministic across engines."""
    from sparsity_spark.operators.pipeline import group_entropy

    events = load_table(spark, sf_dir, "events")
    ent = group_entropy(events, "user_id", "event_type")
    return (
        ent.filter(F.col("n") >= 20)
        .select("user_id", F.col("n").cast("long").alias("n"), "entropy")
        .orderBy(F.col("entropy").desc(), F.col("user_id").asc())
        .limit(20)
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_suppkey"]


@query(
    "stats_profile_columns",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_v,
           ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_v,
           ROUND(AVG({c}), 6) AS mean_v
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def stats_profile_columns_q(spark, sf_dir):
    """Data profiling health check (row/null/distinct counts, min/max/mean
    per column) in ONE aggregate pass over the table — the pre-training
    sanity scan; exact distincts here, HLL `approx=True` for wide tables."""
    from sparsity_spark.operators.pipeline import profile_columns

    return profile_columns(load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS)


@query(
    "stats_len_quantiles",
    """
    SELECT source,
           UNNEST([0.25, 0.5, 0.75, 0.9]) AS q,
           ROUND(UNNEST(quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9])), 6)
             AS quantile_value
    FROM documents GROUP BY source
    """,
)
def stats_len_quantiles_q(spark, sf_dir):
    """Exact per-source document-length quantiles: one hash aggregate
    computes the whole quantile list per group (linear interpolation —
    Spark `percentile` ≡ DuckDB `quantile_cont`), then a posexplode pairs
    q with value. The corpus length-distribution summary behind quality
    cuts."""
    from sparsity_spark.operators.pipeline import grouped_quantiles

    return grouped_quantiles(
        load_table(spark, sf_dir, "documents"), "source", "n_chars"
    )


@query(
    "pipe_curriculum_shards",
    """
    WITH s AS (SELECT doc_id, ROUND(n_chars * 1.0, 6) AS sc FROM documents),
    c AS (
      SELECT quantile_cont(sc, 0.25) AS c1, quantile_cont(sc, 0.5) AS c2,
             quantile_cont(sc, 0.75) AS c3
      FROM s
    )
    SELECT s.doc_id,
           CAST((CASE WHEN ROUND(c.c1, 6) < s.sc THEN 1 ELSE 0 END)
              + (CASE WHEN ROUND(c.c2, 6) < s.sc THEN 1 ELSE 0 END)
              + (CASE WHEN ROUND(c.c3, 6) < s.sc THEN 1 ELSE 0 END) AS INTEGER) AS shard
    FROM s, c
    """,
)
def pipe_curriculum_shards_q(spark, sf_dir):
    """Curriculum sharding by document length quantile band: one exact-
    percentile aggregate yields the 3 cutpoints (driver-side metadata),
    assignment is a map-only CASE chain — no global NTILE window."""
    from sparsity_spark.operators.pipeline import curriculum_shards

    docs = load_table(spark, sf_dir, "documents")
    return curriculum_shards(
        docs.select("doc_id", F.col("n_chars").cast("double").alias("sc")),
        "sc",
        n_shards=4,
    ).select("doc_id", "shard")


@query(
    "pipe_incremental_newdocs",
    """
    WITH d AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ), corpus AS (
      SELECT DISTINCT h FROM d WHERE doc_id % 10 < 8
    ), batch AS (
      SELECT * FROM d WHERE doc_id % 10 >= 8
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN h IN (SELECT h FROM corpus) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_new
    FROM batch GROUP BY source
    """,
)
def pipe_incremental_newdocs(spark, sf_dir):
    """Incremental ingest: which docs in an incoming batch are genuinely
    new vs already in the corpus? Content-hash membership join (batch
    left-outer against the deduped corpus hash index, which is distinct on
    h so the join is 1:<=1 — no fanout) — the only-process-new-data
    primitive of a continuously crawling pipeline, in ONE pass over the
    batch: the null-probe marks new docs and the same rows feed both
    counters. At 100 TB the corpus side is a pre-deduped slim hash column
    and the join shuffles hashes, not documents. 80/20 split simulated on
    doc_id % 10."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    corpus = docs.filter(F.col("doc_id") % 10 < 8).select("h").distinct().withColumn(
        "seen", F.lit(1)
    )
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    return (
        batch.join(corpus, "h", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_batch"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_new"),
        )
    )


@query(
    "pipe_weighted_sample",
    """
    WITH d AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS h
      FROM documents
    ), k AS (
      SELECT doc_id, source,
             -ln((h + 1) / 4294967297.0) / n_chars AS key
      FROM d
    )
    SELECT doc_id, source, ROUND(key * 1000000.0, 4) AS skey
    FROM k ORDER BY key, doc_id LIMIT 50
    """,
)
def pipe_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res, k=50, weight = n_chars): u comes from the content hash,
    not an RNG, so the sample is reproducible across engines / retries /
    partitionings. Plan is a map-side key projection + TakeOrderedAndProject
    (per-partition k-heaps, no global sort) — the same plan at 100 TB."""
    from sparsity_spark.operators.pipeline import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", 50, "text", "doc_id").select(
        "doc_id", "source", "skey"
    )


@query(
    "dedup_jaccard_prefix_join",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
    ), tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM d
    ), sz AS (
      SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1
    ), pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / (sa.sz + sb.sz - c), 4) AS jaccard
    FROM pair
    JOIN sz sa ON ia = sa.doc_id
    JOIN sz sb ON ib = sb.doc_id
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.9
    """,
)
def dedup_jaccard_prefix_join(spark, sf_dir):
    """All-pairs exact Jaccard >= 0.9 via PPJoin prefix filtering — the
    oracle does the naive any-shared-token join (correct but explodes on
    the Zipf head at scale); the Spark side proves the prefix-filtered
    plan returns the IDENTICAL pair set while only ever joining on each
    doc's rarest ~|d|·(1-t) tokens. 10% doc sample keeps the naive oracle
    tractable; the Spark operator needs no such mercy."""
    from sparsity_spark.operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return jaccard_prefix_join(docs, "doc_id", "text", threshold=0.9)


@query(
    "dedup_jaccard_prefix_shingles",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / (len(sa.grams) + len(sb.grams) - c), 4) AS jaccard
    FROM pair
    JOIN g sa ON ia = sa.doc_id
    JOIN g sb ON ib = sb.doc_id
    WHERE c * 1.0 / (len(sa.grams) + len(sb.grams) - c) >= 0.9
    """,
)
def dedup_jaccard_prefix_shingles(spark, sf_dir):
    """The SCALE configuration of the PPJoin: k=3 shingle tokens over the
    FULL corpus (no sample). On a small-vocabulary corpus, word tokens are
    never rare and prefix filtering degenerates to near-all-pairs (measured
    DNF >500 s on 5k docs); 3-gram shingles give a combinatorial vocabulary
    (df max 25 on the same corpus) — 9.6 s full corpus, 3× wall on 10×
    data (SCALE.md). Oracle is the naive shared-shingle join."""
    from sparsity_spark.operators.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_join(docs, "doc_id", "text", threshold=0.9, k=3)


@query(
    "text_quality_model",
    """
    WITH base AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT doc_id,
             len(w) AS n,
             len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is','it'], t))) * 1.0 / len(w) AS stop_ratio,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
             length(replace(text, ' ', '')) * 1.0 / len(w) AS mean_wordlen
      FROM base
    ), z AS (
      SELECT doc_id,
             0.0 + 1.2 * least(n / 200.0, 1.0) + 2.0 * stop_ratio
                 + 1.5 * alpha_ratio - 0.8 * (mean_wordlen / 10.0) AS z
      FROM m
    )
    SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 6) AS model_quality FROM z
    """,
)
def text_quality_model_q(spark, sf_dir):
    """Linear-model quality-filter inference (fastText-classifier shape):
    sigmoid(w·x + b) over cheap doc features, model as plan constants —
    map-only at any scale; the oracle replays the identical arithmetic."""
    from sparsity_spark.operators.text import model_quality_score

    return model_quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "pipe_temperature_mix",
    """
    WITH n AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), tot AS (SELECT COUNT(*) AS total FROM documents),
    w AS (SELECT lang, cnt, POW(CAST(cnt AS DOUBLE), 0.5) AS wt FROM n),
    s AS (SELECT SUM(wt) AS wsum FROM w),
    rates AS (
      SELECT lang,
             ROUND(LEAST(1.0, tot.total * 0.5 * wt / (s.wsum * cnt)), 9) AS rate
      FROM w, s, tot
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1000000 < r.rate * 1000000
    """,
)
def pipe_temperature_mix_q(spark, sf_dir):
    """Temperature resampling across domains (T=2: p_d ∝ n_d^(1/2), the
    multilingual rebalance of LLM data recipes): one domain-cardinality
    count agg broadcast back, then a map-only deterministic md5 draw —
    same selection on any engine, partitioning, or run."""
    from sparsity_spark.operators.pipeline import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix(
        docs, "doc_id", "lang", temperature=2.0, target_fraction=0.5
    ).select("doc_id", "lang")


@query(
    "pipe_target_mix",
    """
    WITH n AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), tot AS (SELECT COUNT(*) AS total FROM documents),
    rates AS (
      SELECT lang,
             ROUND(LEAST(1.0,
               tot.total * 0.5 * (CASE lang WHEN 'en' THEN 0.6
                                            WHEN 'de' THEN 0.3
                                            WHEN 'fr' THEN 0.1 END)
               / cnt), 9) AS rate
      FROM n, tot WHERE lang IN ('en', 'de', 'fr')
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1000000 < r.rate * 1000000
    """,
)
def pipe_target_mix_q(spark, sf_dir):
    """EXPLICIT-weight mixture construction ({'en': .6, 'de': .3,
    'fr': .1} — the published-recipe form of rebalancing, where
    temperature_mix derives weights from counts): per-domain keep-rate
    min(1, T·w_d/n_d), domains outside the recipe dropped; one count agg
    broadcast back + the map-only md5 draw."""
    from sparsity_spark.operators.pipeline import target_mix

    docs = load_table(spark, sf_dir, "documents")
    return target_mix(
        docs, "doc_id", "lang", {"en": 0.6, "de": 0.3, "fr": 0.1},
        target_fraction=0.5,
    ).select("doc_id", "lang")


@query(
    "text_lm_perplexity",
    """
    WITH ref AS (SELECT text FROM documents WHERE doc_id % 5 <> 0),
    refw AS (SELECT string_split(text, ' ') AS w FROM ref),
    refp AS (
      SELECT CASE WHEN i = 1 THEN '<s>' ELSE w[i - 1] END AS prev, w[i] AS word
      FROM refw, LATERAL UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    counts AS (SELECT prev, word, COUNT(*) AS c FROM refp GROUP BY 1, 2),
    totals AS (SELECT prev, SUM(c) AS t, COUNT(*) AS v FROM counts GROUP BY prev),
    model AS (
      SELECT counts.prev, counts.word,
             ROUND(LN((c + 1.0) / (t + v)), 6) AS logp
      FROM counts JOIN totals USING (prev)
    ),
    docs_w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 5 = 0
    ),
    docp AS (
      SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE w[i - 1] END AS prev, w[i] AS word
      FROM docs_w, LATERAL UNNEST(range(1, len(w) + 1)) AS t(i)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(CAST(ROUND(COALESCE(m.logp, -10.0) * 1000000, 0) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6) AS avg_logp
    FROM docp LEFT JOIN model m USING (prev, word)
    GROUP BY doc_id
    """,
)
def text_lm_perplexity_q(spark, sf_dir):
    """CCNet/Gopher-style LM quality filter: a word-bigram model trains on
    the 80% reference slice (two hash aggregates, add-one smoothing,
    cardinality-guarded) and the held-out 20% scores by average bigram
    log-prob under it — unseen bigrams floored at -10. Model broadcast;
    scoring is explode + broadcast join + ONE aggregate."""
    from sparsity_spark.operators.text import lm_perplexity_score, word_bigram_lm

    docs = load_table(spark, sf_dir, "documents")
    model = word_bigram_lm(docs.filter(F.col("doc_id") % 5 != 0))
    return lm_perplexity_score(docs.filter(F.col("doc_id") % 5 == 0), model)


@query(
    "text_bm25_rank",
    """
    WITH base AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             list_filter(string_split(text, ' '),
                         t -> t IN ('dup', 'query', 'spark')) AS hits
      FROM documents
    ),
    st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, UNNEST(hits) AS term FROM base)
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
    SELECT doc_id,
           ROUND(SUM(
             LN(1.0 + (st.n - df + 0.5) / (df + 0.5))
             * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / st.avgdl))
           ), 6) AS score
    FROM tf JOIN dfreq USING (term), st
    GROUP BY doc_id
    """,
)
def text_bm25_rank_q(spark, sf_dir):
    """BM25 relevance ranking against a term set (the data-selection
    primitive behind DSIR-style targeted subset mining): tokens filter to
    the literal query set BEFORE any aggregate — shuffled rows ∝ hits,
    never corpus tokens; Lucene non-negative idf; k1=1.2, b=0.75."""
    from sparsity_spark.operators.text import bm25_rank

    return bm25_rank(
        load_table(spark, sf_dir, "documents"), ["dup", "query", "spark"]
    )


@query(
    "text_hybrid_rrf",
    """
    WITH base AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             list_filter(string_split(text, ' '),
                         t -> t IN ('dup', 'query', 'spark')) AS hits
      FROM documents
    ),
    st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM base),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, UNNEST(hits) AS term FROM base)
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    lex AS (
      SELECT doc_id,
             ROUND(SUM(
               LN(1.0 + (st.n - df + 0.5) / (df + 0.5))
               * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / st.avgdl))
             ), 6) AS score
      FROM tf JOIN dfreq USING (term), st
      GROUP BY doc_id
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nv AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sem AS (
      SELECT neighbor_id AS doc_id, cosine AS score FROM (
        SELECT c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) DESC,
                          c.vec_id) AS rn
        FROM nv q, nv c WHERE q.vec_id = 0 AND c.vec_id != 0
      ) WHERE rn <= 15
    ),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM lex
      UNION ALL
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM sem
    ),
    fused AS (
      SELECT doc_id,
             SUM(CAST(ROUND(1000000000.0 / (60 + rank)) AS BIGINT)) AS rrf_nano,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM ranked GROUP BY doc_id
    )
    SELECT doc_id, rrf_score, n_lists FROM (
      SELECT doc_id, ROUND(rrf_nano / 1e9, 6) AS rrf_score, n_lists,
             ROW_NUMBER() OVER (ORDER BY ROUND(rrf_nano / 1e9, 6) DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= 25
    """,
)
def text_hybrid_rrf_q(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (r7): the lexical BM25
    shortlist and the semantic cosine shortlist (embedding 0 as the query
    vector, doc_id ≡ vec_id) fuse with rrf k=60 — integer-nano exact
    contribution sums so the fused score is engine/order-independent.
    The combiner every RAG-ish corpus query stack needs; both input
    systems are already oracle-checked alone, so this row pins the
    fusion algebra itself."""
    from sparsity_spark.operators.similarity import cosine_topk, rrf_fuse
    from sparsity_spark.operators.text import bm25_rank

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # semantic list cut to 15 so the fused top-25 necessarily carries
    # single-list docs — keeps the n_lists column discriminative (r7
    # audit: at k=100 every top-25 doc sat in both lists)
    lex = bm25_rank(docs, ["dup", "query", "spark"])
    sem = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=15).select(
        F.col("neighbor_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    return rrf_fuse([lex, sem], k=60, top_n=25)


@query(
    "text_dsir_importance",
    """
    WITH
    mt_w AS (SELECT string_split(text, ' ') AS w FROM documents WHERE lang = 'de'),
    mt_p AS (
      SELECT CASE WHEN i = 1 THEN '<s>' ELSE w[i - 1] END AS prev, w[i] AS word
      FROM mt_w, LATERAL UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    mt_c AS (SELECT prev, word, COUNT(*) AS c FROM mt_p GROUP BY 1, 2),
    mt_t AS (SELECT prev, SUM(c) AS t, COUNT(*) AS v FROM mt_c GROUP BY prev),
    mt AS (
      SELECT mt_c.prev, mt_c.word, ROUND(LN((c + 1.0) / (t + v)), 6) AS logp
      FROM mt_c JOIN mt_t USING (prev)
    ),
    mr_w AS (SELECT string_split(text, ' ') AS w FROM documents WHERE TRUE),
    mr_p AS (
      SELECT CASE WHEN i = 1 THEN '<s>' ELSE w[i - 1] END AS prev, w[i] AS word
      FROM mr_w, LATERAL UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    mr_c AS (SELECT prev, word, COUNT(*) AS c FROM mr_p GROUP BY 1, 2),
    mr_t AS (SELECT prev, SUM(c) AS t, COUNT(*) AS v FROM mr_c GROUP BY prev),
    mr AS (
      SELECT mr_c.prev, mr_c.word, ROUND(LN((c + 1.0) / (t + v)), 6) AS logp
      FROM mr_c JOIN mr_t USING (prev)
    ),
    docp AS (
      SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE w[i - 1] END AS prev, w[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           LATERAL UNNEST(range(1, len(w) + 1)) AS t(i)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(CAST(ROUND(COALESCE(mt.logp, -10.0) * 1000000, 0) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6) AS logp_target,
           ROUND(SUM(CAST(ROUND(COALESCE(mr.logp, -10.0) * 1000000, 0) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6) AS logp_raw,
           ROUND(ROUND(SUM(CAST(ROUND(COALESCE(mt.logp, -10.0) * 1000000, 0) AS BIGINT))
                       / (COUNT(*) * 1000000.0), 6)
                 - ROUND(SUM(CAST(ROUND(COALESCE(mr.logp, -10.0) * 1000000, 0) AS BIGINT))
                         / (COUNT(*) * 1000000.0), 6), 6) AS importance
    FROM docp
    LEFT JOIN mt USING (prev, word)
    LEFT JOIN mr USING (prev, word)
    GROUP BY doc_id
    """,
)
def text_dsir_importance_q(spark, sf_dir):
    """DSIR importance weights (arXiv:2302.03169): the whole corpus scored
    under a TARGET model (here: the German slice as the target domain) vs
    its own raw model — importance = avg bigram logp difference. Two
    broadcastable model trainings, ONE scoring pass (single bigram explode
    joining both models). Compose with weighted_sample for the selection."""
    from sparsity_spark.operators.text import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, docs.filter(F.col("lang") == "de"))


@query(
    "dedup_hash_store_screen",
    """
    WITH corpus AS (
      SELECT md5(text) AS content_hash, doc_id FROM documents WHERE doc_id % 10 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000, md5(text) FROM documents WHERE doc_id % 30 = 1
      UNION ALL
      SELECT doc_id + 2000000, md5(text) FROM documents WHERE doc_id % 40 = 0
    ),
    firsts AS (
      SELECT content_hash, MIN(doc_id) AS f FROM batch GROUP BY content_hash
    )
    SELECT b.doc_id, b.content_hash,
           ((c.content_hash IS NULL) AND b.doc_id = firsts.f) AS keep
    FROM batch b
    LEFT JOIN (SELECT DISTINCT content_hash FROM corpus) c USING (content_hash)
    JOIN firsts USING (content_hash)
    """,
)
def dedup_hash_store_screen_q(spark, sf_dir):
    """One EXACT-dedup increment against the persisted content-hash ledger
    (the md5 twin of the band store): corpus-side shuffle-free screen via
    the bucket layout + keep-first within the batch + survivor append —
    `append_hash_store` end to end, decisions oracle-checked. The batch
    re-uploads corpus docs (%30==1, byte-identical, new ids — must be
    REJECTED against the store) and duplicates batch docs (%40==0 — the
    lower id keeps, the twin is rejected intra-batch), so both reject
    arms actually fire (r7 audit: the natural corpus had no cross-decile
    twin and the keep column was constant True)."""
    from sparsity_spark.operators.dedup import append_hash_store, write_hash_store

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .unionByName(
            docs.filter(F.col("doc_id") % 30 == 1).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            )
        )
    )
    write_hash_store(corpus, "hash_store_oracle_q", num_buckets=8)
    return append_hash_store(batch, "hash_store_oracle_q")


@query(
    "stats_kmv_sketch",
    """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) AS INT) AS rank, h FROM (
      SELECT DISTINCT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ) ORDER BY h LIMIT 64
    """,
)
def stats_kmv_sketch_q(spark, sf_dir):
    """KMV distinct sketch of events.user_id: the k smallest distinct md5
    hashes — deterministic, so the oracle reproduces the SKETCH ITSELF
    bit-for-bit (library HLL registers can't be cross-engine-checked like
    this; the r7 md5-register HLL below achieves it by construction).
    Mergeable: per-day sketches roll up via kmv_union without rescanning."""
    from sparsity_spark.operators.sketches import kmv_sketch

    return kmv_sketch(load_table(spark, sf_dir, "events"), "user_id", k=64)


@query(
    "stats_kmv_estimate",
    """
    WITH sk AS (
      SELECT h FROM (
        SELECT DISTINCT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events
      ) ORDER BY h LIMIT 64
    ), agg AS (SELECT COUNT(*) AS n, MAX(h) AS kth FROM sk)
    SELECT CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
           ELSE ROUND(63.0 / ((kth + 1) / 1152921504606846976.0), 4) END AS distinct_estimate
    FROM agg
    """,
)
def stats_kmv_estimate_q(spark, sf_dir):
    """Cardinality estimate from the KMV sketch — (k-1)/normalized kth
    minimum, exact count when the value set is smaller than k."""
    from sparsity_spark.operators.sketches import kmv_estimate, kmv_sketch

    sk = kmv_sketch(load_table(spark, sf_dir, "events"), "user_id", k=64)
    return kmv_estimate(sk, k=64)


@query(
    "stats_kmv_jaccard",
    """
    WITH ha AS (
      SELECT DISTINCT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events WHERE event_type = 'click'
    ), hb AS (
      SELECT DISTINCT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events WHERE event_type = 'purchase'
    ),
    ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
    u AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb) ORDER BY h LIMIT 64),
    inter AS (SELECT u.h FROM u WHERE u.h IN (SELECT h FROM ska) AND u.h IN (SELECT h FROM skb))
    SELECT ROUND((SELECT COUNT(*) FROM inter) * 1.0 / (SELECT COUNT(*) FROM u), 4) AS jaccard_estimate
    """,
)
def stats_kmv_jaccard_q(spark, sf_dir):
    """Sketch-based Jaccard between clicker and purchaser user sets —
    union/intersection of two 64-value sketches, never of the sets."""
    from sparsity_spark.operators.sketches import kmv_jaccard, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    a = kmv_sketch(ev.filter(F.col("event_type") == "click"), "user_id", k=64)
    b = kmv_sketch(ev.filter(F.col("event_type") == "purchase"), "user_id", k=64)
    return kmv_jaccard(a, b, k=64)


@query(
    "stats_cms_estimate",
    """
    WITH cells AS (
      SELECT j.d AS d,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':' || CAST(j.d AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM events, LATERAL UNNEST(range(3)) j(d)
      WHERE user_id IS NOT NULL
    ),
    sk AS (SELECT d, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    probes AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 50 = 0),
    pr AS (
      SELECT p.c_custkey, j.d AS d,
             CAST(('0x' || substring(md5(CAST(p.c_custkey AS VARCHAR) || ':' || CAST(j.d AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM probes p, LATERAL UNNEST(range(3)) j(d)
    )
    SELECT pr.c_custkey AS user_id, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est_count
    FROM pr LEFT JOIN sk USING (d, bucket)
    GROUP BY 1
    """,
)
def stats_cms_estimate_q(spark, sf_dir):
    """Count-min point-frequency estimates (r7): the per-user event-count
    sketch is depth×width counters from ONE hash aggregate (metadata-sized
    at any corpus size, mergeable cell-wise), probed for every 50th
    customer key with a broadcast join. Like the KMV family the hash rows
    are fixed md5 derivations, so the DuckDB oracle reproduces every
    counter and every min-estimate exactly — no cross-engine sketch
    drift."""
    from sparsity_spark.operators.sketches import cms_estimate, cms_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = cms_sketch(ev, "user_id", width=256, depth=3)
    probes = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    return cms_estimate(sk, probes, "user_id", width=256, depth=3)


@query(
    "stats_cms_store_merge",
    """
    WITH cells AS (
      SELECT j.d AS d,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':' || CAST(j.d AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM events, LATERAL UNNEST(range(3)) j(d)
      WHERE user_id IS NOT NULL
    ),
    sk AS (SELECT d, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    probes AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 70 = 1),
    pr AS (
      SELECT p.c_custkey, j.d AS d,
             CAST(('0x' || substring(md5(CAST(p.c_custkey AS VARCHAR) || ':' || CAST(j.d AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket
      FROM probes p, LATERAL UNNEST(range(3)) j(d)
    )
    SELECT pr.c_custkey AS user_id, CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS est_count
    FROM pr LEFT JOIN sk USING (d, bucket)
    GROUP BY 1
    """,
)
def stats_cms_store_merge_q(spark, sf_dir):
    """Persisted-sketch maintenance under the correctness gate (r7): the
    store is built from HALF the events, the other half is folded in via
    merge_cms_store (the shared batch/streaming code path), and the probe
    estimates must equal the oracle's ONE-SHOT sketch of everything —
    merge exactness is the property that lets per-day sketches roll up at
    100 TB without rescanning, so the gate pins it cross-engine."""
    from sparsity_spark.operators.sketches import (
        cms_estimate,
        cms_store,
        merge_cms_store,
        write_cms_store,
    )

    ev = load_table(spark, sf_dir, "events")
    write_cms_store(
        ev.filter(F.col("event_id") % 2 == 0), "cms_store_oracle_q", "user_id", 256, 3
    )
    merge_cms_store(
        ev.filter(F.col("event_id") % 2 == 1), "cms_store_oracle_q", "user_id", 256, 3
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 70 == 1)
        .select(F.col("c_custkey").alias("user_id"))
    )
    return cms_estimate(
        cms_store(spark, "cms_store_oracle_q"), probes, "user_id", width=256, depth=3
    )


_HLL_REG_SQL = """
      SELECT h % 256 AS bucket,
             CAST(MAX(CASE WHEN h // 256 = 0 THEN 53
                           ELSE 53 - length(bin(h // 256)) END) AS INTEGER) AS r
      FROM (
        SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
      ) GROUP BY 1
"""


@query(
    "stats_hll_estimate",
    f"""
    WITH reg AS ({_HLL_REG_SQL}),
    agg AS (
      SELECT COUNT(*) AS n_present,
             SUM(CAST(1 AS BIGINT) << (53 - r)) AS s_present
      FROM reg
    )
    SELECT ROUND((0.7213 / (1 + 1.079/256)) * (256.0 * 256.0) * 9007199254740992.0
                 / CAST(s_present + (256 - n_present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE),
                 4) AS distinct_estimate,
           CAST(n_present AS BIGINT) AS n_present,
           CAST(256 - n_present AS BIGINT) AS zero_registers
    FROM agg
    """,
)
def stats_hll_estimate_q(spark, sf_dir):
    """HyperLogLog cardinality of events.user_id (r7): 256 registers from
    ONE partial+final max aggregate — no distinct shuffle (register max is
    duplicate-insensitive), the scale win over KMV's distinct+TakeOrdered
    when the hash set itself is huge. Every register is a pure md5
    derivation (bucket = low 8 hash bits, rho via LENGTH(BIN(w)) on the
    remaining 52) and the harmonic denominator is an EXACT integer sum, so
    — unlike library HLLs and approx_count_distinct, whose registers
    differ per engine — the DuckDB oracle reproduces the estimate to the
    last rounded digit."""
    from sparsity_spark.operators.sketches import hll_estimate, hll_sketch

    sk = hll_sketch(load_table(spark, sf_dir, "events"), "user_id")
    return hll_estimate(sk)


@query("stats_hll_store_merge", f"SELECT * FROM ({_HLL_REG_SQL})")
def stats_hll_store_merge_q(spark, sf_dir):
    """Persisted HLL register-file maintenance under the correctness gate
    (r7): the store is built from HALF the events, the other half is
    folded in via merge_hll_store (the shared batch/streaming code path),
    and the returned REGISTER FILE ITSELF — not just the estimate — must
    equal the oracle's one-shot sketch of everything, bucket for bucket.
    Cell-wise max is exact AND idempotent, so per-day register files roll
    up at 100 TB without rescanning and survive at-least-once replays."""
    from sparsity_spark.operators.sketches import hll_store, merge_hll_store, write_hll_store

    ev = load_table(spark, sf_dir, "events")
    write_hll_store(ev.filter(F.col("event_id") % 2 == 0), "hll_store_oracle_q", "user_id")
    merge_hll_store(ev.filter(F.col("event_id") % 2 == 1), "hll_store_oracle_q", "user_id")
    return hll_store(spark, "hll_store_oracle_q")


@query(
    "text_nb_distill",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    feats AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 1024 AS f,
             COUNT(*) AS x
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    lexcnt AS (
      SELECT doc_id,
             SUM(CASE WHEN tok IN ('table','row','scan','query','filter')
                      THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN tok IN ('stream','window','batch','vector','hash')
                      THEN 1 ELSE 0 END) AS cb
      FROM toks WHERE tok <> '' GROUP BY 1
    ),
    lab AS (
      SELECT d.doc_id,
             CASE WHEN COALESCE(ca, 0) > COALESCE(cb, 0) THEN 1 ELSE -1 END AS y
      FROM documents d LEFT JOIN lexcnt USING (doc_id)
    ),
    cls AS (
      SELECT f,
             SUM(CASE WHEN y = 1 THEN x ELSE 0 END) AS cpos,
             SUM(CASE WHEN y = -1 THEN x ELSE 0 END) AS cneg
      FROM feats JOIN lab USING (doc_id) GROUP BY f
    ),
    tot AS (
      SELECT SUM(CASE WHEN y = 1 THEN x ELSE 0 END) AS tpos,
             SUM(CASE WHEN y = -1 THEN x ELSE 0 END) AS tneg
      FROM feats JOIN lab USING (doc_id)
    ),
    nd AS (
      SELECT SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS npos,
             SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS nneg
      FROM lab
    ),
    wt AS (
      SELECT r.f,
             CAST(ROUND(ROUND(LN((COALESCE(cpos, 0) + 1.0) / (tpos + 1024)), 6) * 1e6, 0)
                - ROUND(ROUND(LN((COALESCE(cneg, 0) + 1.0) / (tneg + 1024)), 6) * 1e6, 0)
                  AS BIGINT) AS w6
      FROM (SELECT CAST(i AS BIGINT) AS f FROM range(1024) t(i)) r
      LEFT JOIN cls ON r.f = cls.f CROSS JOIN tot
      UNION ALL
      SELECT CAST(-1 AS BIGINT),
             CAST(ROUND(ROUND(LN(npos * 1.0 / nneg), 6) * 1e6, 0) AS BIGINT)
      FROM nd
    ),
    feat_rows AS (
      SELECT doc_id, f, x FROM feats
      UNION ALL
      SELECT DISTINCT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT) FROM feats
    ),
    sc AS (
      SELECT doc_id, CAST(SUM(x * w6) AS BIGINT) AS score6
      FROM feat_rows JOIN wt USING (f) GROUP BY 1
    )
    SELECT doc_id, score6,
           CAST(CASE WHEN score6 > 0 THEN 1 ELSE -1 END AS INTEGER) AS pred
    FROM sc
    """,
)
def text_nb_distill_q(spark, sf_dir):
    """Trainable quality classifier with TRAINING replayed by the oracle
    (r7): a lexicon rule ('table/row/scan/query/filter' vs 'stream/window/
    batch/vector/hash' token counts) provides weak-supervision labels, and
    a multinomial Naive Bayes over 1024 hashed-token buckets is trained
    CLOSED FORM — per-class count aggregates, Laplace smoothing, one
    round(ln, 6) per model cell, exact integer micro-log-odds everywhere
    after (the bigram-LM determinism seam) — then scores every doc. The
    DuckDB oracle replays the whole train→score pipeline and must land on
    bit-identical margins and signs; measured accuracy vs the labels is
    0.92 at sf0.01 against a 0.53 majority baseline (the model must
    GENERALIZE the rule through hash buckets, not copy it). A full-batch
    perceptron was measured first and rejected — see the operator module's
    negative-result note."""
    from sparsity_spark.operators.text import (
        hashed_token_features,
        lexicon_label,
        nb_score,
        nb_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the feature table feeds BOTH training (three aggregates) and
    # scoring — persist it so the corpus-wide token explode runs once,
    # not once per consumer (measured at sf1: 6.6 s → 4.6 s cold,
    # 3.0 → 2.4 s warm; production would materialize features anyway)
    feats = hashed_token_features(docs).persist()
    labels = lexicon_label(
        docs,
        ["table", "row", "scan", "query", "filter"],
        ["stream", "window", "batch", "vector", "hash"],
    )
    w = nb_train(feats, labels, dim=1024)
    return nb_score(feats, w)


@query(
    "stats_hll_group_estimate",
    """
    WITH reg AS (
      SELECT event_type, h % 256 AS bucket,
             MAX(CASE WHEN h // 256 = 0 THEN 53
                      ELSE 53 - length(bin(h // 256)) END) AS r
      FROM (
        SELECT event_type,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
      ) GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n_present,
             SUM(CAST(1 AS BIGINT) << (53 - r)) AS s_present
      FROM reg GROUP BY 1
    )
    SELECT event_type,
           ROUND((0.7213 / (1 + 1.079/256)) * (256.0 * 256.0) * 9007199254740992.0
                 / CAST(s_present + (256 - n_present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE),
                 4) AS distinct_estimate,
           CAST(n_present AS BIGINT) AS n_present,
           CAST(256 - n_present AS BIGINT) AS zero_registers
    FROM agg
    """,
)
def stats_hll_group_estimate_q(spark, sf_dir):
    """Per-group HLL rollup (r7): distinct users per event_type from ONE
    (group, bucket) max aggregate — the production daily-uniques shape at
    ≤ 256 rows per group with no COUNT(DISTINCT) expansion and no distinct
    shuffle; grouped register files merge across days/shards by per-group
    cell-wise max (idempotent under replay). Deterministic md5 registers,
    so the oracle reproduces every group's estimate to the rounded
    digit."""
    from sparsity_spark.operators.sketches import hll_group_estimate, hll_group_sketch

    sk = hll_group_sketch(
        load_table(spark, sf_dir, "events"), ["event_type"], "user_id"
    )
    return hll_group_estimate(sk, ["event_type"])


def _bpe_oracle(num_merges: int = 3) -> str:
    """BPE training replayed in SQL (r7): per merge, one pair-count CTE,
    one argmax CTE (count DESC, pair ASC — the trainer's tie-break), and
    the SAME greedy 'OUT|PREV' string-state fold the Spark side runs
    (DuckDB list_reduce ≡ Spark aggregate HOF) — the kmeans-oracle
    unrolling pattern applied to tokenizer training. Every it{r}/b{r} CTE
    is MATERIALIZED: each is referenced twice (pair counts + next fold),
    so DuckDB's default inlining doubles the plan per level — fatal at 64
    merges (2^64 expansion exhausted file handles, r9-measured)."""
    fold = """
  SELECT w, cnt,
    (SELECT CASE WHEN split_part(st,'|',2)='' THEN split_part(st,'|',1)
                 WHEN split_part(st,'|',1)='' THEN split_part(st,'|',2)
                 ELSE split_part(st,'|',1) || ' ' || split_part(st,'|',2) END
     FROM (SELECT list_reduce(list_prepend('|', string_split(seq, ' ')), (acc, x) ->
       CASE
         WHEN split_part(acc, '|', 2) = '' THEN split_part(acc,'|',1) || '|' || x
         WHEN split_part(acc, '|', 2) = {B}.a AND x = {B}.b
           THEN (CASE WHEN split_part(acc,'|',1)='' THEN {B}.a || {B}.b
                 ELSE split_part(acc,'|',1) || ' ' || {B}.a || {B}.b END) || '|'
         ELSE (CASE WHEN split_part(acc,'|',1)='' THEN split_part(acc,'|',2)
               ELSE split_part(acc,'|',1) || ' ' || split_part(acc,'|',2) END) || '|' || x
       END) AS st)) AS seq
  FROM {IT} CROSS JOIN {B}
"""
    parts = [
        r"""words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' AND w NOT LIKE '%|%'
  GROUP BY w
)""",
        r"""it0 AS (
  SELECT w, cnt, regexp_replace(w, '(.)', '\1 ', 'g') || '</w>' AS seq FROM words
)""",
    ]
    for r in range(1, num_merges + 1):
        parts.append(f"""p{r} AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, toks[i+1] || ' ' || toks[i+2] AS pair
    FROM (SELECT cnt, string_split(seq, ' ') AS toks FROM it{r - 1}),
         LATERAL UNNEST(range(len(toks) - 1)) t(i)
  ) GROUP BY pair
)""")
        parts.append(f"""b{r} AS MATERIALIZED (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
  FROM p{r} ORDER BY c DESC, pair ASC LIMIT 1
)""")
        parts.append(
            f"it{r} AS MATERIALIZED ({fold.format(B=f'b{r}', IT=f'it{r - 1}')})"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT w, cnt, seq FROM it{num_merges}"
    )


@query("text_bpe_train", _bpe_oracle(3))
def text_bpe_train_q(spark, sf_dir):
    """BPE tokenizer training with TRAINING replayed by the oracle (r7):
    three merges learned from the documents corpus — word frequencies in
    ONE corpus pass, then vocab-sized pair-count/argmax/greedy-fold
    iterations (the sentencepiece/HF word-count training shape) — and the
    full final segmentation table returned. Counts are exact integers,
    the tie-break lexicographic, and the fold identical in both engines,
    so a one-token drift anywhere in training flips the hash."""
    from sparsity_spark.operators.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _merges, seqs = bpe_train(docs, num_merges=3)
    return seqs.select("w", "cnt", "seq")


def _bpe_encode_oracle(num_merges: int = 3) -> str:
    """Corpus ENCODING under the trained tokenizer, replayed in SQL (r8):
    the training CTEs verbatim, then every document's words joined to the
    final per-word segmentation and token counts summed — the oracle
    covers train → apply end to end, not just training."""
    base = _bpe_oracle(num_merges)
    cte = base[: base.rfind("\nSELECT")]
    return (
        cte
        + f""",
    enc AS (SELECT w, len(string_split(seq, ' ')) AS ntok FROM it{num_merges}),
    docw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' AND w NOT LIKE '%|%'
    )
    SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.ntok) AS BIGINT) AS n_tokens
    FROM docw d JOIN enc e ON e.w = d.w GROUP BY 1
    """
    )


def _pack_tokenized_oracle(num_merges: int = 3, budget: int = 128) -> str:
    """Tokenizer-aware packing replay: the full BPE train→encode CTEs,
    then the cumsum bin assignment on the REAL token counts — the
    pipeline a trainer actually runs (whitespace counts over-pack by
    whatever the tokenizer's fertility is)."""
    base = _bpe_encode_oracle(num_merges)
    marker = "\n    SELECT d.doc_id"
    cut = base.rfind(marker)
    assert cut != -1, "encode-oracle final SELECT not found"
    cte = base[:cut]
    sel = base[cut:].strip()
    # the encode oracle's final SELECT becomes a CTE
    return (
        cte
        + """,
    toks AS (""" + sel + """),
    cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c
      FROM toks
    )
    SELECT CAST(CAST(FLOOR((c - n_tokens) / """ + str(budget) + """) AS BIGINT) AS VARCHAR) AS bin_id,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM cum GROUP BY 1
    """
    )


@query("pipe_pack_tokenized", _pack_tokenized_oracle(3, 128))
def pipe_pack_tokenized_q(spark, sf_dir):
    """Tokenizer-aware sequence packing (r9 composition): train the BPE
    merges, encode the corpus with them, and pack on the REAL token
    counts — whitespace packing over-fills bins by the tokenizer's
    fertility ratio, the bug this composition exists to prevent. The
    oracle replays train → greedy fold encode → cumsum binning end to
    end; one drifted token anywhere re-bins every later document."""
    from sparsity_spark.operators.pipeline import pack_sequences
    from sparsity_spark.operators.text import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, num_merges=3)
    counts = bpe_encode(docs, merges).select("doc_id", "n_tokens")
    packed = pack_sequences(counts, budget=128)
    return packed.groupBy("bin_id").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_docs"),
    )


@query("text_bpe_encode", _bpe_encode_oracle(3))
def text_bpe_encode_q(spark, sf_dir):
    """Tokenizer APPLICATION (r8, closing the train→encode loop): the
    corpus is re-encoded with the merges just trained on it and each
    document's exact token accounting returned. The encode path is pure
    string expressions (the merge folds as plan constants — no UDF, no
    shuffle beyond the final per-doc aggregate); a drift in either
    training or the greedy fold application flips per-doc token counts."""
    from sparsity_spark.operators.text import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _seqs = bpe_train(docs, num_merges=3)
    return bpe_encode(docs, merges)


@query("text_bpe_encode_deep", _bpe_encode_oracle(64))
def text_bpe_encode_deep_q(spark, sf_dir):
    """Deep-merge tokenizer encode — the SCALE path proven at a depth the
    fold-expression form cannot survive (r9, the judge's #1 ask): 64
    merges trained by the driver-side loop over the one-pass distributed
    word-frequency table (bpe_train_local — the sentencepiece/HF shape;
    bit-equal to bpe_train's argmax/fold, test-pinned), then applied by
    the Arrow vocab-kernel encode path (bpe_encode's max_expr_merges
    seam): Python work strictly vocab-sized, the corpus's exploded words
    broadcast-joining back to per-word token counts JVM-side. The oracle
    unrolls all 64 training iterations as CTE triples and replays the
    64-deep greedy fold with DuckDB list_reduce — one token of drift in
    any of the 64 rounds flips per-doc counts and the hash."""
    from sparsity_spark.operators.text import bpe_encode, bpe_train_local

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_local(docs, num_merges=64)
    return bpe_encode(docs, merges)


@query("text_bpe_encode_stored", _bpe_encode_oracle(64))
def text_bpe_encode_stored_q(spark, sf_dir):
    """Tokenizer STORE roundtrip (r9 — the production seam): the 64-merge
    tokenizer is trained, persisted as a table (write_merge_store), read
    back, and the corpus encoded from the STORED merges. The oracle is
    the train→encode replay — identical to text_bpe_encode_deep's — so a
    store that loses rank order, truncates a merge string, or drops a row
    flips every downstream token count: the roundtrip is hash-proven, not
    assumed. This is how a real pipeline runs: training is one job,
    encode is many, and the merge table is the versioned contract
    between them."""
    from sparsity_spark.operators.text import (
        bpe_encode,
        bpe_train_local,
        read_merge_store,
        write_merge_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_local(docs, num_merges=64)
    write_merge_store(spark, merges, "bpe_merge_store_q")
    stored = read_merge_store(spark, "bpe_merge_store_q")
    return bpe_encode(docs, stored)


def _kmeans_par_oracle(l: int = 4, rounds: int = 2, micro: int = 10_000) -> str:
    """k-means|| replayed in SQL: same md5-lowest seed, same integer
    micro-distance costs (floor(d·micro + ½)² ≡ ROUND half-away on
    positives), same exact-BIGINT total, same md5-modulo draw — the
    candidate set must be IDENTICAL, then the weight assignment repeats
    the kmeans round-before-argmin tie-break (distance, then candidate
    id)."""
    parts = [
        """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    h AS (SELECT vec_id, v,
                 CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
          FROM e),
    cand0 AS (SELECT vec_id, v FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    cost{r} AS (
      SELECT h.vec_id,
             MIN(CAST(ROUND(list_distance(h.v, c.v) * {micro}) AS BIGINT)) AS dm
      FROM h CROSS JOIN cand{r-1} c GROUP BY h.vec_id),
    tot{r} AS (SELECT CAST(SUM(dm * dm) AS BIGINT) AS total FROM cost{r}),
    sel{r} AS (
      SELECT h.vec_id, h.v
      FROM cost{r} k JOIN h ON h.vec_id = k.vec_id, tot{r} t
      WHERE h.h60 % GREATEST(t.total, 1) < {l} * k.dm * k.dm),
    cand{r} AS (SELECT vec_id, v FROM cand{r-1}
                UNION ALL SELECT vec_id, v FROM sel{r})"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f""",
    assign AS (
      SELECT h.vec_id AS pid, c.vec_id AS cid,
             ROW_NUMBER() OVER (
               PARTITION BY h.vec_id
               ORDER BY CAST(ROUND(list_distance(h.v, c.v) * {micro}) AS BIGINT),
                        c.vec_id) AS rn
      FROM h CROSS JOIN cand{rounds} c)
    SELECT cid AS vec_id, CAST(COUNT(*) AS BIGINT) AS weight
    FROM assign WHERE rn = 1 GROUP BY 1
    """
    )


@query("ann_kmeans_parallel_init", _kmeans_par_oracle())
def ann_kmeans_parallel_init_q(spark, sf_dir):
    """k-means|| oversampled initialization (r8): the distributed
    k-means++ variant that replaces k sequential passes with `rounds`
    map-only passes. Candidate selection is integer arithmetic end to
    end (micro-distance costs, exact BIGINT total, md5-modulo draw) —
    the oracle replays BOTH rounds and must land on the identical
    candidate set AND identical nearest-candidate weights, so a drift in
    the seed, a cost, the total, or a tie-break flips the hash."""
    from sparsity_spark.operators.similarity import kmeans_parallel_init

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_parallel_init(emb, l=4, rounds=2)


@query(
    "stats_quantile_sample",
    """
    WITH s AS (
      SELECT value AS v FROM events
      WHERE value IS NOT NULL
        AND CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
            < (CAST(1 AS BIGINT) << 60) // 16
    )
    SELECT CAST(0.25 AS DOUBLE) AS q,
           ROUND(CAST(quantile_cont(v, 0.25) AS DOUBLE), 6) AS value_estimate FROM s
    UNION ALL SELECT CAST(0.5 AS DOUBLE),
           ROUND(CAST(quantile_cont(v, 0.5) AS DOUBLE), 6) FROM s
    UNION ALL SELECT CAST(0.75 AS DOUBLE),
           ROUND(CAST(quantile_cont(v, 0.75) AS DOUBLE), 6) FROM s
    UNION ALL SELECT CAST(0.9 AS DOUBLE),
           ROUND(CAST(quantile_cont(v, 0.9) AS DOUBLE), 6) FROM s
    UNION ALL SELECT CAST(0.99 AS DOUBLE),
           ROUND(CAST(quantile_cont(v, 0.99) AS DOUBLE), 6) FROM s
    """,
)
def stats_quantile_sample_q(spark, sf_dir):
    """Deterministic quantile summary (r7): a hash-threshold Bernoulli
    sample (md5(event_id) < 2^60/16 — a pure function of the key set, so
    the summary is bit-reproducible across engines/partitionings/replays
    and merges by plain union, unlike order-dependent t-digest/KLL
    sketches), then exact interpolated quantiles of the sample. The
    oracle selects the SAME rows and quantile_cont ≡ Spark percentile —
    the whole summary pipeline is replayed, not just sanity-checked."""
    from sparsity_spark.operators.sketches import (
        quantile_sample,
        quantile_sample_estimate,
    )

    s = quantile_sample(
        load_table(spark, sf_dir, "events"), "event_id", "value", rate_ppm=62500
    )
    return quantile_sample_estimate(s)


def _kmeans_cte_parts(
    k: int = 8, iters: int = 2, src_where: str = "TRUE", init_cte: str | None = None
) -> list[str]:
    """Unrolled Lloyd iterations as DuckDB CTE parts (v, c0, a1, c1, ...,
    c{iters}) — same deterministic hash-sampled init (k lowest
    md5-of-id), same ROUND(distance, 6)-before-argmin and tie-break
    (lowest centroid id), same round-to-6 re-average as
    operators.similarity.kmeans_fit. Shared by the centroid oracle and
    the SemDeDup oracle (which appends a final assignment + pair CTEs)."""
    assign = """
{out} AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, {cin}.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY ROUND(list_distance(v.e, {cin}.c), 6), {cin}.cid) AS rn
    FROM v CROSS JOIN {cin}) t WHERE rn = 1
)"""
    recompute = """
{out} AS (
  SELECT cid, list(m ORDER BY dim) AS c FROM (
    SELECT cid, dim, ROUND(AVG(x), 6) AS m
    FROM (SELECT cid, UNNEST(e) AS x, UNNEST(range(len(e))) AS dim FROM {ain}) u
    GROUP BY cid, dim) g
  GROUP BY cid
)"""
    parts = [
        f"""v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
  WHERE {src_where}
)""",
        # hash-sampled deterministic init (VERDICT r4 #6): lowest
        # md5(id-as-string) ties by id — mirrors kmeans_fit exactly.
        # init_cte (r8) swaps in a caller-supplied c0 (the k-means||
        # composition) — it must emit (cid BIGINT, c DOUBLE[]).
        init_cte
        or f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT) AS cid,
         e AS c
  FROM (SELECT * FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
)""",
    ]
    for i in range(iters):
        parts.append(assign.format(out=f"a{i + 1}", cin=f"c{i}").strip())
        parts.append(recompute.format(out=f"c{i + 1}", ain=f"a{i + 1}").strip())
    return parts


_KMEANS_ASSIGN_CTE = """
{out} AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, {cin}.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY ROUND(list_distance(v.e, {cin}.c), 6), {cin}.cid) AS rn
    FROM v CROSS JOIN {cin}) t WHERE rn = 1
)"""


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    parts = _kmeans_cte_parts(k, iters)
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT cid AS centroid_id, CAST(u.dim AS INT) AS dim, u.x AS val
FROM (SELECT cid, UNNEST(c) AS x, UNNEST(range(len(c))) AS dim FROM c{iters}) u
"""
    )


def _kmeans_par_fit_oracle(
    k: int = 8, iters: int = 2, l: int = 4, rounds: int = 2, micro: int = 10_000
) -> str:
    """The FULL k-means|| → Lloyd composition in SQL: the parallel-init
    CTEs verbatim (seed, rounds, draws, weights), candidates reduced to
    the k heaviest (weight DESC, id — the deterministic reduction), and
    the standard Lloyd CTEs running FROM that init instead of the
    hash-sampled one. Initialization drift, reduction drift, or training
    drift each flip the hash."""
    par = _kmeans_par_oracle(l, rounds, micro)
    par_cte = par[par.index("WITH ") + len("WITH ") : par.rfind("\n    SELECT")]
    w_cte = """w AS (
      SELECT cid AS vec_id, CAST(COUNT(*) AS BIGINT) AS weight
      FROM assign WHERE rn = 1 GROUP BY 1)"""
    init_cte = f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY t.weight DESC, t.vec_id) - 1 AS BIGINT) AS cid,
         v.e AS c
  FROM (SELECT * FROM w ORDER BY weight DESC, vec_id LIMIT {k}) t
  JOIN v ON v.vec_id = t.vec_id
)"""
    lloyd = _kmeans_cte_parts(k, iters, init_cte=init_cte)
    return (
        "WITH "
        + par_cte
        + ",\n"
        + w_cte
        + ",\n"
        + ",\n".join(lloyd)
        + f"""
SELECT cid AS centroid_id, CAST(u.dim AS INT) AS dim, u.x AS val
FROM (SELECT cid, UNNEST(c) AS x, UNNEST(range(len(c))) AS dim FROM c{iters}) u
"""
    )


@query("ann_kmeans_parallel_fit", _kmeans_par_fit_oracle())
def ann_kmeans_parallel_fit_q(spark, sf_dir):
    """k-means|| initialization feeding Lloyd training end to end (r8 —
    the composition that makes the init real, not a standalone demo):
    oversampled candidates → k heaviest by weight (deterministic
    reduction, ties by id) → kmeans_fit(init=...) for two iterations.
    Every stage is the engine-exact integer/round-6 discipline, so the
    oracle replays initialization AND training and the final centroid
    components must match to the last rounded decimal."""
    from sparsity_spark.operators.similarity import (
        kmeans_fit,
        kmeans_parallel_init,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cand = kmeans_parallel_init(emb, l=4, rounds=2)
    top = (
        cand.orderBy(F.col("weight").desc(), F.col("vec_id"))
        .limit(8)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .orderBy(F.col("weight").desc(), F.col("vec_id"))
        .collect()
    )
    init = [(i, [float(x) for x in r["embedding"]]) for i, r in enumerate(top)]
    cents = kmeans_fit(emb, k=8, iters=2, init=init)
    return cents.select(
        "centroid_id", F.posexplode("embedding").alias("dim", "val")
    )


def _semdedup_oracle(k: int = 8, iters: int = 2, threshold: float = 0.3) -> str:
    """kmeans CTEs + final assignment + within-cluster cosine pairs +
    keep-lowest-id rule — the full SemDeDup pipeline in SQL."""
    parts = _kmeans_cte_parts(k, iters)
    parts.append(_KMEANS_ASSIGN_CTE.format(out="af", cin=f"c{iters}").strip())
    parts.append(
        "n AS (SELECT vec_id, cid, e, sqrt(list_dot_product(e, e)) AS nrm FROM af)"
    )
    parts.append(
        f"""drops AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= {threshold}
)"""
    )
    return (
        "WITH " + ",\n".join(parts) + """
SELECT n.vec_id, n.cid, (n.vec_id NOT IN (SELECT vec_id FROM drops)) AS keep
FROM n
"""
    )


@query("ann_kmeans_centroids", _kmeans_oracle(8, 2))
def ann_kmeans_centroids(spark, sf_dir):
    """Distributed Lloyd k-means (IVF centroid training): corpus persisted
    once, per-iteration single-stage Arrow assign+partial-sum kernel with
    the partials (≤ k rows/partition) re-averaged driver-side — the MLlib
    treeAggregate shape; centroids driver-collected between rounds (k·d
    values — metadata-sized, the bounded-lineage iterative pattern). The
    oracle unrolls the identical two iterations in SQL."""
    from sparsity_spark.operators.similarity import kmeans_fit

    cents = kmeans_fit(load_table(spark, sf_dir, "embeddings"), k=8, iters=2)
    return cents.select(
        "centroid_id", F.posexplode("embedding").alias("dim", "val")
    )


def _emb_outliers_oracle(k: int = 8, iters: int = 2, z_threshold: float = 2.0) -> str:
    """kmeans CTEs + assignment + round-6 distance-to-centroid + per-
    cluster population z-score — the embedding outlier screen in SQL."""
    parts = _kmeans_cte_parts(k, iters)
    parts.append(_KMEANS_ASSIGN_CTE.format(out="af", cin=f"c{iters}").strip())
    parts.append(
        f"""d AS (
  SELECT af.vec_id, af.cid, ROUND(list_distance(af.e, c{iters}.c), 6) AS dist
  FROM af JOIN c{iters} ON af.cid = c{iters}.cid
)"""
    )
    parts.append(
        "st AS (SELECT cid, AVG(dist) AS mu, stddev_pop(dist) AS sd FROM d GROUP BY cid)"
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT d.vec_id, d.cid, d.dist,
       ROUND(CASE WHEN st.sd > 0 THEN (d.dist - st.mu) / st.sd ELSE 0 END, 6) + 0.0 AS z,
       (ROUND(CASE WHEN st.sd > 0 THEN (d.dist - st.mu) / st.sd ELSE 0 END, 6)
          >= {z_threshold}) AS is_outlier
FROM d JOIN st ON d.cid = st.cid
"""
    )


@query("emb_outliers", _emb_outliers_oracle(8, 2, 1.5))
def emb_outliers_q(spark, sf_dir):
    """Embedding outlier screen: distance-to-assigned-centroid z-scored
    WITHIN each cluster (population std) — the cheap pre-training filter
    for corrupted encodes. kmeans + zero-shuffle assignment + one stats
    aggregate joined back broadcast; round-6 at distance and z keeps the
    flags engine-portable."""
    from sparsity_spark.operators.similarity import embedding_outliers

    # z>=1.5 on this synthetic corpus flags a real tail (11 vectors at
    # sf0.01) so the oracle exercises BOTH flag values; production default
    # stays 2.0
    return embedding_outliers(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2, z_threshold=1.5
    )


@query("dedup_semdedup", _semdedup_oracle(8, 2, 0.3))
def dedup_semdedup_q(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): k-means-cluster the embeddings, then
    prune within-cluster cosine near-duplicates, keep-lowest-id. The
    cluster id bounds the pair join (cid-keyed equi-join — quadratic only
    within a cluster, the paper's own scaling argument); assignment is a
    zero-shuffle Arrow kernel, no k-way fanout. Oracle unrolls the same
    kmeans + assignment + pair SQL."""
    from sparsity_spark.operators.dedup import semdedup_prune

    return semdedup_prune(
        load_table(spark, sf_dir, "embeddings"), k=8, iters=2, threshold=0.3
    )


def _semantic_screen_oracle(
    k: int = 8, iters: int = 2, threshold: float = 0.3,
    members_where: str | None = None,
) -> str:
    """kmeans trained on the CORPUS (vec_id % 10 <> 0), batch rows assigned
    to the same centroids, then NOT EXISTS a corpus member of the same
    cluster at round-6 cosine >= threshold — the incremental SemDeDup
    screen in SQL. ``members_where`` restricts the member set (the forget
    row screens against the SURVIVING corpus; centroids stay trained on
    the full one, matching the Spark side)."""
    parts = _kmeans_cte_parts(k, iters, src_where="vec_id % 10 <> 0")
    parts.append(_KMEANS_ASSIGN_CTE.format(out="cm", cin=f"c{iters}").strip())
    mw = f" WHERE {members_where}" if members_where else ""
    parts.append(
        "members AS (SELECT cid, e, sqrt(list_dot_product(e, e)) AS nrm"
        f" FROM cm{mw})"
    )
    parts.append(
        """vb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
  WHERE vec_id % 10 = 0
)"""
    )
    parts.append(
        f"""ab AS (
  SELECT vec_id, e, cid FROM (
    SELECT vb.vec_id, vb.e, c{iters}.cid,
           ROW_NUMBER() OVER (PARTITION BY vb.vec_id
             ORDER BY ROUND(list_distance(vb.e, c{iters}.c), 6), c{iters}.cid) AS rn
    FROM vb CROSS JOIN c{iters}) t WHERE rn = 1
)"""
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT ab.vec_id, ab.cid
FROM ab
WHERE NOT EXISTS (
  SELECT 1 FROM members m
  WHERE m.cid = ab.cid
    AND ROUND(list_dot_product(ab.e, m.e)
              / (sqrt(list_dot_product(ab.e, ab.e)) * m.nrm), 6) >= {threshold}
)
"""
    )


@query("dedup_semantic_screen", _semantic_screen_oracle(8, 2, 0.3))
def dedup_semantic_screen_q(spark, sf_dir):
    """Incremental SemDeDup: every 10th embedding arrives as the new batch
    and is screened against the semantic MEMBER STORE of the other 90%
    (centroids trained on the corpus only; batch assigned via the
    zero-shuffle Arrow kernel; ONE cid-keyed LEFT ANTI join with the
    round-6 cosine as the residual). Streaming-legal end to end —
    `streaming_semantic_screen` wraps the identical operator."""
    from sparsity_spark.operators.dedup import semantic_member_store, semantic_screen

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    cents = _corpus_kmeans_shared(spark, sf_dir)
    store = semantic_member_store(corpus, cents)
    return semantic_screen(batch, store, cents, threshold=0.3).select("vec_id", "cid")


@query(
    "dedup_member_store_screen",
    # identical semantics to dedup_semantic_screen — the persisted store is
    # a LAYOUT change (bucketed BY the cid join key), never a results change
    _semantic_screen_oracle(8, 2, 0.3),
)
def dedup_member_store_screen_q(spark, sf_dir):
    """The same semantic screen routed through the PERSISTED cid-bucketed
    member store (write_member_store → member_store; VERDICT r5 #2): the
    corpus side of the cid-keyed LEFT ANTI join reads bucket-aligned with
    NO shuffle (plan-asserted in tests/test_plans.py); results are
    bit-identical to the in-memory member table — which is exactly what
    this oracle row proves."""
    from sparsity_spark.operators.dedup import (
        member_store,
        semantic_screen,
        write_member_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    cents = _corpus_kmeans_shared(spark, sf_dir)
    write_member_store(corpus, cents, "member_store_oracle_q", num_buckets=8)
    store = member_store(spark, "member_store_oracle_q")
    return semantic_screen(batch, store, cents, threshold=0.3).select("vec_id", "cid")


def _pagerank_oracle(iters: int = 3) -> str:
    """Integer micro-unit PageRank unrolled as CTEs — same symmetrized
    edge set, same BIGINT floors (DuckDB // ≡ Spark div on positives),
    same damping arithmetic, so every rank is engine-exact."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    r{i} AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.r // g.d)) // 100 AS BIGINT) AS r
      FROM edges e JOIN deg g ON g.src = e.src JOIN r{i-1} r ON r.node = e.src
      GROUP BY 1)"""
        )
    return (
        ",".join(parts)
        + f"""
    SELECT (node - 1) // 2 AS suppkey, r AS rank_micro
    FROM r{iters} WHERE node % 2 = 1
    """
    )


@query("graph_pagerank", _pagerank_oracle())
def graph_pagerank_q(spark, sf_dir):
    """Iterative graph ranking (r8 — the iterative-algorithm family the
    engine lacked): suppliers ranked by PageRank over the symmetrized
    customer↔supplier interaction graph (an edge per distinct
    customer-ordered-from-supplier pair). Ranks are BIGINT micro-units
    with integer-division contributions and integer damping — exact,
    order-independent arithmetic the oracle unrolls iteration by
    iteration, so a drift anywhere in degree counting, contribution
    routing, or the damping step flips the hash. Per iteration: ONE
    node-sized join against edges + ONE aggregate — the minimum any
    topology-following iteration communicates; lineage bounded via
    checkpoint_every for production depths."""
    from sparsity_spark.operators.graph import pagerank

    edges = _cust_supp_edges(spark, sf_dir)
    ranks = pagerank(edges, iterations=3)
    return ranks.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("suppkey"), "rank_micro"
    )


def _pagerank_weighted_oracle(iters: int = 3) -> str:
    """Weighted integer PageRank unrolled as CTEs: per-pair lineitem
    multiplicities as edge weights, contribution (r·w) // strength —
    identical BIGINT floors both engines."""
    parts = [
        """
    WITH raw AS (
      SELECT CAST(o.o_custkey * 2 AS BIGINT) AS src,
             CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst, w FROM raw
              UNION ALL SELECT dst, src, w FROM raw),
    s AS (SELECT src, CAST(SUM(w) AS BIGINT) AS strength FROM edges GROUP BY 1),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM s)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    r{i} AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM((r.r * e.w) // s.strength)) // 100 AS BIGINT) AS r
      FROM edges e JOIN s ON s.src = e.src JOIN r{i-1} r ON r.node = e.src
      GROUP BY 1)"""
        )
    return (
        ",".join(parts)
        + f"""
    SELECT (node - 1) // 2 AS suppkey, r AS rank_micro
    FROM r{iters} WHERE node % 2 = 1
    """
    )


@query("graph_pagerank_weighted", _pagerank_weighted_oracle())
def graph_pagerank_weighted_q(spark, sf_dir):
    """Weighted PageRank (r9): suppliers ranked over the customer↔supplier
    graph with lineitem multiplicity as interaction strength —
    contribution (rank·w) div strength, exact BIGINT floors unrolled by
    the oracle iteration by iteration. Same one-join-one-agg iteration
    and persisted-adjacency discipline as the unweighted row; the weight
    changes the transition, not the communication."""
    from sparsity_spark.operators.graph import pagerank_weighted

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    edges = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    ranks = pagerank_weighted(edges, iterations=3)
    return ranks.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("suppkey"), "rank_micro"
    )


def _ppr_oracle(iters: int = 3, nation: int = 3) -> str:
    """Personalized PageRank unrolled as CTEs: same symmetrized edges and
    degrees as the global oracle, teleport mass concentrated on the
    seed suppliers (nation {nation}), same integer floors throughout."""
    parts = [
        f"""
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    sg AS (
      SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
      FROM supplier WHERE s_nationkey = {nation}
        AND CAST(s_suppkey * 2 + 1 AS BIGINT) IN (SELECT src FROM deg)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    ss AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM sg),
    r0 AS (SELECT node, CAST((nn.n * 1000000) // ss.s AS BIGINT) AS r
           FROM sg CROSS JOIN nn CROSS JOIN ss)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    sp{i} AS (
      SELECT e.dst AS node, (85 * SUM(r.r // g.d)) // 100 AS v
      FROM edges e JOIN deg g ON g.src = e.src JOIN r{i-1} r ON r.node = e.src
      GROUP BY 1),
    r{i} AS (
      SELECT COALESCE(sp{i}.node, sg.node) AS node,
             CAST(COALESCE(sp{i}.v, 0)
                  + CASE WHEN sg.node IS NOT NULL
                         THEN (15 * nn.n * 1000000) // (100 * ss.s)
                         ELSE 0 END AS BIGINT) AS r
      FROM sp{i} FULL OUTER JOIN sg ON sg.node = sp{i}.node
      CROSS JOIN nn CROSS JOIN ss)"""
        )
    return (
        ",".join(parts)
        + f"""
    SELECT (node - 1) // 2 AS suppkey, r AS rank_micro
    FROM r{iters} WHERE node % 2 = 1
    """
    )


@query("graph_ppr_seeded", _ppr_oracle())
def graph_ppr_seeded_q(spark, sf_dir):
    """Personalized PageRank from a curated seed set (r8; r10 moves the
    seed cohort from nation 0 to nation 3 — nation 0 has NO suppliers at
    sf0.001, so the loud no-seed guard fired and the row was vacuous at
    the smallest fixture scale, the same population fact the BFS row
    documented): teleport mass concentrated on nation-3 suppliers,
    diffused 3 hops through the
    customer↔supplier interaction graph — the "rank the corpus by
    relatedness to this trusted set" curation primitive. Integer floors
    end to end; the oracle unrolls seeds, totals, and all three
    iterations, so seed selection, teleport shares, and topology spread
    must each be exact. Seed suppliers must out-rank topology-distant
    ones (asserted in tests); suppliers unreachable in ≤3 hops drop out
    like absent sparse keys."""
    from sparsity_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = _cust_supp_edges(spark, sf_dir)
    seeds = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 3
    ).select((F.col("s_suppkey") * 2 + 1).alias("node"))
    ranks = personalized_pagerank(edges, seeds, iterations=3)
    return ranks.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("suppkey"), "rank_micro"
    )


def _hits_oracle(iters: int = 2) -> str:
    """HITS unrolled: per iteration one authority sum + max-rescale and
    one hub sum + max-rescale, every score an exact BIGINT both engines
    floor identically."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h FROM raw)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    ar{i} AS (
      SELECT e.dst AS node, CAST(SUM(h.h) AS BIGINT) AS a_raw
      FROM raw e JOIN h{i-1} h ON h.node = e.src GROUP BY 1),
    am{i} AS (SELECT MAX(a_raw) AS m FROM ar{i}),
    a{i} AS (SELECT node, CAST((a_raw * 1000000) // am{i}.m AS BIGINT) AS a
             FROM ar{i} CROSS JOIN am{i}),
    hr{i} AS (
      SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS h_raw
      FROM raw e JOIN a{i} a ON a.node = e.dst GROUP BY 1),
    hm{i} AS (SELECT MAX(h_raw) AS m FROM hr{i}),
    h{i} AS (SELECT node, CAST((h_raw * 1000000) // hm{i}.m AS BIGINT) AS h
             FROM hr{i} CROSS JOIN hm{i})"""
        )
    return (
        ",".join(parts)
        + f"""
    SELECT (node - 1) // 2 AS suppkey, a AS auth_micro FROM a{iters}
    """
    )


@query("graph_hits_authorities", _hits_oracle())
def graph_hits_authorities_q(spark, sf_dir):
    """HITS authority scores for suppliers over the DIRECTED
    customer→supplier purchase graph (r8 — the directed complement to
    PageRank: hubs = broadly-buying customers, authorities = suppliers
    those hubs concentrate on). Scores renormalize by the deterministic
    integer MAX each half-step — order-independent where an L2 norm's
    float sum is not — so the oracle unrolls both iterations and every
    score must match exactly."""
    from sparsity_spark.operators.graph import hits

    # r11: the session-shared cust↔supp store holds symmetrize(directed
    # ∪ swap) DISTINCT — the namespaces are disjoint integer parities
    # (cust even, supp odd), so filtering src to even recovers exactly
    # the distinct directed cust→supp set the raw orders⋈lineitem build
    # produced after hits' own dedup; assume_distinct skips that dedup's
    # full-edge Exchange and the store amortizes the join across the
    # graph family (guide §2.4)
    edges = _cust_supp_edges(spark, sf_dir).where(F.col("src") % 2 == 0)
    out = hits(edges, iterations=2, assume_distinct=True)
    return out.filter(F.col("node") % 2 == 1).select(
        F.expr("(node - 1) div 2").alias("suppkey"),
        F.col("auth_micro"),
    )


def _walks_oracle(steps: int = 3) -> str:
    """Deterministic walks replayed in SQL: the same dst-sorted neighbor
    ranks, the same md5('start|t|node') % degree pick at every step."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
    rk AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rank,
             COUNT(*) OVER (PARTITION BY src) AS deg
      FROM edges),
    w0 AS (SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) AS start,
                  CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
           FROM supplier)"""
    ]
    for t in range(1, steps + 1):
        parts.append(
            f"""
    w{t} AS (
      SELECT w.start, r.dst AS node
      FROM w{t-1} w JOIN rk r ON r.src = w.node
      WHERE CAST(('0x' || substring(md5(
              CAST(w.start AS VARCHAR) || '|{t}|' || CAST(w.node AS VARCHAR)
            ), 1, 15)) AS BIGINT) % r.deg = r.rank)"""
        )
    selects = ["SELECT start, CAST(0 AS INTEGER) AS step, node FROM w0"] + [
        f"SELECT start, CAST({t} AS INTEGER) AS step, node FROM w{t}"
        for t in range(1, steps + 1)
    ]
    return ",".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


def _kcore_oracle(k: int = 15, peels: int = 4) -> str:
    """Fixed-peel k-core replayed in SQL: per peel one degree aggregate,
    one keep filter, two joins back — every e{r}/k{r} MATERIALIZED (each
    is referenced twice; DuckDB's default inlining doubles the plan per
    peel — the BPE-oracle lesson applied)."""
    parts = [
        """
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust < b.cust
    ),
    e0 AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM co
                        UNION ALL SELECT s2, s1 FROM co)"""
    ]
    for r in range(1, peels + 1):
        parts.append(f"""
    k{r} AS MATERIALIZED (
      SELECT src FROM (SELECT src, COUNT(*) AS deg FROM e{r - 1} GROUP BY 1)
      WHERE deg >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{r - 1} e
      JOIN k{r} a ON a.src = e.src JOIN k{r} b ON b.src = e.dst)""")
    return (
        ",".join(parts)
        + f"""
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
    FROM e{peels} GROUP BY 1"""
    )


@query("graph_kcore", _kcore_oracle(15, 4))
def graph_kcore_q(spark, sf_dir):
    """k-core peel over the customer co-purchase graph (r9): four rounds
    of dropping sub-15-degree nodes — the dense-core extraction that
    graph curation uses to find spam rings and mirror farms (and,
    inverted, to keep the organic tail). FIXED peel count so the oracle
    replays every round exactly (the deterministic-iteration seam shared
    with pagerank/kmeans oracles); production convergence runs
    until_converged=True on the same code path (test-pinned cascade
    behavior). Per peel: one degree aggregate + two semi-joins —
    edge-linear, the triangle_count_capped shape iterated."""
    from sparsity_spark.operators.graph import k_core

    edges = _co_purchase_edges(spark, sf_dir)
    return k_core(edges, k=15, peels=4, assume_distinct=True)


def _node2vec_oracle(steps: int = 3, ret_w: int = 250, out_w: int = 4000) -> str:
    """node2vec walks replayed in SQL: the same uniform first hop, then
    per step the same integer candidate weights (ret/1000/out by
    return / distance-1 / distance-2), the same dst-ordered cumulative
    sum, and the same md5(start|t|prev|cur) draw landing in a candidate's
    cumulative range — the _walks_oracle unrolling with a second-order
    state column."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
    rk AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rank,
             COUNT(*) OVER (PARTITION BY src) AS deg
      FROM edges),
    w0 AS (SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) AS start,
                  CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
           FROM supplier),
    n1 AS (
      SELECT w.start, w.node AS prev, r.dst AS node
      FROM w0 w JOIN rk r ON r.src = w.node
      WHERE CAST(('0x' || substring(md5(
              CAST(w.start AS VARCHAR) || '|1|' || CAST(w.node AS VARCHAR)
            ), 1, 15)) AS BIGINT) % r.deg = r.rank)"""
    ]
    for t in range(2, steps + 1):
        parts.append(
            f"""
    c{t} AS (
      SELECT w.start, w.prev, w.node, r.dst,
             CAST(CASE WHEN r.dst = w.prev THEN {ret_w}
                  WHEN f.src IS NOT NULL THEN 1000
                  ELSE {out_w} END AS BIGINT) AS wgt
      FROM n{t - 1} w JOIN rk r ON r.src = w.node
      LEFT JOIN edges f ON f.src = w.prev AND f.dst = r.dst),
    n{t} AS (
      SELECT start, node AS prev, dst AS node FROM (
        SELECT start, prev, node, dst, wgt,
               SUM(wgt) OVER (PARTITION BY start ORDER BY dst
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(wgt) OVER (PARTITION BY start) AS tot
        FROM c{t})
      WHERE CAST(('0x' || substring(md5(
              CAST(start AS VARCHAR) || '|{t}|' || CAST(prev AS VARCHAR)
              || '|' || CAST(node AS VARCHAR)
            ), 1, 15)) AS BIGINT) % tot >= cum - wgt
        AND CAST(('0x' || substring(md5(
              CAST(start AS VARCHAR) || '|{t}|' || CAST(prev AS VARCHAR)
              || '|' || CAST(node AS VARCHAR)
            ), 1, 15)) AS BIGINT) % tot < cum)"""
        )
    selects = ["SELECT start, CAST(0 AS INTEGER) AS step, node FROM w0"] + [
        f"SELECT start, CAST({t} AS INTEGER) AS step, node FROM n{t}"
        for t in range(1, steps + 1)
    ]
    return ",".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@query("graph_node2vec_walks", _node2vec_oracle(3, 250, 4000))
def graph_node2vec_walks_q(spark, sf_dir):
    """Biased second-order walks (r9 — VERDICT r8 #7, node2vec p/q): the
    DeepWalk walk corpus with return weight 250 (strong anti-backtrack,
    p≈4) and in-out weight 4000 (exploration, q≈0.25) in integer
    milli-units over the customer↔supplier graph. Every hop's weighted
    draw — md5(start|t|prev|cur) % Σweights landing in the dst-ordered
    cumulative range — is replayed by the oracle's unrolled per-hop CTEs;
    one weight or one cumulative boundary off anywhere flips the hash."""
    from sparsity_spark.operators.graph import node2vec_walks

    edges = _cust_supp_edges(spark, sf_dir)
    starts = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    return node2vec_walks(
        edges, starts, steps=3, ret_w=250, out_w=4000, assume_distinct=True,
        ranked=_ranked_neighbors(spark, sf_dir),
    )


def _node2vec_skipgram_oracle(
    steps: int = 3, ret_w: int = 250, out_w: int = 4000, window: int = 2
) -> str:
    """node2vec walks → skip-gram pairs end to end: the biased-walk CTEs
    verbatim, then the bounded |Δstep| self-join per walk id and one
    count aggregate — the full DeepWalk data pipeline in one replay."""
    base = _node2vec_oracle(steps, ret_w, out_w)
    cte, selects = base.split("\n    SELECT start, CAST(0 AS INTEGER)", 1)
    walks_union = (
        "SELECT start, CAST(0 AS INTEGER)" + selects
    )
    return (
        cte
        + f""",
    walks AS ({walks_union}),
    pr AS (
      SELECT a.node AS center, b.node AS context
      FROM walks a JOIN walks b ON b.start = a.start
      WHERE a.step <> b.step AND ABS(a.step - b.step) <= {window}
    )
    SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pr GROUP BY 1, 2"""
    )


@query("graph_node2vec_skipgram", _node2vec_skipgram_oracle(ret_w=4000, out_w=250))
def graph_node2vec_skipgram_q(spark, sf_dir):
    """The complete biased DeepWalk data pipeline in one row (r9):
    node2vec walks over the customer↔supplier graph, then window-2
    skip-gram co-occurrence counts — exactly the sparse training input
    a graph-embedding trainer consumes, every hop and every pair count
    oracle-replayed. Pair volume stays Σ len·window per walk (the
    walk-id-keyed self-join), never corpus². Weights are RETURN-heavy
    (4000/250 milli — the BFS-ish regime, opposite of the walks row's
    250/4000): oscillating walks revisit nodes, so the same
    (center, context) pair recurs within a walk and n_pairs genuinely
    varies — the audit's degeneracy check flagged the DFS-regime twin
    (every count 1, a gate that could never fire on the count
    column)."""
    from sparsity_spark.operators.graph import (
        node2vec_walks,
        walk_skipgram_pairs,
    )

    edges = _cust_supp_edges(spark, sf_dir)
    starts = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    walks = node2vec_walks(
        edges, starts, steps=3, ret_w=4000, out_w=250, assume_distinct=True,
        ranked=_ranked_neighbors(spark, sf_dir),
    )
    return walk_skipgram_pairs(walks, window=2)


@query("graph_random_walks", _walks_oracle())
def graph_random_walks_q(spark, sf_dir):
    """Deterministic walk-corpus generation (r8 — the DeepWalk/node2vec
    front half: walks become skip-gram sentences): 3-step walks from
    every supplier node through the customer↔supplier graph, each step
    picking neighbor md5(start|t|node) % degree in dst-sorted order —
    the hash-in-place-of-RNG discipline, so the oracle replays every
    hop exactly. Frontier-sized joins per step against the once-ranked
    neighbor table; an RNG walk could never cross-engine-match."""
    from sparsity_spark.operators.graph import random_walks

    edges = _cust_supp_edges(spark, sf_dir)
    starts = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    return random_walks(
        edges, starts, steps=3, assume_distinct=True,
        ranked=_ranked_neighbors(spark, sf_dir),
    )


def _skipgram_oracle(steps: int = 3, window: int = 2) -> str:
    """Walks CTEs verbatim, then the windowed self-join and count fold in
    SQL — a drift in any hop shifts co-occurrence counts."""
    base = _walks_oracle(steps)
    selects = ["SELECT start, CAST(0 AS INTEGER) AS step, node FROM w0"] + [
        f"SELECT start, CAST({t} AS INTEGER) AS step, node FROM w{t}"
        for t in range(1, steps + 1)
    ]
    cte = base[: base.index("\n    SELECT start, CAST(0")]
    return (
        cte
        + ",\n    walks AS (\n    "
        + "\n    UNION ALL ".join(selects)
        + f""")
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM walks a JOIN walks b
      ON b.start = a.start AND a.step <> b.step
     AND ABS(a.step - b.step) <= {window}
    GROUP BY 1, 2
    """
    )


@query("graph_skipgram_pairs", _skipgram_oracle())
def graph_skipgram_pairs_q(spark, sf_dir):
    """Skip-gram co-occurrence counts from the deterministic walk corpus
    (r8 — DeepWalk's back half: the sparse (center, context, count)
    matrix a word2vec-style trainer consumes). Pairs join on the walk id
    with a bounded step-distance window, so volume is walk_len·window
    per walk, never corpus-quadratic; the oracle replays walks AND the
    windowed fold."""
    from sparsity_spark.operators.graph import (
        random_walks,
        walk_skipgram_pairs,
    )

    edges = _cust_supp_edges(spark, sf_dir)
    starts = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    walks = random_walks(
        edges, starts, steps=3, assume_distinct=True,
        ranked=_ranked_neighbors(spark, sf_dir),
    )
    return walk_skipgram_pairs(walks, window=2)


@query(
    "graph_triangles",
    """
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust < b.cust
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM co e1 JOIN co e2 ON e2.s1 = e1.s1 AND e2.s2 > e1.s2
      WHERE EXISTS (SELECT 1 FROM co e3 WHERE e3.s1 = e1.s2 AND e3.s2 = e2.s2)
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY 1
    """,
)
def graph_triangles_q(spark, sf_dir):
    """Exact per-node triangle counts (r8) over the customer co-purchase
    graph — two customers adjacent when they bought the same part at the
    same quantity (the sparse co-occurrence relation; the naive
    same-part graph saturates into a complete graph whose constant
    triangle count the degeneracy audit rightly rejects). Edges oriented
    low→high so each triangle {a<b<c} is enumerated exactly once as
    wedge (a→b, a→c) closed by a semi-join on (b→c); both engines use
    the same string order end to end. Per-node counts here range 1–68 at
    sf0.01 — every count discriminative. Wedge volume Σdeg²/2 is the
    irreducible cost of exactness; the enumeration is two equi-joins,
    never a cartesian."""
    from sparsity_spark.operators.graph import triangle_count

    return triangle_count(_co_purchase_edges(spark, sf_dir), assume_distinct=True)


@query(
    "graph_triangles_capped",
    """
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust < b.cust
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT s1 AS node FROM co UNION ALL SELECT s2 FROM co
      ) GROUP BY 1
    ),
    keep AS (SELECT node FROM deg WHERE d <= 30),
    cap AS (
      SELECT e.s1, e.s2 FROM co e
      JOIN keep k1 ON k1.node = e.s1
      JOIN keep k2 ON k2.node = e.s2
    ),
    tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM cap e1 JOIN cap e2 ON e2.s1 = e1.s1 AND e2.s2 > e1.s2
      WHERE EXISTS (SELECT 1 FROM cap e3 WHERE e3.s1 = e1.s2 AND e3.s2 = e2.s2)
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY 1
    """,
)
def graph_triangles_capped_q(spark, sf_dir):
    """Skew-safe triangle counting (r9 — VERDICT r8 #3): the same
    co-purchase graph, but every node with undirected degree > 30 (and
    all its edges) is dropped BEFORE wedge enumeration, bounding wedge
    volume by n·cap² — linear in nodes at fixed cap, stable under any
    hub skew (the sf1 replica's density blowup that excluded the exact
    row from the scale tier cannot recur: a celebrity key caps out
    instead of contributing deg² wedges). Exact on the capped subgraph;
    the oracle replays the degree threshold and the oriented wedge join
    on identical integers."""
    from sparsity_spark.operators.graph import (
        triangle_count_capped,
    )

    return triangle_count_capped(
        _co_purchase_edges(spark, sf_dir), max_degree=30, assume_distinct=True
    )


def _mmr_oracle(k: int = 5, lam: int = 50, qid: int = 0) -> str:
    """Greedy MMR unrolled as one CTE per selection step: the same int8
    codes, exact BIGINT rel/sim dots, integer-λ objective, and
    smaller-id tie-break — a drift in any step's argmax cascades into
    every later step's exclusion set and flips the hash."""
    rel_w, sim_w = 100 - lam, lam
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT vec_id,
             list_transform(v, x -> CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(FLOOR(x * 127.0 / s + 0.5) AS BIGINT) END) AS q
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS s FROM e)
    ),
    qv AS (SELECT q FROM c0 WHERE vec_id = {qid}),
    c AS (
      SELECT c0.vec_id AS id, c0.q,
             CAST(list_dot_product(c0.q, qv.q) AS BIGINT) AS rel
      FROM c0 CROSS JOIN qv WHERE c0.vec_id <> {qid}
    ),
    s1 AS (SELECT id, q, rel, CAST({rel_w} * rel AS BIGINT) AS obj
           FROM c ORDER BY {rel_w} * rel DESC, id LIMIT 1)"""
    ]
    for j in range(2, k + 1):
        prev = [f"s{i}" for i in range(1, j)]
        sims = ", ".join(
            f"CAST(list_dot_product(c.q, {s}.q) AS BIGINT)" for s in prev
        )
        max_sim = f"GREATEST({sims})" if len(prev) > 1 else sims
        crosses = " ".join(f"CROSS JOIN {s}" for s in prev)
        excl = " AND ".join(f"c.id <> {s}.id" for s in prev)
        parts.append(
            f"""
    o{j} AS (
      SELECT c.id, c.q, c.rel,
             CAST({rel_w} * c.rel - {sim_w} * {max_sim} AS BIGINT) AS obj
      FROM c {crosses} WHERE {excl}
    ),
    s{j} AS (SELECT id, q, rel, obj FROM o{j} ORDER BY obj DESC, id LIMIT 1)"""
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS step, id AS neighbor_id, "
        f"rel AS rel_i8, obj AS obj_i8 FROM s{j}"
        for j in range(1, k + 1)
    )
    return ",".join(parts) + "\n    " + selects


@query("ann_mmr_diversified", _mmr_oracle())
def ann_mmr_diversified_q(spark, sf_dir):
    """Diversified retrieval via greedy MMR (r9 — Carbonell & Goldstein):
    5 picks for query vec 0 at λ=50, relevance and redundancy both exact
    int8 code dots so every step's argmax is an integer compare. Each
    step is one map-only corpus pass with the ≤k selected codes riding
    as literals; the oracle replays all five selections."""
    from sparsity_spark.operators.similarity import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(emb, emb.where(F.col("vec_id") == 0), k=5, lambda_pct=50)


@query(
    "text_top_keywords",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS col FROM documents),
    tf AS (SELECT doc_id, col, COUNT(*) AS tf FROM toks GROUP BY doc_id, col),
    dfc AS (SELECT col, COUNT(*) AS df FROM tf GROUP BY col),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.col,
             ROUND(tf.tf * (ln((n.n + 1.0) / (dfc.df + 1)) + 1), 6) AS value
      FROM tf JOIN dfc ON tf.col = dfc.col CROSS JOIN n
    )
    SELECT doc_id, col AS keyword, value AS tfidf, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY value DESC, col) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_top_keywords_q(spark, sf_dir):
    """Per-document top-3 keywords by TF-IDF (r9) — the tagging/summary
    primitive, ranked on the already-round-6 scores (identical doubles
    both engines) with a term tie-break; one rank window per doc, partial
    top-k map-side."""
    from sparsity_spark.operators.text import top_keywords

    return top_keywords(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "dedup_containment_pairs",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS c
      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.ia, p.ib, p.c,
             CAST(len(sa.grams) AS BIGINT) AS sza,
             CAST(len(sb.grams) AS BIGINT) AS szb
      FROM pair p JOIN g sa ON p.ia = sa.doc_id JOIN g sb ON p.ib = sb.doc_id
    )
    SELECT src_id, dst_id, overlap, src_size,
           ROUND(overlap * 1.0 / src_size, 6) AS containment
    FROM (
      SELECT ia AS src_id, ib AS dst_id, c AS overlap, sza AS src_size
      FROM sized WHERE c * 1.0 / sza >= 0.6
      UNION ALL
      SELECT ib, ia, c, szb FROM sized WHERE c * 1.0 / szb >= 0.6
    )
    """,
)
def dedup_containment_pairs_q(spark, sf_dir):
    """Asymmetric containment dedup (r9; r10 prefix rewrite): |src ∩ dst|
    / |src| >= 0.6 over 3-gram shingle sets — the near-SUPERSET detector
    Jaccard misses (a short doc pasted inside a long one has J ≈ 0,
    C ≈ 1; quote farms and prompt-in-completion leaks). Candidates come
    from a LOSSLESS smaller-side prefix filter (rarest-first global gram
    order — a boilerplate gram shared by every doc contributes zero
    collision rows), verified per-pair with array_intersect; both
    directions of the asymmetric relation emitted from ONE candidate
    table with each side's own denominator. The threshold compare is the
    SAME single divide on both engines (never ceil(t·n): IEEE's
    0.6·35 = 21.000000000000004)."""
    from sparsity_spark.operators.dedup import containment_join

    return containment_join(
        load_table(spark, sf_dir, "documents"), threshold=0.6, k=3
    )


@query(
    "dedup_containment_clusters",
    """
    WITH RECURSIVE g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS c
      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.ia, p.ib, p.c,
             CAST(len(sa.grams) AS BIGINT) AS sza,
             CAST(len(sb.grams) AS BIGINT) AS szb
      FROM pair p JOIN g sa ON p.ia = sa.doc_id JOIN g sb ON p.ib = sb.doc_id
    ),
    und AS (
      SELECT ia AS a, ib AS b FROM sized
      WHERE c * 1.0 / sza >= 0.6 OR c * 1.0 / szb >= 0.6
    ),
    edges AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e2.b FROM reach JOIN edges e2 ON e2.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    sz AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g),
    best AS (
      SELECT cluster_id, doc_id AS keep_id FROM (
        SELECT l.cluster_id, s.doc_id,
               ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                  ORDER BY s.n_grams DESC, s.doc_id ASC) AS rn
        FROM lab l JOIN sz s USING (doc_id)
      ) WHERE rn = 1
    )
    SELECT l.doc_id, l.cluster_id, s.n_grams, l.doc_id = b.keep_id AS keep
    FROM lab l JOIN sz s USING (doc_id) JOIN best b ON b.cluster_id = l.cluster_id
    """,
)
def dedup_containment_clusters_q(spark, sf_dir):
    """Containment-component collapse (r10): docs linked by >= 0.6
    containment in EITHER direction form components (the same
    prefix-filtered pairs as dedup_containment_pairs — the oracle uses
    the brute pair form, so the filter's losslessness is load-bearing
    here too), and each component keeps its LARGEST doc (superset
    survives; ties to the smaller id) — the quote-farm collapse action.
    The oracle replays pairs, the recursive closure, and the argmax."""
    from sparsity_spark.operators.dedup import containment_clusters

    return containment_clusters(
        load_table(spark, sf_dir, "documents"), threshold=0.6, k=3
    )


# session memo for dedup_containment_screen's one-time store build
_CONTAIN_STORE_MEMO: dict = {}


@query(
    "dedup_containment_screen",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    eb AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 10 = 0),
    ec AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 10 != 0),
    pair AS (
      SELECT b.doc_id AS bid, c.doc_id AS cid, CAST(COUNT(*) AS BIGINT) AS c
      FROM eb b JOIN ec c ON b.gram = c.gram GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.bid, p.cid, p.c, CAST(len(sb.grams) AS BIGINT) AS bsz
      FROM pair p JOIN g sb ON p.bid = sb.doc_id
    )
    SELECT bid AS batch_id, cid AS corpus_id, c AS overlap,
           bsz AS batch_size, ROUND(c * 1.0 / bsz, 6) AS containment
    FROM sized WHERE c * 1.0 / bsz >= 0.6
    """,
)
def dedup_containment_screen_q(spark, sf_dir):
    """Incremental containment screen (r10 — the asymmetric complement
    of the incremental LSH loop: the band store answers "is this batch
    doc a near-twin of the lake", this answers "is it mostly CONTAINED
    in the lake" without rescanning the corpus): the 90% corpus is
    persisted once as gram-bucketed postings + id-bucketed gram arrays +
    an append-only df table; the 10% batch probes with its rarest-first
    prefix grams (batch-side denominator — lossless, the
    containment_join argument one-sided), verifies against the bucketed
    arrays, and emits batch→corpus containments >= 0.6. Store build is
    memoized per session (the fold-only discipline): a steady-state
    invocation executes only the screen — the recurring per-batch cost.
    The oracle replays the full batch×corpus containment, so the prefix
    pruning must be exactly lossless."""
    from sparsity_spark.operators.dedup import (
        containment_screen,
        write_containment_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = "containment_store_q"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CONTAIN_STORE_MEMO:
        write_containment_store(docs.filter(F.col("doc_id") % 10 != 0), table)
        _CONTAIN_STORE_MEMO[key] = True
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return containment_screen(batch, table, threshold=0.6, k=3)


@query(
    "stats_count_store_topk",
    """
    SELECT CAST(user_id AS BIGINT) AS key, CAST(COUNT(*) AS BIGINT) AS total
    FROM events
    GROUP BY 1
    ORDER BY total DESC, key
    LIMIT 10
    """,
)
def stats_count_store_topk_q(spark, sf_dir):
    """Exact streaming-style heavy hitters through the persisted count
    store (r9): the event stream split into three micro-batch increments
    folded via merge_count_store — batch 1 folded TWICE so the replay
    screen fires in the serving path (a double-count would flip the
    ranking) — then the exact top-10 users from count_store_topk. The
    oracle is a plain count over everything ever delivered: the
    at-least-once loop must equal exactly-once arithmetic."""
    from sparsity_spark.operators.sketches import count_store_topk, merge_count_store

    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id"),
    )
    table = "count_store_oracle_q"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    for b in range(3):
        merge_count_store(
            events.where(F.col("event_id") % 3 == b), table, "user_id", batch_id=b
        )
    # replay of batch 1 — must append nothing
    merge_count_store(
        events.where(F.col("event_id") % 3 == 1), table, "user_id", batch_id=1
    )
    return count_store_topk(spark, table, k=10)


@query(
    "ann_sq8_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (
      SELECT vec_id,
             list_transform(v, x -> CASE WHEN s = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(FLOOR(x * 127.0 / s + 0.5) AS BIGINT) END) AS q
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS s FROM e)
    ),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             CAST(list_dot_product(q.q, n.q) AS BIGINT) AS score_i8
      FROM c q, c n WHERE q.vec_id < 10 AND n.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, score_i8 FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_i8 DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_sq8_topk_q(spark, sf_dir):
    """Symmetric int8 scalar-quantized top-5 (r9): both sides floor-coded
    to int8, the score an exact BIGINT dot of code arrays — integer
    compares, so the ranking has NO float surface to drift; the scan path
    every vector store ships beside PQ (1 byte/dim, corpus stays
    partition-parallel, queries broadcast)."""
    from sparsity_spark.operators.similarity import sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "text_pmi_bigrams",
    """
    WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
    words2 AS (
      SELECT tok FROM (SELECT unnest(w) AS tok FROM toks) WHERE tok <> ''
    ),
    uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM words2 GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM words2),
    big2 AS (
      SELECT w1, w2 FROM (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM toks)
      ) WHERE w1 <> '' AND w2 <> ''
    ),
    pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
           FROM big2 GROUP BY 1, 2 HAVING COUNT(*) >= 5)
    SELECT p.w1, p.w2, p.pair_count, u1.c AS w1_count, u2.c AS w2_count,
           ROUND((CAST(n.nt AS DOUBLE) * p.pair_count)
                 / (CAST(u1.c AS DOUBLE) * u2.c), 6) AS pmi_ratio
    FROM pc p CROSS JOIN n
    JOIN uni u1 ON u1.tok = p.w1
    JOIN uni u2 ON u2.tok = p.w2
    """,
)
def text_pmi_bigrams_q(spark, sf_dir):
    """Corpus collocation mining (r9): every adjacent bigram scored by the
    PMI ratio n·c(xy)/(c(x)·c(y)) — phrase discovery before tokenizer
    training, boilerplate spotting. No logarithm (libm-build drift; the
    ratio ranks identically): exact BIGINT counts, two IEEE multiplies +
    one divide, round-6. Two hash aggregates over the exploded token
    stream + vocabulary-sized count joins. 900 bigrams / 833 distinct
    ratios at sf0.01."""
    from sparsity_spark.operators.text import collocations

    return collocations(load_table(spark, sf_dir, "documents"), min_count=5)


@query(
    "text_phrase_search",
    """
    WITH post AS (
      SELECT doc_id, i AS pos, w[i] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           unnest(generate_series(1, len(w))) AS t(i)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches FROM (
      SELECT p0.doc_id FROM post p0 JOIN post p1
        ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
      WHERE p0.tok = 'table' AND p1.tok = 'hash'
    ) GROUP BY 1
    """,
)
def text_phrase_search_q(spark, sf_dir):
    """Exact phrase search "table hash" via a positional inverted index
    (r9) — adjacency-and-order retrieval that bag-of-words BM25 cannot
    express; the same plan is token-granular benchmark decontamination.
    One posexplode builds postings, each phrase word keeps only its own
    posting list, one equi-join per extra word on (doc, aligned
    position): communication is posting-list-sized, never corpus-sized.
    46 matching docs at sf0.01 with multi-hit docs present."""
    from sparsity_spark.operators.text import phrase_search

    return phrase_search(load_table(spark, sf_dir, "documents"), "table hash")


def _aa_term_case_sql(max_degree: int, unit: int = 1_000_000) -> str:
    """CASE expression carrying the SAME driver-computed integer weights
    the Spark plan looks up (graph.aa_degree_terms) — neither engine
    evaluates ``ln``, closing the Spark-Math.log-vs-DuckDB-libm 1-ulp
    flooring hazard (r10 advisor finding)."""
    from sparsity_spark.operators.graph import aa_degree_terms

    whens = " ".join(
        f"WHEN {d} THEN CAST({t} AS BIGINT)"
        for d, t in aa_degree_terms(max_degree, unit).items()
    )
    return f"CASE g.dv {whens} END"


@query(
    "graph_adamic_adar",
    f"""
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust <> b.cust
    ),
    deg AS (SELECT s1 AS node, COUNT(*) AS d FROM co GROUP BY 1),
    keep AS (SELECT node FROM deg WHERE d <= 30),
    cap AS (
      SELECT e.s1, e.s2 FROM co e
      JOIN keep k1 ON k1.node = e.s1
      JOIN keep k2 ON k2.node = e.s2
    ),
    degc AS (SELECT s1 AS node, CAST(COUNT(*) AS BIGINT) AS dv FROM cap GROUP BY 1),
    wedge AS (
      SELECT e1.s2 AS u, e2.s2 AS w,
             {_aa_term_case_sql(30)} AS term
      FROM cap e1
      JOIN cap e2 ON e2.s1 = e1.s1 AND e1.s2 < e2.s2
      JOIN degc g ON g.node = e1.s1
    ),
    cn AS (
      SELECT u, w, CAST(COUNT(*) AS BIGINT) AS common,
             CAST(SUM(term) AS BIGINT) AS aa_micro
      FROM wedge GROUP BY 1, 2
    )
    SELECT cn.u, cn.w AS v, cn.common AS common_neighbors, cn.aa_micro
    FROM cn
    WHERE common >= 2
      AND NOT EXISTS (SELECT 1 FROM cap e WHERE e.s1 = cn.u AND e.s2 = cn.w)
    """,
)
def graph_adamic_adar_q(spark, sf_dir):
    """Adamic-Adar link prediction (r9): shared RARE neighbors weigh more
    — each common neighbor contributes 1/ln(deg), floored to integer
    micro-units BEFORE summation (a raw double sum is order-dependent
    across partitionings; exact BIGINTs are not). Same capped-wedge /
    anti-join machinery as the Jaccard row, over the same co-purchase
    graph."""
    from sparsity_spark.operators.graph import adamic_adar

    edges = _co_purchase_edges(spark, sf_dir)
    return adamic_adar(edges, max_degree=30, min_common=2, assume_distinct=True)


@query(
    "graph_link_prediction",
    """
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust <> b.cust
    ),
    deg AS (SELECT s1 AS node, COUNT(*) AS d FROM co GROUP BY 1),
    keep AS (SELECT node FROM deg WHERE d <= 30),
    cap AS (
      SELECT e.s1, e.s2 FROM co e
      JOIN keep k1 ON k1.node = e.s1
      JOIN keep k2 ON k2.node = e.s2
    ),
    degc AS (SELECT s1 AS node, CAST(COUNT(*) AS BIGINT) AS d FROM cap GROUP BY 1),
    wedge AS (
      SELECT e1.s2 AS u, e2.s2 AS w
      FROM cap e1 JOIN cap e2 ON e2.s1 = e1.s1 AND e1.s2 < e2.s2
    ),
    cn AS (SELECT u, w, CAST(COUNT(*) AS BIGINT) AS common FROM wedge GROUP BY 1, 2),
    cand AS (
      SELECT cn.u, cn.w, cn.common FROM cn
      WHERE common >= 2
        AND NOT EXISTS (SELECT 1 FROM cap e WHERE e.s1 = cn.u AND e.s2 = cn.w)
    )
    SELECT c.u AS u, c.w AS v, c.common AS common_neighbors,
           du.d AS deg_u, dv.d AS deg_v,
           ROUND(c.common / (du.d + dv.d - c.common), 6) AS jaccard
    FROM cand c JOIN degc du ON du.node = c.u JOIN degc dv ON dv.node = c.w
    """,
)
def graph_link_prediction_q(spark, sf_dir):
    """Common-neighbor / Jaccard link prediction (r9) over the customer
    co-purchase graph — score NON-adjacent customer pairs by shared
    capped-subgraph neighborhood (the "customers like you" recommender
    primitive). Candidates are exactly the open wedges of the
    degree-capped (<=30) subgraph, existing edges anti-joined away,
    common >= 2; the Jaccard finish is one IEEE divide of exact integers
    rounded to 6 (the corr_matrix float discipline). 6,600 scored pairs
    with 63 distinct scores at sf0.01 — every column discriminative."""
    from sparsity_spark.operators.graph import link_prediction

    edges = _co_purchase_edges(spark, sf_dir)
    return link_prediction(edges, max_degree=30, min_common=2, assume_distinct=True)


def _bfs_oracle(depth: int = 3, nation: int = 0) -> str:
    """Multi-source BFS unrolled as CTEs: the same symmetrized
    customer↔supplier edges as the pagerank oracle, nation-{nation}
    suppliers as hop-0 seeds, each hop a frontier join filtered by
    NOT IN over everything already leveled — pure set semantics, no
    arithmetic to drift."""
    parts = [
        f"""
    WITH raw AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS src,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
    n0 AS (
      SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
      FROM supplier WHERE s_nationkey = {nation}
    ),
    l0 AS (SELECT node, CAST(0 AS INTEGER) AS lvl FROM n0)"""
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"""
    n{d} AS (
      SELECT DISTINCT e.dst AS node
      FROM edges e JOIN n{d-1} f ON f.node = e.src
      WHERE e.dst NOT IN (SELECT node FROM l{d-1})),
    l{d} AS (SELECT node, lvl FROM l{d-1}
             UNION ALL SELECT node, CAST({d} AS INTEGER) FROM n{d})"""
        )
    return ",".join(parts) + f"""
    SELECT node, lvl FROM l{depth}
    """


@query("graph_bfs_levels", _bfs_oracle(3, 3))
def graph_bfs_levels_q(spark, sf_dir):
    """Multi-source BFS hop distances (r9): every node within 3 hops of
    the nation-3 supplier cohort on the customer↔supplier interaction
    graph, labeled with its exact minimum hop count — the crisp
    reachability screen beside seeded PPR's soft one (same seeds, same
    edges). Set semantics end to end (DISTINCT frontiers, anti-join
    against the visited set), so there is no arithmetic to drift: the
    oracle unrolls each hop as a NOT-IN CTE. Per hop the engine moves
    only the frontier — the walk family's communication bound — and an
    exhausted frontier short-circuits the loop."""
    from sparsity_spark.operators.graph import bfs_levels

    supp = load_table(spark, sf_dir, "supplier")
    edges = _cust_supp_edges(spark, sf_dir)
    # nation 3 is populated at every fixture scale (nation 0 is empty at
    # sf0.001, which would make the smallest-scale row vacuous)
    seeds = supp.filter(F.col("s_nationkey") == 3).select(
        (F.col("s_suppkey") * 2 + 1).alias("node")
    )
    return bfs_levels(edges, seeds, max_depth=3)


def _lpa_oracle(iters: int = 3) -> str:
    """Synchronous LPA unrolled as CTEs: same symmetrized co-purchase
    edges as the triangle rows, one self-vote per round, frequency
    argmax with ties to the smallest label — ROW_NUMBER(ORDER BY c DESC,
    label ASC) is exactly Spark's max(struct(c, -label)), so every
    round's labels are engine-identical integers."""
    parts = [
        """
    WITH buy AS (
      SELECT DISTINCT l.l_partkey AS pk,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS q,
             CAST(o.o_custkey AS BIGINT) AS cust
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT DISTINCT a.cust AS s1, b.cust AS s2
      FROM buy a JOIN buy b ON a.pk = b.pk AND a.q = b.q
      WHERE a.cust < b.cust
    ),
    edges AS (SELECT s1 AS src, s2 AS dst FROM co
              UNION ALL SELECT s2, s1 FROM co),
    l0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS label FROM edges)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    v{i} AS (
      SELECT node, label, COUNT(*) AS c FROM (
        SELECT e.dst AS node, l.label
        FROM edges e JOIN l{i-1} l ON l.node = e.src
        UNION ALL SELECT node, label FROM l{i-1}
      ) GROUP BY 1, 2),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM v{i}) WHERE rn = 1)"""
        )
    return ",".join(parts) + f"""
    SELECT node, label FROM l{iters}
    """


def _lpa_modularity_oracle(iters: int = 3) -> str:
    """LPA CTEs verbatim, then the per-community modularity accounting:
    symmetric-row counts m2/e2_c and degree sums as exact BIGINTs, the
    q_c_micro finish the same two-stage integer flooring rule Spark
    evaluates (r10 — pure BIGINT div, no ROUND(double) signed-zero
    split) — label drift in any LPA round re-partitions communities and
    flips every downstream number."""
    base = _lpa_oracle(iters)
    marker = f"\n    SELECT node, label FROM l{iters}"
    cut = base.rfind(marker)
    assert cut != -1
    cte = base[:cut]
    return (
        cte
        + f""",
    lab AS (SELECT node, label FROM l{iters}),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    m2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
    internal AS (
      SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e2
      FROM edges e
      JOIN lab la ON la.node = e.src
      JOIN lab lb ON lb.node = e.dst
      WHERE la.label = lb.label
      GROUP BY 1
    ),
    dsum AS (
      SELECT la.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(g.d) AS BIGINT) AS degree_sum
      FROM deg g JOIN lab la ON la.node = g.src GROUP BY 1
    )
    SELECT s.label, s.n_nodes,
           COALESCE(i.e2, CAST(0 AS BIGINT)) AS internal_edge_ends,
           s.degree_sum,
           CAST((COALESCE(i.e2, CAST(0 AS BIGINT)) * 1000000) // m2t.m2
                - (s.degree_sum * ((s.degree_sum * 1000000) // m2t.m2))
                  // m2t.m2 AS BIGINT) AS q_c_micro
    FROM dsum s LEFT JOIN internal i ON i.label = s.label CROSS JOIN m2t
    """
    )


@query("graph_lpa_modularity", _lpa_modularity_oracle(3))
def graph_lpa_modularity_q(spark, sf_dir):
    """Community QUALITY (r9 — LPA names the cohorts; modularity says
    whether the naming means anything): per-community Newman
    contributions q_c = e2_c/m2 − (d_c/m2)² over the same co-purchase
    graph and the same 3 LPA rounds, all counts exact BIGINTs and the
    finish PURE integer micro-unit arithmetic (two-stage flooring rule
    documented in graph.modularity — the r10 fix for the ROUND(double)
    signed-zero driver red). The oracle replays LPA AND the accounting —
    a label drift anywhere re-partitions communities and flips every
    q_c_micro."""
    from sparsity_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    edges = _co_purchase_edges(spark, sf_dir)
    labels = label_propagation(edges, iterations=3, assume_distinct=True)
    return modularity(edges, labels, assume_distinct=True)


@query("graph_lpa_communities", _lpa_oracle(3))
def graph_lpa_communities_q(spark, sf_dir):
    """Community detection (r9 — the graph family's missing member:
    pagerank RANKS, triangles MEASURE density, LPA NAMES the cohorts a
    curation pipeline caps or rebalances): synchronous label propagation
    over the same co-purchase graph as the triangle rows. Ties break to
    the smallest label via a plain max(struct(votes, -label)) aggregate —
    no randomness, no window in the Spark plan — and one self-vote per
    round damps the bipartite flip-flop, so a FIXED 3 rounds replays
    exactly as unrolled SQL. Per round: ONE node-sized join against the
    persisted edges + two hash aggregates, everything keyed by node —
    edge-linear, no wedge blowup, survives hub skew unmodified."""
    from sparsity_spark.operators.graph import label_propagation

    edges = _co_purchase_edges(spark, sf_dir)
    return label_propagation(edges, iterations=3, assume_distinct=True)


@query(
    "text_c4_clean",
    """
    WITH page AS (
      SELECT doc_id,
        substring(text, 1, 60) || '.' || chr(10) ||
        'enable javascript to view this page.' || chr(10) ||
        substring(text, 61, 50) || chr(10) ||
        CASE WHEN doc_id % 7 = 0 THEN 'lorem ipsum dolor sit amet.'
             ELSE substring(text, 111, 80) || '!' END || chr(10) ||
        CASE WHEN doc_id % 5 = 0 THEN 'function f() { return 1; }'
             ELSE 'that is fine.' END || chr(10) ||
        'one.' AS text
      FROM documents
    ),
    f AS (
      SELECT doc_id, text,
             list_filter(
               string_split(text, chr(10)),
               x -> regexp_matches(trim(x), '[.!?"]$')
                    AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
                    AND NOT contains(lower(x), 'javascript')
             ) AS kl,
             len(string_split(text, chr(10))) AS n_all
      FROM page
    )
    SELECT doc_id,
           array_to_string(kl, chr(10)) AS clean_text,
           CAST(len(kl) AS BIGINT) AS n_lines_kept,
           CAST(n_all - len(kl) AS BIGINT) AS n_lines_dropped,
           (len(kl) >= 2
            AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(lower(text), '{')
            AND NOT contains(lower(text), '}')) AS kept
    FROM f
    """,
)
def text_c4_clean_q(spark, sf_dir):
    """C4-style web-page cleaning (r8): a synthetic multi-line "webpage"
    per document — a real sentence line, a javascript boilerplate line, a
    punctuation-less fragment, a lorem-ipsum or code-brace line on
    deterministic doc_id slices, and a too-short line — flows through the
    line filter + doc gate. The oracle rebuilds the SAME pages and
    replays the filter with DuckDB list lambdas, so the hash covers the
    cleaned TEXT byte for byte (line order, joins, trims), not just the
    counts. Map-only whole-stage codegen — a 100 TB crawl cleans at scan
    speed."""
    from sparsity_spark.operators.text import c4_clean

    docs = load_table(spark, sf_dir, "documents")
    page = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.substring("text", 1, 60), F.lit(".")),
            F.lit("enable javascript to view this page."),
            F.substring("text", 61, 50),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("lorem ipsum dolor sit amet.")
            ).otherwise(F.concat(F.substring("text", 111, 80), F.lit("!"))),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("function f() { return 1; }")
            ).otherwise(F.lit("that is fine.")),
            F.lit("one."),
        ).alias("text"),
    )
    return c4_clean(page)


@query(
    "pipe_curate_containment",
    """
    WITH RECURSIVE q AS (
      SELECT doc_id, text, source,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CASE WHEN length(text) > 0 THEN
               CAST((least(len(string_split(text, ' ')), 100)
                     * (1000000 + (2 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1000000
                        + length(text)) // (2 * length(text))) + 100) // 200 AS DOUBLE) / 1000000
             END AS quality
      FROM documents
    ),
    kept AS (SELECT * FROM q WHERE quality >= 0.4),
    survivors AS (
      SELECT * FROM kept
      WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM survivors)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS c
      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.ia, p.ib, p.c,
             CAST(len(sa.grams) AS BIGINT) AS sza,
             CAST(len(sb.grams) AS BIGINT) AS szb
      FROM pair p JOIN g sa ON p.ia = sa.doc_id JOIN g sb ON p.ib = sb.doc_id
    ),
    und AS (
      SELECT ia AS a, ib AS b FROM sized
      WHERE c * 1.0 / sza >= 0.6 OR c * 1.0 / szb >= 0.6
    ),
    edges AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM survivors
      UNION
      SELECT reach.id, e2.b FROM reach JOIN edges e2 ON e2.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    sz AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g),
    best AS (
      SELECT cluster_id, doc_id AS keep_id FROM (
        SELECT l.cluster_id, s2.doc_id,
               ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                  ORDER BY s2.n_grams DESC, s2.doc_id ASC) AS rn
        FROM lab l JOIN sz s2 USING (doc_id)
      ) WHERE rn = 1
    ),
    collapsed AS (
      SELECT sv.* FROM survivors sv JOIN best b ON sv.doc_id = b.keep_id
    ),
    urls AS (
      SELECT *, 'https://www.' || source || (doc_id % 5) || '.org/p/' || doc_id AS url
      FROM collapsed
    ),
    capped AS (
      SELECT doc_id, n_tokens, quality,
             regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                            '([^.]+\\.[^.]+)$', 1) AS domain,
             row_number() OVER (
               PARTITION BY regexp_extract(regexp_extract(url, '^[a-z]+://([^/]+)', 1),
                                           '([^.]+\\.[^.]+)$', 1)
               ORDER BY doc_id) AS r
      FROM urls
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality), 4) AS avg_quality,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM capped WHERE r <= 100
    GROUP BY domain
    """,
)
def pipe_curate_containment_q(spark, sf_dir):
    """Curation with the containment collapse in the loop (r11 — VERDICT
    r10 #6, the quote-farm curation story end-to-end): quality gate
    (integer-micro composite >= 0.4) → exact-dedup survivors (keep-first
    per content hash) → **containment-component collapse** (docs linked
    by >= 0.6 containment in either direction form components; the
    SUPERSET survives — the aggregator page that carries the most
    context, where exact dedup can only kill byte-twins) → per-domain
    cap (100) → per-domain curation report. First composition exercising
    ``containment_clusters`` under realistic mixed data; the oracle
    replays the gate, the md5 dedup, the brute containment pairs, the
    recursive closure, the superset argmax, and the capped rollup."""
    from sparsity_spark.operators.dedup import containment_clusters, exact_dedup
    from sparsity_spark.operators.pipeline import cap_per_domain
    from sparsity_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality")
    kept = docs.join(q, "doc_id").filter(F.col("quality") >= 0.4)
    keepers = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    # the gated-survivor table is consumed ~5× downstream (gram build,
    # the CC loop's universe twice, the collapse join) and its plan
    # carries the regexp-heavy quality projection + the md5 dedup
    # aggregate — materialize it once (lazy, the PPJoin-shape sharing;
    # guide §1.2 "don't compute things you throw away")
    survivors = kept.join(keepers, "doc_id").localCheckpoint(eager=False)
    cc = containment_clusters(survivors, threshold=0.6, k=3)
    collapsed = survivors.join(
        cc.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    urls = collapsed.withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), (F.col("doc_id") % 5),
            F.lit(".org/p/"), F.col("doc_id"),
        ),
    )
    capped = cap_per_domain(urls, "url", 100, "doc_id")
    return capped.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "stream_containment_screen",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    eb AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 2 = 1),
    ec AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 2 = 0),
    pair AS (
      SELECT b.doc_id AS bid, c.doc_id AS cid, CAST(COUNT(*) AS BIGINT) AS c
      FROM eb b JOIN ec c ON b.gram = c.gram GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.bid, p.c, CAST(len(sb.grams) AS BIGINT) AS bsz
      FROM pair p JOIN g sb ON p.bid = sb.doc_id
    ),
    hits AS (
      SELECT bid, CAST(COUNT(*) AS BIGINT) AS n
      FROM sized WHERE c * 1.0 / bsz >= 0.6 GROUP BY bid
    )
    SELECT d.doc_id,
           COALESCE(h.n, 0) AS n_containments,
           COALESCE(h.n, 0) = 0 AS keep
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN hits h ON h.bid = d.doc_id
    UNION ALL
    SELECT doc_id, CAST(0 AS BIGINT) AS n_containments, TRUE AS keep
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def stream_containment_screen_q(spark, sf_dir):
    """The streaming containment-maintenance LOOP itself under the
    driver gate (r11 — VERDICT r10 #7; previously test-pinned only): an
    availableNow two-batch run of ``streaming_containment_maintain`` —
    batch 1 (even doc ids) seeds the store and keeps everything, batch 2
    (odd ids) is screened for containment >= 0.6 against the seeded
    store — with per-batch decisions appended to a sink table. The
    oracle re-derives every decision with the batch SQL (the
    stream_enriched_counts pattern): evens keep unconditionally, odds
    keep iff contained in no even doc. File mod-times order the two
    micro-batches (maxFilesPerTrigger=1, the tested ingest discipline)."""
    import tempfile
    import time as _time
    import uuid

    from sparsity_spark.streaming.ingest import streaming_containment_maintain

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tag = uuid.uuid4().hex[:8]
    src = tempfile.mkdtemp(prefix="sparsity_contain_stream_") + "/docs"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    _time.sleep(1.2)  # mod-time gap orders the two micro-batch files
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    store, sink_t = f"contain_stream_{tag}", f"contain_decisions_{tag}"

    def sink(decisions, batch_id):
        decisions.write.mode("append").format("parquet").saveAsTable(sink_t)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_containment_maintain(stream, store, threshold=0.6, sink=sink)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="sparsity_contain_ckpt_")
        )
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink_t).select("doc_id", "n_containments", "keep")


@query(
    "pipe_decontaminate_fuzzy",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    tb AS (SELECT * FROM bands WHERE doc_id % 20 <> 0),
    bb AS (SELECT * FROM bands WHERE doc_id % 20 = 0),
    cand AS (
      SELECT DISTINCT tb.doc_id AS tid, bb.doc_id AS bid
      FROM tb JOIN bb ON tb.band = bb.band AND tb.band_key = bb.band_key
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    ov AS (
      SELECT c.tid, c.bid, CAST(COUNT(*) AS BIGINT) AS c
      FROM cand c
      JOIN e et ON et.doc_id = c.tid
      JOIN e eb ON eb.doc_id = c.bid AND eb.gram = et.gram
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS s FROM g),
    j AS (
      SELECT ov.tid, ov.c, st.s AS sa, sb.s AS sb
      FROM ov JOIN sz st ON st.doc_id = ov.tid JOIN sz sb ON sb.doc_id = ov.bid
    )
    SELECT tid AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
           MAX(CAST((2 * c * 1000000 + (sa + sb - c)) // (2 * (sa + sb - c)) AS DOUBLE) / 1000000)
             AS max_jaccard
    FROM j
    WHERE c * 1.0 / (sa + sb - c) >= 0.5
    GROUP BY tid
    """,
)
def pipe_decontaminate_fuzzy_q(spark, sf_dir):
    """Whole-document FUZZY decontamination (r11): training docs (19/20
    split) that are near-duplicates (exact-verified Jaccard >= 0.5 on
    word-3-gram sets) of a held-out benchmark doc — the "eval doc leaked
    into training, lightly edited" detector sitting between
    pipe_decontaminate's any-shared-gram rule (one common phrase is not
    a leak) and exact dedup (one edited token defeats md5). Candidates
    come from the bipartite MinHash band join (benchmark side broadcast
    — the training corpus is never shuffled for candidate generation);
    Jaccard is verified exactly, so precision is 1.0 and recall is the
    4×4 banding's (~23% at the 0.5 gate, ~87% at 0.8 — the oracle
    replays the identical md5 minhashes, banding, and verification, so
    the check is exact despite the probabilistic screen)."""
    from sparsity_spark.operators.pipeline import fuzzy_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_decontaminate(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        threshold=0.5,
    )


@query(
    "ann_ivfpq_delete_topk",
    # the ann_ivfpq_topk replay with the CORPUS side of the scored join
    # restricted to undeleted ids — codebook sampling and routing still
    # see the full build-time corpus (frozen-index deletion semantics)
    _ivf_pq_oracle(corpus_filter="AND c.vec_id % 17 != 0"),
)
def ann_ivfpq_delete_topk_q(spark, sf_dir):
    """IVF-PQ search after DELETIONS (r11 — the right-to-be-forgotten
    lifecycle step the store family was missing): build the persisted
    index, tombstone the even multiples of 17
    (``delete_from_ivfpq_index``), COMPACT (physical removal through the
    bucket spec + tombstone table cleared), then tombstone the odd
    multiples — so the final query exercises BOTH deletion mechanisms at
    once: compacted-away rows and a live tombstone anti-join. The oracle
    scores against exactly the undeleted corpus; a resurrected or
    lingering vector flips a top-5 row."""
    from sparsity_spark.operators.similarity import (
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_topk,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    from sparsity_spark.operators.skew import _drop_table_and_location

    table = "ivfpq_index_delete_q"
    _drop_table_and_location(spark, f"{table}__tombstones")
    write_ivfpq_index(emb, cents, table, num_buckets=8)
    delete_from_ivfpq_index(
        emb.filter(F.col("vec_id") % 34 == 0).select("vec_id"), table
    )
    compact_ivfpq_index(spark, table)
    delete_from_ivfpq_index(
        emb.filter(F.col("vec_id") % 34 == 17).select("vec_id"), table
    )
    return ivfpq_index_topk(emb.filter(F.col("vec_id") < 10), table)


# session memo for dedup_band_forget's one-time build+forget setup
_BAND_FORGET_MEMO: dict = {}


@query(
    "dedup_band_forget",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    nb AS (SELECT * FROM bands WHERE doc_id % 10 = 0),
    cb AS (SELECT * FROM bands WHERE doc_id % 10 <> 0 AND doc_id % 3 = 0),
    hits AS (
      SELECT nb.doc_id, CAST(COUNT(DISTINCT cb.doc_id) AS BIGINT) AS n_corpus_collisions
      FROM nb JOIN cb ON nb.band = cb.band AND nb.band_key = cb.band_key
      GROUP BY nb.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_corpus_collisions, 0) AS n_corpus_collisions,
           (h.doc_id IS NULL) AS keep
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def dedup_band_forget_q(spark, sf_dir):
    """Right-to-be-forgotten in the LSH band lake (r11 — the near-twin
    sibling of dedup_containment_forget): the 90% corpus band store is
    built, one slice forgotten pre-compaction
    (``remove_from_band_store`` — the tombstone anti-join rides inside
    ``band_store``, so every screen path forgets immediately), the store
    COMPACTED (physical rewrite through the (band, band_key) bucket
    spec, tombstones cleared), a second slice forgotten post-compaction
    — then the 10% batch screens. A forgotten near-twin must STOP
    suppressing its new arrival; the oracle screens against exactly the
    surviving corpus."""
    from sparsity_spark.operators.dedup import (
        band_store,
        compact_band_store,
        incremental_lsh_dedup,
        remove_from_band_store,
        write_band_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = "band_forget_q"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BAND_FORGET_MEMO:
        write_band_store(docs.filter(F.col("doc_id") % 10 != 0), table)
        remove_from_band_store(
            docs.filter(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == 1)
            ).select("doc_id"),
            table,
        )
        compact_band_store(spark, table)
        remove_from_band_store(
            docs.filter(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == 2)
            ).select("doc_id"),
            table,
        )
        _BAND_FORGET_MEMO[key] = True
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return incremental_lsh_dedup(batch, band_store(spark, table))


# session memo for dedup_containment_forget's one-time build+forget setup
_CONTAIN_FORGET_MEMO: dict = {}


@query(
    "dedup_containment_forget",
    """
    WITH g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    eb AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 10 = 0),
    ec AS (SELECT doc_id, UNNEST(grams) AS gram FROM g
           WHERE doc_id % 10 != 0 AND doc_id % 3 = 0),
    pair AS (
      SELECT b.doc_id AS bid, c.doc_id AS cid, CAST(COUNT(*) AS BIGINT) AS c
      FROM eb b JOIN ec c ON b.gram = c.gram GROUP BY 1, 2
    ),
    sized AS (
      SELECT p.bid, p.cid, p.c, CAST(len(sb.grams) AS BIGINT) AS bsz
      FROM pair p JOIN g sb ON p.bid = sb.doc_id
    )
    SELECT bid AS batch_id, cid AS corpus_id, c AS overlap,
           bsz AS batch_size, ROUND(c * 1.0 / bsz, 6) AS containment
    FROM sized WHERE c * 1.0 / bsz >= 0.6
    """,
)
def dedup_containment_forget_q(spark, sf_dir):
    """Right-to-be-forgotten in the containment lake (r11 — the text
    sibling of ann_ivfpq_delete_topk): the 90% corpus store is built,
    one slice of it is FORGOTTEN pre-compaction
    (``remove_from_containment_store`` → tombstone anti-join on
    candidates + negative df increments), the store is COMPACTED
    (physical removal through the bucket specs + exact df recompute +
    tombstones cleared), a second slice is forgotten post-compaction
    (live tombstones at query time) — then the 10% batch screens at
    t=0.6. Both deletion mechanisms are live in the same query; the
    oracle replays the brute batch×corpus containment over exactly the
    surviving corpus, so a resurrected or lingering doc flips a row.
    Store build+forget is memoized per session (fold-only discipline)."""
    from sparsity_spark.operators.dedup import (
        compact_containment_store,
        containment_screen,
        remove_from_containment_store,
        write_containment_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = "containment_forget_q"
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CONTAIN_FORGET_MEMO:
        write_containment_store(docs.filter(F.col("doc_id") % 10 != 0), table)
        remove_from_containment_store(
            docs.filter(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == 1)
            ).select("doc_id"),
            table,
        )
        compact_containment_store(spark, table)
        remove_from_containment_store(
            docs.filter(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 3 == 2)
            ).select("doc_id"),
            table,
        )
        _CONTAIN_FORGET_MEMO[key] = True
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return containment_screen(batch, table, threshold=0.6, k=3)


@query(
    "dedup_hash_forget",
    """
    WITH corpus AS (
      SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 10 <> 0
    ),
    ledger AS (
      SELECT content_hash, MIN(doc_id) AS keeper FROM corpus GROUP BY content_hash
    ),
    live AS (
      SELECT content_hash FROM ledger WHERE NOT (keeper % 5 = 2 OR keeper % 7 = 3)
    ),
    batch AS (
      SELECT doc_id + 2000000 AS doc_id, content_hash FROM corpus WHERE doc_id % 12 = 5
    ),
    firsts AS (SELECT content_hash, MIN(doc_id) AS f FROM batch GROUP BY content_hash)
    SELECT b.doc_id, b.content_hash,
           ((l.content_hash IS NULL) AND b.doc_id = firsts.f) AS keep
    FROM batch b
    LEFT JOIN live l USING (content_hash)
    JOIN firsts USING (content_hash)
    """,
)
def dedup_hash_forget_q(spark, sf_dir):
    """Right-to-be-forgotten in the EXACT content-hash ledger —
    completing the forget family across all four persisted stores
    (IVF-PQ index, containment lake, band lake, hash ledger). The 90%
    corpus ledger is written, one slice forgotten pre-compaction
    (``remove_from_hash_store`` — the tombstone anti-join rides inside
    ``hash_store``, so every screen forgets immediately), the ledger
    COMPACTED (physical rewrite through the content_hash bucket spec,
    tombstones cleared), a second slice forgotten post-compaction —
    then a batch RE-UPLOADING corpus docs (%12==5, byte-identical text
    under fresh ids) screens against it. A re-upload whose original
    KEEPER was forgotten must now be ADMITTED (the deleted doc no
    longer suppresses its twin); one whose keeper survives stays
    rejected — the oracle computes keeper-level liveness per hash, so
    both arms fire and a lingering or resurrected ledger row flips a
    row."""
    from sparsity_spark.operators.dedup import (
        append_hash_store,
        compact_hash_store,
        remove_from_hash_store,
        write_hash_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    table = "hash_forget_q"
    write_hash_store(corpus, table, num_buckets=8)
    remove_from_hash_store(
        corpus.filter(F.col("doc_id") % 5 == 2).select("doc_id"), table
    )
    compact_hash_store(spark, table)
    remove_from_hash_store(
        corpus.filter(F.col("doc_id") % 7 == 3).select("doc_id"), table
    )
    batch = corpus.filter(F.col("doc_id") % 12 == 5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    return append_hash_store(batch, table)


@query(
    "dedup_cluster_forget",
    f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    s1 AS (SELECT * FROM lab WHERE doc_id % 7 <> 3),
    rel AS (SELECT cluster_id, MIN(doc_id) AS f FROM s1 GROUP BY cluster_id)
    SELECT s1.doc_id, rel.f AS cluster_id
    FROM s1 JOIN rel USING (cluster_id)
    WHERE s1.doc_id % 11 <> 5
    """,
)
def dedup_cluster_forget_q(spark, sf_dir):
    """Right-to-be-forgotten in the cluster-membership store: the full
    corpus is clustered and persisted, one slice forgotten
    pre-compaction (``remove_from_cluster_store`` — membership reads
    forget immediately via the tombstone anti-join inside
    ``resolve_cluster_store``), the store COMPACTED
    (``compact_cluster_store`` — physical removal + label RE-ELECTION
    to the minimum surviving member, restoring the label-=-live-minimum
    invariant the fold's min-composition argument quotes; remap-first
    write order so every crash window still resolves), a second slice
    forgotten post-compaction (read-side only) — then membership is
    resolved. The oracle recomputes the from-scratch closure, deletes
    the first slice, re-elects per-cluster minima, then deletes the
    second slice WITHOUT re-electing — pinning both the deletion
    semantics (no cluster splits: assignments survive their bridge
    docs) and exactly when labels move (at compaction, not at
    forget).

    r11: the full-corpus closure this row seeds its store from is the
    SAME (doc_id, cluster_id) table three other rows already share via
    ``_doc_dedup_shared`` (the shared-edge-table discipline) — this row
    becomes its fourth consumer instead of re-running the LSH pipeline
    and the components fixpoint loop from scratch. The forget/compact/
    re-elect lifecycle under measurement is unchanged, and a fresh
    session (every driver correctness run) still builds the closure
    from the parquet inputs."""
    from sparsity_spark.operators.dedup import (
        compact_cluster_store,
        remove_from_cluster_store,
        resolve_cluster_store,
        write_cluster_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    table = "cluster_forget_q"
    _, labels = _doc_dedup_shared(spark, sf_dir)
    write_cluster_store(labels, table)
    remove_from_cluster_store(
        docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"), table
    )
    compact_cluster_store(spark, table)
    remove_from_cluster_store(
        docs.filter(F.col("doc_id") % 11 == 5).select("doc_id"), table
    )
    return resolve_cluster_store(spark, table)


@query(
    "dedup_member_forget",
    _semantic_screen_oracle(8, 2, 0.3, members_where="vec_id % 3 = 0"),
)
def dedup_member_forget_q(spark, sf_dir):
    """Right-to-be-forgotten in the SEMANTIC member store — the fifth
    and last persisted store to gain the forget lifecycle: the 90%
    corpus member store is built (centroids trained on the full corpus —
    a metadata-sized model, not per-vector state, so forgets don't
    retrain it), one third forgotten pre-compaction
    (``remove_from_member_store`` — the tombstone anti-join rides inside
    ``member_store``, so every screen forgets immediately), the store
    COMPACTED (physical rewrite through the cid bucket spec, tombstones
    cleared), the second third forgotten post-compaction — then the 10%
    batch screens at cosine 0.3. A forgotten vector must STOP
    semantically suppressing new arrivals (18 keep-decisions flip at
    sf0.01); the oracle screens against exactly the surviving third."""
    from sparsity_spark.operators.dedup import (
        compact_member_store,
        member_store,
        remove_from_member_store,
        semantic_screen,
        write_member_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    cents = _corpus_kmeans_shared(spark, sf_dir)
    table = "member_forget_q"
    write_member_store(corpus, cents, table, num_buckets=8)
    remove_from_member_store(
        corpus.filter(F.col("vec_id") % 3 == 1).select("vec_id"), table
    )
    compact_member_store(spark, table)
    remove_from_member_store(
        corpus.filter(F.col("vec_id") % 3 == 2).select("vec_id"), table
    )
    store = member_store(spark, table)
    return semantic_screen(batch, store, cents, threshold=0.3).select("vec_id", "cid")


@query(
    "dedup_canonical_quality",
    f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    qm AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             CAST(length(text) AS BIGINT) AS tc,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS ac
      FROM documents
    ),
    q AS (
      SELECT doc_id,
             CASE WHEN tc > 0 THEN CAST((least(n, 100) * (1000000 +
               (2 * ac * 1000000 + tc) // (2 * tc)) + 100) // 200 AS DOUBLE)
               / 1000000 END AS quality
      FROM qm
    ),
    jj AS (
      SELECT lab.doc_id, lab.cluster_id, COALESCE(q.quality, -1.0) AS s
      FROM lab JOIN q USING (doc_id)
    ),
    r AS (
      SELECT cluster_id, doc_id, s,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY s DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM jj
    )
    SELECT cluster_id, doc_id AS canonical_id,
           CASE WHEN s >= 0 THEN s END AS canonical_score,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)
def dedup_canonical_quality_q(spark, sf_dir):
    """Canonical selection by QUALITY — the third collapse policy next
    to keep-first-id and superset-survives: LSH near-dup clusters over
    the corpus, each electing its highest-quality member (integer-micro
    composite from ``quality_score``; ties toward the lowest id). One
    skinny join + one hash aggregate over cluster labels — no window
    over the corpus, no pair fanout. The oracle re-derives the closure,
    the exact-micro quality, and the argmax."""
    from sparsity_spark.operators.dedup import canonical_pick
    from sparsity_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    _, labels = _doc_dedup_shared(spark, sf_dir)
    return canonical_pick(labels, quality_score(docs))


@query(
    "pipe_shuffle_shards",
    """
    WITH h AS (
      SELECT doc_id, md5('ep1:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents
    ),
    s AS (
      SELECT doc_id, hh,
             CAST(CAST(('0x' || substring(hh, 1, 8)) AS BIGINT) % 16 AS INTEGER)
               AS shard
      FROM h
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1
                AS BIGINT) AS pos
    FROM s
    """,
)
def pipe_shuffle_shards_q(spark, sf_dir):
    """Deterministic training-order shuffle into 16 shards (salt 'ep1'):
    content-addressed md5 draw — same corpus + salt reproduces the same
    order on any engine or cluster size; a new salt re-draws the next
    epoch. Within-shard positions come from a window PARTITIONED BY
    shard, so no global sort exists in the plan — each shard sorts
    independently after one hash exchange, the exact layout a shard
    writer consumes."""
    from sparsity_spark.operators.pipeline import shuffle_shards

    return shuffle_shards(load_table(spark, sf_dir, "documents"), 16, salt="ep1")


@query(
    "pipe_snapshot_diff",
    """
    WITH o AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 <> 1
    ),
    n AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS h
      FROM documents WHERE doc_id % 13 <> 2
    )
    SELECT * FROM (
      SELECT doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.h IS DISTINCT FROM n.h THEN 'modified' END AS status
      FROM o FULL JOIN n USING (doc_id)
    ) WHERE status IS NOT NULL
    """,
)
def pipe_snapshot_diff_q(spark, sf_dir):
    """Dataset-release diff: two synthetic snapshots of the documents
    lake (old = all but the %13==1 slice; new = all but the %13==2
    slice, with every %5==0 doc's text edited) diffed into
    added/removed/modified — the audit artifact a release pipeline
    publishes next to the data. Both sides hash map-side before the
    full-outer join, so only (id, md5) pairs ever shuffle; unchanged
    docs are absent, making the result diff-sized. All three statuses
    fire by construction."""
    from sparsity_spark.operators.pipeline import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 13 != 1)
    new = docs.filter(F.col("doc_id") % 13 != 2).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


@query("pipe_decontaminate_bloom", ORACLES["pipe_decontaminate"])
def pipe_decontaminate_bloom_q(spark, sf_dir):
    """pipe_decontaminate's exact semantics through the BLOOM-prefilter
    plan (``decontaminate_bloom``) — the regime where the benchmark side
    is an eval-suite LAKE too big to broadcast raw but whose bloom
    bitmap is still driver-metadata-sized: training shingles are
    filtered map-side by the k-probe bitmap expression (whole-stage
    codegen, zero shuffle), and only the survivors reach the exact gram
    join (no broadcast hint — AQE sizes it). The bloom passes false
    positives (killed by the exact join) and never drops a present key,
    so this row shares pipe_decontaminate's oracle verbatim: the plan
    changed, the answer may not."""
    from sparsity_spark.operators.pipeline import decontaminate_bloom

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate_bloom(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        max_bench_df=20,
    )


@query(
    "pipe_decontaminate_fuzzy_store",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    tb AS (SELECT * FROM bands WHERE doc_id % 20 <> 0),
    bb AS (
      SELECT * FROM bands
      WHERE doc_id % 20 = 0 AND doc_id % 60 <> 0 AND doc_id % 100 <> 40
    ),
    cand AS (
      SELECT DISTINCT tb.doc_id AS tid, bb.doc_id AS bid
      FROM tb JOIN bb ON tb.band = bb.band AND tb.band_key = bb.band_key
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    ov AS (
      SELECT c.tid, c.bid, CAST(COUNT(*) AS BIGINT) AS c
      FROM cand c
      JOIN e et ON et.doc_id = c.tid
      JOIN e eb ON eb.doc_id = c.bid AND eb.gram = et.gram
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS s FROM g),
    j AS (
      SELECT ov.tid, ov.c, st.s AS sa, sb.s AS sb
      FROM ov JOIN sz st ON st.doc_id = ov.tid JOIN sz sb ON sb.doc_id = ov.bid
    )
    SELECT tid AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
           MAX(CAST((2 * c * 1000000 + (sa + sb - c)) // (2 * (sa + sb - c)) AS DOUBLE) / 1000000)
             AS max_jaccard
    FROM j
    WHERE c * 1.0 / (sa + sb - c) >= 0.5
    GROUP BY tid
    """,
)
def pipe_decontaminate_fuzzy_store_q(spark, sf_dir):
    """Fuzzy decontamination against the PERSISTED benchmark store (r11)
    — the full reference lifecycle in one row: the store is written from
    half the benchmark slice, the other half APPENDED (a new eval suite
    ships), one-third of benchmarks retired pre-compaction
    (``remove_from_benchmark_store`` — the tombstone anti-join forgets
    them in every read immediately), the store COMPACTED (physical
    rewrite through both bucket specs, tombstones cleared), a second
    slice retired post-compaction — then the training release screens
    against it (``fuzzy_decontaminate_store``: bucketed scans on both
    the band-candidate and gram-verify joins, the suite never
    recomputed or shuffled). The oracle replays the inline fuzzy
    pipeline with the retired benchmarks excluded, so a lingering or
    resurrected benchmark row flips a flag."""
    from sparsity_spark.operators.pipeline import (
        append_benchmark_store,
        compact_benchmark_store,
        fuzzy_decontaminate_store,
        remove_from_benchmark_store,
        write_benchmark_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    table = "bench_store_q"
    write_benchmark_store(bench.filter(F.col("doc_id") % 40 == 0), table, num_buckets=8)
    append_benchmark_store(bench.filter(F.col("doc_id") % 40 == 20), table)
    remove_from_benchmark_store(
        bench.filter(F.col("doc_id") % 60 == 0).select("doc_id"), table, id_col="doc_id"
    )
    compact_benchmark_store(spark, table)
    remove_from_benchmark_store(
        bench.filter(F.col("doc_id") % 100 == 40).select("doc_id"),
        table,
        id_col="doc_id",
    )
    return fuzzy_decontaminate_store(train, table, threshold=0.5)


@query(
    "dedup_lsh_recall",
    f"""
    WITH m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    pair AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
      SELECT ia AS id_a, ib AS id_b,
             ROUND(c * 1.0 / (len(sa.grams) + len(sb.grams) - c), 4) AS j
      FROM pair
      JOIN g sa ON ia = sa.doc_id
      JOIN g sb ON ib = sb.doc_id
      WHERE c * 1.0 / (len(sa.grams) + len(sb.grams) - c) >= 0.6
    ),
    lab AS (
      SELECT CASE WHEN j >= 0.9 THEN '0.9+'
                  WHEN j >= 0.8 THEN '0.8-0.9'
                  WHEN j >= 0.7 THEN '0.7-0.8'
                  WHEN j >= 0.6 THEN '0.6-0.7'
                  ELSE '0.5-0.6' END AS j_bucket,
             CASE WHEN c2.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM truth t LEFT JOIN cand c2 ON t.id_a = c2.id_a AND t.id_b = c2.id_b
    )
    SELECT j_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           CAST(SUM(hit) AS BIGINT) AS n_caught,
           CAST((2 * SUM(hit) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS recall
    FROM lab GROUP BY j_bucket
    """,
)
def dedup_lsh_recall_q(spark, sf_dir):
    """Measured LSH banding recall (r11): exact ground-truth pairs at
    J >= 0.6 from the LOSSLESS shingle PPJoin, left-joined with the
    4×4 banding's candidates, rolled up per similarity bucket — the
    calibration readout that replaces the textbook S-curve with THIS
    corpus's number (pick bands×rows for a target recall at the
    threshold you actually dedup at). Counts are exact integers; recall
    is round-half-up micros. The oracle replays the prefix-join truth,
    the minhash banding, and the bucket rollup."""
    from sparsity_spark.operators.dedup import lsh_recall_audit

    return lsh_recall_audit(
        load_table(spark, sf_dir, "documents"), base_threshold=0.6
    )


_SPLIT_CASE = "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END"
_HASH_BUCKET = (
    "CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@query(
    "pipe_leakage_safe_split",
    f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    na AS (
      SELECT doc_id, {_SPLIT_CASE} AS split
      FROM (SELECT doc_id, {_HASH_BUCKET.format(col="doc_id")} AS b FROM documents)
    ),
    sa AS (
      SELECT doc_id, {_SPLIT_CASE} AS split
      FROM (SELECT doc_id, {_HASH_BUCKET.format(col="cluster_id")} AS b FROM lab)
    ),
    nx AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pairs p
      JOIN na x ON p.id_a = x.doc_id JOIN na y ON p.id_b = y.doc_id
      WHERE x.split <> y.split
    ),
    sx AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pairs p
      JOIN sa x ON p.id_a = x.doc_id JOIN sa y ON p.id_b = y.doc_id
      WHERE x.split <> y.split
    )
    SELECT 'naive' AS policy,
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           (SELECT c FROM nx) AS n_cross_pairs
    FROM na
    UNION ALL
    SELECT 'cluster_safe',
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT),
           (SELECT c FROM sx)
    FROM sa
    """,
)
def pipe_leakage_safe_split_q(spark, sf_dir):
    """Leakage-safe train/val/test split (r11): the naive per-doc hash
    split scatters near-dup variants of one document across the
    train/test boundary — the eval set then measures memorization. The
    cluster-keyed policy (``split_by_cluster``) hashes the LSH near-dup
    CLUSTER label instead, so cross-split near-dup leakage is
    structurally zero. One result row per policy with the split sizes
    and the leaked-pair count (``cross_split_leakage``) — the naive row
    pays a nonzero n_cross_pairs, the safe row certifies 0. The oracle
    replays the minhash closure, both hash splits, and both pair
    audits."""
    from sparsity_spark.operators.pipeline import (
        cross_split_leakage,
        split_assign,
        split_by_cluster,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs, labels = _doc_dedup_shared(spark, sf_dir)
    naive = split_assign(docs.select("doc_id"), "doc_id")
    safe = split_by_cluster(labels)

    def profile(assign, policy):
        counts = assign.agg(
            F.sum((F.col("split") == "train").cast("long")).cast("long").alias("n_train"),
            F.sum((F.col("split") == "val").cast("long")).cast("long").alias("n_val"),
            F.sum((F.col("split") == "test").cast("long")).cast("long").alias("n_test"),
        )
        leak = cross_split_leakage(pairs, assign).agg(
            F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("long").alias("n_cross_pairs")
        )
        return counts.crossJoin(leak).select(
            F.lit(policy).alias("policy"),
            "n_train",
            "n_val",
            "n_test",
            "n_cross_pairs",
        )

    return profile(naive, "naive").unionByName(profile(safe, "cluster_safe"))


@query(
    "text_boilerplate_fraction",
    f"""
    WITH g AS ({_SHINGLE_SQL}),
    d AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY shingle),
    per AS (
      SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      FROM g JOIN d USING (shingle) GROUP BY g.doc_id
    )
    SELECT doc_id,
           COALESCE(per.n_grams, 0) AS n_grams,
           COALESCE(per.n_common, 0) AS n_common,
           CASE WHEN per.n_grams > 0 THEN
             CAST((2 * per.n_common * 1000000 + per.n_grams)
                  // (2 * per.n_grams) AS DOUBLE) / 1000000
           END AS boilerplate
    FROM documents LEFT JOIN per USING (doc_id)
    """,
)
def text_boilerplate_fraction_q(spark, sf_dir):
    """Cross-document boilerplate share (r11): per doc, the fraction of
    its distinct word 3-grams with corpus document frequency >= 3 — the
    navigation-chrome/cookie-banner/license-header signal the
    WITHIN-doc repetition filters can't see. One explode, one df hash
    aggregate, one gram-keyed join back (AQE skew-split owns the
    mega-common gram), one per-doc aggregate; the fraction is
    round-half-up integer micros so both engines emit the identical
    quotient."""
    from sparsity_spark.operators.text import boilerplate_fraction

    return boilerplate_fraction(
        load_table(spark, sf_dir, "documents"), min_df=3
    )


@query(
    "pipe_source_dup_profile",
    f"""
    WITH RECURSIVE m AS ({_MINHASH_SQL}),
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
      FROM m GROUP BY doc_id, CAST(seed // 4 AS INTEGER)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r
    ),
    lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    k AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    ),
    j AS (
      SELECT d.source,
             CASE WHEN d.doc_id <> k.keep_id THEN 1 ELSE 0 END AS xd,
             CASE WHEN d.doc_id <> lab.cluster_id THEN 1 ELSE 0 END AS nd
      FROM documents d
      JOIN k ON md5(d.text) = k.h
      JOIN lab ON d.doc_id = lab.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(xd) AS BIGINT) AS n_exact_dups,
           CAST(SUM(nd) AS BIGINT) AS n_near_dups,
           CAST((2 * SUM(xd) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS exact_rate,
           CAST((2 * SUM(nd) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS DOUBLE) / 1000000 AS near_rate
    FROM j GROUP BY source
    """,
)
def pipe_source_dup_profile_q(spark, sf_dir):
    """Per-source duplication dashboard (r11): for each source feed, the
    doc count, exact-duplicate count (not its md5 group's keeper),
    near-dup cluster-member count (not its LSH cluster's minimum id —
    a superset of exact), and both rates in round-half-up micros — the
    observability row that names WHICH feed floods the corpus with
    rehosts before the collapse runs. Clustering is the shared dedup
    pass; the profile itself is one md5 aggregate, two skinny joins,
    one per-source aggregate."""
    from sparsity_spark.operators.pipeline import source_dup_profile

    docs = load_table(spark, sf_dir, "documents")
    _, labels = _doc_dedup_shared(spark, sf_dir)
    return source_dup_profile(docs, labels)


# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness harness verifies only the
# FIRST 50 registered queries, so the SURVEY §2 operator queries plus the
# headline LLM-pipeline operators are pinned into that window; everything
# else (TPC-H extensions, streaming, windows) follows in original order and
# is still covered by tools/check_oracles.py + tests/test_robustness.py.
_FIRST_50 = [
    # r11 window (VERDICT r10 #1: the FINAL never-driver-checked rotation
    # — after this round every registered query has appeared in a driver
    # CORRECTNESS artifact at least once).
    # Keeper: the flagship.
    "a1_onehot_groupby_sum",
    # the 18 rows never checked in CORRECTNESS_r01-r10 (the 16 deferred in
    # the r10 rotation comment + the two born in r10)
    "s11_head", "a4_std_dense_denominator", "multimodal_gif_features",
    "dedup_cluster_fold_only", "ann_hard_negatives",
    "emb_grouped_pca_project", "multimodal_frames", "multimodal_resize",
    "src_json_events", "q6_forecast_revenue", "s1_melt_numeric",
    "stats_percentiles", "evt_funnel", "emb_pq_codes", "fn_json_extract",
    "stream_sliding_counts", "text_redact_pii", "dedup_containment_clusters",
    # born this round (r11) — never checked by definition
    "pipe_curate_containment",   # containment-collapse curation composition
    "stream_containment_screen", # the streaming loop under the driver gate
    # r11-touched code paths — driver confirmation of this round's changes
    "dedup_containment_pairs",       # min-match filter + verify rework
    "dedup_containment_screen",      # one-sided min-match + dedup'd gram read
    "stats_count_store_topk",        # backfill fallback + monotone watermark
    "t6_ohlc_store",                 # same store-screen changes
    "pipe_quality_percentile_gate",  # NULL-quality gate fix (ADVICE)
    "text_quality",                  # shared quality_score surface
    # staleness backfill: rows whose last driver artifact is r2-r5 (the
    # oldest driver evidence in the repo; all sweep-green every round;
    # q1/q3/w1 rotated back out for the three born-late-r11 rows below)
    "q5_regional_revenue", "w3_top_events_per_user",
    "text_heavy_hitters", "emb_grouped_centroids",
    "ann_ivf_probe2", "dedup_lsh_pairs", "dedup_jaccard_prefix_join",
    # born mid-r11 — driver-checked immediately rather than waiting a round
    "pipe_decontaminate_fuzzy",   # bipartite band join + exact Jaccard verify
    "ann_ivfpq_delete_topk",      # ANN tombstone + compaction lifecycle
    "dedup_containment_forget",   # containment-lake right-to-be-forgotten
    "dedup_band_forget",          # band-lake right-to-be-forgotten
    # born late-r11 (continuation session): the forget family completed
    # across every persisted store + the bloom-prefilter decontamination
    # plan (q11/q15/q19/q14/q12/q10/q18 backfill rows rotated out — all have r2-r5
    # driver evidence and are sweep-green every round)
    "dedup_hash_forget",          # exact-ledger right-to-be-forgotten
    "dedup_cluster_forget",       # membership forget + label re-election
    "dedup_member_forget",        # semantic member-store forget
    "pipe_decontaminate_bloom",   # map-side bloom prefilter, exact result
    "pipe_snapshot_diff",         # release diff: added/removed/modified
    "dedup_canonical_quality",    # quality-argmax canonical selection
    "pipe_shuffle_shards",        # deterministic epoch shuffle + sharding
    # born late-r11 (second continuation): split-leakage / boilerplate /
    # source observability
    "pipe_leakage_safe_split",    # cluster-keyed split + leakage certificate
    "text_boilerplate_fraction",  # cross-doc common-gram share
    "pipe_source_dup_profile",    # per-source dup-rate dashboard
    "pipe_decontaminate_fuzzy_store",  # persisted benchmark-store lifecycle
    "dedup_lsh_recall",           # measured banding recall vs exact truth
    ]

def _apply_registry_order() -> None:
    missing = [n for n in _FIRST_50 if n not in QUERIES]
    assert not missing, f"_FIRST_50 references unknown queries: {missing}"
    ordered = {n: QUERIES[n] for n in _FIRST_50}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in _FIRST_50 if n in ORACLES}
    o_ordered.update((n, s) for n, s in ORACLES.items() if n not in o_ordered)
    ORACLES.clear()
    ORACLES.update(o_ordered)


_apply_registry_order()
