"""Data-quality expectations, referential audits, runtime-filter-pruned
joins, and Pareto (skyline) queries (SURVEY.md §2.3 Tier C extension).

The reference pipeline validates its load only by COUNT(*) parity
(reference: source/check_data_lambda/handler.py — row counts per table);
a warehouse serving analysts needs declarative expectations over the
landed data.  This module supplies that surface Spark-first:

- ``q_dq_expectations`` — N rules evaluated in ONE scan via conditional
  aggregation (no per-rule pass over the fact table; at 100 TB the rule
  count is free, the scan is the cost).
- ``q_dq_referential`` — orphan audits between fact and dimension
  tables as anti-joins (each is a shuffle semi-join on the key; the
  dimension side is broadcast when domain-bounded).
- ``q_bloom_prune_join`` — a selective dim⋈fact join shaped so
  Catalyst's runtime bloom filter (spark.sql.optimizer.runtime
  .bloomFilter.enabled, default on) injects a ``might_contain``
  predicate into the fact scan: at 100 TB the fact side is pre-filtered
  to ~selectivity·|fact| rows BEFORE the shuffle, instead of shuffling
  the full table and discarding 99% at the join.  The injection is
  pinned by tests/test_plans.py::test_runtime_bloom_filter_injected
  (thresholds lowered to fire at test scale; at production scale the
  default 10 MB/10 GB thresholds make the same decision).
- ``q_skyline`` — per-group Pareto front (maximize size, minimize
  price) WITHOUT the quadratic NOT-EXISTS self-join: a bounded-domain
  suffix-min over per-(group, size) price minima.  The window partition
  is at most |size domain| rows per group, so the plan is one groupBy
  shuffle + a bounded window + an equi-join back — no all-pairs
  comparison anywhere (the DuckDB oracle runs the quadratic NOT EXISTS
  form; at oracle scale that is fine, at 100 TB ours is the only shape
  that survives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
    md5_unit,
    sql_md5_unit,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import register
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.tpch_shapes import (
    _SQL_VOLUME,
    _volume,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

# ---------------------------------------------------------------- rules
#
# Each rule is (name, SQL predicate over lineitem).  A row VIOLATES a
# rule when the predicate is not satisfied — NULL counts as a violation
# (same semantics as a NOT NULL + CHECK constraint pair).  The SQL
# string is valid in both Spark SQL and DuckDB, so the oracle is built
# from the identical text.
_RULES: tuple[tuple[str, str], ...] = (
    ("quantity_le_45", "l_quantity <= 45"),
    ("discount_le_8pct", "l_discount <= CAST(0.08 AS DOUBLE)"),
    ("tax_le_6pct", "l_tax <= CAST(0.06 AS DOUBLE)"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("shipdate_in_range", "l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'"),
    ("orderkey_not_null", "l_orderkey IS NOT NULL"),
)


def _sql_dq_expectations() -> str:
    v_cols = ",\n        ".join(
        f"COUNT(*) FILTER (WHERE NOT COALESCE({pred}, FALSE)) AS v{i}"
        for i, (_, pred) in enumerate(_RULES)
    )
    arms = "\n    UNION ALL\n    ".join(
        f"SELECT '{name}' AS rule, v{i} AS violations, total AS total_rows FROM t"
        for i, (name, _) in enumerate(_RULES)
    )
    return f"""
    WITH t AS (
      SELECT COUNT(*) AS total,
        {v_cols}
      FROM lineitem
    )
    {arms}
    """


@register("q_dq_expectations", oracle=_sql_dq_expectations())
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over lineitem: every rule is a
    conditional COUNT inside ONE hash aggregate, so adding rules never
    adds scans.  Violation semantics: predicate false OR null.  The
    single agg row is unpivoted to (rule, violations, total_rows) with
    ``stack`` — driver-side cost is |rules| rows.

    Reference anchor: check_data_lambda/handler.py validates by row
    count only; this is the constraint surface the warehouse needs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.count(F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1)).alias(f"v{i}")
        for i, (_, pred) in enumerate(_RULES)
    ]
    one = li.agg(*aggs)
    stack_args = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(_RULES))
    return one.select(
        F.expr(f"stack({len(_RULES)}, {stack_args}) as (rule, violations)"),
        F.col("total").alias("total_rows"),
    )


_REF_CHECKS: tuple[tuple[str, str, str, str, str], ...] = (
    # (name, child table, child key, parent table, parent key)
    ("orders_without_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_without_order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customers_without_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_without_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
)


def _sql_dq_referential() -> str:
    arms = "\n    UNION ALL\n    ".join(
        f"""SELECT '{name}' AS check_name, COUNT(*) AS orphans
    FROM {child} WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent} WHERE {pkey} IS NOT NULL)"""
        for name, child, ckey, parent, pkey in _REF_CHECKS
    )
    return arms


@register("q_dq_referential", oracle=_sql_dq_referential())
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: each check is a LEFT ANTI join on
    the key (shuffle semi-join; Catalyst broadcasts the lookup side
    when it is under the broadcast threshold).  The first two checks
    must be 0 on consistent CDC output; ``customers_without_orders``
    is legitimately non-zero (TPC-H leaves ~1/3 of customers orderless)
    and proves the audit actually fires.

    Scale: each anti-join shuffles only (key) columns — column pruning
    reaches the scan, so the audit cost per check is one key-only
    shuffle, not a full-row pass.
    """
    parts = []
    for name, child, ckey, parent, pkey in _REF_CHECKS:
        # NULL FKs are excluded: left_anti would count them as orphans
        # while the oracle's NOT IN evaluates NULL and filters them —
        # a latent cross-engine split (review-caught).  A NULL FK is a
        # completeness finding (q_dq_expectations' null rules), not a
        # referential one.
        c = load_table(spark, sf_dir, child).select(ckey).filter(
            F.col(ckey).isNotNull()
        )
        p = load_table(spark, sf_dir, parent).select(pkey)
        orphans = c.join(p, c[ckey] == p[pkey], "left_anti")
        parts.append(
            orphans.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


_BLOOM_CUTOFF = 450000.0


@register(
    "q_bloom_prune_join",
    oracle=f"""
    SELECT o_orderpriority,
      CAST(SUM({_SQL_VOLUME}) AS DOUBLE) AS revenue,
      COUNT(*) AS line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > {_BLOOM_CUTOFF}
    GROUP BY o_orderpriority
    """,
)
def q_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-side filter (o_totalprice > cutoff keeps ~2% of
    orders) joined to the fact table — the shape Catalyst's runtime
    bloom filter exists for.  With the optimizer's defaults at cluster
    scale, the filtered orders side builds a ``bloom_filter_agg`` and
    the lineitem SCAN gains ``might_contain(bloom, xxhash64(l_orderkey))``
    — the fact table is pruned before the shuffle instead of after the
    join.  Plan pinned (with thresholds lowered so it fires at test
    scale) by tests/test_plans.py::test_runtime_bloom_filter_injected.

    No hint needed: the query is written as a plain declarative join;
    injection is the optimizer's decision, sized by its cost model.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > F.lit(_BLOOM_CUTOFF)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(_volume()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "q_skyline",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_size, p.p_retailprice AS price
    FROM part p
    WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
      AND NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto front over parts: a part is kept when no
    same-brand part has size ≥ AND price ≤ with at least one strict.

    Linear-shuffle decomposition instead of the quadratic self-join:
    (1) per (brand, size) price minimum — one hash-agg shuffle;
    (2) suffix-min of that minimum over strictly larger sizes — a
        window whose partition is ≤ |size domain| rows per brand
        (p_size ∈ 1..50), never data-proportional;
    (3) join parts back on (brand, size); a part is dominated iff a
        strictly larger size is at most as expensive
        (better_minp ≤ price) or the same size has a strictly cheaper
        part (price > minp).
    Ties on (size, price) dominate neither way — both rows stay, same
    as the oracle's strictness condition.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_size", F.col("p_retailprice").alias("price")
    ).filter(
        # NULL price/size rows are excluded on BOTH engines: the
        # oracle's NOT EXISTS would KEEP them (every dominator
        # comparison is NULL) while the min-decomposition drops them —
        # review-caught latent divergence; a NULL measure can't sit on
        # a Pareto front meaningfully anyway
        F.col("price").isNotNull() & F.col("p_size").isNotNull()
    )
    # a NULL-brand part has NO same-brand competitors under the
    # oracle's q.p_brand = p.p_brand (NULL never equals), so NOT
    # EXISTS keeps it unconditionally — but the list-form equi-join
    # below silently DROPS NULL brands (fixture-caught); route them
    # straight to the output
    null_brand = p.filter(F.col("p_brand").isNull())
    p = p.filter(F.col("p_brand").isNotNull())
    per_size = p.groupBy("p_brand", "p_size").agg(F.min("price").alias("minp"))
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_size.withColumn("better_minp", F.min("minp").over(w))
    return (
        p.join(frontier, ["p_brand", "p_size"])
        .filter(
            (F.col("better_minp").isNull() | (F.col("better_minp") > F.col("price")))
            & (F.col("price") <= F.col("minp"))
        )
        .select("p_brand", "p_partkey", "p_size", "price")
        .unionByName(null_brand.select("p_brand", "p_partkey", "p_size", "price"))
    )


@register(
    "q_column_mask",
    oracle="""
    SELECT c_custkey,
      regexp_replace(regexp_replace(regexp_replace(c_name,
        '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        AS name_masked,
      c_mktsegment
    FROM customer
    """,
)
def q_column_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking for governed exposure (the analyst-facing
    complement to q_pii_redact's destructive scrub and q_aes_roundtrip's
    reversible encryption): ``mask`` rewrites upper→'X', lower→'x',
    digit→'n', leaving punctuation — shape-preserving, so downstream
    LIKE/length logic still behaves, but the value is gone.  One
    codegen'd projection, map-only; in production this expression lives
    in a VIEW so the masking policy travels with the table grant, not
    with each query."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        "c_mktsegment",
    )


@register(
    "q_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
      CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bin,
      COUNT(*) AS n,
      COUNT(*) < 10 AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000.0) AS BIGINT)
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance: k-anonymity audit (Sweeney 2002 — public).  Every
    quasi-identifier combination — (nation, market segment, coarse
    balance bin) — with its population count and a re-identification
    flag for groups smaller than k = 10: rows in such groups are
    linkable to individuals by the QI columns alone, so they must be
    generalized (wider bins), suppressed, or masked
    (q_column_mask / q_pseudonymize are the remediation steps).

    Plan: ONE conditional hash aggregate over the QI key — auditing is
    a scan, adding QI columns only widens the grouping key.  The bin
    expression floor(bal/1000.0) is the same IEEE double op on both
    engines, so group keys match exactly.  At 100 TB the QI-group
    domain is bounded (|nations|·|segments|·|bins|), so the aggregate
    output is tiny regardless of customer count; the k threshold is a
    literal the optimizer folds."""
    c = load_table(spark, sf_dir, "customer")
    bal_bin = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
    return (
        c.groupBy("c_nationkey", "c_mktsegment", bal_bin.alias("bal_bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bin",
            "n",
            (F.col("n") < 10).alias("at_risk"),
        )
    )


# t-closeness threshold (flag groups whose EMD exceeds it) and the
# sensitive band width shared with q_l_diversity (featureprep.py)
_TCLOSE_T = 0.2


@register(
    "q_t_closeness",
    oracle=f"""
    WITH cust AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
      FROM customer WHERE c_acctbal IS NOT NULL
    ),
    g AS (
      SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS cnt
      FROM cust GROUP BY 1, 2, 3
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment, SUM(cnt) AS n_g
      FROM g GROUP BY 1, 2
    ),
    bandall AS (
      SELECT band, COUNT(*) AS cnt_all FROM cust GROUP BY band
    ),
    bandall2 AS (
      SELECT band,
        SUM(cnt_all) OVER (ORDER BY band
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
      FROM bandall
    ),
    tot AS (
      SELECT SUM(cnt_all) AS n_total, COUNT(*) AS m FROM bandall
    ),
    grid AS (
      SELECT grp.c_nationkey, grp.c_mktsegment, grp.n_g,
        bandall2.band, bandall2.cum_all,
        SUM(COALESCE(g.cnt, 0)) OVER (
          PARTITION BY grp.c_nationkey, grp.c_mktsegment
          ORDER BY bandall2.band
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
      FROM grp CROSS JOIN bandall2
      LEFT JOIN g ON g.c_nationkey = grp.c_nationkey
        AND g.c_mktsegment = grp.c_mktsegment AND g.band = bandall2.band
    )
    SELECT grid.c_nationkey, grid.c_mktsegment,
      CAST(grid.n_g AS BIGINT) AS group_size,
      CASE WHEN tot.m > 1 THEN
        round(CAST(SUM(abs(CAST(grid.cum_g AS DECIMAL(38,0)) * tot.n_total
                           - CAST(grid.cum_all AS DECIMAL(38,0)) * grid.n_g))
                   AS DOUBLE)
              / (CAST(grid.n_g AS DOUBLE) * tot.n_total * (tot.m - 1)), 6)
      ELSE 0.0 END AS emd,
      CASE WHEN tot.m > 1 THEN
        round(CAST(SUM(abs(CAST(grid.cum_g AS DECIMAL(38,0)) * tot.n_total
                           - CAST(grid.cum_all AS DECIMAL(38,0)) * grid.n_g))
                   AS DOUBLE)
              / (CAST(grid.n_g AS DOUBLE) * tot.n_total * (tot.m - 1)), 6)
      ELSE 0.0 END <= {_TCLOSE_T} AS meets_t
    FROM grid CROSS JOIN tot
    GROUP BY grid.c_nationkey, grid.c_mktsegment, grid.n_g,
             tot.n_total, tot.m
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007, public) —
    the third rung of the privacy ladder after q_k_anonymity (group
    size) and q_l_diversity (distinct sensitive values): a group is
    t-close when the Earth Mover's Distance between ITS sensitive
    distribution and the GLOBAL one is ≤ t.  A group can be large AND
    diverse yet still skewed (e.g. 90% of one nation-segment in the
    top balance band) — exactly the leak EMD catches.  Sensitive
    attribute = the ordered acctbal band of q_l_diversity; for ordered
    attributes EMD has the closed form (1/(m−1))·Σᵢ|cumP(i) − cumQ(i)|.

    Determinism — the EMD is computed with INTEGER-EXACT arithmetic:
    |cumP − cumQ| = |cum_g·N − cum_all·n_g| / (n_g·N), so the sum runs
    over DECIMAL(38,0) products (order-independent, overflow-safe at
    any N) and ONE double division + 6dp round happens at the end.  No
    float ever enters an aggregate.

    Scale: two hash aggregates over the data (QI×band, band), then
    everything operates on the bounded grid |QI groups|·|bands| —
    cumulative windows partition on the QI key with ≤|bands| rows per
    partition, the global spine is one bounded window, and the totals
    row broadcasts.  Output is QI-domain-bounded regardless of row
    count."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("band"),
        )
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grp = g.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("n_g")
    )
    glob = cust.groupBy("band").agg(F.count(F.lit(1)).alias("cnt_all"))
    w_glob = Window.orderBy(F.asc_nulls_last("band")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    glob2 = glob.select("band", F.sum("cnt_all").over(w_glob).alias("cum_all"))
    tot = glob.agg(
        F.sum("cnt_all").alias("n_total"), F.count(F.lit(1)).alias("m")
    )
    g2 = g.withColumnsRenamed(
        {"c_nationkey": "gn", "c_mktsegment": "gs", "band": "gb"}
    )
    grid = (
        grp.join(F.broadcast(glob2))
        .join(
            g2,
            (F.col("gn") == F.col("c_nationkey"))
            & (F.col("gs") == F.col("c_mktsegment"))
            & (F.col("gb") == F.col("band")),
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "band",
            "cum_all",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    w_g = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy(F.asc_nulls_last("band"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumulated = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "n_g",
        "cum_all",
        F.sum("cnt").over(w_g).alias("cum_g"),
    )
    term = F.abs(
        F.col("cum_g").cast("decimal(38,0)") * F.col("n_total")
        - F.col("cum_all").cast("decimal(38,0)") * F.col("n_g")
    )
    # m = 1 (single sensitive band) makes the closed form 0/0; a
    # one-band distribution is trivially t-close, so BOTH engines pin
    # it to 0 (0/0 is NULL-vs-NaN otherwise)
    emd = (
        F.when(
            F.col("m") > 1,
            F.round(
                F.col("emd_num").cast("double")
                / (
                    F.col("n_g").cast("double")
                    * F.col("n_total")
                    * (F.col("m") - 1)
                ),
                6,
            ),
        )
        .otherwise(0.0)
    )
    return (
        cumulated.join(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_g", "n_total", "m")
        .agg(F.sum(term).alias("emd_num"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n_g").cast("bigint").alias("group_size"),
            emd.alias("emd"),
            (emd <= _TCLOSE_T).alias("meets_t"),
        )
    )


# Laplace mechanism: epsilon = 1, count sensitivity = 1 ⇒ scale b = 1.
# The noise draw is the deterministic inverse-CDF transform of the
# portable md5-uniform — reproducible across engines/runs/cluster
# sizes, which real DP release pipelines also want (seeded noise for
# audit replay).  NOTE: determinism trades away the unpredictability a
# production adversary model needs; swap the seed string per release.
_DP_EPSILON = 1.0


@register(
    "q_dp_noisy_count",
    oracle=f"""
    WITH counts AS (
      SELECT o_orderpriority AS category, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority
    ),
    u AS (
      SELECT category, n,
        {sql_md5_unit("category || ':dp-seed'")} AS u
      FROM counts
    )
    SELECT category,
      round(n + round(
        -CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
          * ln(GREATEST(1.0 - 2.0 * abs(u - 0.5), 1e-12)) / {_DP_EPSILON}, 6),
        6) AS noisy_count,
      CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
    FROM u
    """,
)
def q_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE counts via the LAPLACE MECHANISM (Dwork
    et al. 2006, public): each category count is released with
    Laplace(Δf/ε) noise (sensitivity 1 for a count, ε = 1) — the
    fourth rung of the privacy ladder after k-anonymity, l-diversity
    and t-closeness: those audit the data, DP protects the RELEASE
    itself.

    The draw is the inverse-CDF transform noise =
    −b·sign(u−½)·ln(1−2|u−½|) of the engine-portable md5-uniform
    (functions/portable_hash.py) — deterministic and replayable, as
    DP audit pipelines require (the seed string is the privacy
    parameter to rotate per release).  The ln argument is floored at
    1e-12 so a pathological u → 0 can't produce −inf.

    Determinism: the uniform, the sign, and the single ln (rounded
    6dp, the transcendental policy) are identical on both engines.
    Scale: ONE hash aggregate; the noise is a projection over the
    category-bounded result."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("n")
    )
    u = md5_unit(F.concat(F.col("category"), F.lit(":dp-seed")))
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.round(
        -sign
        * F.log(
            F.greatest(
                F.lit(1.0) - 2.0 * F.abs(u - 0.5), F.lit(1e-12)
            )
        )
        / _DP_EPSILON,
        6,
    )
    return counts.select(
        "category",
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
        F.lit(_DP_EPSILON).cast("double").alias("epsilon"),
    )


_HBOS_BINS = 20
_HBOS_TOPK = 20


@register(
    "q_hbos_outliers",
    oracle=f"""
    WITH cust AS (
      SELECT c.c_custkey, c.c_acctbal AS bal,
        COALESCE(o.n_orders, 0) AS n_orders
      FROM customer c
      LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
      ) o ON o.o_custkey = c.c_custkey
      WHERE c.c_acctbal IS NOT NULL
    ),
    ext AS (
      SELECT MIN(bal) AS bmin, MAX(bal) AS bmax,
        MIN(n_orders) AS cmin, MAX(n_orders) AS cmax
      FROM cust
    ),
    binned AS (
      SELECT c_custkey, bal, n_orders,
        CASE WHEN bmax > bmin THEN LEAST(CAST(floor(
          (bal - bmin) * {_HBOS_BINS} / (bmax - bmin)) AS BIGINT),
          {_HBOS_BINS - 1}) ELSE 0 END AS bal_bin,
        CASE WHEN cmax > cmin THEN LEAST(CAST(floor(
          CAST((n_orders - cmin) * {_HBOS_BINS} AS DOUBLE)
          / (cmax - cmin)) AS BIGINT), {_HBOS_BINS - 1}) ELSE 0 END
          AS cnt_bin
      FROM cust CROSS JOIN ext
    ),
    nn AS (SELECT COUNT(*) AS n FROM binned),
    bd AS (
      SELECT bal_bin, COUNT(*) AS c FROM binned GROUP BY bal_bin
    ),
    cd AS (
      SELECT cnt_bin, COUNT(*) AS c FROM binned GROUP BY cnt_bin
    )
    SELECT b.c_custkey, b.bal AS acctbal,
      CAST(b.n_orders AS BIGINT) AS n_orders,
      round(round(-ln(CAST(bd.c AS DOUBLE) / nn.n), 6)
            + round(-ln(CAST(cd.c AS DOUBLE) / nn.n), 6), 6) AS hbos
    FROM binned b
    JOIN bd ON bd.bal_bin = b.bal_bin
    JOIN cd ON cd.cnt_bin = b.cnt_bin
    CROSS JOIN nn
    ORDER BY hbos DESC, b.c_custkey
    LIMIT {_HBOS_TOPK}
    """,
)
def q_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM-BASED OUTLIER SCORE (HBOS, Goldstein & Dengel 2012,
    public): per customer, the sum of negative log bin-densities over
    two features (account balance, order count) — the linear-time
    density-based outlier detector that complements q_mad_outliers'
    single-feature robust gate and q_embedding_outliers' vector-space
    distance: a customer can be unremarkable on each feature's tails
    yet land in a jointly sparse histogram cell.  Top-20 by score.

    Determinism: bin edges are one double expression over global
    integer/2dp-exact extents — identical trees both engines; each
    feature's −ln(density) rounds 6dp before the (fixed 2-term) sum;
    ties at the top-k boundary break on the total (score, custkey)
    key.  Single-valued features collapse to bin 0 (no 0-width
    division).

    Scale: one extents aggregate (1 row, broadcast), one 20-row
    density table per feature (broadcast back), and a TakeOrdered
    top-k [plan-pinned] — the fact table never shuffles; density
    lookups are map-side."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    cust = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )
    ext = cust.agg(
        F.min("bal").alias("bmin"),
        F.max("bal").alias("bmax"),
        F.min("n_orders").alias("cmin"),
        F.max("n_orders").alias("cmax"),
    )

    def binof(x, lo, hi):
        return F.when(
            F.col(hi) > F.col(lo),
            F.least(
                F.floor(
                    (F.col(x) - F.col(lo))
                    * _HBOS_BINS
                    / (F.col(hi) - F.col(lo))
                ).cast("bigint"),
                F.lit(_HBOS_BINS - 1),
            ),
        ).otherwise(F.lit(0))

    binned = cust.join(F.broadcast(ext)).select(
        "c_custkey",
        "bal",
        "n_orders",
        binof("bal", "bmin", "bmax").alias("bal_bin"),
        F.when(
            F.col("cmax") > F.col("cmin"),
            F.least(
                F.floor(
                    ((F.col("n_orders") - F.col("cmin")) * _HBOS_BINS).cast(
                        "double"
                    )
                    / (F.col("cmax") - F.col("cmin"))
                ).cast("bigint"),
                F.lit(_HBOS_BINS - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("cnt_bin"),
    )
    nn = binned.agg(F.count(F.lit(1)).alias("n"))
    bd = binned.groupBy("bal_bin").agg(F.count(F.lit(1)).alias("bc"))
    cd = binned.groupBy("cnt_bin").agg(F.count(F.lit(1)).alias("cc"))
    neg_ln = lambda c_, n_: F.round(-F.log(c_.cast("double") / n_), 6)
    return (
        binned.join(F.broadcast(bd), "bal_bin")
        .join(F.broadcast(cd), "cnt_bin")
        .join(F.broadcast(nn))
        .select(
            "c_custkey",
            F.col("bal").alias("acctbal"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.round(
                neg_ln(F.col("bc"), F.col("n"))
                + neg_ln(F.col("cc"), F.col("n")),
                6,
            ).alias("hbos"),
        )
        .orderBy(F.desc("hbos"), "c_custkey")
        .limit(_HBOS_TOPK)
    )


# -------------------------------------------------- Simpson's paradox


def _xmul_sign(x: str, v: str, y: str, u: str):
    """sign(x·v − y·u) with the cross-multiply done in decimal(19,0) so
    a product of two large int64 counts can never overflow (exact below
    ~1e38; DuckDB's int128 arithmetic agrees).  The double cast at the
    end carries only the sign into signum."""
    d = F.col(x).cast("decimal(19,0)") * F.col(v).cast("decimal(19,0)") - (
        F.col(y).cast("decimal(19,0)") * F.col(u).cast("decimal(19,0)")
    )
    return F.signum(d.cast("double"))


@register(
    "q_simpsons_check",
    oracle="""
    WITH base AS (
      SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
        CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND c.c_nationkey IS NOT NULL AND l.l_returnflag IS NOT NULL
    ),
    pooled AS (
      SELECT
        SUM(CASE WHEN seg = 'BUILDING' THEN ret ELSE 0 END) AS ra,
        SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN seg = 'MACHINERY' THEN ret ELSE 0 END) AS rb,
        SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS nb
      FROM base
    ),
    strata AS (
      SELECT nation,
        SUM(CASE WHEN seg = 'BUILDING' THEN ret ELSE 0 END) AS ra,
        SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN seg = 'MACHINERY' THEN ret ELSE 0 END) AS rb,
        SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS nb
      FROM base GROUP BY nation
    )
    SELECT s.nation,
      CAST(s.na AS BIGINT) AS n_a, CAST(s.nb AS BIGINT) AS n_b,
      CASE WHEN s.na > 0
        THEN round(CAST(s.ra AS DOUBLE) / s.na, 6) END AS rate_a,
      CASE WHEN s.nb > 0
        THEN round(CAST(s.rb AS DOUBLE) / s.nb, 6) END AS rate_b,
      (s.na > 0 AND s.nb > 0 AND p.na > 0 AND p.nb > 0
       AND sign(s.ra * s.nb - s.rb * s.na)
           * sign(p.ra * p.nb - p.rb * p.na) < 0)
        AS reverses_pooled
    FROM strata s CROSS JOIN pooled p
    """,
)
def q_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX detector: compare the return rate of two
    customer segments POOLED vs WITHIN each nation stratum, flagging
    strata whose direction contradicts the pooled comparison — the
    classic aggregation trap every metrics warehouse should alarm on
    before a pooled "segment A returns more" headline ships.

    Exactness: the direction test cross-multiplies counts in exact
    decimal arithmetic (ra·nb − rb·na in decimal(19,0) products,
    overflow-free below ~1e38 — see _xmul_sign), so the comparison —
    including the sign product against the pooled direction — never
    rounds; displayed
    rates are integer-ratio doubles with 6dp guards and NULL on empty
    strata.

    Scale: one fact join reduced by a (nation, segment) conditional
    aggregate (map-side partials, bounded output |nation|); the pooled
    row is a 1-row broadcast cross join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_nationkey").isNotNull()
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            (F.col("l_returnflag") == "R").cast("long").alias("ret"),
        )
    )
    aggs = [
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("ret")).otherwise(0)).alias("ra"),
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("seg") == "MACHINERY", F.col("ret")).otherwise(0)).alias("rb"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).alias("nb"),
    ]
    pooled = base.agg(*aggs).select(
        F.col("ra").alias("p_ra"), F.col("na").alias("p_na"),
        F.col("rb").alias("p_rb"), F.col("nb").alias("p_nb"),
    )
    strata = base.groupBy("nation").agg(*aggs)
    j = strata.join(F.broadcast(pooled))
    return j.select(
        "nation",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.when(F.col("na") > 0,
               F.round(F.col("ra").cast("double") / F.col("na"), 6)).alias("rate_a"),
        F.when(F.col("nb") > 0,
               F.round(F.col("rb").cast("double") / F.col("nb"), 6)).alias("rate_b"),
        (
            (F.col("na") > 0) & (F.col("nb") > 0)
            & (F.col("p_na") > 0) & (F.col("p_nb") > 0)
            & (
                # compare SIGNS, never the raw product, and do the
                # cross-multiply in decimal: two int64 counts multiplied
                # in int64 overflow at blowups past sf10 (caught by the
                # sf10 probe; DuckDB's int128 masks what Spark ANSI
                # errors on).  decimal(19,0)x(19,0) holds any product of
                # counts below ~1e38 exactly, so the sign is exact at
                # any scale; the final double cast only carries the sign
                # into signum (r12, ADVICE).
                _xmul_sign("ra", "nb", "rb", "na")
                * _xmul_sign("p_ra", "p_nb", "p_rb", "p_na")
                < 0
            )
        ).alias("reverses_pooled"),
    )
