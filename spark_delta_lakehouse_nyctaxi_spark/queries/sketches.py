"""Deterministic, ENGINE-PORTABLE sketch structures as queries.

The approximate-aggregate family (q_approx_distinct / q_approx_quantiles
/ q_freq_items) is rows-only by nature: Spark's HLL++/KLL internals are
implementation-defined, so no other engine can reproduce their bytes.
This module closes that gap from the other side: it builds the classic
sketches — HyperLogLog, Count-Min, Bloom — from FIRST PRINCIPLES on a
portable hash family (the md5-derived 60-bit id of
``operators/dedup.py:md5_id`` and the seeded ``(a*x+b) mod P`` linear
family of ``linear_hash_coeffs``), so every register / counter / bit is
an exact integer that DuckDB recomputes bit-for-bit.  The estimates are
then a fixed, shared IEEE expression tree over those integers — fully
value-oracled, unlike any engine-native sketch.

Why this matters at 100 TB: these are THE mergeable-summary structures
of a large-scale pipeline (cardinality monitoring, heavy-key detection,
membership pre-filters for anti-join pruning).  Each build here is one
map-side-combining aggregate whose shuffle carries only registers /
counters / set bits (≤ a few thousand rows regardless of input size),
i.e. the communication pattern that makes sketches worth using — and
because the hash family is engine-portable, a sketch built by this
engine can be UNIONED with one built by any other md5-capable system
(the merge is max/sum/OR of small frames), which is exactly how
cross-cluster cardinality rollups are assembled in practice.

Reference parity: the reference pipeline has no sketch layer at all
(its dedup/DQ code touches approx_count_distinct only via Spark
built-ins); this extends the engine's governance/monitoring surface the
way SURVEY.md §2's training-data tier calls for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import MINHASH_PRIME, linear_hash_coeffs, md5_id
from ..sources.readers import load_table
from . import register

_P = MINHASH_PRIME  # 2^31 - 1, shared with the MinHash permutation family

# ---------------------------------------------------------------------------
# HyperLogLog (p=8, m=256) over distinct order-placing customers
# ---------------------------------------------------------------------------

_HLL_M = 256  # 2^8 registers
_HLL_REST_BITS = 52  # 60-bit md5 id minus the 8 bucket bits


def _hll_oracle_sql() -> str:
    return f"""
    WITH hashed AS (
        SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h,
               o_custkey
        FROM orders
    ),
    parts AS (
        SELECT h % {_HLL_M} AS bucket, h // {_HLL_M} AS rest, o_custkey
        FROM hashed
    ),
    regs AS (
        SELECT bucket,
               MAX(CASE WHEN rest = 0 THEN {_HLL_REST_BITS + 1}
                        ELSE bit_count((rest & -rest) - 1) + 1 END) AS m_j,
               COUNT(DISTINCT o_custkey) AS nd
        FROM parts GROUP BY bucket
    ),
    folded AS (
        SELECT COUNT(*) AS n_set,
               SUM((CAST(1 AS BIGINT) << ({_HLL_REST_BITS + 1} - m_j))) AS s_present,
               SUM(m_j * (bucket + 1)) AS register_checksum,
               SUM(nd) AS n_exact
        FROM regs
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_set AS BIGINT) AS n_registers_set,
           CAST(register_checksum AS BIGINT) AS register_checksum,
           CAST(s_present + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {_HLL_REST_BITS + 1}) AS BIGINT) AS denom_scaled,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
               / CAST(s_present + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {_HLL_REST_BITS + 1}) AS DOUBLE) AS hll_estimate,
           ABS((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
               / CAST(s_present + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {_HLL_REST_BITS + 1}) AS DOUBLE)
               - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
    FROM folded
    """


@register(
    "q_hll_sketch",
    _hll_oracle_sql(),
    doc="HyperLogLog from FIRST PRINCIPLES (p=8, m=256) over the "
        "distinct order-placing customers, on the engine-portable "
        "60-bit md5 hash (operators/dedup.py:md5_id) — every register "
        "is an exact integer DuckDB recomputes bit-for-bit, unlike "
        "the rows-only engine-native q_approx_distinct.  rho is "
        "trailing-zeros+1 of the 52 post-bucket bits via the branch-"
        "free (x & -x) bit_count identity; the estimate denominator "
        "sum(2^-M_j) is kept EXACT by scaling to 2^53 (every term an "
        "integer, max 256*2^53 < 2^62 — no FP accumulation at all), "
        "and the final alpha*m^2/S is one shared IEEE expression "
        "tree, so even the DOUBLE columns match bitwise.  The exact "
        "distinct count rides the same single aggregation (buckets "
        "partition the key space, so per-bucket COUNT(DISTINCT) sums "
        "to the global count) — build + ground truth in ONE pass, no "
        "scalar-attach join.  Scale: the shuffle after the map-side "
        "partial carries at most 256 (bucket, rho-max, nd) rows per "
        "task regardless of input size — this is the mergeable-"
        "summary communication pattern that makes HLL the standard "
        "cardinality monitor at 100 TB, and on this hash family the "
        "registers can be merged (max) with sketches built by ANY "
        "md5-capable engine.",
)
def q_hll_sketch(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # rest MUST be integer arithmetic: h is up to 2^60, double division
    # by 256 would round the low bits away (and the low bits are the
    # whole point — rho reads them).
    parts = orders.select(
        md5_id(F.col("o_custkey").cast("string")).alias("h"), "o_custkey"
    ).select(
        (F.col("h") % _HLL_M).alias("bucket"),
        F.shiftright(F.col("h"), 8).alias("rest"),
        "o_custkey",
    )
    rho = (
        F.when(F.col("rest") == 0, F.lit(_HLL_REST_BITS + 1))
        .otherwise(
            F.bit_count(F.expr("(rest & -rest)") - F.lit(1)) + F.lit(1)
        )
    )
    regs = parts.groupBy("bucket").agg(
        F.max(rho).alias("m_j"),
        F.count_distinct("o_custkey").alias("nd"),
    )
    folded = regs.agg(
        F.count("*").alias("n_set"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_REST_BITS + 1} - CAST(m_j AS INT))")
        ).alias("s_present"),
        F.sum(F.col("m_j") * (F.col("bucket") + 1)).alias("register_checksum"),
        F.sum("nd").alias("n_exact"),
    )
    denom = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_set")) * F.shiftleft(
        F.lit(1).cast("long"), _HLL_REST_BITS + 1
    )
    alpha_m2_scale = (
        (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0)))
        * F.lit(65536.0)
        * F.lit(9007199254740992.0)
    )
    est = alpha_m2_scale / denom.cast("double")
    return folded.select(
        F.lit(_HLL_M).cast("long").alias("m"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_set").cast("long").alias("n_registers_set"),
        F.col("register_checksum").cast("long").alias("register_checksum"),
        denom.cast("long").alias("denom_scaled"),
        est.alias("hll_estimate"),
        (F.abs(est - F.col("n_exact").cast("double")) / F.col("n_exact").cast("double")).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (d=4, w=512) over per-user event counts
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 512
_CMS_COEFFS = linear_hash_coeffs(_CMS_D, seed=20250815)


def _cms_oracle_sql() -> str:
    cols = "\n            ".join(
        f"SELECT {r} AS r, ((({a} * user_id + {b}) % {_P}) % {_CMS_W}) AS c, user_id FROM events"
        + (" UNION ALL" if r < _CMS_D - 1 else "")
        for r, (a, b) in enumerate(_CMS_COEFFS)
    )
    probe_cols = ",\n               ".join(
        f"((({a} * user_id + {b}) % {_P}) % {_CMS_W}) AS c{r}"
        for r, (a, b) in enumerate(_CMS_COEFFS)
    )
    return f"""
    WITH cells AS (
            {cols}
    ),
    sketch AS (
        SELECT r, c, COUNT(*) AS cnt FROM cells GROUP BY r, c
    ),
    truth AS (
        SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
        ORDER BY true_count DESC, user_id LIMIT 20
    ),
    probes AS (
        SELECT user_id, true_count,
               {probe_cols}
        FROM truth
    ),
    melted AS (
        SELECT user_id, r, CASE r {' '.join(f'WHEN {i} THEN c{i}' for i in range(_CMS_D))} END AS c
        FROM probes, (SELECT unnest(range({_CMS_D})) AS r)
    ),
    est AS (
        SELECT m.user_id, MIN(s.cnt) AS cms_estimate
        FROM melted m JOIN sketch s ON m.r = s.r AND m.c = s.c
        GROUP BY m.user_id
    )
    SELECT t.user_id, CAST(t.true_count AS BIGINT) AS true_count,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(e.cms_estimate - t.true_count AS BIGINT) AS overestimate
    FROM truth t JOIN est e ON t.user_id = e.user_id
    """


@register(
    "q_count_min",
    _cms_oracle_sql(),
    doc="Count-Min sketch from FIRST PRINCIPLES (d=4 rows, w=512 "
        "columns, the seeded (a*x+b) mod P linear family of "
        "operators/dedup.py:linear_hash_coeffs embedded as literals "
        "in BOTH engines) over per-user event counts, probed at the "
        "exact top-20 heavy users: estimate = min over the 4 row "
        "counters, reported next to the exact count with the "
        "one-sided error — the CM guarantee (estimate >= truth, "
        "checked as an always-nonnegative integer column and asserted "
        "in pytest) is thereby VERIFIED against ground truth, not "
        "assumed.  All counters are exact integers: the whole query "
        "is bitwise across engines, unlike any engine-native sketch. "
        "Scale: the build is one map-side-combining groupBy whose "
        "shuffle carries at most d*w = 2048 counter rows per task at "
        "ANY input size (the d-fold cell fan-out happens map-side, "
        "pre-combine); the probe side joins 80 cells against the "
        "broadcast counter frame.  This is the heavy-key detector "
        "that sizes salting decisions (q_join_salted) without a "
        "second full scan of the fact table.",
)
def q_count_min(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        F.posexplode(
            F.array(
                *[
                    ((F.lit(a) * F.col("user_id") + F.lit(b)) % _P % _CMS_W)
                    for a, b in _CMS_COEFFS
                ]
            )
        ).alias("r", "c")
    )
    sketch = cells.groupBy("r", "c").agg(F.count("*").alias("cnt"))

    truth = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "user_id")
        .limit(20)
    )
    melted = truth.select(
        "user_id",
        F.posexplode(
            F.array(
                *[
                    ((F.lit(a) * F.col("user_id") + F.lit(b)) % _P % _CMS_W)
                    for a, b in _CMS_COEFFS
                ]
            )
        ).alias("r", "c"),
    )
    est = (
        melted.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return (
        truth.join(F.broadcast(est), "user_id")
        .select(
            "user_id",
            F.col("true_count").cast("long").alias("true_count"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("true_count")).cast("long").alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter (m=8192 bits, k=3) membership pre-filter, FP rate measured
# ---------------------------------------------------------------------------

_BLOOM_M = 8192
_BLOOM_K = 3
_BLOOM_COEFFS = linear_hash_coeffs(_BLOOM_K, seed=20250816)


def _bloom_oracle_sql() -> str:
    member_pos = "\n            ".join(
        f"SELECT ((({a} * o_custkey + {b}) % {_P}) % {_BLOOM_M}) AS pos FROM orders"
        + (" UNION ALL" if i < _BLOOM_K - 1 else "")
        for i, (a, b) in enumerate(_BLOOM_COEFFS)
    )
    probe_hits = " + ".join(
        f"CASE WHEN ((({a} * c_custkey + {b}) % {_P}) % {_BLOOM_M}) IN (SELECT pos FROM bits) THEN 1 ELSE 0 END"
        for a, b in _BLOOM_COEFFS
    )
    return f"""
    WITH bits AS (
        SELECT DISTINCT pos FROM (
            {member_pos}
        )
    ),
    members AS (SELECT DISTINCT o_custkey FROM orders),
    probed AS (
        SELECT c.c_custkey, c.c_mktsegment,
               ({probe_hits}) = {_BLOOM_K} AS claimed,
               c.c_custkey IN (SELECT o_custkey FROM members) AS actual
        FROM customer c
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT) AS n_claimed,
           CAST(SUM(CASE WHEN claimed AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN actual AND NOT claimed THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
    FROM probed GROUP BY c_mktsegment
    """


@register(
    "q_bloom_membership",
    _bloom_oracle_sql(),
    doc="Bloom filter from FIRST PRINCIPLES (m=8192 bits, k=3 seeded "
        "linear hashes) built over the order-placing customers and "
        "probed by the FULL customer table, grouped by market "
        "segment: claimed membership (all k bits set) vs actual "
        "membership (semi-join truth), with the measured false-"
        "positive count and the n_false_neg column that the Bloom "
        "guarantee forces to 0 — the zero-false-negative invariant "
        "is an oracled OUTPUT, not a comment (pytest asserts it "
        "too).  Every bit position is an exact integer on the shared "
        "hash family, so the whole audit is bitwise across engines. "
        "Scale: the build aggregates to <= m distinct set-bit rows "
        "(one map-side-combining distinct); probes join their k "
        "positions against the BROADCAST bit set — the exact shape "
        "of a join pre-filter at 100 TB, where shipping an 8 KB bit "
        "array replaces shuffling the full probe side (this is the "
        "hand-rolled, portable analogue of q_bloom_join's runtime "
        "injected filter, with its FP cost made measurable).",
)
def q_bloom_membership(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def positions(col):
        return [
            ((F.lit(a) * col + F.lit(b)) % _P % _BLOOM_M)
            for a, b in _BLOOM_COEFFS
        ]

    bits = (
        orders.select(F.explode(F.array(*positions(F.col("o_custkey")))).alias("pos"))
        .distinct()
    )
    members = orders.select("o_custkey").distinct()

    probe_pos = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_hits"))
    )
    probed = (
        cust.join(F.broadcast(hits), "c_custkey", "left")
        .join(
            F.broadcast(members.withColumn("__is_member", F.lit(True))),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(
            "c_mktsegment",
            (F.coalesce(F.col("n_hits"), F.lit(0)) == _BLOOM_K).alias("claimed"),
            F.coalesce(F.col("__is_member"), F.lit(False)).alias("actual"),
        )
    )
    return probed.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("claimed"), 1).otherwise(0)).cast("long").alias("n_claimed"),
        F.sum(F.when(F.col("claimed") & ~F.col("actual"), 1).otherwise(0)).cast("long").alias("n_false_pos"),
        F.sum(F.when(F.col("actual") & ~F.col("claimed"), 1).otherwise(0)).cast("long").alias("n_false_neg"),
    )


# ---------------------------------------------------------------------------
# HLL mergeability: per-segment sketches union to the global sketch
# ---------------------------------------------------------------------------


def _hll_merge_oracle_sql() -> str:
    rest = _HLL_REST_BITS
    return f"""
    WITH hashed AS (
        SELECT ('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    parts AS (
        SELECT seg, h % {_HLL_M} AS bucket,
               CASE WHEN h // {_HLL_M} = 0 THEN {rest + 1}
                    ELSE bit_count(((h // {_HLL_M}) & -(h // {_HLL_M})) - 1) + 1
               END AS rho
        FROM hashed
    ),
    shard AS (
        SELECT seg, bucket, MAX(rho) AS m_j FROM parts GROUP BY seg, bucket
    ),
    merged AS (
        SELECT bucket, MAX(m_j) AS m_j FROM shard GROUP BY bucket
    ),
    direct AS (
        SELECT bucket, MAX(rho) AS m_j FROM parts GROUP BY bucket
    ),
    fm AS (
        SELECT COUNT(*) AS n_set,
               SUM((CAST(1 AS BIGINT) << ({rest + 1} - m_j))) AS s_present,
               SUM(m_j * (bucket + 1)) AS checksum_merged
        FROM merged
    ),
    fd AS (
        SELECT SUM(m_j * (bucket + 1)) AS checksum_direct FROM direct
    ),
    shards AS (SELECT COUNT(DISTINCT seg) AS n_shards FROM shard)
    SELECT CAST(n_shards AS BIGINT) AS n_shards,
           CAST(n_set AS BIGINT) AS n_registers_set,
           CAST(checksum_merged AS BIGINT) AS checksum_merged,
           CAST(checksum_direct AS BIGINT) AS checksum_direct,
           checksum_merged = checksum_direct AS merge_lossless,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
               / CAST(s_present + ({_HLL_M} - n_set) * (CAST(1 AS BIGINT) << {rest + 1}) AS DOUBLE)
               AS hll_estimate
    FROM fm, fd, shards
    """


@register(
    "q_hll_merge",
    _hll_merge_oracle_sql(),
    doc="HLL MERGEABILITY certificate: build one q_hll_sketch-family "
        "sketch PER MARKET SEGMENT (the cross-cluster / per-shard "
        "build), union them by register-wise MAX, and prove the merge "
        "lossless by emitting the merged AND direct-global register "
        "checksums side by side with their equality as an output "
        "column — the algebraic property (max of shard maxima = global "
        "max) that makes sketches THE cross-datacenter cardinality "
        "rollup, here verified as data instead of assumed. Shape: one "
        "fact-dim equi-join, then (seg, bucket) and (bucket) map-side-"
        "combining aggregates over at most shards x 256 register rows; "
        "the only data-sized step is the join. Every register is an "
        "exact integer on the portable md5 family — bitwise oracle, "
        "estimate included.",
)
def q_hll_merge(spark, sf_dir):
    rest = _HLL_REST_BITS
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hashed = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        md5_id(F.col("o_custkey").cast("string")).alias("h"),
        F.col("c_mktsegment").alias("seg"),
    )
    rho = (
        F.when(F.shiftright(F.col("h"), 8) == 0, F.lit(rest + 1))
        .otherwise(
            F.bit_count(F.expr("(shiftright(h, 8) & -shiftright(h, 8))") - F.lit(1))
            + F.lit(1)
        )
    )
    parts = hashed.select("seg", (F.col("h") % _HLL_M).alias("bucket"), rho.alias("rho"))
    shard = parts.groupBy("seg", "bucket").agg(F.max("rho").alias("m_j"))
    merged = shard.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    direct = parts.groupBy("bucket").agg(F.max("rho").alias("m_j"))
    fm = merged.agg(
        F.count("*").alias("n_set"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rest + 1} - CAST(m_j AS INT))")
        ).alias("s_present"),
        F.sum(F.col("m_j") * (F.col("bucket") + 1)).alias("checksum_merged"),
    )
    fd = direct.agg(F.sum(F.col("m_j") * (F.col("bucket") + 1)).alias("checksum_direct"))
    shards = shard.agg(F.count_distinct("seg").alias("n_shards"))
    denom = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_set")) * F.shiftleft(
        F.lit(1).cast("long"), rest + 1
    )
    alpha_m2_scale = (
        (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0)))
        * F.lit(65536.0)
        * F.lit(9007199254740992.0)
    )
    from .aggregates import attach_scalar

    out = attach_scalar(attach_scalar(fm, fd), shards)
    return out.select(
        F.col("n_shards").cast("long").alias("n_shards"),
        F.col("n_set").cast("long").alias("n_registers_set"),
        F.col("checksum_merged").cast("long").alias("checksum_merged"),
        F.col("checksum_direct").cast("long").alias("checksum_direct"),
        (F.col("checksum_merged") == F.col("checksum_direct")).alias("merge_lossless"),
        (alpha_m2_scale / denom.cast("double")).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# HLL inclusion-exclusion: intersection-cardinality estimate vs exact
# ---------------------------------------------------------------------------


def _hll_est_sql(n_set: str, s_present: str) -> str:
    rest1 = _HLL_REST_BITS + 1
    return (
        f"(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0"
        f" / CAST({s_present} + ({_HLL_M} - {n_set}) *"
        f" (CAST(1 AS BIGINT) << {rest1}) AS DOUBLE)"
    )


def _hll_intersect_oracle_sql() -> str:
    rest = _HLL_REST_BITS
    return f"""
    WITH tagged AS (
        SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h,
               o_custkey,
               o_orderpriority = '1-URGENT' AS in_a,
               o_orderpriority = '5-LOW' AS in_b
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    parts AS (
        SELECT in_a, in_b, h % {_HLL_M} AS bucket,
               CASE WHEN h // {_HLL_M} = 0 THEN {rest + 1}
                    ELSE bit_count(((h // {_HLL_M}) & -(h // {_HLL_M})) - 1) + 1
               END AS rho,
               o_custkey
        FROM tagged
    ),
    regs AS (
        SELECT bucket,
               MAX(CASE WHEN in_a THEN rho END) AS m_a,
               MAX(CASE WHEN in_b THEN rho END) AS m_b,
               MAX(rho) AS m_u
        FROM parts GROUP BY bucket
    ),
    folded AS (
        SELECT COUNT(m_a) AS k_a, COUNT(m_b) AS k_b, COUNT(m_u) AS k_u,
               SUM(CASE WHEN m_a IS NOT NULL
                        THEN (CAST(1 AS BIGINT) << ({rest + 1} - m_a)) END) AS s_a,
               SUM(CASE WHEN m_b IS NOT NULL
                        THEN (CAST(1 AS BIGINT) << ({rest + 1} - m_b)) END) AS s_b,
               SUM((CAST(1 AS BIGINT) << ({rest + 1} - m_u))) AS s_u
        FROM regs
    ),
    exact AS (
        SELECT COUNT(DISTINCT CASE WHEN in_a THEN o_custkey END) AS x_a,
               COUNT(DISTINCT CASE WHEN in_b THEN o_custkey END) AS x_b
        FROM parts
    ),
    exact_i AS (
        SELECT COUNT(*) AS x_i FROM (
            SELECT o_custkey FROM parts
            GROUP BY o_custkey HAVING BOOL_OR(in_a) AND BOOL_OR(in_b)
        )
    )
    SELECT CAST(x_a AS BIGINT) AS exact_a, CAST(x_b AS BIGINT) AS exact_b,
           CAST(x_i AS BIGINT) AS exact_intersection,
           {_hll_est_sql('k_a', 's_a')} AS est_a,
           {_hll_est_sql('k_b', 's_b')} AS est_b,
           {_hll_est_sql('k_u', 's_u')} AS est_union,
           {_hll_est_sql('k_a', 's_a')} + {_hll_est_sql('k_b', 's_b')}
               - {_hll_est_sql('k_u', 's_u')} AS est_intersection
    FROM folded, exact, exact_i
    """


@register(
    "q_hll_intersection",
    _hll_intersect_oracle_sql(),
    doc="HLL INCLUSION-EXCLUSION intersection estimate — the sketch "
        "composition a cost-based planner uses to size a join's key "
        "overlap WITHOUT scanning twice: urgent-order customers (A) vs "
        "low-priority customers (B), |A ∩ B| ≈ est(A) + est(B) - "
        "est(A ∪ B), where all THREE registers families come out of "
        "ONE grouped aggregate (the union registers are max(rho) over "
        "the tagged stream — no second pass, no union materialized) "
        "and the exact intersection rides the same lineage for the "
        "honesty check. Inclusion-exclusion on sketches is noisier "
        "than each component (documented HLL caveat) — which is "
        "exactly why the exact column sits next to it. Every register "
        "exact; estimates are shared IEEE trees — bitwise. Scale: one "
        "pass, ≤ 256 register rows shuffled.",
)
def q_hll_intersection(spark, sf_dir):
    rest = _HLL_REST_BITS
    orders = load_table(spark, sf_dir, "orders")
    tagged = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        md5_id(F.col("o_custkey").cast("string")).alias("h"),
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("in_a"),
        (F.col("o_orderpriority") == "5-LOW").alias("in_b"),
    )
    rho = (
        F.when(F.shiftright(F.col("h"), 8) == 0, F.lit(rest + 1))
        .otherwise(
            F.bit_count(F.expr("(shiftright(h, 8) & -shiftright(h, 8))") - F.lit(1))
            + F.lit(1)
        )
    )
    parts = tagged.select(
        "in_a", "in_b", (F.col("h") % _HLL_M).alias("bucket"), rho.alias("rho"), "o_custkey"
    )
    regs = parts.groupBy("bucket").agg(
        F.max(F.when(F.col("in_a"), F.col("rho"))).alias("m_a"),
        F.max(F.when(F.col("in_b"), F.col("rho"))).alias("m_b"),
        F.max("rho").alias("m_u"),
    )

    folded = regs.agg(
        F.count("m_a").alias("k_a"),
        F.count("m_b").alias("k_b"),
        F.count("m_u").alias("k_u"),
        F.sum(F.expr(f"CASE WHEN m_a IS NOT NULL THEN shiftleft(CAST(1 AS BIGINT), {rest + 1} - CAST(m_a AS INT)) END")).alias("s_a"),
        F.sum(F.expr(f"CASE WHEN m_b IS NOT NULL THEN shiftleft(CAST(1 AS BIGINT), {rest + 1} - CAST(m_b AS INT)) END")).alias("s_b"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rest + 1} - CAST(m_u AS INT))")).alias("s_u"),
    )
    exact = parts.agg(
        F.count_distinct(F.when(F.col("in_a"), F.col("o_custkey"))).alias("x_a"),
        F.count_distinct(F.when(F.col("in_b"), F.col("o_custkey"))).alias("x_b"),
    )
    exact_i = (
        parts.groupBy("o_custkey")
        .agg(F.max("in_a").alias("a"), F.max("in_b").alias("b"))
        .filter(F.col("a") & F.col("b"))
        .agg(F.count("*").alias("x_i"))
    )

    def est(k, s):
        alpha = (
            (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0)))
            * F.lit(65536.0)
            * F.lit(9007199254740992.0)
        )
        denom = F.col(s) + (F.lit(_HLL_M) - F.col(k)) * F.shiftleft(
            F.lit(1).cast("long"), rest + 1
        )
        return alpha / denom.cast("double")

    from .aggregates import attach_scalar

    out = attach_scalar(attach_scalar(folded, exact), exact_i)
    return out.select(
        F.col("x_a").cast("long").alias("exact_a"),
        F.col("x_b").cast("long").alias("exact_b"),
        F.col("x_i").cast("long").alias("exact_intersection"),
        est("k_a", "s_a").alias("est_a"),
        est("k_b", "s_b").alias("est_b"),
        est("k_u", "s_u").alias("est_union"),
        (est("k_a", "s_a") + est("k_b", "s_b") - est("k_u", "s_u")).alias(
            "est_intersection"
        ),
    )


# ---- q_kmv_distinct ----------------------------------------------------
_KMV_K = 256
# estimate from the REALIZED k, not the configured one: on a corpus
# with fewer than _KMV_K distinct shingles the bottom-k is the whole
# set and (k−1)·2^60/h_(k) must use the emitted k.  (k−1)·2^60 stays
# an exactly-representable double for any k ≤ 256 (8-bit mantissa), so
# the estimate is still ONE correctly-rounded IEEE division.
_KMV_EST = "CAST(k - 1 AS DOUBLE) * 1152921504606846976 / kth_hash"


@register(
    "q_kmv_distinct",
    f"""
    WITH sh AS (
        SELECT DISTINCT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 1) + 1),
                       i -> array_to_string(list_slice(t, i, i + 2), ' ')
                   )) AS sh
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents)
        )
        WHERE sh <> ''
    ),
    mink AS (
        SELECT MAX(h) AS kth_hash, COUNT(*) AS k
        FROM (SELECT h FROM sh ORDER BY h LIMIT {_KMV_K})
    ),
    exact AS (SELECT COUNT(*) AS exact_distinct FROM sh)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           {_KMV_EST} AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           ({_KMV_EST} - exact_distinct) / exact_distinct AS rel_err
    FROM mink CROSS JOIN exact
    """,
    doc="KMV (k-minimum-values / bottom-k) DISTINCT ESTIMATOR with an "
        "EXACT value oracle — unlike HLL (register layout is "
        "implementation-defined, rows-only), the KMV estimate is a "
        "pure function of the k-th smallest hash: est = (k−1)·2^60 / "
        "h_(k) over 60-bit md5 shingle ids. (k−1)·2^60 is an exactly-"
        "representable double (8-bit mantissa), so the estimate is ONE "
        "correctly-rounded IEEE division both engines reproduce "
        "bitwise; exact distinct count and realized rel_err ride "
        "alongside (the sketch-certificate discipline). 100 TB: "
        "bottom-k is a TakeOrdered (k per partition, merged on the "
        "driver — no global sort, no single-partition window); "
        "mergeability across shards = union + re-bottom-k, the same "
        "algebra as q_stream_minhash. 1-row attach via attach_scalar "
        "(documented BNLJ allowlist class).",
)
def q_kmv_distinct(spark, sf_dir):
    from ..operators import dedup as D
    from .aggregates import attach_scalar

    docs = load_table(spark, sf_dir, "documents")
    arrs = D.doc_shingle_arrays(docs, "doc_id", "text", k=3, hashed="md5")
    d = arrs.select(F.explode("sh_arr").alias("h")).distinct().persist()
    try:
        mink = (
            d.orderBy("h")
            .limit(_KMV_K)
            .agg(
                F.max("h").alias("kth_hash"),
                F.count("*").cast("long").alias("k"),
            )
        )
        exact = d.agg(F.count("*").cast("long").alias("exact_distinct"))
        est = (
            (F.col("k") - F.lit(1)).cast("double")
            * F.lit(float(2**60))
            / F.col("kth_hash")
        )
        return attach_scalar(mink, exact).select(
            "k",
            F.col("kth_hash").cast("long").alias("kth_hash"),
            est.alias("est_distinct"),
            "exact_distinct",
            (
                (est - F.col("exact_distinct")) / F.col("exact_distinct")
            ).alias("rel_err"),
        ).localCheckpoint()
    finally:
        d.unpersist()


# ---------------------------------------------------------------------------
# q_bloom_dedup_gate (round 10): the Bloom fast path for CROSS-SHARD
# incremental dedup, with its error realized as oracled output.
# ---------------------------------------------------------------------------
# At 100 TB the daily shard is NOT equi-joined against the full base
# corpus to find exact duplicates — the base ships as an m-bit Bloom
# filter and only flagged docs pay the verify join.  This query runs
# both paths on the doc_id-tail split (top 1/16, the
# q_incremental_substr_dedup cut) and certifies the gate: the Bloom
# guarantee (zero missed duplicates) as an output column that MUST be
# 0, the realized false-positive rate, and the load-factor bound
# rho^k it should track (rho = bits_set/m; per-probe FPR ≈ P(all k
# probe bits set) — the sizing certificate: at real scale m grows
# with n_base to hold rho, exactly like the hot-bucket caps hold
# bucket sizes).

_BDG_M = 131072  # 2^17 bits — holds rho ~0.1 at the test corpus sizes
_BDG_K = 3
_BDG_COEFFS = linear_hash_coeffs(_BDG_K, seed=20251016)


def _bdg_oracle_sql() -> str:
    def pos_exprs(fp: str) -> list[str]:
        return [
            f"((({a} * ({fp} % {_P}) + {b}) % {_P}) % {_BDG_M})"
            for a, b in _BDG_COEFFS
        ]

    member_pos = "\n            UNION ALL ".join(
        f"SELECT {p} AS pos FROM basef" for p in pos_exprs("fp")
    )
    probe_hits = " + ".join(
        f"CASE WHEN {p} IN (SELECT pos FROM bits) THEN 1 ELSE 0 END"
        for p in pos_exprs("fp")
    )
    return f"""
    WITH cutv AS (
        SELECT (max(doc_id) + 1) - (max(doc_id) + 1) // 16 AS cut
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
        FROM documents
    ),
    basef AS (SELECT DISTINCT fp FROM f, cutv WHERE doc_id < cut),
    deltaf AS (SELECT DISTINCT fp FROM f, cutv WHERE doc_id >= cut),
    bits AS MATERIALIZED (
        SELECT DISTINCT pos FROM (
            {member_pos}
        )
    ),
    probed AS (
        SELECT fp,
               ({probe_hits}) = {_BDG_K} AS claimed,
               fp IN (SELECT fp FROM basef) AS actual
        FROM deltaf
    ),
    ag AS (
        SELECT CAST((SELECT COUNT(*) FROM basef) AS BIGINT) AS n_base,
               CAST(COUNT(*) AS BIGINT) AS n_delta,
               CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
               CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_dup,
               CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               CAST(SUM(CASE WHEN claimed AND NOT actual THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN actual AND NOT claimed THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missed_dups
        FROM probed
    )
    SELECT n_base, n_delta,
           CAST({_BDG_M} AS BIGINT) AS m_bits,
           CAST({_BDG_K} AS BIGINT) AS k_hashes,
           bits_set,
           CAST(bits_set AS DOUBLE) / CAST({_BDG_M} AS DOUBLE)
               AS load_factor,
           n_true_dup, n_flagged, n_false_pos, n_missed_dups,
           CASE WHEN n_delta - n_true_dup > 0
                THEN CAST(n_false_pos AS DOUBLE)
                     / CAST(n_delta - n_true_dup AS DOUBLE)
           END AS realized_fpr,
           (CAST(bits_set AS DOUBLE) / CAST({_BDG_M} AS DOUBLE))
               * (CAST(bits_set AS DOUBLE) / CAST({_BDG_M} AS DOUBLE))
               * (CAST(bits_set AS DOUBLE) / CAST({_BDG_M} AS DOUBLE))
               AS fpr_bound
    FROM ag
    """


@register(
    "q_bloom_dedup_gate",
    _bdg_oracle_sql(),
    doc="BLOOM FAST PATH FOR CROSS-SHARD INCREMENTAL DEDUP: the base "
        "corpus's distinct text fingerprints become a 2^17-bit k=3 "
        "Bloom filter (seeded linear hashes on the md5_id family — "
        "every bit position an exact integer in both engines); the "
        "doc_id-tail shard (top 1/16) probes it, and the exact "
        "fingerprint join runs beside it as truth.  Certifies the "
        "gate a 100 TB daily-dedup pipeline relies on: n_missed_dups "
        "MUST be 0 (the Bloom no-false-negative guarantee as an "
        "oracled output), realized_fpr vs the load-factor bound "
        "rho^k (rho = bits_set/m; explicit three-way IEEE product), "
        "and the flagged volume that alone pays the verify join.  "
        "Sizing at scale: m grows with n_base to hold rho (the "
        "8 KB-vs-131 KB question is per-EXECUTOR broadcast cost, "
        "constant per corpus).  Build aggregates to <= m distinct "
        "set-bit rows; probes join k positions against the BROADCAST "
        "bit set — never a corpus-vs-corpus shuffle on the fast "
        "path.",
)
def q_bloom_dedup_gate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mx = int(docs.agg(F.max("doc_id")).first()[0])
    cut = (mx + 1) - (mx + 1) // 16
    f = docs.select("doc_id", md5_id(F.col("text")).alias("fp"))
    basef = f.filter(F.col("doc_id") < cut).select("fp").distinct()
    deltaf = (
        f.filter(F.col("doc_id") >= cut).select("fp").distinct()
        .localCheckpoint(eager=True)
    )

    def positions(col):
        return [
            ((F.lit(a) * (col % _P) + F.lit(b)) % _P % _BDG_M)
            for a, b in _BDG_COEFFS
        ]

    bits = (
        basef.select(
            F.explode(F.array(*positions(F.col("fp")))).alias("pos")
        ).distinct()
        .localCheckpoint(eager=True)
    )
    hits = (
        deltaf.select(
            "fp", F.explode(F.array(*positions(F.col("fp")))).alias("pos")
        )
        .join(F.broadcast(bits), "pos")
        .groupBy("fp")
        .agg(F.count("*").alias("n_hits"))
    )
    # NO broadcast hints here (ADVICE r10): `hits` is delta-shard-sized
    # and `basef` is base-corpus-sized — forcing broadcast on data-sized
    # frames is the executor-OOM class at 100 TB.  Only `bits` (bounded
    # by m = 2^17 rows) carries a hint; AQE picks the strategy for the
    # equi-joins below (and still broadcasts them at small SFs).
    probed = (
        deltaf.join(hits, "fp", "left")
        .join(basef.withColumn("__m", F.lit(True)), "fp", "left")
        .select(
            (F.coalesce("n_hits", F.lit(0)) == _BDG_K).alias("claimed"),
            F.coalesce("__m", F.lit(False)).alias("actual"),
        )
    )
    n_base = basef.count()
    bits_set = bits.count()
    rho = F.lit(float(bits_set)).cast("double") / F.lit(float(_BDG_M))
    ag = probed.agg(
        F.count("*").cast("long").alias("n_delta"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_dup"),
        F.sum(F.when(F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("claimed") & ~F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("actual") & ~F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_missed_dups"),
    )
    return ag.select(
        F.lit(n_base).cast("long").alias("n_base"),
        "n_delta",
        F.lit(_BDG_M).cast("long").alias("m_bits"),
        F.lit(_BDG_K).cast("long").alias("k_hashes"),
        F.lit(bits_set).cast("long").alias("bits_set"),
        rho.alias("load_factor"),
        "n_true_dup",
        "n_flagged",
        "n_false_pos",
        "n_missed_dups",
        F.when(
            F.col("n_delta") - F.col("n_true_dup") > 0,
            F.col("n_false_pos").cast("double")
            / (F.col("n_delta") - F.col("n_true_dup")).cast("double"),
        ).alias("realized_fpr"),
        (rho * rho * rho).alias("fpr_bound"),
    )


# ---------------------------------------------------------------------------
# q_bloom_sizing_curve (round 11): the m-sizing artifact behind
# q_bloom_dedup_gate's claim that "m grows with n_base to hold rho".
# ---------------------------------------------------------------------------
# ONE build pass computes the raw 31-bit hash h = (a·fp + b) mod P per
# (base fingerprint, hash index); every filter size m is then a modulo
# PROJECTION of that same frame (pos = h mod m), so the four bit sets
# ride a single distinct-aggregation shuffle — the established
# tuning-curve family shape (q_lsh_band_curve / q_ivf_probe_curve /
# q_excision_thresholds: sweep the knob without re-reading the data).

_BSC_MS = [1 << 14, 1 << 15, 1 << 16, 1 << 17]


def _bsc_oracle_sql() -> str:
    hashes = "\n            UNION ALL ".join(
        f"SELECT ((({a} * (fp % {_P}) + {b}) % {_P})) AS h FROM basef"
        for a, b in _BDG_COEFFS
    )
    arms = []
    parts = [f"""
    WITH cutv AS (
        SELECT (max(doc_id) + 1) - (max(doc_id) + 1) // 16 AS cut
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
        FROM documents
    ),
    basef AS MATERIALIZED (
        SELECT DISTINCT fp FROM f, cutv WHERE doc_id < cut
    ),
    deltaf AS MATERIALIZED (
        SELECT DISTINCT fp FROM f, cutv WHERE doc_id >= cut
    ),
    hb AS MATERIALIZED (
            {hashes}
    )"""]
    for m in _BSC_MS:
        probe_hits = " + ".join(
            f"CASE WHEN ((({a} * (fp % {_P}) + {b}) % {_P}) % {m})"
            f" IN (SELECT pos FROM bits{m}) THEN 1 ELSE 0 END"
            for a, b in _BDG_COEFFS
        )
        rho = f"(CAST((SELECT COUNT(*) FROM bits{m}) AS DOUBLE) / CAST({m} AS DOUBLE))"
        parts.append(f""",
    bits{m} AS MATERIALIZED (
        SELECT DISTINCT h % {m} AS pos FROM hb
    ),
    probed{m} AS MATERIALIZED (
        SELECT fp,
               ({probe_hits}) = {_BDG_K} AS claimed,
               fp IN (SELECT fp FROM basef) AS actual
        FROM deltaf
    ),
    ag{m} AS (
        SELECT CAST({m} AS BIGINT) AS m_bits,
               CAST({_BDG_K} AS BIGINT) AS k_hashes,
               CAST((SELECT COUNT(*) FROM basef) AS BIGINT) AS n_base,
               CAST(COUNT(*) AS BIGINT) AS n_delta,
               CAST((SELECT COUNT(*) FROM bits{m}) AS BIGINT) AS bits_set,
               {rho} AS load_factor,
               CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_dup,
               CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               CAST(SUM(CASE WHEN claimed AND NOT actual THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN actual AND NOT claimed THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_missed_dups,
               CASE WHEN COUNT(*) - SUM(CASE WHEN actual THEN 1 ELSE 0 END) > 0
                    THEN CAST(SUM(CASE WHEN claimed AND NOT actual
                                  THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(COUNT(*) - SUM(CASE WHEN actual THEN 1 ELSE 0 END)
                                AS DOUBLE)
               END AS realized_fpr,
               {rho} * {rho} * {rho} AS fpr_bound
        FROM probed{m}
    )""")
        arms.append(f"SELECT * FROM ag{m}")
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(arms) \
        + "\n    ORDER BY m_bits"


@register(
    "q_bloom_sizing_curve",
    _bsc_oracle_sql(),
    doc="BLOOM m-SIZING CURVE (round 11, VERDICT r10 item 7): realized "
        "FPR vs filter size at m = 2^14..2^17 bits from ONE build "
        "pass — the measured artifact behind q_bloom_dedup_gate's "
        "sizing claim (m grows with n_base to hold rho).  The raw "
        "31-bit hash h = (a*fp + b) mod P is computed ONCE per (base "
        "fingerprint, hash index); each m is a modulo projection of "
        "that same exploded frame, so all four bit sets resolve in a "
        "single distinct shuffle (the tuning-curve family shape: "
        "sweep the knob, never re-read the data).  Probes join the "
        "(m, pos) bit table — bounded by sum(m) = 245,760 rows by "
        "construction, hence broadcastable at ANY corpus size — and "
        "claimed = all k positions hit.  Output per m: load factor "
        "rho, realized FPR over true non-duplicates, the rho^k bound "
        "it must track (explicit three-way IEEE product, the "
        "q_bloom_dedup_gate discipline), and n_missed_dups which MUST "
        "be 0 at every m (no-false-negative invariant is "
        "m-independent).  Exact integer bit positions in both "
        "engines; the only doubles are the final divisions/products.",
)
def q_bloom_sizing_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mx = int(docs.agg(F.max("doc_id")).first()[0])
    cut = (mx + 1) - (mx + 1) // 16
    f = docs.select("doc_id", md5_id(F.col("text")).alias("fp"))
    basef = (
        f.filter(F.col("doc_id") < cut).select("fp").distinct()
        .localCheckpoint(eager=True)
    )
    deltaf = (
        f.filter(F.col("doc_id") >= cut).select("fp").distinct()
        .localCheckpoint(eager=True)
    )

    def hashes(col):
        return [
            ((F.lit(a) * (col % _P) + F.lit(b)) % _P)
            for a, b in _BDG_COEFFS
        ]

    # ONE build pass: raw hashes once, then 4 modulo projections into
    # a single distinct over (m, pos)
    hb = basef.select(F.explode(F.array(*hashes(F.col("fp")))).alias("h"))
    bits = (
        hb.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).cast("long").alias("m"),
                            (F.col("h") % m).alias("pos"),
                        )
                        for m in _BSC_MS
                    ]
                )
            ).alias("s")
        )
        .select("s.m", "s.pos")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bcounts = {
        int(r.m): int(r.c)
        for r in bits.groupBy("m").agg(F.count("*").alias("c")).collect()
    }
    hd = deltaf.select(
        "fp", F.explode(F.array(*hashes(F.col("fp")))).alias("h")
    )
    probe = hd.select(
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("long").alias("m"),
                        (F.col("h") % m).alias("pos"),
                    )
                    for m in _BSC_MS
                ]
            )
        ).alias("s"),
    ).select("fp", "s.m", "s.pos")
    # bits is bounded by sum(_BSC_MS) rows by construction — the
    # broadcast hint is size-certified, not data-sized (ADVICE r10
    # discipline: hints only on provably bounded frames)
    hits = (
        probe.join(F.broadcast(bits), ["m", "pos"])
        .groupBy("fp", "m")
        .agg(F.count("*").alias("n_hits"))
    )
    probed = (
        deltaf.select(
            "fp",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in _BSC_MS])
            ).alias("m"),
        )
        .join(hits, ["fp", "m"], "left")
        .join(basef.withColumn("__in_base", F.lit(True)), "fp", "left")
        .select(
            "m",
            (F.coalesce("n_hits", F.lit(0)) == _BDG_K).alias("claimed"),
            F.coalesce("__in_base", F.lit(False)).alias("actual"),
        )
    )
    n_base = basef.count()
    ag = probed.groupBy("m").agg(
        F.count("*").cast("long").alias("n_delta"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_dup"),
        F.sum(F.when(F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("claimed") & ~F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("actual") & ~F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("n_missed_dups"),
    )
    from ..operators.local_frames import literal_frame

    conf = literal_frame(
        spark,
        [(m, bcounts.get(m, 0)) for m in _BSC_MS],
        "m long, bits_set long",
    )
    rho = F.col("bits_set").cast("double") / F.col("m").cast("double")
    return (
        ag.join(F.broadcast(conf), "m")
        .select(
            F.col("m").alias("m_bits"),
            F.lit(_BDG_K).cast("long").alias("k_hashes"),
            F.lit(n_base).cast("long").alias("n_base"),
            "n_delta",
            "bits_set",
            rho.alias("load_factor"),
            "n_true_dup",
            "n_flagged",
            "n_false_pos",
            "n_missed_dups",
            F.when(
                F.col("n_delta") - F.col("n_true_dup") > 0,
                F.col("n_false_pos").cast("double")
                / (F.col("n_delta") - F.col("n_true_dup")).cast("double"),
            ).alias("realized_fpr"),
            (rho * rho * rho).alias("fpr_bound"),
        )
        .orderBy("m_bits")
    )
