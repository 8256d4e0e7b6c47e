"""Governance-surface queries: the DQ framework's single-pass check
evaluation and partition-pruned reads, both oracle-verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..quality import DataQualityFramework
from ..sources.readers import load_table
from ..sources.table import VersionedTable
from .merge import scratch_dir
from . import register


@register(
    "q_dq_checks",
    """
    SELECT * FROM (
        SELECT 'range_l_quantity' AS check_name,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violation_count,
               COUNT(*) AS total_rows
        FROM lineitem
        UNION ALL
        SELECT 'range_l_discount',
               CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem
        UNION ALL
        SELECT 'null_l_shipdate',
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*)
        FROM lineitem
    )
    """,
    doc="The DQ framework's fused single-pass check evaluation "
        "(quality.py; reference utils/data_quality.py:86-267) surfaced "
        "as a query: 3 checks, ONE scan, results as rows.",
)
def q_dq_checks(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    fw = DataQualityFramework()
    fw.add_range_check("l_quantity", 1, 50)
    fw.add_range_check("l_discount", 0.0, 0.1)
    fw.add_null_check("l_shipdate")
    results = fw.run_all_checks(li)
    total = li.count()
    rows = [(r.check_name, r.violation_count, total) for r in results]
    return spark.createDataFrame(
        rows, "check_name string, violation_count long, total_rows long"
    )


@register(
    "q_partition_pruning",
    """
    SELECT o_orderkey, o_totalprice,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year
    FROM orders
    WHERE YEAR(o_orderdate) IN (1996, 1997)
    """,
    doc="Partition-pruned scan through the storage layer: orders written "
        "partitioned by year, then filtered — only 2 of 7 partition dirs "
        "are read (PartitionFilters asserted in tests/test_plans.py).",
)
def q_partition_pruning(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    t = VersionedTable(spark, scratch_dir("partpr"))
    t.write(
        orders.select("o_orderkey", "o_totalprice", "order_year"),
        mode="overwrite",
        partition_by=["order_year"],
    )
    return t.read().filter(F.col("order_year").isin(1996, 1997))


@register(
    "q_outlier_iqr",
    """
    WITH fences AS (
        SELECT event_type,
               quantile_cont(value, 0.25)
                 - 1.5 * (quantile_cont(value, 0.75)
                          - quantile_cont(value, 0.25)) AS lo,
               quantile_cont(value, 0.75)
                 + 1.5 * (quantile_cont(value, 0.75)
                          - quantile_cont(value, 0.25)) AS hi
        FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type, value
    FROM events e JOIN fences f ON e.event_type = f.event_type
    WHERE value >= lo AND value <= hi
    """,
    doc="Per-group IQR outlier filter (Tukey fences, 1.5×IQR on the "
        "event value, per event type so each type's own distribution "
        "sets its fences) — the robust data-quality gate the "
        "reference's fixed min/max range checks "
        "(utils/data_quality.py:194-223) cannot express; ~5% of events "
        "in the testdata fall outside their fences. Exact: Spark "
        "percentile() and DuckDB quantile_cont share the linear-"
        "interpolation definition and the fence arithmetic is mirrored "
        "token-for-token. One grouped exact-percentile aggregate "
        "(|types| rows) broadcast back onto the stream — the corpus "
        "crosses one exchange; at extreme group cardinality swap in "
        "the approx_percentile sketch.",
)
def q_outlier_iqr(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    q1 = F.percentile("value", F.lit(0.25))
    q3 = F.percentile("value", F.lit(0.75))
    fences = (
        events.groupBy("event_type")
        .agg(q1.alias("q1"), q3.alias("q3"))
        .select(
            "event_type",
            (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    return (
        events.join(F.broadcast(fences), "event_type")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .select("event_id", "event_type", "value")
    )


@register(
    "q_robust_zscore",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           (d.value - d.med) / (1.4826 * m.mad) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs((d.value - d.med) / (1.4826 * m.mad)) > 3
    """,
    doc="Per-group ROBUST Z-SCORE outliers (median/MAD, the "
        "breakdown-point-0.5 complement of q_outlier_iqr's Tukey "
        "fences): |value - median| / (1.4826 * MAD) > 3, per event "
        "type. Two grouped exact-percentile aggregates (median, then "
        "median absolute deviation), each a |types|-row frame "
        "broadcast back onto the stream - the corpus crosses two "
        "exchanges total and no window touches the raw rows. Exact: "
        "Spark percentile() and DuckDB quantile_cont share the "
        "linear-interpolation definition, and the z arithmetic is "
        "mirrored token-for-token (single IEEE ops), so the oracle is "
        "bitwise. ~5.6% of events exceed |z|=3 in the testdata - the "
        "value column is heavy-tailed, exactly where MAD beats "
        "stddev-based z-scores (which the outliers themselves "
        "inflate).",
)
def q_robust_zscore(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_id", "event_type", "value", z.alias("robust_z")
        )
    )


@register(
    "q_drift_chisq",
    """
    WITH before AS (
        SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
               COUNT(*) AS b_cnt
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1, 2
    ),
    after AS (
        SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
               COUNT(*) AS a_cnt
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1, 2
    ),
    btot AS (SELECT event_type, SUM(b_cnt) AS b_tot FROM before GROUP BY 1),
    atot AS (SELECT event_type, SUM(a_cnt) AS a_tot FROM after GROUP BY 1),
    terms AS (
        SELECT b.event_type,
               CAST(
                   ((a.a_cnt - (CAST(b.b_cnt AS DOUBLE) / bt.b_tot) * at.a_tot)
                    * (a.a_cnt - (CAST(b.b_cnt AS DOUBLE) / bt.b_tot) * at.a_tot))
                   / ((CAST(b.b_cnt AS DOUBLE) / bt.b_tot) * at.a_tot)
               AS DECIMAL(28,12)) AS term
        FROM before b
        JOIN after a ON b.event_type = a.event_type AND b.bucket = a.bucket
        JOIN btot bt ON bt.event_type = b.event_type
        JOIN atot at ON at.event_type = b.event_type
    )
    SELECT event_type,
           COUNT(*) AS n_buckets,
           CAST(SUM(term) AS DOUBLE) AS chi_sq
    FROM terms GROUP BY event_type
    """,
    doc="Distribution-drift monitor: chi-square statistic between the "
        "first two weeks' value histogram (expected) and the rest of "
        "the month (observed), per event type — the snapshot-over-"
        "snapshot drift gate a production DQ framework runs after "
        "every ingest. Chi-square instead of PSI/KL deliberately: "
        "log-free, so every per-bucket term is plain IEEE arithmetic "
        "mirrored token-for-token, decimal-rounded before the "
        "order-invariant sum. Buckets are compared where the baseline "
        "has mass (inner join — standard practice; new-bucket mass "
        "shows up in the count drop). Two grouped counts + tiny "
        "per-type total joins; the stream crosses two exchanges.",
)
def q_drift_chisq(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    bucket = F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    before = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("event_type", bucket)
        .agg(F.count("*").alias("b_cnt"))
    )
    after = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("event_type", bucket)
        .agg(F.count("*").alias("a_cnt"))
    )
    btot = before.groupBy("event_type").agg(F.sum("b_cnt").alias("b_tot"))
    atot = after.groupBy("event_type").agg(F.sum("a_cnt").alias("a_tot"))
    expected = (F.col("b_cnt").cast("double") / F.col("b_tot")) * F.col("a_tot")
    diff = F.col("a_cnt") - expected
    joined = (
        before.join(after, ["event_type", "bucket"])
        .join(F.broadcast(btot), "event_type")
        .join(F.broadcast(atot), "event_type")
        .select(
            "event_type",
            ((diff * diff) / expected).cast("decimal(28,12)").alias("term"),
        )
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("term").cast("double").alias("chi_sq"),
    )


@register(
    "q_k_anonymity",
    """
    WITH c AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS b0,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS b1,
               CAST(FLOOR(c_acctbal / 4000.0) AS BIGINT) AS b2
        FROM customer
    ),
    sized AS (
        SELECT c_custkey, c_nationkey, c_mktsegment, b0, b1, b2,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, b0) AS n0,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, b1) AS n1,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, b2) AS n2,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n3
        FROM c
    ),
    leveled AS (
        SELECT CASE WHEN n0 >= 5 THEN 0 WHEN n1 >= 5 THEN 1
                    WHEN n2 >= 5 THEN 2 ELSE 3 END AS level,
               CASE WHEN n0 >= 5 THEN n0 WHEN n1 >= 5 THEN n1
                    WHEN n2 >= 5 THEN n2 ELSE n3 END AS class_size,
               c_nationkey || '|' || c_mktsegment || '|' ||
               CASE WHEN n0 >= 5 THEN CAST(b0 AS VARCHAR)
                    WHEN n1 >= 5 THEN CAST(b1 AS VARCHAR)
                    WHEN n2 >= 5 THEN CAST(b2 AS VARCHAR)
                    ELSE '*' END AS class_key
        FROM sized
    )
    SELECT CAST(level AS INT) AS level,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT class_key) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size
    FROM leveled GROUP BY level
    """,
    doc="K-ANONYMITY audit with a GENERALIZATION LADDER (k=5): quasi-"
        "identifiers (nation, market segment, account-balance band) "
        "are generalized per record up the band hierarchy "
        "1000→2000→4000→suppressed until the record's equivalence "
        "class reaches k — the core step of Samarati/Sweeney-style "
        "anonymization, reported as per-level class/record counts "
        "plus the min class size actually achieved. One scan + four "
        "partitioned window counts (the partitions ARE the class "
        "keys — high cardinality, no SinglePartition); the level pick "
        "is a pure projection. Exact integer output, bitwise oracle. "
        "The governance complement of q_pii_scrub: that removes "
        "direct identifiers, this measures re-identification risk of "
        "the quasi-identifiers that remain.",
)
def q_k_anonymity(spark, sf_dir):
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("b0"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("b1"),
        F.floor(F.col("c_acctbal") / 4000.0).cast("long").alias("b2"),
    )
    def wcount(*cols):
        return F.count("*").over(Window.partitionBy(*cols))

    sized = c.select(
        "*",
        wcount("c_nationkey", "c_mktsegment", "b0").alias("n0"),
        wcount("c_nationkey", "c_mktsegment", "b1").alias("n1"),
        wcount("c_nationkey", "c_mktsegment", "b2").alias("n2"),
        wcount("c_nationkey", "c_mktsegment").alias("n3"),
    )
    lvl = (
        F.when(F.col("n0") >= 5, 0)
        .when(F.col("n1") >= 5, 1)
        .when(F.col("n2") >= 5, 2)
        .otherwise(3)
    )
    size = (
        F.when(F.col("n0") >= 5, F.col("n0"))
        .when(F.col("n1") >= 5, F.col("n1"))
        .when(F.col("n2") >= 5, F.col("n2"))
        .otherwise(F.col("n3"))
    )
    band = (
        F.when(F.col("n0") >= 5, F.col("b0").cast("string"))
        .when(F.col("n1") >= 5, F.col("b1").cast("string"))
        .when(F.col("n2") >= 5, F.col("b2").cast("string"))
        .otherwise(F.lit("*"))
    )
    key = F.concat_ws(
        "|", F.col("c_nationkey"), F.col("c_mktsegment"), band
    )
    return (
        sized.select(
            lvl.cast("int").alias("level"),
            size.alias("class_size"),
            key.alias("class_key"),
        )
        .groupBy("level")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("class_key").alias("n_classes"),
            F.min("class_size").cast("long").alias("min_class_size"),
        )
    )


@register(
    "q_column_mask",
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS name_masked,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS name_digits_starred,
           concat(substr(c_name, 1, 9),
                  regexp_replace(substr(c_name, 10), '[0-9]', 'n', 'g'))
               AS name_partial,
           c_mktsegment
    FROM customer
    """,
    doc="PII COLUMN MASKING (dynamic-view governance): Spark's mask() "
        "builtin — uppercase->X, lowercase->x, digit->n, with "
        "per-class override (digits->*) and a PARTIAL mask that keeps "
        "a 9-char prefix in the clear (the account-suffix pattern). "
        "This is the projection a row/column-security view layer "
        "applies at read time; pure JVM expressions, zero shuffle, "
        "fully pushed into the scan stage. The oracle re-derives "
        "mask() semantics with regexp_replace chains.",
)
def q_column_mask(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("name_masked"),
        F.expr("mask(c_name, NULL, NULL, '*', NULL)").alias("name_digits_starred"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.expr("mask(substr(c_name, 10), NULL, NULL, 'n', NULL)"),
        ).alias("name_partial"),
        "c_mktsegment",
    )


@register(
    "q_write_audit_publish",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(22,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1)
    GROUP BY o_orderstatus
    """,
    doc="WRITE-AUDIT-PUBLISH (the Iceberg/Netflix WAP pattern on "
        "VersionedTable): each incoming batch lands in an isolated "
        "STAGING table first, a DQ audit runs against the staged "
        "snapshot (single-pass violation count — the reference's "
        "fail-on-error gate, quality.py G3, applied at the storage "
        "boundary), and only audit-clean batches are atomically "
        "published (appended) to prod — dirty batches leave prod "
        "bit-identical. Exercised with both arms live: a poisoned "
        "batch (negative prices injected) must be REJECTED and a clean "
        "batch PUBLISHED; the query RAISES unless exactly one publish "
        "committed (prod at version 1) and the audit caught the "
        "poisoned rows. At 100 TB the audit is one scan of the staged "
        "batch, never of prod. The oracle states the end state: base "
        "plus the clean batch only.",
)
def q_write_audit_publish(spark, sf_dir):
    from .aggregates import dsum
    from .merge import scratch_dir
    from ..sources.table import VersionedTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    prod = VersionedTable(spark, scratch_dir("wap_prod"))
    prod.write(orders.filter(F.col("o_orderkey") % 4 == 0), mode="overwrite")
    clean = orders.filter(F.col("o_orderkey") % 4 == 1)
    dirty = orders.filter(F.col("o_orderkey") % 4 == 2).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 40 == 2, -F.col("o_totalprice")).otherwise(
            F.col("o_totalprice")
        ),
    )
    rule = (F.col("o_totalprice") > 0) & F.col("o_orderkey").isNotNull()
    published = rejected = 0
    for batch in (dirty, clean):
        staging = VersionedTable(spark, scratch_dir("wap_stage"))
        staging.write(batch, mode="overwrite")  # WRITE: stage in isolation
        staged = staging.read()
        violations = staged.filter(~rule).count()  # AUDIT: one scan of the batch
        if violations == 0:
            prod.write(staged, mode="append")  # PUBLISH: atomic version commit
            published += 1
        else:
            rejected += 1
    if (published, rejected) != (1, 1) or prod.latest_version() != 1:
        raise AssertionError(
            f"WAP arms wrong: published={published} rejected={rejected} "
            f"prod_version={prod.latest_version()}"
        )
    return (
        prod.read()
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "q_gdpr_erasure",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE user_id % 10 <> 3
    GROUP BY user_id
    """,
    doc="GDPR RIGHT-TO-BE-FORGOTTEN, physically certified: DELETE of "
        "the target users is only step one — a versioned lakehouse "
        "keeps their rows readable through time travel, which is "
        "exactly what an erasure request forbids. The flow: "
        "copy-on-write DELETE (new snapshot without the users) -> "
        "VACUUM retain_last=1 (physically removes every commit dir the "
        "pre-delete snapshots referenced). The query RAISES unless "
        "(a) vacuum actually removed files, and (b) TIME TRAVEL to the "
        "pre-delete version now FAILS with a missing-data error — the "
        "proof the history copy is gone, not just hidden (the "
        "manifests may remain; the DATA must not). At 100 TB the "
        "delete rewrites only the units holding target rows and vacuum "
        "is a driver-side unlink pass. Oracle: everything but the "
        "erased users.",
)
def q_gdpr_erasure(spark, sf_dir):
    from .merge import scratch_dir
    from ..sources.table import VersionedTable

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    t = VersionedTable(spark, scratch_dir("gdpr"))
    t.write(ev, mode="overwrite")
    pre = t.latest_version()
    t.delete("user_id % 10 = 3", mode="copy-on-write")
    removed = t.vacuum(retain_last=1)
    if not removed:
        raise AssertionError("vacuum removed nothing — history not purged")
    try:
        n = t.read(version=pre).count()
        raise AssertionError(
            f"pre-delete snapshot still readable after erasure ({n} rows)"
        )
    except AssertionError:
        raise
    except Exception:
        pass  # expected: the purged snapshot's data files are gone
    return (
        t.read()
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(22,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "q_table_checksum",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               CAST(o_totalprice AS VARCHAR) || '|' ||
               o_orderstatus), 1, 15))::BIGINT) AS VARCHAR) AS content_checksum
    FROM orders
    """,
    doc="ORDER-INVARIANT TABLE CHECKSUM (anti-entropy / replication "
        "audit): each row canonicalizes to a delimited string (doubles "
        "render via shortest-repr, identical across engines), hashes "
        "through the engine-reproducible md5-derived 60-bit id, and "
        "the EXACT sum of row hashes (decimal — no int64 wraparound at "
        "row counts x 2^60) is the table fingerprint: independent of "
        "partitioning, row order, and file layout, cheap to compute on "
        "both sides of a replication link, and any single-row "
        "difference changes it with probability 1-2^-60. Certified "
        "in-query against a CSV round-trip replica: the checksum of "
        "the re-read copy must equal the source's (catches lossy "
        "rendering, dropped rows, or type drift in transit). The "
        "oracle recomputes the fingerprint definition directly.",
)
def q_table_checksum(spark, sf_dir):
    from .merge import scratch_dir
    from ..operators.dedup import md5_id
    from ..sources.readers import read_csv

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)

    def checksum(df):
        row = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in cols]
        )
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum(md5_id(row).cast("decimal(38,0)"))
            .cast("string")
            .alias("content_checksum"),
        )

    src = checksum(orders).collect()[0]
    path = scratch_dir("cksum_csv")
    orders.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)
    replica = read_csv(spark, path).select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        F.col("o_totalprice").cast("double"),
        "o_orderstatus",
    )
    rep = checksum(replica).collect()[0]
    if (src.n_rows, src.content_checksum) != (rep.n_rows, rep.content_checksum):
        raise AssertionError(
            f"replica fingerprint diverged: {tuple(src)} vs {tuple(rep)}"
        )
    return spark.createDataFrame(
        [(src.n_rows, src.content_checksum)], "n_rows long, content_checksum string"
    )


@register(
    "q_observe_metrics",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) FILTER (WHERE l_quantity IS NULL) AS null_qty
    FROM lineitem
    """,
    doc="observe() METRICS (Spark's zero-cost in-flight instrumentation): "
        "DQ counters ride along INSIDE an existing action's plan as an "
        "Observation — no second scan, no separate DQ job; this is how "
        "quality.py's single-pass framework meters 100 TB pipelines "
        "without doubling their IO. The query attaches row-count, "
        "exact-decimal quantity sum, and a null counter to a scan, "
        "drives it with the SAME action a real job would run, and "
        "returns the harvested metrics; the oracle recomputes them as "
        "plain aggregates — observation and aggregation must agree "
        "bitwise.",
)
def q_observe_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(22,2)")).cast("double").alias("sum_qty"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["null_qty"])],
        "n_rows long, sum_qty double, null_qty long",
    )


@register(
    "q_fd_violations",
    """
    WITH cands AS (
        SELECT 'source->lang' AS fd, source AS lhs, lang AS rhs FROM documents
        UNION ALL
        SELECT 'lang->source' AS fd, lang AS lhs, source AS rhs FROM documents
    )
    SELECT fd, lhs,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT rhs) AS BIGINT) AS n_distinct_rhs,
           MIN(rhs) AS example_rhs
    FROM cands
    GROUP BY fd, lhs
    HAVING COUNT(DISTINCT rhs) > 1
    """,
    doc="FUNCTIONAL-DEPENDENCY violation audit (schema/data-contract "
        "governance): for each candidate dependency lhs -> rhs, list "
        "the lhs groups that map to more than one rhs value, with row "
        "and distinct-rhs counts — the profiling primitive behind key "
        "discovery, contract enforcement, and denormalization checks. "
        "Both candidate FDs are stacked into one tall frame (fd tag, "
        "lhs, rhs) so the whole audit is ONE hash aggregate per "
        "grouping-set pass regardless of how many dependencies are "
        "audited; count(distinct) goes through Spark's two-phase "
        "partial-distinct expansion, never a per-group collect. At "
        "100 TB: shuffle keyed on (fd, lhs) — candidate-FD count "
        "multiplies map output, not reduce skew. Reference analogue: "
        "the DQ rule registry (`/root/reference/quality/checks.py`) "
        "covers null/range/uniqueness rules; dependency rules are the "
        "natural extension for a curation catalog.",
)
def q_fd_violations(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    cands = d.select(
        F.lit("source->lang").alias("fd"),
        F.col("source").alias("lhs"),
        F.col("lang").alias("rhs"),
    ).unionAll(
        d.select(
            F.lit("lang->source").alias("fd"),
            F.col("lang").alias("lhs"),
            F.col("source").alias("rhs"),
        )
    )
    return (
        cands.groupBy("fd", "lhs")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("rhs").alias("n_distinct_rhs"),
            F.min("rhs").alias("example_rhs"),
        )
        .filter(F.col("n_distinct_rhs") > 1)
    )


@register(
    "q_l_diversity",
    """
    WITH c AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               o_orderpriority AS sensitive
        FROM customer JOIN orders ON c_custkey = o_custkey
    ),
    classes AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT sensitive) AS l
        FROM c GROUP BY 1, 2, 3
    )
    SELECT CAST(l AS BIGINT) AS distinct_sensitive,
           COUNT(*) AS n_classes,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below_l3
    FROM classes GROUP BY l
    """,
    doc="L-DIVERSITY audit — the privacy property k-anonymity misses: "
        "an equivalence class where every member shares the SAME "
        "sensitive value leaks it even at k=anything ('homogeneity "
        "attack'). Quasi-identifier classes (nation, segment, "
        "2000-wide balance band) are scored by the number of DISTINCT "
        "sensitive values (order priority standing in for the "
        "sensitive attribute), histogrammed with the count failing "
        "l=3. Complements q_k_anonymity's generalization ladder: "
        "together they are the release-gate pair of privacy "
        "governance. One join + two grouped aggregates — scale-free.",
)
def q_l_diversity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    classes = c.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("sensitive").alias("l"),
    )
    return classes.groupBy(F.col("l").cast("long").alias("distinct_sensitive")).agg(
        F.count("*").alias("n_classes"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum((F.col("l") < 3).cast("int")).cast("long").alias("n_below_l3"),
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle_sql() -> str:
    aggs = ", ".join(
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_{i}, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv_{i}"
        for i, c in enumerate(_PROFILE_COLS)
    )
    arms = "\n    UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n, nulls_{i} AS n_nulls, ndv_{i} AS n_distinct, "
        f"CAST(ndv_{i} AS DOUBLE) / CAST(n AS DOUBLE) AS distinct_ratio FROM agg"
        for i, c in enumerate(_PROFILE_COLS)
    )
    return f"""
    WITH agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, {aggs} FROM orders
    )
    {arms}
    """


@register(
    "q_table_profile",
    _profile_oracle_sql(),
    doc="ONE-PASS DATA PROFILE of the orders table: per-column null "
        "count, exact distinct count, and distinct ratio — the "
        "pandas-profiling / ANALYZE-style summary a data platform "
        "computes on every new table, here as a SINGLE aggregate over "
        "one scan (Spark plans the six COUNT(DISTINCT)s through one "
        "Expand + two-phase aggregate — a 6x row fan-out map-side, "
        "NOT six scans; at 100 TB this is the profiling shape that "
        "works, vs the naive one-query-per-column loop that re-reads "
        "the table N times). The 6-row output fans out from the "
        "1-row moment frame with no second pass. Extends the "
        "reference's null-profile DQ check (utils/data_quality.py) "
        "to full cardinality profiling. Exact integers + one IEEE "
        "division — bitwise.",
)
def q_table_profile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").cast("long").alias("n")]
    for i, c in enumerate(_PROFILE_COLS):
        aggs.append(F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"nulls_{i}"))
        aggs.append(F.count_distinct(c).cast("long").alias(f"ndv_{i}"))
    agg = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{i}, ndv_{i}" for i, c in enumerate(_PROFILE_COLS)
    )
    return agg.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "n",
    ).select(
        "column_name",
        "n",
        "n_nulls",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n").cast("double")).alias(
            "distinct_ratio"
        ),
    )


@register(
    "q_dp_noise_calibration",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS true_n
        FROM orders GROUP BY 1
    ),
    seeded AS (
        SELECT d, true_n,
               ('0x' || substr(md5('dp:' || CAST(d AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
        FROM daily
    ),
    halves AS (
        SELECT d, true_n,
               h % 1073741824 AS h1,
               (h // 1073741824) % 1073741824 AS h2
        FROM seeded
    )
    SELECT d, CAST(true_n AS BIGINT) AS true_n,
           CAST((bit_count(xor(h1, h1 + 1)) - 1)
                - (bit_count(xor(h2, h2 + 1)) - 1) AS BIGINT) AS noise,
           CAST(true_n + (bit_count(xor(h1, h1 + 1)) - 1)
                - (bit_count(xor(h2, h2 + 1)) - 1) AS BIGINT) AS noised_n
    FROM halves
    """,
    doc="DIFFERENTIAL-PRIVACY NOISE CALIBRATION (two-sided geometric / "
        "discrete Laplace, the Ghosh–Roughgarden–Sundararajan "
        "universally-optimal count mechanism at ε = ln 2): per-day "
        "order counts released as true_n + (G₁ − G₂) where each "
        "Gᵢ ~ Geometric(½) is the trailing-ones count of an "
        "independent 30-bit half of the md5 seed (P(G=k)=2⁻⁽ᵏ⁺¹⁾ "
        "exactly — trailing-ones = bit_count(h XOR (h+1)) − 1, pure "
        "integer ops on both engines). A PRODUCTION release must draw "
        "the seed from a CSPRNG; pinning it to the partition key is "
        "what makes the MECHANISM itself auditable (this query is the "
        "calibration harness — noise distribution, sensitivity-1 "
        "additivity, integer support — not the release path, and it "
        "deliberately emits the noise beside the count so tests can "
        "gate the calibration). Shape: one map-side daily collapse, "
        "then pure projections — shuffle count 1, embarrassingly "
        "parallel. Exact integers end to end.",
)
def q_dp_noise_calibration(spark, sf_dir):
    from ..operators.dedup import md5_id

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("true_n")
    )
    half = 1 << 30
    seeded = daily.select(
        "d",
        F.col("true_n").cast("long").alias("true_n"),
        md5_id(F.concat(F.lit("dp:"), F.col("d").cast("string"))).alias("h"),
    ).select(
        "d",
        "true_n",
        (F.col("h") % half).alias("h1"),
        # integer div is load-bearing: double `/` rounds 60-bit hashes
        (F.expr(f"h div {half}") % half).alias("h2"),
    )
    g1 = F.bit_count(F.expr("h1 ^ (h1 + 1)")) - 1
    g2 = F.bit_count(F.expr("h2 ^ (h2 + 1)")) - 1
    return seeded.select(
        "d",
        "true_n",
        (g1 - g2).cast("long").alias("noise"),
        (F.col("true_n") + g1 - g2).cast("long").alias("noised_n"),
    )


# ---- q_t_closeness --------------------------------------------------------


@register(
    "q_t_closeness",
    """
    WITH c AS MATERIALIZED (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               o_orderpriority AS sensitive
        FROM customer JOIN orders ON c_custkey = o_custkey
    ),
    cats AS MATERIALIZED (SELECT DISTINCT sensitive AS v FROM c),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cats) AS m
            FROM c),
    gcum AS MATERIALIZED (
        SELECT v, CAST((SELECT COUNT(*) FROM c WHERE c.sensitive <= cats.v)
                       AS BIGINT) AS cq
        FROM cats
    ),
    ccum AS MATERIALIZED (
        SELECT c.c_nationkey, c.c_mktsegment, c.bal_band, g.v, g.cq,
               CAST(COUNT(*) FILTER (WHERE c.sensitive <= g.v) AS BIGINT)
                   AS cp,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM c CROSS JOIN gcum g
        GROUP BY 1, 2, 3, 4, 5
    ),
    emd AS (
        SELECT c_nationkey, c_mktsegment, bal_band,
               MAX(n_rows) AS n_rows,
               CAST(SUM(CASE WHEN v < (SELECT MAX(v) FROM cats)
                             THEN ABS(cp * nn - cq * n_rows) ELSE 0 END)
                    AS BIGINT) AS emd_num,
               MAX((m - 1) * n_rows * nn) AS emd_den
        FROM ccum, tot
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(n_rows AS BIGINT) AS n_rows,
           emd_num, CAST(emd_den AS BIGINT) AS emd_den,
           CAST(emd_num AS DOUBLE) / CAST(emd_den AS DOUBLE) AS t_closeness
    FROM emd
    ORDER BY t_closeness DESC, c_nationkey, c_mktsegment, bal_band
    LIMIT 10
    """,
    doc="T-CLOSENESS audit — the release-gate property l-diversity "
        "misses: a class can be diverse yet still leak because its "
        "sensitive-value DISTRIBUTION deviates from the table's "
        "('skewness attack').  Same quasi-identifier classes as "
        "q_k_anonymity/q_l_diversity (nation, segment, 2000-wide "
        "balance band); sensitive = the ORDINAL order priority, so "
        "closeness is the ordered Earth-Mover's Distance: t = "
        "sum_i |CumP_i - CumQ_i| / (m-1) over the m category "
        "boundaries.  Kept EXACT as scaled integers (|cp*N - cq*n| "
        "with denominator (m-1)*n*N emitted beside it); the final "
        "ratio is the single IEEE division.  Top-10 worst classes.  "
        "Scale: the class x category cumulative counts come from one "
        "conditional aggregate (category list is model-sized and "
        "rides the plan as literals Spark-side); no data-sized "
        "window, no inequality join.",
)
def q_t_closeness(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c = cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    # category list + global cumulative counts: bounded model state
    # (|priorities| = 5), collected once and folded in as literals
    gl = {
        r.sensitive: int(r.cnt)
        for r in c.groupBy("sensitive").agg(F.count("*").alias("cnt")).collect()
    }
    cats = sorted(gl)
    m = len(cats)
    nn = sum(gl.values())
    gcum, acc = {}, 0
    for v in cats:
        acc += gl[v]
        gcum[v] = acc
    cls = c.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            F.sum(F.when(F.col("sensitive") <= v, 1).otherwise(0))
            .cast("long")
            .alias(f"cp_{i}")
            for i, v in enumerate(cats[:-1])
        ],
    )
    emd_num = None
    for i, v in enumerate(cats[:-1]):
        term = F.abs(
            F.col(f"cp_{i}") * F.lit(nn) - F.lit(gcum[v]) * F.col("n_rows")
        )
        emd_num = term if emd_num is None else emd_num + term
    return (
        cls.select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "n_rows",
            emd_num.cast("long").alias("emd_num"),
            (F.lit(m - 1) * F.col("n_rows") * F.lit(nn))
            .cast("long")
            .alias("emd_den"),
        )
        .withColumn(
            "t_closeness",
            F.col("emd_num").cast("double") / F.col("emd_den").cast("double"),
        )
        .orderBy(
            F.col("t_closeness").desc(),
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
        )
        .limit(10)
    )
