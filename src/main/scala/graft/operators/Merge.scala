package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Upsert (SCD-type-1 MERGE) expressed relationally: the engine's answer to
  * `MERGE INTO target USING updates ON key WHEN MATCHED UPDATE / WHEN NOT
  * MATCHED INSERT`. Table-format engines (Delta/Iceberg) push this into a
  * transactional rewrite; the *dataflow* is exactly one full-outer join on
  * the key plus coalesce per column, which is what this operator pins down.
  *
  * Scale notes: one hash exchange per side on the merge key — the minimum
  * possible for an upsert. No row explosion: |result| = |target ∪ updates|.
  * When the update batch is small (the common CDC case) Spark's AQE
  * broadcast-converts the join and the target never shuffles at all.
  */
object Merge {

  /** q82 — deterministic CDC batch derived from `customer` itself:
    * every custkey ≡ 3 (mod 10) gets a +500.00 balance update, and every
    * custkey ≡ 0 (mod 97) spawns a brand-new customer (key + 10_000_000)
    * carrying its balance. Output: the merged table with per-row `action`
    * ('update' / 'insert' / 'keep') so the oracle checks the full merge
    * semantics, not just counts. Balances ride the exact long-cents path. */
  def upsertCustomers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"),
        Rfm.cents(col("c_acctbal")).as("bal_c"),
        col("c_mktsegment").as("mktsegment"))
    val updates = base.filter(col("custkey") % 10 === 3)
      .select(col("custkey"), (col("bal_c") + 50000L).as("new_bal_c"))
      .unionAll(base.filter(col("custkey") % 97 === 0)
        .select((col("custkey") + 10000000L).as("custkey"),
          col("bal_c").as("new_bal_c")))
    base.join(updates, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("new_bal_c"), col("bal_c")).as("bal_c"),
        coalesce(col("mktsegment"), lit("NEW")).as("mktsegment"),
        when(col("new_bal_c").isNotNull && col("bal_c").isNotNull, "update")
          .when(col("bal_c").isNull, "insert")
          .otherwise("keep").as("action"))
  }

  /** q91 — SCD Type-2 history build: `orders` treated as a CDC change feed
    * of (custkey, change-ts = o_orderdate, tracked value = totalprice cents)
    * folded into versioned dimension rows with
    * `[eff_from_ms, eff_to_ms)` validity and an `is_current` flag.
    *
    * Real SCD2 semantics, all of it: same-timestamp changes collapse to one
    * deterministic winner (max orderkey), consecutive *unchanged* values are
    * suppressed (no version churn), and the open version has NULL
    * `eff_to_ms` / `is_current = 1`.
    *
    * Scale notes: every window below partitions by `custkey` ONLY — the
    * same-timestamp dedup deliberately avoids a (custkey, ts_ms) window
    * partition (which would not satisfy the later custkey windows'
    * distribution and would force a second hash exchange): sorting the
    * custkey partition by (ts_ms, orderkey DESC) puts each timestamp
    * group's winner first, so `lag(ts_ms) <> ts_ms` keeps exactly the
    * max-orderkey row per timestamp. One exchange for the whole history
    * build regardless of input size (the later windows re-sort in place,
    * never re-shuffle). All arithmetic is integer (epoch-ms + long cents):
    * hash-exact vs the oracle. */
  /** Raw change feed (custkey, ts_ms, price_c, okey) from `orders`. */
  private def rawChanges(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_custkey").as("custkey"),
      Rfm.epochMs(col("o_orderdate")).as("ts_ms"),
      Rfm.cents(col("o_totalprice")).as("price_c"),
      col("o_orderkey").as("okey"))

  /** The SCD2 versioning core over a (custkey, ts_ms, price_c, okey)
    * change feed; `src_okey` (the winning change's id) is carried through
    * so an incremental merge can replay history rows against a new batch
    * with the original tie-break priority. */
  private def scd2Versions(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKeyTs = Window.partitionBy(col("custkey")).orderBy(col("ts_ms"))
    val dedup = changes
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(
        Window.partitionBy(col("custkey"))
          .orderBy(col("ts_ms"), col("okey").desc)))
      .filter(col("prev_ts").isNull || col("prev_ts") =!= col("ts_ms"))
      .select(col("custkey"), col("ts_ms"), col("price_c"), col("okey"))
    dedup
      .withColumn("prev_c", lag(col("price_c"), 1).over(byKeyTs))
      .filter(col("prev_c").isNull || col("prev_c") =!= col("price_c"))
      .select(
        col("custkey"),
        row_number().over(byKeyTs).cast(LongType).as("version"),
        col("ts_ms").as("eff_from_ms"),
        lead(col("ts_ms"), 1).over(byKeyTs).as("eff_to_ms"),
        col("price_c"),
        col("okey").as("src_okey"))
      .withColumn("is_current",
        when(col("eff_to_ms").isNull, 1L).otherwise(0L))
  }

  private val Scd2PublicCols = Seq("custkey", "version", "eff_from_ms",
    "eff_to_ms", "price_c", "is_current")

  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Versions(rawChanges(spark, dir))
      .select(Scd2PublicCols.map(col): _*)

  /** q101 — INCREMENTAL SCD2 maintenance: fold a new CDC batch into an
    * existing history without rebuilding untouched keys. The split is
    * deterministic (orders with `okey % 7 == 0` arrive as the new batch;
    * the rest are the standing history), and the oracle is the FULL
    * rebuild over all of `orders` (q91's SQL) — the incremental path is
    * proven equivalent to recomputation, which is the whole contract of
    * incremental view maintenance.
    *
    * Scale shape: keys untouched by the batch stream through one left_anti
    * join — no window, no re-versioning, no state; only the (usually tiny)
    * set of affected keys replays `scd2Versions` over (their existing
    * version rows, re-expressed as change points via `src_okey`) ∪ (the
    * new batch). Cost scales with the batch's key footprint, not the
    * history size — at a 100 TB dimension that is the difference between a
    * merge and a rebuild. Suppression idempotence makes the replay exact:
    * surviving version rows ARE change points, so re-running dedup +
    * change-suppression over them cannot alter them. */
  def scd2IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val all = rawChanges(spark, dir)
    val hist = scd2Versions(all.filter(col("okey") % 7 =!= 0))
    val batch = all.filter(col("okey") % 7 === 0)
    val affected = batch.select(col("custkey")).distinct()
    val untouched = hist.join(affected, Seq("custkey"), "left_anti")
    val replayed = scd2Versions(
      hist.join(affected, Seq("custkey"), "left_semi")
        .select(col("custkey"), col("eff_from_ms").as("ts_ms"),
          col("price_c"), col("src_okey").as("okey"))
        .unionAll(batch))
    untouched.select(Scd2PublicCols.map(col): _*)
      .unionAll(replayed.select(Scd2PublicCols.map(col): _*))
  }

  val scd2HistorySql: String =
    """WITH changes AS (
      |  SELECT o_custkey AS custkey,
      |         epoch_ms(o_orderdate) AS ts_ms,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
      |         lag(epoch_ms(o_orderdate)) OVER (
      |           PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey DESC) AS prev_ts
      |  FROM orders
      |), dedup AS (
      |  SELECT custkey, ts_ms, price_c FROM changes
      |  WHERE prev_ts IS NULL OR prev_ts <> ts_ms
      |), delta AS (
      |  SELECT custkey, ts_ms, price_c,
      |         lag(price_c) OVER (PARTITION BY custkey ORDER BY ts_ms) AS prev_c
      |  FROM dedup
      |), vers AS (
      |  SELECT custkey, ts_ms, price_c FROM delta
      |  WHERE prev_c IS NULL OR prev_c <> price_c
      |)
      |SELECT custkey,
      |       CAST(row_number() OVER (PARTITION BY custkey ORDER BY ts_ms)
      |            AS BIGINT) AS version,
      |       ts_ms AS eff_from_ms,
      |       lead(ts_ms) OVER (PARTITION BY custkey ORDER BY ts_ms) AS eff_to_ms,
      |       price_c,
      |       CAST(CASE WHEN lead(ts_ms) OVER (PARTITION BY custkey ORDER BY ts_ms)
      |                 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM vers""".stripMargin

  /** q171 — INCREMENTAL statistics maintenance: per-source corpus stats
    * (doc count, char sum, char min/max) maintained by MERGING a standing
    * base aggregate with a new batch's aggregate — aggregate-of-aggregates,
    * never rescanning base rows — proven equivalent to the full rebuild
    * (the oracle), which is the defining contract of algebraic view
    * maintenance. Works for any commutative-monoid stat (count/sum/min/
    * max; avg as sum÷count at read time); the deterministic `doc_id % 7`
    * split stands in for "yesterday's table + today's batch".
    *
    * At 100 TB this is the difference between touching the whole corpus
    * per refresh and touching one batch: the standing stats table is
    * |sources| rows, the merge is a |sources|-row full-outer join. */
  def incrementalStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    def stats(df: DataFrame) = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        min(col("n_chars")).as("chars_min"), max(col("n_chars")).as("chars_max"))
    val base = stats(docs.filter(col("doc_id") % 7 =!= 0))
      .toDF("source", "bn", "bs", "bmn", "bmx")
    val batch = stats(docs.filter(col("doc_id") % 7 === 0))
      .toDF("source", "dn", "ds", "dmn", "dmx")
    base.join(batch, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L)))
          .as("chars_sum"),
        least(coalesce(col("bmn"), col("dmn")),
          coalesce(col("dmn"), col("bmn"))).as("chars_min"),
        greatest(coalesce(col("bmx"), col("dmx")),
          coalesce(col("dmx"), col("bmx"))).as("chars_max"))
  }

  val incrementalStatsSql: String =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
      |       min(n_chars) AS chars_min, max(n_chars) AS chars_max
      |FROM documents GROUP BY source""".stripMargin

  /** q119 — point-in-time (PIT) enrichment against the SCD2 dimension: each
    * order picks up the customer price version IN EFFECT at its own
    * timestamp (`eff_from ≤ ts < eff_to`, open current version) — the
    * dimension-time-travel lookup every warehouse join-to-history needs,
    * and the consumer-side proof that [[scd2History]]'s intervals really
    * partition time: an inner join yields exactly one version per order.
    *
    * Plan: equi-join on custkey + interval post-filter. Version counts per
    * key are small by construction (change-suppressed), so the fan-out
    * before the filter is bounded by versions-per-key, not history rows;
    * at 100 TB the same key partitioning serves both sides, and a
    * skew-prone key set would route through the as-of operator
    * ([[graft.plans.AsOfJoin]] on eff_from) instead. */
  def pitEnrichOrders(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2History(spark, dir)
    val facts = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        Rfm.epochMs(col("o_orderdate")).as("ts_ms"))
    facts.join(dim, Seq("custkey"))
      .filter(col("ts_ms") >= col("eff_from_ms") &&
        (col("eff_to_ms").isNull || col("ts_ms") < col("eff_to_ms")))
      .select(col("o_orderkey"), col("custkey"), col("ts_ms"),
        col("version"), col("price_c"))
  }

  val pitEnrichOrdersSql: String = {
    val dim = scd2HistorySql.replace("\n", "\n  ")
    s"""WITH dim AS (
       |  $dim
       |), facts AS (
       |  SELECT o_orderkey, o_custkey AS custkey,
       |         epoch_ms(o_orderdate) AS ts_ms
       |  FROM orders
       |)
       |SELECT f.o_orderkey, f.custkey, f.ts_ms, d.version, d.price_c
       |FROM facts f JOIN dim d ON f.custkey = d.custkey
       |WHERE f.ts_ms >= d.eff_from_ms
       |  AND (d.eff_to_ms IS NULL OR f.ts_ms < d.eff_to_ms)""".stripMargin
  }

  /** Generic snapshot diff (CDC changelog derivation): compare two full
    * snapshots of a keyed table and emit one row per CHANGED key —
    * `insert` (key only in `next`), `delete` (key only in `prev`), or
    * `update` (present in both, any compared column differs). Unchanged
    * keys are dropped, so downstream incremental consumers process |delta|
    * rows, not |table|. This is the batch-side primitive that turns
    * periodic full dumps into a change feed (the inverse of [[scd2History]],
    * which folds a feed into versions).
    *
    * Null-safe: column comparison uses `<=>` so NULL→value and value→NULL
    * transitions count as updates, and two NULLs as unchanged.
    *
    * Scale notes: one hash exchange per side on the key — the minimum for
    * any diff — and the filter on change_type is applied before the
    * projection, so the shuffle output is the only materialized cost. No
    * row explosion (full-outer on a unique key). At 100 TB both snapshots
    * stream through the join; with bucketed snapshot storage on the key the
    * exchanges disappear entirely. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val p = prev.select(col(keyCol) +: compareCols.map(c =>
      col(c).as(s"old_$c")): _*)
    val n = next.select(col(keyCol) +: compareCols.map(c =>
      col(c).as(s"new_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    // presence flags, not value-nullness: a key whose every compared column
    // is NULL must still read as present on its side
    val pf = p.withColumn("__in_old", lit(1))
    val nf = n.withColumn("__in_new", lit(1))
    pf.join(nf, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }

  /** q103 — CDC changelog between two deterministic `customer` snapshots:
    * next = prev with balances bumped +500.00 on custkey ≡ 3 (mod 10),
    * keys ≡ 0 (mod 97) deleted, and fresh keys (+20M) for custkey ≡ 0
    * (mod 89). Output: only the changed keys with old/new balance cents and
    * the change type — exactly what an incremental downstream would apply. */
  def snapshotDiffCustomers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"),
        Rfm.cents(col("c_acctbal")).as("bal_c"))
    val next = base.filter(col("custkey") % 97 =!= 0)
      .select(col("custkey"),
        when(col("custkey") % 10 === 3, col("bal_c") + 50000L)
          .otherwise(col("bal_c")).as("bal_c"))
      .unionAll(base.filter(col("custkey") % 89 === 0)
        .select((col("custkey") + 20000000L).as("custkey"), col("bal_c")))
    snapshotDiff(base, next, "custkey", Seq("bal_c"))
  }

  val snapshotDiffCustomersSql: String =
    """WITH prev AS (
      |  SELECT c_custkey AS custkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer
      |), nxt AS (
      |  SELECT custkey,
      |         CASE WHEN custkey % 10 = 3 THEN bal_c + 50000
      |              ELSE bal_c END AS bal_c
      |  FROM prev WHERE custkey % 97 <> 0
      |  UNION ALL
      |  SELECT custkey + 20000000 AS custkey, bal_c FROM prev
      |  WHERE custkey % 89 = 0
      |)
      |SELECT coalesce(p.custkey, n.custkey) AS custkey,
      |       p.bal_c AS old_bal_c,
      |       n.bal_c AS new_bal_c,
      |       CASE WHEN p.custkey IS NULL THEN 'insert'
      |            WHEN n.custkey IS NULL THEN 'delete'
      |            WHEN p.bal_c IS DISTINCT FROM n.bal_c THEN 'update'
      |       END AS change_type
      |FROM prev p FULL OUTER JOIN nxt n ON p.custkey = n.custkey
      |WHERE CASE WHEN p.custkey IS NULL THEN 'insert'
      |           WHEN n.custkey IS NULL THEN 'delete'
      |           WHEN p.bal_c IS DISTINCT FROM n.bal_c THEN 'update'
      |      END IS NOT NULL""".stripMargin

  val upsertCustomersSql: String =
    """WITH base AS (
      |  SELECT c_custkey AS custkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
      |         c_mktsegment AS mktsegment
      |  FROM customer
      |), updates AS (
      |  SELECT custkey, bal_c + 50000 AS new_bal_c FROM base
      |  WHERE custkey % 10 = 3
      |  UNION ALL
      |  SELECT custkey + 10000000 AS custkey, bal_c AS new_bal_c FROM base
      |  WHERE custkey % 97 = 0
      |)
      |SELECT coalesce(b.custkey, u.custkey) AS custkey,
      |       coalesce(u.new_bal_c, b.bal_c) AS bal_c,
      |       coalesce(b.mktsegment, 'NEW') AS mktsegment,
      |       CASE WHEN u.new_bal_c IS NOT NULL AND b.bal_c IS NOT NULL
      |              THEN 'update'
      |            WHEN b.bal_c IS NULL THEN 'insert'
      |            ELSE 'keep' END AS action
      |FROM base b FULL OUTER JOIN updates u ON b.custkey = u.custkey""".stripMargin

  /** q207 — Merkle-style replica reconciliation: verify a 100 TB table copy
    * WITHOUT shipping rows. Each side reduces to per-bucket digests
    * (`bucket = key mod B`, digest = row count + order-independent sum of
    * 48-bit md5 row hashes); the digest exchange is B rows regardless of
    * table size, and only DIVERGENT buckets are drilled with a row-level
    * outer join — the anti-entropy pattern of Dynamo/Cassandra repair, as
    * a batch operator.
    *
    * The "replica" here is the orders table with two deterministic fault
    * injections a real repair must distinguish: bit-rot (`key % 9973 = 0`
    * rows get cents+1 — same key present, different content) and loss
    * (`key % 15017 = 0` rows absent). Output is one row per divergent
    * bucket: both side counts and the drilled modified/missing/extra key
    * tallies. Buckets holding only identical rows never appear and are
    * never re-read in the drill (the bucket predicate pushes into both
    * scans via the broadcast semi-join).
    *
    * Exactness: row hash = `conv(md5(key:cents:status)[1:12], 16, 10)` —
    * the portable 48-bit md5 basis; digest sum of ≤2⁴⁸ hashes stays in
    * Long up to ~32 M rows per bucket (scale B with the table; at wrap
    * risk swap the sum for XOR — same order-independence, no carry). */
  def merkleDiff(spark: SparkSession, dir: String,
                 buckets: Int = 256): DataFrame = {
    def canon(df: DataFrame): DataFrame = df.select(
      col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      col("o_orderstatus").as("st"))
    val a = canon(Tables.orders(spark, dir))
    val b = a.filter(col("k") % 15017 =!= 0)
      .withColumn("cents",
        when(col("k") % 9973 === 0, col("cents") + 1).otherwise(col("cents")))
    def hashed(df: DataFrame): DataFrame = df.select(
      col("k"), (col("k") % buckets).as("bucket"),
      conv(substring(md5(concat_ws(":", col("k"), col("cents"), col("st"))),
        1, 12), 16, 10).cast(LongType).as("h"))
    def digest(df: DataFrame): DataFrame = hashed(df)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("cks"))
    val divergent = digest(a).toDF("bucket", "n_a", "cks_a")
      .join(digest(b).toDF("bucket", "n_b", "cks_b"), Seq("bucket"), "full_outer")
      .filter(coalesce(col("n_a"), lit(-1L)) =!= coalesce(col("n_b"), lit(-1L)) ||
        coalesce(col("cks_a"), lit(0L)) =!= coalesce(col("cks_b"), lit(0L)))
      .select(col("bucket"), coalesce(col("n_a"), lit(0L)).as("rows_a"),
        coalesce(col("n_b"), lit(0L)).as("rows_b"))
    val div = broadcast(divergent.select(col("bucket")))
    val drill = hashed(a).join(div, Seq("bucket"), "left_semi")
      .select(col("bucket"), col("k"), col("h").as("h_a"))
      .join(hashed(b).join(div, Seq("bucket"), "left_semi")
        .select(col("k"), col("h").as("h_b")), Seq("k"), "full_outer")
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("h_a").isNotNull && col("h_b").isNotNull &&
          col("h_a") =!= col("h_b"), 1L).otherwise(0L)).as("n_modified"),
        sum(when(col("h_b").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("h_a").isNull, 1L).otherwise(0L)).as("n_extra"))
    divergent.join(drill, Seq("bucket"))
      .select(col("bucket"), col("rows_a"), col("rows_b"),
        col("n_modified"), col("n_missing"), col("n_extra"))
  }

  def merkleDiffSql(buckets: Int = 256): String =
    s"""WITH a AS (
       |  SELECT o_orderkey AS k,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |         o_orderstatus AS st
       |  FROM orders
       |), b AS (
       |  SELECT k,
       |         CASE WHEN k % 9973 = 0 THEN cents + 1 ELSE cents END AS cents,
       |         st
       |  FROM a WHERE k % 15017 <> 0
       |), ha AS (
       |  SELECT k, k % $buckets AS bucket,
       |         ('0x' || substr(md5(k::VARCHAR || ':' || cents::VARCHAR
       |                             || ':' || st), 1, 12))::BIGINT AS h
       |  FROM a
       |), hb AS (
       |  SELECT k, k % $buckets AS bucket,
       |         ('0x' || substr(md5(k::VARCHAR || ':' || cents::VARCHAR
       |                             || ':' || st), 1, 12))::BIGINT AS h
       |  FROM b
       |), da AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(h) AS BIGINT) AS cks
       |  FROM ha GROUP BY bucket
       |), db AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(h) AS BIGINT) AS cks
       |  FROM hb GROUP BY bucket
       |), divergent AS (
       |  SELECT coalesce(da.bucket, db.bucket) AS bucket,
       |         coalesce(da.n, 0) AS rows_a, coalesce(db.n, 0) AS rows_b
       |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
       |  WHERE coalesce(da.n, -1) <> coalesce(db.n, -1)
       |     OR coalesce(da.cks, 0) <> coalesce(db.cks, 0)
       |), drill AS (
       |  SELECT coalesce(x.bucket, y.bucket) AS bucket,
       |         CAST(sum(CASE WHEN x.h IS NOT NULL AND y.h IS NOT NULL
       |                        AND x.h <> y.h THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_modified,
       |         CAST(sum(CASE WHEN y.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_missing,
       |         CAST(sum(CASE WHEN x.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_extra
       |  FROM (SELECT ha.* FROM ha JOIN divergent USING (bucket)) x
       |  FULL OUTER JOIN
       |       (SELECT hb.* FROM hb JOIN divergent USING (bucket)) y
       |    ON x.k = y.k
       |  GROUP BY coalesce(x.bucket, y.bucket)
       |)
       |SELECT d.bucket, d.rows_a, d.rows_b,
       |       r.n_modified, r.n_missing, r.n_extra
       |FROM divergent d JOIN drill r ON d.bucket = r.bucket""".stripMargin
}
