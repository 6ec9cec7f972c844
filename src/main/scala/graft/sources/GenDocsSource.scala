package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector — the "write your own connector" rung of
  * the extension ladder, complementing the custom Expression (functions),
  * optimizer Rule and LogicalPlan/Strategy/Exec (plans) surfaces. A
  * DETERMINISTIC synthetic documents table: row i carries
  * `(doc_id = i, bucket = i mod 100, body_hash = md5("gen:" + i),
  * n_tokens = 50 + first32bits(body_hash) mod 200)` — every field a pure
  * function of the id, so a DuckDB oracle can re-derive the identical
  * table from `range()` and the q196 contract query rides the ordinary
  * hash-exact gate. No row exists anywhere until a reader asks for it.
  *
  * The three scan-efficiency contracts a real connector must honor are
  * implemented and spec-pinned, because at 100 TB they ARE the difference
  * between a scan and a catastrophe:
  *  - SPLIT PLANNING: the id space divides into `splits` equal ranges,
  *    one [[InputPartition]] each — the parallelism unit;
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): `doc_id` range
  *    predicates narrow the GENERATED id interval and prune whole splits
  *    before they are planned (the connector-level analogue of parquet
  *    row-group pruning / partition pruning — q130's discipline);
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): only
  *    requested fields are computed — dropping `body_hash`/`n_tokens`
  *    skips the md5 entirely (the dominant per-row cost).
  *
  * Usage: `spark.read.format("graft.sources.GenDocsSource")
  * .option("rows", n).option("splits", k).load()`.
  */
class GenDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenDocsSource.FullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GenDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("splits", "8").toInt)
}

object GenDocsSource {
  val FullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("body_hash", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  private[sources] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 50 + first-32-md5-bits mod 200 — the portable-hash derivation the
    * DuckDB oracle replays verbatim. */
  private[sources] def tokensOf(hash: String): Long =
    50L + java.lang.Long.parseLong(hash.take(8), 16) % 200L
}

private class GenDocsTable(rows: Long, splits: Int)
    extends Table with SupportsRead {
  override def name(): String = s"gendocs($rows)"
  override def schema(): StructType = GenDocsSource.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenDocsScanBuilder(rows, splits)
}

private class GenDocsScanBuilder(rows: Long, splits: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var schema: StructType = GenDocsSource.FullSchema
  private var countPushed = false

  /** COUNT(*) with no grouping is CLOSED-FORM for a generator — hi − lo —
    * so the scan answers it without creating a single row: the DSv2
    * aggregate-pushdown surface ([[SupportsPushDownAggregates]]), the
    * connector analogue of parquet footer count-stats. Anything beyond
    * ungrouped COUNT(*) declines (returns false) and runs in Spark. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) {
      countPushed = true
      schema = StructType(Seq(StructField("count", LongType, nullable = false)))
    }
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ours
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  override def build(): Scan =
    if (countPushed) new GenDocsCountScan(lo, math.max(lo, hi), schema)
    else new GenDocsScan(lo, math.max(lo, hi), splits, schema)
}

/** The pushed-COUNT scan: one partition, one closed-form row, zero
  * generation. */
private class GenDocsCountScan(lo: Long, hi: Long,
                               override val readSchema: StructType)
    extends Scan with Batch {
  override def toBatch: Batch = this
  override def description(): String = s"GenDocs COUNT pushed [$lo, $hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenDocsPartition(0, 0))
  override def createReaderFactory(): PartitionReaderFactory =
    new GenDocsCountReaderFactory(math.max(0L, hi - lo))
}

/** Standalone (serializable) factory — an inner anonymous class would
  * capture the non-serializable Scan as $outer and fail task ship-out. */
private class GenDocsCountReaderFactory(count: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow(count)
      override def close(): Unit = ()
    }
}

private class GenDocsScan(lo: Long, hi: Long, splits: Int,
                          override val readSchema: StructType)
    extends Scan with Batch {
  override def toBatch: Batch = this
  override def description(): String =
    s"GenDocs [$lo, $hi) splits=$splits columns=" +
      readSchema.fieldNames.mkString(",")

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val per = math.max(1L, (n + splits - 1) / splits)
      (lo until hi by per)
        .map(s => GenDocsPartition(s, math.min(hi, s + per)): InputPartition)
        .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenDocsReaderFactory(readSchema.fieldNames)
}

private case class GenDocsPartition(start: Long, end: Long)
    extends InputPartition

/** q196 — the custom-connector contract query: read the synthetic table
  * through the DSv2 source with a doc_id range predicate (PUSHED — the
  * scan generates only the [25k, 75k) interval and plans only its
  * splits) and roll up tokens per bucket. The oracle re-derives the
  * identical rows in DuckDB from `range()` + the same md5 formulas, so
  * the connector's generation, pushdown and pruning all sit under the
  * hash gate. */
object GenDocsQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def bucketRollup(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.GenDocsSource")
      .option("rows", 100000L).option("splits", 16)
      .load()
      .filter(col("doc_id") >= 25000L && col("doc_id") < 75000L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))

  val bucketRollupSql: String =
    """WITH g AS (
      |  SELECT i % 100 AS bucket,
      |         50 + ('0x' || substr(md5('gen:' || i), 1, 8))::BIGINT % 200
      |           AS n_tokens
      |  FROM (SELECT unnest(range(25000, 75000)) AS i)
      |)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM g GROUP BY bucket""".stripMargin
}

private class GenDocsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenDocsPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.start - 1
      override def next(): Boolean = { i += 1; i < gp.end }
      override def get(): InternalRow = {
        // md5 computed at most once per row, and ONLY when a hash-derived
        // column survived pruning
        lazy val hash = GenDocsSource.md5Hex(s"gen:$i")
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => i
          case "bucket" => i % 100L
          case "body_hash" => UTF8String.fromString(hash)
          case "n_tokens" => GenDocsSource.tokensOf(hash)
          case other => throw new IllegalArgumentException(
            s"unknown gendocs column $other")
        })
      }
      override def close(): Unit = ()
    }
  }
}
