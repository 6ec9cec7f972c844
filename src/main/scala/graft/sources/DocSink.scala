package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK — the write half of the connector surface
  * ([[GenDocsSource]] is the read half): a newline-record sink with the
  * full two-phase commit protocol a real warehouse sink needs at 1000
  * executors, spec- and oracle-pinned:
  *
  *  - TASK ISOLATION: every task writes to a UNIQUE temp file (uuid-named
  *    — two speculative attempts of one partition can never collide) and
  *    only its `commit()` exposes the file via a [[WriterCommitMessage]]
  *    carrying path + row count + an order-independent integer checksum;
  *  - DRIVER ATOMICITY: `BatchWrite.commit` is the single publish point —
  *    it clears the destination (truncate semantics), renames the temp
  *    files to their final `part-N` names, and writes a `_MANIFEST` with
  *    the total row count and checksum. A reader that finds the manifest
  *    sees a complete write or none (the _SUCCESS-file contract);
  *  - ABORT PATH: task/job abort deletes temp files — a failed job leaves
  *    the previous committed state untouched.
  *
  * The checksum is Σ (doc_id·2654435761 + bucket·97003 + n_tokens·40503)
  * over rows — commutative, so partial per-task sums add up in any
  * arrival order, and a DuckDB oracle re-derives it from the generator
  * formulas without reading a byte of the sink's output. Schema is the
  * fixed (doc_id, bucket, n_tokens) projection of [[GenDocsSource]].
  *
  * Usage: `df.write.format("graft.sources.DocSink")
  * .option("path", dir).mode("overwrite").save()`.
  */
class DocSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocSink.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocSinkTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("DocSink requires a path option")))
}

object DocSink {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  /** Order-independent per-row checksum term (commutative sum). */
  def rowHash(docId: Long, bucket: Long, nTokens: Long): Long =
    docId * 2654435761L + bucket * 97003L + nTokens * 40503L
}

private class DocSinkTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"docsink($path)"
  override def schema(): StructType = DocSink.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocSinkWriteBuilder(path, info.schema())
}

private class DocSinkWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  // append vs truncate both publish through the same two-phase commit;
  // truncate clears the committed files at the publish point
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new DocSinkBatchWrite(path, doTruncate)
  }
  require(schema.fieldNames.sameElements(DocSink.Schema.fieldNames),
    s"DocSink expects columns ${DocSink.Schema.fieldNames.mkString(",")}, " +
      s"got ${schema.fieldNames.mkString(",")}")
}

private case class DocSinkCommit(tmpPath: String, rows: Long, hashSum: Long)
    extends WriterCommitMessage

private class DocSinkBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DocSinkWriterFactory(path)

  /** The single publish point: truncate-clear, rename temp → part-N,
    * manifest last (readers treat the manifest as the commit marker). */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) {
      val old = dir.toFile.listFiles()
      if (old != null) old.filter(f => f.getName.startsWith("part-") ||
        f.getName == "_MANIFEST").foreach(_.delete())
    }
    val commits = messages.collect { case c: DocSinkCommit => c }
    commits.zipWithIndex.foreach { case (c, i) =>
      Files.move(Paths.get(c.tmpPath), dir.resolve(s"part-$i"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val manifest = s"rows=${commits.map(_.rows).sum}\n" +
      s"hash=${commits.map(_.hashSum).sum}\nfiles=${commits.length}\n"
    Files.write(dir.resolve("_MANIFEST"),
      manifest.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case c: DocSinkCommit => c }
      .foreach(c => Files.deleteIfExists(Paths.get(c.tmpPath)))
}

private class DocSinkWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // uuid-unique temp file: speculative attempts cannot collide, and an
      // abandoned file is sweep-able garbage, never committed data
      private val tmp: Path = {
        val dir = Paths.get(path, "_tmp")
        Files.createDirectories(dir)
        dir.resolve(
          s"w-$partitionId-$taskId-${java.util.UUID.randomUUID().toString.take(8)}")
      }
      private val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
      private var rows = 0L
      private var hashSum = 0L

      override def write(r: InternalRow): Unit = {
        val d = r.getLong(0); val b = r.getLong(1); val t = r.getLong(2)
        out.write(s"$d,$b,$t\n")
        rows += 1
        hashSum += DocSink.rowHash(d, b, t)
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        DocSinkCommit(tmp.toString, rows, hashSum)
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
      override def close(): Unit = ()
    }
}

/** q231 — the sink contract query: generate a deterministic frame through
  * the READ connector, publish it through the SINK's two-phase commit,
  * then audit the committed output — re-reading the part files AND the
  * manifest and folding both into one row:
  * `(n_rows, hash_sum, manifest_rows, manifest_hash, n_files)`.
  * The oracle re-derives every value from the generator formulas alone,
  * so a defect anywhere in write → commit → manifest → re-read goes
  * hash-red (a lost row, a double-committed speculative file, or a
  * manifest drift all move `n_rows`/`hash_sum` off the closed form). */
object DocSinkQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  final val Rows = 8000L
  final val Parts = 4

  def sinkRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val out = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_docsink_${graft.streaming.EventStreams.sanitize(dir)}")
    val src = spark.read.format("graft.sources.GenDocsSource")
      .option("rows", Rows).option("splits", 8).load()
      .select(col("doc_id"), col("bucket"), col("n_tokens"))
      .coalesce(Parts)
    src.write.format("graft.sources.DocSink")
      .option("path", out.toString).mode("overwrite").save()

    // read the DIRECTORY, not a part-* glob: Spark's file source skips
    // underscore-prefixed paths (the _MANIFEST marker and _tmp staging dir)
    // by contract, and the literal-glob stat in FileStreamSink.hasMetadata
    // dumps a spurious WARN stack per run on the pattern path
    val files = spark.read.text(out.toString)
      .select(split(col("value"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).cast("long").as("bucket"),
        element_at(col("f"), 3).cast("long").as("n_tokens"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("doc_id * 2654435761 + bucket * 97003 + n_tokens * 40503"))
          .as("hash_sum"))
    // the _MANIFEST is the commit MARKER, deliberately underscore-named so
    // data readers skip it (Spark file sources filter _-prefixed paths);
    // the publishing layer reads it driver-side — 3 lines, not data
    val m = Files.readAllLines(out.resolve("_MANIFEST")).toArray
      .map(_.toString.split("=")).map(kv => kv(0) -> kv(1).toLong).toMap
    files.select(col("n_rows"), col("hash_sum"),
      lit(m("rows")).as("manifest_rows"), lit(m("hash")).as("manifest_hash"),
      lit(m("files")).as("n_files"))
  }

  /** Closed-form oracle: the generator formulas integrated over
    * [0, Rows) — no filesystem access, so it can only match if the sink
    * committed exactly the generated rows once each. */
  val sinkRoundTripSql: String =
    s"""WITH g AS (
       |  SELECT i AS doc_id, i % 100 AS bucket,
       |         50 + ('0x' || substr(md5('gen:' || i), 1, 8))::BIGINT % 200
       |           AS n_tokens
       |  FROM (SELECT unnest(range($Rows)) AS i)
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(doc_id * 2654435761 + bucket * 97003
       |                + n_tokens * 40503) AS BIGINT) AS hash_sum,
       |       CAST(count(*) AS BIGINT) AS manifest_rows,
       |       CAST(sum(doc_id * 2654435761 + bucket * 97003
       |                + n_tokens * 40503) AS BIGINT) AS manifest_hash,
       |       CAST($Parts AS BIGINT) AS n_files
       |FROM g""".stripMargin
}
