package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines ingest surface (the S1-family source beyond CSV/parquet):
  * explicit schema (never runtime inference — at 100 TB schema inference is
  * a full extra pass), nested struct + array fields, and malformed-line
  * tolerance via PERMISSIVE mode with a corrupt-record column.
  *
  * The contract query ingests a deterministic JSONL fixture (the q26
  * pattern: the SOURCE is the operator under test, so the fixture is
  * authored, not derived from testdata) and aggregates per event type:
  * row counts, exact cent-sums, tag cardinality from the array column, and
  * a nested-field sum — exercising scalar, array, and struct extraction in
  * one pass. DuckDB mirrors it with `read_json` + `ignore_errors`, so the
  * corrupt-line-drop semantics are oracle-pinned too. */
object JsonSource {

  val FixturePath = "/tmp/graft_fixtures/events_q81.jsonl"

  /** 12 good lines (3 types, varied tags/meta, one null v, one missing tags,
    * one negative v), 2 malformed lines (bare text / bad token). Each
    * malformed line is SELF-CONTAINED — an unterminated multi-line object
    * would legitimately be consumed differently by different parsers (DuckDB
    * eats the following line too), which is parser-dependent, not a
    * semantics contract worth pinning. */
  val Fixture: String =
    """{"id": 1, "type": "click", "v": 1.25, "tags": ["a", "b"], "meta": {"k": 3}}
      |{"id": 2, "type": "view", "v": 2.5, "tags": ["a"], "meta": {"k": 1}}
      |{"id": 3, "type": "click", "v": 0.75, "tags": [], "meta": {"k": 0}}
      |not a json line
      |{"id": 4, "type": "buy", "v": 10.0, "tags": ["a", "b", "c"], "meta": {"k": 7}}
      |{"id": 5, "type": "click", "v": null, "tags": ["b"], "meta": {"k": 2}}
      |{"id": 6, "type": "view", "v": 3.25, "meta": {"k": 4}}
      |{"id": 7, "type": "buy", "v": -1.5, "tags": ["c"], "meta": {"k": 1}}
      |{"id": 8, "type": "click", "v": 4.0, "tags": ["a", "a"], "meta": {"k": 5}}
      |{"id": 9, "type": "view", "v": 0.25, "tags": ["b", "c"], "meta": {"k": 2}}
      |{"id": 10, "type": "buy", "v": 6.75, "tags": ["a"], "meta": {"k": 3}}
      |{"id": 11, "type": }
      |{"id": 12, "type": "click", "v": 2.25, "tags": ["c"], "meta": {"k": 6}}
      |{"id": 13, "type": "view", "v": 1.0, "tags": ["a", "c"], "meta": {"k": 0}}
      |""".stripMargin

  private def writeFixture(): Unit = {
    val p = java.nio.file.Paths.get(FixturePath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, Fixture)
  }

  /** Explicit source schema: never inferred. `_corrupt` captures malformed
    * lines under PERMISSIVE mode so ingest is total, not fail-fast. */
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("v", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("meta", StructType(Seq(StructField("k", LongType)))),
    StructField("_corrupt", StringType)))

  /** Raw load, corrupt rows retained (callers decide the policy). */
  def load(spark: SparkSession, path: String = FixturePath): DataFrame = {
    writeFixture()
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** q81 — per-type rollup of the clean rows: n, exact cent-sum of v,
    * distinct tag count (array column), nested meta.k sum. Corrupt-line
    * count is folded in as a separate 'CORRUPT' group so the tolerance
    * semantics are part of the oracle-checked result. */
  def jsonIngest(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark)
    val clean = raw.filter(col("_corrupt").isNull && col("type").isNotNull)
    val perType = clean
      .select(col("type"), col("v"), col("meta.k").as("k"),
        coalesce(col("tags"), array().cast(ArrayType(StringType))).as("tags"))
      .groupBy(col("type"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(Rfm.cents(col("v")), lit(0L))).as("v_cents"),
        sum(col("k")).as("k_sum"),
        size(array_distinct(flatten(collect_list(col("tags")))))
          .cast(LongType).as("n_tags"))
    // Corrupt count = total − clean: a scan whose projection is ONLY the
    // corrupt column is disallowed for JSON sources (Spark's
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN rule — column pruning reduces a
    // direct filter-on-_corrupt count to exactly that), so the count is
    // derived from two prune-safe aggregates instead.
    val total = raw.agg(count(lit(1)).as("total"))
    val good = clean.agg(count(lit(1)).as("good"))
    val corrupt = total.crossJoin(good)
      .select(lit("CORRUPT").as("type"),
        (col("total") - col("good")).as("n"),
        lit(0L).as("v_cents"), lit(0L).as("k_sum"), lit(0L).as("n_tags"))
    perType.unionAll(corrupt)
  }

  /** DuckDB's `ignore_errors` NULLs malformed lines (it keeps the row), so
    * its corrupt count is the all-NULL-row count — every good fixture line
    * has a non-null type. Tag cardinality is a separate unnest CTE —
    * inlining the unnest would multiply the per-type counts by tag
    * fan-out. */
  val jsonIngestSql: String = {
    s"""WITH raw AS (
       |  SELECT * FROM read_json('$FixturePath', format='newline_delimited',
       |    ignore_errors=true, columns={'id':'BIGINT','type':'VARCHAR',
       |    'v':'DOUBLE','tags':'VARCHAR[]','meta':'STRUCT(k BIGINT)'})
       |), clean AS (SELECT * FROM raw WHERE type IS NOT NULL
       |), stats AS (
       |  SELECT type, count(*) AS n,
       |         CAST(sum(coalesce(CAST(round(v * 100) AS BIGINT), 0)) AS BIGINT) AS v_cents,
       |         CAST(sum(meta.k) AS BIGINT) AS k_sum
       |  FROM clean GROUP BY type
       |), tagc AS (
       |  SELECT type, CAST(count(DISTINCT tag) AS BIGINT) AS n_tags
       |  FROM (SELECT type, unnest(tags) AS tag FROM clean) GROUP BY type
       |)
       |SELECT s.type, s.n, s.v_cents, s.k_sum, coalesce(t.n_tags, 0) AS n_tags
       |FROM stats s LEFT JOIN tagc t USING (type)
       |UNION ALL
       |SELECT 'CORRUPT', (SELECT count(*) FROM raw WHERE type IS NULL),
       |       0, 0, 0""".stripMargin
  }
}
