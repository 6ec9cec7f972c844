package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 gate for the r8 failure class: `q200_bm25` and
  * `q210_moment_sketch` were numerically identical on both engines yet
  * hash-failed in the driver because their oracle RESULT TYPES left the
  * driver-hash-stable set (DuckDB `sum(BIGINT)` returns HUGEINT; s3/s4
  * exceeded int64 as DECIMAL(38,0)). Local value-compare green did NOT
  * imply driver green.
  *
  * This spec pins the Spark half of the contract: every column of every
  * `SparkEntry.queries` result must be one of Long/Int/Short/Byte/Double/
  * String/Date/Timestamp/Boolean — the types whose hash normalization is
  * engine-independent. Wider types (DecimalType in particular) must be
  * re-emitted as digit strings or BIGINT limbs BEFORE the result surface.
  * The DuckDB half lives in `.claude/skills/verify/check.py`, which now
  * DESCRIBEs every oracle and flags non-stable result types the same way.
  *
  * Schema derivation is lazy (plan analysis, no job) for all queries that
  * don't collect miniatures in their builders, so the sweep is cheap at
  * sf0.001.
  */
class TypeAuditSpec extends AnyFunSuite {
  private val spark = GraftTestSession.spark
  private val dir = GraftTestSession.Sf0001

  private val stable: Set[DataType] = Set(
    LongType, IntegerType, ShortType, ByteType,
    DoubleType, StringType, DateType, TimestampType, BooleanType)

  test("every contract query's output schema stays in the driver-hash-stable type set") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val schema =
          try build(spark, dir).schema
          catch { case e: Exception =>
            fail(s"$name: schema derivation failed: ${e.getMessage}")
          }
        schema.fields.collect {
          case f if !stable.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"\nnon-hash-stable output columns:\n  ${offenders.mkString("\n  ")}")
  }
}
