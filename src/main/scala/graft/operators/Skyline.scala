package graft.operators

import graft.{CacheRegistry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Pareto-skyline over document token-efficiency dimensions —
  * the multi-objective selection step of a data-curation pipeline ("keep
  * documents on the efficiency frontier" instead of a single weighted
  * score): maximize token count and vocabulary richness while minimizing
  * byte cost.
  *
  * A doc `a` dominates `b` iff `a.n_tokens ≥ b.n_tokens ∧
  * a.n_distinct ≥ b.n_distinct ∧ a.n_chars ≤ b.n_chars` with at least one
  * strict. The skyline is the set of undominated docs. Incomparable ties
  * (equal on every dimension) do NOT dominate each other, so duplicates of
  * a frontier point all survive — identical semantics in the SQL oracle's
  * `NOT EXISTS` formulation.
  */
object Skyline {

  /** q202 — two-phase sort-filter skyline (the distributed SFS algorithm):
    *
    * Phase 1 (per-partition local skyline): the monotone key
    * `s = n_tokens + n_distinct − n_chars` satisfies "a dominates b ⇒
    * s(a) > s(b)" (each dimension moves s the dominating way, one
    * strictly), so after `sortWithinPartitions(s desc)` a linear
    * `mapPartitions` scan needs to compare each row only against the
    * already-kept rows — no O(p²) pass, and every global-skyline row is
    * necessarily in its partition's local skyline (dominance is global ⇒
    * holds within the partition).
    *
    * Phase 2 (global confirm): the surviving candidates are filtered by a
    * BROADCAST left-anti self-join on the dominance predicate — candidates
    * dominated by a candidate from another partition drop out. No driver
    * collect anywhere; the candidate set stays a DataFrame.
    *
    * Scale: phase 1 is a narrow per-partition pass over one corpus scan
    * (the same word-array projection the text family shares). Phase 2's
    * cost is |candidates|² inside a broadcast nested-loop join —
    * real-world (correlated) data keeps the frontier tiny; for an
    * adversarial anti-correlated corpus you'd iterate phase 1 on a
    * re-partition of the candidates (each round shrinks the set) before
    * the quadratic confirm, which this two-phase shape extends to without
    * changing the contract. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast(LongType)
          .as("n_distinct"),
        col("n_chars").cast(LongType).as("n_chars"))
      .as[(Long, Long, Long, Long)]

    def dominates(a: (Long, Long, Long, Long),
                  b: (Long, Long, Long, Long)): Boolean =
      a._2 >= b._2 && a._3 >= b._3 && a._4 <= b._4 &&
        (a._2 > b._2 || a._3 > b._3 || a._4 < b._4)

    // Both sides of the confirm join reference the candidate set; without a
    // cache barrier phase 1 (a full corpus scan) would run twice.
    val local = CacheRegistry.cached(spark, s"skyline_candidates:$dir") {
      dims
        .sortWithinPartitions(
          (col("n_tokens") + col("n_distinct") - col("n_chars")).desc)
        .mapPartitions { rows =>
          val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          rows.filter { r =>
            val ok = !kept.exists(k => dominates(k, r))
            if (ok) kept += r
            ok
          }
        }
        .toDF("doc_id", "n_tokens", "n_distinct", "n_chars")
    }

    val cand = local.alias("a")
    val other = broadcast(local.alias("b"))
    cand.join(other,
        col("b.n_tokens") >= col("a.n_tokens") &&
          col("b.n_distinct") >= col("a.n_distinct") &&
          col("b.n_chars") <= col("a.n_chars") &&
          (col("b.n_tokens") > col("a.n_tokens") ||
            col("b.n_distinct") > col("a.n_distinct") ||
            col("b.n_chars") < col("a.n_chars")),
        "left_anti")
      .select(col("a.doc_id").as("doc_id"), col("a.n_tokens").as("n_tokens"),
        col("a.n_distinct").as("n_distinct"), col("a.n_chars").as("n_chars"))
  }

  /** The textbook O(n²) dominance anti-join — exact ground truth. */
  val skylineSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS n_distinct,
      |         CAST(n_chars AS BIGINT) AS n_chars
      |  FROM documents
      |)
      |SELECT a.doc_id, a.n_tokens, a.n_distinct, a.n_chars
      |FROM dims a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM dims b
      |  WHERE b.n_tokens >= a.n_tokens AND b.n_distinct >= a.n_distinct
      |    AND b.n_chars <= a.n_chars
      |    AND (b.n_tokens > a.n_tokens OR b.n_distinct > a.n_distinct
      |         OR b.n_chars < a.n_chars))""".stripMargin
}
