package graft.operators

import graft.Tables
import graft.functions.VectorExprs.{dot_product, l2_norm}
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §7.5 extension surface; no reference counterpart).
  *
  * Three tiers, ordered by scale:
  *  - [[bruteForceTopK]] — exact cosine top-k for a small broadcast query
  *    set against the full table. The data side streams once; per-row work
  *    is the native codegen dot product ([[graft.functions.VectorExprs]]).
  *    This is the correctness baseline and is the right plan whenever
  *    |queries| is small enough to broadcast (the common batch-scoring case).
  *  - [[signLshTopK]] — random-hyperplane sign-LSH: each vector reduces to a
  *    small bucket key; queries only score vectors sharing their bucket.
  *    Candidate cost tracks bucket occupancy, not table size.
  *  - [[ivfTopK]] — IVF: a seeded coarse K-Means partitions the table by
  *    nearest centroid; a query probes the `nprobe` nearest centroids only.
  *    At 100 TB the table would be written bucketed/partitioned by
  *    `coarse_id`, so a probe is a partition-pruned scan, not a shuffle.
  *
  * All variants L2-normalize first (cosine = dot on unit vectors) and
  * tie-break rankings by vec_id for determinism.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random unit hyperplanes (fixed seed). Generated
    * driver-side as literals — they are model constants, not data. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes) {
      val p = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(p.map(x => x * x).sum)
      p.map(_ / n)
    }
  }

  /** Sign-LSH bucket key: bit i = sign of dot(u, plane_i).
    *
    * The dot product is one `zip_with` against an array LITERAL per plane —
    * not per-dimension `element_at` terms: Catalyst inlines the (expensive,
    * aggregate-bearing) normalization expression into every reference of
    * `u`, so the per-dim form exploded to planes×dims copies and dominated
    * wall-clock with codegen/compile time. One reference per plane keeps the
    * expression tree linear in the plane count. */
  def signKey(u: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = dot_product(u, array(p.map(lit).toIndexedSeq: _*))
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** embeddings → (vec_id, u: array<double> L2-normalized).
    *
    * Cached via [[graft.CacheRegistry]], ONE instance per (session, dir):
    * every consumer references `u` many times (bucket keys, dot products,
    * window sorts), and without a materialization barrier Catalyst
    * re-inlines the normalize+norm expression at every reference; a
    * per-call `.cache()` would instead leak one orphaned cached plan per
    * invocation. At 100 TB this is the natural persisted
    * "prepared vectors" table. */
  private[operators] def normalized(spark: SparkSession, dir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"normalized:$dir")(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
        .withColumn("norm", l2_norm(col("v")))
        .filter(col("norm") > 0)
        .select(col("vec_id"), transform(col("v"), x => x / col("norm")).as("u")))

  private def dot(a: Column, b: Column): Column = dot_product(a, b)

  /** Exact cosine top-k: the first `nQueries` vec_ids (deterministic query
    * set) against the whole table. Output: (query_id, neighbor_id, cosine),
    * k rows per query, self-match excluded. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10): DataFrame = {
    val emb = normalized(spark, dir)
    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .toDF("query_id", "qu")
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("u"), col("qu")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk").cast(LongType).as("rk"))
  }

  /** Oracle for [[bruteForceTopK]] AND [[bruteForceTopKAgg]] (same rows by
    * construction — the aggregator path is additionally spec-pinned to the
    * window path): the identical float→double cast, 0-seeded left-to-right
    * norm and dot folds (`list_reduce` seeds with the first element, equal
    * to a 0.0 seed bit-for-bit), the same (cosine DESC, vec_id) tiebreak,
    * and the same 6-dp round. Doubles hash-match because both engines run
    * the SAME operations in the SAME order — the custom codegen
    * expressions ([[graft.functions.VectorExprs]]) are plain sequential
    * loops, deliberately not reassociated/vectorized. */
  def bruteForceTopKSql(nQueries: Int = 5, k: Int = 10): String =
    s"""WITH $unitVectorsSql, q AS (
       |  SELECT vec_id AS query_id, u AS qu FROM un ORDER BY vec_id LIMIT $nQueries
       |), scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         ${dotColsSql("e.u", "q.qu")} AS cos_raw
       |  FROM un e CROSS JOIN q
       |  WHERE e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, neighbor_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
       |       CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= $k""".stripMargin

  /** [[bruteForceTopK]] with the ranking done by the [[graft.functions.TopKAgg]]
    * typed aggregator instead of a window: candidates shrink to k rows per
    * query MAP-SIDE before the exchange (partial aggregation), instead of
    * shipping and sorting every candidate inside the window partition. Same
    * results (spec-asserted); strictly better shuffle volume at scale —
    * k·queries rows instead of n·queries. */
  def bruteForceTopKAgg(spark: SparkSession, dir: String,
                        nQueries: Int = 5, k: Int = 10): DataFrame = {
    val emb = normalized(spark, dir)
    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .toDF("query_id", "qu")
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("u"), col("qu")))
    val topk = udaf(graft.functions.TopKAgg.TopK(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    scored.groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("vec_id")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col._2").as("neighbor_id"),
        round(col("col._1"), 6).as("cosine"),
        (col("pos") + 1).cast(LongType).as("rk"))
  }

  /** Sign-LSH bucketed ANN: same query set and output shape as
    * [[bruteForceTopK]], but candidates are restricted to the query's
    * hyperplane-sign bucket. Recall < 1 by construction; at scale the
    * bucket join replaces the full-table scan. */
  def signLshTopK(spark: SparkSession, dir: String,
                  nQueries: Int = 5, k: Int = 10,
                  nPlanes: Int = 6): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val emb = normalized(spark, dir)
      .withColumn("key", signKey(col("u"), planes))
    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .toDF("query_id", "qu", "key")
    val scored = emb.join(broadcast(queries), Seq("key"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("u"), col("qu")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk").cast(LongType).as("rk"))
  }

  /** Oracle for [[signLshTopK]]: the hyperplanes are SEED-FIXED MODEL
    * CONSTANTS, so the SQL embeds them as literal double lists —
    * `Double.toString` is the shortest round-trip representation, so
    * DuckDB parses back the bit-identical double, and the sign test,
    * bucket key, bucket join, and ranking all reproduce exactly (same
    * 0-seeded left-to-right folds as [[bruteForceTopKSql]]). This turns
    * the LSH operator's actual (approximate-recall) OUTPUT into an
    * oracle-checked contract — the approximation is in the algorithm, not
    * in any engine nondeterminism. */
  /** The sequential-fold dot product against a LITERAL plane, as DuckDB
    * SQL — `Double.toString` round-trips bit-exactly through the parser. */
  private[operators] def dotLitSql(uCol: String, p: Array[Double]): String = {
    val lits = p.map(_.toString).mkString("[", ", ", "]")
    s"""list_reduce(list_transform(range(1, len($uCol) + 1),
       |              i -> $uCol[i] * ($lits)[i]),
       |            (x, y) -> x + y)""".stripMargin
  }

  /** The sequential-fold dot product of two list columns, as DuckDB SQL. */
  private[operators] def dotColsSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |              i -> $a[i] * $b[i]),
       |            (x, y) -> x + y)""".stripMargin

  /** Shared oracle prefix: embeddings → unit vectors `un(vec_id, u)`,
    * mirroring [[normalized]] (float→double cast, 0-seeded sum-of-squares
    * fold, norm > 0 filter). */
  private[operators] val unitVectorsSql: String =
    """unit AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), normed AS (
      |  SELECT vec_id, v,
      |         sqrt(list_reduce(list_transform(v, x -> x * x),
      |                          (a, b) -> a + b)) AS nrm
      |  FROM unit
      |), un AS (
      |  SELECT vec_id, list_transform(v, x -> x / nrm) AS u
      |  FROM normed WHERE nrm > 0
      |)""".stripMargin

  /** The banded sign-key expression for [[signKey]]'s plane slice, as
    * DuckDB SQL (bit i = 1<<i within the slice). */
  private[operators] def signKeySql(uCol: String,
                                    planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotLitSql(uCol, p)} > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  def signLshTopKSql(nQueries: Int = 5, k: Int = 10,
                     nPlanes: Int = 6): String = {
    val planes = hyperplanes(nPlanes, 64)
    val keyExpr = signKeySql("u", planes)
    s"""WITH $unitVectorsSql, keyed AS (
       |  SELECT vec_id, u, $keyExpr AS key FROM un
       |), q AS (
       |  SELECT vec_id AS query_id, u AS qu, key
       |  FROM keyed ORDER BY vec_id LIMIT $nQueries
       |), scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         ${dotColsSql("e.u", "q.qu")} AS cos_raw
       |  FROM keyed e JOIN q ON e.key = q.key
       |  WHERE e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos_raw,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_raw DESC, neighbor_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
       |       CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** q124 — kNN JOIN: every vector's top-`k` cosine neighbors within its
    * sign-LSH bucket — the self-join form of ANN that embedding-dedup and
    * hard-negative-mining pipelines run over the WHOLE corpus (the q50/q51
    * shape answers a small query set; this answers n queries at once).
    *
    * Plan: one bucket-key equi-join of the normalized table with itself
    * (per-bucket cost s², never n² — bucket occupancy is the knob, via
    * `nPlanes`), then [[graft.functions.TopKAgg]] shrinks candidates to k
    * rows per vector MAP-SIDE before the exchange. At 100 TB the table is
    * written bucketed by `key`, making the self-join partition-local.
    * Oracle-exact end to end: literal hyperplanes + sequential-fold dots
    * + the q54-proven aggregator == window equivalence. */
  def knnJoin(spark: SparkSession, dir: String,
              k: Int = 5, nPlanes: Int = 6): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val emb = normalized(spark, dir)
      .withColumn("key", signKey(col("u"), planes))
    val scored = emb.toDF("vec_id", "u", "key")
      .join(emb.toDF("nbr_id", "nu", "key"), Seq("key"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("cosine", dot(col("u"), col("nu")))
    val topk = udaf(graft.functions.TopKAgg.TopK(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    scored.groupBy(col("vec_id"))
      .agg(topk(col("cosine"), col("nbr_id")).as("nn"))
      .select(col("vec_id"), posexplode(col("nn")))
      .select(col("vec_id"), col("col._2").as("nbr_id"),
        round(col("col._1"), 6).as("cosine"),
        (col("pos") + 1).cast(org.apache.spark.sql.types.LongType).as("rk"))
  }

  /** Oracle for [[knnJoin]] — [[signLshTopKSql]] with the query set
    * widened to every vector. */
  def knnJoinSql(k: Int = 5, nPlanes: Int = 6): String = {
    val keyExpr = signKeySql("u", hyperplanes(nPlanes, 64))
    s"""WITH $unitVectorsSql, keyed AS (
       |  SELECT vec_id, u, $keyExpr AS key FROM un
       |), scored AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id,
       |         ${dotColsSql("a.u", "b.u")} AS cos_raw
       |  FROM keyed a JOIN keyed b ON a.key = b.key
       |  WHERE a.vec_id <> b.vec_id
       |), ranked AS (
       |  SELECT vec_id, nbr_id, cos_raw,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY cos_raw DESC, nbr_id) AS rk
       |  FROM scored
       |)
       |SELECT vec_id, nbr_id, round(cos_raw, 6) AS cosine,
       |       CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= $k""".stripMargin
  }

  /** Session cache for the fitted IVF coarse quantizer + its assignment
    * table, keyed like [[Clustering]]'s fit cache: the model is an index
    * artifact — at scale it is FIT ONCE when the table is (re)built and the
    * assignments are persisted partitioned by `coarse_id`; refitting per
    * query (the round-1 shape) charged every probe a full K-Means run. */
  private val ivfCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int), (KMeansModel, DataFrame)]

  private def ivfIndex(spark: SparkSession, dir: String,
                       nlist: Int): (KMeansModel, DataFrame) =
    ivfCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir, nlist), {
        val emb = normalized(spark, dir)
          .withColumn("features", array_to_vector(col("u")))
        val km = new KMeans().setK(nlist).setSeed(42L)
          .setDistanceMeasure("euclidean").setFeaturesCol("features")
          .setPredictionCol("coarse_id").setMaxIter(20)
        val model = km.fit(emb)
        val assigned = graft.CacheRegistry.cached(spark, s"ivf:$nlist:$dir")(
          model.transform(emb).select(col("vec_id"), col("u"), col("coarse_id")))
        (model, assigned)
      })

  /** The IVF coarse-assignment table (vec_id, u, coarse_id) for reuse by
    * [[Dedup.semanticDedup]] — the SemDeDup partitioner is exactly the ANN
    * index's coarse quantizer, so both share one fitted model per session. */
  private[operators] def ivfAssignments(spark: SparkSession, dir: String,
                                        nlist: Int): DataFrame =
    ivfIndex(spark, dir, nlist)._2

  /** IVF ANN: seeded coarse K-Means (nlist centroids) over unit vectors;
    * each query scores only vectors whose coarse cell is among its `nprobe`
    * nearest centroids. */
  def ivfTopK(spark: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    val (model, assigned) = ivfIndex(spark, dir, nlist)
    // nprobe nearest centroids per query, via the same centroid literals
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val queries = assigned.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val probeSets = queries.withColumn("probes",
      slice(array_sort(array(centroids.map { case (i, c) =>
        struct((lit(1.0) - dot_product(col("qu"),
          array(c.map(lit).toIndexedSeq: _*))).as("d"), lit(i).as("cid"))
      }: _*)), 1, nprobe))
      .select(col("query_id"), col("qu"),
        explode(col("probes.cid")).as("coarse_id"))
    val scored = assigned.join(broadcast(probeSets), Seq("coarse_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("u"), col("qu")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk").cast(LongType).as("rk"))
  }

  /** q58 — int8 scalar quantization of the embedding table: per-dimension
    * corpus min/max (the quantizer "model", a 64×2 artifact computed in one
    * distributed pass and inlined as literals — exactly how hyperplanes and
    * centroids are handled), then each value maps to
    * round((x−lo)/(hi−lo)·255)−128 ∈ [−128,127]. This is the 4× compression
    * step a production ANN index runs before storage; at 100 TB the stats
    * pass is one narrow scan + a 64-row aggregate, and quantization itself
    * is a narrow map. Output codes are emitted as a joined string so the
    * DuckDB oracle compares the full code vector exactly (array columns
    * don't round-trip the compare harness). Constant dimensions (hi = lo)
    * quantize to 0 by convention on both engines. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding").cast(ArrayType(DoubleType))))
      .groupBy(col("pos")).agg(min(col("col")).as("lo"), max(col("col")).as("hi"))
      .orderBy(col("pos")).collect()
    val lo = array(dims.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val hi = array(dims.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    val v = col("embedding").cast(ArrayType(DoubleType))
    val q = transform(sequence(lit(0), lit(dims.length - 1)), i => {
      val x = element_at(v, i + 1)
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      when(h > l,
        (round((x - l) / (h - l) * 255.0) - 128.0).cast(LongType))
        .otherwise(lit(0L))
    })
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      lit(dims.length.toLong).as("n_dims"),
      concat_ws(",", q).as("codes"))
  }

  val quantizeInt8Sql: String =
    """WITH dims AS (
      |  SELECT i AS pos, min(v[i]) AS lo, max(v[i]) AS hi
      |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |       unnest(range(1, len(v) + 1)) AS r(i)
      |  GROUP BY i
      |), model AS (
      |  SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
      |  FROM dims
      |)
      |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
      |       array_to_string(list_transform(range(1, len(v) + 1), i ->
      |         CASE WHEN his[i] > los[i]
      |              THEN CAST(round((v[i] - los[i]) / (his[i] - los[i]) * 255.0)
      |                        - 128.0 AS BIGINT)
      |              ELSE 0 END), ',') AS codes
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |     model""".stripMargin

  /** Per-label embedding statistics (count + mean/max vector norm). The
    * norm fold is sequential per row → deterministic; oracle-checked against
    * DuckDB list_* functions. */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label").cast(LongType).as("label"),
        l2_norm(col("embedding").cast(ArrayType(DoubleType))).as("norm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"))

  val embeddingStatsSql: String =
    """SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
      |       round(min(norm), 6) AS min_norm, round(max(norm), 6) AS max_norm
      |FROM (
      |  SELECT label,
      |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |                                      x -> x * x))) AS norm
      |  FROM embeddings)
      |GROUP BY label""".stripMargin
}
