package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Customer-segmentation ML stage — the reference's core "query" surface
  * (SURVEY §2.4), re-expressed on Spark MLlib.
  *
  * Semantics preserved from the reference:
  *  - Standardization uses POPULATION std with a 1e-8 floor
  *    (reference `src/data.rs:16-41`, floor at `src/data.rs:37`) — expressed
  *    as plain aggregates because MLlib's StandardScaler divides by sample
  *    std (n−1).
  *  - K-Means is Lloyd's with Euclidean distance, `k ∈ [3,5]` and `n ≥ k`
  *    enforced (reference `src/model.rs:138-150`), max-iter default 300 and
  *    tolerance 1e-4 (reference `src/cli.rs:27-32`).
  *  - The reference's random init (`src/model.rs:158`) is nondeterministic;
  *    here init is seeded k-means|| — strictly better quality and
  *    reproducible, which the reference's own tests could not assume.
  *  - Single-point prediction scales the new point by the TRAINING scaler
  *    then takes argmin over centroids (reference `src/model.rs:26-50`,
  *    `src/model.rs:188-195`).
  *  - Silhouette is the reference's exact sampled definition — Euclidean
  *    (not squared), pairwise within the first min(n,100) rows only
  *    (reference `src/model.rs:64-119`) — computed on ≤100 collected rows
  *    driver-side; MLlib's ClusteringEvaluator (squared Euclidean, full
  *    data) is intentionally not used.
  *
  * Scale notes: feature building is two narrow passes (1-row stats aggregate
  * broadcast back); each K-Means iteration is one map-reduce over the feature
  * table with centroids broadcast — the textbook distributed Lloyd's. Nothing
  * here collects more than k centroids, 6 scalars, or the ≤100-row
  * silhouette sample to the driver.
  */
object Clustering {

  /** Fitted scaler state (reference `StandardScaler`, `src/data.rs:8-12`). */
  final case class ScalerStats(mu: Array[Double], sd: Array[Double])

  /** Fitted segmentation state (reference `KMeansModel`, `src/model.rs:10-22`). */
  final case class Segmentation(model: KMeansModel, scaler: ScalerStats,
                                predictions: DataFrame, inertia: Double)

  val FeatureCols: Seq[String] = Seq("recency", "frequency", "monetary")

  /** Population-std z-scoring of the RFM table, keeping features as columns
    * plus an assembled `features` vector (reference M1–M3+M5). */
  def standardize(rfm: DataFrame): (DataFrame, ScalerStats) = {
    val statsRow = rfm.agg(
      avg("recency"), greatest(stddev_pop("recency"), lit(1e-8)),
      avg("frequency"), greatest(stddev_pop("frequency"), lit(1e-8)),
      avg("monetary"), greatest(stddev_pop("monetary"), lit(1e-8))).head()
    val mu = Array(statsRow.getDouble(0), statsRow.getDouble(2), statsRow.getDouble(4))
    val sd = Array(statsRow.getDouble(1), statsRow.getDouble(3), statsRow.getDouble(5))
    val z = FeatureCols.zipWithIndex.foldLeft(rfm) { case (df, (c, i)) =>
      df.withColumn(s"${c}_z", (col(c) - lit(mu(i))) / lit(sd(i)))
    }
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.map(_ + "_z").toArray)
      .setOutputCol("features")
      .transform(z)
    (assembled, ScalerStats(mu, sd))
  }

  /** Reference guards: k ∈ [3,5] (`src/model.rs:138-143`) and n ≥ k
    * (`src/model.rs:145-150`). */
  def validateK(k: Int, n: Long): Unit = {
    require(k >= 3 && k <= 5, s"Number of clusters must be between 3 and 5, got $k")
    require(n >= k, s"Need at least $k data points, got $n")
  }

  /** Fit the full segmentation (reference `fit_kmeans`, `src/model.rs:132-177`). */
  def fit(rfm: DataFrame, k: Int = 4, maxIters: Int = 300,
          tol: Double = 1e-4, seed: Long = 42L): Segmentation = {
    val (features, scaler) = standardize(rfm)
    val n = rfm.count()
    validateK(k, n)
    // k-means|| init samples rows in partition order, and within-partition
    // order after a shuffle is not stable across runs — pin both so a seeded
    // fit is bit-reproducible (the reference is unseeded and nondeterministic,
    // SURVEY §7.4; we promise strictly more). Partition count follows data
    // size: every Lloyd's iteration is one job over these partitions, and
    // hundreds of near-empty tasks per iteration dominated wall-clock on
    // small-SF fits. Rows here are 3 doubles — ~64k rows/task is still only
    // ~1.5 MB, so iteration cost is scheduling-bound until well past that
    // (a billion-customer table still yields ~15k tasks via this formula).
    val numParts = math.max(1, math.min(1 << 14, n / 65536)).toInt
    val cached = features
      .repartition(numParts, col("custkey"))
      .sortWithinPartitions(col("custkey"))
      .cache()
    try {
      val model = new KMeans()
        .setK(k).setMaxIter(maxIters).setTol(tol)
        .setDistanceMeasure("euclidean").setSeed(seed)
        .setFeaturesCol("features").setPredictionCol("prediction")
        .fit(cached)
      // materialize predictions while the feature cache is alive: every
      // downstream stat (sizes, silhouette, predict-mode counts) re-actions
      // this frame, and without the cache each action replays the whole
      // scan+aggregate+transform lineage
      val predictions = model.transform(cached).cache()
      predictions.count()
      Segmentation(model, scaler, predictions, model.summary.trainingCost)
    } finally cached.unpersist()
  }

  /** One fit serves all ML queries in a session (the reference refits per
    * invocation — `src/main.rs:52` — but its README flags that as a known
    * limitation; a session-scoped model cache preserves the semantics while
    * avoiding 5× refits in Verify/Bench). */
  private val fitCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), Segmentation]

  private def fitOnDir(spark: SparkSession, dir: String, k: Int = 4): Segmentation = {
    val seg = fitCache.getOrElseUpdate((spark.sparkContext.applicationId, dir, k),
      fit(Rfm.rfmPrepared(spark, dir), k))
    // capture the fit's constants for oracle-literal embedding (below),
    // keyed by (dir, k) so a process that fits on two dirs or non-default k
    // can never pair a dump with the wrong fit's literals; Verify dumps
    // oracleSql AFTER running queries, so a run that exercised any ML
    // read-out has the dir-specific literals here by dump time
    captured.put(dir, k, (seg.scaler, seg.model.clusterCenters.map(_.toArray)))
    seg
  }

  // ---- literal-centroid read-outs ------------------------------------------
  // Once fitted, the scaler (μ, σ) and the k×3 centroids are MODEL CONSTANTS.
  // Every read-out below derives from them with plain arithmetic, so both
  // engines can run the IDENTICAL expression tree on the identical literals
  // (`Double.toString` round-trips bit-exactly through the DuckDB parser —
  // the proven q51 hyperplane trick): the fit stays spec-land, the oracle
  // verifies every read-out's math end to end. Cluster labels use the
  // reference's own predict definition — EXACT euclidean argmin with
  // first-min tie-break (`src/model.rs:26-50`) — rather than MLlib's
  // bound-pruned findClosest; ClusteringSpec pins the two assignments equal.

  private val captured =
    new graft.OracleCapture.Captured[Int, (ScalerStats, Array[Array[Double]])]

  /** Squared euclidean distance of the z-point to centroid `c`, in the
    * shared shape `((dr² + df²) + dm²)` both engines evaluate identically. */
  private def distCol(c: Array[Double]): Column = {
    val dr = col("recency_z") - lit(c(0))
    val df0 = col("frequency_z") - lit(c(1))
    val dm = col("monetary_z") - lit(c(2))
    dr * dr + df0 * df0 + dm * dm
  }

  /** First-min argmin over pre-computed `__d{i}` columns ([[firstMinSql]]
    * is the textual mirror; PropertySpec pins the tie-break law). */
  private[graft] def firstMin(n: Int): Column = {
    val base: Column = lit((n - 1).toLong)
    (0 until n - 1).foldRight(base) { (i, acc) =>
      val cond = ((i + 1) until n)
        .map(j => col(s"__d$i") <= col(s"__d$j")).reduce(_ && _)
      when(cond, lit(i.toLong)).otherwise(acc)
    }
  }

  /** Predictions + per-centroid `__d{i}` squared distances + the explicit
    * argmin `cluster` label (reference `src/model.rs:26-50`). */
  def labeledPredictions(seg: Segmentation): DataFrame = {
    val centers = seg.model.clusterCenters.map(_.toArray)
    val withD = centers.zipWithIndex.foldLeft(seg.predictions) {
      case (df, (c, i)) => df.withColumn(s"__d$i", distCol(c))
    }
    withD.withColumn("cluster", firstMin(centers.length))
  }

  /** A7 — cluster sizes + percentages (reference `src/model.rs:53-61`,
    * percentages `src/main.rs:125-129`). Oracle-gated via literal
    * centroids ([[clusterSizesSql]]). */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val total = seg.predictions.count().toDouble
    labeledPredictions(seg).groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"))
      .withColumn("pct", round(col("size") / total * 100.0, 2))
      .orderBy(col("cluster"))
  }

  /** M8 — centroid export in normalized space (reference `src/model.rs:165`). */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val rows = seg.model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c(0), c(1), c(2))
    }.toSeq
    spark.createDataFrame(rows)
      .toDF("cluster", "recency_z", "frequency_z", "monetary_z")
      .orderBy(col("cluster"))
  }

  /** A8 — inertia / WCSS (reference `compute_inertia`, `src/model.rs:198-215`:
    * Σ over points of squared distance to the FINAL assigned centroid —
    * computed distributed, post-fit, exactly like the reference, rather than
    * read off MLlib's last-iteration trainingCost). The per-point minimum
    * rounds to 6 dp and sums in exact DECIMAL so partition order cannot move
    * the result and the oracle reproduces it bit-for-bit; the 6-dp grid is
    * 5 orders finer than the reference's own %.2f display
    * (`src/viz.rs:178`). ClusteringSpec pins this against a sequential
    * driver-side recomputation and against trainingCost. */
  def inertia(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val k = seg.model.clusterCenters.length
    labeledPredictions(seg)
      .agg(sum(round(least((0 until k).map(i => col(s"__d$i")): _*), 6)
        .cast(DecimalType(38, 6))).cast(DoubleType).as("inertia"))
  }

  /** M9 — nearest-centroid argmin for one scaled point (reference
    * `src/model.rs:26-50`). */
  def predictScaled(model: KMeansModel, point: Vector): Int = {
    require(point.size == model.clusterCenters.head.size,
      s"Input dimension mismatch: expected ${model.clusterCenters.head.size}, got ${point.size}")
    model.clusterCenters.zipWithIndex.minBy { case (c, _) =>
      Vectors.sqdist(c, point)
    }._2
  }

  /** M4+M9+M10 — scale a raw (recency, frequency, monetary) triple with the
    * training scaler, then argmin over centroids (reference
    * `src/data.rs:78-87` + `src/model.rs:188-195`). */
  def predictCluster(seg: Segmentation, rfm: Array[Double]): Int = {
    require(rfm.length == 3, s"Expected 3 RFM values, got ${rfm.length}")
    val z = rfm.indices.map(i => (rfm(i) - seg.scaler.mu(i)) / seg.scaler.sd(i))
    predictScaled(seg.model, Vectors.dense(z.toArray))
  }

  /** Prediction-mode query (reference `run_prediction_mode`,
    * `src/main.rs:31-81`): fit, then predict a fixed probe point — the
    * README's example "30,10,500.0" (`README.md:144-147`). */
  def predictQuery(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val cluster = predictCluster(seg, Array(30.0, 10.0, 500.0))
    val size = labeledPredictions(seg).filter(col("cluster") === cluster).count()
    val total = seg.predictions.count()
    val pct = math.rint(size.toDouble / total * 10000.0) / 100.0
    spark.createDataFrame(Seq((cluster.toLong, size, pct)))
      .toDF("cluster", "cluster_size", "cluster_pct")
  }

  /** S4 data feed — the scatter chart's input (reference
    * `create_cluster_visualization`, `src/viz.rs:20-115`: Frequency vs
    * Monetary in normalized space, point color = cluster). PNG rendering is
    * out of engine scope; this exposes exactly the data the chart consumes. */
  def scatterData(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    labeledPredictions(seg).select(col("custkey"),
      round(col("frequency_z"), 6).as("frequency_z"),
      round(col("monetary_z"), 6).as("monetary_z"),
      col("cluster"))
  }

  /** A10 — the reference's exact sampled silhouette: Euclidean, pairwise
    * within the first min(n,100) rows only, 0 for degenerate points
    * (reference `src/model.rs:64-119`; sample size `src/main.rs:131-133`).
    * "First" rows are made deterministic by custkey order. */
  def silhouetteSampled(labeled: DataFrame, sampleSize: Int = 100): Double = {
    val sample: Array[(Array[Double], Long)] = labeled
      .orderBy(col("custkey"))
      .select(col("recency_z"), col("frequency_z"), col("monetary_z"),
        col("cluster"))
      .limit(sampleSize)
      .collect()
      .map(r => (Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)),
        r.getLong(3)))
    val n = sample.length
    if (n < 2) return 0.0
    // ((dr² + df²) + dm²) then sqrt — the shape the oracle SQL mirrors
    def dist(a: Array[Double], b: Array[Double]) = {
      val dr = a(0) - b(0); val df0 = a(1) - b(1); val dm = a(2) - b(2)
      math.sqrt(dr * dr + df0 * df0 + dm * dm)
    }
    val scores = sample.indices.map { i =>
      val (xi, ci) = sample(i)
      val byCluster = sample.indices.filter(_ != i)
        .groupBy(j => sample(j)._2)
        .map { case (c, js) => c -> js.map(j => dist(xi, sample(j)._1)) }
      val a = byCluster.get(ci).map(ds => ds.sum / ds.size).getOrElse(0.0)
      val others = byCluster.removed(ci).values.map(ds => ds.sum / ds.size)
      if (others.isEmpty) 0.0
      else {
        val b = others.min
        val m = math.max(a, b)
        if (m == 0.0) 0.0 else (b - a) / m
      }
    }
    scores.sum / n
  }

  /** Silhouette as a 1-row query (report-only metric in the reference —
    * printed with 3 decimals, never persisted: `src/viz.rs:163-193`).
    * Emitted at FULL precision: the [[silhouetteSql]] oracle now sums every
    * mean and the final score in the same deterministic sample order as
    * [[silhouetteSampled]]'s loop (ordered `list_reduce` folds), so both
    * engines produce the bit-identical double and no rounding grid — with
    * its cross-engine midpoint-rule exposure — is needed at all. */
  def silhouetteQuery(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val s = silhouetteSampled(labeledPredictions(seg))
    spark.createDataFrame(Seq(Tuple1(s))).toDF("silhouette")
  }

  /** S6 — console cluster-statistics report (reference
    * `print_cluster_statistics`, `src/viz.rs:163-193`). */
  def clusterReport(seg: Segmentation): String = {
    val sizes = seg.predictions.groupBy("prediction").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble
    val silhouette = silhouetteSampled(labeledPredictions(seg))
    val sb = new StringBuilder
    sb.append(s"Number of clusters: ${seg.model.getK}\n")
    (0 until seg.model.getK).foreach { c =>
      val n = sizes.getOrElse(c, 0L)
      sb.append(f"Cluster $c: $n customers (${n / total * 100}%.1f%%)\n")
    }
    sb.append(f"Inertia (WCSS): ${seg.inertia}%.2f\n")
    sb.append(f"Silhouette (100-sample): $silhouette%.3f\n")
    seg.model.clusterCenters.zipWithIndex.foreach { case (c, i) =>
      sb.append(f"Centroid $i: R=${c(0)}%.3f F=${c(1)}%.3f M=${c(2)}%.3f\n")
    }
    sb.toString
  }

  // ---- DuckDB oracles for the literal-centroid read-outs -------------------

  /** Shared CTE prefix: the q04-proven RFM derivation, z-scores from the
    * literal scaler, per-centroid squared distances in the [[distCol]]
    * shape. `Double.toString` round-trips bit-exactly through the parser,
    * so every arithmetic step lands on the identical doubles. */
  private def zdCtes(sc: ScalerStats, cs: Array[Array[Double]]): String = {
    import SqlLit.dbl
    val ds = cs.zipWithIndex.map { case (c, i) =>
      s"""(recency_z - ${dbl(c(0))}) * (recency_z - ${dbl(c(0))}) +
         |           (frequency_z - ${dbl(c(1))}) * (frequency_z - ${dbl(c(1))}) +
         |           (monetary_z - ${dbl(c(2))}) * (monetary_z - ${dbl(c(2))}) AS __d$i""".stripMargin
    }.mkString(",\n         ")
    s"""${Rfm.rfmCtes},
       |z AS (
       |  SELECT custkey,
       |         (recency - ${dbl(sc.mu(0))}) / ${dbl(sc.sd(0))} AS recency_z,
       |         (frequency - ${dbl(sc.mu(1))}) / ${dbl(sc.sd(1))} AS frequency_z,
       |         (monetary - ${dbl(sc.mu(2))}) / ${dbl(sc.sd(2))} AS monetary_z
       |  FROM rfm),
       |d AS (
       |  SELECT *,
       |         $ds
       |  FROM z)""".stripMargin
  }

  /** First-min argmin CASE over `__d{i}` — textual mirror of [[firstMin]]. */
  private def firstMinSql(n: Int): String = {
    val whens = (0 until n - 1).map { i =>
      val conds = ((i + 1) until n).map(j => s"__d$i <= __d$j").mkString(" AND ")
      s"WHEN $conds THEN $i"
    }.mkString(" ")
    s"CAST(CASE $whens ELSE ${n - 1} END AS BIGINT)"
  }

  private def clusterSizesSql(sc: ScalerStats, cs: Array[Array[Double]]): String =
    s"""WITH ${zdCtes(sc, cs)},
       |lab AS (SELECT ${firstMinSql(cs.length)} AS cluster FROM d),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM lab)
       |SELECT cluster, count(*) AS size,
       |       round(CAST(count(*) AS DOUBLE) / total * 100.0, 2) AS pct
       |FROM lab CROSS JOIN tot
       |GROUP BY cluster, total""".stripMargin

  private def inertiaSql(sc: ScalerStats, cs: Array[Array[Double]]): String = {
    val least = cs.indices.map(i => s"__d$i").mkString("least(", ", ", ")")
    s"""WITH ${zdCtes(sc, cs)}
       |SELECT CAST(SUM(CAST(round($least, 6) AS DECIMAL(38,6))) AS DOUBLE)
       |         AS inertia
       |FROM d""".stripMargin
  }

  /** The probe point's z and distances as ALL-LITERAL arithmetic — DuckDB
    * re-derives the predicted cluster itself (reference probe
    * `README.md:144-147`, argmin `src/model.rs:26-50` with the `(c - p)`
    * diff order of `Vectors.sqdist`). `cluster_pct` uses round-half-even
    * to mirror `math.rint`. */
  private def predictSql(sc: ScalerStats, cs: Array[Array[Double]]): String = {
    import SqlLit.dbl
    val pds = cs.zipWithIndex.map { case (c, i) =>
      s"""(${dbl(c(0))} - pr) * (${dbl(c(0))} - pr) + (${dbl(c(1))} - pf) * (${dbl(c(1))} - pf) +
         |           (${dbl(c(2))} - pm) * (${dbl(c(2))} - pm) AS __d$i""".stripMargin
    }.mkString(",\n         ")
    s"""WITH ${zdCtes(sc, cs)},
       |lab AS (SELECT ${firstMinSql(cs.length)} AS cluster FROM d),
       |probe0 AS (SELECT (30.0 - ${dbl(sc.mu(0))}) / ${dbl(sc.sd(0))} AS pr,
       |                  (10.0 - ${dbl(sc.mu(1))}) / ${dbl(sc.sd(1))} AS pf,
       |                  (500.0 - ${dbl(sc.mu(2))}) / ${dbl(sc.sd(2))} AS pm),
       |probed AS (
       |  SELECT $pds
       |  FROM probe0),
       |probe AS (SELECT ${firstMinSql(cs.length)} AS cluster FROM probed),
       |sz AS (SELECT count(*) AS cluster_size FROM lab JOIN probe USING (cluster)),
       |tot AS (SELECT count(*) AS total FROM lab)
       |SELECT probe.cluster, sz.cluster_size,
       |       round_even(CAST(sz.cluster_size AS DOUBLE)
       |                  / CAST(tot.total AS DOUBLE) * 10000.0, 0) / 100.0
       |         AS cluster_pct
       |FROM probe CROSS JOIN sz CROSS JOIN tot""".stripMargin
  }

  /** q21's oracle — honestly an EXPORT-PATH check, not a fit check: the
    * centroids are the captured constants themselves, so this VALUES-literal
    * query gates the export serialization (row shape, cluster ids, column
    * order, double round-trip through createDataFrame → parquet) rather
    * than the K-Means math. The math is already oracle-verified through
    * q20/q22/q23/q25, which re-derive every read-out FROM these constants
    * against DuckDB's independent arithmetic. */
  private def centroidsSql(cs: Array[Array[Double]]): String = {
    import SqlLit.dbl
    val values = cs.zipWithIndex.map { case (c, i) =>
      s"(CAST($i AS BIGINT), ${dbl(c(0))}, ${dbl(c(1))}, ${dbl(c(2))})"
    }.mkString(", ")
    s"""SELECT * FROM (VALUES $values)
       |  AS t(cluster, recency_z, frequency_z, monetary_z)""".stripMargin
  }

  private def scatterSql(sc: ScalerStats, cs: Array[Array[Double]]): String =
    s"""WITH ${zdCtes(sc, cs)}
       |SELECT custkey, round(frequency_z, 6) AS frequency_z,
       |       round(monetary_z, 6) AS monetary_z,
       |       ${firstMinSql(cs.length)} AS cluster
       |FROM d""".stripMargin

  /** The reference's exact sampled silhouette (`src/model.rs:64-119`) as a
    * self-join CTE over the first min(n,100) custkeys. Every sum — the
    * per-(point, cluster) distance means and the final score sum — folds
    * SEQUENTIALLY in ascending-custkey order via `list_reduce`, the exact
    * order [[silhouetteSampled]]'s Scala loop uses (a 0.0-seeded left fold
    * equals a first-element-seeded one for these operands), so the oracle
    * reproduces the Scala double BIT-FOR-BIT and the result ships unrounded
    * — no engine-order wobble, no midpoint rounding-rule exposure. */
  private def silhouetteSql(sc: ScalerStats, cs: Array[Array[Double]]): String =
    s"""WITH ${zdCtes(sc, cs)},
       |samp AS (
       |  SELECT custkey, recency_z AS rz, frequency_z AS fz, monetary_z AS mz,
       |         ${firstMinSql(cs.length)} AS cluster
       |  FROM d ORDER BY custkey LIMIT 100),
       |pairs AS (
       |  SELECT a.custkey AS ck, a.cluster AS ca, b.cluster AS cb,
       |         b.custkey AS ck_b,
       |         sqrt((a.rz - b.rz) * (a.rz - b.rz) +
       |              (a.fz - b.fz) * (a.fz - b.fz) +
       |              (a.mz - b.mz) * (a.mz - b.mz)) AS dist
       |  FROM samp a JOIN samp b ON a.custkey <> b.custkey),
       |percl AS (SELECT ck, ca, cb,
       |                 list_reduce(list(dist ORDER BY ck_b),
       |                             (x, y) -> x + y) / count(*) AS md
       |          FROM pairs GROUP BY ck, ca, cb),
       |ab AS (SELECT ck,
       |              coalesce(max(CASE WHEN cb = ca THEN md END), 0.0) AS av,
       |              min(CASE WHEN cb <> ca THEN md END) AS bv
       |       FROM percl GROUP BY ck),
       |scores AS (SELECT ck,
       |                  CASE WHEN bv IS NULL THEN 0.0
       |                       WHEN greatest(av, bv) = 0.0 THEN 0.0
       |                       ELSE (bv - av) / greatest(av, bv) END AS s
       |           FROM ab),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM samp)
       |SELECT list_reduce(list(s ORDER BY ck), (x, y) -> x + y) / n
       |         AS silhouette
       |FROM scores CROSS JOIN n GROUP BY n""".stripMargin

  /** Oracle entries for the ML read-outs, buildable once a fit has run this
    * session (Verify runs every query before dumping oracleSql, so the
    * driver's full run always has them; a narrowed run that skipped the ML
    * queries simply omits them — the driver then falls back to the old
    * rows-only check). The contract queries fit with k=4 on the harness's
    * pinned dir — [[graft.OracleCapture]] selects exactly that capture. */
  def oracleEntries: Map[String, String] = captured.get(4) match {
    case None => Map.empty
    case Some((sc, cs)) => Map(
      "q20_cluster_sizes" -> clusterSizesSql(sc, cs),
      "q21_centroids" -> centroidsSql(cs),
      "q22_inertia" -> inertiaSql(sc, cs),
      "q23_predict" -> predictSql(sc, cs),
      "q24_silhouette" -> silhouetteSql(sc, cs),
      "q25_scatter_data" -> scatterSql(sc, cs))
  }
}
