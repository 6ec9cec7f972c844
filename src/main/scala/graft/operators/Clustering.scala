package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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

  private def fitOnDir(spark: SparkSession, dir: String, k: Int = 4): Segmentation =
    fitCache.getOrElseUpdate((spark.sparkContext.applicationId, dir, k),
      fit(Rfm.rfmPrepared(spark, dir), k))

  /** A7 — cluster sizes + percentages (reference `src/model.rs:53-61`,
    * percentages `src/main.rs:125-129`). Seeded → deterministic, but kept
    * out of the DuckDB oracle set (k-means is not SQL-expressible). */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val total = seg.predictions.count().toDouble
    seg.predictions.groupBy(col("prediction").cast(LongType).as("cluster"))
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

  /** A8 — inertia / WCSS (reference `compute_inertia`, `src/model.rs:198-215`;
    * same definition as MLlib's trainingCost). */
  def inertia(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    spark.createDataFrame(Seq(Tuple1(seg.inertia))).toDF("inertia")
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
    val size = seg.predictions.filter(col("prediction") === cluster).count()
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
    seg.predictions.select(col("custkey"),
      round(col("frequency_z"), 6).as("frequency_z"),
      round(col("monetary_z"), 6).as("monetary_z"),
      col("prediction").cast(LongType).as("cluster"))
  }

  /** A10 — the reference's exact sampled silhouette: Euclidean, pairwise
    * within the first min(n,100) rows only, 0 for degenerate points
    * (reference `src/model.rs:64-119`; sample size `src/main.rs:131-133`).
    * "First" rows are made deterministic by custkey order. */
  def silhouetteSampled(predictions: DataFrame, sampleSize: Int = 100): Double = {
    val sample: Array[(Vector, Int)] = predictions
      .orderBy(col("custkey"))
      .select(col("features"), col("prediction"))
      .limit(sampleSize)
      .collect()
      .map(r => (r.getAs[Vector](0), r.getInt(1)))
    val n = sample.length
    if (n < 2) return 0.0
    def dist(a: Vector, b: Vector) = math.sqrt(Vectors.sqdist(a, b))
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
    * printed, never persisted: `src/viz.rs:163-193`). */
  def silhouetteQuery(spark: SparkSession, dir: String): DataFrame = {
    val seg = fitOnDir(spark, dir)
    val s = silhouetteSampled(seg.predictions)
    spark.createDataFrame(Seq(Tuple1(s))).toDF("silhouette")
  }

  /** S6 — console cluster-statistics report (reference
    * `print_cluster_statistics`, `src/viz.rs:163-193`). */
  def clusterReport(seg: Segmentation): String = {
    val sizes = seg.predictions.groupBy("prediction").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble
    val silhouette = silhouetteSampled(seg.predictions)
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
}
