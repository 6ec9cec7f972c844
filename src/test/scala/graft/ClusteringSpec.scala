package graft

import graft.operators.{Clustering, Rfm}
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's model fixtures and invariants
  * (reference `src/model.rs:233-310`, `tests/integration.rs:46-148`). */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark

  private lazy val rfm = Rfm.rfmOrders(spark, GraftTestSession.Sf0001).cache()
  private lazy val seg = Clustering.fit(rfm, k = 4)

  test("k out of range rejected (reference src/model.rs:138-143)") {
    assertThrows[IllegalArgumentException](Clustering.validateK(2, 100))
    assertThrows[IllegalArgumentException](Clustering.validateK(6, 100))
    Clustering.validateK(3, 3); Clustering.validateK(5, 100)
  }

  test("n >= k guard (reference src/model.rs:145-150)") {
    assertThrows[IllegalArgumentException](Clustering.validateK(4, 3))
  }

  test("labels in [0,k), sizes sum to n (reference tests/integration.rs:53-76)") {
    val labels = seg.predictions.select("prediction").collect().map(_.getInt(0))
    assert(labels.forall(l => l >= 0 && l < 4))
    assert(labels.length == rfm.count())
    val sizes = labels.groupBy(identity).values.map(_.length)
    assert(sizes.sum == labels.length)
  }

  test("inertia finite and non-negative (reference tests/integration.rs:135-148)") {
    assert(seg.inertia >= 0 && java.lang.Double.isFinite(seg.inertia))
  }

  test("centroid shape k x 3 (reference src/model.rs:276-287)") {
    assert(seg.model.clusterCenters.length == 4)
    assert(seg.model.clusterCenters.forall(_.size == 3))
  }

  test("standardized features have mean~0 and population std~1 (reference src/data.rs:284-295)") {
    val (features, _) = Clustering.standardize(rfm)
    Seq("recency_z", "frequency_z", "monetary_z").foreach { c =>
      val vals = features.select(c).collect().map(_.getDouble(0))
      val mean = vals.sum / vals.length
      val varP = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
      assert(math.abs(mean) < 1e-10, s"$c mean $mean")
      assert(math.abs(math.sqrt(varP) - 1.0) < 1e-9, s"$c std")
    }
  }

  test("predict: scaled by training scaler then argmin; arity checked (reference src/model.rs:26-50)") {
    val cluster = Clustering.predictCluster(seg, Array(30.0, 10.0, 500.0))
    assert(cluster >= 0 && cluster < 4)
    assertThrows[IllegalArgumentException](
      Clustering.predictCluster(seg, Array(1.0, 2.0)))
  }

  test("predict agrees with MLlib transform on training rows") {
    val sample = seg.predictions
      .select("features", "prediction").limit(20).collect()
    sample.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector](0)
      assert(Clustering.predictScaled(seg.model, v) == r.getInt(1))
    }
  }

  test("silhouette in [-1, 1] (reference src/model.rs:64-119)") {
    val s = Clustering.silhouetteSampled(Clustering.labeledPredictions(seg))
    assert(s >= -1.0 && s <= 1.0)
  }

  test("explicit literal-centroid argmin equals MLlib transform on EVERY row") {
    // the oracle-gated read-outs label via the reference's exact-euclidean
    // first-min argmin (src/model.rs:26-50); MLlib's findClosest is a
    // bound-pruned variant of the same argmin — pin them equal over the
    // full table so a divergence (a genuine near-tie) would surface here
    // rather than as an unexplained oracle mismatch
    val rows = Clustering.labeledPredictions(seg)
      .select("prediction", "cluster").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0).toLong == r.getLong(1)))
  }

  test("distributed decimal-sum inertia equals sequential recompute and tracks trainingCost") {
    val lab = Clustering.labeledPredictions(seg)
    val centers = seg.model.clusterCenters.map(_.toArray)
    // sequential driver-side recompute of Σ round(min_c d², 6)
    val expected = lab
      .select("recency_z", "frequency_z", "monetary_z").collect()
      .map { r =>
        val p = Array(r.getDouble(0), r.getDouble(1), r.getDouble(2))
        val dmin = centers.map { c =>
          val dr = p(0) - c(0); val df = p(1) - c(1); val dm = p(2) - c(2)
          dr * dr + df * df + dm * dm
        }.min
        BigDecimal(java.math.BigDecimal.valueOf(dmin)
          .setScale(6, java.math.RoundingMode.HALF_UP))
      }.sum
    val got = Clustering.inertia(spark, GraftTestSession.Sf0001)
      .head().getDouble(0)
    assert(math.abs(got - expected.toDouble) < 1e-9,
      s"decimal inertia $got vs sequential $expected")
    // and the explicit post-fit inertia is the converged trainingCost
    assert(math.abs(got - seg.inertia) / seg.inertia < 1e-2,
      s"explicit $got vs trainingCost ${seg.inertia}")
  }

  test("seeded fit is deterministic across invocations") {
    val seg2 = Clustering.fit(rfm, k = 4)
    assert(seg2.inertia == seg.inertia)
    assert(seg2.model.clusterCenters.map(_.toArray.toSeq).toSeq ==
      seg.model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  test("cluster report prints sizes, inertia, silhouette, centroids (reference src/viz.rs:163-193)") {
    val report = Clustering.clusterReport(seg)
    assert(report.contains("Number of clusters: 4"))
    assert(report.contains("Inertia"))
    assert(report.contains("Silhouette"))
    assert(report.contains("Centroid 3"))
  }
}
