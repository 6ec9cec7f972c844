package graft

import graft.operators.Clustering
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY §5: stronger than the reference's
  * invariant-only tests — seeded determinism lets us assert on arbitrary
  * generated inputs). Raw ScalaCheck driver (scalatestplus glue is not in
  * the offline cache); sample counts kept small because each trial runs a
  * full Spark job. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private val rfmRows: Gen[List[(Long, Double, Double, Double)]] = for {
    n <- Gen.choose(8, 40)
    rows <- Gen.listOfN(n, for {
      r <- Gen.choose(0.0, 400.0)
      f <- Gen.choose(1.0, 50.0)
      m <- Gen.choose(1.0, 1e6)
    } yield (r, f, m))
  } yield rows.zipWithIndex.map { case ((r, f, m), i) => (i.toLong, r, f, m) }

  private def check(name: String, prop: Prop, samples: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), prop)
    assert(res.passed, s"$name: $res")
  }

  test("scaler: mean≈0, population σ≈1 on any non-constant input") {
    check("scaler", Prop.forAll(rfmRows) { rows =>
      val df = rows.toDF("custkey", "recency", "frequency", "monetary")
      val (z, stats) = Clustering.standardize(df)
      val vals = z.select("monetary_z").collect().map(_.getDouble(0))
      val mean = vals.sum / vals.length
      val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
      val sdOk = rows.map(_._4).distinct.length <= 1 || math.abs(sd - 1.0) < 1e-6
      math.abs(mean) < 1e-8 && sdOk && stats.sd.forall(_ >= 1e-8)
    }, samples = 8)
  }

  test("kmeans: labels in range, sizes sum to n, inertia finite, silhouette bounded") {
    check("kmeans", Prop.forAll(Gen.choose(3, 5), rfmRows) { (k, rows) =>
      val df = rows.toDF("custkey", "recency", "frequency", "monetary")
      val seg = Clustering.fit(df, k = k, maxIters = 20)
      val labels = seg.predictions.select("prediction").collect().map(_.getInt(0))
      val s = Clustering.silhouetteSampled(Clustering.labeledPredictions(seg), 50)
      labels.length == rows.length &&
        labels.forall(l => l >= 0 && l < k) &&
        seg.inertia >= 0 && java.lang.Double.isFinite(seg.inertia) &&
        s >= -1.0 && s <= 1.0
    }, samples = 5)
  }

  test("first-min argmin: matches Scala minBy on arbitrary distances incl. ties") {
    // the literal-centroid oracles hinge on BOTH engines' argmin CASE
    // picking the FIRST minimal index — pin that law directly on random
    // distance tuples with deliberately planted exact ties
    val dGen = Gen.chooseNum(0, 5).map(_ * 0.25) // coarse grid → frequent ties
    val rows = Gen.listOfN(40, Gen.listOfN(4, dGen))
    check("firstmin", Prop.forAll(rows) { ds =>
      val df = ds.zipWithIndex
        .map { case (d, i) => (i.toLong, d(0), d(1), d(2), d(3)) }
        .toDF("id", "__d0", "__d1", "__d2", "__d3")
      val got = df.select(org.apache.spark.sql.functions.col("id"),
          graft.operators.Clustering.firstMin(4).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ds.zipWithIndex.forall { case (d, i) =>
        got(i.toLong) == d.zipWithIndex.minBy(_._1)._2.toLong
      }
    }, samples = 8)
  }

  test("span scrub laws: conservation, canonical survival, clean corpora " +
    "unchanged, on arbitrary generated corpora") {
    // small vocab → frequent genuine cross-doc k-gram repeats
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val texts = Gen.listOfN(8,
      Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" "))))
    check("spanscrub", Prop.forAllNoShrink(texts) { ts =>
      val k = 3
      val df = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.operators.Dedup.spanScrubOn(df, k).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
      val toks = ts.map(_.split(" ", -1))
      // every doc present; n_tokens faithful; cleaned length reconciles
      // with n_removed; cleaned text is a SUBSEQUENCE of the original
      val laws = ts.indices.forall { i =>
        val (n, rm, cleaned) = out(i.toLong)
        val ct = if (cleaned.isEmpty) Array.empty[String]
                 else cleaned.split(" ", -1)
        def isSubseq(sub: Array[String], sup: Array[String]): Boolean = {
          var j = 0
          sup.foreach { w => if (j < sub.length && sub(j) == w) j += 1 }
          j == sub.length
        }
        n == toks(i).length && ct.length == n - rm && rm >= 0 &&
          isSubseq(ct, toks(i))
      }
      // FULL independent replay of the removal semantics: covered = union
      // of [p, p+k) over every NON-canonical occurrence of a cross-doc
      // duplicated gram (canonical = global (doc, pos) min). NOTE the
      // canonical occurrence itself is NOT guaranteed to survive intact —
      // a different dup gram's scrub may overlap it — so the law is the
      // removal-set equality, not "canonical text still present".
      def grams(ws: Array[String]) =
        if (ws.length < k) Seq.empty
        else (0 to ws.length - k).map(p => (p, ws.slice(p, p + k).mkString(" ")))
      val occ = toks.zipWithIndex.flatMap { case (ws, i) =>
        grams(ws).map { case (p, g) => (g, i, p) }
      }
      val dupGrams = occ.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.length >= 2).keySet
      val canonical = occ.filter(o => dupGrams(o._1)).groupBy(_._1)
        .view.mapValues(os => os.map(o => (o._2, o._3)).min).toMap
      val covered: Map[Int, Set[Int]] = occ
        .filter(o => dupGrams(o._1) && (o._2, o._3) != canonical(o._1))
        .flatMap { case (_, i, p) => (p until p + k).map(i -> _) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val replay = ts.indices.forall { i =>
        val cov = covered.getOrElse(i, Set.empty)
        val expected = toks(i).indices.filterNot(cov)
          .map(toks(i)).mkString(" ")
        out(i.toLong)._3 == expected && out(i.toLong)._2 == cov.size
      }
      laws && replay
    }, samples = 8)
  }

  test("rolling hash: always in [0, 2^31-1) for arbitrary text") {
    val texts = Gen.listOfN(30,
      Gen.listOf(Gen.oneOf("spark", "data", "a", "the", "join", "über", "文"))
        .map(_.mkString(" ")))
    check("rolling", Prop.forAll(texts) { ts =>
      val df = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      df.createOrReplaceTempView("documents_prop")
      val withHash = graft.operators.TextAnalysis
        .fingerprintOn(df)
        .select("rolling_hash").collect().map(_.getLong(0))
      withHash.forall(h => h >= 0 && h < 2147483647L)
    }, samples = 10)
  }
}
