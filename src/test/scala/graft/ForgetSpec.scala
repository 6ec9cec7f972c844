package graft

import graft.operators.{Forget, Staging}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The forget-cascade ENTRY POINT's contract (the deleted==rebuilt
  * property per layout is the q306 oracle lane's job): the manifest
  * names every delete-maintained layout, the cascade only touches
  * layouts that exist, and a roster-less source contributes nothing. */
class ForgetSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark

  test("the manifest registers every delete-maintained staged layout " +
    "by source table") {
    val bySource = Forget.manifest.groupBy(_.source)
      .map { case (s, ts) => s -> ts.map(_.layout).toSet }
    assert(bySource("documents") == Set("shingles_k3", "minhash16",
      "simhash", "ngrampairs", "phash_bands"),
      s"documents-derived targets drifted: ${bySource("documents")}")
    assert(bySource("embeddings") == Set("int8codes", "ivf_assign_n16",
      "pqcodes_m8_n16"),
      s"embeddings-derived targets drifted: ${bySource("embeddings")}")
  }

  test("forget() skips layouts never built and sources without a " +
    "roster, and tombstones the ones present") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_forget_spec").toString
    (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      // only ONE documents-derived layout exists in this deployment
      Staging.prepared(spark, "simhash", dir)(
        spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), xxhash64(col("text")).as("simhash")))
      val roster = Seq(3L, 8L).toDF("doc_id")
      val acted = Forget.forget(spark, dir, "t1",
        Map("documents" -> roster))
      assert(acted == Seq("simhash"),
        s"expected only the present layout acted on, got $acted")
      val ids = Staging.readPrepared(spark, dir, "simhash")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == (1L to 20L).toSet -- Set(3L, 8L))
      // embeddings roster absent from the map: ANN targets contribute
      // nothing even if their layouts existed — re-run is idempotent
      assert(Forget.forget(spark, dir, "t1",
        Map("documents" -> roster)) == Seq("simhash"))
    } finally Staging.invalidate(dir)
  }
}
