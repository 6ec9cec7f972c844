package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  val dir = GraftTestSession.Sf0001

  test("stub codec: histogram normalized, deterministic") {
    val row = Multimodal.MediaRow(1L, "hello world".getBytes("UTF-8"),
      Multimodal.MediaMeta("image", 128, 128, 0, 11))
    val out = Multimodal.StubCodec.decodeBatch(Iterator(row)).toSeq
    assert(out.length == 1)
    assert(math.abs(out.head.features.sum - 1.0f) < 1e-5)
    val again = Multimodal.StubCodec.decodeBatch(Iterator(row)).toSeq
    assert(out.head.features.toSeq == again.head.features.toSeq)
  }

  test("extractFeatures: one output row per media row, distributed") {
    val n = Multimodal.mediaTable(spark, dir).count()
    val feats = Multimodal.extractFeatures(spark, dir, targetPartitions = 4)
    assert(feats.count() == n)
    assert(feats.select("media_id").distinct().count() == n)
  }

  test("metadata pruning query never reads payload") {
    val plan = Multimodal.wideImages(spark, dir).queryExecution
      .executedPlan.toString
    assert(!plan.contains("payload"), "payload column should be pruned from scan")
  }

  test("frame sampling: stride-4 counts follow byte length") {
    val media = Multimodal.mediaTable(spark, dir)
      .select(col("media_id"), col("meta.nBytes").as("nb"),
        col("meta.kind").as("kind"))
      .filter(col("kind") === "video")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Multimodal.frameSample(spark, dir).collect().foreach { r =>
      val nb = media(r.getLong(0))
      val blocks = math.max(nb / 64, 1)
      val expected = (blocks + 3) / 4 // ceil(blocks/stride)
      assert(r.getInt(1) == expected.toInt,
        s"media ${r.getLong(0)}: $nb bytes -> got ${r.getInt(1)}, want $expected")
    }
  }
}
