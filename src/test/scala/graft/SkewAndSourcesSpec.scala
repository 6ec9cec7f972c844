package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Salting correctness + the partitioned/bucketed write paths a 100 TB
  * deployment leans on (partition pruning, shuffle-free bucketed reuse). */
class SkewAndSourcesSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  val dir = GraftTestSession.Sf0001

  test("salted aggregate equals plain aggregate") {
    val li = Tables.lineitem(spark, dir)
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAggregate(li,
      key = col("l_returnflag"),
      stable = col("l_orderkey") * 10 + col("l_linenumber"),
      saltBuckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum(col("l_quantity")).as("pq")),
      merge = Seq(sum(col("pn")).as("n"), sum(col("pq")).as("q")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, q)) =>
      assert(n == plain(k)._1)
      assert(math.abs(q - plain(k)._2) < 1e-6)
    }
  }

  test("salt is deterministic (not rand) so task retries cannot double-count") {
    val li = Tables.lineitem(spark, dir).limit(100)
    val s1 = li.select(Skew.salt(col("l_orderkey"), 8)).collect().map(_.getLong(0))
    val s2 = li.select(Skew.salt(col("l_orderkey"), 8)).collect().map(_.getLong(0))
    assert(s1.sameElements(s2))
    assert(s1.forall(s => s >= 0 && s < 8))
  }

  test("partitioned write enables partition pruning on read") {
    val out = Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, dir)
      .withColumn("prio", regexp_replace(col("o_orderpriority"), "[^0-9]", ""))
      .write.mode("overwrite").partitionBy("prio").parquet(out)
    val read = spark.read.parquet(out).filter(col("prio") === "1")
    val plan = read.queryExecution.executedPlan.toString
    // pruned scan: the partition filter appears, and only matching
    // directories are listed
    assert(plan.contains("PartitionFilters"))
    assert(read.count() ==
      Tables.orders(spark, dir)
        .filter(col("o_orderpriority").startsWith("1")).count())
  }

  test("csv and json sinks round-trip the RFM result") {
    val rfm = graft.operators.Rfm.rfmOrders(spark, dir)
    val expected = rfm.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet

    val csvOut = Files.createTempDirectory("graft_csv").toString
    rfm.write.mode("overwrite").option("header", true).csv(csvOut)
    val csvBack = spark.read.option("header", true)
      .schema(rfm.schema).csv(csvOut).collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(csvBack == expected)

    val jsonOut = Files.createTempDirectory("graft_json").toString
    rfm.write.mode("overwrite").json(jsonOut)
    val jsonBack = spark.read.schema(rfm.schema).json(jsonOut).collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(jsonBack == expected)
  }

  test("bucketed table join avoids the exchange on the bucketed key") {
    val s = spark // warehouse dir is a tmp dir set at session creation
    Tables.orders(s, dir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    val b = s.table("orders_bucketed")
    val agg = b.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"bucketed aggregate should not reshuffle:\n${plan.take(800)}")
    assert(agg.count() == Tables.orders(s, dir).select("o_custkey").distinct().count())
  }
}
