package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-sampling invariants (q47–q49). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("train/val/test split is total, deterministic, and ~75/12.5/12.5") {
    val s1 = Sampling.trainValTestSplit(spark, dir)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == 500) // every doc assigned exactly once
    // md5 nibbles are uniform: expect 375/62.5/62.5 ±5σ (σ≈9.7 for train)
    assert(math.abs(counts("train") - 0.75 * n) < 50)
    assert(math.abs(counts("val") - 0.125 * n) < 40)
    assert(math.abs(counts("test") - 0.125 * n) < 40)
    // rerun → identical assignment (content-addressed, no rand())
    val s2 = Sampling.trainValTestSplit(spark, dir)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("hash sample keeps a stable subset near the nominal rate") {
    val full = Sampling.hashSample(spark, dir, rate = 1.0).count()
    val quarter = Sampling.hashSample(spark, dir, rate = 0.25)
    val tenth = Sampling.hashSample(spark, dir, rate = 0.1)
    assert(full == 500)
    assert(math.abs(quarter.count() - 125) < 45) // ±~4.6σ
    // nested property: lowering the rate only removes rows, never swaps them
    assert(tenth.exceptAll(quarter).isEmpty)
  }

  test("priority sample (q102) is deterministic and weight-biased") {
    val k = 100
    val s1 = Sampling.weightedSample(spark, dir, k).cache()
    try {
      assert(s1.count() == k)
      // rerun → identical sample (content-addressed priorities)
      val s2 = Sampling.weightedSample(spark, dir, k)
      assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
      // inclusion ∝ weight ⇒ the sample's mean weight must sit clearly above
      // the population mean (heavier orders are over-represented)
      val sampleMean = s1.agg(avg("w_cents")).head().getDouble(0)
      val popMean = Tables.orders(spark, dir)
        .agg(avg(round(col("o_totalprice") * 100))).head().getDouble(0)
      assert(sampleMean > popMean * 1.1,
        s"sample mean $sampleMean not above population mean $popMean")
      // keys are sorted ascending and unique per order
      val keys = s1.orderBy("pkey", "o_orderkey").collect().map(_.getLong(2))
      assert(keys.sameElements(keys.sorted))
    } finally s1.unpersist()
  }

  test("E-S weighted reservoir: deterministic, k rows, heavy item always in") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, if (i == 7) 1e9 else 1.0))
      .toDF("id", "w")
    (1L to 5L).foreach { seed =>
      val s = Sampling.weightedReservoir(df, "id", col("w"), k = 10, seed)
        .collect()
      assert(s.length == 10, s"seed $seed")
      assert(s.exists(_.getLong(0) == 7L),
        s"seed $seed: overwhelming weight must be sampled")
      // deterministic per seed
      val again = Sampling.weightedReservoir(df, "id", col("w"), 10, seed)
        .collect()
      assert(s.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
    }
    // zero/negative weights never appear
    val withZero = df.withColumn("w", when(col("id") <= 100, 0.0).otherwise(col("w")))
    val s = Sampling.weightedReservoir(withZero, "id", col("w"), 50, 1L).collect()
    assert(s.forall(_.getLong(0) > 100))
  }

  test("stratified sample: exact budget, Hamilton allocation law, stable") {
    val total = 123L // deliberately not divisible — remainders must spill
    val out = Sampling.stratifiedSample(spark, dir, total).collect()
    assert(out.length == total) // Σ quotas == budget BY CONSTRUCTION
    // allocation law: every stratum within 1 of its exact proportional share
    val ns = Tables.documents(spark, dir).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = ns.values.sum
    val got = out.groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    got.foreach { case (s, q) =>
      val exact = total.toDouble * ns(s) / n
      assert(math.abs(q - exact) < 1.0, s"$s: $q vs $exact")
    }
    // determinism: same sample on a second run
    val again = Sampling.stratifiedSample(spark, dir, total).collect()
      .map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
  }

  test("weighted median: equals the brute-force definition per flag") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "cast(round(l_extendedprice*100) as long) c",
        "cast(round(l_quantity) as long) w").collect()
      .groupBy(_.getString(0))
    val got = graft.operators.Relational.weightedMedian(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (flag, rs) =>
      val sorted = rs.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val tw = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tw }.get._1
      assert(got(flag) == ((med, tw)), s"$flag")
    }
  }

  test("DSIR select replays exactly from first principles") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def buckets(text: String): Seq[String] = {
      val w = text.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => md5hex(p(0) + " " + p(1)).take(2)).toSeq
    }
    val target = "src0"
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ct = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cr = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, src, text) =>
      val h = if (src == target) ct else cr
      buckets(text).foreach(b => h(b) += 1)
    }
    val all = (0 until 256).map(i => f"$i%02x")
    val nt = all.map(ct(_) + 1).sum
    val nr = all.map(cr(_) + 1).sum
    val ratio = all.map(b =>
      b -> (ct(b) + 1) * nr * 1000000L / ((cr(b) + 1) * nt)).toMap
    val scored = docs.filter(_._2 != target).flatMap { case (id, src, text) =>
      val bs = buckets(text)
      if (bs.isEmpty) None else Some((id, src, bs.map(ratio).sum / bs.length))
    }
    val smax = scored.map(_._3).max
    val expected = scored.map { case (id, src, s) =>
      val u32 = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
      (id, src, s, u32 * smax < s * 4294967296L)
    }.toSet
    val got = Sampling.dsirSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == expected)
    // the resample is genuinely selective, and acceptance is score-biased:
    // kept docs must average a higher importance score than the pool
    val kept = got.filter(_._4)
    assert(kept.nonEmpty && kept.size < got.size)
    val keptMean = kept.map(_._3).sum.toDouble / kept.size
    val poolMean = got.map(_._3).sum.toDouble / got.size
    assert(keptMean > poolMean,
      s"kept mean $keptMean not above pool mean $poolMean")
  }

  test("mixture rebalance equalizes language counts at ~min lang size") {
    val docs = Tables.documents(spark, dir)
    val minN = docs.groupBy("lang").count().agg(min("count")).head().getLong(0)
    val balanced = Sampling.mixtureRebalance(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(balanced.size == 5) // no language dropped entirely
    balanced.foreach { case (lang, c) =>
      // binomial(n_lang, min/n_lang) has mean minN; allow ±5σ (σ ≤ ~7 here)
      assert(math.abs(c - minN) < 40, s"$lang: $c vs target $minN")
    }
  }

  test("temperature mixture sits between uniform and natural per language") {
    val natural = Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = natural.values.min
    val temp = Sampling.temperatureMixture(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(temp.keySet == natural.keySet) // no language dropped
    natural.foreach { case (lang, n) =>
      // expectation is sqrt(minN·n): above the uniform target minN (unless
      // this IS the smallest language, where rate = 1 keeps everything),
      // below the natural count; ±5σ binomial slack
      val mean = math.sqrt(minN.toDouble * n)
      val sd = 5 * math.sqrt(mean)
      assert(temp(lang) <= n)
      assert(math.abs(temp(lang) - mean) < sd.max(15),
        s"$lang: ${temp(lang)} vs E=$mean")
      if (n > minN * 2) assert(temp(lang) > minN, s"$lang under uniform")
    }
    // the smallest language survives in full: rate = sqrt(1) = 1
    val smallest = natural.minBy(_._2)._1
    assert(temp(smallest) == natural(smallest))
  }

  test("quality top-p: equals the brute-force nucleus selection per source") {
    val scores = graft.operators.TextAnalysis.linearQualityScore(spark, dir)
      .select(col("doc_id"), col("avg_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).flatMap { case (_, rs) =>
      val tot = rs.map(_._3).sum
      var cum = 0L
      rs.sortBy { case (id, _, _) => (-scores(id), id) }
        .iterator.takeWhile { case (_, _, t) => cum += t; cum * 5 <= tot * 4 }
        .map(_._1)
    }.toSet
    val got = Sampling.qualityTopP(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("mixture plan: exact allocation laws against a driver-side recomputation") {
    val plan = Sampling.mixturePlan(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(plan.keySet == Set("en", "de", "es", "fr", "zh"))
    // recompute availability from the raw documents with q41's definition
    val avail = Tables.documents(spark, dir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("lang").agg(sum("t").as("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = avail.values.sum / 2
    plan.foreach { case (lang, (a, w, target, rate, epochs)) =>
      assert(a == avail(lang), s"$lang availability")
      assert(target == budget * w / 1000000, s"$lang target")
      val eExp = (BigInt(target) * 1000000 / BigInt(a)).toLong
      assert(epochs == eExp, s"$lang epochs $epochs vs $eExp")
      assert(rate == math.min(1000000L, epochs), s"$lang rate")
    }
    // weights are a full distribution; allocation loses < 1 token per lang
    assert(plan.values.map(_._2).sum == 1000000L)
    val planned = plan.values.map(_._3).sum
    assert(planned <= budget && planned >= budget - plan.size)
  }

  test("global shuffle (q138): total, dense per shard, balanced, deterministic") {
    val shards = 8
    val s1 = Sampling.globalShuffleShards(spark, dir, shards).cache()
    try {
      assert(s1.count() == 500) // every doc placed exactly once
      // positions are dense 1..n_s within each shard (a permutation)
      val perShard = s1.groupBy("shard")
        .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("d")).collect()
      assert(perShard.length == shards)
      perShard.foreach { r =>
        val (n, lo, hi, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(lo == 1L && hi == n && d == n, s"shard ${r.get(0)} not dense")
        // mod of a uniform u32: expect 62.5 ±5σ (σ≈7.4)
        assert(math.abs(n - 500.0 / shards) < 40, s"shard ${r.get(0)} unbalanced")
      }
      // position order within a shard is exactly (u32, doc_id) order
      val viol = s1.as("a").join(s1.as("b"),
          col("a.shard") === col("b.shard") && col("a.pos") === col("b.pos") - 1)
        .filter(col("a.u32") > col("b.u32") ||
          (col("a.u32") === col("b.u32") && col("a.doc_id") >= col("b.doc_id")))
        .count()
      assert(viol == 0, "adjacent positions out of (u32, doc_id) order")
      // rerun → identical permutation (content-addressed, retry-safe)
      val s2 = Sampling.globalShuffleShards(spark, dir, shards)
      assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    } finally s1.unpersist()
  }

  test("q262 Neyman sample: replays exactly from first principles — " +
    "exact isqrt weight, Hamilton spill, md5 rank membership, Σ quota = total") {
    import org.apache.spark.sql.functions._
    val total = 200L
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // driver-side exact weights: w_h = isqrt(N_h·Σx² − (Σx)²) via BigInt
    val byStratum = cust.groupBy(_._2).toSeq.sortBy(_._1)
    def isqrt(n: BigInt): Long = {
      if (n == 0) 0L
      else {
        var r = BigInt(math.sqrt(n.toDouble).toLong)
        while (r * r > n) r -= 1
        while ((r + 1) * (r + 1) <= n) r += 1
        r.toLong
      }
    }
    val w = byStratum.map { case (seg, rows) =>
      val nh = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._3)).sum
      val sxx = rows.map(r => BigInt(r._3) * r._3).sum
      seg -> isqrt(nh * sxx - sx * sx)
    }
    val sw = w.map(_._2).sum
    val q0 = w.map { case (seg, wh) => seg -> total * wh / sw }
    val spill = total - q0.map(_._2).sum
    val spillOrder = w.zip(q0).map { case ((seg, wh), (_, q)) =>
      (seg, total * wh - q * sw)
    }.sortBy { case (seg, rem) => (-rem, seg) }.map(_._1)
    val quota = q0.toMap ++ spillOrder.take(spill.toInt)
      .map(seg => seg -> (q0.toMap.apply(seg) + 1))
    // driver-side membership: md5-u32 rank within stratum
    def u32(id: Long): Long =
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).take(8), 16)
    val expected = byStratum.flatMap { case (seg, rows) =>
      rows.map(r => (r._1, u32(r._1))).sortBy { case (id, u) => (u, id) }
        .zipWithIndex.take(quota(seg).toInt)
        .map { case ((id, _), i) =>
          (id, seg, i + 1L, quota(seg), w.toMap.apply(seg)) }
    }.toSet
    val got = Sampling.neymanSample(spark, dir, total).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // Σ quotas == total by construction; the realized sample is capped by
    // each stratum's population (sf0.001's 150 customers < the 200 budget —
    // at any real budget ≪ N the two coincide, as the sf0.01 oracle shows)
    assert(quota.values.sum == total)
    assert(got.size == byStratum.map { case (seg, rows) =>
      math.min(quota(seg), rows.length.toLong) }.sum)
    // the allocation really is σ-sensitive: it diverges from proportional
    val prop = byStratum.map { case (seg, rows) =>
      seg -> total * rows.length / cust.length }.toMap
    assert(quota.exists { case (seg, q) => q != prop(seg) })
  }
}
