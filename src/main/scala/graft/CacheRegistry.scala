package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped keyed cache for prepared intermediate frames (normalized
  * embeddings, shingle index, text-stat projections, coarse-quantizer
  * assignments).
  *
  * Why this exists: several operators reference the same expensive derived
  * frame (e.g. the L2-normalized embedding table) and Catalyst performs no
  * common-subexpression elimination across `Project`s — every reference
  * re-inlines the full lineage. A `.cache()` barrier fixes that WITHIN one
  * query, but a per-call `.cache()` creates a NEW cached plan per
  * invocation: repeated calls (Verify runs every contract query, Bench runs each
  * twice) accumulate orphaned cache entries for the life of the session.
  *
  * The registry gives each derived frame ONE cached instance per
  * (application, logical key): first caller pays materialization, every
  * later query — including a different query reusing the same preparation —
  * hits the same cached plan. At production scale the equivalent artifact is
  * a persisted "prepared" table (the normalized-vectors parquet, the shingle
  * index); session caching is the local-mode stand-in with the same
  * dataflow shape.
  */
object CacheRegistry {

  private val frames =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Get-or-build the cached frame for `key`. `build` runs at most once per
    * (appId, key); the result is `.cache()`d (lazy — materialized by the
    * first action that touches it). Entries belonging to STOPPED sessions
    * are purged on every call — a JVM that runs several sessions back to
    * back (sequential test suites, repeated CLI invocations under one sbt)
    * must not pin dead-session plans for its lifetime. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    frames.filterInPlace { case (_, df) =>
      !df.sparkSession.sparkContext.isStopped // dead entries just drop; their
      // cached blocks died with the session's executors already
    }
    val k = (spark.sparkContext.applicationId, key)
    frames.get(k).getOrElse {
      // Two racing threads may both evaluate `build`; putIfAbsent keeps one
      // winner in the map. The loser must NOT unpersist: builds for a key
      // are deterministic, so both cache() calls hit the SAME canonicalized
      // plan — CacheManager dedupes the second into a no-op, and an
      // unpersist here would uncache the winner's (shared) entry, leaving
      // the registry handing out a permanently-uncached frame. For the same
      // reason the loser's build leaves no orphan to clean up.
      val candidate = build.cache()
      frames.putIfAbsent(k, candidate).getOrElse(candidate)
    }
  }

  /** Drop and unpersist every frame registered by `spark`'s application —
    * test/benchmark hygiene for long-lived sessions. */
  def clear(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    frames.keys.filter(_._1 == appId).foreach { k =>
      frames.remove(k).foreach(_.unpersist())
    }
  }
}
