package graft.operators

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Supervised feature engineering over the star schema — the encoding
  * steps that sit between raw tables and a training matrix.
  */
object Features {

  /** q144 — out-of-fold smoothed target encoding of `p_brand` against the
    * lineitem revenue target: for every (brand, fold) the mean target of
    * that brand computed EXCLUDING the fold's own rows, shrunk toward the
    * (equally out-of-fold) global prior with additive smoothing `m`:
    *
    *   enc(k, f) = (S_k − S_kf + m · prior_f) / (N_k − N_kf + m),
    *   prior_f   = (S − S_f) / (N − N_f)
    *
    * This is THE standard leakage-safe categorical encoder (plain target
    * encoding leaks the row's own label into its feature; out-of-fold
    * breaks that circularity), with folds assigned by the portable md5
    * discipline (q47) on `l_orderkey` so assignment is reproducible on
    * any engine and stable under reshuffling.
    *
    * Scale shape: ONE hash aggregate over row volume — `groupBy(brand,
    * fold)` with map-side partials on a broadcast-joined brand (the
    * dimension never shuffles the fact side) — and everything after runs
    * on the |brands|×|folds| miniature: brand totals, fold totals and the
    * grand total are re-aggregations OF THE CELL TABLE, joined back
    * broadcast. The subtraction trick (out-of-fold = total − own fold)
    * avoids the |folds|² "sum the other folds" self-join entirely.
    * Money sums ride the exact cents path ([[Rfm.cents]]) so no
    * order-dependent double accumulation exists anywhere; the only double
    * math is the final ratio, identical expression-for-expression in the
    * oracle. */
  def targetEncoding(spark: SparkSession, dir: String,
                     m: Double = 20.0, nFolds: Int = 4): DataFrame = {
    val fold = (conv(substring(md5(col("l_orderkey").cast(StringType)), 1, 1),
      16, 10).cast(IntegerType) % nFolds).as("fold")
    val fact = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select(col("p_partkey"),
        col("p_brand"))), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), fold,
        Rfm.cents(col("l_extendedprice")).as("t_c"))
    val cells = fact.groupBy(col("p_brand"), col("fold"))
      .agg(count(lit(1)).as("n_kf"), sum(col("t_c")).as("s_kf"))
    val brands = cells.groupBy(col("p_brand"))
      .agg(sum(col("n_kf")).as("n_k"), sum(col("s_kf")).as("s_k"))
    val folds = cells.groupBy(col("fold"))
      .agg(sum(col("n_kf")).as("n_f"), sum(col("s_kf")).as("s_f"))
    val total = cells.agg(sum(col("n_kf")).as("n"), sum(col("s_kf")).as("s"))
    val prior = (col("s") - col("s_f")).cast(DoubleType) /
      (col("n") - col("n_f")).cast(DoubleType)
    cells.join(brands, Seq("p_brand")).join(broadcast(folds), Seq("fold"))
      .crossJoin(broadcast(total))
      .select(col("p_brand"), col("fold").cast(LongType).as("fold"),
        (col("n_k") - col("n_kf")).as("n_oof"),
        round(((col("s_k") - col("s_kf")).cast(DoubleType) +
          lit(m) * prior) /
          ((col("n_k") - col("n_kf")).cast(DoubleType) + lit(m)) / 100.0, 6)
          .as("enc"))
  }

  def targetEncodingSql(m: Double = 20.0, nFolds: Int = 4): String =
    s"""WITH fact AS (
       |  SELECT p_brand,
       |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1))
       |              ::BIGINT % $nFolds AS INTEGER) AS fold,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS t_c
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |), cells AS (
       |  SELECT p_brand, fold, count(*) AS n_kf, sum(t_c) AS s_kf
       |  FROM fact GROUP BY 1, 2
       |), brands AS (
       |  SELECT p_brand, sum(n_kf) AS n_k, sum(s_kf) AS s_k
       |  FROM cells GROUP BY p_brand
       |), folds AS (
       |  SELECT fold, sum(n_kf) AS n_f, sum(s_kf) AS s_f
       |  FROM cells GROUP BY fold
       |), total AS (SELECT sum(n_kf) AS n, sum(s_kf) AS s FROM cells)
       |SELECT c.p_brand, CAST(c.fold AS BIGINT) AS fold,
       |       CAST(b.n_k - c.n_kf AS BIGINT) AS n_oof,
       |       round((CAST(b.s_k - c.s_kf AS DOUBLE) +
       |              $m * (CAST(t.s - f.s_f AS DOUBLE)
       |                    / CAST(t.n - f.n_f AS DOUBLE)))
       |             / (CAST(b.n_k - c.n_kf AS DOUBLE) + $m) / 100.0, 6)
       |         AS enc
       |FROM cells c
       |JOIN brands b ON c.p_brand = b.p_brand
       |JOIN folds f ON c.fold = f.fold
       |CROSS JOIN total t""".stripMargin
}
