package graft.operators

import graft.{CacheRegistry, OracleCapture, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed spectral analysis of the embedding table: the top principal
  * component of the 64-dim embedding covariance, computed the way a 100 TB
  * corpus has to compute it — one distributed pass accumulates the exact
  * second-moment matrix as integer partial sums, and only the d×d miniature
  * ever reaches the driver, where power iteration runs in microseconds.
  *
  * ==Why exact integers==
  * A covariance is a cross-row double sum, which a distributed engine
  * reorders freely — the same non-determinism hazard [[SimilaritySearch]]'s
  * centroid math avoids. Every cross-row accumulation here is therefore a
  * LONG sum over `floor(x·10⁴)`-quantized coordinates (addition commutes
  * exactly; partials promoted to DECIMAL(38,0) so no scale overflows), making
  * a 4-thread local run, a 1000-executor run, and the DuckDB oracle agree
  * bit-for-bit on the moment matrix itself.
  *
  * ==Plan shape (the 100 TB story)==
  * Per row, a codegen'd nested `transform` expands the upper triangle of the
  * quantized outer product — d(d+1)/2 = 2080 (idx, product) entries, plus 64
  * first-moment entries and one count entry — and ONE `explode → groupBy(idx)
  * → sum` aggregates them. Hash partial aggregation combines map-side, so
  * each partition contributes at most 2145 rows to the single shuffle no
  * matter how many input rows it holds: wire traffic is O(partitions·d²),
  * never O(rows). That is exactly MLlib's treeAggregate(outer-product) shape,
  * expressed declaratively. The d²-per-row expansion is CPU inside
  * WholeStageCodegen — the scan stays the bottleneck, as it should.
  *
  * ==Cross-engine eigen-gate==
  * Power iteration (3000 rounds, deterministic start 1/√d, sign fixed at the
  * largest-|loading| coordinate) yields the eigenvector, quantized to
  * `vq = round(v·10⁶)`. The gate is NOT an export-path echo: both engines
  * independently rebuild the exact integer covariance
  * `covq = n·s_ij − m_i·m_j` from the raw parquet, independently run the
  * SAME deterministic power iteration (DuckDB in a recursive CTE — see
  * [[pcaTopComponentSql]]; no captured literals), and verify the eigen
  * equation
  * `|Cov·vq − λ·vq| ≤ τ·λ·‖vq‖` componentwise with λ the integer Rayleigh
  * quotient — all products exact in DECIMAL(38,0)/HUGEINT, the final
  * comparison on identical doubles cast from identical integers, so the flag
  * can never wobble between engines. A wrong vector fails by factors of
  * thousands; the captured one passes with ~1e-6 slack against τ = 1e-4.
  *
  * Headroom note: with Q = 10⁴ quantization the exact-integer gate products
  * stay inside 38 digits up to ~10⁶ rows; a larger corpus drops Q (the gate
  * is a harness artifact — the production output is the component itself,
  * whose integer moment accumulation survives any n).
  */
object Spectral {

  private val D = 64
  /** Coordinate quantization: q = floor(x·QScale). */
  private val QScale = 10000.0
  /** Eigenvector quantization: vq = round(v·VScale). */
  private val VScale = 1000000L

  /** (dir, (qScale, vScale)) → session-cached quantized eigenvector (pure
    * fit cache since the round-9 oracle graduation — the oracle re-derives
    * the vector itself; this only keeps Bench resamples from re-fitting). */
  private[graft] val captured =
    new OracleCapture.Captured[(Long, Long), Array[Long]]

  /** The one-pass integer moment table: idx −1 → row count, d²+i → Σ qᵢ,
    * i·d+j (i ≤ j) → Σ qᵢ·qⱼ. Cached — the collect for power iteration and
    * the gate plan both read it. */
  private def momentSums(spark: SparkSession, dir: String): DataFrame =
    CacheRegistry.cached(spark, s"spectral-moments:$dir") {
      val q = Tables.embeddings(spark, dir)
        .select(transform(col("embedding").cast(ArrayType(DoubleType)),
          x => floor(x * lit(QScale)).cast(LongType)).as("q"))
      val pairs = flatten(transform(sequence(lit(0), lit(D - 1)), i =>
        transform(sequence(i, lit(D - 1)), j =>
          struct((i * lit(D) + j).cast(LongType).as("idx"),
            (element_at(col("q"), i + lit(1)) *
              element_at(col("q"), j + lit(1))).as("p")))))
      val moments = transform(sequence(lit(0), lit(D - 1)), i =>
        struct((lit(D * D) + i).cast(LongType).as("idx"),
          element_at(col("q"), i + lit(1)).as("p")))
      val cnt = array(struct(lit(-1L).as("idx"), lit(1L).as("p")))
      q.select(explode(concat(pairs, moments, cnt)).as("e"))
        .select(col("e.idx").as("idx"),
          col("e.p").cast(DecimalType(38, 0)).as("p"))
        .groupBy(col("idx")).agg(sum(col("p")).as("s"))
    }

  /** Driver-side power iteration over the collected d×d miniature; returns
    * the VScale-quantized unit eigenvector. Deterministic: fixed start,
    * fixed 3000 rounds, sequential folds, sign pinned at the first
    * largest-|v| coordinate. */
  private def fitEigvec(spark: SparkSession, dir: String): Array[Long] = {
    val key = (QScale.toLong, VScale)
    // dir-EXACT cache hit only: this is a fit cache, and a vector fitted at
    // another SF fails this dir's eigen gate (the shared-JVM suite caught
    // TypeAuditSpec's sf0.001 fit being served to SpectralSpec's sf0.01 run
    // through the no-pin "most recent" fallback)
    captured.getFor(dir, key) match {
      case Some(v) => return v
      case _ => ()
    }
    val sums = momentSums(spark, dir).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)).toBigInt).toMap
    val n = sums(-1L)
    val m = Array.tabulate(D)(i => sums((D * D + i).toLong))
    val cov = Array.tabulate(D, D) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      (n * sums((a * D + b).toLong) - m(i) * m(j)).toDouble
    }
    var v = Array.fill(D)(1.0 / math.sqrt(D.toDouble))
    var it = 0
    while (it < 3000) {
      val w = Array.tabulate(D) { i =>
        var s = 0.0; var j = 0
        while (j < D) { s += cov(i)(j) * v(j); j += 1 }
        s
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
      it += 1
    }
    val imax = v.indices.maxBy(i => (math.abs(v(i)), -i))
    val sgn = if (v(imax) < 0) -1.0 else 1.0
    val vq = v.map(x => math.round(x * sgn * VScale))
    captured.put(dir, key, vq)
    vq
  }

  /** q233 — top principal component with the integer eigen-gate: one row per
    * dimension `(pos, loading, eig_ok, lambda_e9)`. `loading` is the
    * captured quantized eigenvector; `eig_ok` re-derives the eigen residual
    * from THIS engine's own exact integer covariance (DuckDB does the same
    * from its own scan — see [[pcaTopComponentSql]]); `lambda_e9` is the
    * Rayleigh eigenvalue in raw-coordinate units, floor-quantized at 1e-9 so
    * both engines emit the identical integer. */
  def pcaTopComponent(spark: SparkSession, dir: String): DataFrame =
    gateFrame(spark, dir, fitEigvec(spark, dir))

  /** The integer eigen-gate plan for an arbitrary quantized vector —
    * factored out so the spec can drive it with a WRONG vector and watch
    * the flags flip (the discrimination half of the gate's contract). */
  private[graft] def gateFrame(spark: SparkSession, dir: String,
                               vq: Array[Long]): DataFrame = {
    val v2 = vq.map(x => BigInt(x) * BigInt(x)).sum
    val sums = momentSums(spark, dir)
    val cnt = sums.filter(col("idx") === -1L)
      .select(col("s").as("n"))
    val means = sums.filter(col("idx") >= lit(D * D))
      .select((col("idx") - lit(D * D)).as("i"), col("s").as("m"))
    val upper = sums.filter(col("idx") >= 0L && col("idx") < lit(D * D))
      .select(expr(s"idx div $D").as("i"), (col("idx") % lit(D)).as("j"),
        col("s"))
    val vdf = broadcast(spark.createDataFrame(
      vq.zipWithIndex.map { case (w, j) => (j.toLong, BigDecimal(w)) }.toSeq)
      .toDF("vj", "vq")
      .select(col("vj"), col("vq").cast(DecimalType(9, 0)).as("vq")))
    val cov = upper
      .join(broadcast(means).withColumnRenamed("i", "mi_i")
        .withColumnRenamed("m", "mi"), col("i") === col("mi_i"))
      .join(broadcast(means).withColumnRenamed("i", "mj_i")
        .withColumnRenamed("m", "mj"), col("j") === col("mj_i"))
      .crossJoin(broadcast(cnt))
      .select(col("i"), col("j"),
        (col("n") * col("s") - col("mi") * col("mj")).as("covq"))
    val contrib = cov.join(vdf, col("j") === col("vj"))
      .select(col("i").as("tgt"), (col("covq") * col("vq")).as("t"))
      .unionAll(cov.filter(col("i") =!= col("j"))
        .join(vdf, col("i") === col("vj"))
        .select(col("j").as("tgt"), (col("covq") * col("vq")).as("t")))
    val cvq = contrib.groupBy(col("tgt"))
      .agg(sum(col("t")).as("cvq"))
    val lam = broadcast(cvq.join(vdf, col("tgt") === col("vj"))
      .agg(sum(col("cvq") * col("vq")).as("lamN")))
    cvq.join(vdf, col("tgt") === col("vj"))
      .crossJoin(lam).crossJoin(broadcast(cnt))
      .select(col("tgt").cast(LongType).as("pos"),
        (col("vq").cast(DoubleType) / lit(VScale.toDouble)).as("loading"),
        (abs(col("cvq") * lit(BigDecimal(v2)).cast(DecimalType(38, 0)) -
          col("lamN") * col("vq")).cast(DoubleType) <=
          abs(col("lamN")).cast(DoubleType) * lit(100.0)).as("eig_ok"),
        floor(col("lamN").cast(DoubleType) / lit(v2.toDouble) /
          col("n").cast(DoubleType) / col("n").cast(DoubleType) /
          lit(1.0e8) * lit(1.0e9)).cast(LongType).as("lambda_e9"))
  }

  /** DuckDB gate — fully static (round-9 graduation from captured
    * eigenvector literals): DuckDB independently rebuilds the exact integer
    * covariance from its own scan, runs the SAME 3000-round power iteration
    * as the Spark driver inside a recursive CTE, and then verifies the eigen
    * equation against its own vector. The iteration is bit-exact across
    * engines because every cross-engine double op is correctly-rounded IEEE
    * (·, /, sqrt — no libm) applied in the IDENTICAL order: `list_reduce` is
    * a sequential left fold, matching the driver's ascending-j `while`
    * accumulation and `Array.sum`; the start vector 0.125 is exact; cov
    * entries are exact integers < 2⁵³ cast to double; and the final
    * quantization `floor(x·sgn·10⁶ + 0.5)` reproduces Java `Math.round`.
    * Prototyped against a step-identical reference loop before wiring:
    * all 64 quantized components byte-equal after 3000 rounds. No run-time
    * capture anywhere — the oracle re-derives loading, eig_ok AND lambda
    * from raw parquet alone. */
  def pcaTopComponentSql: String =
    s"""WITH RECURSIVE
       |q AS (
       |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
       |                        x -> CAST(floor(x * 10000.0) AS BIGINT)) AS a
       |  FROM embeddings),
       |pos AS (SELECT unnest(range($D)) AS p),
       |cells AS MATERIALIZED (
       |  SELECT i.p AS i, j.p AS j, sum(a[i.p + 1] * a[j.p + 1]) AS s
       |  FROM q, pos i, pos j WHERE j.p >= i.p GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT i.p AS i, sum(a[i.p + 1]) AS m FROM q, pos i GROUP BY 1),
       |n AS MATERIALIZED (SELECT count(*) AS n FROM q),
       |covl AS MATERIALIZED (
       |  SELECT list(rowl ORDER BY i) AS c FROM (
       |    SELECT i, list(covd ORDER BY j) AS rowl FROM (
       |      SELECT ii.p AS i, jj.p AS j,
       |             CAST(n.n * c.s - mi.m * mj.m AS DOUBLE) AS covd
       |      FROM pos ii, pos jj, n, cells c, m mi, m mj
       |      WHERE c.i = least(ii.p, jj.p) AND c.j = greatest(ii.p, jj.p)
       |        AND mi.i = ii.p AND mj.i = jj.p
       |    ) GROUP BY i
       |  )
       |),
       |it(k, v) AS (
       |  SELECT 0, list_transform(range($D), x -> CAST(0.125 AS DOUBLE))
       |  UNION ALL
       |  SELECT k + 1,
       |         list_transform(w, x -> x / sqrt(
       |           list_reduce(list_transform(w, y -> y*y), (a,b) -> a+b)))
       |  FROM (
       |    SELECT k, list_transform(range($D), i ->
       |             list_reduce(list_transform(range($D),
       |               j -> c[i+1][j+1] * v[j+1]), (a,b) -> a+b)) AS w
       |    FROM it, covl WHERE k < 3000
       |  )
       |),
       |vfin AS MATERIALIZED (SELECT v FROM it WHERE k = 3000),
       |sgn AS (
       |  SELECT CASE WHEN v[jx + 1] < 0 THEN -1.0 ELSE 1.0 END AS s
       |  FROM vfin, (SELECT jj.p AS jx FROM pos jj, vfin
       |              ORDER BY abs(v[jj.p + 1]) DESC, jj.p ASC LIMIT 1)
       |),
       |v AS MATERIALIZED (
       |  SELECT jj.p AS j,
       |         CAST(floor(vfin.v[jj.p + 1] * sgn.s * 1000000.0 + 0.5)
       |              AS BIGINT) AS vq
       |  FROM pos jj, vfin, sgn
       |),
       |v2 AS (SELECT sum(CAST(vq AS HUGEINT) * vq) AS v2 FROM v),
       |cov AS (
       |  SELECT c.i, c.j, n.n * c.s - mi.m * mj.m AS covq
       |  FROM cells c, n
       |  JOIN m mi ON mi.i = c.i JOIN m mj ON mj.i = c.j),
       |contrib AS (
       |  SELECT cov.i AS tgt, CAST(v.vq AS HUGEINT) * cov.covq AS t
       |  FROM cov JOIN v ON v.j = cov.j
       |  UNION ALL
       |  SELECT cov.j, CAST(v.vq AS HUGEINT) * cov.covq
       |  FROM cov JOIN v ON v.j = cov.i WHERE cov.i <> cov.j),
       |cvq AS (SELECT tgt, sum(t) AS cvq FROM contrib GROUP BY tgt),
       |lam AS (SELECT sum(CAST(v.vq AS HUGEINT) * cvq.cvq) AS lamN
       |        FROM cvq JOIN v ON v.j = cvq.tgt)
       |SELECT CAST(cvq.tgt AS BIGINT) AS pos,
       |       CAST(v.vq AS DOUBLE) / 1000000.0 AS loading,
       |       CAST(abs(cvq.cvq * v2.v2 - lam.lamN * v.vq) AS DOUBLE)
       |         <= CAST(abs(lam.lamN) AS DOUBLE) * 100.0 AS eig_ok,
       |       CAST(floor(CAST(lam.lamN AS DOUBLE) / CAST(v2.v2 AS DOUBLE)
       |                  / CAST(n.n AS DOUBLE) / CAST(n.n AS DOUBLE)
       |                  / 1.0e8 * 1.0e9) AS BIGINT) AS lambda_e9
       |FROM cvq JOIN v ON v.j = cvq.tgt, lam, n, v2""".stripMargin
}
