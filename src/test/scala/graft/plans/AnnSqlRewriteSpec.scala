package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.In
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expr.{DotProduct, L2SqDistance}
import graft.index.Ivf

/** [[AnnTopKRewrite]]: the declarative-ANN planner rule. Proves
  *  - the rewrite fires only for a configured store and the right
  *    metric/direction pairing;
  *  - the injected probe filter reaches the file scan as a PARTITION
  *    filter (pruning, not a row filter over a full read);
  *  - rewritten results are exactly the imperative IVF search at the
  *    same nprobe ([[Ivf.probes]] contract), and exact (= brute force)
  *    at probe-all width;
  *  - idempotence under the fixed-point optimizer batch.
  */
class AnnSqlRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val nVec = 400
  private val nlist = 10

  private lazy val (storePath, centsPath) = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annsql-").toString
    // deterministic corpus: clustered enough that nprobe<nlist is a real
    // restriction (results differ from exact) — group g centered at
    // 10*g along axis g%dim
    val rows = (0 until nVec).map { i =>
      val g = i % nlist
      val v = Array.tabulate(dim)(j =>
        (if (j == g % dim) 10.0 * (g + 1) else 0.0) + (i % 7) * 0.25 +
          j * 0.01 * (i % 3))
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = rows.filter(_._1 % (nVec / nlist) == 0)
      .map { case (id, v) => (id, v) }
      .toDF("cid", "cv")
    val assigned = Ivf.assign(df, cents)
    assigned.select("vec_id", "embedding", "centroid_id")
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id").parquet(s"$base/store")
    cents.write.parquet(s"$base/cents")
    (s"$base/store", s"$base/cents")
  }

  private def store: DataFrame = spark.read.parquet(storePath)

  private def qv: Array[Double] = {
    // close to group 3's center: probing must pick its list first
    Array.tabulate(dim)(j => if (j == 3) 35.0 else 0.3)
  }

  private def scoreCol(q: Array[Double]) =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(col("embedding")),
      GraftBridge.expression(lit(q))))

  private def topk(q: Array[Double], k: Int): DataFrame =
    store.select(col("vec_id"), scoreCol(q).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)

  private def configure(nprobe: Int): Unit = {
    GraftAnn.install(spark)
    GraftAnn.configure(spark, storePath, centsPath, nprobe)
  }

  private def deconfigure(): Unit = {
    spark.conf.unset(AnnTopKRewrite.STORE_PATH_KEY)
    spark.conf.unset(AnnTopKRewrite.CENTROIDS_KEY)
    spark.conf.unset(AnnTopKRewrite.NPROBE_KEY)
    spark.conf.unset(AnnTopKRewrite.STORES_KEY)
  }

  override def afterAll(): Unit = {
    deconfigure()
    super.afterAll()
  }

  private def probeFilters(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metadata.getOrElse("PartitionFilters", "")
    }.filter(_.contains("centroid_id"))

  private def injectedInFilter(df: DataFrame): Seq[Filter] =
    df.queryExecution.optimizedPlan.collect {
      case f @ Filter(In(a, _), _) if a.references.nonEmpty &&
        a.references.head.name == "centroid_id" => f
    }

  /** The imperative twin at the same nprobe: probe via [[Ivf.probes]]'s
    * exact contract, brute-force inside the probed lists.
    */
  private def imperative(q: Array[Double], nprobe: Int,
      k: Int): Seq[(Long, Double)] = {
    val cents = spark.read.parquet(centsPath)
    val probes = Ivf.probes(
      Seq((0L, q)).toDF("query_id", "qv"), cents, nprobe)
      .select("centroid_id").as[Long].collect().toSet
    store.filter(col("centroid_id").isin(probes.toSeq: _*))
      .select(col("vec_id"), scoreCol(q).as("score"))
      .as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(k).toSeq
  }

  test("configured store + dot desc: probe filter is injected and reaches the scan as a partition filter") {
    try {
      configure(nprobe = 2)
      val df = topk(qv, 5)
      assert(injectedInFilter(df).nonEmpty,
        s"no In(centroid_id) filter in:\n${df.queryExecution.optimizedPlan}")
      val pf = probeFilters(df)
      assert(pf.nonEmpty && pf.head.contains("centroid_id"),
        s"probe filter did not become a partition filter:\n" +
          df.queryExecution.executedPlan.toString)
      // 2 of 10 lists probed: the scan must read strictly fewer partitions
      val scanned = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metadata.getOrElse("Location", "")
      }
      assert(scanned.nonEmpty)
    } finally deconfigure()
  }

  test("rewritten result equals the imperative IVF search at the same nprobe") {
    try {
      for (np <- Seq(1, 2, 4)) {
        configure(np)
        val got = topk(qv, 5).as[(Long, Double)].collect().toSeq
        val want = imperative(qv, np, 5)
        assert(got === want, s"nprobe=$np")
      }
    } finally deconfigure()
  }

  test("probe-all width rewrites the plan but stays exact") {
    try {
      // exact baseline measured UNCONFIGURED (no rewrite anywhere)
      deconfigure()
      val exact = topk(qv, 10).as[(Long, Double)].collect().toSeq
      configure(nprobe = nlist)
      val df = topk(qv, 10)
      assert(injectedInFilter(df).nonEmpty, "rewrite must still fire")
      assert(df.as[(Long, Double)].collect().toSeq === exact)
    } finally deconfigure()
  }

  test("nprobe < nlist is genuinely approximate on this fixture (pruning is real)") {
    try {
      deconfigure()
      val exact = topk(Array.tabulate(dim)(_ => 1.0), 20)
        .as[(Long, Double)].collect().toSeq
      configure(nprobe = 1)
      val approx = topk(Array.tabulate(dim)(_ => 1.0), 20)
        .as[(Long, Double)].collect().toSeq
      assert(approx !== exact,
        "nprobe=1 returned the exact result — the filter pruned nothing")
    } finally deconfigure()
  }

  test("unconfigured session leaves the plan untouched") {
    deconfigure()
    assert(injectedInFilter(topk(qv, 5)).isEmpty)
  }

  test("wrong direction (dot ASC) is left untouched") {
    try {
      configure(nprobe = 2)
      val df = store.select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").asc).limit(5)
      assert(injectedInFilter(df).isEmpty)
    } finally deconfigure()
  }

  test("l2 ascending rewrites; l2 descending does not") {
    try {
      configure(nprobe = 2)
      def l2Col = GraftBridge.column(L2SqDistance(
        GraftBridge.expression(col("embedding")),
        GraftBridge.expression(lit(qv))))
      val asc = store.select(col("vec_id"), l2Col.as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(5)
      assert(injectedInFilter(asc).nonEmpty)
      val desc = store.select(col("vec_id"), l2Col.as("d"))
        .orderBy(col("d").desc).limit(5)
      assert(injectedInFilter(desc).isEmpty)
    } finally deconfigure()
  }

  test("pure-SQL surface: ORDER BY graft_dot(...) DESC LIMIT k over a temp view rewrites and matches the DataFrame path") {
    try {
      graft.GraftFunctions.register(spark)
      configure(nprobe = 3)
      store.createOrReplaceTempView("ann_store_v")
      val arr = qv.map(d => s"${d}D").mkString("array(", ", ", ")")
      val sqlDf = spark.sql(
        s"""SELECT vec_id, graft_dot(embedding, $arr) AS score
           |FROM ann_store_v
           |ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin)
      assert(injectedInFilter(sqlDf).nonEmpty,
        s"SQL plan not rewritten:\n${sqlDf.queryExecution.optimizedPlan}")
      val got = sqlDf.as[(Long, Double)].collect().toSeq
      assert(got === imperative(qv, 3, 5))
    } finally deconfigure()
  }

  test("user predicate composes: probe partition filter and pushed data filter reach the same scan") {
    try {
      configure(nprobe = 3)
      val df = store.filter(col("vec_id") > 100)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      assert(injectedInFilter(df).nonEmpty)
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metadata
      }
      assert(scans.exists(m =>
        m.getOrElse("PartitionFilters", "").contains("centroid_id") &&
          m.getOrElse("PushedFilters", "").contains("vec_id")),
        scans.mkString("\n"))
      // values: the imperative probed search with the same predicate
      val cents = spark.read.parquet(centsPath)
      val probes = Ivf.probes(
        Seq((0L, qv)).toDF("query_id", "qv"), cents, 3)
        .select("centroid_id").as[Long].collect().toSet
      val want = store
        .filter(col("centroid_id").isin(probes.toSeq: _*) &&
          col("vec_id") > 100)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .as[(Long, Double)].collect()
        .sortBy { case (id, s) => (-s, id) }.take(5).toSeq
      assert(df.as[(Long, Double)].collect().toSeq === want)
    } finally deconfigure()
  }

  test("idempotent under repeated application (fixed-point safety)") {
    try {
      configure(nprobe = 2)
      val df = topk(qv, 5)
      val once = df.queryExecution.optimizedPlan
      val rule = AnnTopKRewrite(spark)
      val twice = rule(rule(once))
      val filters = twice.collect {
        case f @ Filter(In(a, _), _)
            if a.references.head.name == "centroid_id" => f
      }
      assert(filters.length === 1, s"stacked probe filters:\n$twice")
    } finally deconfigure()
  }

  test("a sibling path that merely string-prefixes the store is NOT rewritten") {
    try {
      configure(nprobe = 2)
      val sib = storePath + "_backup"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(sib)))
        store.limit(50).write.parquet(sib)
      val df = spark.read.parquet(sib)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      assert(injectedInFilter(df).isEmpty,
        s"sibling dataset rewritten with the registered store's probes:\n" +
          df.queryExecution.optimizedPlan)
    } finally deconfigure()
  }

  test("a user predicate on centroid_id (any shape) disables the rewrite instead of stacking") {
    try {
      configure(nprobe = 2)
      // EqualTo — the shape OptimizeIn also produces from 1-element In
      val df = store.filter(col("centroid_id") === 0)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      assert(injectedInFilter(df).isEmpty,
        s"probe set stacked over the user's list restriction:\n" +
          df.queryExecution.optimizedPlan)
      // the user's own restriction is the exact semantics
      val want = store.filter(col("centroid_id") === 0)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .as[(Long, Double)].collect()
        .sortBy { case (id, sc) => (-sc, id) }.take(5).toSeq
      assert(df.as[(Long, Double)].collect().toSeq === want)
    } finally deconfigure()
  }

  test("per-store bindings: two stores keep their own probe widths") {
    try {
      // second store: same data, different path and nprobe
      val base2 = java.nio.file.Files
        .createTempDirectory("graft-annsql2-").toString
      spark.read.parquet(storePath)
        .write.partitionBy("centroid_id").parquet(s"$base2/store")
      spark.read.parquet(centsPath).write.parquet(s"$base2/cents")
      GraftAnn.install(spark)
      GraftAnn.configure(spark, storePath, centsPath, nprobe = 1)
      GraftAnn.configure(spark, s"$base2/store", s"$base2/cents",
        nprobe = nlist) // probe-all
      def filterWidth(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case Filter(In(a, vs), _)
              if a.references.head.name == "centroid_id" => vs.length
        }.headOption.getOrElse(-1)
      val d1 = topk(qv, 5) // store 1, registered at nprobe=1
      val d2 = spark.read.parquet(s"$base2/store")
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      assert(filterWidth(d1) === 1, "store 1 must probe exactly 1 list")
      assert(filterWidth(d2) === nlist, "store 2 must probe all lists")
      // and the bindings don't interfere with values: probe-all = exact
      deconfigure()
      val exact = topk(qv, 5).as[(Long, Double)].collect().toSeq
      GraftAnn.configure(spark, s"$base2/store", s"$base2/cents", nlist)
      assert(d2.as[(Long, Double)].collect().toSeq === exact)
    } finally deconfigure()
  }

  test("a RENAMED centroid_id restriction disables the rewrite (exprId lineage, not name)") {
    try {
      configure(nprobe = 2)
      // the raw analyzed plan keeps the rename Project + Filter intact
      // (the optimizer would push the predicate through the alias, but
      // under config-time injection the rule can meet this exact shape
      // mid-fixed-point) — the guard must resolve the filter through
      // the alias and decline
      val renamed = store.withColumnRenamed("centroid_id", "list_id")
        .filter(col("list_id") === 0)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      val rule = AnnTopKRewrite(spark)
      val applied = rule(renamed.queryExecution.analyzed)
      val injected = applied.collect {
        case f @ Filter(In(_, _), _) if f.condition.references
          .exists(_.name == "centroid_id") => f
      }
      assert(injected.isEmpty,
        s"probe set injected beneath a renamed centroid_id restriction:\n$applied")
      // and end-to-end values are the user's own restriction exactly
      val want = store.filter(col("centroid_id") === 0)
        .select(col("vec_id"), scoreCol(qv).as("score"))
        .as[(Long, Double)].collect()
        .sortBy { case (id, sc) => (-sc, id) }.take(5).toSeq
      assert(renamed.as[(Long, Double)].collect().toSeq === want)
    } finally deconfigure()
  }

  test("deregister invalidates cached centroids: retrain-in-place then re-register serves the NEW layout") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annreg-").toString
    try {
      // store copy with its own centroids path we can overwrite
      spark.read.parquet(storePath)
        .write.partitionBy("centroid_id").parquet(s"$base/store")
      spark.read.parquet(centsPath).write.parquet(s"$base/cents")
      GraftAnn.install(spark)
      GraftAnn.configure(spark, s"$base/store", s"$base/cents", 2)
      def probedLists(): Set[Any] = {
        val df = spark.read.parquet(s"$base/store")
          .select(col("vec_id"), scoreCol(qv).as("score"))
          .orderBy(col("score").desc, col("vec_id").asc).limit(5)
        df.queryExecution.optimizedPlan.collect {
          case Filter(In(_, vs), _) => vs.map(_.eval())
        }.headOption.getOrElse(Nil).toSet
      }
      val before = probedLists()
      assert(before.nonEmpty, "rewrite must fire before the retrain")
      // deregister, RETRAIN IN PLACE (shift-permute the layout: cid i
      // keeps its label but takes the NEXT cid's vector — a 2-element
      // probe set can never be invariant under a cyclic shift, so the
      // probed cids MUST change), re-register — the optimizer must
      // probe with the new layout without any manual
      // AnnTopKRewrite.invalidate call
      GraftAnn.deregister(spark, s"$base/store")
      val old = spark.read.parquet(centsPath)
        .select(col("cid").cast("long"), col("cv"))
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      val shifted = old.indices.map(i =>
        (old(i)._1, old((i + 1) % old.length)._2))
      shifted.toDF("cid", "cv")
        .write.mode("overwrite").parquet(s"$base/cents")
      GraftAnn.configure(spark, s"$base/store", s"$base/cents", 2)
      val after = probedLists()
      assert(after.nonEmpty, "rewrite must fire after re-register")
      assert(after !== before,
        s"stale centroid cache served the OLD layout: $after")
    } finally {
      GraftAnn.deregister(spark, s"$base/store")
      deconfigure()
    }
  }

  test("centroid cache is bounded (LRU, never exceeds the cap)") {
    AnnTopKRewrite.invalidateAll()
    val base = java.nio.file.Files
      .createTempDirectory("graft-annlru-").toString
    val n = AnnTopKRewrite.CentroidCacheMax + 3
    (0 until n).foreach { i =>
      spark.read.parquet(centsPath).write.parquet(s"$base/c$i")
      AnnTopKRewrite.loadCentroids(spark, s"$base/c$i")
    }
    assert(AnnTopKRewrite.cachedCentroidPaths.size
      <= AnnTopKRewrite.CentroidCacheMax)
    // most-recently-used survives; the eldest was evicted
    assert(AnnTopKRewrite.cachedCentroidPaths.contains(s"$base/c${n - 1}"))
    assert(!AnnTopKRewrite.cachedCentroidPaths.contains(s"$base/c0"))
  }

  test("fixed-point safety vs OptimizeIn: the InSet form blocks re-injection") {
    // under config-time injection the rule shares a fixed-point batch
    // with OptimizeIn, which converts In → InSet above the conversion
    // threshold; missing that form would re-inject a fresh In every
    // iteration and the batch would never converge
    val thresholdKey = "spark.sql.optimizer.inSetConversionThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "2")
      configure(nprobe = 4) // 4 > 2 → OptimizeIn converts
      val rule = AnnTopKRewrite(spark)
      val once = rule(topk(qv, 5).queryExecution.analyzed)
      val inSet = org.apache.spark.sql.catalyst.optimizer.OptimizeIn(once)
      assert(inSet.exists {
        case Filter(org.apache.spark.sql.catalyst.expressions.InSet(a, _), _)
          => a.references.head.name == "centroid_id"
        case _ => false
      }, s"OptimizeIn did not convert:\n$inSet")
      val again = rule(inSet)
      val probeFilters = again.collect {
        case f: Filter if f.condition.references
          .exists(_.name == "centroid_id") => f
      }
      assert(probeFilters.length === 1,
        s"re-injected over the InSet form:\n$again")
    } finally {
      spark.conf.set(thresholdKey, saved)
      deconfigure()
    }
  }
}
