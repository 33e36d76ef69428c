package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.functions.expr.{DotProduct, L2SqDistance}

/** Declarative ANN: a Catalyst optimizer rule that turns a brute-force
  * top-k-by-similarity query
  *
  * {{{
  *   SELECT vec_id, graft_dot(embedding, <literal query vector>) AS score
  *   FROM <centroid-partitioned store>
  *   ORDER BY score DESC LIMIT k
  * }}}
  *
  * into an IVF-probed, partition-pruned scan — the reference engine's
  * coarse search (Q6, `config.h:74-78` nprobe) expressed as a query
  * REWRITE instead of a dedicated API call. Users keep writing the exact
  * declarative plan; when the scan targets a registered vector store the
  * rule computes the `nprobe` nearest coarse centroids to the (foldable)
  * query vector at optimization time and injects
  * `centroid_id IN (<probed>)` directly above the file relation, which
  * the datasource turns into partition pruning: only the probed inverted
  * lists are read. At 100 TB this is the difference between a full-corpus
  * scan and reading `nprobe/nlist` of it — the same contract as
  * [[graft.index.Ivf.searchStored]], reached from plain SQL.
  *
  * Scoping and safety:
  *  - fires only when `spark.graft.ann.storePath` is set AND the file
  *    relation under the `ORDER BY … LIMIT` actually roots under that
  *    path — no other query in the session can be touched;
  *  - the probe contract is IDENTICAL to [[graft.index.Ivf.probes]]:
  *    nprobe nearest centroids by expanded squared-L2
  *    (q·q − 2·q·c + c·c, sequential double sums), ties to the lowest
  *    centroid id — so a rewritten query returns exactly what the
  *    imperative IVF search returns at the same nprobe;
  *  - `nprobe >= nlist` probes every list: the rewrite still fires (the
  *    plan proves itself) but the result is exact for a fully-assigned
  *    store — that is the oracle-gated configuration;
  *  - metric/direction must agree: inner-product (`graft_dot`)
  *    descending, or squared-L2 (`graft_l2sq`) ascending. Anything else
  *    (e.g. `ORDER BY dot ASC` — "farthest") is left untouched.
  *
  * The rule is idempotent (re-running on a rewritten plan finds the
  * semantically-equal probe filter and leaves the plan alone), so it is
  * safe both in the fixed-point operator-optimization batch
  * ([[graft.GraftExtensions]] config-time injection) and in the
  * post-optimization `spark.experimental.extraOptimizations` batch
  * ([[GraftAnn.install]] for a live session).
  */
case class AnnTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import AnnTopKRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // bindings are PER STORE (the registry key is the store path):
    // a DataFrame returned by one door must not silently adopt a later
    // door's probe width or centroids just because optimization runs at
    // action time — each relation resolves against ITS OWN binding
    val bindings = AnnTopKRewrite.bindings(SQLConf.get)
    if (bindings.isEmpty) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort))
          if s.global && s.order.nonEmpty =>
        // an optimizer rule must NEVER break a plan it declines to
        // rewrite: any failure (unreadable centroids, dimension
        // mismatch, …) means "not our query", not an error
        val rewritten =
          try rewriteSort(s, bindings)
          catch {
            case scala.util.control.NonFatal(e) =>
              logWarning(s"declarative-ANN rewrite skipped: ${e.getMessage}")
              None
          }
        rewritten match {
          case Some(newSort) => gl.copy(child = ll.copy(child = newSort))
          case None          => gl
        }
    }
  }

  /** Rewrite one `Sort` if its primary key is a supported distance over a
    * store relation; extra keys (tie-breaks) ride along untouched.
    */
  private def rewriteSort(s: Sort,
      bindings: Seq[AnnTopKRewrite.Binding]): Option[Sort] = {
    val order = s.order.head
    val resolved = resolveThroughProjects(order.child, s.child)
    val (vecAttr, qvec) = resolved match {
      case DotProduct(a: AttributeReference, l)
          if order.direction == Descending =>
        (a, constArray(l).getOrElse(return None))
      case DotProduct(l, a: AttributeReference)
          if order.direction == Descending =>
        (a, constArray(l).getOrElse(return None))
      case L2SqDistance(a: AttributeReference, l)
          if order.direction == Ascending =>
        (a, constArray(l).getOrElse(return None))
      case L2SqDistance(l, a: AttributeReference)
          if order.direction == Ascending =>
        (a, constArray(l).getOrElse(return None))
      case _ => return None
    }
    // locate the store relation FIRST: probes are computed only for a
    // plan that verifiably scans a registered store (any other
    // Sort+Limit over a dot product — different store, different
    // dimensionality — must be left alone without even loading
    // centroids). A relation resolves to the LONGEST binding path that
    // covers it.
    val targets = s.child.collect {
      case lr: LogicalRelation if cidAttrOf(lr).isDefined &&
          lr.output.exists(_.exprId == vecAttr.exprId) =>
        bindings.filter(b => relMatches(lr, b.storePath))
          .sortBy(-_.storePath.length).headOption.map(b => (lr, b))
    }.flatten
    if (targets.length != 1) return None
    val (target, binding) = targets.head
    // Refuse to rewrite when ANY filter in the subtree resolves to the
    // TARGET RELATION's centroid_id attribute — by exprId LINEAGE
    // (each filter condition substituted through the project aliases
    // beneath it, the same walk the sort key takes), not by column
    // name: a query that renames the column first
    // (`withColumnRenamed("centroid_id","list_id").filter(...)`) is
    // restricting the same attribute and must decline exactly like the
    // unrenamed spelling, or the probe filter would be injected BELOW
    // the user's restriction and the silent intersection could return
    // wrong/empty top-k. The one check carries two loads:
    //  - CONVERGENCE under config-time injection: the rule shares a
    //    fixed-point batch with OptimizeIn, which rewrites the injected
    //    In to InSet (>10 values) or EqualTo (1 value) — the injected
    //    filter references centroid_id by exprId directly, so lineage
    //    matching finds every rewritten shape and the rule declines on
    //    its own output;
    //  - USER OVERRIDE: a query that already restricts centroid_id
    //    (=, IN, ranges, NOT IN, renamed or derived) has chosen its own
    //    lists — stacking the probe set on top would intersect the two.
    val cidId = cidAttrOf(target).get.exprId
    val alreadyFiltered = s.child.exists {
      case Filter(cond, child) =>
        resolveThroughProjects(cond, child).references
          .exists(_.exprId == cidId)
      case _ => false
    }
    if (alreadyFiltered) return None
    val probed = probe(spark, binding.centroidsPath, qvec, binding.nprobe)
    if (probed.isEmpty) return None
    val newChild = s.child.transformUp {
      case lr: LogicalRelation if lr eq target =>
        Filter(probeFilter(cidAttrOf(lr).get, probed), lr)
    }
    Some(s.copy(child = newChild))
  }

  /** Substitute project aliases downward until the sort key is expressed
    * over relation output attributes.
    */
  private def resolveThroughProjects(e: Expression,
      plan: LogicalPlan): Expression = plan match {
    case Project(projList, child) =>
      val substituted = e.transformUp {
        case a: AttributeReference =>
          projList.collectFirst {
            case al: Alias if al.exprId == a.exprId => al.child
          }.getOrElse(a)
      }
      resolveThroughProjects(substituted, child)
    case Filter(_, child)       => resolveThroughProjects(e, child)
    case SubqueryAlias(_, child) => resolveThroughProjects(e, child)
    case _ => e
  }

  /** A rootPath is "under" the store only at a path-component boundary:
    * `/data/store` matches `/data/store` and `/data/store/part`, never
    * the sibling `/data/store_backup` (which would get probe-filtered
    * with the WRONG store's centroids).
    */
  private def underStore(p: String, store: String): Boolean = {
    val a = p.stripSuffix("/")
    val b = store.stripSuffix("/")
    a == b || a.startsWith(b + "/")
  }

  private def relMatches(lr: LogicalRelation,
      store: String): Boolean = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.exists(p =>
        underStore(p.toString, store) ||
          underStore(p.toUri.getPath, normalizePath(store)))
    case _ => false
  }

  private def cidAttrOf(lr: LogicalRelation): Option[Attribute] =
    lr.output.find(_.name == "centroid_id")

  private def probeFilter(cid: Attribute, probed: Array[Long]): Expression = {
    val lits: Seq[Expression] = cid.dataType match {
      case IntegerType => probed.toIndexedSeq.map(id => Literal(id.toInt))
      case LongType    => probed.toIndexedSeq.map(id => Literal(id))
      case StringType  => probed.toIndexedSeq.map(id => Literal(id.toString))
      case _           => return In(Cast(cid, LongType),
        probed.toIndexedSeq.map(id => Literal(id)))
    }
    In(cid, lits)
  }
}

object AnnTopKRewrite {
  val STORE_PATH_KEY = "spark.graft.ann.storePath"
  val CENTROIDS_KEY = "spark.graft.ann.centroidsPath"
  val NPROBE_KEY = "spark.graft.ann.nprobe"

  /** Multi-store registry: `path|centroids|nprobe` records joined by
    * `;` — [[GraftAnn.configure]] upserts keyed by store path, so doors
    * over DIFFERENT stores never clobber each other's probe width or
    * centroid layout. The three legacy single-store keys above remain
    * honored as one extra binding.
    */
  val STORES_KEY = "spark.graft.ann.stores"

  final case class Binding(storePath: String, centroidsPath: String,
      nprobe: Int)

  private[plans] def bindings(conf: SQLConf): Seq[Binding] = {
    val multi = conf.getConfString(STORES_KEY, "")
      .split(';').toIndexedSeq.filter(_.nonEmpty).flatMap { rec =>
        rec.split('|') match {
          case Array(p, c, np) =>
            scala.util.Try(Binding(p, c, np.trim.toInt)).toOption
              .filter(_.nprobe > 0)
          case _ => None
        }
      }
    val legacy = {
      val store = conf.getConfString(STORE_PATH_KEY, "")
      val cents = conf.getConfString(CENTROIDS_KEY, "")
      // a malformed conf value must disable the binding, not fail
      // every query planned in the session
      val np = scala.util.Try(
        conf.getConfString(NPROBE_KEY, "8").trim.toInt).getOrElse(0)
      if (store.nonEmpty && cents.nonEmpty && np > 0)
        Seq(Binding(store, cents, np))
      else Nil
    }
    // multi registry wins over the legacy triple for the same path
    (multi ++ legacy.filterNot(l =>
      multi.exists(_.storePath == l.storePath))).distinct
  }

  /** Centroids collected once per path: nlist × dim doubles (a few MB at
    * the reference's largest geometry — ~25 MB at nlist 4096 × dim 768),
    * driver-resident like every other coarse-quantizer consumer.
    * BOUNDED: an access-ordered LRU capped at [[CentroidCacheMax]]
    * entries — a long-lived session cycling rebuild paths must not
    * accumulate dead layouts (each entry is tens of MB). Invalidated
    * automatically by [[GraftAnn.deregister]]; [[invalidate]] remains
    * for retraining IN PLACE at an unchanged path.
    */
  private[plans] val CentroidCacheMax = 8
  private val centroidCache =
    new java.util.LinkedHashMap[String, (Array[Long], Array[Array[Double]])](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String,
          (Array[Long], Array[Array[Double]])]): Boolean =
        size() > CentroidCacheMax
    }

  def invalidate(path: String): Unit =
    centroidCache.synchronized { centroidCache.remove(path); () }
  def invalidateAll(): Unit =
    centroidCache.synchronized(centroidCache.clear())
  private[plans] def cachedCentroidPaths: Seq[String] =
    centroidCache.synchronized {
      import scala.jdk.CollectionConverters._
      centroidCache.keySet().asScala.toSeq
    }

  private def normalizePath(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  private[plans] def loadCentroids(spark: SparkSession,
      path: String): (Array[Long], Array[Array[Double]]) = {
    centroidCache.synchronized(Option(centroidCache.get(path))) match {
      case Some(hit) => hit
      case None =>
        val loaded = loadCentroidsUncached(spark, path)
        centroidCache.synchronized(centroidCache.put(path, loaded))
        loaded
    }
  }

  private def loadCentroidsUncached(spark: SparkSession,
      path: String): (Array[Long], Array[Array[Double]]) = {
      val df = spark.read.parquet(path)
      val fields = df.schema.fields
      val idCol = fields.collectFirst {
        case f if f.name == "cid" || f.name == "centroid_id" => f.name
      }.getOrElse(fields.collectFirst {
        case f if f.dataType == LongType || f.dataType == IntegerType => f.name
      }.getOrElse(throw new IllegalArgumentException(
        s"no centroid-id column in $path")))
      val vecCol = fields.collectFirst {
        case f if f.dataType.isInstanceOf[ArrayType] => f.name
      }.getOrElse(throw new IllegalArgumentException(
        s"no centroid-vector column in $path"))
      val rows = df.selectExpr(s"CAST($idCol AS BIGINT)",
          s"CAST($vecCol AS ARRAY<DOUBLE>)")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      (rows.map(_._1), rows.map(_._2))
  }

  /** nprobe nearest centroids by expanded squared L2 (q·q − 2·q·c + c·c,
    * sequential double sums — the arithmetic of [[graft.index.Ivf.probes]]
    * and the DuckDB oracle), ties to the lowest centroid id.
    */
  private[plans] def probe(spark: SparkSession, centsPath: String,
      q: Array[Double], nprobe: Int): Array[Long] = {
    val (ids, cents) = loadCentroids(spark, centsPath)
    var qq = 0.0
    var i = 0
    while (i < q.length) { qq += q(i) * q(i); i += 1 }
    val scored = Array.tabulate(ids.length) { j =>
      val c = cents(j)
      require(c.length == q.length,
        s"query dim ${q.length} != centroid dim ${c.length}")
      var qc = 0.0
      var cc = 0.0
      var t = 0
      while (t < c.length) { qc += q(t) * c(t); cc += c(t) * c(t); t += 1 }
      (qq - 2.0 * qc + cc, ids(j))
    }
    scored.sortBy { case (d, cid) => (d, cid) }
      .take(math.min(nprobe, ids.length)).map(_._2)
  }

  /** The foldable query vector, widened to double (float→double widening
    * is exact; both engines accumulate in double).
    */
  private[plans] def constArray(e: Expression): Option[Array[Double]] =
    e.dataType match {
      case ArrayType(et @ (FloatType | DoubleType), _) if e.foldable =>
        Option(e.eval()).map { v =>
          val ad = v.asInstanceOf[ArrayData]
          et match {
            case FloatType => ad.toFloatArray().map(_.toDouble)
            case _         => ad.toDoubleArray()
          }
        }
      case _ => None
    }
}

/** Live-session installer for [[AnnTopKRewrite]] (config-time injection
  * goes through [[graft.GraftExtensions]]): appends the rule to
  * `spark.experimental.extraOptimizations` once. That batch runs after
  * the main optimizer, on the final plan shape; the injected
  * `Filter(centroid_id IN …)` sits directly above the file relation,
  * exactly where `PhysicalOperation` extracts partition filters from.
  */
object GraftAnn {
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[AnnTopKRewrite]))
      spark.experimental.extraOptimizations = cur :+ AnnTopKRewrite(spark)
  }

  /** Register (or re-register) a store binding: base path (scopes the
    * rewrite), its coarse centroids, and the probe width. UPSERTS into
    * the per-store registry keyed by path — other stores' bindings are
    * untouched, so two doors in one session keep their own probe
    * widths. Re-configuring the SAME store updates its binding
    * (probe width is a property of the registered store, not of a
    * previously returned DataFrame — plans optimize at action time).
    */
  def configure(spark: SparkSession, storePath: String,
      centroidsPath: String, nprobe: Int): Unit = {
    require(!Seq(storePath, centroidsPath).exists(p =>
      p.contains('|') || p.contains(';')),
      "store/centroid paths must not contain '|' or ';'")
    val all = spark.conf.get(AnnTopKRewrite.STORES_KEY, "")
      .split(';').toIndexedSeq.filter(_.nonEmpty)
    val prior = all.find(_.startsWith(storePath + "|"))
    val cur = all.filterNot(_.startsWith(storePath + "|"))
    val next = cur :+ s"$storePath|$centroidsPath|$nprobe"
    // bindings are session-global and plans optimize at ACTION time:
    // a DataFrame handed out under the prior binding that is collected
    // after this call executes at the NEW probe width/centroids. That
    // is the documented semantics (probe width is a property of the
    // registered store), but silent reconfiguration under live handles
    // is action-order-dependent — disclose it.
    prior.filter(_ != next.last).foreach { old =>
      System.err.println(s"[graft-ann] re-registering $storePath " +
        s"(was '$old'): DataFrames obtained under the prior binding " +
        "will serve at the NEW nprobe/centroids when next collected")
    }
    spark.conf.set(AnnTopKRewrite.STORES_KEY, next.mkString(";"))
  }

  /** Remove a store's binding (and the legacy single-store triple when
    * it names the same path). Also drops the store's centroids from the
    * optimizer-side cache: a deregister→retrain→re-register cycle at an
    * unchanged centroids path must serve the NEW layout without a
    * manual [[AnnTopKRewrite.invalidate]] call.
    */
  def deregister(spark: SparkSession, storePath: String): Unit = {
    val all = spark.conf.get(AnnTopKRewrite.STORES_KEY, "")
      .split(';').toIndexedSeq.filter(_.nonEmpty)
    all.filter(_.startsWith(storePath + "|")).foreach { rec =>
      rec.split('|') match {
        case Array(_, cents, _) => AnnTopKRewrite.invalidate(cents)
        case _ =>
      }
    }
    val cur = all.filterNot(_.startsWith(storePath + "|"))
    if (cur.isEmpty) spark.conf.unset(AnnTopKRewrite.STORES_KEY)
    else spark.conf.set(AnnTopKRewrite.STORES_KEY, cur.mkString(";"))
    if (spark.conf.get(AnnTopKRewrite.STORE_PATH_KEY, "") == storePath) {
      AnnTopKRewrite.invalidate(
        spark.conf.get(AnnTopKRewrite.CENTROIDS_KEY, ""))
      spark.conf.unset(AnnTopKRewrite.STORE_PATH_KEY)
      spark.conf.unset(AnnTopKRewrite.CENTROIDS_KEY)
      spark.conf.unset(AnnTopKRewrite.NPROBE_KEY)
    }
  }
}
