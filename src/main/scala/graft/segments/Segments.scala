package graft.segments

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical segment layer (SURVEY W4/A1/W11-W12; reference
  * `SegmentDescriptor` include/woved/types.h:94-105, flush
  * `b-epsilon-tree.h:32-33`, compaction `config.h:54-61`).
  *
  * Layout: one directory per segment under `baseDir`, Parquet partitioned
  * by `centroid_id` — the IVF inverted list IS the directory layout, so a
  * probe of nprobe lists is partition pruning at the file level. Parquet
  * bloom filters on `id_hash` serve the reference's per-segment id bloom
  * (Q5/B4, config.h:124 fpp 0.01). The catalog is an append-only Parquet
  * table of descriptors; segment replacement is recorded by `replaced_by`
  * tombstone rows (atomic enough for a batch engine: readers take the
  * latest row per segment_id).
  *
  * At 100 TB: descriptors are tiny (one row per ~2M-vector segment,
  * types.h:122) — the catalog joins/filters happen on the driver or a
  * broadcast, never shuffling data files; min/max zone maps prune whole
  * segments before any scan.
  */
object Segments {

  val CatalogDir = "_catalog"

  /** Mirrors reference SegmentDescriptor (types.h:94-105). */
  final case class SegmentDescriptor(
      segment_id: String,
      file_path: String,
      num_vectors: Long,
      min_id_hash: Long,
      max_id_hash: Long,
      min_epoch: Long,
      max_epoch: Long,
      tombstone_ratio: Double,
      created_at: java.sql.Timestamp,
      is_stable: Boolean,
      replaced_by: Option[String])

  /** W4: write one immutable segment from rows carrying
    * (id_hash, epoch, deleted, centroid_id, ...) and append its descriptor.
    * Returns the descriptor. Bloom filter on id_hash enables point-lookup
    * row-group skipping (Q5).
    *
    * `expectedNdvPerFile` sizes the per-file bloom bitset. Parquet
    * allocates ~1.2 bytes/ndv whether rows arrive or not, and the
    * partitionBy(centroid_id) layout splits a segment across nlist files —
    * so the honest hint is rows-per-inverted-list (reference: 2M vectors /
    * 1024 lists ≈ 2k rows/file), NOT the segment total. Oversizing it
    * 1000× is pure write amplification (measured: it pushed WA from ~1.8
    * to 2.6 at bench scale).
    */
  def writeSegment(rowsIn: DataFrame, baseDir: String, segmentId: String,
      isStable: Boolean, expectedNdvPerFile: Long = 100000L): SegmentDescriptor = {
    // provenance column (QueryResult.segment_id, types.h:81)
    val rows = rowsIn.drop("segment_id")
      .withColumn("segment_id", lit(segmentId))
    val spark = rows.sparkSession
    val path = s"$baseDir/$segmentId"
    // descriptor stats ride along with the write action itself (one pass)
    val obs = new org.apache.spark.sql.Observation(s"seg-$segmentId")
    // one writer per inverted list — avoids the tasks×centroids small-file
    // explosion (AQE coalesces the shuffle at scale)
    rows.observe(obs,
        count(lit(1)).as("n"),
        min(col("id_hash")).as("minh"), max(col("id_hash")).as("maxh"),
        min(col("epoch")).as("mine"), max(col("epoch")).as("maxe"),
        avg(col("deleted").cast("double")).as("tr"))
      .repartition(col("centroid_id")).write
      .mode(SaveMode.Overwrite)
      .partitionBy("centroid_id")
      .option("parquet.bloom.filter.enabled#id_hash", "true")
      .option("parquet.bloom.filter.expected.ndv#id_hash",
        expectedNdvPerFile.toString)
      .parquet(path)
    val m = obs.get
    def longOr(k: String, d: Long): Long =
      Option(m(k)).map(_.asInstanceOf[Long]).getOrElse(d)
    val desc = SegmentDescriptor(
      segmentId, path,
      longOr("n", 0L),
      longOr("minh", 0L), longOr("maxh", 0L),
      longOr("mine", 0L), longOr("maxe", 0L),
      Option(m("tr")).map(_.asInstanceOf[Double]).getOrElse(0.0),
      new java.sql.Timestamp(System.currentTimeMillis()),
      isStable, None)
    appendCatalog(spark, baseDir, Seq(desc))
    desc
  }

  private def appendCatalog(spark: SparkSession, baseDir: String,
      descs: Seq[SegmentDescriptor]): Unit = {
    import spark.implicits._
    descs.toDF().coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$baseDir/$CatalogDir")
  }

  /** A1: latest catalog state — one row per segment_id, dropping segments
    * superseded by compaction.
    */
  def catalog(spark: SparkSession, baseDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$baseDir/$CatalogDir")
    raw.groupBy(col("segment_id"))
      .agg(max_by(struct(raw.columns.map(col): _*), col("created_at"))
        .as("d"))
      .select(col("d.*"))
      .filter(col("replaced_by").isNull)
  }

  /** A4: catalog stats — per-tier segment counts, vectors, tombstone debt. */
  def catalogStats(spark: SparkSession, baseDir: String): DataFrame =
    catalog(spark, baseDir)
      .groupBy(col("is_stable"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("num_vectors")).as("n_vectors"),
        max(col("tombstone_ratio")).as("max_tombstone_ratio"))

  /** Q5/B4: per-segment tag statistics — the Spark analogue of the
    * reference's per-segment roaring tag bitmaps (config.h:117-125). If
    * the rows carry an array `tags` column, record the distinct tag set
    * (≤50k by dictionary contract) per segment; tags-ANY queries then
    * prune whole segments before any scan.
    */
  def writeTagStats(rows: DataFrame, baseDir: String,
      segmentId: String): Unit = {
    val spark = rows.sparkSession
    import spark.implicits._
    val tags = rows.select(explode(col("tags")).as("tag"))
      .distinct().as[Int].collect().sorted
    Seq((segmentId, tags.toSeq)).toDF("segment_id", "tags")
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$baseDir/_tagstats")
  }

  /** Segments that can contain ≥1 of `tagsAny` — join the tiny stats
    * table, never the data.
    */
  def segmentsForTags(spark: SparkSession, baseDir: String,
      tagsAny: Seq[Int]): Seq[String] = {
    val stats = spark.read.parquet(s"$baseDir/_tagstats")
    stats.filter(arrays_overlap(col("tags"),
        lit(tagsAny.toArray)))
      .select("segment_id").distinct().collect().map(_.getString(0)).toSeq
  }

  /** Tag-pruned scan: only segments whose tag set overlaps the query. */
  def scanForTags(spark: SparkSession, baseDir: String,
      tagsAny: Seq[Int]): DataFrame = {
    val segs = segmentsForTags(spark, baseDir, tagsAny).toSet
    val paths = catalog(spark, baseDir)
      .filter(col("segment_id").isin(segs.toSeq: _*))
      .select("file_path").collect().map(_.getString(0))
    if (paths.isEmpty) spark.emptyDataFrame
    else paths.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
      .filter(arrays_overlap(col("tags"), lit(tagsAny.toArray)))
  }

  /** Zone-map pruned scan: read only segments whose [min,max] id_hash range
    * can contain `idHash` (types.h:98-99). File list comes from the
    * catalog — unmatched segments are never opened.
    */
  def scanForIdHash(spark: SparkSession, baseDir: String,
      idHash: Long): DataFrame = {
    val paths = catalog(spark, baseDir)
      .filter(col("min_id_hash") <= idHash && col("max_id_hash") >= idHash)
      .select("file_path").collect().map(_.getString(0))
    if (paths.isEmpty)
      spark.emptyDataFrame
    else
      paths.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
        .filter(col("id_hash") === idHash)
  }

  /** Batched point lookup (W8 over the stored tree): zone-map prune at the
    * catalog, then one IN-filtered scan — the IN list pushes down to
    * Parquet row-group stats and the id_hash bloom filter (Q5/B4), so
    * unmatched row groups are skipped without decoding.
    */
  def scanForIdHashes(spark: SparkSession, baseDir: String,
      idHashes: Seq[Long]): Option[DataFrame] = {
    val cat = catalog(spark, baseDir).select(
      col("file_path"), col("min_id_hash"), col("max_id_hash")).collect()
    val paths = cat.filter(r =>
        idHashes.exists(h => r.getLong(1) <= h && h <= r.getLong(2)))
      .map(_.getString(0))
    if (paths.isEmpty) None
    else Some(paths.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
      .filter(col("id_hash").isin(idHashes: _*)))
  }

  /** Read the union of live segments (optionally only one tier). Each
    * segment is its own partitioned table root, so they are loaded
    * separately and unioned (a union of scans — no shuffle).
    */
  def readSegments(spark: SparkSession, baseDir: String,
      stableOnly: Option[Boolean] = None): DataFrame = {
    val cat = stableOnly.fold(catalog(spark, baseDir))(s =>
      catalog(spark, baseDir).filter(col("is_stable") === s))
    val paths = cat.select("file_path").collect().map(_.getString(0))
    if (paths.isEmpty) spark.emptyDataFrame
    else paths.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
  }

  /** W11/W12: compaction — merge all delta segments, resolve
    * last-writer-wins per id_hash (epochs are unique), purge tombstones,
    * write one stable segment, and mark the inputs replaced. The merge is
    * one hash-aggregate on id_hash (map-side combine) + one partitioned
    * write — no sort, no window.
    */
  def compact(spark: SparkSession, baseDir: String,
      stableSegmentId: String): Option[SegmentDescriptor] = {
    val cat = catalog(spark, baseDir).filter(!col("is_stable"))
    val deltaIds = cat.select("segment_id").collect().map(_.getString(0))
    if (deltaIds.isEmpty) return None // nothing to compact (idempotent)
    val deltas = readSegments(spark, baseDir, stableOnly = Some(false))
    val cols = deltas.columns
    val resolved = deltas
      .groupBy(col("id_hash"))
      .agg(max_by(struct(cols.map(col): _*), col("epoch")).as("m"))
      .select(col("m.*"))
      .filter(!col("deleted"))
    val desc = writeSegment(resolved, baseDir, stableSegmentId,
      isStable = true)
    // mark inputs replaced (latest-row-wins in the catalog)
    val replaced = cat.as[SegmentDescriptor](
        org.apache.spark.sql.Encoders.product[SegmentDescriptor])
      .collect()
      .map(d => d.copy(replaced_by = Some(stableSegmentId),
        created_at = new java.sql.Timestamp(System.currentTimeMillis())))
    appendCatalog(spark, baseDir, replaced.toSeq)
    Some(desc)
  }

  /** Remove a segment tree from disk (test helper / GC). */
  def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}
