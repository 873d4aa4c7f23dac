package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Parquet warehouse with set-oriented write patterns replacing the
  * reference's row-at-a-time ORM (S7-S11, SURVEY.md §2.1):
  *
  *  - append        → plain parquet append (S7)
  *  - upsert        → union + window-dedup-by-key + atomic publish (S8;
  *                    no MERGE on vanilla parquet). For partitioned
  *                    tables the merge is PARTITION-SCOPED: only the
  *                    partitions present in `updates` are read, merged,
  *                    and republished — a daily ingest touching one
  *                    fiscal_year rewrites one directory, not 100 TB.
  *  - delete        → left_anti on keys + atomic publish (S9)
  *  - atomicPublish → staged write + directory swap, the distributed
  *                    stand-in for the reference's per-document
  *                    transaction (S11 — documented semantic difference:
  *                    single-table atomicity, not cross-table ACID)
  *
  * Crash-window recovery: the swap is two renames (live→._old,
  * staging→live); a crash between them leaves no live dir. Every read
  * path first runs `recover`, which restores `._old` when live is
  * absent (and restores any per-partition `._old_<dir>` left by a
  * crashed partition swap). The rename swap is atomic on HDFS/local
  * only — on object stores (S3: rename = copy+delete) a table format
  * or a manifest-pointer scheme is required; documented, not hidden.
  *
  * Key generation: Postgres sequences (and the reference's flush()-to-
  * get-keys dance, §3.2c) are replaced by deterministic hash keys
  * (xxhash64 of the natural key) — retry-safe, no coordination, stable
  * across re-ingests. Collision risk at 64 bits is ~n²/2⁶⁵ (≪1 for the
  * reference's ~10⁷ keyspace).
  */
class Warehouse(spark: SparkSession, dir: String) {

  private def tablePath(name: String) = s"$dir/$name"

  private def fileSystem(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def surrogateKey(naturalKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(naturalKey))

  def read(name: String): DataFrame = {
    recover(name)
    spark.read.parquet(tablePath(name))
  }

  def exists(name: String): Boolean = {
    recover(name)
    val p = new Path(tablePath(name))
    fileSystem(p).exists(p)
  }

  /** Restore state left by a crash inside a publish swap: a table whose
    * live dir vanished mid-swap comes back from `._old`; a partition
    * dir mid-swap comes back from its sibling `._old_<name>`. Leftover
    * `._old*` dirs whose target survived are cleaned up. Idempotent,
    * driver-side metadata ops only.
    */
  private def recover(name: String): Unit = {
    val live = new Path(tablePath(name))
    val old = new Path(tablePath(name) + "._old")
    val fs = fileSystem(live)
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
    else if (fs.exists(live) && fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) restoreOldPartitionDirs(fs, live)
  }

  private def restoreOldPartitionDirs(fs: FileSystem, d: Path): Unit =
    fs.listStatus(d).filter(_.isDirectory).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("._old_")) {
        val target = new Path(d, n.stripPrefix("._old_"))
        if (!fs.exists(target)) fs.rename(st.getPath, target)
        else fs.delete(st.getPath, true)
      } else if (!n.startsWith(".") && !n.startsWith("_"))
        restoreOldPartitionDirs(fs, st.getPath)
    }

  /** S7: set-oriented append — one write for N rows. */
  def append(name: String, df: DataFrame): Unit = {
    recover(name)
    df.write.mode(SaveMode.Append).parquet(tablePath(name))
  }

  /** Initialize a table if absent (S10 bootstrap). */
  def create(name: String, df: DataFrame): Unit =
    if (!exists(name)) df.write.mode(SaveMode.ErrorIfExists).parquet(tablePath(name))

  /** S8: upsert = union(existing, updates) → keep the update row per
    * key (window dedup ordered by source priority) → atomic publish.
    * Updates themselves are deduped by key first (last-writer within
    * the batch is arbitrary unless the caller pre-orders — mirroring
    * session.merge semantics per key).
    *
    * Partitioned tables take the partition-scoped path: the distinct
    * partition values in `updates` (small — broadcast) semi-join-prune
    * the existing scan, the window-dedup runs over just those
    * partitions, and only those directories are swapped. Keys are
    * assumed partition-stable (a key never moves between partitions —
    * true of the fact's (report, item, context) → fiscal_year); a key
    * that DID move would leave its old-partition row behind.
    */
  def upsert(name: String, updates: DataFrame, keyCols: Seq[String],
      partitionCols: Seq[String] = Nil): Unit = {
    if (!exists(name)) { atomicPublish(name, updates, partitionCols); return }
    // a table previously written UNPARTITIONED has its rows in root
    // part-files: a partition-scoped swap would leave the old rows
    // behind → one whole-table merge migrates it to the partitioned
    // layout, after which upserts are partition-scoped
    val scoped = partitionCols.nonEmpty && isPartitionedLayout(name)
    val existing = read(name)
    val base =
      if (!scoped) existing
      else {
        val parts = updates.select(partitionCols.map(col): _*).distinct()
        existing.join(broadcast(parts), partitionCols, "left_semi")
      }
    val keyed = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_src").desc)
    val merged = keyed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
    if (scoped) publishPartitions(name, merged, partitionCols)
    else atomicPublish(name, merged, partitionCols)
  }

  /** True iff the live table dir holds no root-level part-files (i.e.
    * data lives under partition directories).
    */
  private def isPartitionedLayout(name: String): Boolean = {
    val live = new Path(tablePath(name))
    !fileSystem(live).listStatus(live)
      .exists(st => st.isFile && st.getPath.getName.startsWith("part-"))
  }

  /** S9: delete-by-key as one anti-join. */
  def delete(name: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    atomicPublish(name, read(name).join(keys, keyCols, "left_anti"))

  /** Bucketed table: pre-shuffled, per-bucket-sorted layout on the join
    * key, registered in the session catalog (bucketing metadata lives
    * there, not in parquet). Two tables bucketed the same way join with
    * NO Exchange on either side — the co-located-join story for
    * repeated fact⋈fact joins where a broadcast doesn't fit and paying
    * the shuffle per query would dominate (e.g. financial_data self
    * and report joins on report_id at 100 TB).
    */
  def createBucketed(name: String, df: DataFrame, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucketed table needs bucket columns")
    df.write.mode(SaveMode.Overwrite)
      .option("path", tablePath(name))
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Catalog read path for bucketed tables (plain `read` would see the
    * files but lose the bucketing metadata and re-shuffle).
    */
  def readBucketed(name: String): DataFrame = spark.table(name)

  /** S11: staged write + swap. Materialize to `<table>._staging`, then
    * rename over the live dir — readers see either the old or the new
    * table, never a partial write. (Single-table atomicity only, and
    * only on rename-atomic filesystems; see class doc for the crash
    * window and its `recover` path. The reference's per-document
    * multi-table transaction has no vanilla-parquet equivalent —
    * quarantine + idempotent re-ingest via deterministic keys covers
    * the retry story instead.)
    */
  def atomicPublish(name: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val live = new Path(tablePath(name))
    val staging = new Path(tablePath(name) + "._staging")
    val old = new Path(tablePath(name) + "._old")
    val fs = fileSystem(live)
    if (fs.exists(staging)) fs.delete(staging, true)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(staging, live)
    fs.delete(old, true)
  }

  /** Partition-scoped publish: stage `df` partitioned, then swap ONLY
    * the partition directories present in the staged output; untouched
    * live partitions are never rewritten. The per-partition backup dir
    * is `._old_<partdir>` (dot-prefixed so a concurrent reader's
    * partition discovery ignores it); `recover` restores it if the
    * swap crashes between renames.
    */
  def publishPartitions(name: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "publishPartitions needs partition columns")
    val live = new Path(tablePath(name))
    val fs = fileSystem(live)
    if (!fs.exists(live)) { atomicPublish(name, df, partitionCols); return }
    val staging = new Path(tablePath(name) + "._staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .parquet(staging.toString)
    leafPartitionDirs(fs, staging, partitionCols.length).foreach { sp =>
      val rel = sp.toUri.getPath.stripPrefix(staging.toUri.getPath).stripPrefix("/")
      val target = new Path(live, rel)
      val backup = new Path(target.getParent, "._old_" + target.getName)
      fs.mkdirs(target.getParent)
      if (fs.exists(backup)) fs.delete(backup, true)
      if (fs.exists(target)) fs.rename(target, backup)
      fs.rename(sp, target)
      fs.delete(backup, true)
    }
    fs.delete(staging, true)
  }

  /** The `depth`-level partition directories under `base` (skipping
    * metadata files/dirs like _SUCCESS).
    */
  private def leafPartitionDirs(fs: FileSystem, base: Path, depth: Int): Seq[Path] =
    if (depth == 0) Seq(base)
    else fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".")
        && !st.getPath.getName.startsWith("_old"))
      .map(_.getPath)
      .flatMap(p => leafPartitionDirs(fs, p, depth - 1))
}
