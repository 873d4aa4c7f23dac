package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Parquet warehouse with set-oriented write patterns replacing the
  * reference's row-at-a-time ORM (S7-S11, SURVEY.md §2.1):
  *
  *  - append        → plain parquet append (S7)
  *  - upsert        → union + window-dedup-by-key + atomic publish (S8;
  *                    no MERGE on vanilla parquet)
  *  - delete        → left_anti on keys + atomic publish (S9)
  *  - atomicPublish → staged write + directory swap, the distributed
  *                    stand-in for the reference's per-document
  *                    transaction (S11 — documented semantic difference:
  *                    single-table atomicity, not cross-table ACID)
  *
  * Key generation: Postgres sequences (and the reference's flush()-to-
  * get-keys dance, §3.2c) are replaced by deterministic hash keys
  * (xxhash64 of the natural key) — retry-safe, no coordination, stable
  * across re-ingests. Collision risk at 64 bits is ~n²/2⁶⁵ (≪1 for the
  * reference's ~10⁷ keyspace).
  */
class Warehouse(spark: SparkSession, dir: String) {

  private def tablePath(name: String) = s"$dir/$name"

  def surrogateKey(naturalKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(naturalKey))

  def read(name: String): DataFrame = spark.read.parquet(tablePath(name))

  def exists(name: String): Boolean = {
    val p = new Path(tablePath(name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S7: set-oriented append — one write for N rows. */
  def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(tablePath(name))

  /** Initialize a table if absent (S10 bootstrap). */
  def create(name: String, df: DataFrame): Unit =
    if (!exists(name)) df.write.mode(SaveMode.ErrorIfExists).parquet(tablePath(name))

  /** S8: upsert = union(existing, updates) → keep the update row per
    * key (window dedup ordered by source priority) → atomic publish.
    * Updates themselves are deduped by key first (last-writer within
    * the batch is arbitrary unless the caller pre-orders — mirroring
    * session.merge semantics per key).
    */
  def upsert(name: String, updates: DataFrame, keyCols: Seq[String],
      partitionCols: Seq[String] = Nil): Unit = {
    val merged =
      if (!exists(name)) updates
      else {
        val existing = read(name)
        val keyed = existing.withColumn("_src", lit(0))
          .unionByName(updates.withColumn("_src", lit(1)))
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_src").desc)
        keyed.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_src", "_rn")
      }
    atomicPublish(name, merged, partitionCols)
  }

  /** S9: delete-by-key as one anti-join. */
  def delete(name: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    atomicPublish(name, read(name).join(keys, keyCols, "left_anti"))

  /** S11: staged write + swap. Materialize to `<table>._staging`, then
    * rename over the live dir — readers see either the old or the new
    * table, never a partial write. (Single-table atomicity only; the
    * reference's per-document multi-table transaction has no vanilla-
    * parquet equivalent — quarantine + idempotent re-ingest via
    * deterministic keys covers the retry story instead.)
    */
  def atomicPublish(name: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val live = new Path(tablePath(name))
    val staging = new Path(tablePath(name) + "._staging")
    val old = new Path(tablePath(name) + "._old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(staging, live)
    fs.delete(old, true)
  }
}
