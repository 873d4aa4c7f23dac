package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** A non-`file:` Hadoop scheme backed by the local disk: pins that the
  * catalog's namespace/discovery layer routes through Hadoop
  * `FileSystem` resolution (HDFS/S3-shaped), never `java.io.File` —
  * with a `file:`-only implementation every op below would see an
  * empty catalog.
  */
class MockHadoopFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}

/** Round-17 catalog surface: Hadoop-FS routing, DDL completion (ALTER
  * ADD COLUMN / TBLPROPERTIES, partitioned CREATE, TIMESTAMP AS OF,
  * RENAME, DROP NAMESPACE) and SQL DML (DELETE/UPDATE/MERGE) onto the
  * warehouse's row-level commit paths.
  */
class CatalogDdlDmlSpec extends SparkSpec {

  private lazy val base: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat17").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", tmp)
    tmp
  }

  override def beforeAll(): Unit = { super.beforeAll(); base; () }

  test("catalog on a Hadoop-routed (non-file:) filesystem: full life cycle") {
    import spark.implicits._
    sc.hadoopConfiguration.set("fs.mockfs.impl", classOf[MockHadoopFs].getName)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mockfs").toString
    val root = s"mockfs:$tmp"
    spark.conf.set("spark.sql.catalog.graft2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft2.root", root)

    spark.sql("CREATE NAMESPACE graft2.hn")
    spark.sql("CREATE TABLE graft2.hn.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO graft2.hn.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(spark.sql("SELECT sum(k) AS s FROM graft2.hn.t").head.getLong(0) === 6L)
    assert(spark.sql("SHOW TABLES IN graft2.hn").count() === 1)
    assert(spark.sql("SHOW NAMESPACES IN graft2").collect()
      .map(_.getString(0)).contains("hn"))
    // deletes + catalog reads compose through the scheme too
    val wh = new Warehouse(spark, s"$root/hn", manifest = true)
    wh.deleteRows("t", col("k") === 2L)
    assert(spark.sql("SELECT sum(k) AS s FROM graft2.hn.t").head.getLong(0) === 4L)
    spark.sql("DROP TABLE graft2.hn.t")
    assert(spark.sql("SHOW TABLES IN graft2.hn").count() === 0)
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; reads null-fill; writes materialize") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ddl2.ev (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ddl2.ev VALUES (1, 1.5), (2, 2.5)")
    val before = new Warehouse(spark, s"$base/ddl2", manifest = true)
      .history("ev").size
    spark.sql("ALTER TABLE graft.ddl2.ev ADD COLUMN tag STRING")
    // metadata action: no new snapshot committed
    assert(new Warehouse(spark, s"$base/ddl2", manifest = true)
      .history("ev").size === before)
    val r1 = spark.sql(
      "SELECT k, tag FROM graft.ddl2.ev ORDER BY k").collect()
    assert(r1.map(_.isNullAt(1)).forall(identity))
    spark.sql("INSERT INTO graft.ddl2.ev VALUES (3, 3.5, 'new')")
    val r2 = spark.sql(
      "SELECT k, tag FROM graft.ddl2.ev WHERE tag IS NOT NULL").collect()
    assert(r2.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((3L, "new")))
    // duplicate add fails loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddl2.ev ADD COLUMN tag STRING")
    }
  }

  test("partitioned CREATE TABLE: inserts write the declared hive layout; path pruning applies") {
    import spark.implicits._
    spark.sql(
      "CREATE TABLE graft.ddl2.pt (k BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("""INSERT INTO graft.ddl2.pt
      SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp
      FROM range(0, 1000)""")
    val wh = new Warehouse(spark, s"$base/ddl2", manifest = true)
    // layout: every data file sits under a grp=... dir
    val q = spark.sql(
      "SELECT count(*) AS n FROM graft.ddl2.pt WHERE grp = 'even'")
    assert(q.head.getLong(0) === 500L)
    val kept = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
              case p: graft.plans.PrunedFileIndex =>
                Some((p.inputFiles.length, p.orig.inputFiles.length))
              case _ => None
            }
          case _ => None
        }
    }.flatten
    // one scan per version vintage (the CREATE-time empty flat file is
    // its own un-prunable 0-row vintage): judge the SNAPSHOT total
    assert(kept.nonEmpty && kept.map(_._1).sum < kept.map(_._2).sum,
      s"partition filter should file-prune, got $kept")
    // second insert appends under the same layout (no demotion)
    spark.sql("INSERT INTO graft.ddl2.pt VALUES (2000, 'even')")
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.ddl2.pt WHERE grp = 'even'")
      .head.getLong(0) === 501L)
    // create + 2 appends = version 3 (history lists only the retained 2)
    assert(wh.currentVersion("pt") === Some(3L))
  }

  test("TIMESTAMP AS OF resolves by commit time; TBLPROPERTIES surface the GC horizon") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ddl2.tt (k BIGINT)")
    spark.sql(
      "ALTER TABLE graft.ddl2.tt SET TBLPROPERTIES ('retain_snapshots' = '8')")
    spark.sql("INSERT INTO graft.ddl2.tt SELECT id FROM range(0, 10)")
    Thread.sleep(1100) // fs mtime granularity can be 1s
    val mid = java.time.Instant.now()
    Thread.sleep(1100)
    spark.sql("INSERT INTO graft.ddl2.tt SELECT id FROM range(10, 30)")
    val atMid = spark.sql(
      s"SELECT count(*) AS n FROM graft.ddl2.tt TIMESTAMP AS OF '$mid'")
    assert(atMid.head.getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.ddl2.tt")
      .head.getLong(0) === 30L)
    // horizon readable via SHOW TBLPROPERTIES
    val props = spark.sql("SHOW TBLPROPERTIES graft.ddl2.tt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("retain_snapshots") === Some("8"))
    assert(props.contains("current_version"))
    // an instant before the table existed fails loudly
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft.ddl2.tt TIMESTAMP AS OF '1999-01-01'").collect()
    }
  }

  test("RENAME TABLE and DROP NAMESPACE") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.rn")
    spark.sql("CREATE TABLE graft.rn.a AS SELECT id AS k FROM range(0, 5)")
    spark.sql("ALTER TABLE graft.rn.a RENAME TO graft.rn.b")
    assert(spark.sql("SELECT count(*) AS n FROM graft.rn.b").head.getLong(0) === 5L)
    assert(!spark.catalog.tableExists("graft.rn.a"))
    intercept[Exception] { spark.sql("DROP NAMESPACE graft.rn") } // not empty
    spark.sql("DROP NAMESPACE graft.rn CASCADE")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .forall(_.getString(0) != "rn"))
  }

  test("join-skip fires when BOTH star sides resolve through catalog names") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/js", manifest = true)
    wh.atomicPublish("fact",
      spark.range(0, 10000).toDF("fk").withColumn("v", ($"fk" * 3).cast("double"))
        .repartitionByRange(8, $"fk").sortWithinPartitions($"fk"))
    wh.atomicPublish("dim",
      spark.range(100, 110).toDF("dk").coalesce(1))
    val q = spark.sql(
      """SELECT f.fk FROM graft.js.fact f JOIN graft.js.dim d ON f.fk = d.dk
         ORDER BY f.fk""")
    val kept = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location match {
            case p: graft.plans.PrunedFileIndex =>
              Some((p.inputFiles.length, p.orig.inputFiles.length))
            case _ => None
          }
          case _ => None
        }
    }.flatten
    // the 8-file fact must have pruned to the one file the dim's 10
    // keys live in; the 1-file dim is below minFiles and stays whole
    assert(kept.exists { case (k, t) => t === 8 && k <= 1 },
      s"catalog star join should file-prune the fact, got $kept")
    assert(q.as[Long].collect() === (100L until 110L).toArray)
  }

  test("readStream.table: catalog streaming read with checkpoint restart") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/str", manifest = true)
    wh.atomicPublish("ev", spark.range(0, 100).toDF("k").coalesce(1)) // v1
    wh.setSnapshotRetention("ev", 16)
    wh.append("ev", spark.range(100, 150).toDF("k").coalesce(1))      // v2
    val out = java.nio.file.Files.createTempDirectory("graft-strout").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-strchk").toString
    def drain(): Unit = {
      val q = spark.readStream.option("startingVersion", "1")
        .table("graft.str.ev")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 150L)
    wh.append("ev", spark.range(150, 170).toDF("k").coalesce(1))      // v3
    drain() // resume: only v3's rows, exactly once
    val served = spark.read.parquet(out)
    assert(served.count() === 170L)
    assert(served.distinct().count() === 170L, "no row served twice")

    // default stance (no startingVersion): future commits only
    val out2 = java.nio.file.Files.createTempDirectory("graft-strout2").toString
    val chk2 = java.nio.file.Files.createTempDirectory("graft-strchk2").toString
    val q2 = spark.readStream.table("graft.str.ev")
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", chk2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val n2 = try spark.read.parquet(out2).count()
      catch { case _: Exception => 0L } // empty dir: nothing served
    assert(n2 === 0L, s"default stream must serve future commits only, got $n2")
  }

  test("CALL graft.system.*: maintenance verbs from pure SQL") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/proc", manifest = true)
    wh.atomicPublish("t", spark.range(0, 5000).toDF("k")
      .withColumn("s", format_string("s%05d", $"k")).repartition(8))
    wh.append("t", spark.range(5000, 6000).toDF("k")
      .withColumn("s", format_string("s%05d", $"k")).repartition(8))

    // retention from SQL, then compact rewrites to one file
    spark.sql(
      "CALL graft.system.set_retention(ns => 'proc', tbl => 't', snapshots => 8)")
    spark.sql("CALL graft.system.compact(ns => 'proc', tbl => 't', files => 1)")
    assert(wh.history("t").last._2 === 1L, "compact(1) must leave one file")
    assert(spark.sql("SELECT count(*) AS n FROM graft.proc.t")
      .head.getLong(0) === 6000L)

    // bloom + ndv sidecars from SQL — the point-lookup prune uses them
    spark.sql("CALL graft.system.build_bloom(ns => 'proc', tbl => 't', col => 's')")
    spark.sql("CALL graft.system.build_ndv(ns => 'proc', tbl => 't', col => 'k')")
    assert(wh.statsApproxNdv("t", "k").exists(n => n > 5000 && n < 7000))

    // fsck reports healthy; vacuum returns a count row
    val f = spark.sql("CALL graft.system.fsck(ns => 'proc', tbl => 't')").collect()
    assert(f.map(_.getString(0)).sameElements(Array("healthy")), f.mkString(","))
    val v = spark.sql("CALL graft.system.vacuum(ns => 'proc', tbl => 't')").head()
    assert(v.getInt(0) >= 0)

    // unknown procedure fails loudly with the available names
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.nope(ns => 'proc', tbl => 't')").collect()
    }
    assert(e.getMessage.contains("no such graft procedure") ||
      e.getMessage.toLowerCase.contains("nope"))
  }

  test("DELETE FROM: deletion-vector commit, no rewrite; arbitrary predicate") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/dml", manifest = true)
    wh.atomicPublish("d",
      spark.range(0, 1000).toDF("k")
        .withColumn("v", $"k" * 2.0).repartition(4))
    val filesBefore = wh.history("d").last._2
    spark.sql("DELETE FROM graft.dml.d WHERE k % 10 = 0 OR v > 1900.0")
    val h = wh.history("d").last
    assert(h._2 === filesBefore, "delete must not rewrite data files")
    assert(wh.commitKind("d", h._1) === Some("delete"))
    val expect = (0L until 1000L).count(k => k % 10 != 0 && k * 2.0 <= 1900.0)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.d")
      .head.getLong(0) === expect.toLong)
    // uncorrelated IN-subquery delete = the S9 anti-join (self-
    // referential subqueries work: the key frame is computed from the
    // captured snapshot before the rewrite publishes)
    val before = spark.sql("SELECT count(*) FROM graft.dml.d").head.getLong(0)
    spark.sql("""DELETE FROM graft.dml.d
      WHERE k IN (SELECT k FROM graft.dml.d WHERE v < 10)""")
    // v = 2k, survivors of the first delete with v<10: k in {1,2,3,4}
    assert(spark.sql("SELECT count(*) FROM graft.dml.d").head.getLong(0)
      === before - 4)
    // unsupported: CORRELATED subquery fails loudly, nothing commits
    val vBefore = wh.currentVersion("d")
    intercept[Exception] {
      spark.sql("""DELETE FROM graft.dml.d
        WHERE EXISTS (SELECT 1 FROM graft.dml.d d2 WHERE d2.k = graft.dml.d.k + 1)""").collect()
    }
    assert(wh.currentVersion("d") === vBefore)
  }

  test("ALTER TABLE DROP COLUMN: metadata-only; inserts continue; re-add refused") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.ddl2.dc (k BIGINT, v DOUBLE, tag STRING)")
    spark.sql("INSERT INTO graft.ddl2.dc VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    val wh = new Warehouse(spark, s"$base/ddl2", manifest = true)
    val before = wh.history("dc").size
    spark.sql("ALTER TABLE graft.ddl2.dc DROP COLUMN tag")
    assert(wh.history("dc").size === before, "drop is a metadata action")
    assert(spark.table("graft.ddl2.dc").columns.toSeq === Seq("k", "v"))
    // inserts against the narrowed schema work; totals unaffected
    spark.sql("INSERT INTO graft.ddl2.dc VALUES (3, 3.5)")
    assert(spark.sql("SELECT sum(k) AS s FROM graft.ddl2.dc").head.getLong(0) === 6L)
    // re-adding the dropped name would resurrect pre-drop values
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddl2.dc ADD COLUMN tag STRING")
    }
    assert(e.getMessage.contains("dropped"))
    // a fresh name is fine, and an added-then-dropped column vanishes
    spark.sql("ALTER TABLE graft.ddl2.dc ADD COLUMN note STRING")
    spark.sql("ALTER TABLE graft.ddl2.dc DROP COLUMN note")
    assert(spark.table("graft.ddl2.dc").columns.toSeq === Seq("k", "v"))
    // partition columns are layout, not droppable
    spark.sql("CREATE TABLE graft.ddl2.dcp (k BIGINT, p STRING) PARTITIONED BY (p)")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddl2.dcp DROP COLUMN p")
    }
  }

  test("UPDATE racing a concurrent commit aborts loudly, nothing torn") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/race", manifest = true)
    wh.atomicPublish("u", spark.range(0, 1000).toDF("k")
      .withColumn("v", $"k".cast("double")).repartition(4))
    val wh2 = new Warehouse(spark, s"$base/race", manifest = true)
    wh.updateTestHook = { _ =>
      wh2.append("u", spark.range(1000, 1100).toDF("k")
        .withColumn("v", $"k".cast("double")).coalesce(1))
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        wh.updateRows("u", col("k") < 10, Map("v" -> lit(-1.0)))
      }
    } finally wh.updateTestHook = _ => ()
    // the racer's append won; the update left no partial state
    assert(wh.read("u").count() === 1100L)
    assert(wh.read("u").where($"v" === -1.0).count() === 0L)
    assert(wh.fsck("u").isEmpty, wh.fsck("u").mkString("; "))
    // retry on the fresh snapshot succeeds
    assert(wh.updateRows("u", col("k") < 10, Map("v" -> lit(-1.0))) === 10L)
    assert(wh.read("u").where($"v" === -1.0).count() === 10L)
  }

  test("TRUNCATE TABLE: empty-snapshot commit, time travel survives") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/tr", manifest = true)
    wh.atomicPublish("t", spark.range(0, 500).toDF("k").coalesce(1)) // v1
    wh.setSnapshotRetention("t", 8)
    spark.sql("TRUNCATE TABLE graft.tr.t")
    assert(spark.sql("SELECT count(*) AS n FROM graft.tr.t").head.getLong(0) === 0L)
    // a commit, not a purge: the pre-truncate snapshot is still readable
    assert(spark.sql("SELECT count(*) AS n FROM graft.tr.t VERSION AS OF 1")
      .head.getLong(0) === 500L)
    spark.sql("INSERT INTO graft.tr.t VALUES (7)")
    assert(spark.sql("SELECT sum(k) AS s FROM graft.tr.t").head.getLong(0) === 7L)
  }

  test("UPDATE: one atomic commit, cost ∝ updated rows") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/dml", manifest = true)
    wh.atomicPublish("u",
      spark.range(0, 1000).toDF("k")
        .withColumn("v", $"k".cast("double"))
        .withColumn("s", format_string("s%04d", $"k")).repartition(4))
    val before = wh.history("u").size
    spark.sql("UPDATE graft.dml.u SET v = v * 10.0, s = 'touched' WHERE k < 7")
    assert(wh.history("u").size === before + 1)
    val h = wh.history("u").last
    assert(wh.commitKind("u", h._1) === Some("update"))
    val rows = spark.sql(
      "SELECT k, v, s FROM graft.dml.u WHERE k < 9 ORDER BY k").collect()
    assert(rows.length === 9)
    rows.foreach { r =>
      val k = r.getLong(0)
      if (k < 7) { assert(r.getDouble(1) === k * 10.0 && r.getString(2) === "touched") }
      else { assert(r.getDouble(1) === k.toDouble && r.getString(2) === f"s$k%04d") }
    }
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.u")
      .head.getLong(0) === 1000L)
    // updating already-deleted rows must not resurrect them
    spark.sql("DELETE FROM graft.dml.u WHERE k BETWEEN 100 AND 199")
    spark.sql("UPDATE graft.dml.u SET v = -1.0 WHERE k BETWEEN 150 AND 249")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.u")
      .head.getLong(0) === 900L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.dml.u WHERE v = -1.0")
      .head.getLong(0) === 50L)
    // keyed shape: WHERE k IN (<uncorrelated subquery>) — one atomic
    // keyed-update commit, self-referential subquery included
    spark.sql("""UPDATE graft.dml.u SET s = 'keyed'
      WHERE k IN (SELECT k FROM graft.dml.u WHERE k >= 990)""")
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.dml.u WHERE s = 'keyed'")
      .head.getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.u")
      .head.getLong(0) === 900L)
  }

  test("MERGE INTO: upsert shape onto Warehouse.upsert; delete shape; negatives") {
    import spark.implicits._
    val wh = new Warehouse(spark, s"$base/dml", manifest = true)
    wh.atomicPublish("m",
      spark.range(0, 100).toDF("k").withColumn("v", $"k".cast("double")))
    spark.range(50, 120).toDF("k").withColumn("v", lit(0.5))
      .createOrReplaceTempView("m_src")
    spark.sql("""MERGE INTO graft.dml.m t USING m_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m")
      .head.getLong(0) === 120L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m WHERE v = 0.5")
      .head.getLong(0) === 70L)
    // delete-matching shape
    spark.range(0, 10).toDF("k").createOrReplaceTempView("m_del")
    spark.sql("""MERGE INTO graft.dml.m t USING m_del s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m")
      .head.getLong(0) === 110L)
    // matched-update-only: not-matched source rows are dropped
    spark.range(100, 200).toDF("k").withColumn("v", lit(9.9))
      .createOrReplaceTempView("m_upd")
    spark.sql("""MERGE INTO graft.dml.m t USING m_upd s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *""")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m")
      .head.getLong(0) === 110L, "update-only must not insert")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m WHERE v = 9.9")
      .head.getLong(0) === 20L) // keys 100..119 exist
    // not-matched-insert-only: idempotent ingest
    spark.range(115, 130).toDF("k").withColumn("v", lit(7.7))
      .createOrReplaceTempView("m_ins")
    spark.sql("""MERGE INTO graft.dml.m t USING m_ins s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m")
      .head.getLong(0) === 120L)
    spark.sql("""MERGE INTO graft.dml.m t USING m_ins s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""") // re-run inserts nothing
    assert(spark.sql("SELECT count(*) AS n FROM graft.dml.m")
      .head.getLong(0) === 120L)
    // negative: conditional matched action
    intercept[Exception] {
      spark.sql("""MERGE INTO graft.dml.m t USING m_src s ON t.k = s.k
        WHEN MATCHED AND s.v > 0 THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }
    // negative: non-equi ON
    intercept[Exception] {
      spark.sql("""MERGE INTO graft.dml.m t USING m_src s ON t.k < s.k
        WHEN MATCHED THEN DELETE""")
    }
  }
}
