package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The warehouse OPERATIONS surface in pure SQL — `CALL
  * graft.system.<proc>(...)`, the Iceberg stored-procedure convention
  * (`CALL catalog.system.rewrite_data_files(...)` is public prior
  * art; Spark 4.1 ships the ProcedureCatalog API this plugs into).
  * Every maintenance verb the Scala surface has is now reachable from
  * a SQL-only session, which is where a 100 TB deployment actually
  * schedules them (an ops cron speaks SQL, not Scala):
  *
  * {{{
  * CALL graft.system.compact(ns => 'wh', tbl => 'orders', files => 4)
  * CALL graft.system.vacuum(ns => 'wh', tbl => 'orders')
  * CALL graft.system.set_retention(ns => 'wh', tbl => 'orders', snapshots => 8)
  * CALL graft.system.build_bloom(ns => 'wh', tbl => 'orders', col => 'o_custkey')
  * CALL graft.system.build_ndv(ns => 'wh', tbl => 'orders', col => 'o_custkey')
  * CALL graft.system.fsck(ns => 'wh', tbl => 'orders')
  * CALL graft.system.maintain(ns => 'wh', tbl => 'orders')
  * }}}
  *
  * Each call returns a one-or-more-row result (status / counts /
  * issues) through a driver-side LocalScan — these are metadata verbs
  * whose outputs are human-sized; the heavy lifting (the compaction
  * rewrite itself, the bloom build's column pass) runs as ordinary
  * distributed Spark jobs inside the Warehouse methods. Cost model
  * per verb is documented on the method each one delegates to.
  */
object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def str(row: InternalRow, i: Int): String = {
    require(!row.isNullAt(i), s"procedure argument #$i must not be null")
    row.getUTF8String(i).toString
  }

  /** One self-bound procedure: these signatures are static, so
    * `bind` is the identity (the API's two-phase shape exists for
    * overloaded/variadic procedures, which none of these are).
    */
  private abstract class Proc(
      val name: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType) extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters: Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def description: String = s"graft warehouse maintenance: $name"
    def run(wh: Warehouse, input: InternalRow): Seq[InternalRow]
    def withWh(whOf: String => Warehouse): Proc = {
      val self = this
      new Proc(name, params, resultSchema) {
        override def run(wh: Warehouse, input: InternalRow): Seq[InternalRow] =
          self.run(wh, input)
        override def call(input: InternalRow): JIterator[Scan] = {
          val produced = self.run(whOf(str(input, 0)), input).toArray
          Collections.singletonList[Scan](new LocalScan {
            override def rows: Array[InternalRow] = produced
            override def readSchema: StructType = resultSchema
          }).iterator()
        }
      }
    }
    override def call(input: InternalRow): JIterator[Scan] =
      throw new IllegalStateException("unbound graft procedure called")
  }

  private val nsTbl = Seq(p("ns", StringType), p("tbl", StringType))
  private def ok(msg: String): Seq[InternalRow] =
    Seq(InternalRow(UTF8String.fromString(msg)))
  private val statusSchema = StructType(Seq(StructField("status", StringType)))

  private val procs: Map[String, Proc] = Seq[Proc](
    new Proc("compact", nsTbl :+ p("files", IntegerType), statusSchema) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val t = str(in, 1); val n = in.getInt(2)
        wh.compact(t, n)
        ok(s"compacted $t to <= $n files/partition, version ${wh.currentVersion(t).getOrElse(-1L)}")
      }
    },
    new Proc("vacuum", nsTbl,
        StructType(Seq(StructField("removed", IntegerType),
          StructField("paths", StringType)))) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val removed = wh.vacuumOrphans(str(in, 1))
        Seq(InternalRow(removed.size,
          UTF8String.fromString(removed.take(20).mkString(";"))))
      }
    },
    new Proc("set_retention", nsTbl :+ p("snapshots", IntegerType), statusSchema) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val t = str(in, 1); val n = in.getInt(2)
        wh.setSnapshotRetention(t, n)
        ok(s"$t retains $n snapshots")
      }
    },
    new Proc("build_bloom", nsTbl :+ p("col", StringType), statusSchema) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val t = str(in, 1); val c = str(in, 2)
        wh.buildBloom(t, c)
        ok(s"bloom sidecars built for $t.$c")
      }
    },
    new Proc("build_ndv", nsTbl :+ p("col", StringType), statusSchema) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val t = str(in, 1); val c = str(in, 2)
        wh.buildNdv(t, c)
        ok(s"ndv sidecars built for $t.$c")
      }
    },
    new Proc("fsck", nsTbl,
        StructType(Seq(StructField("issue", StringType)))) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val issues = wh.fsck(str(in, 1))
        if (issues.isEmpty) ok("healthy")
        else issues.map(i => InternalRow(UTF8String.fromString(i)))
      }
    },
    new Proc("maintain", nsTbl, statusSchema) {
      def run(wh: Warehouse, in: InternalRow): Seq[InternalRow] = {
        val t = str(in, 1)
        wh.maintain(t)
        ok(s"maintained $t, version ${wh.currentVersion(t).getOrElse(-1L)}")
      }
    }
  ).map(x => x.name -> x).toMap

  private[sources] def names: Seq[String] = procs.keys.toSeq.sorted

  /** Resolve `graft.system.<name>`; `whOf` maps the `ns` argument to
    * that namespace's warehouse (the catalog's own cache).
    */
  private[sources] def load(ident: Identifier,
      whOf: String => Warehouse): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"graft procedures live in the `system` namespace, got $ident")
    procs.get(ident.name).map(_.withWh(whOf)).getOrElse(
      throw new IllegalArgumentException(
        s"no such graft procedure: ${ident.name}; have ${names.mkString(", ")}"))
  }
}
