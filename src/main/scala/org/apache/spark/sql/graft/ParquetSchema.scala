package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.types.StructType

/** Driver-side parquet schema read: one footer open + the same
  * MessageType→StructType conversion `spark.read.parquet` performs —
  * minus the one-task Spark JOB the DataFrameReader path launches per
  * inference (measured ~0.03 s + job-scheduling gap, paid once per
  * `Tables.load` call across the whole catalog). Honors the session's
  * parquet conversion settings (binary-as-string, int96, NTZ
  * inference, legacy nanosAsLong) by constructing the converter from
  * the live SQLConf, so the result is the schema inference would have
  * returned for a single-footer table.
  *
  * Scope: single-schema datasets (one file, or a directory of
  * uniformly-written files — both testdata shapes). Returns None when
  * no footer is readable; the caller falls back to ordinary inference.
  */
object ParquetSchema {
  def infer(spark: SparkSession, path: String): Option[StructType] =
    try {
      val p = new Path(path)
      val conf = spark.sessionState.newHadoopConf()
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      val file =
        if (st.isFile) Some(p)
        else fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName).headOption.map(_.getPath)
      file.map { f =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        val msg = try rd.getFooter.getFileMetaData.getSchema finally rd.close()
        new ParquetToSparkSchemaConverter(spark.sessionState.conf)
          .convert(msg)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
