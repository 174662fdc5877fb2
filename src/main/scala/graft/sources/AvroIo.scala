package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink built directly on the Avro core
  * library (which ships with Spark) — this build has no `spark-avro`
  * DataSource jar, and real corpora still arrive as `.avro`, so the
  * engine supplies the format itself rather than declaring it
  * unreadable.
  *
  * Shape: the WRITE runs one Avro container file per partition from
  * `foreachPartition` (the per-partition imperative-IO escape the binary
  * codecs already use — an opaque wire format is exactly the "genuine
  * per-partition imperative logic" case); the READ plans as a
  * `binaryFile` scan (splittable at file granularity, the same
  * parallelism model as a directory of parquet part files) with a
  * per-file decode to rows under an EXPLICIT schema — like the CSV/JSONL
  * readers, no inference pass. Everything downstream of the decode is a
  * normal DataFrame.
  *
  * Two declared non-goals, both scaladoc'd where a production port would
  * change them: the task-side writer builds a default Hadoop
  * `Configuration` (correct for any `file:` scratch root; a cluster
  * writer would serialize the driver conf), and files are written
  * directly rather than through the output-committer rename protocol
  * (re-created on task retry — idempotent for an overwrite sink, not
  * transactional).
  *
  * Supported column types: the primitive round-trip set (long, int,
  * double, boolean, string), every field written as a `["null", T]`
  * union so null columns survive. Doubles are binary in Avro — unlike
  * the CSV/JSONL text hops, bit-exactness needs no formatter argument.
  */
object AvroIo {

  private def avroPrimitive(dt: DataType): String = dt match {
    case LongType    => "long"
    case IntegerType => "int"
    case DoubleType  => "double"
    case BooleanType => "boolean"
    case StringType  => "string"
    case other => throw new IllegalArgumentException(
      s"AvroIo supports primitive round-trip columns only, got $other")
  }

  /** Avro record schema JSON for a Spark struct — every field nullable
    * (`["null", T]`, default null) so the writer never NPEs on a null
    * cell and the reader maps absent → SQL NULL.
    */
  def schemaJson(schema: StructType, name: String = "GraftRow"): String = {
    val fields = schema.fields.map { f =>
      s"""{"name": "${f.name}", "type": ["null", "${avroPrimitive(f.dataType)}"], "default": null}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Write `df` as one Avro container file per partition under `path`
    * (cleared first — overwrite semantics, like the engine's other
    * sinks). Empty partitions write no file.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = schemaJson(sparkSchema)
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    val n = sparkSchema.length
    df.rdd.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        val avroSchema = new Schema.Parser().parse(json)
        val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        // task-side default conf: resolves any file:-scheme scratch root;
        // a cluster deployment ships the serialized driver conf instead
        val tfs = file.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = tfs.create(file, true)
        val writer = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.create(avroSchema, out)
        try it.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < n) {
            rec.put(i, if (row.isNullAt(i)) null else row.get(i))
            i += 1
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }

  /** Read a directory of Avro container files under an explicit Spark
    * schema (fields matched by NAME against the embedded writer schema —
    * the standard Avro resolution direction, so column order is free and
    * extra writer fields are skipped). Plans as a `binaryFile` scan +
    * per-file decode.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // Expand the part-file glob driver-side and load CONCRETE paths: a
    // glob handed straight to `load` makes the FileStreamSink metadata
    // probe print a full FileNotFoundException stack at WARN on every
    // clean run (the probe tries `<glob>/_spark_metadata` before
    // resolving the glob) — harmless but it reads like a failure in the
    // Verify log. Listing first also gives an empty directory a clean
    // empty relation instead of an AnalysisException.
    val conf = spark.sparkContext.hadoopConfiguration
    val globPath = new org.apache.hadoop.fs.Path(s"$path/part-*.avro")
    val fs = globPath.getFileSystem(conf)
    val parts = Option(fs.globStatus(globPath)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    if (parts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val files = spark.read.format("binaryFile")
      .load(parts: _*).select("content")
    val fieldNames = schema.fieldNames
    val rows = files.rdd.flatMap { fileRow =>
      val stream = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(fileRow.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord]())
      val buf = ArrayBuffer[Row]()
      try {
        while (stream.hasNext) {
          val rec = stream.next()
          buf += Row.fromSeq(fieldNames.toIndexedSeq.map { fn =>
            rec.get(fn) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case v => v
            }
          })
        }
      } finally stream.close()
      buf
    }
    spark.createDataFrame(rows, schema)
  }
}
