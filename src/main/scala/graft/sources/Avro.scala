package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Avro object-container source/sink on avro-core alone — Spark ships the
  * Avro LIBRARY in its jars but not the `spark-avro` datasource, so this
  * is the dependency-light scan path (the Xlsx/Xls precedent: distributed
  * parse over binaryFile rows). Flat record schemas of primitive /
  * `[null, T]`-union fields — the shape tabular exports actually use.
  *
  * Read: the writer schema is sniffed ONCE on the driver from the first
  * container's header; executors then stream every container through
  * `DataFileStream` (codec handled by avro-core: null/deflate/snappy are
  * all on the Spark classpath). Write: one container file per partition
  * via the Hadoop FS API — file count and size are bounded by the input's
  * partitioning, the same lever as every other sink here. A single
  * container larger than an executor's memory would need a block-seeking
  * split reader (Avro sync markers support it); the sink never produces
  * one, and the scaladoc is the contract. */
object Avro {

  /** Spark schema for a flat Avro record schema ([null, T] unions →
    * nullable fields). */
  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"not a record: $avro")
    StructType(avro.getFields.asScala.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Avro record schema for a flat Spark schema (nullable → [null, T]). */
  def avroSchema(st: StructType, name: String = "graft_row"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(s"unsupported spark type $other")
      }
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  /** Read every Avro container under `glob` (distributed per-file parse;
    * schema from the first container's header). */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(glob).select("content")
    val head = bin.head.getAs[Array[Byte]](0)
    val schemaJson = {
      val ds = new DataFileStream(new ByteArrayInputStream(head),
        new GenericDatumReader[GenericRecord]())
      try ds.getSchema.toString finally ds.close()
    }
    val sch = sparkSchema(new Schema.Parser().parse(schemaJson))
    val n = sch.length
    val rdd = bin.rdd.flatMap { r =>
      val avro = new Schema.Parser().parse(schemaJson)
      val ds = new DataFileStream(new ByteArrayInputStream(r.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord](avro))
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try while (ds.hasNext) {
        val rec = ds.next()
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) { vals(i) = fromAvro(rec.get(i)); i += 1 }
        out += Row.fromSeq(vals.toIndexedSeq)
      } finally ds.close()
      out
    }
    spark.createDataFrame(rdd, sch)
  }

  private def fromAvro(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other
  }

  /** Write `df` as one Avro container per partition under `path`
    * (overwrites the directory). */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val schemaJson = avroSchema(df.schema).toString
    val n = df.schema.length
    df.rdd.foreachPartition { rows =>
      if (rows.nonEmpty) {
        val avro = new Schema.Parser().parse(schemaJson)
        val part = TaskContext.get().partitionId()
        val file = new Path(f"$path/part-$part%05d.avro")
        val out = file.getFileSystem(conf.value).create(file, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
        w.setCodec(CodecFactory.fromString(codec))
        w.create(avro, out)
        try rows.foreach { row =>
          val rec = new GenericData.Record(avro)
          var i = 0
          while (i < n) { rec.put(i, toAvro(row.get(i))); i += 1 }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  private def toAvro(v: Any): Any = v match {
    case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
    case other => other
  }
}
