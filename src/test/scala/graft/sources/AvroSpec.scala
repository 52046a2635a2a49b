package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the avro-core container source/sink: primitive + nullable-union
  * round trip, per-partition file bounding, schema mapping both ways,
  * and binary payloads. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("round trip: primitives, nulls, multi-partition file bound") {
    val df = Seq(
      (1L, "alpha", 1.5, true, Option("x")),
      (2L, "beta", -2.0, false, Option.empty[String]),
      (3L, "gamma", 0.0, true, Option("z")),
      (4L, "delta", 7.25, false, Option("w")))
      .toDF("id", "name", "score", "flag", "opt")
      .repartition(2)
    val dir = Files.createTempDirectory("graft-avro").toString + "/t1"
    Avro.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 2) // one container per partition
    val back = Avro.read(spark, s"$dir/*.avro")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType,
        "flag" -> BooleanType, "opt" -> StringType))
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
    assert(back.filter($"opt".isNull).count() === 1L)
  }

  test("schema mapping round-trips: nullable <-> [null, T] union") {
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", IntegerType, nullable = true),
      StructField("d", FloatType, nullable = false)))
    assert(Avro.sparkSchema(Avro.avroSchema(st)) === st)
  }

  test("binary payloads survive byte-exact") {
    val df = Seq((1L, Array[Byte](0, 1, -1, 127)), (2L, Array[Byte]()))
      .toDF("id", "payload")
    val dir = Files.createTempDirectory("graft-avro").toString + "/t2"
    Avro.write(df, dir, codec = "snappy")
    val back = Avro.read(spark, s"$dir/*.avro")
      .orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]]("payload").toSeq === Seq[Byte](0, 1, -1, 127))
    assert(back(1).getAs[Array[Byte]]("payload").toSeq === Seq.empty[Byte])
  }
}
