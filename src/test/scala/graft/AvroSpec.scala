package graft

import java.nio.file.Files

import graft.sources.AvroSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container-file source/sink (SURVEY.md §2.1 S1 wire format):
  * schema mapping both directions, value fidelity incl. nulls / unicode /
  * bytes / arrays, multi-file parallel read, unsupported-type rejection. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("roundtrip: nulls, unicode strings, bytes, arrays survive bit-exact") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("tags", ArrayType(LongType, containsNull = false), nullable = true)))
    val rows = Seq(
      Row(1L, "plain", 1.5, true, Array[Byte](1, 2, 3), Seq(10L, 20L)),
      Row(2L, "uniçødé ☃", null, null, null, null),
      Row(3L, null, -0.0, false, Array.empty[Byte], Seq.empty[Long]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("graft_avro_spec").toString
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().map(_.toSeq.map(norm))
    val b = back.orderBy("id").collect().map(_.toSeq.map(norm))
    assert(a.toSeq == b.toSeq)
  }

  private def norm(v: Any): Any = v match {
    case bytes: Array[Byte] => bytes.toSeq
    case s: scala.collection.Seq[_] => s.map(norm)
    case other => other
  }

  test("multi-file read: one writer partition per file, all records seen") {
    val df = spark.range(0, 1000).repartition(7)
      .select(col("id"), concat(lit("row-"), col("id")).as("label"))
    val dir = Files.createTempDirectory("graft_avro_multi").toString
    AvroSource.write(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 7)
    val back = AvroSource.read(spark, dir)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head().getLong(0) == 499500L)
    assert(back.filter(col("label") === "row-123").count() == 1)
  }

  test("schema mapping rejects nested records; nullable maps to [null,T] union") {
    val nested = StructType(Seq(StructField("inner",
      StructType(Seq(StructField("x", LongType))), nullable = true)))
    intercept[IllegalArgumentException] {
      AvroSource.toAvroSchema(nested)
    }
    val avro = AvroSource.toAvroSchema(StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", StringType, nullable = false))))
    assert(avro.getField("a").schema().getType ==
      org.apache.avro.Schema.Type.UNION)
    assert(avro.getField("b").schema().getType ==
      org.apache.avro.Schema.Type.STRING)
    // and back
    val st = AvroSource.toStructType(avro)
    assert(st("a").nullable && st("a").dataType == LongType)
    assert(st("b").dataType == StringType)
  }

  test("a single multi-block file splits on sync markers: >1 task, every record exactly once") {
    // ONE writer partition -> ONE container file; a tiny sync interval
    // forces many blocks/markers inside it
    val df = spark.range(0, 20000).coalesce(1)
      .select(col("id"), concat(lit("payload-"), col("id")).as("label"))
    val dir = Files.createTempDirectory("graft_avro_split").toString
    AvroSource.write(df, dir, syncIntervalBytes = 2048)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, s"expected one file: ${files.toSeq}")
    val fileLen = files.head.length()
    // split ~8 ways
    val back = AvroSource.read(spark, dir, splitBytes = fileLen / 8 + 1)
    assert(back.rdd.getNumPartitions > 1,
      s"single file not split: ${back.rdd.getNumPartitions} partitions")
    // no record lost or duplicated across split boundaries
    assert(back.count() == 20000)
    assert(back.select("id").distinct().count() == 20000)
    assert(back.agg(sum("id")).head().getLong(0) == 199990000L)
    // more than one split actually carries rows (blocks distribute)
    val nonEmpty = back.rdd.mapPartitions(it => Iterator(it.size))
      .collect().count(_ > 0)
    assert(nonEmpty > 1, s"all rows landed in one split: $nonEmpty")
    // degenerate splits (range smaller than a block) still lose nothing
    val tiny = AvroSource.read(spark, dir, splitBytes = 1500)
    assert(tiny.count() == 20000)
    assert(tiny.select("id").distinct().count() == 20000)
  }

  test("lineitem projection roundtrips against the parquet original") {
    val li = sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val dir = Files.createTempDirectory("graft_avro_li").toString
    AvroSource.write(li, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.count() == li.count())
    // exact content equality, order-independent
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }
}
