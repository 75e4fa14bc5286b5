package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion robustness: the three malformed-record policies a production
  * loader needs (quarantine, drop, fail-loud) on JSON-lines input. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("_corrupt_record", StringType)))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft_ingest").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "name": "ok-one"}
        |{"id": 2 "name": "missing-comma"}
        |{"id": 3, "name": "ok-three"}
        |not json at all
        |""".stripMargin)
    dir
  }

  test("PERMISSIVE mode quarantines corrupt lines in _corrupt_record") {
    val dir = writeFixture()
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/data.jsonl")
      .cache() // corrupt-record column requires a materialized read
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(bad.count() == 2)
    // the quarantined raw line is preserved verbatim for replay/debugging
    assert(bad.select("_corrupt_record").collect()
      .exists(_.getString(0).contains("not json at all")))
    df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows") {
    val dir = writeFixture()
    val df = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/data.jsonl")
    assert(df.count() == 2)
  }

  test("ingestion rate control: maxFilesPerTrigger bounds each micro-batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rate").toString + "/in"
    (1 to 3).foreach(i => Seq((i.toLong, s"f$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir))
    val sch = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.format("memory").queryName("rate_ctl")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // backlog of 3 files drains one file per micro-batch — the backfill
      // throttle that keeps a catch-up from flooding downstream state
      val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batches.length == 3 && batches.forall(_ == 1L),
        s"expected 3 batches of 1 row: ${batches.toSeq}")
      assert(spark.table("rate_ctl").count() == 3)
    } finally q.stop()
  }

  test("FAILFAST surfaces the first corrupt line as an error") {
    val dir = writeFixture()
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST")
        .json(s"$dir/data.jsonl")
        .count()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
