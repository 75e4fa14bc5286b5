package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Pins Tables.load's canonical-type contract for `events.ts`.
  *
  * The driver's testdata generator has shipped two physical parquet
  * encodings of `ts` across rounds (TIMESTAMP(NANOS) surfacing as int64
  * nanos, then plain timestamp[us] surfacing as TIMESTAMP_NTZ), and a
  * UTC-adjusted timestamp[us] is the third plausible one. A loader that
  * normalizes only one encoding turns a silent testdata change into an
  * analysis-time failure in every query that calls unix_millis/unix_micros
  * on `ts` — exactly what broke 3 queries at the round-6 boundary. This
  * spec writes the events schema in all three encodings, loads each via
  * Tables.load, and asserts one canonical type AND identical epoch values.
  */
class TimestampContractSpec extends SparkSpec {

  // fixed micros values spanning the testdata's range; chosen off-second
  // so sub-second precision is exercised
  private val micros = Seq(1704067200123456L, 1717171717999999L, 1735689599000001L)

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    import spark.implicits._
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    base.select($"event_id", tsCol.cast(tsType).as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedTs(dir: String): (DataType, Seq[Long]) = {
    val df = Tables.load(spark, dir, "events")
    val t = df.schema("ts").dataType
    val vals = df.orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    (t, vals)
  }

  test("all three observed ts encodings load as TimestampType with identical epoch values") {
    import spark.implicits._
    val root = Files.createTempDirectory("ts_contract").toString

    // encoding 1: int64 nanos (what TIMESTAMP(NANOS) surfaces as under
    // spark.sql.legacy.parquet.nanosAsLong)
    writeEvents(s"$root/nanos", ($"us" * 1000L), LongType)
    // encoding 2: timestamp[us] without UTC adjustment → TIMESTAMP_NTZ
    writeEvents(s"$root/ntz", timestamp_micros($"us"), TimestampNTZType)
    // encoding 3: UTC-adjusted timestamp[us] → TimestampType (Spark default)
    writeEvents(s"$root/utc", timestamp_micros($"us"), TimestampType)

    val results = Seq("nanos", "ntz", "utc").map(e => e -> loadedTs(s"$root/$e"))
    results.foreach { case (enc, (t, _)) =>
      assert(t == TimestampType, s"encoding $enc surfaced ts as $t, not TimestampType")
    }
    results.foreach { case (enc, (_, vals)) =>
      assert(vals == micros, s"encoding $enc changed epoch values: $vals vs $micros")
    }
  }

  test("non-events tables pass through untouched") {
    val df = Tables.load(spark, sfDir, "lineitem")
    assert(df.columns.nonEmpty && df.schema.fields.forall(_.name != "ts"))
  }
}
