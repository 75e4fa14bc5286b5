package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the driver's local[32] harness but every knob is chosen for
  * cluster scale-out semantics: AQE on (runtime shuffle-partition coalescing
  * + skew-join splitting), shuffle partitions sized to cores not the 200
  * default, UTC session time.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // the events table stores TIMESTAMP(NANOS) which vanilla Spark
      // rejects; read as long and convert in the loader (Tables.load)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // fresh warehouse per JVM: the in-memory catalog starts empty every
      // run, so a leftover on-disk table location from a previous run
      // would make saveAsTable throw LOCATION_ALREADY_EXISTS (and a
      // warehouse inside the repo checkout is pollution anyway)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse_").toString)

  /** RocksDB state store provider (ships with Spark core; rocksdbjni is on
    * the classpath). The 100 TB streaming-state answer: per-key state
    * spills to local disk instead of executor heap — required once
    * aggregation state (e.g. distinct sets) outgrows memory. Set it on a
    * session before starting stateful queries:
    * `spark.conf.set(StateStoreProviderConf, RocksDbProvider)`. */
  val StateStoreProviderConf = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
