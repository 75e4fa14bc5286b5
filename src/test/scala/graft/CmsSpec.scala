package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMinFunctions

/** Count–Min sketch: the grid must be a true mergeable sketch (bit-equal
  * under any partitioning), every point estimate a one-sided
  * overestimate, and both functions reachable from SQL. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    .select(col("l_partkey").cast("string").as("key"))

  test("grid is partition-order independent (element-wise-add merges)") {
    def grid(parts: Int): Seq[Long] =
      li.repartition(parts)
        .agg(CountMinFunctions.cmsSketch(col("key")).as("g"))
        .as[Seq[Long]].head()
    val g1 = grid(1)
    assert(g1.length === 4 * 1024)
    assert(g1 === grid(7))
    assert(g1 === grid(32))
  }

  test("every key's estimate is a one-sided overestimate of its exact count") {
    val exact = li.groupBy("key").agg(count(lit(1)).as("exact"))
    val grid = li.agg(CountMinFunctions.cmsSketch(col("key")).as("grid"))
    val bad = exact.crossJoin(grid)
      .withColumn("cells", CountMinFunctions.cmsCells(col("key")))
      .withColumn("est", array_min(transform(sequence(lit(0), lit(3)),
        r => element_at(col("grid"),
          (r * 1024 + element_at(col("cells"), r + 1) + 1).cast("int")))))
      .filter(col("est") < col("exact"))
    assert(bad.count() === 0L)
    // and the grid's row sums all equal the total row count (every input
    // row increments exactly one counter per row of the grid)
    val n = li.count()
    val g = li.agg(CountMinFunctions.cmsSketch(col("key")).as("g"))
      .as[Seq[Long]].head()
    (0 until 4).foreach { r =>
      assert(g.slice(r * 1024, (r + 1) * 1024).sum === n, s"row $r mass")
    }
  }

  test("cms_sketch and cms_cells are callable from SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    li.limit(200).createOrReplaceTempView("cms_in")
    val gsz = spark.sql(
      "SELECT size(cms_sketch(key, 4, 1024)) FROM cms_in").head().getInt(0)
    assert(gsz === 4096)
    val cells = spark.sql(
      "SELECT cms_cells('hello', 4, 1024)").as[Seq[Long]].head()
    assert(cells.length === 4)
    assert(cells.forall(c => c >= 0L && c < 1024L))
  }
}
