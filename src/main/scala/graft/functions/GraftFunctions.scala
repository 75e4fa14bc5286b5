package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge

/** SQL-surface registration: makes the engine's native expressions
  * callable from `spark.sql(...)` under stable names. A user of the
  * DataFrame API uses the typed wrappers (VectorFunctions / HashFunctions
  * / BoundedDistinct); a SQL user calls these — either per-session via
  * `registerAll` or automatically via `spark.sql.extensions=graft.GraftExtensions`. */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Name → expression builder for every native function the engine
    * exposes to SQL. Single source of truth for both registration routes. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "cosine_similarity_d" -> (es => CosineSimilarityD(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "int8_dot" -> (es => Int8Dot(es(0), es(1))),
    "fnv64" -> (es => Fnv64(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "minhash" -> (es => MinHashSignature(es(0), intLit(es(1), "minhash k"))),
    "minhash_hashes" -> (es => MinHashFromHashes(es(0), intLit(es(1), "minhash k"))),
    "shingle_hashes" -> (es => ShingleHashes(es(0), intLit(es(1), "shingle n"))),
    "linear_margin" -> (es => LinearMargin(es.head)),
    "winnow" -> (es => Winnow(es(0), intLit(es(1), "window"))),
    "es_max_draw" -> (es => EsMaxDraw(es(0), es(1))),
    "gram_matrix" -> (es => GramMatrixAgg(es(0), intLit(es(1), "gram d"))
      .toAggregateExpression(isDistinct = false)),
    "hyperplane_sig" -> (es => HyperplaneSignature(es(0), intLit(es(1), "bits"),
      if (es.length > 2) intLit(es(2), "seed") else 0)),
    "random_projection" -> (es => RandomProjection(es(0), intLit(es(1), "dims"),
      if (es.length > 2) intLit(es(2), "seed") else 0)),
    "mg_candidates" -> (es => MisraGriesCandidates(
      es.head,
      if (es.length > 1) intLit(es(1), "k") else 16)
      .toAggregateExpression(isDistinct = false)),
    "bounded_count_distinct" -> (es => BoundedCountDistinct(
      es.head,
      if (es.length > 1) intLit(es(1), "threshold") else 100000,
      if (es.length > 2) intLit(es(2), "p") else 12)
      .toAggregateExpression(isDistinct = false)),
    "cms_sketch" -> (es => CmsSketchAgg(
      es.head,
      if (es.length > 1) intLit(es(1), "cms depth") else 4,
      if (es.length > 2) intLit(es(2), "cms width") else 1024)
      .toAggregateExpression(isDistinct = false)),
    "cms_cells" -> (es => CmsCells(
      es.head,
      if (es.length > 1) intLit(es(1), "cms depth") else 4,
      if (es.length > 2) intLit(es(2), "cms width") else 1024)),
    "gk_bounds" -> (es => GKQuantileBounds(
      es.head,
      doubleLit(es(1), "gk_bounds eps"),
      doubleArrayLit(es(2), "gk_bounds quantiles"))
      .toAggregateExpression(isDistinct = false)),
    "kmv_sketch" -> (es => KmvSketchAgg(
      es.head,
      if (es.length > 1) intLit(es(1), "kmv k") else 256)
      .toAggregateExpression(isDistinct = false)))

  private def doubleLit(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def doubleArrayLit(e: Expression, what: String): Seq[Double] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map(doubleLit(_, what))
    case other => throw new IllegalArgumentException(
      s"$what must be an array literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
