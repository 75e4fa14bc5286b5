package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation operators for 100 TB shuffles.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most runtime
  * skew; these are the *explicit* formulations for cases AQE can't see —
  * a priori known hot keys, or aggregations whose single hot group would
  * bottleneck one reducer.
  *
  * Both are deterministic: the salt is derived by hashing a caller-chosen
  * column (never rand()), so replays and retries produce identical
  * results.
  */
object Skew {

  /** Equi-join with salted replication: the large side's rows are salted
    * by `hash(saltSource) % buckets`; the small side is replicated once
    * per bucket. The shuffle key becomes (key, salt), spreading a hot key
    * over `buckets` reducers. Result is exactly the plain equi-join. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
                     buckets: Int, saltSource: Column): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Band join with NO equi-key — all (a, b) pairs with
    * |val_a − val_b| ≤ delta — via the bucket trick: bucket width =
    * delta, probe side exploded to bucket ± 1, exact residual filtered
    * in the join. Every qualifying unordered pair is found EXACTLY once
    * (|Δ| ≤ delta ⇒ buckets differ by ≤ 1; the three exploded buckets
    * are distinct; id_a < id_b keeps one orientation), through an
    * EQUI-join — never the nested-loop plan a raw inequality join gets.
    * Cost: 3n shuffled rows + Σ|bucket|² (data-density-bounded).
    * `div` truncation is orientation-consistent for negative values too
    * (both sides bucket with the same div), covered by the randomized
    * PropertySpec sweep. Returns (id_a, id_b, delta_abs). */
  def bandJoinPairs(df: DataFrame, idCol: String, valCol: String,
                    delta: Long): DataFrame = {
    // delta = 0 makes `__c div 0` NULL in non-ANSI mode (silent empty
    // join); negative delta inverts the bucket semantics — fail loudly
    require(delta > 0, s"bandJoinPairs requires delta > 0, got $delta")
    val base = df.select(col(idCol).as("__k"), col(valCol).as("__c"))
    val left = base.withColumn("__bucket", expr(s"__c div $delta"))
    val right = base.select(col("__k").as("__k2"), col("__c").as("__c2"))
      .withColumn("__bucket", explode(array(
        expr(s"__c2 div $delta - 1"),
        expr(s"__c2 div $delta"),
        expr(s"__c2 div $delta + 1"))))
    left.join(right, Seq("__bucket"))
      .filter(col("__k") < col("__k2") &&
        abs(col("__c") - col("__c2")) <= delta)
      .select(col("__k").as("id_a"), col("__k2").as("id_b"),
        abs(col("__c") - col("__c2")).as("delta_abs"))
  }

  /** Two-phase (salted) count+sum aggregation: phase 1 groups by
    * (keys, salt) — spreading a hot group across reducers — phase 2
    * combines the partials. Equivalent to a direct groupBy; Spark's own
    * partial aggregation usually suffices, but when a single group's
    * *final* aggregation state is huge (e.g. exact-distinct sets), the
    * explicit two-phase form is the scale-out. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                     buckets: Int, saltSource: Column): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets.toLong)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }
}
