package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * [[bruteForceTopK]] is the exact baseline: query-side broadcast ×
  * full scan, dot products inside codegen via `zip_with`/`aggregate`
  * higher-order functions (no UDF). Cost O(|Q|·N) — correct at any
  * scale where |Q| is small, and the reference answer for recall
  * measurement.
  *
  * [[lshTopK]] is the scale path: random-hyperplane LSH. Each vector
  * hashes to a bucket of sign bits; neighbor candidates come from an
  * equality join on the bucket key, so the pair space is linear-ish in
  * N with bucket-bounded fan-in, and only candidates pay a dot product.
  * Hyperplane components are deterministic ±1 derived from xxhash64, so
  * results are reproducible across runs and engines.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a codegen'd fold. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact top-k cosine neighbors for the query vectors selected by
    * `queryPred`. Output (qid, rank, neighbor_id, cos) with cosine
    * rounded to 4 places and ranked on the rounded value (stable across
    * engines), vec_id as tiebreak.
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column,
      k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val q = e.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("n2").as("qn2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", round(dot(col("qv"), col("v")) /
        (sqrt(col("qn2")) * sqrt(col("n2"))), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer (k-means cells) plus
    * probe-nearest-cells search — the other classic ANN scale shape.
    *
    * The quantizer trains with `iters` Lloyd iterations expressed as
    * DataFrame ops: assign = broadcast-join vectors × centroids +
    * windowed argmin; recompute = posexplode to (cell, dim) → avg →
    * re-assemble arrays. Centroid init is deterministic (the nlist
    * lowest vec_ids), so results are reproducible. At scale the
    * centroid side stays tiny (nlist × dim) and always broadcasts;
    * the vectors are never collected.
    *
    * Search: queries probe their `nprobe` nearest cells, candidates
    * come from an equality join on the cell id, and only candidates
    * pay an exact cosine. Recall is measured against the brute force
    * in LlmSpec.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))

    def sqDist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    // cell assignment of every vector against a (cell, c) centroid frame
    def assign(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d"), col("cell"))
      e.crossJoin(broadcast(cents))
        .withColumn("d", sqDist(col("v"), col("c")))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("v"), col("n2"), col("cell"))
    }

    var cents = e.orderBy("vec_id").limit(nlist)
      .select(row_number().over(Window.orderBy("vec_id")).as("cell"),
        col("v").as("c"))
    (0 until iters).foreach { _ =>
      cents = assign(cents)
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .groupBy("cell").agg(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("c"))
    }

    val assigned = assign(cents)
    val queries = e.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("n2").as("qn2"))
    val qw = Window.partitionBy(col("qid")).orderBy(col("d"), col("cell"))
    val probed = queries.crossJoin(broadcast(cents))
      .withColumn("d", sqDist(col("qv"), col("c")))
      .withColumn("rk", row_number().over(qw))
      .where(col("rk") <= nprobe)
      .select(col("qid"), col("qv"), col("qn2"), col("cell"))

    val scored = assigned.join(probed, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("cos", round(dot(col("qv"), col("v")) /
        (sqrt(col("qn2")) * sqrt(col("n2"))), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
  }

  val numTables = 4
  val bitsPerTable = 4

  /** Deterministic ±1 hyperplane component for (plane, dim). */
  private def planeSign(p: Int, j: Column): Column =
    when(pmod(xxhash64(lit(p), j), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-bit bucket key for one hash table (AND over bitsPerTable
    * hyperplanes).
    */
  private def tableBucket(v: Column, table: Int): Column =
    (0 until bitsPerTable).map { b =>
      val p = table * bitsPerTable + b
      val d = aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
        (x, j) => x * planeSign(p, j)), lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (table, bucket) rows for a vector frame — the OR-construction:
    * candidates are vectors sharing ANY table's bucket, so recall
    * grows with numTables while each bucket stays selective.
    */
  private def withBuckets(e: DataFrame): DataFrame =
    e.select(col("*"), explode(array((0 until numTables).map(t =>
      struct(lit(t).as("table"), tableBucket(col("v"), t).as("bucket"))): _*))
      .as("tb"))
      .select(col("*"), col("tb.table"), col("tb.bucket")).drop("tb")

  /** Bucketed ANN: exact cosine, but only among candidates sharing an
    * LSH bucket in at least one of the hash tables. Same output
    * contract as [[bruteForceTopK]]; recall < 1 by construction
    * (measured in ScalaTest against the brute force).
    */
  def lshTopK(embeddings: DataFrame, queryPred: Column,
      k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
    val eb = withBuckets(e)
    val qb = withBuckets(e.where(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("n2").as("qn2")).withColumnRenamed("qv", "v"))
      .withColumnRenamed("v", "qv")
    val scored = eb.join(qb, Seq("table", "bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qn2"), col("vec_id"),
        col("v"), col("n2"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("cos", round(dot(col("qv"), col("v")) /
        (sqrt(col("qn2")) * sqrt(col("n2"))), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
  }
}
