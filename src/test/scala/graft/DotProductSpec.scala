package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product expression vs the higher-order-function fold
  * it replaces: values must be bit-identical (same summation order) in
  * both the codegen and interpreted paths, across float/double arrays
  * and null/empty edges.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fold(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("matches the zip_with fold bit-for-bit on random double arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("native"),
        fold(col("a"), col("b")).as("fold"))
    assert(df.where(col("native") =!= col("fold")).count() == 0)
  }

  test("SqDiffSum matches the squared-diff fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(graft.functions.SqDiffSum(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("fold"))
    assert(df.where(col("native") =!= col("fold")).count() == 0)
  }

  test("array-level float->double cast equals the transform cast") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = Seq.fill(50)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
      .toDF("a")
      .select(col("a").cast("array<double>").as("whole"),
        transform(col("a"), _.cast("double")).as("per_elem"))
    assert(df.where(col("whole") =!= col("per_elem")).count() == 0)
  }

  test("float arrays promote per element like the cast-then-fold path") {
    import spark.implicits._
    val df = Seq((Array(1.5f, 2.5f, -3f), Array(2f, 4f, 1f)))
      .toDF("a", "b")
      .select(
        DotProduct(col("a"), col("b")).as("native"),
        fold(transform(col("a"), _.cast("double")),
          transform(col("b"), _.cast("double"))).as("fold"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == 10.0)
  }

  test("null array yields NULL; empty arrays yield 0.0") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("registered as SQL function dot_product") {
    import spark.implicits._
    graft.functions.TaFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("dp_in")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM dp_in").collect()
    assert(r(0).getDouble(0) == 11.0)
  }

  test("registered SQL surface: quantize_i8, quantized_dot, bottom_k_sketch") {
    import spark.implicits._
    graft.functions.TaFunctions.register(spark)
    Seq((1L, Array(1.0, -2.0, 0.5)), (2L, Array(0.5, 0.25, -1.0)))
      .toDF("id", "v").createOrReplaceTempView("qk_in")
    val q = spark.sql(
      "SELECT quantized_dot(quantize_i8(v), quantize_i8(v)) AS n2 FROM qk_in")
      .collect().map(_.getInt(0))
    // scale = 2/127: codes (64, -127, 32) -> 4096 + 16129 + 1024
    assert(q.toSeq == Seq(21249, 21249))
    val sk = spark.sql(
      "SELECT bottom_k_sketch(CAST(id AS DOUBLE), id, 5) AS vs FROM qk_in")
      .collect()(0).getSeq[Double](0)
    assert(sk.toSet == Set(1.0, 2.0))
  }

  test("GraftExtensions injects the round-5 functions into a new session") {
    // build a SECOND session over the same SparkContext with the
    // extensions applied at construction (getOrCreate only applies
    // extensions to a NEW session, so clear + restore the defaults —
    // suites run sequentially in the forked test JVM)
    import org.apache.spark.sql.SparkSession
    val base = spark // force TestSpark init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      import s2.implicits._
      Seq((1L, Array(1.0, -2.0, 0.5))).toDF("id", "v")
        .createOrReplaceTempView("ext_in")
      val n2 = s2.sql(
        "SELECT quantized_dot(quantize_i8(v), quantize_i8(v)) FROM ext_in")
        .collect()(0).getInt(0)
      assert(n2 == 21249)
      val sk = s2.sql(
        "SELECT bottom_k_sketch(CAST(id AS DOUBLE), id, 3) FROM ext_in")
        .collect()(0).getSeq[Double](0)
      assert(sk == Seq(1.0))
      // the pre-existing injections resolve in the same session
      assert(s2.sql("SELECT dot_product(v, v) FROM ext_in")
        .collect()(0).getDouble(0) == 5.25)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path via an expression position codegen
    // cannot reach uniformly: eval through a literal-driven projection
    import org.apache.spark.sql.GraftSqlShims
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = ArrayData.toArrayData(Array(1.0, 2.0, 3.0))
    val b = ArrayData.toArrayData(Array(4.0, 5.0, 6.0))
    val e = graft.functions.DotProduct(
      Literal(a, ArrayType(DoubleType)), Literal(b, ArrayType(DoubleType)))
    assert(e.eval(null) == 32.0)
    val _ = GraftSqlShims // keep import used
  }

  test("KernelRewrite: HOF dot-product fold optimizes to the native kernel") {
    import spark.implicits._
    import graft.functions.KernelRewrite
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ KernelRewrite
    try {
      // parquet-backed source: a LocalRelation would be constant-folded
      // away before the plan assertion could see the rewrite
      val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      val v = col("embedding").cast("array<double>")
      // opt-in gate: with the flag at its default (false) the rule is
      // installed but inert — user SQL keeps exact HOF semantics
      val gated = embs.select(fold(v, v).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(!gated.contains("dot_product"), gated)
      spark.conf.set(KernelRewrite.EnabledKey, "true")
      val df = embs.select(col("vec_id"), fold(v, v).as("d"))
      // the optimized plan carries the kernel, not the interpreted HOF
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"), optimized)
      assert(!optimized.contains("aggregate("), optimized)
      // and the rewritten result equals the native kernel's directly
      val direct = embs.select(col("vec_id"),
        graft.functions.DotProduct(v, v).as("d"))
      assert(df.exceptAll(direct).count() == 0 &&
        direct.exceptAll(df).count() == 0)
      // the squared-difference fold rewrites to sq_diff_sum
      val sq = embs.select(
        aggregate(zip_with(v, v, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"))
      assert(sq.queryExecution.optimizedPlan.toString
        .contains("sq_diff_sum"))
      // strictness: a non-matching fold (seed 1.0) is left untouched
      val other = embs.select(
        aggregate(zip_with(v, v, (x, y) => x * y),
          lit(1.0), (acc, x) => acc + x).as("d"))
      assert(!other.queryExecution.optimizedPlan.toString
        .contains("dot_product"))
    } finally {
      spark.conf.unset(KernelRewrite.EnabledKey)
      spark.experimental.extraOptimizations = before
    }
  }
}
