package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a FRAME operator (Flajolet et
  * al. 2007), completing the sketch shelf beside the KMV distinct
  * estimator ([[BottomKByHash.kmvDistinct]]), the count-min grid
  * ([[CountMinFrame]]) and the bloom membership grid ([[BloomFrame]]):
  * KMV answers "how many distinct" with a mergeable sample, HLL
  * answers it in O(m) REGISTERS with ~1.04/√m relative error — the
  * constant-size running-cardinality shape streaming counters want.
  *
  * Fully deterministic and SQL-re-derivable (the repo's sketch
  * discipline): the hash is md5 — register index = the first 8 bits
  * (m = 256), rank = leading-zero count of the next 48 bits + 1 —
  * and the harmonic-mean denominator is carried as the EXACT integer
  * Σ 2^(49−rank) (≤ m·2^49 < 2^62, no float accumulation), so the
  * estimate is one fixed IEEE division over exact integers. The
  * small-range linear-counting correction (m·ln(m/V)) is deliberately
  * OMITTED: ln is libm-dependent and would break bit-parity across
  * engines; m = 256 keeps fixture-scale cardinalities (thousands)
  * above the ~2.5m small-range cutoff where the raw estimator is
  * already accurate (σ ≈ 1.04/√m ≈ 6.5% — the WAU-counter trade),
  * and callers counting far below m should use the exact path or the
  * KMV sketch instead.
  *
  * Scale shape: one map-side-combined groupBy to (keys × ≤256)
  * register rows, one bounded aggregate per key group — no shuffle
  * ever carries raw values, and register frames MERGE under max (the
  * sketch property: union = register-wise max), so per-partition /
  * per-day register frames roll up without rescanning history.
  */
object HllFrame {

  /** log2(m) register-index bits (a multiple of 4: nibble-sliced). */
  val p = 8

  /** Register count m = 2^p. */
  val m = 256

  /** Value-hash width in bits (the 12 md5 nibbles after the register
    * nibbles). */
  val wBits = 48

  /** Register index of one value — the first p md5 bits. Exposed
    * per-row so the streaming twin ([[graft.stream.DistinctCounter]])
    * derives IDENTICAL registers from the same expressions. */
  def regCol(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, p / 4), 16, 10)
      .cast("int")

  /** Rank of one value — leading-zero count of the next 48 md5 bits
    * + 1; bin() emits no leading zeros, so lz = 48 − len(bin) —
    * except w = 0, where bin is "0" and the rank saturates at 49. */
  def rankCol(value: Column): Column = {
    val w = conv(substring(md5(value.cast("string")), p / 4 + 1,
      wBits / 4), 16, 10).cast("long")
    when(w === 0, wBits + 1)
      .otherwise(lit(wBits + 1) - length(bin(w)))
  }

  /** Per-key register frame: (keys..., reg, mr) with mr = max rank.
    * This is the MERGEABLE sketch state — union more data by unioning
    * frames and re-aggregating max(mr).
    */
  def registers(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.where(value.isNotNull)
      .select(keys.map(col) :+ regCol(value).as("reg") :+
        rankCol(value).as("rank"): _*)
      .groupBy(keys.map(col) :+ col("reg"): _*)
      .agg(max(col("rank")).as("mr"))

  /** Cardinality estimate per key group from a [[registers]] frame:
    * (keys..., n_registers, est). `est` = α·m²/Σ2^(−Mⱼ) with empty
    * registers contributing 2^0 — the raw HLL estimator, see object
    * doc for why no small-range correction is applied.
    */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val sPresent = sum(expr(s"shiftleft(1L, ${wBits + 1} - mr)"))
    val g = regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_registers"),
        sPresent.as("s_present"))
    g.select(keys.map(col) :+ col("n_registers") :+
      estCol.as("est"): _*)
  }

  /** The raw-estimator projection over (n_registers, s_present)
    * columns — [[estimate]]'s arithmetic, exposed so the streaming
    * twin's state-fold output runs through the IDENTICAL fixed IEEE
    * expression (absent registers carry rank 0 → 2^49 each, exact
    * integers end to end; one double division at the edge).
    */
  def estCol: Column = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    val sTotal = col("s_present") +
      (lit(m.toLong) - col("n_registers")) * lit(1L << (wBits + 1))
    round(alpha * m * m * lit(math.pow(2.0, wBits + 1)) / sTotal, 2)
      .cast("float")
  }

  /** One-shot: [[registers]] → [[estimate]]. */
  def distinctEstimate(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame =
    estimate(registers(df, keys, value), keys)
}
