package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** HyperLogLog registers with fixed, deterministic hashing — the counter the
  * reference's HyperBall runs on (`process_webgraph.sh:255-257`,
  * `webgraph_config.sh:14-28`: `--log2m` 10-12).
  *
  * Registers are a plain `Array[Byte]` so they travel through Spark
  * aggregations as BinaryType with zero custom serialization.
  */
object Hll {

  /** splitmix64 — deterministic 64-bit mix (public-domain constant set). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def emptyRegisters(log2m: Int): Array[Byte] = new Array[Byte](1 << log2m)

  /** Registers for a single element (a node id). */
  def singleton(value: Long, log2m: Int): Array[Byte] = {
    val regs = emptyRegisters(log2m)
    add(regs, value, log2m)
    regs
  }

  def add(regs: Array[Byte], value: Long, log2m: Int): Unit = {
    val h = mix64(value)
    val idx = (h >>> (64 - log2m)).toInt
    val w = h << log2m
    val rho = (if (w == 0) 64 - log2m else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  /** In-place register-max merge of b into a; returns a. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Standard HLL estimate with linear-counting small-range correction. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** Register-max merge aggregator (`TypedImperativeAggregate` capability via
  * the typed `Aggregator` API): merges HLL register arrays column-wise.
  */
class HllMergeAgg(log2m: Int) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Hll.emptyRegisters(log2m)
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    if (in == null) buf else Hll.merge(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
