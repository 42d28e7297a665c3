package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage/bandwidth
  * lever for ANN at scale: a 64-dim float vector (256 B) becomes 64 bytes
  * plus one float scale, and int8 dot products SIMD-vectorize.
  *
  * Symmetric scheme: scale = 127 / max(|x_i|); q_i = clamp(round(x_i *
  * scale), -127, 127). The +1e-9 epsilon inside the round matches the
  * engine-portability convention used everywhere else in this repo (Spark
  * HALF_UPs the shortest decimal repr, other engines round the binary
  * double; the epsilon moves values off exact halfway points identically
  * on both sides).
  *
  * Expression-shape caveat: `scale` referenced inside the transform()
  * lambda is inlined by CollapseProject and re-evaluated per element, so
  * computing it is O(dim) → quantization is O(dim^2) per vector in the
  * worst case. At dim<=1024 this is still cheap and stays codegen-free
  * (interpreted HOFs); for larger dims promote to a custom codegen
  * Expression like functions.DotProduct.
  */
object Quantize {

  /** max(|x_i|) over an array<float|double> column, as double. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** The quantization scale; 0.0 for all-zero vectors (q is then all 0). */
  def int8Scale(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m === 0.0, lit(0.0)).otherwise(lit(127.0) / m)
  }

  /** The quantized array<int>, elements in [-127, 127]. */
  def int8Quantize(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      least(greatest(round(x.cast("double") * s + lit(1e-9), 0).cast("int"),
        lit(-127)), lit(127)))
  }

  /** Dequantization error bound: |x - q/scale| <= 0.5/scale per element. */
  def dequantize(q: Column, scale: Column): Column =
    when(scale === 0.0, transform(q, _ => lit(0.0)))
      .otherwise(transform(q, x => x.cast("double") / scale))
}
