package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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

  /** Product quantization: split each `dim`-dimensional vector into `m`
    * contiguous subvectors and encode each as the id of its nearest
    * sub-codebook entry (L2, tie-break lowest cell id). The codebook is
    * any full-dimension centroid table (cell, centroid) — e.g.
    * [[Similarity.centroids]] label means — sliced per subspace, the
    * IVF-PQ construction that makes billion-scale ANN storable: dim
    * floats become m small ints.
    *
    * Returns (id, code0..code{m-1}, recon_mse) where recon_mse is the
    * total squared reconstruction error / dim.
    *
    * Shape at scale: the codebook is tiny and broadcast; scoring is a
    * narrow map over (vector, subspace) rows with codegen dot products
    * (d² = ⟨s,s⟩ − 2⟨s,c⟩ + ⟨c,c⟩); the argmin is a struct-min
    * aggregation keyed on (id, subspace). No shuffle touches the vectors
    * themselves beyond the per-id rollup. */
  def pqCodes(vectors: DataFrame, cents: DataFrame, m: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, "dim must divide into m equal subspaces")
    val sub = dim / m
    val vecs = Par.fanOut(vectors)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("sv", slice(col("v"), col("j") * sub + 1, lit(sub)))
      .select("id", "j", "sv")
    val subc = cents
      .select(col("cell"), col("centroid").cast("array<double>").as("cv"))
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("scv", slice(col("cv"), col("j") * sub + 1, lit(sub)))
      .select("j", "cell", "scv")
    val scored = vecs.join(broadcast(subc), "j")
      .withColumn("d2", VectorFunctions.dot(col("sv"), col("sv"))
        - lit(2.0) * VectorFunctions.dot(col("sv"), col("scv"))
        + VectorFunctions.dot(col("scv"), col("scv")))
    // argmin as a lexicographic struct-min aggregation — same
    // (d2 asc, cell asc) tie-break as a rank-1 window. Struct MIN plans
    // as a SortAggregate (struct ordering has no codegen), but rows are
    // fixed-width, partial aggregation runs map-side, and only (id, j)
    // groups cross the exchange — vs the window's full shuffle-and-sort
    // of all |V|·m·k scored rows (d2 can't be -0.0: an exact-match
    // cancellation yields +0.0 in IEEE, so struct ordering == sort order)
    val best = scored.groupBy("id", "j")
      .agg(min(struct(col("d2"), col("cell"))).as("b"))
      .select(col("id"), col("j"), col("b.d2").as("d2"), col("b.cell").as("cell"))
    val codeCols = (0 until m).map(k =>
      max(when(col("j") === k, col("cell"))).cast("int").as(s"code$k"))
    best.groupBy("id")
      .agg(codeCols.head, (codeCols.tail :+
        (sum(col("d2")) / dim).as("recon_mse")): _*)
  }
}
