package graft.ext

import breeze.linalg.{diag, eigSym, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding whitening (ZCA) and Mahalanobis outlier scoring — the
  * decorrelation step ahead of cosine-based dedup/retrieval (SemDeDup-
  * style pipelines) and the principled "is this embedding corrupt"
  * monitor.
  *
  * Scale shape: the only corpus-wide work is ONE aggregation whose
  * state is dim + dim² + 1 cells (per-row mean/outer-product terms
  * flatten into a single exploded sum — partial aggregation reduces
  * every partition to that fixed-size state before the one shuffle), so
  * the job is dim²-bounded regardless of corpus size. The
  * eigendecomposition is a driver-side dim×dim step (microseconds at
  * embedding dims — this is NOT a driver-side data loop), and the
  * projection back over the corpus is a narrow per-row map of `dim`
  * codegen'd dot products ([[graft.functions.DotProduct]]). Nothing
  * quadratic in rows anywhere.
  */
object Whiten {

  /** The moment CELLS of a vector column as a (k, s) frame —
    * [Σx_0..Σx_{d-1}, all d² Σ xᵢxⱼ row-major, n], computed by the
    * fused [[graft.functions.VectorMoments]] aggregate: each partition
    * reduces to ONE flat d²+d+1 buffer (the treeAggregate-a-Gram-matrix
    * pattern), so the shuffle carries one ~33 KB blob per partition at
    * d = 64 — dim²-bounded regardless of corpus size. Cells are purely
    * ADDITIVE, which is what makes the whitening fit mergeable state:
    * cells(A ∪ B) = cells(A) + cells(B) cell-wise (see
    * [[graft.streaming.StreamingPipeline.embeddingMomentsBatch]]). */
  def momentCells(df: DataFrame, vecCol: String): DataFrame =
    df.agg(graft.functions.VectorMomentFunctions
        .vectorMoments(col(vecCol)).as("c"))
      .select(posexplode(col("c")).as(Seq("k", "s")))

  /** Decode a collected cell vector (ordered by k) into (n, mean, cov). */
  def decodeCells(sums: Array[Double]): (Long, Array[Double], DenseMatrix[Double]) = {
    val dim = ((math.sqrt(4.0 * sums.length - 3) - 1) / 2).round.toInt
    require(dim * dim + dim + 1 == sums.length,
      s"inconsistent moment vector: ${sums.length} cells")
    val n = sums.last.round
    val mean = Array.tabulate(dim)(i => sums(i) / n)
    val cov = DenseMatrix.tabulate(dim, dim) { (i, j) =>
      sums(dim + i * dim + j) / n - mean(i) * mean(j)
    }
    (n, mean, cov)
  }

  /** Corpus moments of a vector column in ONE pass: (n, mean,
    * covariance). Covariance is the biased (1/n) sample covariance —
    * the convention under which whitening with the SAME corpus gives
    * sample covariance exactly I and mean Mahalanobis² exactly dim
    * (the trace identity the oracle pins). */
  def moments(df: DataFrame, vecCol: String): (Long, Array[Double], DenseMatrix[Double]) =
    decodeCells(momentCells(df, vecCol)
      .orderBy("k").collect().map(_.getDouble(1)))

  /** The ZCA whitening matrix W = U diag(1/√(λ+eps)) Uᵀ: symmetric, and
    * of all whitening transforms the one closest to the identity —
    * whitened vectors stay interpretable in the original axes. `eps`
    * regularizes near-null directions (a rank-deficient covariance
    * otherwise explodes them). */
  def zcaMatrix(cov: DenseMatrix[Double], eps: Double): DenseMatrix[Double] = {
    val es = eigSym(cov)
    val scale = es.eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    es.eigenvectors * diag(scale) * es.eigenvectors.t
  }

  /** Append `outCol` = W·(x − μ): the whitened embedding. Runs the
    * [[moments]] job once, then projects with `dim` codegen'd dot
    * products per row — the W rows ride the plan as dim-sized literals. */
  def whitened(df: DataFrame, vecCol: String, outCol: String = "white",
               eps: Double = 1e-9): DataFrame = {
    val (_, mean, cov) = moments(df, vecCol)
    val w = zcaMatrix(cov, eps)
    project(df, vecCol, outCol, mean, w)
  }

  /** The projection step alone, for a precomputed (mean, W) — the
    * incremental/streaming shape: fit on the validation corpus once,
    * broadcast the dim×dim matrix forever after. */
  def project(df: DataFrame, vecCol: String, outCol: String,
              mean: Array[Double], w: DenseMatrix[Double]): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedlit(mean), (x, m) => x - m)
    val rows = (0 until w.rows).map { i =>
      VectorFunctions.dot(typedlit(w(i, ::).t.toArray), centered)
    }
    df.withColumn(outCol, array(rows: _*))
  }

  /** Append `outCol` = squared Mahalanobis distance (x−μ)ᵀΣ⁻¹(x−μ),
    * computed as ‖W(x−μ)‖² with the ZCA W (eps-regularized inverse) —
    * the covariance-aware outlier score: large values mark embeddings
    * far from the corpus cloud along ANY direction, including
    * directions where raw Euclidean distance is blind because the
    * corpus variance there is tiny. E[score] = dim exactly when scored
    * against the same corpus the moments came from. */
  def mahalanobisSq(df: DataFrame, vecCol: String, outCol: String = "m2",
                    eps: Double = 1e-9): DataFrame = {
    val (_, mean, cov) = moments(df, vecCol)
    val w = zcaMatrix(cov, eps)
    // fresh scratch name: silently replacing (then dropping) a caller's
    // own "_wh" column would lose their data
    val tmp = Iterator.from(0).map(i => s"_wh$i")
      .find(n => !df.columns.contains(n)).get
    project(df, vecCol, tmp, mean, w)
      .withColumn(outCol, VectorFunctions.normSq(col(tmp)))
      .drop(tmp)
  }
}
