package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embeddings: x ∈ ℝ^dim ↦
  * (⟨x, p_0⟩, …, ⟨x, p_{outDim−1}⟩) with DETERMINISTIC pseudo-random
  * planes — the same splitmix-style plane generator the sign-LSH
  * banding uses ([[graft.functions.SignBands.planes]]), so the "random"
  * matrix is a pure function of (outDim, dim) that any engine can
  * regenerate bit-identically; components come out e6-floored so the
  * projected vectors themselves hash-compare across engines.
  *
  * This is the training-free dimension reducer: where PCA
  * ([[Pca.fit]]) costs a Gram aggregate + driver eigensolve and is
  * data-dependent (a new corpus shifts the basis), JL projection is
  * map-only, shuffle-free, and STABLE — the projection of a vector
  * never changes as the corpus grows, which is what an incremental
  * 100 TB pipeline wants for pre-filtering distances (JL: pairwise
  * distances are preserved within 1±ε for outDim = O(log n / ε²)).
  * Each output component is one codegen'd [[graft.functions.VectorDot]]
  * against a literal plane row (the unfused SignBands layout — fine at
  * outDim ≤ a few dozen).
  *
  * @return (vec_id, dim_idx, component_e6) — exploded so the result is
  *         scalar-typed for value-level comparison
  */
object RandomProjection {

  def projectE6(embeddings: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int): DataFrame = {
    require(outDim >= 1 && outDim <= 64, "outDim in [1, 64]")
    val planes = graft.functions.SignBands.planes(outDim, dim)
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val comps = (0 until outDim).map { j =>
      val row = java.util.Arrays.copyOfRange(planes, j * dim, (j + 1) * dim)
      floor(Similarity.dot(vecD, typedLit(row.toSeq)) * 1e6).cast("long")
    }
    embeddings.select(col(idCol).as("vec_id"),
      posexplode(array(comps: _*)).as(Seq("dim_idx", "component_e6")))
  }
}
