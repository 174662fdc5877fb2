package graft.ops

/** Cyclic Jacobi eigendecomposition for small symmetric matrices (Golub &
  * Van Loan §8.5, public) — the driver-side numerics behind
  * [[SimilarityOps.whiten]]. Embedding dims are bounded (d ≤ a few
  * hundred) however large the corpus, so an O(d³) dense driver solve is
  * the right tool: no cluster dependency, no MLlib fit, deterministic for
  * a fixed input (sweep order is fixed, no randomness).
  */
object Eigen {

  /** Eigendecomposition of symmetric `a` (not mutated). Returns
    * `(values, vectors)` with `vectors(i)(k)` = component i of the k-th
    * eigenvector, i.e. columns are eigenvectors: A·v_k = λ_k·v_k
    * (unit-gated in WhiteningSpec). Sweeps run until the off-diagonal
    * Frobenius mass falls below `tol` relative to the diagonal, capped at
    * `maxSweeps` (a cyclic sweep converges quadratically; 15 is far past
    * what a covariance matrix needs).
    */
  def jacobi(a: Array[Array[Double]], tol: Double = 1e-14,
             maxSweeps: Int = 15): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2.0 * m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      s
    }
    def diagMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { s += m(i)(i) * m(i)(i); i += 1 }
      math.max(s, 1e-300)
    }

    var sweep = 0
    while (sweep < maxSweeps && offDiag() > tol * diagMass()) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (apq != 0.0) {
            // rotation angle zeroing m(p)(q): standard stable formulation
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → t = 1
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }
}
