package graft.similarity

/** Deterministic symmetric eigendecomposition for OPQ rotation training
  * (sq17): cyclic Jacobi with a fixed sweep order and sweep count — no
  * randomness, no convergence-dependent branching, so the rotation a
  * given corpus sample produces is bit-reproducible across runs. Sized
  * for the driver-side d×d problems codebook training already does
  * (d = embedding dim, 64 here): one sweep is O(d³), 30 sweeps of a
  * 64×64 matrix is ~8M flops — trivial next to the Lloyd's loops.
  */
object Eig {

  /** Eigen-decompose symmetric `a0`. Returns (eigenvalues, eigenvectors)
    * with eigenvector k as ROW k, aligned with eigenvalue k. Not sorted.
    * Off-diagonals below 1e-12 are skipped (already annihilated). */
  def jacobiSym(a0: Array[Array[Double]], sweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-12) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // stable tan(φ) of the annihilating rotation (Golub & Van
            // Loan §8.4); the θ≥0 branch avoids catastrophic cancellation
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < n) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - sn * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = sn * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    val evals = Array.tabulate(n)(i => a(i)(i))
    // column k of v is eigenvector k — transpose to row-major
    val rows = Array.tabulate(n, n)((k, i) => v(i)(k))
    (evals, rows)
  }

  /** OPQ-P eigenvalue allocation (Ge et al. 2014 §5.1, "Optimized
    * Product Quantization", parametric solution): distribute the
    * eigenvectors over `m` buckets of `sub` dims each so the PRODUCT of
    * eigenvalues per bucket balances — equalizing subspace variance so
    * no subquantizer is starved or overloaded. Greedy in descending
    * eigenvalue order onto the non-full bucket with the smallest
    * log-variance sum (ties broken by bucket index — deterministic).
    * Returns the dimension order: bucket 0's dims first, etc. */
  def eigenAllocation(evals: Array[Double], m: Int, sub: Int): Seq[Int] = {
    require(evals.length == m * sub, s"${evals.length} dims != $m x $sub")
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val logSum = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(Vector.empty[Int])
    for (idx <- order) {
      val b = (0 until m)
        .filter(buckets(_).length < sub)
        .minBy(b => (logSum(b), b))
      buckets(b) = buckets(b) :+ idx
      logSum(b) += math.log(math.max(evals(idx), 1e-30))
    }
    buckets.toSeq.flatten
  }
}
