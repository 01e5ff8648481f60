package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** The deterministic Jacobi eigensolver + OPQ-P eigenvalue allocation
  * behind sq17: eigenpairs must satisfy A·v = λ·v, the basis must be
  * orthonormal, and the allocation must balance per-bucket log-variance
  * against the descending-order strawman. */
class EigSpec extends AnyFunSuite {

  private def matvec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(a.length)(i => a(i).indices.map(j => a(i)(j) * v(j)).sum)

  test("jacobiSym recovers eigenpairs of a known 3x3 symmetric matrix") {
    // eigenvalues of [[2,1,0],[1,2,1],[0,1,2]] are 2 and 2±sqrt(2)
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (evals, evecs) = Eig.jacobiSym(a)
    val expected = Seq(2.0 - math.sqrt(2), 2.0, 2.0 + math.sqrt(2))
    assert(evals.sorted.zip(expected).forall { case (x, y) => math.abs(x - y) < 1e-10 })
    for (k <- 0 until 3) {
      val av = matvec(a, evecs(k))
      val lv = evecs(k).map(_ * evals(k))
      assert(av.zip(lv).forall { case (x, y) => math.abs(x - y) < 1e-9 },
        s"A·v != λ·v for eigenpair $k")
    }
  }

  test("jacobiSym basis is orthonormal on a seeded random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val n = 16
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      m(i)(j) = rnd.nextGaussian(); m(j)(i) = m(i)(j)
    }
    val (evals, evecs) = Eig.jacobiSym(m)
    for (i <- 0 until n; j <- i until n) {
      val dot = (0 until n).map(k => evecs(i)(k) * evecs(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"v${i}.v${j} = $dot, want $want")
    }
    // trace is preserved by similarity transforms
    val trace = (0 until n).map(i => m(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-9)
  }

  test("jacobiSym is deterministic across calls") {
    val rnd = new scala.util.Random(11)
    val n = 8
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      m(i)(j) = rnd.nextGaussian(); m(j)(i) = m(i)(j)
    }
    val (e1, v1) = Eig.jacobiSym(m)
    val (e2, v2) = Eig.jacobiSym(m)
    assert(e1.sameElements(e2))
    assert(v1.indices.forall(i => v1(i).sameElements(v2(i))))
  }

  test("sq17: OPQ rotation balances variance and does not lose recall") {
    val spark = graft.TestSpark.spark
    val row = graft.queries.SimilarityQueries.sq17AnnOpqRecall
      .fn(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_queries") == 20L)
    val rPq = row.getAs[Double]("recall_pq")
    val rOpq = row.getAs[Double]("recall_opq")
    // deterministic on the fixture (seeded Lloyd's, fixed Jacobi sweeps):
    // measured 0.73 plain / 0.76 rotated — assert with slack below the
    // measured values, plus the A/B direction itself
    assert(rOpq >= 0.70, s"recall_opq $rOpq below floor")
    assert(rOpq >= rPq, s"rotation lost recall: $rOpq < $rPq")
    val sNat = row.getAs[Double]("log_var_spread_natural")
    val sOpq = row.getAs[Double]("log_var_spread_opq")
    assert(sOpq < sNat / 2,
      s"allocation spread $sOpq not well below contiguous $sNat")
  }

  test("sq19: whitening restores covariance isotropy on the fixture") {
    val spark = graft.TestSpark.spark
    val row = graft.queries.SimilarityQueries.sq19WhiteningAudit
      .fn(spark, "/root/testdata/sf0.001").head()
    val rawShare = row.getAs[Double]("cov_offdiag_share_raw")
    val whiteShare = row.getAs[Double]("cov_offdiag_share_white")
    // the fixture's embeddings carry strong low-rank structure, so the
    // raw covariance is off-diagonal dominated; whitening must collapse
    // that share by orders of magnitude
    assert(rawShare > 0.5, s"raw off-diagonal share $rawShare unexpectedly low")
    assert(whiteShare < 0.05, s"whitened off-diagonal share $whiteShare too high")
    val c = row.getAs[Double]("avg_abs_cos_white")
    assert(c > 0.0 && c < 0.5, s"whitened mean |cos| $c out of sane range")
  }

  test("eigenAllocation balances per-bucket log-variance vs contiguous order") {
    // strongly skewed spectrum: contiguous split piles the variance into
    // bucket 0; the allocation must spread it
    val evals = Array.tabulate(16)(i => math.pow(2.0, 15 - i))
    val alloc = Eig.eigenAllocation(evals, m = 4, sub = 4)
    assert(alloc.sorted == (0 until 16).toList, "a permutation of the dims")
    def spread(order: Seq[Int]): Double = {
      val sums = (0 until 4).map(b =>
        (0 until 4).map(j => math.log(evals(order(b * 4 + j)))).sum)
      sums.max - sums.min
    }
    val contiguous = spread(0 until 16)
    val balanced = spread(alloc)
    assert(balanced < contiguous / 4,
      s"allocation spread $balanced not far below contiguous $contiguous")
  }
}
