package graft.similarity

/** Product-quantization codebook training — driver-side Lloyd's k-means
  * over a BOUNDED sample, the standard FAISS recipe: even for a 10^11-
  * vector corpus, PQ codebooks train on ~10^5 sampled vectors (here the
  * whole fixture corpus, a few hundred KB). Distributed k-means buys
  * nothing for 16-centroid × 8-dim subproblems and costs ~90 Spark jobs
  * (8 fits × init + iterations); a seeded local loop is deterministic,
  * instant, and keeps the ENCODE and SEARCH paths pure codegen column
  * expressions over the codebook literal — no ML UDFs anywhere.
  */
object Pq {

  private def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Seeded Lloyd's iterations; empty clusters keep their centroid. */
  def trainCodebook(points: IndexedSeq[Array[Double]], k: Int,
      iters: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    require(points.length >= k, s"need >= $k training points, got ${points.length}")
    val rnd = new scala.util.Random(seed)
    val dim = points.head.length
    val centroids = rnd.shuffle(points.indices.toVector).take(k)
      .map(i => points(i).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      points.foreach { p =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = sqdist(p, centroids(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Train one codebook per contiguous subspace of `sub` dims. */
  def trainSubspaces(sample: IndexedSeq[Array[Double]], m: Int, sub: Int,
      k: Int, iters: Int = 10, seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until m).map { mi =>
      trainCodebook(sample.map(_.slice(mi * sub, (mi + 1) * sub)), k, iters, seed + mi)
        .map(_.toSeq).toSeq
    }
}
