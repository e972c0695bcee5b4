package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the production shape for 100 TB embedding
  * search (faiss IVF+PQ): vectors compress to `m` one-byte codes (one
  * per subspace, nearest sub-centroid by L2), and queries score against
  * codes via asymmetric distance computation (ADC) — per-subspace
  * lookup tables built once per query, no vector reconstruction in the
  * hot loop. A 64-dim float vector becomes 8 bytes: 32× compression,
  * which is what makes a 10^9-vector index fit a cluster's memory.
  *
  * Scoring here is cosine against the RECONSTRUCTION (concatenated
  * sub-centroids), decomposed exactly: dot(q, recon) = Σ_m dot(q_m, c_m)
  * and ||recon||² = Σ_m ||c_m||² — both per-subspace table lookups. The
  * decomposition is what the DuckDB oracle recomputes from the same
  * committed codebook literals.
  *
  * Codebooks train offline on a bounded sample (deterministic Lloyd,
  * same discipline as Similarity.kmeansTrainSample) and are committed
  * as a text artifact.
  */
object Pq {

  /** codebooks(s)(j) = centroid j of subspace s (subDim doubles). */
  type Codebooks = Array[Array[Array[Double]]]

  /** Deterministic per-subspace Lloyd training on the first
    * `sampleSize` vectors (vec_id order). Assignment = L2, ties to the
    * lowest index (strict <, first wins — the SQL list_position-of-min
    * rule); update = plain mean; empty cluster keeps its centroid.
    */
  def train(embeddings: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 5,
      sampleSize: Int = 4096): Codebooks = {
    val sample = embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleSize)
      .collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      var centroids = Array.tabulate(k)(j => subs(j * subs.length / k).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        var i = 0
        while (i < subs.length) {
          val c = nearestSub(subs(i), centroids)
          var d = 0
          while (d < subDim) { sums(c)(d) += subs(i)(d); d += 1 }
          counts(c) += 1
          i += 1
        }
        centroids = Array.tabulate(k)(j =>
          if (counts(j) == 0) centroids(j) else sums(j).map(_ / counts(j)))
        it += 1
      }
      centroids
    }
  }

  /** Deterministic random rotation (the OPQ-RR baseline of Ge et al.
    * 2013: decorrelate dimensions before product quantization so no
    * subspace hoards the variance): hash-noise rows orthonormalized by
    * modified Gram-Schmidt. A pure function of (dim, seed) — both the
    * kernel and the SQL-oracle generator derive the identical binary64
    * matrix, no artifact file needed. Rotation preserves dots/norms, so
    * ADC cosine scores stay directly comparable to the unrotated path.
    */
  def rotationMatrix(dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    def noise(i: Int, j: Int): Double = {
      var h = seed * 0x9e3779b97f4a7c15L + i * 0xff51afd7ed558ccdL + j
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
      (h >>> 11).toDouble * 1.1102230246251565e-16 * 2.0 - 1.0
    }
    val r = Array.tabulate(dim, dim)((i, j) => noise(i, j))
    var i = 0
    while (i < dim) {
      // two projection passes ("twice is enough", Kahan/Parlett): one
      // pass leaves O(eps/residual) error when the row is nearly in the
      // span of its predecessors (the last rows of a square matrix
      // always are); the second pass removes the amplified component
      var pass = 0
      while (pass < 2) {
        var k = 0
        while (k < i) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += r(i)(j) * r(k)(j); j += 1 }
          j = 0
          while (j < dim) { r(i)(j) -= dot * r(k)(j); j += 1 }
          k += 1
        }
        pass += 1
      }
      var n = 0.0; var j = 0
      while (j < dim) { n += r(i)(j) * r(i)(j); j += 1 }
      val inv = 1.0 / math.sqrt(n)
      j = 0
      while (j < dim) { r(i)(j) *= inv; j += 1 }
      i += 1
    }
    r
  }

  /** out(i) = dot(r(i), v) in ascending-j order, rounded to FLOAT —
    * the same binary32 round-trip the SQL oracle spells as ::FLOAT.
    */
  def rotateVec(v: Array[Float], r: Array[Array[Double]]): Array[Float] = {
    require(r.length == v.length,
      s"rotation dim ${r.length} != vector dim ${v.length}")
    val out = new Array[Float](r.length)
    var i = 0
    while (i < r.length) {
      var d = 0.0; var j = 0
      while (j < v.length) { d += r(i)(j) * v(j); j += 1 }
      out(i) = d.toFloat
      i += 1
    }
    out
  }

  /** Shuffle-free rotation pass: same (vec_id, embedding) shape out,
    * so the whole PQ pipeline composes unchanged downstream.
    */
  def rotate(embeddings: DataFrame, r: Array[Array[Double]]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, rotateVec(v, r)) })
      .toDF("vec_id", "embedding")
  }

  /** argmin-L2 with the first-minimal tie rule (strict <). */
  private def nearestSub(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val x = v(i) - cs(j)(i); d += x * x; i += 1 }
      if (d < bestD) { best = j; bestD = d }
      j += 1
    }
    best
  }

  /** Encode every vector to its m byte codes — one shuffle-free map
    * (codebooks ride the closure: m*k*subDim doubles).
    */
  def encode(embeddings: DataFrame, cb: Codebooks): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val m = cb.length
    val subDim = cb(0)(0).length
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val codes = new Array[Byte](m)
        var s = 0
        while (s < m) {
          val sub = new Array[Double](subDim)
          var i = 0
          while (i < subDim) { sub(i) = v(s * subDim + i); i += 1 }
          codes(s) = nearestSub(sub, cb(s)).toByte
          s += 1
        }
        (id, codes)
      })
      .toDF("vec_id", "codes")
  }

  /** ADC top-k over an encoded index: per-subspace dot and norm lookup
    * tables built ONCE from the query (m*k doubles), then each candidate
    * costs m byte-indexed adds. Returns (vec_id, score_bp) with the
    * floor-basis-point cosine vs the reconstruction.
    */
  def adcTopK(encoded: DataFrame, cb: Codebooks, query: Array[Float],
      k: Int = 10): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val m = cb.length
    val subDim = cb(0)(0).length
    val q = query.map(_.toDouble)
    var qn = 0.0
    q.foreach(x => qn += x * x)
    val qNorm = math.sqrt(qn)
    // lookup tables: dot(q_s, c) and ||c||^2 per (subspace, code)
    val dotT = Array.tabulate(m, cb(0).length) { (s, j) =>
      var d = 0.0
      var i = 0
      while (i < subDim) { d += q(s * subDim + i) * cb(s)(j)(i); i += 1 }
      d
    }
    val normT = Array.tabulate(m, cb(0).length) { (s, j) =>
      var n = 0.0
      var i = 0
      while (i < subDim) { n += cb(s)(j)(i) * cb(s)(j)(i); i += 1 }
      n
    }
    encoded.select(col("vec_id").cast("long"), col("codes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, codes) =>
        var dot = 0.0
        var nrm = 0.0
        var s = 0
        while (s < m) {
          val c = codes(s) & 0xff
          dot += dotT(s)(c)
          nrm += normT(s)(c)
          s += 1
        }
        val denom = qNorm * math.sqrt(nrm)
        val score = if (denom == 0.0) 0.0 else dot / denom
        (id, math.floor(score * 10000).toLong)
      })
      .toDF("vec_id", "score_bp")
      .orderBy(desc("score_bp"), asc("vec_id"))
      .limit(k)
  }

  /** IVF+PQ index build — the full faiss production shape: one
    * shuffle-free pass assigns each vector its coarse cell (cosine, ties
    * to the lowest index, matching Similarity.ivfIndex) AND its m PQ
    * byte codes. At serving time a query probes nprobe cells and
    * ADC-scores only those cells' codes: scan cost ~nprobe/k of the
    * corpus, at 32x-compressed width.
    */
  def ivfPqIndex(embeddings: DataFrame, centroids: Array[Array[Double]],
      cb: Codebooks): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val m = cb.length
    val subDim = cb(0)(0).length
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val cell = Similarity.nearestCentroid(v.map(_.toDouble), centroids)
        val codes = new Array[Byte](m)
        var s = 0
        while (s < m) {
          val sub = new Array[Double](subDim)
          var i = 0
          while (i < subDim) { sub(i) = v(s * subDim + i); i += 1 }
          codes(s) = nearestSub(sub, cb(s)).toByte
          s += 1
        }
        (id, cell, codes)
      })
      .toDF("vec_id", "cell", "codes")
  }

  /** IVF+PQ top-k: prune to the nprobe nearest cells (driver-side over
    * the tiny centroid table, same rule as Similarity.ivfTopK), then
    * ADC-score the survivors.
    */
  def ivfPqTopK(index: DataFrame, centroids: Array[Array[Double]],
      cb: Codebooks, query: Array[Float], k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    val q = query.map(_.toDouble)
    val probes = centroids.indices
      .map { j =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < q.length) {
          dot += q(i) * centroids(j)(i); na += q(i) * q(i)
          nb += centroids(j)(i) * centroids(j)(i); i += 1
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        (j, if (den == 0.0) 0.0 else dot / den)
      }
      .sortBy { case (j, s) => (-s, j) }
      .take(nprobe).map(_._1)
    adcTopK(index.where(col("cell").isin(probes: _*)), cb, query, k)
  }

  /** Codebooks ↔ committed text artifact: one line per sub-centroid,
    * `s,j,v1,...,vD` (Double.toString round-trips, so SQL literals built
    * from the file equal the kernel's binary64 values).
    */
  def toLines(cb: Codebooks): String = {
    val sb = new StringBuilder
    for (s <- cb.indices; j <- cb(s).indices)
      sb.append(s).append(',').append(j).append(',')
        .append(cb(s)(j).mkString(",")).append('\n')
    sb.toString
  }

  def fromFile(path: String): Codebooks = {
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").split("\n").filter(_.nonEmpty)
    val parsed = lines.map { l =>
      val parts = l.split(",")
      (parts(0).toInt, parts(1).toInt, parts.drop(2).map(_.toDouble))
    }
    val m = parsed.map(_._1).max + 1
    val k = parsed.map(_._2).max + 1
    val cb = Array.ofDim[Array[Double]](m, k)
    parsed.foreach { case (s, j, v) => cb(s)(j) = v }
    // validate density + uniform sub-dim: a truncated/hand-edited
    // artifact must fail HERE with an artifact-corruption message, not
    // as an opaque NPE inside an encode/adcTopK executor
    val subDim = parsed.head._3.length
    for (s <- 0 until m; j <- 0 until k) {
      val v = cb(s)(j)
      require(v != null,
        s"corrupt PQ codebook artifact $path: missing line for subspace=$s centroid=$j " +
          s"(expected ${m}x$k dense)")
      require(v.length == subDim,
        s"corrupt PQ codebook artifact $path: subspace=$s centroid=$j has dim ${v.length}, " +
          s"expected $subDim")
    }
    cb
  }

  /** Symmetric per-vector int8 SCALAR quantization — the other
    * standard embedding-compression point next to PQ: 4× smaller
    * (float32 → int8 + one scale), near-lossless recall, trivially
    * reversible (v_i ≈ code_i · scale / 127), where PQ's 32× trades
    * recall for memory. A 10^9-vector float32 table is 256 GB; int8
    * is 64 GB — the difference between spilling and serving.
    *
    * code_i = floor(v_i / maxAbs · 127 + 0.5), scale = maxAbs — all
    * binary64 arithmetic identical across engines (float→double is
    * exact, one divide + multiply + floor, no libm), so a SQL oracle
    * reproduces every code bit-for-bit. Zero vectors quantize to all
    * zeros with scale 0. Pure per-row kernel, zero exchanges; codes
    * are a BINARY column (the honest 4× on the wire and at rest).
    *
    * @return (vec_id, scale, codes) — codes byte-per-dimension
    */
  def int8Quantize(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        var ma = 0.0
        var i = 0
        while (i < v.length) {
          val a = math.abs(v(i).toDouble); if (a > ma) ma = a; i += 1
        }
        val codes = new Array[Byte](v.length)
        if (ma > 0) {
          i = 0
          while (i < v.length) {
            codes(i) = math.floor(v(i).toDouble / ma * 127.0 + 0.5).toByte
            i += 1
          }
        }
        (id, ma, codes)
      }
      .toDF("vec_id", "scale", "codes")
  }
}
