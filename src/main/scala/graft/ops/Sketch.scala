package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for corpus-scale statistics: cardinality (HLL),
  * heavy hitters (space-saving + exact verify), exact quantiles via the
  * value-histogram trick, and a Bloom seen-filter for the crawl
  * frontier. The common design rule: the only thing that ever crosses
  * an exchange is the SKETCH (O(m) registers / O(k) candidates / O(m)
  * bit positions), never the raw stream — that is what makes each of
  * these a 100 TB operator rather than a groupBy in disguise.
  *
  * All hashing is the repo's portable two-step MINSTD construction
  * (multiply mod 2^31-1, twice — see the corpus_mix commentary in
  * SparkEntry): pure BIGINT arithmetic both engines evaluate
  * identically, no engine-private hash, so every sketch decision is
  * reproducible in the DuckDB oracle and across re-runs/partitionings.
  */
object Sketch {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime, MINSTD modulus)

  /** Portable 31-bit integer hash: two MINSTD steps with multiplier
    * `mult`. One affine step `(a*x) % p` is still order-preserving for
    * x < p/a; the second multiply wraps the modulus even at x = 0
    * (same argument as corpus_mix's split hash).
    */
  def hash31(key: Column, mult: Long): Column =
    pmod(pmod((key.cast("long") + lit(1L)) * lit(mult), lit(P)) * lit(mult), lit(P))

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog distinct-count per group (Flajolet et al. 2007), raw
    * estimator, b index bits (m = 2^b registers).
    *
    * Relational spelling of the register build: one hash projection,
    * then `groupBy(group, register).max(rho)` — partial aggregation
    * collapses each map partition to ≤ m rows per group before the
    * exchange, so the shuffle carries the SKETCH, not the stream. The
    * register table is itself the mergeable artifact: max(rho) over
    * shards of it IS the union sketch (how a 100 TB corpus unions
    * per-shard cardinalities without re-reading anything).
    *
    * Determinism: rho comes from integer bit-length (`length(bin(w))`),
    * and the harmonic sum is EXACT — each register contributes the
    * integer `2^(width+1-rho)` (scale 2^(width+1); empty registers
    * contribute 2^(width+1) ≡ 2^-0), summed as BIGINT: with b=5 the sum
    * is ≤ 32·2^27 = 2^32, nowhere near overflow. Only the final
    * `alpha·m²·C / S` runs in binary64, one correctly-rounded op chain
    * from exact integer inputs — identical in both engines. The raw
    * estimator is used WITHOUT the small-range linear-counting patch
    * (which needs ln(), an engine-divergence risk); callers pick m so
    * that expected cardinality ≳ 2.5·m, the raw estimator's home range.
    *
    * @return (group, est, exact, err_bp): estimate, true distinct (for
    *         the accuracy-visible driver row), error in basis points
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCol: String,
      b: Int = 5, alpha: Double = 0.697): DataFrame = {
    require(b >= 4 && b <= 16, s"b out of range: $b")
    val m = 1 << b
    val width = 31 - b            // bits of the hash left for rho
    val cExp = width + 1          // harmonic-sum scale: C = 2^(width+1)
    val h = hash31(col(keyCol), 48271L)
    val w = expr(s"h div $m")
    val regs = df
      .select(col(groupCol), h.as("h"))
      .select(col(groupCol), pmod(col("h"), lit(m.toLong)).as("reg"),
        when(w === 0L, lit(cExp.toLong))
          .otherwise(lit(cExp.toLong) - length(expr(s"bin(h div $m)")))
          .as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).as("rho"))
    val sums = regs.groupBy(col(groupCol)).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($cExp - rho AS INT))"))
        .as("s_present"),
      count(lit(1)).as("n_regs"))
    val c = math.pow(2.0, cExp).toLong
    val est = sums.select(col(groupCol),
      (col("s_present") + (lit(m.toLong) - col("n_regs")) * lit(c)).as("s"))
      .select(col(groupCol),
        floor(lit(alpha * m * m) * lit(c.toDouble) / col("s").cast("double"))
          .cast("long").as("est"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("exact"))
    est.join(exact, groupCol)
      .select(col(groupCol), col("est"), col("exact"),
        expr("(abs(est - exact) * 10000) div exact").as("err_bp"))
  }

  // ------------------------------------------------- heavy hitters

  /** Whitespace chars matching RE2's \s (NO \x0B — Java's \s has it,
    * RE2's does not), so kernel tokenization and the DuckDB oracle's
    * regexp split agree byte-for-byte.
    */
  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'

  /** Space-saving (Metwally et al. 2005) over one partition's token
    * stream: k counters, evict-min on overflow. Tokenizes INSIDE the
    * kernel — the raw token stream never materializes as rows. Emits
    * candidate tokens as (token, 0) rows plus ONE (null, tokenCount)
    * tally row, so the same pass also yields the exact global token
    * total (summed downstream) without a second scan.
    */
  private def spaceSaving(texts: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, Long](k * 2)
    var seen = 0L
    texts.foreach { t =>
      if (t != null) {
        var i = 0
        val n = t.length
        while (i < n) {
          while (i < n && isWs(t.charAt(i))) i += 1
          val start = i
          while (i < n && !isWs(t.charAt(i))) i += 1
          if (i > start) {
            seen += 1L
            val tok = t.substring(start, i)
            val cur = counts.get(tok)
            if (cur > 0L || counts.containsKey(tok)) counts.put(tok, cur + 1L)
            else if (counts.size < k) counts.put(tok, 1L)
            else {
              // evict the minimum counter, inherit its count + 1 — the
              // space-saving overestimate that preserves the guarantee
              var mk: String = null; var mv = Long.MaxValue
              val it = counts.entrySet().iterator()
              while (it.hasNext) {
                val e = it.next()
                if (e.getValue < mv) { mv = e.getValue; mk = e.getKey }
              }
              counts.remove(mk)
              counts.put(tok, mv + 1L)
            }
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().iterator().asScala.toVector.map((_, 0L)).iterator ++
      Iterator((null: String, seen))
  }

  /** Exact heavy hitters: every whitespace token with global count
    * strictly above totalTokens/k, found without ever shuffling the
    * token stream.
    *
    * Two passes: (1) per-partition space-saving kernels emit ≤ k
    * candidate tokens each (space-saving guarantees any item with local
    * count > N_p/k is among the counters; by pigeonhole any GLOBAL
    * count > N/k exceeds N_p/k in some partition — so candidates ⊇ true
    * heavy hitters under every partitioning); (2) an exact counting
    * pass over candidate tokens only — the explode feeds a BROADCAST
    * semi-join on the ≤ k·parts candidate set, and partial aggregation
    * collapses survivors before the one exchange. The final filter
    * `cnt·k > N` trims sketch overestimates, so the OUTPUT is the exact
    * true heavy-hitter set: deterministic and partitioning-independent
    * even though the intermediate candidates are not.
    */
  def heavyTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE kernel pass yields both the candidate set and the exact
    // global token total (tally rows summed) — checkpointed so the
    // two derived frames below don't re-run the corpus scan each
    val sketch = docs.select(col(textCol)).as[String]
      .mapPartitions(it => spaceSaving(it, k))
      .toDF("token", "tally")
      .localCheckpoint(true)
    val cands = sketch.where(col("token").isNotNull)
      .select(col("token")).distinct()
    val total = sketch.where(col("token").isNull)
      .agg(sum(col("tally")).as("total"))
    val toks = docs.select(
        explode(split(trim(col(textCol)), "[ \t\n\f\r]+")).as("token"))
      .where(col("token") =!= "")
    toks.join(broadcast(cands), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total)) // 1-row exact total from the kernel pass
      .where(col("cnt") * lit(k.toLong) > col("total"))
      .select(col("token"), col("cnt"))
  }

  // ---------------------------------------------- exact quantiles

  /** Exact per-group quantiles by the value-histogram trick: shuffle
    * |distinct values| rows (with map-side partial counts), not |rows|,
    * and never a global sort — the classic way to take an exact p99
    * over 10^12 rows when the value domain is bounded (doc lengths,
    * latencies). Quantile rule, spelled in pure integers on both
    * engines: q = num/den picks the smallest v whose cumulative count
    * satisfies den·cum ≥ num·n (i.e. the ceil(q·n)-th order statistic).
    *
    * @param quantiles (name, num, den) triples, e.g. ("p99", 99, 100)
    */
  def exactQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    // explicit ROWS frame: the histogram has one row per distinct v so
    // RANGE==ROWS here, but spelling ROWS keeps the frame semantics
    // identical to the oracle's by construction, not by accident
    val win = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col(groupCol), col("v"),
      sum(col("c")).over(win).as("cum"),
      sum(col("c")).over(Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("n"))
    val picks = quantiles.map { case (name, num, den) =>
      min(when(col("cum") * lit(den.toLong) >= col("n") * lit(num.toLong),
        col("v"))).as(name)
    }
    cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Mergeable approximate quantiles over a log-scale (HDR-style)
    * histogram: the complement of [[exactQuantiles]] for value domains
    * where |distinct values| is itself huge (byte sizes, latencies in
    * ns) and a per-value histogram would shuffle the domain.
    *
    * Bin rule, pure integers on both engines (3 mantissa bits = 8
    * sub-buckets per octave, relative error < 2^-3):
    *   v < 8          → bin = v                      (exact)
    *   v ≥ 8, e=⌊log2 v⌋ → bin = (e-3)·8 + (v >> (e-3))
    * with e spelled as length(bin(v)) - 1 — the binary-string trick
    * sketch_hll already uses, identical in Spark and DuckDB. The bin's
    * lower bound lb = ((bin%8)+8) << (bin/8 - 1) (lb = bin below 8) is
    * the reported estimate, so est ≤ true quantile ALWAYS and
    * (true-est)/true < 1/8 — a one-sided contract the driver query
    * exposes per row as err_bp ∈ [0, 1250), alongside the exact value.
    *
    * SCALE: the exchange carries ≤ ~8·60 bin partial counts per group
    * per partition regardless of the value domain, and the bin table
    * is the mergeable artifact — per-shard histograms union by SUM,
    * so a 1000-executor fleet ships kilobytes to agree on a p99.
    *
    * @param quantiles (name, num, den) triples, e.g. ("p99", 99, 100);
    *   output columns per quantile: name (estimate), name_exact,
    *   name_err_bp
    */
  def logHistQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = df.select(col(groupCol), col(valueCol).cast("long").as("v"))
      .selectExpr(groupCol,
        "CASE WHEN v < 8 THEN v ELSE (length(bin(v)) - 4) * 8 " +
          "+ shiftright(v, cast(length(bin(v)) - 4 AS int)) END AS b")
    val hist = binned.groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).as("c"))
      .selectExpr(groupCol, "b", "c",
        "CASE WHEN b < 8 THEN b " +
          "ELSE shiftleft(b % 8 + 8, cast(b div 8 - 1 AS int)) END AS lb")
    val win = Window.partitionBy(col(groupCol)).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col(groupCol), col("lb"),
      sum(col("c")).over(win).as("cum"),
      sum(col("c")).over(Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("n"))
    val picks = quantiles.map { case (name, num, den) =>
      // lb is strictly monotone in b, so min(lb | cum qualifies) is the
      // lower bound of the first qualifying bin — the same integer
      // ceil(q·n) rule exactQuantiles applies to raw values
      min(when(col("cum") * lit(den.toLong) >= col("n") * lit(num.toLong),
        col("lb"))).as(name)
    }
    val est = cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
    // accuracy is visible data, not a claim (the sketch_hll/sketch_cm
    // discipline): the exact quantiles ride along with a one-sided
    // relative-error column per quantile
    val exact = exactQuantiles(df, valueCol, groupCol,
      quantiles.map { case (name, nu, de) => (s"${name}_exact", nu, de) })
    val joined = est.join(exact, groupCol)
    val errCols = quantiles.map { case (name, _, _) =>
      when(col(s"${name}_exact") === 0L, 0L)
        .otherwise(expr(s"(($name" + s"_exact - $name) * 10000) div ${name}_exact"))
        .as(s"${name}_err_bp")
    }
    val outCols = Seq(col(groupCol)) ++
      quantiles.flatMap { case (name, _, _) =>
        Seq(col(name), col(s"${name}_exact")) } ++ errCols
    joined.select(outCols: _*)
  }

  // ------------------------------------------------------- Count-Min

  /** Count-Min depth (independent counter rows); the three classic
    * MINSTD-family multipliers give the row hashes.
    */
  val CmMults: Seq[Long] = Seq(48271L, 69621L, 16807L)

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005):
    * d = 3 rows of w counters, est(key) = min over rows of the key's
    * counter. Structurally one-sided: est ≥ exact ALWAYS (collisions
    * only add), which the driver query exposes per row as `over_bp`.
    *
    * Self-sizing (the lshSizing discipline): w = max(64, 2·|distinct
    * keys|), so expected collision mass per counter stays proportional
    * to the MEAN key frequency at any corpus size — a frozen w would
    * degrade per-key relative error linearly with N.
    *
    * Relational build: one projection explodes each event into its d
    * (row, bucket) cells, then `groupBy(j, bucket).count` — partial
    * aggregation bounds every map partition's exchange contribution at
    * d·w rows no matter how many events scan in; the d·w-row sketch
    * then BROADCASTS to the probe side. The only key-cardinality
    * shuffle is the exact per-key count — which is the comparison
    * output itself, not the sketch path.
    */
  def countMinFreq(events: DataFrame, keyCol: String): DataFrame = {
    val keys = events.select(col(keyCol).cast("long").as("k"))
    val dCount = keys.distinct().count() // bounded: one scalar sizes w
    val w = math.max(64L, 2L * dCount)
    def cells(of: Column): Column = explode(array(
      CmMults.zipWithIndex.map { case (m, j) =>
        struct(lit(j).as("j"), pmod(hash31(of, m), lit(w)).as("bucket"))
      }: _*))
    val sketch = keys.select(cells(col("k")).as("jb"))
      .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("c"))
    val exact = keys.groupBy("k").agg(count(lit(1)).as("exact"))
    exact.select(col("k"), col("exact"), cells(col("k")).as("jb"))
      .select(col("k"), col("exact"),
        col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("k", "exact").agg(min(col("c")).as("est"))
      .select(col("k").as(keyCol), col("est"), col("exact"),
        expr("((est - exact) * 10000) div exact").as("over_bp"))
  }

  // ------------------------------------------------ Bloom seen-filter

  /** Number of Bloom probe positions per key. */
  val BloomK = 3

  /** Bits per history key; the filter self-sizes as m = BitsPerKey·|H|
    * (the lshSizing discipline: capacity derives from the live input,
    * never a frozen constant), giving a fixed ~3% false-positive rate
    * at any scale. No power-of-two rounding — positions are `% m`.
    */
  val BloomBitsPerKey = 8L

  /** The key's BloomK probe positions in [0, m): double hashing
    * h1 + i·h2 with h2 forced odd via `(h2 div 2)·2 + 1` (spelled
    * arithmetically, not bitwise, so the oracle matches verbatim).
    */
  def bloomPositions(key: Column, m: Long): Seq[Column] = {
    val h1 = hash31(key, 48271L)
    val h2 = hash31(key, 69621L)
    val h2odd = h2 - pmod(h2, lit(2L)) + lit(1L)
    (0 until BloomK).map(i => pmod(h1 + lit(i.toLong) * h2odd, lit(m)))
  }

  /** Crawl-frontier seen-check: flag which batch keys MAY already be in
    * a large history without joining against it. The history collapses
    * to 64-bit words of OR'd probe bits — a map-side-combinable
    * `groupBy(word).agg(bit_or(mask))` whose output is bounded by m/64
    * rows however many history rows there are — packed into an
    * Array[Long] on the driver (m/8 bytes; the sketch IS the small
    * thing, that's its point) and broadcast as a literal. The batch
    * side then probes via pure codegen bit arithmetic: element_at on
    * the literal word array + shiftrightunsigned — no UDF, no shuffle,
    * no second scan of history. `maybe_seen = false` is definitive
    * (Bloom filters have no false negatives), which is the production
    * contract: definitely-new keys skip the expensive exact anti-join
    * entirely; only `maybe` rows pay it. The driver query also emits
    * `actually_seen` (the exact join) so false positives are visible
    * and the no-false-negative invariant is oracle-checked per row.
    *
    * SCALE ENVELOPE — stated, not implied: the filter is 8 bits per
    * history key, so it is one-machine-broadcastable up to histories of
    * ~10^8–10^9 keys (0.1–1 GB) — the "recent crawl window" tier where
    * a frontier check lives. A full 10^12-key history is 1 TB of bits
    * and does not fit ANY single filter; at that scale the same
    * construction shards by key-hash (each executor holds its shard's
    * words; the batch exchanges once on the same key-hash and probes
    * locally) — the per-shard build below is unchanged, which is why
    * the word aggregation, not the driver packing, is the load-bearing
    * step.
    */
  def bloomSeen(history: DataFrame, batch: DataFrame, keyCol: String): DataFrame = {
    val histN = history.count() // bounded: one scalar, sizes the filter
    val m = math.max(BloomBitsPerKey * histN, 64L)
    val nWords = ((m + 63) / 64).toInt
    val posCols = bloomPositions(col(keyCol), m)
    // one row per SET WORD leaves the cluster (<= m/64, map-side
    // combined) — never one per key or per probe position
    val wordRows = history.select(
        explode(array(posCols: _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy("w").agg(expr("bit_or(mask)").as("mask"))
      .collect()
    val words = new Array[Long](nWords)
    wordRows.foreach(r => words(r.getLong(0).toInt) |= r.getLong(1))
    val wCol = "_bloom_w"
    val pCol = (i: Int) => s"_bloom_p$i"
    val withPos = batch.select(col("*") +: typedLit(words.toSeq).as(wCol) +:
      posCols.zipWithIndex.map { case (c, i) => c.as(pCol(i)) }: _*)
    val probe = (0 until BloomK).map { i =>
      expr(s"pmod(shiftrightunsigned(element_at($wCol, CAST(${pCol(i)} div 64 AS INT) + 1), " +
        s"CAST(${pCol(i)} % 64 AS INT)), 2) = 1")
    }.reduce(_ && _)
    // helper columns dropped by the same BloomK-derived list that
    // created them — a BloomK bump cannot leak a _bloom_pN column
    withPos.select(col("*"), probe.as("maybe_seen"))
      .drop(wCol +: (0 until BloomK).map(pCol): _*)
  }
}
