package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Crawl-corpus maintenance operators: incremental snapshot diffing,
  * incoming-anchor-text aggregation, and deterministic stratified
  * sampling.
  *
  * These are the jobs that run BETWEEN crawls of a living corpus
  * (the reference's crawl-discovery epic,
  * /root/reference/research/epics/epic-001-web-crawling-discovery.md,
  * sketches the recrawl loop this tooling serves): decide what changed
  * since the last snapshot, aggregate the link-anchor evidence that
  * describes each page from the outside, and draw reproducible
  * per-stratum samples for eval sets / manual audits.
  *
  * Shared scale discipline: document text never crosses an exchange.
  * The diff shuffles 32-byte digests, the anchor summary shuffles
  * pre-aggregated (target, anchor, count) rows, the sampler shuffles
  * ≤ k·partitions candidate (stratum, key, hash) triples.
  */
object CrawlOps {

  /** Snapshot diff between two crawls of the same url space: classifies
    * every key as added / removed / changed / unchanged by content
    * digest.
    *
    * The input frames carry full text, but each side is REDUCED to
    * (key, sha256 digest) before the join, so the full-outer join — the
    * only exchange — moves fixed-width rows. At 10^12 pages this is the
    * standard incremental-recrawl primitive: both sides co-partition on
    * the key and the diff costs one digest-wide shuffle, not a corpus
    * rewrite. (With both snapshots stored bucketed by `keyCol` the
    * exchange disappears entirely; the operator leaves that to the
    * table layout.)
    *
    * Digest, not equality-on-text, deliberately: comparing text columns
    * directly would ship document bodies to the join; comparing
    * digests ships 32 bytes and is what a manifest table can persist
    * between runs.
    *
    * @return (keyCol, status, old_digest, new_digest), digests hex
    *         sha256 (null on the side where the key is absent)
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldSnap.select(col(keyCol),
      sha2(col(textCol), 256).as("old_digest"))
    val n = newSnap.select(col(keyCol),
      sha2(col(textCol), 256).as("new_digest"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_digest"), col("new_digest"))
  }

  /** Incoming anchor-text summary per link target: in-degree (distinct
    * sources), total mentions, and the most frequent anchor string
    * (ties broken by anchor ascending — a total, engine-independent
    * order).
    *
    * Anchor text is the classic external description of a page (search
    * and quality pipelines weigh it above the page's own words). The
    * input is one row per link (u, v, anchor); at web scale that table
    * is ~10^13 rows, so the shapes matter:
    *  - per-anchor counts: groupBy(v, anchor) with map-side partial
    *    combine — the exchange carries aggregated counts, and anchor
    *    vocabulary per target is small (people link with few phrases);
    *  - top anchor: a keyed window over the ALREADY-AGGREGATED
    *    (v, anchor, cnt) rows — never over raw links;
    *  - in-degree: distinct (u, v) then count — the same width as the
    *    edge list, the unavoidable cost of an exact distinct degree.
    * All three aggregates share the join key v, so post-shuffle they
    * co-partition and the final joins add no exchange under AQE.
    *
    * @param links columns `u: long, v: long, anchor: string`
    * @return (doc_id = v, in_degree, mentions, top_anchor, top_cnt)
    */
  def anchorSummary(links: DataFrame): DataFrame = {
    val perAnchor = links.groupBy(col("v"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy(col("v"))
      .orderBy(col("cnt").desc, col("anchor"))
    val top = perAnchor
      .select(col("v"), col("anchor"), col("cnt"),
        row_number().over(win).as("rn"))
      .where(col("rn") === 1)
      .select(col("v"), col("anchor").as("top_anchor"),
        col("cnt").as("top_cnt"))
    val deg = links.select(col("v"), col("u")).distinct()
      .groupBy(col("v")).agg(count(lit(1)).as("in_degree"))
    // mentions = Σ per-anchor counts — derived from perAnchor instead
    // of a third full pass over the link table (whose derivation may be
    // an arbitrary caller plan, e.g. anchor_topk's text split); the
    // (v, anchor) exchange is shared with `top` via exchange reuse
    val mentions = perAnchor.groupBy(col("v"))
      .agg(sum(col("cnt")).as("mentions"))
    deg.join(mentions, Seq("v")).join(top, Seq("v"))
      .select(col("v").as("doc_id"), col("in_degree"),
        col("mentions"), col("top_anchor"), col("top_cnt"))
  }

  /** MINSTD double-step hash — the repo's portable integer hash (same
    * arithmetic the LSH band keys, Bloom probes and PageRank targets
    * use): a fixed pseudo-random priority both engines can recompute
    * exactly in BIGINT.
    */
  private[graft] def priorityOf(key: Long): Long = {
    val p = 2147483647L
    (((key + 1L) * 48271L) % p) * 48271L % p
  }

  /** Per-partition bounded candidate pass for [[stratifiedSample]]:
    * keeps the k smallest (priority, key) pairs per stratum in a
    * size-capped max-heap — O(rows·log k) time, O(k·|strata|) memory,
    * and ≤ k rows emitted per (partition, stratum).
    */
  private[graft] def partialSample(
      it: Iterator[(String, Long)], k: Int): Iterator[(String, Long, Long)] = {
    // max-heap on (priority, key): the root is the WORST kept candidate
    val cmp = new java.util.Comparator[Array[Long]] {
      def compare(a: Array[Long], b: Array[Long]): Int = {
        val c = java.lang.Long.compare(b(0), a(0))
        if (c != 0) c else java.lang.Long.compare(b(1), a(1))
      }
    }
    val heaps = new java.util.HashMap[String, java.util.PriorityQueue[Array[Long]]]()
    while (it.hasNext) {
      val (stratum, key) = it.next()
      var h = heaps.get(stratum)
      if (h == null) {
        h = new java.util.PriorityQueue[Array[Long]](k + 1, cmp)
        heaps.put(stratum, h)
      }
      val pri = priorityOf(key)
      if (h.size < k) h.add(Array(pri, key))
      else {
        val worst = h.peek()
        if (pri < worst(0) || (pri == worst(0) && key < worst(1))) {
          h.poll(); h.add(Array(pri, key))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.flatMap { e =>
      e.getValue.iterator().asScala.map(a => (e.getKey, a(1), a(0)))
    }
  }

  /** Deterministic without-replacement sample of k keys per stratum:
    * the k smallest portable-hash priorities win, so the draw is
    * uniform-pseudo-random yet bit-reproducible across engines, runs
    * and partitionings (no RNG, no seed plumbing) — the property an
    * eval-set draw must have to be auditable.
    *
    * Two phases, the heavyTokens discipline: (1) per-partition capped
    * heaps emit ≤ k candidates per (partition, stratum) — the global
    * k smallest per stratum are each smallest in their own partition,
    * so candidates ⊇ winners under every partitioning; (2) one keyed
    * window ranks the ≤ k·partitions survivors. At 10^12 rows the
    * exchange carries k·partitions fixed-width triples instead of the
    * corpus — a raw row_number-over-everything would shuffle every row.
    *
    * @return (strataCol, keyCol, rk) with rk in 1..k by priority order
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val cands = df
      .select(col(strataCol).cast("string"), col(keyCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions(it => partialSample(it, k))
      .toDF(strataCol, keyCol, "pri")
    val win = Window.partitionBy(col(strataCol))
      .orderBy(col("pri"), col(keyCol))
    cands.select(col(strataCol), col(keyCol),
        row_number().over(win).cast("long").as("rk"))
      .where(col("rk") <= k)
      .select(col(strataCol), col(keyCol), col("rk"))
  }

  /** URL blocklist filter — the UT1/RefinedWeb-style gate every webtext
    * pipeline runs before spending extraction compute. Two entry kinds
    * (the shape of the public UT1 category lists):
    *
    *  - kind = "domain": blocks the host itself AND every subdomain
    *    (label-boundary suffix match — "host-7.example" blocks
    *    "ads.host-7.example" but NOT "xhost-7.example");
    *  - kind = "prefix": blocks "host/first-path-segment" exactly
    *    (section-level blocks: "host-11.example/shop").
    *
    * SCALE: never a regex/LIKE scan against the list. The host explodes
    * into its label-boundary suffix chain (≤ a handful of labels), and
    * both kinds resolve as EQUI-joins against the BROADCAST blocklist —
    * per-row work is O(labels), independent of list size, and the fact
    * side never shuffles. When several entries match, the winner is
    * deterministic: longest entry (most specific), then entry, then
    * category — picked with a map-side-combinable min(struct) agg, not
    * a window.
    *
    * @param pages     frame with a `url` column (plus any carry-through
    *                  key column(s) — output keeps `keyCol`)
    * @param blocklist (entry, category, kind) — tiny, broadcast
    * @return (keyCol, url, blocked, category, matched_entry)
    */
  def urlFilter(pages: DataFrame, blocklist: DataFrame,
      keyCol: String = "doc_id"): DataFrame = {
    val hostRe = "^https?://([^/]+)"
    val segRe = "^https?://[^/]+/([^/]*)"
    val u = pages.select(col(keyCol), col("url"),
      regexp_extract(col("url"), hostRe, 1).as("host"),
      regexp_extract(col("url"), segRe, 1).as("seg1"))
    val domains = blocklist.where(col("kind") === "domain")
      .select(col("entry"), col("category"))
    val prefixes = blocklist.where(col("kind") === "prefix")
      .select(col("entry"), col("category"))
    // host → its label-boundary suffix chain: "a.b.c" → a.b.c, b.c, c
    val labels = split(col("host"), "\\.")
    val suffixes = transform(
      sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
    val domainHits = u
      .select(col(keyCol), explode(suffixes).as("entry"))
      .join(broadcast(domains), "entry")
    val prefixHits = u
      .select(col(keyCol), concat(col("host"), lit("/"), col("seg1")).as("entry"))
      .join(broadcast(prefixes), "entry")
    val winner = domainHits.unionByName(prefixHits)
      .groupBy(col(keyCol))
      .agg(min(struct((-length(col("entry"))).as("neg_len"),
        col("entry"), col("category"))).as("m"))
      .select(col(keyCol), col("m.entry").as("matched_entry"),
        col("m.category").as("category"))
    u.join(winner, Seq(keyCol), "left")
      .select(col(keyCol), col("url"),
        col("matched_entry").isNotNull.as("blocked"),
        col("category"), col("matched_entry"))
  }

  /** robots.txt evaluation (RFC 9309 core semantics, literal-prefix
    * subset): a url is governed by the MOST SPECIFIC (longest) matching
    * rule of its host's rule group; at equal length `allow` wins; with
    * no matching rule the url is allowed. (The RFC's `*`/`$` wildcards
    * are out of scope here and documented as such — the longest-match /
    * allow-tie-break core is the part crawl pipelines disagree on.)
    *
    * SCALE: one equi-join on host. The rules side at web scale is
    * millions of hosts × dozens of rules — NOT broadcast material, so
    * the operator leaves the join strategy to the planner (AQE
    * broadcasts it when tiny, co-partitions when not); the fact side
    * shuffles at most once, on host. Rule matching is a prefix test per
    * (url, host-rule) pair — bounded by the host's own rule count, the
    * same fan-out the crawler's fetcher pays. The winner is a
    * map-side-combinable min(struct) agg: (shorter-negated length,
    * kind) sorts allow before disallow at equal length because
    * 'allow' < 'disallow'.
    *
    * @param urls  (keyCol, url, host, path)
    * @param rules (host, kind ∈ allow|disallow, prefix)
    * @return (keyCol, url, allowed, matched_kind, matched_prefix)
    */
  def robotsEval(urls: DataFrame, rules: DataFrame,
      keyCol: String = "doc_id"): DataFrame = {
    val hits = urls.select(col(keyCol), col("host"), col("path"))
      .join(rules, "host")
      .where(col("path").startsWith(col("prefix")))
      .groupBy(col(keyCol))
      .agg(min(struct((-length(col("prefix"))).as("neg_len"),
        col("kind"), col("prefix"))).as("m"))
      .select(col(keyCol), col("m.kind").as("matched_kind"),
        col("m.prefix").as("matched_prefix"))
    urls.join(hits, Seq(keyCol), "left")
      .select(col(keyCol), col("url"),
        coalesce(col("matched_kind") === "allow", lit(true)).as("allowed"),
        col("matched_kind"), col("matched_prefix"))
  }

  /** Host-level quality aggregation with empirical-Bayes shrinkage —
    * the crawl-prioritization signal: a host seen 3 times with perfect
    * scores must NOT outrank a host seen 3000 times at 90%, so each
    * host's mean is shrunk toward the global mean by `k` pseudo-counts:
    *   shrunk = floor((sum + k·g) / (n + k)),  g = floor(Σsum / Σn).
    *
    * Integer floor arithmetic throughout (the Graph.pageRank
    * discipline): sums are associative, so the result is exactly
    * partitioning-independent and oracle-hashable. One aggregation
    * with map-side partial combine; the only collect is the 1-row
    * global (Σsum, Σn).
    *
    * @param docs (host, score) — one row per document, integer score
    * @return (host, n_docs, mean_score, shrunk_score)
    */
  def hostQuality(docs: DataFrame, k: Long = 20): DataFrame = {
    val agg = docs.groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("s"))
      // two consumers (the 1-row global collect + the shrinkage
      // projection): materialize the per-host aggregate so the caller's
      // score derivation (a kernel scan in host_quality) runs once
      .localCheckpoint(true)
    val head = agg.agg(sum(col("s")), sum(col("n_docs"))).collect()(0)
    require(!head.isNullAt(1) && head.getLong(1) > 0,
      "hostQuality: empty input (no global mean to shrink toward)")
    val g = head.getLong(0) / head.getLong(1)
    agg.select(col("host"), col("n_docs"),
      expr("s div n_docs").as("mean_score"),
      expr(s"(s + $k * $g) div (n_docs + $k)").as("shrunk_score"))
  }

  /** robots.txt PARSING (RFC 9309 §2.2 syntax) — the front half of
    * [[robotsEval]], which consumes structured (host, kind, prefix)
    * rules: turn raw robots.txt bodies into one row per (group agent,
    * rule line).
    *
    * Grammar handled: `#` comments (anywhere on a line, stripped
    * first), case-insensitive directive names, optional whitespace
    * around the colon and value, CONSECUTIVE `User-agent` lines
    * sharing one rule group (RFC: a group names several agents),
    * blank lines NOT terminating a group, unknown directives ignored
    * (forward compatibility: `Host:`, `Sitemap:` etc. don't consume a
    * rule index), rules before any `User-agent` line dropped as
    * orphans, and empty rule values kept (`Disallow:` with no value =
    * allow everything).
    *
    * SCALE: pure per-row kernel — robots.txt files are KB-sized and
    * one-per-host; the parse rides the fetch scan. Emitted `rule_idx`
    * is the per-file RULE line ordinal (shared by every agent of the
    * group), so downstream evaluation can reconstruct file order.
    *
    * @param files (keyCol, robots)
    * @return (keyCol, agent, rule_idx, kind ∈ allow|disallow|crawl-delay, value)
    */
  def parseRobots(files: DataFrame, keyCol: String = "host_id"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(keyCol).cast("long"), col("robots"))
      .as[(Long, String)]
      .flatMap { case (id, body) =>
        if (body == null) Iterator.empty
        else {
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, String, String)]
          var agents = List.empty[String]
          var inRules = false
          var idx = 0L
          body.split("\n", -1).foreach { raw =>
            val hash = raw.indexOf('#')
            val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
            val colon = line.indexOf(':')
            if (line.nonEmpty && colon > 0) {
              val name = line.substring(0, colon).trim.toLowerCase
              val value = line.substring(colon + 1).trim
              name match {
                case "user-agent" =>
                  if (inRules) { agents = Nil; inRules = false }
                  agents = agents :+ value
                case "allow" | "disallow" | "crawl-delay" =>
                  if (agents.nonEmpty) {
                    inRules = true
                    agents.foreach(a => out += ((id, a, idx, name, value)))
                    idx += 1
                  } // else: orphan rule before any user-agent — dropped
                case _ => () // unknown directive: ignored, no idx consumed
              }
            }
          }
          out
        }
      }
      .toDF(keyCol, "agent", "rule_idx", "kind", "value")
  }

  /** Politeness scheduler for a fetch frontier: per host, urls are
    * fetched one at a time in priority order (priority desc, key asc —
    * a total order, so the schedule is reproducible), spaced by the
    * host's crawl delay. Emits each url's fetch slot (0-based position
    * in its host's queue) and eta_ms = slot · delay.
    *
    * The per-host sequencing window is the semantics, not an
    * implementation choice — a polite crawler IS a serial queue per
    * host — so the one exchange partitions by host. Skew note: a
    * pathological host with millions of frontier urls makes a fat
    * window partition, but such a host is exactly what an upstream
    * per-domain cap ([[DomainCap]]) truncates, and the window state
    * itself is O(1) per row (rank only, no buffering).
    *
    * @param frontier (keyCol, host, priority)
    * @param delays   (host, delay_ms) — hosts absent here get
    *                 `defaultDelayMs` via the left join. PRECONDITION
    *                 (ADVICE r05): at most one row per host — a
    *                 duplicate host row would fan schedule rows out
    *                 through the left join and silently corrupt
    *                 eta_ms. Callers own the invariant (robots-derived
    *                 delay tables are per-host by construction); a
    *                 defensive groupBy here would tax every schedule
    *                 with an extra corpus-keyed exchange
    * @return (keyCol, host, slot, eta_ms)
    */
  def politenessSchedule(frontier: DataFrame, delays: DataFrame,
      defaultDelayMs: Long = 1000L, keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col(keyCol).asc)
    frontier.select(col(keyCol), col("host"), col("priority"))
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .join(delays.select(col("host"), col("delay_ms")), Seq("host"), "left")
      .select(col(keyCol), col("host"), col("slot"),
        (col("slot") * coalesce(col("delay_ms"), lit(defaultDelayMs)))
          .cast("long").as("eta_ms"))
  }
}
