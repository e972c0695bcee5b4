package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  test("pretokenize matches the piece pattern (leading-space words, digits, punct, ws runs)") {
    val pieces = Bpe.pretokenize("Hello world, 42 times!\n").toSeq
    assert(pieces == Seq("Hello", " world", ",", " 42", " times", "!", "\n"))
    // pieces reassemble the input exactly (the alternation is total)
    assert(pieces.mkString == "Hello world, 42 times!\n")
  }

  test("train is deterministic and learns the most frequent pair first") {
    val corpus = Seq("aaab aaab aaab", "aaab cd cd")
    val m1 = Bpe.train(corpus, numMerges = 10)
    val m2 = Bpe.train(corpus, numMerges = 10)
    assert(m1 == m2)
    // "aa" is the most frequent adjacent pair (2 per "aaab" x 4 = 8)
    assert(m1.head == ("a", "a"))
  }

  test("applyCount: greedy lowest-rank merges, unmergeable pieces stay char-split") {
    val ranks = Bpe.ranksOf(Seq(("a", "b"), ("ab", "c")))
    assert(Bpe.applyCount("abc", ranks) == 1)  // ab then abc
    assert(Bpe.applyCount("ab", ranks) == 1)
    assert(Bpe.applyCount("ba", ranks) == 2)   // no merge applies
    assert(Bpe.applyCount("xyz", ranks) == 3)  // fully unmerged
    assert(Bpe.applyCount("a", ranks) == 1)
  }

  test("countTokens sums piece counts and the memo cache does not change results") {
    val ranks = Bpe.ranksOf(Seq(("a", "b")))
    val cache = new java.util.HashMap[String, Int]()
    val n1 = Bpe.countTokens("ab ab cd", ranks, cache)
    val n2 = Bpe.countTokens("ab ab cd", ranks, cache) // cache hits now
    assert(n1 == n2)
    // "ab"->1, " ab"->2 (space+a+b: only (a,b) merges -> [" ","ab"]... )
    // exact value pinned so a kernel change is visible:
    // pieces: "ab"(1) " ab"(2) " cd"(3) -> 6
    assert(n1 == 6)
  }

  test("merges artifact escape/unescape round-trips whitespace symbols") {
    val merges = Seq((" ", "t"), ("\t", "\n"), ("a\\b", " c"))
    val lines = Bpe.toLines(merges)
    assert(!lines.contains("\t")) // whitespace symbols are escaped
    val path = java.nio.file.Files.createTempFile("bpe", ".txt")
    java.nio.file.Files.write(path, lines.getBytes("UTF-8"))
    assert(Bpe.fromFile(path.toString) == merges)
  }

  test("committed artifact loads and kernel count exceeds piece count on long-tail words") {
    val merges = Bpe.fromFile("src/test/resources/golden/bpe_merges.txt")
    assert(merges.nonEmpty)
    val ranks = Bpe.ranksOf(merges)
    val cache = new java.util.HashMap[String, Int]()
    val text = "key agg row scan slow customer window stream"
    val pieces = Bpe.pretokenize(text).size
    val tokens = Bpe.countTokens(text, ranks, cache)
    // merges never cross piece boundaries, so every piece contributes at
    // least one token; with the budget-limited vocab, long-tail words
    // ("customer", "window", "stream") stay multi-token
    assert(tokens >= pieces, s"pieces=$pieces tokens=$tokens")
    assert(tokens > pieces, s"expected long-tail words to split: pieces=$pieces tokens=$tokens")
  }

  test("trainDistributed == single-machine train, independent of partitioning") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("bpe-train-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val texts = docs.orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    val local = Bpe.train(texts, numMerges = 24)
    val dist1 = Bpe.trainDistributed(docs.repartition(1), numMerges = 24)
    val dist7 = Bpe.trainDistributed(docs.repartition(7), numMerges = 24)
    assert(dist1 == local)
    assert(dist7 == local)
    // the per-round fully-distributed argmax path must stay merge-
    // identical to the collect-the-dict hybrid — the r06 optimization's
    // equality cross-check (VERDICT r05 next #2)
    val rounds = Bpe.trainDistributedRounds(docs.repartition(7), numMerges = 24)
    assert(rounds == local)
  }

  test("cpLess is UTF-8 binary order: astral code points sort above BMP high chars") {
    // U+10000 (surrogate pair "𐀀") must sort ABOVE U+FFFD —
    // Java String '<' gets this backwards (UTF-16 code-unit order),
    // which is exactly why trainWeighted's tie-break uses cpLess
    assert(Bpe.cpLess("�", "𐀀"))
    assert(!Bpe.cpLess("𐀀", "�"))
    assert("𐀀" < "�") // the Java order it corrects
    assert(Bpe.cpLess("a", "ab") && !Bpe.cpLess("ab", "a"))
    assert(!Bpe.cpLess("a", "a"))
  }
}
