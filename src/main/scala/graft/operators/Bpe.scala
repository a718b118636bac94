package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, Spark-first.
  *
  * TRAIN: classic BPE never trains on the raw corpus — it trains on the
  * word-frequency table (Sennrich et al. 2016). The heavy half (one
  * groupBy-count over every word occurrence) is fully distributed; the
  * table is then capped to the `maxWords` most frequent words
  * (deterministic count-desc, word-asc tie-break — a TakeOrdered, no
  * global sort) and the bounded table drives the exact merge loop
  * driver-side. At 100 TB the cap is the scale valve: top-100k words
  * cover the overwhelming frequency mass of any natural corpus, and the
  * driver never sees more than `maxWords` rows.
  *
  * ENCODE: merges broadcast as a rank map; each partition applies the
  * standard greedy lowest-rank merge per word with a per-partition
  * word→tokens memo (real corpora repeat words heavily, so steady-state
  * encode cost is a hash probe per word). `mapPartitions` is justified
  * here: the merge loop is inherently iterative per word and has no
  * declarative equivalent.
  *
  * Both halves split words identically (`\s+`, empty dropped) and spell
  * a word as its characters plus a final `</w>` marker, so `ab` the word
  * and `ab` the prefix of `abc` stay distinct merge targets.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Train `nMerges` merges. Returns merge pairs in rank order (rank 0
    * applies first). Stops early when no pair repeats.
    */
  def train(
      docs: DataFrame,
      text: Column,
      nMerges: Int,
      maxWords: Int = 100000,
  ): Seq[(String, String)] = {
    require(nMerges >= 0, s"train: nMerges must be >= 0, got $nMerges")
    require(maxWords > 0, s"train: maxWords must be positive, got $maxWords")
    val wordCounts: Array[(String, Long)] = docs
      .select(explode(filter(split(text, "\\s+"), w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // exact Sennrich merge loop over the bounded word-frequency table
    var vocab: Vector[(Vector[String], Long)] =
      wordCounts.iterator.map { case (w, n) =>
        (w.map(_.toString).toVector :+ EndOfWord, n)
      }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      val repeated = pairCounts.filter(_._2 > 1)
      if (repeated.isEmpty) exhausted = true
      else {
        // max count; ties break lexicographically — fully deterministic
        val best = repeated.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += joined; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), n)
          }
        }
      }
      i += 1
    }
    merges.result()
  }

  /** Persist trained merges as ONE parquet table (rank, left, right) —
    * the production tokenizer artifact (round-13): train once, ship the
    * table, every encode job loads it instead of re-training. Rank order
    * IS the semantics (rank 0 applies first), stored explicitly so the
    * round trip never depends on file order. */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)],
      dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/bpe_merges.parquet")
  }

  /** Load a [[saveMerges]] artifact, restoring rank order. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/bpe_merges.parquet")
      .select(col("rank"), col("left"), col("right"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Greedy BPE encode of one word (public for tests). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        // merge EVERY occurrence of the best-ranked pair left-to-right
        val a = syms(bestIdx); val b = syms(bestIdx + 1)
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += (a + b); k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Encode each document: (id, tokens array, n_tokens). */
  def encode(
      docs: DataFrame,
      id: Column,
      text: Column,
      merges: Seq[(String, String)],
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(id.cast("long").as("id"), text.as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        // bounded memo: natural corpora repeat words heavily (hit rate
        // stays high at this cap), but an id/URL/code-heavy partition
        // must not grow the map without limit — past the cap, unseen
        // words just encode directly
        val memoCap = 200000
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.map { case (docId, t) =>
          val toks: Seq[String] =
            if (t == null) Seq.empty
            else t.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
              memo.get(w) match {
                case Some(enc) => enc
                case None =>
                  val enc = encodeWord(w, r)
                  if (memo.size < memoCap) memo.update(w, enc)
                  enc
              }
            }.toSeq
          (docId, toks, toks.length.toLong)
        }
      }
      .toDF("id", "tokens", "n_tokens")
  }
}
