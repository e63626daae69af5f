package graft.tools

import graft.ops.NearDup
import org.apache.spark.sql.functions._

/** Candidate-volume counters for the dedup near-dup queries (VERDICT r13
  * next-round #3): per-band/bucket candidate counts vs emitted pairs, so
  * "the pair volume is genuine" is a measured claim, not an assertion.
  *
  * {{{ runMain graft.tools.DedupCounters <sfDir> }}}
  */
object DedupCounters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Tools.session()
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- MinHash-LSH ----
    val sigs = graft.ops.graph.PlanUtil.cutDF(NearDup.signatures(docs))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until NearDup.Bands).map { bnd =>
        (0 until NearDup.RowsPerBand)
          .map(r => col("sig")(bnd * NearDup.RowsPerBand + r))
          .reduceLeft((acc, x) => acc * NearDup.HashMod + x)
      }: _*)).as(Seq("band", "key")))
    val bucketSizes = banded.groupBy("band", "key").agg(count(lit(1)).as("n"))
    val mhBuckets = bucketSizes.agg(count(lit(1)), max("n"),
      sum(col("n") * (col("n") - 1) / 2)).collect().head
    val mhCand = NearDup.lshCandidates(sigs).count()
    val mhPairs = NearDup.minHashLsh(docs).count()
    println(s"MINHASH,buckets ${mhBuckets.getLong(0)},maxBucket ${mhBuckets.getLong(1)}," +
      s"rawPairChecks ${mhBuckets.getAs[Any](2)},distinctCandidates $mhCand," +
      s"verifiedPairs $mhPairs")

    // ---- SimHash ----
    val bitsPerChunk = NearDup.SimHashBits / NearDup.SimHashChunks
    val sh = graft.ops.graph.PlanUtil.cutDF(
      docs.select(col("doc_id"), NearDup.simHash(col("text")).as("simhash")))
    // mirror simHashPairs' banding at maxHamming=1: (chunks-1)-subsets
    val chunkExprs = (0 until NearDup.SimHashChunks).map { c =>
      shiftright(col("simhash"), c * bitsPerChunk)
        .bitwiseAND(lit((1L << bitsPerChunk) - 1))
    }
    val comboKeys = (0 until NearDup.SimHashChunks)
      .combinations(NearDup.SimHashChunks - 1).toSeq
      .map(_.map(chunkExprs).reduceLeft((acc, x) =>
        acc * lit(1L << bitsPerChunk) + x))
    val shBanded = sh.select(col("doc_id"),
      posexplode(array(comboKeys: _*)).as(Seq("chunk", "key")))
    val shSizes = shBanded.groupBy("chunk", "key").agg(count(lit(1)).as("n"))
    val shStats = shSizes.agg(count(lit(1)), max("n"),
      sum(col("n") * (col("n") - 1) / 2)).collect().head
    val shPairs = NearDup.simHashPairs(docs, 1).count()
    println(s"SIMHASH,buckets ${shStats.getLong(0)},maxBucket ${shStats.getLong(1)}," +
      s"rawPairChecks ${shStats.getAs[Any](2)},emittedPairs $shPairs")

    // phase walls (steady state: run each stage twice, report the 2nd)
    def lap(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime()
      val n = f
      println(f"LAP,$name,${(System.nanoTime() - t0) / 1e9}%.2f s,rows $n")
    }
    lap("sig_only")(docs.select(col("doc_id"),
      NearDup.simHash(col("text")).as("simhash")).count())
    lap("simhash_pairs_full")(NearDup.simHashPairs(docs, 1).count())
    lap("minhash_sig_only")(NearDup.signatures(docs).select("doc_id", "sig").count())
    lap("minhash_full")(NearDup.minHashLsh(docs).count())
    spark.stop()
  }
}
