package graft

import graft.core.Tables
import graft.ops.NearDup
import org.apache.spark.sql.functions._

/** Skew-guard gates for near-dup candidate generation: block-pair
  * decomposition must (a) change nothing about the result set and
  * (b) bound the members any single pair-generation task sees, even on an
  * adversarial corpus where every document lands in one bucket. */
class NearDupSpec extends SparkSpec {

  test("simHashPairs: blocked decomposition == unsplit result") {
    val docs = Tables.documents(spark, sf0001)
    val whole = NearDup.simHashPairs(docs, maxBucket = Int.MaxValue)
    val split = NearDup.simHashPairs(docs, maxBucket = 4)
    assert(whole.exceptAll(split).isEmpty && split.exceptAll(whole).isEmpty,
      "block-pair decomposition changed the simhash pair set")
    assert(split.count() > 0)
  }

  test("simHashPairs subset banding (maxHamming=1) == brute-force " +
    "hamming pairs") {
    val docs = Tables.documents(spark, sf001)
    val sh = docs.select(col("doc_id"), NearDup.simHash(col("text")).as("h"))
    val a = sh.select(col("doc_id").as("id_a"), col("h").as("ha"))
    val b = sh.select(col("doc_id").as("id_b"), col("h").as("hb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 1)
      .select("id_a", "id_b", "hamming")
    val banded = NearDup.simHashPairs(docs, maxHamming = 1)
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
      "chunk-pair banding must emit exactly the brute-force pair set")
  }

  test("lshCandidates: blocked decomposition == unsplit result") {
    val docs = Tables.documents(spark, sf0001)
    val sigs = NearDup.signatures(docs).cache()
    val whole = NearDup.lshCandidates(sigs, maxBucket = Int.MaxValue)
    val split = NearDup.lshCandidates(sigs, maxBucket = 3)
    assert(whole.exceptAll(split).isEmpty && split.exceptAll(whole).isEmpty,
      "block-pair decomposition changed the LSH candidate set")
    sigs.unpersist()
  }

  test("max-bucket invariant: no pair-generation group exceeds 2x maxBucket") {
    import spark.implicits._
    // adversarial: identical documents — every doc shares every bucket
    val n = 200
    val maxBucket = 16
    val docs = (0 until n).map(i => (i.toLong, "the same exact text"))
      .toDF("doc_id", "text")
    val banded = docs.select(col("doc_id"),
      NearDup.simHash(col("text")).as("simhash"),
      lit(0).as("chunk"), lit(0L).as("key"))
    val groupSizes = NearDup.blockPairGroups(
        banded, Seq("chunk", "key"), "doc_id",
        struct(col("doc_id").as("id"), col("blk")), maxBucket)
      .groupBy("chunk", "key", "blo", "bhi")
      .agg(count(lit(1)).as("sz"))
      .select(max(col("sz"))).head().getLong(0)
    // hash-based block assignment is approximately even; 4x headroom
    assert(groupSizes <= 4L * maxBucket,
      s"largest pair-generation group has $groupSizes members (maxBucket=$maxBucket)")
    // and the decomposition still finds every pair (n choose 2, hamming 0)
    val pairs = NearDup.simHashPairs(docs, maxBucket = maxBucket)
    assert(pairs.count() == n.toLong * (n - 1) / 2)
  }
}
