package graft

import graft.ops.EventOps

class AsOfJoinSpec extends SparkSpec {

  test("as-of join: latest prior match, ties included, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "ms", "payload")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (1L, 40L, "r40"),
      (2L, 20L, "r20"))
      .toDF("k", "ms", "rv")
    val out = EventOps.asOfJoin(left, right, "k", "ms")
      .select($"payload", $"asof.rv")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("a") == Some("r100")) // equal time matches (ties included)
    assert(out("b") == Some("r40"))  // latest prior, skipping r60 (future)
    assert(out("c") == None)         // no prior right row
  }
}
