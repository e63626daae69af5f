package graft

import graft.core.Tables
import graft.ops.Dedup

class DedupSaltSpec extends SparkSpec {
  test("salted two-phase dedup == plain groupBy dedup") {
    val docs = Tables.documents(spark, sf001)
    val plain = Dedup.exactGroups(docs)
    val salted = Dedup.exactGroupsSalted(docs, salts = 7)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
