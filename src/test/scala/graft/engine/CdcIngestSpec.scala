package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[CdcIngest]] — exactly-once reduction of an at-least-once CDC feed
  * (r15 verdict task 3). The invariant: maintained state fed through
  * ingest over a DAMAGED feed (duplicated records, within-batch
  * reorder, cross-batch redelivery) equals the clean fold exactly.
  */
class CdcIngestSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val polKey =
    coalesce(col("after.policy_id"), col("before.policy_id"))
  private val clKey =
    coalesce(col("after.claim_id"), col("before.claim_id"))

  /** The q218 batches, each record stamped with its batch index as the
    * sequence number (per-key: one op per batch, so (key, batch) is a
    * valid per-record sequence). */
  private def stamped(): Seq[(DataFrame, DataFrame)] =
    InsuranceGate.cdcBatches(spark, sf).zipWithIndex.map { case ((p, c), i) =>
      (p.withColumn("s", lit(i.toLong)), c.withColumn("s", lit(i.toLong)))
    }

  private def cleanState(): IncrementalGold.ExecState = {
    val deltas = InsuranceGate.cdcBatches(spark, sf).map { case (p, c) =>
      (IncrementalGold.signedDelta(p), IncrementalGold.signedDelta(c)) }
    deltas.tail.foldLeft(
      IncrementalGold.init(deltas.head._1, deltas.head._2)) {
      case (st, (p, c)) => IncrementalGold.applyDelta(st, p, c)
    }
  }

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).count() === 0, s"$what: extra rows")
    assert(b.exceptAll(a).count() === 0, s"$what: missing rows")
  }

  test("one damaged batch (duplicates + multi-op keys + reorder) folds " +
      "to the clean 4-batch state") {
    val b = stamped()
    // all four batches as ONE batch: keys carry up to 4 ops (insert,
    // update, delete, resurrect) that must collapse in seq order
    def damage(u: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
      u.unionByName(u.filter(pmod(abs(hash(key)), lit(3)) === 0)) // dup 1/3
        .orderBy(rand(42)) // arrival order scrambled
    val polAll = damage(b.map(_._1).reduce(_ unionByName _), polKey)
    val clAll = damage(b.map(_._2).reduce(_ unionByName _), clKey)
    val (netP, _) = CdcIngest.ingest(polAll, polKey, col("s"),
      CdcIngest.emptyLedgerLike(CdcIngest.keyed(polAll, polKey, col("s"))))
    val (netC, _) = CdcIngest.ingest(clAll, clKey, col("s"),
      CdcIngest.emptyLedgerLike(CdcIngest.keyed(clAll, clKey, col("s"))))
    val st = IncrementalGold.init(
      IncrementalGold.signedDelta(netP.select("op", "before", "after")),
      IncrementalGold.signedDelta(netC.select("op", "before", "after")))
    assertSame(IncrementalGold.mart(st), IncrementalGold.mart(cleanState()),
      "single damaged batch")
  }

  test("cross-batch redeliveries are dropped by the ledger") {
    val b = stamped()
    var polLedger = CdcIngest.emptyLedgerLike(
      CdcIngest.keyed(b.head._1, polKey, col("s")))
    var clLedger = CdcIngest.emptyLedgerLike(
      CdcIngest.keyed(b.head._2, clKey, col("s")))
    var st: IncrementalGold.ExecState = null
    b.zipWithIndex.foreach { case ((p, c), i) =>
      // batch i redelivers ALL of batch i-1 (old seqs) on top of its
      // own records — at-least-once across batch boundaries
      val polBatch = if (i == 0) p else p.unionByName(b(i - 1)._1)
      val clBatch = if (i == 0) c else c.unionByName(b(i - 1)._2)
      val (netP, pl) = CdcIngest.ingest(polBatch, polKey, col("s"), polLedger)
      val (netC, cl2) = CdcIngest.ingest(clBatch, clKey, col("s"), clLedger)
      polLedger = pl.localCheckpoint(true)
      clLedger = cl2.localCheckpoint(true)
      val sp = IncrementalGold.signedDelta(netP.select("op", "before", "after"))
      val sc = IncrementalGold.signedDelta(netC.select("op", "before", "after"))
      st = if (i == 0) IncrementalGold.init(sp, sc)
      else IncrementalGold.applyDelta(st, sp, sc)
    }
    assertSame(IncrementalGold.mart(st), IncrementalGold.mart(cleanState()),
      "ledger-filtered fold")
    // the ledger is high-water marks, not history: one row per key ever
    // seen, including tombstones for deleted keys
    val distinctKeys = b.map(_._1).reduce(_ unionByName _)
      .select(polKey.as("k")).distinct().count()
    assert(polLedger.count() === distinctKeys)
  }

  test("collapse nets multi-op keys to one op in sequence order") {
    import spark.implicits._
    import CdcIngestSpec.Img
    val rows = Seq(
      // key A: I then U -> net I carrying the LAST after-image
      ("I", None, Some(Img("A", 1L)), 1L),
      ("U", Some(Img("A", 1L)), Some(Img("A", 2L)), 2L),
      // key B: I then D -> vanishes
      ("I", None, Some(Img("B", 1L)), 1L),
      ("D", Some(Img("B", 1L)), None, 2L),
      // key C: D then re-I -> net U old->new
      ("D", Some(Img("C", 5L)), None, 1L),
      ("I", None, Some(Img("C", 9L)), 2L),
      // key E: two Us arriving REVERSED -> before of seq1, after of seq2
      ("U", Some(Img("E", 2L)), Some(Img("E", 3L)), 2L),
      ("U", Some(Img("E", 1L)), Some(Img("E", 2L)), 1L)
    ).toDF("op", "before", "after", "s")
    val net = CdcIngest.collapse(CdcIngest.keyed(rows,
        coalesce(col("after.pk"), col("before.pk")), col("s")))
      .select(col("__key"), col("op"), col("before.v").as("bv"),
        col("after.v").as("av"))
      .collect().map(r => (r.getString(0),
        (r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(net.keySet === Set("A", "C", "E"), s"got ${net.keySet}")
    assert(net("A") === (("I", None, Some(2L))))
    assert(net("C") === (("U", Some(5L), Some(9L))))
    assert(net("E") === (("U", Some(1L), Some(3L))))
  }
}

object CdcIngestSpec {
  final case class Img(pk: String, v: Long)
}
