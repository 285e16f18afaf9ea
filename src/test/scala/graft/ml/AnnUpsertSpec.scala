package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q227 incremental IVF-PQ maintenance: upsert-vs-rebuild row
  * identity, per-cell count tracking, and hot-cell re-split parity.
  */
class AnnUpsertSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("build + upsert == one-shot encode of the full corpus under the " +
      "same frozen codebook, and the cell-count property matches the " +
      "table exactly") {
    val (index, codebook) = SimilarityOps.annUpsertIndex(spark, sf)
    val iso = index.sparkSession
    // re-derive the ident the builder used (content-addressed name)
    val upIdent = iso.sql(s"SHOW TABLES IN ${SimilarityOps.AnnCat}.g")
      .collect().map(_.getAs[String]("tableName"))
      .filter(_.startsWith("ivfpq_up_"))
    assert(upIdent.length === 1, upIdent.mkString(","))
    val full = s"${SimilarityOps.AnnCat}.g.${upIdent.head}"

    // one-shot encode of the FULL corpus under the same codebook
    val expected = SimilarityOps.encodeIvfpq(iso,
        graft.ops.Tables.embeddings(iso, sf), codebook)
      .collect().map(_.toSeq).toSet
    val got = iso.table(full).collect().map(_.toSeq).toSet
    assert(got === expected,
      "upserted index must be row-identical to a from-scratch encode")

    // count property == table census
    val counts = SimilarityOps.cellCounts(iso, full)
    val census = iso.table(full).groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === census)
    // and the batch was non-empty (the gate actually upserted)
    val batchN = graft.ops.Tables.embeddings(iso, sf)
      .filter(SimilarityOps.upsertGate(col("vec_id"))).count()
    assert(batchN > 0, "upsert slice must be non-empty at sf0.001")
  }

  test("hot-cell re-split: rows keep their codes under new child cells, " +
      "counts stay consistent, and probing BOTH children is " +
      "candidate-identical to probing the parent") {
    val iso = SimilarityOps.annSession(spark)
    val emb = graft.ops.Tables.embeddings(iso, sf)
    val codebook = SimilarityOps.trainCodebook(
      emb.filter(col("vec_id") < 100))
    val ident = s"${SimilarityOps.AnnCat}.g.ivfpq_split_spec"
    SimilarityOps.createIndexTable(iso, ident, codebook)
    val enc = SimilarityOps.encodeIvfpq(iso, emb, codebook)
    enc.writeTo(ident).append()
    // seed the count property like the builder does
    iso.sql(s"ALTER TABLE $ident SET TBLPROPERTIES " +
      s"('${SimilarityOps.CellCountsProp}'='${SimilarityOps
        .encodeCellCounts(enc.groupBy("cell").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)}')")

    val before = iso.table(ident).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val countsBefore = SimilarityOps.cellCounts(iso, ident)
    val hot = countsBefore.maxBy(c => (c._2, -c._1))._1
    assert(countsBefore(hot) >= 2)

    // candidates from the PARENT cell, pre-split (hand-built probe:
    // one query hitting the hot cell)
    val probe0 = SimilarityOps.annProbesFor(iso,
      emb.filter(col("vec_id") < SimilarityOps.NumQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), codebook)
    val parentProbes = probe0.filter(col("cell") === hot)
    val preCand =
      if (parentProbes.isEmpty) Array.empty[Seq[Any]]
      else SimilarityOps.annCandidates(iso.table(ident), parentProbes)
        .collect().map(_.toSeq)

    val coarse = codebook.map { case (l, v) => (l.toLong, v) }
    val newCoarse = SimilarityOps.annSplitCell(iso, ident, hot,
      codebook, coarse)

    // rows preserved: same (vec_id, packed) multiset, parent cell gone,
    // exactly the two child cells added
    val after = iso.table(ident).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.length === before.length)
    assert(after.map(t => (t._1, t._3)).sorted.toSeq ===
      before.map(t => (t._1, t._3)).sorted.toSeq,
      "split must not touch vec_id/packed")
    assert(!after.exists(_._2 == hot), "parent cell must be empty")
    val children = newCoarse.map(_._1).toSet -- coarse.map(_._1).toSet
    assert(children.size === 2)
    assert(after.map(_._2).toSet.intersect(children) === children,
      "both children must hold rows")
    assert(!newCoarse.exists(_._1 == hot), "parent removed from coarse")

    // counts consistent after the split
    val countsAfter = SimilarityOps.cellCounts(iso, ident)
    assert(!countsAfter.contains(hot))
    assert(children.toSeq.map(countsAfter).sum === countsBefore(hot))
    assert(countsAfter.values.sum === countsBefore.values.sum)

    // probe parity: parent probe rows re-routed to BOTH children yield
    // the identical candidate set (codes unchanged, ADC unchanged)
    if (preCand.nonEmpty) {
      val childProbes = children.toSeq.map(c =>
        parentProbes.withColumn("cell", lit(c)))
        .reduce(_ unionByName _)
      val postCand = SimilarityOps
        .annCandidates(iso.table(ident), childProbes)
        .collect().map(_.toSeq)
      assert(postCand.sortBy(_.toString).toSeq ===
        preCand.sortBy(_.toString).toSeq,
        "probing both children must be candidate-identical to the parent")
    }
  }
}
