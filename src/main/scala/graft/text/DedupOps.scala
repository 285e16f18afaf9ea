package graft.text

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators over the `documents` table: exact (content
  * hash), MinHash+LSH near-dup (shingle → minhash → band → bucket join →
  * verify), SimHash, and n-gram Jaccard similarity.
  *
  * Scale design:
  *  - MinHash signatures are computed per-row with array lambdas (no
  *    explode, no shuffle) — at 100 TB this is a map-only pass;
  *  - candidate generation shuffles only (band_key → doc ids), never the
  *    full text; the verify join re-reads just the candidate pairs;
  *  - SimHash uses explode + partial-aggregated bit counts (map-side
  *    combine keeps the shuffle at one record per doc per partition).
  */
object DedupOps extends QueryModule {
  import Tables.documents
  import PortableHash._
  import TextOps.{tokens, oTokens}

  val NumHashes = 8      // minhash signature length
  val Bands = 4          // LSH bands (rows per band = NumHashes / Bands)
  val JaccardThreshold = 0.8
  val SimHashBits = 16

  /** Distinct word 3-grams ("shingles") of a document — Spark side. */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - 2, lit(0))),
      i => concat_ws(" ", slice(t, i, lit(3)))))
  }
  /** DuckDB spelling of [[shingles]]. */
  val oShingles: String =
    s"""list_distinct(list_transform(
       |    range(1, greatest(len($oTokens) - 2, 0) + 1),
       |    i -> array_to_string(($oTokens)[i:i+2], ' ')))""".stripMargin

  /** MinHash signature value j: min over shingles of seeded hash60. */
  def minhash(sh: Column, j: Int): Column =
    array_min(transform(sh, s => hash60Seeded(j, s)))
  def oMinhash(j: Int): String =
    s"list_min(list_transform(sh, s -> ${oHash60Seeded(j, "s")}))"

  // ============================================================ exact dedup
  // hash-groupBy on the content fingerprint: canonical doc + group size.
  // At scale this is one shuffle keyed by a 32-byte hash, not the text.
  register("q23_dedup_exact",
    """WITH fp AS (
      |  SELECT doc_id,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      |  FROM documents)
      |SELECT fingerprint, min(doc_id) AS canonical_doc_id,
      |  COUNT(*) AS group_size, COUNT(*) - 1 AS duplicates_removed
      |FROM fp GROUP BY fingerprint""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("group_size"),
        (count(lit(1)) - 1).as("duplicates_removed"))
  }

  // ============================================================ minhash sigs
  register("q24_minhash_signatures", {
    val sigs = (0 until NumHashes).map(j => s"${oMinhash(j)} AS sig_$j")
    s"""WITH sh AS (SELECT doc_id, $oShingles AS sh FROM documents)
       |SELECT doc_id, ${sigs.mkString(", ")} FROM sh""".stripMargin
  }) { (s, d) =>
    val withSh = documents(s, d).select(col("doc_id"),
      shingles(col("text")).as("sh"))
    withSh.select(col("doc_id") +:
      (0 until NumHashes).map(j => minhash(col("sh"), j).as(s"sig_$j")): _*)
  }

  /** Shared candidate-pair pipeline: signature → bands → bucket join →
    * distinct pairs → exact Jaccard verify. Returns (doc_a, doc_b, jaccard).
    */
  def lshPairs(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))
    val rowsPerBand = NumHashes / Bands
    val sigs = docs.select(col("doc_id"), col("sh"),
      array((0 until NumHashes).map(j => minhash(col("sh"), j)): _*).as("sig"))
    // one row per (doc, band); band key = the band's slice of the signature
    val banded = sigs.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val jaccard = size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
      size(array_union(col("a.sh"), col("b.sh")))
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard.as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= JaccardThreshold)
  }

  // ============================================================ LSH near-dup
  register("q25_lsh_near_duplicates", {
    val rowsPerBand = NumHashes / Bands
    val sigList = (0 until NumHashes).map(oMinhash).mkString(", ")
    s"""WITH sh AS (SELECT doc_id, $oShingles AS sh FROM documents),
       |sigs AS (SELECT doc_id, sh, [$sigList] AS sig FROM sh),
       |banded AS (
       |  SELECT doc_id, sh, b.band, sig[b.band * $rowsPerBand + 1 : b.band * $rowsPerBand + $rowsPerBand] AS band_key
       |  FROM sigs, (SELECT unnest(range(0, $Bands)) AS band) b),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= $JaccardThreshold""".stripMargin
  })(lshPairs _)

  // ============================================================ simhash
  // 16-bit SimHash: per-token hash bits, majority vote per bit position.
  register("q26_simhash", {
    val bitSums = (0 until SimHashBits).map(b =>
      s"CAST(SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS bit_$b")
    val assemble = (0 until SimHashBits).map(b =>
      s"CASE WHEN bit_$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($oTokens) AS w FROM documents),
       |hashed AS (SELECT doc_id, ${oHash60("w")} AS h FROM tok),
       |bits AS (SELECT doc_id, ${bitSums.mkString(", ")} FROM hashed GROUP BY doc_id)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits""".stripMargin
  }) { (s, d) =>
    val tok = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), hash60(col("w")).as("h"))
    val bitSums = (0 until SimHashBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"bit_$b"))
    val bits = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val assembled = (0 until SimHashBits).map(b =>
      when(col(s"bit_$b") > 0, 1L << b).otherwise(0L)).reduce(_ + _)
    bits.select(col("doc_id"), assembled.cast(LongType).as("simhash"))
  }

  // ============================================================ n-gram jaccard
  // pairwise trigram Jaccard on a deterministic candidate set (adjacent
  // doc ids) — the verify primitive of the LSH pipeline, isolated.
  register("q27_ngram_jaccard",
    s"""WITH sh AS (SELECT doc_id, $oShingles AS sh FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin) { (s, d) =>
    val sh = documents(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
  }
}
