package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Array/collection operators: LATERAL-style explosion, higher-order
  * functions over array columns, and ordered list aggregation — the
  * collection surface a corpus pipeline needs around tokenized text and
  * embedding vectors (reference analog: none — the reference is scalar
  * SQL only; these extend SURVEY §2.7 the way a warehouse's LATERAL
  * VIEW / list functions would).
  *
  * Scale notes: explosion is map-only (a generator inside whole-stage
  * codegen, no shuffle); per-row higher-order folds are narrow; ordered
  * list aggregation shuffles once on the group key and sorts inside the
  * aggregated array, never globally.
  */
object ArrayOps extends QueryModule {
  import Tables.documents
  import graft.text.TextOps.{tokens, oTokens}

  // ======================================================== token explode
  // LATERAL VIEW posexplode: one row per (doc, position, token). The
  // generator is map-only and codegen'd; downstream consumers group or
  // join without ever re-tokenizing. Positions are 1-based to match SQL
  // subscript convention (Spark's posexplode is 0-based — shifted here).
  register("q101_token_explode",
    s"""WITH tok AS (SELECT doc_id, $oTokens AS t FROM documents)
       |SELECT doc_id, CAST(i.i AS INTEGER) AS pos, t[i.i] AS token
       |FROM tok, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i
       |WHERE t[i.i] <> ''""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .filter(col("col") =!= "")
      .select(col("doc_id"), (col("pos") + 1).cast(IntegerType).as("pos"),
        col("col").as("token"))
  }

  // ==================================================== higher-order fns
  // transform / filter / zip_with / aggregate over the embedding vector,
  // all inside one narrow projection. Per-row left folds over doubles are
  // bit-deterministic (no aggregation reorder can touch them); the L1
  // norm additionally snaps to the 1e6 integer grid so the value is
  // exact. Mirrors DuckDB list_transform/list_filter/list_reduce.
  register("q102_vector_hof",
    """WITH g AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x ->
      |      CAST(FLOOR(GREATEST(CAST(x AS DOUBLE), 0) * 1000000) AS BIGINT)) AS relu_g,
      |    list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) * CAST(embedding[65 - i] AS DOUBLE)) AS revp,
      |    len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS np
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(np AS INTEGER) AS n_pos,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), relu_g), (a, b) -> a + b) AS relu_l1_grid,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), revp), (a, b) -> a + b) AS dot_rev
      |FROM g""".stripMargin) { (s, d) =>
    val emb = col("embedding")
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(filter(emb, x => x.cast(DoubleType) > 0)).cast(IntegerType).as("n_pos"),
        aggregate(
          transform(emb, x =>
            floor(greatest(x.cast(DoubleType), lit(0.0)) * 1000000).cast(LongType)),
          lit(0L), (a, b) => a + b).as("relu_l1_grid"),
        aggregate(
          zip_with(emb, reverse(emb),
            (a, b) => a.cast(DoubleType) * b.cast(DoubleType)),
          lit(0.0), (a, b) => a + b).as("dot_rev"))
  }

  // ============================================================= listagg
  // Ordered string aggregation (LISTAGG / string_agg): collect per-group
  // doc ids, sort INSIDE the aggregated array (numeric order, then
  // stringified), join with a delimiter. collect_list order is
  // nondeterministic across retries/partitions — array_sort after
  // collection is what makes the operator well-defined, and it runs on
  // the grouped array (tiny), never as a global sort.
  register("q103_listagg",
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
      |FROM documents
      |GROUP BY lang, source""".stripMargin) { (s, d) =>
    documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(col("doc_id"))),
            (x: Column) => x.cast(StringType)), ",").as("doc_ids"))
  }
}
