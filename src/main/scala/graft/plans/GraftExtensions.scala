package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BottomKStrings, CosineSimilarity, DeflateRatio, SortedIntersectSize, VectorSumAgg, ZOrder}

/** SQL-surface registration of graft's native Catalyst functions, so
  * `spark.sql("... cosine_sim(a, b) ...")` works exactly like the
  * Column API. Two entry points, one function list:
  *
  *  - `GraftExtensions` is a `SparkSessionExtensions` injector for
  *    sessions built with `.config("spark.sql.extensions",
  *    "graft.plans.GraftExtensions")` — the deployment path.
  *  - `GraftFunctions.registerAll(spark)` registers the same functions
  *    on an ALREADY-RUNNING session (the correctness driver constructs
  *    its own plain SparkSession, so the SQL queries call this; it is
  *    idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(CosineBlockJoin.apply)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples — the one list both
    * registration paths share. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size", "sorted_intersect_size(a, b) - intersection size of two SORTED string arrays"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    (FunctionIdentifier("bottom_k"),
      info("bottom_k", "bottom_k(s, k) - k smallest distinct strings (KMV sketch with hashed input)"),
      (args: Seq[Expression]) =>
        BottomKStrings(args(0), intLit(args(1), "bottom_k k"))),
    (FunctionIdentifier("deflate_len"),
      info("deflate_len", "deflate_len(s) - DEFLATE-compressed byte length of a string (level 6, raw stream)"),
      (args: Seq[Expression]) => DeflateRatio.DeflateLen(args(0))),
    (FunctionIdentifier("zorder_value"),
      info("zorder_value", "zorder_value(x, y) - 2-D Morton interleave of two pre-scaled 16-bit ints"),
      (args: Seq[Expression]) => ZOrder.ZOrderValue(args(0), args(1))),
    (FunctionIdentifier("zorder_value3"),
      info("zorder_value3", "zorder_value3(x, y, z) - 3-D Morton interleave of three pre-scaled 16-bit ints"),
      (args: Seq[Expression]) => ZOrder.ZOrderValue3(args(0), args(1), args(2))),
    (FunctionIdentifier("zorder_value4"),
      info("zorder_value4", "zorder_value4(a, b, c, d) - 4-D Morton interleave of four pre-scaled 15-bit ints"),
      (args: Seq[Expression]) =>
        ZOrder.ZOrderValue4(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("vector_sum"),
      info("vector_sum", "vector_sum(v, dim) - elementwise sum of array<double> rows into one dim-length vector"),
      (args: Seq[Expression]) =>
        VectorSumAgg(args(0), intLit(args(1), "vector_sum dim"))))

  /** Register on a live session (idempotent: re-registration replaces
    * the same identifiers). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  /** pipeline_sql_curation driver query — a FULL curation funnel as ONE
    * multi-CTE SQL string, proving the registered SQL surface is
    * load-bearing rather than decorative: token-count quality filter →
    * compression-ratio floor (`deflate_len`, surfaced as an
    * engine-asserted boolean since exact zlib byte counts are not
    * cross-engine-replayable) → exact dedup on content fingerprints →
    * semantic near-dup drop via `cosine_sim` over the embeddings →
    * release manifest with the corpus-minimum fingerprint via the
    * `bottom_k` KMV sketch. Every non-boolean output replays
    * relationally in DuckDB. The whole funnel is one Catalyst plan —
    * the CTEs are inlined, filters/pruning reach the scans exactly as
    * the DataFrame-composed release pipelines' plans do. */
  def sqlCurationQuery(spark: SparkSession, dir: String): DataFrame = {
    registerAll(spark)
    graft.operators.Relational.table(spark, dir, "documents")
      .createOrReplaceTempView("docs_sqlcur")
    graft.operators.Relational.table(spark, dir, "embeddings")
      .createOrReplaceTempView("emb_sqlcur")
    try spark.sql(
      """WITH tok AS (
           SELECT doc_id, text,
                  size(split(text, ' ')) AS n_tokens,
                  deflate_len(text) / CAST(octet_length(text) AS DOUBLE)
                    AS ratio
           FROM docs_sqlcur),
         kept AS (SELECT * FROM tok WHERE n_tokens >= 5),
         exact AS (SELECT md5(CAST(text AS BINARY)) AS fp,
                          min(doc_id) AS doc_id
                   FROM kept GROUP BY 1),
         dup AS (SELECT DISTINCT b.vec_id
                 FROM emb_sqlcur a JOIN emb_sqlcur b
                   ON a.vec_id < b.vec_id
                 WHERE cosine_sim(a.embedding, b.embedding) >= 0.46),
         final AS (SELECT e.doc_id FROM exact e
                   LEFT ANTI JOIN dup d ON e.doc_id = d.vec_id)
         SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM docs_sqlcur) AS n_input,
           (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_quality,
           (SELECT CAST(count(*) AS BIGINT) FROM exact)
             AS n_exact_unique,
           (SELECT CAST(count(*) AS BIGINT) FROM final) AS n_released,
           (SELECT min(ratio) > 0.01 FROM kept) AS ratio_floor_ok,
           (SELECT element_at(bottom_k(md5(CAST(text AS BINARY)), 1), 1)
            FROM kept) AS corpus_min_fp""").localCheckpoint(true)
    finally {
      spark.catalog.dropTempView("docs_sqlcur")
      spark.catalog.dropTempView("emb_sqlcur")
    }
  }

  /** sql_functions driver query — the native functions exercised from
    * PURE SQL: a cosine-threshold pair count over the first 50 vectors,
    * a merge-scan intersection of two array literals, and the global
    * minimum name hash via the bottom-k sketch. Every output is an
    * integer/string, so an external engine reproduces it bit-for-bit
    * with its own primitives. */
  def sqlFunctionsQuery(spark: SparkSession, dir: String): DataFrame = {
    registerAll(spark)
    graft.operators.Relational.table(spark, dir, "embeddings")
      .createOrReplaceTempView("emb_sqlfn")
    graft.operators.Relational.table(spark, dir, "customer")
      .createOrReplaceTempView("cust_sqlfn")
    try spark.sql(
      """SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM emb_sqlfn a
            JOIN emb_sqlfn b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 50 AND b.vec_id < 50
              AND cosine_sim(a.embedding, b.embedding) >= 0.46) AS n_close,
           sorted_intersect_size(array('a','b','c'), array('b','c','d'))
             AS isect,
           (SELECT element_at(bottom_k(md5(CAST(c_name AS BINARY)), 1), 1)
            FROM cust_sqlfn) AS min_hash""").localCheckpoint(true)
    finally {
      spark.catalog.dropTempView("emb_sqlfn")
      spark.catalog.dropTempView("cust_sqlfn")
    }
  }
}
