package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Content-defined chunking dedup: the operator exists because its
  * boundaries survive edits that shift every fixed-width span — the
  * spec pins exactly that property, plus the chunk partition/shuffle
  * shape. */
class CdcChunkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // A long synthetic document (enough tokens that the 1/16 cut rule
  // yields several chunks), its exact copy, and a copy with ONE token
  // inserted near the front — the classic CDC stress shape.
  private val base = (0 until 400).map(i => f"w$i%03d").mkString(" ")
  private val edited = {
    val ws = base.split(" ").toBuffer
    ws.insert(3, "INSERTED")
    ws.mkString(" ")
  }
  private val corpus = Seq(
    (1L, base), (2L, base), (3L, edited)).toDF("doc_id", "text")

  test("exact copy deduplicates fully; totals conserve tokens") {
    val out = Dedup.cdcChunkDedupOf(corpus)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nc, nt, nd) => id -> ((nc, nt, nd)) }.toMap
    val (nc1, nt1, nd1) = out(1L)
    val (nc2, nt2, nd2) = out(2L)
    assert(nt1 == 400L && nt2 == 400L, "token totals conserved")
    assert(nc1 == nc2, "identical text chunks identically")
    assert(nd1 == 0L, "first copy owns every chunk")
    assert(nd2 == nc2, "every chunk of the exact copy is a duplicate")
  }

  test("a single early insertion invalidates at most the edited chunk") {
    val out = Dedup.cdcChunkDedupOf(corpus)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nc, nt, nd) => id -> ((nc, nt, nd)) }.toMap
    val (nc3, nt3, nd3) = out(3L)
    assert(nt3 == 401L)
    // Content-defined boundaries localize the edit: every chunk except
    // the one containing the insertion still matches doc 1, so the
    // duplicate count is within 2 of the chunk count (the edited chunk,
    // plus at most its successor if the insertion itself is a cut
    // token). A fixed-width chunker would lose every chunk after
    // position 3 — i.e. nearly all of them.
    assert(nd3 >= nc3 - 2,
      s"CDC must localize the edit: $nd3 of $nc3 chunks still dedup")
    assert(nd3 < nc3, "the edited chunk itself cannot dedup")
  }

  test("contrast: fixed-width spans lose every span after the edit") {
    val marks = Dedup.spanDedupOf(corpus, k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, ns, nk, nd) => id -> ((ns, nk, nd)) }.toMap
    val (ns3, _, nd3) = marks(3L)
    // Insertion at token 3 shifts every 10-token span boundary: at
    // most the trailing remainder can still match, so duplicates stay
    // near zero — the measured gap CDC exists to close.
    assert(nd3 <= 1L, s"fixed spans should mass-miss after an edit ($nd3/$ns3)")
  }

  test("chunk rebuild reuses the per-doc partitioning: one exchange below the md5 window") {
    val plan = Dedup.cdcChunkDedupOf(corpus).queryExecution.executedPlan.toString
    // Exactly three exchanges end-to-end: doc_id (token window + chunk
    // rebuild share it), chunk_md5 (ownership ranking), doc_id again
    // (final per-doc rollup on the post-window relation). The claim
    // that matters: the groupBy(doc_id, chunk_id) does NOT add a
    // fourth exchange on its compound key.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"unexpected extra shuffle:\n$plan")
    // Attribute refs print with an exprId (doc_id#123), so the literal
    // must be a regex or the guard can never fire.
    assert("hashpartitioning\\(doc_id#\\d+, chunk_id".r
      .findFirstIn(plan).isEmpty,
      "chunk rebuild must reuse doc_id partitioning")
  }
}
