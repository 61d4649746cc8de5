package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.transform.CodeStore

class CodeStoreSpec extends AnyFunSuite {

  private def fixedStore(prefix: String): CodeStore =
    new CodeStore(graft.util.Scratch.dir(prefix),
      clock = () => Instant.parse("2026-01-01T00:00:00Z"))

  test("slugify matches the reference normalization") {
    val s = fixedStore("cs-slug")
    assert(s.slugify("Demo Project!") == "demo_project")
    assert(s.slugify("Add a  Category--Column") == "add_a_category_column")
    assert(s.slugify("__weird__") == "weird")
    assert(s.slugify("x" * 100).length == 60)
    assert(s.slugify("Make it short", maxLen = 7) == "make_it")
  }

  test("artifacts land under <project-slug>/<layer> with kind-tagged names") {
    val store = fixedStore("cs-layout")
    store.saveAiGenerated("My Proj", "silver", "t1", "Add a column", "SELECT 1")
    store.saveConfirmed("My Proj", "silver", "t1", "SELECT 1", version = 3)
    store.saveDryRun("My Proj", "gold", "t2", "SELECT 2")
    val listing = store.list()
    assert(listing.map(_._1).distinct == Seq("my_proj"))
    assert(listing.exists { case (_, l, f) =>
      l == "silver" && f == "2026-01-01_00-00-00__t1__confirmed_v3.sql" })
    assert(listing.exists { case (_, l, f) =>
      l == "gold" && f == "2026-01-01_00-00-00__t2__dry_run.sql" })
    assert(listing.exists(_._3 ==
      "2026-01-01_00-00-00__add_a_column__ai_generated.sql"))
  }

  test("read round-trips content with header metadata") {
    val store = fixedStore("cs-read")
    val code = "SELECT a, b FROM __input__ WHERE a > 0"
    store.saveConfirmed("p", "silver", "step one", code, version = 2)
    val got = store.read("p", "silver",
      "2026-01-01_00-00-00__step_one__confirmed_v2.sql")
    assert(got.contains(code))
    assert(got.contains("-- Kind:       Silver Transformation (Confirmed)"))
    assert(got.contains("-- Version: 2"))
    assert(got.contains("-- Saved at:   2026-01-01T00:00:00Z"))
  }

  test("pipeline dump contains every step in order") {
    val store = fixedStore("cs-pipe")
    store.savePipeline("p", "silver",
      Seq(("first", 1, "SELECT 1"), ("second", 2, "SELECT 2")),
      inPath = "/in", outPath = "/out")
    val got = store.read("p", "silver",
      "2026-01-01_00-00-00__upload_to_silver__pipeline.sql")
    val i1 = got.indexOf("-- Transform 1: first (v1)")
    val i2 = got.indexOf("-- Transform 2: second (v2)")
    assert(i1 >= 0 && i2 > i1)
    assert(got.indexOf("SELECT 1") > i1 && got.indexOf("SELECT 1") < i2)
    assert(got.contains("-- Transforms: 2"))
  }

  test("list is empty for a store that never saved") {
    assert(fixedStore("cs-empty").list().isEmpty)
  }
}
