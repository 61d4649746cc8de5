package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.sinks.Sinks
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite with SparkTestBase {

  private val mapper = new ObjectMapper()
  private def node(json: String) = mapper.readTree(json)

  test("data-key resolver: dot paths, bracket indices, auto keys") {
    val root = node(
      """{"query":{"recentchanges":[{"a":1}]},
         "data":[{"b":2}],
         "arr":[{"x":[{"c":3}]}]}""")
    assert(Sources.resolveDataNode(root, Some("query.recentchanges"))
      .get(0).get("a").asInt == 1)
    assert(Sources.resolveDataNode(root, Some("arr[0].x"))
      .get(0).get("c").asInt == 3)
    // no key: auto-try results/data/items/records/rows
    assert(Sources.resolveDataNode(root, None).get(0).get("b").asInt == 2)
    // root array passes through
    val arr = node("""[{"d":4}]""")
    assert(Sources.resolveDataNode(arr, None).get(0).get("d").asInt == 4)
  }

  test("pagination follows next cursor and stops at null") {
    var calls = 0
    val fetch: String => String = { url =>
      calls += 1
      val page = url.split("p=").last.toInt
      val next = if (page < 2) s""""http://x?p=${page + 1}"""" else "null"
      s"""{"rows":[{"v":$page}],"next":$next}"""
    }
    val recs = Sources.fetchApiRecords(fetch,
      Sources.ApiConfig("http://x?p=0", nextKey = Some("next")))
    assert(calls == 3 && recs.size == 3)
  }

  test("pagination respects maxPages cap") {
    val fetch: String => String =
      _ => """{"rows":[{"v":1}],"next":"http://x?again"}"""
    val recs = Sources.fetchApiRecords(fetch,
      Sources.ApiConfig("http://x", nextKey = Some("next"), maxPages = 4))
    assert(recs.size == 4)
  }

  test("auth config derives the Authorization header; none leaves headers alone") {
    import Sources.{ApiAuth, ApiConfig}
    val base = ApiConfig("http://x", headers = Map("X-Trace" -> "t1"))
    assert(Sources.authHeaders(base) == Map("X-Trace" -> "t1"))
    val basic = Sources.authHeaders(
      base.copy(auth = ApiAuth.Basic("user", "s3cret")))
    // RFC 7617: base64("user:s3cret"); declared headers survive.
    assert(basic("Authorization") == "Basic dXNlcjpzM2NyZXQ=")
    assert(basic("X-Trace") == "t1")
    val bearer = Sources.authHeaders(base.copy(auth = ApiAuth.Bearer("tok")))
    assert(bearer("Authorization") == "Bearer tok")
  }

  test("GET page-number pagination appends the declared page param, stops on empty") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetch: Sources.ApiRequest => String = { req =>
      assert(req.method == "GET")
      seen += req.url
      val p = req.url.split("cursor=").last.toInt
      if (p < 2) s"""{"rows":[{"v":$p}]}""" else """{"rows":[]}"""
    }
    val recs = Sources.fetchApiRecordsWith(fetch,
      Sources.ApiConfig("http://x?fmt=json", dataKey = Some("rows"),
        pageParam = "cursor", maxPages = 10))
    assert(recs.size == 2)
    assert(seen.toSeq == Seq("http://x?fmt=json&cursor=0",
      "http://x?fmt=json&cursor=1", "http://x?fmt=json&cursor=2"))
  }

  test("POST pagination injects the page into the body, preserving declared fields") {
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    val fetch: Sources.ApiRequest => String = { req =>
      assert(req.method == "POST")
      bodies += req.body.get
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(req.body.get)
      assert(node.get("q").asText == "widgets")
      val p = node.get("page").asInt
      if (p == 0) """{"rows":[{"v":0}]}""" else """{"rows":[]}"""
    }
    val recs = Sources.fetchApiRecordsWith(fetch,
      Sources.ApiConfig("http://x", dataKey = Some("rows"),
        method = "POST", body = Some("""{"q":"widgets"}""")))
    assert(recs.size == 1 && bodies.size == 2)
  }

  test("a server demanding auth rejects an unauthed config loudly") {
    val fetch: Sources.ApiRequest => String = { req =>
      require(req.headers.contains("Authorization"), "401 Unauthorized")
      """{"rows":[]}"""
    }
    val e = intercept[IllegalArgumentException] {
      Sources.fetchApiRecordsWith(fetch,
        Sources.ApiConfig("http://x", dataKey = Some("rows")))
    }
    assert(e.getMessage.contains("401"))
  }

  test("glob scan: extensions, decoys, one-level recursion, sorted") {
    val base = Files.createTempDirectory("graft_globspec")
    Files.writeString(base.resolve("b.csv"), "x\n1")
    Files.writeString(base.resolve("a.JSONL"), "{}")
    Files.writeString(base.resolve("notes.txt"), "decoy")
    Files.writeString(base.resolve("_hidden.csv"), "decoy")
    val sub = Files.createDirectories(base.resolve("sub"))
    Files.writeString(sub.resolve("c.parquet"), "")
    val subsub = Files.createDirectories(sub.resolve("deeper"))
    Files.writeString(subsub.resolve("d.csv"), "too deep")
    val found = Sources.globScan(spark, base.toString)
      .map(_.split('/').last)
    assert(found == Seq("a.JSONL", "b.csv", "c.parquet"))
  }

  test("table-name sanitization matches the postgres rules") {
    assert(Sinks.sanitizeTableName("Valid_name.v2") == "Valid_name.v2")
    assert(Sinks.sanitizeTableName("9starts-with digit!")
      == "t_9starts_with_digit_")
    assert(Sinks.sanitizeTableName("x" * 80).length == 63)
  }

  test("jdbc round-trip: replace+append+fail semantics against Derby") {
    val out = graft.operators.SourceSinkQueries.jdbcRoundTrip(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    // every group saw exactly the replace copy + the append copy, and
    // the fail-mode write was rejected
    assert(out.forall(_.getLong(2) == 2L), "n_copies must be 2 everywhere")
    assert(out.forall(_.getBoolean(5)), "fail mode must be rejected")
  }

  test("jdbc partitioned extract equals the parquet source") {
    import org.apache.spark.sql.functions.col
    val viaDb = graft.operators.SourceSinkQueries.scanDb(spark, sfDir)
      .collect().map(_.toSeq)
    val direct = graft.operators.Relational.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .filter(col("c_custkey") <= 300).orderBy("c_custkey")
      .collect().map(_.toSeq)
    assert(viaDb.toSeq == direct.toSeq)
  }

  test("rest api scan builds a typed dataframe through pagination") {
    val fetch: String => String = { url =>
      val page = url.split("p=").last.toInt
      val next = if (page == 0) s""""http://x?p=1"""" else "null"
      s"""{"items":[{"id":${page * 2},"name":"r${page * 2}"},
                    {"id":${page * 2 + 1},"name":"r${page * 2 + 1}"}],
          "next":$next}"""
    }
    val df = Sources.scanRestApi(spark, fetch,
      Sources.ApiConfig("http://x?p=0", dataKey = Some("items"),
        nextKey = Some("next")))
    assert(df.count() == 4)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
  }

  test("dynamic backfill physically leaves other partitions' files alone") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational
    val out = graft.util.Scratch.dir("graft_bfspec").resolve("t").toString
    val orders = Relational.table(spark, sfDir, "orders")
      .withColumn("_p", date_trunc("year", col("o_orderdate")).cast("date"))
      .select(col("o_orderkey"), col("o_totalprice"), col("_p"))
    orders.write.partitionBy("_p").parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_p="))
      .map(_.getName).sorted
    assert(parts.length >= 2, "fixture needs multiple partitions")
    val target = parts.head
    val others = parts.tail
    def snapshot(p: String): Map[String, Long] =
      new java.io.File(s"$out/$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    val before = others.map(p => p -> snapshot(p)).toMap
    val targetDate = java.sql.Date.valueOf(
      target.stripPrefix("_p="))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try orders.filter(col("_p") === lit(targetDate))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.mode("overwrite").partitionBy("_p").parquet(out)
    finally spark.conf.set(key, prev)
    others.foreach { p =>
      assert(snapshot(p) == before(p),
        s"partition $p was rewritten by the backfill")
    }
    // And the target partition WAS replaced (new files).
    assert(snapshot(target).nonEmpty)
    val total = spark.read.parquet(out).count()
    assert(total == orders.count(), "no row doubling, no truncation")
  }
}
