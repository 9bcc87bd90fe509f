package graft

import graft.functions.{WarcExprs, WarcSupport}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** [[WarcSupport]] — WARC/WET record splitting over untrusted bytes: the
  * length-driven walk must parse well-formed record sequences exactly and
  * NULL (never throw) on every malformation class.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(
      id: Long,
      text: String,
      version: String = "WARC/1.0",
      typeHeader: String = "WARC-Type: conversion",
      lengthName: String = "Content-Length"
  ): String = {
    val octets = text.getBytes("UTF-8").length
    s"$version\r\n$typeHeader\r\nWARC-Target-URI: https://example.org/doc/$id\r\n" +
      s"$lengthName: $octets\r\n\r\n$text\r\n\r\n"
  }

  private def parse(blob: Array[Byte]) =
    Seq(Tuple1(blob)).toDF("content")
      .select(explode(WarcExprs.warcRecords($"content")).as("r"))
      .select($"r.warc_type", $"r.target_uri", $"r.content_length", $"r.payload")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))

  private def isNull(blob: Array[Byte]): Boolean =
    Seq(Tuple1(blob)).toDF("content")
      .select(WarcExprs.warcRecords($"content").as("r")).head().isNullAt(0)

  test("multi-record blob round-trips: fields, octet lengths, payloads") {
    val blob = (rec(1, "hello world") + rec(2, "café — résumé")).getBytes("UTF-8")
    val out = parse(blob)
    assert(out.length == 2)
    assert(out(0) == (("conversion", "https://example.org/doc/1", 11L, "hello world")))
    assert(out(1)._3 == "café — résumé".getBytes("UTF-8").length.toLong)
    assert(out(1)._4 == "café — résumé")
  }

  test("WARC/1.1 accepted; header names case-insensitive") {
    val blob = rec(3, "x", version = "WARC/1.1", typeHeader = "warc-type: response",
      lengthName = "CONTENT-LENGTH").getBytes("UTF-8")
    val out = parse(blob)
    assert(out.head._1 == "response" && out.head._3 == 1L)
  }

  test("payload containing 'WARC/1.0' cannot desync the length-driven walk") {
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    val blob = (rec(4, tricky) + rec(5, "after")).getBytes("UTF-8")
    val out = parse(blob)
    assert(out.length == 2 && out(0)._4 == tricky && out(1)._4 == "after")
  }

  test("deprecated header folding: continuation lines extend the value") {
    val blob = ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://e.org/a\r\n" +
      " b/c\r\nContent-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val out = parse(blob)
    assert(out.head._2 == "https://e.org/a b/c")
  }

  test("zero-length payload is a valid record") {
    val blob = "WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("UTF-8")
    val out = parse(blob)
    assert(out.head._3 == 0L && out.head._4 == "")
    assert(out.head._1 == null && out.head._2 == null) // absent headers → null fields
  }

  test("malformation battery: every corrupt class NULLs, none throws") {
    val good = rec(1, "hello world")
    val cases = Seq(
      "garbage bytes not warc at all",
      "WARC/2.0" + good.drop(8), // unknown version
      good.replace("Content-Length: 11", "Content-Length: 99"), // lying length (past buffer)
      good.replace("Content-Length: 11", "Content-Length: eleven"), // non-numeric
      good.replace("Content-Length: 11\r\n", ""), // missing mandatory length
      good.dropRight(2), // missing half the record terminator
      good.dropRight(4), // missing the whole terminator
      good + "trailing garbage", // junk after the last record
      good.replace("WARC-Type: conversion", "WARC-Type conversion"), // no colon
      "WARC/1.0\r\n trailing: fold-first\r\nContent-Length: 0\r\n\r\n\r\n\r\n", // fold before any header
      "" // empty blob
    )
    cases.foreach { c => assert(isNull(c.getBytes("UTF-8")), s"expected NULL for: ${c.take(40)}…") }
    assert(isNull(null)) // NULL in → NULL out (nullSafeEval contract)
  }

  test("lying SHORT length leaves unconsumed bytes that fail as a next record") {
    val good = rec(1, "hello world")
    assert(isNull(good.replace("Content-Length: 11", "Content-Length: 5").getBytes("UTF-8")))
  }

  test("warcFixture packs decades in id order and the parser round-trips it") {
    val docs = (0L until 25L).map(i => (i, s"doc text number $i")).toDF("doc_id", "text")
    val files = Multimodal.warcFixture(docs, "doc_id", "text")
    assert(files.count() == 3)
    val out = files
      .select($"file_id", posexplode(WarcExprs.warcRecords($"content")).as(Seq("i", "r")))
      .select($"file_id", $"i", $"r.target_uri", $"r.payload".cast("string"))
      .orderBy($"file_id", $"i")
      .collect()
    assert(out.length == 25)
    assert(out.head.getString(2) == "https://example.org/doc/0")
    assert(out.last.getString(3) == "doc text number 24")
    // within a file, records are ordered by id
    assert(out.filter(_.getLong(0) == 1L).map(_.getString(2)).toSeq ==
      (10 to 19).map(i => s"https://example.org/doc/$i"))
  }

  test("SQL registration: graft_warc_records") {
    val blob = rec(7, "sql path").getBytes("UTF-8")
    Seq(Tuple1(blob)).toDF("content").createOrReplaceTempView("warc_blobs")
    val n = spark.sql(
      "SELECT size(graft_warc_records(content)) AS n FROM warc_blobs").head().getInt(0)
    assert(n == 1)
  }
}
