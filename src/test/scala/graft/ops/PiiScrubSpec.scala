package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** scrubPii (q80): hand-built redaction truth table, the planted fixture's
  * count schedule, and no-PII pass-through.
  */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redacts emails, SSNs, phones; counts match; clean text exact") {
    val d = Seq(
      (0L, "contact user1.x@mail0.example.com now"),
      (1L, "ssn 123-45-6789 and phone (415) 555-0137 here"),
      (2L, "two mails a@b.co c.d@e.org end"),
      (3L, "no pii at all"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.scrubPii(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ssns"),
          r.getAs[Long]("n_phones"), r.getAs[String]("clean_text")))).toMap
    assert(got(0L) === ((1L, 0L, 0L, "contact [EMAIL] now")))
    assert(got(1L) === ((0L, 1L, 1L, "ssn [SSN] and phone [PHONE] here")))
    assert(got(2L) === ((2L, 0L, 0L, "two mails [EMAIL] [EMAIL] end")))
    assert(got(3L) === ((0L, 0L, 0L, "no pii at all")))
    assert(got(4L) === ((0L, 0L, 0L, "")))
  }

  test("planted fixture: counts follow the 3/5/7 schedule, residual text clean") {
    val n = 105L
    val got = TextOps.scrubPii(graft.model.Synth.piiDocs(spark, n)).collect()
    assert(got.length === n)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") === (if (id % 3 == 0) 1L else 0L), s"doc $id")
      assert(r.getAs[Long]("n_ssns") === (if (id % 5 == 0) 1L else 0L), s"doc $id")
      assert(r.getAs[Long]("n_phones") === (if (id % 7 == 0) 1L else 0L), s"doc $id")
      val clean = r.getAs[String]("clean_text")
      assert(!clean.matches(s".*${TextOps.EmailRe}.*"), s"doc $id: $clean")
      assert(!clean.matches(s".*${TextOps.SsnRe}.*"), s"doc $id: $clean")
      assert(!clean.matches(s".*${TextOps.PhoneRe}.*"), s"doc $id: $clean")
    }
  }
}
