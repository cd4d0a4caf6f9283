package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A/B bucketing + SRM (q148). Pins (a) assignment determinism (same
  * user, same variant, any partitioning/rerun), (b) the chi-square value
  * against a hand replica and the 3.841 flag on a forced imbalance,
  * (c) conversion counting (a user converts once no matter how many
  * purchase events), (d) the balanced synth stream does NOT flag.
  */
class AbSrmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = LocalDateTime.of(2024, 6, 1, 0, 0, 0)

  private def ev(rows: Seq[(Long, String)]) =
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, T0.plusSeconds(i.toLong), u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def variantOf(u: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ab1$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2
  }

  test("assignment is deterministic and hash-derived") {
    val rows = (0L until 200L).map(u => (u, "view"))
    val got = Sessionize.abSrmCheck(ev(rows), "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L until 200L).groupBy(variantOf).map {
      case (v, us) => v -> us.size.toLong
    }
    assert(got === expect)
  }

  test("chi-square matches a hand replica; forced imbalance flags SRM") {
    // pick 40 users of one variant only -> maximal imbalance
    val oneVariant = (0L until 400L).filter(variantOf(_) == 0L).take(40)
    val rows = oneVariant.map(u => (u, "view"))
    val got = Sessionize.abSrmCheck(ev(rows), "purchase").collect()
    val n = 40.0
    val chi = ((40.0 - n / 2) * (40.0 - n / 2) / (n / 2)) * 2.0
    got.foreach { r =>
      assert(r.getLong(3) === math.round(chi * 1e9))
      assert(r.getBoolean(4) === true)
    }
  }

  test("a user converts once regardless of purchase-event count") {
    val rows = Seq((1L, "purchase"), (1L, "purchase"), (1L, "view"),
      (2L, "view"))
    val got = Sessionize.abSrmCheck(ev(rows), "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.sum === 1L)
  }

  test("partition invariance; balanced stream does not flag") {
    val rows = (0L until 300L).flatMap(u =>
      Seq((u, "view")) ++ (if (u % 3 == 0) Seq((u, "purchase")) else Nil))
    val df = ev(rows)
    val a = Sessionize.abSrmCheck(df.repartition(3), "purchase")
      .orderBy("variant").collect().toSeq
    val b = Sessionize.abSrmCheck(df.repartition(17), "purchase")
      .orderBy("variant").collect().toSeq
    assert(a === b)
    assert(a.forall(!_.getBoolean(4)))
  }
}
