package graft

import org.apache.spark.sql.functions._

import graft.functions.Cleansing._

/** Edge cases straight from the reference (SURVEY §5.2 item 2). */
class CleansingSpec extends GraftSuite {
  import spark.implicits._

  private def pct(in: String): Option[Double] =
    Seq(in).toDF("x").select(toPct($"x")).as[Option[Double]].head()

  test("toPct: '-' and blank → null (RSS gcp_rss.py:55-56)") {
    assert(pct("-").isEmpty)
    assert(pct("").isEmpty)
    assert(pct("  ").isEmpty)
  }

  test("toPct: percent strings → fraction (gcp_rss.py:58-60)") {
    assert(pct("12%").contains(0.12))
    assert(pct(" 7% ").contains(0.07))
  }

  test("toPct: plain numerics and junk (gcp_rss.py:61-63)") {
    assert(pct("0.5").contains(0.5))
    assert(pct("37").contains(37.0))
    assert(pct("junk").isEmpty)
  }

  test("parseFeedTs: feed layout round-trips; bad input → null (gcp_rss.py:31-37)") {
    val df = Seq("Thu 21 Mar 2019 09:00:11", "not a date",
      "Xyz 21 Mar 2019 09:00:11", "Mon 1 Jan 1996 00:00:00")
      .toDF("x").select(isoFormat(parseFeedTs($"x")).as("iso")).as[Option[String]].collect()
    assert(df(0).contains("2019-03-21T09:00:11"))
    assert(df(1).isEmpty)
    assert(df(2).isEmpty) // invalid day-of-week name, like Python %a
    assert(df(3).contains("1996-01-01T00:00:00"))
  }

  test("sentinels: epoch string and '0' tp/sl → null (gcp_rss.py:104-111)") {
    val r = Seq((EpochSentinel, "0"), ("Thu 21 Mar 2019 09:00:11", "1.5"))
      .toDF("ct", "tp")
      .select(nullIfEpoch($"ct").as("ct"), tryDouble(zeroToNull($"tp")).as("tp"))
      .as[(Option[String], Option[Double])].collect()
    assert(r(0) == ((None, None)))
    assert(r(1)._1.isDefined && r(1)._2.contains(1.5))
  }

  test("tryDouble: pandas errors='coerce' parity (gcp_csv.py:122-135)") {
    val r = Seq("1.25", "N/A", "", "1e3").toDF("x")
      .select(tryDouble($"x")).as[Option[Double]].collect()
    assert(r.toSeq == Seq(Some(1.25), None, None, Some(1000.0)))
  }

  test("accountIdFromPath: basename minus .csv (gcp_csv.py:79-80)") {
    val r = Seq("gs://b/testcsvs/acct_7.csv", "plain.csv", "noext")
      .toDF("p").select(accountIdFromPath($"p")).as[String].collect()
    assert(r.toSeq == Seq("acct_7", "plain", ""))
  }

  test("rowHash: stable md5 of composite key (gcp_csv.py:149-155)") {
    val r = Seq(("a", "1", "t")).toDF("x", "y", "z")
      .select(rowHash($"x", $"y", $"z")).as[String].head()
    assert(r == java.security.MessageDigest.getInstance("MD5")
      .digest("a|1|t".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}
