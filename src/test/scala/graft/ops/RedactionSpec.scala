package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(Redaction.scrub(col("t"))).head.getString(0)

  test("scrubs emails, IPs, and dashed phones; leaves ordinary text alone") {
    assert(scrubOne("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(scrubOne("host 192.168.0.1 down") == "host <IP> down")
    assert(scrubOne("call 555-123-4567 today") == "call <PHONE> today")
    assert(scrubOne("version 1.2 of plan 9 from user") == "version 1.2 of plan 9 from user")
    assert(scrubOne("x@y.io and 10.0.0.7 and 555-000-1111") ==
      "<EMAIL> and <IP> and <PHONE>")
  }

  test("counts match the number of redactions") {
    val df = Seq("a@b.co c@d.io 1.2.3.4 555-111-2222 555-333-4444").toDF("t")
      .select(Redaction.emailCount(col("t")).as("e"),
        Redaction.ipCount(col("t")).as("i"),
        Redaction.phoneCount(col("t")).as("p"))
    val r = df.head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 2)))
  }

  test("loose numbers do not trip the strict phone pattern") {
    assert(scrubOne("order 123-45-6789 and range 100-200") ==
      "order 123-45-6789 and range 100-200")
  }
}
