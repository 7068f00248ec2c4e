package graft.kdc

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Enctype composite-key aggregations (the Perl variant's surface,
  * `perl/kdcmapper-with-enctypes.pl`). */
class EnctypeStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val log = Seq(
    // alice: two aes256 preauths, one arcfour
    "2015-11-22T10:00:00 AS-REQ alice@X.ORG from IPv4:1.1.1.1 for krbtgt/X.ORG@X.ORG",
    "2015-11-22T10:00:00 ENC-TS Pre-authentication succeeded -- alice@X.ORG using aes256-cts",
    "2015-11-22T10:00:00 sending 1 bytes to IPv4:1.1.1.1",
    "2015-11-22T11:00:00 AS-REQ alice@X.ORG from IPv4:1.1.1.1 for krbtgt/X.ORG@X.ORG",
    "2015-11-22T11:00:00 ENC-TS Pre-authentication succeeded -- alice@X.ORG using aes256-cts",
    "2015-11-22T11:00:00 sending 1 bytes to IPv4:1.1.1.1",
    "2015-11-22T12:00:00 AS-REQ alice@X.ORG from IPv4:1.1.1.1 for krbtgt/X.ORG@X.ORG",
    "2015-11-22T12:00:00 ENC-TS Pre-authentication succeeded -- alice@X.ORG using arcfour-hmac",
    "2015-11-22T12:00:00 sending 1 bytes to IPv4:1.1.1.1",
    // bob: preauth without 'using' → UNK bucket
    "2015-11-22T13:00:00 AS-REQ bob@X.ORG from IPv4:2.2.2.2 for krbtgt/X.ORG@X.ORG",
    "2015-11-22T13:00:00 ENC-TS Pre-authentication succeeded -- bob@X.ORG",
    "2015-11-22T13:00:00 sending 1 bytes to IPv4:2.2.2.2",
    // TGS to svc with enctype negotiation
    "2015-11-22T14:00:00 TGS-REQ alice@X.ORG from IPv4:1.1.1.1 for host/w.x.org@X.ORG",
    "2015-11-22T14:00:00 Client supported enctypes: aes256-cts, aes128-cts, des3, using aes256-cts/aes256-cts",
    "2015-11-22T14:00:00 sending 1 bytes to IPv4:1.1.1.1",
    // TGS with no enctype line → UNK
    "2015-11-22T15:00:00 TGS-REQ bob@X.ORG from IPv4:2.2.2.2 for host/w.x.org@X.ORG",
    "2015-11-22T15:00:00 sending 1 bytes to IPv4:2.2.2.2")

  private lazy val recs = KdcSource.fromLines(spark, log)

  test("user × preauth-enctype counts match the u:user/et keys") {
    val got = KdcQueries.userEnctypeStats(recs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("alice", "aes256-cts") -> 2L,
      ("alice", "arcfour-hmac") -> 1L,
      ("bob", "UNK") -> 1L))
  }

  test("service × enctype-triple counts match the s:svc/first/last/used keys") {
    val got = KdcQueries.serviceEnctypeStats(recs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("host/w.x.org", "aes256-cts/des3/aes256-cts/aes256-cts") -> 1L,
      ("host/w.x.org", "UNK") -> 1L))
  }
}
