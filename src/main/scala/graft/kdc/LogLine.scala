package graft.kdc

/** A single raw KDC log line, classified.
  *
  * This is the ADT form of the reference's inline dispatch chain
  * (`/root/reference/.../KDCLogRecordReader.java:234-310`): separating
  * "what kind of line is this" (pure, unit-testable, this file) from
  * "how lines fold into a session" ([[Sessionizer]]).
  */
sealed trait LineEvent extends Product with Serializable

object LineEvent {

  /** Request header: `<ts> AS-REQ|TGS-REQ <client>@<crealm> from <ip> for <service>@<srealm>`
    * (`KDCLogRecordReader.java:50-54`). */
  final case class Header(
      ts: String,
      reqType: String, // ReqType constant, already mapped from AS-REQ/TGS-REQ
      client: String,
      crealm: String,
      ip: String,
      service: String,
      srealm: String) extends LineEvent

  /** `<ts> sending N bytes to <ip>` — terminates the session
    * (`KDCLogRecordReader.java:79-81,267-269`). */
  case object Sending extends LineEvent

  /** `Pre-authentication succeeded` — the only way an AS-REQ succeeds
    * (`KDCLogRecordReader.java:55,270-271`); the optional `using <et>`
    * suffix carries the preauth enctype
    * (`perl/kdcmapper-with-enctypes.pl:39`). */
  final case class PreauthOk(enctype: Option[String]) extends LineEvent

  /** `Client supported enctypes: <csv> using <X/Y>`
    * (`perl/kdcmapper-with-enctypes.pl:78-81`). */
  final case class Enctypes(supported: String, used: String) extends LineEvent

  /** A line matching the error taxonomy; `errorClass` is an
    * [[ErrorClass]] constant (`KDCLogRecordReader.java:272-297`). */
  final case class Err(errorClass: String, raw: String) extends LineEvent

  /** Timestamped verification failure — carries its own timestamp which
    * OVERWRITES the record ts (`KDCLogRecordReader.java:301-309`). */
  final case class TsErr(ts: String, msg: String) extends LineEvent

  /** `[Rr]eturning a referral to realm` (`KDCLogRecordReader.java:78,298-299`). */
  case object ReferralAnswer extends LineEvent

  /** Anything else — ignored by the fold. */
  case object Noise extends LineEvent
}

/** Line classifier. Pattern set and *dispatch order* reproduce the
  * reference's behavior (`KDCLogRecordReader.java:47-81` for the
  * patterns, `:234-310` for the precedence chain); the regex source text
  * below is written fresh against the Heimdal log format.
  *
  * Order matters and is preserved exactly:
  *   header > sending > preauth > bad-password > bad-name >
  *   unusable-name > bad-authentication > bad-parameters >
  *   failed-TGS-REP > referral > timestamped-verify-failures > noise.
  * First match wins per line.
  */
object LogLine {
  import LineEvent._

  private val Ts = """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"""
  private val Atom = """[-/_.a-zA-Z0-9]+"""
  private val Realm = """[-.a-zA-Z0-9]+"""
  private val Ip = """IPv4:[\d.]+|IPv6:[0-9a-fA-F.:]+"""

  // .unanchored => substring semantics, matching the reference's
  // Matcher.find() (a syslog prefix before the timestamp still matches).
  private val HeaderRe =
    s"""($Ts)\\s+((?:AS|TGS)-REQ)\\s+($Atom)@($Realm)\\s+from\\s+($Ip)\\s+for\\s+($Atom)@($Realm)""".r.unanchored
  private val PreauthEtRe =
    """Pre-authentication succeeded --\s+\S+@\S+\s+using\s+(\S+)""".r.unanchored
  private val EnctypesRe =
    """Client supported enctypes: (.*) using (\S+)""".r.unanchored
  private val SendingRe = s"""$Ts\\s+sending\\s+\\d+\\s+bytes\\s+to\\s+(?:$Ip)""".r.unanchored
  private val NoVerifyTgsRe = s"""($Ts)\\s+(Failed to verify AP-REQ:.*)""".r.unanchored
  private val FailedVerifyRe = s"""($Ts)\\s+(Failed to verify (?:checksum|authenticator).*)""".r.unanchored
  // Reference uses .matches() on ".*\bServer \(.*\) has no support.*\betypes\b.*"
  private val BadServerEtypeRe = """.*\bServer \(.*\) has no support.*\betypes\b.*""".r

  private val BadNameNeedles = Seq(
    "UNKNOWN --", "Client no longer in database",
    "Client not found in database", "Server not found in database")
  private val UnusableNameNeedles = Seq(
    "Client expired", "Client's key has expired", "Server's key has expired",
    "Principal may not act as server", "Principal may not act as client")
  private val BadAuthNeedles = Seq(
    "krb_rd_req:", "Too large time skew", "No key matches pa-data",
    "Addition ticket have not matching etypes",
    "Bad request for renewable ticket", "Ticket expired")
  private val BadParamNeedles = Seq(
    // leading-letter elision matches both Request/request, as the
    // reference does ("equest ...", KDCLogRecordReader.java:73-74)
    "equest to forward non-forwardable ticket",
    "equest to renew non-renewable ticket")

  def classify(line: String): LineEvent = line match {
    case HeaderRe(ts, reqtype, client, crealm, ip, service, srealm) =>
      val rt = reqtype match {
        case "AS-REQ"  => ReqType.AUTH
        case "TGS-REQ" => ReqType.TGS
        case _         => ReqType.UNKNOWN
      }
      Header(ts, rt, client, crealm, ip, service, srealm)
    case SendingRe() => Sending
    case _ if line.contains("Pre-authentication succeeded") =>
      PreauthOk(PreauthEtRe.findFirstMatchIn(line).map(_.group(1)))
    case _ if line.contains("Failed to decrypt PA-DATA --") =>
      Err(ErrorClass.BAD_PASSWORD, line)
    case _ if BadNameNeedles.exists(line.contains) =>
      Err(ErrorClass.BAD_NAME, line)
    case _ if UnusableNameNeedles.exists(line.contains) =>
      Err(ErrorClass.UNUSABLE_NAME, line)
    case _ if BadAuthNeedles.exists(line.contains) ||
              BadServerEtypeRe.matches(line) =>
      Err(ErrorClass.BAD_AUTHENTICATION, line)
    case _ if BadParamNeedles.exists(line.contains) =>
      Err(ErrorClass.BAD_PARAMETERS, line)
    case _ if line.contains("Failed building TGS-REP") =>
      Err(ErrorClass.UNKNOWN, line)
    case _ if line.contains("eturning a referral to realm") => ReferralAnswer
    case EnctypesRe(supported, used) => Enctypes(supported, used)
    case NoVerifyTgsRe(ts, msg)   => TsErr(ts, msg)
    case FailedVerifyRe(ts, msg)  => TsErr(ts, msg)
    case _ => Noise
  }
}
