package graft.kdc

/** Request-type domain of a KDC log session.
  *
  * Mirrors the enum domain of the reference
  * (`/root/reference/src/main/java/edu/cmu/cc/hadoop/kerberos/loganalyzer/ReqType.java:18-19`).
  * Kept as String constants: a Spark `StringType` column with a
  * parser-enforced domain dictionary-encodes to nothing in parquet and
  * stays codegen-friendly, where a JVM enum would force kryo encoders.
  */
object ReqType {
  val AUTH = "AUTH"
  val TGS = "TGS"
  val KRB4 = "KRB4"
  val KASERVER = "KASERVER"
  val SOCKERROR = "SOCKERROR"
  val UNKNOWN = "UNKNOWN"
}

/** Coarse error taxonomy of a KDC request
  * (`/root/reference/.../KDCLogErrorClass.java:3-11`). */
object ErrorClass {
  val NO_ERROR = "NO_ERROR"
  val BAD_NAME = "BAD_NAME"
  val UNUSABLE_NAME = "UNUSABLE_NAME"
  val BAD_PASSWORD = "BAD_PASSWORD"
  val BAD_PARAMETERS = "BAD_PARAMETERS"
  val BAD_AUTHENTICATION = "BAD_AUTHENTICATION"
  val UNKNOWN = "UNKNOWN"
}

/** One Kerberos request "session": several consecutive raw log lines
  * folded into a single structured record.
  *
  * Field-for-field the data model of the reference's
  * `KDCLogRecord` Writable (`/root/reference/.../KDCLogRecord.java:24-36`),
  * except that we keep `crealm`/`srealm` everywhere (the reference drops
  * them in its binary serialization, `KDCLogRecord.java:224-240` — a
  * wire-size hack that columnar parquet makes moot).
  *
  * `ts` stays an ISO-8601 `yyyy-MM-dd'T'HH:mm:ss` string at the parse
  * boundary (lexical order == chronological order for this fixed-width
  * format, which is exactly how the reference compares it,
  * `KDCLogRecord.java:249`); queries cast with `to_timestamp` when they
  * need TimestampType semantics.
  */
case class KdcLogRecord(
    valid: Boolean = false,
    ts: String = null,
    req_type: String = ReqType.UNKNOWN,
    error_class: String = ErrorClass.NO_ERROR,
    client: String = null,
    crealm: String = null,
    service: String = null,
    srealm: String = null,
    client_ip: String = null,
    success: Boolean = false,
    referral: Boolean = false,
    error: String = null,
    // enctype negotiation (the Perl variant's surface,
    // `perl/kdcmapper-with-enctypes.pl:39-57,78-81`):
    preauth_enctype: String = null,     // "using X" on the preauth line
    supported_enctypes: String = null,  // raw CSV before " using"
    used_enctype: String = null)        // the "X/Y" pair after it
