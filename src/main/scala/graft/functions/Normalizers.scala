package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Type normalizers — the Spark re-expression of `datawave.data.type.*`
  * (SURVEY.md §1.2). The reference stores everything as strings and
  * normalizes at ingest + query time; we keep native Spark types where
  * possible and provide these for string-side parity. All are native
  * column expressions (codegen'd).
  */
object Normalizers {

  private val accented =
    "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÇçÑñÝýÿ"
  private val plain =
    "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOOooooooUUUUuuuuCcNnYyy"

  /** LcNoDiacriticsType: lowercase + strip (Latin-1) diacritics.
    * `translate` is a char-map — no regex engine in the hot path. */
  def lcNoDiacritics(c: Column): Column =
    lower(translate(c, accented, plain))

  /** LcType: plain lowercase. */
  def lc(c: Column): Column = lower(c)

  /** Driver-side LcNoDiacritics for query literals (same char map as the
    * column form, so a normalized literal matches a normalized column). */
  def lcNoDiacriticsLiteral(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    s.foreach { ch =>
      val i = accented.indexOf(ch.toInt)
      b.append(if (i >= 0) plain(i) else ch)
    }
    b.toString.toLowerCase
  }

  /** NumberType: the reference lexically encodes decimals so strings sort
    * numerically; in Spark we keep real numerics — normalization is a
    * decimal cast (sorting/comparison is native). */
  def number(c: Column): Column = c.cast("decimal(38,10)")

  /** IpAddressType: canonical dotted-quad — strip leading zeros per octet
    * ('010.001.002.003' → '10.1.2.3'). */
  def ipAddress(c: Column): Column =
    regexp_replace(c, "(^|\\.)0*(\\d)", "$1$2")

  /** TrimLeadingZerosType. */
  def trimLeadingZeros(c: Column): Column =
    regexp_replace(c, "^0+(?=.)", "")

  /** HexStringType: canonical lowercase hex. */
  def hexString(c: Column): Column = lower(c)

  /** DateType: parse to timestamp (UTC session). */
  def date(c: Column, fmt: String = "yyyy-MM-dd HH:mm:ss"): Column =
    coalesce(
      to_timestamp(c, fmt),
      to_timestamp(c, "yyyy-MM-dd"),
      to_timestamp(c, "yyyyMMdd"),
      to_timestamp(c))

  /** Normalizer lookup by reference type name (AttributeFactory.java:
    * 26-33 consumers; names accept short + `datawave.data.type` forms). */
  def byName(name: String): Column => Column = name.toLowerCase match {
    case "lc" | "lctype" => lc
    case "lcnodiacritics" | "lcnd" | "lcnodiacriticstype" => lcNoDiacritics
    case "number" | "numbertype" => number
    case "ip" | "ipaddress" | "ipaddresstype" => ipAddress
    case "trimleadingzeros" | "trimleadingzerostype" => trimLeadingZeros
    case "hex" | "hexstring" | "hexstringtype" => hexString
    case "noop" | "nooptype" | "none" => identity
    case "date" | "datetype" => date(_)
    case other => throw new IllegalArgumentException(s"unknown normalizer $other")
  }

  /** Driver-side check: does a query LITERAL normalize under the named
    * normalizer? (the per-term failure test ExpandMultiNormalizedTerms
    * makes before keeping/dropping a normalization). String transforms
    * always succeed; typed parses succeed iff the literal parses. */
  def literalNormalizes(name: String, raw: String): Boolean = name.toLowerCase match {
    case "number" | "numbertype" =>
      scala.util.Try(BigDecimal(raw)).isSuccess
    case "ip" | "ipaddress" | "ipaddresstype" =>
      val parts = raw.split("\\.", -1)
      parts.length == 4 && parts.forall(p =>
        p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) && p.toInt <= 255)
    case "date" | "datetype" =>
      Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyyMMdd").exists { f =>
        scala.util.Try(java.time.LocalDate.parse(raw.take(10),
          java.time.format.DateTimeFormatter.ofPattern(f.take(10)))).isSuccess
      } || scala.util.Try(java.time.Instant.parse(raw)).isSuccess
    case _ => true
  }

  /** Reverse-index value (shardReverseIndex analog): store reversed
    * normalized values so leading-wildcard queries become prefix scans. */
  def reversed(c: Column): Column = reverse(c)

  /** GeoType-lite: encode (lat, lon) into a z-order-ish interleaved key
    * for range-prunable storage (GeoWave SFC analog, much simplified:
    * 20-bit per-dimension interleave). */
  def geoPointZ(lat: Column, lon: Column): Column = {
    val latQ = ((lat + 90.0) / 180.0 * ((1 << 20) - 1)).cast("long")
    val lonQ = ((lon + 180.0) / 360.0 * ((1 << 20) - 1)).cast("long")
    val bits = (0 until 20).map { i =>
      val latBit = shiftright(latQ, i).bitwiseAND(lit(1L))
      val lonBit = shiftright(lonQ, i).bitwiseAND(lit(1L))
      call_function("shiftleft", latBit, lit(2 * i + 1))
        .bitwiseOR(call_function("shiftleft", lonBit, lit(2 * i)))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
