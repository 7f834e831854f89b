package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Checksum-validated PII detection — the precision upgrade over the
  * pattern-only scrubbing in [[TextAnalysis.piiScrub]].
  *
  * A 16-digit run is usually NOT a payment card (ids, hashes, phone
  * concatenations); pattern-only scanners over a web corpus drown in
  * those false positives. The industry answer is the Luhn check (ISO/IEC
  * 7812's checksum, public since 1960): validate the check digit before
  * flagging. This file implements it as pure higher-order Column
  * expressions — `transform`/`filter`/`aggregate` over a position
  * sequence — so the whole scan stays inside whole-stage codegen with
  * zero UDFs and zero shuffles, and an external SQL engine reproduces
  * it with list comprehensions (the q160 oracle does exactly that).
  */
object PiiScan {

  /** Candidate runs: 13–19 consecutive digits (the ISO/IEC 7812 PAN
    * length range). Leftmost, greedy, non-overlapping in both Java
    * regex and RE2 — a 20+-digit run yields its 19-digit prefix, which
    * is the desired "not obviously a card, still checked" behavior.
    */
  def panCandidates(text: Column): Column =
    regexp_extract_all(text, lit("[0-9]{13,19}"), lit(0))

  /** Luhn checksum over a digit string: from the RIGHTMOST digit,
    * double every second one, fold digits of the doubled values
    * (`2d > 9 → 2d − 9`), valid iff the total ≡ 0 (mod 10).
    */
  def luhnValid(num: Column): Column = {
    val n = length(num)
    val total = aggregate(
      transform(sequence(lit(1), n), i => {
        val d = substr(num, n - i + 1, lit(1)).cast("int")
        val doubled = d * 2
        when(i % 2 === 0,
          when(doubled > 9, doubled - 9).otherwise(doubled))
          .otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** Per-document scan: candidate count, Luhn-valid count, and the
    * resulting flag. One projection; cost is linear in text size.
    */
  def scan(text: Column): (Column, Column, Column) = {
    val cands = panCandidates(text)
    val valid = filter(cands, c => luhnValid(c))
    (size(cands).cast("long"), size(valid).cast("long"),
      size(valid) > 0)
  }
}
