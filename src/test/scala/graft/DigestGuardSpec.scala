package graft

/** Digest-entry refresh guard: the m8/m10–m12/d20 and q20/h8 oracles
  * carry COMMITTED digest VALUES keyed by a corpus fingerprint
  * (documents `SUM(length(text))` for the codec family, lineitem
  * `COUNT(*)` for the HLL entries — see [[graft.tools.OracleDigests]]).
  * If the testdata regenerates, the oracle's fingerprint join returns
  * zero rows and the driver fails with an opaque rows-mismatch hours
  * later; this spec fails FIRST, by entry name, with the regeneration
  * instruction, at both gate SFs.
  */
class DigestGuardSpec extends SparkSpec {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  // standalone-number match: a fingerprint must not pass by appearing
  // as a substring of an unrelated committed digit run
  private def hasToken(sql: String, fp: Long): Boolean =
    ("(?<!\\d)" + fp + "(?!\\d)").r.findFirstIn(sql).nonEmpty

  test("documents-fingerprinted digest oracles cover the on-disk gate corpora") {
    for (d <- sfDirs) {
      val fp = Tables.documents(spark, d)
        .selectExpr("sum(length(text))").head().getLong(0)
      for (n <- Seq("m8_jpeg_decode", "m10_jpeg420_decode",
          "m11_audio_spectrum", "m12_image_phash", "d20_phash_neardup"))
        assert(hasToken(SparkEntry.oracleSql(n), fp),
          s"$n: no committed digest block for documents fingerprint $fp " +
            s"($d) — the testdata drifted; re-run graft.tools.OracleDigests " +
            "and repaste the VALUES blocks")
    }
  }

  test("lineitem-fingerprinted digest oracles cover the on-disk gate corpora") {
    for (d <- sfDirs) {
      val fp = Tables.lineitem(spark, d).count()
      for (n <- Seq("q20_approx_sketch", "h8_hier_agg_approx"))
        assert(hasToken(SparkEntry.oracleSql(n), fp),
          s"$n: no committed digest block for lineitem fingerprint $fp " +
            s"($d) — the testdata drifted; re-run graft.tools.OracleDigests " +
            "and repaste the VALUES blocks")
    }
  }
}
