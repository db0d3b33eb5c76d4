package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The owned internal-pin lifecycle (r17 verdict #4): pin caches and
  * registers, releaseAll unpersists everything and is idempotent, the
  * per-session bound evicts oldest-first, and an operator that pins
  * internally (minhashLsh's sigs) leaves zero storage behind after a
  * release.
  */
class SessionPinsSpec extends SparkSpec {
  import spark.implicits._

  test("pin caches the frame; releaseAll unpersists it and is idempotent") {
    val before = SessionPins.pinCount(spark)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .withColumn("u", upper(col("s")))
    SessionPins.pin(df)
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "pin must cache")
    assert(SessionPins.pinCount(spark) == before + 1)
    SessionPins.releaseAll(spark)
    assert(df.storageLevel == StorageLevel.NONE, "releaseAll must unpersist")
    assert(SessionPins.pinCount(spark) == 0)
    SessionPins.releaseAll(spark) // idempotent
    assert(df.collect().length == 2, "released frames stay usable")
  }

  test("operator-internal pins are registered and release cleanly") {
    SessionPins.releaseAll(spark)
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 22L),
      (2L, "alpha beta gamma delta", "en", "s", 22L),
      (3L, "something else entirely here", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    operators.Dedup.minhashLsh(docs).collect()
    assert(SessionPins.pinCount(spark) >= 1,
      "minhashLsh's sigs pin must register with SessionPins")
    SessionPins.releaseAll(spark)
    assert(SessionPins.pinCount(spark) == 0)
  }

  test("the per-session bound unpersists oldest pins first") {
    SessionPins.releaseAll(spark)
    // the EFFECTIVE bound (env-aware): hardcoding 256 would test the
    // wrong bound (or fail spuriously) under GRAFT_MAX_SESSION_PINS
    val bound = sys.env.get("GRAFT_MAX_SESSION_PINS")
      .map(_.toInt).getOrElse(256)
    val frames = (0 until bound + 3).map { i =>
      SessionPins.pin(Seq((i.toLong, i.toString)).toDF("id", "s"))
    }
    frames.foreach(_.count())
    assert(SessionPins.pinCount(spark) == bound)
    // the 3 oldest fell off and were unpersisted
    frames.take(3).foreach(f =>
      assert(f.storageLevel == StorageLevel.NONE, "oldest must evict"))
    assert(frames.last.storageLevel != StorageLevel.NONE)
    SessionPins.releaseAll(spark)
    frames.foreach(f => assert(f.storageLevel == StorageLevel.NONE))
  }
}
