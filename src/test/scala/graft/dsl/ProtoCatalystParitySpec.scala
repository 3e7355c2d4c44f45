package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import ProtobufCore._

/** Differential lock of the native protobuf expressions
  * ([[ProtoDecodeExpr]]/[[ProtoEncodeExpr]], the `protoDe`/`protoSer`
  * path) against the independently-implemented JSON leg
  * (`protoDeJson`/`protoSerJson`) over [[ProtoGen]]'s random
  * schema/value draws, THROUGH a real DataFrame plan (so analysis,
  * type checks and UnsafeProjection all run):
  *
  *  - decoded structs render to identical JSON (`to_json` equality covers
  *    every nested field, map order included);
  *  - the native encode of the native decode is byte-identical to the
  *    original canonical bytes (and so to the JSON leg's encode, which
  *    `ProtobufCorePropertySpec` locks to the same bytes);
  *  - wider-writer draws: a narrow reader with `keepUnknown` re-encodes
  *    byte-identically through the native path too.
  *
  * Draws are batched as columns of one single-row DataFrame — one
  * analyzed plan per batch, not per draw.
  */
class ProtoCatalystParitySpec extends SparkSpec {
  import ProtoGen._

  private val batches = 3
  private val perBatch = 40

  private def narrowOf(rnd: scala.util.Random, m: PMessage): PMessage =
    PMessage(m.fields.filter(_ => rnd.nextInt(3) > 0).map { f =>
      f.ptype match {
        case sub: PMessage => f.copy(ptype = narrowOf(rnd, sub))
        case PMap(k, sub: PMessage) => f.copy(ptype = PMap(k, narrowOf(rnd, sub)))
        case _ => f
      }
    })

  test("native decode/encode ≡ JSON leg on random schemas, through a DataFrame") {
    val rnd = new scala.util.Random(83)
    (1 to batches).foreach { batch =>
      val draws = (1 to perBatch).map { _ =>
        val msg = randMessage(rnd, 0)
        val bytes = encodeFromJson(
          mapper.writeValueAsString(randValue(rnd, msg)), msg)
        (msg, bytes)
      }
      val checks: Seq[Column] = draws.zipWithIndex.flatMap { case ((msg, bytes), i) =>
        val b = lit(bytes)
        val direct = protoDe(b, msg, keepUnknown = true)
        val viaJson = protoDeJson(b, msg, keepUnknown = true)
        Seq(
          (to_json(direct) <=> to_json(viaJson)).as(s"dec_$i"),
          (protoSer(direct, msg) <=> b).as(s"enc_$i"))
      }
      val row = spark.range(1).select(checks: _*).head()
      (0 until row.length).foreach { j =>
        assert(row.getBoolean(j),
          s"batch $batch ${row.schema.fieldNames(j)} mismatch: " +
            s"schema=${draws(j / 2)._1} bytes=${draws(j / 2)._2.toSeq}")
      }
    }
  }

  test("native narrow-reader unknown capture re-encodes byte-identically") {
    val rnd = new scala.util.Random(97)
    var sawUnknown = 0
    (1 to 2).foreach { batch =>
      val draws = (1 to perBatch).map { _ =>
        val wide = randMessage(rnd, 0)
        val narrow = narrowOf(rnd, wide)
        val bytes = encodeFromJson(
          mapper.writeValueAsString(randValue(rnd, wide)), wide)
        if (decodeToJson(bytes, narrow).contains("\"$unknown\"")) sawUnknown += 1
        (narrow, bytes)
      }
      val checks: Seq[Column] = draws.zipWithIndex.map { case ((narrow, bytes), i) =>
        val b = lit(bytes)
        (protoSer(protoDe(b, narrow, keepUnknown = true), narrow) <=> b)
          .as(s"rt_$i")
      }
      val row = spark.range(1).select(checks: _*).head()
      (0 until row.length).foreach { j =>
        assert(row.getBoolean(j),
          s"batch $batch draw $j: narrow native round trip not byte-identical" +
            s"\nnarrow=${draws(j)._1}\nbytes=${draws(j)._2.toSeq}")
      }
    }
    assert(sawUnknown > 15, s"only $sawUnknown draws exercised unknown capture")
  }

  test("map entry with ABSENT message value defaults to a full-width row under keepUnknown") {
    // wire-legal: a map<K, Msg> entry may omit field 2 entirely -> the
    // value defaults to an empty message. With keepUnknown the declared
    // value struct is one field WIDER ($unknown at every depth); the
    // default row must match or any downstream read of the last ordinal
    // throws ArrayIndexOutOfBounds. Build the entry bytes by hand: one
    // map field (number 1, wire type 2) whose entry carries only the key.
    val inner = PMessage(Seq(PField(1, "a", PInt32), PField(2, "b", PString)))
    val msg = PMessage(Seq(PField(1, "m", PMap(PString, inner))))
    val entry = Array[Byte](0x0a, 0x03, 0x0a, 0x01, 'k') // field1(len 3){ key "k" }
    val bytes = Array[Byte](0x0a, entry.length.toByte) ++ entry
    Seq(true, false).foreach { keep =>
      val direct = protoDe(lit(bytes), msg, keepUnknown = keep)
      val viaJson = protoDeJson(lit(bytes), msg, keepUnknown = keep)
      // the re-encode is CANONICAL (value written explicitly as an empty
      // message, unlike the omitted-value input), so the lock is native ==
      // JSON-leg bytes plus the decode fixpoint — not == the input bytes
      val row = spark.range(1).select(
        (to_json(direct) <=> to_json(viaJson)).as("eq"),
        (protoSer(direct, msg) <=> protoSerJson(viaJson, msg)).as("enc"),
        (to_json(protoDe(protoSer(direct, msg), msg, keepUnknown = keep))
          <=> to_json(direct)).as("fix")).head()
      assert(row.getBoolean(0), s"keepUnknown=$keep: default-value structs differ")
      assert(row.getBoolean(1), s"keepUnknown=$keep: native vs JSON-leg encode differ")
      assert(row.getBoolean(2), s"keepUnknown=$keep: canonical re-encode not a fixpoint")
    }
  }

  test("null payload and empty message decode like the JSON leg") {
    val msg = PMessage(Seq(PField(1, "a", PInt32), PField(2, "b", PString)))
    val df = spark.range(1).select(
      protoDe(lit(null).cast("binary"), msg).as("nul"),
      protoDe(lit(Array.emptyByteArray), msg).as("empty"),
      protoSer(protoDe(lit(Array.emptyByteArray), msg), msg).as("enc"))
    val r = df.head()
    assert(r.isNullAt(0), "null payload must decode to null struct")
    val empty = r.getStruct(1)
    assert(empty.isNullAt(0) && empty.isNullAt(1),
      "empty payload must decode to an all-null struct, not null")
    assert(r.getAs[Array[Byte]](2).isEmpty,
      "all-null struct must encode to zero bytes")
  }

  test("encode rejects a struct whose field types do not match the message") {
    val msg = PMessage(Seq(PField(1, "a", PInt64)))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(
        protoSer(struct(lit("not a long").as("a")), msg)).head()
    }
    assert(err.getMessage.contains("proto_encode"))
  }
}
