package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports of the reference's Encoder facts
 * (`/root/reference/test/HeatMap.Tiles.Test/EncoderTests.cs:7-47`) plus
 * seeded round-trip properties.
 */
class CodecSpec extends AnyFunSuite {

  test("Encoder_Encode_0_0_ShouldReturn_0") {
    assert(Codec.encode(0, 0) === 0L)
  }

  test("Encoder_Encode_0_100_ShouldReturn_100") {
    assert(Codec.encode(0, 100) === 100L)
  }

  test("Encoder_Encode_100_0_ShouldReturn_429496729600") {
    assert(Codec.encode(100, 0) === 429496729600L)
  }

  test("Encode_Decode_0_ShouldReturn_0_0") {
    assert(Codec.decode(0L) === ((0L, 0L)))
  }

  test("Encode_Decode_100_ShouldReturn_0_100") {
    assert(Codec.decode(100L) === ((0L, 100L)))
  }

  test("Encode_Decode_429496729600_ShouldReturn_100_0") {
    assert(Codec.decode(429496729600L) === ((100L, 0L)))
  }

  test("encode/decode round-trips over the u32 range (seeded property)") {
    val rnd = new java.util.Random(42)
    (1 to 10000).foreach { _ =>
      val users = rnd.nextLong() & Codec.U32Max
      val trips = rnd.nextLong() & Codec.U32Max
      assert(Codec.decode(Codec.encode(users, trips)) === ((users, trips)))
    }
  }

  test("saturating add clamps at u32 max (Diffs/HeatMapExtensions.cs:72-76)") {
    assert(Codec.saturatingAddU32(Codec.U32Max, 1) === Codec.U32Max)
    assert(Codec.saturatingAddU32(1, 2) === 3)
    assert(Codec.saturatingAddU32(Codec.U32Max - 1, 1) === Codec.U32Max)
  }

  test("varint/zigzag round-trip (seeded property)") {
    val rnd = new java.util.Random(7)
    (1 to 10000).foreach { _ =>
      val v = rnd.nextLong()
      assert(VarInt.unZigZag(VarInt.zigZag(v)) === v)
    }
    val out = new java.io.ByteArrayOutputStream()
    VarInt.writeVarUInt(out, 300L)
    assert(out.toByteArray.toSeq === Seq(0xAC.toByte, 0x02.toByte))
  }
}
