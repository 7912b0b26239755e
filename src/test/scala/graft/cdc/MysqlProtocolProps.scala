package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip properties for the MySQL wire-protocol codecs — pure byte
  * math, scalacheck drives it directly.
  */
object MysqlProtocolProps extends Properties("MysqlProtocol") {

  private val packetGen = for {
    seq <- Gen.choose(0, 255)
    n <- Gen.choose(0, 300)
    bytes <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (seq, bytes)

  property("frame/unframe round-trips any packet list") =
    forAll(Gen.listOfN(8, packetGen).flatMap(l => Gen.choose(0, 8).map(l.take))) { ps =>
      val stream = ps.toArray.flatMap { case (s, b) =>
        MysqlProtocolCodec.writePacket(s, b)
      }
      val arr = MysqlProtocolCodec.splitPackets(stream)
      arr.numElements() == ps.length && ps.indices.forall { i =>
        val r = arr.getStruct(i, 2)
        r.getInt(0) == ps(i)._1 &&
          java.util.Arrays.equals(r.getBinary(1), ps(i)._2)
      }
    }

  property("any byte suffix cut from a framed stream fails loudly") =
    forAll(packetGen, Gen.choose(1, 4)) { case ((s, b), cut) =>
      val stream = MysqlProtocolCodec.writePacket(s, b)
      // removing 1..4 bytes always truncates either the payload or the
      // header of the sole packet — never a valid stream
      val broken = stream.dropRight(math.min(cut, stream.length - 1).max(1))
      try { MysqlProtocolCodec.splitPackets(broken); broken.isEmpty }
      catch { case _: IllegalArgumentException => true }
    }

  private val scrambleGen = for {
    pn <- Gen.choose(0, 40)
    pass <- Gen.containerOfN[Array, Byte](pn, Gen.choose(Byte.MinValue, Byte.MaxValue))
    seed <- Gen.containerOfN[Array, Byte](20, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (pass, seed)

  property("scramble is 20 bytes and XOR-invertible to SHA1(pass)") =
    forAll(scrambleGen) { case (pass, seed) =>
      val proof = MysqlProtocolCodec.nativePasswordAuth(pass, seed)
      val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      val h1 = sha1.digest(pass)
      sha1.reset()
      val h2 = sha1.digest(h1)
      sha1.reset()
      sha1.update(seed, 0, 20)
      val multi = sha1.digest(h2)
      // server-side check: proof XOR SHA1(seed ++ SHA1(SHA1(pass))) == SHA1(pass)
      proof.length == 20 && (0 until 20).forall { i =>
        (proof(i) ^ multi(i)).toByte == h1(i)
      }
    }

  property("lenenc int round-trips through HandshakeResponse auth section") =
    forAll(Gen.choose(0, 250), Gen.choose(0, 255)) { (n, fill) =>
      val auth = Array.fill(n)(fill.toByte)
      val caps = MysqlProtocolCodec.ClientPluginAuthLenencData
      val bs = MysqlProtocolCodec.encodeHandshakeResponse(
        caps, 1 << 24, 0xff, "u", auth, None, None, Nil, 0)
      // user "u"+NUL at offset 32; lenenc tag then the auth bytes
      val at = 32 + 2
      (bs(at) & 0xff) == n &&
        java.util.Arrays.equals(bs.slice(at + 1, at + 1 + n), auth)
    }
}
