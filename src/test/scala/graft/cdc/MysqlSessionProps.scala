package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, forAllNoShrink}
import MysqlReplicaSession._

/** Fuzz properties for the replica state machine and the binlog file
  * codec — the pure-fold ("never throws") and round-trip contracts under
  * arbitrary bytes.
  */
object MysqlSessionProps extends Properties("MysqlSession") {

  private val bytesGen = for {
    n <- Gen.choose(0, 120)
    bs <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs

  private val phaseGen: Gen[State => State] = Gen.oneOf(
    (s: State) => s,
    (s: State) => s.copy(phase = AwaitAuthSwitch, seed = new Array[Byte](20)),
    (s: State) => s.copy(phase = AwaitAuthResult),
    (s: State) => s.copy(phase = AwaitChecksumAck),
    (s: State) => s.copy(phase = AwaitStatusColCount),
    (s: State) => s.copy(phase = AwaitStatusCols(2)),
    (s: State) => s.copy(phase = AwaitStatusRows(colEofSeen = false)),
    (s: State) => s.copy(phase = AwaitStatusRows(colEofSeen = true),
      masterFile = "bin.000001", masterPos = 4L),
    (s: State) => s.copy(phase = Streaming))

  property("pure fold: arbitrary payloads in any phase never throw") =
    forAll(phaseGen, Gen.listOfN(6, bytesGen)) { (mk, payloads) =>
      var st = mk(initial(Config("u", "p", 1L)))
      payloads.foreach { p => st = onPayload(st, p).state }
      true // reaching here (no exception) IS the property
    }

  property("semi-sync fold: arbitrary dump payloads never throw, bad magic fails") =
    forAll(phaseGen, Gen.listOfN(6, bytesGen)) { (mk, payloads) =>
      var st = mk(initial(Config("u", "p", 1L, semiSync = true)))
      payloads.foreach { p => st = onPayload(st, p).state }
      // and specifically: a 0x00-marked dump packet without the 0xef
      // magic lands in Failed, never an exception or a silent event
      val streaming = initial(Config("u", "p", 1L, semiSync = true))
        .copy(phase = Streaming, currentFile = "f")
      val bad = onPayload(streaming, Array[Byte](0, 0x12, 1, 2, 3))
      bad.state.phase.isInstanceOf[Failed] && bad.event.isEmpty
    }

  property("fold from Failed is a fixpoint with the original reason") =
    forAll(bytesGen) { p =>
      val failed = initial(Config("u", "p", 1L))
        .copy(phase = Failed("root cause"))
      val s = onPayload(failed, p)
      s.state.phase == Failed("root cause") && s.send.isEmpty && s.event.isEmpty
    }

  // Bodies follow the engine-wide tailed convention encodeFile expects:
  // random payload + 4-byte zero tail (which decodeFile restores on read).
  private val eventGen = for {
    tpe <- Gen.oneOf(30, 31, 32, 19, 2)
    n <- Gen.choose(0, 64)
    body <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (tpe, body ++ Array[Byte](0, 0, 0, 0))

  property("binlog file encode/decode round-trips events, both checksum modes") =
    forAll(Gen.listOfN(5, eventGen).flatMap(l => Gen.choose(0, 5).map(l.take)),
      Gen.oneOf(true, false)) { (events, checksum) =>
      val file = BinlogFileCodec.encodeFile(events, checksum)
      val arr = BinlogFileCodec.decodeFile(file)
      // element 0 is the FDE itself
      arr.numElements() == events.length + 1 &&
        events.indices.forall { i =>
          val r = arr.getStruct(i + 1, 7)
          r.getInt(1) == events(i)._1 &&
            java.util.Arrays.equals(r.getBinary(6), events(i)._2)
        }
    }

  // forAllNoShrink: the default shrinker walks posSeed/delta OUTSIDE the
  // generator ranges (delta=0 = no corruption), producing misleading
  // "minimal" counterexamples that aren't valid inputs.
  property("any single-byte corruption of a checksummed file fails loudly") =
    forAllNoShrink(Gen.listOfN(2, eventGen), Gen.choose(0, 1 << 20), Gen.choose(1, 255)) {
      (events, posSeed, delta) =>
        val file = BinlogFileCodec.encodeFile(events, checksum = true)
        val pos = 4 + posSeed % (file.length - 4) // never the magic itself
        val bad = file.clone()
        bad(pos) = (bad(pos) + delta).toByte
        try { BinlogFileCodec.decodeFile(bad); false }
        catch { case _: IllegalArgumentException => true }
    }

  // Deterministic regression for the round-6 hole: the FDE checksum-alg
  // byte is unauthenticated only if the FDE's own CRC is conditionally
  // checked. Corrupt EXACTLY that byte (and each other alg value) so the
  // contract is exercised every run, not only when the fuzzer lands there.
  property("corrupting exactly the FDE checksum-alg byte fails loudly") =
    forAllNoShrink(Gen.listOfN(2, eventGen), Gen.choose(1, 255)) { (events, delta) =>
      val file = BinlogFileCodec.encodeFile(events, checksum = true)
      val fdeSize = ((file(4 + 9) & 0xff) | ((file(4 + 10) & 0xff) << 8) |
        ((file(4 + 11) & 0xff) << 16) | ((file(4 + 12) & 0xff) << 24))
      val algAt = 4 + fdeSize - 5
      val bad = file.clone()
      bad(algAt) = (bad(algAt) + delta).toByte
      try { BinlogFileCodec.decodeFile(bad); false }
      catch { case _: IllegalArgumentException => true }
    }

  // Deterministic regression for the round-7 hole (found by this suite's
  // own fuzz property at offset 8): corrupting the FDE's TYPE byte used to
  // leave `checksummed` false, silently skipping all CRC verification.
  property("corrupting exactly the FDE type byte fails loudly") =
    forAllNoShrink(Gen.listOfN(2, eventGen), Gen.choose(1, 255)) { (events, delta) =>
      val file = BinlogFileCodec.encodeFile(events, checksum = true)
      val bad = file.clone()
      bad(8) = (bad(8) + delta).toByte // offset 8 = first event's type byte
      try { BinlogFileCodec.decodeFile(bad); false }
      catch { case _: IllegalArgumentException => true }
    }

  // Exhaustive sweep: EVERY post-magic byte position, one fixed delta per
  // run. The sampled property above found both type-byte holes only when
  // the random draw landed on the weak byte (1-in-~300 per case — a flaky
  // red); this one visits every byte every run, so a new unauthenticated
  // byte fails deterministically on the first run that introduces it.
  property("exhaustive: corruption at every byte position fails loudly") =
    forAllNoShrink(Gen.listOfN(2, eventGen), Gen.choose(1, 255)) { (events, delta) =>
      val file = BinlogFileCodec.encodeFile(events, checksum = true)
      (4 until file.length).forall { pos =>
        val bad = file.clone()
        bad(pos) = (bad(pos) + delta).toByte
        try { BinlogFileCodec.decodeFile(bad); false }
        catch { case _: IllegalArgumentException => true }
      }
    }

  // The dual hole: a mid-file event type corrupted INTO FdeType(15) passes
  // the FDE's own-CRC check (identical trailing-CRC layout) and its
  // arbitrary "alg" byte could flip verification off for the rest of the
  // file. FDE is only legal as the first event.
  property("corrupting a mid-file event type INTO FORMAT_DESCRIPTION fails loudly") =
    forAllNoShrink(Gen.listOfN(2, eventGen)) { events =>
      val file = BinlogFileCodec.encodeFile(events, checksum = true)
      val fdeSize = ((file(4 + 9) & 0xff) | ((file(4 + 10) & 0xff) << 8) |
        ((file(4 + 11) & 0xff) << 16) | ((file(4 + 12) & 0xff) << 24))
      val typeAt = 4 + fdeSize + 4 // first post-FDE event's type byte
      val bad = file.clone()
      bad(typeAt) = BinlogFileCodec.FdeType.toByte
      try { BinlogFileCodec.decodeFile(bad); false }
      catch { case _: IllegalArgumentException => true }
    }
}
