package graft

import graft.format.{Fio, FioThrottle}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Token-bucket write throttle over the accessor seam — the reference's
 * opendal ThrottleLayer config (`accessor/operator_utils.rs:99-118`)
 * and its three test shapes (`accessor/throttle_test.rs`): sequential
 * writes slower than baseline, parallel writers jointly bounded, and a
 * single write beyond burst capacity failing loudly.
 */
class FioThrottleSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fio-throttle").toString

  test("sequential writes pace to the configured bandwidth") {
    val dir = tmp()
    val blob = "x" * (256 * 1024) // 256 KiB per write
    // baseline: unthrottled
    Fio.clearThrottle()
    val b0 = System.nanoTime()
    (1 to 6).foreach(i => Fio.writeBytesAtomic(s"$dir/base-$i.dat",
      blob.getBytes("UTF-8")))
    val baseline = (System.nanoTime() - b0) / 1e9
    // throttled: 512 KiB/s with a 512 KiB burst -> 6×256 KiB must take
    // at least (1536-512)/512 = 2.0 s of acquired wait
    val t = Fio.setThrottle(512 * 1024, 512 * 1024)
    try {
      val t0 = System.nanoTime()
      (1 to 6).foreach(i => Fio.writeBytesAtomic(s"$dir/thr-$i.dat",
        blob.getBytes("UTF-8")))
      val throttled = (System.nanoTime() - t0) / 1e9
      assert(throttled > baseline,
        f"throttled $throttled%.2fs must exceed baseline $baseline%.2fs")
      assert(throttled >= 1.5,
        f"6×256KiB at 512KiB/s (512KiB burst) must pace ≥2s, got $throttled%.2fs")
      assert(t.blockedNanos > 0L, "the bucket never blocked a writer")
    } finally Fio.clearThrottle()
  }

  test("parallel writers share one bucket") {
    val dir = tmp()
    val blob = ("y" * (128 * 1024)).getBytes("UTF-8") // 128 KiB
    Fio.setThrottle(512 * 1024, 256 * 1024)
    try {
      // 8 threads × 2 writes × 128 KiB = 2 MiB at 512 KiB/s with a
      // 256 KiB burst -> jointly ≥ (2048-256)/512 ≈ 3.5 s
      val t0 = System.nanoTime()
      val threads = (1 to 8).map { i =>
        val th = new Thread(() => (1 to 2).foreach(j =>
          Fio.writeBytesAtomic(s"$dir/p-$i-$j.dat", blob)))
        th.start(); th
      }
      threads.foreach(_.join(30000))
      val took = (System.nanoTime() - t0) / 1e9
      assert(took >= 2.5,
        f"parallel writers must be JOINTLY bounded, took $took%.2fs")
      (1 to 8).foreach(i => (1 to 2).foreach(j =>
        assert(Fio.exists(s"$dir/p-$i-$j.dat"))))
    } finally Fio.clearThrottle()
  }

  test("a write beyond burst capacity fails loudly") {
    val dir = tmp()
    Fio.setThrottle(1024 * 1024, 64 * 1024)
    try {
      val e = intercept[java.io.IOException] {
        Fio.writeBytesAtomic(s"$dir/oversized.dat",
          new Array[Byte](128 * 1024))
      }
      assert(e.getMessage.contains("exceeds throttle burst"), e.getMessage)
      assert(!Fio.exists(s"$dir/oversized.dat"))
      // a fitting write still lands (the error is per-op, not sticky)
      Fio.writeBytesAtomic(s"$dir/ok.dat", new Array[Byte](32 * 1024))
      assert(Fio.exists(s"$dir/ok.dat"))
    } finally Fio.clearThrottle()
  }

  test("the bucket itself refills at the configured rate") {
    val t = new FioThrottle(bandwidthBytesPerSec = 1000000, burstBytes = 1000)
    t.acquire(1000) // drain the burst
    val t0 = System.nanoTime()
    t.acquire(500) // must wait ~0.5ms for refill — just assert it returns
    assert((System.nanoTime() - t0) >= 0L)
    intercept[java.io.IOException](t.acquire(1001))
  }
}
