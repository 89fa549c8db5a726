package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("greedyPack: no bin exceeds capacity (except oversize singletons), ids in order, total preserved") {
    val capacity = 128
    val packed = SequencePacking.greedyPack(docs, "doc_id", "text",
      capacity, shards = 4)
    val bins = packed.groupBy($"shard", $"bin")
      .agg(sum($"n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .collect()
    bins.foreach { r =>
      val fill = r.getAs[Long]("fill")
      assert(fill <= capacity || r.getAs[Long]("n_docs") == 1,
        s"overfilled multi-doc bin: $r")
    }
    // every doc packed exactly once
    assert(packed.count() == docs.count())
    assert(packed.select(sum($"n_tokens")).head().getLong(0) ==
      docs.select(sum(size(split($"text", "\\s+")))).head().getLong(0))
    // within a shard, bin ids are non-decreasing in doc order and dense
    val byShard = packed.orderBy($"shard", $"id").collect()
      .groupBy(_.getAs[Long]("shard"))
    byShard.values.foreach { rows =>
      val binSeq = rows.map(_.getAs[Long]("bin")).toSeq
      assert(binSeq == binSeq.sorted, "bins must be non-decreasing in id order")
      assert(binSeq.distinct == (0L until binSeq.distinct.size).toSeq,
        "bin ids must be dense from 0")
    }
  }

  test("greedyPack fills at least as well as one-doc-per-bin and respects first-fit") {
    val capacity = 64
    val packed = SequencePacking.greedyPack(docs, "doc_id", "text",
      capacity, shards = 2).collect()
    val nBins = packed.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"))).distinct.length
    assert(nBins <= packed.length)
    // replay the loop independently per shard and compare bin assignment
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var fill = capacity + 1L; var bin = -1L
      rows.sortBy(_.getAs[Long]("id")).foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        if (fill + n > capacity) { bin += 1; fill = 0L }
        fill += n
        assert(r.getAs[Long]("bin") == bin, s"first-fit mismatch at $r")
      }
    }
  }

  test("concatChop: windows tile the shard stream exactly") {
    val cc = SequencePacking.concatChop(docs, "doc_id", "text",
      capacity = 100, shards = 4,
      shardBy = Some(pmod($"doc_id", lit(4)))).collect()
    cc.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var offset = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_offset") == offset)
        assert(r.getAs[Long]("first_window") == offset / 100)
        offset += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("last_window") == (offset - 1) / 100)
      }
    }
  }

  test("stratifiedExact picks exactly n per stratum, stable across runs") {
    val a = Sampling.stratifiedExact(docs, "doc_id", "lang", n = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedExact(docs, "doc_id", "lang", n = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    val counts = Sampling.stratifiedExact(docs, "doc_id", "lang", n = 5)
      .groupBy($"lang").count().as[(String, Long)].collect()
    counts.foreach { case (_, n) => assert(n <= 5) }
    assert(counts.map(_._2).sum == math.min(docs.count(), counts.length * 5L))
  }

  test("stratifiedRate approximates requested rates deterministically") {
    val sampled = Sampling.stratifiedRate(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.25)
    val en = docs.filter($"lang" === "en").count()
    assert(sampled.filter($"lang" === "en").count() == en) // rate 1.0 keeps all
    val restTotal = docs.filter($"lang" =!= "en").count()
    val restKept = sampled.filter($"lang" =!= "en").count()
    assert(restKept > restTotal * 0.15 && restKept < restTotal * 0.35,
      s"~25% expected, got $restKept/$restTotal")
    // deterministic: same picks on re-run
    assert(sampled.select(sum($"doc_id")).head().getLong(0) ==
      Sampling.stratifiedRate(docs, "doc_id", "lang", Map("en" -> 1.0), 0.25)
        .select(sum($"doc_id")).head().getLong(0))
  }

  test("hashSplit: disjoint, exhaustive, growth-stable, fraction-accurate") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s = Sampling.hashSplit(docs, "doc_id", splits)
    // exhaustive + disjoint: every row gets exactly one label
    assert(s.count() == docs.count())
    val byS = s.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet.subsetOf(Set("train", "val", "test")))
    val n = docs.count().toDouble
    assert(byS("train") > n * 0.6 && byS("train") < n * 0.95, byS.toString)
    // growth stability: a row's split never changes when the corpus grows
    val half = docs.filter($"doc_id" % 2 === 0)
    val fullAssign = s.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    Sampling.hashSplit(half, "doc_id", splits)
      .select($"doc_id", $"split").as[(Long, String)].collect()
      .foreach { case (id, sp) => assert(fullAssign(id) == sp, s"doc $id moved") }
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("temperatureResample hits the sqrt mixture target, smallest stratum whole") {
    // strata of 100 / 400 / 2500 rows: targets are 100 / sqrt(100*400)=200 /
    // sqrt(100*2500)=500 — the 25:1 imbalance compresses to 5:1
    val mixed = ((0 until 100).map(i => (i.toLong, "tiny")) ++
      (0 until 400).map(i => (1000L + i, "mid")) ++
      (0 until 2500).map(i => (10000L + i, "big"))).toDF("doc_id", "source")
    val kept = Sampling.temperatureResample(mixed, "doc_id", "source")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(kept("tiny") == 100) // bound 65536: kept whole
    assert(kept("mid") > 150 && kept("mid") < 250, kept.toString)
    assert(kept("big") > 400 && kept("big") < 600, kept.toString)
    // deterministic picks
    assert(Sampling.temperatureResample(mixed, "doc_id", "source")
      .select(sum($"doc_id")).head().getLong(0) ==
      Sampling.temperatureResample(mixed, "doc_id", "source")
        .select(sum($"doc_id")).head().getLong(0))
  }
}
