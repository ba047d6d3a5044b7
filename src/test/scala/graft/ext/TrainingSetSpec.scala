package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The training-set assembly layer: packing, mixture, and sharded
  * export must be exactly reproducible (pure functions of the corpus),
  * and every stored artifact must agree with an independent recount.
  */
class TrainingSetSpec extends SparkSuite {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sfDir)

  private def key(id: Long): Long = (id * 40503L) % 65521L

  test("pack: offsets are exact per-shard prefix sums in shuffle order, bins cut at the budget") {
    val budget = 256L
    val rows = TrainingSet.pack(docs, budget = budget, nShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, shard, bin, n, off) => (id, shard, bin, n, off) }
    val base = docs.select(col("doc_id"), TrainingSet.tokenCount(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(rows.length == base.size, "every document is packed exactly once")
    // recompute the assignment independently
    rows.groupBy(_._2).foreach { case (shard, members) =>
      var off = 0L
      members.sortBy(m => (key(m._1), m._1)).foreach { case (id, sh, bin, n, o) =>
        assert(id % 4 == shard && sh == shard)
        assert(n == base(id), s"token count mismatch for doc $id")
        assert(o == off, s"doc $id offset: got $o, prefix sum says $off")
        assert(bin == off / budget, s"doc $id bin: got $bin for offset $off")
        off += n
      }
    }
    // a bin never holds more than budget + one straddling document
    val maxDoc = base.values.max
    val binTokens = rows.groupBy(r => (r._2, r._3)).values.map(_.map(_._4).sum)
    assert(binTokens.forall(_ <= budget + maxDoc),
      s"bins must not exceed budget + one document (${budget + maxDoc})")
  }

  test("packSpans: spans tile each sequence window exactly, straddlers split at the boundary") {
    val budget = 256L
    val spans = TrainingSet.packSpans(docs, budget = budget, nShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val packed = TrainingSet.pack(docs, budget = budget, nShards = 4)
      .filter(col("n_tokens") > 0).as[(Long, Long, Long, Long, Long)].collect()
    // per-doc span lengths sum to the doc's token count
    val perDoc = spans.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    packed.foreach { case (id, _, _, n, _) =>
      assert(perDoc(id) == n, s"doc $id spans sum ${perDoc.get(id)} != $n")
    }
    spans.foreach { case (_, _, id, start, len) =>
      assert(start >= 0 && start < budget && len >= 1 && len <= budget,
        s"doc $id span ($start, $len) outside window")
    }
    // within every (shard, bin), spans are disjoint, contiguous from the
    // window's first occupied position, and never overflow the window
    spans.groupBy(s => (s._1, s._2)).foreach { case ((sh, bin), g) =>
      val sorted = g.sortBy(s => (s._4, s._3))
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 + a._5 == b._4,
            s"shard $sh bin $bin: gap/overlap between spans $a and $b")
        case _ =>
      }
      assert(sorted.last._4 + sorted.last._5 <= budget)
      // a non-final window that ends before `budget` can only happen on
      // the shard's LAST bin (stream exhausted)
      val maxBin = spans.filter(_._1 == sh).map(_._2).max
      if (bin < maxBin)
        assert(sorted.last._4 + sorted.last._5 == budget,
          s"shard $sh bin $bin underfilled before the last window")
    }
  }

  test("packBpe: budget unit is the trained tokenizer's count, same prefix-sum contract") {
    val (merges, state) = Bpe.trained(spark, docs, sfDir)
    val out = TrainingSet.packBpe(docs, merges, budget = 256L, nShards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    val bpeCounts = Bpe.encodeStats(docs, merges)
      .select(col("doc_id"), col("n_tokens")).as[(Long, Long)].collect().toMap
    assert(out.length == docs.count(), "every document is packed exactly once")
    out.foreach { case (id, _, _, n, _) =>
      assert(n == bpeCounts.getOrElse(id, 0L),
        s"doc $id must pack by its BPE count")
    }
    // BPE splits words into >= 1 subwords, so the model-token budget
    // unit is never below the whitespace unit — and offsets/bins are
    // the same exact prefix-sum contract as pack()
    val ws = docs.select(col("doc_id"), TrainingSet.tokenCount(col("text")))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, _, n, _) => assert(n >= ws(id)) }
    out.groupBy(_._2).foreach { case (_, members) =>
      var off = 0L
      members.sortBy(m => (key(m._1), m._1)).foreach { case (id, _, bin, n, o) =>
        assert(o == off && bin == off / 256L, s"doc $id offset/bin mismatch")
        off += n
      }
    }
  }

  test("mixture: per-document copy counts are the exact deterministic weight function") {
    val weights = Map("en" -> 0.5, "fr" -> 2.0, "de" -> 1.25, "es" -> 1.0, "zh" -> 3.5)
    val out = TrainingSet.mixture(docs, weights)
      .groupBy(col("doc_id"), col("lang")).agg(count(lit(1)).as("n"), max(col("copy")).as("mx"))
      .as[(Long, String, Long, Long)].collect()
    val langs = docs.select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    def expected(id: Long, lang: String): Long = {
      val w = weights(lang)
      val frac = w - math.floor(w)
      math.floor(w).toLong + (if (key(id) < math.floor(frac * 65521.0).toLong) 1L else 0L)
    }
    out.foreach { case (id, lang, n, mx) =>
      assert(n == expected(id, lang), s"doc $id ($lang): $n copies, expected ${expected(id, lang)}")
      assert(mx == n, "copies are numbered 1..n")
    }
    // zero-copy docs (downsampled out) are absent, not present-with-0
    val kept = out.map(_._1).toSet
    langs.foreach { case (id, lang) =>
      assert(kept.contains(id) == (expected(id, lang) >= 1L))
    }
    // the realized mixture hits the target fraction at the key grid's
    // resolution: en (w=0.5) keeps the sub-threshold half of its keys
    val en = langs.filter(_._2 == "en").keys
    assert(en.count(id => kept.contains(id)) == en.count(id => key(id) < 32760L))
  }

  test("temperatureMix: hand-computed weights, tau=1/2 flattens the head") {
    // two domains 9:1 by tokens: share 0.9/0.1, sqrt 0.948683/0.316228,
    // z = 1.264911; the low-resource domain's weight (0.25) is 2.5x its
    // raw share while the head drops below its share
    val df = Seq(
      (1L, ("tok " * 90).trim, "big"),
      (2L, ("tok " * 10).trim, "small")
    ).toDF("doc_id", "text", "lang")
    val rows = TrainingSet.temperatureMix(df).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("big", "small"))
    val big = rows(0); val small = rows(1)
    assert(big.getLong(2) == 90L && small.getLong(2) == 10L)
    assert(math.abs(small.getDouble(4) - 0.25) < 1e-6, small.toString)
    assert(small.getDouble(5) > 1.0, "low-resource domain must upsample")
    assert(big.getDouble(5) < 1.0, "head domain must downsample")
    // weights form a distribution (round-6 noise only)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-5)
    // every fixture domain present, deterministic across runs
    val a = TrainingSet.temperatureMix(docs).collect().toSeq
    val b = TrainingSet.temperatureMix(docs).collect().toSeq
    assert(a == b)
  }

  test("holdoutSplit: deterministic val sample, near-dups of val docs never reach train") {
    val pairDir = "target/trainspec/neardup"
    deleteRecursively(pairDir)
    Dedup.ensurePairs(spark, docs, pairDir)
    val split = TrainingSet.holdoutSplit(spark, docs, pairDir, valPermille = 250)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(split.size == docs.count(), "the split labels every document exactly once")
    val valThresh = 65521L * 250 / 1000
    split.foreach { case (id, s) =>
      assert((key(id) < valThresh) == (s == "validation"),
        s"doc $id: validation membership must be the pure key predicate")
    }
    // leakage guard: recompute near-dup pairs live; any (train, val)
    // adjacency is a contamination bug, and every leaked label is earned
    val pairs = Dedup.minhashPairs(docs)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    val expectedLeaked = pairs.flatMap { case (a, b) =>
      (split(a) == "validation", split(b) == "validation") match {
        case (true, false) => Some(b)
        case (false, true) => Some(a)
        case _ => None
      }
    }.toSet
    assert(expectedLeaked.nonEmpty, "fixture must actually exercise the guard")
    assert(split.filter(_._2 == "leaked").keySet == expectedLeaked,
      "leaked = exactly the non-val sides of val-crossing near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(!(split(a) == "train" && split(b) == "validation") &&
        !(split(a) == "validation" && split(b) == "train"),
        s"near-dup pair ($a, $b) crosses the train/validation boundary")
    }
  }

  test("writeShards: manifest equals recount, shards partition the corpus in shuffle order, rebuild no-op") {
    val dir = "target/trainspec/shards"
    deleteRecursively(dir)
    TrainingSet.writeShards(spark, docs, dir, nShards = 4)

    val manifest = TrainingSet.shardManifest(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(manifest.map(_._1).toSeq == (0L until 4L), "one manifest row per shard")
    assert(manifest.map(_._2).sum == docs.count(), "manifest doc counts cover the corpus")
    val recount = docs
      .groupBy(pmod(col("doc_id"), lit(4L)).as("shard"))
      .agg(count(lit(1)).as("n"), sum(TrainingSet.tokenCount(col("text"))).as("t"),
        sum(xxhash64(col("doc_id"), col("text"))).as("h"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(manifest.toSeq == recount.toSeq, "manifest must equal an independent recount")

    // shards partition the corpus: disjoint by construction (id mod), complete
    val back = (0 until 4).map(k => TrainingSet.readShard(spark, dir, k))
      .reduce(_ unionByName _)
    assert(back.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)
    assert(back.count() == docs.count())
    // content roundtrips through the JSONL
    val orig = docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSet
    assert(back.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSet == orig)

    // rows inside a shard file are in training (pseudo-shuffle) order
    val f = new java.io.File(s"$dir/shards/shard=1").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val ids = scala.io.Source.fromFile(f).getLines()
      .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong).toSeq
    assert(ids == ids.sortBy(id => (key(id), id)),
      "shard rows must be ordered by the shuffle key")

    // same corpus → served, not rebuilt; changed corpus → rebuilt
    val marker = new java.io.File(s"$dir/manifest/_SUCCESS")
    val t1 = marker.lastModified()
    TrainingSet.writeShards(spark, docs, dir, nShards = 4)
    assert(marker.lastModified() == t1, "unchanged corpus must serve the existing export")
    TrainingSet.writeShards(spark,
      docs.withColumn("text", concat(col("text"), lit(" x"))), dir, nShards = 4)
    assert(marker.lastModified() != t1, "changed corpus must rebuild the export")
  }

  test("appendShards: O(batch) fold equals a fresh export; compaction restores one sorted file per shard") {
    val dirApp = "target/trainspec/shards_app"
    val dirFresh = "target/trainspec/shards_fresh"
    deleteRecursively(dirApp); deleteRecursively(dirFresh)
    val seed = docs.filter(col("doc_id") % 5 =!= 0L)
    val batch = docs.filter(col("doc_id") % 5 === 0L)
    TrainingSet.writeShards(spark, seed, dirApp, nShards = 4)
    TrainingSet.appendShards(spark, batch, dirApp)
    TrainingSet.writeShards(spark, docs, dirFresh, nShards = 4)

    def manifest(d: String) = TrainingSet.shardManifest(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(manifest(dirApp) == manifest(dirFresh),
      "appended manifest ledger must aggregate to the fresh build's")
    def shardIds(d: String, k: Int) =
      TrainingSet.readShard(spark, d, k).select("doc_id").as[Long].collect().toSet
    (0 until 4).foreach { k =>
      assert(shardIds(dirApp, k) == shardIds(dirFresh, k), s"shard $k content differs")
    }
    // additive fingerprint: ensure over the union corpus SERVES
    val marker = new java.io.File(s"$dirApp/manifest/_SUCCESS")
    val t1 = marker.lastModified()
    TrainingSet.writeShards(spark, docs, dirApp, nShards = 4)
    assert(marker.lastModified() == t1, "union ensure must serve the appended export")
    // double-submitted batch is a counted no-op
    TrainingSet.appendShards(spark, batch, dirApp)
    assert(manifest(dirApp) == manifest(dirFresh), "replayed batch must change nothing")
    // changed content fails fast instead of silently serving stale text
    intercept[IllegalStateException] {
      TrainingSet.appendShards(spark,
        batch.withColumn("text", concat(col("text"), lit(" y"))), dirApp)
    }

    val metaBefore = Artifact.readMeta(spark, dirApp)
    val (f0, f1) = TrainingSet.compactShards(spark, dirApp)
    checkCompacted(dirApp, dirFresh, metaBefore, f0, f1)
  }

  private def checkCompacted(dirApp: String, dirFresh: String,
                             metaBefore: Option[String], f0: Int, f1: Int): Unit = {
    def manifest(d: String) = TrainingSet.shardManifest(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSet
    def shardIds(d: String, k: Int) =
      TrainingSet.readShard(spark, d, k).select("doc_id").as[Long].collect().toSet
    assert(f1 < f0, s"file count must drop: $f0 -> $f1")
    assert(Artifact.readMeta(spark, dirApp) == metaBefore, "meta line verbatim")
    assert(manifest(dirApp) == manifest(dirFresh), "compaction must not change the ledger")
    (0 until 4).foreach { k =>
      assert(shardIds(dirApp, k) == shardIds(dirFresh, k))
      val fls = new java.io.File(s"$dirApp/shards/shard=$k").listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(fls.length == 1, s"shard $k must be one file after compaction")
      val ids = scala.io.Source.fromFile(fls.head).getLines()
        .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong).toSeq
      assert(ids == ids.sortBy(id => (key(id), id)),
        s"shard $k in-file training order must cover the whole shard again")
    }
  }

  test("removeFromShards is membership-checked: retried and never-exported " +
      "removals are no-ops on ledger, fingerprint, and tombstones") {
    val dir = "target/trainspec/shards_remguard"
    deleteRecursively(dir)
    TrainingSet.writeShards(spark, docs, dir, nShards = 4)
    val removed = docs.filter(col("doc_id") === 10L).localCheckpoint()
    TrainingSet.removeFromShards(spark, removed, dir)
    val meta = Artifact.readMeta(spark, dir)
    def manifest() = TrainingSet.shardManifest(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val ledger = manifest()

    // a RETRIED removal (id already tombstoned) must not over-subtract
    TrainingSet.removeFromShards(spark, removed, dir)
    assert(Artifact.readMeta(spark, dir) == meta, "double-remove must not touch the fingerprint")
    assert(manifest() == ledger, "double-remove must not write ledger deltas")

    // a NEVER-EXPORTED id must not be tombstoned (that would block its
    // future append) nor subtracted from the ledger
    val alien = Seq((999999L, "never exported", "en")).toDF("doc_id", "text", "lang")
    TrainingSet.removeFromShards(spark, alien, dir)
    assert(Artifact.readMeta(spark, dir) == meta)
    assert(manifest() == ledger)
    assert(TrainingSet.loadTombstones(spark, dir)
      .filter(col("doc_id") === 999999L).isEmpty,
      "an id that was never exported must not be tombstoned")
    // ...so exporting it later still works
    TrainingSet.compactShards(spark, dir)
    TrainingSet.appendShards(spark, alien, dir)
    assert(TrainingSet.readShard(spark, dir, (999999L % 4L).toInt)
      .filter(col("doc_id") === 999999L).count() == 1L)
  }

  test("export deletion + sync: removal reaches the training set, catch-up is O(missing)") {
    val dir = "target/trainspec/shards_del"
    val dirRef = "target/trainspec/shards_delref"
    deleteRecursively(dir); deleteRecursively(dirRef)

    // partial export, then sync appends exactly the missing documents
    TrainingSet.writeShards(spark, docs.filter(col("doc_id") % 5 =!= 0L), dir, nShards = 4)
    TrainingSet.syncShards(spark, docs, dir)
    def manifest(d: String) = TrainingSet.shardManifest(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSet
    TrainingSet.writeShards(spark, docs, dirRef, nShards = 4)
    assert(manifest(dir) == manifest(dirRef), "sync must catch the export up to the corpus")
    // a second sync has nothing to do — fingerprint line untouched
    val meta1 = Artifact.readMeta(spark, dir)
    TrainingSet.syncShards(spark, docs, dir)
    assert(Artifact.readMeta(spark, dir) == meta1)

    // right-to-be-forgotten: content captured, removed, masked at read
    val removed = docs.filter(col("doc_id") === 10L).localCheckpoint()
    val shardOf10 = 10 % 4
    TrainingSet.removeFromShards(spark, removed, dir)
    assert(TrainingSet.readShard(spark, dir, shardOf10)
      .filter(col("doc_id") === 10L).isEmpty, "removed doc must not be served")
    // the manifest ledger nets to a recount over the remaining corpus
    deleteRecursively(dirRef)
    TrainingSet.writeShards(spark, docs.filter(col("doc_id") =!= 10L), dirRef, nShards = 4)
    assert(manifest(dir) == manifest(dirRef),
      "negative ledger deltas must net to the shrunken corpus")
    // arithmetic fingerprint: ensure over the shrunken corpus SERVES
    val marker = new java.io.File(s"$dir/manifest/_SUCCESS")
    val t1 = marker.lastModified()
    TrainingSet.writeShards(spark, docs.filter(col("doc_id") =!= 10L), dir, nShards = 4)
    assert(marker.lastModified() == t1, "shrunken ensure must serve, not rebuild")
    // re-inserting the removed id is refused until compaction; sync
    // skips it silently (never races a pending deletion back in)
    intercept[IllegalStateException] { TrainingSet.appendShards(spark, removed, dir) }
    TrainingSet.syncShards(spark, docs, dir)
    assert(TrainingSet.readShard(spark, dir, shardOf10)
      .filter(col("doc_id") === 10L).isEmpty, "sync must not resurrect a removed doc")

    // compaction drops the masked row physically and frees the id
    TrainingSet.compactShards(spark, dir)
    val fls = new java.io.File(s"$dir/shards/shard=$shardOf10").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(fls.length == 1)
    assert(!scala.io.Source.fromFile(fls.head).getLines()
      .exists(_.contains("\"doc_id\":10,")), "compaction must drop the row physically")
    assert(manifest(dir) == manifest(dirRef), "compaction keeps the netted ledger")
    TrainingSet.appendShards(spark, removed, dir) // id free again
    deleteRecursively(dirRef)
    TrainingSet.writeShards(spark, docs, dirRef, nShards = 4)
    assert(manifest(dir) == manifest(dirRef), "re-insert restores the full corpus export")
  }
}
