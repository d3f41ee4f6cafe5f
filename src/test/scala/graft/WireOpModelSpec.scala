package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.json4s._

import graft.model.Dot
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.Collection

/** WIRE-level model-based mutation testing (VERDICT r11 directive 8): the
  * typed OpModelSpec drives `UpdateOp`s directly, so a codec bug that DROPS
  * a wire field before the typed layer (the r11 shard-key silent-corruption
  * class, `UpdateBridge.wirePoints`) is invisible to it. This suite renders
  * random op sequences as the REST `operations` JSON and applies them
  * through `UpdateBridge.applyJson` — over a PLAIN collection and over a
  * custom-SHARDED one where every upsert carries point- or body-level
  * `shard_key` and selector ops are randomly shard-scoped
  * (`lib/api/src/rest/schema.rs:1290-1479`; scoping semantics
  * `point_ops.rs:42`). The collection's full state (ids, vectors, shard
  * keys, canonical payload) is diffed against an independent driver model.
  */
class WireOpModelSpec extends SparkTestBase {

  // ----------------------------------------------------- the driver model

  sealed trait MV
  case class ML(v: Long) extends MV
  case class MS(v: String) extends MV
  case class MA(v: Seq[Long]) extends MV
  case class MObj(v: Map[String, MV]) extends MV
  case object MNull extends MV

  case class MPoint(vector: Option[Seq[Float]],
      payload: Option[Map[String, MV]], shard: Option[String])

  sealed trait WOp
  /** points: (id, vector, payload, own shard key); bodyKey applies to
    * points lacking their own (`PointsList.shard_key`). */
  case class WUpsert(points: Seq[(Long, Seq[Float], Map[String, MV], Option[String])],
      mode: String, bodyKey: Option[String]) extends WOp
  case class WDelete(ids: Seq[Long], scope: Seq[String]) extends WOp
  case class WSetPayload(ids: Seq[Long], patch: Map[String, MV],
      path: Option[String], scope: Seq[String]) extends WOp
  case class WOverwrite(ids: Seq[Long], payload: Map[String, MV],
      scope: Seq[String]) extends WOp
  case class WDeleteKeys(ids: Seq[Long], keys: Seq[String],
      scope: Seq[String]) extends WOp
  case class WClear(ids: Seq[Long], scope: Seq[String]) extends WOp
  case class WSetVector(ids: Seq[Long], vec: Seq[Float],
      scope: Seq[String]) extends WOp
  case class WDelVector(ids: Seq[Long], scope: Seq[String]) extends WOp

  /** ids surviving the shard scope: an op with a `shard_key` selector only
    * touches points whose CURRENT shard key is selected. */
  private def inScope(m: Map[Long, MPoint], ids: Seq[Long],
      scope: Seq[String]): Seq[Long] =
    if (scope.isEmpty) ids
    else ids.filter(id => m.get(id).exists(_.shard.exists(scope.contains)))

  /** The reference's unknown-point 404 (`check_unprocessed_points`,
    * `lib/shard/src/update/helpers.rs:118-128`): every id-list payload /
    * vector op fails on the FIRST id (wire order) that is missing or
    * outside the op's shard scope; deletes and upserts are exempt. */
  private def failureOf(m: Map[Long, MPoint], op: WOp): Option[String] = {
    def miss(ids: Seq[Long], scope: Seq[String]): Option[String] =
      ids.find(id => !m.contains(id) ||
          (scope.nonEmpty && !m(id).shard.exists(scope.contains)))
        .map(id => s"No point with id $id found")
    op match {
      case WSetPayload(ids, _, _, sc) => miss(ids, sc)
      case WOverwrite(ids, _, sc) => miss(ids, sc)
      case WDeleteKeys(ids, _, sc) => miss(ids, sc)
      case WClear(ids, sc) => miss(ids, sc)
      case WSetVector(ids, _, sc) => miss(ids, sc)
      case WDelVector(ids, sc) => miss(ids, sc)
      case _ => None
    }
  }

  /** Replay a batch the way the reference applies it (`do_batch_update_
    * points` per-op loop, `src/common/update.rs:800-915`): ops before the
    * first failing op land; the failure aborts the rest. Returns the
    * final model state, the number of applied ops, and the error. */
  private def replay(m0: Map[Long, MPoint],
      ops: Seq[WOp]): (Map[Long, MPoint], Int, Option[String]) =
    ops.foldLeft((m0, 0, Option.empty[String])) {
      case ((m, n, None), op) => failureOf(m, op) match {
        case Some(err) => (m, n, Some(err))
        case None => (stepModel(m, op), n + 1, None)
      }
      case (done, _) => done
    }

  private def mergePatch(base: Map[String, MV],
      patch: Map[String, MV]): Map[String, MV] =
    patch.foldLeft(base) {
      case (b, (k, MNull)) => b - k
      case (b, (k, v)) => b + (k -> v)
    }

  private def stepModel(m: Map[Long, MPoint], op: WOp): Map[Long, MPoint] = op match {
    case WUpsert(pts, mode, bodyKey) => pts.foldLeft(m) {
      case (acc, (id, v, p, own)) =>
        val key = own.orElse(bodyKey)
        mode match {
          case "insert_only" if acc.contains(id) => acc
          case "update_only" if !acc.contains(id) => acc
          case _ => acc + (id -> MPoint(Some(v), Some(p), key))
        }
    }
    case WDelete(ids, scope) => m -- inScope(m, ids, scope)
    case WSetPayload(ids, patch, None, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc) { pt =>
          acc + (id -> pt.copy(payload =
            Some(mergePatch(pt.payload.getOrElse(Map.empty), patch))))
        }
      }
    case WSetPayload(ids, patch, Some(path), scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc) { pt =>
          def setAt(obj: Map[String, MV], segs: List[String]): Map[String, MV] =
            segs match {
              case k :: Nil =>
                val cur = obj.get(k) match {
                  case Some(MObj(o)) => o
                  case _ => Map.empty[String, MV]
                }
                obj + (k -> MObj(mergePatch(cur, patch)))
              case k :: rest =>
                val cur = obj.get(k) match {
                  case Some(MObj(o)) => o
                  case _ => Map.empty[String, MV]
                }
                obj + (k -> MObj(setAt(cur, rest)))
              case Nil => obj
            }
          acc + (id -> pt.copy(payload =
            Some(setAt(pt.payload.getOrElse(Map.empty), path.split('.').toList))))
        }
      }
    case WOverwrite(ids, p, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(payload = Some(p))))
      }
    case WDeleteKeys(ids, keys, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc)(pt =>
          acc + (id -> pt.copy(payload = pt.payload.map(_ -- keys))))
      }
    case WClear(ids, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(payload = None)))
      }
    case WSetVector(ids, v, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(vector = Some(v))))
      }
    case WDelVector(ids, scope) =>
      inScope(m, ids, scope).foldLeft(m) { (acc, id) =>
        acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(vector = None)))
      }
  }

  // ------------------------------------------------------- JSON rendering

  private def jv(v: MV): JValue = v match {
    case ML(x) => JInt(BigInt(x))
    case MS(x) => JString(x)
    case MA(xs) => JArray(xs.map(x => JInt(BigInt(x)): JValue).toList)
    case MObj(m) => JObject(m.toList.sortBy(_._1).map { case (k, x) => k -> jv(x) })
    case MNull => JNull
  }

  private def payloadJ(p: Map[String, MV]): JValue =
    JObject(p.toList.sortBy(_._1).map { case (k, v) => k -> jv(v) })

  private def scopeJ(scope: Seq[String]): List[(String, JValue)] =
    if (scope.isEmpty) Nil
    else List("shard_key" -> JArray(scope.map(JString(_): JValue).toList))

  private def idsJ(ids: Seq[Long]): (String, JValue) =
    "points" -> JArray(ids.map(i => JInt(BigInt(i)): JValue).toList)

  private def vecJ(v: Seq[Float]): JValue =
    JArray(v.map(x => JDouble(x.toDouble): JValue).toList)

  private def renderOp(op: WOp): JValue = op match {
    case WUpsert(pts, mode, bodyKey) =>
      JObject("upsert" -> JObject(List(
        "points" -> (JArray(pts.map { case (id, v, p, own) =>
          JObject(List(
            "id" -> (JInt(BigInt(id)): JValue),
            "vector" -> vecJ(v),
            "payload" -> payloadJ(p)) ++
            own.map(k => "shard_key" -> (JString(k): JValue)).toList): JValue
        }.toList): JValue),
        "update_mode" -> (JString(mode): JValue)) ++
        bodyKey.map(k => "shard_key" -> (JString(k): JValue)).toList))
    case WDelete(ids, scope) =>
      JObject("delete" -> JObject(idsJ(ids) :: scopeJ(scope)))
    case WSetPayload(ids, patch, path, scope) =>
      JObject("set_payload" -> JObject(List(
        "payload" -> payloadJ(patch), idsJ(ids)) ++
        path.map(p => "key" -> (JString(p): JValue)).toList ++ scopeJ(scope)))
    case WOverwrite(ids, p, scope) =>
      JObject("overwrite_payload" -> JObject(List(
        "payload" -> payloadJ(p), idsJ(ids)) ++ scopeJ(scope)))
    case WDeleteKeys(ids, keys, scope) =>
      JObject("delete_payload" -> JObject(List(
        "keys" -> (JArray(keys.map(JString(_): JValue).toList): JValue),
        idsJ(ids)) ++ scopeJ(scope)))
    case WClear(ids, scope) =>
      JObject("clear_payload" -> JObject(idsJ(ids) :: scopeJ(scope)))
    case WSetVector(ids, v, scope) =>
      JObject("update_vectors" -> JObject(List(
        "points" -> (JArray(ids.map(id => JObject(List(
          "id" -> (JInt(BigInt(id)): JValue),
          "vector" -> vecJ(v))): JValue).toList): JValue)) ++ scopeJ(scope)))
    case WDelVector(ids, scope) =>
      JObject("delete_vectors" -> JObject(List(
        idsJ(ids),
        "vector" -> (JArray(List(JString(""))): JValue)) ++ scopeJ(scope)))
  }

  private def renderBatch(ops: Seq[WOp]): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      JObject("operations" -> JArray(ops.map(renderOp).toList))))

  // ------------------------------------------------------------ generators

  private val shardKeys = Seq("sa", "sb", "sc")
  private def shardOf(id: Long): String = shardKeys((id % 3).toInt)

  private val genKey: Gen[String] = Gen.oneOf("a", "b", "c", "nest")
  private val genLeafObj: Gen[MV] =
    Gen.mapOfN(2, Gen.zip(Gen.oneOf("p", "q"),
      Gen.chooseNum(0L, 9L).map(ML(_): MV))).map(MObj)
  private val genVal: Gen[MV] = Gen.frequency(
    4 -> Gen.chooseNum(-100L, 100L).map(ML),
    3 -> Gen.oneOf("x", "yy", "hello \"world\"", "").map(MS),
    2 -> Gen.listOfN(3, Gen.chooseNum(0L, 9L)).map(MA(_)),
    1 -> genLeafObj)
  private val genPayload: Gen[Map[String, MV]] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.mapOfN(n, Gen.zip(genKey, genVal)))
  private val genPatch: Gen[Map[String, MV]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.mapOfN(n,
      Gen.zip(genKey, Gen.frequency(5 -> genVal, 1 -> Gen.const(MNull: MV)))))
  private val genIds: Gen[Seq[Long]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 12L)).map(_.distinct))
  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(2, Gen.chooseNum(-8, 8)).map(_.map(_.toFloat))

  /** `sharded` controls whether shard keys appear anywhere: upserts carry
    * point- or body-level keys (every point must resolve one), selector
    * ops are shard-scoped ~1/3 of the time. */
  private def genOp(sharded: Boolean): Gen[WOp] = {
    // a custom-sharded collection REJECTS keyless update ops
    // (`shard_holder/mod.rs:429-438`, pinned by its own test below), so
    // the sharded arm always scopes selector ops
    val genScope: Gen[Seq[String]] =
      if (!sharded) Gen.const(Nil)
      else Gen.someOf(shardKeys).map(_.toSeq).suchThat(_.nonEmpty)
    Gen.frequency(
      3 -> (for {
        n <- Gen.chooseNum(1, 3)
        ids <- Gen.listOfN(n, Gen.chooseNum(1L, 12L)).map(_.distinct)
        // per-point: own key (possibly differing from the id's "home"
        // shard — upserts may MOVE a point between shards) or None
        owns <- Gen.sequence[Seq[Option[String]], Option[String]](
          ids.map(_ => Gen.option(Gen.oneOf(shardKeys))))
        bodyKey <- Gen.oneOf(shardKeys)
        pts <- Gen.sequence[Seq[(Long, Seq[Float], Map[String, MV])], (Long, Seq[Float], Map[String, MV])](
          ids.map(id => Gen.zip(genVec, genPayload).map { case (v, p) => (id, v, p) }))
        mode <- Gen.oneOf("upsert", "insert_only", "update_only")
      } yield WUpsert(
        pts.zip(owns).map { case ((id, v, p), own) =>
          (id, v, p, if (sharded) own else None) },
        mode, if (sharded) Some(bodyKey) else None)),
      2 -> Gen.zip(genIds, genScope).map { case (i, sc) => WDelete(i, sc) },
      3 -> (for {
        ids <- genIds; patch <- genPatch
        path <- Gen.frequency(3 -> Gen.const(None),
          1 -> Gen.oneOf("nest", "nest.inner").map(Some(_)))
        sc <- genScope
      } yield WSetPayload(ids, patch, path, sc)),
      2 -> Gen.zip(genIds, genPayload, genScope).map {
        case (i, p, sc) => WOverwrite(i, p, sc) },
      2 -> (for {
        ids <- genIds
        keys <- Gen.chooseNum(1, 2).flatMap(Gen.listOfN(_, genKey)).map(_.distinct)
        sc <- genScope
      } yield WDeleteKeys(ids, keys, sc)),
      1 -> Gen.zip(genIds, genScope).map { case (i, sc) => WClear(i, sc) },
      2 -> Gen.zip(genIds, genVec, genScope).map {
        case (i, v, sc) => WSetVector(i, v, sc) },
      1 -> Gen.zip(genIds, genScope).map { case (i, sc) => WDelVector(i, sc) })
  }

  private def genSeq(sharded: Boolean): Gen[List[WOp]] =
    Gen.chooseNum(4, 8).flatMap(Gen.listOfN(_, genOp(sharded)))

  // --------------------------------------------------------------- the run

  private def canon(j: JValue): JValue = j match {
    case JObject(fs) => JObject(fs.map { case (k, v) => k -> canon(v) }.sortBy(_._1))
    case JArray(xs) => JArray(xs.map(canon))
    case JLong(x) => JInt(BigInt(x))
    case other => other
  }
  private def canonStr(s: String): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      canon(org.json4s.jackson.JsonMethods.parse(s))))
  private def renderPayload(p: Map[String, MV]): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(payloadJ(p)))

  private def mkCollection(tag: String, sharded: Boolean): (Collection, Map[Long, MPoint]) = {
    import spark.implicits._
    val cfg = CollectionConfig(idCol = "id",
      vectors = Seq(VectorConfig("", 2, Dot)),
      shardKeyCol = if (sharded) Some("shard_key") else None)
    val init = (1L to 8L).map { i =>
      (i, Seq(i.toFloat, -i.toFloat),
        Map[String, MV]("a" -> ML(i), "b" -> MS(s"p$i")))
    }
    val df0 = init.map { case (id, v, p) => (id, v, renderPayload(p)) }
      .toDF("id", "vector", "payload").coalesce(1)
    val df = if (sharded)
      df0.withColumn("shard_key",
        element_at(typedLit(shardKeys), (pmod(col("id"), lit(3)) + 1).cast("int")))
    else df0
    val c = Collection.create(spark, s"/tmp/graft_runtime/wiremodel_$tag", cfg, df)
    (c, init.map { case (id, v, p) =>
      id -> MPoint(Some(v), Some(p), if (sharded) Some(shardOf(id)) else None)
    }.toMap)
  }

  case class MRead(vector: Option[List[Float]], payload: Option[String],
      shard: Option[String])

  private def stateOf(c: Collection, sharded: Boolean): Map[Long, MRead] = {
    val cols = Seq(col("id"), col("vector"), col("payload")) ++
      (if (sharded) Seq(col("shard_key")) else Nil)
    c.read().select(cols: _*).collect().map { r =>
      r.getLong(0) -> MRead(
        Option(r.get(1)).map(_ => r.getSeq[Float](1).toList),
        Option(r.getString(2)).map(canonStr),
        if (sharded) Option(r.getString(3)) else None)
    }.toMap
  }

  private def modelState(m: Map[Long, MPoint]): Map[Long, MRead] =
    m.map { case (id, pt) =>
      id -> MRead(pt.vector.map(_.toList),
        pt.payload.map(p => canonStr(renderPayload(p))), pt.shard)
    }

  private def run(sharded: Boolean, seeds: Range): Unit =
    seeds.foreach { i =>
      val ops = genSeq(sharded).apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      val tag = (if (sharded) "s" else "p") + i
      val (c, m0) = mkCollection(tag, sharded)
      val (m, applied, expectErr) = replay(m0, ops)
      val json = renderBatch(ops)
      val before = c.rewriteCount
      expectErr match {
        case None => graft.api.UpdateBridge.applyJson(c, json)
        case Some(msg) =>
          val ex = intercept[IllegalArgumentException](
            graft.api.UpdateBridge.applyJson(c, json))
          assert(ex.getMessage.contains(msg),
            s"seed $i (sharded=$sharded): expected '$msg', " +
              s"got '${ex.getMessage}'\n json=$json")
      }
      // the applied PREFIX is exactly one rewrite; an immediately-failing
      // batch rewrites nothing
      assert(c.rewriteCount == before + (if (applied == 0) 0 else 1),
        "a wire batch folds its applied prefix into exactly one rewrite")
      val real = stateOf(c, sharded)
      val want = modelState(m)
      assert(real == want,
        s"seed $i (sharded=$sharded) diverged:\n json=$json\n " +
          s"real=${real.toSeq.sortBy(_._1)}\n want=${want.toSeq.sortBy(_._1)}")
      // standing by-id exclusion property (not a fixture): whatever state
      // the random batch left behind, a `{"query": <live id>}` NEVER
      // returns the referenced point itself — the reference merges
      // `must_not HasId(id)` into the filter (`exclude_referenced_ids`,
      // `collection_query.rs:523-531,701-705`; `test_query_full.py:160`) —
      // and the page still fills from the remaining vectors.
      val live = m.collect { case (id, pt) if pt.vector.isDefined => id }
        .toSeq.sorted
      val othersWithVec = live.size - 1
      live.headOption.foreach { id =>
        val got = c.query(s"""{"query": $id, "limit": 8}""")
          .collect().map(_.getLong(0)).toSeq
        assert(!got.contains(id),
          s"seed $i (sharded=$sharded): by-id query for $id returned itself")
        assert(got.length == math.min(8, othersWithVec),
          s"seed $i (sharded=$sharded): by-id query for $id returned " +
            s"${got.length} rows, expected ${math.min(8, othersWithVec)}")
      }
    }

  test("wire batches on a plain collection match the driver model (30 sequences)") {
    run(sharded = false, 1 to 30)
  }

  test("wire batches on a SHARD-KEYED collection match the driver model (30 sequences)") {
    run(sharded = true, 101 to 130)
  }

  test("keyless update ops on a custom-sharded collection reject (no None ring)") {
    val (c, _) = mkCollection("keyless", sharded = true)
    for (body <- Seq(
        """{"set_payload": {"payload": {"a": 1}, "points": [1]}}""",
        """{"delete": {"points": [1]}}""",
        """{"update_vectors": {"points": [{"id": 1, "vector": [0.1, 0.2]}]}}""",
        """{"delete_vectors": {"points": [1], "vector": [""]}}""",
        """{"clear_payload": {"points": [1]}}""")) {
      val ex = intercept[IllegalArgumentException](
        graft.api.UpdateBridge.applyJson(c, s"""{"operations": [$body]}"""))
      assert(ex.getMessage.contains("Shard key not specified"), body)
    }
    // the rejected ops never reached the table
    assert(stateOf(c, sharded = true).contains(1L))
  }

  test("sparse wire round-trips over the FULL u32 index domain match a driver " +
      "model (5 random corpora × 5 queries)") {
    import org.apache.spark.sql.functions.col
    import graft.sources.{CollectionConfig, SparseVectorConfig}
    import spark.implicits._
    // indices drawn uniformly from [0, 2^32): roughly half the draws land
    // above 2^31−1 — the range the old Double→Int parse saturated, where a
    // single clamp collides distinct dims across points (silently wrong
    // dot products) or rejects one vector's two large dims as duplicates.
    // Values are k/8 (exact in f32 AND in double), so model and engine
    // sums are bit-exact and the compare needs no tolerance.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(20260816L + seed)
      def u32(): Long = rnd.nextLong() & 0xFFFFFFFFL
      val shared = Seq.fill(5)(u32()).distinct
      val corpus: Seq[(Long, Map[Long, Float])] = (1L to 12L).map { id =>
        val own = Seq.fill(rnd.nextInt(4))(u32())
        val dims0 = (rnd.shuffle(shared).take(1 + rnd.nextInt(3)) ++ own).distinct
        val dims = if (dims0.nonEmpty) dims0 else Seq(u32())
        id -> dims.map(d => d -> ((rnd.nextInt(30) + 1) / 8.0f)).toMap
      }
      val cfg = CollectionConfig(idCol = "id",
        sparse = Seq(SparseVectorConfig("txt")))
      val c = Collection.create(spark,
        s"/tmp/graft_runtime/wiremodel_sparse$seed", cfg,
        Seq.empty[Long].toDF("id").withColumn("sparse_txt",
          org.apache.spark.sql.functions.lit(null)
            .cast("struct<indices: array<bigint>, values: array<float>>"))
          .withColumn("payload",
            org.apache.spark.sql.functions.lit(null).cast("string")))
      val pointsJson = corpus.map { case (id, dv) =>
        val sorted = dv.toSeq.sortBy(_._1)
        s"""{"id": $id, "vector": {"txt": {
           |  "indices": ${sorted.map(_._1).mkString("[", ",", "]")},
           |  "values": ${sorted.map(_._2).mkString("[", ",", "]")}}}}""".stripMargin
      }.mkString(",")
      graft.api.UpdateBridge.applyJson(c,
        s"""{"operations": [{"upsert": {"points": [$pointsJson]}}]}""")
      // storage round-trip: stored dims are EXACTLY the model's (u32-wide)
      val storedDims = c.read().select(col("id"), col("sparse_txt.indices"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert(storedDims == corpus.map { case (id, dv) => id -> dv.keySet }.toMap,
        s"seed $seed: stored sparse dims diverged from the model")
      def checkQueries(model: Map[Long, Map[Long, Float]], tag: String): Unit =
        for (trial <- 1 to 5) {
          val qDims = (rnd.shuffle(shared).take(1 + rnd.nextInt(2)) ++
            Seq(u32())).distinct.sorted
          val expected = model.toSeq
            .map { case (id, dv) =>
              id -> qDims.flatMap(dv.get).map(_.toDouble).sum }
            .filter(_._2 > 0)
            .sortBy { case (id, s) => (-s, id) }
            .take(10)
          val got = c.query(
            s"""{"query": {"indices": ${qDims.mkString("[", ",", "]")},
               |  "values": ${qDims.map(_ => "1.0").mkString("[", ",", "]")}},
               |  "using": "txt", "limit": 10}""".stripMargin)
            .select("id", "score").collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
          assert(got == expected,
            s"seed $seed $tag trial $trial: wire sparse scores diverged\n " +
              s"got=$got\n want=$expected\n q=$qDims")
        }
      checkQueries(corpus.toMap, "initial")
      // wire MUTATIONS over the same dim domain: update_vectors replaces
      // three points' sparse cells (fresh full-u32 dims + one shared),
      // delete_vectors nulls two others — queries must track the model
      val updated = corpus.toMap ++ (1L to 3L).map { id =>
        val dims = (Seq.fill(2)(u32()) ++ rnd.shuffle(shared).take(1)).distinct
        id -> dims.map(d => d -> ((rnd.nextInt(30) + 1) / 8.0f)).toMap
      }.toMap
      val afterDelete = (updated - 11L - 12L) ++
        Map(11L -> Map.empty[Long, Float], 12L -> Map.empty[Long, Float])
      val updJson = (1L to 3L).map { id =>
        val sorted = updated(id).toSeq.sortBy(_._1)
        s"""{"id": $id, "vector": {"txt": {
           |  "indices": ${sorted.map(_._1).mkString("[", ",", "]")},
           |  "values": ${sorted.map(_._2).mkString("[", ",", "]")}}}}""".stripMargin
      }.mkString(",")
      graft.api.UpdateBridge.applyJson(c,
        s"""{"operations": [
           |  {"update_vectors": {"points": [$updJson]}},
           |  {"delete_vectors": {"points": [11, 12], "vector": ["txt"]}}
           |]}""".stripMargin)
      checkQueries(afterDelete.filter(_._2.nonEmpty), "mutated")
      val storedAfter = c.read().select(col("id"), col("sparse_txt.indices"))
        .collect().map(r => r.getLong(0) ->
          Option(r.get(1)).map(_ => r.getSeq[Long](1).toSet)).toMap
      assert(storedAfter(11L).isEmpty && storedAfter(12L).isEmpty,
        s"seed $seed: delete_vectors must null the sparse cells")
      assert(storedAfter(1L) == Some(updated(1L).keySet),
        s"seed $seed: update_vectors round-trip diverged")
    }
  }

  test("multivec wire round-trips: legacy dense inputs store as 1-token " +
      "matrices and score like their matrix twins (5 random corpora)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // values on the k/8 grid → dots live on the 1/64 grid (exact in f32,
    // double AND at round(·,6)), so every compare is bit-exact. 1-token
    // points flip a coin between the matrix form `[[..]]` and the LEGACY
    // dense form `[..]` (`TryFrom<VectorInternal> for
    // MultiDenseVectorInternal`, `data_types/vectors.rs:176-190`) — the
    // stored state and every query must be indistinguishable.
    val dim = 4
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(20260817L + seed)
      def tok(): Seq[Float] = Seq.fill(dim)((rnd.nextInt(17) - 8) / 8.0f)
      val corpus: Seq[(Long, Seq[Seq[Float]], Boolean)] = (1L to 12L).map { id =>
        val k = 1 + rnd.nextInt(3)
        (id, Seq.fill(k)(tok()), k == 1 && rnd.nextBoolean())
      }
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("tok", dim, Dot, multivector = true)))
      val c = Collection.create(spark,
        s"/tmp/graft_runtime/wiremodel_mvleg$seed", cfg,
        Seq.empty[Long].toDF("id")
          .withColumn("vector_tok", org.apache.spark.sql.functions.lit(null)
            .cast("array<array<float>>"))
          .withColumn("payload",
            org.apache.spark.sql.functions.lit(null).cast("string")))
      def vecJson(m: Seq[Seq[Float]], legacy: Boolean): String =
        if (legacy) m.head.mkString("[", ",", "]")
        else m.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      val pointsJson = corpus.map { case (id, m, legacy) =>
        s"""{"id": $id, "vector": {"tok": ${vecJson(m, legacy)}}}"""
      }.mkString(",")
      graft.api.UpdateBridge.applyJson(c,
        s"""{"operations": [{"upsert": {"points": [$pointsJson]}}]}""")
      val stored = c.read().select(col("id"), col("vector_tok")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[scala.collection.Seq[Float]](1).map(_.toSeq).toSeq).toMap
      assert(stored == corpus.map { case (id, m, _) => id -> m }.toMap,
        s"seed $seed: stored matrices diverged (legacy expansion broken?)")
      for (trial <- 1 to 3) {
        val q = tok()
        def run(body: String) = c.query(body).select("id", "score").collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
        val flat = run(
          s"""{"query": ${q.mkString("[", ",", "]")},
             |  "using": "tok", "limit": 12}""".stripMargin)
        val matrix = run(
          s"""{"query": [${q.mkString("[", ",", "]")}],
             |  "using": "tok", "limit": 12}""".stripMargin)
        assert(flat == matrix,
          s"seed $seed trial $trial: legacy dense query != 1-row matrix query")
        val expected = corpus.map { case (id, m, _) =>
          id -> m.map(t => t.zip(q).map { case (a, b) =>
            a.toDouble * b.toDouble }.sum).max
        }.sortBy { case (id, s) => (-s, id) }.take(12)
        assert(flat == expected,
          s"seed $seed trial $trial: MaxSim scores diverged from the model")
      }
    }
  }
}
