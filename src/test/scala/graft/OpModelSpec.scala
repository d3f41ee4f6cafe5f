package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.json4s._

import graft.model.Dot
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.{Collection, UpdateMode, UpdateOp}

/** Model-based mutation testing (the reference's op-model pattern,
  * `lib/collection/src/model_testing/`, `verify.rs:16-80`; SURVEY.md §5.6):
  * random ordered op sequences — upserts in all three admission modes,
  * deletes, payload set/overwrite/delete-keys/clear, vector update/delete —
  * applied to a real Collection through ONE `applyBatch` call AND to an
  * independent driver-side `Map` model, then the collection's full state
  * (ids, vectors, canonical payload JSON) is diffed against the model, and
  * a keyset scroll walk must page exactly the model's id order. The nested
  * payload corruption caught by hand in round 9 is this bug class.
  */
class OpModelSpec extends SparkTestBase {

  // ----------------------------------------------------- the driver model

  /** Modeled payload value: the JSON shapes the generators emit.
    * `MObj` is recursive so key-path merges can model nested objects. */
  sealed trait MV
  case class ML(v: Long) extends MV
  case class MS(v: String) extends MV
  case class MB(v: Boolean) extends MV
  case class MA(v: Seq[Long]) extends MV
  case class MObj(v: Map[String, MV]) extends MV
  /** Explicit JSON null — in set_payload patches it DELETES the key
    * (`merge_map`, the jackson kernel's contract). */
  case object MNull extends MV

  /** Modeled point: dense vector (None = deleted) + payload
    * (None = cleared → SQL-null column). */
  case class MPoint(vector: Option[Seq[Float]], payload: Option[Map[String, MV]])

  sealed trait MOp
  case class OpUpsert(points: Seq[(Long, Seq[Float], Map[String, MV])],
      mode: UpdateMode) extends MOp
  case class OpDelete(ids: Seq[Long]) extends MOp
  case class OpSetPayload(ids: Seq[Long], patch: Map[String, MV]) extends MOp
  /** set_payload with a `key` JsonPath (dotted object paths): the patch
    * merges into the object AT the path, creating intermediate objects;
    * a scalar at the path is replaced by an object (`SetPayloadOp.key`,
    * `payload_ops.rs:64-75`; kernel `filters/PayloadMutate.scala`). */
  case class OpSetPayloadAt(ids: Seq[Long], path: String,
      patch: Map[String, MV]) extends MOp
  case class OpOverwrite(ids: Seq[Long], payload: Map[String, MV]) extends MOp
  case class OpDeleteKeys(ids: Seq[Long], keys: Seq[String]) extends MOp
  case class OpClear(ids: Seq[Long]) extends MOp
  case class OpSetVector(ids: Seq[Long], vec: Seq[Float]) extends MOp
  case class OpDelVector(ids: Seq[Long]) extends MOp

  private def stepModel(m: Map[Long, MPoint], op: MOp): Map[Long, MPoint] = op match {
    case OpUpsert(pts, mode) => pts.foldLeft(m) { case (acc, (id, v, p)) =>
      mode match {
        case UpdateMode.InsertOnly if acc.contains(id) => acc
        case UpdateMode.UpdateOnly if !acc.contains(id) => acc
        case _ => acc + (id -> MPoint(Some(v), Some(p)))
      }
    }
    case OpDelete(ids) => m -- ids
    case OpSetPayload(ids, patch) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc) { pt =>
        // merge into {} when cleared; null patch values delete the key
        val base = pt.payload.getOrElse(Map.empty)
        val merged = patch.foldLeft(base) {
          case (b, (k, MNull)) => b - k
          case (b, (k, v)) => b + (k -> v)
        }
        acc + (id -> pt.copy(payload = Some(merged)))
      }
    }
    case OpSetPayloadAt(ids, path, patch) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc) { pt =>
        def setAt(obj: Map[String, MV], segs: List[String]): Map[String, MV] =
          segs match {
            case k :: Nil =>
              val cur = obj.get(k) match {
                case Some(MObj(o)) => o
                case _ => Map.empty[String, MV] // scalar/missing → fresh object
              }
              val merged = patch.foldLeft(cur) {
                case (b, (kk, MNull)) => b - kk
                case (b, (kk, v)) => b + (kk -> v)
              }
              obj + (k -> MObj(merged))
            case k :: rest =>
              val cur = obj.get(k) match {
                case Some(MObj(o)) => o
                case _ => Map.empty[String, MV]
              }
              obj + (k -> MObj(setAt(cur, rest)))
            case Nil => obj
          }
        val base = pt.payload.getOrElse(Map.empty)
        acc + (id -> pt.copy(payload =
          Some(setAt(base, path.split('.').toList))))
      }
    }
    case OpOverwrite(ids, p) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(payload = Some(p))))
    }
    case OpDeleteKeys(ids, keys) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc)(pt =>
        acc + (id -> pt.copy(payload = pt.payload.map(_ -- keys))))
    }
    case OpClear(ids) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(payload = None)))
    }
    case OpSetVector(ids, v) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(vector = Some(v))))
    }
    case OpDelVector(ids) => ids.foldLeft(m) { (acc, id) =>
      acc.get(id).fold(acc)(pt => acc + (id -> pt.copy(vector = None)))
    }
  }

  // ------------------------------------------------- wire rendering + diff

  private def jv(v: MV): JValue = v match {
    case ML(x) => JInt(BigInt(x))
    case MS(x) => JString(x)
    case MB(x) => JBool(x)
    case MA(xs) => JArray(xs.map(x => JInt(BigInt(x)): JValue).toList)
    case MObj(m) => JObject(m.toList.sortBy(_._1).map { case (k, x) =>
      k -> jv(x) })
    case MNull => JNull
  }

  private def renderPayload(p: Map[String, MV]): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      JObject(p.toList.sortBy(_._1).map { case (k, v) => k -> jv(v) })))

  /** Order-insensitive, width-insensitive canonical form for the diff. */
  private def canon(j: JValue): JValue = j match {
    case JObject(fs) => JObject(fs.map { case (k, v) => k -> canon(v) }.sortBy(_._1))
    case JArray(xs) => JArray(xs.map(canon))
    case JLong(x) => JInt(BigInt(x))
    case other => other
  }

  private def canonStr(s: String): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      canon(org.json4s.jackson.JsonMethods.parse(s))))

  private def applyReal(c: Collection, op: MOp): UpdateOp = {
    import spark.implicits._
    def tgt(ids: Seq[Long]) =
      if (ids.isEmpty) lit(false) else col("id").isin(ids: _*)
    op match {
      case OpUpsert(pts, mode) => UpdateOp.Upsert(
        pts.map { case (id, v, p) => (id, v, renderPayload(p)) }
          .toDF("id", "vector", "payload").coalesce(1), mode)
      case OpDelete(ids) => UpdateOp.DeleteIds(ids)
      case OpSetPayload(ids, patch) =>
        UpdateOp.SetPayload(renderPayload(patch), tgt(ids), None)
      case OpSetPayloadAt(ids, path, patch) =>
        UpdateOp.SetPayload(renderPayload(patch), tgt(ids), Some(path))
      case OpOverwrite(ids, p) =>
        UpdateOp.OverwritePayload(renderPayload(p), tgt(ids))
      case OpDeleteKeys(ids, keys) => UpdateOp.DeletePayloadKeys(keys, tgt(ids))
      case OpClear(ids) => UpdateOp.ClearPayload(tgt(ids))
      case OpSetVector(ids, v) =>
        UpdateOp.UpdateVector("", typedlit(v), tgt(ids))
      case OpDelVector(ids) => UpdateOp.DeleteVector("", tgt(ids))
    }
  }

  // ------------------------------------------------------------ generators

  private val genKey: Gen[String] = Gen.oneOf("a", "b", "c", "nest", "tags")
  private val genLeafObj: Gen[MV] =
    Gen.mapOfN(2, Gen.zip(Gen.oneOf("p", "q"),
      Gen.chooseNum(0L, 9L).map(ML(_): MV))).map(MObj)
  private val genVal: Gen[MV] = Gen.frequency(
    4 -> Gen.chooseNum(-100L, 100L).map(ML),
    3 -> Gen.oneOf("x", "yy", "hello world", "").map(MS),
    1 -> Gen.oneOf(true, false).map(MB),
    2 -> Gen.listOfN(3, Gen.chooseNum(0L, 9L)).map(MA(_)),
    1 -> genLeafObj,
    // depth-2 object so dotted key paths meet real nested structure
    1 -> Gen.zip(Gen.chooseNum(0L, 9L), genLeafObj).map { case (x, o) =>
      MObj(Map("p" -> ML(x), "inner" -> o)) })
  private val genPayload: Gen[Map[String, MV]] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.mapOfN(n, Gen.zip(genKey, genVal)))
  private val genPatch: Gen[Map[String, MV]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.mapOfN(n,
      Gen.zip(genKey, Gen.frequency(5 -> genVal, 1 -> Gen.const(MNull)))))
  private val genIds: Gen[Seq[Long]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 12L)).map(_.distinct))
  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(2, Gen.chooseNum(-8, 8)).map(_.map(_.toFloat))

  private val genOp: Gen[MOp] = Gen.frequency(
    3 -> (for {
      n <- Gen.chooseNum(1, 3)
      ids <- Gen.listOfN(n, Gen.chooseNum(1L, 12L)).map(_.distinct)
      pts <- Gen.sequence[Seq[(Long, Seq[Float], Map[String, MV])], (Long, Seq[Float], Map[String, MV])](
        ids.map(id => Gen.zip(genVec, genPayload).map { case (v, p) => (id, v, p) }))
      mode <- Gen.oneOf(UpdateMode.Upsert, UpdateMode.InsertOnly, UpdateMode.UpdateOnly)
    } yield OpUpsert(pts, mode)),
    2 -> genIds.map(OpDelete),
    3 -> Gen.zip(genIds, genPatch).map { case (i, p) => OpSetPayload(i, p) },
    2 -> (for {
      ids <- genIds
      path <- Gen.oneOf("nest", "nest.inner", "c", "a.b.deep")
      patch <- Gen.chooseNum(1, 2).flatMap(n => Gen.mapOfN(n,
        Gen.zip(Gen.oneOf("p", "q", "r"),
          Gen.frequency(4 -> Gen.chooseNum(0L, 99L).map(ML(_): MV),
            1 -> Gen.const(MNull: MV)))))
    } yield OpSetPayloadAt(ids, path, patch)),
    2 -> Gen.zip(genIds, genPayload).map { case (i, p) => OpOverwrite(i, p) },
    2 -> Gen.zip(genIds, Gen.chooseNum(1, 2).flatMap(Gen.listOfN(_, genKey)))
      .map { case (i, ks) => OpDeleteKeys(i, ks.distinct) },
    1 -> genIds.map(OpClear),
    2 -> Gen.zip(genIds, genVec).map { case (i, v) => OpSetVector(i, v) },
    1 -> genIds.map(OpDelVector))

  private val genSeq: Gen[List[MOp]] =
    Gen.chooseNum(4, 8).flatMap(Gen.listOfN(_, genOp))

  // --------------------------------------------------------------- the run

  private val cfg = CollectionConfig(idCol = "id",
    vectors = Seq(VectorConfig("", 2, Dot)))

  private def freshCollection(seedTag: Long): (Collection, Map[Long, MPoint]) = {
    import spark.implicits._
    val init = (1L to 8L).map { i =>
      (i, Seq(i.toFloat, -i.toFloat),
        Map[String, MV]("a" -> ML(i), "b" -> MS(s"p$i")))
    }
    val c = Collection.create(spark,
      s"/tmp/graft_runtime/opmodel_$seedTag", cfg,
      init.map { case (id, v, p) => (id, v, renderPayload(p)) }
        .toDF("id", "vector", "payload").coalesce(1))
    (c, init.map { case (id, v, p) => id -> MPoint(Some(v), Some(p)) }.toMap)
  }

  private def stateOf(c: Collection): Map[Long, MPointRead] =
    c.read().select(col("id"), col("vector"), col("payload"))
      .collect().map { r =>
        val vec = Option(r.get(1)).map(_ =>
          r.getSeq[Float](1).toList)
        val pay = Option(r.getString(2)).map(canonStr)
        r.getLong(0) -> MPointRead(vec, pay)
      }.toMap

  case class MPointRead(vector: Option[List[Float]], payload: Option[String])

  private def modelState(m: Map[Long, MPoint]): Map[Long, MPointRead] =
    m.map { case (id, pt) =>
      id -> MPointRead(pt.vector.map(_.toList),
        pt.payload.map(p => canonStr(renderPayload(p))))
    }

  test("random op batches: collection state equals the driver model (120 sequences)") {
    var walked = 0
    (1 to 120).foreach { i =>
      val ops = genSeq.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      val (c, m0) = freshCollection(i.toLong)
      val m = ops.foldLeft(m0)(stepModel)
      val before = c.rewriteCount
      c.applyBatch(ops.map(applyReal(c, _)))
      assert(c.rewriteCount == before + (if (ops.isEmpty) 0 else 1),
        "a batch must be exactly one rewrite")
      val real = stateOf(c)
      val want = modelState(m)
      assert(real == want,
        s"seed $i diverged:\n ops=$ops\n real=${real.toSeq.sortBy(_._1)}\n want=${want.toSeq.sortBy(_._1)}")

      // keyset scroll walk every 10th sequence: pages through the handler
      // (inclusive `offset` cursor) concatenate to the model's ascending
      // id order
      if (i % 10 == 0 && m.nonEmpty) {
        walked += 1
        val pageSize = 3
        var offset: Option[Long] = None
        val seen = Seq.newBuilder[Long]
        var done = false
        while (!done) {
          val body = offset match {
            case Some(o) => s"""{"limit": $pageSize, "offset": $o, "with_payload": false}"""
            case None => s"""{"limit": $pageSize, "with_payload": false}"""
          }
          val rows = c.scroll(body).collect().map(_.getLong(0))
          seen ++= rows
          if (rows.length < pageSize) done = true
          else offset = Some(rows.last + 1L)
        }
        assert(seen.result() == m.keys.toSeq.sorted,
          s"seed $i scroll walk diverged")
      }
    }
    assert(walked > 0)
  }
}
