package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Collection alias registry — the reference's alias surface
  * (`lib/storage/src/content_manager/alias_mapping.rs:16-135`, REST ops
  * `collection_meta_ops.rs:45-92`: create_alias / delete_alias /
  * rename_alias): a persisted alias → collection mapping resolved before
  * every collection lookup, so clients can re-point a stable name
  * ("prod-docs") at a new collection build atomically.
  *
  * Semantics mirrored exactly:
  *   - `create` overwrites an existing alias (re-point; `alias_mapping.rs:66`),
  *   - `delete` returns the previous target if any (`:72`),
  *   - `rename` fails if the old alias doesn't exist (`:95-112`),
  *   - `removeCollection` drops every alias of a dropped collection (`:83`),
  *   - aliases resolve to exactly one collection; a collection may have many.
  *
  * Persistence is a single JSON file swapped atomically (write-tmp + move),
  * the Spark-side analog of the reference's `AliasMapping::save`. This is
  * driver-side catalog state (tiny), never part of a distributed plan.
  */
final class Aliases(dir: String) {

  private val path = Paths.get(dir, "aliases.json")
  Files.createDirectories(Paths.get(dir))

  private def load(): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else JsonMethods.parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8)) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }

  private def save(m: Map[String, String]): Unit = {
    val json = JsonMethods.compact(JsonMethods.render(
      JObject(m.toSeq.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }.toList)))
    val tmp = Paths.get(path.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Create or re-point an alias (`CreateAliasOperation`). */
  def create(alias: String, collection: String): Unit =
    save(load() + (alias -> collection))

  /** Drop an alias; returns the previous target (`remove`, `:72`). */
  def delete(alias: String): Option[String] = {
    val m = load()
    val prev = m.get(alias)
    if (prev.isDefined) save(m - alias)
    prev
  }

  /** Rename an alias, keeping its target; error if absent (`:95-112`). */
  def rename(oldAlias: String, newAlias: String): Unit = {
    val m = load()
    val target = m.getOrElse(oldAlias,
      throw new IllegalArgumentException(s"Alias $oldAlias does not exist"))
    save(m - oldAlias + (newAlias -> target))
  }

  /** Resolve an alias to its collection, if bound. */
  def get(alias: String): Option[String] = load().get(alias)

  /** Resolve a name that may be an alias OR a direct collection name —
    * the lookup the reference performs on every request path. */
  def resolve(name: String): String = load().getOrElse(name, name)

  /** All aliases of one collection (`collection_aliases`, `:114`). */
  def collectionAliases(collection: String): Seq[String] =
    load().collect { case (a, c) if c == collection => a }.toSeq.sorted

  /** Full alias list (`GET /aliases`). */
  def list(): Seq[(String, String)] = load().toSeq.sortBy(_._1)

  /** Drop all aliases of a dropped collection (`remove_collection`, `:83`). */
  def removeCollection(collection: String): Int = {
    val m = load()
    val keep = m.filter(_._2 != collection)
    if (keep.size != m.size) save(keep)
    m.size - keep.size
  }

  def exists(alias: String): Boolean = load().contains(alias)
}
