package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.filters.TypedResolver
import graft.model._
import graft.ops.Reads

/** Count / facet / scroll query catalog (SURVEY.md §2.4) with DuckDB oracles. */
object ReadQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  import org.apache.spark.sql.functions._

  /** documents + synthesized array / array-of-struct payload fields, to
    * exercise the ∃-over-values condition semantics on typed columns. */
  private def docsArr(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      array(col("lang"), col("source")).as("tags"),
      when(col("n_chars") % 4 > 0, sequence(lit(1L), col("n_chars") % 4))
        .otherwise(array().cast("array<bigint>")).as("marks"),
      array(
        struct(col("lang").as("l"), col("n_chars").as("c")),
        struct(col("source").as("l"), (col("n_chars") * 2).as("c"))).as("attrs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Match::Except — "at least one value NOT in the set", which is NOT the
    // negation of Match::Any (ref types.rs:3075-3080)
    "filter_except_count" -> ((s, dir) => {
      val d = docsArr(s, dir)
      val f = Filter.mustAll(MatchExcept("tags",
        Seq("en", "src0", "src1", "src2", "src3", "src4",
          "src5", "src6", "src7", "src8", "src9")))
      Reads.count(d, Some(f), new TypedResolver(d.schema, "doc_id"))
    }),
    // ValuesCount over a variable-length array (absent→0, array→len)
    "filter_values_count" -> ((s, dir) => {
      val d = docsArr(s, dir)
      val f = Filter.mustAll(ValuesCount("marks", gte = Some(2L), lte = Some(3L)))
      Reads.count(d, Some(f), new TypedResolver(d.schema, "doc_id"))
    }),
    // Nested: inner conditions must hold on the SAME array element
    // (ref types.rs:3925-3962)
    "filter_nested_structs" -> ((s, dir) => {
      val d = docsArr(s, dir)
      val f = Filter.mustAll(NestedCond("attrs", Filter(must = Seq(
        MatchValue("l", "en"), RangeCond("c", gt = Some(200L))))))
      Reads.scrollById(d, "doc_id", Some(f), new TypedResolver(d.schema, "doc_id"),
        offsetId = None, limit = 50, projection = Seq("doc_id", "lang", "n_chars"))
    }),
    // order_by over a MULTI-VALUED key: the point ranks once PER VALUE
    // (the reference's numeric index holds one posting per (value, point);
    // `test_order_by.py::test_multi_values_appear_multiple_times`), and an
    // id `offset` combined with order_by rejects with the reference's
    // message (`shard_ops.rs:273-276`). Points carry multi_id = [i, N-i+1]
    // like the reference fixture, so a full asc scroll emits each id
    // exactly twice, interleaved by value.
    "scroll_orderby_multivalue" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{CollectionConfig, VectorConfig}
      val n = 6
      val path = "/tmp/graft_runtime/ob_multi_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("", 2, graft.model.Dot)),
        payloadTypes = Map("multi_id" -> org.apache.spark.sql.types.LongType))
      val coll = graft.storage.Collection.create(s, path, cfg,
        (1 to n).map(i => (i.toLong, Seq(i.toFloat, -i.toFloat),
          s"""{"multi_id":[$i,${n - i + 1}]}""")).toDF("id", "vector", "payload"))
      val page = coll.scroll(
        s"""{"order_by": "multi_id", "limit": ${2 * n},
           |  "with_payload": false}""".stripMargin)
        .collect().map(_.getLong(0))
      val rejected =
        try { coll.scroll("""{"order_by": "multi_id", "offset": 3, "limit": 5}"""); false }
        catch { case ex: IllegalArgumentException =>
          ex.getMessage.contains("Cannot use an `offset` when using `order_by`") }
      page.zipWithIndex.map { case (id, pos) => (pos + 1, id, rejected) }
        .toSeq.toDF("pos", "id", "offset_rejected")
    }),
    // DOUBLY-nested payload filters over the wire — the reference's
    // `test_nesting_nested_payload_query.py` fixture verbatim (2 points,
    // arr1[] of objects each holding arr2[] of {a, b}): `nested` inside
    // `nested` scopes the inner conjunction to ONE arr2 element, a nested
    // KEY may itself carry a `[]` path (`arr1[].arr2`), and the flattened
    // `arr2[].a` path inside a nested filter matches across elements.
    "filter_nested_double" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{CollectionConfig, VectorConfig}
      val path = "/tmp/graft_runtime/nested_double_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("", 4, graft.model.Dot)))
      val coll = graft.storage.Collection.create(s, path, cfg,
        Seq(
          (1L, Seq(0.05f, 0.61f, 0.76f, 0.74f),
            """{"arr1":[{"arr2":[{"a":1,"b":2}]},{"arr2":[{"a":3,"b":4},{"a":5,"b":6}]}]}"""),
          (2L, Seq(0.15f, 0.71f, 0.78f, 0.24f),
            """{"arr1":[{"arr2":[{"a":2,"b":3}]},{"arr2":[{"a":3,"b":5},{"a":5,"b":7}]}]}"""))
          .toDF("id", "vector", "payload"))
      def cnt(filter: String): Long = coll.scroll(
        s"""{"filter": $filter, "limit": 10, "with_payload": false}""").count()
      def nested(key: String, inner: String): String =
        s"""{"must": [{"nested": {"key": "$key", "filter": $inner}}]}"""
      def m(k: String, v: Int): String =
        s"""{"key": "$k", "match": {"value": $v}}"""
      Seq(
        ("flat_path_hit", cnt(nested("arr1", s"""{"must": [${m("arr2[].a", 5)}]}"""))),
        ("flat_path_miss", cnt(nested("arr1", s"""{"must": [${m("arr2[].a", 4)}]}"""))),
        ("flat_path_b", cnt(nested("arr1", s"""{"must": [${m("arr2[].b", 6)}]}"""))),
        ("array_key_miss", cnt(nested("arr1[].arr2", s"""{"must": [${m("b", 8)}]}"""))),
        ("double_nested", cnt(nested("arr1",
          s"""{"must": [{"nested": {"key": "arr2",
             |  "filter": {"must": [${m("a", 5)}]}}}]}""".stripMargin))),
        ("double_nested_conj", cnt(nested("arr1",
          s"""{"must": [{"nested": {"key": "arr2",
             |  "filter": {"must": [${m("a", 5)}, ${m("b", 6)}]}}}]}""".stripMargin))),
        ("array_key_conj", cnt(nested("arr1[].arr2",
          s"""{"must": [${m("a", 3)}, ${m("b", 5)}]}"""))))
        .toDF("check_name", "cnt")
    }),
    // TRIPLY-nested payload filters — the deepest shape the JsonPath
    // traversal supports (`JsonPath::rest`, `json_path/mod.rs:19-33`;
    // nested-in-nested scoping `types.rs:3925-3962` recurses without a
    // depth bound). Closes the nesting family above `filter_nested_double`:
    // nested(nested(nested)) scopes a conjunction to ONE arr3 element
    // three levels down, and the flat `arr1[].arr2[].arr3[].a` wildcard
    // path ranges across everything.
    "filter_nested_triple" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.{CollectionConfig, VectorConfig}
      val path = "/tmp/graft_runtime/nested_triple_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("", 4, graft.model.Dot)))
      val coll = graft.storage.Collection.create(s, path, cfg,
        Seq(
          (1L, Seq(0.05f, 0.61f, 0.76f, 0.74f),
            """{"arr1":[{"arr2":[{"arr3":[{"a":1,"b":1}]},""" +
              """{"arr3":[{"a":2,"b":3}]}]}]}"""),
          (2L, Seq(0.15f, 0.71f, 0.78f, 0.24f),
            """{"arr1":[{"arr2":[{"arr3":[{"a":2,"b":2}]}]},""" +
              """{"arr2":[{"arr3":[{"a":1,"b":3},{"a":4,"b":1}]}]}]}"""))
          .toDF("id", "vector", "payload"))
      def cnt(filter: String): Long = coll.scroll(
        s"""{"filter": $filter, "limit": 10, "with_payload": false}""").count()
      def nested(key: String, inner: String): String =
        s"""{"must": [{"nested": {"key": "$key", "filter": $inner}}]}"""
      def m(k: String, v: Int): String =
        s"""{"key": "$k", "match": {"value": $v}}"""
      def triple(inner: String): String =
        nested("arr1", s"""{"must": [{"nested": {"key": "arr2",
          |  "filter": {"must": [{"nested": {"key": "arr3",
          |    "filter": $inner}}]}}}]}""".stripMargin)
      Seq(
        // a==2 exists at depth 3 in both points
        ("triple_hit", cnt(triple(s"""{"must": [${m("a", 2)}]}"""))),
        // same-ELEMENT conjunction at depth 3: only p2's {a:1,b:3}
        ("triple_conj_same_elem",
          cnt(triple(s"""{"must": [${m("a", 1)}, ${m("b", 3)}]}"""))),
        // a=4 and b=3 live in DIFFERENT arr3 elements of p2 — no match
        ("triple_conj_cross_elem_miss",
          cnt(triple(s"""{"must": [${m("a", 4)}, ${m("b", 3)}]}"""))),
        // flat wildcard path inside a single nested scope: p2 only (a=4)
        ("nested_flat_path", cnt(nested("arr1",
          s"""{"must": [${m("arr2[].arr3[].a", 4)}]}"""))),
        // fully flat wildcard range across all three levels: a>=4 → p2
        ("flat_wildcard_range", cnt(
          """{"must": [{"key": "arr1[].arr2[].arr3[].a",
            |  "range": {"gte": 4}}]}""".stripMargin)))
        .toDF("check_name", "cnt")
    }),
    // NESTED payload field indexing through the wire — the reference's
    // `test_nested_payload_indexing.py` flow: declare a keyword index on
    // a DOTTED path (`country.capital`) and a float index on a WILDCARD
    // array path (`country.cities[].population`), then filter through
    // both. Expected counts are the reference test's own assertions.
    // Column contract: the dotted key materializes a sanitized scalar
    // projection (`idx_country_capital` — an unsanitized dot would break
    // every later `col()` reference), the wildcard key materializes NO
    // scalar column (it addresses multiple values per point; filters
    // compile through the JsonPath wildcard traversal), and dropping both
    // indexes removes what was materialized.
    "api_nested_field_index" -> ((s, dir) => {
      import s.implicits._
      import graft.api.RequestCodec
      import graft.sources.CollectionConfig
      import graft.storage.Collection
      val path = "/tmp/graft_runtime/nested_fieldidx_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      def city(name: String, pop: Double, sights: Seq[String]): String =
        s"""{"name": "$name", "population": $pop, "sightseeing": [""" +
          sights.map(x => s""""$x"""").mkString(", ") + "]}"
      def country(name: String, capital: Option[String],
          cities: Seq[String]): String =
        s"""{"country": {"name": "$name"""" +
          capital.fold("")(c => s""", "capital": "$c"""") +
          s""", "cities": [${cities.mkString(", ")}]}}"""
      val rows = Seq(
        (1L, country("Germany", Some("Berlin"), Seq(
          city("Berlin", 3.7, Seq("Brandenburg Gate", "Reichstag")),
          city("Munich", 1.5, Seq("Marienplatz", "Olympiapark")),
          city("Hamburg", 1.8, Seq("Reeperbahn", "Elbphilharmonie"))))),
        (2L, country("England", Some("London"), Seq(
          city("London", 8.9, Seq("Big Ben", "London Eye")),
          city("Manchester", 2.5, Seq("Manchester United", "Manchester City")),
          city("Liverpool", 0.5, Seq("Anfield", "Albert Dock"))))),
        (3L, country("France", Some("Paris"), Seq(
          city("Paris", 2.2, Seq("Eiffel Tower", "Louvre", "Notre Dame")),
          city("Marseille", 0.9, Seq("Vieux Port", "Notre Dame de la Garde")),
          city("Lyon", 0.5, Seq("Place Bellecour", "Fourviere Basilica"))))),
        (4L, country("Japan", Some("Tokyo"), Seq(
          city("Tokyo", 9.3, Seq("Tokyo Tower", "Tokyo Skytree")),
          city("Osaka", 2.7, Seq("Osaka Castle", "Universal Studios Japan")),
          city("Kyoto", 1.5, Seq("Kiyomizu-dera", "Fushimi Inari-taisha"))))),
        (5L, """{"country": {"name": "Nauru", "cities": [{"name": null}]}}"""),
        (6L, null.asInstanceOf[String]))
      val base = Collection.create(s, path, CollectionConfig(),
        rows.toDF("id", "payload"))
      val (f1, t1, _, fl1) = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "country.capital", "field_schema": "keyword"}""")
      val step1 = base.buildPayloadIndex(f1, t1, fl1)
      val (f2, t2, _, fl2) = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "country.cities[].population",
          |  "field_schema": "float"}""".stripMargin)
      val coll = step1.buildPayloadIndex(f2, t2, fl2)
      def cnt(filter: String): Long = coll.scroll(
        s"""{"filter": $filter, "limit": 10, "with_payload": false}""").count()
      def m(k: String, v: String): String =
        s"""{"key": "$k", "match": {"value": $v}}"""
      val stored = coll.read()
      val colsOk = stored.columns.contains("idx_country_capital") &&
        !stored.columns.exists(_.startsWith("idx_country_cities"))
      val arms = Seq(
        // capital index serves the dotted match; conj pins WHICH point
        ("capital_match_identity", cnt(s"""{"must": [
          |  ${m("country.capital", "\"London\"")},
          |  ${m("country.name", "\"England\"")}]}""".stripMargin)),
        ("name_unindexed", cnt(s"""{"must": [
          |  ${m("country.name", "\"France\"")},
          |  ${m("country.capital", "\"Paris\"")}]}""".stripMargin)),
        // NO implicit array descent without []
        ("array_no_wildcard", cnt(
          """{"must": [{"key": "country.cities.population",
            |  "range": {"gt": 8}}]}""".stripMargin)),
        ("array_wildcard_range", cnt(s"""{"must": [
          |  {"key": "country.cities[].population", "range": {"gt": 9.0}},
          |  ${m("country.name", "\"Japan\"")}]}""".stripMargin)),
        ("sightseeing_value", cnt(s"""{"must": [
          |  ${m("country.cities[].sightseeing", "\"Eiffel Tower\"")},
          |  ${m("country.capital", "\"Paris\"")}]}""".stripMargin)),
        ("indexed_array_pos", cnt(s"""{"must": [
          |  ${m("country.cities[0].name", "\"Paris\"")},
          |  ${m("country.capital", "\"Paris\"")}]}""".stripMargin)),
        ("scalar_array_pos", cnt(s"""{"must": [
          |  ${m("country.cities[].sightseeing[1]", "\"Louvre\"")},
          |  ${m("country.capital", "\"Paris\"")}]}""".stripMargin)),
        ("cols", if (colsOk) 1L else 0L))
      // delete both indexes — the materialized projection must vanish
      coll.dropPayloadIndex("country.capital")
      coll.dropPayloadIndex("country.cities[].population")
      val afterDrop =
        if (coll.read().columns.exists(_.startsWith("idx_"))) 0L else 1L
      (arms :+ ("cols_after_drop", afterDrop)).toDF("check_name", "cnt")
    }),
    // Wire field-index schema PERSISTENCE (`payload_index_schema.rs`: the
    // reference persists the declaration made by `PUT /index`, so it
    // survives restart): `Catalog.createFieldIndex` writes the updated
    // payloadTypes to `_config.json` — after a catalog REOPEN the first
    // upsert RECOMPUTES the projection from the new payload (never serves
    // a stale value). Contrast arm: a direct `buildPayloadIndex` whose
    // config update is deliberately discarded leaves an ORPHANED
    // `idx_`/`geocell_` column after reopen; the write path drops it
    // defensively (readers fall back to the JSON path — correct, just
    // unindexed) instead of serving it stale.
    "api_field_index_persistence" -> ((s, dir) => {
      import s.implicits._
      import graft.api.RequestCodec
      import graft.sources.CollectionConfig
      val root = "/tmp/graft_runtime/fieldidx_persist_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      if (cat.exists("pers")) cat.delete("pers")
      cat.create("pers", CollectionConfig(), Seq(
        (1L, """{"city": "berlin", "tag": "a"}"""),
        (2L, """{"city": "rome", "tag": "b"}"""),
        (3L, """{"city": "berlin", "tag": "c"}""")).toDF("id", "payload"))
      cat.createFieldIndex("pers",
        """{"field_name": "city", "field_schema": "keyword"}""")
      // the un-persisted path: column materializes, declaration is lost
      val (f2, t2, _, fl2) = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "tag", "field_schema": "keyword"}""")
      cat.get("pers").buildPayloadIndex(f2, t2, fl2) // result discarded
      // reopen: a fresh catalog instance reads _config.json
      val reopened = new graft.storage.Catalog(s, root).get("pers")
      val persisted = reopened.config.payloadTypes.get("city")
        .contains(org.apache.spark.sql.types.StringType)
      val tagUndeclared = !reopened.config.payloadTypes.contains("tag")
      reopened.upsert(Seq((1L, """{"city": "munich", "tag": "z"}"""))
        .toDF("id", "payload"))
      val after = new graft.storage.Catalog(s, root).get("pers")
      val stored = after.read()
      val idxFresh = stored.filter(col("id") === 1)
        .select(col("idx_city")).head().getString(0) == "munich"
      val orphanDropped = !stored.columns.contains("idx_tag")
      def cnt(k: String, v: String): Long = after.scroll(
        s"""{"filter": {"must": [{"key": "$k", "match": {"value": "$v"}}]},
           |  "limit": 10, "with_payload": false}""".stripMargin).count()
      Seq(
        ("schema_persisted_after_reopen", if (persisted) 1L else 0L),
        ("unpersisted_key_undeclared", if (tagUndeclared) 1L else 0L),
        ("idx_recomputed_on_upsert", if (idxFresh) 1L else 0L),
        ("orphan_column_dropped", if (orphanDropped) 1L else 0L),
        ("filter_new_value", cnt("city", "munich")),
        ("filter_old_value", cnt("city", "berlin")),
        ("filter_orphaned_key_json_path", cnt("tag", "z")))
        .toDF("check_name", "cnt")
    }),
    // HasVector over a sparsely-populated named vector column
    "has_vector_count" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("vec_alt",
          when(col("vec_id") % 3 === 0, col("embedding")))
      val f = Filter(must = Seq(HasVector("vec_alt")))
      Reads.count(e, Some(f), new TypedResolver(e.schema, "vec_id"))
    }),
    // Datetime range with epoch-nano numeric bounds — coerced to the ts
    // column's actual type (timestamp[us] today, nanos-long historically)
    // by Temporal.boundLit, so the same query survives schema drift
    "range_datetime_count" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val nanos = (d: String) => java.time.Instant.parse(d).getEpochSecond * 1000000000L
      val f = Filter.mustAll(RangeCond("ts",
        gte = Some(nanos("2024-01-10T00:00:00Z")),
        lt = Some(nanos("2024-01-20T00:00:00Z"))))
      Reads.count(ev, Some(f), new TypedResolver(ev.schema, "event_id"))
    }),
    // Same range surface with the reference's wire format: RFC3339 string
    // bounds at μs precision, exercising all three accepted lenient forms —
    // offset, 'T'-less space form, bare date (ref types.rs:65,78)
    "range_datetime_rfc3339" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val f = Filter.mustAll(
        RangeCond("ts", gte = Some("2024-01-10T06:30:00Z")),
        RangeCond("ts", gt = Some("2024-01-09T22:00:00-04:00")), // = 10th 02:00Z, subsumed
        RangeCond("ts", lt = Some("2024-01-20 18:45:30.250")),
        RangeCond("ts", lte = Some("2024-02-01")),
        // chrono `%#z` lenient offsets (`types.rs:124-125`): no-colon
        // `+0200` (with lowercase 't', RFC3339 case-insensitive) and
        // minute-less `+02`
        RangeCond("ts", gt = Some("2024-01-09t20:00:00+0200")), // = 9th 18:00Z, subsumed
        RangeCond("ts", lte = Some("2024-02-01T00:00+02"))) // = Jan 31 22:00Z, tightens
      Reads.count(ev, Some(f), new TypedResolver(ev.schema, "event_id"))
    }),
    "count_filtered" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val f = Filter(
        must = Seq(
          RangeCond("l_quantity", gte = Some(5.0), lt = Some(30.0)),
          MatchAny("l_returnflag", Seq("A", "N"))),
        mustNot = Seq(MatchValue("l_linestatus", "F")))
      Reads.count(li, Some(f), new TypedResolver(li.schema, "l_orderkey"))
    }),
    "facet_lang" -> ((s, dir) => {
      val d = docs(s, dir)
      Reads.facet(d, "doc_id", "lang", None, new TypedResolver(d.schema, "doc_id"), limit = 10)
    }),
    "facet_source_filtered" -> ((s, dir) => {
      val d = docs(s, dir)
      val f = Filter(must = Seq(RangeCond("n_chars", gte = Some(150L), lte = Some(400L))))
      Reads.facet(d, "doc_id", "source", Some(f),
        new TypedResolver(d.schema, "doc_id"), limit = 5)
    }),
    // Facet over an INTEGER multi-valued field (`FacetValue::Int`,
    // `lib/segment/src/data_types/facets.rs:87`): each point contributes
    // each distinct value once (count_distinct on id after explode)
    "facet_int_multi" -> ((s, dir) => {
      val d = docsArr(s, dir)
      Reads.facet(d, "doc_id", "marks", None,
        new TypedResolver(d.schema, "doc_id"), limit = 10)
    }),
    // Facet over a BOOL field (`FacetValue::Bool`) with a filter
    "facet_bool" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("is_long", col("n_chars") > 250)
      val f = Filter.mustAll(MatchAny("lang", Seq("en", "fr", "de")))
      Reads.facet(d, "doc_id", "is_long", Some(f),
        new TypedResolver(d.schema, "doc_id"), limit = 10)
    }),
    "scroll_by_id" -> ((s, dir) => {
      val d = docs(s, dir)
      val f = Filter(must = Seq(MatchValue("lang", "en"), RangeCond("n_chars", lt = Some(300L))))
      Reads.scrollById(d, "doc_id", Some(f), new TypedResolver(d.schema, "doc_id"),
        offsetId = Some(100L), limit = 20,
        projection = Seq("doc_id", "lang", "n_chars"))
    }),
    // Random-order scroll derived contract (like sample_random): page has
    // exactly n rows, all satisfy the filter, no duplicates, identical
    // across two independent plans (seeded determinism), and the order is
    // NOT plain id order (the point of ScrollOrder::Random)
    "scroll_random" -> ((s, dir) => {
      val d = docs(s, dir)
      val f = Filter(must = Seq(MatchValue("lang", "en")))
      val r = new TypedResolver(d.schema, "doc_id")
      def page() = Reads.scrollRandom(d, "doc_id", Some(f), r,
        seed = 7L, limit = 25, projection = Seq("doc_id"))
      val a = page().collect().map(_.getLong(0)).toSeq
      val b = page().collect().map(_.getLong(0)).toSeq
      val en = d.filter(col("lang") === "en")
      val inFiltered = en.filter(col("doc_id").isin(a: _*)).count()
      val idOrder = en.orderBy(col("doc_id").asc).limit(25)
        .collect().map(_.getLong(0)).toSeq
      import s.implicits._
      Seq((a.length, inFiltered == a.length, a.distinct.length == a.length,
          a == b, a != idOrder))
        .toDF("n", "subset_ok", "distinct_ok", "deterministic_ok", "shuffled_ok")
    }),
    // Full page-walk through the API-level cursor (`next_page_offset`,
    // `lib/collection/src/collection/point_ops.rs:390-425`): follow the
    // returned cursor until exhaustion; the concatenated pages must equal
    // the direct ordered scan — every matching point exactly once, ids
    // strictly increasing, page count as the (limit+1)-fetch contract
    // predicts. Driver-side loop bounded by n_matching/limit pages.
    "scroll_next_page" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val f = Filter(must = Seq(MatchValue("lang", "en")))
      val r = new TypedResolver(d.schema, "doc_id")
      val limit = 200
      var offset: Option[Any] = None
      var pages = 0L
      var ids = Vector.empty[Long]
      var done = false
      while (!done) {
        val (rows, next) =
          Reads.scrollPage(d, "doc_id", Some(f), r, offset, limit, Seq("doc_id"))
        ids ++= rows.map(_.getLong(0)); pages += 1
        next match { case Some(o) => offset = Some(o); case None => done = true }
      }
      val direct = d.filter(col("lang") === "en").select("doc_id")
        .orderBy(col("doc_id").asc).collect().map(_.getLong(0)).toVector
      val expectedPages = math.max(1L, (direct.length + limit - 1L) / limit)
      Seq((ids.length.toLong, ids == direct,
          ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
          pages == expectedPages))
        .toDF("n_total", "match_direct", "strictly_increasing", "pages_ok")
    }),
    "order_by_ts" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val f = Filter(must = Seq(MatchValue("event_type", "click")))
      Reads.scrollByField(ev, "event_id", "ts", asc = false, Some(f),
        new TypedResolver(ev.schema, "event_id"), startFrom = None, limit = 50,
        projection = Seq("event_id", "user_id", "value"))
    }),
    // order-by scroll continuation: start_from cursor is inclusive in the
    // scan direction (asc → >=), id tiebreak (ref order_by.rs:16-170)
    "order_by_start_from" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val cursor = java.time.Instant.parse("2024-01-15T00:00:00Z")
        .getEpochSecond * 1000000000L
      Reads.scrollByField(ev, "event_id", "ts", asc = true, None,
        new TypedResolver(ev.schema, "event_id"), startFrom = Some(cursor),
        limit = 50, projection = Seq("event_id", "user_id", "event_type"))
    }),
    // payload include/exclude selectors on retrieve (the with_payload
    // selector surface, types.rs:4300-4380): include keeps only listed
    // (possibly nested) keys, exclude drops them; dropped keys read back
    // NULL. The selector runs codegen'd over the JSON payload column.
    "retrieve_selectors" -> ((s, dir) => {
      import graft.filters.PayloadSelect
      val d = docs(s, dir).select(col("doc_id"),
        to_json(struct(col("lang"), col("source"),
          struct(col("n_chars"), substring(col("text"), 1, 8).as("head"))
            .as("meta"))).as("payload"))
      Reads.retrieve(d, "doc_id", Seq(3L, 5L, 8L, 13L, 21L),
          Seq("doc_id", "payload"))
        .withColumn("inc",
          PayloadSelect.includeCol(col("payload"), Seq("lang", "meta.n_chars")))
        .withColumn("exc",
          PayloadSelect.excludeCol(col("payload"), Seq("source", "meta.head")))
        .select(col("doc_id"),
          get_json_object(col("inc"), "$.lang").as("lang_inc"),
          get_json_object(col("inc"), "$.meta.n_chars").cast("long").as("nch_inc"),
          get_json_object(col("inc"), "$.source").as("src_inc"),
          get_json_object(col("inc"), "$.meta.head").as("head_inc"),
          get_json_object(col("exc"), "$.lang").as("lang_exc"),
          get_json_object(col("exc"), "$.source").as("src_exc"),
          get_json_object(col("exc"), "$.meta.n_chars").cast("long").as("nch_exc"),
          get_json_object(col("exc"), "$.meta.head").as("head_exc"))
        .orderBy(col("doc_id"))
    }),
    "min_should_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      // at-least-2-of: lang in (en,de) / n_chars>=200 / source prefix 'src1'
      val f = Filter(
        minShould = Some(MinShould(Seq(
          MatchAny("lang", Seq("en", "de")),
          RangeCond("n_chars", gte = Some(200L)),
          MatchPrefix("source", "src1")), 2)))
      Reads.scrollById(d, "doc_id", Some(f), new TypedResolver(d.schema, "doc_id"),
        offsetId = None, limit = 100,
        projection = Seq("doc_id", "lang", "source", "n_chars"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "filter_except_count" ->
      // ∃ tag ∉ set over tags = [lang, source]
      """SELECT count(*)::BIGINT AS cnt FROM documents
        |WHERE lang NOT IN ('en','src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
        |   OR source NOT IN ('en','src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')""".stripMargin,
    "filter_values_count" ->
      """SELECT count(*)::BIGINT AS cnt FROM documents
        |WHERE (n_chars % 4) >= 2 AND (n_chars % 4) <= 3""".stripMargin,
    "filter_nested_structs" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE (lang = 'en' AND n_chars > 200)
        |   OR (source = 'en' AND n_chars * 2 > 200)
        |ORDER BY doc_id ASC LIMIT 50""".stripMargin,
    // (value, id) pairs of [i, 7-i] per point, sorted by (value asc, id asc)
    "scroll_orderby_multivalue" ->
      """SELECT * FROM (VALUES
        |  (1, 1::BIGINT, true), (2, 6::BIGINT, true), (3, 2::BIGINT, true),
        |  (4, 5::BIGINT, true), (5, 3::BIGINT, true), (6, 4::BIGINT, true),
        |  (7, 3::BIGINT, true), (8, 4::BIGINT, true), (9, 2::BIGINT, true),
        |  (10, 5::BIGINT, true), (11, 1::BIGINT, true), (12, 6::BIGINT, true))
        |AS t(pos, id, offset_rejected)""".stripMargin,
    // expected counts from the reference's own assertions
    // (`test_nesting_nested_payload_query.py:155,187,219,249,288,343`)
    "filter_nested_double" ->
      """SELECT * FROM (VALUES
        |  ('flat_path_hit', 2::BIGINT), ('flat_path_miss', 0::BIGINT),
        |  ('flat_path_b', 1::BIGINT), ('array_key_miss', 0::BIGINT),
        |  ('double_nested', 2::BIGINT), ('double_nested_conj', 1::BIGINT),
        |  ('array_key_conj', 1::BIGINT)) AS t(check_name, cnt)""".stripMargin,
    // the reference test's own assertions
    // (`test_nested_payload_indexing.py:297,321,343,365,389,412,434`)
    "api_nested_field_index" ->
      """SELECT * FROM (VALUES
        |  ('capital_match_identity', 1::BIGINT),
        |  ('name_unindexed', 1::BIGINT),
        |  ('array_no_wildcard', 0::BIGINT),
        |  ('array_wildcard_range', 1::BIGINT),
        |  ('sightseeing_value', 1::BIGINT),
        |  ('indexed_array_pos', 1::BIGINT),
        |  ('scalar_array_pos', 1::BIGINT),
        |  ('cols', 1::BIGINT),
        |  ('cols_after_drop', 1::BIGINT)) AS t(check_name, cnt)"""
        .stripMargin,
    // contract arms (see the entry): persistence flags are 1 by design;
    // the filter counts recompute from the 3-row fixture after the
    // id-1 upsert (munich replaces berlin on id 1 → one berlin left)
    "api_field_index_persistence" ->
      """SELECT * FROM (VALUES
        |  ('schema_persisted_after_reopen', 1::BIGINT),
        |  ('unpersisted_key_undeclared', 1::BIGINT),
        |  ('idx_recomputed_on_upsert', 1::BIGINT),
        |  ('orphan_column_dropped', 1::BIGINT),
        |  ('filter_new_value', 1::BIGINT),
        |  ('filter_old_value', 1::BIGINT),
        |  ('filter_orphaned_key_json_path', 1::BIGINT))
        |AS t(check_name, cnt)""".stripMargin,
    // hand-derived from the 2-point triple-nesting fixture (see the entry):
    // p1 arr3 leaves (1,1),(2,3); p2 leaves (2,2) | (1,3),(4,1)
    "filter_nested_triple" ->
      """SELECT * FROM (VALUES
        |  ('triple_hit', 2::BIGINT),
        |  ('triple_conj_same_elem', 1::BIGINT),
        |  ('triple_conj_cross_elem_miss', 0::BIGINT),
        |  ('nested_flat_path', 1::BIGINT),
        |  ('flat_wildcard_range', 1::BIGINT)) AS t(check_name, cnt)"""
        .stripMargin,
    "has_vector_count" ->
      """SELECT count(*)::BIGINT AS cnt FROM embeddings WHERE vec_id % 3 = 0""",
    "range_datetime_count" ->
      """SELECT count(*)::BIGINT AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "range_datetime_rfc3339" ->
      """SELECT count(*)::BIGINT AS cnt FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 06:30:00'
        |  AND ts >  TIMESTAMP '2024-01-10 02:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 18:45:30.250'
        |  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
        |  AND ts >  TIMESTAMP '2024-01-09 18:00:00'
        |  AND ts <= TIMESTAMP '2024-01-31 22:00:00'""".stripMargin,
    "count_filtered" ->
      """SELECT count(*)::BIGINT AS cnt FROM lineitem
        |WHERE l_quantity >= 5.0 AND l_quantity < 30.0
        |  AND l_returnflag IN ('A','N') AND NOT l_linestatus = 'F'""".stripMargin,
    "facet_lang" ->
      """SELECT lang AS value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM documents GROUP BY lang
        |ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
    "facet_source_filtered" ->
      """SELECT source AS value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM documents WHERE n_chars >= 150 AND n_chars <= 400
        |GROUP BY source ORDER BY cnt DESC, value ASC LIMIT 5""".stripMargin,
    "facet_int_multi" ->
      """SELECT value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM (SELECT doc_id, unnest(generate_series(1, n_chars % 4)) AS value
        |      FROM documents)
        |GROUP BY value ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
    "facet_bool" ->
      """SELECT (n_chars > 250) AS value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM documents WHERE lang IN ('en','fr','de')
        |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
    "scroll_next_page" ->
      """SELECT (SELECT count(*) FROM documents WHERE lang = 'en')::BIGINT AS n_total,
        |  true AS match_direct, true AS strictly_increasing, true AS pages_ok""".stripMargin,
    "scroll_by_id" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars < 300 AND doc_id >= 100
        |ORDER BY doc_id ASC LIMIT 20""".stripMargin,
    "scroll_random" ->
      """SELECT 25 AS n, true AS subset_ok, true AS distinct_ok,
        |  true AS deterministic_ok, true AS shuffled_ok""".stripMargin,
    "order_by_ts" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click'
        |ORDER BY ts DESC, event_id ASC LIMIT 50""".stripMargin,
    "order_by_start_from" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY ts ASC, event_id ASC LIMIT 50""".stripMargin,
    "retrieve_selectors" ->
      """SELECT doc_id,
        |  lang AS lang_inc, n_chars::BIGINT AS nch_inc,
        |  CAST(NULL AS VARCHAR) AS src_inc, CAST(NULL AS VARCHAR) AS head_inc,
        |  lang AS lang_exc, CAST(NULL AS VARCHAR) AS src_exc,
        |  n_chars::BIGINT AS nch_exc, CAST(NULL AS VARCHAR) AS head_exc
        |FROM documents WHERE doc_id IN (3, 5, 8, 13, 21)
        |ORDER BY doc_id ASC""".stripMargin,
    "min_should_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE (CASE WHEN lang IN ('en','de') THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
        |     + CASE WHEN starts_with(source, 'src1') THEN 1 ELSE 0 END) >= 2
        |ORDER BY doc_id ASC LIMIT 100""".stripMargin,
  )
}
