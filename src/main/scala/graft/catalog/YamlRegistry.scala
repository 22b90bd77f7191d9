package graft.catalog

import scala.collection.immutable.ListMap

/** Runtime YAML dataset registry — restores the reference's
  * config-without-code extension story (README.md:385,
  * settings.py:44-78): `datasets/registry.yaml` names the datasets and
  * each entry's `config_path` points at a per-dataset `config.yaml`
  * carrying schema + validation. Loading happens at RUNTIME from a
  * directory, so registering a new dataset is a YAML edit, not a
  * recompile — the compiled [[Registry]] remains the transcription of
  * the five reference datasets; this loader is how a sixth arrives.
  *
  * Mapping into [[DatasetSpec]]:
  *   - registry entry → key, dataset_id, table_name, enabled,
  *     transformer_class, config_path (resolved against the root dir)
  *   - config `schema.columns` → [[ColumnSpec]] rows in declared
  *     order. `type` accepts BOTH dialects the reference uses: the
  *     abstract config.yaml names (`integer`/`string`/`numeric`/…,
  *     with `max_length` narrowing string to VARCHAR(n)) and explicit
  *     SQL type strings (`NUMERIC(5, 2)`) for datasets that want the
  *     transformer-get_schema level of control. Both compile through
  *     [[SchemaCompiler]] exactly like compiled specs.
  *   - config `validation` → [[ValidationRules]]
  *   - `source_type` comes from the registry entry when present, else
  *     defaults to `socrata` (the reference's dominant fetcher).
  *
  * The transformer indirection (`transformer_class`, loaded by
  * reflection in parser.py:29-46) resolves through
  * [[graft.jobs.Main.transformerFor]]'s name lookup: known class
  * names map to the compiled hook chains; unknown ones fall back to
  * the config-driven generic chain
  * ([[graft.transform.Transformers.generic]]), which is what makes a
  * YAML-only dataset ingestable end-to-end.
  */
object YamlRegistry {

  final case class Entry(
      spec: DatasetSpec,
      enabled: Boolean,
      updateFrequency: String,
      transformerClass: String,
      apiLimit: Option[Long],
      apiTimeout: Option[Long])

  /** Load `<rootDir>/registry.yaml` (or a directly-named registry
    * file) plus every entry's config.yaml. Returns entries in
    * registry order.
    */
  def load(rootDir: String): ListMap[String, Entry] = {
    val root = java.nio.file.Paths.get(rootDir)
    val regPath =
      if (java.nio.file.Files.isDirectory(root)) root.resolve("registry.yaml")
      else root
    val base = regPath.getParent
    val doc = Yaml.parseFile(regPath.toString)
    val datasets = Yaml.map(doc, "datasets").getOrElse(
      throw new IllegalArgumentException(
        s"$regPath: missing top-level 'datasets' mapping"))
    datasets.map { case (key, v) =>
      val entry = v match {
        case m: ListMap[_, _] => m.asInstanceOf[Yaml.YMap]
        case other => throw new IllegalArgumentException(
          s"dataset '$key': registry entry must be a mapping, got " +
            (if (other == null) "null" else other.getClass.getSimpleName))
      }
      val configPath = Yaml.str(entry, "config_path").getOrElse(
        throw new IllegalArgumentException(s"dataset '$key': missing config_path"))
      // settings.py:57 resolves config_path against PROJECT_ROOT (the
      // parent of the datasets/ dir holding registry.yaml); also accept
      // registry-dir-relative paths for self-contained fixture dirs
      val candidates = Seq(base.resolve(configPath),
        Option(base.getParent).map(_.resolve(configPath)).getOrElse(base.resolve(configPath)))
      val resolved = candidates.find(java.nio.file.Files.exists(_)).getOrElse(
        throw new IllegalArgumentException(
          s"dataset '$key': config not found at ${candidates.mkString(" or ")}"))
      val config = Yaml.parseFile(resolved.toString)
      key -> toEntry(key, entry, config)
    }
  }

  private[catalog] def toEntry(key: String, reg: Yaml.YMap,
                               config: Yaml.YMap): Entry = {
    val schema = Yaml.map(config, "schema").getOrElse(
      throw new IllegalArgumentException(s"dataset '$key': config missing 'schema'"))
    val cols = Yaml.map(schema, "columns").getOrElse(
      throw new IllegalArgumentException(s"dataset '$key': schema missing 'columns'"))
    val columns = cols.map { case (name, cv) =>
      val c = cv.asInstanceOf[Yaml.YMap]
      val declared = Yaml.str(c, "type").getOrElse("string")
      val maxLen = Yaml.long(c, "max_length").map(_.toInt)
      ColumnSpec(
        name = name,
        sqlType = sqlTypeOf(declared, maxLen),
        required = Yaml.bool(c, "required").getOrElse(false),
        primaryKey = Yaml.bool(c, "primary_key").getOrElse(false),
        maxLength = maxLen,
        min = Yaml.dbl(c, "min"),
        max = Yaml.dbl(c, "max"),
        default = Yaml.str(c, "default"))
    }.toSeq
    val validation = Yaml.map(config, "validation").map { v =>
      ValidationRules(
        allowDuplicates = Yaml.bool(v, "allow_duplicates").getOrElse(true),
        uniqueKeys = Yaml.strSeq(v, "unique_keys").getOrElse(Nil))
    }.getOrElse(ValidationRules())
    val api = Yaml.map(config, "api").getOrElse(ListMap.empty)
    Entry(
      spec = DatasetSpec(
        key = key,
        datasetId = Yaml.str(reg, "dataset_id").getOrElse(key),
        tableName = Yaml.str(reg, "table_name")
          .orElse(Yaml.str(schema, "table_name"))
          .getOrElse(key),
        sourceType = Yaml.str(reg, "source_type").getOrElse("socrata"),
        columns = columns,
        validation = validation,
        indexes = Yaml.seq(schema, "indexes").getOrElse(Nil).collect {
          case ix: ListMap[_, _] =>
            val m = ix.asInstanceOf[Yaml.YMap]
            (Yaml.str(m, "name").getOrElse(""),
              Yaml.strSeq(m, "columns").getOrElse(Nil))
        }.filter(_._1.nonEmpty),
        partitionColumns = Yaml.strSeq(schema, "partition_columns").getOrElse(Nil)),
      enabled = Yaml.bool(reg, "enabled").getOrElse(true),
      updateFrequency = Yaml.str(reg, "update_frequency").getOrElse("unknown"),
      transformerClass = Yaml.str(reg, "transformer_class").getOrElse(""),
      apiLimit = Yaml.long(api, "limit"),
      apiTimeout = Yaml.long(api, "timeout"))
  }

  /** The abstract config.yaml dialect → SQL type strings; explicit SQL
    * type strings pass through untouched (both land in
    * [[SchemaCompiler.toSparkType]]).
    */
  private[catalog] def sqlTypeOf(declared: String, maxLen: Option[Int]): String =
    declared.trim.toLowerCase match {
      case "string" => maxLen.map(n => s"VARCHAR($n)").getOrElse("TEXT")
      case "integer" => "INTEGER"
      case "numeric" => "NUMERIC"
      case "float" => "FLOAT"
      case "date" => "DATE"
      case "timestamp" => "TIMESTAMP"
      case _ => declared.trim // explicit SQL dialect (VARCHAR(10), NUMERIC(5, 2), GEOMETRY…)
    }
}
