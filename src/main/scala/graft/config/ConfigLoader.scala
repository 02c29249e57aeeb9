package graft.config

import scala.collection.mutable

import graft.model.{MultilineMode, MultilineSpec, PipelineConfig, SinkRule}

/** External configuration for [[graft.model.PipelineConfig]] — the analogue
  * of the reference's viper loading stack (cmd/freader/config.go:55-131):
  *
  *  - a TOML-subset config file (sections, strings, ints, bools, string
  *    arrays, full-line and trailing comments),
  *  - environment overrides with the `GRAFT_` prefix and `.`/`-` → `_`
  *    key mapping (FREADER_ + EnvKeyReplacer parity, config.go:57-59),
  *  - explicit flag overrides (flags override env override file — the
  *    viper binding order),
  *  - the `[collector.multiline]` sub-section with kebab-case keys and the
  *    `java = true` preset filling unset fields (config.go:100-131),
  *  - the validation matrix (config.go:190-237 + multline_reader.go:37-48):
  *    sink type whitelist, batch-size/batch-interval > 0, multiline
  *    mode/start-pattern/condition-pattern/timeout requirements, plus
  *    PipelineConfig.validate for the collector-side checks.
  *
  * Key map (reference key → engine field):
  *   collector.separator / include / exclude → same
  *   collector.salt-buckets / lineage-partitions / checkpoint-dir → same
  *   collector.multiline.{mode,start-pattern,condition-pattern,timeout,java}
  *   collector.dedup.{mode,store-dir,threshold,ngram,bands,rows-per-band}
  *     → PipelineConfig.dedup (engine extension, no reference analogue)
  *   sink.batch-size / sink.batch-interval → validated (lossless-batch
  *     divergence, COVERAGE.md §2.6: values checked, not used)
  *   sink.<name>.{type,include,exclude,reject-where} → SinkRule per section
  */
object ConfigLoader {

  sealed trait Value
  final case class S(v: String) extends Value
  final case class I(v: Long) extends Value
  final case class F(v: Double) extends Value
  final case class B(v: Boolean) extends Value
  final case class A(v: Seq[String]) extends Value

  /** Known scalar keys and their env-override names; sink.<name>.* keys are
    * dynamic and file/flag-only (the reference configures sink backends via
    * file or FREADER_SINK__* double-underscore forms; single-level env
    * parity covers the fixed surface).
    */
  private val knownKeys: Seq[String] = Seq(
    "collector.separator", "collector.include", "collector.exclude",
    "collector.salt-buckets", "collector.lineage-partitions",
    "collector.checkpoint-dir", "collector.poll-interval",
    "collector.workers", "collector.fingerprint-strategy",
    "collector.fingerprint-size",
    "collector.multiline.mode", "collector.multiline.start-pattern",
    "collector.multiline.condition-pattern", "collector.multiline.timeout",
    "collector.multiline.java",
    "collector.dedup.mode", "collector.dedup.store-dir",
    "collector.dedup.threshold", "collector.dedup.ngram",
    "collector.dedup.bands", "collector.dedup.rows-per-band",
    "collector.dedup.retract-on-invalidate",
    "collector.sketch.cms-depth", "collector.sketch.cms-width",
    "collector.sketch.hll-p", "collector.sketch.expected-distinct",
    "collector.curation.quantile-rate", "collector.curation.outlier-k",
    "collector.curation.winnow-k", "collector.curation.winnow-w",
    "collector.curation.cdc-window", "collector.curation.cdc-divisor",
    "collector.curation.bm25-k1", "collector.curation.bm25-b",
    "collector.curation.conv-bucket-width",
    "collector.curation.span-k", "collector.curation.mix-budget-permille",
    "collector.curation.lm-alpha", "collector.curation.dsir-buckets",
    "collector.curation.dsir-alpha", "collector.curation.pmi-min-count",
    "collector.curation.zipf-k",
    "sink.batch-size", "sink.batch-interval", "sink.retries",
    "prometheus.enable", "prometheus.addr")

  def envName(key: String): String =
    "GRAFT_" + key.toUpperCase.replace('.', '_').replace('-', '_')

  private val arrayKeys = Set("collector.include", "collector.exclude")
  private val boolKeys = Set("collector.multiline.java", "prometheus.enable",
    "collector.dedup.retract-on-invalidate")
  private val intKeys = Set("collector.salt-buckets",
    "collector.lineage-partitions", "sink.batch-size", "sink.retries",
    "collector.workers", "collector.fingerprint-size",
    "collector.dedup.ngram", "collector.dedup.bands",
    "collector.dedup.rows-per-band",
    "collector.sketch.cms-depth", "collector.sketch.cms-width",
    "collector.sketch.hll-p", "collector.sketch.expected-distinct",
    "collector.curation.outlier-k", "collector.curation.winnow-k",
    "collector.curation.winnow-w", "collector.curation.cdc-window",
    "collector.curation.cdc-divisor", "collector.curation.conv-bucket-width",
    "collector.curation.span-k", "collector.curation.mix-budget-permille",
    "collector.curation.dsir-buckets", "collector.curation.pmi-min-count",
    "collector.curation.zipf-k")

  val sinkKinds: Set[String] =
    Set("console", "file", "clickhouse", "opensearch", "parquet")

  private val modes: Map[String, MultilineMode] = Map(
    "continuePast" -> MultilineMode.ContinuePast,
    "continueThrough" -> MultilineMode.ContinueThrough,
    "haltBefore" -> MultilineMode.HaltBefore,
    "haltWith" -> MultilineMode.HaltWith)

  // ------------------------------------------------------------------ load

  /** Load with viper's precedence: defaults < file < env < flags. Flag keys
    * are the reference's flag names (`include`, `exclude`, `separator`, …)
    * or full dotted keys; values are raw strings (arrays comma-split, like
    * pflag StringSlice).
    */
  def load(
      file: Option[String] = None,
      env: Map[String, String] = sys.env,
      flags: Map[String, String] = Map.empty): Either[String, PipelineConfig] = {
    for {
      fileKv <- file match {
        case None => Right(Seq.empty[(String, Value)])
        case Some(f) =>
          val p = java.nio.file.Paths.get(f)
          if (!java.nio.file.Files.isReadable(p))
            Left(s"failed to read config file: $f")
          else parseToml(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      }
      envKv <- coerceAll(knownKeys.flatMap(k => env.get(envName(k)).map(k -> _)))
      flagKv <- coerceAll(flags.toSeq.map { case (k, v) => flagKey(k) -> v })
      cfg <- build(fileKv ++ envKv ++ flagKv)
      validated <- cfg.validate()
    } yield validated
  }

  /** Reference top-level flags bind to nested collector keys
    * (config.go:80-83,158-170); dotted keys pass through.
    */
  private def flagKey(k: String): String =
    if (k.contains(".")) k
    else k match {
      case "include" | "exclude" | "separator" => s"collector.$k"
      case other => s"collector.$other"
    }

  private def coerceAll(kvs: Seq[(String, String)]): Either[String, Seq[(String, Value)]] = {
    val out = mutable.ArrayBuffer.empty[(String, Value)]
    for ((k, raw) <- kvs) coerce(k, raw) match {
      case Left(e) => return Left(e)
      case Right(v) => out += k -> v
    }
    Right(out.toSeq)
  }

  private def coerce(k: String, raw: String): Either[String, Value] =
    if (arrayKeys(k) || k.endsWith(".include") || k.endsWith(".exclude") ||
      k.endsWith(".reject-where"))
      Right(A(raw.split(",").toSeq.map(_.trim).filter(_.nonEmpty)))
    else if (boolKeys(k)) raw.trim.toLowerCase match {
      case "true" | "1" => Right(B(true))
      case "false" | "0" => Right(B(false))
      case other => Left(s"$k: invalid bool '$other'")
    }
    else if (intKeys(k)) raw.trim.toLongOption.map(I(_))
      .toRight(s"$k: invalid integer '$raw'")
    else Right(S(raw))

  // ------------------------------------------------------------------ build

  private final class Lookup(kvs: Seq[(String, Value)]) {
    val map: Map[String, Value] = kvs.toMap // later wins (Seq order = precedence)
    def str(k: String, dflt: String): Either[String, String] = map.get(k) match {
      case None => Right(dflt)
      case Some(S(v)) => Right(v)
      case Some(I(v)) => Right(v.toString)
      case Some(other) => Left(s"$k: expected string, got $other")
    }
    def arr(k: String): Either[String, Seq[String]] = map.get(k) match {
      case None => Right(Nil)
      case Some(A(v)) => Right(v)
      case Some(S(v)) => Right(Seq(v))
      case Some(other) => Left(s"$k: expected array, got $other")
    }
    def int(k: String, dflt: Int): Either[String, Int] = map.get(k) match {
      case None => Right(dflt)
      case Some(I(v)) =>
        // no silent Long→Int wrap: 2^32+1 must not become 1 (a 1-byte
        // fingerprint prefix would alias distinct files as unchanged)
        if (v < Int.MinValue || v > Int.MaxValue)
          Left(s"$k: $v out of 32-bit integer range")
        else Right(v.toInt)
      case Some(other) => Left(s"$k: expected integer, got $other")
    }
    // full 64-bit range — expected-distinct at corpus scale exceeds 2^31
    def long(k: String, dflt: Long): Either[String, Long] = map.get(k) match {
      case None => Right(dflt)
      case Some(I(v)) => Right(v)
      case Some(other) => Left(s"$k: expected integer, got $other")
    }
    def bool(k: String, dflt: Boolean): Either[String, Boolean] = map.get(k) match {
      case None => Right(dflt)
      case Some(B(v)) => Right(v)
      case Some(other) => Left(s"$k: expected bool, got $other")
    }
    def dbl(k: String, dflt: Double): Either[String, Double] = map.get(k) match {
      case None => Right(dflt)
      case Some(F(v)) => Right(v)
      case Some(I(v)) => Right(v.toDouble)
      // env/flag overrides arrive as S — parse, rejecting NaN/Inf here so
      // range validators downstream see only ordered numbers
      case Some(S(v)) => v.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
        .toRight(s"$k: invalid number '$v'")
      case Some(other) => Left(s"$k: expected number, got $other")
    }
  }

  private def build(kvs: Seq[(String, Value)]): Either[String, PipelineConfig] = {
    val lk = new Lookup(kvs)
    for {
      separator <- lk.str("collector.separator", "\n")
      include <- lk.arr("collector.include")
      exclude <- lk.arr("collector.exclude")
      saltBuckets <- lk.int("collector.salt-buckets", 16)
      lineageParts <- lk.int("collector.lineage-partitions", 32)
      checkpointDir <- lk.str("collector.checkpoint-dir", "")
      fpStrategy <- lk.str("collector.fingerprint-strategy", "checksum")
      fpSize <- lk.int("collector.fingerprint-size", 64 * 1024)
      _ <- schedulerChecks(lk)
      promAddr <- prometheusChecks(lk)
      batch <- batchChecks(lk)
      ml <- multiline(lk)
      dd <- dedupStage(lk)
      sk <- sketchSpec(lk)
      cu <- curationSpec(lk)
      sinks <- sinkRules(kvs, lk)
      labels <- Right(kvs.collect {
        case (k, S(v)) if k.startsWith("sink.labels.") =>
          k.stripPrefix("sink.labels.") -> v
      }.toMap)
    } yield PipelineConfig(
      separator = separator,
      multiline = ml.map(_._1),
      sinks = sinks,
      saltBuckets = saltBuckets,
      lineagePartitions = lineageParts,
      checkpointDir = if (checkpointDir.isEmpty) None else Some(checkpointDir),
      include = include,
      exclude = exclude,
      multilineTimeoutMs = ml.map(_._2),
      fingerprintStrategy = fpStrategy,
      fingerprintSize = fpSize,
      labels = labels,
      dedup = dd,
      sketch = sk,
      curation = cu,
      prometheusAddr = promAddr,
      batchSize = batch._1,
      batchIntervalMs = batch._2,
      batchRetries = batch._3)
  }

  /** The `[collector.dedup]` sub-section — an engine-side extension (no
    * reference analogue: freader re-delivers duplicate content by design;
    * a training-data pipeline must not). Section present at all ⇒ mode and
    * store-dir are required; the spec re-validates via
    * [[graft.model.DedupStageSpec.validate]] (mode whitelist, threshold
    * range) from PipelineConfig.validate.
    */
  private def dedupStage(lk: Lookup): Either[String, Option[graft.model.DedupStageSpec]] = {
    val present = lk.map.keys.exists(_.startsWith("collector.dedup."))
    if (!present) return Right(None)
    for {
      mode <- lk.str("collector.dedup.mode", "")
      dir <- lk.str("collector.dedup.store-dir", "")
      thr <- lk.dbl("collector.dedup.threshold", 0.8)
      ngram <- lk.int("collector.dedup.ngram", 3)
      bands <- lk.int("collector.dedup.bands", 4)
      rpb <- lk.int("collector.dedup.rows-per-band", 2)
      retract <- lk.bool("collector.dedup.retract-on-invalidate", dflt = true)
    } yield Some(graft.model.DedupStageSpec(mode, dir, thr, ngram, bands, rpb,
      retractOnInvalidate = retract))
  }

  /** The `[collector.sketch]` sub-section — sizing for the CMS/HLL sketch
    * operators (engine extension, no reference analogue). Saturation and
    * range checks live in [[graft.model.SketchSpec.validate]], reached via
    * PipelineConfig.validate; this just unmarshals.
    */
  private def sketchSpec(lk: Lookup): Either[String, Option[graft.model.SketchSpec]] = {
    val present = lk.map.keys.exists(_.startsWith("collector.sketch."))
    if (!present) return Right(None)
    for {
      d <- lk.int("collector.sketch.cms-depth", 4)
      w <- lk.int("collector.sketch.cms-width", 1024)
      p <- lk.int("collector.sketch.hll-p", 8)
      n <- lk.long("collector.sketch.expected-distinct", -1L)
    } yield Some(graft.model.SketchSpec(d, w, p, if (n < 0) None else Some(n)))
  }

  /** The `[collector.curation]` sub-section — parameters for the
    * curation-analytics operators (engine extension, no reference
    * analogue). Range rules live in [[graft.model.CurationSpec.validate]],
    * reached via PipelineConfig.validate; this just unmarshals.
    */
  private def curationSpec(lk: Lookup): Either[String, Option[graft.model.CurationSpec]] = {
    val present = lk.map.keys.exists(_.startsWith("collector.curation."))
    if (!present) return Right(None)
    for {
      qr <- lk.dbl("collector.curation.quantile-rate", 0.25)
      ok <- lk.int("collector.curation.outlier-k", 3)
      wk <- lk.int("collector.curation.winnow-k", 4)
      ww <- lk.int("collector.curation.winnow-w", 4)
      cw <- lk.int("collector.curation.cdc-window", 3)
      cd <- lk.long("collector.curation.cdc-divisor", 4L)
      k1 <- lk.dbl("collector.curation.bm25-k1", 1.2)
      b <- lk.dbl("collector.curation.bm25-b", 0.75)
      bw <- lk.int("collector.curation.conv-bucket-width", 4096)
      sk <- lk.int("collector.curation.span-k", 8)
      mb <- lk.int("collector.curation.mix-budget-permille", 500)
      la <- lk.dbl("collector.curation.lm-alpha", 0.1)
      db <- lk.int("collector.curation.dsir-buckets", 8192)
      da <- lk.dbl("collector.curation.dsir-alpha", 0.5)
      pm <- lk.long("collector.curation.pmi-min-count", 5L)
      zk <- lk.int("collector.curation.zipf-k", 100)
    } yield Some(graft.model.CurationSpec(qr, ok, wk, ww, cw, cd, k1, b, bw,
      sk, mb, la, db, da, pm, zk))
  }

  /** poll-interval > 0 and workers >= 1 when set — validated for parity;
    * the batch engine's scheduler (snapshot poll cadence, task parallelism)
    * absorbs both values.
    */
  private def schedulerChecks(lk: Lookup): Either[String, Unit] = for {
    pi <- lk.str("collector.poll-interval", "2s")
    ms <- parseDuration(pi).left.map(e => s"collector.poll-interval: $e")
    _ <- if (ms > 0) Right(()) else Left("collector.poll-interval must be > 0")
    w <- lk.int("collector.workers", 1)
    _ <- if (w >= 1) Right(()) else Left("collector.workers must be >= 1")
  } yield ()

  /** prometheus.addr must be set when prometheus.enable (config.go:227-229)
    * and must be a listenable host:port — Go's net.Listen rejects a
    * port-less address at startup; validating here surfaces it at config
    * time instead of as a bind failure mid-run. Yields the endpoint
    * address when enabled.
    */
  private def prometheusChecks(lk: Lookup): Either[String, Option[String]] = for {
    en <- lk.bool("prometheus.enable", dflt = false)
    addr <- lk.str("prometheus.addr", "")
    _ <- if (!en) Right(())
      else if (addr.isEmpty)
        Left("prometheus.addr must be set when prometheus.enable is true")
      else {
        // validate exactly what Metrics.serve accepts: a bare host (port
        // defaults to 9090), or host:port with a numeric port; IPv6 hosts
        // must be bracketed or serve would split them at the wrong colon
        val i = addr.lastIndexOf(':')
        if (i < 0) Right(())
        // "[::1]" — bracketed IPv6 with no port: the last ':' is inside the
        // brackets; serve treats the whole token as host, port 9090
        else if (addr.indexOf(']', i) >= 0)
          if (addr.startsWith("[") && addr.endsWith("]")) Right(())
          else Left(s"prometheus.addr: malformed IPv6 literal '$addr'")
        else {
          val host = addr.substring(0, i)
          if (!addr.substring(i + 1).toIntOption.exists(p => p >= 0 && p <= 65535))
            Left(s"prometheus.addr: invalid port in '$addr'")
          else if (host.contains(':') &&
            !(host.startsWith("[") && host.endsWith("]")))
            Left(s"prometheus.addr: IPv6 host must be bracketed, " +
              s"""e.g. "[::1]:2112" (got '$addr')""")
          else Right(())
        }
      }
  } yield if (en) Some(addr) else None

  /** sink.batch-size > 0, sink.batch-interval > 0 when set — the reference
    * validations (config.go:198-204). The values are CONSUMED by the HTTP
    * wire sinks (rows per bulk POST / max flush gap — interval is
    * best-effort, see PipelineConfig.batchIntervalMs); the parquet/file
    * flavors remain lossless-batch (COVERAGE.md §2.6). sink.retries is the
    * engine-side bounded re-POST count for transiently failed wire batches
    * (the reference drops a failed flush; 0 keeps that parity). Yields
    * (size, ms, retries).
    */
  private def batchChecks(lk: Lookup): Either[String, (Int, Long, Int)] = for {
    bs <- lk.int("sink.batch-size", 200)
    bi <- lk.str("sink.batch-interval", "2s")
    rt <- lk.int("sink.retries", 0)
    _ <- if (bs > 0) Right(()) else Left("sink.batch-size must be > 0")
    ms <- parseDuration(bi)
    _ <- if (ms > 0) Right(()) else Left("sink.batch-interval must be > 0")
    _ <- if (rt >= 0) Right(()) else Left("sink.retries must be >= 0")
  } yield (bs, ms, rt)

  /** The multiline sub-unmarshal incl. the Java preset (config.go:100-131)
    * and MultilineReader.Validate strictness (multline_reader.go:37-48:
    * start-pattern, condition-pattern and timeout > 0 are all required).
    * Returns (spec, timeoutMs) when the section is present at all.
    */
  private def multiline(lk: Lookup): Either[String, Option[(MultilineSpec, Long)]] = {
    val present = lk.map.keys.exists(_.startsWith("collector.multiline."))
    if (!present) return Right(None)
    for {
      java <- lk.bool("collector.multiline.java", dflt = false)
      mode0 <- lk.str("collector.multiline.mode", "")
      start0 <- lk.str("collector.multiline.start-pattern", "")
      cond0 <- lk.str("collector.multiline.condition-pattern", "")
      tout0 <- lk.str("collector.multiline.timeout", "")
      mode = if (java && mode0.isEmpty) "continueThrough" else mode0
      start = if (java && start0.isEmpty) "^(ERROR|WARN|INFO|Exception)" else start0
      cond = if (java && cond0.isEmpty) "^(\\s|at\\s|Caused by:)" else cond0
      tout = if (java && tout0.isEmpty) "500ms" else tout0
      m <- modes.get(mode).toRight(s"invalid multiline mode: '$mode'")
      _ <- if (start.nonEmpty) Right(()) else Left("multiline start-pattern is required")
      _ <- if (cond.nonEmpty) Right(()) else Left("multiline condition-pattern is required")
      _ <- compile(start, "start-pattern")
      _ <- compile(cond, "condition-pattern")
      _ <- if (tout.nonEmpty) Right(()) else Left("multiline timeout must be > 0")
      ms <- parseDuration(tout).left.map(e => s"multiline timeout: $e")
      _ <- if (ms > 0) Right(()) else Left("multiline timeout must be > 0")
    } yield Some((MultilineSpec(m, cond, Some(start)), ms))
  }

  private def compile(re: String, what: String): Either[String, Unit] =
    try { java.util.regex.Pattern.compile(re); Right(()) }
    catch { case e: Exception => Left(s"invalid $what regex: ${e.getMessage}") }

  /** `[sink.<name>]` sections, in first-appearance order; no section ⇒ the
    * reference default console sink (config.go DefaultConfig).
    */
  private def sinkRules(kvs: Seq[(String, Value)], lk: Lookup): Either[String, Seq[SinkRule]] = {
    val names = mutable.LinkedHashSet.empty[String]
    val re = ("^sink\\.([^.]+)\\.(type|include|exclude|reject-where|url|" +
      "index|table|database|user|password)$").r
    kvs.foreach {
      case (re(name, _), _) if name != "labels" => names += name
      case _ => ()
    }
    if (names.isEmpty) return Right(Seq(SinkRule("console", kind = "console")))
    val out = mutable.ArrayBuffer.empty[SinkRule]
    for (n <- names) {
      val rule = for {
        kind <- lk.str(s"sink.$n.type", "parquet")
        _ <- if (sinkKinds(kind)) Right(()) else Left(s"invalid sink.type: $kind")
        inc <- lk.arr(s"sink.$n.include")
        exc <- lk.arr(s"sink.$n.exclude")
        rej <- lk.arr(s"sink.$n.reject-where")
        // wire endpoint surface (opensearch.go:26 url/index/user/pass;
        // clickhouse.go:26 addr/database/table/user/pass): the OS index or
        // the CH [db.]table collapse into SinkRule.target
        url <- lk.str(s"sink.$n.url", "")
        index <- lk.str(s"sink.$n.index", "")
        table <- lk.str(s"sink.$n.table", "")
        database <- lk.str(s"sink.$n.database", "")
        user <- lk.str(s"sink.$n.user", "")
        pass <- lk.str(s"sink.$n.password", "")
      } yield {
        val target =
          if (kind == "clickhouse")
            if (table.nonEmpty && database.nonEmpty && !table.contains("."))
              s"$database.$table"
            else table
          else index
        SinkRule(n, inc, exc, rej, kind,
          url = if (url.isEmpty) None else Some(url),
          target = target, user = user, pass = pass)
      }
      rule match {
        case Left(e) => return Left(e)
        case Right(r) => out += r
      }
    }
    Right(out.toSeq)
  }

  // ------------------------------------------------------------------ toml

  /** Minimal TOML subset: `[section]` headers, `key = value` with quoted
    * strings (\\ \" \n \r \t escapes), integers, booleans, arrays of those,
    * comments. Flat dotted keys out, in file order (duplicates: last wins
    * at lookup, preserving viper's override-by-later-source shape).
    */
  def parseToml(text: String): Either[String, Seq[(String, Value)]] = {
    val out = mutable.ArrayBuffer.empty[(String, Value)]
    var section = ""
    for ((raw, i) <- text.linesIterator.zipWithIndex) {
      val line = stripComment(raw).trim
      val ln = i + 1
      if (line.isEmpty) ()
      else if (line.startsWith("[")) {
        if (!line.endsWith("]")) return Left(s"line $ln: unterminated section header")
        section = line.substring(1, line.length - 1).trim
        if (section.isEmpty) return Left(s"line $ln: empty section name")
      } else {
        val eq = line.indexOf('=')
        if (eq <= 0) return Left(s"line $ln: expected key = value")
        val key = line.substring(0, eq).trim
        parseValue(line.substring(eq + 1).trim) match {
          case Left(e) => return Left(s"line $ln: $e")
          case Right(v) =>
            out += (if (section.isEmpty) key else s"$section.$key") -> v
        }
      }
    }
    Right(out.toSeq)
  }

  private def stripComment(line: String): String = {
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && inQ) i += 1
      else if (c == '"') inQ = !inQ
      else if (c == '#' && !inQ) return line.substring(0, i)
      i += 1
    }
    line
  }

  private def parseValue(s: String): Either[String, Value] =
    if (s.startsWith("\"")) parseQuoted(s).flatMap { case (v, rest) =>
      if (rest.trim.isEmpty) Right(S(v)) else Left(s"trailing content after string: '$rest'")
    }
    else if (s.startsWith("[")) {
      if (!s.endsWith("]")) Left("unterminated array")
      else {
        val items = splitItems(s.substring(1, s.length - 1))
        val vals = mutable.ArrayBuffer.empty[String]
        for (it <- items.map(_.trim) if it.nonEmpty) parseValue(it) match {
          case Right(S(v)) => vals += v
          case Right(I(v)) => vals += v.toString
          case Right(F(v)) => vals += v.toString
          case Right(B(v)) => vals += v.toString
          case Right(A(_)) => return Left("nested arrays are not supported")
          case Left(e) => return Left(e)
        }
        Right(A(vals.toSeq))
      }
    }
    else if (s == "true") Right(B(true))
    else if (s == "false") Right(B(false))
    else s.toLongOption.map(I(_): Value)
      // bare floats (e.g. dedup threshold = 0.8) are a typed variant: only
      // keys read via Lookup.dbl accept them, so `separator = 1.5` is a
      // config error ("expected string"), not a silent string "1.5"
      .orElse(s.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
        .map(F(_): Value))
      .toRight(s"unparseable value '$s' (bare strings must be quoted)")

  private def parseQuoted(s: String): Either[String, (String, String)] = {
    val sb = new StringBuilder
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case other => return Left(s"unsupported escape \\$other")
          }
          i += 2
        case '"' => return Right((sb.toString, s.substring(i + 1)))
        case c => sb += c; i += 1
      }
    }
    Left("unterminated string")
  }

  private def splitItems(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && inQ && i + 1 < s.length) { sb += c; sb += s.charAt(i + 1); i += 2 }
      else {
        if (c == '"') inQ = !inQ
        if (c == ',' && !inQ) { out += sb.toString; sb.clear() }
        else sb += c
        i += 1
      }
    }
    out += sb.toString
    out.toSeq
  }

  /** Go-style duration: compound `<float><unit>` terms (ns, us, µs, ms, s,
    * m, h), e.g. "500ms", "1.5s", "1m30s" — time.ParseDuration's grammar
    * for the cases a config uses. Returns milliseconds.
    *
    * DOCUMENTED DIVERGENCE: the engine's clocks are millisecond-grained,
    * so a POSITIVE sub-millisecond duration (legal under
    * time.ParseDuration, e.g. "400us") rounds UP to 1ms instead of
    * truncating to 0 — truncation would turn a valid config into a
    * "must be > 0" validation error.
    */
  def parseDuration(s: String): Either[String, Long] = {
    val t = s.trim
    if (t.isEmpty) return Left("empty duration")
    val re = "(\\d+(?:\\.\\d+)?)(ns|us|µs|ms|s|m|h)".r
    val matches = re.findAllMatchIn(t).toSeq
    if (matches.isEmpty || matches.map(_.matched).mkString != t)
      return Left(s"invalid duration '$s'")
    val unitMs = Map("ns" -> 1e-6, "us" -> 1e-3, "µs" -> 1e-3, "ms" -> 1.0,
      "s" -> 1000.0, "m" -> 60000.0, "h" -> 3600000.0)
    val raw = matches.map(m => m.group(1).toDouble * unitMs(m.group(2))).sum
    Right(if (raw > 0.0) math.max(1L, math.round(raw)) else math.round(raw))
  }
}
