package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader
import graft.model.{MultilineMode, MultilineSpec}

/** Config loading parity with the reference's viper stack
  * (cmd/freader/config.go:55-131 precedence, :190-237 validation;
  * multiline sub-unmarshal + Java preset :100-131;
  * multline_reader.go:37-48 strictness).
  */
class ConfigLoaderSpec extends AnyFunSuite {

  private def loadText(toml: String,
      env: Map[String, String] = Map.empty,
      flags: Map[String, String] = Map.empty) = {
    val f = Files.createTempFile("graft-cfg", ".toml")
    Files.writeString(f, toml)
    ConfigLoader.load(Some(f.toString), env, flags)
  }

  test("full file: collector, multiline, ordered sinks with filters and rejects") {
    val cfg = loadText(
      """# graft pipeline config
        |[collector]
        |separator = "\n"
        |include = ["/data/logs/*.log", "file_1*.txt"]  # trailing comment
        |exclude = ["*.tmp"]
        |salt-buckets = 8
        |lineage-partitions = 12
        |checkpoint-dir = "/tmp/ckpt"
        |
        |[collector.multiline]
        |mode = "haltBefore"
        |start-pattern = "^(CALL|INFO)"
        |condition-pattern = "^(CALL|INFO|ask)"
        |timeout = "1m30s"
        |
        |[sink.all]
        |type = "parquet"
        |
        |[sink.errors]
        |type = "opensearch"
        |include = ["status=err"]
        |reject-where = ["note=\"lvl 4\""]
        |
        |[sink.clean]
        |exclude = ["status=err", "INFO"]
        |""".stripMargin).toOption.get
    assert(cfg.separator == "\n")
    assert(cfg.include == Seq("/data/logs/*.log", "file_1*.txt"))
    assert(cfg.exclude == Seq("*.tmp"))
    assert(cfg.saltBuckets == 8 && cfg.lineagePartitions == 12)
    assert(cfg.checkpointDir.contains("/tmp/ckpt"))
    assert(cfg.multiline.contains(MultilineSpec(
      MultilineMode.HaltBefore, "^(CALL|INFO|ask)", Some("^(CALL|INFO)"))))
    assert(cfg.multilineTimeoutMs.contains(90000L))
    assert(cfg.sinks.map(_.name) == Seq("all", "errors", "clean"))
    assert(cfg.sinks(1).include == Seq("status=err"))
    assert(cfg.sinks(1).rejectWhere == Seq("note=\"lvl 4\""))
    assert(cfg.sinks(1).kind == "opensearch")
    assert(cfg.sinks(2).exclude == Seq("status=err", "INFO"))
    assert(cfg.sinks(2).kind == "parquet")
  }

  test("java preset fills unset multiline fields only (config.go:105-120)") {
    val cfg = loadText(
      """[collector.multiline]
        |java = true
        |""".stripMargin).toOption.get
    assert(cfg.multiline.contains(MultilineSpec.Java))
    assert(cfg.multilineTimeoutMs.contains(MultilineSpec.JavaTimeoutMs))

    // explicit fields win over the preset
    val cfg2 = loadText(
      """[collector.multiline]
        |java = true
        |mode = "haltWith"
        |timeout = "2s"
        |""".stripMargin).toOption.get
    assert(cfg2.multiline.get.mode == MultilineMode.HaltWith)
    assert(cfg2.multiline.get.condPattern == MultilineSpec.Java.condPattern)
    assert(cfg2.multilineTimeoutMs.contains(2000L))
  }

  test("precedence: flags over env over file (viper binding order)") {
    val toml =
      """[collector]
        |separator = "|"
        |salt-buckets = 4
        |include = ["*.log"]
        |""".stripMargin
    val env = Map(
      ConfigLoader.envName("collector.separator") -> ";",
      ConfigLoader.envName("collector.salt-buckets") -> "9")
    val flags = Map("separator" -> "::")
    val cfg = loadText(toml, env, flags).toOption.get
    assert(cfg.separator == "::")   // flag beats env beats file
    assert(cfg.saltBuckets == 9)    // env beats file
    assert(cfg.include == Seq("*.log")) // file survives where not overridden
  }

  test("curation section: parsed, defaulted, and range-validated") {
    val cfg = loadText(
      """[collector.curation]
        |quantile-rate = 0.1
        |outlier-k = 4
        |winnow-k = 5
        |winnow-w = 8
        |cdc-window = 4
        |cdc-divisor = 16
        |bm25-k1 = 1.5
        |bm25-b = 0.5
        |conv-bucket-width = 1024
        |""".stripMargin).toOption.get
    assert(cfg.curation.contains(graft.model.CurationSpec(
      0.1, 4, 5, 8, 4, 16L, 1.5, 0.5, 1024)))

    // partial section fills defaults; absent section stays None
    val part = loadText("[collector.curation]\noutlier-k = 2\n").toOption.get
    assert(part.curation.contains(
      graft.model.CurationSpec(0.25, 2, 4, 4, 3, 4L, 1.2, 0.75, 4096)))
    assert(loadText("[collector]\nseparator = \"\\n\"\n")
      .toOption.get.curation.isEmpty)

    // range checks delegate to CurationSpec.validate
    assert(loadText("[collector.curation]\nquantile-rate = 0.0\n")
      .swap.toOption.get.contains("quantile-rate"))
    assert(loadText("[collector.curation]\nquantile-rate = 1.5\n")
      .swap.toOption.get.contains("quantile-rate"))
    assert(loadText("[collector.curation]\ncdc-divisor = 1\n")
      .swap.toOption.get.contains("cdc-divisor"))
    assert(loadText("[collector.curation]\nbm25-b = 1.25\n")
      .swap.toOption.get.contains("bm25-b"))
    // NaN through an env override is rejected at the lookup layer
    assert(ConfigLoader.load(None,
      Map("GRAFT_COLLECTOR_CURATION_BM25_K1" -> "NaN"), Map.empty)
      .swap.toOption.get.contains("bm25-k1"))
    // env override reaches the typed field
    val env = ConfigLoader.load(None,
      Map("GRAFT_COLLECTOR_CURATION_OUTLIER_K" -> "5"), Map.empty).toOption.get
    assert(env.curation.exists(_.outlierK == 5))
  }

  test("curation section: round-6 operator sizing keys parse and validate") {
    val cfg = loadText(
      """[collector.curation]
        |span-k = 16
        |mix-budget-permille = 250
        |lm-alpha = 0.5
        |dsir-buckets = 65536
        |dsir-alpha = 1.0
        |pmi-min-count = 10
        |zipf-k = 200
        |""".stripMargin).toOption.get
    val cu = cfg.curation.get
    assert(cu.spanK == 16 && cu.mixBudgetPermille == 250 &&
      cu.lmAlpha == 0.5 && cu.dsirBuckets == 65536 && cu.dsirAlpha == 1.0 &&
      cu.pmiMinCount == 10L && cu.zipfK == 200)
    // defaults when keys absent but section present
    val part = loadText("[collector.curation]\nspan-k = 4\n").toOption.get
    val pu = part.curation.get
    assert(pu.spanK == 4 && pu.mixBudgetPermille == 500 &&
      pu.dsirBuckets == 8192 && pu.pmiMinCount == 5L && pu.zipfK == 100)
    // range rules: 1-token spans, out-of-range budget, degenerate buckets
    assert(loadText("[collector.curation]\nspan-k = 1\n")
      .swap.toOption.get.contains("span-k"))
    assert(loadText("[collector.curation]\nmix-budget-permille = 1001\n")
      .swap.toOption.get.contains("mix-budget-permille"))
    assert(loadText("[collector.curation]\ndsir-buckets = 8\n")
      .swap.toOption.get.contains("dsir-buckets"))
    assert(loadText("[collector.curation]\nlm-alpha = 0.0\n")
      .swap.toOption.get.contains("lm-alpha"))
    assert(loadText("[collector.curation]\nzipf-k = 1\n")
      .swap.toOption.get.contains("zipf-k"))
    // NaN alpha fails the > 0 check (the DedupStageSpec precedent)
    assert(ConfigLoader.load(None,
      Map("GRAFT_COLLECTOR_CURATION_DSIR_ALPHA" -> "NaN"), Map.empty)
      .swap.toOption.get.contains("dsir-alpha"))
  }

  test("sketch section: parsed, defaulted, and saturation-validated") {
    val cfg = loadText(
      """[collector.sketch]
        |cms-depth = 6
        |cms-width = 4096
        |hll-p = 10
        |expected-distinct = 200000
        |""".stripMargin).toOption.get
    assert(cfg.sketch.contains(graft.model.SketchSpec(6, 4096, 10, Some(200000L))))

    // partial section fills defaults; absent section stays None
    val part = loadText("[collector.sketch]\nhll-p = 12\n").toOption.get
    assert(part.sketch.contains(graft.model.SketchSpec(4, 1024, 12, None)))
    assert(loadText("[collector]\nseparator = \"\\n\"\n").toOption.get.sketch.isEmpty)

    // the sizing rule: a 1024-wide CMS cannot answer a 10^9-distinct
    // vocabulary (the 100 TB saturation trap, rejected at config time)
    val sat = loadText(
      """[collector.sketch]
        |expected-distinct = 1000000000
        |""".stripMargin)
    assert(sat.swap.toOption.get.contains("saturates"))
    // range checks delegate to SketchSpec.validate
    assert(loadText("[collector.sketch]\nhll-p = 5\n")
      .swap.toOption.get.contains("hll-p"))
    assert(loadText("[collector.sketch]\ncms-depth = 0\n")
      .swap.toOption.get.contains("cms-depth"))
    // expected-distinct is 64-bit (corpus scale exceeds 2^31)
    val big = loadText(
      """[collector.sketch]
        |cms-width = 268435456
        |expected-distinct = 8589934592
        |""".stripMargin).toOption.get
    assert(big.sketch.get.expectedDistinct.contains(8589934592L))
  }

  test("sink.retries: parsed into batchRetries, negatives rejected") {
    val cfg = loadText("[sink]\nretries = 2\n").toOption.get
    assert(cfg.batchRetries == 2)
    assert(loadText("").toOption.get.batchRetries == 0) // reference parity
    assert(loadText("[sink]\nretries = -1\n")
      .swap.toOption.get.contains("sink.retries"))
  }

  test("clickhouse wire target must be a [db.]table identifier (SQL-injection guard)") {
    def ch(target: String) = loadText(
      s"""[sink.ch]
         |type = "clickhouse"
         |url = "http://127.0.0.1:8123"
         |table = "$target"
         |""".stripMargin)
    assert(ch("logs.freader_logs").isRight)
    assert(ch("freader_logs").isRight)
    val bad = ch("logs FORMAT TSV; DROP TABLE x")
    assert(bad.swap.toOption.get.contains("identifier"))
  }

  test("validation matrix (config.go:190-237 + multline_reader.go:37-48)") {
    val cases: Seq[(String, String)] = Seq(
      ("""[sink.x]
         |type = "kafka"
         |""".stripMargin) -> "invalid sink.type",
      ("""[sink.x]
         |type = "console"
         |
         |[sink]
         |batch-size = 0
         |""".stripMargin) -> "batch-size must be > 0",
      ("""[sink]
         |batch-interval = "0s"
         |""".stripMargin) -> "batch-interval must be > 0",
      ("""[collector.multiline]
         |mode = "sideways"
         |start-pattern = "^A"
         |condition-pattern = "^B"
         |timeout = "1s"
         |""".stripMargin) -> "invalid multiline mode",
      ("""[collector.multiline]
         |mode = "haltWith"
         |condition-pattern = "^B"
         |timeout = "1s"
         |""".stripMargin) -> "start-pattern is required",
      ("""[collector.multiline]
         |mode = "haltWith"
         |start-pattern = "^A"
         |timeout = "1s"
         |""".stripMargin) -> "condition-pattern is required",
      ("""[collector.multiline]
         |mode = "haltWith"
         |start-pattern = "^A"
         |condition-pattern = "^B"
         |""".stripMargin) -> "timeout",
      ("""[collector.multiline]
         |mode = "haltWith"
         |start-pattern = "^(A"
         |condition-pattern = "^B"
         |timeout = "1s"
         |""".stripMargin) -> "invalid start-pattern regex",
      ("""[collector]
         |separator = ""
         |""".stripMargin) -> "separator must be non-empty",
      ("""[collector]
         |fingerprint-strategy = "sha1"
         |""".stripMargin) -> "unsupported fingerprint strategy",
      ("""[collector]
         |fingerprint-strategy = "checksum"
         |fingerprint-size = 0
         |""".stripMargin) -> "fingerprint size must be greater than 0",
      ("""[collector]
         |poll-interval = "0s"
         |""".stripMargin) -> "poll-interval must be > 0",
      ("""[collector]
         |workers = 0
         |""".stripMargin) -> "workers must be >= 1",
      ("""[prometheus]
         |enable = true
         |""".stripMargin) -> "prometheus.addr must be set")
    for ((toml, want) <- cases) {
      val got = loadText(toml)
      assert(got.isLeft, s"expected failure containing '$want', got $got")
      assert(got.left.toOption.get.contains(want),
        s"error '${got.left.toOption.get}' should contain '$want'")
    }
  }

  test("missing file errors; no sinks configured falls back to console default") {
    assert(ConfigLoader.load(Some("/nonexistent/x.toml")).isLeft)
    val cfg = loadText("[collector]\nsalt-buckets = 2\n").toOption.get
    assert(cfg.sinks.map(_.name) == Seq("console"))
    assert(cfg.sinks.head.kind == "console")
  }

  test("fingerprint strategy, scheduler keys, prometheus, labels all load") {
    val cfg = loadText(
      """[collector]
        |fingerprint-strategy = "deviceAndInode"
        |poll-interval = "100ms"
        |workers = 4
        |
        |[prometheus]
        |enable = true
        |addr = ":2112"
        |
        |[sink.labels]
        |env = "prod"
        |team = "infra"
        |
        |[sink.all]
        |type = "parquet"
        |""".stripMargin).toOption.get
    assert(cfg.fingerprintStrategy == "deviceAndInode")
    assert(cfg.labels == Map("env" -> "prod", "team" -> "infra"))
    assert(cfg.sinks.map(_.name) == Seq("all")) // labels is not a sink
    assert(cfg.prometheusAddr.contains(":2112")) // endpoint address carried
    // disabled (or absent) -> no endpoint
    assert(loadText("[sink.all]\ntype = \"parquet\"\n")
      .toOption.get.prometheusAddr.isEmpty)
    // addr matrix matches what Metrics.serve accepts: bare host ok (port
    // defaults), bad port and unbracketed IPv6 rejected at config time
    def prom(addr: String) = loadText(
      s"[prometheus]\nenable = true\naddr = \"$addr\"\n")
    assert(prom("localhost").toOption.get.prometheusAddr.contains("localhost"))
    assert(prom("[::1]:2112").toOption.get.prometheusAddr.contains("[::1]:2112"))
    assert(prom("localhost:http").swap.exists(_.contains("invalid port")))
    assert(prom("::1").swap.exists(_.contains("bracketed")))
    // bracketed IPv6 WITHOUT a port is a valid host (port defaults), not
    // an 'invalid port' — serve treats "[::1]" as host "::1", port 9090
    assert(prom("[::1]").toOption.exists(_.prometheusAddr.contains("[::1]")))
    assert(prom("[::1]junk").swap.exists(_.contains("malformed IPv6")))
  }

  test("dedup stage: section loads with defaults, env override, validation") {
    val cfg = loadText(
      """[collector.dedup]
        |mode = "minhash"
        |store-dir = "/tmp/dstore"
        |threshold = 0.7
        |bands = 8
        |""".stripMargin).toOption.get
    val d = cfg.dedup.get
    assert(d.mode == "minhash" && d.storeDir == "/tmp/dstore")
    assert(d.threshold == 0.7 && d.bands == 8)
    assert(d.ngram == 3 && d.rowsPerBand == 2) // defaults fill unset fields

    // env overrides the file value (viper precedence)
    val cfg2 = loadText(
      "[collector.dedup]\nmode = \"minhash\"\nstore-dir = \"/tmp/d2\"\n",
      env = Map("GRAFT_COLLECTOR_DEDUP_MODE" -> "exact")).toOption.get
    assert(cfg2.dedup.get.mode == "exact")

    // no section at all -> no stage
    assert(loadText("[collector]\nseparator = \"\\n\"\n").toOption.get.dedup.isEmpty)

    // validation matrix: mode whitelist, store-dir required, threshold range
    assert(loadText("[collector.dedup]\nmode = \"fuzzy\"\nstore-dir = \"/tmp/x\"\n")
      .swap.exists(_.contains("unsupported dedup mode")))
    assert(loadText("[collector.dedup]\nmode = \"exact\"\n")
      .swap.exists(_.contains("store-dir is required")))
    assert(loadText(
      "[collector.dedup]\nmode = \"exact\"\nstore-dir = \"/tmp/x\"\nthreshold = 1.5\n")
      .swap.exists(_.contains("threshold")))
  }

  test("typed floats: only double-consuming keys accept them; NaN rejected everywhere") {
    // bare float for a string key is a config ERROR, not the string "1.5"
    assert(loadText("[collector]\nseparator = 1.5\n")
      .swap.exists(_.contains("expected string")))
    // the float VALUE flows into the dedup threshold (F variant)
    val cfg = loadText(
      "[collector.dedup]\nmode = \"minhash\"\nstore-dir = \"/tmp/d\"\nthreshold = 0.75\n")
      .toOption.get
    assert(cfg.dedup.get.threshold == 0.75)
    // env overrides arrive as strings and parse through the same gate
    val cfg2 = loadText(
      "[collector.dedup]\nmode = \"minhash\"\nstore-dir = \"/tmp/d\"\n",
      env = Map("GRAFT_COLLECTOR_DEDUP_THRESHOLD" -> "0.9")).toOption.get
    assert(cfg2.dedup.get.threshold == 0.9)
    assert(loadText(
      "[collector.dedup]\nmode = \"minhash\"\nstore-dir = \"/tmp/d\"\n",
      env = Map("GRAFT_COLLECTOR_DEDUP_THRESHOLD" -> "NaN"))
      .swap.exists(_.contains("invalid number")))
    // a NaN that reaches the spec directly is rejected by validate (NaN
    // fails both ordered comparisons — it must not disable the filter)
    assert(graft.model.DedupStageSpec("minhash", "/tmp/d", Double.NaN)
      .validate().swap.exists(_.contains("threshold")))
    // retract-on-invalidate is a bool key, default true
    assert(cfg.dedup.get.retractOnInvalidate)
    assert(loadText(
      "[collector.dedup]\nmode = \"exact\"\nstore-dir = \"/tmp/d\"\nretract-on-invalidate = false\n")
      .toOption.get.dedup.get.retractOnInvalidate == false)
  }

  test("wire sink surface: url/index/table/database/user load; half-config rejected; batch keys consumed") {
    val cfg = loadText(
      """[sink]
        |batch-size = 64
        |batch-interval = "750ms"
        |
        |[sink.os]
        |type = "opensearch"
        |url = "http://127.0.0.1:9200"
        |index = "logs-graft"
        |user = "u"
        |password = "p"
        |
        |[sink.ch]
        |type = "clickhouse"
        |url = "http://127.0.0.1:8123"
        |database = "logs"
        |table = "freader_logs"
        |""".stripMargin).toOption.get
    assert(cfg.batchSize == 64 && cfg.batchIntervalMs == 750L)
    val os = cfg.sinks.find(_.name == "os").get
    assert(os.url.contains("http://127.0.0.1:9200") && os.target == "logs-graft")
    assert(os.user == "u" && os.pass == "p")
    val ch = cfg.sinks.find(_.name == "ch").get
    assert(ch.url.contains("http://127.0.0.1:8123") && ch.target == "logs.freader_logs")
    // a sink section with ONLY wire keys still registers the sink
    assert(loadText(
      """[sink.w]
        |type = "opensearch"
        |url = "http://h:1"
        |index = "i"
        |""".stripMargin).toOption.get.sinks.map(_.name) == Seq("w"))
    // the reference's New() preconditions (opensearch.go:26, clickhouse.go:27)
    assert(loadText(
      "[sink.os]\ntype = \"opensearch\"\nurl = \"http://h:1\"\n")
      .swap.exists(_.contains("opensearch url and index")))
    assert(loadText(
      "[sink.ch]\ntype = \"clickhouse\"\nurl = \"http://h:1\"\n")
      .swap.exists(_.contains("clickhouse addr and table")))
    assert(loadText(
      "[sink.p]\ntype = \"parquet\"\nurl = \"http://h:1\"\n")
      .swap.exists(_.contains("only supported for opensearch/clickhouse")))
  }

  test("duration grammar (Go time.ParseDuration subset)") {
    assert(ConfigLoader.parseDuration("500ms") == Right(500L))
    assert(ConfigLoader.parseDuration("1.5s") == Right(1500L))
    assert(ConfigLoader.parseDuration("1m30s") == Right(90000L))
    assert(ConfigLoader.parseDuration("2h") == Right(7200000L))
    // positive sub-ms durations round UP to the 1ms clock grain instead of
    // truncating to an invalid 0 (documented divergence in the scaladoc)
    assert(ConfigLoader.parseDuration("250us") == Right(1L))
    assert(ConfigLoader.parseDuration("0s") == Right(0L))
    assert(ConfigLoader.parseDuration("10").isLeft)
    assert(ConfigLoader.parseDuration("ms").isLeft)
    assert(ConfigLoader.parseDuration("1s junk").isLeft)
  }

  test("toml subset: comments, escapes, bad syntax errors") {
    assert(ConfigLoader.parseToml("""k = "a # not comment" # real""")
      == Right(Seq("k" -> ConfigLoader.S("a # not comment"))))
    assert(ConfigLoader.parseToml("""k = "tab\tnl\nq\" end"""").toOption.get.head._2
      == ConfigLoader.S("tab\tnl\nq\" end"))
    assert(ConfigLoader.parseToml("k = unquoted").isLeft)
    assert(ConfigLoader.parseToml("[sec\nk = 1").isLeft)
    assert(ConfigLoader.parseToml("k = [1, \"a\", true]")
      == Right(Seq("k" -> ConfigLoader.A(Seq("1", "a", "true")))))
  }
}
