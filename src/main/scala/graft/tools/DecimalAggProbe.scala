package graft.tools

import org.apache.spark.sql.functions._

/** Attribute q01's exec-vehicle cost: which aggregate vehicle (double,
  * long cents, long-backed decimal, wide decimal, the integer-exact avg)
  * is slow, and whether whole-stage codegen method size is the cause.
  * One variant per JVM: `runMain graft.tools.DecimalAggProbe <sfDir>
  * <variant> [wholestage=on|off]` — in-JVM ordering effects (JIT code
  * cache fill, deopt storms) otherwise contaminate later variants.
  */
object DecimalAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variant = if (args.length > 1) args(1) else "q01_asis"
    val ws = if (args.length > 2) args(2) else "on"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.conf.set("spark.sql.codegen.wholeStage", ws == "on")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    li.count()

    val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
    def base = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))

    def df = variant match {
      case "double_sums" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), sum(revenue),
            sum(revenue * (lit(1) + col("l_tax"))), avg("l_quantity"),
            avg("l_extendedprice"), avg("l_discount"), count(lit(1)))
      case "long_cents_avg" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(expr("CAST((sum(CAST(round(l_quantity * 100) AS BIGINT)) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"))
      case "dec38_avg_one" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(expr("CAST((sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"))
      case "dec38_avg_three" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("CAST((sum(CAST(round(l_quantity * 100) AS DECIMAL(38,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"),
            expr("CAST((sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"),
            expr("CAST((sum(CAST(round(l_discount * 100) AS DECIMAL(38,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"))
      case "dec_sums_only" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_extendedprice").cast("decimal(20,4)")),
            sum(revenue.cast("decimal(20,4)")),
            sum((revenue * (lit(1) + col("l_tax"))).cast("decimal(24,6)")))
      case "dec18_avg_three" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(
            expr("CAST((sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"),
            expr("CAST((sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"),
            expr("CAST((sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000"))
      case "dec18_sums_only" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_extendedprice").cast("decimal(18,4)")),
            sum(revenue.cast("decimal(18,4)")),
            sum((revenue * (lit(1) + col("l_tax"))).cast("decimal(18,6)")))
      case "q01_dec18" =>
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2).cast("double").as("sum_base_price"),
            round(sum(revenue.cast("decimal(18,4)")), 2).cast("double").as("sum_disc_price"),
            round(sum((revenue * (lit(1) + col("l_tax"))).cast("decimal(18,6)")), 2).cast("double").as("sum_charge"),
            expr("CAST((sum(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000").as("avg_qty"),
            expr("CAST((sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000").as("avg_price"),
            expr("CAST((sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(18,0))) * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE) / 10000").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      case "q04_sum128" =>
        li.join(broadcast(graft.Tables.part(spark, sfDir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(graft.functions.Sum128(
              round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000).cast("long")) / lit(10000L), 2)
            .cast("double").as("rev"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      case "q04_decimal" =>
        li.join(broadcast(graft.Tables.part(spark, sfDir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(20,4)")), 2)
            .cast("double").as("rev"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      case "q04_double" =>
        li.join(broadcast(graft.Tables.part(spark, sfDir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      case "q04_sum128_preround" =>
        li.select(col("l_partkey"),
            col("l_quantity"),
            round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000).cast("long").as("_rev"))
          .join(broadcast(graft.Tables.part(spark, sfDir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(round(graft.functions.Sum128(col("_rev")) / lit(10000L), 2)
            .cast("double").as("rev"),
            round(sum("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      case "q01_sum128" =>
        import org.apache.spark.sql.Column
        import org.apache.spark.sql.GraftSqlBridge
        import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide, NumericEvalContext}
        def intDiv(a: Column, b: Column): Column = GraftSqlBridge.column(
          IntegralDivide(GraftSqlBridge.expression(a),
            GraftSqlBridge.expression(b),
            NumericEvalContext(EvalMode.LEGACY,
              allowDecimalPrecisionLoss = true)))
        def unitSum(term: Column, scale: Int): Column =
          graft.functions.Sum128(
            round(term * math.pow(10, scale).toLong).cast("long"))
        def sumMoney(term: Column, scale: Int): Column =
          round(unitSum(term, scale) /
            lit(math.pow(10, scale).toLong), 2).cast("double")
        def avgExact(c: String): Column = {
          val s = unitSum(col(c), 2)
          val n = count(lit(1))
          intDiv(s * lit(200) + n, n * lit(2)).cast("double") / 10000
        }
        base.groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            sumMoney(col("l_extendedprice"), 2).as("sum_base_price"),
            sumMoney(revenue, 4).as("sum_disc_price"),
            sumMoney(revenue * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            avgExact("l_quantity").as("avg_qty"),
            avgExact("l_extendedprice").as("avg_price"),
            avgExact("l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      case "q01_asis" =>
        graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    }

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // task-level attribution: is a slow iteration ONE straggler task or
    // uniformly slow tasks?
    val taskMax = new java.util.concurrent.atomic.AtomicLong(0)
    val taskSum = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCpu = new java.util.concurrent.atomic.AtomicLong(0)
    val taskN = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = e.taskInfo.duration
          taskMax.getAndAccumulate(d, math.max(_, _))
          taskSum.addAndGet(d)
          if (e.taskMetrics != null)
            taskCpu.addAndGet(e.taskMetrics.executorCpuTime / 1000000)
          taskN.incrementAndGet()
          ()
        }
      })
    val ts = (1 to 6).map { _ =>
      taskMax.set(0); taskSum.set(0); taskN.set(0); taskCpu.set(0)
      val g0 = gcMs
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      (w, gcMs - g0, taskN.get, taskMax.get, taskSum.get, taskCpu.get)
    }
    println(f"PROBE $variant%-20s ws=$ws min=${ts.map(_._1).min}%7.3f")
    ts.foreach { case (w, gc, n, mx, sm, cpu) =>
      println(f"  wall=$w%6.2f gc=${gc}ms tasks=$n maxTask=${mx}ms sumTask=${sm}ms sumCpu=${cpu}ms")
    }
    if (variant == "q01_sum128") {
      // value parity with the registered q01 (same rows, same doubles)
      val a = df.collect().map(_.toSeq).toSeq
      val b = graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      println(s"PARITY q01_sum128 == q01_asis: ${a == b} (${a.length} rows)")
      if (a != b) { println(a.mkString("\n")); println("---"); println(b.mkString("\n")) }
    }
    spark.stop()
  }
}
