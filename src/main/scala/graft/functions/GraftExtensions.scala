package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-side registration of the native expressions, two ways:
  *
  *  - Cluster deployments: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the injected functions exist in every session of the app).
  *  - Ad hoc sessions: `graft.functions.registerAll(spark)` adds them to
  *    the current session's registry.
  *
  * After either, `spark.sql("SELECT cosine_sim(a, b) …")` works and the
  * functions participate in SQL query plans like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // Whole-operator extension: the native as-of join's planner strategy
    // and its column-pruning optimizer rule (both inert on every plan
    // without an AsOfJoinPlan node).
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => new graft.plans.AsOfJoinPruning)
  }
}

object GraftExtensions {
  private def one(name: String)(f: Expression => Expression): (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      f(args.head)
    }

  private def two(name: String)(f: (Expression, Expression) => Expression): (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      f(args(0), args(1))
    }

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    two("cosine_sim")(CosineSimilarity(_, _)),
    two("dot_product")(DotProduct(_, _)),
    one("simhash64")(SimHash64(_)),
    two("jaccard_sim")(JaccardSimilarity(_, _)),
    two("minhash_sig")((sh, k) => MinHashSignature(sh, intArg(k, "minhash_sig k"))),
    two("rolling_min_hash")((t, w) => RollingMinHash(t, intArg(w, "rolling_min_hash window"))),
    one("repetition_stats")(TokenRepetitionStats(_)),
    one("ppm_decode_stats")(PpmDecodeStats(_)),
    two("y4m_resize_nn")((m, f) => Y4mResizeNn(m, intArg(f, "y4m_resize_nn factor"))),
    two("wav_resample_nn")((m, f) => WavResampleNn(m, intArg(f, "wav_resample_nn factor"))),
    "ppm_synth" -> { args =>
      require(args.length == 3, s"ppm_synth expects 3 arguments, got ${args.length}")
      PpmSynth(args(0), args(1), args(2))
    })
}
