package org.apache.spark.sql
package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SQL registration for graft's custom Catalyst expressions — makes the
 * codegen'd vector kernels first-class SQL functions:
 *
 *   SELECT graft_cosine(a.embedding, b.embedding) ...
 *   SELECT graft_hyperplane_sig(embedding, 12) ...
 *   SELECT graft_simhash64(split(lower(text), '\\s+')) ...
 *   SELECT query_id, graft_top_k(struct(cos, id), 5) ... GROUP BY query_id
 *
 * Used two ways: `GraftExtensions` (graft package) injects these through
 * `spark.sql.extensions` at session build; `registerAll` adds them to an
 * already-running session (the registry API is private[sql], hence this
 * shim's package).
 */
object FunctionShim {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  /** (name, builder) for every graft SQL function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args =>
      require(args.length == 2, "graft_cosine(vec, vec)")
      CosineSim(args(0), args(1))
    },
    "graft_hyperplane_sig" -> { args =>
      require(args.length == 2, "graft_hyperplane_sig(vec, nPlanes)")
      HyperplaneSig(args(0), intArg(args(1), "graft_hyperplane_sig"))
    },
    "graft_simhash64" -> { args =>
      require(args.length == 1, "graft_simhash64(tokens)")
      SimHash64(args(0))
    },
    "graft_top_k" -> { args =>
      require(args.length == 2, "graft_top_k(struct(score, id), k)")
      BoundedTopK(args(0), intArg(args(1), "graft_top_k"))
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(words, n)")
      WordShingles(args(0), intArg(args(1), "graft_shingles"))
    },
    "graft_fingerprint" -> { args =>
      require(args.length == 3, "graft_fingerprint(text, gram, k)")
      NgramFingerprint(args(0), intArg(args(1), "graft_fingerprint"),
        intArg(args(2), "graft_fingerprint"))
    },
    "graft_freq_sketch" -> { args =>
      require(args.length == 2, "graft_freq_sketch(item, k)")
      FreqSketch(args(0), intArg(args(1), "graft_freq_sketch"))
        .toAggregateExpression()
    },
    "graft_kll_sketch" -> { args =>
      require(args.length == 2, "graft_kll_sketch(value_double, k)")
      KllSketch(args(0), intArg(args(1), "graft_kll_sketch"))
        .toAggregateExpression()
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** Register on a live session (idempotent — re-registration replaces). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), builder)
    }
  }

  /** Injection triples for SparkSessionExtensions. */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, builder) =>
      (FunctionIdentifier(name), info(name), builder)
    }
}
