package graft

import graft.expressions.{ByteFoldChecksumExpr, CharNgramHashSetExpr,
  CosineSimilarityExpr, DotProductExpr, MinHashSignatureExpr, RollingMinHashExpr,
  ShingleHashSetExpr, ShingleMinHashExpr, SignBucketExpr,
  SimHash32Expr, SimHash60Expr, WinnowSetExpr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the library's custom Catalyst expressions, so
  * `spark.sql("SELECT graft_simhash32(text) ...")` works alongside the
  * Column API ([[graft.expressions.TextSketches]]).
  *
  *  - `graft_minhash_signature(text, k, shingle_words)` → array<bigint>
  *  - `graft_simhash32(text)` → bigint
  *  - `graft_shingle_minhash(text, shingle_words)` → bigint
  *
  * Register per-session via [[GraftFunctions.register]], or globally with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_signature" -> { exprs =>
      require(exprs.length == 3, "graft_minhash_signature(text, k, shingle_words)")
      MinHashSignatureExpr(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "shingle_words"))
    },
    "graft_simhash32" -> { exprs =>
      require(exprs.length == 1, "graft_simhash32(text)")
      SimHash32Expr(exprs.head)
    },
    "graft_shingle_minhash" -> { exprs =>
      require(exprs.length == 2, "graft_shingle_minhash(text, shingle_words)")
      ShingleMinHashExpr(exprs.head, intArg(exprs(1), "shingle_words"))
    },
    "graft_cosine" -> { exprs =>
      require(exprs.length == 2, "graft_cosine(vec_a, vec_b)")
      CosineSimilarityExpr(exprs.head, exprs(1))
    },
    "graft_dot" -> { exprs =>
      require(exprs.length == 2, "graft_dot(vec_a, vec_b)")
      DotProductExpr(exprs.head, exprs(1))
    },
    "graft_sign_bucket" -> { exprs =>
      require(exprs.length == 2, "graft_sign_bucket(vec, bits)")
      SignBucketExpr(exprs.head, intArg(exprs(1), "bits"))
    },
    "graft_simhash60" -> { exprs =>
      require(exprs.length == 1, "graft_simhash60(text)")
      SimHash60Expr(exprs.head)
    },
    "graft_rolling_minhash" -> { exprs =>
      require(exprs.length == 2, "graft_rolling_minhash(text, window)")
      RollingMinHashExpr(exprs.head, intArg(exprs(1), "window"))
    },
    "graft_byte_checksum" -> { exprs =>
      require(exprs.length == 1, "graft_byte_checksum(payload)")
      ByteFoldChecksumExpr(exprs.head)
    },
    "graft_winnow_set" -> { exprs =>
      require(exprs.length == 3, "graft_winnow_set(text, k, w)")
      WinnowSetExpr(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "w"))
    },
    "graft_char_ngram_hashset" -> { exprs =>
      require(exprs.length == 2, "graft_char_ngram_hashset(text, n)")
      CharNgramHashSetExpr(exprs.head, intArg(exprs(1), "n"))
    },
    "graft_shingle_hashset" -> { exprs =>
      require(exprs.length == 2, "graft_shingle_hashset(text, shingle_words)")
      ShingleHashSetExpr(exprs.head, intArg(exprs(1), "shingle_words"))
    })

  /** Session-scoped registration. Idempotent. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  private[graft] def inject(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    e.injectOptimizerRule(_ => graft.plans.TokenCountRule)
    e.injectOptimizerRule(_ => graft.plans.TokenContainsRule)
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — registers the
  * library's functions and optimizer rules
  * ([[graft.plans.LevenshteinThresholdRule]]) in every session of the
  * application. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
