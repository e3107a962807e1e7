package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expressions._

/** Registers graft's native expressions as SQL functions, so the
  * `spark.sql(text)` entry path (SURVEY §3.2/3.3) can use them:
  *
  * {{{
  *   spark.sql("SELECT doc_id, graft_simhash(text, 2, 64) FROM docs")
  * }}}
  *
  * Install either via `.withExtensions(new GraftExtensions)` at session
  * build time, or [[GraftExtensions.register]] on a live session (the
  * harness builds its own sessions, so Verify/Bench use the latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, builder) =>
      e.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder))
    }
    e.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    e.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → expression builder (positional args as parsed from SQL). */
  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> { args =>
      MinHashSig(args.head, intArg(args(1), "shingleSize"), intArg(args(2), "numHashes"))
    },
    "graft_simhash" -> { args =>
      SimHash(args.head, intArg(args(1), "shingleSize"), intArg(args(2), "bits"))
    },
    "graft_shingles" -> { args =>
      Shingles(args.head, intArg(args(1), "n"))
    },
    "graft_norm_fingerprint" -> { args => NormFingerprint(args.head) },
    "graft_nfc" -> { args => NormalizeUnicode(args.head, "NFC") },
    "graft_fold_accents" -> { args => FoldAccents(args.head) },
    "graft_cosine" -> { args => CosineSim(args.head, args(1)) },
    "graft_simhash_md5" -> { args =>
      SimHashMd5(args.head, intArg(args(1), "shingleSize"))
    },
    "graft_lang_id" -> { args =>
      LangId(args.head, graft.functions.Text.stopwords)
    },
    "graft_chunk_hashes" -> { args =>
      RollingChunkHashes(args.head, intArg(args(1), "window"),
        intArg(args(2), "maskBits"))
    },
    "graft_minhash_union" -> { args =>
      MinHashUnionAgg(args.head, intArg(args(1), "numHashes"))
    },
    // merges = array('e s', 'es t', ...) — each element "left right"
    "graft_bpe_segment" -> { args =>
      val merges = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
          elems.map {
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
              s.toString.split(" ", 2) match {
                case Array(l, r) => (l, r)
                case _ => throw new IllegalArgumentException(
                  s"merge '$s' must be 'left right'")
              }
            case other => throw new IllegalArgumentException(
              s"merges must be string literals, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"second argument must be array('l r', ...), got $other")
      }
      BpeSegment(args.head, merges)
    },
  )

  /** Register on an already-built session (temp functions + the optimizer
    * rule via `experimental.extraOptimizations`).
    */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    Seq(graft.plans.BinnedRangeJoinRule, graft.plans.MvRewriteRule)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
  }
}
