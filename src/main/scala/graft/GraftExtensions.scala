package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ner.Ner

/** Session-extension entry point — the Spark analogue of the reference's
  * `LOAD ner` extension bootstrap (`src/ner_extension.cpp:238-243`):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `ner` / `ner_extract` (both arities) into every session built with
  * the extension, with no explicit `Ner.register(spark)` call. The injected
  * builder dispatches on arity, matching DuckDB's `ScalarFunctionSet`
  * overload resolution (`src/ner_extension.cpp:197-204`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    Seq("ner", "ner_extract").foreach { name =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[Ner.type].getName, name),
        (children: Seq[Expression]) => Ner.expressionBuilder(name)(children)))
    }
    // the custom whole-operator tier: plans the native as-of and interval
    // joins (graft.plans.AsOfJoin / IntervalJoin) for sessions built with
    // the extension; each operator's install covers ad-hoc sessions via
    // experimental strategies
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.Strategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoin.Strategy)
    // optimizer tier: push single-side filters and column pruning THROUGH
    // the custom joins so the built-in rules can carry them to the scans
    // (GraftPushdown / GraftPruning docs)
    ext.injectOptimizerRule(_ => graft.plans.GraftPushdown)
    ext.injectOptimizerRule(_ => graft.plans.GraftPruning)
  }
}
