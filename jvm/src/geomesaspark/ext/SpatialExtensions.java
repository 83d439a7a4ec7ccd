package geomesaspark.ext;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * SparkSessionExtensions entry point: the real Catalyst-injection analog of
 * the reference's GeoMesaSparkSql extension (reference:
 * geomesa-spark/geomesa-spark-sql/src/main/scala/org/apache/spark/sql/
 * SQLRules.scala:204-256, which registers optimization rules that rewrite
 * spatial predicates into index scans). Activated with
 *
 *   spark.sql.extensions=geomesaspark.ext.SpatialExtensions
 *   spark.jars=dist/geomesa-spark-ext.jar
 *
 * (static confs: must be set at session build in a fresh JVM). The injected
 * optimizer rule runs inside Catalyst's operator-optimization fixed-point
 * batch on the driver JVM; see {@link BBoxPrefilterRule} for the rewrite.
 *
 * Written in plain Java against Spark's public extension API
 * (scala.Function1[SparkSessionExtensions, Unit] contract) because this
 * environment ships a JDK but no Scala compiler.
 */
public class SpatialExtensions
    extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectOptimizerRule(
        new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
          @Override
          public Rule<LogicalPlan> apply(SparkSession session) {
            return new BBoxPrefilterRule();
          }
        });
    return BoxedUnit.UNIT;
  }
}
