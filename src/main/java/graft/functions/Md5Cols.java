package graft.functions;

import org.apache.spark.sql.Column;

/**
 * Registry-free Column wrapper for {@link Md5Prefix60}: the hash helper
 * rides inside pure Column builders (Sampling.hashUniformCol and
 * friends) that have no SparkSession in scope to register a function
 * on. Spark's classic ExpressionUtils is private[sql] to Scala but
 * package-private visibility is compile-time-only, so this Java shim
 * is the supported-bytecode bridge.
 */
public final class Md5Cols {
  private Md5Cols() {}

  public static Column md5Prefix60Col(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(
        new Md5Prefix60(org.apache.spark.sql.classic.ExpressionUtils.expression(c)));
  }
}
