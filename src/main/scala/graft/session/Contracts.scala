package graft.session

import java.io.FileInputStream
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data contracts: per-table schema expectations + value constraints,
  * ported from the reference's contracts model
  * (/root/reference/config/contracts.yaml — strict/closed schemas, and
  * gt / between / in value constraints on columns).
  *
  * Two enforcement modes:
  *  - `validateSchema`: structural check of a table against the contract
  *    (missing columns, strict-mode extras) → violation list;
  *  - `violations`: a DataFrame of rows breaking value constraints — a
  *    distributed CHECK pass that scales with the table (each constraint
  *    compiles to a codegen'd predicate; nothing is collected).
  */
object Contracts {

  sealed trait Constraint { def predicate(c: Column): Column; def describe: String }
  final case class Gt(v: Double) extends Constraint {
    def predicate(c: Column): Column = c > v
    def describe = s"> $v"
  }
  final case class Between(min: Double, max: Double) extends Constraint {
    def predicate(c: Column): Column = c.between(min, max)
    def describe = s"between [$min, $max]"
  }
  final case class In(values: Seq[String]) extends Constraint {
    def predicate(c: Column): Column = c.isin(values: _*)
    def describe = s"in {${values.mkString(",")}}"
  }
  final case class NotNull() extends Constraint {
    def predicate(c: Column): Column = c.isNotNull
    def describe = "not null"
  }

  final case class ColumnContract(name: String, dataType: Option[String],
      constraints: Seq[Constraint])
  final case class TableContract(table: String, strict: Boolean,
      columns: Seq[ColumnContract])
  final case class ContractSet(contracts: Seq[TableContract]) {
    def forTable(name: String): Option[TableContract] =
      contracts.find(c => c.table == name || c.table.endsWith("." + name))
  }

  final case class Violation(kind: String, column: String, detail: String)

  /** Structural validation: contract columns must exist; in strict mode,
    * table columns not in the contract are violations (Closed Schema). */
  def validateSchema(df: DataFrame, contract: TableContract): Seq[Violation] = {
    val have = df.schema.fieldNames.toSet
    val declared = contract.columns.map(_.name).toSet
    val missing = contract.columns.filterNot(c => have(c.name)).map(c =>
      Violation("missing_column", c.name, "declared in contract, absent in table"))
    val extras =
      if (!contract.strict) Nil
      else (have -- declared).toSeq.sorted.map(n =>
        Violation("undeclared_column", n, "strict contract: column not declared"))
    missing ++ extras
  }

  /** Rows violating any value constraint, tagged with the failed checks.
    * Runs as a single filter pass over the table. */
  def violations(df: DataFrame, contract: TableContract): DataFrame = {
    val checks: Seq[(String, Column)] = for {
      col0 <- contract.columns
      if df.schema.fieldNames.contains(col0.name)
      con <- col0.constraints
    } yield (s"${col0.name} ${con.describe}", !con.predicate(col(col0.name)))
    if (checks.isEmpty) df.limit(0).withColumn("failed_checks", lit(null).cast("string"))
    else {
      val failedArr = array(checks.map { case (desc, failed) =>
        when(failed, desc)
      }: _*)
      df.withColumn("failed_checks",
          array_join(filter(failedArr, x => x.isNotNull), "; "))
        .filter(col("failed_checks") =!= "")
    }
  }

  /** YAML loader for the contracts.yaml shape. */
  def fromYamlFile(path: String): ContractSet = {
    val in = new FileInputStream(path)
    try fromYaml(new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](in))
    finally in.close()
  }

  def fromYamlString(yaml: String): ContractSet =
    fromYaml(new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Object]](yaml))

  private def fromYaml(root: java.util.Map[String, Object]): ContractSet = {
    val contracts = Option(root.get("contracts"))
      .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq)
      .getOrElse(Nil)
      .map { c =>
        val cols = Option(c.get("columns"))
          .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq)
          .getOrElse(Nil)
          .map { col0 =>
            val cons = Option(col0.get("constraints"))
              .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq)
              .getOrElse(Nil)
              .map(parseConstraint)
            ColumnContract(String.valueOf(col0.get("name")),
              Option(col0.get("type")).map(String.valueOf), cons)
          }
        TableContract(String.valueOf(c.get("table")),
          Option(c.get("strict")).exists(v => String.valueOf(v).toBoolean), cols)
      }
    ContractSet(contracts)
  }

  private def parseConstraint(m: java.util.Map[String, Object]): Constraint =
    String.valueOf(m.get("type")) match {
      case "gt" => Gt(String.valueOf(m.get("value")).toDouble)
      case "between" =>
        val v = m.get("value").asInstanceOf[java.util.Map[String, Object]]
        Between(String.valueOf(v.get("min")).toDouble,
          String.valueOf(v.get("max")).toDouble)
      case "in" =>
        In(m.get("value").asInstanceOf[java.util.List[Object]]
          .asScala.map(String.valueOf).toSeq)
      case "not_null" => NotNull()
      case other => throw new IllegalArgumentException(s"unknown constraint: $other")
    }
}
