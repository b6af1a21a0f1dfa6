package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators — the compliance gate a corpus
  * passes before leaving the platform (Sweeney 2002 k-anonymity;
  * Machanavajjhala et al. 2007 l-diversity). PII redaction (TextClean)
  * scrubs VALUES out of text; these operators bound RE-IDENTIFICATION
  * risk of structured releases: a row is only released if its
  * quasi-identifier (QI) combination is shared by ≥ k records, and a QI
  * group only counts as safe if its sensitive attribute takes ≥ l
  * distinct values inside the group.
  *
  * Scale shape: both operators are one shuffle on the QI key.
  * k-anonymity uses a count window over the QI partition (census and
  * release ride the SAME shuffle — no second pass, no census join);
  * l-diversity is a plain two-level aggregate. Nothing is collected or
  * broadcast: the QI census at web scale is itself corpus-sized (most
  * combinations are rare — that is the point of the audit) and stays
  * distributed.
  */
object Privacy {
  type Q = (SparkSession, String) => DataFrame

  /** Suppression threshold k, balance generalization width, and the
    * l-diversity floor. Band width 2000 generalizes c_acctbal
    * ([-999.99, 9999.99]) to ~6 buckets — coarse enough that most QI
    * cells clear k at fixture scale while a measurable tail suppresses.
    */
  val K = 5
  val BandWidth = 2000.0
  val L = 3

  /** The generalized quasi-identifier projection: nation and segment
    * kept, balance generalized to a band index (floor division — the
    * standard numeric generalization hierarchy step).
    */
  private def qi(cust: DataFrame): DataFrame =
    cust.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / BandWidth).as("band"))

  /** k-anonymous release under the suppression model: rows whose QI
    * combination has fewer than K holders are DROPPED; released rows
    * carry their group size (the re-identification bound 1/grp_n).
    */
  val qKAnonymity: Q = (s, d) => {
    val byQi = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
    qi(Tables.customer(s, d))
      .withColumn("grp_n", count(lit(1)).over(byQi))
      .where(col("grp_n") >= K)
      .orderBy("c_custkey")
  }

  /** l-diversity audit of the QI scheme against a sensitive attribute
    * (order priority, arriving via the orders fact): per QI group, the
    * number of distinct sensitive values — a group where everyone shares
    * one priority leaks the attribute even at k-anonymous size.
    */
  val qLDiversity: Q = (s, d) => {
    val release = qi(Tables.customer(s, d))
    val sens = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey"), col("o_orderpriority"))
    release.join(sens, "c_custkey")
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= L)
      .orderBy("c_nationkey", "c_mktsegment", "band")
  }

  val queries: Map[String, Q] = Map(
    "q_k_anonymity" -> qKAnonymity,
    "q_l_diversity" -> qLDiversity
  )
}
