package graft.core

import org.apache.spark.sql.types._

import java.util.SplittableRandom

/** Hyperparameter value — typed, with a canonical JSON rendering that matches
  * Python's `json.dumps` so trial ids are stable (reference: maggy/trial.py:110-136).
  */
sealed trait HV {
  def jsonRender: String
  def asDouble: Double
}
object HV {
  final case class D(v: Double) extends HV {
    // Java Double.toString == shortest round-trip repr == Python repr for
    // non-exponent magnitudes (the only ones sane hyperparameters use).
    def jsonRender: String = v.toString
    def asDouble: Double = v
  }
  final case class L(v: Long) extends HV {
    def jsonRender: String = v.toString
    def asDouble: Double = v.toDouble
  }
  final case class S(v: String) extends HV {
    def jsonRender: String = "\"" + v.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def asDouble: Double = throw new IllegalArgumentException(s"categorical value '$v' is not numeric")
  }
  def apply(a: Any): HV = a match {
    case d: Double => D(d)
    case f: Float => D(f.toDouble)
    case i: Int => L(i.toLong)
    case l: Long => L(l)
    case s: String => S(s)
    case other => throw new IllegalArgumentException(s"unsupported hparam value: $other")
  }
}

/** Hyperparameter ADT (reference types DOUBLE/INTEGER/DISCRETE/CATEGORICAL,
  * maggy/searchspace.py:60-63; bounds validation :108-136). */
sealed trait HParam {
  def name: String
  def validate(): Unit
  def sparkType: DataType
}
object HParam {
  /** Names the reference reserves (maggy/searchspace.py:92-99 rejects
    * overwriting internals). */
  val ReservedNames: Set[String] = Set("budget")

  final case class DoubleParam(name: String, lo: Double, hi: Double) extends HParam {
    def validate(): Unit = require(lo < hi, s"$name: lower bound $lo must be < upper bound $hi")
    def sparkType: DataType = DoubleType
  }
  final case class IntParam(name: String, lo: Long, hi: Long) extends HParam {
    def validate(): Unit = require(lo < hi, s"$name: lower bound $lo must be < upper bound $hi")
    def sparkType: DataType = LongType
  }
  final case class DiscreteParam(name: String, values: Seq[Double]) extends HParam {
    def validate(): Unit = require(values.nonEmpty, s"$name: feasible region must not be empty")
    def sparkType: DataType = DoubleType
  }
  final case class CategoricalParam(name: String, values: Seq[String]) extends HParam {
    def validate(): Unit = require(values.nonEmpty, s"$name: feasible region must not be empty")
    def sparkType: DataType = StringType
  }
}

/** Ordered hyperparameter search space (reference: maggy/searchspace.py).
  *
  * Differences from the reference are representational only: params are a
  * typed ADT instead of (type-string, list) tuples; sampled configs can be
  * exposed as a Spark DataFrame with one typed column per param so the
  * data-plane can analyze them (SURVEY §1.1).
  */
final case class Searchspace(params: Seq[HParam]) {
  import HParam._
  require(params.map(_.name).distinct.size == params.size, "duplicate hyperparameter names")
  params.foreach { p =>
    require(!ReservedNames.contains(p.name), s"'${p.name}' is a reserved name")
    p.validate()
  }

  def names: Seq[String] = params.map(_.name)

  def get(name: String): HParam = params.find(_.name == name)
    .getOrElse(throw new NoSuchElementException(s"no such hyperparameter: $name"))

  /** Spark schema of a config DataFrame (one column per param). */
  def schema: StructType = StructType(params.map(p => StructField(p.name, p.sparkType, nullable = false)))

  /** Uniform sample (reference: maggy/searchspace.py:180-208). Deterministic
    * under a caller-owned SplittableRandom. */
  def sample(rng: SplittableRandom): Map[String, HV] =
    params.map {
      case DoubleParam(n, lo, hi) => n -> HV.D(lo + rng.nextDouble() * (hi - lo))
      case IntParam(n, lo, hi) => n -> HV.L(lo + rng.nextLong(hi - lo + 1))
      case DiscreteParam(n, vs) => n -> HV.D(vs(rng.nextInt(vs.size)))
      case CategoricalParam(n, vs) => n -> HV.S(vs(rng.nextInt(vs.size)))
    }.toMap

  /** Min-max normalize a config into [0,1]^d with clipping; categorical →
    * normalized list index (reference: maggy/searchspace.py:266-353,355-399). */
  def transform(config: Map[String, HV], normalizeCategorical: Boolean = true): Array[Double] =
    params.map {
      case DoubleParam(n, lo, hi) =>
        math.min(1.0, math.max(0.0, (config(n).asDouble - lo) / (hi - lo)))
      case IntParam(n, lo, hi) =>
        math.min(1.0, math.max(0.0, (config(n).asDouble - lo) / (hi - lo).toDouble))
      case DiscreteParam(n, vs) =>
        val idx = vs.indexOf(config(n).asDouble).toDouble
        if (normalizeCategorical && vs.size > 1) idx / (vs.size - 1) else idx
      case CategoricalParam(n, vs) =>
        val idx = vs.indexOf(config(n) match { case HV.S(s) => s; case o => o.jsonRender }).toDouble
        if (normalizeCategorical && vs.size > 1) idx / (vs.size - 1) else idx
    }.toArray

  /** Inverse of [[transform]]; integer params round (reference:
    * maggy/searchspace.py:430-443). */
  def inverseTransform(x: Array[Double], normalizedCategorical: Boolean = true): Map[String, HV] =
    params.zip(x).map {
      case (DoubleParam(n, lo, hi), v) => n -> HV.D(lo + v * (hi - lo))
      case (IntParam(n, lo, hi), v) => n -> HV.L(math.round(lo + v * (hi - lo)))
      case (DiscreteParam(n, vs), v) =>
        val idx = if (normalizedCategorical && vs.size > 1) math.round(v * (vs.size - 1)).toInt else math.round(v).toInt
        n -> HV.D(vs(math.min(math.max(idx, 0), vs.size - 1)))
      case (CategoricalParam(n, vs), v) =>
        val idx = if (normalizedCategorical && vs.size > 1) math.round(v * (vs.size - 1)).toInt else math.round(v).toInt
        n -> HV.S(vs(math.min(math.max(idx, 0), vs.size - 1)))
    }.toMap

  /** Cartesian product of DISCRETE/CATEGORICAL values; continuous params are
    * rejected by grid search (reference: maggy/optimizer/gridsearch.py:74-92). */
  def grid(): Seq[Map[String, HV]] = {
    val axes: Seq[Seq[(String, HV)]] = params.map {
      case DiscreteParam(n, vs) => vs.map(v => n -> (HV.D(v): HV))
      case CategoricalParam(n, vs) => vs.map(v => n -> (HV.S(v): HV))
      case p => throw new IllegalArgumentException(
        s"grid search requires discrete/categorical params; '${p.name}' is continuous")
    }
    axes.foldLeft(Seq(Map.empty[String, HV])) { (acc, axis) =>
      for (m <- acc; kv <- axis) yield m + kv
    }
  }

  def containsContinuous: Boolean = params.exists {
    case _: DoubleParam | _: IntParam => true
    case _ => false
  }
  def containsDiscrete: Boolean = params.exists(_.isInstanceOf[DiscreteParam])
}
