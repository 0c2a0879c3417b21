package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Vectors => V}

/** U5: batched model inference over feature/embedding columns
  * (ref `scripts/evaluate_model.py:208-215`, `src/serving/service.py:286-293`
  * — the reference scores users in batches of 256/1024 through a torch
  * forward pass).
  *
  * Model training is out of the engine's scope (SURVEY §7.1); scoring plugs
  * in two ways:
  *  - [[linearScore]]: weights as a broadcast literal + the native codegen
  *    dot — the whole "forward pass" stays inside whole-stage codegen, fully
  *    distributed, no batching ceremony needed (Spark's task/partition model
  *    IS the batching — SURVEY §4.1 "Batched execution").
  *  - [[scorePartitions]]: the opaque-model escape hatch — a per-partition
  *    map where a real model handle (JNI/ONNX session) would be created once
  *    per partition and fed row batches; here demonstrated with any
  *    Scala scoring function.
  */
object Inference {

  /** Linear model scoring as a pure expression: score = w · x + b. */
  def linearScore(vecCol: Column, weights: Array[Double],
                  bias: Double = 0.0): Column =
    V.vecDotNative(vecCol, array(weights.map(lit): _*)) + bias

  /** Opaque-model partition-wise scoring: `model` is instantiated ONCE per
    * partition (the expensive step for real runtimes) and applied per row.
    * Input rows are (id, features); output (id, score). */
  def scorePartitions(df: DataFrame, idCol: String, vecCol: String,
                      makeModel: () => Array[Float] => Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val model = makeModel() // once per partition, not per row
        rows.map { case (id, vec) => (id, model(vec)) }
      }
      .toDF(idCol, "score")
  }
}
