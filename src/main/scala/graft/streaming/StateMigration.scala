package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The state-schema MIGRATION path for stateful streaming operators —
  * the escape hatch `StateSchemaEvolutionSpec` motivates: Spark
  * REJECTS a (flat)mapGroupsWithState restart whose state schema
  * changed (even adding a nullable field), so a deploy that must
  * evolve state needs a rewrite, not a restart. The reference's Flink
  * pipeline solves this with savepoint uid-mapping
  * (RealtimeSessionize.scala:101,121,135,143 tags operators so state
  * can be re-mapped across deploys); the Spark-native equivalent is:
  *
  *  1. STOP the old query at a clean batch boundary.
  *  2. [[drainKeyedState]] — read the old checkpoint's per-key user
  *     state through Spark's `statestore` batch source (a parallel
  *     scan of the state files, partitioned by the store's shuffle
  *     partitions — nothing driver-sized).
  *  3. Map old-state rows to the new schema with ordinary DataFrame/
  *     Dataset transforms (fill the new fields, drop removed ones).
  *  4. Start the NEW query at a FRESH checkpoint location, seeding it
  *     via the `initialState` overload of mapGroupsWithState /
  *     flatMapGroupsWithState (or `transformWithState`'s
  *     StatefulProcessorWithInitialState) — the first batch loads the
  *     migrated state exactly once, then the query runs normally.
  *
  * The old checkpoint is never written to — the migration is
  * non-destructive and the old deploy stays rollback-able
  * (StateMigrationSpec pins that too). At 100 TB the rewrite is one
  * batch job proportional to STATE size (keys × state width), not
  * input size, and steps 2-4 are all executor-parallel.
  *
  * Scope note: `transformWithState` under the Avro state encoding
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`) supports
  * ADDITIVE evolution natively on restart; this tool is for the
  * rejected cases — fMGWS state (always schema-locked), non-additive
  * TWS changes, and rekeying/reshaping migrations.
  */
object StateMigration {

  /** Per-key user state of a (flat)mapGroupsWithState operator from a
    * STOPPED query's checkpoint: one row per live key —
    * (`key` struct as the groupByKey encoder laid it out, `state`
    * struct with the user state fields, `partition_id`). Pass
    * `batchId` to read a specific committed batch (default: latest),
    * `stateVarName` to address one of a transformWithState operator's
    * named value/list/map states instead of the fMGWS groupState. */
  def drainKeyedState(
      spark: SparkSession,
      checkpointLocation: String,
      operatorId: Int = 0,
      batchId: Option[Long] = None,
      stateVarName: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId.toLong)
    batchId.foreach(b => r = r.option("batchId", b))
    stateVarName.foreach(v => r = r.option("stateVarName", v))
    val raw = r.load(checkpointLocation)
    // fMGWS wraps the user state in a `groupState` struct (state
    // format v2+); transformWithState value states arrive unwrapped —
    // normalize both to a `state` column
    val stateCol =
      if (raw.schema("value").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.contains("groupState")) col("value.groupState")
      else col("value")
    raw.select(col("key"), stateCol.as("state"), col("partition_id"))
  }
}
