package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

/** State-schema canary (r11 verdict item #7). Every StatefulProcessor's
  * state encoder schema is pinned as a golden DDL string: silently
  * changing a state case class breaks every existing checkpoint of
  * that runtime (Spark's state-schema compatibility check aborts the
  * restarted query), so a change here MUST ship with a documented
  * migration note.
  *
  * If this suite fails: you changed a state class. Either revert, or
  * (a) add a BENCHNOTES.md entry documenting the checkpoint break and
  * the migration path (drain-and-restart with a fresh checkpoint, or a
  * state-rewrite job), and (b) update the pinned DDL here, in the same
  * commit. The FunnelState/TickState/LastSeen break of round 10 is the
  * precedent (BENCHNOTES.md "state schema break" entry).
  */
class StateSchemaCanarySpec extends AnyFunSuite {

  private def ddl[T <: Product : scala.reflect.runtime.universe.TypeTag](
      name: String, expected: String): Unit = {
    val actual = Encoders.product[T].schema.toDDL
    assert(actual == expected,
      s"\nSTATE SCHEMA CHANGED for $name —\n  pinned: $expected\n  actual: $actual\n" +
        "Existing checkpoints of this runtime can no longer restart. " +
        "Document the break + migration in BENCHNOTES.md and update this pin " +
        "in the same commit.")
  }

  test("LatestPriceStream.PriceState") {
    ddl[graft.streaming.LatestPriceStream.PriceState]("PriceState",
      "price DOUBLE NOT NULL,volume BIGINT NOT NULL,time TIMESTAMP")
  }

  test("OrderFlowStream.TickState") {
    ddl[graft.streaming.OrderFlowStream.TickState]("TickState",
      "lastPx BIGINT NOT NULL,lastSign INT NOT NULL,hwm BIGINT NOT NULL,hwmId BIGINT NOT NULL")
  }

  test("VpinStream.VpinState") {
    ddl[graft.streaming.VpinStream.VpinState]("VpinState",
      "cumVol BIGINT NOT NULL,curBucket BIGINT NOT NULL,buy BIGINT NOT NULL," +
        "sell BIGINT NOT NULL,vol BIGINT NOT NULL,recentBuy ARRAY<BIGINT>," +
        "recentSell ARRAY<BIGINT>,recentVol ARRAY<BIGINT>," +
        "hwm BIGINT NOT NULL,hwmId BIGINT NOT NULL")
  }

  test("FunnelStream.FunnelState") {
    ddl[graft.streaming.FunnelStream.FunnelState]("FunnelState",
      "tView BIGINT NOT NULL,tClick BIGINT NOT NULL,tPurchase BIGINT NOT NULL," +
        "hwm BIGINT NOT NULL,hwmId BIGINT NOT NULL")
  }

  test("TransitionStream.LastSeen") {
    ddl[graft.streaming.TransitionStream.LastSeen]("LastSeen",
      "lastType STRING,hwm BIGINT NOT NULL,hwmId BIGINT NOT NULL")
  }

  test("Scd2Stream.RunState") {
    ddl[graft.streaming.Scd2Stream.RunState]("RunState",
      "value DOUBLE NOT NULL,version INT NOT NULL,from DATE,last DATE")
  }

  test("IndicatorStream.IndicatorState") {
    ddl[graft.streaming.IndicatorStream.IndicatorState]("IndicatorState",
      "ema DOUBLE NOT NULL,avgGain DOUBLE NOT NULL,avgLoss DOUBLE NOT NULL," +
        "prevPrice DOUBLE NOT NULL,nSeen BIGINT NOT NULL,timeMs BIGINT NOT NULL")
  }

  test("BarIndicatorStream.BarState") {
    ddl[graft.streaming.BarIndicatorStream.BarState]("BarState",
      "prevClose BIGINT NOT NULL,obv BIGINT NOT NULL,trs ARRAY<BIGINT>," +
        "highs ARRAY<BIGINT>,lows ARRAY<BIGINT>,k1 DOUBLE NOT NULL," +
        "k2 DOUBLE NOT NULL,dateDays BIGINT NOT NULL")
  }

  test("HeavyHitterStream.GroupState (nested MG sketch)") {
    ddl[graft.streaming.HeavyHitterStream.GroupState]("GroupState",
      "sketch STRUCT<counters: MAP<STRING, BIGINT>, total: BIGINT NOT NULL, " +
        "k: INT NOT NULL>,seq BIGINT NOT NULL")
  }
}
